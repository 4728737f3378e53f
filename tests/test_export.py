"""HF checkpoint export round trip: params -> HF dir -> builder -> params."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from dynamic_llava_tpu.config import ClipVisionConfig, LlamaConfig, LlavaConfig, SparseConfig
from dynamic_llava_tpu.models import dynamic
from dynamic_llava_tpu.models.export import export_hf_checkpoint


def test_export_roundtrip(tmp_path):
    cfg = LlavaConfig(
        text=LlamaConfig(vocab_size=128, hidden_size=64, intermediate_size=96,
                         num_hidden_layers=2, num_attention_heads=4,
                         num_key_value_heads=4),
        vision=ClipVisionConfig(hidden_size=24, intermediate_size=48,
                                num_hidden_layers=2, num_attention_heads=2,
                                image_size=28, patch_size=14),
        sparse=SparseConfig(use_vision_predictor=True,
                            use_output_text_predictor=True,
                            use_instruct_predictor=False, sparse_layer=1,
                            d_model=32, nhead=2, dim_feedforward=64,
                            num_layers=1),
    )
    params = dynamic.init_llava_params(jax.random.key(0), cfg)
    out = str(tmp_path / "exported")
    export_hf_checkpoint(params, cfg, out)

    from dynamic_llava_tpu.models.builder import load_pretrained_model

    _, runtime, _, _ = load_pretrained_model(out, dtype=jnp.float32)
    assert runtime.cfg.sparse.use_vision_predictor
    assert runtime.cfg.sparse.sparse_layer == 1

    def close(a, b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    close(runtime.params["llm"]["layers"]["q"], params["llm"]["layers"]["q"])
    close(runtime.params["llm"]["embed"], params["llm"]["embed"])
    close(
        runtime.params["vision_tower"]["patch_embedding"],
        params["vision_tower"]["patch_embedding"],
    )
    close(
        runtime.params["mm_projector"][0]["w"], params["mm_projector"][0]["w"]
    )
    close(
        runtime.params["predictors"]["image_score_predictor"]["down"]["w"],
        params["predictors"]["image_score_predictor"]["down"]["w"],
    )
    close(
        runtime.params["predictors"]["output_text_score_predictor"]["fc1"]["w"],
        params["predictors"]["output_text_score_predictor"]["fc1"]["w"],
    )

    # the exported dir drives generation end to end
    from dynamic_llava_tpu.multimodal.fusion import plan_batch
    from dynamic_llava_tpu.ops.kv_cache import init_tiered_cache

    ids = np.asarray([3, -200, 5, 7], np.int64)
    plan = plan_batch([ids], runtime.cfg.num_image_tokens)
    cache = init_tiered_cache(runtime.cfg.text, 1, 1, 32, 32, jnp.float32)
    state, _ = dynamic.prefill(
        runtime.params, runtime.cfg,
        jnp.asarray(plan.token_ids), jnp.asarray(plan.is_image),
        jnp.asarray(plan.image_slot), jnp.asarray(plan.valid_len),
        jnp.asarray(plan.spans.image_start),
        jnp.asarray(plan.spans.last_instruct_start),
        jnp.asarray(plan.spans.last_instruct_end),
        jnp.asarray(plan.spans.has_image),
        jnp.zeros((1, 28, 28, 3), jnp.float32), cache,
    )
    assert np.isfinite(np.asarray(state.last_logits)).all()
