"""int8 weight-only quantization + beam search."""

import numpy as np

import jax
import jax.numpy as jnp

from dynamic_llava_tpu.config import LlamaConfig, LlavaConfig, SparseConfig
from dynamic_llava_tpu.models import dynamic, llama
from dynamic_llava_tpu.ops.quant import is_quantized, quantize_llm_params


def test_int8_close_to_fp():
    cfg = LlamaConfig.tiny()
    params = llama.init_llama_params(jax.random.key(0), cfg)
    qparams = quantize_llm_params({"llm": params})["llm"]
    assert is_quantized(qparams["layers"]["gate"])
    assert is_quantized(qparams["embed"])
    ids = jnp.asarray(np.random.default_rng(0).integers(0, cfg.vocab_size, (2, 9)))
    ref = np.asarray(llama.forward_dense(params, cfg, ids))
    got = np.asarray(llama.forward_dense(qparams, cfg, ids))
    cos = (ref * got).sum() / (np.linalg.norm(ref) * np.linalg.norm(got))
    assert cos > 0.999
    assert (ref.argmax(-1) == got.argmax(-1)).mean() > 0.95
    # memory claim: int8 weights are half the bytes
    assert qparams["layers"]["gate"]["q"].dtype == jnp.int8


def test_int8_decode_path():
    """Quantized weights drive the full prefill+decode path."""
    import dataclasses

    sparse = SparseConfig(
        use_vision_predictor=False, use_text_predictor=False,
        use_output_text_predictor=False, use_instruct_predictor=False,
        d_model=32, nhead=2, dim_feedforward=64, num_layers=1,
    )
    cfg = LlavaConfig.tiny(sparse=sparse)
    params = dynamic.init_llava_params(jax.random.key(1), cfg)
    qparams = quantize_llm_params(params)

    from dynamic_llava_tpu.multimodal.fusion import plan_batch
    from dynamic_llava_tpu.ops.kv_cache import init_tiered_cache

    ids = np.random.default_rng(1).integers(3, cfg.text.vocab_size, (1, 8))
    plan = plan_batch(list(ids), 0)
    cache = init_tiered_cache(cfg.text, 2, 1, 32, 32, jnp.float32)
    state, _ = dynamic.prefill(
        qparams, cfg,
        jnp.asarray(plan.token_ids), jnp.asarray(plan.is_image),
        jnp.asarray(plan.image_slot), jnp.asarray(plan.valid_len),
        jnp.asarray(plan.spans.image_start),
        jnp.asarray(plan.spans.last_instruct_start),
        jnp.asarray(plan.spans.last_instruct_end),
        jnp.asarray(plan.spans.has_image), None, cache,
    )
    state = dynamic.decode_step(qparams, cfg, jnp.asarray([5]), state)
    assert np.isfinite(np.asarray(state.last_logits)).all()


def test_beam_search_beats_greedy_logprob():
    from dynamic_llava_tpu.generation.beam import beam_search
    from dynamic_llava_tpu.multimodal.fusion import plan_batch
    from dynamic_llava_tpu.ops.kv_cache import init_tiered_cache

    sparse = SparseConfig(
        use_vision_predictor=False, use_text_predictor=False,
        use_output_text_predictor=False, use_instruct_predictor=False,
        d_model=32, nhead=2, dim_feedforward=64, num_layers=1,
    )
    cfg = LlavaConfig.tiny(sparse=sparse)
    params = dynamic.init_llava_params(jax.random.key(2), cfg)

    w = 3
    ids = np.random.default_rng(2).integers(3, cfg.text.vocab_size, (7,))
    plan = plan_batch([ids] * w, 0)  # same prompt per beam
    cache = init_tiered_cache(cfg.text, 2, w, 32, 32, jnp.float32)
    state, _ = dynamic.prefill(
        params, cfg,
        jnp.asarray(plan.token_ids), jnp.asarray(plan.is_image),
        jnp.asarray(plan.image_slot), jnp.asarray(plan.valid_len),
        jnp.asarray(plan.spans.image_start),
        jnp.asarray(plan.spans.last_instruct_start),
        jnp.asarray(plan.spans.last_instruct_end),
        jnp.asarray(plan.spans.has_image), None, cache,
    )
    best = beam_search(params, cfg, state, num_beams=w, max_new_tokens=5,
                       eos_token_id=-1)
    assert len(best) == 5
    assert all(0 <= t < cfg.text.vocab_size for t in best)


def test_int4_close_to_fp():
    """bnb-4bit parity: native TPU int4 weights, per-channel scales."""
    cfg = LlamaConfig.tiny()
    params = llama.init_llama_params(jax.random.key(3), cfg)
    ref_params = llama.init_llama_params(jax.random.key(3), cfg)
    q4 = quantize_llm_params({"llm": params}, bits=4)["llm"]
    # int4 at rest = nibble-packed int8, half the last dim
    assert q4["layers"]["gate"]["q4"].dtype == jnp.int8
    ids = jnp.asarray(np.random.default_rng(4).integers(0, cfg.vocab_size, (1, 8)))
    ref = np.asarray(llama.forward_dense(ref_params, cfg, ids))
    got = np.asarray(llama.forward_dense(q4, cfg, ids))
    cos = (ref * got).sum() / (np.linalg.norm(ref) * np.linalg.norm(got))
    assert cos > 0.9, cos
