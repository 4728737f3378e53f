"""Checkpoint round-trip: write a tiny HF-format Dynamic-LLaVA dir with
torch, load via our builder, check predictors/projector/tower all arrive."""

import json
import os

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")


def _make_reference_style_checkpoint(tmp_path):
    """Assemble a state dict using the reference's module naming."""
    import torch.nn as nn

    torch.manual_seed(0)
    d_model, hidden = 32, 64
    sd = {}

    # tiny llama decoder (2 layers, hidden 64)
    from transformers import LlamaConfig as HFLlamaConfig, LlamaForCausalLM

    lm = LlamaForCausalLM(
        HFLlamaConfig(
            vocab_size=128, hidden_size=hidden, intermediate_size=96,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        )
    )
    sd.update({k: v for k, v in lm.state_dict().items()})

    # tiny CLIP tower under the reference prefix
    from transformers import CLIPVisionConfig as HFClipCfg, CLIPVisionModel

    tower = CLIPVisionModel(
        HFClipCfg(
            hidden_size=24, intermediate_size=48, num_hidden_layers=2,
            num_attention_heads=2, image_size=28, patch_size=14,
        )
    )
    for k, v in tower.state_dict().items():
        sd[f"model.vision_tower.vision_tower.{k}"] = v

    # projector mlp2x_gelu 24 -> 64
    proj = nn.Sequential(nn.Linear(24, hidden), nn.GELU(), nn.Linear(hidden, hidden))
    for k, v in proj.state_dict().items():
        sd[f"model.mm_projector.{k}"] = v

    # predictors (reference naming)
    out_mlp = nn.Sequential(
        nn.LayerNorm(hidden), nn.Linear(hidden, d_model), nn.GELU(),
        nn.Linear(d_model, d_model // 2), nn.GELU(),
        nn.Linear(d_model // 2, d_model // 4), nn.GELU(),
        nn.Linear(d_model // 4, 2),
    )
    for k, v in out_mlp.state_dict().items():
        sd[f"model.output_text_score_predictor.output_mlp.{k}"] = v

    torch.save(sd, os.path.join(tmp_path, "pytorch_model.bin"))
    config = {
        "model_type": "dynamic_llava_llama",
        "vocab_size": 128, "hidden_size": hidden, "intermediate_size": 96,
        "num_hidden_layers": 2, "num_attention_heads": 4,
        "num_key_value_heads": 4,
        "mm_projector_type": "mlp2x_gelu",
        "mm_vision_tower": "openai/clip-vit-large-patch14-336",
        "mm_vision_select_layer": -2,
        "image_aspect_ratio": "pad",
        "sparse_config": {
            "use_vision_predictor": False,
            "use_text_predictor": True,
            "use_output_text_predictor": True,
            "output_text_keep_rate": 0.5,
            "use_instruct_predictor": False,
            "sparse_layer": 1,
            "d_model": d_model, "nhead": 2, "dim_feedforward": 64,
            "num_layers": 1, "mask_loss_weight": 100.0,
        },
    }
    with open(os.path.join(tmp_path, "config.json"), "w") as f:
        json.dump(config, f)
    return sd


def test_builder_roundtrip(tmp_path):
    import dataclasses

    from dynamic_llava_tpu.config import ClipVisionConfig
    from dynamic_llava_tpu.models import builder

    sd = _make_reference_style_checkpoint(str(tmp_path))
    with open(tmp_path / "config.json") as f:
        cfg = builder.llava_config_from_hf_dict(json.load(f))
    assert cfg.sparse.use_output_text_predictor
    assert cfg.sparse.sparse_layer == 1
    assert cfg.mm_projector_type == "mlp2x_gelu"

    # point the vision config at the tiny tower dims for conversion
    cfg = dataclasses.replace(
        cfg,
        vision=ClipVisionConfig(
            hidden_size=24, intermediate_size=48, num_hidden_layers=2,
            num_attention_heads=2, image_size=28, patch_size=14,
        ),
    )
    from dynamic_llava_tpu.models.convert import load_state_dict_from_dir

    sd_np = load_state_dict_from_dir(str(tmp_path))
    params = builder.params_from_state_dict(sd_np, cfg)
    assert "llm" in params and "vision_tower" in params
    assert "mm_projector" in params and len(params["mm_projector"]) == 2
    assert "output_text_score_predictor" in params["predictors"]
    # spot-check a converted weight (transposed)
    w_ref = np.asarray(sd["model.mm_projector.0.weight"].detach())
    np.testing.assert_allclose(params["mm_projector"][0]["w"], w_ref.T, atol=0)

    # loaded params drive a decode-capable model end to end
    import jax

    from dynamic_llava_tpu.models import dynamic
    from dynamic_llava_tpu.multimodal.fusion import plan_batch
    from dynamic_llava_tpu.ops.kv_cache import init_tiered_cache

    params = jax.tree.map(jnp.asarray, params)
    ids = np.asarray([3, -200, 5, 7, 9], np.int64)
    plan = plan_batch([ids], cfg.num_image_tokens)
    imgs = np.zeros((1, 28, 28, 3), np.float32)
    cache = init_tiered_cache(cfg.text, cfg.sparse.sparse_layer, 1, 32, 32, jnp.float32)
    state, _ = dynamic.prefill(
        params, cfg,
        jnp.asarray(plan.token_ids), jnp.asarray(plan.is_image),
        jnp.asarray(plan.image_slot), jnp.asarray(plan.valid_len),
        jnp.asarray(plan.spans.image_start),
        jnp.asarray(plan.spans.last_instruct_start),
        jnp.asarray(plan.spans.last_instruct_end),
        jnp.asarray(plan.spans.has_image),
        jnp.asarray(imgs), cache,
    )
    state = dynamic.decode_step(params, cfg, jnp.asarray([4]), state)
    assert np.isfinite(np.asarray(state.last_logits)).all()
