"""Export JAX pytrees back to HF-format checkpoints.

The inverse of ``convert.py``: our stacked [L, in, out] pytrees become
reference-named torch/safetensors state dicts, so checkpoints trained here
load in the reference implementation (and in ours via the builder) — the
``save_pretrained`` analogue of the reference trainer's
``safe_save_model_for_hf_trainer`` (train_sparse.py:252-291).
"""

from __future__ import annotations

import json
import os
from typing import Dict

import numpy as np

from ..config import LlavaConfig
from .convert import _LAYER_KEYS, _TRANSPOSED


def _np(x) -> np.ndarray:
    arr = np.asarray(x)
    if arr.dtype == np.dtype("bfloat16") if hasattr(np, "bfloat16") else False:
        arr = arr.astype(np.float32)
    try:
        import ml_dtypes

        if arr.dtype == ml_dtypes.bfloat16:
            arr = arr.astype(np.float32)
    except ImportError:
        pass
    return arr


def llama_state_dict(params: dict, prefix: str = "model.") -> Dict[str, np.ndarray]:
    sd: Dict[str, np.ndarray] = {}
    layers = params["layers"]
    n = next(iter(layers.values())).shape[0] if layers else 0
    for ours, theirs in _LAYER_KEYS.items():
        if ours not in layers:
            continue
        stack = _np(layers[ours])
        for i in range(stack.shape[0]):
            w = stack[i]
            if ours in _TRANSPOSED:
                w = w.T
            sd[f"{prefix}layers.{i}.{theirs}"] = np.ascontiguousarray(w)
    sd[f"{prefix}embed_tokens.weight"] = _np(params["embed"])
    sd[f"{prefix}norm.weight"] = _np(params["final_ln"])
    if "lm_head" in params:
        sd["lm_head.weight"] = np.ascontiguousarray(_np(params["lm_head"]).T)
    return sd


def projector_state_dict(proj, prefix: str = "model.mm_projector.") -> Dict[str, np.ndarray]:
    sd = {}
    if len(proj) == 1:
        sd[f"{prefix}weight"] = np.ascontiguousarray(_np(proj[0]["w"]).T)
        sd[f"{prefix}bias"] = _np(proj[0]["b"])
        return sd
    for i, lp in enumerate(proj):
        idx = i * 2
        sd[f"{prefix}{idx}.weight"] = np.ascontiguousarray(_np(lp["w"]).T)
        sd[f"{prefix}{idx}.bias"] = _np(lp["b"])
    return sd


def _ln_sd(p, name):
    return {f"{name}.weight": _np(p["w"]), f"{name}.bias": _np(p["b"])}


def _lin_sd(p, name):
    sd = {f"{name}.weight": np.ascontiguousarray(_np(p["w"]).T)}
    if "b" in p:
        sd[f"{name}.bias"] = _np(p["b"])
    return sd


def vision_predictor_state_dict(
    p, prefix: str = "model.image_score_predictor."
) -> Dict[str, np.ndarray]:
    sd = {}
    sd.update(_ln_sd(p["down_norm"], f"{prefix}down_mlp.0"))
    sd.update(_lin_sd(p["down"], f"{prefix}down_mlp.1"))
    for i, blk in enumerate(p["blocks"]):
        bp = f"{prefix}transformer.{i}"
        sd.update(_ln_sd(blk["norm1"], f"{bp}.norm1"))
        sd.update(_lin_sd(blk["qkv"], f"{bp}.attn.qkv"))
        sd.update(_lin_sd(blk["proj"], f"{bp}.attn.proj"))
        sd.update(_ln_sd(blk["norm2"], f"{bp}.norm2"))
        sd.update(_lin_sd(blk["fc1"], f"{bp}.mlp.fc1"))
        sd.update(_lin_sd(blk["fc2"], f"{bp}.mlp.fc2"))
    sd.update(_lin_sd(p["out1"], f"{prefix}output_mlp.0"))
    sd.update(_lin_sd(p["out2"], f"{prefix}output_mlp.2"))
    sd.update(_lin_sd(p["out3"], f"{prefix}output_mlp.4"))
    return sd


def text_predictor_state_dict(p, prefix: str) -> Dict[str, np.ndarray]:
    sd = {}
    sd.update(_ln_sd(p["norm"], f"{prefix}output_mlp.0"))
    sd.update(_lin_sd(p["fc1"], f"{prefix}output_mlp.1"))
    sd.update(_lin_sd(p["fc2"], f"{prefix}output_mlp.3"))
    sd.update(_lin_sd(p["fc3"], f"{prefix}output_mlp.5"))
    sd.update(_lin_sd(p["fc4"], f"{prefix}output_mlp.7"))
    return sd


def clip_state_dict(
    params, cfg, prefix: str = "model.vision_tower.vision_tower.vision_model."
) -> Dict[str, np.ndarray]:
    sd = {}
    emb = f"{prefix}embeddings."
    sd[f"{emb}class_embedding"] = _np(params["class_embedding"])
    # [kh*kw*in, out] -> conv [out, in, kh, kw]
    pe = _np(params["patch_embedding"])
    p = cfg.patch_size
    sd[f"{emb}patch_embedding.weight"] = np.ascontiguousarray(
        pe.reshape(p, p, 3, -1).transpose(3, 2, 0, 1)
    )
    sd[f"{emb}position_embedding.weight"] = _np(params["position_embedding"])
    sd.update(_ln_sd(params["pre_ln"], f"{prefix}pre_layrnorm"))
    sd.update(_ln_sd(params["post_ln"], f"{prefix}post_layernorm"))
    lp = params["layers"]
    n = lp["ln1_w"].shape[0]
    names = {
        "ln1": ("layer_norm1", False), "ln2": ("layer_norm2", False),
        "q": ("self_attn.q_proj", True), "k": ("self_attn.k_proj", True),
        "v": ("self_attn.v_proj", True), "o": ("self_attn.out_proj", True),
        "fc1": ("mlp.fc1", True), "fc2": ("mlp.fc2", True),
    }
    for i in range(n):
        base = f"{prefix}encoder.layers.{i}."
        for ours, (theirs, lin) in names.items():
            w = _np(lp[f"{ours}_w"][i])
            b = _np(lp[f"{ours}_b"][i])
            if lin:
                w = np.ascontiguousarray(w.T)
            sd[f"{base}{theirs}.weight"] = w
            sd[f"{base}{theirs}.bias"] = b
    return sd


def export_hf_checkpoint(params: dict, cfg: LlavaConfig, out_dir: str,
                         tokenizer=None) -> None:
    """Write a reference-compatible checkpoint directory."""
    os.makedirs(out_dir, exist_ok=True)
    sd: Dict[str, np.ndarray] = {}
    sd.update(llama_state_dict(params["llm"]))
    if "vision_tower" in params:
        sd.update(clip_state_dict(params["vision_tower"], cfg.vision))
    if "mm_projector" in params:
        sd.update(projector_state_dict(params["mm_projector"]))
    preds = params.get("predictors", {})
    if "image_score_predictor" in preds:
        sd.update(vision_predictor_state_dict(preds["image_score_predictor"]))
    if "output_text_score_predictor" in preds:
        sd.update(text_predictor_state_dict(
            preds["output_text_score_predictor"],
            "model.output_text_score_predictor.",
        ))
    if "instruct_score_predictor" in preds:
        sd.update(text_predictor_state_dict(
            preds["instruct_score_predictor"],
            "model.instruct_score_predictor.",
        ))

    import torch

    torch.save(
        {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()},
        os.path.join(out_dir, "pytorch_model.bin"),
    )
    config = {
        "model_type": "dynamic_llava_llama",
        "architectures": ["DynamicLlavaLlamaForCausalLM"],
        "vocab_size": cfg.text.vocab_size,
        "hidden_size": cfg.text.hidden_size,
        "intermediate_size": cfg.text.intermediate_size,
        "num_hidden_layers": cfg.text.num_hidden_layers,
        "num_attention_heads": cfg.text.num_attention_heads,
        "num_key_value_heads": cfg.text.num_key_value_heads,
        "max_position_embeddings": cfg.text.max_position_embeddings,
        "rms_norm_eps": cfg.text.rms_norm_eps,
        "rope_theta": cfg.text.rope_theta,
        "sliding_window": cfg.text.sliding_window,
        "mm_projector_type": cfg.mm_projector_type,
        "mm_vision_tower": "openai/clip-vit-large-patch14-336",
        "mm_vision_select_layer": cfg.mm_vision_select_layer,
        "mm_vision_select_feature": cfg.mm_vision_select_feature,
        "image_aspect_ratio": cfg.image_aspect_ratio,
        "mm_use_im_start_end": cfg.mm_use_im_start_end,
        "mm_use_im_patch_token": cfg.mm_use_im_patch_token,
        "model_max_length": cfg.model_max_length,
        "sparse_config": cfg.sparse.to_dict(),
    }
    with open(os.path.join(out_dir, "config.json"), "w") as f:
        json.dump(config, f, indent=2)
    if tokenizer is not None:
        tokenizer.save_pretrained(out_dir)
