"""Checkpoint loading: HF LLaVA / Dynamic-LLaVA directory -> JAX runtime.

Rebuild of the reference ``load_pretrained_model``
(/root/reference/llava/model/dynamic_llava_builder.py:35-249 and
builder.py:35-240): reads an HF-format model directory (config.json +
safetensors/bins + tokenizer files), converts weights into our stacked
pytrees, and returns (tokenizer, model, image_processor, context_len) with
the same call shape the eval/serve layers expect.

LoRA-merge and delta-weight paths live in ``weight_tools.py``.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ClipVisionConfig, LlamaConfig, LlavaConfig, SparseConfig
from ..mm_utils import ClipImagePreprocessor
from . import convert


class LlavaRuntime(NamedTuple):
    """Loaded model bundle (the functional analogue of the torch nn.Module
    the reference builder returns)."""

    params: dict
    cfg: LlavaConfig

    @property
    def config(self) -> LlavaConfig:
        return self.cfg


class MptRuntime(NamedTuple):
    """Loaded MPT-family bundle (dense baseline; the reference routes
    'mpt' model names to LlavaMptForCausalLM, builder.py:135-211).
    Deliberately a distinct type: MPT params/config do not fit the LLaMA
    runners, so misuse fails loudly at the type level."""

    params: dict  # {"llm": mpt pytree, ["vision_tower", "mm_projector"]}
    cfg: object  # MptConfig
    vision: Optional[object] = None  # ClipVisionConfig when a tower loaded

    @property
    def config(self):  # MptConfig
        return self.cfg


def llava_config_from_hf_dict(d: dict) -> LlavaConfig:
    """Map an HF llava/dynamic_llava config.json dict onto LlavaConfig."""
    sparse_dict = d.get("sparse_config") or {}
    sparse = SparseConfig.from_dict(sparse_dict) if sparse_dict else SparseConfig(
        use_vision_predictor=False, use_text_predictor=False,
        use_output_text_predictor=False, use_instruct_predictor=False,
    )
    text = LlamaConfig.from_hf_dict(d)
    # vision tower config: the reference loads CLIP-L/336 from its own hub
    # dir; offline we map by name (openai/clip-vit-large-patch14-336)
    tower_name = d.get("mm_vision_tower", "") or ""
    if "336" in tower_name or not tower_name:
        vision = ClipVisionConfig()
    else:
        vision = ClipVisionConfig(image_size=224)
    vision = dataclasses.replace(
        vision,
        select_layer=d.get("mm_vision_select_layer", -2),
        select_feature=d.get("mm_vision_select_feature", "patch"),
    )
    return LlavaConfig(
        text=text,
        vision=vision,
        sparse=sparse,
        mm_projector_type=d.get("mm_projector_type", "linear"),
        mm_vision_select_layer=d.get("mm_vision_select_layer", -2),
        mm_vision_select_feature=d.get("mm_vision_select_feature", "patch"),
        image_aspect_ratio=d.get("image_aspect_ratio", "square"),
        mm_use_im_start_end=d.get("mm_use_im_start_end", False),
        mm_use_im_patch_token=d.get("mm_use_im_patch_token", True),
        model_max_length=d.get("max_length", d.get("model_max_length", 2048)),
    )


def infer_vision_config_from_sd(sd: dict, base: ClipVisionConfig) -> ClipVisionConfig:
    """Derive tower dimensions from checkpoint weight shapes (robust to
    non-standard towers; the reference trusts the hub name instead)."""
    prefixes = [
        "model.vision_tower.vision_tower.vision_model.",
        # MPT checkpoints hang the tower off "transformer." (HF MPT's inner
        # module name), not "model."
        "transformer.vision_tower.vision_tower.vision_model.",
        "vision_tower.vision_tower.vision_model.",
        "vision_model.",
    ]
    for pref in prefixes:
        pe = sd.get(f"{pref}embeddings.patch_embedding.weight")
        if pe is None:
            continue
        hidden, _, patch, _ = pe.shape
        pos = sd[f"{pref}embeddings.position_embedding.weight"].shape[0]
        n_side = int(round((pos - 1) ** 0.5))
        n_layers = 0
        while f"{pref}encoder.layers.{n_layers}.layer_norm1.weight" in sd:
            n_layers += 1
        fc1 = sd[f"{pref}encoder.layers.0.mlp.fc1.weight"].shape[0]
        # head count is not recoverable from shapes; CLIP towers use
        # head_dim 64 (CLIP-L: 1024/64 = 16 heads)
        heads = max(1, int(hidden) // 64) if hidden % 64 == 0 else max(
            1, base.num_attention_heads * hidden // base.hidden_size
        )
        return dataclasses.replace(
            base,
            hidden_size=int(hidden),
            intermediate_size=int(fc1),
            num_hidden_layers=n_layers,
            num_attention_heads=int(heads),
            image_size=int(n_side * patch),
            patch_size=int(patch),
        )
    return base


def params_from_state_dict(sd: dict, cfg: LlavaConfig, dtype=np.float32) -> dict:
    """Full Dynamic-LLaVA state dict -> param bundle. Tower weights may live
    under model.vision_tower.vision_tower.vision_model (reference naming)."""
    params = {
        "llm": convert.llama_params_from_state_dict(sd, cfg.text, dtype=dtype),
    }
    tower_prefixes = [
        "model.vision_tower.vision_tower.vision_model.",
        "vision_tower.vision_tower.vision_model.",
        "vision_model.",
    ]
    for pref in tower_prefixes:
        if f"{pref}embeddings.class_embedding" in sd:
            params["vision_tower"] = convert.clip_params_from_state_dict(
                sd, cfg.vision, prefix=pref, dtype=dtype
            )
            break
    if "model.mm_projector.0.weight" in sd or "model.mm_projector.weight" in sd:
        params["mm_projector"] = convert.projector_params_from_state_dict(
            sd, cfg.mm_projector_type, dtype=dtype
        )
    preds = {}
    if cfg.sparse.use_vision_predictor and any(
        k.startswith("model.image_score_predictor.") for k in sd
    ):
        preds["image_score_predictor"] = (
            convert.vision_predictor_params_from_state_dict(
                sd, cfg.sparse, dtype=dtype
            )
        )
    if cfg.sparse.use_output_text_predictor and any(
        k.startswith("model.output_text_score_predictor.") for k in sd
    ):
        preds["output_text_score_predictor"] = (
            convert.text_predictor_params_from_state_dict(
                sd, "model.output_text_score_predictor.", dtype=dtype
            )
        )
    if cfg.sparse.use_instruct_predictor and any(
        k.startswith("model.instruct_score_predictor.") for k in sd
    ):
        preds["instruct_score_predictor"] = (
            convert.text_predictor_params_from_state_dict(
                sd, "model.instruct_score_predictor.", dtype=dtype
            )
        )
    if preds:
        params["predictors"] = preds
    return params


def _load_mpt_model(model_path, model_base, hf_cfg, dtype=jnp.bfloat16):
    """MPT-family route (reference builder.py:135-211 loads LlavaMpt via
    model_name matching). Text weights convert through models.mpt; a
    LLaVA-MPT checkpoint's tower/projector (stored under the transformer
    module by the LlavaMetaModel mixin) load through the shared CLIP /
    projector converters when present."""
    from ..config import ClipVisionConfig, MptConfig
    from . import mpt as mpt_mod

    cfg = MptConfig.from_hf_dict(hf_cfg)
    sd = {}
    if model_base is not None:
        sd.update(convert.load_state_dict_from_dir(model_base))
    sd.update(convert.load_state_dict_from_dir(model_path))

    params = {"llm": mpt_mod.mpt_params_from_state_dict(sd, cfg)}
    vision = None
    for pref in (
        "transformer.vision_tower.vision_tower.vision_model.",
        "model.vision_tower.vision_tower.vision_model.",
    ):
        if f"{pref}embeddings.class_embedding" in sd:
            vision = infer_vision_config_from_sd(sd, ClipVisionConfig())
            params["vision_tower"] = convert.clip_params_from_state_dict(
                sd, vision, prefix=pref
            )
            break
    proj_type = hf_cfg.get("mm_projector_type", "linear")
    for pref in ("transformer.mm_projector.", "model.mm_projector."):
        if any(k.startswith(pref) for k in sd):
            params["mm_projector"] = convert.projector_params_from_state_dict(
                sd, proj_type, prefix=pref
            )
            break
    params = jax.tree.map(lambda a: jnp.asarray(a, dtype), params)

    tokenizer = None
    try:
        from transformers import AutoTokenizer

        tokenizer = AutoTokenizer.from_pretrained(model_path, use_fast=False)
    except Exception:
        pass
    image_processor = ClipImagePreprocessor(
        size=(vision or ClipVisionConfig()).image_size
    )
    context_len = hf_cfg.get("max_seq_len", 2048)
    return (
        tokenizer,
        MptRuntime(params=params, cfg=cfg, vision=vision),
        image_processor,
        context_len,
    )


def load_pretrained_model(
    model_path: str,
    model_base: Optional[str] = None,
    model_name: Optional[str] = None,
    dtype=jnp.bfloat16,
    device=None,
    tower_path: Optional[str] = None,
    **_: object,
):
    """Returns (tokenizer, LlavaRuntime, image_processor, context_len).

    ``model_base`` handles the projector-only / LoRA checkpoints the same way
    the reference does: base weights from ``model_base``, deltas from
    ``model_path``.
    """
    with open(os.path.join(model_path, "config.json")) as f:
        hf_cfg = json.load(f)

    model_type = (hf_cfg.get("model_type") or "").lower()
    if "mpt" in model_type or "mpt" in (model_name or "").lower():
        return _load_mpt_model(
            model_path, model_base, hf_cfg, dtype=dtype
        )
    cfg = llava_config_from_hf_dict(hf_cfg)

    sd = {}
    if model_base is not None:
        sd.update(convert.load_state_dict_from_dir(model_base))
    sd.update(convert.load_state_dict_from_dir(model_path))

    # separately-stored vision tower (CLIP checkpoint dir)
    if tower_path is not None:
        tower_sd = convert.load_state_dict_from_dir(tower_path)
        sd.update(tower_sd)

    cfg = dataclasses.replace(
        cfg, vision=infer_vision_config_from_sd(sd, cfg.vision)
    )
    np_dtype = np.float32 if dtype == jnp.float32 else np.float32
    params = params_from_state_dict(sd, cfg, dtype=np_dtype)
    params = jax.tree.map(lambda a: jnp.asarray(a, dtype), params)

    tokenizer = None
    try:
        from transformers import AutoTokenizer

        tokenizer = AutoTokenizer.from_pretrained(model_path, use_fast=False)
    except Exception:
        pass

    image_processor = ClipImagePreprocessor(size=cfg.vision.image_size)
    context_len = cfg.model_max_length
    return tokenizer, LlavaRuntime(params=params, cfg=cfg), image_processor, context_len
