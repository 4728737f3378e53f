"""HF checkpoint <-> JAX pytree converters.

Replaces the reference's reliance on ``from_pretrained`` torch loading
(/root/reference/llava/model/dynamic_llava_builder.py:35-249) with direct
safetensors/state-dict -> stacked-pytree conversion. Linear weights are
transposed once here (HF stores [out, in]; we compute x @ W with [in, out]),
and per-layer tensors are stacked along a leading layer axis for
``lax.scan`` execution.
"""

from __future__ import annotations

import os
import re
from typing import Dict

import numpy as np

from ..config import ClipVisionConfig, LlamaConfig, SparseConfig


def _np(t):
    """torch tensor / np array -> np array (no torch import at module level)."""
    if isinstance(t, np.ndarray):
        return t
    try:
        return t.detach().to("cpu").float().numpy()
    except AttributeError:
        return np.asarray(t)


# ---------------------------------------------------------------------------
# LLaMA
# ---------------------------------------------------------------------------

_LAYER_KEYS = {
    "input_ln": "input_layernorm.weight",
    "post_ln": "post_attention_layernorm.weight",
    "q": "self_attn.q_proj.weight",
    "k": "self_attn.k_proj.weight",
    "v": "self_attn.v_proj.weight",
    "o": "self_attn.o_proj.weight",
    "gate": "mlp.gate_proj.weight",
    "up": "mlp.up_proj.weight",
    "down": "mlp.down_proj.weight",
}
_TRANSPOSED = {"q", "k", "v", "o", "gate", "up", "down"}


def llama_params_from_state_dict(
    sd: Dict[str, "np.ndarray"],
    cfg: LlamaConfig,
    prefix: str = "model.",
    dtype=np.float32,
):
    """Convert an HF LLaMA state dict (torch tensors or np arrays) into the
    stacked pytree layout of ``models.llama.init_llama_params``."""
    n = cfg.num_hidden_layers
    layers = {}
    for ours, theirs in _LAYER_KEYS.items():
        mats = []
        for i in range(n):
            w = _np(sd[f"{prefix}layers.{i}.{theirs}"])
            if ours in _TRANSPOSED:
                w = w.T
            mats.append(w)
        layers[ours] = np.stack(mats).astype(dtype)
    params = {
        "embed": _np(sd[f"{prefix}embed_tokens.weight"]).astype(dtype),
        "layers": layers,
        "final_ln": _np(sd[f"{prefix}norm.weight"]).astype(dtype),
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = _np(sd["lm_head.weight"]).T.astype(dtype)
    return params


# ---------------------------------------------------------------------------
# CLIP vision tower
# ---------------------------------------------------------------------------


def _ln(sd, name, dtype):
    return {
        "w": _np(sd[f"{name}.weight"]).astype(dtype),
        "b": _np(sd[f"{name}.bias"]).astype(dtype),
    }


def _lin(sd, name, dtype):
    p = {"w": _np(sd[f"{name}.weight"]).T.astype(dtype)}
    if f"{name}.bias" in sd:
        p["b"] = _np(sd[f"{name}.bias"]).astype(dtype)
    return p


def clip_params_from_state_dict(
    sd: Dict[str, "np.ndarray"],
    cfg: ClipVisionConfig,
    prefix: str = "vision_model.",
    dtype=np.float32,
):
    """Convert an HF ``CLIPVisionModel`` state dict into our stacked pytree
    (see ``models.clip``)."""
    n = cfg.num_hidden_layers

    def stack(fmt, transpose=False):
        mats = []
        for i in range(n):
            w = _np(sd[fmt.format(i=i)])
            if transpose:
                w = w.T
            mats.append(w)
        return np.stack(mats).astype(dtype)

    lp = f"{prefix}encoder.layers."
    layers = {
        "ln1_w": stack(lp + "{i}.layer_norm1.weight"),
        "ln1_b": stack(lp + "{i}.layer_norm1.bias"),
        "ln2_w": stack(lp + "{i}.layer_norm2.weight"),
        "ln2_b": stack(lp + "{i}.layer_norm2.bias"),
        "q_w": stack(lp + "{i}.self_attn.q_proj.weight", transpose=True),
        "q_b": stack(lp + "{i}.self_attn.q_proj.bias"),
        "k_w": stack(lp + "{i}.self_attn.k_proj.weight", transpose=True),
        "k_b": stack(lp + "{i}.self_attn.k_proj.bias"),
        "v_w": stack(lp + "{i}.self_attn.v_proj.weight", transpose=True),
        "v_b": stack(lp + "{i}.self_attn.v_proj.bias"),
        "o_w": stack(lp + "{i}.self_attn.out_proj.weight", transpose=True),
        "o_b": stack(lp + "{i}.self_attn.out_proj.bias"),
        "fc1_w": stack(lp + "{i}.mlp.fc1.weight", transpose=True),
        "fc1_b": stack(lp + "{i}.mlp.fc1.bias"),
        "fc2_w": stack(lp + "{i}.mlp.fc2.weight", transpose=True),
        "fc2_b": stack(lp + "{i}.mlp.fc2.bias"),
    }
    emb = f"{prefix}embeddings."
    return {
        "class_embedding": _np(sd[f"{emb}class_embedding"]).astype(dtype),
        # conv [out, in, kh, kw] -> flattened [kh*kw*in, out] for a single matmul
        "patch_embedding": _np(sd[f"{emb}patch_embedding.weight"])
        .transpose(2, 3, 1, 0)
        .reshape(-1, cfg.hidden_size)
        .astype(dtype),
        "position_embedding": _np(sd[f"{emb}position_embedding.weight"]).astype(
            dtype
        ),
        "pre_ln": _ln(sd, f"{prefix}pre_layrnorm", dtype),
        "layers": layers,
        "post_ln": _ln(sd, f"{prefix}post_layernorm", dtype),
    }


# ---------------------------------------------------------------------------
# Projector + predictors
# ---------------------------------------------------------------------------


def projector_params_from_state_dict(
    sd, projector_type: str, prefix: str = "model.mm_projector.", dtype=np.float32
):
    """mm_projector: `linear` or `mlpNx_gelu` Sequential indices 0,2,4,...
    (reference multimodal_projector/builder.py:159-184)."""
    if projector_type == "linear":
        return [{"w": _np(sd[prefix + "weight"]).T.astype(dtype),
                 "b": _np(sd[prefix + "bias"]).astype(dtype)}]
    m = re.match(r"^mlp(\d+)x_gelu$", projector_type)
    if not m:
        raise ValueError(f"unsupported projector: {projector_type}")
    depth = int(m.group(1))
    out = []
    for i in range(depth):
        idx = i * 2
        out.append(
            {
                "w": _np(sd[f"{prefix}{idx}.weight"]).T.astype(dtype),
                "b": _np(sd[f"{prefix}{idx}.bias"]).astype(dtype),
            }
        )
    return out


_PRED_LIN = re.compile(r"^(.*)\.(weight|bias)$")


def _seq_linear(sd, prefix, idx, dtype, bias=True):
    p = {"w": _np(sd[f"{prefix}.{idx}.weight"]).T.astype(dtype)}
    if bias and f"{prefix}.{idx}.bias" in sd:
        p["b"] = _np(sd[f"{prefix}.{idx}.bias"]).astype(dtype)
    return p


def vision_predictor_params_from_state_dict(
    sd, sparse: SparseConfig, prefix: str = "model.image_score_predictor.",
    dtype=np.float32,
):
    """Map the reference VisionPredictor module tree
    (down_mlp.{0:LN,1:Linear}, transformer.{i}.{norm1,attn.qkv,attn.proj,
    norm2,mlp.fc1,mlp.fc2}, output_mlp.{0,2,4})."""
    p = prefix
    blocks = []
    for i in range(sparse.num_layers):
        bp = f"{p}transformer.{i}"
        blocks.append(
            {
                "norm1": _ln(sd, f"{bp}.norm1", dtype),
                "qkv": {"w": _np(sd[f"{bp}.attn.qkv.weight"]).T.astype(dtype)},
                "proj": {
                    "w": _np(sd[f"{bp}.attn.proj.weight"]).T.astype(dtype),
                    "b": _np(sd[f"{bp}.attn.proj.bias"]).astype(dtype),
                },
                "norm2": _ln(sd, f"{bp}.norm2", dtype),
                "fc1": {
                    "w": _np(sd[f"{bp}.mlp.fc1.weight"]).T.astype(dtype),
                    "b": _np(sd[f"{bp}.mlp.fc1.bias"]).astype(dtype),
                },
                "fc2": {
                    "w": _np(sd[f"{bp}.mlp.fc2.weight"]).T.astype(dtype),
                    "b": _np(sd[f"{bp}.mlp.fc2.bias"]).astype(dtype),
                },
            }
        )
    return {
        "down_norm": _ln(sd, f"{p}down_mlp.0", dtype),
        "down": _seq_linear(sd, f"{p}down_mlp", 1, dtype),
        "blocks": blocks,
        "out1": _seq_linear(sd, f"{p}output_mlp", 0, dtype),
        "out2": _seq_linear(sd, f"{p}output_mlp", 2, dtype),
        "out3": _seq_linear(sd, f"{p}output_mlp", 4, dtype),
    }


def text_predictor_params_from_state_dict(
    sd, prefix: str, dtype=np.float32
):
    """Reference TextPredictor output_mlp.{0:LN,1,3,5,7:Linear}."""
    return {
        "norm": _ln(sd, f"{prefix}output_mlp.0", dtype),
        "fc1": _seq_linear(sd, f"{prefix}output_mlp", 1, dtype),
        "fc2": _seq_linear(sd, f"{prefix}output_mlp", 3, dtype),
        "fc3": _seq_linear(sd, f"{prefix}output_mlp", 5, dtype),
        "fc4": _seq_linear(sd, f"{prefix}output_mlp", 7, dtype),
    }


# ---------------------------------------------------------------------------
# Full checkpoint loading from disk (safetensors / torch bins)
# ---------------------------------------------------------------------------


def load_state_dict_file(path: str) -> Dict[str, np.ndarray]:
    """Load a single weights file (.safetensors or torch .bin/.pt) into
    numpy arrays — e.g. a stage-1 mm_projector.bin."""
    if path.endswith(".safetensors"):
        from safetensors import safe_open

        with safe_open(path, framework="np") as fh:
            return {k: fh.get_tensor(k) for k in fh.keys()}
    import torch

    part = torch.load(path, map_location="cpu", weights_only=True)
    return {k: _np(v) for k, v in part.items()}


def load_state_dict_from_dir(model_dir: str) -> Dict[str, np.ndarray]:
    """Load all weights from an HF model directory into numpy arrays."""
    sd: Dict[str, np.ndarray] = {}
    st_files = sorted(
        f for f in os.listdir(model_dir) if f.endswith(".safetensors")
    )
    if st_files:
        from safetensors import safe_open

        for f in st_files:
            with safe_open(os.path.join(model_dir, f), framework="np") as fh:
                for k in fh.keys():
                    sd[k] = fh.get_tensor(k)
        return sd
    import torch

    bin_files = sorted(f for f in os.listdir(model_dir) if f.endswith(".bin"))
    if not bin_files:
        raise FileNotFoundError(f"no weights found in {model_dir}")
    for f in bin_files:
        part = torch.load(
            os.path.join(model_dir, f), map_location="cpu", weights_only=True
        )
        for k, v in part.items():
            sd[k] = _np(v)
    return sd
