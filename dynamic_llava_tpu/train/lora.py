"""LoRA adapters for the stacked decoder.

Rebuild of the reference's peft integration
(/root/reference/llava/train/train_sparse.py:1041-1072 lora_enable path,
and the split save of lora vs ``non_lora_trainables.bin`` :1181-1194).

Adapters are extra pytree entries next to each target weight:
``layers["q_lora"] = {"a": [L, in, r], "b": [L, r, out]}``; the layer
matmuls add ``scale * (x @ A) @ B``. The base weight stays frozen (the
optimizer labels handle that), so training memory is dominated by the tiny
A/B moments — the ZeRO-style fsdp sharding still applies to the frozen
base weights for the forward all-gathers.
"""

from __future__ import annotations

from typing import Dict, Sequence

import jax
import jax.numpy as jnp

from ..config import LlamaConfig

DEFAULT_TARGETS = ("q", "k", "v", "o", "gate", "up", "down")


def init_lora_params(
    key: jax.Array,
    cfg: LlamaConfig,
    rank: int = 128,
    alpha: float = 256.0,
    targets: Sequence[str] = DEFAULT_TARGETS,
    dtype=jnp.float32,
) -> Dict[str, dict]:
    """A ~ N(0, 1/r), B = 0 (standard LoRA init: the adapter starts as a
    no-op). The alpha/rank scale rides along as a (frozen) leaf."""
    dims = {
        "q": (cfg.hidden_size, cfg.num_attention_heads * cfg.head_dim),
        "k": (cfg.hidden_size, cfg.num_key_value_heads * cfg.head_dim),
        "v": (cfg.hidden_size, cfg.num_key_value_heads * cfg.head_dim),
        "o": (cfg.num_attention_heads * cfg.head_dim, cfg.hidden_size),
        "gate": (cfg.hidden_size, cfg.intermediate_size),
        "up": (cfg.hidden_size, cfg.intermediate_size),
        "down": (cfg.intermediate_size, cfg.hidden_size),
    }
    n = cfg.num_hidden_layers
    out = {}
    ks = jax.random.split(key, len(targets))
    for k_i, t in zip(ks, targets):
        d_in, d_out = dims[t]
        out[f"{t}_lora"] = {
            "a": (jax.random.normal(k_i, (n, d_in, rank), dtype)
                  * jnp.asarray(rank**-0.5, dtype)),
            "b": jnp.zeros((n, rank, d_out), dtype),
            "s": jnp.asarray(alpha / rank, dtype),
        }
    return out


def attach_lora(params: dict, lora_layers: Dict[str, dict]) -> dict:
    """Return params with adapters merged into the layers subtree."""
    layers = dict(params["llm"]["layers"])
    layers.update(lora_layers)
    llm = dict(params["llm"])
    llm["layers"] = layers
    out = dict(params)
    out["llm"] = llm
    return out


def lora_proj(lp: dict, name: str, x: jax.Array) -> jax.Array:
    """x @ W (+ s * (x @ A) @ B when an adapter is attached). W may be an
    int8 or packed-int4 quantized dict leaf (ops.quant): both dispatch to
    the Pallas streaming GEMV at decode row counts and to an XLA einsum
    (dequant fused into the dot) at prefill/training row counts."""
    w = lp[name]
    if isinstance(w, dict) and "q4" in w:
        from ..ops.quant import matmul_q4

        y = matmul_q4(x, w)
    elif isinstance(w, dict) and "q" in w:
        from ..ops.quant import matmul_q8

        y = matmul_q8(x, w)
    else:
        y = x @ w
    lora = lp.get(f"{name}_lora")
    if lora is not None:
        y = y + ((x @ lora["a"]) @ lora["b"]) * lora["s"]
    return y


def split_lora_state(params: dict):
    """(lora adapters, everything else trainable) — the reference's split
    checkpointing of adapter_model vs non_lora_trainables."""
    lora = {
        k: v for k, v in params["llm"]["layers"].items() if k.endswith("_lora")
    }
    non_lora = {}
    if "predictors" in params:
        non_lora["predictors"] = params["predictors"]
    if "mm_projector" in params:
        non_lora["mm_projector"] = params["mm_projector"]
    return lora, non_lora


def merge_lora_pytree(params: dict, alpha: float = 1.0, rank: int = 1) -> dict:
    """Fold adapters into the base weights and drop them (inference-time
    merge, reference merge_lora_weights.py)."""
    scale = alpha / rank
    layers = dict(params["llm"]["layers"])
    for name in list(layers):
        if not name.endswith("_lora"):
            continue
        base_name = name[: -len("_lora")]
        ab = jnp.einsum(
            "lir,lro->lio", layers[name]["a"], layers[name]["b"],
            preferred_element_type=jnp.float32,
        )
        s_leaf = layers[name].get("s", scale)
        layers[base_name] = (
            layers[base_name] + (ab * s_leaf).astype(layers[base_name].dtype)
        )
        del layers[name]
    llm = dict(params["llm"])
    llm["layers"] = layers
    out = dict(params)
    out["llm"] = llm
    return out
