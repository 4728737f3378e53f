"""Weight-only int8 quantization for serving.

TPU-native replacement for the reference's bitsandbytes 4/8-bit loading
(/root/reference/llava/model/dynamic_llava_builder.py:51-60,
train_sparse.py:956-976): per-output-channel symmetric int8 with bf16
scales. Dequantization is a convert+multiply that XLA fuses into the
consuming matmul, so decode reads half the weight bytes — on a
weight-bandwidth-bound chip that is directly ~2x decode throughput.

A quantized weight is a dict leaf ``{"q": int8 [in, out], "s": bf16 [out]}``;
the matmul helpers in ``train.lora``/``models.llama`` dequantize on use.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp

QUANT_TARGETS = ("q", "k", "v", "o", "gate", "up", "down")


def _quantize_2d(w: jax.Array, axis: int) -> dict:
    wf = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(wf), axis=axis, keepdims=True)
    scale = jnp.maximum(amax / 127.0, 1e-8)
    q = jnp.clip(jnp.round(wf / scale), -127, 127).astype(jnp.int8)
    # scales keep the source dtype so activation dtypes are unchanged
    return {"q": q, "s": scale.astype(w.dtype)}


_quantize_2d_jit = jax.jit(_quantize_2d, static_argnums=(1,), donate_argnums=(0,))


@functools.partial(jax.jit, static_argnums=(1,), donate_argnums=(0,))
def _quantize_3d(w: jax.Array, axis: int) -> dict:
    # lax.map keeps the fp32 intermediate at one layer's size; donating the
    # bf16 input lets XLA reuse its space for the outputs (at 7B the full
    # set of weights leaves no room for an extra copy)
    out = jax.lax.map(lambda wl: _quantize_2d(wl, axis - 1), w)
    return out


def quantize_weight(w: jax.Array, axis: int = 0) -> dict:
    """Symmetric per-channel int8 over the contraction axis' complement."""
    if w.ndim == 3:
        return _quantize_3d(w, axis)
    return _quantize_2d_jit(w, axis)


def dequantize_weight(leaf, dtype=jnp.bfloat16) -> jax.Array:
    if isinstance(leaf, dict) and "q" in leaf:
        return leaf["q"].astype(dtype) * leaf["s"].astype(dtype)
    return leaf


def is_quantized(leaf) -> bool:
    return isinstance(leaf, dict) and "q" in leaf and "s" in leaf


def quantize_llm_params(
    params: dict,
    targets: Sequence[str] = QUANT_TARGETS,
    quantize_embed: bool = True,
) -> dict:
    """Quantize the decoder's large matrices; norms/predictors stay bf16.

    Layer stacks are [L, in, out]: scales are per (layer, out-channel),
    quantized over the contraction (in) axis.

    MUTATES ``params`` in place, releasing each bf16 weight as soon as its
    int8 replacement exists — holding the full-precision and quantized sets
    simultaneously (13.5 + 6.8 GB at 7B) does not fit on one chip.
    """
    llm = params["llm"]
    layers = llm["layers"]
    for name in list(targets):
        if name in layers and not name.endswith("_lora"):
            w = layers.pop(name)
            layers[name] = quantize_weight(w, axis=1)
            del w
    if quantize_embed:
        emb = llm.pop("embed")
        llm["embed"] = quantize_weight(emb, axis=1)
        del emb
        if "lm_head" in llm:
            head = llm.pop("lm_head")
            llm["lm_head"] = quantize_weight(head, axis=0)
            del head
    return params
