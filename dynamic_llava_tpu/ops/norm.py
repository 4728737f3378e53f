"""Normalization ops.

RMSNorm matches the reference ``LlamaRMSNorm``
(/root/reference/llava/model/language_model/dynamic_modeling_llama.py:125-142):
variance in fp32, weight applied in the input dtype. LayerNorm is used by the
CLIP tower and the predictor blocks.

Both are left to XLA fusion — on TPU these are pure VPU ops that fuse into
the surrounding matmul prologue/epilogue; a hand-written Pallas kernel buys
nothing here.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def rms_norm(x: jax.Array, weight: jax.Array, eps: float = 1e-5) -> jax.Array:
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    xf = xf * jax.lax.rsqrt(var + eps)
    return weight * xf.astype(dtype)


def layer_norm(
    x: jax.Array, weight: jax.Array, bias: jax.Array, eps: float = 1e-5
) -> jax.Array:
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    xf = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (xf.astype(dtype) * weight + bias).astype(dtype)
