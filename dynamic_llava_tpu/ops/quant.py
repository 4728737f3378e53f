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


def pack_int4(q: jax.Array) -> jax.Array:
    """Pack int4-valued (int8-stored) numbers into nibble pairs along the
    LAST axis: element 2k in the low nibble, 2k+1 in the high nibble.

    Packed int8 is THIS REPO'S at-rest int4 format. ``jnp.int4`` buffers
    cannot be jit arguments or host-read through the axon TPU tunnel
    (jax-internal recursion / UNIMPLEMENTED), and packed nibbles read the
    same 0.5 bytes/weight from HBM — the consumer unpacks in-kernel with
    two shifts that XLA fuses into the dequantizing matmul."""
    q = jnp.asarray(q, jnp.int8)
    if q.shape[-1] % 2:
        raise ValueError(f"last dim must be even, got {q.shape}")
    lo = q[..., 0::2] & 0x0F
    hi = jnp.left_shift(q[..., 1::2] & 0x0F, 4)
    return (lo | hi).astype(jnp.int8)


def unpack_int4(packed: jax.Array) -> jax.Array:
    """Inverse of ``pack_int4``: nibble pairs -> int8-stored int4 values,
    last axis restored to 2x. jit-able; two shifts sign-extend."""
    packed = packed.astype(jnp.int8)
    lo = jnp.left_shift(packed, 4) >> 4
    hi = packed >> 4
    pair = jnp.stack([lo, hi], axis=-1)  # [..., n, 2]
    return pair.reshape(packed.shape[:-1] + (2 * packed.shape[-1],))


def _quantize_2d(w: jax.Array, axis: int, bits: int = 8) -> dict:
    """bits=8 -> int8 (bnb 8-bit parity); bits=4 -> nibble-packed int8
    (bnb 4-bit parity; 13B fits one v5e chip at 6.6 GB)."""
    wf = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(wf), axis=axis, keepdims=True)
    qmax = 127.0 if bits == 8 else 7.0
    scale = jnp.maximum(amax / qmax, 1e-8)
    q = jnp.clip(jnp.round(wf / scale), -qmax, qmax).astype(jnp.int8)
    # scales keep the source dtype so activation dtypes are unchanged
    if bits == 4:
        return {"q4": pack_int4(q), "s": scale.astype(w.dtype)}
    return {"q": q, "s": scale.astype(w.dtype)}


_quantize_2d_jit = jax.jit(
    _quantize_2d, static_argnums=(1, 2), donate_argnums=(0,)
)


@functools.partial(jax.jit, static_argnums=(1, 2), donate_argnums=(0,))
def _quantize_3d(w: jax.Array, axis: int, bits: int = 8) -> dict:
    # lax.map keeps the fp32 intermediate at one layer's size; donating the
    # bf16 input lets XLA reuse its space for the outputs (at 7B the full
    # set of weights leaves no room for an extra copy)
    out = jax.lax.map(lambda wl: _quantize_2d(wl, axis - 1, bits), w)
    return out


def quantize_weight(w: jax.Array, axis: int = 0, bits: int = 8) -> dict:
    """Symmetric per-channel int8/int4 over the contraction axis'
    complement."""
    if w.ndim == 3:
        return _quantize_3d(w, axis, bits)
    return _quantize_2d_jit(w, axis, bits)


def dequantize_weight(leaf, dtype=jnp.bfloat16) -> jax.Array:
    if isinstance(leaf, dict) and "q4" in leaf:
        return unpack_int4(leaf["q4"]).astype(dtype) * leaf["s"].astype(dtype)
    if isinstance(leaf, dict) and "q" in leaf:
        return leaf["q"].astype(dtype) * leaf["s"].astype(dtype)
    return leaf


def is_quantized(leaf) -> bool:
    return isinstance(leaf, dict) and "s" in leaf and (
        "q" in leaf or "q4" in leaf
    )


def transfer_quantized_params(params, device):
    """device_put a quantized param tree onto ``device``. Every leaf —
    including int4 (stored nibble-packed as int8, see pack_int4) — is a
    tunnel-safe dtype, so this is a plain tree device_put."""
    return jax.tree.map(lambda leaf: jax.device_put(leaf, device), params)


def quantize_llm_params(
    params: dict,
    targets: Sequence[str] = QUANT_TARGETS,
    quantize_embed: bool = True,
    bits: int = 8,
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
            layers[name] = quantize_weight(w, axis=1, bits=bits)
            del w
    if quantize_embed:
        emb = llm.pop("embed")
        llm["embed"] = quantize_weight(emb, axis=1, bits=bits)
        del emb
        if "lm_head" in llm:
            head = llm.pop("lm_head")
            llm["lm_head"] = quantize_weight(head, axis=0, bits=bits)
            del head
    return params


def init_quantized_llama_params(key, cfg, targets: Sequence[str] = QUANT_TARGETS,
                                bits: int = 8):
    """Random-initialize a decoder DIRECTLY in int8 (for benchmarking models
    whose full-precision weights would not fit on a chip — 13B bf16 is
    26 GB, its int8 form 13 GB). Layer norms stay bf16; statistics match
    quantize_llm_params(init(...)) on normal(0.02) weights."""
    import jax

    from ..models.llama import init_llama_params

    # shapes without materializing: init a tiny template per leaf
    shapes = jax.eval_shape(
        lambda k: init_llama_params(k, cfg, jnp.bfloat16), key
    )
    ks = iter(jax.random.split(key, 64))

    def build(path_name, leaf):
        name = path_name[-1] if path_name else ""
        quantize = (
            name in targets
            or name in ("embed", "lm_head")
        )
        if quantize and leaf.ndim >= 2:
            qmax = 127 if bits == 8 else 7
            q = jax.random.randint(
                next(ks), leaf.shape, -qmax, qmax + 1, dtype=jnp.int32
            ).astype(jnp.int8)
            # scale so dequantized stddev ~ 0.02 (uniform int std ~ qmax/sqrt3)
            s_shape = list(leaf.shape)
            axis = 0 if name == "lm_head" else leaf.ndim - 2
            s_shape[axis] = 1
            s = jnp.full(s_shape, 0.02 / (qmax / 1.732), jnp.bfloat16)
            if bits == 4:
                return {"q4": pack_int4(q), "s": s}
            return {"q": q, "s": s}
        if name.endswith("_ln") or name == "final_ln":
            return jnp.ones(leaf.shape, jnp.bfloat16)
        return jax.random.normal(next(ks), leaf.shape, jnp.bfloat16) * jnp.asarray(
            0.02, jnp.bfloat16
        )

    def walk(tree, path=()):
        if isinstance(tree, dict):
            return {k: walk(v, path + (k,)) for k, v in tree.items()}
        return build(path, tree)

    return walk(shapes)
