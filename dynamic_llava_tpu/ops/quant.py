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
    LAST axis, split-half layout: element k rides the LOW nibble of byte k,
    element n/2+k the HIGH nibble (n = last-dim size).

    Packed int8 is THIS REPO'S at-rest int4 format. ``jnp.int4`` buffers
    cannot be jit arguments or host-read through the axon TPU tunnel
    (jax-internal recursion / UNIMPLEMENTED), and packed nibbles read the
    same 0.5 bytes/weight from HBM. Split-half (not interleaved!) so the
    unpack is two shifts + a CONCAT of contiguous slices — an interleaved
    layout needs stride-2 lane access and a reshuffle, which breaks XLA's
    dequant-into-matmul fusion on TPU (measured: 13B int4 decode 3.9 tok/s
    interleaved)."""
    q = jnp.asarray(q, jnp.int8)
    if q.shape[-1] % 2:
        raise ValueError(f"last dim must be even, got {q.shape}")
    half = q.shape[-1] // 2
    lo = q[..., :half] & 0x0F
    hi = jnp.left_shift(q[..., half:] & 0x0F, 4)
    return (lo | hi).astype(jnp.int8)


def unpack_int4(packed: jax.Array) -> jax.Array:
    """Inverse of ``pack_int4``: nibble pairs -> int8-stored int4 values,
    last axis restored to 2x. jit-able; the shifts sign-extend and the two
    halves concatenate back in order."""
    packed = packed.astype(jnp.int8)
    lo = jnp.left_shift(packed, 4) >> 4
    hi = packed >> 4
    return jnp.concatenate([lo, hi], axis=-1)


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


def _gemv_kernel_enabled(env_var: str) -> bool:
    """Pallas streaming-GEMV dispatch gate (decode-sized row counts only —
    see quant_matmul). Default: on for real TPU. Override with
    DYNAMIC_LLAVA_Q4_KERNEL=0/1 (int4) / DYNAMIC_LLAVA_Q8_KERNEL (int8)."""
    import os

    env = os.environ.get(env_var)
    if env is not None:
        return env not in ("0", "false", "False")
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:
        return False


def _q4_kernel_enabled() -> bool:
    return _gemv_kernel_enabled("DYNAMIC_LLAVA_Q4_KERNEL")


def _q4_unpack_mode() -> str:
    """Nibble-unpack domain inside the int4 GEMV kernel: "i32" (widen to
    32-bit lanes and shift) or "mask" (i8 ANDs + exact bf16 arithmetic —
    peak register traffic stays at 8/16-bit lanes; the earlier i8-shift
    idea is unimplementable: Mosaic legalizes no i8/i16 shifts on v5e).
    Override with DYNAMIC_LLAVA_Q4_UNPACK=mask; "i8" is accepted as an
    alias for "mask"."""
    import os

    mode = os.environ.get("DYNAMIC_LLAVA_Q4_UNPACK", "i32")
    if mode == "i8":
        return "mask"
    return mode if mode in ("i32", "mask") else "i32"


def matmul_q8(x: jax.Array, leaf: dict, out_fp32: bool = False) -> jax.Array:
    """x @ (q * s) for an int8 leaf WITHOUT materializing the bf16 weight
    at decode row counts.

    XLA fuses the int8 convert+scale into a B=1 GEMV, but at batched
    decode rows (measured at 7B B=24) it materializes the dequantized
    bf16 weight instead — int8 read + bf16 write + bf16 read is 3x the
    weight traffic, and the weight matmuls ARE the batched decode step
    (decode_profile: attention/head/cache-write no-op variants all time
    ~52 ms of the 52 ms step). The streaming GEMV kernel reads each byte
    once at any rows <= 64. Prefill row counts keep the XLA einsum, whose
    dequant fuses fine when compute dominates."""
    q, s = leaf["q"], leaf["s"]
    li = leaf.get("li")  # stacked leaf from index_layer: q is [L, K, N]
    if _gemv_kernel_enabled("DYNAMIC_LLAVA_Q8_KERNEL"):
        from .quant_matmul import matmul_q8_pallas, q8_kernel_supported

        rows = 1
        for d in x.shape[:-1]:
            rows *= d
        if q8_kernel_supported(q.shape, rows):
            return matmul_q8_pallas(
                x, q, s, layer=0 if li is None else li, out_fp32=out_fp32
            )
        if li is None and q.ndim == 2:
            # Vocab-width weights (the lm_head) exceed the one-block VMEM
            # plan at batched-decode rows; split the OUTPUT columns over
            # a few kernel calls instead of falling to the XLA einsum —
            # measured at 7B-int8 B=24, the einsum path cost ~96 ms/step
            # (4x the entire rest of the decode step).
            from .quant_matmul import matmul_q8_col_split, q8_col_split_parts

            if q8_col_split_parts(q.shape, rows):
                return matmul_q8_col_split(x, q, s, out_fp32=out_fp32)
    if li is not None:
        # XLA fallback: the dynamic layer slice fuses into the dot below
        q = jax.lax.dynamic_index_in_dim(q, li, axis=0, keepdims=False)
    w = q.astype(x.dtype) * s.astype(x.dtype)
    acc = jnp.float32 if out_fp32 else None
    return jnp.einsum("...i,io->...o", x, w, preferred_element_type=acc)


def matmul_q4(x: jax.Array, leaf: dict, out_fp32: bool = False) -> jax.Array:
    """x @ W for a packed-int4 leaf WITHOUT materializing the dequantized
    weights.

    On TPU this dispatches to the Pallas kernel (``quant_matmul``), which
    unpacks both nibbles from ONE read of each packed byte. The XLA
    fallback uses the split-half layout: each nibble is a contiguous half
    of the OUTPUT columns, so y = concat(x @ deq(lo), x @ deq(hi)) — each
    half's shift+scale is elementwise on the packed buffer and fuses into
    its matmul exactly like the int8 convert does, but the packed buffer
    is streamed once per half. (A single materialized dequant ran 13B
    decode at 24 tok/s — the bf16 write+read tripled the weight traffic.)"""
    p, s = leaf["q4"], leaf["s"]
    li = leaf.get("li")  # stacked leaf from index_layer: p is [L, K, half]
    if _q4_kernel_enabled():
        from .quant_matmul import matmul_q4_pallas, q4_kernel_supported

        rows = 1
        for d in x.shape[:-1]:
            rows *= d
        if q4_kernel_supported(p.shape, rows):
            return matmul_q4_pallas(
                x, p, s, layer=0 if li is None else li, out_fp32=out_fp32,
                unpack=_q4_unpack_mode(),
            )
        if li is None and p.ndim == 2:
            # Vocab-width int4 lm_head at batched-decode rows > 48: the
            # one-block VMEM plan exceeds the scoped limit; split the
            # packed columns over a few kernel calls (the int8 lm_head's
            # col-split treatment) instead of falling to the XLA path
            from .quant_matmul import matmul_q4_col_split, q4_col_split_parts

            if q4_col_split_parts(p.shape, rows):
                return matmul_q4_col_split(
                    x, p, s, out_fp32=out_fp32, unpack=_q4_unpack_mode()
                )
    if li is not None:
        # XLA fallback: the dynamic layer slice fuses into the dots below
        p = jax.lax.dynamic_index_in_dim(p, li, axis=0, keepdims=False)
    half = p.shape[-1]
    s_lo = s[..., :half].astype(x.dtype)
    s_hi = s[..., half:].astype(x.dtype)
    lo = (jnp.left_shift(p, 4) >> 4).astype(x.dtype) * s_lo
    hi = (p >> 4).astype(x.dtype) * s_hi
    acc = jnp.float32 if out_fp32 else None
    return jnp.concatenate([
        jnp.einsum("...i,io->...o", x, lo, preferred_element_type=acc),
        jnp.einsum("...i,io->...o", x, hi, preferred_element_type=acc),
    ], axis=-1)


def matmul_q8_group(x: jax.Array, lp: dict, names, out_fp32: bool = False):
    """Grouped streaming GEMV over several int8 leaves sharing ``x`` (the
    q/k/v and gate/up projections): ONE kernel launch per group instead
    of one per matmul, amortizing the ~64 us per-program overhead that
    dominates batched decode once the weight streams are at bandwidth.

    Returns a tuple of outputs in ``names`` order, or None when the group
    is not kernel-eligible (not all int8, mismatched layer indices,
    prefill row counts, or no VMEM plan) — the caller then falls back to
    per-name ``lora_proj``/``matmul_q8``."""
    leaves = [lp.get(n) for n in names]
    if not all(
        isinstance(l, dict) and "q" in l and "s" in l for l in leaves
    ):
        return None
    if not _gemv_kernel_enabled("DYNAMIC_LLAVA_Q8_KERNEL"):
        return None
    li = leaves[0].get("li")
    # index_layer attaches the SAME index object to every leaf of a layer;
    # identity is the cheap tracer-safe equality here
    if any(l.get("li") is not li for l in leaves[1:]):
        return None
    from .quant_matmul import _q8_multi_plan, matmul_q8_multi_pallas

    rows = 1
    for d in x.shape[:-1]:
        rows *= d
    qs = [l["q"] for l in leaves]
    k_dim = qs[0].shape[-2]
    if any(q.shape[-2] != k_dim for q in qs):
        return None
    if _q8_multi_plan(k_dim, [q.shape[-1] for q in qs], rows) is None:
        return None
    return matmul_q8_multi_pallas(
        x, tuple(qs), tuple(l["s"] for l in leaves),
        layer=0 if li is None else li, out_fp32=out_fp32,
    )


def matmul_q4_group(x: jax.Array, lp: dict, names, out_fp32: bool = False):
    """Grouped streaming GEMV over several PACKED-int4 leaves sharing
    ``x`` — the int4 twin of ``matmul_q8_group``. Slope-timed probing
    (late r3) showed the B=1 int4 decode step's gap to its single-read
    floor is ~10 us per-program overhead x 7 launches/layer; grouping
    q/k/v and gate/up cuts that to 4 launches. Returns outputs in
    ``names`` order, or None when not kernel-eligible."""
    leaves = [lp.get(n) for n in names]
    if not all(
        isinstance(l, dict) and "q4" in l and "s" in l for l in leaves
    ):
        return None
    if not _q4_kernel_enabled():
        return None
    li = leaves[0].get("li")
    if any(l.get("li") is not li for l in leaves[1:]):
        return None
    from .quant_matmul import _q4_multi_plan, matmul_q4_multi_pallas

    rows = 1
    for d in x.shape[:-1]:
        rows *= d
    packs = [l["q4"] for l in leaves]
    k_dim = packs[0].shape[-2]
    if any(p.shape[-2] != k_dim for p in packs):
        return None
    if _q4_multi_plan(k_dim, [p.shape[-1] for p in packs], rows) is None:
        return None
    return matmul_q4_multi_pallas(
        x, tuple(packs), tuple(l["s"] for l in leaves),
        layer=0 if li is None else li, out_fp32=out_fp32,
        unpack=_q4_unpack_mode(),
    )


def matmul_q4_mlp(x: jax.Array, lp: dict, out_fp32: bool = False,
                  interpret: bool = False):
    """The whole SwiGLU MLP — silu(x@gate) * (x@up) @ down — as ONE
    streaming program when all three leaves are packed int4
    (``quant_matmul.matmul_q4_mlp_pallas``). Beyond the grouped gate/up
    launch this saves the separate down launch AND the XLA elementwise
    program between them (~10 us per-program overhead each,
    run/q4_kernel_probe.py), and phase B's down stream starts on a hot
    DMA pipeline (its first windows prefetch during the gate/up phase).

    Returns the MLP output, or None when not kernel-eligible (not all
    int4, mismatched layer indices, any gate/up/down LoRA adapter — its
    delta must apply before the in-kernel silu — prefill row counts, or
    no VMEM plan); the caller falls back to the grouped/two-program path."""
    leaves = [lp.get(n) for n in ("gate", "up", "down")]
    if not all(
        isinstance(l, dict) and "q4" in l and "s" in l for l in leaves
    ):
        return None
    if any(lp.get(f"{n}_lora") is not None for n in ("gate", "up", "down")):
        return None
    if not _q4_kernel_enabled():
        return None
    # OPT-IN only (DYNAMIC_LLAVA_Q4_MLP=1): slope-timed on the v5e the
    # fused program LOSES to the two-program path (112.5 vs 105.6 us at
    # rows=1, 130.5 vs 116.0 at rows=24, 7B shapes) — back-to-back
    # launches partially pipeline, so fusing saves less than the naive
    # per-launch accounting and the in-kernel serialization costs more.
    # Kept as tested infrastructure (ROUND4_NOTES.md).
    import os

    if os.environ.get("DYNAMIC_LLAVA_Q4_MLP") not in ("1", "true", "True"):
        return None
    g, u, d = leaves
    li = g.get("li")
    if u.get("li") is not li or d.get("li") is not li:
        return None
    from .quant_matmul import _q4_mlp_plan, matmul_q4_mlp_pallas

    rows = 1
    for dim in x.shape[:-1]:
        rows *= dim
    k_dim, half_f = g["q4"].shape[-2:]
    f_dim, half_d = d["q4"].shape[-2:]
    if u["q4"].shape[-2:] != (k_dim, half_f) or f_dim != 2 * half_f:
        return None
    if _q4_mlp_plan(k_dim, half_f, half_d, rows) is None:
        return None
    return matmul_q4_mlp_pallas(
        x, g["q4"], u["q4"], d["q4"], g["s"], u["s"], d["s"],
        layer=0 if li is None else li, out_fp32=out_fp32,
        unpack=_q4_unpack_mode(), interpret=interpret,
    )


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
            # scale so dequantized stddev ~ 0.02: discrete uniform on
            # [-qmax, qmax] has std sqrt(((2*qmax+1)^2 - 1) / 12) — matching
            # what quantize_llm_params produces on normal(0.02) weights
            n_levels = 2 * qmax + 1
            uniform_std = ((n_levels * n_levels - 1) / 12.0) ** 0.5
            s_shape = list(leaf.shape)
            axis = 0 if name == "lm_head" else leaf.ndim - 2
            s_shape[axis] = 1
            s = jnp.full(s_shape, 0.02 / uniform_std, jnp.bfloat16)
            if bits == 4:
                # draw each nibble HALF separately in [-qmax, qmax] (the real
                # quantizer clips to ±7, never emits -8) and pack the halves
                # arithmetically: transients stay at packed size per half, so
                # a 13B tree never holds a full unpacked int8 copy
                packed_shape = leaf.shape[:-1] + (leaf.shape[-1] // 2,)
                k1, k2 = jax.random.split(next(ks))
                lo = jax.random.randint(
                    k1, packed_shape, -qmax, qmax + 1, dtype=jnp.int8
                )
                hi = jax.random.randint(
                    k2, packed_shape, -qmax, qmax + 1, dtype=jnp.int8
                )
                q4 = (lo & 0x0F) | jnp.left_shift(hi & 0x0F, 4)
                return {"q4": q4.astype(jnp.int8), "s": s}
            # int8 directly: an int32 intermediate for a 13B stacked leaf
            # ([40, 5120, 13824]) is 11.3 GB and OOMs the chip during init
            q = jax.random.randint(
                next(ks), leaf.shape, -qmax, qmax + 1, dtype=jnp.int8
            )
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
