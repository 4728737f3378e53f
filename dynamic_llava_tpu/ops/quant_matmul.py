"""Pallas dequantizing int4 matmul — single-program streaming GEMV.

The XLA path (``quant.matmul_q4``) splits x @ W4 into per-nibble halves,
streaming every packed byte from HBM twice (~int8 traffic). A first
grid-tiled Pallas kernel read each byte once but LOST at decode (69.0 vs
75.1 tok/s, 7B-int4 B=1 measured): the ffn half-width 5504 only tiles at
128 lanes, so one matmul became hundreds of tiny sequential programs and
per-program overhead swamped the bandwidth saving — the same failure mode
as ``ops/decode_attention`` (docs/BENCHMARKS.md negative results).

This version is ONE program per matmul: the packed weight stays in HBM
(`memory_space=ANY`) and the kernel streams row blocks through a
double-buffered VMEM window (`make_async_copy`), unpacking BOTH nibbles of
each block once and accumulating both half-GEMVs in fp32 carries. All
per-program overhead is paid once; the DMA pipeline keeps HBM busy — the
single-read int4 roofline path for decode (rows <= 8). Prefill keeps the
XLA split path, which wins when compute dominates.

Layout contract is ``quant.pack_int4``'s split-half format. The XLA path
is the semantic oracle; tests run this kernel in interpret mode on CPU
and the dispatch is TPU-only.

Replaces the reference's bitsandbytes 4-bit CUDA kernels
(/root/reference/llava/model/dynamic_llava_builder.py:51-60).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _q4_gemv_kernel(
    li_ref,  # [1] int32 layer index into the stacked weight (SMEM)
    x_ref,  # [TM, K] activations (VMEM)
    slo_ref,  # [1, half] scales, low-nibble output columns (VMEM)
    shi_ref,  # [1, half] scales, high-nibble output columns (VMEM)
    p_hbm,  # [L, K, half] packed int4 pairs (stays in HBM; streamed)
    ylo_ref,  # [TM, half] out, columns [0, half)
    yhi_ref,  # [TM, half] out, columns [half, 2*half)
    *,
    tk: int,
):
    _, k_dim, half = p_hbm.shape
    n_chunks = k_dim // tk
    tm = x_ref.shape[0]
    li = li_ref[0]

    def body(bufs, sems):
        def dma(slot, idx):
            # indexing the LAYER dynamically here is the point: the full
            # [L, K, half] stack is the kernel input (a loop-invariant HBM
            # buffer), so a scan-over-layers never materializes a sliced
            # copy of the packed weights — a pallas_call cannot fuse a
            # producer dynamic-slice the way XLA fuses it into a dot
            return pltpu.make_async_copy(
                p_hbm.at[li, pl.ds(idx * tk, tk), :],
                bufs.at[slot],
                sems.at[slot],
            )

        dma(0, 0).start()

        def loop(i, acc):
            acc_lo, acc_hi = acc
            slot = jax.lax.rem(i, 2)

            @pl.when(i + 1 < n_chunks)
            def _():
                dma(jax.lax.rem(i + 1, 2), i + 1).start()

            dma(slot, i).wait()
            p = bufs[slot].astype(jnp.int32)
            # ONE HBM read of the block serves both nibble halves; nibble
            # values (±7) are exact in bf16, so the dots ride the MXU at
            # bf16 rate with fp32 accumulation
            lo = (jnp.left_shift(p, 28) >> 28).astype(jnp.bfloat16)
            hi = (p >> 4).astype(jnp.bfloat16)
            xb = x_ref[:, pl.ds(i * tk, tk)].astype(jnp.bfloat16)
            acc_lo = acc_lo + jnp.dot(
                xb, lo, preferred_element_type=jnp.float32
            )
            acc_hi = acc_hi + jnp.dot(
                xb, hi, preferred_element_type=jnp.float32
            )
            return acc_lo, acc_hi

        zeros = jnp.zeros((tm, half), jnp.float32)
        acc_lo, acc_hi = jax.lax.fori_loop(
            0, n_chunks, loop, (zeros, zeros)
        )
        ylo_ref[:] = (acc_lo * slo_ref[:].astype(jnp.float32)).astype(
            ylo_ref.dtype
        )
        yhi_ref[:] = (acc_hi * shi_ref[:].astype(jnp.float32)).astype(
            yhi_ref.dtype
        )

    pl.run_scoped(
        body,
        bufs=pltpu.VMEM((2, tk, half), jnp.int8),
        sems=pltpu.SemaphoreType.DMA((2,)),
    )


def _pick_tk(k_dim: int, half: int) -> int:
    """Row-block size: ~2 MB per buffer, int8-sublane (32) aligned."""
    for tk in (512, 256, 128, 64, 32):
        if k_dim % tk == 0 and tk * half <= (2 << 20):
            return tk
    return 0


@functools.partial(jax.jit, static_argnames=("out_fp32", "interpret"))
def matmul_q4_pallas(
    x: jax.Array,  # [..., K]
    packed: jax.Array,  # [K, half] or stacked [L, K, half] int8 nibble pairs
    scales: jax.Array,  # [1, 2*half] per-output-column scales (layer-sliced)
    layer: jax.Array | int = 0,  # layer index into a stacked weight
    out_fp32: bool = False,
    interpret: bool = False,
) -> jax.Array:
    """x @ deq(packed[layer]) with split-half layout. Returns [..., 2*half].
    Intended for GEMV-like row counts (decode); rows are padded to 8. A 2D
    ``packed`` is treated as a 1-layer stack (the reshape is free)."""
    if packed.ndim == 2:
        packed = packed[None]
    n_layers, k_dim, half = packed.shape
    lead = x.shape[:-1]
    x2 = x.reshape(-1, k_dim)
    rows = x2.shape[0]
    tk = _pick_tk(k_dim, half)
    if not tk:
        raise ValueError(f"K={k_dim} not tileable for half={half}")
    tm = -(-rows // 8) * 8
    if tm != rows:
        x2 = jnp.pad(x2, ((0, tm - rows), (0, 0)))

    out_dtype = jnp.float32 if out_fp32 else x.dtype
    li = jnp.asarray(layer, jnp.int32).reshape(1)
    ylo, yhi = pl.pallas_call(
        functools.partial(_q4_gemv_kernel, tk=tk),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),  # packed stays in HBM
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((tm, half), out_dtype),
            jax.ShapeDtypeStruct((tm, half), out_dtype),
        ],
        interpret=interpret,
    )(li, x2, scales[:, :half], scales[:, half:], packed)
    y = jnp.concatenate([ylo, yhi], axis=-1)
    if tm != rows:
        y = y[:rows]
    return y.reshape(lead + (2 * half,))


def q4_kernel_supported(packed_shape, rows: int) -> bool:
    """Dispatch contract: decode-sized row counts only (single-token step
    at any serving batch — still weight-bandwidth-bound; the MXU pads the
    row tile either way). The XLA split path wins for prefill, whose row
    counts are B*S >> 64 (compute-dominated; measured r3).

    The kernel's scoped-VMEM stack charge is the two fp32 output halves +
    the two fp32 accumulator carries + the double-buffered DMA window; it
    must fit the TPU's 16 MiB scoped limit (the compiler rejects the
    program otherwise — observed at rows=64 on the vocab-width lm_head,
    19.4 MiB). Oversized cases (in practice only lm_head at rows > 48)
    fall back to the XLA split path, which costs ~2% of decode traffic."""
    k_dim, half = packed_shape[-2:]
    tk = _pick_tk(k_dim, half)
    if rows > 64 or not tk:
        return False
    tm = -(-rows // 8) * 8
    stack_bytes = 2 * tm * half * 4 * 2 + 2 * tk * half
    return stack_bytes <= 16 * (1 << 20)
