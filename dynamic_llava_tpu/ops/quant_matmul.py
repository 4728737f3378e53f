"""Pallas dequantizing int4 matmul — reads each packed byte ONCE.

The XLA path (``quant.matmul_q4``) splits x @ W4 into per-nibble halves, so
every packed byte is streamed from HBM twice (~int8 traffic; measured 13B
int4 decode 39.1 tok/s ≈ 1.6x off the packed roofline —
docs/BENCHMARKS.md). This kernel unpacks BOTH nibbles of a weight block in
VMEM and feeds both half-matmuls from that single read, which is the whole
int4 bandwidth win on a weight-bound chip.

Replaces the reference's bitsandbytes 4-bit CUDA kernels
(/root/reference/llava/model/dynamic_llava_builder.py:51-60) on the TPU
side. Layout contract is ``quant.pack_int4``'s split-half format: packed
column j holds output column j in its LOW nibble and output column
``half + j`` in its HIGH nibble, so each grid block writes two disjoint
column blocks of the output.

Grid: (m_blocks, n_blocks, k_blocks), reduction (k) innermost; fp32
accumulators for both halves live in VMEM scratch and are scaled + written
on the last k step. ``quant.matmul_q4`` is the semantic oracle; tests run
this kernel in interpret mode against it.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _q4_matmul_kernel(
    x_ref,  # [TM, TK] activation block
    p_ref,  # [TK, TN] packed int4 pairs (int8)
    slo_ref,  # [1, TN] scales of the low-nibble output columns
    shi_ref,  # [1, TN] scales of the high-nibble output columns
    ylo_ref,  # [TM, TN] out block, columns [0, half)
    yhi_ref,  # [TM, TN] out block, columns [half, 2*half)
    acc_lo,  # [TM, TN] fp32 scratch
    acc_hi,  # [TM, TN] fp32 scratch
    *,
    n_k: int,
):
    kk = pl.program_id(2)

    @pl.when(kk == 0)
    def _zero():
        acc_lo[:] = jnp.zeros_like(acc_lo)
        acc_hi[:] = jnp.zeros_like(acc_hi)

    x = x_ref[:].astype(jnp.float32)
    p = p_ref[:].astype(jnp.int32)  # sign-extended bytes
    # ONE HBM read of the packed block serves both nibble halves
    lo = jnp.left_shift(p, 28) >> 28  # low nibble, sign-extended
    hi = p >> 4  # high nibble (int8->int32 already arithmetic)
    acc_lo[:] += jnp.dot(
        x, lo.astype(jnp.float32), preferred_element_type=jnp.float32
    )
    acc_hi[:] += jnp.dot(
        x, hi.astype(jnp.float32), preferred_element_type=jnp.float32
    )

    @pl.when(kk == n_k - 1)
    def _write():
        ylo_ref[:] = (acc_lo[:] * slo_ref[:].astype(jnp.float32)).astype(
            ylo_ref.dtype
        )
        yhi_ref[:] = (acc_hi[:] * shi_ref[:].astype(jnp.float32)).astype(
            yhi_ref.dtype
        )


def _pick_tile(dim: int, candidates=(512, 256, 128)) -> int:
    for c in candidates:
        if dim % c == 0:
            return c
    return 0


@functools.partial(
    jax.jit, static_argnames=("out_fp32", "interpret")
)
def matmul_q4_pallas(
    x: jax.Array,  # [..., K]
    packed: jax.Array,  # [K, half] int8 nibble pairs
    scales: jax.Array,  # [1, 2*half] per-output-column scales
    out_fp32: bool = False,
    interpret: bool = False,
) -> jax.Array:
    """x @ deq(packed) with split-half layout. Returns [..., 2*half]."""
    k_dim, half = packed.shape
    lead = x.shape[:-1]
    x2 = x.reshape(-1, k_dim)
    rows = x2.shape[0]

    tk = _pick_tile(k_dim)
    tn = _pick_tile(half)
    if not (tk and tn):
        raise ValueError(f"dims not tileable: K={k_dim}, half={half}")
    # decode is a handful of rows: one padded m block. Prefill uses 256-row
    # blocks so the weight stream is not re-read per tiny row group.
    tm = -(-rows // 8) * 8 if rows <= 64 else 256
    pad_m = -rows % tm
    if pad_m:
        x2 = jnp.pad(x2, ((0, pad_m), (0, 0)))
    m_pad = x2.shape[0]

    n_k = k_dim // tk
    grid = (m_pad // tm, half // tn, n_k)
    out_dtype = jnp.float32 if out_fp32 else x.dtype
    s_lo = scales[:, :half]
    s_hi = scales[:, half:]

    ylo, yhi = pl.pallas_call(
        functools.partial(_q4_matmul_kernel, n_k=n_k),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tm, tk), lambda i, j, k: (i, k)),
            pl.BlockSpec((tk, tn), lambda i, j, k: (k, j)),
            pl.BlockSpec((1, tn), lambda i, j, k: (0, j)),
            pl.BlockSpec((1, tn), lambda i, j, k: (0, j)),
        ],
        out_specs=[
            pl.BlockSpec((tm, tn), lambda i, j, k: (i, j)),
            pl.BlockSpec((tm, tn), lambda i, j, k: (i, j)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((m_pad, half), out_dtype),
            jax.ShapeDtypeStruct((m_pad, half), out_dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((tm, tn), jnp.float32),
            pltpu.VMEM((tm, tn), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(x2, packed, s_lo, s_hi)
    y = jnp.concatenate([ylo, yhi], axis=-1)
    if pad_m:
        y = y[:rows]
    return y.reshape(lead + (2 * half,))


def q4_kernel_supported(packed_shape) -> bool:
    k_dim, half = packed_shape[-2:]
    return bool(_pick_tile(k_dim) and _pick_tile(half))
