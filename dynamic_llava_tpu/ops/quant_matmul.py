"""Pallas dequantizing int4/int8 matmuls — single-program streaming GEMVs.

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

The int8 variant exists for a different reason than byte traffic: XLA
fuses the int8 convert+scale into a GEMV at decode B=1, but at BATCHED
decode row counts (B in [9, 64]) it switches to materializing the
dequantized bf16 weight — tripling weight traffic (int8 read + bf16
write + bf16 read). Measured at 7B-int8 B=24: the full decode step,
decode attention, cache writes, and lm_head each patched to no-ops all
time ~52 ms — the weight matmuls ARE the step. The streaming GEMV reads
each int8 byte exactly once at every decode row count.

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
    unpack: str = "i32",
    depth: int = 2,
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

        # depth-deep DMA pipeline: chunks whose compute is trivial (GEMV
        # rows) stall on DMA issue-to-completion latency every chunk at
        # depth 2 — the measured 49%-roofline `down` matmul (43 chunks at
        # tk=256, the largest 128-multiple divisor of K=11008) is the
        # worst case. Keeping depth-1 copies in flight hides the issue
        # latency behind the previous chunks' transfers.
        for j in range(min(depth - 1, n_chunks)):
            dma(j, j).start()

        def loop(i, acc):
            acc_lo, acc_hi = acc
            slot = jax.lax.rem(i, depth)

            @pl.when(i + depth - 1 < n_chunks)
            def _():
                dma(jax.lax.rem(i + depth - 1, depth), i + depth - 1).start()

            dma(slot, i).wait()
            # ONE HBM read of the block serves both nibble halves; nibble
            # values (±7) are exact in bf16, so the dots ride the MXU at
            # bf16 rate with fp32 accumulation
            # "mask" = narrow-lane unpack (knob DYNAMIC_LLAVA_Q4_UNPACK):
            # Mosaic on v5e legalizes ONLY bitwise AND on 8-bit lanes
            # (i8/i16 shifts, i8 mul/cmp, and even bf16 compares all fail
            # to legalize — each probed on hardware; the original i8-shift
            # form died on arith.shli), so it is ANDs + exact bf16
            # arithmetic: (p & 7) − (p & 8) for the low nibble,
            # (p & 0xF0)·2⁻⁴ for the high one. Measured 20–60% SLOWER
            # than the default i32 widen+shift on every decode shape
            # (slope-timed, docs/BENCHMARKS.md) — kept as the tested
            # negative result / fallback, not a speed knob.
            lo, hi = _q4_unpack_block(bufs[slot], unpack)
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
        bufs=pltpu.VMEM((depth, tk, half), jnp.int8),
        sems=pltpu.SemaphoreType.DMA((depth,)),
    )


def _window_cap() -> int:
    """Per-DMA-window byte cap for the streaming GEMV plans. Default 2 MB;
    DYNAMIC_LLAVA_Q4_WINDOW_MB overrides (probe knob — the residual
    per-chunk cost is scalar wait/issue work, so fewer/larger windows is
    the lever the slope probe sweeps before any default changes)."""
    import os

    try:
        return int(
            float(os.environ.get("DYNAMIC_LLAVA_Q4_WINDOW_MB", "2"))
            * (1 << 20)
        )
    except ValueError:
        return 2 << 20


def _pick_tk(k_dim: int, half: int) -> int:
    """Row-block size: ~2 MB per buffer, int8-sublane (32) aligned."""
    cap = _window_cap()
    for tk in (512, 256, 128, 64, 32):
        if k_dim % tk == 0 and tk * half <= cap:
            return tk
    return 0


@functools.partial(
    jax.jit, static_argnames=("out_fp32", "interpret", "unpack")
)
def matmul_q4_pallas(
    x: jax.Array,  # [..., K]
    packed: jax.Array,  # [K, half] or stacked [L, K, half] int8 nibble pairs
    scales: jax.Array,  # [1, 2*half] per-output-column scales (layer-sliced)
    layer: jax.Array | int = 0,  # layer index into a stacked weight
    out_fp32: bool = False,
    interpret: bool = False,
    unpack: str = "i32",
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
    # opportunistic deeper DMA pipeline: upgrade 2 -> 4 slots when the two
    # extra windows still fit the scoped-VMEM stack (the dispatch boundary
    # in q4_kernel_supported stays at depth 2, so coverage is unchanged)
    depth = 2
    if k_dim // tk > 4:
        stack4 = 2 * tm * half * 4 * 2 + 4 * tk * half + tm * k_dim * 2
        if stack4 <= 12 * (1 << 20):
            depth = 4
    ylo, yhi = pl.pallas_call(
        functools.partial(
            _q4_gemv_kernel, tk=tk, unpack=unpack, depth=depth
        ),
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


def _q8_gemv_kernel(
    li_ref,  # [1] int32 layer index into the stacked weight (SMEM)
    x_ref,  # [TM, K] activations (VMEM)
    s_ref,  # [1, N] per-output-column scales (VMEM)
    q_hbm,  # [L, K, N] int8 weights (stays in HBM; streamed)
    y_ref,  # [TM, N] out
    *,
    tk: int,
    depth: int = 2,
):
    _, k_dim, n = q_hbm.shape
    n_chunks = k_dim // tk
    tm = x_ref.shape[0]
    li = li_ref[0]

    def body(bufs, sems):
        def dma(slot, idx):
            # full [L, K, N] stack + dynamic layer index, same contract as
            # the int4 kernel: a pallas_call input cannot fuse a producer
            # dynamic-slice, so slicing outside would copy the layer weights
            return pltpu.make_async_copy(
                q_hbm.at[li, pl.ds(idx * tk, tk), :],
                bufs.at[slot],
                sems.at[slot],
            )

        # depth-deep DMA pipeline (see the int4 kernel): GEMV-row compute
        # is too small to cover DMA issue latency at depth 2 when the
        # chunk count is high
        for c in range(min(depth - 1, n_chunks)):
            dma(c, c).start()

        def loop(i, acc):
            slot = jax.lax.rem(i, depth)

            @pl.when(i + depth - 1 < n_chunks)
            def _():
                dma(jax.lax.rem(i + depth - 1, depth),
                    i + depth - 1).start()

            dma(slot, i).wait()
            # int8 values (±127) are exact in bf16: the dot rides the MXU
            # at bf16 rate with fp32 accumulation
            w = bufs[slot].astype(jnp.bfloat16)
            xb = x_ref[:, pl.ds(i * tk, tk)].astype(jnp.bfloat16)
            return acc + jnp.dot(xb, w, preferred_element_type=jnp.float32)

        acc = jax.lax.fori_loop(
            0, n_chunks, loop, jnp.zeros((tm, n), jnp.float32)
        )
        y_ref[:] = (acc * s_ref[:].astype(jnp.float32)).astype(y_ref.dtype)

    pl.run_scoped(
        body,
        bufs=pltpu.VMEM((depth, tk, n), jnp.int8),
        sems=pltpu.SemaphoreType.DMA((depth,)),
    )


def _q8_plan(k_dim: int, n: int, rows: int):
    """(tk, tm) for the int8 kernel, or None if unsupported.

    tk must be a multiple of 128 (a bf16 vector load narrower than the
    128-lane register is rejected by the TPU compiler — observed at tk=64
    on the vocab-width lm_head). The DMA window prefers ~2 MB per buffer
    and widens to 4 MB when a 128-row block of a wide output exceeds it
    (the 32000-wide lm_head at tk=128 is 4.1 MB); the widened window plus
    the fp32 accumulator CARRY (double-buffered by the loop — the
    compiler charges two copies; measured 16.38 MiB vs a two-copy
    estimate of 13.7 at the lm_head tm=24 shape), the out block, and the
    x input must fit the 16 MiB scoped-VMEM limit with margin. That caps
    the vocab-width lm_head at rows<=16; every 7B/13B layer width stays
    on the kernel through rows=64."""
    if rows > 64:
        return None
    tm = -(-rows // 8) * 8
    for budget in (2 << 20, 4 << 20):
        for tk in (512, 256, 128):
            if k_dim % tk or tk * n > budget:
                continue
            stack_bytes = 3 * tm * n * 4 + 2 * tk * n + tm * k_dim * 2
            if stack_bytes <= 15 * (1 << 20):
                return tk, tm
    return None


@functools.partial(jax.jit, static_argnames=("out_fp32", "interpret"))
def matmul_q8_pallas(
    x: jax.Array,  # [..., K]
    q: jax.Array,  # [K, N] or stacked [L, K, N] int8
    scales: jax.Array,  # [1, N] per-output-column scales (layer-sliced)
    layer: jax.Array | int = 0,
    out_fp32: bool = False,
    interpret: bool = False,
) -> jax.Array:
    """x @ (q[layer] * scales) without materializing the bf16 weight.
    Decode-sized row counts; rows are padded to 8."""
    if q.ndim == 2:
        q = q[None]
    n_layers, k_dim, n = q.shape
    lead = x.shape[:-1]
    x2 = x.reshape(-1, k_dim)
    rows = x2.shape[0]
    plan = _q8_plan(k_dim, n, rows)
    if plan is None:
        raise ValueError(f"K={k_dim}, N={n} not tileable at rows={rows}")
    tk, tm = plan
    if tm != rows:
        x2 = jnp.pad(x2, ((0, tm - rows), (0, 0)))

    out_dtype = jnp.float32 if out_fp32 else x.dtype
    li = jnp.asarray(layer, jnp.int32).reshape(1)
    # opportunistic deeper DMA pipeline (see matmul_q4_pallas; measured
    # NEUTRAL at 7B-int4 B=1 — the per-chunk cost is scalar-unit
    # wait/issue work, not unhidden latency — kept for high-chunk-count
    # shapes where two in-flight copies cannot cover a transfer hiccup)
    depth = 2
    if k_dim // tk > 4:
        stack4 = 3 * tm * n * 4 + 4 * tk * n + tm * k_dim * 2
        if stack4 <= 12 * (1 << 20):
            depth = 4
    y = pl.pallas_call(
        functools.partial(_q8_gemv_kernel, tk=tk, depth=depth),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),  # weights stay in HBM
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((tm, n), out_dtype),
        interpret=interpret,
    )(li, x2, scales.reshape(1, n), q)
    if tm != rows:
        y = y[:rows]
    return y.reshape(lead + (n,))


def q8_kernel_supported(q_shape, rows: int) -> bool:
    """Same dispatch contract as the int4 rule below: decode-sized row
    counts, a 128-multiple K tile, and a scoped-VMEM stack (fp32 out +
    fp32 accumulator carry + double-buffered DMA window) under the 16 MiB
    limit — see _q8_plan. The N axis is unsplit (one output block), so
    the vocab-width lm_head falls back above rows=16 and the XLA einsum
    (a ~0.3 GB/step dequant materialization at B=24, ~2% of traffic)
    serves it."""
    k_dim, n = q_shape[-2:]
    return _q8_plan(k_dim, n, rows) is not None


def _q8_gemv_multi_kernel(li_ref, x_ref, *refs, tk: int, n_w: int,
                          depth: int = 2):
    """n_w weights sharing the SAME activations and contraction dim,
    streamed in ONE program: refs = s_0..s_{n-1} (VMEM), p_0..p_{n-1}
    (HBM), y_0..y_{n-1} (VMEM out). The per-program fixed overhead
    (~64 us measured on the v5e: launch + DMA spin-up + in/out staging)
    is paid once for the group instead of once per matmul — q/k/v and
    gate/up are the natural groups (7 -> 4 kernel launches per decode
    layer)."""
    s_refs = refs[:n_w]
    p_refs = refs[n_w:2 * n_w]
    y_refs = refs[2 * n_w:]
    k_dim = p_refs[0].shape[-2]
    n_chunks = k_dim // tk
    tm = x_ref.shape[0]
    li = li_ref[0]

    def body(*scoped):
        bufs = scoped[:n_w]
        sems = scoped[n_w:]

        def dma(j, slot, idx):
            return pltpu.make_async_copy(
                p_refs[j].at[li, pl.ds(idx * tk, tk), :],
                bufs[j].at[slot],
                sems[j].at[slot],
            )

        for c in range(min(depth - 1, n_chunks)):
            for j in range(n_w):
                dma(j, c, c).start()

        def loop(i, accs):
            slot = jax.lax.rem(i, depth)

            @pl.when(i + depth - 1 < n_chunks)
            def _():
                for j in range(n_w):
                    dma(j, jax.lax.rem(i + depth - 1, depth),
                        i + depth - 1).start()

            xb = x_ref[:, pl.ds(i * tk, tk)].astype(jnp.bfloat16)
            new = []
            for j in range(n_w):
                dma(j, slot, i).wait()
                w = bufs[j][slot].astype(jnp.bfloat16)
                new.append(accs[j] + jnp.dot(
                    xb, w, preferred_element_type=jnp.float32
                ))
            return tuple(new)

        accs = jax.lax.fori_loop(
            0, n_chunks, loop,
            tuple(
                jnp.zeros((tm, p.shape[-1]), jnp.float32) for p in p_refs
            ),
        )
        for j in range(n_w):
            y_refs[j][:] = (
                accs[j] * s_refs[j][:].astype(jnp.float32)
            ).astype(y_refs[j].dtype)

    pl.run_scoped(
        body,
        *[pltpu.VMEM((depth, tk, p.shape[-1]), jnp.int8) for p in p_refs],
        *[pltpu.SemaphoreType.DMA((depth,)) for _ in p_refs],
    )


def _q8_multi_plan(k_dim: int, ns, rows: int):
    """(tk, tm) for a grouped int8 GEMV, or None. Same VMEM accounting as
    _q8_plan, summed over the group's windows/accumulators/outputs."""
    if rows > 64:
        return None
    tm = -(-rows // 8) * 8
    # prefer the LARGEST tk whose total stack fits: shrinking tk to fit a
    # window budget first (as the initial version did) traded kernel-launch
    # overhead for DMA granularity and measured step-time-neutral
    for tk in (512, 256, 128):
        if k_dim % tk or any(tk * n > (2 << 20) for n in ns):
            continue
        stack = sum(3 * tm * n * 4 + 2 * tk * n for n in ns)
        stack += tm * k_dim * 2
        if stack <= 15 * (1 << 20):
            return tk, tm
    return None


@functools.partial(
    jax.jit, static_argnames=("out_fp32", "interpret")
)
def matmul_q8_multi_pallas(
    x: jax.Array,  # [..., K]
    qs: tuple,  # n_w stacked [L, K, N_j] (or [K, N_j]) int8 weights
    scales: tuple,  # n_w layer-sliced [1, N_j] scales
    layer: jax.Array | int = 0,
    out_fp32: bool = False,
    interpret: bool = False,
):
    """One streaming program for a group of matmuls over the same x.
    Returns a tuple of [..., N_j] outputs."""
    qs = tuple(q[None] if q.ndim == 2 else q for q in qs)
    k_dim = qs[0].shape[-2]
    ns = [q.shape[-1] for q in qs]
    lead = x.shape[:-1]
    x2 = x.reshape(-1, k_dim)
    rows = x2.shape[0]
    plan = _q8_multi_plan(k_dim, ns, rows)
    if plan is None:
        raise ValueError(f"no multi plan for K={k_dim} ns={ns} rows={rows}")
    tk, tm = plan
    if tm != rows:
        x2 = jnp.pad(x2, ((0, tm - rows), (0, 0)))
    out_dtype = jnp.float32 if out_fp32 else x.dtype
    li = jnp.asarray(layer, jnp.int32).reshape(1)
    n_w = len(qs)
    # opportunistic deeper DMA pipeline (see matmul_q4_pallas)
    depth = 2
    if k_dim // tk > 4:
        stack4 = sum(3 * tm * n * 4 + 4 * tk * n for n in ns)
        stack4 += tm * k_dim * 2
        if stack4 <= 12 * (1 << 20):
            depth = 4
    ys = pl.pallas_call(
        functools.partial(
            _q8_gemv_multi_kernel, tk=tk, n_w=n_w, depth=depth
        ),
        in_specs=(
            [pl.BlockSpec(memory_space=pltpu.SMEM),
             pl.BlockSpec(memory_space=pltpu.VMEM)]
            + [pl.BlockSpec(memory_space=pltpu.VMEM)] * n_w
            + [pl.BlockSpec(memory_space=pltpu.ANY)] * n_w
        ),
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * n_w,
        out_shape=[
            jax.ShapeDtypeStruct((tm, n), out_dtype) for n in ns
        ],
        interpret=interpret,
    )(li, x2, *[s.reshape(1, -1) for s in scales], *qs)
    outs = []
    for y, n in zip(ys, ns):
        if tm != rows:
            y = y[:rows]
        outs.append(y.reshape(lead + (n,)))
    return tuple(outs)


def _q4_unpack_block(p8, unpack: str):
    """Unpack a packed int4 block to (lo, hi) bf16 — shared by the single
    and grouped GEMV kernels. Nibble values (±7) are exact in bf16."""
    if unpack == "mask":
        lo = (p8 & jnp.int8(7)).astype(jnp.bfloat16) - \
            (p8 & jnp.int8(8)).astype(jnp.bfloat16)
        hi = (p8 & jnp.int8(-16)).astype(jnp.bfloat16) * \
            jnp.bfloat16(0.0625)
        return lo, hi
    p = p8.astype(jnp.int32)
    lo = (jnp.left_shift(p, 28) >> 28).astype(jnp.bfloat16)
    hi = (p >> 4).astype(jnp.bfloat16)
    return lo, hi


def _q4_gemv_multi_kernel(li_ref, x_ref, *refs, tk: int, n_w: int,
                          unpack: str, depth: int = 2):
    """n_w PACKED-int4 weights sharing the same activations and
    contraction dim, streamed in ONE program (the int4 twin of
    ``_q8_gemv_multi_kernel``): refs = slo_0..slo_{n-1}, shi_0..shi_{n-1}
    (VMEM), p_0..p_{n-1} (HBM), ylo_0, yhi_0, ..
    Slope-timed per-call probing (run/q4_kernel_probe.py, late r3) put
    the B=1 int4 decode step's gap to its single-read floor at ~10 us
    per-program overhead x 7 launches/layer — grouping q/k/v and gate/up
    (7 -> 4 launches) attacks exactly that."""
    slo_refs = refs[:n_w]
    shi_refs = refs[n_w:2 * n_w]
    p_refs = refs[2 * n_w:3 * n_w]
    y_refs = refs[3 * n_w:]
    k_dim = p_refs[0].shape[-2]
    n_chunks = k_dim // tk
    tm = x_ref.shape[0]
    li = li_ref[0]

    def body(*scoped):
        bufs = scoped[:n_w]
        sems = scoped[n_w:]

        def dma(j, slot, idx):
            return pltpu.make_async_copy(
                p_refs[j].at[li, pl.ds(idx * tk, tk), :],
                bufs[j].at[slot],
                sems[j].at[slot],
            )

        for c in range(min(depth - 1, n_chunks)):
            for j in range(n_w):
                dma(j, c, c).start()

        def loop(i, accs):
            slot = jax.lax.rem(i, depth)

            @pl.when(i + depth - 1 < n_chunks)
            def _():
                for j in range(n_w):
                    dma(j, jax.lax.rem(i + depth - 1, depth),
                        i + depth - 1).start()

            xb = x_ref[:, pl.ds(i * tk, tk)].astype(jnp.bfloat16)
            new = []
            for j in range(n_w):
                dma(j, slot, i).wait()
                lo, hi = _q4_unpack_block(bufs[j][slot], unpack)
                acc_lo, acc_hi = accs[2 * j], accs[2 * j + 1]
                new.append(acc_lo + jnp.dot(
                    xb, lo, preferred_element_type=jnp.float32
                ))
                new.append(acc_hi + jnp.dot(
                    xb, hi, preferred_element_type=jnp.float32
                ))
            return tuple(new)

        accs = jax.lax.fori_loop(
            0, n_chunks, loop,
            tuple(
                jnp.zeros((tm, p.shape[-1]), jnp.float32)
                for p in p_refs for _ in (0, 1)
            ),
        )
        for j in range(n_w):
            y_refs[2 * j][:] = (
                accs[2 * j] * slo_refs[j][:].astype(jnp.float32)
            ).astype(y_refs[2 * j].dtype)
            y_refs[2 * j + 1][:] = (
                accs[2 * j + 1] * shi_refs[j][:].astype(jnp.float32)
            ).astype(y_refs[2 * j + 1].dtype)

    pl.run_scoped(
        body,
        *[pltpu.VMEM((depth, tk, p.shape[-1]), jnp.int8) for p in p_refs],
        *[pltpu.SemaphoreType.DMA((depth,)) for _ in p_refs],
    )


def _q4_multi_plan(k_dim: int, halves, rows: int):
    """(tk, tm) for a grouped int4 GEMV, or None. Same VMEM accounting as
    the single kernel (two fp32 accumulator carries per weight, double-
    charged by the loop), summed over the group's windows/accs."""
    if rows > 64:
        return None
    tm = -(-rows // 8) * 8
    cap = _window_cap()
    for tk in (512, 256, 128):
        if k_dim % tk or any(tk * h > cap for h in halves):
            continue
        stack = sum(2 * tm * h * 4 * 2 + 2 * tk * h for h in halves)
        stack += tm * k_dim * 2
        if stack <= 15 * (1 << 20):
            return tk, tm
    return None


@functools.partial(
    jax.jit, static_argnames=("out_fp32", "interpret", "unpack")
)
def matmul_q4_multi_pallas(
    x: jax.Array,  # [..., K]
    packs: tuple,  # n_w stacked [L, K, half_j] (or [K, half_j]) int4 pairs
    scales: tuple,  # n_w layer-sliced [1, 2*half_j] scales
    layer: jax.Array | int = 0,
    out_fp32: bool = False,
    interpret: bool = False,
    unpack: str = "i32",
):
    """One streaming program for a group of int4 matmuls over the same x.
    Returns a tuple of [..., 2*half_j] outputs (split-half layout each)."""
    packs = tuple(p[None] if p.ndim == 2 else p for p in packs)
    k_dim = packs[0].shape[-2]
    halves = [p.shape[-1] for p in packs]
    lead = x.shape[:-1]
    x2 = x.reshape(-1, k_dim)
    rows = x2.shape[0]
    plan = _q4_multi_plan(k_dim, halves, rows)
    if plan is None:
        raise ValueError(
            f"no q4 multi plan for K={k_dim} halves={halves} rows={rows}"
        )
    tk, tm = plan
    if tm != rows:
        x2 = jnp.pad(x2, ((0, tm - rows), (0, 0)))
    out_dtype = jnp.float32 if out_fp32 else x.dtype
    li = jnp.asarray(layer, jnp.int32).reshape(1)
    n_w = len(packs)
    s2 = [s.reshape(1, 2 * h) for s, h in zip(scales, halves)]
    # opportunistic deeper DMA pipeline (see matmul_q4_pallas)
    depth = 2
    if k_dim // tk > 4:
        stack4 = sum(2 * tm * h * 4 * 2 + 4 * tk * h for h in halves)
        stack4 += tm * k_dim * 2
        if stack4 <= 12 * (1 << 20):
            depth = 4
    ys = pl.pallas_call(
        functools.partial(
            _q4_gemv_multi_kernel, tk=tk, n_w=n_w, unpack=unpack,
            depth=depth,
        ),
        in_specs=(
            [pl.BlockSpec(memory_space=pltpu.SMEM),
             pl.BlockSpec(memory_space=pltpu.VMEM)]
            + [pl.BlockSpec(memory_space=pltpu.VMEM)] * (2 * n_w)
            + [pl.BlockSpec(memory_space=pltpu.ANY)] * n_w
        ),
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * (2 * n_w),
        out_shape=[
            jax.ShapeDtypeStruct((tm, h), out_dtype)
            for h in halves for _ in (0, 1)
        ],
        interpret=interpret,
    )(
        li, x2,
        *[s[:, :h] for s, h in zip(s2, halves)],
        *[s[:, h:] for s, h in zip(s2, halves)],
        *packs,
    )
    outs = []
    for j, h in enumerate(halves):
        y = jnp.concatenate([ys[2 * j], ys[2 * j + 1]], axis=-1)
        if tm != rows:
            y = y[:rows]
        outs.append(y.reshape(lead + (2 * h,)))
    return tuple(outs)


def _q4_mlp_kernel(
    li_ref,  # [1] int32 layer index (SMEM)
    x_ref,  # [TM, K] activations (VMEM)
    gs_lo_ref, gs_hi_ref,  # [1, half_f] gate scales (VMEM)
    us_lo_ref, us_hi_ref,  # [1, half_f] up scales (VMEM)
    ds_lo_ref, ds_hi_ref,  # [1, half_d] down scales (VMEM)
    g_hbm,  # [L, K, half_f] packed gate (HBM; streamed)
    u_hbm,  # [L, K, half_f] packed up (HBM; streamed)
    d_hbm,  # [L, F, half_d] packed down, F = 2*half_f (HBM; streamed)
    ylo_ref,  # [TM, half_d] out, columns [0, half_d)
    yhi_ref,  # [TM, half_d] out, columns [half_d, 2*half_d)
    *,
    tk: int,
    tk2: int,
    unpack: str,
):
    """The WHOLE SwiGLU MLP as one program: silu(x@G) * (x@U) @ D.

    Two streaming phases share one launch: phase A accumulates the gate
    and up GEMVs over K-chunks (two double-buffered windows), then the
    activation h = silu(g)*u is formed in VMEM ([TM, F] bf16 — 176 KB at
    TM=8/F=11008, trivially resident), and phase B streams the down
    weight over F-chunks against h. Saves one kernel launch per layer
    (~10 us measured per-program overhead, run/q4_kernel_probe.py) plus
    the XLA glue program between the two (the silu/mul elementwise step),
    and the down stream's first chunks are prefetched DURING phase A so
    phase B starts with a hot pipeline. Split-half layout throughout:
    [lo | hi] concat order of each output IS original column order, so h
    built as concat(h_lo, h_hi) indexes the down weight's K rows in
    original ffn order."""
    _, k_dim, half_f = g_hbm.shape
    _, f_dim, half_d = d_hbm.shape
    na = k_dim // tk
    nb = f_dim // tk2
    tm = x_ref.shape[0]
    li = li_ref[0]

    def body(gbuf, ubuf, dbuf, h_ref, gsem, usem, dsem):
        def dma_a(buf, sem, hbm, slot, idx):
            return pltpu.make_async_copy(
                hbm.at[li, pl.ds(idx * tk, tk), :], buf.at[slot],
                sem.at[slot],
            )

        def dma_b(slot, idx):
            return pltpu.make_async_copy(
                d_hbm.at[li, pl.ds(idx * tk2, tk2), :], dbuf.at[slot],
                dsem.at[slot],
            )

        for c in range(min(1, na)):
            dma_a(gbuf, gsem, g_hbm, c, c).start()
            dma_a(ubuf, usem, u_hbm, c, c).start()
        # prefetch the down stream's first window now — by the time
        # phase A's ~22 MB have streamed, it is long since resident.
        # Only window 0: loop_b's i+1 prefetch covers window 1 (starting
        # it here too would double-signal dsem[1] and let a later wait
        # complete one copy early).
        for c in range(min(1, nb)):
            dma_b(c, c).start()

        def loop_a(i, accs):
            g_lo, g_hi, u_lo, u_hi = accs
            slot = jax.lax.rem(i, 2)

            @pl.when(i + 1 < na)
            def _():
                nxt = jax.lax.rem(i + 1, 2)
                dma_a(gbuf, gsem, g_hbm, nxt, i + 1).start()
                dma_a(ubuf, usem, u_hbm, nxt, i + 1).start()

            xb = x_ref[:, pl.ds(i * tk, tk)].astype(jnp.bfloat16)
            dma_a(gbuf, gsem, g_hbm, slot, i).wait()
            lo, hi = _q4_unpack_block(gbuf[slot], unpack)
            g_lo = g_lo + jnp.dot(xb, lo, preferred_element_type=jnp.float32)
            g_hi = g_hi + jnp.dot(xb, hi, preferred_element_type=jnp.float32)
            dma_a(ubuf, usem, u_hbm, slot, i).wait()
            lo, hi = _q4_unpack_block(ubuf[slot], unpack)
            u_lo = u_lo + jnp.dot(xb, lo, preferred_element_type=jnp.float32)
            u_hi = u_hi + jnp.dot(xb, hi, preferred_element_type=jnp.float32)
            return g_lo, g_hi, u_lo, u_hi

        zf = jnp.zeros((tm, half_f), jnp.float32)
        g_lo, g_hi, u_lo, u_hi = jax.lax.fori_loop(
            0, na, loop_a, (zf, zf, zf, zf)
        )
        g_lo = g_lo * gs_lo_ref[:].astype(jnp.float32)
        g_hi = g_hi * gs_hi_ref[:].astype(jnp.float32)
        u_lo = u_lo * us_lo_ref[:].astype(jnp.float32)
        u_hi = u_hi * us_hi_ref[:].astype(jnp.float32)
        # stage h through a VMEM scratch ref: phase B reads tk2-wide
        # slices with pl.ds (a dynamic_slice on a VALUE does not legalize
        # in Mosaic — probed on v5e)
        h_ref[:, :half_f] = (jax.nn.silu(g_lo) * u_lo).astype(jnp.bfloat16)
        h_ref[:, half_f:] = (jax.nn.silu(g_hi) * u_hi).astype(jnp.bfloat16)

        def loop_b(i, accs):
            y_lo, y_hi = accs
            slot = jax.lax.rem(i, 2)

            @pl.when(i + 1 < nb)
            def _():
                dma_b(jax.lax.rem(i + 1, 2), i + 1).start()

            dma_b(slot, i).wait()
            lo, hi = _q4_unpack_block(dbuf[slot], unpack)
            hb = h_ref[:, pl.ds(i * tk2, tk2)]
            y_lo = y_lo + jnp.dot(hb, lo, preferred_element_type=jnp.float32)
            y_hi = y_hi + jnp.dot(hb, hi, preferred_element_type=jnp.float32)
            return y_lo, y_hi

        zd = jnp.zeros((tm, half_d), jnp.float32)
        y_lo, y_hi = jax.lax.fori_loop(0, nb, loop_b, (zd, zd))
        ylo_ref[:] = (y_lo * ds_lo_ref[:].astype(jnp.float32)).astype(
            ylo_ref.dtype
        )
        yhi_ref[:] = (y_hi * ds_hi_ref[:].astype(jnp.float32)).astype(
            yhi_ref.dtype
        )

    pl.run_scoped(
        body,
        gbuf=pltpu.VMEM((2, tk, half_f), jnp.int8),
        ubuf=pltpu.VMEM((2, tk, half_f), jnp.int8),
        dbuf=pltpu.VMEM((2, tk2, half_d), jnp.int8),
        h_ref=pltpu.VMEM((tm, f_dim), jnp.bfloat16),
        gsem=pltpu.SemaphoreType.DMA((2,)),
        usem=pltpu.SemaphoreType.DMA((2,)),
        dsem=pltpu.SemaphoreType.DMA((2,)),
    )


def _q4_mlp_plan(k_dim: int, half_f: int, half_d: int, rows: int):
    """(tk, tk2, tm) for the fused MLP kernel, or None.

    VMEM accounting mirrors _q4_multi_plan (fp32 accumulator carries are
    double-charged by the loop) plus the phase-B pieces: the bf16 h
    activation, the down window, and the down accumulators."""
    if rows > 64:
        return None
    cap = _window_cap()
    f_dim = 2 * half_f
    tm = -(-rows // 8) * 8
    for tk in (512, 256, 128):
        if k_dim % tk or tk * half_f > cap:
            continue
        for tk2 in (512, 256, 128):
            if f_dim % tk2 or tk2 * half_d > cap:
                continue
            stack = 2 * 2 * tk * half_f + 2 * tk2 * half_d  # DMA windows
            stack += 4 * tm * half_f * 4 * 2  # phase-A fp32 carries
            stack += tm * f_dim * 2  # h (bf16)
            stack += 2 * tm * half_d * 4 * 2  # phase-B fp32 carries
            stack += 2 * tm * half_d * 4  # outputs
            stack += tm * k_dim * 2  # x
            if stack <= 14 * (1 << 20):
                return tk, tk2, tm
    return None


@functools.partial(
    jax.jit, static_argnames=("out_fp32", "interpret", "unpack")
)
def matmul_q4_mlp_pallas(
    x: jax.Array,  # [..., K]
    gate: jax.Array,  # [L, K, half_f] (or [K, half_f]) packed int4
    up: jax.Array,  # [L, K, half_f] packed int4
    down: jax.Array,  # [L, 2*half_f, half_d] packed int4
    gate_s: jax.Array,  # [1, 2*half_f] layer-sliced scales
    up_s: jax.Array,  # [1, 2*half_f]
    down_s: jax.Array,  # [1, 2*half_d]
    layer: jax.Array | int = 0,
    out_fp32: bool = False,
    interpret: bool = False,
    unpack: str = "i32",
) -> jax.Array:
    """silu(x @ deq(gate)) * (x @ deq(up)) @ deq(down) in ONE program.
    Returns [..., 2*half_d]. Decode-sized row counts only."""
    gate, up, down = (
        p[None] if p.ndim == 2 else p for p in (gate, up, down)
    )
    _, k_dim, half_f = gate.shape
    _, f_dim, half_d = down.shape
    lead = x.shape[:-1]
    x2 = x.reshape(-1, k_dim)
    rows = x2.shape[0]
    plan = _q4_mlp_plan(k_dim, half_f, half_d, rows)
    if plan is None:
        raise ValueError(
            f"no q4 mlp plan for K={k_dim} half_f={half_f} "
            f"half_d={half_d} rows={rows}"
        )
    tk, tk2, tm = plan
    if tm != rows:
        x2 = jnp.pad(x2, ((0, tm - rows), (0, 0)))
    out_dtype = jnp.float32 if out_fp32 else x.dtype
    li = jnp.asarray(layer, jnp.int32).reshape(1)
    gs = gate_s.reshape(1, 2 * half_f)
    us = up_s.reshape(1, 2 * half_f)
    ds = down_s.reshape(1, 2 * half_d)
    ylo, yhi = pl.pallas_call(
        functools.partial(
            _q4_mlp_kernel, tk=tk, tk2=tk2, unpack=unpack
        ),
        in_specs=(
            [pl.BlockSpec(memory_space=pltpu.SMEM),
             pl.BlockSpec(memory_space=pltpu.VMEM)]
            + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 6
            + [pl.BlockSpec(memory_space=pltpu.ANY)] * 3
        ),
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_shape=[
            jax.ShapeDtypeStruct((tm, half_d), out_dtype),
            jax.ShapeDtypeStruct((tm, half_d), out_dtype),
        ],
        interpret=interpret,
    )(
        li, x2,
        gs[:, :half_f], gs[:, half_f:],
        us[:, :half_f], us[:, half_f:],
        ds[:, :half_d], ds[:, half_d:],
        gate, up, down,
    )
    y = jnp.concatenate([ylo, yhi], axis=-1)
    if tm != rows:
        y = y[:rows]
    return y.reshape(lead + (2 * half_d,))


def q8_col_split_parts(q_shape, rows: int) -> int:
    """Number of output-column blocks (2 or 4) that makes an un-stacked
    int8 weight kernel-eligible at ``rows``, or 0. Covers the vocab-width
    lm_head at batched-decode rows, where the one-block plan exceeds
    scoped VMEM but a column half/quarter fits."""
    if len(q_shape) != 2 or rows > 64:
        return 0
    k_dim, n = q_shape
    # each block must stay a multiple of 128 lanes; 5 covers the 32000
    # llama vocab at rows where a half does not fit (32000/4 is not
    # lane-aligned)
    for parts in (2, 4, 5, 8):
        if n % (parts * 128) == 0 and _q8_plan(k_dim, n // parts, rows):
            return parts
    return 0


def matmul_q8_col_split(
    x: jax.Array,
    q: jax.Array,  # [K, N] int8 (un-stacked)
    scales: jax.Array,
    out_fp32: bool = False,
    interpret: bool = False,
) -> jax.Array:
    """x @ (q * s) as ``parts`` column-block kernel calls. The static
    column slices are loop-invariant, so XLA hoists the copies out of a
    decode scan — one extra weight read per PROGRAM, not per step."""
    rows = 1
    for d in x.shape[:-1]:
        rows *= d
    parts = q8_col_split_parts(q.shape, rows)
    if not parts:
        raise ValueError(f"no column split fits {q.shape} at rows={rows}")
    n = q.shape[-1]
    nb = n // parts
    s2 = scales.reshape(1, n)
    outs = [
        matmul_q8_pallas(
            x, q[:, j * nb:(j + 1) * nb], s2[:, j * nb:(j + 1) * nb],
            out_fp32=out_fp32, interpret=interpret,
        )
        for j in range(parts)
    ]
    return jnp.concatenate(outs, axis=-1)


def q4_col_split_parts(packed_shape, rows: int) -> int:
    """Number of PACKED-column blocks (2/4/5/8) that makes an un-stacked
    int4 weight kernel-eligible at ``rows``, or 0. Covers the vocab-width
    int4 lm_head at batched-decode rows > 48, where the one-block VMEM
    plan exceeds the scoped limit but a column fraction fits (the int8
    counterpart is ``q8_col_split_parts``)."""
    if len(packed_shape) != 2 or rows > 64:
        return 0
    k_dim, half = packed_shape
    for parts in (2, 4, 5, 8):
        if half % (parts * 128) == 0 and q4_kernel_supported(
            (k_dim, half // parts), rows
        ):
            return parts
    return 0


def matmul_q4_col_split(
    x: jax.Array,
    packed: jax.Array,  # [K, half] int8 nibble pairs (un-stacked)
    scales: jax.Array,  # [1, 2*half]
    out_fp32: bool = False,
    interpret: bool = False,
    unpack: str = "i32",
) -> jax.Array:
    """x @ deq(packed) as ``parts`` packed-column kernel calls. Each block
    contributes output columns [j*nb, (j+1)*nb) of the LO half and the
    matching slice of the HI half, so the blocks' (lo, hi) pairs are
    re-assembled lo-first to preserve the split-half output layout. The
    static column slices are loop-invariant — XLA hoists the copies out
    of a decode scan (one extra weight read per PROGRAM, not per step)."""
    rows = 1
    for d in x.shape[:-1]:
        rows *= d
    parts = q4_col_split_parts(packed.shape, rows)
    if not parts:
        raise ValueError(f"no column split fits {packed.shape} rows={rows}")
    half = packed.shape[-1]
    nb = half // parts
    s2 = scales.reshape(1, 2 * half)
    los, his = [], []
    for j in range(parts):
        s_blk = jnp.concatenate(
            [s2[:, j * nb:(j + 1) * nb],
             s2[:, half + j * nb:half + (j + 1) * nb]], axis=-1,
        )
        y = matmul_q4_pallas(
            x, packed[:, j * nb:(j + 1) * nb], s_blk,
            out_fp32=out_fp32, interpret=interpret, unpack=unpack,
        )
        los.append(y[..., :nb])
        his.append(y[..., nb:])
    return jnp.concatenate(los + his, axis=-1)


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
