"""Pallas decode attention with true length-based block skipping.

The XLA decode path (`ops.attention.decode_attend`) reads the FULL
preallocated cache buffer every step and masks invalid slots — correct, but
bandwidth scales with *capacity*. Here the K/V cache stays in HBM
(``memory_space=ANY``) and the kernel issues **manual double-buffered DMAs**
whose loop bound is the live ``length + 1`` — blocks past the persisted
prefix are never copied, so decode bandwidth scales with *content*.

Grid: (B, Hkv). Each program handles one batch row's kv head and all of its
``n_rep`` query heads (MHA: n_rep == 1). The current token's K/V must
already sit at slot ``length`` (write-then-conditionally-advance protocol),
matching ``decode_attend`` semantics.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _decode_kernel(
    length_ref,  # [B] int32 persisted lengths (scalar prefetch, SMEM)
    q_ref,  # [n_rep, d] VMEM
    k_hbm,  # [B, Hkv, max_len, d] full cache, stays in HBM (ANY)
    v_hbm,  # [B, Hkv, max_len, d]
    o_ref,  # [n_rep, d] VMEM
    k_scr,  # [2, block_k, d] VMEM scratch
    v_scr,  # [2, block_k, d] VMEM scratch
    sems,  # DMA semaphores [2, 2]
    *,
    scale: float,
    block_k: int,
):
    b = pl.program_id(0)
    hh = pl.program_id(1)
    d = q_ref.shape[1]
    n_rep = q_ref.shape[0]

    q = q_ref[:].astype(jnp.float32) * scale
    kv_len = length_ref[b] + 1  # current token at slot `length` is visible
    num_blocks = pl.cdiv(kv_len, block_k)

    def k_dma(slot, ki):
        return pltpu.make_async_copy(
            k_hbm.at[b, hh, pl.ds(ki * block_k, block_k), :], k_scr.at[slot],
            sems.at[slot, 0],
        )

    def v_dma(slot, ki):
        return pltpu.make_async_copy(
            v_hbm.at[b, hh, pl.ds(ki * block_k, block_k), :], v_scr.at[slot],
            sems.at[slot, 1],
        )

    k_dma(0, 0).start()
    v_dma(0, 0).start()

    def body(ki, carry):
        acc, m_prev, l_prev = carry
        slot = jax.lax.rem(ki, 2)
        nxt = jax.lax.rem(ki + 1, 2)

        @pl.when(ki + 1 < num_blocks)
        def _():
            k_dma(nxt, ki + 1).start()
            v_dma(nxt, ki + 1).start()

        k_dma(slot, ki).wait()
        v_dma(slot, ki).wait()
        k_blk = k_scr[slot].astype(jnp.float32)
        v_blk = v_scr[slot].astype(jnp.float32)

        s = jnp.dot(q, k_blk.T, preferred_element_type=jnp.float32)
        col_ids = ki * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (n_rep, block_k), 1
        )
        s = jnp.where(col_ids < kv_len, s, NEG_INF)
        m_cur = jnp.max(s, axis=1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)
        l_new = l_prev * alpha + jnp.sum(p, axis=1, keepdims=True)
        acc = acc * alpha + jnp.dot(p, v_blk, preferred_element_type=jnp.float32)
        return acc, m_new, l_new

    init = (
        jnp.zeros((n_rep, d), jnp.float32),
        jnp.full((n_rep, 1), NEG_INF, jnp.float32),
        jnp.zeros((n_rep, 1), jnp.float32),
    )
    acc, m, l = jax.lax.fori_loop(0, num_blocks, body, init)
    o_ref[:] = (acc / jnp.where(l == 0.0, 1.0, l)).astype(o_ref.dtype)


def flash_decode_attention(
    q: jax.Array,  # [B, 1, H, d]
    k_cache: jax.Array,  # [B, max_len, Hkv, d]
    v_cache: jax.Array,  # [B, max_len, Hkv, d]
    length: jax.Array,  # [B] int32 persisted length (current token at `length`)
    *,
    scale: Optional[float] = None,
    block_k: int = 256,
    interpret: bool = False,
) -> jax.Array:
    b, _, h, d = q.shape
    max_len = k_cache.shape[1]
    hkv = k_cache.shape[2]
    n_rep = h // hkv
    if scale is None:
        scale = d**-0.5

    def _round_up(x: int, m: int) -> int:
        return ((x + m - 1) // m) * m

    block_k = min(block_k, _round_up(max_len, 128))
    pad_len = pl.cdiv(max_len, block_k) * block_k
    if pad_len != max_len:
        widths = [(0, 0), (0, pad_len - max_len), (0, 0), (0, 0)]
        k_cache = jnp.pad(k_cache, widths)
        v_cache = jnp.pad(v_cache, widths)

    qm = q[:, 0].reshape(b, hkv, n_rep, d)
    km = k_cache.transpose(0, 2, 1, 3)  # [B, Hkv, max_len, d]
    vm = v_cache.transpose(0, 2, 1, 3)

    kernel = functools.partial(_decode_kernel, scale=scale, block_k=block_k)
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b, hkv),
            in_specs=[
                pl.BlockSpec((None, None, n_rep, d),
                             lambda b_, h_, *_r: (b_, h_, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec(memory_space=pltpu.ANY),
            ],
            out_specs=pl.BlockSpec((None, None, n_rep, d),
                                   lambda b_, h_, *_r: (b_, h_, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((2, block_k, d), k_cache.dtype),
                pltpu.VMEM((2, block_k, d), v_cache.dtype),
                pltpu.SemaphoreType.DMA((2, 2)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((b, hkv, n_rep, d), q.dtype),
        interpret=interpret,
    )(length.astype(jnp.int32), qm, km, vm)
    return out.reshape(b, 1, h, d)
