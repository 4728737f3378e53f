"""Pallas fused causal attention (flash attention) for TPU.

Replaces the reference's external flash-attn-2 CUDA kernels and torch SDPA
(/root/reference/llava/model/language_model/dynamic_modeling_llama.py:570-813,
1114-1122) with a TPU-native kernel:

* Online-softmax tiling: the [S, S] score matrix never touches HBM. Running
  max/denominator live in SMEM-adjacent VMEM scratch; the accumulator stays
  fp32 in VMEM and is written once per q block.
* Causal block skipping: kv blocks entirely above the diagonal are never
  computed (the fori_loop upper bound is derived from the q block index), so
  prefill does ~half the work — same effect as flash-attn's causal early
  exit.
* Optional per-batch ``kv_length`` masking for left-aligned padded batches.
* GQA: query heads are grouped per kv head outside the kernel.

Layout: [B, S, H, d] in, grid (B, H, num_q_blocks); K/V for one (b, h) are
staged in VMEM whole (S ≤ ~3k at d=128 is ~1.5 MB bf16 — comfortably within
the ~16 MB VMEM budget next to the q/o blocks).

The XLA reference path in ``attention.py`` is the semantic oracle; tests run
this kernel in interpret mode against it.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _flash_kernel(
    # scalar prefetch
    kv_len_ref,  # [B] int32 valid kv length per batch (SMEM)
    # inputs
    q_ref,  # [block_q, d]
    k_ref,  # [S_kv, d]
    v_ref,  # [S_kv, d]
    # outputs
    o_ref,  # [block_q, d]
    *,
    scale: float,
    block_q: int,
    block_k: int,
    causal: bool,
    q_offset: int,
):
    b = pl.program_id(0)
    qi = pl.program_id(2)
    s_kv = k_ref.shape[0]
    d = q_ref.shape[1]

    q = q_ref[:].astype(jnp.float32) * scale
    kv_len = kv_len_ref[b]

    # rows of this q block in kv coordinates (q token t attends kv <= t + q_offset)
    row_ids = (
        qi * block_q
        + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
        + q_offset
    )

    num_k_blocks = pl.cdiv(s_kv, block_k)
    if causal:
        # last kv block any row of this q block may touch
        max_row = qi * block_q + block_q - 1 + q_offset
        num_k_blocks = jnp.minimum(num_k_blocks, max_row // block_k + 1)
    # never read past the valid kv length
    num_k_blocks = jnp.minimum(num_k_blocks, pl.cdiv(kv_len, block_k))

    def body(ki, carry):
        acc, m_prev, l_prev = carry
        k_blk = k_ref[pl.ds(ki * block_k, block_k), :].astype(jnp.float32)
        v_blk = v_ref[pl.ds(ki * block_k, block_k), :].astype(jnp.float32)
        s = jnp.dot(q, k_blk.T, preferred_element_type=jnp.float32)  # [bq, bk]

        col_ids = ki * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 1
        )
        mask = col_ids < kv_len
        if causal:
            mask = mask & (col_ids <= row_ids)
        s = jnp.where(mask, s, NEG_INF)

        m_cur = jnp.max(s, axis=1, keepdims=True)  # [bq, 1]
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)
        l_new = l_prev * alpha + jnp.sum(p, axis=1, keepdims=True)
        acc = acc * alpha + jnp.dot(p, v_blk, preferred_element_type=jnp.float32)
        return acc, m_new, l_new

    init = (
        jnp.zeros((block_q, d), jnp.float32),
        jnp.full((block_q, 1), NEG_INF, jnp.float32),
        jnp.zeros((block_q, 1), jnp.float32),
    )
    acc, m, l = jax.lax.fori_loop(0, num_k_blocks, body, init)
    # fully-masked rows (padding / kv_len == 0): l == 0 -> emit 0
    out = acc / jnp.where(l == 0.0, 1.0, l)
    o_ref[:] = out.astype(o_ref.dtype)


def _pad_to(x: jax.Array, size: int, axis: int) -> jax.Array:
    pad = size - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


@functools.partial(
    jax.jit,
    static_argnames=("causal", "scale", "block_q", "block_k", "interpret", "q_offset_static"),
)
def flash_attention(
    q: jax.Array,  # [B, Sq, H, d]
    k: jax.Array,  # [B, Sk, Hkv, d]
    v: jax.Array,  # [B, Sk, Hkv, d]
    *,
    kv_length: Optional[jax.Array] = None,  # [B] int32 (default: Sk)
    causal: bool = True,
    scale: Optional[float] = None,
    block_q: int = 256,
    block_k: int = 512,
    interpret: bool = False,
    q_offset_static: int = 0,
) -> jax.Array:
    """Fused attention. For self-attention prefill use causal=True and
    q_offset_static=0; rows beyond kv_length produce zeros (they are padding
    and never read downstream)."""
    b, sq, h, d = q.shape
    _, sk, hkv, _ = k.shape
    n_rep = h // hkv
    if scale is None:
        scale = d**-0.5
    if kv_length is None:
        kv_length = jnp.full((b,), sk, jnp.int32)

    # block sizes must stay multiples of the TPU tiling granularity (the kv
    # dynamic-slice offset ki*block_k must be provably 8-aligned; 128 keeps
    # both sublane and lane tiling happy for fp32/bf16)
    def _round_up(x: int, m: int) -> int:
        return ((x + m - 1) // m) * m

    block_q = min(block_q, _round_up(max(sq, 16), 128))
    block_k = min(block_k, _round_up(sk, 128))

    # head-major, padded to block multiples
    qm = _pad_to(q.transpose(0, 2, 1, 3), pl.cdiv(sq, block_q) * block_q, 2)
    km = _pad_to(k.transpose(0, 2, 1, 3), pl.cdiv(sk, block_k) * block_k, 2)
    vm = _pad_to(v.transpose(0, 2, 1, 3), pl.cdiv(sk, block_k) * block_k, 2)
    sq_p, sk_p = qm.shape[2], km.shape[2]

    grid = (b, h, sq_p // block_q)
    kernel = functools.partial(
        _flash_kernel,
        scale=scale,
        block_q=block_q,
        block_k=block_k,
        causal=causal,
        q_offset=q_offset_static,
    )
    out = pl.pallas_call(  # noqa: E501 — see flash_attention_vjp for the grad path
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec(
                    (None, None, block_q, d),
                    lambda b_, h_, qi, *_refs: (b_, h_, qi, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (None, None, sk_p, d),
                    lambda b_, h_, qi, *_refs: (b_, h_ // n_rep, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (None, None, sk_p, d),
                    lambda b_, h_, qi, *_refs: (b_, h_ // n_rep, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (None, None, block_q, d),
                lambda b_, h_, qi, *_refs: (b_, h_, qi, 0),
                memory_space=pltpu.VMEM,
            ),
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, sq_p, d), q.dtype),
        interpret=interpret,
    )(kv_length, qm, km, vm)
    return out[:, :, :sq].transpose(0, 2, 1, 3)


# ---------------------------------------------------------------------------
# Differentiable wrapper
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _flash_vjp_core(q, k, v, kv_length, causal):
    return flash_attention(q, k, v, kv_length=kv_length, causal=causal)


def _flash_vjp_fwd(q, k, v, kv_length, causal):
    out = flash_attention(q, k, v, kv_length=kv_length, causal=causal)
    return out, (q, k, v, kv_length)


def _flash_vjp_bwd(causal, residuals, g):
    """Backward by blockwise recompute: scan-over-q-blocks with per-block
    remat keeps the gradient pass at O(block x S) memory — the dense-oracle
    recompute would materialize the full S^2 scores (at training shapes,
    more than a chip's HBM per layer)."""
    from .attention import blockwise_attend

    q, k, v, kv_length = residuals
    assert causal, "flash VJP is only used on the causal self-attention path"

    def oracle(q_, k_, v_):
        return blockwise_attend(q_, k_, v_, kv_length=kv_length)

    _, vjp = jax.vjp(oracle, q, k, v)
    dq, dk, dv = vjp(g)
    return dq, dk, dv, None


_flash_vjp_core.defvjp(_flash_vjp_fwd, _flash_vjp_bwd)


def flash_attention_vjp(q, k, v, *, kv_length=None, causal=True):
    """Flash forward + differentiable (recompute) backward — safe inside
    jax.grad / jax.checkpoint, used by the training path on TPU."""
    if kv_length is None:
        kv_length = jnp.full((q.shape[0],), k.shape[1], jnp.int32)
    return _flash_vjp_core(q, k, v, kv_length, causal)
