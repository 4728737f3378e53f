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
    lse_ref,  # [1, block_q] rowwise logsumexp (for the backward) or None
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
    if lse_ref is not None:
        lse = m + jnp.log(jnp.where(l == 0.0, 1.0, l))
        lse_ref[:] = lse.reshape(1, block_q)


def _pad_to(x: jax.Array, size: int, axis: int) -> jax.Array:
    pad = size - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


@functools.partial(
    jax.jit,
    static_argnames=("causal", "scale", "block_q", "block_k", "interpret",
                     "q_offset_static", "save_residuals"),
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
    save_residuals: bool = False,
) -> jax.Array:
    """Fused attention. For self-attention prefill use causal=True and
    q_offset_static=0; rows beyond kv_length produce zeros (they are padding
    and never read downstream). With ``save_residuals`` also returns the
    per-row logsumexp [B, H, Sq] for the flash backward."""
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
    common = dict(
        scale=scale, block_q=block_q, block_k=block_k, causal=causal,
        q_offset=q_offset_static,
    )
    in_specs = [
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
    ]
    o_spec = pl.BlockSpec(
        (None, None, block_q, d),
        lambda b_, h_, qi, *_refs: (b_, h_, qi, 0),
        memory_space=pltpu.VMEM,
    )
    if save_residuals:
        lse_spec = pl.BlockSpec(
            (None, None, 1, block_q),
            lambda b_, h_, qi, *_refs: (b_, h_, 0, qi),
            memory_space=pltpu.VMEM,
        )
        out, lse = pl.pallas_call(
            functools.partial(_flash_kernel, **common),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1, grid=grid, in_specs=in_specs,
                out_specs=(o_spec, lse_spec),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((b, h, sq_p, d), q.dtype),
                jax.ShapeDtypeStruct((b, h, 1, sq_p), jnp.float32),
            ),
            interpret=interpret,
        )(kv_length, qm, km, vm)
        return (
            out[:, :, :sq].transpose(0, 2, 1, 3),
            lse[:, :, 0, :sq],
        )
    out = pl.pallas_call(
        functools.partial(_flash_kernel, lse_ref=None, **common),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=grid, in_specs=in_specs,
            out_specs=o_spec,
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, sq_p, d), q.dtype),
        interpret=interpret,
    )(kv_length, qm, km, vm)
    return out[:, :, :sq].transpose(0, 2, 1, 3)


# ---------------------------------------------------------------------------
# Differentiable wrapper
# ---------------------------------------------------------------------------


def _interpret_mode() -> bool:
    try:
        return jax.devices()[0].platform not in ("tpu", "axon")
    except Exception:
        return True


@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def _flash_attach_bwd(q, k, v, kv_length, out, lse, causal):
    """Identity on ``out`` that carries the FA2 backward.

    The forward kernel runs OUTSIDE this custom_vjp (under stop_gradient),
    and its (out, lse) outputs — tagged with ``checkpoint_name`` — enter
    here as plain inputs. So every residual the backward needs is an
    ordinary jaxpr value: under ``jax.checkpoint`` with a policy that saves
    the "flash_out"/"flash_lse" names, the rematerialized backward gets
    (out, lse) from the saved set and q/k/v from the (cheap) recomputed
    projections, and the forward attention kernel is dead code in the
    recompute — the flash-aware remat policy (models.llama.run_layers_nocache
    remat_policy="flash"). Residuals hidden inside a custom_vjp fwd would
    not be visible to the remat partial-eval; inputs are."""
    return out


def _flash_attach_fwd(q, k, v, kv_length, out, lse, causal):
    return out, (q, k, v, kv_length, out, lse)


def _flash_attach_bwd_rule(causal, residuals, g):
    """True flash backward: dq/dk/dv kernels stream kv blocks against saved
    per-row logsumexp — the S^2 score matrix exists in neither pass."""
    q, k, v, kv_length, out, lse = residuals
    dq, dk, dv = flash_attention_bwd(
        q, k, v, out, lse, g, kv_length=kv_length, causal=causal,
        interpret=_interpret_mode(),
    )
    # out/lse cotangents die at the stop_gradient below their production
    return dq, dk, dv, None, jnp.zeros_like(out), jnp.zeros_like(lse)


_flash_attach_bwd.defvjp(_flash_attach_fwd, _flash_attach_bwd_rule)


def flash_attention_vjp(q, k, v, *, kv_length=None, causal=True):
    """Flash forward + differentiable (FA2 kernel) backward — safe inside
    jax.grad / jax.checkpoint, used by the training path on TPU."""
    from jax.ad_checkpoint import checkpoint_name

    if kv_length is None:
        kv_length = jnp.full((q.shape[0],), k.shape[1], jnp.int32)
    # stop_gradient on the kernel INPUTS: the forward kernel is out of the
    # AD graph entirely (it has no JVP rule); _flash_attach_bwd carries the
    # gradient instead
    out, lse = flash_attention(
        jax.lax.stop_gradient(q), jax.lax.stop_gradient(k),
        jax.lax.stop_gradient(v), kv_length=kv_length, causal=causal,
        save_residuals=True, interpret=_interpret_mode(),
    )
    out = checkpoint_name(out, "flash_out")
    lse = checkpoint_name(lse, "flash_lse")
    return _flash_attach_bwd(q, k, v, kv_length, out, lse, causal)


# ---------------------------------------------------------------------------
# Flash backward kernels (FlashAttention-2 style)
# ---------------------------------------------------------------------------


def _flash_bwd_dkv_kernel(
    kv_len_ref,  # [B] (scalar prefetch)
    q_ref,  # [S_q, d] all q rows for this (b, h)
    do_ref,  # [S_q, d]
    lse_ref,  # [1, S_q]
    delta_ref,  # [1, S_q]  D = rowsum(dO * O)
    k_ref,  # [block_k, d] this kv block
    v_ref,  # [block_k, d]
    dk_ref,  # [block_k, d] out
    dv_ref,  # [block_k, d] out
    *,
    scale: float,
    block_q: int,
    block_k: int,
    causal: bool,
):
    b = pl.program_id(0)
    kj = pl.program_id(2)
    s_q = q_ref.shape[0]
    d = q_ref.shape[1]
    kv_len = kv_len_ref[b]

    k_blk = k_ref[:].astype(jnp.float32)
    v_blk = v_ref[:].astype(jnp.float32)
    col_ids = kj * block_k + jax.lax.broadcasted_iota(
        jnp.int32, (block_q, block_k), 1
    )
    col_valid = col_ids < kv_len

    n_q_blocks = pl.cdiv(s_q, block_q)
    # causal: kv block kj only receives grads from q rows >= its first col
    start_q = (kj * block_k) // block_q if causal else 0

    def body(qi, carry):
        dk, dv = carry
        q_blk = q_ref[pl.ds(qi * block_q, block_q), :].astype(jnp.float32)
        do_blk = do_ref[pl.ds(qi * block_q, block_q), :].astype(jnp.float32)
        lse = lse_ref[0, pl.ds(qi * block_q, block_q)].reshape(block_q, 1)
        delta = delta_ref[0, pl.ds(qi * block_q, block_q)].reshape(block_q, 1)

        s = jnp.dot(q_blk, k_blk.T, preferred_element_type=jnp.float32) * scale
        row_ids = qi * block_q + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 0
        )
        mask = col_valid
        if causal:
            mask = mask & (col_ids <= row_ids)
        p = jnp.where(mask, jnp.exp(s - lse), 0.0)  # [bq, bk]

        dv = dv + jnp.dot(p.T, do_blk, preferred_element_type=jnp.float32)
        dp = jnp.dot(do_blk, v_blk.T, preferred_element_type=jnp.float32)
        ds = p * (dp - delta) * scale
        dk = dk + jnp.dot(ds.T, q_blk, preferred_element_type=jnp.float32)
        return dk, dv

    init = (jnp.zeros((block_k, d), jnp.float32),
            jnp.zeros((block_k, d), jnp.float32))
    dk, dv = jax.lax.fori_loop(start_q, n_q_blocks, body, init)
    dk_ref[:] = dk.astype(dk_ref.dtype)
    dv_ref[:] = dv.astype(dv_ref.dtype)


def _flash_bwd_dq_kernel(
    kv_len_ref,
    q_ref,  # [block_q, d] this q block
    do_ref,  # [block_q, d]
    lse_ref,  # [1, block_q]
    delta_ref,  # [1, block_q]
    k_ref,  # [S_kv, d] all kv rows for this (b, h)
    v_ref,  # [S_kv, d]
    dq_ref,  # [block_q, d] out
    *,
    scale: float,
    block_q: int,
    block_k: int,
    causal: bool,
):
    b = pl.program_id(0)
    qi = pl.program_id(2)
    s_kv = k_ref.shape[0]
    d = q_ref.shape[1]
    kv_len = kv_len_ref[b]

    q_blk = q_ref[:].astype(jnp.float32)
    do_blk = do_ref[:].astype(jnp.float32)
    lse = lse_ref[0, :].reshape(block_q, 1)
    delta = delta_ref[0, :].reshape(block_q, 1)
    row_ids = qi * block_q + jax.lax.broadcasted_iota(
        jnp.int32, (block_q, block_k), 0
    )

    num_k_blocks = pl.cdiv(s_kv, block_k)
    if causal:
        num_k_blocks = jnp.minimum(
            num_k_blocks, (qi * block_q + block_q - 1) // block_k + 1
        )
    num_k_blocks = jnp.minimum(num_k_blocks, pl.cdiv(kv_len, block_k))

    def body(kj, dq):
        k_blk = k_ref[pl.ds(kj * block_k, block_k), :].astype(jnp.float32)
        v_blk = v_ref[pl.ds(kj * block_k, block_k), :].astype(jnp.float32)
        s = jnp.dot(q_blk, k_blk.T, preferred_element_type=jnp.float32) * scale
        col_ids = kj * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 1
        )
        mask = col_ids < kv_len
        if causal:
            mask = mask & (col_ids <= row_ids)
        p = jnp.where(mask, jnp.exp(s - lse), 0.0)
        dp = jnp.dot(do_blk, v_blk.T, preferred_element_type=jnp.float32)
        ds = p * (dp - delta) * scale
        return dq + jnp.dot(ds, k_blk, preferred_element_type=jnp.float32)

    dq = jax.lax.fori_loop(
        0, num_k_blocks, body, jnp.zeros((block_q, d), jnp.float32)
    )
    dq_ref[:] = dq.astype(dq_ref.dtype)


def flash_attention_bwd(
    q, k, v, out, lse, g, *,
    kv_length=None, causal=True, scale=None,
    block_q: int = 256, block_k: int = 256, interpret: bool = False,
):
    """Flash backward: (dq, dk, dv) without materializing S^2 anywhere.
    k/v grads are computed per query head then reduced over GQA groups."""
    b, sq, h, d = q.shape
    sk, hkv = k.shape[1], k.shape[2]
    n_rep = h // hkv
    if scale is None:
        scale = d**-0.5
    if kv_length is None:
        kv_length = jnp.full((b,), sk, jnp.int32)

    def _round_up(x, m):
        return ((x + m - 1) // m) * m

    block_q = min(block_q, _round_up(max(sq, 16), 128))
    block_k = min(block_k, _round_up(sk, 128))
    sq_p = pl.cdiv(sq, block_q) * block_q
    sk_p = pl.cdiv(sk, block_k) * block_k

    qm = _pad_to(q.transpose(0, 2, 1, 3), sq_p, 2)
    km = _pad_to(k.transpose(0, 2, 1, 3), sk_p, 2)
    vm = _pad_to(v.transpose(0, 2, 1, 3), sk_p, 2)
    dom = _pad_to(g.transpose(0, 2, 1, 3), sq_p, 2)
    # pad lse with +inf so padded rows produce p = exp(-inf) = 0
    lsem = jnp.pad(
        lse, ((0, 0), (0, 0), (0, sq_p - sq)), constant_values=jnp.inf
    )[:, :, None, :].transpose(0, 1, 2, 3)  # [B, H, 1, Sq_p]
    delta = jnp.sum(
        g.astype(jnp.float32) * out.astype(jnp.float32), axis=-1
    ).transpose(0, 2, 1)  # [B, H, Sq]
    deltam = jnp.pad(delta, ((0, 0), (0, 0), (0, sq_p - sq)))[:, :, None, :]

    common = dict(scale=scale, block_q=block_q, block_k=block_k, causal=causal)

    full_q = pl.BlockSpec((None, None, sq_p, d),
                          lambda b_, h_, i, *_r: (b_, h_, 0, 0),
                          memory_space=pltpu.VMEM)
    full_row = pl.BlockSpec((None, None, 1, sq_p),
                            lambda b_, h_, i, *_r: (b_, h_, 0, 0),
                            memory_space=pltpu.VMEM)
    kv_blk = pl.BlockSpec((None, None, block_k, d),
                          lambda b_, h_, kj, *_r: (b_, h_ // n_rep, kj, 0),
                          memory_space=pltpu.VMEM)
    dkv_out = pl.BlockSpec((None, None, block_k, d),
                           lambda b_, h_, kj, *_r: (b_, h_, kj, 0),
                           memory_space=pltpu.VMEM)

    dk_h, dv_h = pl.pallas_call(
        functools.partial(_flash_bwd_dkv_kernel, **common),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b, h, sk_p // block_k),
            in_specs=[full_q, full_q, full_row, full_row, kv_blk, kv_blk],
            out_specs=(dkv_out, dkv_out),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, h, sk_p, d), jnp.float32),
            jax.ShapeDtypeStruct((b, h, sk_p, d), jnp.float32),
        ),
        interpret=interpret,
    )(kv_length, qm, dom, lsem, deltam, km, vm)

    q_blk = pl.BlockSpec((None, None, block_q, d),
                         lambda b_, h_, qi, *_r: (b_, h_, qi, 0),
                         memory_space=pltpu.VMEM)
    row_blk = pl.BlockSpec((None, None, 1, block_q),
                           lambda b_, h_, qi, *_r: (b_, h_, 0, qi),
                           memory_space=pltpu.VMEM)
    full_kv = pl.BlockSpec((None, None, sk_p, d),
                           lambda b_, h_, qi, *_r: (b_, h_ // n_rep, 0, 0),
                           memory_space=pltpu.VMEM)

    dq = pl.pallas_call(
        functools.partial(_flash_bwd_dq_kernel, **common),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b, h, sq_p // block_q),
            in_specs=[q_blk, q_blk, row_blk, row_blk, full_kv, full_kv],
            out_specs=q_blk,
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, sq_p, d), q.dtype),
        interpret=interpret,
    )(kv_length, qm, dom, lsem, deltam, km, vm)

    dq = dq[:, :, :sq].transpose(0, 2, 1, 3)
    # reduce per-query-head kv grads over GQA groups
    dk_h = dk_h[:, :, :sk]
    dv_h = dv_h[:, :, :sk]
    dk = dk_h.reshape(b, hkv, n_rep, sk, d).sum(axis=2).transpose(0, 2, 1, 3)
    dv = dv_h.reshape(b, hkv, n_rep, sk, d).sum(axis=2).transpose(0, 2, 1, 3)
    return dq, dk.astype(k.dtype), dv.astype(v.dtype)
