"""Fused policy attention (training-mode masked softmax) in Pallas.

The training path's hot op: the reference computes ``softmax_with_policy``
on a materialized [B, H, S, S] fp32 score matrix
(/root/reference/llava/model/language_model/dynamic_modeling_llama.py:913-970)
— at S≈2.6k, batch 8, 32 heads that is ~7 GB of HBM traffic per layer. This
kernel streams kv blocks with an online renormalization so the score matrix
never leaves VMEM, computing exactly:

  w_ij = (exp(s_ij - m_i) * p'_ij + eps/N) / (sum_j exp * p' + eps)
  out_i = w @ v

with the reference's quirks preserved: the diagonal policy escape
(p'_ii = 1), fp32 accumulation, and the eps/N smoothing applied over ALL N
columns (including causally-masked ones — so a plain Σv rides along).

Backward is an XLA recompute (custom VJP), which under per-layer remat is
what would run anyway.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _policy_kernel(
    q_ref,  # [block_q, d]
    k_ref,  # [S, d]
    v_ref,  # [S, d]
    pol_ref,  # [1, S] policy for this batch row (leading dims squeezed)
    o_ref,  # [block_q, d]
    *,
    scale: float,
    block_q: int,
    block_k: int,
    seq_len: int,  # true (unpadded) length N for the eps/N term
    eps: float,
):
    qi = pl.program_id(2)
    s_kv = k_ref.shape[0]
    d = q_ref.shape[1]

    q = q_ref[:].astype(jnp.float32) * scale
    row_ids = qi * block_q + jax.lax.broadcasted_iota(
        jnp.int32, (block_q, block_k), 0
    )

    num_k_blocks = jnp.minimum(
        pl.cdiv(s_kv, block_k),
        (qi * block_q + block_q - 1) // block_k + 1,  # causal skip
    )

    def body(ki, carry):
        acc, den, m_prev, vsum = carry
        k_blk = k_ref[pl.ds(ki * block_k, block_k), :].astype(jnp.float32)
        v_blk = v_ref[pl.ds(ki * block_k, block_k), :].astype(jnp.float32)
        p_blk = pol_ref[0, pl.ds(ki * block_k, block_k)].astype(jnp.float32)


        s = jnp.dot(q, k_blk.T, preferred_element_type=jnp.float32)
        col_ids = ki * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 1
        )
        causal = col_ids <= row_ids
        in_range = col_ids < seq_len
        s = jnp.where(causal & in_range, s, NEG_INF)

        # policy over kv + diagonal escape (each token attends itself)
        pol = jnp.broadcast_to(p_blk[None, :], (block_q, block_k))
        pol = jnp.where(col_ids == row_ids, 1.0, pol)

        m_cur = jnp.max(s, axis=1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_new)
        e = jnp.exp(s - m_new) * pol
        den = den * alpha + jnp.sum(e, axis=1, keepdims=True)
        acc = acc * alpha + jnp.dot(e, v_blk, preferred_element_type=jnp.float32)
        # eps/N smoothing sums v over ALL in-range columns (mask-independent).
        # Build the [block_k, 1] range mask directly — Mosaic cannot
        # transpose boolean vectors.
        col_b = ki * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (block_k, 1), 0
        )
        vsum = vsum + jnp.sum(
            jnp.where(col_b < seq_len, v_blk, 0.0), axis=0, keepdims=True
        )
        return acc, den, m_new, vsum

    init = (
        jnp.zeros((block_q, d), jnp.float32),
        jnp.zeros((block_q, 1), jnp.float32),
        jnp.full((block_q, 1), NEG_INF, jnp.float32),
        jnp.zeros((1, d), jnp.float32),
    )
    acc, den, m, vsum = jax.lax.fori_loop(0, num_k_blocks, body, init)
    # NOTE: the reference's +eps/N applies to every column 0..N-1; columns in
    # blocks skipped by the causal early-exit still contribute (eps/N)·v_j.
    # Those blocks were not visited, so add the remaining Σv here.
    def tail_body(ki, vs):
        v_blk = v_ref[pl.ds(ki * block_k, block_k), :].astype(jnp.float32)
        col_b = ki * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (block_k, 1), 0
        )
        return vs + jnp.sum(
            jnp.where(col_b < seq_len, v_blk, 0.0), axis=0, keepdims=True
        )

    vsum = jax.lax.fori_loop(num_k_blocks, pl.cdiv(s_kv, block_k), tail_body, vsum)

    # acc/den are in exp(s - m) units with m == the reference's per-row max
    # (running max converges to the global max over visited blocks), so the
    # smoothing terms add directly:
    n = jnp.float32(seq_len)
    num = acc + (eps / n) * vsum
    denom = den + eps
    o_ref[:] = (num / denom).astype(o_ref.dtype)


def flash_policy_attention(
    q: jax.Array,  # [B, S, H, d]
    k: jax.Array,  # [B, S, Hkv, d]
    v: jax.Array,  # [B, S, Hkv, d]
    policy: jax.Array,  # [B, S]
    *,
    scale: Optional[float] = None,
    eps: float = 1e-6,
    block_q: int = 256,
    block_k: int = 512,
    interpret: Optional[bool] = None,
) -> jax.Array:
    if interpret is None:
        # CPU (e.g. forced-flash tests) must run the kernel interpreted
        from .flash_attention import _interpret_mode

        interpret = _interpret_mode()
    b, s, h, d = q.shape
    hkv = k.shape[2]
    n_rep = h // hkv
    if scale is None:
        scale = d**-0.5

    def _round_up(x: int, m: int) -> int:
        return ((x + m - 1) // m) * m

    block_q = min(block_q, _round_up(max(s, 16), 128))
    block_k = min(block_k, _round_up(s, 128))

    def pad(x, size, axis):
        padn = size - x.shape[axis]
        if padn <= 0:
            return x
        widths = [(0, 0)] * x.ndim
        widths[axis] = (0, padn)
        return jnp.pad(x, widths)

    sq_p = pl.cdiv(s, block_q) * block_q
    sk_p = pl.cdiv(s, block_k) * block_k
    qm = pad(q.transpose(0, 2, 1, 3), sq_p, 2)
    km = pad(k.transpose(0, 2, 1, 3), sk_p, 2)
    vm = pad(v.transpose(0, 2, 1, 3), sk_p, 2)
    pm = pad(policy.astype(jnp.float32), sk_p, 1)[:, None, :]  # [B, 1, S]

    grid = (b, h, sq_p // block_q)
    kernel = functools.partial(
        _policy_kernel, scale=scale, block_q=block_q, block_k=block_k,
        seq_len=s, eps=eps,
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec((None, None, block_q, d),
                             lambda b_, h_, qi: (b_, h_, qi, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((None, None, sk_p, d),
                             lambda b_, h_, qi: (b_, h_ // n_rep, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((None, None, sk_p, d),
                             lambda b_, h_, qi: (b_, h_ // n_rep, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((None, 1, sk_p),
                             lambda b_, h_, qi: (b_, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((None, None, block_q, d),
                                   lambda b_, h_, qi: (b_, h_, qi, 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, sq_p, d), q.dtype),
        interpret=interpret,
    )(qm, km, vm, pm)
    return out[:, :, :s].transpose(0, 2, 1, 3)


# -- differentiable wrapper (XLA recompute backward) -------------------------


@jax.custom_vjp
def _policy_attach_bwd(q, k, v, policy, out):
    """Identity on ``out`` carrying the recompute backward. The fused
    forward kernel runs outside (under stop_gradient) with its output
    tagged ``checkpoint_name("flash_policy_out")``: under a remat policy
    that saves the name, the backward's residuals (q/k/v/policy — plain
    inputs here) come from cheap recomputed projections and the forward
    kernel is dead code in the recompute (see flash_attention._flash_attach_bwd)."""
    return out


def _policy_attach_fwd(q, k, v, policy, out):
    return out, (q, k, v, policy)


def _policy_attach_bwd_rule(residuals, g):
    """Blockwise-remat gradient recompute (O(block x S) memory; see
    attention.blockwise_attend)."""
    from .attention import blockwise_attend

    q, k, v, policy = residuals

    def oracle(q_, k_, v_, p_):
        return blockwise_attend(q_, k_, v_, policy=p_)

    out_shape, vjp = jax.vjp(oracle, q, k, v, policy)
    return vjp(g) + (jnp.zeros_like(out_shape),)


_policy_attach_bwd.defvjp(_policy_attach_fwd, _policy_attach_bwd_rule)


def flash_policy_attention_vjp(q, k, v, policy):
    """Fused forward + recompute backward — safe under jax.grad/remat."""
    from jax.ad_checkpoint import checkpoint_name

    sg = jax.lax.stop_gradient
    out = flash_policy_attention(sg(q), sg(k), sg(v), sg(policy))
    out = checkpoint_name(out, "flash_policy_out")
    return _policy_attach_bwd(q, k, v, policy, out)
