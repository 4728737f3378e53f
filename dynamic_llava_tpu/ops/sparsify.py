"""Static-shape token selection and compaction.

These ops replace the reference's data-dependent pruning (``torch.topk`` +
``gather`` with runtime shapes, dynamic_modeling_llama.py:1897-1994, and the
threshold-based instruct prune :2261-2375) with shape-stable equivalents:

* ``topk_keep_mask`` — fixed keep-budget top-k over a scored span, returned
  as a boolean mask over the full sequence (budget K is a Python int, so XLA
  compiles one program).
* ``compact_by_mask`` — stable compaction: kept tokens move to the front in
  original order, the tail is padding. Realized as an argsort-gather, which
  XLA lowers to an efficient on-chip sort (sequence lengths here are ≤ ~2.7k,
  far below where a custom kernel would pay off); the result stays
  left-aligned so downstream attention only needs a length mask.

Order preservation is load-bearing: because kept tokens remain in ascending
original-position order, plain causal masking on the compacted sequence is
exactly causal masking by original position (SURVEY.md §7.1).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp


def topk_keep_mask(
    scores: jax.Array,  # [B, S] fp; higher = keep
    budget: int,
    candidate_mask: jax.Array,  # [B, S] bool — only these positions compete
) -> jax.Array:
    """Boolean [B, S] mask keeping the top-``budget`` candidates per sample.

    Non-candidates are never selected. Matches the reference's
    ``topk(log_softmax(logits)[..., 0], k)`` over the image span
    (dynamic_modeling_llama.py:1899-1935), but the budget is static.
    """
    neg = jnp.finfo(scores.dtype).min
    masked = jnp.where(candidate_mask, scores, neg)
    _, idx = jax.lax.top_k(masked, budget)  # [B, budget]
    keep = jnp.zeros(scores.shape, bool).at[
        jnp.arange(scores.shape[0])[:, None], idx
    ].set(True)
    return keep & candidate_mask


class Compacted(NamedTuple):
    """Result of a full-sequence compaction."""

    gather_idx: jax.Array  # [B, S_out] int32 original index of each output slot
    new_length: jax.Array  # [B] int32 kept-token count
    valid: jax.Array  # [B, S_out] bool — slot holds a kept token


def plan_compaction(
    keep_mask: jax.Array,  # [B, S] bool (False for padding AND dropped tokens)
    out_len: Optional[int] = None,
) -> Compacted:
    """Compute the stable gather that left-aligns kept tokens.

    ``argsort`` of ``~keep`` (stable) puts kept positions first, preserving
    order. ``out_len`` may truncate the padded tail statically when an upper
    bound on kept count is known (e.g. S - 576 + K after vision pruning).
    """
    s = keep_mask.shape[1]
    order = jnp.argsort(~keep_mask, axis=1, stable=True).astype(jnp.int32)  # [B, S]
    new_length = jnp.sum(keep_mask, axis=1).astype(jnp.int32)
    if out_len is None:
        out_len = s
    order = order[:, :out_len]
    valid = (
        jnp.arange(out_len, dtype=jnp.int32)[None, :] < new_length[:, None]
    )
    return Compacted(gather_idx=order, new_length=new_length, valid=valid)


def gather_tokens(x: jax.Array, gather_idx: jax.Array) -> jax.Array:
    """Apply a compaction plan to a [B, S, ...] tensor (or [B, S])."""
    if x.ndim == 2:
        return jnp.take_along_axis(x, gather_idx, axis=1)
    idx = gather_idx.reshape(gather_idx.shape + (1,) * (x.ndim - 2))
    return jnp.take_along_axis(x, jnp.broadcast_to(idx, gather_idx.shape + x.shape[2:]), axis=1)


def remap_span_starts(
    span_pos: jax.Array,  # [B] int32 original position
    keep_mask: jax.Array,  # [B, S] bool
) -> jax.Array:
    """New index of an original position after compaction = number of kept
    tokens strictly before it (replaces the reference's
    ``input_embeds_indices`` shifting, dynamic_modeling_llama.py:1960-1994)."""
    s = keep_mask.shape[1]
    pos = jnp.arange(s, dtype=jnp.int32)[None, :]
    before = keep_mask & (pos < span_pos[:, None])
    return jnp.sum(before, axis=1).astype(jnp.int32)
