"""Dynamic-LLaVA model: multimodal composition + sparsification orchestration.

This is the TPU-native heart of the framework, replacing the reference's
``DynamicLlamaModel.forward`` orchestration block
(/root/reference/llava/model/language_model/dynamic_modeling_llama.py:1824-2521)
and the ``DynamicLlavaLlamaForCausalLM`` wrapper (dynamic_llava_llama.py:50-173).

Execution regimes (reference regime labels from SURVEY.md §2.1):

* ``prefill``  — E1 (vision top-k prune) + E2 (instruct threshold prune) at
  the entry of ``sparse_layer``: the hidden sequence, positions, and spans
  are compacted with a static-budget gather; layers below the sparse layer
  cache the full sequence, layers at/above cache the compacted one.
* ``decode_step`` — E3: TextPredictor on the token entering the sparse layer
  produces a keep/drop decision; every layer writes the token's K/V at its
  current slot (so it is attended this step) and the decision controls
  whether lengths advance (write-then-conditionally-advance).
* ``forward_train`` — T1/T2/T3: Gumbel-softmax hard keep masks composed into
  a single per-token ``policy`` vector consumed by the policy-attention
  kernel; nothing is physically pruned, so shapes stay static and gradients
  flow to the predictors.

With all predictors disabled every regime degenerates to the dense
LLaVA-1.5 path (one stack, not twins — SURVEY.md §7 delta 2).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import LlavaConfig
from ..multimodal.fusion import fuse_embeddings
from ..ops.gumbel import gumbel_keep_mask
from ..ops.kv_cache import (
    KVCache,
    TieredCache,
    advance_tiered,
    init_tiered_cache,
)
from ..ops.sparsify import (
    gather_tokens,
    plan_compaction,
    topk_keep_mask,
)
from . import clip, llama, projector
from .predictors import (
    init_predictors,
    text_predictor,
    vision_predictor,
)


# ---------------------------------------------------------------------------
# Parameters
# ---------------------------------------------------------------------------


def init_llava_params(key: jax.Array, cfg: LlavaConfig, dtype=jnp.float32):
    ks = jax.random.split(key, 4)
    params = {
        "llm": llama.init_llama_params(ks[0], cfg.text, dtype),
        "vision_tower": clip.init_clip_params(ks[1], cfg.vision, dtype),
        "mm_projector": projector.init_projector_params(
            ks[2], cfg.mm_projector_type, cfg.vision.hidden_size,
            cfg.text.hidden_size, dtype,
        ),
    }
    preds = init_predictors(ks[3], cfg.text, cfg.sparse, dtype)
    if preds:
        params["predictors"] = preds
    return params


def encode_images(
    params, cfg: LlavaConfig, pixel_values: jax.Array,
    frozen_tower: bool = False,
) -> jax.Array:
    """Tower + projector (reference encode_images, dynamic_llava_arch.py:163-166).
    pixel_values: [B, H, W, 3] normalized NHWC -> [B, N_img, D].

    ``frozen_tower`` stops gradients at the tower features (the reference
    recipe freezes CLIP) while leaving the projector trainable — it is the
    ONLY trainable module in the stage-1 alignment recipe."""
    feats = clip.vision_tower_features(params["vision_tower"], cfg.vision, pixel_values)
    if frozen_tower:
        feats = jax.lax.stop_gradient(feats)
    return projector.apply_projector(params["mm_projector"], feats)


# ---------------------------------------------------------------------------
# Span helpers (device-side, static shape)
# ---------------------------------------------------------------------------


def _span_mask(s: int, start: jax.Array, end: jax.Array) -> jax.Array:
    """[B, S] bool mask for per-sample [start, end) spans."""
    pos = jnp.arange(s, dtype=jnp.int32)[None, :]
    return (pos >= start[:, None]) & (pos < end[:, None])


def _gather_span(x: jax.Array, start: jax.Array, length: int) -> jax.Array:
    """Gather a contiguous per-sample span of static length: [B, S, D] ->
    [B, length, D]."""
    b = x.shape[0]
    idx = start[:, None] + jnp.arange(length, dtype=jnp.int32)[None, :]
    return x[jnp.arange(b, dtype=jnp.int32)[:, None], idx]


# ---------------------------------------------------------------------------
# Inference: prefill
# ---------------------------------------------------------------------------


class GenState(NamedTuple):
    """Carried generation state (all static shapes)."""

    cache: TieredCache
    next_pos: jax.Array  # [B] original-position counter for RoPE (pre-pruning numbering)
    last_logits: jax.Array  # [B, V] fp32 logits of the last processed token
    # Ring-overflow mode only (kv_overflow="ring"): each tier's prefill
    # length per sample — the protected region below which the decode ring
    # never evicts. None in the default drop mode.
    ring_base: Optional[jax.Array] = None  # [B] int32 (post tier)
    ring_base_pre: Optional[jax.Array] = None  # [B] int32 (pre tier)


class PrefillInfo(NamedTuple):
    """Diagnostics: what got kept (for visualize/eval probes)."""

    image_keep_mask: Optional[jax.Array]  # [B, S] over pre-compaction slots
    kept_positions: jax.Array  # [B, S_c] original positions of compacted slots
    new_length: jax.Array  # [B] post-compaction valid length


def prefill(
    params,
    cfg: LlavaConfig,
    plan_token_ids: jax.Array,  # [B, S]
    plan_is_image: jax.Array,  # [B, S] bool
    plan_image_slot: jax.Array,  # [B, S] int32
    valid_len: jax.Array,  # [B]
    image_start: jax.Array,  # [B]
    last_instruct_start: jax.Array,  # [B]
    last_instruct_end: jax.Array,  # [B]
    has_image: jax.Array,  # [B] bool
    pixel_values: Optional[jax.Array],  # [B, H, W, 3] or None (text-only)
    cache: TieredCache,
    image_features: Optional[jax.Array] = None,  # [B, N_pad, D] pre-encoded
    all_have_image: bool = False,
    ring_mode: bool = False,  # records ring_base for kv_overflow="ring"
    vision_score_override: Optional[jax.Array] = None,  # [B, N_img] ablation
) -> Tuple[GenState, PrefillInfo]:
    """``image_features`` bypasses the in-graph tower for pre-encoded inputs
    (anyres tiling produces per-sample token counts the planner already
    encodes in ``plan_image_slot``; the vision predictor's fixed-span top-k
    assumes the standard tower, so use features only with predictors off —
    matching the reference, where anyres exists on the dense path only).

    ``all_have_image`` is a static (host-known) promise that every sample in
    the batch has exactly one image. Only then may the compacted sequence be
    truncated to ``S - N_img + K``: a text-only sample keeps all its tokens
    (reference mixed-batch handling, dynamic_llava_arch.py:372-388), so in a
    mixed batch the safe bound is the full length S. The planner knows this
    host-side (``plan.spans.has_image``); callers pass it through."""
    tcfg, sparse = cfg.text, cfg.sparse
    b, s = plan_token_ids.shape
    n_img = cfg.num_image_tokens

    x = llama.embed_tokens(params["llm"], plan_token_ids)
    if image_features is not None:
        x = fuse_embeddings(x, image_features, plan_is_image, plan_image_slot)
        pixel_values = None
    elif pixel_values is not None:
        img_feats = encode_images(params, cfg, pixel_values)
        x = fuse_embeddings(x, img_feats, plan_is_image, plan_image_slot)
    positions = jnp.broadcast_to(jnp.arange(s, dtype=jnp.int32)[None], (b, s))

    sl = sparse.sparse_layer
    res = llama.run_layers_prefill(
        params["llm"], tcfg, x, positions, cache.pre, valid_len, lo=0, hi=sl
    )
    x, cache_pre = res.x, res.cache

    valid = positions < valid_len[:, None]
    keep = valid
    image_keep = None
    out_len = s
    if sparse.use_vision_predictor and pixel_values is not None:
        # E1: score image tokens on the hidden states entering the sparse
        # layer, keep the top-K (reference :1897-1994)
        if vision_score_override is not None:
            # eval-only ablation hook (run/sparse_quality.py): replace the
            # learned scores (e.g. with per-sample random values) so random
            # pruning runs the identical top-k/compaction path
            scores_img = vision_score_override.astype(jnp.float32)
        else:
            img_hidden = _gather_span(x, image_start, n_img)  # [B, N_img, D]
            logits = vision_predictor(
                params["predictors"]["image_score_predictor"], img_hidden,
                sparse,
            )
            scores_img = jax.nn.log_softmax(
                logits.astype(jnp.float32), axis=-1
            )[..., 0]
        # scatter span scores back to full-sequence coordinates
        scores = jnp.zeros((b, s), jnp.float32)
        batch_idx = jnp.arange(b, dtype=jnp.int32)[:, None]
        span_idx = image_start[:, None] + jnp.arange(n_img, dtype=jnp.int32)[None, :]
        scores = scores.at[batch_idx, span_idx].set(scores_img)
        k_budget = sparse.vision_keep_budget(n_img)
        img_keep = topk_keep_mask(scores, k_budget, plan_is_image & valid)
        # samples without an image keep their (empty) image span untouched
        keep = jnp.where(
            (has_image[:, None]) & plan_is_image, img_keep, keep
        )
        image_keep = img_keep
        if all_have_image:
            out_len = s - n_img + k_budget

    if sparse.use_instruct_predictor:
        # E2: threshold prune of the last-instruct span; the final token of
        # the span is always kept (reference :2261-2375)
        tp = text_predictor(params["predictors"]["instruct_score_predictor"], x)
        instr_keep = tp[..., 0] > tp[..., 1]
        instr_span = _span_mask(s, last_instruct_start, last_instruct_end)
        is_span_last = (
            jnp.arange(s, dtype=jnp.int32)[None, :] == (last_instruct_end - 1)[:, None]
        )
        keep = jnp.where(instr_span & ~is_span_last, keep & instr_keep, keep)

    needs_compaction = sparse.use_vision_predictor or sparse.use_instruct_predictor
    if needs_compaction:
        comp = plan_compaction(keep, out_len=out_len)
        x = gather_tokens(x, comp.gather_idx)
        new_positions = gather_tokens(positions, comp.gather_idx)
        new_valid = comp.new_length
    else:
        new_positions = positions
        new_valid = valid_len

    # the sparse tier may be allocated at the pruned budget: truncate the
    # (padded) compacted sequence to its capacity before writing
    post_cap = cache.post.max_len
    if x.shape[1] > post_cap:
        x = x[:, :post_cap]
        new_positions = new_positions[:, :post_cap]
    # defensive invariant: the last-token gather (and the cache length) must
    # stay within the materialized sequence even if a caller undersized the
    # post tier for this batch pattern
    new_valid = jnp.minimum(new_valid, x.shape[1])
    res2 = llama.run_layers_prefill(
        params["llm"], tcfg, x, new_positions, cache.post, new_valid,
        lo=sl, hi=tcfg.num_hidden_layers,
    )
    x, cache_post = res2.x, res2.cache

    last_hidden = _gather_span(x, new_valid - 1, 1)  # [B, 1, D]
    logits = llama.lm_head(params["llm"], tcfg, last_hidden)[:, 0]
    state = GenState(
        cache=TieredCache(pre=cache_pre, post=cache_post),
        next_pos=valid_len,
        last_logits=logits,
        ring_base=new_valid if ring_mode else None,
        ring_base_pre=valid_len if ring_mode else None,
    )
    info = PrefillInfo(
        image_keep_mask=image_keep,
        kept_positions=new_positions,
        new_length=new_valid,
    )
    return state, info


def prefill_continue(
    params,
    cfg: LlavaConfig,
    token_ids: jax.Array,  # [B, M] new round's tokens (right-padded)
    state: GenState,
    chunk_len: Optional[jax.Array] = None,  # [B] valid tokens per sample
) -> GenState:
    """Multi-round continuation (E5, reference :2506-2521): process a new
    instruct chunk against the live cache in one pass. With the instruct
    predictor on, chunk tokens are threshold-pruned before persisting into
    the sparse tier — the final token is always kept.

    ``chunk_len`` enables RAGGED batches (rounds of different lengths,
    right-padded to M): padding tokens are never persisted, per-sample
    positions/lengths advance by the valid count, and the returned logits
    come from each sample's last valid token. Padding rows attend freely
    (causal keeps valid rows from seeing them — padding sits at the tail)
    but their outputs are discarded. A chunk_len of 0 makes that sample a
    no-op (nothing persisted, positions unchanged, logits garbage). Omitted
    = every chunk fully valid, which reproduces the reference's B==1 chat
    regime batched."""
    tcfg, sparse = cfg.text, cfg.sparse
    b, m = token_ids.shape
    sl = sparse.sparse_layer

    valid = None
    if chunk_len is not None:
        valid = (
            jnp.arange(m, dtype=jnp.int32)[None, :] < chunk_len[:, None]
        )  # [B, M]

    x = llama.embed_tokens(params["llm"], token_ids)
    positions = state.next_pos[:, None] + jnp.arange(m, dtype=jnp.int32)[None, :]

    d1 = llama.run_layers_extend(
        params["llm"], tcfg, x, positions, state.cache.pre, lo=0, hi=sl,
        keep=valid,
    )
    x = d1.x
    # kept counts come from the layer runner: they reflect its capacity
    # clamp, so lengths never advance past what was actually persisted
    cache_pre = d1.cache._replace(length=d1.cache.length + d1.kept[None, :])

    keep = valid
    if sparse.use_instruct_predictor:
        tp = text_predictor(params["predictors"]["instruct_score_predictor"], x)
        keep = tp[..., 0] > tp[..., 1]
        if valid is not None:
            keep = jnp.logical_and(keep, valid)
            # last VALID token forced keep, per sample; a chunk_len==0 row
            # forces nothing (an unguarded .at[b, -1] would wrap to column
            # M-1 and persist a padding token into the sparse tier)
            is_last_valid = (
                jnp.arange(m, dtype=jnp.int32)[None, :]
                == (chunk_len - 1)[:, None]
            ) & (chunk_len >= 1)[:, None]
            keep = keep | is_last_valid
        else:
            keep = keep.at[:, -1].set(True)  # last token forced keep

    d2 = llama.run_layers_extend(
        params["llm"], tcfg, x, positions, state.cache.post,
        lo=sl, hi=tcfg.num_hidden_layers, keep=keep,
    )
    x = d2.x
    cache_post = d2.cache._replace(length=d2.cache.length + d2.kept[None, :])

    if chunk_len is not None:
        # chunk_len==0 rows gather slot 0 (arbitrary but in-bounds); their
        # positions/lengths advance by 0, so the state is a true no-op and
        # the garbage logits are the caller's to ignore
        last_idx = jnp.maximum(chunk_len - 1, 0)
        last = jnp.take_along_axis(
            x, last_idx[:, None, None].astype(jnp.int32), axis=1
        )  # [B, 1, D]
        advance = chunk_len.astype(state.next_pos.dtype)
    else:
        last = x[:, -1:]
        advance = jnp.asarray(m, state.next_pos.dtype)
    logits = llama.lm_head(params["llm"], tcfg, last)[:, 0]
    return GenState(
        cache=TieredCache(pre=cache_pre, post=cache_post),
        next_pos=state.next_pos + advance,
        last_logits=logits,
        # the ring markers pass through unchanged, but NOTE: the extend
        # path itself never wraps — once a tier budget fills, chunk
        # tokens are force-dropped (the capacity guard above). Ring
        # eviction is a decode_step-only contract; multi-round sessions
        # should use kv_overflow="drop" (ChatSession enforces this).
        ring_base=state.ring_base,
        ring_base_pre=state.ring_base_pre,
    )


def forward_nocache_eval(
    params,
    cfg: LlavaConfig,
    plan_token_ids: jax.Array,
    plan_is_image: jax.Array,
    plan_image_slot: jax.Array,
    valid_len: jax.Array,
    image_start: jax.Array,
    answer_start: jax.Array,
    last_instruct_start: jax.Array,
    last_instruct_end: jax.Array,
    has_image: jax.Array,
    pixel_values: Optional[jax.Array],
) -> Tuple[jax.Array, jax.Array]:
    """E4: cache-free hard-pruned forward (reference :2393-2504, the
    quadratic-recompute regime driven by the no-cache bench). Image tokens
    are top-k pruned, and — unlike ``prefill`` — the generated answer span
    [answer_start, valid_len-1) is re-pruned from scratch by the output-text
    predictor's threshold each call; the final token is always kept.

    Returns (last-token logits [B, V], kept lengths [B]).
    """
    tcfg, sparse = cfg.text, cfg.sparse
    b, s = plan_token_ids.shape
    n_img = cfg.num_image_tokens
    sl = sparse.sparse_layer

    x = llama.embed_tokens(params["llm"], plan_token_ids)
    if pixel_values is not None:
        img_feats = encode_images(params, cfg, pixel_values)
        x = fuse_embeddings(x, img_feats, plan_is_image, plan_image_slot)
    positions = jnp.broadcast_to(jnp.arange(s, dtype=jnp.int32)[None], (b, s))

    x = llama.run_layers_nocache(params["llm"], tcfg, x, positions, lo=0, hi=sl)

    valid = positions < valid_len[:, None]
    keep = valid
    if sparse.use_vision_predictor and pixel_values is not None:
        img_hidden = _gather_span(x, image_start, n_img)
        logits = vision_predictor(
            params["predictors"]["image_score_predictor"], img_hidden, sparse
        )
        scores_img = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)[..., 0]
        scores = jnp.zeros((b, s), jnp.float32)
        bi = jnp.arange(b, dtype=jnp.int32)[:, None]
        si = image_start[:, None] + jnp.arange(n_img, dtype=jnp.int32)[None, :]
        scores = scores.at[bi, si].set(scores_img)
        img_keep = topk_keep_mask(
            scores, sparse.vision_keep_budget(n_img), plan_is_image & valid
        )
        keep = jnp.where(has_image[:, None] & plan_is_image, img_keep, keep)

    if sparse.use_output_text_predictor:
        tp = text_predictor(params["predictors"]["output_text_score_predictor"], x)
        txt_keep = tp[..., 0] > tp[..., 1]
        ans_span = _span_mask(s, answer_start, valid_len - 1)  # last token exempt
        keep = jnp.where(ans_span, keep & txt_keep, keep)

    if sparse.use_instruct_predictor:
        tp = text_predictor(params["predictors"]["instruct_score_predictor"], x)
        ins_keep = tp[..., 0] > tp[..., 1]
        ins_span = _span_mask(s, last_instruct_start, last_instruct_end)
        is_last = (
            jnp.arange(s, dtype=jnp.int32)[None, :]
            == (last_instruct_end - 1)[:, None]
        )
        keep = jnp.where(ins_span & ~is_last, keep & ins_keep, keep)

    comp = plan_compaction(keep)
    x = gather_tokens(x, comp.gather_idx)
    new_positions = gather_tokens(positions, comp.gather_idx)

    x = llama.run_layers_nocache(
        params["llm"], tcfg, x, new_positions, lo=sl, hi=tcfg.num_hidden_layers
    )
    last_hidden = _gather_span(x, comp.new_length - 1, 1)
    logits = llama.lm_head(params["llm"], tcfg, last_hidden)[:, 0]
    return logits, comp.new_length


# ---------------------------------------------------------------------------
# Inference: decode
# ---------------------------------------------------------------------------


def _ring_slots(
    length: jax.Array,  # [B] persisted count (may exceed the budget)
    base: jax.Array,  # [B] protected prefill region bound
    budget: int,  # tier capacity minus the scratch slot
    active: Optional[jax.Array],
):
    """Shared ring arithmetic: (attend_bound, write_slot, wrapped). Below
    the budget this reproduces the append-at-length protocol exactly; past
    it the write slot rotates over [base, budget) so each new token evicts
    the oldest decode-region entry, and the attend bound saturates at the
    budget. Frozen samples write to the scratch slot (never attended)."""
    cap = jnp.maximum(budget - base, 1)
    wrapped = length >= budget
    slot = jnp.where(
        wrapped, base + jnp.remainder(length - base, cap), length
    ).astype(jnp.int32)
    if active is not None:
        slot = jnp.where(active, slot, budget)
    return jnp.minimum(length, budget), slot, wrapped


def decode_step(
    params,
    cfg: LlavaConfig,
    token: jax.Array,  # [B] next input token ids
    state: GenState,
    active: Optional[jax.Array] = None,  # [B] bool — False freezes the sample
    kv_overflow: str = "drop",  # "drop" | "ring" (static)
    output_text_keep_override: Optional[jax.Array] = None,  # [B] ablation
) -> GenState:
    """``active=False`` samples are frozen no-ops: the token's K/V lands in
    the (never-persisted) next slot, lengths/positions do not advance, and
    ``last_logits`` keeps its previous value. This is what lets a chunked
    on-device decode scan run past a sample's EOS without corrupting the
    live cache — the chat/multi-round regime (reference streams one token
    at a time instead, serve/model_worker.py:162-264).

    ``kv_overflow`` picks the post-tier full-budget policy:

    * ``"drop"`` (default, the reference-faithful capacity contract): once
      the budget fills, further tokens are force-dropped — they attend
      from the scratch slot this step but are never persisted, so a very
      long generation keeps its prompt + earliest kept tokens.
    * ``"ring"``: post-wrap, EVERY token persists by overwriting the
      oldest decode-region entry (the prefill region below the tier's ring
      base is protected) — a sliding recency window at the same fixed
      allocation, in BOTH tiers (each wraps independently at its own
      budget). ``state.ring_base``/``ring_base_pre`` must be set (prefill
      ring_mode). Beyond-parity: the reference has no bounded-cache
      long-generation story at all (its cache grows to model_max_length).
    """
    tcfg, sparse = cfg.text, cfg.sparse
    b = token.shape[0]
    sl = sparse.sparse_layer
    if kv_overflow == "ring":
        # a wrapped ring breaks the slot==position invariant the window
        # mask relies on — and a sliding window IS already a recency ring
        assert tcfg.sliding_window is None, (
            "kv_overflow='ring' is incompatible with sliding_window"
        )

    x = llama.embed_tokens(params["llm"], token[:, None])
    pos = state.next_pos[:, None]

    pre_bound = pre_slot = None
    if (
        kv_overflow == "ring"
        and state.ring_base_pre is not None
        and state.cache.pre.num_layers > 0
    ):
        pre_bound, pre_slot, _ = _ring_slots(
            state.cache.pre.length[0], state.ring_base_pre,
            state.cache.pre.max_len - 1, active,
        )
    d1 = llama.run_layers_decode(
        params["llm"], tcfg, x, pos, state.cache.pre, lo=0, hi=sl,
        attend_bound=pre_bound, write_slot=pre_slot,
    )
    x, cache_pre = d1.x, d1.cache

    if output_text_keep_override is not None:
        # eval-only ablation hook (run/text_sparse_quality.py): replace the
        # learned E3 keep decision (e.g. with per-step Bernoulli draws) so
        # random KV dropping runs the identical persist/advance path
        keep = output_text_keep_override.astype(jnp.int32)
    elif sparse.use_output_text_predictor:
        # E3: per-token keep decision on the hidden entering the sparse layer
        # (reference :2377-2391): threshold logit[keep] > logit[drop]
        tp = text_predictor(
            params["predictors"]["output_text_score_predictor"], x[:, 0]
        )
        keep = (tp[..., 0] > tp[..., 1]).astype(jnp.int32)
    else:
        keep = jnp.ones((b,), jnp.int32)

    # capacity bound: the post tier reserves its last slot as scratch for the
    # in-flight token; once the budget fills, the kv_overflow policy applies.
    # This is what lets the tier be ALLOCATED at keep_rate x max_new instead
    # of worst-case max_new.
    attend_bound = write_slot = None  # default: append-at-length protocol
    if state.cache.post.num_layers > 0:
        post_budget = state.cache.post.max_len - 1
        cur_len = state.cache.post.length[0]
        if kv_overflow == "ring" and state.ring_base is not None:
            attend_bound, write_slot, wrapped = _ring_slots(
                cur_len, state.ring_base, post_budget, active
            )
            # post-wrap every token persists (evicting the oldest); the
            # predictor's decision still applies pre-wrap
            keep = jnp.where(wrapped, 1, keep)
        else:
            keep = keep * (cur_len < post_budget).astype(jnp.int32)
    if active is not None:
        keep = keep * active.astype(jnp.int32)

    d2 = llama.run_layers_decode(
        params["llm"], tcfg, x, pos, state.cache.post,
        lo=sl, hi=tcfg.num_hidden_layers,
        attend_bound=attend_bound, write_slot=write_slot,
    )
    x, cache_post = d2.x, d2.cache

    cache = advance_tiered(
        TieredCache(pre=cache_pre, post=cache_post), keep, active=active
    )
    logits = llama.lm_head(params["llm"], tcfg, x)[:, 0]
    if active is not None:
        pos_inc = active.astype(state.next_pos.dtype)
        logits = jnp.where(active[:, None], logits, state.last_logits)
    else:
        pos_inc = 1
    return GenState(
        cache=cache,
        next_pos=state.next_pos + pos_inc,
        last_logits=logits,
        ring_base=state.ring_base,
        ring_base_pre=state.ring_base_pre,
    )


def decode_speculative_step(
    params,
    cfg: LlavaConfig,
    tokens: jax.Array,  # [B, M]: [next committed token, draft_1..draft_{M-1}]
    state: GenState,
    eos_token_id: int,
    active: Optional[jax.Array] = None,  # [B] bool — False freezes the sample
) -> Tuple[GenState, jax.Array, jax.Array]:
    """One speculative round: verify M candidate tokens in ONE forward pass,
    exactly equivalent to feeding them one-by-one through ``decode_step``.

    ``tokens[:, 0]`` is the model's own committed next token (argmax of
    ``state.last_logits``) — always accepted; ``tokens[:, 1:]`` are drafts
    from any source. The pass runs ``run_layers_extend`` with the
    sequential-equivalence chunk mask (a token the output-text predictor
    DROPS is invisible to later chunk tokens, as it would be step-by-step),
    computes the greedy argmax chain over all M positions, accepts the
    longest matching prefix (cut at the first EOS input), and rolls the
    caches back to the accepted prefix BY LENGTHS ALONE — rejected tokens'
    K/V were written beyond the rolled-back lengths, are never attended
    (attention bounds by length), and are overwritten by later rounds.

    Returns ``(state2, n_acc [B] int32, next_tok [B] int32)``: the number
    of accepted input tokens (>= 1 for active samples; the caller emits
    ``tokens[b, :n_acc]``) and the committed token that follows the
    accepted prefix (round r+1's ``tokens[:, 0]``). A drop-mode contract:
    the decode-budget force-drop applies per token exactly as in
    ``decode_step``; incompatible with ``kv_overflow="ring"``.

    Beyond-parity: the reference has no speculative/assisted decoding
    (HF GenerationMixin greedy loop only, dynamic_llava_llama.py:117-169).
    With M == 1 this degenerates to plain greedy decode.
    """
    tcfg, sparse = cfg.text, cfg.sparse
    assert state.ring_base is None, "speculative decode requires drop mode"
    b, m = tokens.shape
    sl = sparse.sparse_layer

    x = llama.embed_tokens(params["llm"], tokens)
    positions = state.next_pos[:, None] + jnp.arange(m, dtype=jnp.int32)[None, :]
    valid = None
    if active is not None:
        valid = jnp.broadcast_to(active[:, None], (b, m))

    d1 = llama.run_layers_extend(
        params["llm"], tcfg, x, positions, state.cache.pre, lo=0, hi=sl,
        keep=valid,
    )
    x = d1.x

    # E3 per-token persist decision, batched over the M candidates — the
    # hidden entering the sparse layer is identical to the sequential
    # path's (the pre tier persists everything), so decisions match
    if sparse.use_output_text_predictor:
        tp = text_predictor(
            params["predictors"]["output_text_score_predictor"], x
        )
        keep = tp[..., 0] > tp[..., 1]  # [B, M]
    else:
        keep = jnp.ones((b, m), bool)
    # capacity force-drop, cumulative over the chunk (same rule the
    # sequential steps apply one at a time); computed here because the
    # chunk-attend mask must reflect the POST-clamp decisions
    post_budget = state.cache.post.max_len - 1
    len_post0 = state.cache.post.length[0]
    offsets = jnp.cumsum(keep.astype(jnp.int32), axis=1) - 1
    remaining = jnp.maximum(post_budget - len_post0, 0)
    keep = keep & (offsets < remaining[:, None])
    if valid is not None:
        keep = keep & valid

    d2 = llama.run_layers_extend(
        params["llm"], tcfg, x, positions, state.cache.post,
        lo=sl, hi=tcfg.num_hidden_layers, keep=keep, chunk_attend=keep,
    )

    logits_all = llama.lm_head(params["llm"], tcfg, d2.x)  # [B, M, V] fp32
    am = jnp.argmax(logits_all, axis=-1).astype(jnp.int32)  # [B, M]

    # longest accepted prefix: input i (i >= 1) is accepted iff it equals
    # the argmax after input i-1 and everything before it was accepted
    if m > 1:
        matches = (tokens[:, 1:].astype(jnp.int32) == am[:, :-1]).astype(
            jnp.int32
        )
        n_acc = 1 + jnp.sum(jnp.cumprod(matches, axis=1), axis=1)
    else:
        n_acc = jnp.ones((b,), jnp.int32)
    # cut at the first EOS input: EOS is emitted, nothing persists past it
    # (the sequential loop stops there)
    is_eos = tokens == eos_token_id
    first_eos = jnp.argmax(is_eos, axis=1).astype(jnp.int32)
    n_acc = jnp.where(
        jnp.any(is_eos, axis=1), jnp.minimum(n_acc, first_eos + 1), n_acc
    )
    # defensive: never advance past what the pre tier actually persisted
    # (its capacity clamp only fires on an undersized cache; callers
    # allocate max_new + M headroom)
    n_acc = jnp.minimum(n_acc, d1.kept)
    if active is not None:
        n_acc = jnp.where(active, n_acc, 0)

    # rollback-by-lengths to the accepted prefix
    idx = jnp.maximum(n_acc - 1, 0)[:, None]
    kept_cum = jnp.cumsum(keep.astype(jnp.int32), axis=1)  # [B, M]
    kept_acc = jnp.where(
        n_acc > 0, jnp.take_along_axis(kept_cum, idx, axis=1)[:, 0], 0
    )
    cache_pre = d1.cache._replace(length=d1.cache.length + n_acc[None, :])
    cache_post = d2.cache._replace(
        length=d2.cache.length + kept_acc[None, :]
    )

    last = jnp.take_along_axis(
        logits_all, idx[..., None].astype(jnp.int32), axis=1
    )[:, 0]  # [B, V] — logits after the last accepted token
    next_tok = jnp.take_along_axis(am, idx, axis=1)[:, 0]
    if active is not None:
        last = jnp.where(active[:, None], last, state.last_logits)
    state2 = GenState(
        cache=TieredCache(pre=cache_pre, post=cache_post),
        next_pos=state.next_pos + n_acc,
        last_logits=last,
        ring_base=state.ring_base,
        ring_base_pre=state.ring_base_pre,
    )
    return state2, n_acc, next_tok


# ---------------------------------------------------------------------------
# Training forward (policy soft-mask path)
# ---------------------------------------------------------------------------


class TrainForwardOut(NamedTuple):
    logits: Optional[jax.Array]  # [B, S, V] fp32 (None when return_hidden)
    hidden: Optional[jax.Array]  # [B, S, D] final hidden (return_hidden only)
    image_mask: Optional[jax.Array]  # [B, S] gumbel keep over image slots (1 elsewhere)
    output_text_mask: Optional[jax.Array]  # [B, S]
    instruct_mask: Optional[jax.Array]  # [B, S]
    image_span: Optional[jax.Array]  # [B, S] bool
    answer_span: Optional[jax.Array]  # [B, S] bool (only where predictor applied)
    instruct_span: Optional[jax.Array]  # [B, S] bool


def forward_train(
    params,
    cfg: LlavaConfig,
    plan_token_ids: jax.Array,
    plan_is_image: jax.Array,
    plan_image_slot: jax.Array,
    valid_len: jax.Array,
    image_start: jax.Array,
    answer_start: jax.Array,
    answer_end: jax.Array,
    last_instruct_start: jax.Array,
    last_instruct_end: jax.Array,
    has_image: jax.Array,
    pixel_values: Optional[jax.Array],
    rng: jax.Array,
    gumbel_tau: jax.Array,
    remat: bool = True,
    remat_policy: str = "nothing",
    return_hidden: bool = False,
    layer_runner=None,
) -> TrainForwardOut:
    """Full-sequence training forward with Gumbel policy masks
    (reference T1/T2/T3, dynamic_modeling_llama.py:1824-2259).

    ``return_hidden=True`` skips the lm_head and returns the final hidden
    states instead of logits, so the loss can run the blockwise-fused CE
    (``train.losses.lm_cross_entropy_blockwise``) without the [B, S, V]
    fp32 logits tensor ever existing.

    ``layer_runner`` overrides how the two decoder layer ranges execute
    (same signature as ``llama.run_layers_nocache``) — the hook pipeline
    parallelism plugs into (``parallel.pipeline.make_layer_runner``)."""
    tcfg, sparse = cfg.text, cfg.sparse
    b, s = plan_token_ids.shape
    n_img = cfg.num_image_tokens
    sl = sparse.sparse_layer

    x = llama.embed_tokens(params["llm"], plan_token_ids)
    if pixel_values is not None:
        img_feats = encode_images(params, cfg, pixel_values,
                                  frozen_tower=True)
        x = fuse_embeddings(x, img_feats, plan_is_image, plan_image_slot)
    positions = jnp.broadcast_to(jnp.arange(s, dtype=jnp.int32)[None], (b, s))

    run_layers = layer_runner or llama.run_layers_nocache
    x = run_layers(
        params["llm"], tcfg, x, positions, lo=0, hi=sl, remat=remat,
        remat_policy=remat_policy, training=True,
    )

    valid = positions < valid_len[:, None]
    policy = jnp.ones((b, s), jnp.float32)
    rngs = jax.random.split(rng, 3)

    image_mask = output_text_mask = instruct_mask = None
    image_span = answer_span = instruct_span = None

    if sparse.use_vision_predictor and pixel_values is not None:
        # T1: gumbel keep mask over image tokens (prev decision = ones)
        img_hidden = _gather_span(x, image_start, n_img)
        logits = vision_predictor(
            params["predictors"]["image_score_predictor"], img_hidden, sparse
        )
        keep = gumbel_keep_mask(rngs[0], logits, gumbel_tau)  # [B, N_img]
        batch_idx = jnp.arange(b, dtype=jnp.int32)[:, None]
        span_idx = image_start[:, None] + jnp.arange(n_img, dtype=jnp.int32)[None, :]
        mask_full = jnp.ones((b, s), jnp.float32).at[batch_idx, span_idx].set(keep)
        image_span = plan_is_image & valid & has_image[:, None]
        mask_full = jnp.where(image_span, mask_full, 1.0)
        policy = policy * mask_full
        image_mask = mask_full

    if sparse.use_output_text_predictor:
        # T2: gumbel keep over the answer span; answers shorter than
        # output_text_len_for_training are force-kept (reference :2006-2133)
        tp = text_predictor(params["predictors"]["output_text_score_predictor"], x)
        keep = gumbel_keep_mask(rngs[1], tp, gumbel_tau)  # [B, S]
        ans_len = answer_end - answer_start
        long_enough = ans_len >= sparse.output_text_len_for_training
        answer_span = (
            _span_mask(s, answer_start, answer_end) & valid & long_enough[:, None]
        )
        mask_full = jnp.where(answer_span, keep, 1.0)
        policy = policy * mask_full
        output_text_mask = mask_full

    if sparse.use_instruct_predictor:
        # T3: same for the last-instruct span (reference :2135-2259)
        tp = text_predictor(params["predictors"]["instruct_score_predictor"], x)
        keep = gumbel_keep_mask(rngs[2], tp, gumbel_tau)
        in_len = last_instruct_end - last_instruct_start
        long_enough = in_len >= sparse.instruct_len_for_training
        instruct_span = (
            _span_mask(s, last_instruct_start, last_instruct_end)
            & valid
            & long_enough[:, None]
        )
        mask_full = jnp.where(instruct_span, keep, 1.0)
        policy = policy * mask_full
        instruct_mask = mask_full

    use_policy = (
        sparse.use_vision_predictor
        or sparse.use_output_text_predictor
        or sparse.use_instruct_predictor
    )
    x = run_layers(
        params["llm"], tcfg, x, positions,
        lo=sl, hi=tcfg.num_hidden_layers,
        policy=policy if use_policy else None,
        remat=remat,
        remat_policy=remat_policy,
        training=True,
    )
    logits = None if return_hidden else llama.lm_head(params["llm"], tcfg, x)
    return TrainForwardOut(
        logits=logits,
        hidden=x if return_hidden else None,
        image_mask=image_mask,
        output_text_mask=output_text_mask,
        instruct_mask=instruct_mask,
        image_span=image_span,
        answer_span=answer_span,
        instruct_span=instruct_span,
    )


def gen_cache_sizes(cfg: LlavaConfig, prompt_len: int, max_new_tokens: int,
                    margin: int = 8,
                    bound_output_budget: bool = True,
                    all_have_image: bool = True,
                    bucket: int = 1,
                    decode_window: Optional[int] = None,
                    ring: bool = False) -> Tuple[int, int]:
    """Static cache capacities: the pre tier holds everything; the post tier
    is sized by the pruned prefill budget + decode headroom. This is where
    the image-token pruning (576 -> ~115) turns into a smaller buffer — and
    therefore less attention bandwidth — for all layers >= sparse_layer.

    With ``bound_output_budget`` the decode headroom is
    ``keep_rate * max_new + margin`` (+1 scratch slot): the statistically
    expected KV footprint of the output-text sparsifier, enforced exactly by
    the forced-drop-when-full rule in ``decode_step``.

    ``all_have_image`` must be False for batches that may contain text-only
    samples — those keep all prompt tokens, so the post tier cannot be
    shrunk by the vision-prune budget. ``bucket`` rounds both capacities up
    to a multiple, so distinct prompt lengths share one compiled decode
    program (remote TPU compiles take minutes; see eval harness note).

    ``decode_window`` caps the post tier's decode headroom at a fixed token
    count regardless of ``max_new_tokens`` — the allocation knob for the
    ring-overflow mode (``decode_step(kv_overflow="ring")``), where decode
    KV beyond the window evicts the oldest decode entry instead of growing
    the buffer. With the default "drop" mode a window just moves the
    force-drop point earlier.

    ``ring`` additionally caps the PRE tier at the window (both tiers wrap
    in ring mode, so the WHOLE allocation is bounded regardless of
    ``max_new_tokens``); it must stay False for drop mode, where the pre
    tier never stops appending and needs worst-case room."""
    pre_headroom = max_new_tokens
    if ring and decode_window is not None:
        pre_headroom = min(max_new_tokens, decode_window)
    pre = prompt_len + pre_headroom + margin
    sparse = cfg.sparse
    post_prefill = prompt_len
    if sparse.use_vision_predictor and all_have_image:
        n_img = cfg.num_image_tokens
        post_prefill = prompt_len - n_img + sparse.vision_keep_budget(n_img)
    decode_headroom = max_new_tokens
    if bound_output_budget and sparse.use_output_text_predictor:
        decode_headroom = int(
            max_new_tokens * sparse.output_text_keep_rate
        ) + margin
    if decode_window is not None:
        decode_headroom = min(decode_headroom, decode_window)
    post = post_prefill + decode_headroom + margin + 1
    if bucket > 1:
        pre = -(-pre // bucket) * bucket
        post = -(-post // bucket) * bucket
    return pre, post


def make_gen_cache(
    cfg: LlavaConfig, batch: int, prompt_len: int, max_new_tokens: int,
    dtype=jnp.bfloat16, bound_output_budget: bool = True,
    all_have_image: bool = True, bucket: int = 1,
    decode_window: Optional[int] = None, ring: bool = False,
) -> TieredCache:
    pre, post = gen_cache_sizes(
        cfg, prompt_len, max_new_tokens,
        bound_output_budget=bound_output_budget,
        all_have_image=all_have_image, bucket=bucket,
        decode_window=decode_window, ring=ring,
    )
    return init_tiered_cache(
        cfg.text, cfg.sparse.sparse_layer, batch, pre, post, dtype
    )
