"""Speculative (assisted) greedy decoding over the dynamic tiered cache.

Beyond-parity: the reference decodes strictly one token per forward through
HF's GenerationMixin (dynamic_llava_llama.py:117-169). Here each round
verifies ``1 + draft_k`` candidate tokens in ONE ``run_layers_extend`` pass
(``models.dynamic.decode_speculative_step``) — at small batch the decode
step is weight-bandwidth-bound, so verifying k extra tokens costs nearly
nothing and every accepted draft token is a decode step saved. Output is
EXACTLY the greedy chain for any draft source (acceptance only affects
speed), which is the invariant the tests pin.

Draft sources:
  * ``prompt_lookup_draft`` — matches the most recent n-gram earlier in the
    context (prompt + generated) and proposes the tokens that followed it;
    zero extra model, the "prompt lookup decoding" / HF assisted-generation
    candidate strategy. Strong when outputs quote the input; harmless
    otherwise.
  * any callable ``(context_ids: List[int], k: int) -> List[int]`` — e.g. a
    distilled draft model, or the oracle draft used by the mechanical-
    ceiling benchmark (run/spec_bench.py).
"""

from __future__ import annotations

from typing import Callable, List, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..models import dynamic
from ..multimodal.fusion import plan_batch


def prompt_lookup_draft(
    context_ids, k: int, max_ngram: int = 3, min_ngram: int = 1
) -> List[int]:
    """Propose the k tokens that followed the most recent earlier occurrence
    of the context's trailing n-gram (longest n first, latest match first)."""
    ctx = np.asarray(context_ids)
    n = len(ctx)
    for g in range(max_ngram, min_ngram - 1, -1):
        if n < g + 1:
            continue
        pat = ctx[n - g:]
        # windows of all earlier g-grams: [n-g, g]; match latest-first,
        # excluding the trailing occurrence itself
        win = np.lib.stride_tricks.sliding_window_view(ctx, g)[: n - g]
        hits = np.nonzero((win == pat).all(axis=1))[0]
        for start in hits[::-1]:
            prop = ctx[start + g: start + g + k]
            if len(prop):
                return [int(t) for t in prop]
    return []


DraftFn = Callable[[List[int], int], List[int]]


def device_prompt_lookup(
    ctx: jax.Array,  # [B, C] int32 (prompt + emitted, left-aligned)
    ctx_len: jax.Array,  # [B] int32
    k: int,
    max_ngram: int = 3,
    min_ngram: int = 1,
) -> jax.Array:
    """In-graph prompt lookup: [B, k] proposals (0-filled where nothing
    matches — a bad draft is merely rejected). Longest n-gram first, latest
    occurrence first, vectorized as one windows-vs-pattern compare per n —
    VPU work measured in microseconds next to a verify pass."""
    b, c = ctx.shape
    pos = jnp.arange(c, dtype=jnp.int32)
    drafts = jnp.zeros((b, k), jnp.int32)
    have = jnp.zeros((b,), bool)
    for g in range(max_ngram, min_ngram - 1, -1):
        idx = ctx_len[:, None] - g + jnp.arange(g, dtype=jnp.int32)[None, :]
        pat = jnp.take_along_axis(ctx, jnp.maximum(idx, 0), axis=1)  # [B, g]
        widx = pos[:, None] + jnp.arange(g, dtype=jnp.int32)[None, :]  # [C, g]
        wval = ctx[:, jnp.minimum(widx, c - 1)]  # [B, C, g]
        match = jnp.all(wval == pat[:, None, :], axis=-1)  # [B, C]
        # candidate starts strictly before the trailing occurrence itself
        match = match & (pos[None, :] < (ctx_len - g)[:, None])
        match = match & (ctx_len >= g + 1)[:, None]
        any_m = jnp.any(match, axis=1)
        last = (c - 1) - jnp.argmax(match[:, ::-1], axis=1).astype(jnp.int32)
        pidx = last[:, None] + g + jnp.arange(k, dtype=jnp.int32)[None, :]
        prop = jnp.take_along_axis(ctx, jnp.minimum(pidx, c - 1), axis=1)
        prop = jnp.where(pidx < ctx_len[:, None], prop, 0)
        take = any_m & ~have
        drafts = jnp.where(take[:, None], prop, drafts)
        have = have | any_m
    return drafts


def _device_loop_fn(gen, m: int, ctx_cap: int, out_cap: int,
                    max_ngram: int, min_ngram: int):
    """Jitted whole-generation speculative loop: draft (in-graph prompt
    lookup), verify, emit, repeat — ZERO host round-trips until the final
    fetch. Through the axon tunnel the host-draft loop pays ~29 ms RTT per
    round; this pays it once per generation."""
    # namespaced by (cfg, gen_cfg): the chunk cache is module-global now
    key = (*gen._cache_ns, "spec_dev", m, ctx_cap, out_cap, max_ngram,
           min_ngram)
    if key in gen._decode_chunks:
        return gen._decode_chunks[key]
    cfg, gc = gen.cfg, gen.gen_cfg
    eos = gc.eos_token_id

    def run(params, state, ctx, ctx_len, limit):
        b = ctx.shape[0]
        bidx = jnp.arange(b, dtype=jnp.int32)[:, None]
        jar = jnp.arange(m, dtype=jnp.int32)[None, :]

        def cond(c):
            done, rounds = c[5], c[6]
            # rounds bound: active samples emit >= 1 token per round, so
            # out_cap rounds is a hard ceiling (defensive against a
            # zero-acceptance pathology ever looping forever)
            return jnp.any(~done) & (rounds < out_cap)

        def body(c):
            state, ctx, ctx_len, out, n_out, done, rounds = c
            t_next = jnp.argmax(state.last_logits, axis=-1).astype(jnp.int32)
            if m > 1:
                # draft from the context INCLUDING the committed token —
                # matching the host loop's ctx + [t_next]; drafting without
                # it misaligns every proposal by one position and collapses
                # acceptance to ~1/round exactly in the quoting regime the
                # feature targets. The scratch write is draft-only (the
                # carried ctx is updated by the emit scatter below).
                ctx_draft = ctx.at[
                    jnp.arange(ctx.shape[0]),
                    jnp.minimum(ctx_len, ctx_cap - 1),
                ].set(t_next)
                drafts = device_prompt_lookup(
                    ctx_draft, ctx_len + 1, m - 1, max_ngram, min_ngram
                )
                tokens = jnp.concatenate([t_next[:, None], drafts], axis=1)
            else:
                tokens = t_next[:, None]
            state, n_acc, _ = dynamic.decode_speculative_step(
                params, cfg, tokens, state, eos, active=~done
            )
            n_take = jnp.minimum(n_acc, limit - n_out)
            emit = jar < n_take[:, None]
            # non-emitted lanes scatter OUT OF BOUNDS and are dropped —
            # clipping instead would collide emitted and no-op writes on
            # the last slot (duplicate scatter indices, undefined order)
            opos = jnp.where(emit, n_out[:, None] + jar, out_cap)
            out = out.at[bidx, opos].set(tokens, mode="drop")
            cpos = jnp.where(emit, ctx_len[:, None] + jar, ctx_cap)
            ctx = ctx.at[bidx, cpos].set(tokens, mode="drop")
            n_out = n_out + n_take
            ctx_len = ctx_len + n_take
            eos_hit = jnp.any((tokens == eos) & emit, axis=1)
            done = done | eos_hit | (n_out >= limit)
            return (state, ctx, ctx_len, out, n_out, done, rounds + 1)

        init = (
            state, ctx, ctx_len, jnp.zeros((b, out_cap), jnp.int32),
            jnp.zeros((b,), jnp.int32), jnp.zeros((b,), bool), jnp.int32(0),
        )
        _, _, _, out, n_out, _, rounds = jax.lax.while_loop(cond, body, init)
        return out, n_out, rounds

    fn = jax.jit(run, donate_argnums=(1,))
    gen._decode_chunks[key] = fn
    return fn


def generate_speculative_device(
    gen,
    input_ids_list: List[np.ndarray],
    pixel_values: Optional[np.ndarray] = None,
    draft_k: int = 4,
    max_ngram: int = 3,
    min_ngram: int = 1,
    stats: Optional[dict] = None,
) -> List[List[int]]:
    """Whole-generation speculative decode as ONE device program: in-graph
    prompt-lookup drafting + verify rounds in a ``lax.while_loop``. Same
    token output as ``Generator.generate`` (greedy, EOS included); one host
    fetch per generation instead of one per round/chunk."""
    gc = gen.gen_cfg
    if gc.temperature > 0.0:
        raise ValueError("speculative decode is greedy-only (temperature 0)")
    if gc.kv_overflow != "drop":
        raise ValueError("speculative decode requires kv_overflow='drop'")
    m = draft_k + 1
    plan = plan_batch(
        input_ids_list,
        gen.cfg.num_image_tokens if pixel_values is not None else 0,
        max_length=gen.cfg.model_max_length,
        pad_multiple=gc.pad_multiple,
    )
    state, _ = gen.prefill_from_plan(
        plan, pixel_values, gc.max_new_tokens + m
    )
    b = plan.batch
    ctx_cap = plan.seq_len + gc.max_new_tokens + m
    ctx = np.zeros((b, ctx_cap), np.int32)
    ctx[:, : plan.seq_len] = np.asarray(plan.token_ids, np.int32)
    fn = _device_loop_fn(gen, m, ctx_cap, gc.max_new_tokens, max_ngram,
                         min_ngram)
    out, n_out, rounds = fn(
        gen.params, state, jnp.asarray(ctx),
        jnp.asarray(plan.valid_len, jnp.int32),
        jnp.int32(gc.max_new_tokens),
    )
    out, n_out = np.asarray(out), np.asarray(n_out)
    result = [[int(t) for t in out[i, : n_out[i]]] for i in range(b)]
    if stats is not None:
        stats["rounds"] = int(rounds)
        stats["emitted"] = int(n_out.sum())
        stats["tokens_per_round"] = round(
            stats["emitted"] / max(int(rounds), 1), 3
        )
    return result


def generate_speculative(
    gen,  # generation.generate.Generator
    input_ids_list: List[np.ndarray],
    pixel_values: Optional[np.ndarray] = None,
    draft: Union[str, DraftFn] = "prompt_lookup",
    draft_k: int = 4,
    stats: Optional[dict] = None,  # filled with rounds/accepted counters
    on_tokens=None,  # callback(sample_idx, fresh_token_ids) per round
    max_new_tokens: Optional[int] = None,  # overrides gen_cfg (no recompile)
) -> List[List[int]]:
    """Greedy generation via speculative rounds; returns the same token
    lists ``Generator.generate`` would (EOS included), per sample.

    Greedy + drop-mode only (acceptance is argmax-chain equality; the ring
    rollback story is decode_step's). Each round costs one fused verify
    pass plus one host round-trip (the draft source lives host-side)."""
    gc = gen.gen_cfg
    max_new = gc.max_new_tokens if max_new_tokens is None else max_new_tokens
    if gc.temperature > 0.0:
        raise ValueError("speculative decode is greedy-only (temperature 0)")
    if gc.kv_overflow != "drop":
        raise ValueError("speculative decode requires kv_overflow='drop'")
    draft_fn: DraftFn = (
        prompt_lookup_draft if draft == "prompt_lookup" else draft
    )
    m = draft_k + 1
    plan = plan_batch(
        input_ids_list,
        gen.cfg.num_image_tokens if pixel_values is not None else 0,
        max_length=gen.cfg.model_max_length,
        pad_multiple=gc.pad_multiple,
    )
    # + m headroom: the final round may persist up to m - 1 tokens past the
    # emission budget (truncated host-side, exactly like the chunked loop)
    state, _ = gen.prefill_from_plan(plan, pixel_values, max_new + m)
    spec = gen._spec_fn(m)

    b = plan.batch
    prompts = [
        [int(t) for t in np.asarray(plan.token_ids[i][: plan.valid_len[i]])]
        for i in range(b)
    ]
    out: List[List[int]] = [[] for _ in range(b)]
    done = np.zeros(b, bool)
    t_next = np.asarray(jnp.argmax(state.last_logits, axis=-1))
    n_rounds = 0
    while not done.all():
        if n_rounds > max_new:
            # every active round must emit >= 1 token; only the defensive
            # pre-tier clamp (an undersized cache) can zero acceptance —
            # fail loudly instead of spinning
            raise RuntimeError(
                "speculative rounds exceeded max_new_tokens — cache "
                "undersized for this generation?"
            )
        toks = np.zeros((b, m), np.int32)
        for i in range(b):
            toks[i, 0] = t_next[i]
            if m > 1 and not done[i]:
                ctx = prompts[i] + out[i] + [int(t_next[i])]
                d = draft_fn(ctx, m - 1)[: m - 1]
                toks[i, 1: 1 + len(d)] = d
        state, n_acc, nxt = spec(
            gen.params, state, jnp.asarray(toks), jnp.asarray(~done)
        )
        n_acc, t_next = np.asarray(n_acc), np.asarray(nxt)
        n_rounds += 1
        for i in range(b):
            if done[i]:
                continue
            fresh: List[int] = []
            for j in range(int(n_acc[i])):
                if len(out[i]) >= max_new:
                    done[i] = True
                    break
                t = int(toks[i, j])
                out[i].append(t)
                fresh.append(t)
                if t == gc.eos_token_id:
                    done[i] = True
                    break
            if len(out[i]) >= max_new:
                done[i] = True
            if on_tokens is not None and fresh:
                on_tokens(i, fresh)
    if stats is not None:
        stats["rounds"] = n_rounds
        stats["emitted"] = sum(len(o) for o in out)
        stats["tokens_per_round"] = round(
            stats["emitted"] / max(n_rounds, 1), 3
        )
    return out
