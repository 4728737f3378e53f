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


def generate_speculative(
    gen,  # generation.generate.Generator
    input_ids_list: List[np.ndarray],
    pixel_values: Optional[np.ndarray] = None,
    draft: Union[str, DraftFn] = "prompt_lookup",
    draft_k: int = 4,
    stats: Optional[dict] = None,  # filled with rounds/accepted counters
) -> List[List[int]]:
    """Greedy generation via speculative rounds; returns the same token
    lists ``Generator.generate`` would (EOS included), per sample.

    Greedy + drop-mode only (acceptance is argmax-chain equality; the ring
    rollback story is decode_step's). Each round costs one fused verify
    pass plus one host round-trip (the draft source lives host-side)."""
    gc = gen.gen_cfg
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
    state, _ = gen.prefill_from_plan(
        plan, pixel_values, gc.max_new_tokens + m
    )
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
            for j in range(int(n_acc[i])):
                if len(out[i]) >= gc.max_new_tokens:
                    done[i] = True
                    break
                t = int(toks[i, j])
                out[i].append(t)
                if t == gc.eos_token_id:
                    done[i] = True
                    break
            if len(out[i]) >= gc.max_new_tokens:
                done[i] = True
    if stats is not None:
        stats["rounds"] = n_rounds
        stats["emitted"] = sum(len(o) for o in out)
        stats["tokens_per_round"] = round(
            stats["emitted"] / max(n_rounds, 1), 3
        )
    return out
