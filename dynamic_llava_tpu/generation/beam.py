"""Beam search over the static tiered cache.

Replaces the reference's HF beam search + ``_reorder_cache``
(/root/reference/llava/model/language_model/dynamic_modeling_llama.py:2883-2895):
beams live on the batch axis (B*W), and reordering is a single gather over
that axis of every cache buffer — no per-layer tuple shuffling.
"""

from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from ..config import LlavaConfig
from ..models import dynamic
from ..ops.kv_cache import KVCache, TieredCache


def reorder_cache(cache: TieredCache, beam_idx: jax.Array) -> TieredCache:
    """Gather beams along the batch axis (axis 1 of [L, B, ...])."""

    def reorder_tier(t: KVCache) -> KVCache:
        return KVCache(
            k=t.k[:, beam_idx], v=t.v[:, beam_idx], length=t.length[:, beam_idx],
            k_scale=None if t.k_scale is None else t.k_scale[:, beam_idx],
            v_scale=None if t.v_scale is None else t.v_scale[:, beam_idx],
        )

    return TieredCache(pre=reorder_tier(cache.pre), post=reorder_tier(cache.post))


def reorder_state(state: dynamic.GenState, beam_idx: jax.Array) -> dynamic.GenState:
    return dynamic.GenState(
        cache=reorder_cache(state.cache, beam_idx),
        next_pos=state.next_pos[beam_idx],
        last_logits=state.last_logits[beam_idx],
        ring_base=None if state.ring_base is None
        else state.ring_base[beam_idx],
        ring_base_pre=None if state.ring_base_pre is None
        else state.ring_base_pre[beam_idx],
    )


def beam_search(
    params,
    cfg: LlavaConfig,
    state: dynamic.GenState,  # prefilled with batch == num_beams (same prompt)
    num_beams: int,
    max_new_tokens: int,
    eos_token_id: int = 2,
    length_penalty: float = 1.0,
) -> List[int]:
    """Single-prompt beam search: ``state`` must hold num_beams copies of the
    prompt (prefill with the plan repeated). Returns the best token list."""
    if state.ring_base is not None:
        # the decode below is drop-mode; silently running it on a
        # ring-sized cache would force-drop everything past the window
        raise ValueError("beam_search requires a drop-mode (non-ring) state")
    w = num_beams
    neg = jnp.float32(-1e9)
    # beam 0 starts live; the rest start muted so the first expansion picks
    # the top-w distinct tokens of one distribution
    scores = jnp.where(jnp.arange(w) == 0, 0.0, neg)

    decode = jax.jit(dynamic.decode_step, static_argnums=(1,), donate_argnums=(3,))

    tokens = np.zeros((w, max_new_tokens), np.int32)
    done = np.zeros(w, bool)
    final: List[tuple] = []

    logits = state.last_logits
    for step in range(max_new_tokens):
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)  # [W, V]
        v = logp.shape[-1]
        cand = scores[:, None] + logp  # [W, V]
        flat = cand.reshape(-1)
        top_scores, top_idx = jax.lax.top_k(flat, w)
        beam_idx = (top_idx // v).astype(jnp.int32)
        tok = (top_idx % v).astype(jnp.int32)

        state = reorder_state(state, beam_idx)
        tokens = tokens[np.asarray(beam_idx)]
        tokens[:, step] = np.asarray(tok)
        scores = top_scores

        tok_np = np.asarray(tok)
        for i in range(w):
            if tok_np[i] == eos_token_id:
                length = step + 1
                final.append(
                    (float(scores[i]) / (length**length_penalty), tokens[i, :length].tolist())
                )
                scores = scores.at[i].set(neg)
        if len(final) >= w or step == max_new_tokens - 1:
            break
        state = decode(params, cfg, tok, state)
        logits = state.last_logits

    if not final:
        best = int(np.argmax(np.asarray(scores)))
        return tokens[best].tolist()
    final.sort(key=lambda t: -t[0])
    return final[0][1]
