"""Ring-overflow KV mode (``decode_step(kv_overflow="ring")``): once the
post tier's decode budget fills, every new token persists by evicting the
OLDEST decode-region entry while the prefill region stays protected — a
sliding recency window at a fixed allocation.

Beyond-parity feature (the reference's DynamicCachePlus just grows to
model_max_length; it has no bounded-cache long-generation story,
/root/reference/llava/model/language_model/cache_utils.py:63-318). The
oracle here is INDEPENDENT of the ring arithmetic: each wrapped step is
reproduced by hand-building a drop-mode cache holding exactly the expected
attended set (prompt + last-W entries, at the exact ring slots) and running
the plain append-protocol decode step on it.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dynamic_llava_tpu.config import LlavaConfig, SparseConfig
from dynamic_llava_tpu.generation.generate import (
    ChatSession,
    GenerationConfig,
    Generator,
)
from dynamic_llava_tpu.models import dynamic
from dynamic_llava_tpu.models.dynamic import gen_cache_sizes
from dynamic_llava_tpu.multimodal.fusion import plan_batch
from dynamic_llava_tpu.ops.kv_cache import (
    KVCache,
    TieredCache,
    init_tiered_cache,
)


def _cfg(**sparse_overrides) -> LlavaConfig:
    sparse = SparseConfig(
        d_model=32, nhead=2, dim_feedforward=64, num_layers=1,
        use_vision_predictor=False, use_text_predictor=False,
        use_output_text_predictor=False, use_instruct_predictor=False,
    )
    sparse = dataclasses.replace(sparse, **sparse_overrides)
    return LlavaConfig.tiny(sparse=sparse)


_decode = jax.jit(
    dynamic.decode_step, static_argnums=(1,),
    static_argnames=("kv_overflow",),
)


def _prefill_text(params, cfg, lens, max_new, window, ring, seed=0):
    rng = np.random.default_rng(seed)
    ids = [
        rng.integers(3, cfg.text.vocab_size, size=(L,)).astype(np.int64)
        for L in lens
    ]
    plan = plan_batch(ids, 0)
    # ring-sized capacities for BOTH the ring run and its drop-mode oracle
    # seed, so the two share buffer shapes and slot layouts exactly
    pre, post = gen_cache_sizes(
        cfg, plan.seq_len, max_new, decode_window=window,
        ring=window is not None,
    )
    cache = init_tiered_cache(
        cfg.text, cfg.sparse.sparse_layer, plan.batch, pre, post, jnp.float32
    )
    state, _ = dynamic.prefill(
        params, cfg,
        jnp.asarray(plan.token_ids), jnp.asarray(plan.is_image),
        jnp.asarray(plan.image_slot), jnp.asarray(plan.valid_len),
        jnp.asarray(plan.spans.image_start),
        jnp.asarray(plan.spans.last_instruct_start),
        jnp.asarray(plan.spans.last_instruct_end),
        jnp.asarray(plan.spans.has_image),
        None, cache, ring_mode=ring,
    )
    return state, plan


def test_ring_no_wrap_matches_drop_exactly():
    """With a window the generation never fills, ring == drop bitwise: the
    wrap machinery must be a pure no-op below the budget."""
    cfg = _cfg()
    params = dynamic.init_llava_params(jax.random.key(0), cfg)
    n_steps = 10
    s_drop, plan = _prefill_text(params, cfg, (6, 9), 64, None, ring=False)
    s_ring, _ = _prefill_text(params, cfg, (6, 9), 64, None, ring=True)
    rng = np.random.default_rng(1)
    toks = rng.integers(3, cfg.text.vocab_size, size=(n_steps, plan.batch))
    for t in range(n_steps):
        tok = jnp.asarray(toks[t])
        s_drop = _decode(params, cfg, tok, s_drop)
        s_ring = _decode(params, cfg, tok, s_ring, kv_overflow="ring")
        np.testing.assert_array_equal(
            np.asarray(s_drop.last_logits), np.asarray(s_ring.last_logits)
        )
    np.testing.assert_array_equal(
        np.asarray(s_drop.cache.post.length),
        np.asarray(s_ring.cache.post.length),
    )
    np.testing.assert_array_equal(
        np.asarray(s_drop.cache.post.k), np.asarray(s_ring.cache.post.k)
    )


def test_ring_wrap_matches_handbuilt_recency_oracle():
    """Teacher-forced decode far past the window. Oracle: at each step,
    hand-place the prompt + the last-W entries at the exact ring slots into
    fresh buffers — for BOTH tiers, each with its own base/capacity — and
    run the plain DROP-mode step on them. No ring code in the oracle path.
    Logits must match step for step, per sample (bases and window
    capacities differ across the ragged batch)."""
    cfg = _cfg()
    params = dynamic.init_llava_params(jax.random.key(2), cfg)
    lens = (5, 8)
    window = 6
    state_r, plan = _prefill_text(params, cfg, lens, 64, window, ring=True)
    b = plan.batch

    class Tier:
        """Per-tier oracle bookkeeping: seed buffers + per-step entry log."""

        def __init__(self, tier_cache):
            self.k0 = np.asarray(tier_cache.k).copy()
            self.v0 = np.asarray(tier_cache.v).copy()
            self.n_layers = tier_cache.num_layers
            self.budget = tier_cache.max_len - 1
            self.base = np.asarray(tier_cache.length[0]).copy()  # [B]
            self.cap = self.budget - self.base
            assert (self.cap >= 1).all()
            self.log_k, self.log_v = [], []

        def build(self, t):
            """Buffers + lengths holding prompt + the last-W entries at the
            exact ring slots, as of step t."""
            k, v = self.k0.copy(), self.v0.copy()
            length = np.zeros((b,), np.int32)
            for bi in range(b):
                w = min(t, int(self.cap[bi]))
                for i in range(t - w, t):
                    slot = int(self.base[bi]) + i % int(self.cap[bi])
                    k[:, bi, slot] = self.log_k[i][:, bi]
                    v[:, bi, slot] = self.log_v[i][:, bi]
                length[bi] = int(self.base[bi]) + w
            return KVCache(
                k=jnp.asarray(k), v=jnp.asarray(v),
                length=jnp.broadcast_to(
                    jnp.asarray(length)[None], (self.n_layers, b)
                ),
            ), length

        def record(self, new_cache, length):
            """Pull the step's new K/V out of the returned buffers (written
            at length, or the scratch slot once the window is full)."""
            nk, nv = np.asarray(new_cache.k), np.asarray(new_cache.v)
            wslot = np.minimum(length, self.budget)
            self.log_k.append(
                np.stack([nk[:, bi, wslot[bi]] for bi in range(b)], axis=1)
            )
            self.log_v.append(
                np.stack([nv[:, bi, wslot[bi]] for bi in range(b)], axis=1)
            )

    # oracle seed: an identical prefill without the ring marker
    state_o, _ = _prefill_text(params, cfg, lens, 64, window, ring=False)
    pre_t, post_t = Tier(state_o.cache.pre), Tier(state_o.cache.post)
    next_pos0 = np.asarray(state_o.next_pos).copy()

    n_steps = int(post_t.cap.max()) * 3 + 2  # several full wraps, both tiers
    assert n_steps > int(pre_t.cap.max()) + 2  # the pre tier wraps too
    rng = np.random.default_rng(3)
    toks = rng.integers(3, cfg.text.vocab_size, size=(n_steps, b))

    ring_logits, oracle_logits = [], []
    for t in range(n_steps):
        tok = jnp.asarray(toks[t])
        state_r = _decode(params, cfg, tok, state_r, kv_overflow="ring")
        ring_logits.append(np.asarray(state_r.last_logits))

        # --- oracle step: fresh drop-mode caches with the expected windows
        pre_cache, pre_len = pre_t.build(t)
        post_cache, post_len = post_t.build(t)
        o_state = dynamic.GenState(
            cache=TieredCache(pre=pre_cache, post=post_cache),
            next_pos=jnp.asarray(next_pos0 + t),
            last_logits=jnp.zeros_like(state_r.last_logits),
        )
        o_state = _decode(params, cfg, tok, o_state)
        oracle_logits.append(np.asarray(o_state.last_logits))
        pre_t.record(o_state.cache.pre, pre_len)
        post_t.record(o_state.cache.post, post_len)

    for t in range(n_steps):
        np.testing.assert_allclose(
            ring_logits[t], oracle_logits[t], atol=1e-4, rtol=1e-4,
            err_msg=f"step {t}",
        )

    # final structural check, both tiers: the ring region holds exactly the
    # last-cap entries at the expected wrapped slots; the protected prefill
    # region was never evicted; the persisted count kept growing
    for tier, ring_cache in (
        (pre_t, state_r.cache.pre), (post_t, state_r.cache.post),
    ):
        ring_k = np.asarray(ring_cache.k)
        for bi in range(b):
            for i in range(n_steps - int(tier.cap[bi]), n_steps):
                slot = int(tier.base[bi]) + i % int(tier.cap[bi])
                np.testing.assert_allclose(
                    ring_k[:, bi, slot], tier.log_k[i][:, bi],
                    atol=1e-4, rtol=1e-4,
                )
            np.testing.assert_array_equal(
                ring_k[:, bi, : int(tier.base[bi])],
                tier.k0[:, bi, : int(tier.base[bi])],
            )
        assert (
            np.asarray(ring_cache.length[0]) == tier.base + n_steps
        ).all()


def test_ring_frozen_sample_never_evicts():
    """Post-wrap, a frozen (active=False) sample's write must land in the
    scratch slot: its ring region, lengths, and positions stay untouched
    while live samples keep rotating."""
    cfg = _cfg()
    params = dynamic.init_llava_params(jax.random.key(4), cfg)
    state, plan = _prefill_text(params, cfg, (5, 5), 64, 4, ring=True)
    b = plan.batch
    budget = state.cache.post.max_len - 1
    rng = np.random.default_rng(5)
    # wrap both samples
    while int(np.asarray(state.cache.post.length[0]).min()) <= budget + 2:
        tok = jnp.asarray(rng.integers(3, cfg.text.vocab_size, size=(b,)))
        state = _decode(params, cfg, tok, state, kv_overflow="ring")
    k_before = np.asarray(state.cache.post.k).copy()
    len_before = np.asarray(state.cache.post.length).copy()
    pos_before = np.asarray(state.next_pos).copy()
    active = jnp.asarray([False, True])
    for _ in range(3):
        tok = jnp.asarray(rng.integers(3, cfg.text.vocab_size, size=(b,)))
        state = _decode(params, cfg, tok, state, active=active,
                        kv_overflow="ring")
    k_after = np.asarray(state.cache.post.k)
    # sample 0 frozen: nothing below the scratch slot changed
    np.testing.assert_array_equal(
        k_after[:, 0, :budget], k_before[:, 0, :budget]
    )
    assert np.asarray(state.cache.post.length)[0, 0] == len_before[0, 0]
    assert int(state.next_pos[0]) == int(pos_before[0])
    # sample 1 live: length advanced, ring content changed
    assert np.asarray(state.cache.post.length)[0, 1] == len_before[0, 1] + 3
    assert not np.array_equal(k_after[:, 1, :budget], k_before[:, 1, :budget])


def test_generator_ring_e2e_and_chat_guard():
    """Generator rides the ring end to end (window << max_new) and still
    emits the full budget of valid tokens; pre-wrap its stream is identical
    to the drop mode's; ChatSession refuses ring generators."""
    cfg = _cfg()  # predictors off: every decode token persists, so the
    # window fills after exactly window+margin steps — wrap guaranteed
    params = dynamic.init_llava_params(jax.random.key(6), cfg)
    eos = cfg.text.vocab_size + 7  # never emitted
    rng = np.random.default_rng(7)
    prompt = [rng.integers(3, cfg.text.vocab_size, size=(9,)).astype(np.int64)]

    gen_ring = Generator(params, cfg, GenerationConfig(
        max_new_tokens=48, decode_chunk=8, eos_token_id=eos,
        kv_overflow="ring", kv_window=8, pad_multiple=1,
    ))
    gen_drop = Generator(params, cfg, GenerationConfig(
        max_new_tokens=48, decode_chunk=8, eos_token_id=eos,
        kv_overflow="drop", kv_window=8, pad_multiple=1,
    ))
    out_ring = gen_ring.generate(prompt)[0]
    out_drop = gen_drop.generate(prompt)[0]
    assert len(out_ring) == 48
    assert all(0 <= t < cfg.text.vocab_size for t in out_ring)
    # identical allocation, identical behavior until the first wrap step —
    # the modes only diverge once the budget fills (window 8 guarantees at
    # least the first 8 steps agree; past the wrap the attended sets differ
    # so the streams must part ways)
    assert out_ring[:8] == out_drop[:8]
    assert out_ring != out_drop

    with pytest.raises(ValueError, match="ring"):
        ChatSession(gen_ring)
