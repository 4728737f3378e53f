"""Continuation prefill (E5) and no-cache eval (E4) regimes."""

import pytest as _pytest

pytestmark = _pytest.mark.slow


import dataclasses

import numpy as np

import jax
import jax.numpy as jnp

from dynamic_llava_tpu.config import LlavaConfig, SparseConfig
from dynamic_llava_tpu.models import dynamic, llama
from dynamic_llava_tpu.multimodal.fusion import plan_batch
from dynamic_llava_tpu.ops.kv_cache import init_tiered_cache


def _cfg(**sparse_overrides):
    sparse = SparseConfig(
        d_model=32, nhead=2, dim_feedforward=64, num_layers=1,
        use_vision_predictor=False, use_text_predictor=False,
        use_output_text_predictor=False, use_instruct_predictor=False,
    )
    return LlavaConfig.tiny(sparse=dataclasses.replace(sparse, **sparse_overrides))


def _prefill(params, cfg, plan, imgs, pre=64, post=64):
    cache = init_tiered_cache(
        cfg.text, cfg.sparse.sparse_layer, plan.batch, pre, post, jnp.float32
    )
    return dynamic.prefill(
        params, cfg,
        jnp.asarray(plan.token_ids), jnp.asarray(plan.is_image),
        jnp.asarray(plan.image_slot), jnp.asarray(plan.valid_len),
        jnp.asarray(plan.spans.image_start),
        jnp.asarray(plan.spans.last_instruct_start),
        jnp.asarray(plan.spans.last_instruct_end),
        jnp.asarray(plan.spans.has_image),
        None if imgs is None else jnp.asarray(imgs),
        cache,
    )


def test_prefill_continue_matches_single_prefill():
    """Dense path: prefill(A) + continue(B) must equal prefill(A+B)."""
    cfg = _cfg()
    params = dynamic.init_llava_params(jax.random.key(0), cfg)
    rng = np.random.default_rng(0)
    a = rng.integers(3, cfg.text.vocab_size, size=(2, 9))
    bchunk = rng.integers(3, cfg.text.vocab_size, size=(2, 5))

    plan_a = plan_batch(list(a), 0)
    state, _ = _prefill(params, cfg, plan_a, None)
    state2 = dynamic.prefill_continue(params, cfg, jnp.asarray(bchunk), state)

    plan_ab = plan_batch(list(np.concatenate([a, bchunk], axis=1)), 0)
    ref, _ = _prefill(params, cfg, plan_ab, None)
    np.testing.assert_allclose(
        np.asarray(state2.last_logits), np.asarray(ref.last_logits),
        atol=2e-4, rtol=2e-3,
    )
    assert (np.asarray(state2.cache.pre.length) == 14).all()
    assert (np.asarray(state2.next_pos) == 14).all()

    # decode after continuation matches decode after single prefill
    tok = jnp.asarray([5, 6])
    d1 = dynamic.decode_step(params, cfg, tok, state2)
    d2 = dynamic.decode_step(params, cfg, tok, ref)
    np.testing.assert_allclose(
        np.asarray(d1.last_logits), np.asarray(d2.last_logits),
        atol=2e-4, rtol=2e-3,
    )


def test_prefill_continue_instruct_pruning():
    """With the instruct predictor, the post tier persists only kept chunk
    tokens (last always kept); logits stay finite."""
    cfg = _cfg(use_instruct_predictor=True)
    params = dynamic.init_llava_params(jax.random.key(1), cfg)
    rng = np.random.default_rng(1)
    a = rng.integers(3, cfg.text.vocab_size, size=(1, 8))
    plan_a = plan_batch(list(a), 0)
    state, _ = _prefill(params, cfg, plan_a, None)
    post_len0 = int(np.asarray(state.cache.post.length)[0, 0])

    chunk = jnp.asarray(rng.integers(3, cfg.text.vocab_size, size=(1, 6)))
    state2 = dynamic.prefill_continue(params, cfg, chunk, state)
    pre_len = int(np.asarray(state2.cache.pre.length)[0, 0])
    post_len = int(np.asarray(state2.cache.post.length)[0, 0])
    assert pre_len == 8 + 6
    assert post_len0 + 1 <= post_len <= post_len0 + 6
    assert np.isfinite(np.asarray(state2.last_logits)).all()


def test_forward_nocache_eval_dense_matches():
    cfg = _cfg()
    params = dynamic.init_llava_params(jax.random.key(2), cfg)
    rng = np.random.default_rng(2)
    ids = rng.integers(3, cfg.text.vocab_size, size=(2, 11))
    plan = plan_batch(list(ids), 0)
    logits, lengths = dynamic.forward_nocache_eval(
        params, cfg,
        jnp.asarray(plan.token_ids), jnp.asarray(plan.is_image),
        jnp.asarray(plan.image_slot), jnp.asarray(plan.valid_len),
        jnp.asarray(plan.spans.image_start),
        jnp.asarray(plan.spans.answer_start),
        jnp.asarray(plan.spans.last_instruct_start),
        jnp.asarray(plan.spans.last_instruct_end),
        jnp.asarray(plan.spans.has_image),
        None,
    )
    ref = llama.forward_dense(params["llm"], cfg.text, jnp.asarray(ids))
    np.testing.assert_allclose(
        np.asarray(logits), np.asarray(ref[:, -1]), atol=2e-4, rtol=2e-3
    )
    assert (np.asarray(lengths) == 11).all()


def test_forward_nocache_eval_sparse_prunes():
    cfg = _cfg(use_vision_predictor=True, vision_keep_rate=0.25,
               use_output_text_predictor=True)
    params = dynamic.init_llava_params(jax.random.key(3), cfg)
    rng = np.random.default_rng(3)
    ids = rng.integers(3, cfg.text.vocab_size, size=(14,)).astype(np.int64)
    ids[2] = -200
    labels = ids.copy()
    labels[:9] = -100  # answer = tail
    plan = plan_batch([ids], cfg.num_image_tokens, labels_list=[labels])
    imgs = rng.normal(
        size=(1, cfg.vision.image_size, cfg.vision.image_size, 3)
    ).astype(np.float32)
    logits, lengths = dynamic.forward_nocache_eval(
        params, cfg,
        jnp.asarray(plan.token_ids), jnp.asarray(plan.is_image),
        jnp.asarray(plan.image_slot), jnp.asarray(plan.valid_len),
        jnp.asarray(plan.spans.image_start),
        jnp.asarray(plan.spans.answer_start),
        jnp.asarray(plan.spans.last_instruct_start),
        jnp.asarray(plan.spans.last_instruct_end),
        jnp.asarray(plan.spans.has_image),
        jnp.asarray(imgs),
    )
    n_img = cfg.num_image_tokens
    k = cfg.sparse.vision_keep_budget(n_img)
    full = int(plan.valid_len[0])
    # image pruned to budget; answer possibly pruned further
    assert int(lengths[0]) <= full - n_img + k
    assert np.isfinite(np.asarray(logits)).all()


def test_prefill_continue_ragged_matches_per_sample():
    """Ragged batch: chunks of different lengths (right-padded) must give
    each sample the same logits and cache lengths as running it alone."""
    cfg = _cfg()
    params = dynamic.init_llava_params(jax.random.key(1), cfg)
    rng = np.random.default_rng(2)
    a = rng.integers(3, cfg.text.vocab_size, size=(2, 9))
    chunk0 = rng.integers(3, cfg.text.vocab_size, size=(7,))
    chunk1 = rng.integers(3, cfg.text.vocab_size, size=(3,))

    # batched, ragged: pad sample 1's chunk to 7
    padded = np.zeros((2, 7), np.int64)
    padded[0] = chunk0
    padded[1, :3] = chunk1
    plan_a = plan_batch(list(a), 0)
    state, _ = _prefill(params, cfg, plan_a, None)
    ragged = dynamic.prefill_continue(
        params, cfg, jnp.asarray(padded), state,
        chunk_len=jnp.asarray([7, 3], jnp.int32),
    )

    # singles
    for i, chunk in enumerate([chunk0, chunk1]):
        plan_i = plan_batch([a[i]], 0)
        st, _ = _prefill(params, cfg, plan_i, None)
        solo = dynamic.prefill_continue(
            params, cfg, jnp.asarray(chunk[None]), st
        )
        np.testing.assert_allclose(
            np.asarray(ragged.last_logits[i]), np.asarray(solo.last_logits[0]),
            atol=2e-4, rtol=2e-3,
        )
        assert int(ragged.cache.pre.length[0, i]) == int(
            solo.cache.pre.length[0, 0]
        )
        assert int(ragged.cache.post.length[-1, i]) == int(
            solo.cache.post.length[-1, 0]
        )
        assert int(ragged.next_pos[i]) == int(solo.next_pos[0])


def test_prefill_continue_ragged_then_decode():
    """After a ragged continuation, greedy decode from each sample matches
    its solo run (cache contents, not just logits, are correct)."""
    cfg = _cfg()
    params = dynamic.init_llava_params(jax.random.key(3), cfg)
    rng = np.random.default_rng(4)
    a = rng.integers(3, cfg.text.vocab_size, size=(2, 6))
    chunks = [rng.integers(3, cfg.text.vocab_size, size=(5,)),
              rng.integers(3, cfg.text.vocab_size, size=(2,))]

    padded = np.zeros((2, 5), np.int64)
    padded[0] = chunks[0]
    padded[1, :2] = chunks[1]
    plan_a = plan_batch(list(a), 0)
    state, _ = _prefill(params, cfg, plan_a, None)
    state = dynamic.prefill_continue(
        params, cfg, jnp.asarray(padded), state,
        chunk_len=jnp.asarray([5, 2], jnp.int32),
    )
    toks_batched = []
    for _ in range(3):
        tok = jnp.argmax(state.last_logits, axis=-1)
        toks_batched.append(np.asarray(tok))
        state = dynamic.decode_step(params, cfg, tok, state)
    toks_batched = np.stack(toks_batched, axis=1)  # [B, 3]

    for i, chunk in enumerate(chunks):
        plan_i = plan_batch([a[i]], 0)
        st, _ = _prefill(params, cfg, plan_i, None)
        st = dynamic.prefill_continue(params, cfg, jnp.asarray(chunk[None]), st)
        solo = []
        for _ in range(3):
            tok = jnp.argmax(st.last_logits, axis=-1)
            solo.append(int(tok[0]))
            st = dynamic.decode_step(params, cfg, tok, st)
        assert list(toks_batched[i]) == solo


def test_prefill_continue_empty_chunk_is_noop():
    """chunk_len==0 rows persist nothing and advance nothing (ADVICE r2: an
    unguarded forced-keep wrapped to column M-1 and persisted padding)."""
    cfg = _cfg(use_instruct_predictor=True)
    params = dynamic.init_llava_params(jax.random.key(5), cfg)
    rng = np.random.default_rng(5)
    a = rng.integers(3, cfg.text.vocab_size, size=(2, 6))
    plan_a = plan_batch(list(a), 0)
    state, _ = _prefill(params, cfg, plan_a, None)
    pre0 = np.asarray(state.cache.pre.length).copy()
    post0 = np.asarray(state.cache.post.length).copy()

    chunk = np.zeros((2, 4), np.int64)
    chunk[0] = rng.integers(3, cfg.text.vocab_size, size=(4,))
    state2 = dynamic.prefill_continue(
        params, cfg, jnp.asarray(chunk), state,
        chunk_len=jnp.asarray([4, 0], jnp.int32),
    )
    # sample 1: untouched (no persisted tokens, no position advance)
    assert int(state2.cache.pre.length[0, 1]) == int(pre0[0, 1])
    assert int(state2.cache.post.length[-1, 1]) == int(post0[-1, 1])
    assert int(state2.next_pos[1]) == int(state.next_pos[1])
    # sample 0: normal ragged behavior (>=1 kept: last token forced)
    assert int(state2.cache.pre.length[0, 0]) == int(pre0[0, 0]) + 4
    assert int(state2.cache.post.length[-1, 0]) >= int(post0[-1, 0]) + 1
    assert np.isfinite(np.asarray(state2.last_logits[0])).all()
