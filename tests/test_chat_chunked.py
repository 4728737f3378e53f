"""ChatSession's pipelined chunked decode must match the exact per-token
path: same visible tokens, same live-cache state across rounds (VERDICT r2
item 3 — the chat path was the last per-token host loop)."""

import dataclasses

import numpy as np

import jax
import jax.numpy as jnp

from dynamic_llava_tpu.config import LlavaConfig, SparseConfig
from dynamic_llava_tpu.generation.generate import (
    ChatSession,
    GenerationConfig,
    Generator,
)
from dynamic_llava_tpu.models import dynamic


def _cfg(**sparse_overrides):
    sparse = SparseConfig(
        d_model=32, nhead=2, dim_feedforward=64, num_layers=1,
        use_vision_predictor=False, use_text_predictor=False,
        use_output_text_predictor=False, use_instruct_predictor=False,
    )
    return LlavaConfig.tiny(sparse=dataclasses.replace(sparse, **sparse_overrides))


def _setup(cfg, seed=0, eos=None, max_new=10, chunk=4):
    params = dynamic.init_llava_params(jax.random.key(seed), cfg)
    gc = GenerationConfig(
        max_new_tokens=max_new, decode_chunk=chunk,
        eos_token_id=cfg.text.vocab_size + 7 if eos is None else eos,
    )
    return params, Generator(params, cfg, gc)


def _tokenwise_answer(gen, prompt, pixel_values=None, rounds=()):
    """Ground truth: fresh session driven through the per-token path."""
    session = ChatSession(gen, max_new_tokens_total=96)
    session._start_round(prompt, pixel_values)
    outs = [session._ask_tokenwise(None, gen.gen_cfg.max_new_tokens)]
    for chunk in rounds:
        session._start_round(chunk, None)
        outs.append(session._ask_tokenwise(None, gen.gen_cfg.max_new_tokens))
    return outs, session.state


def test_chunked_matches_tokenwise_no_eos():
    cfg = _cfg()
    params, gen = _setup(cfg)
    rng = np.random.default_rng(0)
    prompt = rng.integers(3, cfg.text.vocab_size, size=(9,))

    ref, ref_state = _tokenwise_answer(gen, prompt)
    session = ChatSession(gen, max_new_tokens_total=96)
    out = session.ask(prompt)
    assert out == ref[0]
    np.testing.assert_array_equal(
        np.asarray(session.state.cache.pre.length),
        np.asarray(ref_state.cache.pre.length),
    )
    assert int(session.state.next_pos[0]) == int(ref_state.next_pos[0])


def test_chunked_matches_tokenwise_with_eos_and_round2():
    cfg = _cfg()
    params, gen = _setup(cfg)
    rng = np.random.default_rng(1)
    prompt = rng.integers(3, cfg.text.vocab_size, size=(8,))

    # find a token the model actually emits and make it EOS so the stop
    # fires mid-chunk
    probe = ChatSession(gen, max_new_tokens_total=96)
    toks = probe.ask(prompt)
    assert len(toks) == gen.gen_cfg.max_new_tokens
    eos = toks[2]
    params2, gen2 = _setup(cfg, eos=eos)
    gen2.params = params  # same weights, new eos
    round2 = rng.integers(3, cfg.text.vocab_size, size=(5,))

    ref, ref_state = _tokenwise_answer(gen2, prompt, rounds=[round2])
    assert len(ref[0]) < gen2.gen_cfg.max_new_tokens  # EOS actually fired

    session = ChatSession(gen2, max_new_tokens_total=96)
    out1 = session.ask(prompt)
    out2 = session.ask(round2)
    assert out1 == ref[0]
    assert out2 == ref[1]
    # the live cache after two rounds is identical — chunk overshoot never
    # persisted anything
    np.testing.assert_array_equal(
        np.asarray(session.state.cache.pre.length),
        np.asarray(ref_state.cache.pre.length),
    )
    np.testing.assert_array_equal(
        np.asarray(session.state.cache.post.length),
        np.asarray(ref_state.cache.post.length),
    )
    assert int(session.state.next_pos[0]) == int(ref_state.next_pos[0])
    np.testing.assert_allclose(
        np.asarray(session.state.last_logits),
        np.asarray(ref_state.last_logits), atol=2e-4, rtol=2e-3,
    )


def test_chunked_keyword_stop_matches_tokenwise():
    """A KeywordsStoppingCriteria-shaped object stops in-graph at the same
    point the host-side criteria would."""
    cfg = _cfg()
    params, gen = _setup(cfg, seed=3, max_new=12, chunk=5)
    rng = np.random.default_rng(3)
    prompt = rng.integers(3, cfg.text.vocab_size, size=(7,))

    probe = ChatSession(gen, max_new_tokens_total=96)
    toks = probe.ask(prompt)
    # stop on the 2-token sequence ending at position 5
    stop_seq = toks[4:6]

    class FakeKeywords:
        keyword_ids = [stop_seq]

        def __call__(self, out):
            return len(out) >= 2 and out[-2:] == stop_seq

    # tokenwise ground truth with the host-side callable
    ref_session = ChatSession(gen, max_new_tokens_total=96)
    ref_session._start_round(prompt, None)
    ref = ref_session._ask_tokenwise(FakeKeywords(), gen.gen_cfg.max_new_tokens)
    assert ref == toks[:6]  # criteria fired where expected

    session = ChatSession(gen, max_new_tokens_total=96)
    out = session.ask(prompt, stopping_criteria=FakeKeywords())
    assert out == ref
    np.testing.assert_array_equal(
        np.asarray(session.state.cache.pre.length),
        np.asarray(ref_session.state.cache.pre.length),
    )


def test_chunked_sparse_decode_keep_gating():
    """With the output-text predictor on, frozen samples must not advance
    the sparse tier either; chunked == tokenwise on lengths and tokens."""
    cfg = _cfg(use_output_text_predictor=True, output_text_keep_rate=0.5)
    params, gen = _setup(cfg, seed=4, max_new=9, chunk=4)
    rng = np.random.default_rng(4)
    prompt = rng.integers(3, cfg.text.vocab_size, size=(8,))

    probe = ChatSession(gen, max_new_tokens_total=96)
    toks = probe.ask(prompt)
    eos = toks[3]
    _, gen2 = _setup(cfg, seed=4, eos=eos, max_new=9, chunk=4)
    gen2.params = params

    ref, ref_state = _tokenwise_answer(gen2, prompt)
    session = ChatSession(gen2, max_new_tokens_total=96)
    out = session.ask(prompt)
    assert out == ref[0]
    np.testing.assert_array_equal(
        np.asarray(session.state.cache.post.length),
        np.asarray(ref_state.cache.post.length),
    )
    np.testing.assert_array_equal(
        np.asarray(session.state.cache.pre.length),
        np.asarray(ref_state.cache.pre.length),
    )


def test_text_fallback_stop_rebuilds_exactly():
    """A stop that fires only through the DECODED-TEXT fallback (its token
    sequences never match — the alternate-tokenization case) must stop at
    the per-token path's point AND leave the live multi-round state
    identical (the safety-net replay rebuild)."""
    cfg = _cfg()
    params, gen = _setup(cfg, seed=6, max_new=12, chunk=5)
    rng = np.random.default_rng(6)
    prompt = rng.integers(3, cfg.text.vocab_size, size=(7,))
    round2 = rng.integers(3, cfg.text.vocab_size, size=(4,))

    class TextOnlyKeywords:
        # advertised token sequence never matches any sampled token, so the
        # in-graph matcher cannot fire; `tokenizer` marks the text fallback
        keyword_ids = [[10**6]]
        tokenizer = object()

        def __call__(self, out):
            return len(out) >= 6

    # ground truth: per-token path with the same criteria, then a round 2
    ref_session = ChatSession(gen, max_new_tokens_total=96)
    ref_session._start_round(prompt, None)
    ref1 = ref_session._ask_tokenwise(TextOnlyKeywords(), 12)
    assert len(ref1) == 6  # fallback fired mid-generation
    ref_session._start_round(round2, None)
    ref2 = ref_session._ask_tokenwise(None, 12)

    session = ChatSession(gen, max_new_tokens_total=96)
    out1 = session.ask(prompt, stopping_criteria=TextOnlyKeywords())
    assert out1 == ref1
    # the rebuilt state must be live-usable: round 2 matches token-for-token
    out2 = session.ask(round2)
    assert out2 == ref2
    for tier in ("pre", "post"):
        np.testing.assert_array_equal(
            np.asarray(getattr(session.state.cache, tier).length),
            np.asarray(getattr(ref_session.state.cache, tier).length),
        )
    assert int(session.state.next_pos[0]) == int(ref_session.state.next_pos[0])
    np.testing.assert_allclose(
        np.asarray(session.state.last_logits),
        np.asarray(ref_session.state.last_logits), atol=2e-4, rtol=2e-3,
    )


def test_text_fallback_agreeing_with_token_match_skips_rebuild():
    """When the token matcher and the text fallback fire at the SAME point
    (the common case), the fast aligned path is kept — output and state
    still match the per-token protocol."""
    cfg = _cfg()
    params, gen = _setup(cfg, seed=3, max_new=12, chunk=5)
    rng = np.random.default_rng(3)
    prompt = rng.integers(3, cfg.text.vocab_size, size=(7,))

    probe = ChatSession(gen, max_new_tokens_total=96)
    toks = probe.ask(prompt)
    stop_seq = toks[4:6]

    class Keywords:
        keyword_ids = [stop_seq]
        tokenizer = object()  # text fallback present and AGREES

        def __call__(self, out):
            return len(out) >= 2 and out[-2:] == stop_seq

    ref_session = ChatSession(gen, max_new_tokens_total=96)
    ref_session._start_round(prompt, None)
    ref = ref_session._ask_tokenwise(Keywords(), 12)

    session = ChatSession(gen, max_new_tokens_total=96)
    out = session.ask(prompt, stopping_criteria=Keywords())
    assert out == ref == toks[:6]
    np.testing.assert_array_equal(
        np.asarray(session.state.cache.pre.length),
        np.asarray(ref_session.state.cache.pre.length),
    )


def test_ask_zero_max_new_tokens_is_noop():
    """max_new_tokens=0 must emit nothing and persist nothing (predict.py
    exposes max_tokens ge=0)."""
    cfg = _cfg()
    params, gen = _setup(cfg, seed=7, max_new=8, chunk=4)
    rng = np.random.default_rng(7)
    prompt = rng.integers(3, cfg.text.vocab_size, size=(6,))
    round2 = rng.integers(3, cfg.text.vocab_size, size=(3,))

    ref_session = ChatSession(gen, max_new_tokens_total=96)
    ref_session._start_round(prompt, None)
    ref_state = ref_session.state

    session = ChatSession(gen, max_new_tokens_total=96)
    assert session.ask(prompt, max_new_tokens=0) == []
    np.testing.assert_array_equal(
        np.asarray(session.state.cache.pre.length),
        np.asarray(ref_state.cache.pre.length),
    )
    assert int(session.state.next_pos[0]) == int(ref_state.next_pos[0])
    # the session remains usable for a later round
    out2 = session.ask(round2, max_new_tokens=3)
    assert len(out2) == 3


def test_chunked_respects_max_new_exactly():
    """max_new not a multiple of the chunk: the in-graph limit freezes the
    sample mid-chunk; emitted count and cache lengths are exact."""
    cfg = _cfg()
    params, gen = _setup(cfg, seed=5, max_new=7, chunk=4)
    rng = np.random.default_rng(5)
    prompt = rng.integers(3, cfg.text.vocab_size, size=(6,))

    ref, ref_state = _tokenwise_answer(gen, prompt)
    session = ChatSession(gen, max_new_tokens_total=96)
    out = session.ask(prompt)
    assert out == ref[0]
    assert len(out) == 7
    np.testing.assert_array_equal(
        np.asarray(session.state.cache.pre.length),
        np.asarray(ref_state.cache.pre.length),
    )
    assert int(session.state.next_pos[0]) == int(ref_state.next_pos[0])
