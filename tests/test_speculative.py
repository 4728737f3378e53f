"""Speculative decoding must be a pure optimization: for ANY draft source
— adversarial, random, or oracle — the emitted tokens equal the plain
greedy chain exactly; only the round count changes. The hard part it pins
is the sequential-equivalence chunk mask (a dropped candidate's K/V must be
invisible to later candidates, as it is step-by-step) and the
rollback-by-lengths across both tiers."""

import dataclasses

import numpy as np
import pytest

import jax

from dynamic_llava_tpu.config import LlavaConfig, SparseConfig
from dynamic_llava_tpu.generation.generate import GenerationConfig, Generator
from dynamic_llava_tpu.generation.speculative import prompt_lookup_draft
from dynamic_llava_tpu.models import dynamic


def _cfg(**sparse_overrides) -> LlavaConfig:
    sparse = SparseConfig(
        d_model=32, nhead=2, dim_feedforward=64, num_layers=1,
        use_vision_predictor=False, use_text_predictor=False,
        use_output_text_predictor=False, use_instruct_predictor=False,
    )
    sparse = dataclasses.replace(sparse, **sparse_overrides)
    return LlavaConfig.tiny(sparse=sparse)


def _batch(cfg, rng, lens, with_image):
    ids_list = []
    for L in lens:
        ids = rng.integers(3, cfg.text.vocab_size, size=(L,)).astype(np.int64)
        if with_image:
            ids[2] = -200
        ids_list.append(ids)
    imgs = None
    if with_image:
        imgs = rng.normal(
            size=(len(lens), cfg.vision.image_size, cfg.vision.image_size, 3)
        ).astype(np.float32)
    return ids_list, imgs


def test_prompt_lookup_draft_unit():
    # trailing bigram (7, 8) occurred earlier, followed by 9, 10, 11
    ctx = [1, 7, 8, 9, 10, 11, 5, 7, 8]
    assert prompt_lookup_draft(ctx, 3) == [9, 10, 11]
    # latest match wins: second occurrence of (2,) followed by 6
    assert prompt_lookup_draft([2, 4, 2, 6, 2], 1, max_ngram=1) == [6]
    assert prompt_lookup_draft([1, 2, 3], 2) == []  # no repeat -> no draft


CASES = [
    # (sparse overrides, with_image, draft_k, bound, cache_dtype)
    (dict(), False, 4, True, "bfloat16"),
    (dict(use_output_text_predictor=True, use_text_predictor=True,
          output_text_keep_rate=0.5), False, 3, True, "int8"),
    (dict(use_vision_predictor=True, vision_keep_rate=0.25,
          use_output_text_predictor=True, use_text_predictor=True), True, 5,
     True, "float8_e4m3fn"),
    (dict(use_output_text_predictor=True, use_text_predictor=True), False, 2,
     False, "bfloat16"),
]


@pytest.mark.parametrize("case", range(len(CASES)))
def test_speculative_matches_greedy_any_draft(case):
    """Adversarial-random AND prompt-lookup drafts, sparse configs on/off,
    multimodal and text-only, ragged B=2, KV storage dtypes (the quantized
    extend writes scale side-buffers through the chunk_attend mask path) —
    token-exact vs the chunked greedy path (itself fuzz-pinned to the
    per-token path)."""
    overrides, with_image, k, bound, cache_dtype = CASES[case]
    cfg = _cfg(**overrides)
    params = dynamic.init_llava_params(jax.random.key(40 + case), cfg)
    rng = np.random.default_rng(50 + case)
    ids_list, imgs = _batch(cfg, rng, (7, 11), with_image)
    eos = cfg.text.vocab_size + 7  # unreachable: run the full budget
    gen = Generator(params, cfg, GenerationConfig(
        max_new_tokens=14, decode_chunk=4, eos_token_id=eos,
        bound_kv_budget=bound, pad_multiple=1, cache_dtype=cache_dtype,
    ))
    ref = gen.generate(ids_list, imgs)

    def random_draft(ctx, n):
        # adversarial: unrelated tokens, occasionally empty
        r = np.random.default_rng(len(ctx))
        if r.integers(3) == 0:
            return []
        return [int(t) for t in r.integers(3, cfg.text.vocab_size, size=n)]

    for draft in (random_draft, "prompt_lookup"):
        out = gen.generate_speculative(
            ids_list, imgs, draft=draft, draft_k=k
        )
        assert out == ref, f"case {case} draft {draft}"


def test_speculative_eos_and_stats():
    """EOS mid-round: the accepted prefix cuts at EOS (emitted, nothing
    past it), matching the plain path; stats count rounds/acceptance."""
    cfg = _cfg()
    params = dynamic.init_llava_params(jax.random.key(9), cfg)
    rng = np.random.default_rng(9)
    ids_list, _ = _batch(cfg, rng, (8, 6), False)
    probe = Generator(params, cfg, GenerationConfig(
        max_new_tokens=10, decode_chunk=4,
        eos_token_id=cfg.text.vocab_size + 7, pad_multiple=1,
    ))
    toks = probe.generate(ids_list)
    eos = toks[0][3]  # fires mid-generation for sample 0

    gen = Generator(params, cfg, GenerationConfig(
        max_new_tokens=10, decode_chunk=4, eos_token_id=eos, pad_multiple=1,
    ))
    ref = gen.generate(ids_list)
    assert any(len(o) < 10 for o in ref)  # EOS actually fired somewhere
    stats = {}
    out = gen.generate_speculative(ids_list, draft="prompt_lookup",
                                   draft_k=3, stats=stats)
    assert out == ref
    assert stats["rounds"] >= 1 and stats["emitted"] == sum(len(o) for o in ref)


def test_speculative_oracle_draft_hits_mechanical_ceiling():
    """An oracle draft (feeds the true continuation) must accept every
    candidate: rounds == ceil(max_new / (draft_k + 1)). This pins the
    acceptance chain itself — a masking bug that perturbs any verified
    logit would break the full-acceptance count."""
    cfg = _cfg(use_output_text_predictor=True, use_text_predictor=True)
    params = dynamic.init_llava_params(jax.random.key(12), cfg)
    rng = np.random.default_rng(12)
    ids_list, _ = _batch(cfg, rng, (9,), False)
    eos = cfg.text.vocab_size + 7
    max_new, k = 16, 3
    gen = Generator(params, cfg, GenerationConfig(
        max_new_tokens=max_new, decode_chunk=4, eos_token_id=eos,
        pad_multiple=1,
    ))
    ref = gen.generate(ids_list)[0]
    full = [int(t) for t in np.asarray(ids_list[0])] + ref

    def oracle(ctx, n):
        # ctx ends at some position inside the true chain; propose what
        # actually comes next
        pos = len(ctx)
        return full[pos: pos + n]

    stats = {}
    out = gen.generate_speculative(ids_list, draft=oracle, draft_k=k,
                                   stats=stats)
    assert out[0] == ref
    assert stats["rounds"] == -(-max_new // (k + 1))
    assert stats["tokens_per_round"] == pytest.approx(max_new / stats["rounds"])


def test_device_prompt_lookup_matches_host_semantics():
    """The in-graph matcher proposes the same continuation as the host
    version on representative contexts (longest n first, latest first)."""
    import jax.numpy as jnp

    from dynamic_llava_tpu.generation.speculative import device_prompt_lookup

    cases = [
        [1, 7, 8, 9, 10, 11, 5, 7, 8],
        [2, 4, 2, 6, 2],
        [1, 2, 3],
        [9, 9, 9, 9, 9],
    ]
    k = 3
    cap = 16
    ctx = np.zeros((len(cases), cap), np.int32)
    lens = np.zeros(len(cases), np.int32)
    for i, c in enumerate(cases):
        ctx[i, : len(c)] = c
        lens[i] = len(c)
    dev = np.asarray(device_prompt_lookup(
        jnp.asarray(ctx), jnp.asarray(lens), k
    ))
    for i, c in enumerate(cases):
        host = prompt_lookup_draft(c, k)
        got = [int(t) for t in dev[i]]
        # host returns a possibly-short list; device 0-pads
        assert got[: len(host)] == host, (i, got, host)


@pytest.mark.parametrize("case", [0, 2])
def test_speculative_device_loop_matches_greedy(case):
    """The whole-generation device program (in-graph drafting +
    while_loop verify rounds, one host fetch) is token-exact vs the
    chunked greedy path, sparse and dense, multimodal and ragged."""
    overrides, with_image, k, bound, cache_dtype = CASES[case]
    cfg = _cfg(**overrides)
    params = dynamic.init_llava_params(jax.random.key(60 + case), cfg)
    rng = np.random.default_rng(70 + case)
    ids_list, imgs = _batch(cfg, rng, (7, 11), with_image)
    eos = cfg.text.vocab_size + 7
    gen = Generator(params, cfg, GenerationConfig(
        max_new_tokens=14, decode_chunk=4, eos_token_id=eos,
        bound_kv_budget=bound, pad_multiple=1, cache_dtype=cache_dtype,
    ))
    ref = gen.generate(ids_list, imgs)
    stats = {}
    out = gen.generate_speculative_device(ids_list, imgs, draft_k=k,
                                          stats=stats)
    assert out == ref
    assert 1 <= stats["rounds"] <= 2 * 14  # bounded loop actually looped


def test_speculative_device_loop_eos():
    """Reachable EOS: the device loop stops exactly where greedy does."""
    cfg = _cfg()
    params = dynamic.init_llava_params(jax.random.key(9), cfg)
    rng = np.random.default_rng(9)
    ids_list, _ = _batch(cfg, rng, (8, 6), False)
    probe = Generator(params, cfg, GenerationConfig(
        max_new_tokens=10, decode_chunk=4,
        eos_token_id=cfg.text.vocab_size + 7, pad_multiple=1,
    ))
    eos = probe.generate(ids_list)[0][3]
    gen = Generator(params, cfg, GenerationConfig(
        max_new_tokens=10, decode_chunk=4, eos_token_id=eos, pad_multiple=1,
    ))
    ref = gen.generate(ids_list)
    out = gen.generate_speculative_device(ids_list, draft_k=3)
    assert out == ref


def test_speculative_rejects_sampling_and_ring():
    cfg = _cfg()
    params = dynamic.init_llava_params(jax.random.key(1), cfg)
    gen = Generator(params, cfg, GenerationConfig(temperature=0.7))
    with pytest.raises(ValueError, match="greedy"):
        gen.generate_speculative([np.array([3, 4, 5])])
    gen2 = Generator(params, cfg, GenerationConfig(
        kv_overflow="ring", kv_window=8))
    with pytest.raises(ValueError, match="drop"):
        gen2.generate_speculative([np.array([3, 4, 5])])
