"""Continuous batching (generation/continuous.py): requests admitted into
a RUNNING batch produce exactly the tokens a solo Generator.generate run
produces — including slot reuse after retirement and mixed
text-only/image admissions."""

import numpy as np
import pytest

import jax

from dynamic_llava_tpu.config import LlavaConfig, SparseConfig
from dynamic_llava_tpu.generation.continuous import ContinuousEngine
from dynamic_llava_tpu.generation.generate import GenerationConfig, Generator
from dynamic_llava_tpu.models import dynamic


def _cfg():
    sparse = SparseConfig(
        d_model=32, nhead=2, dim_feedforward=64, num_layers=1,
        use_vision_predictor=True, use_text_predictor=False,
        use_output_text_predictor=True, use_instruct_predictor=False,
    )
    return LlavaConfig.tiny(sparse=sparse)


def _gc(**kw):
    return GenerationConfig(
        max_new_tokens=kw.pop("max_new_tokens", 16),
        decode_chunk=kw.pop("decode_chunk", 4),
        pad_multiple=8, **kw,
    )


@pytest.fixture(scope="module")
def setup():
    cfg = _cfg()
    params = dynamic.init_llava_params(jax.random.key(0), cfg)
    return cfg, params


def _prompt(seed, n):
    rng = np.random.default_rng(seed)
    return rng.integers(3, 200, size=(n,)).astype(np.int64)


def _solo(cfg, params, prompt, max_new, prompt_bucket, pixels=None):
    """Reference: solo greedy generation for one request, padded to the
    engine's prompt bucket so prefill sees identical shapes."""
    gen = Generator(params, cfg, _gc(max_new_tokens=max_new))
    return gen.generate([prompt], pixels, pad_to=prompt_bucket)[0]


def test_staggered_admission_matches_solo(setup):
    cfg, params = setup
    engine = ContinuousEngine(
        params, cfg, _gc(), slots=2, prompt_bucket=24, max_new_cap=16,
        with_images=False,
    )
    prompts = [_prompt(1, 7), _prompt(2, 12), _prompt(3, 19)]
    max_news = [16, 6, 10]

    # r0 starts alone, r1 joins mid-flight, r2 must WAIT for a freed slot
    r0 = engine.submit(prompts[0], max_new_tokens=max_news[0])
    engine.step()
    r1 = engine.submit(prompts[1], max_new_tokens=max_news[1])
    r2 = engine.submit(prompts[2], max_new_tokens=max_news[2])
    assert engine._slot_req.count(None) == 1  # r1 not admitted yet
    engine.run_until_drained()

    for rid, prompt, max_new in zip((r0, r1, r2), prompts, max_news):
        got = engine.requests[rid].output
        want = _solo(cfg, params, prompt, max_new, 24)
        assert got == want, (rid, got, want)
        assert engine.requests[rid].done
    # all slots freed
    assert engine._slot_req == [None, None]


def test_slot_reuse_overwrites_stale_state(setup):
    """A request admitted into a slot that previously held a LONGER
    generation must not see any of its leftovers."""
    cfg, params = setup
    engine = ContinuousEngine(
        params, cfg, _gc(), slots=1, prompt_bucket=24, max_new_cap=16,
        with_images=False,
    )
    long_req = engine.submit(_prompt(5, 20), max_new_tokens=16)
    engine.run_until_drained()
    short_req = engine.submit(_prompt(6, 4), max_new_tokens=5)
    engine.run_until_drained()

    assert engine.requests[long_req].output == _solo(
        cfg, params, _prompt(5, 20), 16, 24)
    assert engine.requests[short_req].output == _solo(
        cfg, params, _prompt(6, 4), 5, 24)


def test_mixed_image_and_text_requests(setup):
    cfg, params = setup
    rng = np.random.default_rng(7)
    img = rng.normal(
        size=(cfg.vision.image_size, cfg.vision.image_size, 3)
    ).astype(np.float32)
    ids_img = _prompt(8, 9)
    ids_img[1] = -200  # image token
    ids_txt = _prompt(9, 11)

    engine = ContinuousEngine(
        params, cfg, _gc(), slots=2, prompt_bucket=24, max_new_cap=8,
    )
    ri = engine.submit(ids_img, pixel_values=img, max_new_tokens=8)
    rt = engine.submit(ids_txt, max_new_tokens=8)
    engine.run_until_drained()

    assert engine.requests[ri].output == _solo(
        cfg, params, ids_img, 8, 24, pixels=img[None])
    assert engine.requests[rt].output == _solo(cfg, params, ids_txt, 8, 24)


def test_rejects_oversized(setup):
    cfg, params = setup
    engine = ContinuousEngine(
        params, cfg, _gc(), slots=1, prompt_bucket=16, max_new_cap=8,
        with_images=False,
    )
    with pytest.raises(ValueError):
        engine.submit(_prompt(1, 17))
    with pytest.raises(ValueError):
        engine.submit(_prompt(1, 8), max_new_tokens=64)


def test_engine_int8_kv_cache(setup):
    """Continuous engine over scaled-int8 KV storage: the slot splice
    carries the per-vector scale planes too."""
    cfg, params = setup
    engine = ContinuousEngine(
        params, cfg, _gc(cache_dtype="int8"), slots=2, prompt_bucket=16,
        max_new_cap=8, with_images=False,
    )
    p0, p1 = _prompt(11, 6), _prompt(12, 10)
    r0 = engine.submit(p0, max_new_tokens=8)
    engine.step()
    r1 = engine.submit(p1, max_new_tokens=8)
    engine.run_until_drained()

    for rid, prompt in ((r0, p0), (r1, p1)):
        gen = Generator(params, cfg, _gc(max_new_tokens=8,
                                         cache_dtype="int8"))
        want = gen.generate([prompt], pad_to=16)[0]
        assert engine.requests[rid].output == want


def test_batched_admission_matches_solo(setup):
    """4 requests queued before any step admit as ONE batch-4 prefill
    (power-of-two bucketing) and still match solo runs token-for-token."""
    cfg, params = setup
    engine = ContinuousEngine(
        params, cfg, _gc(), slots=4, prompt_bucket=24, max_new_cap=16,
        with_images=False,
    )
    prompts = [_prompt(20 + i, 5 + 3 * i) for i in range(4)]
    rids = [engine.submit(p, max_new_tokens=8) for p in prompts]
    engine.step()
    # one batch-4 admission, no batch-1 admissions
    assert engine.admitted_batch_sizes == {4}
    engine.run_until_drained()
    for rid, prompt in zip(rids, prompts):
        assert engine.requests[rid].output == _solo(cfg, params, prompt, 8, 24)


def test_batched_admission_non_pow2_buckets(setup):
    """3 queued requests admit as 2+1 (pow2 buckets); all match solo."""
    cfg, params = setup
    engine = ContinuousEngine(
        params, cfg, _gc(), slots=4, prompt_bucket=24, max_new_cap=16,
        with_images=False,
    )
    prompts = [_prompt(30 + i, 6 + 2 * i) for i in range(3)]
    rids = [engine.submit(p, max_new_tokens=6) for p in prompts]
    engine.step()
    assert engine.admitted_batch_sizes == {1, 2}
    engine.run_until_drained()
    for rid, prompt in zip(rids, prompts):
        assert engine.requests[rid].output == _solo(cfg, params, prompt, 6, 24)


def test_sampled_and_greedy_share_the_batch(setup):
    """A temperature>0 request rides the same chunk program as greedy
    ones: the greedy rows stay token-exact vs solo, the sampled row
    streams real tokens, and the whole engine run is reproducible from
    its seed."""
    cfg, params = setup

    def run():
        engine = ContinuousEngine(
            params, cfg, _gc(), slots=2, prompt_bucket=24, max_new_cap=16,
            with_images=False,
        )
        rg = engine.submit(_prompt(40, 7), max_new_tokens=10)
        rs = engine.submit(_prompt(41, 9), max_new_tokens=10,
                           temperature=0.9, top_p=0.9)
        engine.run_until_drained()
        return engine.requests[rg].output, engine.requests[rs].output

    greedy_out, sampled_out = run()
    assert greedy_out == _solo(cfg, params, _prompt(40, 7), 10, 24)
    assert len(sampled_out) > 0
    # same seed, same submissions -> identical sampled stream
    greedy2, sampled2 = run()
    assert greedy2 == greedy_out and sampled2 == sampled_out


def test_explicit_temp_zero_matches_default_greedy(setup):
    """submit(temperature=0.0) goes through the per-slot sampling path and
    must still be exactly greedy."""
    cfg, params = setup
    engine = ContinuousEngine(
        params, cfg, _gc(), slots=1, prompt_bucket=16, max_new_cap=8,
        with_images=False,
    )
    p = _prompt(50, 6)
    rid = engine.submit(p, max_new_tokens=8, temperature=0.0, top_p=0.9)
    engine.run_until_drained()
    assert engine.requests[rid].output == _solo(cfg, params, p, 8, 16)


def test_spec_mode_matches_plain_engine_and_solo(setup):
    """spec_k engine (speculative verify inside the continuous chunk):
    token-exact vs the plain engine AND vs solo greedy generation, with
    staggered admission + slot reuse — accepted drafts change throughput,
    never tokens."""
    cfg, params = setup
    prompts = [_prompt(60, 7), _prompt(61, 12), _prompt(62, 16)]
    max_news = [16, 8, 12]

    def run(spec_k):
        engine = ContinuousEngine(
            params, cfg, _gc(), slots=2, prompt_bucket=24, max_new_cap=16,
            with_images=False, spec_k=spec_k,
        )
        r0 = engine.submit(prompts[0], max_new_tokens=max_news[0])
        engine.step()
        r1 = engine.submit(prompts[1], max_new_tokens=max_news[1])
        r2 = engine.submit(prompts[2], max_new_tokens=max_news[2])
        engine.run_until_drained()
        return [engine.requests[r].output for r in (r0, r1, r2)]

    spec_out = run(spec_k=3)
    plain_out = run(spec_k=0)
    assert spec_out == plain_out
    for got, prompt, max_new in zip(spec_out, prompts, max_news):
        assert got == _solo(cfg, params, prompt, max_new, 24)


def test_spec_mode_rejects_sampling(setup):
    cfg, params = setup
    engine = ContinuousEngine(
        params, cfg, _gc(), slots=1, prompt_bucket=16, max_new_cap=8,
        with_images=False, spec_k=2,
    )
    with pytest.raises(ValueError):
        engine.submit(_prompt(70, 5), max_new_tokens=8, temperature=0.7)
    with pytest.raises(AssertionError):
        ContinuousEngine(params, cfg, _gc(temperature=0.8), slots=1,
                         prompt_bucket=16, max_new_cap=8,
                         with_images=False, spec_k=2)


def test_prewarm_leaves_engine_clean(setup):
    """prewarm drives the full admission ladder + a saturated pass, then
    the engine must serve real traffic from a pristine state: no leftover
    request records, all slots free, and outputs token-exact vs solo."""
    cfg, params = setup
    engine = ContinuousEngine(
        params, cfg, _gc(), slots=2, prompt_bucket=24, max_new_cap=16,
        with_images=False,
    )
    engine.prewarm(_prompt(80, 9))
    assert engine.requests == {}
    assert engine._slot_req == [None, None]
    assert not engine._queue and not engine._inflight

    prompts = [_prompt(81, 7), _prompt(82, 12), _prompt(83, 19)]
    max_news = [16, 6, 10]
    rids = [engine.submit(p, max_new_tokens=mn)
            for p, mn in zip(prompts, max_news)]
    engine.run_until_drained()
    for rid, prompt, max_new in zip(rids, prompts, max_news):
        assert engine.requests[rid].output == _solo(
            cfg, params, prompt, max_new, 24)
