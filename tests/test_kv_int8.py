"""Scaled-int8 KV cache storage (``cache_dtype="int8"``): same KV-read
bandwidth as fp8 with per-head-vector dynamic scales — the vLLM-style int8
KV option named in COMPONENTS.md. Covers the quantizer's error bound, the
prefill/decode path, the continuation (E5) path, and beam reordering."""

import dataclasses

import numpy as np

import jax
import jax.numpy as jnp

from dynamic_llava_tpu.config import LlavaConfig, SparseConfig
from dynamic_llava_tpu.models import dynamic
from dynamic_llava_tpu.multimodal.fusion import plan_batch
from dynamic_llava_tpu.ops.kv_cache import (
    dequantize_kv,
    init_tiered_cache,
    quantize_kv,
)


def _cfg(**sparse_overrides):
    sparse = SparseConfig(
        d_model=32, nhead=2, dim_feedforward=64, num_layers=1,
        use_vision_predictor=False, use_text_predictor=False,
        use_output_text_predictor=False, use_instruct_predictor=False,
    )
    return LlavaConfig.tiny(sparse=dataclasses.replace(sparse, **sparse_overrides))


def _prefill(params, cfg, plan, dtype, pre=48, post=48):
    cache = init_tiered_cache(
        cfg.text, cfg.sparse.sparse_layer, plan.batch, pre, post, dtype
    )
    return dynamic.prefill(
        params, cfg, jnp.asarray(plan.token_ids), jnp.asarray(plan.is_image),
        jnp.asarray(plan.image_slot), jnp.asarray(plan.valid_len),
        jnp.asarray(plan.spans.image_start),
        jnp.asarray(plan.spans.last_instruct_start),
        jnp.asarray(plan.spans.last_instruct_end),
        jnp.asarray(plan.spans.has_image), None, cache,
    )


def test_quantize_kv_error_bound():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(3, 7, 2, 32)) * 5.0, jnp.float32)
    q, s = quantize_kv(x)
    assert q.dtype == jnp.int8 and s.dtype == jnp.bfloat16
    assert s.shape == x.shape[:-1]
    back = np.asarray(dequantize_kv(q, s, jnp.float32))
    # per-element error <= half a quantization step (+ bf16 scale rounding)
    step = np.asarray(s, np.float32)[..., None]
    assert np.all(np.abs(back - np.asarray(x)) <= 0.51 * step + 1e-6)


def test_int8_kv_cache_beats_fp8_on_logits():
    cfg = _cfg()
    params = dynamic.init_llava_params(jax.random.key(0), cfg)
    ids = np.random.default_rng(0).integers(3, cfg.text.vocab_size, (2, 12))
    plan = plan_batch(list(ids), 0)

    def run(dtype):
        state, _ = _prefill(params, cfg, plan, dtype)
        if jnp.dtype(dtype) == jnp.int8:
            assert state.cache.pre.quantized and state.cache.post.quantized
        for _ in range(4):
            tok = jnp.argmax(state.last_logits, axis=-1)
            state = dynamic.decode_step(params, cfg, tok, state)
        return np.asarray(state.last_logits, np.float32)

    ref = run(jnp.float32)
    i8 = run(jnp.int8)
    f8 = run(jnp.float8_e4m3fn)

    def cos(a, b):
        return (a * b).sum() / (np.linalg.norm(a) * np.linalg.norm(b))

    c_i8, c_f8 = cos(ref, i8), cos(ref, f8)
    assert c_i8 > 0.995, c_i8
    # the scales buy ~3 mantissa bits over e4m3 at equal KV bandwidth
    assert c_i8 >= c_f8 - 1e-4, (c_i8, c_f8)


def test_int8_kv_extend_and_sparse_decode():
    """Continuation prefill (E5) and the output-text sparsifier both run on
    the quantized cache; lengths match the f32-cache run exactly and logits
    stay close."""
    cfg = _cfg(use_output_text_predictor=True, output_text_keep_rate=0.5)
    params = dynamic.init_llava_params(jax.random.key(1), cfg)
    rng = np.random.default_rng(1)
    a = rng.integers(3, cfg.text.vocab_size, size=(2, 9))
    bchunk = rng.integers(3, cfg.text.vocab_size, size=(2, 4))
    plan = plan_batch(list(a), 0)

    def run(dtype):
        state, _ = _prefill(params, cfg, plan, dtype)
        for _ in range(3):
            tok = jnp.argmax(state.last_logits, axis=-1)
            state = dynamic.decode_step(params, cfg, tok, state)
        state = dynamic.prefill_continue(params, cfg, jnp.asarray(bchunk), state)
        for _ in range(2):
            tok = jnp.argmax(state.last_logits, axis=-1)
            state = dynamic.decode_step(params, cfg, tok, state)
        return state

    ref = run(jnp.float32)
    got = run(jnp.int8)
    np.testing.assert_array_equal(
        np.asarray(got.cache.pre.length), np.asarray(ref.cache.pre.length)
    )
    # keep decisions ride dequantized hiddens; at this scale they agree
    np.testing.assert_array_equal(
        np.asarray(got.cache.post.length), np.asarray(ref.cache.post.length)
    )
    r = np.asarray(ref.last_logits, np.float32)
    g = np.asarray(got.last_logits, np.float32)
    cosine = (r * g).sum() / (np.linalg.norm(r) * np.linalg.norm(g))
    assert cosine > 0.99, cosine


def test_beam_reorder_carries_scales():
    from dynamic_llava_tpu.generation.beam import reorder_cache

    cfg = _cfg()
    cache = init_tiered_cache(cfg.text, cfg.sparse.sparse_layer, 3, 8, 8, jnp.int8)
    # stamp per-sample scale patterns and permute
    sk = cache.post.k_scale + jnp.arange(3.0, dtype=jnp.bfloat16)[None, :, None, None]
    cache = dataclasses.replace(
        cache, post=cache.post._replace(k_scale=sk)
    ) if dataclasses.is_dataclass(cache) else cache._replace(
        post=cache.post._replace(k_scale=sk)
    )
    idx = jnp.asarray([2, 0, 1])
    out = reorder_cache(cache, idx)
    np.testing.assert_array_equal(
        np.asarray(out.post.k_scale[:, 0]), np.asarray(sk[:, 2])
    )
    assert out.pre.v_scale is not None


def test_fold_matches_dequant_decode_attend():
    """The scale-folded int8 path in decode_attend_appended must equal
    dequantize-then-attend: (q·(k·s)) == (q·k)·s and Σp(v·s) == Σ(p·s)v.
    The fold is what keeps XLA from materializing the bf16 cache
    (docs/BENCHMARKS.md, serving_int8kv arm)."""
    from dynamic_llava_tpu.ops.attention import decode_attend_appended

    rng = np.random.default_rng(3)
    b, max_len, hkv, h, d = 2, 17, 2, 4, 16
    k_raw = jnp.asarray(rng.normal(size=(b, max_len, hkv, d)) * 3.0,
                        jnp.float32)
    v_raw = jnp.asarray(rng.normal(size=(b, max_len, hkv, d)) * 3.0,
                        jnp.float32)
    kq, ks = quantize_kv(k_raw)
    vq, vs = quantize_kv(v_raw)
    q = jnp.asarray(rng.normal(size=(b, 1, h, d)), jnp.float32)
    k_cur = jnp.asarray(rng.normal(size=(b, 1, hkv, d)), jnp.float32)
    v_cur = jnp.asarray(rng.normal(size=(b, 1, hkv, d)), jnp.float32)
    length = jnp.asarray([5, 17], jnp.int32)

    ref = decode_attend_appended(
        q, dequantize_kv(kq, ks, jnp.float32),
        dequantize_kv(vq, vs, jnp.float32), k_cur, v_cur, length)
    got = decode_attend_appended(
        q, kq, vq, k_cur, v_cur, length, k_scale=ks, v_scale=vs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-6)
