"""Randomized-config equivalence fuzz for the chunked decode scan.

The chunked on-device decode (lax.scan + active-mask freeze + capacity
clamps) must be a pure optimization: for ANY sparse configuration, batch
mix, and chunk size, its tokens and final tier lengths must match the
per-token path exactly. The fixed-case tests (test_chat_chunked,
test_dynamic) pin specific regimes; this sweeps random corners — small
output budgets (forced drops), mixed image/text batches, odd chunk sizes
vs max_new, predictors on/off per draw.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dynamic_llava_tpu.config import LlavaConfig, SparseConfig
from dynamic_llava_tpu.generation.generate import GenerationConfig, Generator
from dynamic_llava_tpu.models import dynamic


def _random_cfg(rng: np.random.Generator) -> LlavaConfig:
    sparse = SparseConfig(
        d_model=32, nhead=2, dim_feedforward=64, num_layers=1,
        use_vision_predictor=bool(rng.integers(2)),
        use_text_predictor=False,  # prefill-train-only knob
        use_output_text_predictor=bool(rng.integers(2)),
        use_instruct_predictor=bool(rng.integers(2)),
        vision_keep_rate=float(rng.choice([0.2, 0.5, 0.9])),
        output_text_keep_rate=float(rng.choice([0.3, 0.5, 1.0])),
        sparse_layer=int(rng.choice([1, 2, 3])),
    )
    return LlavaConfig.tiny(sparse=sparse)


def _random_batch(rng, cfg, with_image):
    lens = rng.integers(6, 20, size=int(rng.integers(1, 4)))
    ids_list = []
    for L in lens:
        ids = rng.integers(3, cfg.text.vocab_size, size=(int(L),)).astype(
            np.int64
        )
        if with_image:
            ids[min(2, L - 1)] = -200
        ids_list.append(ids)
    imgs = None
    if with_image:
        imgs = rng.normal(
            size=(len(lens), cfg.vision.image_size, cfg.vision.image_size, 3)
        ).astype(np.float32)
    return ids_list, imgs


@pytest.mark.parametrize("draw", range(4))
def test_chunked_decode_matches_per_token_random_config(draw):
    rng = np.random.default_rng(100 + draw)
    cfg = _random_cfg(rng)
    params = dynamic.init_llava_params(jax.random.key(draw), cfg)
    with_image = bool(rng.integers(2)) or cfg.sparse.use_vision_predictor
    ids_list, imgs = _random_batch(rng, cfg, with_image)
    max_new = int(rng.choice([5, 9, 16]))
    chunk = int(rng.choice([2, 3, 4, 7]))
    eos = cfg.text.vocab_size + 7  # unreachable: run the full budget
    bound = bool(rng.integers(2))
    # equivalence must hold for every KV storage mode (both paths share the
    # dtype, so quantization error is identical on both sides)
    cache_dtype = str(rng.choice(["bfloat16", "int8", "float8_e4m3fn"]))

    def run(decode_chunk):
        gen = Generator(params, cfg, GenerationConfig(
            max_new_tokens=max_new, decode_chunk=decode_chunk,
            eos_token_id=eos, bound_kv_budget=bound,
            cache_dtype=cache_dtype,
        ))
        out = gen.generate(ids_list, imgs)
        return out

    tok = run(1)
    chk = run(chunk)
    assert chk == tok, (
        f"draw {draw}: chunked({chunk}) != per-token for cfg "
        f"{dataclasses.asdict(cfg.sparse)} max_new={max_new} "
        f"cache_dtype={cache_dtype}"
    )


def test_chunked_decode_eos_freeze_random_config():
    """With a REACHABLE eos, early-stopped samples must freeze without
    corrupting still-active neighbours (active-mask no-op protocol)."""
    rng = np.random.default_rng(7)
    cfg = _random_cfg(rng)
    params = dynamic.init_llava_params(jax.random.key(3), cfg)
    ids_list, imgs = _random_batch(rng, cfg, True)
    # pick the most likely first token as EOS so some sample stops early
    gen0 = Generator(params, cfg, GenerationConfig(
        max_new_tokens=1, decode_chunk=1,
        eos_token_id=cfg.text.vocab_size + 7,
    ))
    first = gen0.generate(ids_list, imgs)
    eos = first[0][0]

    outs = {}
    for decode_chunk in (1, 4):
        gen = Generator(params, cfg, GenerationConfig(
            max_new_tokens=12, decode_chunk=decode_chunk, eos_token_id=eos,
        ))
        outs[decode_chunk] = gen.generate(ids_list, imgs)
    assert outs[1] == outs[4]
    assert outs[1][0][-1] == eos and len(outs[1][0]) <= 12


@pytest.mark.parametrize("draw", range(2))
def test_chunked_decode_matches_per_token_ring_overflow(draw):
    """Ring-overflow regime (kv_overflow="ring", window << max_new): the
    chunked scan must stay a pure optimization while slots wrap — including
    with quantized KV storage, where the scale side-buffers wrap too."""
    rng = np.random.default_rng(300 + draw)
    cfg = _random_cfg(rng)
    params = dynamic.init_llava_params(jax.random.key(20 + draw), cfg)
    with_image = bool(rng.integers(2)) or cfg.sparse.use_vision_predictor
    ids_list, imgs = _random_batch(rng, cfg, with_image)
    max_new = 24
    chunk = int(rng.choice([3, 5, 7]))
    eos = cfg.text.vocab_size + 7
    cache_dtype = str(rng.choice(["bfloat16", "int8", "float8_e4m3fn"]))

    def run(decode_chunk):
        gen = Generator(params, cfg, GenerationConfig(
            max_new_tokens=max_new, decode_chunk=decode_chunk,
            eos_token_id=eos, cache_dtype=cache_dtype,
            kv_overflow="ring", kv_window=4, pad_multiple=1,
        ))
        return gen.generate(ids_list, imgs)

    tok = run(1)
    chk = run(chunk)
    assert chk == tok, (
        f"draw {draw}: ring chunked({chunk}) != per-token for cfg "
        f"{dataclasses.asdict(cfg.sparse)} cache_dtype={cache_dtype}"
    )


def test_chunked_decode_matches_per_token_sliding_window():
    """Mistral regime: dense (predictors off), window BINDING during decode,
    multimodal batch — chunked must equal per-token."""
    rng = np.random.default_rng(42)
    sparse = SparseConfig(
        d_model=32, nhead=2, dim_feedforward=64, num_layers=1,
        use_vision_predictor=False, use_text_predictor=False,
        use_output_text_predictor=False, use_instruct_predictor=False,
    )
    base = LlavaConfig.tiny(sparse=sparse)
    text = dataclasses.replace(
        base.text, num_key_value_heads=2, sliding_window=8
    )
    cfg = dataclasses.replace(base, text=text)
    params = dynamic.init_llava_params(jax.random.key(11), cfg)
    ids_list, imgs = _random_batch(rng, cfg, True)
    eos = cfg.text.vocab_size + 7

    outs = {}
    for decode_chunk in (1, 5):
        gen = Generator(params, cfg, GenerationConfig(
            max_new_tokens=14, decode_chunk=decode_chunk, eos_token_id=eos,
        ))
        outs[decode_chunk] = gen.generate(ids_list, imgs)
    assert outs[1] == outs[5]
