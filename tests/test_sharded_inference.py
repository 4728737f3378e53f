"""Sharded (tensor/fsdp) inference equivalence on the 8-device CPU mesh —
the single-chip bench path scaled to the v5e-8 serving layout."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dynamic_llava_tpu.config import ClipVisionConfig, LlamaConfig, LlavaConfig, SparseConfig
from dynamic_llava_tpu.models import dynamic
from dynamic_llava_tpu.multimodal.fusion import plan_batch
from dynamic_llava_tpu.ops.kv_cache import init_tiered_cache
from dynamic_llava_tpu.parallel.sharding import (
    llava_param_specs,
    make_mesh,
    shard_params,
)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def _cfg():
    return LlavaConfig(
        text=LlamaConfig(vocab_size=256, hidden_size=64, intermediate_size=128,
                         num_hidden_layers=4, num_attention_heads=8,
                         num_key_value_heads=8),
        vision=ClipVisionConfig(hidden_size=32, intermediate_size=64,
                                num_hidden_layers=2, num_attention_heads=2,
                                image_size=56, patch_size=14),
        sparse=SparseConfig(use_vision_predictor=True, vision_keep_rate=0.25,
                            use_output_text_predictor=True,
                            use_instruct_predictor=False,
                            d_model=32, nhead=2, dim_feedforward=64,
                            num_layers=1),
    )


def _prefill_args(cfg, plan, imgs):
    return (
        jnp.asarray(plan.token_ids), jnp.asarray(plan.is_image),
        jnp.asarray(plan.image_slot), jnp.asarray(plan.valid_len),
        jnp.asarray(plan.spans.image_start),
        jnp.asarray(plan.spans.last_instruct_start),
        jnp.asarray(plan.spans.last_instruct_end),
        jnp.asarray(plan.spans.has_image),
        jnp.asarray(imgs),
    )


def test_sharded_prefill_decode_matches_single():
    cfg = _cfg()
    params = dynamic.init_llava_params(jax.random.key(0), cfg)
    rng = np.random.default_rng(0)
    ids = []
    for L in (12, 10):
        row = rng.integers(3, cfg.text.vocab_size, size=(L,)).astype(np.int64)
        row[2] = -200
        ids.append(row)
    plan = plan_batch(ids, cfg.num_image_tokens)
    imgs = rng.normal(size=(2, 56, 56, 3)).astype(np.float32)
    args = _prefill_args(cfg, plan, imgs)

    def run(p):
        cache = init_tiered_cache(cfg.text, 2, plan.batch, 64, 48, jnp.float32)
        state, _ = dynamic.prefill(p, cfg, *args, cache)
        toks = jnp.asarray([5, 7])
        for _ in range(3):
            state = dynamic.decode_step(p, cfg, toks, state)
        return state

    ref = run(params)

    # shard over (data=2, fsdp=2, tensor=2): the v5e-8 serving layout
    mesh = make_mesh(data=2, fsdp=2, tensor=2)
    specs = llava_param_specs(cfg, params)
    sharded = shard_params(jax.tree.map(jnp.copy, params), mesh, specs)
    with mesh:
        got = run(sharded)

    np.testing.assert_allclose(
        np.asarray(got.last_logits), np.asarray(ref.last_logits),
        atol=5e-4, rtol=5e-3,
    )
    np.testing.assert_array_equal(
        np.asarray(got.cache.post.length), np.asarray(ref.cache.post.length)
    )


def test_sharded_speculative_step_matches_single():
    """The fused speculative verify (extend + acceptance + rollback) under
    the (data=2, fsdp=2, tensor=2) mesh: acceptance counts must be
    IDENTICAL to the single-device run (integer decisions tolerate no
    sharding drift) and logits must agree numerically."""
    cfg = _cfg()
    params = dynamic.init_llava_params(jax.random.key(1), cfg)
    rng = np.random.default_rng(1)
    ids = []
    for L in (12, 10):
        row = rng.integers(3, cfg.text.vocab_size, size=(L,)).astype(np.int64)
        row[2] = -200
        ids.append(row)
    plan = plan_batch(ids, cfg.num_image_tokens)
    imgs = rng.normal(size=(2, 56, 56, 3)).astype(np.float32)
    args = _prefill_args(cfg, plan, imgs)
    toks = jnp.asarray(
        rng.integers(3, cfg.text.vocab_size, size=(3, 2, 4)), jnp.int32
    )  # 3 rounds of [B=2, M=4] candidates

    def run(p):
        cache = init_tiered_cache(cfg.text, 2, plan.batch, 64, 48, jnp.float32)
        state, _ = dynamic.prefill(p, cfg, *args, cache)
        accs = []
        for r in range(toks.shape[0]):
            state, n_acc, _ = dynamic.decode_speculative_step(
                p, cfg, toks[r], state, eos_token_id=999
            )
            accs.append(np.asarray(n_acc))
        return state, np.stack(accs)

    ref, ref_acc = run(params)
    mesh = make_mesh(data=2, fsdp=2, tensor=2)
    specs = llava_param_specs(cfg, params)
    sharded = shard_params(jax.tree.map(jnp.copy, params), mesh, specs)
    with mesh:
        got, got_acc = run(sharded)

    np.testing.assert_array_equal(got_acc, ref_acc)
    np.testing.assert_allclose(
        np.asarray(got.last_logits), np.asarray(ref.last_logits),
        atol=5e-4, rtol=5e-3,
    )
    np.testing.assert_array_equal(
        np.asarray(got.cache.post.length), np.asarray(ref.cache.post.length)
    )
