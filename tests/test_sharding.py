"""Multi-device sharding tests on the 8-virtual-CPU mesh."""

import dataclasses
import os
import re
import subprocess
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dynamic_llava_tpu.config import ClipVisionConfig, LlamaConfig, LlavaConfig, SparseConfig
from dynamic_llava_tpu.models import dynamic
from dynamic_llava_tpu.parallel.sharding import (
    llava_param_specs,
    make_mesh,
    shard_params,
)
from dynamic_llava_tpu.train.optimizer import label_params, make_optimizer
from dynamic_llava_tpu.train.step import batch_from_plan, make_train_step, shard_batch


def _cfg():
    return LlavaConfig(
        text=LlamaConfig(
            vocab_size=256, hidden_size=64, intermediate_size=128,
            num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=4,
        ),
        vision=ClipVisionConfig(
            hidden_size=32, intermediate_size=64, num_hidden_layers=2,
            num_attention_heads=2, image_size=56, patch_size=14,
        ),
        sparse=SparseConfig(
            use_vision_predictor=True, use_output_text_predictor=True,
            use_instruct_predictor=False, output_text_len_for_training=2,
            d_model=32, nhead=2, dim_feedforward=64, num_layers=1,
        ),
    )


def _batch(cfg, batch_size):
    from dynamic_llava_tpu.multimodal.fusion import plan_batch

    rng = np.random.default_rng(0)
    ids, labels = [], []
    for _ in range(batch_size):
        row = rng.integers(3, cfg.text.vocab_size, size=(20,)).astype(np.int64)
        row[1] = -200
        lab = row.copy()
        lab[:14] = -100
        ids.append(row)
        labels.append(lab)
    plan = plan_batch(ids, cfg.num_image_tokens, labels_list=labels)
    imgs = rng.normal(
        size=(batch_size, cfg.vision.image_size, cfg.vision.image_size, 3)
    ).astype(np.float32)
    return plan, imgs


def test_optimizer_labels():
    cfg = _cfg()
    params = dynamic.init_llava_params(jax.random.key(0), cfg)
    labels = label_params(params)
    flat = jax.tree_util.tree_leaves_with_path(labels)
    seen = {leaf for _, leaf in flat}
    assert seen == {"frozen", "base", "base_nd", "predictor", "predictor_nd"}
    # all vision tower leaves frozen
    vt = jax.tree_util.tree_leaves(labels["vision_tower"])
    assert set(vt) == {"frozen"}
    pred = set(jax.tree_util.tree_leaves(labels["predictors"]))
    assert pred <= {"predictor", "predictor_nd"}


_ISOLATE_ENV = "DYNAMIC_LLAVA_TEST_ISOLATED"
# XLA's CPU backend segfaults compiling this module's big train-step
# programs when they run late in a long single-process pytest session
# (observed three times: twice at the 3-axis mesh step compile, once at
# the grad-accum step compile — rc=139 inside backend_compile_and_load /
# the compilation-cache write); a fresh process compiles them reliably
# every time. The first of these tests to run re-runs ALL of them in ONE
# fresh subprocess (amortizing the ~25 s interpreter+import startup);
# each test then asserts the shared outcome.
_HEAVY_TESTS = (
    "test_sharded_train_step_matches_single_device",
    "test_train_step_decreases_loss_single_device",
    "test_grad_accumulation_matches_full_batch",
)
_heavy_result = {}


def _heavy_isolated(name: str) -> bool:
    """True if the caller should return (it ran isolated instead)."""
    if os.environ.get(_ISOLATE_ENV) == "1":
        return False
    if not _heavy_result:
        proc = subprocess.run(
            [sys.executable, "-m", "pytest", "-q", "-p", "no:cacheprovider",
             os.path.abspath(__file__), "-k", " or ".join(_HEAVY_TESTS)],
            env=dict(os.environ, **{_ISOLATE_ENV: "1"}),
            capture_output=True, text=True, timeout=1800,
        )
        _heavy_result["rc"] = proc.returncode
        # a renamed test would be silently deselected by -k; require that
        # passed+skipped covers the full set so drift fails loudly instead
        # of passing vacuously. Skips propagate (the subprocess may
        # legitimately skip, e.g. a pre-set XLA_FLAGS device count < 8
        # keeps conftest from forcing 8 virtual devices).
        m_pass = re.search(r"(\d+) passed", proc.stdout)
        m_skip = re.search(r"(\d+) skipped", proc.stdout)
        n_pass = int(m_pass.group(1)) if m_pass else 0
        n_skip = int(m_skip.group(1)) if m_skip else 0
        _heavy_result["all_ran"] = n_pass + n_skip == len(_HEAVY_TESTS)
        _heavy_result["skipped"] = n_skip
        _heavy_result["log"] = f"{proc.stdout[-3000:]}\n{proc.stderr[-2000:]}"
    assert _heavy_result["rc"] == 0 and _heavy_result["all_ran"], (
        f"isolated train-step tests failed (asserted from {name}):\n"
        + _heavy_result["log"]
    )
    if _heavy_result["skipped"]:
        pytest.skip(
            f"{_heavy_result['skipped']} of the isolated train-step tests "
            "skipped in the subprocess"
        )
    return True


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_train_step_matches_single_device():
    if _heavy_isolated("test_sharded_train_step_matches_single_device"):
        return
    cfg = _cfg()
    params = dynamic.init_llava_params(jax.random.key(0), cfg)
    optimizer = make_optimizer(base_lr=1e-3, predictor_lr=1e-3)
    plan, imgs = _batch(cfg, batch_size=4)
    batch = batch_from_plan(plan, imgs)
    rng = jax.random.key(7)
    tau = jnp.float32(1.0)

    # single-device reference
    step1 = make_train_step(cfg, optimizer, remat=False)
    p1, _, m1 = step1(
        jax.tree.map(jnp.copy, params), optimizer.init(params), batch, rng, tau
    )

    # sharded: data=2, fsdp=2, tensor=2
    mesh = make_mesh(data=2, fsdp=2, tensor=2)
    specs = llava_param_specs(cfg, params)
    sharded = shard_params(jax.tree.map(jnp.copy, params), mesh, specs)
    stepN = make_train_step(cfg, optimizer, mesh=mesh, param_specs=specs, remat=False)
    with mesh:
        pN, _, mN = stepN(
            sharded, optimizer.init(sharded), shard_batch(batch, mesh), rng, tau
        )
    np.testing.assert_allclose(
        float(m1["loss"]), float(mN["loss"]), rtol=2e-4, atol=2e-5
    )
    # updated params agree across the mesh
    a = np.asarray(p1["llm"]["layers"]["q"])
    b = np.asarray(pN["llm"]["layers"]["q"])
    np.testing.assert_allclose(a, b, rtol=2e-3, atol=2e-5)
    # frozen tower untouched
    np.testing.assert_array_equal(
        np.asarray(params["vision_tower"]["patch_embedding"]),
        np.asarray(pN["vision_tower"]["patch_embedding"]),
    )


def test_train_step_decreases_loss_single_device():
    if _heavy_isolated("test_train_step_decreases_loss_single_device"):
        return
    cfg = _cfg()
    params = dynamic.init_llava_params(jax.random.key(1), cfg)
    optimizer = make_optimizer(base_lr=5e-3, predictor_lr=5e-3)
    opt_state = optimizer.init(params)
    plan, imgs = _batch(cfg, batch_size=2)
    batch = batch_from_plan(plan, imgs)
    step = make_train_step(cfg, optimizer, remat=True)
    losses = []
    for i in range(4):
        params, opt_state, metrics = step(
            params, opt_state, batch, jax.random.key(i), jnp.float32(1.0)
        )
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0], losses


def test_grad_accumulation_matches_full_batch():
    """grad_accum_steps=2 over a batch == one full-batch step (same update),
    when the stochastic parts are frozen (tau fixed, same rng per micro is
    NOT possible — so compare against the averaged-grad construction)."""
    import optax

    if _heavy_isolated("test_grad_accumulation_matches_full_batch"):
        return
    cfg = _cfg()
    params = dynamic.init_llava_params(jax.random.key(3), cfg)
    optimizer = make_optimizer(base_lr=1e-3, predictor_lr=1e-3)
    plan, imgs = _batch(cfg, batch_size=4)
    batch = batch_from_plan(plan, imgs)
    rng = jax.random.key(9)
    tau = jnp.float32(1.0)

    from dynamic_llava_tpu.train.step import TrainBatch, loss_fn

    # manual reference: average grads of the two halves with split rngs
    rngs = jax.random.split(rng, 2)

    def half(i):
        mb = TrainBatch(*[
            None if f is None else f[i * 2 : (i + 1) * 2] for f in batch
        ])
        return jax.grad(lambda p: loss_fn(p, cfg, mb, rngs[i], tau, False)[0])(params)

    g0, g1 = half(0), half(1)
    ref_grads = jax.tree.map(lambda a, b: (a + b) / 2.0, g0, g1)
    updates, _ = optimizer.update(ref_grads, optimizer.init(params), params)
    ref_params = optax.apply_updates(params, updates)

    step = make_train_step(cfg, optimizer, remat=False, grad_accum_steps=2)
    got_params, _, metrics = step(
        jax.tree.map(jnp.copy, params), optimizer.init(params), batch, rng, tau
    )
    np.testing.assert_allclose(
        np.asarray(got_params["llm"]["layers"]["q"]),
        np.asarray(ref_params["llm"]["layers"]["q"]),
        atol=1e-5, rtol=1e-4,
    )
    assert np.isfinite(float(metrics["loss"]))


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_orbax_sharded_checkpoint_roundtrip(tmp_path):
    """Save sharded params with orbax, restore onto the same mesh, compare.
    (The trainer's save/resume path at multi-chip scale.)"""
    import orbax.checkpoint as ocp

    cfg = _cfg()
    params = dynamic.init_llava_params(jax.random.key(5), cfg)
    mesh = make_mesh(data=2, fsdp=2, tensor=2)
    specs = llava_param_specs(cfg, params)
    sharded = shard_params(params, mesh, specs)

    path = str(tmp_path / "ckpt")
    mgr = ocp.CheckpointManager(path)
    mgr.save(0, args=ocp.args.Composite(params=ocp.args.StandardSave(sharded)))
    mgr.wait_until_finished()

    restored = mgr.restore(
        0, args=ocp.args.Composite(params=ocp.args.StandardRestore(sharded))
    )["params"]
    a = np.asarray(sharded["llm"]["layers"]["gate"])
    b = np.asarray(restored["llm"]["layers"]["gate"])
    np.testing.assert_array_equal(a, b)
    # restored arrays carry the mesh sharding
    assert restored["llm"]["layers"]["gate"].sharding.num_devices == 8
