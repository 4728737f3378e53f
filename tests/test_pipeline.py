"""GPipe pipeline parallelism (parallel/pipeline.py): layout correctness
plus forward/grad/train-step equivalence with the sequential path on the
virtual CPU mesh (execution on 2 devices — the 1-core box serializes
per-device collective segments; see CLAUDE.md)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dynamic_llava_tpu.config import (
    ClipVisionConfig,
    LlamaConfig,
    LlavaConfig,
    SparseConfig,
)
from dynamic_llava_tpu.models import dynamic, llama
from dynamic_llava_tpu.parallel.pipeline import (
    inverse_order,
    make_layer_runner,
    permute_stack,
    plan_pipeline,
)
from dynamic_llava_tpu.parallel.sharding import (
    llama_param_specs,
    llava_param_specs,
    make_mesh,
    shard_params,
)


def _tcfg(layers=4, sl=2):
    del sl  # the sweep split is carried by the PipePlan, not the config
    return LlamaConfig(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        num_hidden_layers=layers, num_attention_heads=4,
        num_key_value_heads=4,
    )


def test_plan_pipeline_layout():
    plan = plan_pipeline(num_layers=32, sparse_layer=2, stages=4,
                         microbatches=4)
    order = np.asarray(plan.order)
    assert sorted(order.tolist()) == list(range(32))
    per = 32 // 4
    # each stage block = its pre chunk then its post chunk, both in
    # ascending original order
    pre_seen, post_seen = [], []
    for p in range(4):
        block = order[p * per : (p + 1) * per]
        n_pre = plan.n_pre[p]
        assert all(b < 2 for b in block[:n_pre])
        assert all(b >= 2 for b in block[n_pre:])
        pre_seen += list(block[:n_pre])
        post_seen += list(block[n_pre:])
    assert pre_seen == [0, 1]
    assert post_seen == list(range(2, 32))
    assert sum(plan.n_pre) == 2
    # inverse restores original order
    inv = np.asarray(inverse_order(plan.order))
    assert (order[inv] == np.arange(32)).all()


def test_permute_stack_roundtrip():
    plan = plan_pipeline(8, 3, 2, 2)
    layers = {
        "w": jnp.arange(8 * 2, dtype=jnp.float32).reshape(8, 2),
        "lora": {"a": jnp.arange(8.0), "s": jnp.float32(0.5)},  # 0-d leaf
    }
    perm = permute_stack(layers, plan.order)
    back = permute_stack(perm, inverse_order(plan.order))
    np.testing.assert_array_equal(np.asarray(back["w"]),
                                  np.asarray(layers["w"]))
    np.testing.assert_array_equal(np.asarray(back["lora"]["a"]),
                                  np.asarray(layers["lora"]["a"]))
    assert float(perm["lora"]["s"]) == 0.5


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs 2 virtual devices")
@pytest.mark.parametrize("layers,sl", [(4, 2), (4, 1)])
def test_pipeline_sweeps_match_sequential(layers, sl):
    """Both sweeps (pre without policy, post with policy) reproduce
    run_layers_nocache — including the uneven-chunk masked path
    (layers=4, sl=1 over 2 stages: n_pre=(1, 0), so the pre sweep masks
    stage 1 entirely and the post sweep masks one slot on stage 0)."""
    cfg = _tcfg(layers=layers, sl=sl)
    plan = plan_pipeline(layers, sl, stages=2, microbatches=2)
    mesh = make_mesh(data=1, fsdp=1, tensor=1, pipe=2,
                     devices=jax.devices()[:2])
    key = jax.random.key(0)
    params = llama.init_llama_params(key, cfg)
    b, s = 4, 12
    x = jax.random.normal(jax.random.key(1), (b, s, cfg.hidden_size),
                          jnp.float32)
    positions = jnp.broadcast_to(jnp.arange(s, dtype=jnp.int32)[None],
                                 (b, s))
    policy = (jax.random.uniform(jax.random.key(2), (b, s)) > 0.3
              ).astype(jnp.float32)

    pparams = dict(params)
    pparams["layers"] = permute_stack(params["layers"], plan.order)
    specs = llama_param_specs(cfg, pipe=True)
    specs = {k: specs[k] for k in pparams}  # init may omit lm_head
    pparams = shard_params(pparams, mesh, specs)
    runner = make_layer_runner(mesh, plan)

    ref_pre = llama.run_layers_nocache(
        params, cfg, x, positions, lo=0, hi=sl, training=True)
    ref_post = llama.run_layers_nocache(
        params, cfg, ref_pre, positions, lo=sl, hi=layers, policy=policy,
        training=True)

    with jax.set_mesh(mesh):
        got_pre = jax.jit(
            lambda p, x: runner(p, cfg, x, positions, lo=0, hi=sl,
                                training=True)
        )(pparams, x)
        got_post = jax.jit(
            lambda p, x: runner(p, cfg, x, positions, lo=sl, hi=layers,
                                policy=policy, training=True)
        )(pparams, got_pre)
    np.testing.assert_allclose(np.asarray(got_pre), np.asarray(ref_pre),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got_post), np.asarray(ref_post),
                               rtol=1e-6, atol=1e-6)


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs 2 virtual devices")
def test_pipeline_grads_match_sequential():
    cfg = _tcfg(layers=4, sl=2)
    plan = plan_pipeline(4, 2, stages=2, microbatches=2)
    mesh = make_mesh(data=1, fsdp=1, tensor=1, pipe=2,
                     devices=jax.devices()[:2])
    params = llama.init_llama_params(jax.random.key(0), cfg)
    b, s = 4, 10
    x = jax.random.normal(jax.random.key(1), (b, s, cfg.hidden_size),
                          jnp.float32)
    positions = jnp.broadcast_to(jnp.arange(s, dtype=jnp.int32)[None],
                                 (b, s))

    def loss_seq(layers_tree):
        p = dict(params)
        p["layers"] = layers_tree
        y = llama.run_layers_nocache(p, cfg, x, positions, lo=2, hi=4,
                                     training=True, remat=True)
        return (y ** 2).mean()

    g_ref = jax.grad(loss_seq)(params["layers"])

    pparams = dict(params)
    pparams["layers"] = permute_stack(params["layers"], plan.order)
    specs = llama_param_specs(cfg, pipe=True)
    specs = {k: specs[k] for k in pparams}
    pparams = shard_params(pparams, mesh, specs)
    runner = make_layer_runner(mesh, plan)

    def loss_pipe(layers_tree):
        p = dict(pparams)
        p["layers"] = layers_tree
        y = runner(p, cfg, x, positions, lo=2, hi=4, training=True,
                   remat=True)
        return (y ** 2).mean()

    with jax.set_mesh(mesh):
        g_pipe = jax.jit(jax.grad(loss_pipe))(pparams["layers"])
    g_pipe = permute_stack(g_pipe, inverse_order(plan.order))
    for k in ("q", "down", "input_ln"):
        np.testing.assert_allclose(
            np.asarray(g_pipe[k]), np.asarray(g_ref[k]),
            rtol=2e-5, atol=1e-7, err_msg=k)


def _llava_cfg():
    return LlavaConfig(
        text=LlamaConfig(
            vocab_size=256, hidden_size=64, intermediate_size=128,
            num_hidden_layers=4, num_attention_heads=4,
            num_key_value_heads=4,
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


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs 2 virtual devices")
def test_pipeline_train_step_matches_sequential():
    """Full dynamic train step (Gumbel policies, predictors, fused CE,
    optimizer update) with the pipeline layer runner == the plain step."""
    from dynamic_llava_tpu.multimodal.fusion import plan_batch
    from dynamic_llava_tpu.train.optimizer import make_optimizer
    from dynamic_llava_tpu.train.step import (
        batch_from_plan,
        make_train_step,
        shard_batch,
    )

    cfg = _llava_cfg()
    params = dynamic.init_llava_params(jax.random.key(0), cfg)
    optimizer = make_optimizer(base_lr=1e-3, predictor_lr=1e-3)

    rng_np = np.random.default_rng(0)
    ids, labels = [], []
    for _ in range(4):
        row = rng_np.integers(3, cfg.text.vocab_size, size=(20,)).astype(
            np.int64)
        row[1] = -200
        lab = row.copy()
        lab[:14] = -100
        ids.append(row)
        labels.append(lab)
    plan = plan_batch(ids, cfg.num_image_tokens, labels_list=labels)
    imgs = rng_np.normal(
        size=(4, cfg.vision.image_size, cfg.vision.image_size, 3)
    ).astype(np.float32)
    batch = batch_from_plan(plan, imgs)
    rng = jax.random.key(7)
    tau = jnp.float32(1.0)

    step1 = make_train_step(cfg, optimizer, remat=False)
    p1, _, m1 = step1(
        jax.tree.map(jnp.copy, params), optimizer.init(params), batch, rng,
        tau)

    pplan = plan_pipeline(cfg.text.num_hidden_layers,
                          cfg.sparse.sparse_layer, stages=2, microbatches=2)
    mesh = make_mesh(data=1, fsdp=1, tensor=1, pipe=2,
                     devices=jax.devices()[:2])
    pparams = jax.tree.map(jnp.copy, params)
    pparams["llm"] = dict(pparams["llm"])
    pparams["llm"]["layers"] = permute_stack(
        pparams["llm"]["layers"], pplan.order)
    specs = llava_param_specs(cfg, pparams, pipe=True)
    sharded = shard_params(pparams, mesh, specs)
    runner = make_layer_runner(mesh, pplan)
    stepN = make_train_step(cfg, optimizer, mesh=mesh, param_specs=specs,
                            remat=False, layer_runner=runner)
    with mesh:
        pN, _, mN = stepN(
            sharded, optimizer.init(sharded), shard_batch(batch, mesh),
            rng, tau)

    np.testing.assert_allclose(float(m1["loss"]), float(mN["loss"]),
                               rtol=2e-4, atol=2e-5)
    got_q = permute_stack(
        pN["llm"]["layers"], inverse_order(pplan.order))["q"]
    np.testing.assert_allclose(
        np.asarray(got_q), np.asarray(p1["llm"]["layers"]["q"]),
        rtol=2e-3, atol=2e-5)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_trainer_pipeline_mode(tmp_path):
    """Trainer with pipeline_parallel=2 (mesh 1x4x1x2): steps run with a
    finite loss, save/resume keeps the permuted tree, and
    unpermuted_params restores original layer order for export."""
    from dynamic_llava_tpu.multimodal.fusion import plan_batch
    from dynamic_llava_tpu.train.trainer import Trainer, TrainerConfig

    cfg = _llava_cfg()
    params = dynamic.init_llava_params(jax.random.key(0), cfg)
    q0 = np.asarray(params["llm"]["layers"]["q"])
    tc = TrainerConfig(
        output_dir=str(tmp_path), learning_rate=1e-3, predictor_lr=1e-3,
        num_train_steps=2, logging_steps=1, save_steps=2,
        gradient_checkpointing=False,
        data_parallel=1, fsdp_parallel=-1, tensor_parallel=1,
        pipeline_parallel=2, pipeline_microbatches=2,
    )

    rng_np = np.random.default_rng(1)
    ids, labels = [], []
    for _ in range(4):
        row = rng_np.integers(3, cfg.text.vocab_size, size=(20,)).astype(
            np.int64)
        row[1] = -200
        lab = row.copy()
        lab[:14] = -100
        ids.append(row)
        labels.append(lab)
    plan = plan_batch(ids, cfg.num_image_tokens, labels_list=labels)
    imgs = rng_np.normal(
        size=(4, cfg.vision.image_size, cfg.vision.image_size, 3)
    ).astype(np.float32)

    trainer = Trainer(cfg, params, tc)
    assert trainer.pipe_plan is not None
    metrics = trainer.train(iter([(plan, imgs)] * 2))
    assert np.isfinite(metrics["loss"])

    up = trainer.unpermuted_params()
    qk = np.asarray(up["llm"]["layers"]["q"])
    assert qk.shape == q0.shape
    # un-permutation must exactly invert the pipeline order
    requeued = permute_stack(up["llm"]["layers"], trainer.pipe_plan.order)
    np.testing.assert_array_equal(
        np.asarray(requeued["q"]),
        np.asarray(trainer.params["llm"]["layers"]["q"]))

    # resume restores the permuted tree at the saved step
    trainer2 = Trainer(
        cfg, dynamic.init_llava_params(jax.random.key(9), cfg), tc)
    assert trainer2.maybe_resume()
    assert trainer2.step == 2
    np.testing.assert_array_equal(
        np.asarray(trainer2.params["llm"]["layers"]["q"]),
        np.asarray(trainer.params["llm"]["layers"]["q"]))


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs 2 virtual devices")
def test_pipeline_bf16_grads_compile_and_match():
    """bf16 pipeline forward+grads — pinned because XLA:CPU's
    AllReducePromotion pass crashes on any bf16 all-reduce out of the
    partial-manual transpose ("Invalid binary instruction opcode copy");
    the sweep routes every unvarying value and psum through fp32 (exact
    roundtrips) to keep the program bf16-collective-free."""
    cfg = _tcfg(layers=4, sl=2)
    plan = plan_pipeline(4, 2, stages=2, microbatches=2)
    mesh = make_mesh(data=1, fsdp=1, tensor=1, pipe=2,
                     devices=jax.devices()[:2])
    params = llama.init_llama_params(jax.random.key(0), cfg, jnp.bfloat16)
    b, s = 4, 10
    x = jax.random.normal(jax.random.key(1), (b, s, cfg.hidden_size),
                          jnp.bfloat16)
    positions = jnp.broadcast_to(jnp.arange(s, dtype=jnp.int32)[None],
                                 (b, s))
    pol = (jax.random.uniform(jax.random.key(2), (b, s)) > 0.3
           ).astype(jnp.float32)

    pparams = dict(params)
    pparams["layers"] = permute_stack(params["layers"], plan.order)
    specs = llama_param_specs(cfg, pipe=True)
    specs = {k: specs[k] for k in pparams}
    pparams = shard_params(pparams, mesh, specs)
    runner = make_layer_runner(mesh, plan)

    def loss_pipe(layers_tree, xx):
        p = dict(pparams)
        p["layers"] = layers_tree
        y = runner(p, cfg, xx, positions, lo=2, hi=4, training=True,
                   remat=True, policy=pol)
        return (y.astype(jnp.float32) ** 2).mean()

    def loss_seq(layers_tree, xx):
        p = dict(params)
        p["layers"] = layers_tree
        y = llama.run_layers_nocache(p, cfg, xx, positions, lo=2, hi=4,
                                     training=True, policy=pol)
        return (y.astype(jnp.float32) ** 2).mean()

    with jax.set_mesh(mesh):
        # grads wrt x exercise the transpose all-reduce that crashed
        gp = jax.jit(jax.grad(loss_pipe, argnums=(0, 1)))(
            pparams["layers"], x)
    gs = jax.jit(jax.grad(loss_seq, argnums=(0, 1)))(params["layers"], x)
    np.testing.assert_allclose(
        np.asarray(gp[1].astype(jnp.float32)),
        np.asarray(gs[1].astype(jnp.float32)), rtol=2e-2, atol=1e-5)
    g_w = permute_stack(gp[0], inverse_order(plan.order))
    np.testing.assert_allclose(
        np.asarray(g_w["q"].astype(jnp.float32)),
        np.asarray(gs[0]["q"].astype(jnp.float32)), rtol=5e-2, atol=2e-4)
