"""Sharded 7B train-step evidence on the 8-virtual-device CPU mesh.

VERDICT r1 #8: "a sharded 7B train step (real recipe: grad-accum, remat,
grouped lr) that compiles + runs one step on the CPU mesh". Two phases:

A. Compile the FULL 7B sparse train step — real recipe: grad_accum=2,
   gradient checkpointing, grouped lrs (5e-6 base / 2e-4 predictor, cosine
   +3% warmup), data=2 x fsdp=2 x tensor=2 mesh — from ShapeDtypeStructs,
   so no 7B buffers are materialized. Reports XLA's own memory analysis,
   i.e. the per-device HBM the same program would need on a v5e-8.

B. Execute one real step at 7B width (hidden 4096 / heads 32 / ffn 11008)
   with num_hidden_layers=4 (2 below + 2 above the sparse layer, so both
   cache tiers exist): the decoder is a scan over stacked layers, so the
   compiled program is the SAME program as 7B modulo the stack's leading
   dim — this validates numerics at real width on host RAM.

C. Serving: compile the FULL 7B sharded prefill (vision tower -> fusion ->
   top-k prune -> tiered cache) from shapes on the same mesh, then execute
   prefill + 2 sharded decode steps at 7B width / 2 layers and check the
   tiered cache lengths and logits. (Numeric equivalence sharded-vs-single
   is covered at small scale by tests/test_sharded_inference.py; this
   proves the real 7B dims shard cleanly over data=2 x fsdp=2 x tensor=2.)

Run:  python run/dryrun_7b_train_mesh.py          (takes several minutes
on one CPU core; phases B/C are ~2.4B params of real math)
"""

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from dynamic_llava_tpu.config import (  # noqa: E402
    ClipVisionConfig,
    LlamaConfig,
    LlavaConfig,
    SparseConfig,
)
from dynamic_llava_tpu.models import dynamic  # noqa: E402
from dynamic_llava_tpu.multimodal.fusion import plan_batch  # noqa: E402
from dynamic_llava_tpu.parallel.sharding import (  # noqa: E402
    llava_param_specs,
    make_mesh,
    shard_params,
)
from dynamic_llava_tpu.train.optimizer import (  # noqa: E402
    cosine_with_warmup,
    label_params,
    make_optimizer,
)
from dynamic_llava_tpu.train.step import (  # noqa: E402
    batch_from_plan,
    make_train_step,
    shard_batch,
)

TEXT_LEN = 96
BATCH = 4  # data=2 x 2 per shard; grad_accum=2 -> micro-batch 2
# Execution phases (B/C) use smaller shapes: XLA's CPU collectives abort if
# a rendezvous waits >40s, and on this 1-core host a 7B-width layer's
# fwd+bwd across 8 time-sliced device threads can exceed that between
# collectives at the compile-phase shape.
TEXT_LEN_EXEC = 48
BATCH_EXEC = 2


# --width 13b swaps the decoder to LLaMA-13B dimensions (hidden 5120 /
# heads 40 / ffn 13824 / 40 layers) — the stated production target for
# 13B serving is the v5e-8 mesh (docs/BENCHMARKS.md "13B on one chip").
WIDTH = "13b" if "--width" in sys.argv and "13b" in sys.argv else "7b"
FULL_LAYERS = 40 if WIDTH == "13b" else 32


def build_cfg(layers: int) -> LlavaConfig:
    base = (
        LlamaConfig.llama_13b() if WIDTH == "13b" else LlamaConfig.llama_7b()
    )
    return LlavaConfig(
        text=dataclasses.replace(base, num_hidden_layers=layers),
        vision=ClipVisionConfig(),  # CLIP-ViT-L/14-336 defaults
        sparse=SparseConfig(
            use_vision_predictor=True, use_output_text_predictor=True,
            use_instruct_predictor=False,
        ),
    )


def batch_for(cfg, batch=BATCH, text_len=TEXT_LEN):
    rng = np.random.default_rng(0)
    ids, labels = [], []
    for _ in range(batch):
        row = rng.integers(
            3, cfg.text.vocab_size, size=(text_len,)
        ).astype(np.int64)
        row[2] = -200
        lab = row.copy()
        lab[: text_len // 2] = -100
        ids.append(row)
        labels.append(lab)
    plan = plan_batch(ids, cfg.num_image_tokens, labels_list=labels)
    imgs = rng.normal(
        size=(batch, cfg.vision.image_size, cfg.vision.image_size, 3)
    ).astype(np.float32)
    return batch_from_plan(plan, imgs)


def trainer_pieces(cfg, params_or_shapes, mesh):
    num_steps = 1000
    optimizer = make_optimizer(
        base_lr=5e-6, predictor_lr=2e-4,
        lr_schedule=cosine_with_warmup(5e-6, num_steps, 0.03),
        predictor_lr_schedule=cosine_with_warmup(2e-4, num_steps, 0.03),
    )
    specs = llava_param_specs(cfg, params_or_shapes)
    labels = label_params(params_or_shapes)
    step = make_train_step(
        cfg, optimizer, mesh=mesh, param_specs=specs,
        remat=True, grad_accum_steps=2, labels=labels,
    )
    return optimizer, specs, step


def phase_a_full_7b_compile(mesh, report):
    """Full 7B compile (real sharded buffers, no execution). Materialized —
    not ShapeDtypeStructs — so the optimizer moments inherit the params'
    sharding through computation-follows-data; bare shapes would treat the
    opt state as replicated and inflate the memory analysis. Buffers are
    numpy zeros (values are irrelevant for a compile, and per-leaf
    jnp.zeros triggers one tiny XLA compile per distinct shape — measured
    943 s for the 7B tree on this 1-core host)."""
    from jax.sharding import NamedSharding

    cfg7 = build_cfg(FULL_LAYERS)
    t0 = time.time()
    shapes7 = jax.eval_shape(
        lambda k: dynamic.init_llava_params(k, cfg7, jnp.bfloat16),
        jax.random.key(0))
    optimizer, specs, step = trainer_pieces(cfg7, shapes7, mesh)

    # ONE jitted program builds the whole sharded zero tree (and one more
    # the opt state): per-leaf jnp.zeros / device_put each trigger their own
    # tiny XLA compile — measured 943 s and 2479 s respectively for the 7B
    # tree on this host.
    from jax.sharding import PartitionSpec as P

    out_sh = jax.tree.map(
        lambda spec: NamedSharding(mesh, spec), specs,
        is_leaf=lambda x: isinstance(x, P))
    zero_fn = jax.jit(
        lambda: jax.tree.map(lambda sh: jnp.zeros(sh.shape, sh.dtype),
                             shapes7),
        out_shardings=out_sh)
    with mesh:
        params7 = jax.block_until_ready(zero_fn())
    print(f"  [A] zero+sharded 7B params: {time.time()-t0:.0f}s", flush=True)
    with mesh:
        opt7 = jax.block_until_ready(jax.jit(optimizer.init)(params7))
    print(f"  [A] opt init: {time.time()-t0:.0f}s", flush=True)
    batch = shard_batch(batch_for(cfg7), mesh)
    with mesh:
        lowered = step.lower(
            params7, opt7, batch, jax.random.key(1), jnp.float32(1.0)
        )
        print(f"  [A] lowered: {time.time()-t0:.0f}s", flush=True)
        compiled = lowered.compile()
    mem = compiled.memory_analysis()
    report["compile_7b_s"] = round(time.time() - t0, 1)
    if mem is not None:
        alias = getattr(mem, "alias_size_in_bytes", 0)
        report["per_device_hbm_gb"] = round(
            (mem.argument_size_in_bytes + mem.output_size_in_bytes
             + mem.temp_size_in_bytes - alias) / 2**30, 2)
        report["temp_gb"] = round(mem.temp_size_in_bytes / 2**30, 2)
    print("phase A (7B compile):", report, flush=True)


def phase_p_pipeline(report):
    """GPipe pipeline evidence at 7B scale (--pipe):

    P1. Execute one real pipelined train step at 7B WIDTH (4 layers,
        pipe=2 over 2 devices, 2 microbatches) — real ppermute schedule,
        real grads through the transposed pipeline.
    P2. Compile the FULL 32-layer 7B pipelined step on the 8-device
        (fsdp=2 x tensor=2 x pipe=2) mesh from zero-filled sharded
        buffers and report XLA's per-device memory analysis — the
        program a v5e-8 would run with 4-axis parallelism.
    """
    from dynamic_llava_tpu.parallel.pipeline import (
        make_layer_runner,
        permute_stack,
        plan_pipeline,
    )
    from jax.sharding import NamedSharding, PartitionSpec as P

    def pieces(cfg, params_or_shapes, mesh, plan):
        optimizer = make_optimizer(
            base_lr=5e-6, predictor_lr=2e-4,
            lr_schedule=cosine_with_warmup(5e-6, 1000, 0.03),
            predictor_lr_schedule=cosine_with_warmup(2e-4, 1000, 0.03),
        )
        specs = llava_param_specs(cfg, params_or_shapes, pipe=True)
        labels = label_params(params_or_shapes)
        step = make_train_step(
            cfg, optimizer, mesh=mesh, param_specs=specs,
            remat=True, grad_accum_steps=1, labels=labels,
            layer_runner=make_layer_runner(mesh, plan),
        )
        return optimizer, specs, step

    # ---- P1: real pipelined step at 7B width ----
    t0 = time.time()
    mesh_p = make_mesh(data=1, fsdp=1, tensor=1, pipe=2,
                       devices=jax.devices()[:2])
    cfgp = build_cfg(4)
    plan_small = plan_pipeline(4, cfgp.sparse.sparse_layer, stages=2,
                               microbatches=2)
    params = dynamic.init_llava_params(jax.random.key(0), cfgp, jnp.bfloat16)
    params["llm"] = dict(params["llm"])
    params["llm"]["layers"] = permute_stack(
        params["llm"]["layers"], plan_small.order)
    optimizer, specs, step = pieces(cfgp, params, mesh_p, plan_small)
    params = shard_params(params, mesh_p, specs)
    opt_state = optimizer.init(params)
    batch = shard_batch(batch_for(cfgp, BATCH_EXEC, TEXT_LEN_EXEC), mesh_p)
    with mesh_p:
        params, opt_state, metrics = step(
            params, opt_state, batch, jax.random.key(1), jnp.float32(1.0))
        loss = float(metrics["loss"])
    assert np.isfinite(loss), loss
    report["phase_p_exec_loss"] = round(loss, 4)
    report["phase_p_exec_s"] = round(time.time() - t0, 1)
    print("phase P1 (7B-width pipelined step, pipe=2): loss", loss,
          flush=True)
    del params, opt_state

    # ---- P2: full 32-layer 7B pipelined compile on fsdp x tensor x pipe ----
    t0 = time.time()
    mesh8 = make_mesh(data=1, fsdp=2, tensor=2, pipe=2)
    cfg7 = build_cfg(FULL_LAYERS)
    plan7 = plan_pipeline(FULL_LAYERS, cfg7.sparse.sparse_layer, stages=2,
                          microbatches=2)
    shapes7 = jax.eval_shape(
        lambda k: dynamic.init_llava_params(k, cfg7, jnp.bfloat16),
        jax.random.key(0))
    optimizer, specs, step = pieces(cfg7, shapes7, mesh8, plan7)
    out_sh = jax.tree.map(
        lambda spec: NamedSharding(mesh8, spec), specs,
        is_leaf=lambda x: isinstance(x, P))
    zero_fn = jax.jit(
        lambda: jax.tree.map(lambda sh: jnp.zeros(sh.shape, sh.dtype),
                             shapes7),
        out_shardings=out_sh)
    with mesh8:
        params7 = jax.block_until_ready(zero_fn())
        opt7 = jax.block_until_ready(jax.jit(optimizer.init)(params7))
        batch = shard_batch(batch_for(cfg7, BATCH, TEXT_LEN), mesh8)
        compiled = step.lower(
            params7, opt7, batch, jax.random.key(1), jnp.float32(1.0)
        ).compile()
    mem = compiled.memory_analysis()
    report["phase_p_compile_s"] = round(time.time() - t0, 1)
    if mem is not None:
        alias = getattr(mem, "alias_size_in_bytes", 0)
        report["phase_p_per_device_hbm_gb"] = round(
            (mem.argument_size_in_bytes + mem.output_size_in_bytes
             + mem.temp_size_in_bytes - alias) / 2**30, 2)
    print("phase P2 (full 7B pipelined compile):", report, flush=True)


def main():
    if "--pipe" in sys.argv:
        report = {}
        phase_p_pipeline(report)
        print(json.dumps(report))
        return
    if "--only-full-compile" in sys.argv:
        mesh = make_mesh(data=2, fsdp=2, tensor=2)
        report = {}
        phase_a_full_7b_compile(mesh, report)
        print(json.dumps(report))
        return

    # Full 8-device mesh for the compile phase. The EXECUTING phases use a
    # 2-device (fsdp=2) mesh: XLA's CPU collectives run device programs on
    # a shared pool sized by core count (1 here), so a device parks at its
    # first allgather while every other device's pre-collective segment
    # runs sequentially — with 8 devices the replicated vision-tower
    # forward alone exceeds the hardcoded 40 s rendezvous termination
    # timeout. With 2 devices the partner is one segment away.
    mesh = make_mesh(data=2, fsdp=2, tensor=2)
    mesh_exec = make_mesh(data=1, fsdp=2, tensor=1,
                          devices=jax.devices()[:2])
    report = {}


    # ---- Phase B: real step at 7B width, 2 layers ----
    cfg2 = build_cfg(2)
    t0 = time.time()
    params = dynamic.init_llava_params(jax.random.key(0), cfg2, jnp.bfloat16)
    optimizer, specs, step = trainer_pieces(cfg2, params, mesh_exec)
    params = shard_params(params, mesh_exec, specs)
    opt_state = optimizer.init(params)
    batch = shard_batch(batch_for(cfg2, BATCH_EXEC, TEXT_LEN_EXEC),
                        mesh_exec)
    with mesh_exec:
        params, opt_state, metrics = step(
            params, opt_state, batch, jax.random.key(1), jnp.float32(1.0)
        )
        loss = float(metrics["loss"])
    assert np.isfinite(loss), loss
    report["phase_b_loss"] = round(loss, 4)
    report["phase_b_s"] = round(time.time() - t0, 1)
    print("phase B (7B-width real step): loss", loss)
    del params, opt_state

    # ---- Phase C: sharded 7B serving path ----
    from jax.sharding import NamedSharding, PartitionSpec as P

    from dynamic_llava_tpu.ops.kv_cache import init_tiered_cache

    def serve_args(cfg, params, m):
        specs = llava_param_specs(cfg, params)
        to_sh = lambda tree: jax.tree.map(  # noqa: E731
            lambda s: NamedSharding(m, s), tree,
            is_leaf=lambda x: isinstance(x, P))
        params_sh = to_sh(specs)

        def fn(params, token_ids, is_image, image_slot, valid_len,
               image_start, li_start, li_end, has_image, pixels, cache):
            state, _ = dynamic.prefill(
                params, cfg, token_ids, is_image, image_slot, valid_len,
                image_start, li_start, li_end, has_image, pixels, cache)
            toks = jnp.argmax(state.last_logits, axis=-1)
            state = dynamic.decode_step(params, cfg, toks, state)
            toks = jnp.argmax(state.last_logits, axis=-1)
            state = dynamic.decode_step(params, cfg, toks, state)
            return state.last_logits, state.cache.pre.length, \
                state.cache.post.length

        return jax.jit(fn, in_shardings=(params_sh,) + (None,) * 10), specs

    def serve_inputs(cfg, text_len=TEXT_LEN):
        rng = np.random.default_rng(1)
        ids = []
        for _ in range(2):
            row = rng.integers(
                3, cfg.text.vocab_size, size=(text_len,)).astype(np.int64)
            row[2] = -200
            ids.append(row)
        from dynamic_llava_tpu.multimodal.fusion import plan_batch

        plan = plan_batch(ids, cfg.num_image_tokens)
        imgs = rng.normal(
            size=(2, cfg.vision.image_size, cfg.vision.image_size, 3)
        ).astype(np.float32)
        cache = init_tiered_cache(
            cfg.text, cfg.sparse.sparse_layer, plan.batch,
            plan.seq_len + 8, 192, jnp.bfloat16)
        return (
            jnp.asarray(plan.token_ids), jnp.asarray(plan.is_image),
            jnp.asarray(plan.image_slot), jnp.asarray(plan.valid_len),
            jnp.asarray(plan.spans.image_start),
            jnp.asarray(plan.spans.last_instruct_start),
            jnp.asarray(plan.spans.last_instruct_end),
            jnp.asarray(plan.spans.has_image),
            jnp.asarray(imgs, jnp.bfloat16), cache,
        )

    t0 = time.time()
    cfg7 = build_cfg(FULL_LAYERS)
    shapes7 = jax.eval_shape(
        lambda k: dynamic.init_llava_params(k, cfg7, jnp.bfloat16),
        jax.random.key(0))
    serve_jit, _ = serve_args(cfg7, shapes7, mesh)
    args7 = serve_inputs(cfg7)
    arg_shapes = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), args7)
    with mesh:
        serve_jit.lower(shapes7, *arg_shapes).compile()
    report["serve_compile_7b_s"] = round(time.time() - t0, 1)
    print("phase C: full 7B sharded prefill+decode compiles", flush=True)

    t0 = time.time()
    # 4 layers here (vs 2 for the train step): the sparse tier needs layers
    # above sparse_layer to exist. Serving segments between collectives are
    # per-layer, so the depth does not trip the 40 s rendezvous limit the
    # way the train step's fused bwd segments do.
    cfg_c = build_cfg(4)
    params2 = dynamic.init_llava_params(
        jax.random.key(0), cfg_c, jnp.bfloat16)
    serve_jit2, specs2 = serve_args(cfg_c, params2, mesh_exec)
    params2 = shard_params(params2, mesh_exec, specs2)
    with mesh_exec:
        logits, pre_len, post_len = serve_jit2(
            params2, *serve_inputs(cfg_c, TEXT_LEN_EXEC))
    logits = np.asarray(logits, np.float32)
    assert np.isfinite(logits).all()
    pre_len, post_len = np.asarray(pre_len), np.asarray(post_len)
    # dense tier holds the full fused prompt + 2 decode tokens; sparse tier
    # was image-pruned at prefill
    fused = TEXT_LEN_EXEC - 1 + cfg_c.num_image_tokens
    assert (pre_len[0] == fused + 2).all(), pre_len
    assert (post_len[-1] < fused).all(), post_len
    report["phase_c_s"] = round(time.time() - t0, 1)
    report["phase_c_post_len"] = int(post_len[-1][0])
    print("phase C (7B-width sharded serve): pre", pre_len[0].tolist(),
          "post", post_len[-1].tolist(), flush=True)
    del params2

    if "--skip-full-compile" not in sys.argv:
        phase_a_full_7b_compile(mesh, report)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
