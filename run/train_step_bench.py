"""Training-step benchmark on the real TPU.

Measures the full sparse train step (Gumbel policy attention + mask-ratio
losses + per-layer remat + grouped optimizer) at configurable scale, and
reports ms/step, tok/s, and MFU — counting BOTH the 6ND parameter FLOPs and
the attention FLOPs (12*B*S^2*hidden*layers fwd+bwd; the per-layer factor
was missing through round 2, under-counting attention work ~16x at the
default depth), so the number is neither the 6ND undercount of round 1 nor
the attention undercount of round 2.

Sweep mode re-evaluates the flash-dispatch threshold at training shapes
now that the Pallas backward kernels are real: --sweep times the step with
DYNAMIC_LLAVA_FLASH=auto/1/0 (threshold / force-Pallas / force-XLA).

  python run/train_step_bench.py --batch 4 --text-len 1088   # fused ~1664
  python run/train_step_bench.py --batch 4 --text-len 2048 --sweep
"""

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

V5E_PEAK_BF16 = 197e12


def build(args):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from dynamic_llava_tpu.config import (
        ClipVisionConfig,
        LlamaConfig,
        LlavaConfig,
        SparseConfig,
    )
    from dynamic_llava_tpu.models import dynamic
    from dynamic_llava_tpu.multimodal.fusion import plan_batch
    from dynamic_llava_tpu.train.optimizer import label_params, make_optimizer
    from dynamic_llava_tpu.train.step import batch_from_plan, make_train_step

    cfg = LlavaConfig(
        text=LlamaConfig(
            vocab_size=32000,
            hidden_size=args.hidden,
            intermediate_size=args.ffn,
            num_hidden_layers=args.layers,
            num_attention_heads=args.heads,
            num_key_value_heads=args.heads,
        ),
        vision=ClipVisionConfig(),  # CLIP-L/14-336 -> 576 image tokens
        sparse=SparseConfig(
            use_vision_predictor=True, use_output_text_predictor=True,
            use_instruct_predictor=False,
        ),
    )
    params = dynamic.init_llava_params(jax.random.key(0), cfg, jnp.bfloat16)

    rng = np.random.default_rng(0)
    ids, labels = [], []
    for _ in range(args.batch):
        row = rng.integers(3, 32000, size=(args.text_len,)).astype(np.int64)
        row[2] = -200
        lab = row.copy()
        lab[: args.text_len // 2] = -100
        ids.append(row)
        labels.append(lab)
    plan = plan_batch(ids, cfg.num_image_tokens, labels_list=labels)
    imgs = rng.normal(size=(args.batch, 336, 336, 3)).astype(np.float32)
    batch = batch_from_plan(plan, imgs)

    optimizer = make_optimizer(
        base_lr=5e-6, predictor_lr=2e-4,
    )
    step = make_train_step(
        cfg, optimizer, remat=not args.no_remat,
        labels=label_params(params),
        remat_policy=args.remat_policy,
        grad_accum_steps=args.grad_accum,
    )
    opt_state = optimizer.init(params)
    return cfg, params, opt_state, step, batch, plan


def run_once(args):
    import jax
    import jax.numpy as jnp

    cfg, params, opt_state, step, batch, plan = build(args)
    n_params = sum(
        x.size for x in jax.tree.leaves(params["llm"])
    )
    fused = int(plan.seq_len)
    tok = args.batch * fused

    t0 = time.time()
    params, opt_state, metrics = step(
        params, opt_state, batch, jax.random.key(1), jnp.float32(1.0)
    )
    # a host fetch, not block_until_ready: through the axon tunnel the
    # latter returns before remote execution finishes
    loss = float(metrics["loss"])
    compile_s = time.time() - t0

    # chain steps with ONE final fetch: the axon tunnel's host round-trip
    # floor is ~29 ms (measured), which a per-step fetch would charge to
    # every step; dispatch is async, so N chained steps sync once
    t0 = time.time()
    for i in range(args.steps):
        params, opt_state, metrics = step(
            params, opt_state, batch, jax.random.key(2 + i), jnp.float32(1.0)
        )
    loss = float(metrics["loss"])
    ms = 1000 * (time.time() - t0) / args.steps

    # fwd+bwd FLOPs: 6ND params + attention 12*B*S^2*hidden PER LAYER
    # (QK^T and PV run in every decoder layer — PaLM appendix B formula)
    flops = (
        6.0 * n_params * tok
        + 12.0 * args.batch * fused * fused * args.hidden * args.layers
    )
    mfu = flops / (ms / 1000) / V5E_PEAK_BF16
    return {
        "decoder_params_b": round(n_params / 1e9, 3),
        "batch": args.batch,
        "fused_seq": fused,
        "compile_s": round(compile_s, 1),
        "step_ms": round(ms, 1),
        "tok_per_s": round(tok / (ms / 1000)),
        "mfu": round(mfu, 3),
        "loss": round(loss, 3),
        "flash_env": os.environ.get("DYNAMIC_LLAVA_FLASH", "auto"),
        "remat_policy": args.remat_policy,
        "remat": not args.no_remat,
        "grad_accum": args.grad_accum,
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--hidden", type=int, default=1536)
    p.add_argument("--ffn", type=int, default=4096)
    p.add_argument("--layers", type=int, default=16)
    p.add_argument("--heads", type=int, default=12)
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--text-len", type=int, default=1088)
    p.add_argument("--steps", type=int, default=5)
    p.add_argument("--grad-accum", dest="grad_accum", type=int, default=1)
    p.add_argument("--remat-policy", dest="remat_policy", default="nothing",
                   choices=["nothing", "dots", "flash", "flash_dots", "alternate"])
    p.add_argument("--no-remat", dest="no_remat", action="store_true",
                   help="disable per-layer gradient checkpointing: at 0.55B "
                        "B=4 the saved activations fit HBM, and full remat "
                        "burns an extra forward (6/8 MFU ceiling)")
    p.add_argument("--sweep", action="store_true",
                   help="time auto / force-Pallas / force-XLA dispatch")
    args = p.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    if not args.sweep:
        print(json.dumps(run_once(args)))
        return
    # sweep re-execs self so the env-var dispatch is re-read cleanly
    import subprocess

    for mode in ("auto", "1", "0"):
        env = dict(os.environ)
        env.pop("DYNAMIC_LLAVA_FLASH", None)
        if mode != "auto":
            env["DYNAMIC_LLAVA_FLASH"] = mode
        cmd = [sys.executable, os.path.abspath(__file__),
               "--hidden", str(args.hidden), "--ffn", str(args.ffn),
               "--layers", str(args.layers), "--heads", str(args.heads),
               "--batch", str(args.batch), "--text-len", str(args.text_len),
               "--steps", str(args.steps),
               "--grad-accum", str(args.grad_accum),
               "--remat-policy", args.remat_policy]
        if args.no_remat:
            cmd.append("--no-remat")
        out = subprocess.run(cmd, env=env, capture_output=True, text=True)
        line = out.stdout.strip().splitlines()[-1] if out.stdout.strip() else ""
        print(f"flash={mode}: {line or out.stderr[-300:]}")


if __name__ == "__main__":
    main()
