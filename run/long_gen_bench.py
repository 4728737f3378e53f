"""Long-generation bench: ring-overflow KV vs the unbounded drop contract.

The reference has no bounded-cache long-generation story — its cache grows
to model_max_length and the long-text benches just measure that growth
(/root/reference/llava/dynamic_eval/bench_test/dynamic_llava_long_text_mem.py).
This harness measures what the ring mode buys at a long horizon:

  * ``drop``  — default allocation: the decode region sized for the full
    ``--new`` budget (keep_rate-bounded when the output-text predictor is
    on). Memory grows with the horizon.
  * ``ring``  — fixed allocation: both tiers capped at ``--window`` tokens;
    past the window each new token evicts the oldest decode entry
    (models/dynamic.decode_step kv_overflow="ring").

Reported per mode: steady-state decode tok/s over the whole horizon, cache
capacities, and live/peak memory — the ring should match or beat drop on
tok/s at long horizons (smaller cache = less attention read traffic) while
holding allocation flat.

Each mode runs in its own subprocess (7B leaves <2.3 GB HBM headroom; the
allocator must start clean — same protocol as bench.py). Usage:

  python run/long_gen_bench.py --model 7b --batch 8 --quant int8 \
      --text 64 --new 2048 --window 256
"""

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def measure(args) -> dict:
    import jax

    if args.cpu:  # smoke mode (the sitecustomize ignores JAX_PLATFORMS=cpu)
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    import jax.numpy as jnp
    import numpy as np

    from bench import _cfg, build_bench_params
    from dynamic_llava_tpu.eval.bench import build_inputs, dense_config
    from dynamic_llava_tpu.models import dynamic
    from dynamic_llava_tpu.profiling import GB, live_device_bytes, memory_report

    ring = args.mode == "ring"
    cfg = _cfg(args.model)
    if args.dense:
        cfg = dense_config(cfg)
    params = build_bench_params(cfg, args.quant or None)
    cache_dtype = jnp.dtype(args.cache_dtype)

    plan, imgs = build_inputs(cfg, args.batch, args.text)
    imgs = jnp.asarray(imgs, jnp.bfloat16)
    cache = dynamic.make_gen_cache(
        cfg, plan.batch, plan.seq_len, args.new, cache_dtype,
        all_have_image=True,
        decode_window=args.window if ring else None, ring=ring,
    )
    plan_args = (
        jnp.asarray(plan.token_ids), jnp.asarray(plan.is_image),
        jnp.asarray(plan.image_slot), jnp.asarray(plan.valid_len),
        jnp.asarray(plan.spans.image_start),
        jnp.asarray(plan.spans.last_instruct_start),
        jnp.asarray(plan.spans.last_instruct_end),
        jnp.asarray(plan.spans.has_image),
    )

    def prefill_fn(params, cache, *a):
        state, _ = dynamic.prefill(
            params, cfg, *a, cache, all_have_image=True, ring_mode=ring
        )
        return state

    kv_overflow = "ring" if ring else "drop"

    def decode_many(params, state):
        def body(state, _):
            tok = jnp.argmax(state.last_logits, axis=-1)
            state = dynamic.decode_step(params, cfg, tok, state,
                                        kv_overflow=kv_overflow)
            return state, tok

        state, _ = jax.lax.scan(body, state, None, length=args.new)
        return state

    prefill_jit = jax.jit(prefill_fn, donate_argnums=(1,)).lower(
        params, cache, *plan_args, imgs
    ).compile()
    state = jax.block_until_ready(prefill_jit(params, cache, *plan_args, imgs))
    live_after_prefill = live_device_bytes()
    decode_jit = jax.jit(decode_many, donate_argnums=(1,)).lower(
        params, state
    ).compile()

    # warm run + REAL host fetch (block_until_ready can return before remote
    # execution finishes through the tunnel — CLAUDE.md profiling lore)
    state = decode_jit(params, state)
    _ = float(state.last_logits[0, 0])
    live_after_decode = live_device_bytes()
    post_len = float(np.mean(np.asarray(state.cache.post.length)))

    state = jax.block_until_ready(
        prefill_jit(params, state.cache, *plan_args, imgs)
    )
    t0 = time.perf_counter()
    state = decode_jit(params, state)
    _ = float(state.last_logits[0, 0])
    dt = time.perf_counter() - t0

    mem = memory_report(  # values already GB-denominated (profiling.py)
        model_params=params,
        compiled_programs={"prefill": prefill_jit, "decode": decode_jit},
    )
    return {
        "mode": args.mode,
        "decode_tok_s": round(args.batch * args.new / dt, 2),
        "horizon_s": round(dt, 2),
        "pre_cache_capacity": int(state.cache.pre.max_len),
        "post_cache_capacity": int(state.cache.post.max_len),
        "post_len_after_decode": post_len,
        "live_after_prefill_gb": round(live_after_prefill / GB, 4),
        "live_after_decode_gb": round(live_after_decode / GB, 4),
        **mem,
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="7b")
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--text", type=int, default=64)
    p.add_argument("--new", type=int, default=2048)
    p.add_argument("--window", type=int, default=256)
    p.add_argument("--quant", default="int8")
    p.add_argument("--cache-dtype", default="bfloat16")
    p.add_argument("--dense", action="store_true",
                   help="predictors off (dense baseline)")
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (smoke runs)")
    p.add_argument("--mode", choices=["drop", "ring"], default=None,
                   help="(child) measure one mode in this process")
    p.add_argument("--timeout", type=float, default=3000.0)
    args = p.parse_args()
    if args.quant in ("", "none"):
        args.quant = None

    if args.mode is not None:
        print("LONGGEN_RESULT " + json.dumps(measure(args)), flush=True)
        return

    results = {}
    for mode in ("ring", "drop"):
        cmd = [sys.executable, os.path.abspath(__file__), "--mode", mode]
        for k in ("model", "batch", "text", "new", "window", "quant",
                  "cache_dtype"):
            cmd += ["--" + k.replace("_", "-"), str(getattr(args, k))]
        if args.dense:
            cmd.append("--dense")
        if args.cpu:
            cmd.append("--cpu")
        try:
            r = subprocess.run(cmd, capture_output=True, text=True,
                               timeout=args.timeout)
        except subprocess.TimeoutExpired:
            results[mode] = {"error": f"timed out after {args.timeout:.0f}s"}
            continue
        rec = None
        for line in r.stdout.splitlines():
            if line.startswith("LONGGEN_RESULT "):
                rec = json.loads(line[len("LONGGEN_RESULT "):])
        if rec is None:
            results[mode] = {
                "error": (r.stdout[-800:] + r.stderr[-800:])[-1500:]
            }
        else:
            results[mode] = rec
        print(json.dumps({mode: results[mode]}), flush=True)

    if all("decode_tok_s" in results[m] for m in ("ring", "drop")):
        summary = {
            "metric": f"longgen_{args.model}_b{args.batch}_n{args.new}"
                      f"_w{args.window}",
            "ring_tok_s": results["ring"]["decode_tok_s"],
            "drop_tok_s": results["drop"]["decode_tok_s"],
            "ring_vs_drop": round(
                results["ring"]["decode_tok_s"]
                / results["drop"]["decode_tok_s"], 4
            ),
            "post_capacity_ring": results["ring"]["post_cache_capacity"],
            "post_capacity_drop": results["drop"]["post_cache_capacity"],
            "pre_capacity_ring": results["ring"]["pre_cache_capacity"],
            "pre_capacity_drop": results["drop"]["pre_cache_capacity"],
            "detail": results,
        }
    else:
        summary = {"metric": "longgen_incomplete", "detail": results}
    print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
