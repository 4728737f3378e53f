"""Speculative-decode bench: B=1 latency regime, plain vs verify rounds.

The flagship B=1 arm is weight-bandwidth-bound — each decode step reads
every weight once, so verifying k draft tokens in one fused pass
(models/dynamic.decode_speculative_step) costs ~one step and every
accepted draft is a step saved. Arms:

  * plain        — the chunked greedy loop (bench.py's fast path).
  * spec_oracle  — oracle draft (feeds the true continuation): every
                   candidate accepted = the MECHANICAL CEILING of the
                   verify machinery at this k. Random bench weights give
                   prompt-lookup nothing to match, so the ceiling is the
                   honest measurable number in this environment; real
                   acceptance is a property of real checkpoints/content.
  * spec_lookup  — prompt-lookup draft on the same random weights
                   (expected ~1 token/round here; reported for honesty).
  * spec_lookup_device — the whole-generation device program (in-graph
                   prompt-lookup + lax.while_loop verify rounds): ONE host
                   fetch per generation, so the tunnel RTT disappears from
                   the loop entirely.

Per-round host sync: the draft source is host-side, so each round pays
the tunnel RTT (~29 ms); reported raw AND rtt-adjusted (device-side),
the number a locally-attached chip would see.

  python run/spec_bench.py --model 7b --quant int8 --new 256 --k 7
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

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    import jax.numpy as jnp
    import numpy as np

    from bench import _cfg, build_bench_params
    from dynamic_llava_tpu.eval.bench import build_inputs
    from dynamic_llava_tpu.generation.generate import (
        GenerationConfig,
        Generator,
    )

    cfg = _cfg(args.model)
    params = build_bench_params(cfg, args.quant or None)
    # the Generator takes sentinel-form ids (pre-plan, -200 image slot);
    # build_inputs is used only for its matching pixel tensor
    _, imgs = build_inputs(cfg, 1, args.text)
    rng = np.random.default_rng(0)
    raw = rng.integers(3, cfg.text.vocab_size, size=(args.text,)).astype(
        np.int64
    )
    raw[min(8, args.text - 2)] = -200
    ids = [raw]
    imgs = jnp.asarray(imgs, jnp.bfloat16)

    eos = cfg.text.vocab_size + 7  # unreachable: fixed-length horizon
    gen = Generator(params, cfg, GenerationConfig(
        max_new_tokens=args.new, decode_chunk=32, eos_token_id=eos,
    ))

    def rtt_floor():
        noop = jax.jit(lambda x: x + 1.0)
        z = jnp.zeros(())
        _ = float(noop(z))
        s = []
        for _i in range(10):
            t0 = time.perf_counter()
            _ = float(noop(z))
            s.append(time.perf_counter() - t0)
        return float(np.median(s))

    if args.arm == "plain":
        out = gen.generate(ids, imgs)  # warm (compile both programs)
        t0 = time.perf_counter()
        out = gen.generate(ids, imgs)
        dt = time.perf_counter() - t0
        return {
            "arm": "plain", "decode_tok_s": round(len(out[0]) / dt, 2),
            "tokens": len(out[0]), "wall_s": round(dt, 3),
            "rtt_floor_ms": round(rtt_floor() * 1e3, 2),
        }

    # speculative arms need the true chain for the oracle (and a fair
    # same-weights reference); produce it once with the plain path
    ref = gen.generate(ids, imgs)[0]
    # the host loop's draft context is the PLANNED prompt (image tokens
    # expanded) + emitted; rebuild the same plan for position-faithful
    # oracle lookup
    from dynamic_llava_tpu.multimodal.fusion import plan_batch

    plan = plan_batch(
        ids, cfg.num_image_tokens, max_length=cfg.model_max_length,
        pad_multiple=gen.gen_cfg.pad_multiple,
    )
    full = [
        int(t) for t in np.asarray(plan.token_ids[0][: plan.valid_len[0]])
    ] + ref

    def oracle(ctx, n):
        pos = len(ctx)
        return full[pos: pos + n]

    if args.arm == "spec_lookup_device":
        def run_once(st):
            return gen.generate_speculative_device(
                ids, imgs, draft_k=args.k, stats=st
            )
    else:
        draft = oracle if args.arm == "spec_oracle" else "prompt_lookup"

        def run_once(st):
            return gen.generate_speculative(
                ids, imgs, draft=draft, draft_k=args.k, stats=st
            )

    stats = {}
    out = run_once(stats)  # warm
    assert out[0] == ref, "speculative output diverged from greedy"
    stats = {}
    t0 = time.perf_counter()
    out = run_once(stats)
    dt = time.perf_counter() - t0
    rtt = rtt_floor()
    # the device loop runs ALL rounds in-graph with ONE host fetch; the
    # host loop pays one round-trip per verify round
    n_syncs = 1 if args.arm == "spec_lookup_device" else stats["rounds"]
    host_sync_s = n_syncs * rtt
    device_s = max(dt - host_sync_s, 1e-9)
    return {
        "arm": args.arm, "k": args.k,
        "decode_tok_s": round(len(out[0]) / dt, 2),
        "decode_tok_s_device": round(len(out[0]) / device_s, 2),
        "tokens": len(out[0]), "rounds": stats["rounds"],
        "tokens_per_round": stats["tokens_per_round"],
        "wall_s": round(dt, 3), "rtt_floor_ms": round(rtt * 1e3, 2),
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="7b")
    p.add_argument("--text", type=int, default=64)
    p.add_argument("--new", type=int, default=256)
    p.add_argument("--k", type=int, default=7)
    p.add_argument("--quant", default="int8")
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--timeout", type=float, default=3000.0)
    p.add_argument("--arm", choices=["plain", "spec_oracle", "spec_lookup",
                                     "spec_lookup_device"],
                   default=None)
    args = p.parse_args()
    if args.quant in ("", "none"):
        args.quant = None

    if args.arm is not None:
        print("SPEC_RESULT " + json.dumps(measure(args)), flush=True)
        return

    results = {}
    for arm in ("plain", "spec_oracle", "spec_lookup",
                "spec_lookup_device"):
        cmd = [sys.executable, os.path.abspath(__file__), "--arm", arm]
        for key in ("model", "text", "new", "k", "quant"):
            cmd += ["--" + key, str(getattr(args, key))]
        if args.cpu:
            cmd.append("--cpu")
        try:
            r = subprocess.run(cmd, capture_output=True, text=True,
                               timeout=args.timeout)
        except subprocess.TimeoutExpired:
            results[arm] = {"error": f"timed out after {args.timeout:.0f}s"}
            continue
        rec = None
        for line in r.stdout.splitlines():
            if line.startswith("SPEC_RESULT "):
                rec = json.loads(line[len("SPEC_RESULT "):])
        results[arm] = rec if rec is not None else {
            "error": (r.stdout[-800:] + r.stderr[-800:])[-1500:]
        }
        print(json.dumps({arm: results[arm]}), flush=True)

    if all("decode_tok_s" in (results[a] or {}) for a in results):
        plain = results["plain"]["decode_tok_s"]
        summary = {
            "metric": f"spec_{args.model}_b1_k{args.k}",
            "plain_tok_s": plain,
            "spec_oracle_tok_s": results["spec_oracle"]["decode_tok_s"],
            "spec_oracle_tok_s_device":
                results["spec_oracle"]["decode_tok_s_device"],
            "spec_oracle_vs_plain": round(
                results["spec_oracle"]["decode_tok_s"] / plain, 4),
            "spec_lookup_tokens_per_round":
                results["spec_lookup"]["tokens_per_round"],
            "detail": results,
        }
    else:
        summary = {"metric": "spec_incomplete", "detail": results}
    print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
