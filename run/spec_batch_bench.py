"""Speculative decoding x batched serving: the measured composition table.

The B=1 spec arm (run/spec_bench.py, bench.py 7b_spec) shows the verify
loop is the biggest single lever in the latency regime. This harness
answers the throughput-regime question: at the flagship 7B-int8 batch
sizes (B=8, B=24 — bench.py 7b_batch / 7b_best), does verifying 1+k
candidates per row still pay? Each verify pass is ~one weight read
regardless of batch, so at weight-bound batches accepted drafts are free
throughput; at cache-bound batches the k extra KV reads per row eat the
margin — this table measures where the crossover sits on the v5e.

Arms (each a fresh bench.py child subprocess, so HBM fragmentation and
program state never leak between arms):

  * B=8  plain   vs  B=8  spec_k (whole-generation device loop,
  * B=24 plain   vs  B=24 spec_k  in-graph prompt-lookup drafts)

Same honesty caveat as every spec number in this repo: random bench
weights emit repetitive text, which flatters prompt lookup; acceptance
(tokens_per_round) is printed next to every tok/s so the ratio can be
discounted; run/spec_bench.py holds the oracle ceiling.

Run on the real TPU:   python run/spec_batch_bench.py
CPU smoke:             python run/spec_batch_bench.py --cpu --model small
"""

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_arm(args, batch: int, spec_k: int) -> dict:
    env = dict(
        os.environ,
        BENCH_ONLY="sparse",
        BENCH_MODEL=args.model,
        BENCH_BATCH=str(batch),
        BENCH_TOKENS=str(args.new),
        BENCH_TEXT=str(args.text),
    )
    env.pop("BENCH_SPEC_K", None)
    env.pop("BENCH_QUANT", None)
    env.pop("BENCH_CACHE_DTYPE", None)
    if args.quant:
        env["BENCH_QUANT"] = args.quant
    if args.cache_dtype != "bfloat16":
        env["BENCH_CACHE_DTYPE"] = args.cache_dtype
    if spec_k:
        env["BENCH_SPEC_K"] = str(spec_k)
    if args.cpu:
        env["BENCH_CPU"] = "1"
    try:
        r = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py")],
            env=env, capture_output=True, text=True, timeout=args.timeout,
        )
    except subprocess.TimeoutExpired:
        return {"error": f"timed out after {args.timeout:.0f}s"}
    for line in r.stdout.splitlines():
        if line.startswith("BENCH_RESULT "):
            return json.loads(line[len("BENCH_RESULT "):])
    return {"error": (r.stdout[-800:] + r.stderr[-800:])[-1500:]}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="7b")
    p.add_argument("--text", type=int, default=64)
    p.add_argument("--new", type=int, default=256)
    p.add_argument("--k", type=int, default=7)
    p.add_argument("--quant", default="int8")
    p.add_argument("--cache-dtype", dest="cache_dtype", default="bfloat16")
    p.add_argument("--batches", default="8,24")
    p.add_argument("--timeout", type=float, default=2400.0)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()
    if args.quant in ("", "none"):
        args.quant = None

    batches = [int(b) for b in args.batches.split(",")]
    rows = []
    for batch in batches:
        plain = run_arm(args, batch, 0)
        print(json.dumps({"batch": batch, "arm": "plain", **plain}),
              flush=True)
        spec = run_arm(args, batch, args.k)
        print(json.dumps({"batch": batch, "arm": f"spec_k{args.k}", **spec}),
              flush=True)
        row = {"batch": batch, "plain": plain, "spec": spec}
        if "decode_tok_s" in plain and "decode_tok_s" in spec:
            row["speedup"] = round(
                spec["decode_tok_s"] / plain["decode_tok_s"], 3)
        rows.append(row)

    summary = {
        "metric": f"spec_x_batch_{args.model}"
                  + (f"_{args.quant}" if args.quant else "")
                  + f"_k{args.k}",
        "new_tokens": args.new,
        "rows": [
            {
                "batch": r["batch"],
                "plain_tok_s": round(r["plain"].get("decode_tok_s", 0), 1),
                "spec_tok_s": round(r["spec"].get("decode_tok_s", 0), 1),
                "speedup": r.get("speedup"),
                "tokens_per_round": r["spec"].get("tokens_per_round"),
            }
            for r in rows
        ],
    }
    print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
