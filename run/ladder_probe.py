"""Serving-ladder capacity probe: find the best batch per (quant, KV-dtype).

The ladder (docs/BENCHMARKS.md) composes token pruning with weight and KV
quantization, each config at its largest batch that fits one chip — the
reference's capacity story (device_map fitting, dynamic_llava_builder.py:41)
measured the TPU way. Round 3 left two compositions unmeasured:

  * sparse int8 weights + scaled-int8 KV — bf16 KV is what stops the 2.59x
    flagship at B=24; int8 KV quarters the per-sample cache, so B=32..44
    may fit at near-dense quality (int8-KV logit cosine dominates fp8's,
    tests/test_kv_int8.py; PPL-neutral in run/quant_quality.py).
  * sparse int4 + fp8 KV beyond B=48 — the r3 ladder top sits at 9.6 GB
    live with ~6 GB headroom; B=64+ was never probed.

Each row = one bench side (bench.py BENCH_ONLY child subprocess, identical
protocol/measurement to the driver bench: on-device chained decode, device
TTFT, live-HBM accounting). OOMs are recorded as rows, not failures — the
fit boundary IS the result. Run on the real chip; compiles for new shapes
take minutes each over the tunnel (persisted in /tmp/jax_bench_cache).

Usage:
    python run/ladder_probe.py                 # default probe plan
    python run/ladder_probe.py --rows sparse:int8:int8:32 dense:int8:int8:16
        # row syntax  side:quant:cache_dtype:batch   (quant/cache: "-" = none)
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (repo-root bench.py: the driver protocol)

CACHE_DTYPES = {"int8": "int8", "fp8": "float8_e4m3fn", "-": None,
                "bf16": None, "float8_e4m3fn": "float8_e4m3fn"}

DEFAULT_ROWS = [
    # sparse int8 weights + int8 KV: does int8-KV fund the batch past 24?
    "sparse:int8:int8:32",
    "sparse:int8:int8:40",
    "sparse:int8:int8:44",
    # the like-quant dense side at ITS best (bf16-KV stops it at 8)
    "dense:int8:int8:16",
    "dense:int8:int8:24",
    # int4+fp8 ladder-top extension past the r3 B=48
    "sparse:int4:fp8:64",
]


def parse_row(s: str):
    side, quant, cache, batch = s.split(":")
    quant = None if quant == "-" else quant
    return dict(side=side, quant=quant, cache_dtype=CACHE_DTYPES[cache],
                batch=int(batch))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", nargs="*", default=DEFAULT_ROWS,
                    help="side:quant:cache_dtype:batch")
    ap.add_argument("--model", default="7b")
    ap.add_argument("--new-tokens", type=int, default=512)
    ap.add_argument("--text-len", type=int, default=64)
    ap.add_argument("--budget-s", type=float, default=5400.0)
    args = ap.parse_args()

    run = bench._FullRun(args.budget_s)
    results = []
    for s in args.rows:
        row = parse_row(s)
        spec = bench._side(args.model, row["batch"], args.new_tokens,
                           args.text_len, row["quant"], row["cache_dtype"])
        label = "{}:{}:{}:B{}".format(row["side"], row["quant"] or "bf16",
                                      row["cache_dtype"] or "bf16",
                                      row["batch"])
        try:
            r = run.run_side(spec, row["side"])
            rec = {"row": label,
                   "decode_tok_s": r["decode_tok_s"],
                   "ttft_ms": r.get("ttft_device_ms", r["ttft_ms"]),
                   "live_gb": r.get("live_after_decode_gb"),
                   "peak_minus_model_gb": r.get("peak_minus_model_gb")}
        except bench._BudgetExhausted as e:  # unmeasured, not a failed fit
            rec = {"row": label, "skipped": str(e)}
        except RuntimeError as e:  # OOM / timeout: the boundary is data
            rec = {"row": label, "error": str(e)[-400:]}
        results.append(rec)
        print("LADDER_ROW " + json.dumps(rec), flush=True)
    print(json.dumps({"ladder_probe": results}))


if __name__ == "__main__":
    main()
