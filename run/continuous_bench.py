"""Continuous batching vs window batching under staggered arrivals.

The serving claim behind `sglang_worker --continuous`
(generation/continuous.py): when requests ARRIVE OVER TIME, a
batch-to-completion worker strands capacity (late arrivals wait for the
whole running batch; early finishers leave dead slots), while the slot
engine admits each request at the next chunk boundary. This harness
measures both on the same weights and the same arrival trace:

* ``continuous`` — ContinuousEngine with S slots; a feeder thread
  submits request i at its arrival time; the engine loop just steps.
* ``window`` — the sglang_worker default strategy, simulated exactly:
  collect whatever has arrived, run ONE padded batched generate to
  completion (same Generator fast path the worker uses), repeat.

Reported per arm: makespan, aggregate tok/s, and mean/p95 request
completion latency (arrival -> last token). Token outputs are asserted
identical between arms (both greedy on the same weights).

Run on the real TPU:   python run/continuous_bench.py
CPU smoke:             python run/continuous_bench.py --cpu --model small
"""

import argparse
import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="1b")
    p.add_argument("--requests", type=int, default=16)
    p.add_argument("--slots", type=int, default=8)
    p.add_argument("--text", type=int, default=64)
    p.add_argument("--new", type=int, default=128)
    p.add_argument("--arrival-ms", type=float, default=300.0,
                   help="inter-arrival gap")
    p.add_argument("--chunk", type=int, default=16)
    p.add_argument("--quant", default=None, choices=(None, "int8", "int4"),
                   help="weight quantization (the 7B flagship regime is "
                        "int8 — bench.py 7b_best)")
    p.add_argument("--cache-dtype", dest="cache_dtype", default="bfloat16",
                   help="KV cache dtype; float8_e4m3fn halves KV footprint "
                        "(24 bf16-KV 7B slots do not fit 16 GB)")
    p.add_argument("--spec-k", dest="spec_k", type=int, default=0,
                   help="speculative drafts per chunk round in the "
                        "continuous engine (spec x batching; greedy-only)")
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    import numpy as np

    from bench import _cfg, build_bench_params
    from dynamic_llava_tpu.generation.continuous import ContinuousEngine
    from dynamic_llava_tpu.generation.generate import (
        GenerationConfig,
        Generator,
    )

    cfg = _cfg(args.model)
    params = build_bench_params(cfg, quant=args.quant)
    rng = np.random.default_rng(0)
    prompts = [
        rng.integers(3, cfg.text.vocab_size, size=(args.text,)).astype(
            np.int64)
        for _ in range(args.requests)
    ]
    # bimodal generation lengths (short = new/4, long = new): early
    # finishers strand their slot for the rest of a window round — the
    # core inefficiency continuous batching removes. Two lengths keep the
    # window arm at two compiled programs (a mixed batch runs to the max
    # of its members, exactly like a production window worker).
    max_news = [args.new if i % 2 else max(args.new // 4, args.chunk)
                for i in range(args.requests)]
    arrivals = [i * args.arrival_ms / 1e3 for i in range(args.requests)]
    bucket = -(-args.text // 16) * 16

    gc = GenerationConfig(
        max_new_tokens=args.new, decode_chunk=args.chunk, pad_multiple=16,
        cache_dtype=args.cache_dtype,
    )

    # ---- continuous arm ----------------------------------------------------
    # prewarm the SAME engine the trace is timed on: the admission-k
    # ladder compiles every program, and the representative saturated
    # pass flushes the ~4.2 s device-side first-execution stalls that
    # otherwise land on the first real trace (see ContinuousEngine.prewarm)
    print("compiling engine programs (prewarm)...", flush=True)
    eng = ContinuousEngine(params, cfg, gc, slots=args.slots,
                           prompt_bucket=bucket, max_new_cap=args.new,
                           with_images=False, spec_k=args.spec_k)
    eng.prewarm(prompts[0])
    finish: dict = {}
    t0 = time.perf_counter()

    def feeder():
        for i, (prompt, mn, at) in enumerate(
                zip(prompts, max_news, arrivals)):
            now = time.perf_counter() - t0
            if at > now:
                time.sleep(at - now)
            rid = eng.submit(prompt, max_new_tokens=mn)
            finish[rid] = [i, None]

    th = threading.Thread(target=feeder)
    th.start()
    while th.is_alive() or eng._queue or any(
            r is not None for r in eng._slot_req):
        fresh = eng.step()
        now = time.perf_counter() - t0
        for rid in list(fresh):
            if eng.requests[rid].done and rid in finish:
                finish[rid][1] = now
        if not fresh:
            time.sleep(0.005)
    th.join()
    cont_makespan = time.perf_counter() - t0
    cont_out = {finish[rid][0]: eng.requests[rid].output
                for rid in finish}
    cont_lat = [finish[rid][1] - arrivals[finish[rid][0]] for rid in finish]
    total_toks = sum(len(v) for v in cont_out.values())

    # ---- window arm ----------------------------------------------------------
    gens = {}
    for mn in sorted(set(max_news)):
        gens[mn] = Generator(params, cfg, GenerationConfig(
            max_new_tokens=mn, decode_chunk=args.chunk, pad_multiple=16,
            cache_dtype=args.cache_dtype))

    print("compiling window programs (warm runs)...", flush=True)
    for mn, g in gens.items():
        g.generate([prompts[0]] * args.slots, pad_to=bucket)

    win_out = {}
    win_lat = []
    t0 = time.perf_counter()
    i = 0
    while i < args.requests:
        now = time.perf_counter() - t0
        # collect everything that has arrived (window batcher semantics);
        # pad the batch to the slot count so a fixed program set serves
        # every round (production window workers pad to max_batch); a
        # mixed batch decodes to the max of its members and truncates
        batch = [j for j in range(i, args.requests)
                 if arrivals[j] <= now][: args.slots]
        if not batch:
            time.sleep(max(arrivals[i] - now, 0.001))
            continue
        i = batch[-1] + 1
        mn = max(max_news[j] for j in batch)
        padded = [prompts[j] for j in batch]
        padded += [prompts[batch[-1]]] * (args.slots - len(batch))
        outs = gens[mn].generate(padded, pad_to=bucket)
        done_at = time.perf_counter() - t0
        for j, out in zip(batch, outs):
            win_out[j] = out[: max_news[j]]
            win_lat.append(done_at - arrivals[j])
    win_makespan = time.perf_counter() - t0

    # both arms are greedy on identical weights -> identical tokens
    mismatch = sum(
        1 for j in range(args.requests) if cont_out[j] != win_out[j]
    )

    def stats(lat):
        return {
            "mean_s": round(float(np.mean(lat)), 3),
            "p95_s": round(float(np.quantile(lat, 0.95)), 3),
        }

    tag = f"continuous_vs_window_{args.model}"
    if args.quant:
        tag += f"_{args.quant}"
    if args.cache_dtype != "bfloat16":
        tag += "_fp8kv" if "float8" in args.cache_dtype else f"_{args.cache_dtype}"
    if args.spec_k:
        tag += f"_speck{args.spec_k}"
    rec = {
        "metric": f"{tag}_r{args.requests}_s{args.slots}",
        "requests": args.requests,
        "slots": args.slots,
        "arrival_ms": args.arrival_ms,
        "total_tokens": total_toks,
        "continuous": {
            "makespan_s": round(cont_makespan, 3),
            "agg_tok_s": round(total_toks / cont_makespan, 1),
            "latency": stats(cont_lat),
        },
        "window": {
            "makespan_s": round(win_makespan, 3),
            "agg_tok_s": round(total_toks / win_makespan, 1),
            "latency": stats(win_lat),
        },
        "speedup_makespan": round(win_makespan / cont_makespan, 3),
        "latency_mean_ratio": round(
            float(np.mean(win_lat)) / float(np.mean(cont_lat)), 3),
        "token_mismatches": mismatch,
    }
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
