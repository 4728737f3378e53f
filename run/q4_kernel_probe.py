"""Raw int4-GEMV kernel variant timing on the real TPU.

The streaming int4 kernel measures ~62% of its single-read HBM roofline at
7B B=1 while the int8 twin reaches ~83% (docs/BENCHMARKS.md). The suspect
is unpack VPU work: the i32 path widens every byte to 32-bit lanes before
the two shifts. This probe times the raw kernels per weight shape so the
candidate fixes can be judged in isolation before touching dispatch
defaults:

  xla   — the split-half einsum pair (reads every packed byte twice)
  i32   — production kernel, int32-domain unpack (round-3 default)
  mask  — i8-AND + bf16-arithmetic unpack (DYNAMIC_LLAVA_Q4_UNPACK=mask;
          the only narrow-lane form Mosaic legalizes on v5e)
  split — packed-column split (vocab-width lm_head at rows > 48 only)

A variant that fails to compile is recorded as ``<name>_error`` instead of
killing the probe (the original i8-shift variant died exactly that way).

Timing follows the repo lore (CLAUDE.md): warm up with a REAL host fetch
(block_until_ready returns early through the tunnel), then chain N
dependent calls inside one jit and fetch ONE scalar. Per-call time is the
SLOPE between a short and a long chain — (t(4N) − t(N)) / 3N — which
cancels every constant offset (the ~29 ms tunnel RTT, dispatch, the final
sync). Naive chain-time/N at N=200 bakes ~145 us of RTT into every call,
the same order as the kernels themselves — the first version of this
probe did exactly that and its "rooflines" were fiction.

  python run/q4_kernel_probe.py            # 7B shapes, rows 1 and 24
  python run/q4_kernel_probe.py --rows 64  # includes the lm_head split
"""

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

# (name, K, N) — the 7B decode matmul menu; 13B via --model 13b
SHAPES_7B = [
    ("qkv_o", 4096, 4096),
    ("gate_up", 4096, 11008),
    ("down", 11008, 4096),
    ("lm_head", 4096, 32000),
]
SHAPES_13B = [
    ("qkv_o", 5120, 5120),
    ("gate_up", 5120, 13824),
    ("down", 13824, 5120),
    ("lm_head", 5120, 32000),
]


def _chain(fn, n_iters):
    """jit(fori_loop) of n dependent fn(x, p, s) calls -> one scalar.
    Weights ride as explicit jit args (closure constants bake the packed
    buffer into the HLO — the repo-wide rule, CLAUDE.md)."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(x, p, s):
        def body(_, carry):
            xc, acc = carry
            y = fn(xc, p, s)
            acc = acc + y.astype(jnp.float32).sum()
            # data dependency without numeric drift: the add is ~0 in bf16
            # but involves the dynamic acc, so XLA cannot fold or reorder it
            xc = xc + (acc * 1e-38).astype(xc.dtype)
            return xc, acc

        _, acc = jax.lax.fori_loop(
            0, n_iters, body, (x, jnp.float32(0.0))
        )
        return acc

    return run


def run_groups(args, hbm_gbps):
    """Grouped (one launch) vs separate (n launches) int4 GEMV for the
    decode-layer groups — the launch-overhead lever the slope probe
    exposed (~10 us fixed cost per program)."""
    import jax.numpy as jnp
    import numpy as np

    from dynamic_llava_tpu.ops.quant import quantize_weight
    from dynamic_llava_tpu.ops.quant_matmul import (
        _q4_multi_plan,
        matmul_q4_multi_pallas,
        matmul_q4_pallas,
    )

    rng = np.random.default_rng(1)
    if args.model == "13b":
        groups = [("qkv", 5120, [5120] * 3),
                  ("gate_up", 5120, [13824] * 2)]
    else:
        groups = [("qkv", 4096, [4096] * 3),
                  ("gate_up", 4096, [11008] * 2)]
    if args.interpret:
        groups = [("tiny_pair", 256, [512, 512])]

    for name, k_dim, ns in groups:
        leaves = [
            quantize_weight(
                jnp.asarray(
                    rng.normal(size=(k_dim, n)) * 0.02, jnp.bfloat16
                ),
                axis=0, bits=4,
            )
            for n in ns
        ]
        packs = tuple(l["q4"] for l in leaves)
        scales = tuple(l["s"] for l in leaves)
        floor_us = sum(k_dim * (n // 2) for n in ns) / hbm_gbps / 1e3
        for rows in args.rows:
            if _q4_multi_plan(
                k_dim, [p.shape[-1] for p in packs], rows
            ) is None:
                continue
            interp = args.interpret

            def separate(x, packs, scales):
                y = None
                for p, s in zip(packs, scales):
                    yi = matmul_q4_pallas(x, p, s, interpret=interp)
                    y = yi if y is None else y + yi[..., : y.shape[-1]]
                return y

            def grouped(x, packs, scales):
                ys = matmul_q4_multi_pallas(
                    x, packs, scales, interpret=interp
                )
                y = ys[0]
                for yi in ys[1:]:
                    y = y + yi[..., : y.shape[-1]]
                return y

            x = jnp.asarray(rng.normal(size=(rows, k_dim)), jnp.bfloat16)
            rec = {
                "shape": name, "K": k_dim, "ns": ns, "rows": rows,
                "iters": args.iters,
                "single_read_floor_us": round(floor_us, 1),
            }
            for vname, fn in (("separate", separate), ("grouped", grouped)):
                try:
                    run_n = _chain(fn, args.iters)
                    run_4n = _chain(fn, 4 * args.iters)
                    float(run_n(x, packs, scales))
                    float(run_4n(x, packs, scales))
                    us = _slope_us(
                        run_n, run_4n, (x, packs, scales), args.iters
                    )
                except Exception as e:
                    rec[vname + "_error"] = str(e).split("\n")[0][:160]
                    continue
                rec[vname + "_us"] = round(us, 1)
                rec[vname + "_roofline"] = round(floor_us / us, 3)
            print(json.dumps(rec), flush=True)


def run_mlp(args, hbm_gbps):
    """Fused SwiGLU-MLP kernel (ONE program: gate/up GEMVs, in-kernel
    silu*mul, down GEMV) vs the production two-program path (grouped
    gate/up launch + separate down launch, silu*mul as XLA glue). The
    fused form saves one ~10 us launch plus the glue program per layer
    and starts the down stream on prefetched-hot DMA windows."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from dynamic_llava_tpu.ops.quant import quantize_weight
    from dynamic_llava_tpu.ops.quant_matmul import (
        _q4_mlp_plan,
        matmul_q4_mlp_pallas,
        matmul_q4_multi_pallas,
        matmul_q4_pallas,
    )

    rng = np.random.default_rng(2)
    if args.model == "13b":
        k_dim, f_dim = 5120, 13824
    else:
        k_dim, f_dim = 4096, 11008
    if args.interpret:
        k_dim, f_dim = 256, 512

    gate = quantize_weight(
        jnp.asarray(rng.normal(size=(k_dim, f_dim)) * 0.02, jnp.bfloat16),
        axis=0, bits=4)
    up = quantize_weight(
        jnp.asarray(rng.normal(size=(k_dim, f_dim)) * 0.02, jnp.bfloat16),
        axis=0, bits=4)
    down = quantize_weight(
        jnp.asarray(rng.normal(size=(f_dim, k_dim)) * 0.02, jnp.bfloat16),
        axis=0, bits=4)
    packs = (gate["q4"], up["q4"], down["q4"])
    scales = (gate["s"], up["s"], down["s"])
    floor_us = (2 * k_dim * (f_dim // 2) + f_dim * (k_dim // 2)) \
        / hbm_gbps / 1e3
    interp = args.interpret

    def two_program(x, packs, scales):
        g, u = matmul_q4_multi_pallas(
            x, packs[:2], scales[:2], interpret=interp)
        h = jax.nn.silu(g) * u
        return matmul_q4_pallas(
            h.astype(x.dtype), packs[2], scales[2], interpret=interp)

    def fused(x, packs, scales):
        return matmul_q4_mlp_pallas(
            x, packs[0], packs[1], packs[2],
            scales[0], scales[1], scales[2], interpret=interp)

    for rows in args.rows:
        if _q4_mlp_plan(k_dim, f_dim // 2, k_dim // 2, rows) is None:
            continue
        x = jnp.asarray(rng.normal(size=(rows, k_dim)), jnp.bfloat16)
        rec = {
            "shape": "mlp", "K": k_dim, "F": f_dim, "rows": rows,
            "iters": args.iters,
            "single_read_floor_us": round(floor_us, 1),
        }
        for vname, fn in (("two_program", two_program), ("fused", fused)):
            try:
                run_n = _chain(fn, args.iters)
                run_4n = _chain(fn, 4 * args.iters)
                float(run_n(x, packs, scales))
                float(run_4n(x, packs, scales))
                us = _slope_us(run_n, run_4n, (x, packs, scales), args.iters)
            except Exception as e:
                rec[vname + "_error"] = str(e).split("\n")[0][:160]
                continue
            rec[vname + "_us"] = round(us, 1)
            rec[vname + "_roofline"] = round(floor_us / us, 3)
        print(json.dumps(rec), flush=True)


def _slope_us(run_n, run_4n, fn_args, iters: int, repeats: int = 3):
    """Median-of-``repeats`` slope between an N- and a 4N-call chain:
    per-call us with every constant offset (tunnel RTT, dispatch, final
    sync) cancelled, robust to single-shot tunnel jitter."""
    slopes = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(run_n(*fn_args))
        t1 = time.perf_counter()
        float(run_4n(*fn_args))
        t2 = time.perf_counter()
        slopes.append(((t2 - t1) - (t1 - t0)) / (3 * iters) * 1e6)
    slopes.sort()
    return slopes[len(slopes) // 2]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="7b", choices=("7b", "13b"))
    ap.add_argument("--rows", type=int, nargs="*", default=[1, 24])
    ap.add_argument("--iters", type=int, default=200)
    ap.add_argument("--skip-xla", action="store_true")
    ap.add_argument("--groups-only", action="store_true")
    ap.add_argument(
        "--mlp-only", action="store_true",
        help="time only the fused-MLP-vs-two-program comparison",
    )
    ap.add_argument(
        "--interpret", action="store_true",
        help="CPU smoke mode: tiny shapes, interpret-mode kernels",
    )
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    from dynamic_llava_tpu.ops.quant import quantize_weight
    from dynamic_llava_tpu.ops.quant_matmul import (
        matmul_q4_col_split,
        matmul_q4_pallas,
        q4_col_split_parts,
        q4_kernel_supported,
    )

    hbm_gbps = 819.0
    rng = np.random.default_rng(0)
    shapes = SHAPES_13B if args.model == "13b" else SHAPES_7B
    if args.interpret:
        jax.config.update("jax_platforms", "cpu")
        shapes = [("tiny", 256, 1024)]
        args.iters = min(args.iters, 2)
    if args.mlp_only:
        run_mlp(args, hbm_gbps)
        return
    if args.groups_only:
        run_groups(args, hbm_gbps)
        return

    for name, k_dim, n in shapes:
        w = jnp.asarray(rng.normal(size=(k_dim, n)) * 0.02, jnp.bfloat16)
        leaf = quantize_weight(w, axis=0, bits=4)
        p, s = leaf["q4"], leaf["s"]
        packed_bytes = k_dim * (n // 2)
        floor_us = packed_bytes / hbm_gbps / 1e3  # single-read, us

        def xla_split(x, p, s):
            half = p.shape[-1]
            lo = (jnp.left_shift(p, 4) >> 4).astype(x.dtype) * s[
                ..., :half
            ].astype(x.dtype)
            hi = (p >> 4).astype(x.dtype) * s[..., half:].astype(x.dtype)
            return jnp.concatenate(
                [jnp.einsum("ri,io->ro", x, lo),
                 jnp.einsum("ri,io->ro", x, hi)], axis=-1,
            )

        for rows in args.rows:
            variants = {}
            if not args.skip_xla:
                variants["xla"] = xla_split
            interp = args.interpret
            if q4_kernel_supported(p.shape, rows):
                for mode in ("i32", "mask"):
                    variants[mode] = functools.partial(
                        lambda x, p, s, m: matmul_q4_pallas(
                            x, p, s, unpack=m, interpret=interp
                        ), m=mode,
                    )
            if q4_col_split_parts(p.shape, rows):
                for mode in ("i32", "mask"):
                    variants["split_" + mode] = functools.partial(
                        lambda x, p, s, m: matmul_q4_col_split(
                            x, p, s, unpack=m, interpret=interp
                        ), m=mode,
                    )
            x = jnp.asarray(
                rng.normal(size=(rows, k_dim)), jnp.bfloat16
            )
            rec = {
                "shape": name, "K": k_dim, "N": n, "rows": rows,
                "iters": args.iters, "single_read_floor_us": round(
                    floor_us, 1
                ),
            }
            for vname, fn in variants.items():
                try:
                    run_n = _chain(fn, args.iters)
                    run_4n = _chain(fn, 4 * args.iters)
                    # compile + REAL warmup fetches (lore)
                    float(run_n(x, p, s))
                    float(run_4n(x, p, s))
                    us = _slope_us(run_n, run_4n, (x, p, s), args.iters)
                except Exception as e:
                    rec[vname + "_error"] = str(e).split("\n")[0][:160]
                    continue
                rec[vname + "_us"] = round(us, 1)
                rec[vname + "_roofline"] = round(floor_us / us, 3)
            print(json.dumps(rec), flush=True)

    run_groups(args, hbm_gbps)
    run_mlp(args, hbm_gbps)


if __name__ == "__main__":
    main()
