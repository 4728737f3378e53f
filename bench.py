"""Driver benchmark: prints ONE JSON line.

Measures sparse (vision keep 0.2 + output-text keep 0.5) vs dense decode
throughput and prefill TTFT on the same random-initialized weights, on
whatever accelerator JAX sees (real TPU under the driver).

Three configurations by default:
  * ``7b``       — LLaVA-1.5-7B, batch 1 (flagship latency; decode is
                   weight-bandwidth-bound on one chip, so the sparse/dense
                   ratio is small by physics — ~82% of the HBM roofline
                   either way).
  * ``serving``  — 1B proxy (~ one v5e-8 shard of the sharded 7B), batch
                   32, 512-token generations: the KV-bandwidth-dominated
                   regime the method targets.
  * ``7b_batch`` — the flagship KV-bound regime: 7B int8 weights, batch 8,
                   512-token generations. This arm is the headline
                   value/vs_baseline when it runs.

Every arm runs in its own subprocess (7B leaves <2.3 GB HBM headroom;
allocator state must not accumulate).

Env knobs:
  BENCH_MODE    = full | single   (default full)
  BENCH_MODEL   = 7b | 13b | 1b | small (single-config override)
  BENCH_BATCH / BENCH_TOKENS / BENCH_TEXT = ints
  BENCH_QUANT   = int8 | int4 (weight quantization)
  BENCH_CACHE_DTYPE = bfloat16 | float8_e4m3fn (KV storage)
"""

import dataclasses
import json
import os
import sys


def _cfg(name: str):
    from dynamic_llava_tpu.config import (
        ClipVisionConfig,
        LlamaConfig,
        LlavaConfig,
        SparseConfig,
    )

    sparse = SparseConfig(
        use_vision_predictor=True,
        vision_keep_rate=0.2,
        use_output_text_predictor=True,
        output_text_keep_rate=0.5,
        use_instruct_predictor=False,
    )
    if name == "7b":
        return LlavaConfig(text=LlamaConfig.llama_7b(), sparse=sparse)
    if name == "13b":
        return LlavaConfig(text=LlamaConfig.llama_13b(), sparse=sparse)
    if name == "1b":
        return LlavaConfig(
            text=LlamaConfig(
                vocab_size=32000, hidden_size=2048, intermediate_size=5504,
                num_hidden_layers=16, num_attention_heads=16,
                num_key_value_heads=16,
            ),
            sparse=sparse,
        )
    # small: structural model for CPU smoke runs
    return LlavaConfig(
        text=LlamaConfig(
            vocab_size=1024, hidden_size=256, intermediate_size=512,
            num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=4,
        ),
        vision=ClipVisionConfig(
            hidden_size=128, intermediate_size=256, num_hidden_layers=3,
            num_attention_heads=2, image_size=336, patch_size=14,
        ),
        sparse=dataclasses.replace(
            sparse, d_model=64, nhead=2, dim_feedforward=128, num_layers=1
        ),
    )


CONFIGS = {
    "7b": dict(model="7b", batch=1, new_tokens=64, text_len=64),
    "serving": dict(model="1b", batch=32, new_tokens=512, text_len=64),
    # flagship KV-bound regime (VERDICT r1 #2): 7B int8 weights (6.75 GB)
    # leave room for a batched dense KV on the 16 GB chip, so the sparse/
    # dense ratio reflects cache bandwidth, not weight streaming
    "7b_batch": dict(
        model="7b", batch=8, new_tokens=512, text_len=64, quant="int8"
    ),
}


def main():
    mode = os.environ.get("BENCH_MODE", "full")
    model = os.environ.get("BENCH_MODEL", "7b")
    batch = int(os.environ.get("BENCH_BATCH", "1"))
    new_tokens = int(os.environ.get("BENCH_TOKENS", "64"))
    text_len = int(os.environ.get("BENCH_TEXT", "64"))

    if not os.environ.get("BENCH_ONLY") and mode == "full":
        run_full()
        return

    cfg = _cfg(model)
    platform = "unknown"
    if os.environ.get("BENCH_ONLY"):
        # only the child processes touch the device: the axon tunnel serves
        # one client, and the parent must not hold HBM while an arm runs
        import jax

        # compiles dominate bench wall time (~5 min per program over the
        # remote-compile tunnel); cache them across arms and driver runs
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
        import jax.numpy as jnp

        from dynamic_llava_tpu.eval.bench import bench_config, dense_config
        from dynamic_llava_tpu.models import dynamic

        platform = jax.devices()[0].platform
        if os.environ.get("BENCH_QUANT") in ("int8", "int4"):
            # int8 weights are built directly (13B bf16 would not fit long
            # enough to be quantized in place)
            from dynamic_llava_tpu.models.clip import init_clip_params
            from dynamic_llava_tpu.models.predictors import init_predictors
            from dynamic_llava_tpu.models.projector import init_projector_params
            from dynamic_llava_tpu.ops.quant import init_quantized_llama_params

            bits = 4 if os.environ.get("BENCH_QUANT") == "int4" else 8
            k = jax.random.key(0)
            params = {
                "llm": init_quantized_llama_params(k, cfg.text, bits=bits),
                "vision_tower": init_clip_params(k, cfg.vision, jnp.bfloat16),
                "mm_projector": init_projector_params(
                    k, cfg.mm_projector_type, cfg.vision.hidden_size,
                    cfg.text.hidden_size, jnp.bfloat16,
                ),
            }
            preds = init_predictors(k, cfg.text, cfg.sparse, jnp.bfloat16)
            if preds:
                params["predictors"] = preds
        else:
            params = dynamic.init_llava_params(
                jax.random.key(0), cfg, dtype=jnp.bfloat16
            )
        params = jax.block_until_ready(params)

    only = os.environ.get("BENCH_ONLY")
    if only:
        c = dense_config(cfg) if only == "dense" else cfg
        # BENCH_CACHE_DTYPE=float8_e4m3fn halves KV-read bandwidth — the
        # dominant traffic of the serving regime (opt-in; quality is a
        # per-deployment call, logit cosine ~0.997 on the parity model)
        cache_dtype = jnp.dtype(
            os.environ.get("BENCH_CACHE_DTYPE", "bfloat16"))
        r = bench_config(params, c, batch=batch, text_len=text_len,
                         new_tokens=new_tokens, cache_dtype=cache_dtype)
        print("BENCH_RESULT " + json.dumps(r))
        return

    # each arm runs in its own process: at 7B the weights leave <2.3 GB of
    # HBM headroom and allocator fragmentation from one arm OOMs the next
    import subprocess
    import sys

    def run(which):
        env = dict(os.environ, BENCH_ONLY=which)
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env, capture_output=True, text=True, timeout=3400,
        )
        for line in out.stdout.splitlines():
            if line.startswith("BENCH_RESULT "):
                return json.loads(line[len("BENCH_RESULT "):])
        raise RuntimeError(
            f"bench arm {which} failed:\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}"
        )


    sparse = run("sparse")
    dense = run("dense")

    result = {
        "metric": f"decode_tok_s_sparse_{model}_b{batch}",
        "value": round(sparse["decode_tok_s"], 2),
        "unit": "tok/s",
        "vs_baseline": round(sparse["decode_tok_s"] / dense["decode_tok_s"], 4),
        "detail": {
            "sparse": sparse,
            "dense": dense,
            "ttft_speedup": round(dense["ttft_ms"] / sparse["ttft_ms"], 4),
            "ttft_device_speedup": round(
                dense.get("ttft_device_ms", dense["ttft_ms"])
                / max(sparse.get("ttft_device_ms", sparse["ttft_ms"]), 1e-9),
                4),
        },
    }
    print(json.dumps(result))


def run_full():
    import subprocess
    import sys

    def run_arm(config_name, which):
        c = CONFIGS[config_name]
        env = dict(
            os.environ, BENCH_ONLY=which, BENCH_MODE="single",
            BENCH_MODEL=c["model"], BENCH_BATCH=str(c["batch"]),
            BENCH_TOKENS=str(c["new_tokens"]), BENCH_TEXT=str(c["text_len"]),
        )
        if c.get("quant"):
            env["BENCH_QUANT"] = c["quant"]
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env, capture_output=True, text=True, timeout=3000,
        )
        for line in out.stdout.splitlines():
            if line.startswith("BENCH_RESULT "):
                return json.loads(line[len("BENCH_RESULT "):])
        raise RuntimeError(
            f"bench {config_name}/{which} failed:\n"
            f"{out.stdout[-1500:]}\n{out.stderr[-1500:]}"
        )

    detail = {}
    for name in ("serving", "7b", "7b_batch"):
        try:
            sparse = run_arm(name, "sparse")
            dense = run_arm(name, "dense")
        except Exception as e:  # an arm OOM/timeout must not sink the bench
            detail[name] = {"config": CONFIGS[name], "error": str(e)[-800:]}
            continue
        detail[name] = {
            "config": CONFIGS[name],
            "sparse": sparse,
            "dense": dense,
            "decode_speedup": round(sparse["decode_tok_s"] / dense["decode_tok_s"], 4),
            "ttft_speedup": round(dense["ttft_ms"] / sparse["ttft_ms"], 4),
            "ttft_device_speedup": round(
                dense.get("ttft_device_ms", dense["ttft_ms"])
                / max(sparse.get("ttft_device_ms", sparse["ttft_ms"]), 1e-9),
                4),
        }

    # headline: the flagship 7B batched KV-bound regime when it ran; the
    # 1B-proxy serving arm (one v5e-8 shard of the sharded 7B) otherwise
    if "decode_speedup" in detail.get("7b_batch", {}):
        head, name = detail["7b_batch"], "decode_tok_s_sparse_7b_int8_b8"
    else:
        head, name = detail["serving"], "serving_decode_tok_s_sparse_1b_proxy_b32"
    print(json.dumps({
        "metric": name,
        "value": round(head["sparse"]["decode_tok_s"], 2),
        "unit": "tok/s",
        "vs_baseline": head["decode_speedup"],
        "detail": detail,
    }))


if __name__ == "__main__":
    main()
