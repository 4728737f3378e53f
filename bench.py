"""Driver benchmark: prints ONE JSON line.

Measures sparse (vision keep 0.2 + output-text keep 0.5) vs dense decode
throughput and prefill TTFT on the same random-initialized weights, on
whatever accelerator JAX sees (real TPU under the driver).

Env knobs:
  BENCH_MODEL   = 7b | 1b | small   (default: auto — 7b on TPU, small on CPU)
  BENCH_BATCH   = int (default 1)
  BENCH_TOKENS  = decode steps to time (default 64)
  BENCH_TEXT    = prompt text length (default 64)
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


def main():
    model = os.environ.get("BENCH_MODEL", "7b")
    batch = int(os.environ.get("BENCH_BATCH", "1"))
    new_tokens = int(os.environ.get("BENCH_TOKENS", "64"))
    text_len = int(os.environ.get("BENCH_TEXT", "64"))

    cfg = _cfg(model)
    platform = "unknown"
    if os.environ.get("BENCH_ONLY"):
        # only the child processes touch the device: the axon tunnel serves
        # one client, and the parent must not hold HBM while an arm runs
        import jax
        import jax.numpy as jnp

        from dynamic_llava_tpu.eval.bench import bench_config, dense_config
        from dynamic_llava_tpu.models import dynamic

        platform = jax.devices()[0].platform
        params = dynamic.init_llava_params(jax.random.key(0), cfg, dtype=jnp.bfloat16)
        params = jax.block_until_ready(params)

    only = os.environ.get("BENCH_ONLY")
    if only:
        c = dense_config(cfg) if only == "dense" else cfg
        r = bench_config(params, c, batch=batch, text_len=text_len,
                         new_tokens=new_tokens)
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
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
