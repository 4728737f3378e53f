"""End-to-end serving-worker throughput on the real TPU.

VERDICT r1 #4's "done" criterion: the model_worker's streamed tok/s must be
within ~10% of the raw bench decode number, proving the shipped path IS the
benchmarked path. This script builds bench-style random weights, points a
ModelWorker at them (the HF-loader is stubbed — weights are random either
way), streams one generation through ModelWorker.generate_stream (tokenize
-> prefill -> chunked on-device decode -> per-chunk detokenize), and
compares against eval.bench.bench_config on the same params.

  python run/serve_bench.py                 # 1B proxy, 256 new tokens
  python run/serve_bench.py --model 7b --new-tokens 128
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def make_tokenizer(vocab_size: int):
    """A real fast tokenizer over a synthetic word-level vocab — enough for
    the worker's tokenize/detokenize work to be representative."""
    from tokenizers import Tokenizer, models, pre_tokenizers
    from transformers import PreTrainedTokenizerFast

    vocab = {"<unk>": 0, "</s>": 1}
    for i in range(2, vocab_size):
        vocab[f"t{i}"] = i
    tok = Tokenizer(models.WordLevel(vocab, unk_token="<unk>"))
    tok.pre_tokenizer = pre_tokenizers.Whitespace()
    wrapped = PreTrainedTokenizerFast(
        tokenizer_object=tok, unk_token="<unk>", eos_token="</s>",
        pad_token="<unk>",
    )
    wrapped.model_max_length = 2048
    return wrapped


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="1b", choices=["1b", "7b", "small"])
    p.add_argument("--new-tokens", dest="new_tokens", type=int, default=256)
    p.add_argument("--text-len", dest="text_len", type=int, default=64)
    args = p.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    import jax.numpy as jnp

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import bench as bench_mod

    from dynamic_llava_tpu.mm_utils import ClipImagePreprocessor
    from dynamic_llava_tpu.models import builder as builder_mod
    from dynamic_llava_tpu.models import dynamic
    from dynamic_llava_tpu.models.builder import LlavaRuntime

    cfg = bench_mod._cfg(args.model)
    params = dynamic.init_llava_params(jax.random.key(0), cfg, jnp.bfloat16)
    params = jax.block_until_ready(params)
    tokenizer = make_tokenizer(cfg.text.vocab_size)
    runtime = LlavaRuntime(params=params, cfg=cfg)

    def fake_load(model_path, model_base=None, model_name=None, **kw):
        return tokenizer, runtime, ClipImagePreprocessor(
            size=cfg.vision.image_size), cfg.model_max_length

    builder_mod.load_pretrained_model = fake_load
    import dynamic_llava_tpu.serve.model_worker as mw

    worker = mw.ModelWorker(
        controller_addr="", worker_addr="", worker_id="bench",
        no_register=True, model_path="<random-bench-weights>",
        model_base=None, model_name=f"bench-{args.model}",
    )

    prompt = " ".join(f"t{100 + i}" for i in range(args.text_len))
    req = {"prompt": prompt, "images": [], "temperature": 0.0,
           "max_new_tokens": args.new_tokens, "stop": None}

    # warm-up: compiles prefill + decode-chunk programs
    for _ in worker.generate_stream(dict(req)):
        pass

    t0 = time.time()
    chunk_times = []
    last_text = ""
    for chunk in worker.generate_stream(dict(req)):
        chunk_times.append(time.time())
        last_text = json.loads(chunk.rstrip(b"\0"))["text"]
    n_tok = len(tokenizer(last_text[len(prompt):].strip()).input_ids)
    ttft = chunk_times[0] - t0
    # steady-state decode rate: tokens after the first chunk over the time
    # between first and last chunk
    if len(chunk_times) > 1:
        tokens_per_chunk = max(1, n_tok // len(chunk_times))
        decode_tok_s = (
            (n_tok - tokens_per_chunk) / (chunk_times[-1] - chunk_times[0])
        )
    else:
        decode_tok_s = n_tok / (time.time() - t0)

    # raw fast-path number on the same params (same protocol as bench.py)
    from dynamic_llava_tpu.eval.bench import bench_config

    raw = bench_config(params, cfg, batch=1, text_len=args.text_len,
                       new_tokens=args.new_tokens)

    print(json.dumps({
        "model": args.model,
        "worker_decode_tok_s": round(decode_tok_s, 2),
        "worker_ttft_s": round(ttft, 3),
        "worker_tokens": n_tok,
        "raw_decode_tok_s": round(raw["decode_tok_s"], 2),
        "worker_vs_raw": round(decode_tok_s / raw["decode_tok_s"], 4),
    }))


if __name__ == "__main__":
    main()
