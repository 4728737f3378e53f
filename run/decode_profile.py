"""Decode-step breakdown on the real TPU: where do the milliseconds go?

Batched sparse decode measures ~3x off the weights+KV bandwidth roofline
at 7B-int8 B=24 (465.8 tok/s aggregate = ~51.5 ms/step vs ~16 ms floor).
This harness times VARIANT decode programs that surgically remove one
cost at a time, so the gap decomposes into attention reads, cache
update traffic, lm_head, and predictor overhead:

  full        — the production decode_step scan
  no_head     — lm_head replaced by a zero-logits stub (NOTE: this also
                makes the argmax constant, so the embed gather and
                everything downstream of the token choice constant-folds
                — it removes MORE than the head matmul)
  no_embed    — embed_tokens replaced by a zero-vector stub (isolates the
                token-dependent embedding gather)
  no_attn     — decode_attend replaced by identity (weights-only floor:
                qkv/o/mlp matmuls + cache writes still run)
  no_write    — cache K/V writes skipped (attention over stale cache)
  half_cache  — post tier allocated at half capacity (KV-read slope)
  kernel      — DYNAMIC_LLAVA_DECODE_KERNEL=1 (Pallas live-length kernel)

Timing: N chained steps, one host fetch (the tunnel's ~29 ms round-trip
floor would otherwise dominate; see run/train_step_bench.py).

  python run/decode_profile.py --model 7b --quant int8 --batch 24
"""

import argparse
import contextlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def build(args):
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
    import bench as bench_mod
    from dynamic_llava_tpu.eval.bench import build_inputs, dense_config
    from dynamic_llava_tpu.models import dynamic

    cfg = bench_mod._cfg(args.model)
    if args.dense:
        cfg = dense_config(cfg)
    if args.quant in ("int8", "int4"):
        from dynamic_llava_tpu.models.clip import init_clip_params
        from dynamic_llava_tpu.models.predictors import init_predictors
        from dynamic_llava_tpu.models.projector import init_projector_params
        from dynamic_llava_tpu.ops.quant import init_quantized_llama_params

        bits = 4 if args.quant == "int4" else 8
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
        params = dynamic.init_llava_params(jax.random.key(0), cfg, jnp.bfloat16)
    params = jax.block_until_ready(params)

    plan, imgs = build_inputs(cfg, args.batch, args.text_len)
    return cfg, params, plan, jnp.asarray(imgs, jnp.bfloat16)


@contextlib.contextmanager
def patched(module, name, repl):
    orig = getattr(module, name)
    setattr(module, name, repl)
    try:
        yield
    finally:
        setattr(module, name, orig)


def time_variant(cfg, params, plan, imgs, args, variant):
    import numpy as np

    import jax
    import jax.numpy as jnp

    from dynamic_llava_tpu.models import dynamic, llama
    from dynamic_llava_tpu.ops import attention as attn_mod
    from dynamic_llava_tpu.ops import kv_cache as kv_mod

    half = variant == "half_cache"
    cache = dynamic.make_gen_cache(
        cfg, plan.batch, plan.seq_len,
        args.new_tokens // (2 if half else 1), jnp.bfloat16,
        all_have_image=True,
    )
    pf_args = (
        jnp.asarray(plan.token_ids), jnp.asarray(plan.is_image),
        jnp.asarray(plan.image_slot), jnp.asarray(plan.valid_len),
        jnp.asarray(plan.spans.image_start),
        jnp.asarray(plan.spans.last_instruct_start),
        jnp.asarray(plan.spans.last_instruct_end),
        jnp.asarray(plan.spans.has_image),
    )

    ctx = contextlib.nullcontext()
    env_unset = None
    if variant == "no_head":
        b = plan.batch
        v = cfg.text.vocab_size

        def stub_head(p, tcfg, x):
            lead = x.shape[:-1]
            return jnp.zeros(lead + (v,), jnp.float32) + x[..., :1]

        ctx = patched(llama, "lm_head", stub_head)
    elif variant == "no_embed":
        d = cfg.text.hidden_size

        def stub_embed(p, ids):
            return jnp.zeros(ids.shape + (d,), jnp.bfloat16) + (
                ids[..., None].astype(jnp.bfloat16) * 1e-6
            )

        # dynamic.py calls llama.embed_tokens through the module attribute,
        # so one patch covers every call site
        ctx = patched(llama, "embed_tokens", stub_embed)
    elif variant == "no_attn":
        # llama.py imports decode_attend_appended directly (the decode scan
        # no longer calls attn_mod.decode_attend); patch ITS binding with a
        # signature-compatible stub or the variant silently measures the
        # full step
        ctx = patched(
            llama, "decode_attend_appended",
            lambda q, kc, vc, kn, vn, length, scale=None, window=None,
            q_pos=None: q,
        )
    elif variant == "no_write":
        # llama.py imports the symbol directly; patch ITS binding
        ctx = patched(
            llama, "write_token_layers",
            lambda k, v, kn, vn, ln: (k, v),
        )
    elif variant == "kernel":
        os.environ["DYNAMIC_LLAVA_DECODE_KERNEL"] = "1"
        env_unset = "DYNAMIC_LLAVA_DECODE_KERNEL"

    with ctx:
        # fresh jits: the patches must be baked into new traces
        prefill_jit = jax.jit(
            lambda p, c, *a: dynamic.prefill(p, cfg, *a, c,
                                             all_have_image=True)[0],
            donate_argnums=(1,),
        )

        def chain(p, state, n):
            def body(state, _):
                tok = jnp.argmax(state.last_logits, axis=-1)
                return dynamic.decode_step(p, cfg, tok, state), None

            state, _ = jax.lax.scan(body, state, None, length=n)
            return state

        chain_jit = jax.jit(chain, static_argnums=(2,), donate_argnums=(1,))
        state = jax.block_until_ready(
            prefill_jit(params, cache, *pf_args, imgs)
        )
        state = chain_jit(params, state, args.steps)
        # a real host FETCH, not block_until_ready: through the axon tunnel
        # the latter returns before remote execution (and the first
        # variant's compile) finishes, so the timed run below would overlap
        # leftover warmup work — the first variant of every process
        # measured garbage until this drain (observed: 11163 ms, 667 ms,
        # 1258 ms firsts across three profile runs)
        _ = float(state.last_logits[0, 0])
        t0 = time.perf_counter()
        state = chain_jit(params, state, args.steps)
        _ = float(state.last_logits[0, 0])
        dt = time.perf_counter() - t0
    if env_unset:
        os.environ.pop(env_unset, None)
    ms = 1e3 * dt / args.steps
    return {
        "step_ms": round(ms, 3),
        "agg_tok_s": round(plan.batch / (ms / 1e3), 1),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="7b")
    ap.add_argument("--quant", default="int8")
    ap.add_argument("--dense", action="store_true")
    ap.add_argument("--batch", type=int, default=24)
    ap.add_argument("--text-len", type=int, default=64)
    ap.add_argument("--new-tokens", type=int, default=512)
    ap.add_argument("--steps", type=int, default=64)
    ap.add_argument("--variants", default="full,no_head,no_attn,no_write,half_cache,kernel")
    args = ap.parse_args()

    cfg, params, plan, imgs = build(args)
    out = {}
    for v in args.variants.split(","):
        try:
            out[v] = time_variant(cfg, params, plan, imgs, args, v)
        except Exception as e:  # noqa: BLE001
            out[v] = {"error": str(e)[-300:]}
        print(json.dumps({v: out[v]}), flush=True)
    print(json.dumps({"summary": out}))


if __name__ == "__main__":
    main()
