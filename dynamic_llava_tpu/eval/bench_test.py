"""Long-generation speed/memory probes.

Rebuild of the reference bench_test scripts:

* ``long_text_memory`` — decode memory/KV-cache growth vs output length with
  the cache (reference dynamic_llava_long_text_mem.py): per-checkpoint log of
  persisted KV lengths (both tiers), cache capacity bytes, and device memory.
* ``long_text_no_cache_timing`` — multi-round full-recompute forward timing
  (reference dynamic_llava_long_text_time_with_no_cache.py:48-413,
  ``use_cache=False`` :342): each round appends tokens and re-runs the E4
  hard-pruned forward over the whole accumulated sequence, streaming JSON
  records of per-round latency and kept length.

Both operate on random-init or loaded params — they measure machinery, not
answer quality.
"""

from __future__ import annotations

import json
import time
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import LlavaConfig
from ..models import dynamic
from ..multimodal.fusion import plan_batch
from .bench import build_inputs


def _device_mem() -> Dict[str, float]:
    try:
        s = jax.local_devices()[0].memory_stats() or {}
        return {
            "bytes_in_use_gb": round(s.get("bytes_in_use", 0) / 2**30, 3),
            "peak_bytes_gb": round(s.get("peak_bytes_in_use", 0) / 2**30, 3),
        }
    except Exception:
        return {}


def cache_bytes(state: dynamic.GenState) -> int:
    n = 0
    for tier in (state.cache.pre, state.cache.post):
        n += tier.k.size * tier.k.dtype.itemsize * 2
    return n


def long_text_memory(
    params,
    cfg: LlavaConfig,
    batch: int = 1,
    text_len: int = 64,
    max_new: int = 512,
    checkpoint_every: int = 64,
    record_file: Optional[str] = None,
) -> List[Dict]:
    """Greedy-decode max_new tokens, recording KV/memory stats periodically."""
    plan, imgs = build_inputs(cfg, batch, text_len)
    cache = dynamic.make_gen_cache(cfg, batch, plan.seq_len, max_new, jnp.bfloat16)
    prefill = jax.jit(dynamic.prefill, static_argnums=(1,), donate_argnums=(11,))
    decode = jax.jit(dynamic.decode_step, static_argnums=(1,), donate_argnums=(3,))
    state, _ = prefill(
        params, cfg,
        jnp.asarray(plan.token_ids), jnp.asarray(plan.is_image),
        jnp.asarray(plan.image_slot), jnp.asarray(plan.valid_len),
        jnp.asarray(plan.spans.image_start),
        jnp.asarray(plan.spans.last_instruct_start),
        jnp.asarray(plan.spans.last_instruct_end),
        jnp.asarray(plan.spans.has_image),
        jnp.asarray(imgs, jnp.bfloat16), cache,
    )
    records = []
    out = open(record_file, "w") if record_file else None
    tok = jnp.argmax(state.last_logits, axis=-1)
    for step in range(1, max_new + 1):
        state = decode(params, cfg, tok, state)
        tok = jnp.argmax(state.last_logits, axis=-1)
        if step % checkpoint_every == 0 or step == max_new:
            rec = {
                "output_token_length": step,
                "pre_cache_length": int(np.asarray(state.cache.pre.length)[0, 0]),
                "output_cache_length": int(
                    np.asarray(state.cache.post.length)[-1, 0]
                ),
                "cache_capacity_bytes": cache_bytes(state),
                **_device_mem(),
            }
            records.append(rec)
            if out:
                out.write(json.dumps(rec) + "\n")
                out.flush()
    if out:
        out.close()
    return records


def long_text_no_cache_timing(
    params,
    cfg: LlavaConfig,
    text_len: int = 32,
    rounds: int = 8,
    tokens_per_round: int = 32,
    record_file: Optional[str] = None,
) -> List[Dict]:
    """Full-recompute (use_cache=False) timing: round r re-runs the E4
    forward over prompt + r*tokens_per_round appended tokens."""
    rng = np.random.default_rng(0)
    base_ids = rng.integers(3, cfg.text.vocab_size, size=(text_len,)).astype(np.int64)
    base_ids[min(8, text_len - 2)] = -200
    imgs = jnp.asarray(
        rng.normal(size=(1, cfg.vision.image_size, cfg.vision.image_size, 3)),
        jnp.bfloat16,
    )
    fwd = jax.jit(dynamic.forward_nocache_eval, static_argnums=(1,))

    records = []
    out = open(record_file, "w") if record_file else None
    appended: List[int] = []
    for r in range(rounds):
        ids = np.concatenate([base_ids, np.asarray(appended, np.int64)])
        labels = np.full_like(ids, -100)
        if appended:
            labels[-len(appended):] = ids[-len(appended):]
        plan = plan_batch([ids], cfg.num_image_tokens, labels_list=[labels])
        args = (
            jnp.asarray(plan.token_ids), jnp.asarray(plan.is_image),
            jnp.asarray(plan.image_slot), jnp.asarray(plan.valid_len),
            jnp.asarray(plan.spans.image_start),
            jnp.asarray(plan.spans.answer_start),
            jnp.asarray(plan.spans.last_instruct_start),
            jnp.asarray(plan.spans.last_instruct_end),
            jnp.asarray(plan.spans.has_image),
        )
        # compile excluded from timing (per-length programs)
        logits, kept = jax.block_until_ready(fwd(params, cfg, *args, imgs))
        t0 = time.perf_counter()
        logits, kept = jax.block_until_ready(fwd(params, cfg, *args, imgs))
        dt = time.perf_counter() - t0
        rec = {
            "round": r,
            "total_length": int(plan.valid_len[0]),
            "kept_length": int(np.asarray(kept)[0]),
            "forward_ms": round(dt * 1e3, 3),
            **_device_mem(),
        }
        records.append(rec)
        if out:
            out.write(json.dumps(rec) + "\n")
            out.flush()
        appended.extend(
            rng.integers(3, cfg.text.vocab_size, size=(tokens_per_round,)).tolist()
        )
    if out:
        out.close()
    return records
