"""LLaMA decoder — TPU-native functional core.

Rebuilds the dense machinery of the reference decoder
(/root/reference/llava/model/language_model/dynamic_modeling_llama.py:125-567,
1578-2594) as pure functions over a parameter pytree:

* Layer params are **stacked along a leading layer axis** and executed with
  ``lax.scan`` — one layer is traced/compiled once regardless of depth, and
  FSDP sharding annotations apply uniformly to the stack.
* The stack is split at ``sparse_layer`` so the sparsification event
  (pruning/policy injection) happens between two scans; within each scan
  every layer is identical — no data-dependent control flow inside jit.
* Weights are stored ``[in, out]`` so the forward is ``x @ W`` (HF stores
  ``[out, in]``; the converter transposes once at load).
* All matmuls accumulate in fp32 on the MXU (``preferred_element_type``);
  softmax/norms run in fp32; activations/weights are bf16 in production.

The sparsification orchestration lives in ``dynamic.py``; this module has no
knowledge of predictors.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..config import LlamaConfig
from ..ops.attention import (
    attend,
    attend_with_policy,
    decode_attend_appended,
    extend_attend_appended,
    make_attention_mask,
    self_attend,
    sliding_window_mask,
)
from ..ops.kv_cache import (
    KVCache,
    quantize_kv,
    write_token_layers,
    write_token_scales,
)
from ..ops.norm import rms_norm
from ..ops.rope import apply_rope_for_config
from ..train.lora import lora_proj


# ---------------------------------------------------------------------------
# Parameters
# ---------------------------------------------------------------------------


def init_llama_params(key: jax.Array, cfg: LlamaConfig, dtype=jnp.float32):
    """Random init matching HF conventions (normal(0, 0.02), ones norms)."""
    d, f = cfg.hidden_size, cfg.intermediate_size
    h, kvh, hd = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim
    l, v = cfg.num_hidden_layers, cfg.vocab_size
    ks = jax.random.split(key, 9)

    def init(k, shape):
        # sample directly in the target dtype: an fp32 intermediate for the
        # stacked 7B weights would transiently double HBM at init
        return jax.random.normal(k, shape, dtype) * jnp.asarray(0.02, dtype)

    layers = {
        "input_ln": jnp.ones((l, d), dtype),
        "post_ln": jnp.ones((l, d), dtype),
        "q": init(ks[0], (l, d, h * hd)),
        "k": init(ks[1], (l, d, kvh * hd)),
        "v": init(ks[2], (l, d, kvh * hd)),
        "o": init(ks[3], (l, h * hd, d)),
        "gate": init(ks[4], (l, d, f)),
        "up": init(ks[5], (l, d, f)),
        "down": init(ks[6], (l, f, d)),
    }
    params = {
        "embed": init(ks[7], (v, d)),
        "layers": layers,
        "final_ln": jnp.ones((d,), dtype),
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = init(ks[8], (d, v))
    return params


def slice_layers(layers, lo: int, hi: Optional[int]):
    return jax.tree.map(lambda a: a[lo:hi], layers)


def index_layer(layers, i):
    """Dynamically select one layer's params from the full stack.

    Used inside scans-over-layer-indices: the stack stays a single
    loop-invariant HBM buffer and each step reads one [1, ...] slice —
    unlike ``slice_layers``, which materializes a copy of the sub-range
    (for a 7B model that copy is ~12 GB and OOMs a single chip).

    Quantized leaves (packed-int4 ``q4`` and int8 ``q``) keep their FULL
    stack plus the index (``{"q4"|"q": [L, ...], "s": sliced, "li": i}``):
    the Pallas streaming matmuls consume the stack + index directly,
    because a pallas_call input cannot fuse a producer dynamic-slice —
    slicing here would copy the layer's weights per matmul per step
    (ops/quant_matmul)."""

    # NOTE: a quantized leaf is {"q"|"q4", "s"} — the "s" requirement
    # matters because the layers dict itself has a key named "q" (the
    # q-projection), which must NOT be treated as a quantized leaf
    def quant_leaf(node):
        return (
            isinstance(node, dict)
            and "s" in node
            and ("q4" in node or "q" in node)
        )

    def pick(node):
        if quant_leaf(node):
            qk = "q4" if "q4" in node else "q"
            return {
                qk: node[qk],
                "s": jax.lax.dynamic_index_in_dim(
                    node["s"], i, axis=0, keepdims=False
                ),
                "li": i,
            }
        # 0-d leaves (e.g. the LoRA alpha/rank scale) are layer-invariant
        if jnp.ndim(node) == 0:
            return node
        return jax.lax.dynamic_index_in_dim(node, i, axis=0, keepdims=False)

    return jax.tree.map(pick, layers, is_leaf=quant_leaf)


def embed_tokens(params, ids: jax.Array) -> jax.Array:
    emb = params["embed"]
    if isinstance(emb, dict):  # int8/packed-int4: gather rows, then dequant
        from ..ops.quant import unpack_int4

        scl = jnp.take(emb["s"], ids, axis=0)
        if "q4" in emb:  # packed along hidden (last axis): row gather is free
            q = unpack_int4(jnp.take(emb["q4"], ids, axis=0))
        else:
            q = jnp.take(emb["q"], ids, axis=0)
        return q.astype(scl.dtype) * scl
    return jnp.take(emb, ids, axis=0)


def lm_head(params, cfg: LlamaConfig, x: jax.Array) -> jax.Array:
    x = rms_norm(x, params["final_ln"], cfg.rms_norm_eps)
    w = params["embed"] if cfg.tie_word_embeddings else params["lm_head"]
    if isinstance(w, dict) and not cfg.tie_word_embeddings:
        from ..ops.quant import matmul_q4, matmul_q8

        if "q4" in w:
            return matmul_q4(x, w, out_fp32=True)
        return matmul_q8(x, w, out_fp32=True)
    if isinstance(w, dict):
        from ..ops.quant import dequantize_weight

        w = dequantize_weight(w, x.dtype)
    if cfg.tie_word_embeddings:
        w = w.T
    return jnp.einsum("...d,dv->...v", x, w, preferred_element_type=jnp.float32)


# ---------------------------------------------------------------------------
# Layer primitives
# ---------------------------------------------------------------------------


import os as _os

# Training-path fused q/k/v + gate/up projections (concat weights per layer
# inside the scan, one wide matmul, slice). Measured on the v5e at the 0.55B
# recipe shape, interleaved paired runs: ~3% SLOWER (351.7 ms fused vs
# 339.9/342.0 separate at B=4 fused 1663) — the separate dots already run at
# full MXU efficiency inside the layer scan (an isolated-microbenchmark win
# did not transfer), and the per-layer weight concat is pure overhead. Kept
# as an opt-in knob for wider shapes; default off.
_FUSED_PROJ = _os.environ.get("DYNAMIC_LLAVA_FUSED_PROJ", "0") == "1"


def _can_fuse(lp, names) -> bool:
    """Plain (non-quantized) weight leaves can ride the fused matmul; LoRA
    deltas are added separately so adapters don't block fusion."""
    return _FUSED_PROJ and all(not isinstance(lp[n], dict) for n in names)


def _quant_group(lp, names, x: jax.Array):
    """Grouped quantized streaming GEMV over projections sharing ``x``
    (one kernel launch per group — ops.quant.matmul_q8_group /
    matmul_q4_group). None on mixed/non-quantized members or non-decode
    row counts; callers fall back to per-name lora_proj."""
    leaves = [lp.get(n) for n in names]
    if all(isinstance(l, dict) and "q" in l for l in leaves):
        from ..ops.quant import matmul_q8_group

        return matmul_q8_group(x, lp, names)
    if all(isinstance(l, dict) and "q4" in l for l in leaves):
        from ..ops.quant import matmul_q4_group

        return matmul_q4_group(x, lp, names)
    return None


def _lora_delta(lp, name: str, x: jax.Array):
    lora = lp.get(f"{name}_lora")
    if lora is None:
        return None
    return ((x @ lora["a"]) @ lora["b"]) * lora["s"]


def _qkv(
    lp, cfg: LlamaConfig, h: jax.Array, positions: jax.Array,
    fused: bool = False,
):
    b, s, _ = h.shape
    nq = cfg.num_attention_heads * cfg.head_dim
    nkv = cfg.num_key_value_heads * cfg.head_dim
    if fused and _can_fuse(lp, ("q", "k", "v")):
        # One [D, nq+2*nkv] matmul instead of three narrow ones: at training
        # shapes the MXU runs the wide dot far closer to peak (measured
        # fwd+bwd on the v5e at hidden 1536), and the per-layer weight
        # concat inside the scan costs only one extra weight read —
        # negligible against the big activation matmul. Decode/prefill
        # inference keeps separate dots: at B~1 the concat would double the
        # weight-bandwidth bill that dominates those regimes.
        qkv = h @ jnp.concatenate([lp["q"], lp["k"], lp["v"]], axis=1)
        q, k, v = jnp.split(qkv, (nq, nq + nkv), axis=-1)
        dq, dk, dv = (_lora_delta(lp, n, h) for n in ("q", "k", "v"))
        if dq is not None:
            q = q + dq
        if dk is not None:
            k = k + dk
        if dv is not None:
            v = v + dv
    else:
        group = _quant_group(lp, ("q", "k", "v"), h)
        if group is not None:
            q, k, v = (
                y if (d := _lora_delta(lp, n, h)) is None else y + d
                for y, n in zip(group, ("q", "k", "v"))
            )
        else:
            q = lora_proj(lp, "q", h)
            k = lora_proj(lp, "k", h)
            v = lora_proj(lp, "v", h)
    q = q.reshape(b, s, cfg.num_attention_heads, cfg.head_dim)
    k = k.reshape(b, s, cfg.num_key_value_heads, cfg.head_dim)
    v = v.reshape(b, s, cfg.num_key_value_heads, cfg.head_dim)
    q = apply_rope_for_config(q, positions, cfg)
    k = apply_rope_for_config(k, positions, cfg)
    return q, k, v


def _mlp(lp, h: jax.Array, fused: bool = False) -> jax.Array:
    if fused and _can_fuse(lp, ("gate", "up")):
        f = lp["gate"].shape[-1]
        gu = h @ jnp.concatenate([lp["gate"], lp["up"]], axis=1)
        g, u = jnp.split(gu, (f,), axis=-1)
        dg, du = _lora_delta(lp, "gate", h), _lora_delta(lp, "up", h)
        if dg is not None:
            g = g + dg
        if du is not None:
            u = u + du
        return lora_proj(lp, "down", jax.nn.silu(g) * u)
    if all(isinstance(lp.get(n), dict) and "q4" in lp[n]
           for n in ("gate", "up", "down")):
        # fully-int4 MLP at decode rows: ONE streaming program for
        # gate/up/silu/down (ops.quant.matmul_q4_mlp); None -> fall through
        from ..ops.quant import matmul_q4_mlp

        y = matmul_q4_mlp(h, lp)
        if y is not None:
            return y
    group = _quant_group(lp, ("gate", "up"), h)
    if group is not None:
        g, u = group
        dg, du = _lora_delta(lp, "gate", h), _lora_delta(lp, "up", h)
        if dg is not None:
            g = g + dg
        if du is not None:
            u = u + du
        return lora_proj(lp, "down", jax.nn.silu(g) * u)
    return lora_proj(
        lp, "down", jax.nn.silu(lora_proj(lp, "gate", h)) * lora_proj(lp, "up", h)
    )


def layer_nocache(
    lp,
    cfg: LlamaConfig,
    x: jax.Array,  # [B, S, D]
    positions: jax.Array,  # [B, S]
    mask: Optional[jax.Array],  # [B, 1, S, S] bool or None for plain causal
    policy: Optional[jax.Array] = None,  # [B, S] soft keep mask (training)
    training: bool = False,  # grad path: flash dispatches at the lower threshold
) -> jax.Array:
    b, s, d = x.shape
    h = rms_norm(x, lp["input_ln"], cfg.rms_norm_eps)
    q, k, v = _qkv(lp, cfg, h, positions, fused=training)
    win = cfg.sliding_window
    if win is not None and s > win:
        # Mistral sliding window, by POSITION (exact even on compacted
        # sequences). s <= win cannot bind: supported (dense) callers have
        # sequential positions, so the span equals s.
        wmask = sliding_window_mask(positions, positions, win)
        if mask is None:
            mask = make_attention_mask(s, s, causal=True, batch=b) & wmask
        else:
            mask = mask & wmask
    if mask is not None:
        if policy is not None:
            o = attend_with_policy(q, k, v, policy, mask=mask)
        else:
            o = attend(q, k, v, mask=mask)
    else:
        o = self_attend(q, k, v, policy=policy, training=training)
    x = x + lora_proj(lp, "o", o.reshape(b, s, -1))
    h = rms_norm(x, lp["post_ln"], cfg.rms_norm_eps)
    return x + _mlp(lp, h, fused=training)


# ---------------------------------------------------------------------------
# Scanned execution
# ---------------------------------------------------------------------------


_FLASH_SAVE_NAMES = ("flash_out", "flash_lse", "flash_policy_out")


def _remat_policy(name: str):
    cp = jax.checkpoint_policies
    if name == "dots":
        return cp.dots_with_no_batch_dims_saveable
    if name == "flash":
        return cp.save_only_these_names(*_FLASH_SAVE_NAMES)
    if name == "flash_dots":
        return cp.save_from_both_policies(
            cp.dots_with_no_batch_dims_saveable,
            cp.save_only_these_names(*_FLASH_SAVE_NAMES),
        )
    assert name == "nothing", name
    return cp.nothing_saveable


def run_layers_nocache(
    params,
    cfg: LlamaConfig,
    x: jax.Array,
    positions: jax.Array,
    *,
    lo: int = 0,
    hi: Optional[int] = None,
    mask: Optional[jax.Array] = None,
    policy: Optional[jax.Array] = None,
    remat: bool = False,
    remat_policy: str = "nothing",
    training: bool = False,
) -> jax.Array:
    """Run layers [lo, hi) without a KV cache (training / parity paths).
    Grad callers must pass ``training=True`` so attention dispatches on the
    training flash threshold even when no policy mask is active.

    ``remat_policy``: "nothing" recomputes the whole layer in the backward
    (minimum memory — the 7B regime); "dots" saves the weight-matmul
    outputs (qkv/o/mlp projections — where the FLOPs are) and recomputes
    only the cheap elementwise/attention pieces, trading ~per-layer
    activation memory for most of the recompute FLOPs; "flash" saves ONLY
    the attention outputs (+ FA2 per-row logsumexp), so the backward never
    re-runs an attention forward — the FA2 dq/dkv kernels reconstruct from
    the saved lse and cheaply-recomputed q/k/v — at ~1 activation per layer
    of extra memory; "flash_dots" combines both (dots + attention outputs:
    most memory, least recompute)."""
    hi = cfg.num_hidden_layers if hi is None else hi
    layers = params["layers"]

    def body(x, li):
        lp = index_layer(layers, li)
        return layer_nocache(lp, cfg, x, positions, mask, policy, training), None

    if remat and remat_policy == "alternate":
        # half-remat: scan over PAIRS — the first layer of each pair is
        # checkpointed (flash_dots: attention outputs + projection dots
        # saved), the second saves ALL its intermediates as plain scan
        # residuals. Memory sits between flash_dots and no-remat; recompute
        # halves. The lever for depths where no-remat OOMs but flash_dots
        # leaves MFU on the table (docs/BENCHMARKS.md 7B-width rows).
        assert (hi - lo) % 2 == 0, (lo, hi)

        def pair(x, li):
            first = jax.checkpoint(
                lambda x_, li_: layer_nocache(
                    index_layer(layers, li_), cfg, x_, positions, mask,
                    policy, training,
                ),
                policy=_remat_policy("flash_dots"),
            )
            x = first(x, li)
            x = layer_nocache(
                index_layer(layers, li + 1), cfg, x, positions, mask,
                policy, training,
            )
            return x, None

        x, _ = jax.lax.scan(pair, x, jnp.arange(lo, hi, 2, dtype=jnp.int32))
        return x
    if remat:
        body = jax.checkpoint(body, policy=_remat_policy(remat_policy))
    x, _ = jax.lax.scan(body, x, jnp.arange(lo, hi, dtype=jnp.int32))
    return x


class PrefillResult(NamedTuple):
    x: jax.Array  # [B, S, D] hidden states after the layer range
    cache: KVCache


def run_layers_prefill(
    params,
    cfg: LlamaConfig,
    x: jax.Array,  # [B, S, D] left-aligned (padding at the tail)
    positions: jax.Array,  # [B, S] original positions of each slot
    cache: KVCache,
    valid_len: jax.Array,  # [B] int32 — number of real tokens in x
    *,
    lo: int = 0,
    hi: Optional[int] = None,
) -> PrefillResult:
    """Prefill layers [lo, hi): dense causal attention over the (possibly
    compacted) sequence, K/V written to cache slots [0, S) with
    ``length = valid_len``.

    ``cache`` covers exactly the layer range [lo, hi) (layer axis is
    range-relative) — this is what lets the sparse tier of a TieredCache be
    allocated at the pruned-budget length.

    Because valid tokens are left-aligned and in ascending original order,
    plain causal masking is exact; padding rows compute garbage that is never
    read (logits are gathered at valid_len-1, decode masks by length).
    """
    hi = cfg.num_hidden_layers if hi is None else hi
    assert cache.num_layers == hi - lo, (cache.num_layers, lo, hi)
    if hi == lo:  # empty range (e.g. sparse_layer == num_hidden_layers)
        return PrefillResult(x=x, cache=cache._replace(
            length=jnp.broadcast_to(valid_len[None, :], cache.length.shape)))
    layers = params["layers"]
    b, s, d = x.shape
    layer_ids = jnp.arange(hi - lo, dtype=jnp.int32)
    win = cfg.sliding_window
    win_mask = None
    if win is not None and s > win:  # see layer_nocache: cannot bind at s<=win
        win_mask = make_attention_mask(
            s, s, causal=True, batch=b
        ) & sliding_window_mask(positions, positions, win)

    quantized = cache.quantized  # static (python) — shapes the scan carry

    def body(carry, li):
        x, ck, cv, sk, sv = carry
        lp = index_layer(layers, li + lo)
        h = rms_norm(x, lp["input_ln"], cfg.rms_norm_eps)
        q, k, v = _qkv(lp, cfg, h, positions)
        if quantized:
            qk, ksc = quantize_kv(k)
            qv, vsc = quantize_kv(v)
            ck = jax.lax.dynamic_update_slice(ck, qk[None], (li, 0, 0, 0, 0))
            cv = jax.lax.dynamic_update_slice(cv, qv[None], (li, 0, 0, 0, 0))
            sk = jax.lax.dynamic_update_slice(sk, ksc[None], (li, 0, 0, 0))
            sv = jax.lax.dynamic_update_slice(sv, vsc[None], (li, 0, 0, 0))
        else:
            ck = jax.lax.dynamic_update_slice(
                ck, k[None].astype(ck.dtype), (li, 0, 0, 0, 0)
            )
            cv = jax.lax.dynamic_update_slice(
                cv, v[None].astype(cv.dtype), (li, 0, 0, 0, 0)
            )
        if win_mask is not None:
            o = attend(q, k, v, mask=win_mask)
        else:
            o = self_attend(q, k, v)
        x = x + lora_proj(lp, "o", o.reshape(b, s, -1))
        hh = rms_norm(x, lp["post_ln"], cfg.rms_norm_eps)
        x = x + _mlp(lp, hh)
        return (x, ck, cv, sk, sv), None

    (x, ck, cv, sk, sv), _ = jax.lax.scan(
        body, (x, cache.k, cache.v, cache.k_scale, cache.v_scale), layer_ids
    )
    length = jnp.broadcast_to(valid_len[None, :], cache.length.shape)
    return PrefillResult(
        x=x, cache=KVCache(k=ck, v=cv, length=length, k_scale=sk, v_scale=sv)
    )


class DecodeResult(NamedTuple):
    x: jax.Array  # [B, 1, D]
    cache: KVCache  # K/V written at current slots; lengths NOT yet advanced
    kept: Optional[jax.Array] = None  # [B] persisted-token count (extend only)


def run_layers_decode(
    params,
    cfg: LlamaConfig,
    x: jax.Array,  # [B, 1, D] current-token hidden
    positions: jax.Array,  # [B, 1] original position of the token
    cache: KVCache,
    *,
    lo: int = 0,
    hi: Optional[int] = None,
    attend_bound: Optional[jax.Array] = None,  # [B] valid-slot bound override
    write_slot: Optional[jax.Array] = None,  # [B] write-slot override
) -> DecodeResult:
    """One decode step through layers [lo, hi). ``cache`` covers exactly the
    range (layer axis is range-relative).

    ``attend_bound``/``write_slot`` default to the tier length (the standard
    append-at-length protocol). The ring-overflow mode passes them
    explicitly: once the tier budget is full the bound saturates at the
    budget while the write slot wraps over the decode region, so a new
    token evicts the OLDEST decode entry instead of being force-dropped
    (recency-preserving long generations; see dynamic.decode_step).

    The cache buffers enter the layer scan as READ-ONLY ``xs`` (per-layer
    slices are views): each layer attends over its persisted tokens plus
    the current token's K/V appended virtually (``decode_attend_appended``
    — equivalent to the write-then-attend-over-length+1 protocol), and the
    actual K/V writes happen in ONE scatter after the scan. Carrying the
    multi-GB buffers through the scan instead costs a capacity-
    proportional copy per step — measured as ~18% of the B=24 7B decode
    step (run/decode_profile.py half_cache slope with attention reads,
    writes, and lm_head each patched to no-ops moving nothing).

    Lengths are advanced by the caller (see ``ops.kv_cache.advance_tiered``)
    so a kept/dropped decision made at the sparse layer applies uniformly.
    """
    hi = cfg.num_hidden_layers if hi is None else hi
    assert cache.num_layers == hi - lo, (cache.num_layers, lo, hi)
    if hi == lo:
        return DecodeResult(x=x, cache=cache)
    layers = params["layers"]
    b = x.shape[0]
    layer_ids = jnp.arange(hi - lo, dtype=jnp.int32)
    quantized = cache.quantized  # static — shapes the scan xs/ys
    bound = (
        cache.length if attend_bound is None
        else jnp.broadcast_to(attend_bound[None, :], cache.length.shape)
    )
    slots = (
        cache.length if write_slot is None
        else jnp.broadcast_to(write_slot[None, :], cache.length.shape)
    )

    def body(x, xs):
        if quantized:
            # int8 K/V + per-vector scales ride RAW into the attention;
            # the scales fold into scores/probabilities there. Dequantizing
            # here made XLA materialize the bf16 cache (measured ~45% of
            # serving throughput, docs/BENCHMARKS.md serving_int8kv arm).
            li, ck_l, cv_l, sk_l, sv_l, length_l = xs
            k_read, v_read = ck_l, cv_l
        else:
            li, ck_l, cv_l, length_l = xs
            sk_l = sv_l = None
            k_read, v_read = ck_l.astype(x.dtype), cv_l.astype(x.dtype)
        lp = index_layer(layers, li + lo)
        h = rms_norm(x, lp["input_ln"], cfg.rms_norm_eps)
        q, k, v = _qkv(lp, cfg, h, positions)
        o = decode_attend_appended(
            q, k_read, v_read, k, v, length_l,
            window=cfg.sliding_window, q_pos=positions[:, 0],
            k_scale=sk_l, v_scale=sv_l,
        )
        x = x + lora_proj(lp, "o", o.reshape(b, 1, -1))
        hh = rms_norm(x, lp["post_ln"], cfg.rms_norm_eps)
        x = x + _mlp(lp, hh)
        if quantized:
            qk, ksc = quantize_kv(k)
            qv, vsc = quantize_kv(v)
            return x, (qk, qv, ksc, vsc)
        return x, (k.astype(cache.k.dtype), v.astype(cache.v.dtype))

    if quantized:
        x, (k_new, v_new, ks_new, vs_new) = jax.lax.scan(
            body, x,
            (layer_ids, cache.k, cache.v, cache.k_scale, cache.v_scale,
             bound),
        )
        ck, cv = write_token_layers(
            cache.k, cache.v, k_new, v_new, slots
        )
        sk, sv = write_token_scales(
            cache.k_scale, cache.v_scale, ks_new, vs_new, slots
        )
        return DecodeResult(
            x=x,
            cache=KVCache(k=ck, v=cv, length=cache.length,
                          k_scale=sk, v_scale=sv),
        )
    x, (k_new, v_new) = jax.lax.scan(
        body, x, (layer_ids, cache.k, cache.v, bound)
    )
    ck, cv = write_token_layers(cache.k, cache.v, k_new, v_new, slots)
    return DecodeResult(x=x, cache=KVCache(k=ck, v=cv, length=cache.length))


def run_layers_extend(
    params,
    cfg: LlamaConfig,
    x: jax.Array,  # [B, M, D] new chunk (fully valid)
    positions: jax.Array,  # [B, M] original positions of the chunk tokens
    cache: KVCache,  # covers [lo, hi); all layers share one length (tier invariant)
    *,
    lo: int = 0,
    hi: Optional[int] = None,
    keep: Optional[jax.Array] = None,  # [B, M] bool — persist decision per token
    chunk_attend: Optional[jax.Array] = None,  # [B, M] bool — see below
) -> DecodeResult:
    """Continuation ("chunked") prefill: extend an existing cache with M new
    tokens in one pass — the multi-round regime the reference handles
    token-by-token or with B==1 asserts (E5, dynamic_modeling_llama.py:2506-2521).

    Every chunk token attends over the persisted cache plus the whole chunk
    (causal within the chunk); only ``keep``-marked tokens are scattered into
    the cache, compacted to slots [len, len+n_kept). Dropped tokens land in
    the reserved scratch slot (max_len-1), which sits beyond the valid
    region and is never persisted. Kept tokens that would overflow the
    remaining capacity are force-dropped (same rule as ``decode_step``) —
    otherwise JAX's silent OOB-scatter-drop would leave never-written slots
    inside the attended region. Lengths are advanced by the caller using the
    returned ``kept`` counts.

    ``chunk_attend`` restricts which CHUNK tokens later chunk rows may
    attend (each row always attends itself): row j sees chunk column i < j
    only where ``chunk_attend[b, i]``. This is what makes a batched
    speculative-verify pass equivalent to feeding the tokens one-by-one
    through ``decode_step`` — there a dropped token's K/V exists only
    during its own step, so later tokens never see it. The default (all
    True) is the reference E5 instruct-chunk semantics.
    """
    hi = cfg.num_hidden_layers if hi is None else hi
    assert cache.num_layers == hi - lo
    b, m, _ = x.shape
    if hi == lo:
        return DecodeResult(x=x, cache=cache, kept=jnp.zeros((b,), jnp.int32))
    layers = params["layers"]
    max_len = cache.max_len
    length0 = cache.length[0]  # [B] shared across the tier
    if keep is None:
        keep_i = jnp.ones((b, m), jnp.int32)
    else:
        keep_i = keep.astype(jnp.int32)
    # compacted target slot per chunk token; earlier tokens' offsets are
    # unaffected by zeroing later ones, so clamping after the cumsum is exact
    offsets = jnp.cumsum(keep_i, axis=1) - 1
    remaining = jnp.maximum(max_len - 1 - length0, 0)  # slot max_len-1 = scratch
    keep_i = keep_i * (offsets < remaining[:, None]).astype(jnp.int32)
    target = jnp.where(
        keep_i > 0, length0[:, None] + offsets, max_len - 1
    ).astype(jnp.int32)
    kept = jnp.sum(keep_i, axis=1).astype(jnp.int32)
    batch_idx = jnp.arange(b, dtype=jnp.int32)[:, None]

    # mask: [B, 1, M, max_len + M] — cache cols by length, chunk cols causal.
    # The bound is clamped to the capacity so a length that somehow exceeds
    # it (a wrapped ring cache fed here directly — unsupported, the public
    # APIs refuse ring+extend) can never index past the buffer; a tier that
    # is exactly full (length0 == max_len) still attends its last slot.
    cache_cols = jnp.arange(max_len, dtype=jnp.int32)
    cache_mask = (
        cache_cols[None, :]
        < jnp.minimum(length0, max_len)[:, None]
    )  # [B, max_len]
    rows = jnp.arange(m, dtype=jnp.int32)
    chunk_mask = rows[None, :, None] >= rows[None, None, :]  # [1, M, M]
    if chunk_attend is not None:
        self_cols = rows[None, :, None] == rows[None, None, :]
        chunk_mask = chunk_mask & (
            chunk_attend[:, None, :] | self_cols
        )  # [B, M, M]
        chunk_mask = jnp.broadcast_to(chunk_mask, (b, m, m))
    mask = jnp.concatenate(
        [
            jnp.broadcast_to(cache_mask[:, None, None, :], (b, 1, m, max_len)),
            jnp.broadcast_to(chunk_mask[:, None], (b, 1, m, m)),
        ],
        axis=-1,
    )
    if cfg.sliding_window is not None:
        # Mistral window: cache keys by slot (== position, dense cache
        # invariant), chunk keys by their original positions
        mask = mask & jnp.concatenate(
            [
                sliding_window_mask(positions, cache_cols, cfg.sliding_window),
                sliding_window_mask(positions, positions, cfg.sliding_window),
            ],
            axis=-1,
        )
    layer_ids = jnp.arange(hi - lo, dtype=jnp.int32)

    quantized = cache.quantized  # static — shapes the scan xs/ys

    # Cache buffers enter the layer scan as READ-ONLY xs (per-layer views);
    # within one pass a layer's reads never depend on any layer's writes
    # (attention uses old-cache ++ fresh chunk K/V), so every write moves
    # OUTSIDE the scan into one batched scatter spanning the layer axis.
    # Carrying the buffers instead cost a capacity-proportional copy per
    # layer (the same pathology run_layers_decode's rebuild measured at
    # ~18% of a 7B decode step) — this is the multi-round/speculative hot
    # path, so it gets the same treatment.
    def body(x, xs):
        # segment-form attention (extend_attend_appended): the cache is
        # never concatenated with the chunk (a full cache copy per layer)
        # and int8-KV scales fold into scores/probs instead of a
        # dequant that XLA materializes (see run_layers_decode)
        if quantized:
            li, ck_l, cv_l, sk_l, sv_l = xs
            k_old, v_old = ck_l, cv_l
        else:
            li, ck_l, cv_l = xs
            sk_l = sv_l = None
            k_old, v_old = ck_l.astype(x.dtype), cv_l.astype(x.dtype)
        lp = index_layer(layers, li + lo)
        h = rms_norm(x, lp["input_ln"], cfg.rms_norm_eps)
        q, k, v = _qkv(lp, cfg, h, positions)
        o = extend_attend_appended(
            q, k_old, v_old, k, v, mask, k_scale=sk_l, v_scale=sv_l
        )
        x = x + lora_proj(lp, "o", o.reshape(b, m, -1))
        hh = rms_norm(x, lp["post_ln"], cfg.rms_norm_eps)
        x = x + _mlp(lp, hh)
        if quantized:
            qk, ksc = quantize_kv(k)
            qv, vsc = quantize_kv(v)
            return x, (qk, qv, ksc, vsc)
        return x, (k.astype(cache.k.dtype), v.astype(cache.v.dtype))

    if quantized:
        x, (k_new, v_new, ks_new, vs_new) = jax.lax.scan(
            body, x,
            (layer_ids, cache.k, cache.v, cache.k_scale, cache.v_scale),
        )
        ck = cache.k.at[:, batch_idx, target].set(k_new)
        cv = cache.v.at[:, batch_idx, target].set(v_new)
        sk = cache.k_scale.at[:, batch_idx, target].set(ks_new)
        sv = cache.v_scale.at[:, batch_idx, target].set(vs_new)
    else:
        x, (k_new, v_new) = jax.lax.scan(
            body, x, (layer_ids, cache.k, cache.v)
        )
        ck = cache.k.at[:, batch_idx, target].set(k_new)
        cv = cache.v.at[:, batch_idx, target].set(v_new)
        sk, sv = cache.k_scale, cache.v_scale
    return DecodeResult(
        x=x,
        cache=KVCache(k=ck, v=cv, length=cache.length, k_scale=sk, v_scale=sv),
        kept=kept,
    )


# ---------------------------------------------------------------------------
# Dense end-to-end conveniences (parity tests, dense baseline)
# ---------------------------------------------------------------------------


def forward_dense(
    params,
    cfg: LlamaConfig,
    input_ids: jax.Array,  # [B, S]
    *,
    positions: Optional[jax.Array] = None,
    remat: bool = False,
) -> jax.Array:
    """Full dense causal-LM forward, returns fp32 logits [B, S, V]."""
    b, s = input_ids.shape
    if positions is None:
        positions = jnp.broadcast_to(jnp.arange(s, dtype=jnp.int32)[None], (b, s))
    x = embed_tokens(params, input_ids)
    x = run_layers_nocache(params, cfg, x, positions, remat=remat)
    return lm_head(params, cfg, x)
