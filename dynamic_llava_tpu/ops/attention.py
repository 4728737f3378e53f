"""Attention ops — XLA reference paths.

These are the semantically-definitive implementations; the Pallas fused
kernels in ``flash_attention.py`` are tested for equivalence against these.

Replaces the reference's four attention stacks (eager `LlamaAttention`,
`LlamaFlashAttention2`, `DynamicLlamaSdpaAttention`, and the policy SDPA;
/root/reference/llava/model/language_model/dynamic_modeling_llama.py:429-1129)
with ONE parameterization:

  attend(q, k, v, mask_mode, kv_length, policy)

* ``causal`` masking over a (possibly pruned-and-compacted) sequence. Because
  pruning gathers tokens in ascending original order, plain causal masking on
  the compacted sequence is exactly equivalent to causal masking by original
  position — no per-layer 4D mask rebuild (reference :1788-1819) is needed.
* ``kv_length`` masking for the static decode cache: key slots
  ``>= kv_length`` are invalid (the cache is preallocated at max_len).
* ``policy`` soft-mask path for training: masked softmax renormalized over
  kept tokens with a self-attention (identity) escape, matching
  ``softmax_with_policy`` semantics (:913-929) including the fp32 upcast and
  eps smoothing.

Layouts are [B, S, H, d] (sequence-major per head), the natural layout for
TPU: head_dim=128 rides the lane dimension and S the sublane dimension, so
QK^T and PV land on the MXU without transposes.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp


# XLA's fused attention beats the Pallas kernel for INFERENCE whenever the
# [B, H, S, S] fp32 score tensor comfortably fits in HBM (measured on v5e:
# S=703 7B prefill XLA 100.7 ms vs Pallas 112.9 ms; S=2048 B=1 H=8 XLA
# 2.26 ms vs 2.70 ms). The kernel's win is avoiding that materialization,
# so inference dispatches on its would-be size: above 1 GiB, use flash.
FLASH_LOGITS_BYTES = 1 << 30
# TRAINING is different: the backward pass reads/writes the score tensor
# again, and the true FA-2 dq/dkv kernels never build it. Measured on v5e
# (run/train_step_bench.py, 0.55B B=4): at fused S=1663 (531 MB logits,
# below the inference threshold) the Pallas pair is 382.3 ms/step vs XLA's
# 440.7 (MFU 29.5% vs 25.6%); at S=2623 flash wins 767.7 vs 901.7. So the
# grad paths (policy attention) switch to flash at a much lower size.
FLASH_LOGITS_BYTES_TRAIN = 128 << 20


def flash_enabled(head_dim: int, logits_bytes: int | None = None,
                  training: bool = False) -> bool:
    """Use the Pallas fused kernel when on real TPU hardware, with a
    kernel-friendly head dim, and when the XLA path's materialized score
    tensor would be large (training uses the lower threshold — see above).
    Override with DYNAMIC_LLAVA_FLASH=0/1."""
    env = os.environ.get("DYNAMIC_LLAVA_FLASH")
    if env is not None:
        return env not in ("0", "false", "False")
    if head_dim < 64 or head_dim % 8 != 0:
        return False
    threshold = FLASH_LOGITS_BYTES_TRAIN if training else FLASH_LOGITS_BYTES
    if logits_bytes is not None and logits_bytes < threshold:
        return False
    try:
        plat = jax.devices()[0].platform
    except Exception:
        return False
    return plat in ("tpu", "axon")


def self_attend(
    q: jax.Array,  # [B, S, H, d]
    k: jax.Array,  # [B, S, Hkv, d]
    v: jax.Array,  # [B, S, Hkv, d]
    *,
    valid_len: Optional[jax.Array] = None,  # [B] — kv cols >= valid_len masked
    policy: Optional[jax.Array] = None,  # [B, S] soft keep mask (training)
    allow_flash: bool = True,
    training: bool = False,
) -> jax.Array:
    """Causal self-attention dispatcher: Pallas flash kernel on TPU for the
    plain paths, XLA oracle elsewhere and for policy (training) attention.
    The flash kernel has a custom VJP (XLA-recompute backward), so it is
    also used under grad.

    ``training`` selects the lower flash threshold because the backward
    pass also rides the kernel; it must be passed explicitly by grad paths
    — a policy mask implies training, but dense-stage training and the
    pre-sparse-tier layers run policy-free and would otherwise dispatch on
    the inference threshold and miss the measured ~15% Pallas win."""
    b, s, h, d = q.shape
    if allow_flash and flash_enabled(d, b * h * s * s * 4,
                                     training=training or policy is not None):
        if policy is None:
            from .flash_attention import flash_attention_vjp

            return flash_attention_vjp(q, k, v, kv_length=valid_len, causal=True)
        if valid_len is None:
            from .flash_policy import flash_policy_attention_vjp

            return flash_policy_attention_vjp(q, k, v, policy)
    mask = make_attention_mask(
        s, s, causal=True, kv_length=valid_len, batch=b
    )
    if policy is not None:
        return attend_with_policy(q, k, v, policy, mask=mask)
    return attend(q, k, v, mask=mask)


def repeat_kv_heads(x: jax.Array, n_rep: int) -> jax.Array:
    """GQA broadcast [B, S, Hkv, d] -> [B, S, Hkv*n_rep, d] (reference
    ``repeat_kv`` :333-346)."""
    if n_rep == 1:
        return x
    b, s, h, d = x.shape
    x = jnp.broadcast_to(x[:, :, :, None, :], (b, s, h, n_rep, d))
    return x.reshape(b, s, h * n_rep, d)


def _logits(q: jax.Array, k: jax.Array, scale: float) -> jax.Array:
    # [B,Sq,H,d] x [B,Sk,H,d] -> [B,H,Sq,Sk], accumulate in fp32 on the MXU
    return jnp.einsum(
        "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * scale


def _output(w: jax.Array, v: jax.Array, out_dtype) -> jax.Array:
    out = jnp.einsum(
        "bhqk,bkhd->bqhd", w, v, preferred_element_type=jnp.float32
    )
    return out.astype(out_dtype)


def make_attention_mask(
    q_len: int,
    kv_len: int,
    *,
    causal: bool,
    q_offset: Optional[jax.Array] = None,  # [B] int32: q row i has kv index q_offset+i
    kv_length: Optional[jax.Array] = None,  # [B] int32: valid kv slots are [0, kv_length)
    kv_valid: Optional[jax.Array] = None,  # [B, Sk] bool: explicit validity
    batch: int = 1,
) -> jax.Array:
    """Boolean [B, 1, Sq, Sk] mask (True = attend)."""
    rows = jnp.arange(q_len, dtype=jnp.int32)
    cols = jnp.arange(kv_len, dtype=jnp.int32)
    mask = jnp.ones((batch, 1, q_len, kv_len), dtype=bool)
    if causal:
        if q_offset is None:
            q_offset = jnp.zeros((batch,), jnp.int32)
        q_idx = q_offset[:, None] + rows[None, :]  # [B, Sq]
        causal_m = q_idx[:, :, None] >= cols[None, None, :]  # [B, Sq, Sk]
        mask = mask & causal_m[:, None]
    if kv_length is not None:
        len_m = cols[None, :] < kv_length[:, None]  # [B, Sk]
        mask = mask & len_m[:, None, None, :]
    if kv_valid is not None:
        mask = mask & kv_valid[:, None, None, :]
    return mask


def sliding_window_mask(
    q_pos: jax.Array,  # [B, Sq] int32 query positions
    k_pos: jax.Array,  # [B, Sk] or [Sk] int32 key positions
    window: int,
) -> jax.Array:
    """[B, 1, Sq, Sk] True where q_pos - k_pos < window (Mistral semantics:
    a token attends to itself and the previous window-1 POSITIONS; combine
    with a causal mask for the lower bound). Position-based, so it stays
    exact on compacted sequences where slot != position."""
    if k_pos.ndim == 1:
        k_pos = k_pos[None]
    return (q_pos[:, :, None] - k_pos[:, None, :] < window)[:, None]


def attend(
    q: jax.Array,  # [B, Sq, H, d]
    k: jax.Array,  # [B, Sk, Hkv, d]
    v: jax.Array,  # [B, Sk, Hkv, d]
    *,
    mask: Optional[jax.Array] = None,  # [B, 1, Sq, Sk] bool
    bias: Optional[jax.Array] = None,  # [B|1, H, Sq, Sk] additive (ALiBi)
    scale: Optional[float] = None,
) -> jax.Array:
    """Plain masked attention, fp32 softmax. Returns [B, Sq, H, d].

    ``bias`` is added to the scaled logits before masking — the ALiBi path
    for the MPT family (rope-free position encoding; HF MptAttention adds
    position_bias the same way). Bias-carrying calls always ride this XLA
    oracle: the flash kernels are rope-family only."""
    n_rep = q.shape[2] // k.shape[2]
    k = repeat_kv_heads(k, n_rep)
    v = repeat_kv_heads(v, n_rep)
    if scale is None:
        scale = q.shape[-1] ** -0.5
    logits = _logits(q, k, scale)
    if bias is not None:
        logits = logits + bias.astype(jnp.float32)
    if mask is not None:
        logits = jnp.where(mask, logits, jnp.float32(-1e30))
    w = jax.nn.softmax(logits, axis=-1)
    return _output(w, v, q.dtype)


def attend_with_policy(
    q: jax.Array,  # [B, S, H, d]
    k: jax.Array,  # [B, S, Hkv, d]
    v: jax.Array,  # [B, S, Hkv, d]
    policy: jax.Array,  # [B, S] in [0,1]: soft keep mask over kv tokens
    *,
    mask: Optional[jax.Array] = None,  # [B, 1, S, S] bool (typically causal+padding)
    scale: Optional[float] = None,
    eps: float = 1e-6,
) -> jax.Array:
    """Training-mode policy attention (reference ``softmax_with_policy``
    :913-929 + ``scaled_dot_product_attention_with_policy`` :933-970).

    weights = (exp(logits - max) * policy_kv + eps/N) / (sum + eps), where the
    kv policy has its diagonal forced to 1 (every token may attend to itself)
    and dropped-out logits (mask=False) contribute exp(-inf)=0.

    The whole renormalization runs in fp32 regardless of input dtype —
    required for Gumbel-mask training stability in bf16 (reference comment
    "for stable training", :926-929).
    """
    n_rep = q.shape[2] // k.shape[2]
    k = repeat_kv_heads(k, n_rep)
    v = repeat_kv_heads(v, n_rep)
    if scale is None:
        scale = q.shape[-1] ** -0.5
    s = q.shape[1]
    logits = _logits(q, k, scale)  # fp32 [B,H,S,S]
    if mask is not None:
        logits = jnp.where(mask, logits, jnp.float32(-jnp.inf))
    pol = policy.astype(jnp.float32)[:, None, None, :]  # [B,1,1,S]
    eye = jnp.eye(s, dtype=jnp.float32)[None, None]
    pol = pol + (1.0 - pol) * eye
    m = jnp.max(logits, axis=-1, keepdims=True)
    # guard fully-masked rows (padding queries): max=-inf -> exp(nan)
    m = jnp.where(jnp.isfinite(m), m, 0.0)
    w = jnp.exp(logits - m) * pol
    w = (w + eps / s) / (jnp.sum(w, axis=-1, keepdims=True) + eps)
    return _output(w, v, q.dtype)


def decode_attend(
    q: jax.Array,  # [B, 1, H, d] current-step query
    k_cache: jax.Array,  # [B, max_len, Hkv, d] — slot `kv_length` holds the current token
    v_cache: jax.Array,  # [B, max_len, Hkv, d]
    kv_length: jax.Array,  # [B] int32 persisted length (excluding current token)
    *,
    scale: Optional[float] = None,
    window: Optional[int] = None,  # sliding window; needs q_pos (dense cache)
    q_pos: Optional[jax.Array] = None,  # [B] current token's position
) -> jax.Array:
    """Single-token decode against the static cache.

    The current token's K/V must already be written at slot ``kv_length``;
    it is visible this step whether or not it will be persisted — the
    write-then-conditionally-advance protocol that replaces the reference's
    ``get_cache`` + ``update(text_decision)`` pair
    (cache_utils.py:150-268, dynamic_modeling_llama.py:1061-1083).

    DYNAMIC_LLAVA_DECODE_KERNEL=1 opts into the Pallas length-skipping
    kernel (`ops.decode_attention`), whose kv loop bound is the live length.
    Measured on v5e it LOSES to this XLA path at serving batch sizes (the
    (B x Hkv) grid executes sequentially on the single tensor core and
    per-program work is tiny), so the default stays XLA; the kernel is for
    long-context low-batch regimes where per-program work amortizes.
    """
    d = q.shape[-1]
    env = os.environ.get("DYNAMIC_LLAVA_DECODE_KERNEL")
    use_kernel = env not in (None, "0", "false", "False")
    if use_kernel and flash_enabled(d, None):
        from .decode_attention import flash_decode_attention

        return flash_decode_attention(q, k_cache, v_cache, kv_length, scale=scale)
    mask = make_attention_mask(
        1,
        k_cache.shape[1],
        causal=False,
        kv_length=kv_length + 1,
        batch=q.shape[0],
    )
    if window is not None:
        # dense cache invariant: slot index == token position (Mistral is
        # dense-only here, as in the reference)
        cols = jnp.arange(k_cache.shape[1], dtype=jnp.int32)
        mask = mask & sliding_window_mask(q_pos[:, None], cols, window)
    return attend(q, k_cache, v_cache, mask=mask, scale=scale)


def _fold_kv_scales(scales: jax.Array, n_rep: int) -> jax.Array:
    """[B, max_len, Hkv] per-vector int8-KV scales -> [B, H, 1, max_len]
    fp32 multiplier over the score/probability row (see
    decode_attend_appended: (q·(k·s)) == (q·k)·s, Σp(v·s) == Σ(p·s)v)."""
    s = repeat_kv_heads(scales[..., None], n_rep)[..., 0]
    return s.astype(jnp.float32).transpose(0, 2, 1)[:, :, None, :]


def extend_attend_appended(
    q: jax.Array,  # [B, M, H, d] chunk queries
    k_cache: jax.Array,  # [B, max_len, Hkv, d] persisted (read-only; may be int8)
    v_cache: jax.Array,  # [B, max_len, Hkv, d]
    k_chunk: jax.Array,  # [B, M, Hkv, d] the chunk's fresh keys
    v_chunk: jax.Array,  # [B, M, Hkv, d]
    mask: jax.Array,  # [B, 1, M, max_len + M] bool (cache cols ++ chunk cols)
    *,
    scale: Optional[float] = None,
    k_scale: Optional[jax.Array] = None,  # [B, max_len, Hkv] int8-KV scales
    v_scale: Optional[jax.Array] = None,
) -> jax.Array:
    """Chunk attention over cache ++ chunk WITHOUT concatenating the K/V.

    The segment form of ``decode_attend_appended`` for M-token extends:
    ``jnp.concatenate([cache, chunk])`` copied the full (multi-GB at 7B)
    cache buffer per layer per pass; computing the two score segments
    against the original buffers and summing the two PV products skips
    that copy, and — for scaled-int8 storage — lets the per-vector scales
    fold into the score row / probabilities so the int8 buffers feed the
    matmuls as plain casts (the dequant-materialization fix, see
    decode_attend_appended)."""
    n_rep = q.shape[2] // k_cache.shape[2]
    k_cache = repeat_kv_heads(k_cache, n_rep)
    v_cache = repeat_kv_heads(v_cache, n_rep)
    k_chunk = repeat_kv_heads(k_chunk, n_rep)
    v_chunk = repeat_kv_heads(v_chunk, n_rep)
    if scale is None:
        scale = q.shape[-1] ** -0.5
    max_len = k_cache.shape[1]
    logits_cache = _logits(q, k_cache.astype(q.dtype), scale)  # [B,H,M,max_len]
    if k_scale is not None:
        logits_cache = logits_cache * _fold_kv_scales(k_scale, n_rep)
    logits_chunk = _logits(q, k_chunk, scale)  # [B, H, M, M]
    logits = jnp.concatenate([logits_cache, logits_chunk], axis=-1)
    logits = jnp.where(mask, logits, jnp.float32(-1e30))
    w = jax.nn.softmax(logits, axis=-1)
    w_cache = w[..., :max_len]
    if v_scale is not None:
        w_cache = w_cache * _fold_kv_scales(v_scale, n_rep)
    out = jnp.einsum(
        "bhqk,bkhd->bqhd", w_cache, v_cache.astype(q.dtype),
        preferred_element_type=jnp.float32,
    ) + jnp.einsum(
        "bhqk,bkhd->bqhd", w[..., max_len:], v_chunk,
        preferred_element_type=jnp.float32,
    )
    return out.astype(q.dtype)


def decode_attend_appended(
    q: jax.Array,  # [B, 1, H, d] current-step query
    k_cache: jax.Array,  # [B, max_len, Hkv, d] persisted tokens (read-only)
    v_cache: jax.Array,  # [B, max_len, Hkv, d]
    k_cur: jax.Array,  # [B, 1, Hkv, d] current token's key (NOT in the cache)
    v_cur: jax.Array,  # [B, 1, Hkv, d]
    kv_length: jax.Array,  # [B] int32 persisted length
    *,
    scale: Optional[float] = None,
    window: Optional[int] = None,  # sliding window; needs q_pos (dense cache)
    q_pos: Optional[jax.Array] = None,  # [B] current token's position
    k_scale: Optional[jax.Array] = None,  # [B, max_len, Hkv] int8-KV scales
    v_scale: Optional[jax.Array] = None,
) -> jax.Array:
    """Decode attention with the current token APPENDED virtually.

    Equivalent to writing the token at slot ``kv_length`` and attending
    over ``[0, kv_length + 1)`` (``decode_attend``), but the cache buffers
    are only READ: the current token's K/V ride as a separate length-1
    term in the softmax. This is what lets the layer scan treat the cache
    as read-only ``xs`` and defer the (tiny) K/V scatter to one op outside
    the loop — carrying multi-GB cache buffers through a scan costs a
    capacity-proportional copy per step (measured: 18% of the B=24 7B
    decode step went to carry traffic, run/decode_profile.py).

    ``k_scale``/``v_scale`` (scaled-int8 KV storage) are folded
    ALGEBRAICALLY instead of dequantizing the cache:
    ``(q · (k_i·s_i)) == (q·k_i)·s_i`` applies the K scale to the score
    row after the matmul, and ``Σ p_i·(v_i·s_i) == Σ (p_i·s_i)·v_i``
    folds the V scale into the probabilities — so the int8 buffers feed
    the matmuls through a plain cast (which XLA fuses, like the fp8
    path). The naive ``int8→bf16 × scale`` dequant MATERIALIZED the bf16
    K/V and cost ~45% of serving throughput (docs/BENCHMARKS.md,
    serving_int8kv arm). The fold is also (slightly) more accurate: int8
    values cast to bf16 exactly, and the scale multiply happens in fp32
    score space instead of bf16 operand space."""
    n_rep = q.shape[2] // k_cache.shape[2]
    k_cache = repeat_kv_heads(k_cache, n_rep)
    v_cache = repeat_kv_heads(v_cache, n_rep)
    k_cur = repeat_kv_heads(k_cur, n_rep)
    v_cur = repeat_kv_heads(v_cur, n_rep)
    if scale is None:
        scale = q.shape[-1] ** -0.5
    max_len = k_cache.shape[1]

    def fold(scales):  # [B, max_len, Hkv] -> [B, H, 1, max_len] fp32
        return _fold_kv_scales(scales, n_rep)

    logits_cache = _logits(q, k_cache.astype(q.dtype), scale)
    if k_scale is not None:
        logits_cache = logits_cache * fold(k_scale)
    cols = jnp.arange(max_len, dtype=jnp.int32)
    mask = cols[None, None, None, :] < kv_length[:, None, None, None]
    if window is not None:
        # dense cache invariant: slot index == token position (the sparse
        # tiers never carry a sliding-window config — guarded in dynamic)
        mask = mask & sliding_window_mask(q_pos[:, None], cols, window)
    logits_cache = jnp.where(mask, logits_cache, jnp.float32(-1e30))
    logit_cur = _logits(q, k_cur, scale)  # [B, H, 1, 1] — always visible
    w = jax.nn.softmax(
        jnp.concatenate([logits_cache, logit_cur], axis=-1), axis=-1
    )
    w_cache = w[..., :max_len]
    if v_scale is not None:
        w_cache = w_cache * fold(v_scale)
    out = jnp.einsum(
        "bhqk,bkhd->bqhd", w_cache, v_cache.astype(q.dtype),
        preferred_element_type=jnp.float32,
    ) + jnp.einsum(
        "bhqk,bkhd->bqhd", w[..., max_len:], v_cur,
        preferred_element_type=jnp.float32,
    )
    return out.astype(q.dtype)


def blockwise_attend(
    q: jax.Array,  # [B, S, H, d]
    k: jax.Array,
    v: jax.Array,
    *,
    policy: Optional[jax.Array] = None,  # [B, S]
    kv_length: Optional[jax.Array] = None,  # [B]
    scale: Optional[float] = None,
    block_q: int = 256,
    eps: float = 1e-6,
) -> jax.Array:
    """Causal (policy-)attention computed one q-block at a time with
    per-block rematerialization: peak memory is O(block_q x S) instead of
    O(S^2), and — because scan+checkpoint differentiate blockwise — so is
    the BACKWARD pass. This is the memory-safe autodiff path behind the
    Pallas kernels' custom VJPs (the kernels own the forward; this owns the
    gradient recompute at shapes where the dense oracle would not fit)."""
    b, s, h, d = q.shape
    n_rep = h // k.shape[2]
    kf = repeat_kv_heads(k, n_rep)
    vf = repeat_kv_heads(v, n_rep)
    if scale is None:
        scale = d**-0.5
    block_q = min(block_q, s)
    pad = (-s) % block_q
    qp = jnp.pad(q, ((0, 0), (0, pad), (0, 0), (0, 0)))
    nblocks = qp.shape[1] // block_q
    qb = qp.reshape(b, nblocks, block_q, h, d).transpose(1, 0, 2, 3, 4)

    cols = jnp.arange(s, dtype=jnp.int32)
    if policy is not None:
        polf = policy.astype(jnp.float32)

    def block(args):
        qi, bi = args
        rows = bi * block_q + jnp.arange(block_q, dtype=jnp.int32)
        logits = jnp.einsum(
            "bqhd,bkhd->bhqk", qi, kf, preferred_element_type=jnp.float32
        ) * scale
        mask = rows[None, None, :, None] >= cols[None, None, None, :]
        if kv_length is not None:
            mask = mask & (cols[None, None, None, :] < kv_length[:, None, None, None])
        if policy is None:
            logits = jnp.where(mask, logits, jnp.float32(-1e30))
            w = jax.nn.softmax(logits, axis=-1)
        else:
            logits = jnp.where(mask, logits, jnp.float32(-jnp.inf))
            pol = polf[:, None, None, :]
            diag = rows[None, None, :, None] == cols[None, None, None, :]
            pol = jnp.where(diag, 1.0, pol)
            m = jnp.max(logits, axis=-1, keepdims=True)
            m = jnp.where(jnp.isfinite(m), m, 0.0)
            e = jnp.exp(logits - m) * pol
            w = (e + eps / s) / (jnp.sum(e, axis=-1, keepdims=True) + eps)
        return jnp.einsum(
            "bhqk,bkhd->bqhd", w, vf, preferred_element_type=jnp.float32
        ).astype(q.dtype)

    block = jax.checkpoint(block)

    def body(_, args):
        return None, block(args)

    _, out = jax.lax.scan(
        body, None, (qb, jnp.arange(nblocks, dtype=jnp.int32))
    )
    out = out.transpose(1, 0, 2, 3, 4).reshape(b, nblocks * block_q, h, d)
    return out[:, :s]
