"""MPT decoder — the reference's third base family, TPU-first.

The reference's ``llava_mpt.py`` is a thin shim over HF ``MptForCausalLM``
(/root/reference/llava/model/language_model/llava_mpt.py:34-60); its dense
LLaVA-MPT checkpoints differ from the LLaMA family in the decoder only:
ALiBi position bias instead of RoPE, a fused Wqkv projection, bias-free
LayerNorm instead of RMSNorm, a plain 4x GELU MLP instead of the gated
SiLU one, and a tied lm_head. This module follows the repo's LLaMA layout
conventions — stacked [L, ...] parameter leaves scanned by index, the
shared static ``KVCache``, attention through the ``ops.attention`` oracle
(which carries the ALiBi bias; the flash kernels are rope-family-only, and
MPT here is a dense eval/serving baseline exactly as in the reference).

ALiBi semantics: HF builds a key-position-linear tensor
``slope_h * (k - S + 1)`` (modeling_mpt.build_mpt_alibi_tensor) and relies
on softmax shift-invariance; the relative form ``slope_h * (k_pos - q_pos)``
used here differs per query row by a constant and is therefore
softmax-identical — pinned by the HF parity tests.
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import MptConfig
from ..ops.attention import attend, make_attention_mask
from ..ops.kv_cache import KVCache, write_token_layers
from ..ops.norm import layer_norm


def alibi_slopes(n_heads: int, alibi_bias_max: int = 8) -> np.ndarray:
    """Per-head ALiBi slopes, HF/MPT order (power-of-2 padding, then the
    odd-index heads first when n_heads is not a power of two)."""
    n_pow2 = 2 ** math.ceil(math.log2(n_heads))
    base = np.arange(1, n_pow2 + 1, dtype=np.float64) * (
        alibi_bias_max / n_pow2
    )
    slopes = 1.0 / np.power(2.0, base)
    if n_pow2 != n_heads:
        slopes = np.concatenate([slopes[1::2], slopes[::2]])[:n_heads]
    return slopes.astype(np.float32)


def alibi_bias(
    cfg: MptConfig,
    q_pos: jax.Array,  # [B, Sq] int32
    k_pos: jax.Array,  # [B, Sk] or [Sk] int32
) -> jax.Array:
    """Relative-form ALiBi: [B, H, Sq, Sk] = slope_h * (k_pos - q_pos).
    Negative for past keys; softmax-equivalent to HF's key-linear tensor."""
    if k_pos.ndim == 1:
        k_pos = k_pos[None]
    rel = (k_pos[:, None, :] - q_pos[:, :, None]).astype(jnp.float32)
    slopes = jnp.asarray(alibi_slopes(cfg.n_heads, cfg.alibi_bias_max))
    return rel[:, None] * slopes[None, :, None, None]


def init_mpt_params(key: jax.Array, cfg: MptConfig, dtype=jnp.float32):
    """Random init with HF's truncated-normal-ish scale (bench/test use)."""
    d, f = cfg.d_model, cfg.expansion_ratio * cfg.d_model
    l = cfg.n_layers
    keys = jax.random.split(key, 6)

    def w(k, shape, scale=0.02):
        return (jax.random.normal(k, shape) * scale).astype(dtype)

    return {
        "wte": w(keys[0], (cfg.vocab_size, d)),
        "layers": {
            "norm1": jnp.ones((l, d), dtype),
            "wqkv": w(keys[1], (l, d, 3 * d)),
            "out": w(keys[2], (l, d, d)),
            "norm2": jnp.ones((l, d), dtype),
            "up": w(keys[3], (l, d, f)),
            "down": w(keys[4], (l, f, d)),
        },
        "final_ln": jnp.ones((d,), dtype),
        # untied checkpoints carry a separate head (the reference's
        # LlavaMptForCausalLM constructs one explicitly, llava_mpt.py:52)
        **({} if cfg.tie_word_embeddings else {
            "lm_head": w(keys[5], (d, cfg.vocab_size)),
        }),
    }


def mpt_params_from_state_dict(sd: dict, cfg: MptConfig, dtype=jnp.float32):
    """Convert an HF MptForCausalLM state dict (torch [out, in] linears ->
    [in, out]; per-layer tensors stacked along a leading L axis)."""

    def t(name):
        arr = sd[name]
        arr = arr.numpy() if hasattr(arr, "numpy") else np.asarray(arr)
        return arr.astype(np.float32)

    def stack(fmt, transpose=False):
        mats = [t(fmt.format(i)) for i in range(cfg.n_layers)]
        if transpose:
            mats = [m.T for m in mats]
        return jnp.asarray(np.stack(mats), dtype)

    p = "transformer."
    params = {
        "wte": jnp.asarray(t(p + "wte.weight"), dtype),
        "layers": {
            "norm1": stack(p + "blocks.{}.norm_1.weight"),
            "wqkv": stack(p + "blocks.{}.attn.Wqkv.weight", transpose=True),
            "out": stack(p + "blocks.{}.attn.out_proj.weight", transpose=True),
            "norm2": stack(p + "blocks.{}.norm_2.weight"),
            "up": stack(p + "blocks.{}.ffn.up_proj.weight", transpose=True),
            "down": stack(p + "blocks.{}.ffn.down_proj.weight", transpose=True),
        },
        "final_ln": jnp.asarray(t(p + "norm_f.weight"), dtype),
    }
    if not cfg.tie_word_embeddings and "lm_head.weight" in sd:
        params["lm_head"] = jnp.asarray(t("lm_head.weight").T, dtype)
    return params


def embed_tokens(params, ids: jax.Array) -> jax.Array:
    return jnp.take(params["wte"], ids, axis=0)


def lm_head(params, cfg: MptConfig, x: jax.Array) -> jax.Array:
    x = layer_norm(x, params["final_ln"], jnp.float32(0.0),
                   cfg.layer_norm_epsilon)
    w = params["wte"].T if "lm_head" not in params else params["lm_head"]
    return jnp.einsum("...d,dv->...v", x, w,
                      preferred_element_type=jnp.float32)


def index_layer(layers, i):
    return jax.tree.map(
        lambda a: jax.lax.dynamic_index_in_dim(a, i, axis=0, keepdims=False),
        layers,
    )


def _qkv(lp, cfg: MptConfig, h: jax.Array):
    b, s, _ = h.shape
    mixed = h @ lp["wqkv"]
    if cfg.clip_qkv:
        mixed = jnp.clip(mixed, -cfg.clip_qkv, cfg.clip_qkv)
    q, k, v = jnp.split(mixed, 3, axis=-1)
    shape = (b, s, cfg.n_heads, cfg.head_dim)
    return q.reshape(shape), k.reshape(shape), v.reshape(shape)


def _scale(cfg: MptConfig) -> float:
    return cfg.softmax_scale or cfg.head_dim**-0.5


def _block(lp, cfg: MptConfig, x, o):
    """Shared residual tail: attn output projection + MLP."""
    b, s, _ = x.shape
    x = x + o.reshape(b, s, -1) @ lp["out"]
    h = layer_norm(x, lp["norm2"], jnp.float32(0.0), cfg.layer_norm_epsilon)
    return x + jax.nn.gelu(h @ lp["up"], approximate=False) @ lp["down"]


def forward_dense(
    params,
    cfg: MptConfig,
    input_ids: jax.Array,  # [B, S]
    *,
    valid_len: Optional[jax.Array] = None,  # [B] mask padding keys
) -> jax.Array:
    """Full dense causal-LM forward with ALiBi; fp32 logits [B, S, V]."""
    b, s = input_ids.shape
    x = embed_tokens(params, input_ids)
    pos = jnp.broadcast_to(jnp.arange(s, dtype=jnp.int32)[None], (b, s))
    mask = make_attention_mask(
        s, s, causal=True, kv_length=valid_len, batch=b
    )
    bias = alibi_bias(cfg, pos, pos)
    layers = params["layers"]

    def body(x, li):
        lp = index_layer(layers, li)
        h = layer_norm(x, lp["norm1"], jnp.float32(0.0),
                       cfg.layer_norm_epsilon)
        q, k, v = _qkv(lp, cfg, h)
        o = attend(q, k, v, mask=mask, bias=bias, scale=_scale(cfg))
        return _block(lp, cfg, x, o), None

    x, _ = jax.lax.scan(body, x, jnp.arange(cfg.n_layers, dtype=jnp.int32))
    return lm_head(params, cfg, x)


class MptStepResult(NamedTuple):
    x: jax.Array
    cache: KVCache


def run_layers_prefill(
    params,
    cfg: MptConfig,
    x: jax.Array,  # [B, S, D] embedded, left-aligned
    positions: jax.Array,  # [B, S]
    cache: KVCache,
    valid_len: jax.Array,  # [B]
) -> MptStepResult:
    """Prefill all layers, K/V into slots [0, S); length = valid_len."""
    b, s, _ = x.shape
    mask = make_attention_mask(s, s, causal=True, batch=b)
    bias = alibi_bias(cfg, positions, positions)
    layers = params["layers"]

    def body(carry, li):
        x, ck, cv = carry
        lp = index_layer(layers, li)
        h = layer_norm(x, lp["norm1"], jnp.float32(0.0),
                       cfg.layer_norm_epsilon)
        q, k, v = _qkv(lp, cfg, h)
        ck = jax.lax.dynamic_update_slice(
            ck, k[None].astype(ck.dtype), (li, 0, 0, 0, 0)
        )
        cv = jax.lax.dynamic_update_slice(
            cv, v[None].astype(cv.dtype), (li, 0, 0, 0, 0)
        )
        o = attend(q, k, v, mask=mask, bias=bias, scale=_scale(cfg))
        return (_block(lp, cfg, x, o), ck, cv), None

    (x, ck, cv), _ = jax.lax.scan(
        body, (x, cache.k, cache.v),
        jnp.arange(cfg.n_layers, dtype=jnp.int32),
    )
    length = jnp.broadcast_to(valid_len[None, :], cache.length.shape)
    return MptStepResult(x=x, cache=KVCache(k=ck, v=cv, length=length))


def run_layers_decode(
    params,
    cfg: MptConfig,
    x: jax.Array,  # [B, 1, D]
    positions: jax.Array,  # [B, 1] current token position
    cache: KVCache,
) -> MptStepResult:
    """One decode step, all layers; same read-only-xs scan + one write as
    the LLaMA runner (models/llama.run_layers_decode). Lengths advance in
    the caller. The dense cache invariant slot==position gives the ALiBi
    key positions."""
    b = x.shape[0]
    max_len = cache.k.shape[2]
    cols = jnp.arange(max_len, dtype=jnp.int32)
    layers = params["layers"]
    scale = _scale(cfg)
    # [B, H, 1, max_len (+1 for the appended current token)]
    bias_cache = alibi_bias(cfg, positions, cols)
    bias_cur = jnp.zeros((b, cfg.n_heads, 1, 1), jnp.float32)

    def body(x, xs):
        li, ck_l, cv_l, length_l = xs
        lp = index_layer(layers, li)
        h = layer_norm(x, lp["norm1"], jnp.float32(0.0),
                       cfg.layer_norm_epsilon)
        q, k, v = _qkv(lp, cfg, h)
        k_cat = jnp.concatenate([ck_l.astype(q.dtype), k], axis=1)
        v_cat = jnp.concatenate([cv_l.astype(q.dtype), v], axis=1)
        mask = jnp.concatenate(
            [
                (cols[None, :] < length_l[:, None])[:, None, None, :],
                jnp.ones((b, 1, 1, 1), bool),
            ],
            axis=-1,
        )
        bias = jnp.concatenate([bias_cache, bias_cur], axis=-1)
        o = attend(q, k_cat, v_cat, mask=mask, bias=bias, scale=scale)
        return _block(lp, cfg, x, o), (
            k.astype(cache.k.dtype), v.astype(cache.v.dtype)
        )

    layer_ids = jnp.arange(cfg.n_layers, dtype=jnp.int32)
    x, (k_new, v_new) = jax.lax.scan(
        body, x, (layer_ids, cache.k, cache.v, cache.length)
    )
    ck, cv = write_token_layers(cache.k, cache.v, k_new, v_new, cache.length)
    return MptStepResult(x=x, cache=KVCache(k=ck, v=cv, length=cache.length))


def forward_multimodal(
    params,  # {"llm": mpt params, "vision_tower": clip, "mm_projector": ...}
    cfg: MptConfig,
    vision_cfg,  # ClipVisionConfig
    plan_token_ids: jax.Array,  # [B, S]
    plan_is_image: jax.Array,  # [B, S] bool
    plan_image_slot: jax.Array,  # [B, S] int32
    pixel_values: Optional[jax.Array],  # [B, H, W, 3] normalized
    valid_len: Optional[jax.Array] = None,
) -> jax.Array:
    """Dense multimodal forward — the LLaVA-MPT composition (the
    reference's LlavaMptForCausalLM = LlavaMetaModel mixin over MPT,
    llava_mpt.py:36-75): CLIP tower -> projector -> embedding splice ->
    ALiBi decoder. Returns fp32 logits [B, S, V]. Token positions are
    sequential (ALiBi needs nothing else); image patches occupy ordinary
    positions, exactly as in the reference's inherited HF forward."""
    from ..multimodal.fusion import fuse_embeddings
    from . import clip, projector

    x = embed_tokens(params["llm"], plan_token_ids)
    if pixel_values is not None:
        feats = clip.vision_tower_features(
            params["vision_tower"], vision_cfg, pixel_values
        )
        feats = projector.apply_projector(params["mm_projector"], feats)
        x = fuse_embeddings(x, feats, plan_is_image, plan_image_slot)

    b, s, _ = x.shape
    pos = jnp.broadcast_to(jnp.arange(s, dtype=jnp.int32)[None], (b, s))
    mask = make_attention_mask(s, s, causal=True, kv_length=valid_len, batch=b)
    bias = alibi_bias(cfg, pos, pos)
    layers = params["llm"]["layers"]

    def body(x, li):
        lp = index_layer(layers, li)
        h = layer_norm(x, lp["norm1"], jnp.float32(0.0),
                       cfg.layer_norm_epsilon)
        q, k, v = _qkv(lp, cfg, h)
        o = attend(q, k, v, mask=mask, bias=bias, scale=_scale(cfg))
        return _block(lp, cfg, x, o), None

    x, _ = jax.lax.scan(body, x, jnp.arange(cfg.n_layers, dtype=jnp.int32))
    return lm_head(params["llm"], cfg, x)


def generate_greedy(
    params,
    cfg: MptConfig,
    input_ids: jax.Array,  # [B, S] (fully valid)
    max_new_tokens: int,
    eos_token_id: Optional[int] = None,
) -> jax.Array:
    """Greedy decode with the static cache; returns [B, max_new] token ids
    (post-EOS positions repeat EOS). One jit, decode as a lax.scan."""
    from ..ops.kv_cache import init_cache

    b, s = input_ids.shape

    @jax.jit
    def run(params, input_ids):
        cache = init_cache(cfg, b, s + max_new_tokens + 1, dtype=jnp.float32)
        x = embed_tokens(params, input_ids)
        pos = jnp.broadcast_to(jnp.arange(s, dtype=jnp.int32)[None], (b, s))
        res = run_layers_prefill(
            params, cfg, x, pos, cache, jnp.full((b,), s, jnp.int32)
        )
        logits = lm_head(params, cfg, res.x)[:, s - 1]

        def step(carry, i):
            cache, logits, done = carry
            tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            if eos_token_id is not None:
                tok = jnp.where(done, eos_token_id, tok)
                done = done | (tok == eos_token_id)
            d = run_layers_decode(
                params, cfg, embed_tokens(params, tok[:, None]),
                jnp.full((b, 1), s, jnp.int32) + i,
                cache,
            )
            cache = d.cache._replace(length=d.cache.length + 1)
            return (cache, lm_head(params, cfg, d.x)[:, 0], done), tok

        (_, _, _), toks = jax.lax.scan(
            step, (res.cache, logits, jnp.zeros((b,), bool)),
            jnp.arange(max_new_tokens, dtype=jnp.int32),
        )
        return toks.T  # [B, max_new]

    return run(params, input_ids)
