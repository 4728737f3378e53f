"""Keep/drop predictor networks.

Functional re-implementations of the reference predictor heads
(/root/reference/llava/model/language_model/dynamic_modeling_llama.py:1308-1387)
and their timm-style ViT blocks (custom_transformer_layer.py:86-323):

* ``VisionPredictor``: LN → Linear(D→d_model) → GELU, then ``num_layers``
  pre-LN self-attention blocks (qkv has no bias), then a local/global channel
  split — first half of channels per token, second half policy-weighted
  mean-pooled over kept tokens and broadcast — then an MLP head to 2-class
  keep/drop logits.
* ``TextPredictor``: per-token MLP LN → d → d/2 → d/4 → 2 with GELUs.

Params are plain pytrees; weights are stored [in, out] so forward is x @ W.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..config import LlamaConfig, SparseConfig
from ..ops.attention import attend
from ..ops.norm import layer_norm


def _linear(key, d_in, d_out, dtype, bias=True):
    k1, _ = jax.random.split(key)
    p = {"w": jax.random.normal(k1, (d_in, d_out), dtype) * jnp.asarray(0.02, dtype)}
    if bias:
        p["b"] = jnp.zeros((d_out,), dtype)
    return p


def _apply_linear(p, x):
    y = x @ p["w"]
    if "b" in p:
        y = y + p["b"]
    return y


def init_vit_block(key, dim, mlp_hidden, dtype):
    ks = jax.random.split(key, 4)
    return {
        "norm1": {"w": jnp.ones((dim,), dtype), "b": jnp.zeros((dim,), dtype)},
        "qkv": _linear(ks[0], dim, dim * 3, dtype, bias=False),
        "proj": _linear(ks[1], dim, dim, dtype),
        "norm2": {"w": jnp.ones((dim,), dtype), "b": jnp.zeros((dim,), dtype)},
        "fc1": _linear(ks[2], dim, mlp_hidden, dtype),
        "fc2": _linear(ks[3], mlp_hidden, dim, dtype),
    }


def vit_block(p, x, num_heads: int):
    b, n, c = x.shape
    h = layer_norm(x, p["norm1"]["w"], p["norm1"]["b"])
    qkv = _apply_linear(p["qkv"], h).reshape(b, n, 3, num_heads, c // num_heads)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # [B,N,H,dh]
    o = attend(q, k, v).reshape(b, n, c)
    x = x + _apply_linear(p["proj"], o)
    h = layer_norm(x, p["norm2"]["w"], p["norm2"]["b"])
    x = x + _apply_linear(p["fc2"], jax.nn.gelu(_apply_linear(p["fc1"], h)))
    return x


def init_vision_predictor(
    key, input_dim: int, sparse: SparseConfig, dtype=jnp.float32
):
    ks = jax.random.split(key, sparse.num_layers + 4)
    d = sparse.d_model
    return {
        "down_norm": {
            "w": jnp.ones((input_dim,), dtype),
            "b": jnp.zeros((input_dim,), dtype),
        },
        "down": _linear(ks[0], input_dim, d, dtype),
        "blocks": [
            init_vit_block(ks[1 + i], d, sparse.dim_feedforward, dtype)
            for i in range(sparse.num_layers)
        ],
        "out1": _linear(ks[-3], d, d // 2, dtype),
        "out2": _linear(ks[-2], d // 2, d // 4, dtype),
        "out3": _linear(ks[-1], d // 4, 2, dtype),
    }


def vision_predictor(
    p,
    x: jax.Array,  # [B, N, D] image-token hidden states at the sparse layer
    sparse: SparseConfig,
    image_policy: Optional[jax.Array] = None,  # [B, N, 1] soft keep mask
) -> jax.Array:
    """Returns 2-class logits [B, N, 2] (channel 0 = keep)."""
    if image_policy is None:
        image_policy = jnp.ones(x.shape[:2] + (1,), jnp.float32)
    h = layer_norm(x, p["down_norm"]["w"], p["down_norm"]["b"])
    h = jax.nn.gelu(_apply_linear(p["down"], h))
    h = h * image_policy.astype(h.dtype)
    for blk in p["blocks"]:
        h = vit_block(blk, h, sparse.nhead)
    b, n, c = h.shape
    local = h[:, :, : c // 2]
    pol = image_policy.astype(h.dtype)
    glob = jnp.sum(h[:, :, c // 2 :] * pol, axis=1, keepdims=True) / jnp.sum(
        pol, axis=1, keepdims=True
    )
    h = jnp.concatenate([local, jnp.broadcast_to(glob, (b, n, c // 2))], axis=-1)
    h = jax.nn.gelu(_apply_linear(p["out1"], h))
    h = jax.nn.gelu(_apply_linear(p["out2"], h))
    return _apply_linear(p["out3"], h)


def init_text_predictor(key, input_dim: int, sparse: SparseConfig, dtype=jnp.float32,
                        keep_bias: float = 0.0):
    """``keep_bias`` > 0 starts the predictor at (near) keep-everything —
    the prune-in curriculum for finetuning from a dense checkpoint: with a
    symmetric random init the Gumbel mask drops ~half of everything at
    step 0, the CE spike pushes the token-independent output bias toward
    keep-all, and the saturated straight-through gradient cannot recover
    (measured, run/text_sparse_quality.py). Starting keep-biased lets the
    mask-ratio loss prune gradually while the CE defends only the tokens
    that matter. 0.0 preserves the reference's symmetric init."""
    ks = jax.random.split(key, 4)
    d = sparse.d_model
    fc4 = _linear(ks[3], d // 4, 2, dtype)
    if keep_bias:
        fc4["b"] = fc4["b"].at[0].add(jnp.asarray(keep_bias, dtype))
    return {
        "norm": {
            "w": jnp.ones((input_dim,), dtype),
            "b": jnp.zeros((input_dim,), dtype),
        },
        "fc1": _linear(ks[0], input_dim, d, dtype),
        "fc2": _linear(ks[1], d, d // 2, dtype),
        "fc3": _linear(ks[2], d // 2, d // 4, dtype),
        "fc4": fc4,
    }


def text_predictor(p, x: jax.Array) -> jax.Array:
    """Per-token keep/drop logits [..., 2] (channel 0 = keep)."""
    h = layer_norm(x, p["norm"]["w"], p["norm"]["b"])
    h = jax.nn.gelu(_apply_linear(p["fc1"], h))
    h = jax.nn.gelu(_apply_linear(p["fc2"], h))
    h = jax.nn.gelu(_apply_linear(p["fc3"], h))
    return _apply_linear(p["fc4"], h)


def init_predictors(key, cfg: LlamaConfig, sparse: SparseConfig, dtype=jnp.float32,
                    text_keep_bias: float = 0.0):
    """Predictor param bundle keyed like the reference modules
    (image_score_predictor / output_text_score_predictor /
    instruct_score_predictor, dynamic_modeling_llama.py:1614-1643).
    ``text_keep_bias`` applies the prune-in init to both text predictors
    (see ``init_text_predictor``)."""
    ks = jax.random.split(key, 3)
    params = {}
    if sparse.use_vision_predictor:
        params["image_score_predictor"] = init_vision_predictor(
            ks[0], cfg.hidden_size, sparse, dtype
        )
    if sparse.use_output_text_predictor:
        params["output_text_score_predictor"] = init_text_predictor(
            ks[1], cfg.hidden_size, sparse, dtype, keep_bias=text_keep_bias
        )
    if sparse.use_instruct_predictor:
        params["instruct_score_predictor"] = init_text_predictor(
            ks[2], cfg.hidden_size, sparse, dtype, keep_bias=text_keep_bias
        )
    return params
