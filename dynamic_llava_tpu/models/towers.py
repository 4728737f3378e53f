"""Alternative vision towers: S2 multi-scale and TokenPacker.

Rebuilds of the reference tower variants
(/root/reference/llava/model/multimodal_encoder/clip_encoder.py:105-296) and
the TokenPacker point-to-region projector
(multimodal_projector/builder.py:36-153), dispatched by
``mm_vision_tower`` / ``mm_projector_type`` like the reference builders.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

from ..config import ClipVisionConfig
from ..ops.attention import attend
from ..ops.norm import layer_norm
from .clip import _encoder_layer, patchify, vision_tower_features


# ---------------------------------------------------------------------------
# S2 multi-scale tower (reference CLIPVisionTowerS2 via s2wrapper)
# ---------------------------------------------------------------------------


def _resize_bilinear(images: jax.Array, size: int) -> jax.Array:
    b, h, w, c = images.shape
    return jax.image.resize(images, (b, size, size, c), method="bilinear")


def _split_tiles(images: jax.Array, tile: int) -> jax.Array:
    """[B, S, S, 3] -> [B*(S/t)^2, t, t, 3] in row-major tile order."""
    b, s, _, c = images.shape
    n = s // tile
    x = images.reshape(b, n, tile, n, tile, c).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b * n * n, tile, tile, c)


def _merge_tiles(feats: jax.Array, n: int, pps: int) -> jax.Array:
    """[B*n^2, pps^2, D] -> [B, n*pps, n*pps, D] spatial map."""
    bn2, _, d = feats.shape
    b = bn2 // (n * n)
    x = feats.reshape(b, n, n, pps, pps, d).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, n * pps, n * pps, d)


def _avg_pool_to(x: jax.Array, out: int) -> jax.Array:
    """Average-pool a [B, S, S, D] map to [B, out, out, D] (S divisible)."""
    b, s, _, d = x.shape
    k = s // out
    x = x.reshape(b, out, k, out, k, d)
    return x.mean(axis=(2, 4))


def s2_tower_features(
    params,
    cfg: ClipVisionConfig,
    pixel_values: jax.Array,  # [B, H, W, 3] at the base scale
    scales: Sequence[int] = (336, 672, 1008),
) -> jax.Array:
    """Multi-scale features: each scale is tiled to the base resolution,
    encoded, reassembled, pooled back to the base grid, and channel-concat
    (reference CLIPVisionTowerS2 / s2wrapper multiscale_forward).
    -> [B, num_patches, D * len(scales)]."""
    base = cfg.image_size
    pps = cfg.num_patches_per_side
    b = pixel_values.shape[0]
    outs = []
    for scale in scales:
        imgs = (
            pixel_values
            if scale == base
            else _resize_bilinear(pixel_values, scale)
        )
        n = scale // base
        tiles = _split_tiles(imgs, base) if n > 1 else imgs
        feats = vision_tower_features(params, cfg, tiles)  # [B*n^2, pps^2, D]
        grid = _merge_tiles(feats, n, pps)  # [B, n*pps, n*pps, D]
        pooled = _avg_pool_to(grid, pps) if n > 1 else grid
        outs.append(pooled.reshape(b, pps * pps, -1))
    return jnp.concatenate(outs, axis=-1)


# ---------------------------------------------------------------------------
# TokenPacker tower features (multi-layer taps) + projector
# ---------------------------------------------------------------------------


def tokenpacker_tower_features(
    params,
    cfg: ClipVisionConfig,
    pixel_values: jax.Array,
    multi_layers: Sequence[int] = (12, 16, 22, 23),
) -> Tuple[jax.Array, jax.Array]:
    """(single-level features at select_layer, channel-concat of the tapped
    layers) — reference CLIPVisionTowerTokenPacker (clip_encoder.py:190-296).
    """
    b = pixel_values.shape[0]
    dtype = params["patch_embedding"].dtype
    patches = patchify(pixel_values.astype(dtype), cfg.patch_size)
    x = patches @ params["patch_embedding"]
    cls = jnp.broadcast_to(
        params["class_embedding"][None, None, :], (b, 1, cfg.hidden_size)
    )
    x = jnp.concatenate([cls, x], axis=1)
    x = x + params["position_embedding"][None]
    x = layer_norm(x, params["pre_ln"]["w"], params["pre_ln"]["b"], cfg.layer_norm_eps)

    taps = {}
    want = set(multi_layers)
    single_idx = cfg.num_hidden_layers + cfg.select_layer + 1 if cfg.select_layer < 0 else cfg.select_layer
    want.add(single_idx)
    n_run = max(want)
    for i in range(n_run):
        lp = jax.tree.map(lambda a: a[i], params["layers"])
        x = _encoder_layer(lp, cfg, x)
        if (i + 1) in want:
            taps[i + 1] = x
    single = taps[single_idx][:, 1:]
    multi = jnp.concatenate([taps[i][:, 1:] for i in multi_layers], axis=-1)
    return single, multi


def init_tokenpacker_params(
    key: jax.Array,
    kv_dim: int = 1024,
    multi_dim: int = 4096,
    embed_dim: int = 1024,
    hidden_size: int = 4096,
    num_heads: int = 8,
    dtype=jnp.float32,
):
    ks = jax.random.split(key, 10)

    def lin(k, i, o, bias=True):
        p = {"w": jax.random.normal(k, (i, o), dtype) * jnp.asarray(0.02, dtype)}
        if bias:
            p["b"] = jnp.zeros((o,), dtype)
        return p

    def ln(d):
        return {"w": jnp.ones((d,), dtype), "b": jnp.zeros((d,), dtype)}

    return {
        "q_proj": lin(ks[0], kv_dim, embed_dim, bias=False),
        "k_proj": [lin(ks[1], multi_dim, embed_dim), lin(ks[2], embed_dim, embed_dim)],
        "v_proj": [lin(ks[3], multi_dim, embed_dim), lin(ks[4], embed_dim, embed_dim)],
        "ln_q": ln(embed_dim),
        "ln_k": ln(embed_dim),
        "ln_v": ln(embed_dim),
        # nn.MultiheadAttention: packed in-proj + out-proj
        "attn_in": lin(ks[5], embed_dim, 3 * embed_dim),
        "attn_out": lin(ks[6], embed_dim, embed_dim),
        "mlp": [lin(ks[7], embed_dim, hidden_size), lin(ks[8], hidden_size, hidden_size)],
        "num_heads": num_heads,
    }


def _apply(p, x):
    y = x @ p["w"]
    return y + p["b"] if "b" in p else y


def _mlp2(ps, x):
    return _apply(ps[1], jax.nn.gelu(_apply(ps[0], x), approximate=False))


def tokenpacker_project(
    p,
    single: jax.Array,  # [B, G^2 * s^2, kv_dim] (576 at raw_grid 24)
    multi: jax.Array,  # [B, G^2 * s^2, multi_dim]
    raw_grid: int = 24,
    scale_factor: int = 2,
) -> jax.Array:
    """Point-to-region cross attention: coarse queries (bilinear-pooled
    grid) attend only their own scale_factor^2 region of fine keys/values.
    -> [B, (raw_grid/scale_factor)^2, hidden_size]."""
    b, n_tok, kv_dim = single.shape
    g = raw_grid // scale_factor
    nh = p["num_heads"]

    key = layer_norm(_mlp2(p["k_proj"], multi), p["ln_k"]["w"], p["ln_k"]["b"], 1e-6)
    value = layer_norm(_mlp2(p["v_proj"], multi), p["ln_v"]["w"], p["ln_v"]["b"], 1e-6)

    # coarse queries: bilinear-downsample the single-level grid
    grid = single.reshape(b, raw_grid, raw_grid, kv_dim)
    qgrid = jax.image.resize(grid, (b, g, g, kv_dim), method="bilinear")
    q = _apply(p["q_proj"], qgrid.reshape(b, g * g, kv_dim))
    q = layer_norm(q, p["ln_q"]["w"], p["ln_q"]["b"], 1e-6)

    d = q.shape[-1]
    # group fine tokens into regions: [B, g, g, s, s, D] -> [B, g^2, s^2, D]
    def regions(x):
        x = x.reshape(b, g, scale_factor, g, scale_factor, d)
        x = x.transpose(0, 1, 3, 2, 4, 5)
        return x.reshape(b, g * g, scale_factor * scale_factor, d)

    k_r = regions(key)
    v_r = regions(value)

    # packed qkv in-proj (torch MultiheadAttention semantics)
    wq, wk, wv = jnp.split(p["attn_in"]["w"], 3, axis=1)
    bq, bk, bv = jnp.split(p["attn_in"]["b"], 3)
    qh = (q @ wq + bq).reshape(b, g * g, 1, nh, d // nh)
    kh = (k_r @ wk + bk).reshape(b, g * g, -1, nh, d // nh)
    vh = (v_r @ wv + bv).reshape(b, g * g, -1, nh, d // nh)

    logits = jnp.einsum(
        "bronh,brsnh->brns", qh, kh, preferred_element_type=jnp.float32
    ) * (d // nh) ** -0.5
    w = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("brns,brsnh->brnh", w, vh.astype(jnp.float32))
    out = out.reshape(b, g * g, d).astype(q.dtype)
    out = _apply(p["attn_out"], out)
    return _mlp2(p["mlp"], out)
