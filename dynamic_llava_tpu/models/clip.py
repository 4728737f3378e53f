"""CLIP ViT vision tower — TPU-native.

Functional rebuild of the reference ``CLIPVisionTower``
(/root/reference/llava/model/multimodal_encoder/clip_encoder.py:7-102) on the
HF ``CLIPVisionModel`` architecture:

* Patch embedding is a single matmul: the stride-p conv is algebraically a
  reshape to [B, N, p*p*3] followed by ``@ W`` — one big MXU matmul instead
  of a convolution.
* Encoder layers are stacked and scanned. Because the default feature tap is
  ``hidden_states[-2]`` (mm_vision_select_layer=-2, clip_encoder.py:43-50),
  we simply *do not run* the layers above the tap — the reference computes
  the full tower and discards the top.
* quick_gelu activation (HF CLIP default), fp32 layer norms.

The tower is frozen in all training recipes (train_sparse.py freezes it), so
there is no init here — params come from the converter
(``convert.clip_params_from_state_dict``) or ``init_clip_params`` for tests.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..config import ClipVisionConfig
from ..ops.attention import attend, flash_enabled
from ..ops.norm import layer_norm


def quick_gelu(x: jax.Array) -> jax.Array:
    return x * jax.nn.sigmoid(1.702 * x)


def init_clip_params(key: jax.Array, cfg: ClipVisionConfig, dtype=jnp.float32):
    d, f, n = cfg.hidden_size, cfg.intermediate_size, cfg.num_hidden_layers
    patch_dim = cfg.patch_size * cfg.patch_size * 3
    ks = jax.random.split(key, 10)

    def init(k, shape, scale=0.02):
        return jax.random.normal(k, shape, dtype) * jnp.asarray(scale, dtype)

    def ln_stack():
        return jnp.ones((n, d), dtype), jnp.zeros((n, d), dtype)

    ln1_w, ln1_b = ln_stack()
    ln2_w, ln2_b = ln_stack()
    return {
        "class_embedding": init(ks[0], (d,)),
        "patch_embedding": init(ks[1], (patch_dim, d)),
        "position_embedding": init(ks[2], (cfg.num_positions, d)),
        "pre_ln": {"w": jnp.ones((d,), dtype), "b": jnp.zeros((d,), dtype)},
        "layers": {
            "ln1_w": ln1_w, "ln1_b": ln1_b, "ln2_w": ln2_w, "ln2_b": ln2_b,
            "q_w": init(ks[3], (n, d, d)), "q_b": jnp.zeros((n, d), dtype),
            "k_w": init(ks[4], (n, d, d)), "k_b": jnp.zeros((n, d), dtype),
            "v_w": init(ks[5], (n, d, d)), "v_b": jnp.zeros((n, d), dtype),
            "o_w": init(ks[6], (n, d, d)), "o_b": jnp.zeros((n, d), dtype),
            "fc1_w": init(ks[7], (n, d, f)), "fc1_b": jnp.zeros((n, f), dtype),
            "fc2_w": init(ks[8], (n, f, d)), "fc2_b": jnp.zeros((n, d), dtype),
        },
        "post_ln": {"w": jnp.ones((d,), dtype), "b": jnp.zeros((d,), dtype)},
    }


def patchify(images: jax.Array, patch_size: int) -> jax.Array:
    """[B, H, W, 3] -> [B, N, p*p*3] in (row-in-patch, col-in-patch, channel)
    order, matching the conv-kernel flattening in the converter."""
    b, h, w, c = images.shape
    p = patch_size
    x = images.reshape(b, h // p, p, w // p, p, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # [B, h', w', p, p, C]
    return x.reshape(b, (h // p) * (w // p), p * p * c)


def _encoder_layer(lp, cfg: ClipVisionConfig, x: jax.Array) -> jax.Array:
    b, n, d = x.shape
    nh = cfg.num_attention_heads
    h = layer_norm(x, lp["ln1_w"], lp["ln1_b"], cfg.layer_norm_eps)
    q = (h @ lp["q_w"] + lp["q_b"]).reshape(b, n, nh, d // nh)
    k = (h @ lp["k_w"] + lp["k_b"]).reshape(b, n, nh, d // nh)
    v = (h @ lp["v_w"] + lp["v_b"]).reshape(b, n, nh, d // nh)
    # Same size-based dispatch as the decoder: XLA's fused attention wins
    # while the [B, H, N, N] fp32 score tensor fits (all B<=8 paths), but at
    # large serving batches it becomes the prefill's HBM ceiling — B=64
    # 7B-int4 prefill OOMed on 23 layers x 1.36 GB of CLIP score transients.
    # The flash kernel (non-causal) never materializes it.
    if flash_enabled(d // nh, b * nh * n * n * 4):
        from ..ops.flash_attention import flash_attention_vjp

        o = flash_attention_vjp(q, k, v, causal=False).reshape(b, n, d)
    else:
        o = attend(q, k, v).reshape(b, n, d)
    x = x + o @ lp["o_w"] + lp["o_b"]
    h = layer_norm(x, lp["ln2_w"], lp["ln2_b"], cfg.layer_norm_eps)
    x = x + quick_gelu(h @ lp["fc1_w"] + lp["fc1_b"]) @ lp["fc2_w"] + lp["fc2_b"]
    return x


def vision_tower_features(
    params,
    cfg: ClipVisionConfig,
    pixel_values: jax.Array,  # [B, H, W, 3] normalized (NHWC!)
    *,
    select_layer: Optional[int] = None,
    select_feature: Optional[str] = None,
) -> jax.Array:
    """Image features at the selected hidden layer. Returns
    [B, num_patches, D] (``patch``) or [B, num_patches+1, D] (``cls_patch``).
    """
    select_layer = cfg.select_layer if select_layer is None else select_layer
    select_feature = (
        cfg.select_feature if select_feature is None else select_feature
    )
    b = pixel_values.shape[0]
    dtype = params["patch_embedding"].dtype
    patches = patchify(pixel_values.astype(dtype), cfg.patch_size)
    x = patches @ params["patch_embedding"]  # [B, N, D]
    cls = jnp.broadcast_to(
        params["class_embedding"][None, None, :], (b, 1, cfg.hidden_size)
    )
    x = jnp.concatenate([cls, x], axis=1)
    x = x + params["position_embedding"][None]
    x = layer_norm(x, params["pre_ln"]["w"], params["pre_ln"]["b"], cfg.layer_norm_eps)

    # hidden_states[k] in HF is the input of layer k (embeddings = index 0),
    # so tapping index L+select (negative select) means running the first
    # L + select_layer + 1 layers.
    n_layers = cfg.num_hidden_layers
    if select_layer < 0:
        n_run = n_layers + select_layer + 1
    else:
        n_run = select_layer
    sliced = jax.tree.map(lambda a: a[:n_run], params["layers"])

    def body(x, lp):
        return _encoder_layer(lp, cfg, x), None

    x, _ = jax.lax.scan(body, x, sliced)

    if select_feature == "patch":
        return x[:, 1:]
    if select_feature == "cls_patch":
        return x
    raise ValueError(f"unexpected select_feature: {select_feature}")
