"""S2 multi-scale tower + TokenPacker projector."""

import numpy as np

import jax
import jax.numpy as jnp

from dynamic_llava_tpu.config import ClipVisionConfig
from dynamic_llava_tpu.models.clip import init_clip_params, vision_tower_features
from dynamic_llava_tpu.models.towers import (
    init_tokenpacker_params,
    s2_tower_features,
    tokenpacker_project,
    tokenpacker_tower_features,
)


def _cfg():
    return ClipVisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=4,
        num_attention_heads=2, image_size=56, patch_size=14,
    )


def test_s2_multiscale_shapes_and_base_scale():
    cfg = _cfg()
    params = init_clip_params(jax.random.key(0), cfg)
    imgs = jnp.asarray(
        np.random.default_rng(0).normal(size=(2, 56, 56, 3)), jnp.float32
    )
    feats = s2_tower_features(params, cfg, imgs, scales=(56, 112))
    assert feats.shape == (2, cfg.num_patches, cfg.hidden_size * 2)
    # first channel block == plain single-scale features
    base = vision_tower_features(params, cfg, imgs)
    np.testing.assert_allclose(
        np.asarray(feats[..., : cfg.hidden_size]), np.asarray(base),
        atol=1e-5, rtol=1e-4,
    )


def test_tokenpacker_tower_and_projector():
    cfg = _cfg()
    params = init_clip_params(jax.random.key(1), cfg)
    imgs = jnp.asarray(
        np.random.default_rng(1).normal(size=(1, 56, 56, 3)), jnp.float32
    )
    single, multi = tokenpacker_tower_features(
        params, cfg, imgs, multi_layers=(1, 2, 3)
    )
    assert single.shape == (1, 16, 32)
    assert multi.shape == (1, 16, 96)

    tp = init_tokenpacker_params(
        jax.random.key(2), kv_dim=32, multi_dim=96, embed_dim=32,
        hidden_size=64, num_heads=2,
    )
    out = tokenpacker_project(tp, single, multi, raw_grid=4, scale_factor=2)
    assert out.shape == (1, 4, 64)
    assert np.isfinite(np.asarray(out)).all()
