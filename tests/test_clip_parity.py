"""CLIP vision tower parity vs HF torch (fp32, CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dynamic_llava_tpu.config import ClipVisionConfig
from dynamic_llava_tpu.models import clip
from dynamic_llava_tpu.models.convert import clip_params_from_state_dict

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


@pytest.fixture(scope="module")
def hf_and_params():
    from transformers import CLIPVisionConfig as HFClipConfig, CLIPVisionModel

    hf_cfg = HFClipConfig(
        hidden_size=32,
        intermediate_size=64,
        num_hidden_layers=3,
        num_attention_heads=2,
        image_size=56,
        patch_size=14,
        hidden_act="quick_gelu",
        attn_implementation="eager",
    )
    torch.manual_seed(0)
    model = CLIPVisionModel(hf_cfg).eval()
    cfg = ClipVisionConfig.tiny()
    params = clip_params_from_state_dict(model.state_dict(), cfg)
    params = jax.tree.map(jnp.asarray, params)
    return model, cfg, params


@pytest.mark.parametrize("select_layer,select_feature", [(-2, "patch"), (-1, "cls_patch")])
def test_tower_features_match_hf(hf_and_params, select_layer, select_feature):
    model, cfg, params = hf_and_params
    rng = np.random.default_rng(0)
    imgs = rng.normal(size=(2, 3, cfg.image_size, cfg.image_size)).astype(np.float32)
    with torch.no_grad():
        out = model(torch.tensor(imgs), output_hidden_states=True)
        ref = out.hidden_states[select_layer].numpy()
    if select_feature == "patch":
        ref = ref[:, 1:]

    ours = clip.vision_tower_features(
        params,
        cfg,
        jnp.asarray(imgs.transpose(0, 2, 3, 1)),  # we use NHWC
        select_layer=select_layer,
        select_feature=select_feature,
    )
    np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-5, rtol=2e-4)


def test_projector_matches_hf_gelu(hf_and_params):
    """mlp2x_gelu projector vs a torch Sequential with the same weights."""
    import torch.nn as nn

    from dynamic_llava_tpu.models.convert import projector_params_from_state_dict
    from dynamic_llava_tpu.models.projector import apply_projector

    torch.manual_seed(1)
    seq = nn.Sequential(nn.Linear(32, 64), nn.GELU(), nn.Linear(64, 64)).eval()
    sd = {f"model.mm_projector.{k}": v for k, v in seq.state_dict().items()}
    params = jax.tree.map(jnp.asarray, projector_params_from_state_dict(sd, "mlp2x_gelu"))

    x = np.random.default_rng(2).normal(size=(2, 5, 32)).astype(np.float32)
    with torch.no_grad():
        ref = seq(torch.tensor(x)).numpy()
    ours = apply_projector(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-5, rtol=1e-4)


def test_clip_flash_dispatch_matches_xla(monkeypatch):
    """The size-based flash dispatch in ``_encoder_layer`` must be a pure
    performance knob: forcing the Pallas non-causal kernel (interpret mode on
    CPU) has to reproduce the XLA ``attend`` tower features. Guards the B=64
    serving prefill path, where the per-layer [B, H, N, N] CLIP score tensor
    is what OOMs and flash is load-bearing."""
    cfg = ClipVisionConfig.tiny(hidden_size=128, intermediate_size=256)
    params = clip.init_clip_params(jax.random.PRNGKey(0), cfg)
    imgs = jnp.asarray(
        np.random.default_rng(3).normal(size=(2, cfg.image_size, cfg.image_size, 3)),
        jnp.float32,
    )

    monkeypatch.setenv("DYNAMIC_LLAVA_FLASH", "0")
    ref = clip.vision_tower_features(params, cfg, imgs)
    monkeypatch.setenv("DYNAMIC_LLAVA_FLASH", "1")
    got = clip.vision_tower_features(params, cfg, imgs)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), atol=2e-5, rtol=2e-4
    )
