"""Dynamic-NTK RoPE parity vs HF at a stretched context (VERDICT r2 item
10 — the branch was config-plumbed but unexercised; reference
/root/reference/llava/model/language_model/dynamic_modeling_llama.py:215)."""

import numpy as np
import pytest

import jax.numpy as jnp

from dynamic_llava_tpu.config import RopeScalingConfig
from dynamic_llava_tpu.ops.rope import apply_rope, rope_cos_sin, rotate_half

torch = pytest.importorskip("torch")

MPE = 64  # tiny trained context so the test stretches it cheaply
DIM = 32


def _hf_cos_sin(position_ids: np.ndarray, factor: float, theta: float):
    """Oracle: HF LlamaRotaryEmbedding with rope_type=dynamic."""
    from transformers import LlamaConfig as HFL
    from transformers.models.llama.modeling_llama import LlamaRotaryEmbedding

    cfg = HFL(
        hidden_size=DIM * 2, num_attention_heads=2,
        max_position_embeddings=MPE, rope_theta=theta,
        rope_scaling={"rope_type": "dynamic", "factor": factor},
    )
    rot = LlamaRotaryEmbedding(config=cfg)
    x = torch.zeros(position_ids.shape[0], 1, DIM)  # dtype/device carrier
    cos, sin = rot(x, torch.asarray(position_ids, dtype=torch.long))
    return cos.numpy(), sin.numpy()


@pytest.mark.parametrize("seq_len", [48, 96, 200])
def test_dynamic_ntk_cos_sin_matches_hf(seq_len):
    """At and beyond the trained context the rescaled-base tables must
    match HF's (48 < MPE exercises the no-rescale clamp)."""
    positions = np.arange(seq_len, dtype=np.int32)[None]
    hf_cos, hf_sin = _hf_cos_sin(positions, factor=2.0, theta=10000.0)
    cos, sin = rope_cos_sin(
        jnp.asarray(positions), DIM,
        theta=10000.0,
        scaling=RopeScalingConfig(rope_type="dynamic", factor=2.0),
        max_position_embeddings=MPE,
    )
    np.testing.assert_allclose(np.asarray(cos)[0], hf_cos[0], atol=2e-5)
    np.testing.assert_allclose(np.asarray(sin)[0], hf_sin[0], atol=2e-5)


def test_dynamic_ntk_rotation_matches_hf_apply():
    """Full q rotation parity (cos*q + sin*rotate_half(q)) at 3x stretch."""
    from transformers.models.llama.modeling_llama import apply_rotary_pos_emb

    rng = np.random.default_rng(0)
    s = 3 * MPE
    q = rng.normal(size=(1, s, 2, DIM)).astype(np.float32)
    positions = np.arange(s, dtype=np.int32)[None]
    hf_cos, hf_sin = _hf_cos_sin(positions, factor=4.0, theta=10000.0)
    hf_q, _ = apply_rotary_pos_emb(
        torch.asarray(q).permute(0, 2, 1, 3),  # HF is [B, H, S, d]
        torch.asarray(q).permute(0, 2, 1, 3),
        torch.asarray(hf_cos), torch.asarray(hf_sin),
    )
    got = apply_rope(
        jnp.asarray(q), jnp.asarray(positions),
        theta=10000.0,
        scaling=RopeScalingConfig(rope_type="dynamic", factor=4.0),
        max_position_embeddings=MPE,
    )
    np.testing.assert_allclose(
        np.asarray(got), hf_q.numpy().transpose(0, 2, 1, 3), atol=3e-5
    )


def test_dynamic_ntk_decode_position_consistency():
    """A decode-step position [B, 1] derives seq_len = pos + 1 in-graph:
    the single-token table equals the corresponding row of the full-prefix
    table (the invariant the kv_seq_len_for_position arithmetic preserved
    in the reference)."""
    scaling = RopeScalingConfig(rope_type="dynamic", factor=2.0)
    pos = 150  # > MPE
    full = np.arange(pos + 1, dtype=np.int32)[None]
    cos_full, sin_full = rope_cos_sin(
        jnp.asarray(full), DIM, scaling=scaling, max_position_embeddings=MPE
    )
    cos_one, sin_one = rope_cos_sin(
        jnp.asarray([[pos]], np.int32), DIM, scaling=scaling,
        max_position_embeddings=MPE,
    )
    np.testing.assert_allclose(
        np.asarray(cos_one)[0, 0], np.asarray(cos_full)[0, -1], atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(sin_one)[0, 0], np.asarray(sin_full)[0, -1], atol=1e-6
    )


def test_linear_scaling_unchanged():
    """Regression: the linear path still divides positions by the factor."""
    positions = np.arange(8, dtype=np.int32)[None]
    cos_lin, _ = rope_cos_sin(
        jnp.asarray(positions), DIM,
        scaling=RopeScalingConfig(rope_type="linear", factor=2.0),
        max_position_embeddings=MPE,
    )
    cos_plain, _ = rope_cos_sin(jnp.asarray(positions), DIM)
    # position 2 scaled by 1/2 == unscaled position 1
    np.testing.assert_allclose(
        np.asarray(cos_lin)[0, 2], np.asarray(cos_plain)[0, 1], atol=1e-6
    )
