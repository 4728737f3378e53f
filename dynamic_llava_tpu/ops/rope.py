"""Rotary position embeddings.

TPU-native redesign of the reference RoPE machinery
(/root/reference/llava/model/language_model/dynamic_modeling_llama.py:145-285).

Key design delta (SURVEY.md §7.3): instead of the reference's
``kv_seq_len_for_position`` arithmetic that reconstructs positions from
pre-pruning cache lengths, positions are *explicit arrays* carried alongside
hidden states. After token pruning, the surviving tokens keep their original
position ids, so rotary phases stay consistent — there is exactly one
position mechanism for dense, pruned-prefill, and decode paths.

Everything is computed on the fly from positions (no precomputed cos/sin
cache): a handful of VPU transcendentals fused by XLA is cheaper on TPU than
an HBM gather from a [max_len, dim] table.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import LlamaConfig, RopeScalingConfig


def rope_cos_sin(
    positions: jax.Array,  # [...] int32 positions
    head_dim: int,
    theta: float = 10000.0,
    scaling: RopeScalingConfig | None = None,
    seq_len_for_ntk: int | None = None,
    max_position_embeddings: int = 4096,
    dtype=jnp.float32,
):
    """cos/sin tables for given positions. Returns ([..., head_dim], [..., head_dim]).

    Frequencies follow the HF convention: ``inv_freq[i] = theta^(-2i/d)`` and
    the angle vector is duplicated (``concat([f, f])``) rather than
    interleaved, matching ``rotate_half`` semantics
    (dynamic_modeling_llama.py:253-262).
    """
    positions = positions.astype(jnp.float32)
    if scaling is not None and scaling.rope_type == "linear":
        positions = positions / scaling.factor
    exponents = jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim
    if scaling is not None and scaling.rope_type == "dynamic":
        # dynamic NTK (reference dynamic_modeling_llama.py:215-250, HF
        # _compute_dynamic_ntk_parameters): rescale the base when the
        # running sequence exceeds the trained context. The running length
        # is derived PER SAMPLE from the explicit position ids
        # (max + 1 over the last axis) unless passed — in-graph, so the
        # same jitted program serves every length. Clamping to
        # max_position_embeddings makes the formula yield exactly ``theta``
        # for unstretched contexts (factor*1 - factor + 1 = 1). Stateless
        # per call where HF ratchets a cache — identical within one
        # monotonically-growing generation.
        if seq_len_for_ntk is None:
            seq_len = jnp.max(positions, axis=-1) + 1.0  # [B]
        else:
            seq_len = jnp.asarray(seq_len_for_ntk, jnp.float32)
        seq_len = jnp.maximum(seq_len, float(max_position_embeddings))
        base = theta * (
            (scaling.factor * seq_len / max_position_embeddings)
            - (scaling.factor - 1)
        ) ** (head_dim / (head_dim - 2))  # [B]
        inv_freq = 1.0 / (base[..., None] ** exponents)  # [B, head_dim//2]
        freqs = positions[..., None] * inv_freq[..., None, :]
    else:
        inv_freq = 1.0 / (theta**exponents)  # [head_dim//2]
        freqs = positions[..., None] * inv_freq  # [..., head_dim//2]
    emb = jnp.concatenate([freqs, freqs], axis=-1)  # [..., head_dim]
    return jnp.cos(emb).astype(dtype), jnp.sin(emb).astype(dtype)


def rotate_half(x: jax.Array) -> jax.Array:
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    return jnp.concatenate([-x2, x1], axis=-1)


def apply_rope(
    x: jax.Array,  # [B, S, H, d]
    positions: jax.Array,  # [B, S] int32 original-token positions
    theta: float = 10000.0,
    scaling: RopeScalingConfig | None = None,
    max_position_embeddings: int = 4096,
) -> jax.Array:
    """Apply rotary embedding at the given per-token positions.

    Rotation happens in fp32 and is cast back, matching the reference's
    fp32 cos/sin path.
    """
    cos, sin = rope_cos_sin(
        positions,
        x.shape[-1],
        theta=theta,
        scaling=scaling,
        max_position_embeddings=max_position_embeddings,
    )
    cos = cos[:, :, None, :]  # broadcast over heads
    sin = sin[:, :, None, :]
    xf = x.astype(jnp.float32)
    out = xf * cos + rotate_half(xf) * sin
    return out.astype(x.dtype)


def apply_rope_for_config(x: jax.Array, positions: jax.Array, cfg: LlamaConfig):
    return apply_rope(
        x,
        positions,
        theta=cfg.rope_theta,
        scaling=cfg.rope_scaling,
        max_position_embeddings=cfg.max_position_embeddings,
    )
