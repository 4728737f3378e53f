"""Pallas flash attention vs the XLA oracle (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dynamic_llava_tpu.ops.attention import attend, make_attention_mask
from dynamic_llava_tpu.ops.flash_attention import flash_attention


def _rand(shape, seed):
    return jnp.asarray(np.random.default_rng(seed).normal(size=shape), jnp.float32)


@pytest.mark.parametrize("sq,heads,kv_heads", [(160, 4, 4), (64, 4, 2)])
def test_causal_matches_oracle(sq, heads, kv_heads):
    b, d = 2, 32
    q = _rand((b, sq, heads, d), 0)
    k = _rand((b, sq, kv_heads, d), 1)
    v = _rand((b, sq, kv_heads, d), 2)
    ref = attend(q, k, v, mask=make_attention_mask(sq, sq, causal=True, batch=b))
    got = flash_attention(q, k, v, causal=True, block_q=64, block_k=128, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5, rtol=2e-4)


def test_kv_length_masking():
    b, s, h, d = 2, 96, 2, 32
    q = _rand((b, s, h, d), 3)
    k = _rand((b, s, h, d), 4)
    v = _rand((b, s, h, d), 5)
    kv_len = jnp.asarray([50, 96], jnp.int32)
    mask = make_attention_mask(s, s, causal=True, kv_length=kv_len, batch=b)
    ref = attend(q, k, v, mask=mask)
    got = flash_attention(
        q, k, v, kv_length=kv_len, causal=True, block_q=32, block_k=128, interpret=True
    )
    # compare only valid rows (padding rows are undefined in both)
    for i in range(b):
        L = int(kv_len[i])
        np.testing.assert_allclose(
            np.asarray(got[i, :L]), np.asarray(ref[i, :L]), atol=2e-5, rtol=2e-4
        )


def test_non_causal():
    b, s, h, d = 1, 64, 2, 32
    q = _rand((b, s, h, d), 6)
    k = _rand((b, s, h, d), 7)
    v = _rand((b, s, h, d), 8)
    ref = attend(q, k, v)
    got = flash_attention(q, k, v, causal=False, block_q=64, block_k=128, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5, rtol=2e-4)


def test_blockwise_attend_matches_oracle():
    """The memory-safe autodiff path equals the dense oracle (fwd + policy)."""
    from dynamic_llava_tpu.ops.attention import (
        attend_with_policy,
        blockwise_attend,
    )

    b, s, h, d = 2, 70, 2, 16  # non-multiple of the block to hit padding
    q = _rand((b, s, h, d), 10)
    k = _rand((b, s, h, d), 11)
    v = _rand((b, s, h, d), 12)
    mask = make_attention_mask(s, s, causal=True, batch=b)
    np.testing.assert_allclose(
        np.asarray(blockwise_attend(q, k, v, block_q=32)),
        np.asarray(attend(q, k, v, mask=mask)),
        atol=2e-5, rtol=2e-4,
    )
    pol = jnp.asarray(np.random.default_rng(13).integers(0, 2, (b, s)), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(blockwise_attend(q, k, v, policy=pol, block_q=32)),
        np.asarray(attend_with_policy(q, k, v, pol, mask=mask)),
        atol=2e-5, rtol=2e-4,
    )


def test_flash_bwd_kernels_match_oracle_grads():
    """True flash backward (dq/dk/dv kernels + LSE residuals) vs oracle,
    with GQA and per-batch kv lengths."""
    from dynamic_llava_tpu.ops.flash_attention import (
        flash_attention,
        flash_attention_bwd,
    )

    rng = np.random.default_rng(42)
    b, sq, h, hkv, d = 2, 70, 4, 2, 16
    q = jnp.asarray(rng.normal(size=(b, sq, h, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, sq, hkv, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, sq, hkv, d)), jnp.float32)
    kv_len = jnp.asarray([50, 70], jnp.int32)
    g = jnp.asarray(rng.normal(size=(b, sq, h, d)), jnp.float32)
    rows = np.arange(sq)
    row_mask = (rows[None, :] < np.asarray(kv_len)[:, None]).astype(np.float32)
    g = g * jnp.asarray(row_mask)[:, :, None, None]

    def oracle(q_, k_, v_):
        mask = make_attention_mask(sq, sq, causal=True, kv_length=kv_len, batch=b)
        return attend(q_, k_, v_, mask=mask) * jnp.asarray(row_mask)[:, :, None, None]

    _, vjp = jax.vjp(oracle, q, k, v)
    refs = vjp(g)

    out, lse = flash_attention(
        q, k, v, kv_length=kv_len, causal=True, block_q=32, block_k=32,
        interpret=True, save_residuals=True,
    )
    got = flash_attention_bwd(
        q, k, v, out, lse, g, kv_length=kv_len, causal=True,
        block_q=32, block_k=32, interpret=True,
    )
    for a, r in zip(got, refs):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r), atol=3e-4, rtol=3e-3)
