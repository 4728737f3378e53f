"""Fused policy-attention kernel vs the XLA oracle (interpret mode)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dynamic_llava_tpu.ops.attention import attend_with_policy, make_attention_mask
from dynamic_llava_tpu.ops.flash_policy import (
    flash_policy_attention,
    flash_policy_attention_vjp,
)


def _inputs(b=2, s=48, h=2, d=16, seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.normal(size=(b, s, h, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, s, h, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, s, h, d)), jnp.float32)
    pol = jnp.asarray(rng.integers(0, 2, size=(b, s)), jnp.float32)
    return q, k, v, pol


def _oracle(q, k, v, pol):
    b, s = q.shape[0], q.shape[1]
    mask = make_attention_mask(s, s, causal=True, batch=b)
    return attend_with_policy(q, k, v, pol, mask=mask)


@pytest.mark.parametrize("blocks", [(16, 16), (32, 48)])
def test_policy_kernel_matches_oracle(blocks):
    q, k, v, pol = _inputs()
    ref = _oracle(q, k, v, pol)
    got = flash_policy_attention(
        q, k, v, pol, block_q=blocks[0], block_k=blocks[1], interpret=True
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=3e-5, rtol=3e-4)


def test_policy_soft_mask_values():
    """Soft (non-binary) Gumbel masks also match."""
    q, k, v, _ = _inputs(seed=1)
    rng = np.random.default_rng(2)
    pol = jnp.asarray(rng.uniform(0, 1, size=(2, 48)), jnp.float32)
    ref = _oracle(q, k, v, pol)
    got = flash_policy_attention(q, k, v, pol, block_q=16, block_k=16, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=3e-5, rtol=3e-4)


def test_policy_vjp_matches_oracle_grads():
    q, k, v, pol = _inputs(s=32, seed=3)

    import dynamic_llava_tpu.ops.flash_policy as fp

    orig = fp.flash_policy_attention
    fp.flash_policy_attention = lambda *a, **kw: orig(
        *a, interpret=True, **{x: y for x, y in kw.items() if x != "interpret"}
    )
    try:
        def loss_fused(q, k, v, p):
            return jnp.sum(flash_policy_attention_vjp(q, k, v, p) ** 2)

        def loss_ref(q, k, v, p):
            return jnp.sum(_oracle(q, k, v, p) ** 2)

        gf = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(q, k, v, pol)
        gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(q, k, v, pol)
        for a, b in zip(gf, gr):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=3e-4, rtol=3e-3
            )
    finally:
        fp.flash_policy_attention = orig
