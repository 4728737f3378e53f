"""Length-skipping decode kernel vs the XLA oracle (interpret mode)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dynamic_llava_tpu.ops.attention import decode_attend
from dynamic_llava_tpu.ops.decode_attention import flash_decode_attention


@pytest.mark.parametrize("hkv,nrep", [(2, 1), (2, 2)])
def test_decode_kernel_matches_oracle(hkv, nrep):
    rng = np.random.default_rng(0)
    b, maxlen, d = 3, 512, 32
    h = hkv * nrep
    q = jnp.asarray(rng.normal(size=(b, 1, h, d)), jnp.float32)
    kc = jnp.asarray(rng.normal(size=(b, maxlen, hkv, d)), jnp.float32)
    vc = jnp.asarray(rng.normal(size=(b, maxlen, hkv, d)), jnp.float32)
    length = jnp.asarray([37, 255, 256], jnp.int32)
    ref = decode_attend(q, kc, vc, length)
    got = flash_decode_attention(q, kc, vc, length, block_k=128, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=3e-5, rtol=3e-4)


def test_decode_kernel_edge_lengths():
    """length 0 (only the current token) and length == max_len - 1."""
    rng = np.random.default_rng(1)
    b, maxlen, hkv, d = 2, 256, 2, 32
    q = jnp.asarray(rng.normal(size=(b, 1, hkv, d)), jnp.float32)
    kc = jnp.asarray(rng.normal(size=(b, maxlen, hkv, d)), jnp.float32)
    vc = jnp.asarray(rng.normal(size=(b, maxlen, hkv, d)), jnp.float32)
    length = jnp.asarray([0, maxlen - 1], jnp.int32)
    ref = decode_attend(q, kc, vc, length)
    got = flash_decode_attention(q, kc, vc, length, block_k=128, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=3e-5, rtol=3e-4)
