"""Flash-aware remat policy: gradient equivalence + recompute DCE.

The "flash"/"flash_dots" policies (models.llama._remat_policy) save the
attention outputs (+ FA2 logsumexp) by checkpoint_name, so the layer
backward never re-runs an attention forward — the point of the
attach-bwd structure in ops/flash_attention.py / ops/flash_policy.py,
where every backward residual is a plain custom_vjp INPUT visible to the
remat partial-eval. Verified two ways: grads bit-match the no-remat
truth, and the forward kernel is dead code in the recompute (counted as
pallas_call occurrences in the grad jaxpr).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dynamic_llava_tpu.config import LlamaConfig
from dynamic_llava_tpu.models import llama

CFG = LlamaConfig(
    vocab_size=64,
    hidden_size=64,
    intermediate_size=128,
    num_hidden_layers=2,
    num_attention_heads=4,
    num_key_value_heads=4,
)

POLICIES = ("nothing", "dots", "flash", "flash_dots", "alternate")


def _setup(with_policy: bool, seed: int = 0):
    key = jax.random.key(seed)
    params = llama.init_llama_params(key, CFG, jnp.float32)
    b, s = 2, 32
    x = jax.random.normal(jax.random.key(1), (b, s, CFG.hidden_size), jnp.float32)
    positions = jnp.broadcast_to(jnp.arange(s, dtype=jnp.int32)[None], (b, s))
    policy = None
    if with_policy:
        policy = (
            jax.random.uniform(jax.random.key(2), (b, s)) > 0.3
        ).astype(jnp.float32)
    return params, x, positions, policy


def _grad_fn(remat, remat_policy):
    def loss(params, x, positions, policy):
        y = llama.run_layers_nocache(
            params, CFG, x, positions, policy=policy, remat=remat,
            remat_policy=remat_policy, training=True,
        )
        return jnp.sum(y * y)

    return jax.grad(loss, argnums=(0, 1))


@pytest.mark.parametrize("with_policy", [False, True])
@pytest.mark.parametrize("remat_policy", POLICIES)
def test_remat_grads_match_no_remat(with_policy, remat_policy, monkeypatch):
    # force the Pallas kernels (interpret mode on CPU) so the saved-name
    # path is the one exercised
    monkeypatch.setenv("DYNAMIC_LLAVA_FLASH", "1")
    args = _setup(with_policy)
    ref = _grad_fn(False, "nothing")(*args)
    got = _grad_fn(True, remat_policy)(*args)
    for r, g in zip(jax.tree.leaves(ref), jax.tree.leaves(got)):
        np.testing.assert_allclose(np.asarray(r), np.asarray(g),
                                   rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("with_policy", [False, True])
def test_flash_policy_skips_attention_recompute(with_policy, monkeypatch):
    """The grad jaxpr under remat_policy='flash' must contain exactly one
    attention-forward pallas_call fewer than under 'nothing': the backward
    recompute no longer re-runs it (per scanned-body trace region)."""
    monkeypatch.setenv("DYNAMIC_LLAVA_FLASH", "1")
    args = _setup(with_policy)

    def count(remat_policy):
        jaxpr = jax.make_jaxpr(_grad_fn(True, remat_policy))(*args)
        return str(jaxpr).count("pallas_call")

    n_nothing, n_flash = count("nothing"), count("flash")
    # policy path: fwd kernel in primal + in recompute, XLA-oracle bwd
    #   -> 2 vs 1; FA2 path: fwd twice + dkv + dq kernels -> 4 vs 3
    expected = (2, 1) if with_policy else (4, 3)
    assert (n_nothing, n_flash) == expected, (n_nothing, n_flash)


def test_unknown_remat_policy_rejected():
    with pytest.raises(AssertionError):
        llama._remat_policy("bogus")
