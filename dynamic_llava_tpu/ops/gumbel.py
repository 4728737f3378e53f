"""Gumbel-softmax with straight-through hard sampling.

JAX equivalent of ``F.gumbel_softmax(logits, tau=tau, hard=True)`` used by
the reference's training-time keep/drop decisions
(/root/reference/llava/model/language_model/dynamic_modeling_llama.py:1836,
2063, 2189). Runs in fp32 for bf16 training stability.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def gumbel_softmax(
    key: jax.Array,
    logits: jax.Array,  # [..., C]
    tau: float | jax.Array,
    hard: bool = True,
) -> jax.Array:
    logits = logits.astype(jnp.float32)
    u = jax.random.uniform(
        key, logits.shape, jnp.float32, minval=jnp.finfo(jnp.float32).tiny, maxval=1.0
    )
    g = -jnp.log(-jnp.log(u))
    y_soft = jax.nn.softmax((logits + g) / tau, axis=-1)
    if not hard:
        return y_soft
    idx = jnp.argmax(y_soft, axis=-1)
    y_hard = jax.nn.one_hot(idx, logits.shape[-1], dtype=jnp.float32)
    # straight-through: forward hard, backward soft
    return y_hard + y_soft - jax.lax.stop_gradient(y_soft)


def gumbel_keep_mask(
    key: jax.Array,
    logits: jax.Array,  # [..., 2] — channel 0 = keep, channel 1 = drop
    tau: float | jax.Array,
) -> jax.Array:
    """Hard ST keep mask in [0, 1] (channel-0 of the one-hot sample)."""
    return gumbel_softmax(key, logits, tau, hard=True)[..., 0]


def ste_argmax_keep(logits: jax.Array) -> jax.Array:
    """Deterministic straight-through argmax keep decision (reference
    ``ste_argmax``, dynamic_modeling_llama.py:1394-1401)."""
    logits = logits.astype(jnp.float32)
    y_soft = jax.nn.softmax(logits, axis=-1)
    idx = jnp.argmax(y_soft, axis=-1)
    y_hard = jax.nn.one_hot(idx, logits.shape[-1], dtype=jnp.float32)
    return (y_hard + y_soft - jax.lax.stop_gradient(y_soft))[..., 0]
