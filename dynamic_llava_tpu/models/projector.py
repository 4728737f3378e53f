"""Multimodal projectors.

Rebuild of the reference projector zoo
(/root/reference/llava/model/multimodal_projector/builder.py:159-184):
``linear``, ``mlpNx_gelu`` (default ``mlp2x_gelu``: Linear 1024→4096, GELU,
Linear 4096→4096), and ``identity``. Params are a list of linear layers; the
GELU between them is the exact (erf) form like ``nn.GELU``.
"""

from __future__ import annotations

import re
from typing import List

import jax
import jax.numpy as jnp


def parse_projector_type(projector_type: str):
    if projector_type in ("linear", "identity"):
        return projector_type, 1
    m = re.match(r"^mlp(\d+)x_gelu$", projector_type)
    if m:
        return "mlp_gelu", int(m.group(1))
    raise ValueError(f"Unknown projector type: {projector_type}")


def init_projector_params(
    key: jax.Array,
    projector_type: str,
    mm_hidden_size: int,
    hidden_size: int,
    dtype=jnp.float32,
) -> List[dict]:
    kind, depth = parse_projector_type(projector_type)
    if kind == "identity":
        return []
    layers = []
    dims = [mm_hidden_size] + [hidden_size] * depth
    ks = jax.random.split(key, depth)
    for i in range(depth):
        w = jax.random.normal(ks[i], (dims[i], dims[i + 1]), dtype) * jnp.asarray(
            0.02, dtype
        )
        layers.append({"w": w, "b": jnp.zeros((dims[i + 1],), dtype)})
    return layers


def apply_projector(params: List[dict], x: jax.Array) -> jax.Array:
    if not params:
        return x
    for i, lp in enumerate(params):
        if i > 0:
            x = jax.nn.gelu(x, approximate=False)
        x = x @ lp["w"] + lp["b"]
    return x
