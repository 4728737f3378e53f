"""Device mesh + parameter sharding rules.

TPU-native replacement for the reference's DeepSpeed ZeRO-3 / NCCL stack
(/root/reference/run/train_dynamic_llava_7b.sh:3-4, SURVEY.md §2.8): a
``jax.sharding.Mesh`` with axes

* ``data``   — data parallelism (batch dimension),
* ``fsdp``   — ZeRO-3-style parameter/optimizer sharding; XLA inserts the
  per-layer all-gathers and reduce-scatters over ICI,
* ``tensor`` — Megatron-style tensor parallelism over attention heads and
  MLP hidden (the reference's ``pretraining_tp`` emulation, made real),
* ``pipe``   — GPipe pipeline parallelism over the layer-stacked axis
  (``parallel.pipeline``); size 1 unless pipeline training is on.

Rules are expressed as ``PartitionSpec`` pytrees mirroring the parameter
pytrees; ``jit`` in/out shardings + GSPMD propagation do the rest — no
hand-written collectives. The one exception is the ``pipe`` axis, which is
manual by construction (``jax.shard_map`` + ``ppermute`` microbatch
schedule); GSPMD still manages the other three axes inside it.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import LlamaConfig, LlavaConfig

MESH_AXES = ("data", "fsdp", "tensor", "pipe")


def make_mesh(
    data: int = 1,
    fsdp: int = -1,
    tensor: int = 1,
    pipe: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if fsdp == -1:
        fsdp = n // (data * tensor * pipe)
    assert data * fsdp * tensor * pipe == n, (data, fsdp, tensor, pipe, n)
    arr = np.asarray(devices).reshape(data, fsdp, tensor, pipe)
    return Mesh(arr, MESH_AXES)


def llama_param_specs(cfg: LlamaConfig, pipe: bool = False) -> dict:
    """PartitionSpecs mirroring ``models.llama.init_llama_params``.

    Layer-stacked weights are [L, in, out]; 'fsdp' shards the in dim and
    'tensor' shards the per-head / hidden dims (swapped for the projections
    that contract over them). With ``pipe=True`` the stacked layer axis is
    additionally sharded over 'pipe' (pipeline stages own contiguous layer
    blocks — the stack must be in pipeline order, ``parallel.pipeline``).
    """
    lax0 = "pipe" if pipe else None
    specs = {
        "embed": P("tensor", "fsdp"),
        "layers": {
            "input_ln": P(lax0, None),
            "post_ln": P(lax0, None),
            "q": P(lax0, "fsdp", "tensor"),
            "k": P(lax0, "fsdp", "tensor"),
            "v": P(lax0, "fsdp", "tensor"),
            "o": P(lax0, "tensor", "fsdp"),
            "gate": P(lax0, "fsdp", "tensor"),
            "up": P(lax0, "fsdp", "tensor"),
            "down": P(lax0, "tensor", "fsdp"),
        },
        "final_ln": P(None),
        "lm_head": P("fsdp", "tensor"),
    }
    if cfg.tie_word_embeddings:
        specs.pop("lm_head")
    return specs


def clip_param_specs() -> dict:
    ln = {"w": P(None), "b": P(None)}
    return {
        "class_embedding": P(None),
        "patch_embedding": P(None, "fsdp"),
        "position_embedding": P(None, "fsdp"),
        "pre_ln": ln,
        "layers": {
            "ln1_w": P(None, None), "ln1_b": P(None, None),
            "ln2_w": P(None, None), "ln2_b": P(None, None),
            "q_w": P(None, "fsdp", "tensor"), "q_b": P(None, "tensor"),
            "k_w": P(None, "fsdp", "tensor"), "k_b": P(None, "tensor"),
            "v_w": P(None, "fsdp", "tensor"), "v_b": P(None, "tensor"),
            "o_w": P(None, "tensor", "fsdp"), "o_b": P(None, None),
            "fc1_w": P(None, "fsdp", "tensor"), "fc1_b": P(None, "tensor"),
            "fc2_w": P(None, "tensor", "fsdp"), "fc2_b": P(None, None),
        },
        "post_ln": ln,
    }


def _replicated_like(tree):
    return jax.tree.map(lambda _: P(), tree)


def llava_param_specs(cfg: LlavaConfig, params, pipe: bool = False) -> dict:
    """Specs for the full bundle. Predictors and projector are tiny —
    replicate them (sharding a 512-wide MLP wastes collectives)."""
    llm_specs = llama_param_specs(cfg.text, pipe=pipe)
    lax0 = "pipe" if pipe else None
    for key in params["llm"]["layers"]:
        if key.endswith("_lora"):
            # adapters: A sharded on the input dim, B on the output dim
            llm_specs["layers"][key] = {
                "a": P(lax0, "fsdp", None),
                "b": P(lax0, None, "tensor"),
                "s": P(),
            }
    specs = {
        "llm": llm_specs,
        "vision_tower": clip_param_specs(),
        "mm_projector": _replicated_like(params["mm_projector"]),
    }
    if "predictors" in params:
        specs["predictors"] = _replicated_like(params["predictors"])
    return specs


def shard_params(params, mesh: Mesh, specs) -> dict:
    """Place a param pytree onto the mesh per the spec pytree."""
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        params,
        specs,
        is_leaf=lambda x: isinstance(x, P),
    )


def batch_specs(tree) -> dict:
    """Shard the leading batch dim of every array over 'data'."""
    return jax.tree.map(lambda _: P("data"), tree)
