"""Vision tokenizer initialization.

Rebuild of ``initialize_vision_tokenizer``
(/root/reference/llava/model/dynamic_llava_arch.py:605-657): add the image
special tokens, grow the embedding / lm_head matrices, and initialize the
new rows with the mean of the existing ones.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax.numpy as jnp

from ..config import LlamaConfig
from ..constants import (
    DEFAULT_IM_END_TOKEN,
    DEFAULT_IM_START_TOKEN,
    DEFAULT_IMAGE_PATCH_TOKEN,
)


def _grow_rows(mat: jnp.ndarray, n_new: int) -> jnp.ndarray:
    """Append n_new rows initialized to the column-mean (reference mean-init
    of resized embeddings)."""
    if n_new <= 0:
        return mat
    mean = jnp.mean(mat.astype(jnp.float32), axis=0, keepdims=True)
    new = jnp.broadcast_to(mean, (n_new, mat.shape[1])).astype(mat.dtype)
    return jnp.concatenate([mat, new], axis=0)


def initialize_vision_tokenizer(
    params: dict,
    cfg: LlamaConfig,
    tokenizer,
    mm_use_im_patch_token: bool = False,
    mm_use_im_start_end: bool = False,
) -> Tuple[dict, LlamaConfig, int]:
    """Returns (params with grown embed/lm_head, updated text config,
    number of added tokens). The tokenizer is mutated in place (add_tokens)."""
    added = 0
    if mm_use_im_patch_token:
        added += tokenizer.add_tokens([DEFAULT_IMAGE_PATCH_TOKEN], special_tokens=True)
    if mm_use_im_start_end:
        added += tokenizer.add_tokens(
            [DEFAULT_IM_START_TOKEN, DEFAULT_IM_END_TOKEN], special_tokens=True
        )
    if added <= 0:
        return params, cfg, 0

    llm = dict(params["llm"])
    llm["embed"] = _grow_rows(llm["embed"], added)
    if "lm_head" in llm:
        # lm_head stored [D, V]: grow columns with the mean column
        head = llm["lm_head"]
        mean = jnp.mean(head.astype(jnp.float32), axis=1, keepdims=True)
        new = jnp.broadcast_to(mean, (head.shape[0], added)).astype(head.dtype)
        llm["lm_head"] = jnp.concatenate([head, new], axis=1)
    out = dict(params)
    out["llm"] = llm
    new_cfg = dataclasses.replace(cfg, vocab_size=cfg.vocab_size + added)
    return out, new_cfg, added
