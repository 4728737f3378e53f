"""Fused on-device image preprocessing.

One XLA graph for the whole ingest path — pad-to-square (dataset-mean
background), bicubic resize to the tower resolution, and CLIP normalization —
replacing the reference's PIL + torchvision host pipeline
(/root/reference/llava/mm_utils.py:163-199 feeding CLIPImageProcessor).
On TPU this runs on the VPU right next to the tower, so raw uint8 frames can
be shipped to the device instead of fp32 pixels (4x less PCIe/DCN traffic).

The PIL pipeline in ``mm_utils`` remains the bit-accuracy reference; this
graph is golden-tested against it (small tolerance: PIL and XLA bicubic
kernels differ in edge handling and uint8 rounding).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from ..mm_utils import OPENAI_CLIP_MEAN, OPENAI_CLIP_STD


@functools.partial(jax.jit, static_argnames=("out_size", "mode"))
def preprocess_image(
    image: jax.Array,  # [H, W, 3] uint8
    out_size: int = 336,
    mode: str = "pad",  # "pad" -> expand2square first; "square" -> direct resize
    image_mean: Tuple[float, ...] = OPENAI_CLIP_MEAN,
    image_std: Tuple[float, ...] = OPENAI_CLIP_STD,
) -> jax.Array:
    """-> [out_size, out_size, 3] float32 normalized (NHWC)."""
    h, w = image.shape[0], image.shape[1]
    x = image.astype(jnp.float32)
    mean = jnp.asarray(image_mean, jnp.float32)
    std = jnp.asarray(image_std, jnp.float32)
    if mode == "pad" and h != w:
        side = max(h, w)
        background = jnp.round(mean * 255.0)
        canvas = jnp.broadcast_to(background, (side, side, 3))
        top, left = (side - h) // 2, (side - w) // 2
        x = jax.lax.dynamic_update_slice(canvas.astype(jnp.float32), x, (top, left, 0))
    x = jax.image.resize(x, (out_size, out_size, 3), method="cubic", antialias=True)
    # PIL clamps resampled values back to uint8 before normalize
    x = jnp.clip(x, 0.0, 255.0) / 255.0
    return (x - mean) / std


def preprocess_batch(
    images: jax.Array,  # [B, H, W, 3] uint8 (same source size)
    out_size: int = 336,
    mode: str = "pad",
) -> jax.Array:
    return jax.vmap(lambda im: preprocess_image(im, out_size=out_size, mode=mode))(
        images
    )
