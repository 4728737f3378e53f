"""Anyres (high-resolution tiling) feature merging.

Rebuild of the reference anyres path
(/root/reference/llava/model/dynamic_llava_arch.py:199-261 with
``unpad_image`` :123-144): each image is encoded as a global view plus a
grid of 336px tiles; tile features are reassembled into a 2-D patch map,
the aspect-ratio padding is cropped off (``unpad``), an ``image_newline``
column marks row ends (``spatial_unpad``), and the global view is prepended.

The merged length varies per image, so this runs host-side (numpy) on tower
outputs and feeds the fusion planner per-sample token counts.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np

from ..mm_utils import get_anyres_image_grid_shape


def unpad_feature_grid(
    grid: np.ndarray,  # [H_p, W_p, D] patch-feature map of the padded image
    original_size: Tuple[int, int],  # (width, height) of the source image
) -> np.ndarray:
    """Crop the padding rows/cols introduced by resize_and_pad_image
    (reference unpad_image, dynamic_llava_arch.py:123-144, transposed to
    feature space)."""
    h_p, w_p, _ = grid.shape
    ow, oh = original_size
    aspect_src = ow / oh
    aspect_pad = w_p / h_p
    if aspect_src > aspect_pad:
        # padding was added top/bottom
        scaled_h = int(round(w_p / aspect_src))
        pad = (h_p - scaled_h) // 2
        return grid[pad : h_p - pad]
    scaled_w = int(round(h_p * aspect_src))
    pad = (w_p - scaled_w) // 2
    return grid[:, pad : w_p - pad]


def merge_anyres_features(
    tile_features: np.ndarray,  # [n_tiles+1, n_patch, D]; row 0 = global view
    image_size: Tuple[int, int],  # original (width, height)
    grid_pinpoints,
    tower_image_size: int,
    patches_per_side: int,
    image_newline: np.ndarray,  # [D]
    merge_type: str = "spatial_unpad",
) -> np.ndarray:
    """-> [n_merged_tokens, D]."""
    base = tile_features[0]
    tiles = tile_features[1:]
    if tiles.shape[0] == 0 or merge_type == "flat":
        flat = tile_features.reshape(-1, tile_features.shape[-1])
        return flat

    grid_w, grid_h = get_anyres_image_grid_shape(
        image_size, grid_pinpoints, tower_image_size
    )
    d = tiles.shape[-1]
    p = patches_per_side
    # [gh, gw, p, p, D] -> [gh*p, gw*p, D]
    grid = tiles.reshape(grid_h, grid_w, p, p, d)
    grid = grid.transpose(0, 2, 1, 3, 4).reshape(grid_h * p, grid_w * p, d)
    if "unpad" in merge_type:
        grid = unpad_feature_grid(grid, image_size)
        nl = np.broadcast_to(image_newline, (grid.shape[0], 1, d))
        grid = np.concatenate([grid, nl], axis=1)
    spatial = grid.reshape(-1, d)
    return np.concatenate([base, spatial], axis=0)


def encode_images_anyres(
    params,
    cfg,
    tiles_list: List[np.ndarray],  # per image: [n_tiles+1, H, W, 3]
    image_sizes: Sequence[Tuple[int, int]],
    grid_pinpoints,
    merge_type: str = "spatial_unpad",
) -> List[np.ndarray]:
    """Encode each image's tiles through tower+projector and merge.
    Returns a list of per-image [n_tokens_i, D] arrays."""
    import jax.numpy as jnp

    from ..models.dynamic import encode_images

    d = cfg.text.hidden_size
    newline = np.asarray(
        params.get("image_newline", np.zeros((d,), np.float32))
    )
    out = []
    for tiles, size in zip(tiles_list, image_sizes):
        feats = np.asarray(encode_images(params, cfg, jnp.asarray(tiles)))
        out.append(
            merge_anyres_features(
                feats,
                size,
                grid_pinpoints,
                cfg.vision.image_size,
                cfg.vision.num_patches_per_side,
                newline,
                merge_type,
            )
        )
    return out
