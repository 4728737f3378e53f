"""Multi-image fusion planning + anyres merge math."""

import numpy as np

from dynamic_llava_tpu.multimodal.anyres import (
    merge_anyres_features,
    unpad_feature_grid,
)
from dynamic_llava_tpu.multimodal.fusion import plan_batch, plan_sample


def test_multi_image_plan():
    ids = np.asarray([5, -200, 7, -200, 9], np.int64)
    tok, is_img, slot, labels, spans = plan_sample(ids, 4)
    assert len(tok) == 3 + 8
    # two spans of 4, slots continue across images
    starts = np.nonzero(np.diff(np.concatenate([[0], is_img.astype(int)])) == 1)[0]
    assert len(starts) == 2
    assert slot[is_img].tolist() == list(range(8))
    # text preserved around spans
    assert tok[0] == 5 and tok[5] == 7 and tok[-1] == 9
    # predictor span covers the first image
    assert spans["image_start"] == 1 and spans["image_end"] == 5


def test_variable_tokens_per_image():
    ids = np.asarray([5, -200, 7, -200, 9], np.int64)
    tok, is_img, slot, labels, spans = plan_sample(
        ids, 4, tokens_per_image=[3, 6]
    )
    assert is_img.sum() == 9
    assert slot[is_img].tolist() == list(range(9))
    plan = plan_batch([ids], 4, tokens_per_image_list=[[3, 6]])
    assert plan.valid_len[0] == 3 + 9


def test_unpad_feature_grid():
    # wide source image (w > h): padding was top/bottom in the square tile map
    grid = np.arange(8 * 8 * 2, dtype=np.float32).reshape(8, 8, 2)
    out = unpad_feature_grid(grid, original_size=(200, 100))
    assert out.shape[1] == 8 and out.shape[0] < 8
    # tall image: padding left/right
    out = unpad_feature_grid(grid, original_size=(100, 200))
    assert out.shape[0] == 8 and out.shape[1] < 8


def test_merge_anyres_features():
    d, p = 2, 4  # 4x4 patches per tile
    grid_pinpoints = [(336, 672), (672, 336), (672, 672)]
    # 2x1 tile grid (tall image) -> grid_h=2, grid_w=1
    n_tiles = 2
    feats = np.random.default_rng(0).normal(
        size=(n_tiles + 1, p * p, d)
    ).astype(np.float32)
    newline = np.ones((d,), np.float32)
    merged = merge_anyres_features(
        feats, image_size=(336, 672), grid_pinpoints=grid_pinpoints,
        tower_image_size=336, patches_per_side=p, image_newline=newline,
    )
    # base (16) + unpadded spatial grid with newline column
    assert merged.shape[0] > p * p
    assert merged.shape[1] == d
    # flat mode: everything concatenated
    flat = merge_anyres_features(
        feats, (336, 672), grid_pinpoints, 336, p, newline, merge_type="flat"
    )
    assert flat.shape == ((n_tiles + 1) * p * p, d)
