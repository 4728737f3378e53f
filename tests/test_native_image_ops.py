"""Native C++ image ingest vs the PIL reference pipeline."""

import numpy as np
import pytest
from PIL import Image

from dynamic_llava_tpu.mm_utils import (
    OPENAI_CLIP_MEAN,
    OPENAI_CLIP_STD,
    ClipImagePreprocessor,
    expand2square,
)
from dynamic_llava_tpu.native import clip_preprocess_batch_native, native_available

pytestmark = pytest.mark.skipif(
    not native_available(), reason="g++ not available"
)


def _pil_reference(arr: np.ndarray, size: int) -> np.ndarray:
    proc = ClipImagePreprocessor(size=size, crop_size=size)
    img = expand2square(Image.fromarray(arr), proc.background_color)
    return proc(img)


@pytest.mark.parametrize("h,w", [(100, 160), (64, 64), (250, 100), (30, 300)])
def test_native_matches_pil(h, w):
    rng = np.random.default_rng(h * 1000 + w)
    arr = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    size = 112
    ref = _pil_reference(arr, size)
    proc = ClipImagePreprocessor(size=size)
    got = clip_preprocess_batch_native(
        [arr], size, proc.background_color, OPENAI_CLIP_MEAN, OPENAI_CLIP_STD
    )[0]
    # PIL uses int16 fixed-point filter coefficients and per-pass uint8
    # re-quantization; the native path keeps doubles. Tolerance: ~2 uint8
    # steps after normalization (std ~0.26 -> 2/255/0.26 ~ 0.03)
    err = np.abs(got - ref)
    assert np.mean(err) < 0.01, np.mean(err)
    assert np.quantile(err, 0.999) < 0.05, np.quantile(err, 0.999)


def test_native_batch_ragged():
    rng = np.random.default_rng(0)
    imgs = [
        rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        for h, w in [(40, 80), (96, 48), (56, 56)]
    ]
    proc = ClipImagePreprocessor(size=56)
    out = clip_preprocess_batch_native(
        imgs, 56, proc.background_color, OPENAI_CLIP_MEAN, OPENAI_CLIP_STD
    )
    assert out.shape == (3, 56, 56, 3)
    for i, im in enumerate(imgs):
        ref = _pil_reference(im, 56)
        assert np.mean(np.abs(out[i] - ref)) < 0.01
