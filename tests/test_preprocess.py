"""Golden tests for image preprocessing and prompt tokenization."""

import numpy as np
import pytest
from PIL import Image

from dynamic_llava_tpu import mm_utils
from dynamic_llava_tpu.mm_utils import (
    ClipImagePreprocessor,
    expand2square,
    process_images,
    select_best_resolution,
    tokenizer_image_token,
)


def _rand_image(w, h, seed=0):
    rng = np.random.default_rng(seed)
    return Image.fromarray(rng.integers(0, 256, (h, w, 3), dtype=np.uint8))


def test_pil_pipeline_matches_hf_clip_processor():
    """Our self-contained preprocessor must bit-match HF CLIPImageProcessor
    (the reference's exact pipeline)."""
    transformers = pytest.importorskip("transformers")
    from transformers import CLIPImageProcessor

    hf = CLIPImageProcessor(
        size={"shortest_edge": 336},
        crop_size={"height": 336, "width": 336},
        do_resize=True,
        do_center_crop=True,
        do_rescale=True,
        do_normalize=True,
        image_mean=list(mm_utils.OPENAI_CLIP_MEAN),
        image_std=list(mm_utils.OPENAI_CLIP_STD),
        resample=3,  # PIL BICUBIC
    )
    ours = ClipImagePreprocessor(size=336)
    for w, h in [(448, 448), (640, 480), (336, 336), (100, 250)]:
        img = _rand_image(w, h, seed=w + h)
        ref = hf(img, return_tensors="np")["pixel_values"][0]  # [3, H, W]
        got = ours(img).transpose(2, 0, 1)
        np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-5)


def test_expand2square_and_pad_mode():
    img = _rand_image(100, 60)
    proc = ClipImagePreprocessor(size=48, crop_size=48)
    sq = expand2square(img, proc.background_color)
    assert sq.size == (100, 100)
    batch = process_images([img, img], proc, image_aspect_ratio="pad")
    assert batch.shape == (2, 48, 48, 3)


def test_xla_pipeline_close_to_pil():
    import os

    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax.numpy as jnp

    from dynamic_llava_tpu.ops.preprocess import preprocess_image

    # tiny sizes: XLA cubic-resize compile time on CPU grows steeply with size
    img = _rand_image(72, 48, seed=3)
    proc = ClipImagePreprocessor(size=56, crop_size=56)
    ref = proc(expand2square(img, proc.background_color))
    got = np.asarray(
        preprocess_image(jnp.asarray(np.asarray(img)), out_size=56, mode="pad")
    )
    assert got.shape == ref.shape
    # kernels differ slightly (PIL vs XLA bicubic); demand close agreement
    err = np.abs(got - ref)
    assert np.mean(err) < 0.02, np.mean(err)
    assert np.quantile(err, 0.99) < 0.15, np.quantile(err, 0.99)


def test_select_best_resolution():
    grid = [(336, 672), (672, 336), (672, 672), (1008, 336), (336, 1008)]
    assert select_best_resolution((500, 1000), grid) == (336, 672)
    assert select_best_resolution((1000, 500), grid) == (672, 336)


class _StubTokenizer:
    """Minimal tokenizer: each char -> ord; BOS=1 prepended."""

    bos_token_id = 1

    def __call__(self, text):
        class R:
            pass

        r = R()
        r.input_ids = [self.bos_token_id] + [ord(c) for c in text] if text else []
        return r

    def decode(self, ids):
        return "".join(chr(i) for i in ids if i > 1)


def test_tokenizer_image_token():
    tok = _StubTokenizer()
    ids = tokenizer_image_token("ab<image>cd", tok)
    assert ids == [1, ord("a"), ord("b"), -200, ord("c"), ord("d")]
    # two images
    ids = tokenizer_image_token("a<image>b<image>c", tok)
    assert ids == [1, ord("a"), -200, ord("b"), -200, ord("c")]
    # image first: chunk 0 is empty -> no bos offset handling
    ids = tokenizer_image_token("<image>xy", tok)
    assert ids.count(-200) == 1


def test_keywords_stopping():
    tok = _StubTokenizer()
    crit = mm_utils.KeywordsStoppingCriteria(["</s>"], tok, input_len=2)
    seq = [1, 5] + [ord(c) for c in "hello"]
    assert not crit(seq)
    seq += [ord(c) for c in "</s>"]
    assert crit(seq)
