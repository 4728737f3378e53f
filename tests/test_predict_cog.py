"""Replicate predictor surface (predict.py) without cog installed: the
shim base class must load a checkpoint and stream a VQA answer — closing
the last inventory item (reference /root/reference/predict.py:26-185)."""

import sys
from pathlib import Path

import numpy as np
import pytest as _pytest

pytestmark = _pytest.mark.slow

sys.path.insert(0, str(Path(__file__).parent))
sys.path.insert(0, str(Path(__file__).parent.parent))


def test_predictor_streams_answer(tmp_path):
    _pytest.importorskip("torch")
    _pytest.importorskip("tokenizers")
    from helpers import make_tiny_checkpoint
    from PIL import Image

    from predict import Predictor

    ckpt = make_tiny_checkpoint(str(tmp_path / "ckpt"))
    img = tmp_path / "img.png"
    Image.fromarray(
        np.random.default_rng(0).integers(0, 255, (48, 48, 3)).astype("uint8")
    ).save(img)

    p = Predictor()
    p.setup(model_path=ckpt)
    pieces = list(p.predict(
        image=str(img), prompt="What is in the image ?",
        top_p=1.0, temperature=0.0, max_tokens=12,
    ))
    assert pieces, "no streamed output"
    text = "".join(pieces)
    assert len(text.split()) >= 1
    # deterministic at temperature 0: a second call matches
    text2 = "".join(p.predict(
        image=str(img), prompt="What is in the image ?",
        top_p=1.0, temperature=0.0, max_tokens=12,
    ))
    assert text2 == text
