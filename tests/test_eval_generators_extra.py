"""End-to-end CLI tests for the minor generators: model_qa (text-only),
run_llava_for_ppl (single-query self-PPL), model_vqa_science_for_ppl
(dataset self-PPL probe)."""

import pytest as _pytest

pytestmark = _pytest.mark.slow


import json
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent))

pytest.importorskip("torch")
pytest.importorskip("tokenizers")


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    from helpers import make_tiny_checkpoint

    return make_tiny_checkpoint(str(tmp_path_factory.mktemp("ckpt") / "m"))


def _save_image(path):
    from PIL import Image

    rng = np.random.default_rng(0)
    Image.fromarray(rng.integers(0, 255, (48, 72, 3)).astype("uint8")).save(
        str(path))


def test_model_qa_text_only(tmp_path, ckpt):
    from dynamic_llava_tpu.eval import model_qa

    qfile = tmp_path / "q.jsonl"
    with open(qfile, "w") as f:
        f.write(json.dumps({"question_id": 7, "text": "Say hi.",
                            "category": "generic"}) + "\n")
    answers = tmp_path / "a.jsonl"
    model_qa.main([
        "--model-path", ckpt,
        "--question-file", str(qfile),
        "--answers-file", str(answers),
        "--temperature", "0", "--max_new_tokens", "4",
    ])
    recs = [json.loads(l) for l in open(answers)]
    assert recs[0]["question_id"] == 7
    assert isinstance(recs[0]["text"], str)


def test_run_llava_for_ppl(tmp_path, ckpt, capsys):
    import argparse

    from dynamic_llava_tpu.eval import run_llava_for_ppl

    img = tmp_path / "img.jpg"
    _save_image(img)
    args = argparse.Namespace(
        model_path=ckpt, model_base=None, image_file=str(img),
        query="What is this?", conv_mode="vicuna_v1", sep=",",
        temperature=0.0, max_new_tokens=4)
    result = run_llava_for_ppl.eval_model(args)
    assert result["self_ppl"] >= 1.0
    assert isinstance(result["text"], str)
    assert "mean perplexity" in capsys.readouterr().out


def test_model_vqa_science_for_ppl(tmp_path, ckpt):
    from dynamic_llava_tpu.eval import model_vqa_science_for_ppl

    img = tmp_path / "img0.jpg"
    _save_image(img)
    qfile = tmp_path / "q.json"
    qfile.write_text(json.dumps([
        {"id": "s1", "image": "img0.jpg",
         "conversations": [{"value": "<image>\nDescribe."}]},
        {"id": "s2_no_image",
         "conversations": [{"value": "Describe."}]},  # skipped
    ]))
    answers = tmp_path / "a.jsonl"
    model_vqa_science_for_ppl.main([
        "--model-path", ckpt,
        "--image-folder", str(tmp_path),
        "--question-file", str(qfile),
        "--answers-file", str(answers),
        "--conv-mode", "vicuna_v1",
        "--temperature", "0", "--max_new_tokens", "4",
    ])
    recs = [json.loads(l) for l in open(answers)]
    # one answer row (text-only sample skipped) + summary row
    assert len(recs) == 2
    assert recs[0]["question_id"] == "s1"
    assert float(recs[0]["self_ppl"]) >= 1.0
    assert "mean_self_ppl" in recs[1]
