"""CLI-level end-to-end: checkpoint dir -> model_vqa_loader -> eval_pope."""

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


def test_vqa_loader_cli_to_pope_scorer(tmp_path):
    from helpers import make_tiny_checkpoint

    ckpt = make_tiny_checkpoint(str(tmp_path / "ckpt"))

    from PIL import Image

    img_dir = tmp_path / "images"
    img_dir.mkdir()
    rng = np.random.default_rng(0)
    for i in range(2):
        Image.fromarray(
            rng.integers(0, 255, (48, 72, 3)).astype("uint8")
        ).save(str(img_dir / f"q{i}.jpg"))
    qfile = tmp_path / "questions.jsonl"
    with open(qfile, "w") as f:
        for i, q in enumerate(["Is there a dog ?", "Is there a cat ?"]):
            f.write(json.dumps({"question_id": i, "image": f"q{i}.jpg",
                                "text": q, "category": "random"}) + "\n")

    from dynamic_llava_tpu.eval import model_vqa_loader

    answers = tmp_path / "answers.jsonl"
    model_vqa_loader.main([
        "--model-path", ckpt,
        "--image-folder", str(img_dir),
        "--question-file", str(qfile),
        "--answers-file", str(answers),
        "--temperature", "0", "--max_new_tokens", "4",
    ])
    recs = [json.loads(l) for l in open(answers)]
    assert len(recs) == 2
    assert all(isinstance(r["text"], str) for r in recs)

    # --spec_k routes through the speculative verify rounds and must
    # produce the identical greedy answers
    answers_spec = tmp_path / "answers_spec.jsonl"
    model_vqa_loader.main([
        "--model-path", ckpt,
        "--image-folder", str(img_dir),
        "--question-file", str(qfile),
        "--answers-file", str(answers_spec),
        "--temperature", "0", "--max_new_tokens", "4", "--spec_k", "3",
    ])
    recs_spec = [json.loads(l) for l in open(answers_spec)]
    assert [r["text"] for r in recs_spec] == [r["text"] for r in recs]

    # --conv-mode mistral_instruct (the Mistral family's natural mode)
    # must resolve from the registry and drive the same generator
    answers_mi = tmp_path / "answers_mistral.jsonl"
    model_vqa_loader.main([
        "--model-path", ckpt,
        "--image-folder", str(img_dir),
        "--question-file", str(qfile),
        "--answers-file", str(answers_mi),
        "--conv-mode", "mistral_instruct",
        "--temperature", "0", "--max_new_tokens", "4",
    ])
    recs_mi = [json.loads(l) for l in open(answers_mi)]
    assert len(recs_mi) == 2
    assert all(isinstance(r["text"], str) for r in recs_mi)

    # score through the POPE pipeline
    from dynamic_llava_tpu.eval.eval_pope import eval_pope

    labels = tmp_path / "labels.jsonl"
    with open(labels, "w") as f:
        f.write(json.dumps({"label": "yes"}) + "\n")
        f.write(json.dumps({"label": "no"}) + "\n")
    metrics = eval_pope(recs, str(labels))
    assert 0.0 <= metrics["accuracy"] <= 1.0
