"""Scorer unit tests (eval harness layer)."""

import json

import numpy as np

from dynamic_llava_tpu.eval.eval_pope import eval_pope
from dynamic_llava_tpu.eval.vqa_metrics import (
    STVQAAccuracyEvaluator,
    TextVQAAccuracyEvaluator,
    VQAAnswerProcessor,
)


def test_pope_scorer(tmp_path):
    labels = [{"label": "yes"}, {"label": "no"}, {"label": "yes"}, {"label": "no"}]
    label_file = tmp_path / "labels.json"
    with open(label_file, "w") as f:
        for rec in labels:
            f.write(json.dumps(rec) + "\n")
    answers = [
        {"text": "Yes, there is a dog."},
        {"text": "No."},
        {"text": "Yes"},
        {"text": "Yes it is."},  # wrong
    ]
    m = eval_pope(answers, str(label_file))
    assert m["accuracy"] == 0.75
    assert m["recall"] == 1.0  # both positives found
    assert 0 < m["f1"] <= 1


def test_vqa_answer_processor():
    p = VQAAnswerProcessor()
    assert p("A Red Cat!") == "red cat"
    assert p("two") == "2"
    assert p("isnt") == "isn't"
    assert p("the answer, obviously") == "answer obviously"


def test_textvqa_accuracy():
    ev = TextVQAAccuracyEvaluator()
    preds = [
        {"pred_answer": "red", "gt_answers": ["red"] * 10},
        {"pred_answer": "blue", "gt_answers": ["red"] * 10},
        {"pred_answer": "Red", "gt_answers": ["red"] * 5 + ["crimson"] * 5},
    ]
    acc = ev.eval_pred_list(preds)
    assert 0.5 < acc < 0.8  # 1 + 0 + 1 (5 matches among other-9 > 3)


def test_stvqa_accuracy():
    ev = STVQAAccuracyEvaluator()
    preds = [
        {"pred_answer": "A cat", "gt_answers": ["cat", "dog"]},
        {"pred_answer": "fish", "gt_answers": ["cat", "dog"]},
    ]
    assert ev.eval_pred_list(preds) == 0.5


def test_sqa_answer_parsing():
    from dynamic_llava_tpu.eval.eval_science_qa import parse_answer

    assert parse_answer("The answer is B.", "ABCDE") == "B"
    assert parse_answer("A.", "ABCDE") == "A"
    assert parse_answer("(C) because...", "ABCDE") == "C"
    assert parse_answer("I don't know", "ABCDE") == "FAILED"
