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


def test_score_sqa_end_to_end(tmp_path):
    """Full SQA scoring path: judgments, accuracy split, reference-format
    output artifacts."""
    import json

    from dynamic_llava_tpu.eval.eval_science_qa import score_sqa, write_outputs

    problems = {
        "p1": {"choices": ["x", "y"], "answer": 1},
        "p2": {"choices": ["x", "y", "z"], "answer": 0},
        "p3": {"choices": ["x", "y"], "answer": 0},
    }
    predictions = {
        "p1": {"text": "The answer is B.", "prompt": "<image> q1"},
        "p2": {"text": "A. because", "prompt": "q2"},
        # p3 missing -> FAILED -> random pick
    }
    scores = score_sqa(problems, predictions)
    assert scores["count"] == 3
    assert scores["correct"] >= 2  # p1, p2 parse correctly
    assert scores["img_count"] == 1 and scores["img_correct"] == 1
    by_id = {j.question_id: j for j in scores["judgments"]}
    assert by_id["p1"].parsed_ans == "B" and by_id["p1"].correct
    assert by_id["p2"].parsed_ans == "A" and by_id["p2"].correct
    assert by_id["p3"].parsed_ans == "FAILED"

    out_f = tmp_path / "out.json"
    res_f = tmp_path / "res.json"
    write_outputs(scores, str(out_f), str(res_f))
    res = json.loads(res_f.read_text())
    assert res["count"] == 3 and res["results"]["p1"] == 1
    split = json.loads(out_f.read_text())
    assert {a["question_id"] for a in split["correct"]} >= {"p1", "p2"}
