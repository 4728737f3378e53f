"""Unit tests for the GPT-review family, SQA-GPT4 scorers, MME scoring,
the SQA base-prompt builders, and the webpage data generator."""

import json
import os

import pytest

from dynamic_llava_tpu.eval import convert_sqa_to_llava_base_prompt as bp
from dynamic_llava_tpu.eval.eval_gpt_review import parse_score, run_review
from dynamic_llava_tpu.eval.eval_mme import (
    convert_answers,
    parse_yes_no,
    score_records,
)
from dynamic_llava_tpu.eval.eval_science_qa import parse_strict_answer
from dynamic_llava_tpu.eval.eval_science_qa_gpt4 import evaluate as sqa_gpt4_eval
from dynamic_llava_tpu.eval.eval_science_qa_gpt4_requery import (
    evaluate as sqa_requery_eval,
)
from dynamic_llava_tpu.eval.generate_webpage_data import (
    build_records,
    clean_review,
    write_webpage,
)
from dynamic_llava_tpu.eval.qa_baseline_gpt35 import generate_answers
from dynamic_llava_tpu.eval.summarize_gpt_review import summarize_file


def _jsonl(path, rows):
    with open(path, "w") as f:
        for row in rows:
            f.write(json.dumps(row) + "\n")
    return str(path)


# ---------------------------------------------------------------- GPT review

def test_parse_score():
    assert parse_score("8 7\nGood answers.") == [8.0, 7.0]
    assert parse_score("8,7\nwith comma") == [8.0, 7.0]
    assert parse_score("no scores here") == [-1, -1]


@pytest.mark.parametrize("variant,context_row,expected_snippet", [
    ("bench", {"image": "i.jpg", "caption": ["a cat", "on a mat"]},
     "a cat\non a mat"),
    ("visual",
     {"image": "i.jpg", "captions": ["a cat"],
      "instances": [{"category": "cat", "bbox": [1, 2, 3, 4]}]},
     "cat: [1, 2, 3, 4]"),
])
def test_run_review_variants(tmp_path, variant, context_row, expected_snippet):
    q = _jsonl(tmp_path / "q.jsonl",
               [{"question_id": 0, "image": "i.jpg", "text": "What?",
                 "category": "conv"}])
    a1 = _jsonl(tmp_path / "a1.jsonl", [{"question_id": 0, "text": "ans one"}])
    a2 = _jsonl(tmp_path / "a2.jsonl", [{"question_id": 0, "text": "ans two"}])
    ctx = _jsonl(tmp_path / "ctx.jsonl", [context_row])
    rule_cat = "llava_bench_conv" if variant == "bench" else "conv"
    rule = tmp_path / "rule.json"
    rule.write_text(json.dumps(
        {rule_cat: {"role": "Assistant", "prompt": "rate both"}}))
    out = tmp_path / "review.jsonl"

    prompts = []

    def judge(content):
        prompts.append(content)
        return "9 4\nfirst is better"

    run_review(q, ctx, str(rule), [a1, a2], str(out),
               variant=variant, judge=judge)
    assert expected_snippet in prompts[0]
    assert "[Assistant 1]\nans one" in prompts[0]
    rows = [json.loads(l) for l in open(out)]
    assert rows[0]["tuple"] == [9.0, 4.0]
    assert rows[0]["category"] == rule_cat

    # resume: a second run over the same output skips the judged question
    run_review(q, ctx, str(rule), [a1, a2], str(out),
               variant=variant, judge=judge)
    assert len(prompts) == 1
    assert len([json.loads(l) for l in open(out)]) == 1


def test_summarize_file(tmp_path):
    reviews = [
        {"question_id": 1, "category": "conv", "tuple": [8.0, 6.0]},
        {"question_id": 2, "category": "conv", "tuple": [6.0, 6.0]},
        {"question_id": 3, "category": "detail", "tuple": [10.0, 5.0]},
    ]
    path = _jsonl(tmp_path / "rev.jsonl", reviews)
    summary = summarize_file(path)
    assert summary["conv"]["relative"] == pytest.approx(85.7, abs=0.1)
    assert summary["conv"]["score1"] == 70.0
    assert summary["all"]["n"] == 3
    # ignore filter drops the matching question_id
    assert summarize_file(path, ignore=[3])["all"]["n"] == 2


# ----------------------------------------------------------------- SQA GPT-4

def test_parse_strict_answer():
    assert parse_strict_answer("Blah. The answer is B.") == "B"
    assert parse_strict_answer("The answer is B. The answer is C.") == "FAILED"
    assert parse_strict_answer("B") == "FAILED"


def _sqa_fixture(tmp_path, our_texts, gpt4_texts, requery_texts=None):
    base = tmp_path / "sqa"
    base.mkdir(exist_ok=True)
    pids = [str(i) for i in range(len(our_texts))]
    problems = {pid: {"choices": ["x", "y"], "answer": 0} for pid in pids}
    (base / "problems.json").write_text(json.dumps(problems))
    (base / "pid_splits.json").write_text(json.dumps({"test": pids}))
    our = _jsonl(tmp_path / "our.jsonl",
                 [{"question_id": pid, "text": t}
                  for pid, t in zip(pids, our_texts)])
    gpt4 = tmp_path / "gpt4.json"
    gpt4.write_text(json.dumps(
        {"outputs": dict(zip(pids, gpt4_texts))}))
    req = None
    if requery_texts is not None:
        req = _jsonl(tmp_path / "req.jsonl",
                     [{"question_id": pid, "text": t}
                      for pid, t in zip(pids, requery_texts)])
    return str(base), our, str(gpt4), req


def test_sqa_gpt4_scorer(tmp_path):
    # P0: both right. P1: gpt4 wrong, ours right (upper bound catches it).
    # P2: gpt4 unparseable -> substituted with our (right) answer.
    base, our, gpt4, _ = _sqa_fixture(
        tmp_path,
        our_texts=["The answer is A."] * 3,
        gpt4_texts=["The answer is A.", "The answer is B.", "dunno"],
    )
    report = sqa_gpt4_eval(base, our, gpt4)
    assert report["total"] == 3
    assert report["correct"] == 2
    assert report["gpt4_failed"] == 1
    assert report["correct_upperbound"] == 3


def test_sqa_gpt4_requery_scorer(tmp_path):
    # P0: requery right. P1: requery wrong (submitted anyway).
    # P2: requery unparseable -> falls back to our right answer.
    base, our, gpt4, req = _sqa_fixture(
        tmp_path,
        our_texts=["The answer is A."] * 3,
        gpt4_texts=["The answer is A."] * 3,
        requery_texts=["The answer is A.", "The answer is B.", "eh"],
    )
    out = tmp_path / "sqa_out.json"
    results = sqa_requery_eval(base, our, gpt4, req, str(out))
    assert results["count"] == 3
    assert results["correct"] == 2
    assert results["results"] == {"0": 0, "1": 1, "2": 0}
    assert json.load(open(out))["acc"] == pytest.approx(200 / 3)


# ----------------------------------------------------------------------- MME

def test_parse_yes_no():
    assert parse_yes_no("Yes, it is.") == "yes"
    assert parse_yes_no("No") == "no"
    assert parse_yes_no("nope") == "no"
    assert parse_yes_no("maybe") == "other"


def test_mme_scoring(tmp_path):
    # existence: image A both right (acc+ hit), image B one right.
    records = [
        {"category": "existence", "image": "A", "question": "q1",
         "gt": "yes", "pred": "Yes"},
        {"category": "existence", "image": "A", "question": "q2",
         "gt": "no", "pred": "No."},
        {"category": "existence", "image": "B", "question": "q1",
         "gt": "yes", "pred": "Yes"},
        {"category": "existence", "image": "B", "question": "q2",
         "gt": "yes", "pred": "No"},
        {"category": "code_reasoning", "image": "C", "question": "q",
         "gt": "no", "pred": "no"},
    ]
    report = score_records(records)
    ex = report["subtasks"]["existence"]
    assert ex["acc"] == 75.0
    assert ex["acc_plus"] == 50.0
    assert ex["score"] == 125.0
    assert report["perception"] == 125.0
    assert report["cognition"] == 200.0
    assert report["total"] == 325.0


def test_mme_convert_with_dir_gt(tmp_path):
    qfile = _jsonl(tmp_path / "q.jsonl", [
        {"question_id": 0, "image": "existence/img1.jpg",
         "text": "Is there a dog? Please answer yes or no.",
         "category": "existence"},
    ])
    rfile = _jsonl(tmp_path / "r.jsonl", [{"question_id": 0, "text": "Yes"}])
    task_dir = tmp_path / "MME" / "existence"
    os.makedirs(task_dir)
    (task_dir / "img1.txt").write_text(
        "Is there a dog? Please answer yes or no.\tYes\n")
    records = convert_answers(qfile, rfile, mme_dir=str(tmp_path / "MME"))
    assert records[0]["gt"] == "yes"
    assert score_records(records)["subtasks"]["existence"]["score"] == 200.0


# ------------------------------------------------------------ SQA base prompt

_PROBLEM = {
    "question": "What is it?",
    "hint": "a hint",
    "caption": "a caption",
    "choices": ["cat", "dog"],
    "answer": 1,
    "lecture": "L text",
    "solution": "S text",
}


def test_base_prompt_qcm_a():
    inp, out = bp.format_example(
        "QCM-A", question="What is it?", context="a hint",
        choice="(A) cat (B) dog", answer="B", lecture="L", solution="S",
        test_example=False)
    assert inp == "Question: What is it?\nContext: a hint\nOptions: (A) cat (B) dog"
    assert out == "Answer: The answer is B."


def test_base_prompt_reference_quirks():
    # AL appends the SOLUTION; AE the LECTURE (reference :73-76)
    _, out_al = bp.format_example("QCM-AL", question="q", context="c",
                                  choice="o", answer="A", lecture="LEC",
                                  solution="SOL", test_example=False)
    assert out_al.endswith("BECAUSE: SOL")
    _, out_ae = bp.format_example("QCM-AE", question="q", context="c",
                                  choice="o", answer="A", lecture="LEC",
                                  solution="SOL", test_example=False)
    assert out_ae.endswith("BECAUSE: LEC")
    # empty lecture drops the trailing BECAUSE:
    _, out_empty = bp.format_example("QCM-AL", question="q", context="c",
                                     choice="o", answer="A", lecture="",
                                     solution="", test_example=False)
    assert out_empty == "Answer: The answer is A."


def test_base_prompt_input_orders():
    inp, _ = bp.format_example("QCLM-A", question="q", context="c",
                               choice="o", answer="A", lecture="LEC",
                               solution="SOL")
    assert inp.split("\n") == [
        "Question: q", "Context: c", "BECAUSE: LEC", "Options: o"]
    inp2, _ = bp.format_example("QCMLE-A", question="q", context="c",
                                choice="o", answer="A", lecture="LEC",
                                solution="SOL")
    assert inp2.split("\n")[-1] == "BECAUSE: LEC SOL"


def test_base_prompt_plain_keeps_answer_stub_newline():
    text = bp.format_example_plain("QCM-A", question="q", context="c",
                                   choice="o", answer="A", lecture="",
                                   solution="", test_example=True)
    assert text.endswith("Options: o\nAnswer:")


def test_build_prompt_chatbot_lepa():
    problems = {"p1": dict(_PROBLEM)}
    examples = bp.build_prompt_chatbot(problems, ["p1"], "QCM-LEPA")
    inp, out = examples["p1"]
    assert out.startswith("LECTURE: L text")
    assert "SOLUTION: S text" in out
    assert out.endswith("ANSWER: B.")


def test_build_prompt_plain_and_gpt4():
    class Args:
        prompt_format = "QCM-A"
        use_caption = False
        options = ("A", "B", "C", "D", "E")

    problems = {"p1": dict(_PROBLEM), "p2": dict(_PROBLEM)}
    prompt = bp.build_prompt(problems, ["p1"], "p2", Args())
    assert prompt.count("Question:") == 2
    assert prompt.endswith("Answer:")
    assert "The answer is B." in prompt

    messages = bp.build_prompt_gpt4(problems, ["p1"], "p2", Args())
    assert messages[0]["role"] == "system"
    assert messages[-1] == {"role": "assistant", "content": "Answer:"}
    assert "Can you explain" in messages[1]["content"]


# ----------------------------------------------------------- webpage + gpt35

def test_generate_webpage_data(tmp_path):
    q = _jsonl(tmp_path / "q.jsonl",
               [{"question_id": 1, "category": "conv", "text": "Why?"}])
    base = _jsonl(tmp_path / "base.jsonl", [{"question_id": 1, "text": "b"}])
    ours = _jsonl(tmp_path / "ours.jsonl", [{"question_id": 1, "text": "o"}])
    rev = _jsonl(tmp_path / "rev.jsonl", [
        {"question_id": 1, "tuple": [8.0, 9.0],
         "content": "8 9\nAssistant 1 was concise."}])
    records = build_records(q, base, ours, rev, baseline_name="vicuna")
    assert records[0]["scores"]["vicuna"] == [8.0, 9.0]
    # leading score line trimmed, labels bolded
    assert records[0]["evaluations"]["vicuna"] == (
        "**Assistant 1** was concise.")
    out_dir = tmp_path / "web"
    write_webpage(records, ["vicuna"], str(out_dir))
    data = json.load(open(out_dir / "data.json"))
    assert data["models"] == ["vicuna"]
    assert "Pairwise review browser" in (out_dir / "index.html").read_text()


def test_clean_review_no_score_line():
    assert clean_review("Assistant 2 wins.") == "**Assistant 2** wins."


def test_qa_baseline_offline_client(tmp_path):
    q = _jsonl(tmp_path / "q.jsonl", [
        {"question_id": 2, "text": "second"},
        {"question_id": 1, "text": "first"},
    ])
    out = tmp_path / "ans.jsonl"
    generate_answers(q, str(out), client=lambda text: f"echo:{text}")
    rows = [json.loads(l) for l in open(out)]
    assert [r["question_id"] for r in rows] == [1, 2]
    assert rows[0]["text"] == "echo:first"
    assert rows[0]["model_id"].startswith("gpt-3.5")
