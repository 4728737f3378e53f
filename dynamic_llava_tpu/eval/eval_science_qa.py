"""ScienceQA scorer (reference /root/reference/llava/dynamic_eval/eval_science_qa.py)."""

from __future__ import annotations

import argparse
import json
import os
import random
import re


def get_args(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--base-dir", type=str)
    parser.add_argument("--result-file", type=str)
    parser.add_argument("--output-file", type=str)
    parser.add_argument("--output-result", type=str)
    parser.add_argument("--split", type=str, default="test")
    parser.add_argument("--options", type=list,
                        default=["A", "B", "C", "D", "E"])
    return parser.parse_args(argv)


def convert_caps(results):
    fakecaps = []
    for result in results:
        image_id = result["question_id"]
        caption = result["text"]
        fakecaps.append({"image_id": image_id, "caption": caption})
    return fakecaps


def get_pred_idx(prediction: str, choices, options) -> int:
    """Map the model's letter answer to a choice index; random on failure
    (matching the reference's scoring of unparseable answers)."""
    if prediction in options[: len(choices)]:
        return options.index(prediction)
    return random.choice(range(len(choices)))


def parse_answer(text: str, options) -> str:
    """Extract 'The answer is X.' or a bare leading option letter."""
    m = re.search(r"The answer is ([A-E])", text)
    if m:
        return m.group(1)
    m = re.match(r"^\(?([A-E])\)?[.,:]?(\s|$)", text.strip())
    if m:
        return m.group(1)
    return "FAILED"


def parse_strict_answer(text: str) -> str:
    """Only accept exactly one 'The answer is X.' occurrence — the stricter
    rule the GPT-4 comparison scorers apply (reference
    eval_science_qa_gpt4.py:62-72)."""
    found = re.findall(r"The answer is ([A-Z]).", text)
    return found[0] if len(found) == 1 else "FAILED"


def main(argv=None):
    args = get_args(argv)
    base_dir = args.base_dir
    split_indices = json.load(
        open(os.path.join(base_dir, "pid_splits.json"))
    )[args.split]
    problems = json.load(open(os.path.join(base_dir, "problems.json")))
    predictions = [json.loads(line) for line in open(args.result_file)]
    predictions = {pred["question_id"]: pred for pred in predictions}
    split_problems = {idx: problems[idx] for idx in split_indices}

    results = {"correct": [], "incorrect": []}
    sqa_results = {
        "acc": None, "correct": None, "count": None, "results": {},
        "outputs": {},
    }

    for prob_id, prob in split_problems.items():
        if prob_id not in predictions:
            pred = {"text": "FAILED", "prompt": "Unknown"}
            pred_text = "FAILED"
        else:
            pred = predictions[prob_id]
            pred_text = pred["text"]

        answer = parse_answer(pred_text, args.options)
        pred_idx = get_pred_idx(answer, prob["choices"], args.options)

        analysis = {
            "question_id": prob_id,
            "parsed_ans": answer,
            "ground_truth": args.options[prob["answer"]],
            "question": pred["prompt"],
            "pred": pred_text,
            "is_multimodal": "<image>" in pred["prompt"],
        }
        sqa_results["results"][prob_id] = get_pred_idx(
            answer, prob["choices"], args.options
        )
        sqa_results["outputs"][prob_id] = pred_text
        if pred_idx == prob["answer"]:
            results["correct"].append(analysis)
        else:
            results["incorrect"].append(analysis)

    correct = len(results["correct"])
    total = correct + len(results["incorrect"])

    mm_correct = len([x for x in results["correct"] if x["is_multimodal"]])
    mm_incorrect = len([x for x in results["incorrect"] if x["is_multimodal"]])
    mm_total = mm_correct + mm_incorrect
    print(f"Total: {total}, Correct: {correct}, "
          f"Accuracy: {correct / total * 100:.2f}%, "
          f"IMG-Accuracy: {mm_correct / mm_total * 100:.2f}%"
          if mm_total else f"Total: {total}, Correct: {correct}")

    sqa_results["acc"] = correct / total * 100
    sqa_results["correct"] = correct
    sqa_results["count"] = total

    if args.output_file:
        with open(args.output_file, "w") as f:
            json.dump(results, f, indent=2)
    if args.output_result:
        with open(args.output_result, "w") as f:
            json.dump(sqa_results, f, indent=2)


if __name__ == "__main__":
    main()
