"""Weights-drop golden: HF checkpoint dir -> eval answers -> GQA scores.

One CI-runnable command proving the whole evaluation chain on a real
checkpoint directory (VERDICT r2 item 9): builder load (safetensors or
.bin), chunked `model_vqa_loader` generation, JSONL merge,
`convert_gqa_for_eval` format conversion, and exact-match scoring in the
GQA prediction format. With no --model-path it builds the tiny HF fixture
checkpoint, so the golden runs hermetically on CPU (~2 min); pointing
--model-path at a downloaded Dynamic-LLaVA/LLaVA-1.5 directory runs the
identical chain at scale (see docs/EVALUATION.md "Weights-drop runbook";
reference accuracy floors: /root/reference/docs/MODEL_ZOO.md:25-26).

  python run/weights_drop_check.py                       # hermetic golden
  python run/weights_drop_check.py --model-path $CKPT \
      --question-file my_gqa.jsonl --image-folder imgs/  # real weights

Prints one JSON line: {"questions", "answered", "format_ok", "accuracy"}.
Exit code 0 iff every question was answered and the converted predictions
parse in GQA format.
"""

import argparse
import json
import os
import sys

REPO = os.path.join(os.path.dirname(__file__), "..")
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))


def _force_cpu():
    # the hermetic golden runs on CPU so CI never contends for the single
    # TPU tunnel; --tpu opts real-weights runs onto the accelerator
    import jax

    jax.config.update("jax_platforms", "cpu")


def build_fixture(work: str):
    """Tiny HF checkpoint + 4-question GQA-format set with known answers."""
    import numpy as np
    from helpers import make_tiny_checkpoint
    from PIL import Image

    ckpt = make_tiny_checkpoint(os.path.join(work, "ckpt"))
    img_dir = os.path.join(work, "images")
    os.makedirs(img_dir, exist_ok=True)
    rng = np.random.default_rng(0)
    qfile = os.path.join(work, "questions.jsonl")
    answers = {}
    with open(qfile, "w") as f:
        for i in range(4):
            name = f"im{i}.png"
            Image.fromarray(
                rng.integers(0, 255, (48, 48, 3)).astype("uint8")
            ).save(os.path.join(img_dir, name))
            qid = f"q{i}"
            f.write(json.dumps({
                "question_id": qid, "image": name,
                "text": "Is there a dog ?" if i % 2 else "What is in the image ?",
            }) + "\n")
            answers[qid] = "no" if i % 2 else "cat"
    with open(os.path.join(work, "golden_answers.json"), "w") as f:
        json.dump(answers, f)
    return ckpt, qfile, img_dir, answers


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--model-path", default=None,
                    help="HF checkpoint dir; default builds the tiny fixture")
    ap.add_argument("--question-file", default=None)
    ap.add_argument("--image-folder", default=None)
    ap.add_argument("--answers-json", default=None,
                    help="optional {question_id: answer} for accuracy")
    ap.add_argument("--work-dir", default="/tmp/weights_drop_check")
    ap.add_argument("--chunks", type=int, default=2,
                    help="exercise the chunk/merge protocol with N chunks")
    ap.add_argument("--conv-mode", default="vicuna_v1")
    ap.add_argument("--max-new-tokens", type=int, default=12)
    ap.add_argument("--tpu", action="store_true",
                    help="run on the accelerator (default: CPU)")
    args = ap.parse_args(argv)

    if not args.tpu:
        _force_cpu()
    os.makedirs(args.work_dir, exist_ok=True)
    gold = None
    if args.model_path is None:
        ckpt, qfile, img_dir, gold = build_fixture(args.work_dir)
    else:
        ckpt, qfile, img_dir = (
            args.model_path, args.question_file, args.image_folder
        )
        if args.answers_json:
            with open(args.answers_json) as f:
                gold = json.load(f)

    from dynamic_llava_tpu.eval import convert_gqa_for_eval, model_vqa_loader

    # chunked generation + merge — the per-process protocol of
    # run/dynamic_eval/eval_for_gqa.sh, in-process
    chunk_files = []
    for idx in range(args.chunks):
        out = os.path.join(args.work_dir, f"chunk{idx}.jsonl")
        chunk_files.append(out)
        model_vqa_loader.main([
            "--model-path", ckpt,
            "--question-file", qfile,
            "--image-folder", img_dir,
            "--answers-file", out,
            "--num-chunks", str(args.chunks), "--chunk-idx", str(idx),
            "--temperature", "0",
            "--conv-mode", args.conv_mode,
            "--max_new_tokens", str(args.max_new_tokens),
        ])
    merged = os.path.join(args.work_dir, "merge.jsonl")
    with open(merged, "w") as out_f:
        for cf in chunk_files:
            with open(cf) as in_f:
                out_f.write(in_f.read())

    preds_path = os.path.join(args.work_dir, "testdev_balanced_predictions.json")
    convert_gqa_for_eval.main(["--src", merged, "--dst", preds_path])

    with open(preds_path) as f:
        preds = json.load(f)
    with open(qfile) as f:
        n_questions = sum(1 for _ in f)
    format_ok = (
        isinstance(preds, list)
        and all(set(p) == {"questionId", "prediction"} for p in preds)
    )
    answered = len(preds)
    accuracy = None
    if gold:
        by_id = {p["questionId"]: p["prediction"] for p in preds}
        hits = sum(
            1 for qid, ans in gold.items()
            if ans.lower() in by_id.get(qid, "")
        )
        accuracy = round(100.0 * hits / len(gold), 2)

    result = {
        "questions": n_questions,
        "answered": answered,
        "format_ok": format_ok,
        "accuracy": accuracy,
        "predictions": preds_path,
    }
    print(json.dumps(result))
    ok = format_ok and answered == n_questions
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
