"""Detail-description probe over a dataset with self-PPL accounting.

Rebuild of /root/reference/llava/eval/model_vqa_science_for_ppl.py:40-175:
asks "Describe the image in detail." for every image in the question file,
records each answer with its token length and self-perplexity, and appends
a summary row with the mean self-PPL. (The reference hardcodes the query
and its gpt4o_ppl column is a placeholder always written as 0.0 — kept for
format compatibility.)
"""

from __future__ import annotations

import argparse
import json
import os
import uuid

from .model_vqa_loader import get_chunk
from .self_ppl import generate_with_self_ppl, prepare_image_prompt

DEFAULT_QUERY = "Describe the image in detail."


def eval_model(args):
    from ..models.builder import load_pretrained_model

    tokenizer, runtime, image_processor, _ = load_pretrained_model(
        args.model_path, args.model_base
    )
    questions = json.load(open(os.path.expanduser(args.question_file)))
    questions = get_chunk(questions, args.num_chunks, args.chunk_idx)
    answers_file = os.path.expanduser(args.answers_file)
    os.makedirs(os.path.dirname(os.path.abspath(answers_file)), exist_ok=True)

    n_images = 0
    sum_self_ppl = 0.0
    with open(answers_file, "w") as ans_file:
        for line in questions[: args.limit] if args.limit else questions:
            if "image" not in line:
                continue
            ids, pixels = prepare_image_prompt(
                args.query, runtime.cfg,
                os.path.join(args.image_folder, line["image"]),
                image_processor, args.conv_mode, tokenizer)
            result = generate_with_self_ppl(
                runtime, tokenizer, ids, pixels,
                max_new_tokens=args.max_new_tokens,
                temperature=args.temperature)
            n_images += 1
            sum_self_ppl += result["self_ppl"]
            ans_file.write(json.dumps({
                "question_id": line["id"],
                "prompt": "<image>\n" + args.query,
                "answer": result["text"],
                "answer_id": uuid.uuid4().hex,
                "model_id": args.model_path.split("/")[-1],
                "metadata": {},
                "answer_token_len": str(result["answer_token_len"]),
                "self_ppl": str(result["self_ppl"]),
                "gpt4o_ppl": str(0.0),
            }) + "\n")
            ans_file.flush()
        mean_ppl = sum_self_ppl / n_images if n_images else 0.0
        ans_file.write(json.dumps({
            "mean_self_ppl": str(mean_ppl),
            "mean_gpt4o_ppl": str(0.0),
        }) + "\n")
    print("mean_self_ppl: " + str(mean_ppl))


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--model-path", dest="model_path", required=True)
    parser.add_argument("--model-base", dest="model_base", default=None)
    parser.add_argument("--image-folder", dest="image_folder", default="")
    parser.add_argument("--question-file", dest="question_file", required=True)
    parser.add_argument("--answers-file", dest="answers_file",
                        default="answer.jsonl")
    parser.add_argument("--conv-mode", dest="conv_mode", default="llava_v0")
    parser.add_argument("--num-chunks", dest="num_chunks", type=int, default=1)
    parser.add_argument("--chunk-idx", dest="chunk_idx", type=int, default=0)
    parser.add_argument("--temperature", type=float, default=0.2)
    parser.add_argument("--query", default=DEFAULT_QUERY)
    parser.add_argument("--max_new_tokens", type=int, default=1024)
    parser.add_argument("--limit", type=int, default=0)
    eval_model(parser.parse_args(argv))


if __name__ == "__main__":
    main()
