"""Text-only QA answer generator (no images).

Rebuild of /root/reference/llava/eval/model_qa.py:14-63: answers a
question JSONL with the language model alone through the default
conversation template — the baseline side for text-only GPT reviews.
"""

from __future__ import annotations

import argparse
import json
import os
import uuid

import numpy as np


def eval_model(args):
    from ..conversation import default_conversation
    from ..generation.generate import GenerationConfig, Generator
    from ..models.builder import load_pretrained_model

    tokenizer, runtime, _, _ = load_pretrained_model(
        args.model_path, args.model_base
    )
    gen = Generator(
        runtime.params, runtime.cfg,
        GenerationConfig(
            max_new_tokens=args.max_new_tokens,
            temperature=args.temperature,
            eos_token_id=tokenizer.eos_token_id,
        ),
    )
    questions = [json.loads(line)
                 for line in open(os.path.expanduser(args.question_file))]
    answers_file = os.path.expanduser(args.answers_file)
    os.makedirs(os.path.dirname(os.path.abspath(answers_file)), exist_ok=True)
    with open(answers_file, "w") as ans_file:
        for line in questions:
            conv = default_conversation.copy()
            conv.append_message(conv.roles[0], line["text"])
            conv.append_message(conv.roles[1], None)
            input_ids = np.asarray(
                tokenizer(conv.get_prompt()).input_ids, np.int64)
            out_ids = gen.generate([input_ids], None)[0]
            if out_ids and out_ids[-1] == tokenizer.eos_token_id:
                out_ids = out_ids[:-1]
            outputs = tokenizer.decode(
                out_ids, skip_special_tokens=True).strip()
            ans_file.write(json.dumps({
                "question_id": line["question_id"],
                "text": outputs,
                "answer_id": uuid.uuid4().hex,
                "model_id": args.model_path.split("/")[-1],
                "metadata": {},
            }) + "\n")
            ans_file.flush()


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--model-path", dest="model_path", required=True)
    parser.add_argument("--model-base", dest="model_base", default=None)
    parser.add_argument("--question-file", dest="question_file", required=True)
    parser.add_argument("--answers-file", dest="answers_file",
                        default="answer.jsonl")
    parser.add_argument("--temperature", type=float, default=0.7)
    parser.add_argument("--max_new_tokens", type=int, default=1024)
    eval_model(parser.parse_args(argv))


if __name__ == "__main__":
    main()
