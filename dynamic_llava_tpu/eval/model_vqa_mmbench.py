"""MMBench generator: TSV with base64 images + circular option shuffling
(reference /root/reference/llava/eval/model_vqa_mmbench.py)."""

from __future__ import annotations

import argparse
import json
import math
import os

import numpy as np

from .model_vqa_loader import get_chunk

all_options = ["A", "B", "C", "D"]


def is_none(value) -> bool:
    if value is None:
        return True
    try:
        if math.isnan(value):
            return True
    except TypeError:
        pass
    return str(value).lower() in ("nan", "none", "")


def get_options(row, options):
    return [row[o] for o in options if not is_none(row.get(o))]


def eval_model(args):
    import pandas as pd

    from ..constants import (
        DEFAULT_IM_END_TOKEN,
        DEFAULT_IM_START_TOKEN,
        DEFAULT_IMAGE_TOKEN,
    )
    from ..conversation import conv_templates
    from ..generation.generate import GenerationConfig, Generator
    from ..mm_utils import (
        load_image_from_base64,
        process_images,
        tokenizer_image_token,
    )
    from ..models.builder import load_pretrained_model

    tokenizer, runtime, image_processor, _ = load_pretrained_model(
        args.model_path, args.model_base
    )
    questions = pd.read_table(os.path.expanduser(args.question_file))
    questions = get_chunk(questions.to_dict("records"), args.num_chunks, args.chunk_idx)
    os.makedirs(os.path.dirname(os.path.abspath(args.answers_file)), exist_ok=True)
    ans_file = open(os.path.expanduser(args.answers_file), "w")

    gen = Generator(
        runtime.params, runtime.cfg,
        GenerationConfig(
            max_new_tokens=args.max_new_tokens,
            temperature=args.temperature,
            eos_token_id=tokenizer.eos_token_id,
        ),
    )
    for row in questions:
        options = get_options(row, all_options)
        cur_option_char = all_options[: len(options)]
        num_rounds = len(options) if args.all_rounds else 1
        for round_idx in range(num_rounds):
            idx = row["index"]
            question = row["question"]
            hint = row.get("hint")
            image = load_image_from_base64(row["image"])
            if not is_none(hint):
                question = hint + "\n" + question
            for option_char, option in zip(all_options[: len(options)], options):
                question = question + "\n" + option_char + ". " + option
            qs = DEFAULT_IMAGE_TOKEN + "\n" + question
            if args.single_pred_prompt:
                if args.lang == "cn":
                    qs = qs + "\n" + "请直接回答选项字母。"
                else:
                    qs = qs + "\n" + (
                        "Answer with the option's letter from the given "
                        "choices directly."
                    )

            conv = conv_templates[args.conv_mode].copy()
            conv.append_message(conv.roles[0], qs)
            conv.append_message(conv.roles[1], None)
            prompt = conv.get_prompt()
            input_ids = np.asarray(
                tokenizer_image_token(prompt, tokenizer), np.int64
            )
            pixels = process_images([image.convert("RGB")], image_processor, runtime.cfg)
            out_ids = gen.generate([input_ids], pixels)[0]
            if out_ids and out_ids[-1] == tokenizer.eos_token_id:
                out_ids = out_ids[:-1]
            outputs = tokenizer.decode(out_ids, skip_special_tokens=True).strip()

            ans_file.write(
                json.dumps(
                    {
                        "question_id": idx,
                        "round_id": round_idx,
                        "prompt": question,
                        "text": outputs,
                        "options": options,
                        "option_char": cur_option_char,
                        "answer_id": None,
                        "model_id": args.model_path.split("/")[-1],
                        "metadata": {},
                    }
                )
                + "\n"
            )
            ans_file.flush()
            # circular shift for the next round
            options = options[1:] + options[:1]
            cur_option_char = cur_option_char[1:] + cur_option_char[:1]
    ans_file.close()


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--model-path", dest="model_path", type=str, required=True)
    parser.add_argument("--model-base", dest="model_base", type=str, default=None)
    parser.add_argument("--question-file", dest="question_file", type=str, required=True)
    parser.add_argument("--answers-file", dest="answers_file", type=str, default="answer.jsonl")
    parser.add_argument("--conv-mode", dest="conv_mode", type=str, default="vicuna_v1")
    parser.add_argument("--num-chunks", dest="num_chunks", type=int, default=1)
    parser.add_argument("--chunk-idx", dest="chunk_idx", type=int, default=0)
    parser.add_argument("--temperature", type=float, default=0.0)
    parser.add_argument("--max_new_tokens", type=int, default=128)
    parser.add_argument("--all-rounds", dest="all_rounds", action="store_true")
    parser.add_argument("--single-pred-prompt", dest="single_pred_prompt", action="store_true")
    parser.add_argument("--lang", type=str, default="en")
    eval_model(parser.parse_args(argv))


if __name__ == "__main__":
    main()
