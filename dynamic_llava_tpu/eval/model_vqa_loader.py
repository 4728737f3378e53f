"""Batch VQA answer generator (VQAv2 / GQA / TextVQA / POPE / VizWiz).

Rebuild of /root/reference/llava/dynamic_eval/model_vqa_loader.py:30-215:
chunked question file -> conversation-template prompt -> greedy generate ->
answers JSONL. Chunking (``split_list``/``get_chunk``) reproduces the
reference's embarrassingly-parallel eval sharding; on TPU each host/process
runs one chunk and the shells merge JSONLs.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import numpy as np


def split_list(lst, n):
    chunk_size = math.ceil(len(lst) / n)
    return [lst[i : i + chunk_size] for i in range(0, len(lst), chunk_size)]


def get_chunk(lst, n, k):
    return split_list(lst, n)[k]


def build_prompt(question: str, conv_mode: str, mm_use_im_start_end: bool) -> str:
    from ..constants import (
        DEFAULT_IM_END_TOKEN,
        DEFAULT_IM_START_TOKEN,
        DEFAULT_IMAGE_TOKEN,
    )
    from ..conversation import conv_templates

    if mm_use_im_start_end:
        qs = (
            DEFAULT_IM_START_TOKEN + DEFAULT_IMAGE_TOKEN + DEFAULT_IM_END_TOKEN
            + "\n" + question
        )
    else:
        qs = DEFAULT_IMAGE_TOKEN + "\n" + question
    conv = conv_templates[conv_mode].copy()
    conv.append_message(conv.roles[0], qs)
    conv.append_message(conv.roles[1], None)
    return conv.get_prompt()


def eval_model(args):
    from PIL import Image

    from ..generation.generate import GenerationConfig, Generator
    from ..mm_utils import process_images, tokenizer_image_token
    from ..models.builder import load_pretrained_model

    tokenizer, runtime, image_processor, _ = load_pretrained_model(
        args.model_path, args.model_base
    )
    questions = [
        json.loads(q) for q in open(os.path.expanduser(args.question_file))
    ]
    questions = get_chunk(questions, args.num_chunks, args.chunk_idx)
    os.makedirs(os.path.dirname(os.path.abspath(args.answers_file)), exist_ok=True)
    ans_file = open(os.path.expanduser(args.answers_file), "w")

    gen = Generator(
        runtime.params,
        runtime.cfg,
        GenerationConfig(
            max_new_tokens=args.max_new_tokens,
            temperature=args.temperature,
            top_p=args.top_p if args.top_p is not None else 1.0,
            eos_token_id=tokenizer.eos_token_id,
        ),
    )
    for line in questions:
        idx = line["question_id"]
        prompt_text = build_prompt(
            line["text"], args.conv_mode, runtime.cfg.mm_use_im_start_end
        )
        input_ids = np.asarray(
            tokenizer_image_token(prompt_text, tokenizer), np.int64
        )
        image = Image.open(
            os.path.join(args.image_folder, line["image"])
        ).convert("RGB")
        pixels = process_images(
            [image], image_processor, runtime.cfg
        )
        if args.spec_k > 0 and args.temperature <= 0.0:
            # speculative verify rounds: identical greedy answers, fewer
            # decode passes (real checkpoints quote questions/options, the
            # prompt-lookup regime) — generation/speculative.py
            out_ids = gen.generate_speculative(
                [input_ids], pixels, draft_k=args.spec_k
            )[0]
        else:
            out_ids = gen.generate([input_ids], pixels)[0]
        if out_ids and out_ids[-1] == tokenizer.eos_token_id:
            out_ids = out_ids[:-1]
        outputs = tokenizer.decode(out_ids, skip_special_tokens=True).strip()
        ans_file.write(
            json.dumps(
                {
                    "question_id": idx,
                    "prompt": line["text"],
                    "text": outputs,
                    "answer_id": None,
                    "model_id": args.model_path.split("/")[-1],
                    "metadata": {},
                }
            )
            + "\n"
        )
        ans_file.flush()
    ans_file.close()


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--model-path", dest="model_path", type=str, required=True)
    parser.add_argument("--model-base", dest="model_base", type=str, default=None)
    parser.add_argument("--image-folder", dest="image_folder", type=str, default="")
    parser.add_argument("--question-file", dest="question_file", type=str, required=True)
    parser.add_argument("--answers-file", dest="answers_file", type=str, default="answer.jsonl")
    parser.add_argument("--conv-mode", dest="conv_mode", type=str, default="vicuna_v1")
    parser.add_argument("--num-chunks", dest="num_chunks", type=int, default=1)
    parser.add_argument("--chunk-idx", dest="chunk_idx", type=int, default=0)
    parser.add_argument("--temperature", type=float, default=0.0)
    parser.add_argument("--top_p", type=float, default=None)
    parser.add_argument("--num_beams", type=int, default=1)
    parser.add_argument("--max_new_tokens", type=int, default=128)
    parser.add_argument("--spec_k", type=int, default=0,
                        help="speculative decoding for greedy runs: verify "
                             "1+k candidates per fused pass (0 = off)")
    eval_model(parser.parse_args(argv))


if __name__ == "__main__":
    main()
