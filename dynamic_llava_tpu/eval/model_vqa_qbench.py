"""Q-Bench (low-level vision quality) generator
(reference /root/reference/llava/eval/model_vqa_qbench.py): multiple-choice
questions over image quality with lettered options."""

from __future__ import annotations

import argparse
import json
import os

import numpy as np


def eval_model(args):
    from PIL import Image

    from ..constants import DEFAULT_IMAGE_TOKEN
    from ..conversation import conv_templates
    from ..generation.generate import GenerationConfig, Generator
    from ..mm_utils import process_images, tokenizer_image_token
    from ..models.builder import load_pretrained_model

    tokenizer, runtime, image_processor, _ = load_pretrained_model(
        args.model_path, args.model_base
    )
    with open(args.questions_file) as f:
        questions = json.load(f)
    os.makedirs(os.path.dirname(os.path.abspath(args.answers_file)) or ".",
                exist_ok=True)
    out = open(args.answers_file, "w")

    gen = Generator(
        runtime.params, runtime.cfg,
        GenerationConfig(max_new_tokens=args.max_new_tokens, temperature=0.0,
                         eos_token_id=tokenizer.eos_token_id),
    )
    options = ["A.", "B.", "C.", "D."]
    for item in questions:
        image = Image.open(
            os.path.join(args.image_folder, item["img_path"])
        ).convert("RGB")
        pixels = process_images([image], image_processor, runtime.cfg)

        qs = item["question"] + "\n"
        for letter, cand in zip(options, item["candidates"]):
            qs += f"{letter} {cand}\n"
        qs = DEFAULT_IMAGE_TOKEN + "\n" + qs + (
            "Answer with the option's letter from the given choices directly."
        )
        conv = conv_templates[args.conv_mode].copy()
        conv.append_message(conv.roles[0], qs)
        conv.append_message(conv.roles[1], None)
        ids = np.asarray(
            tokenizer_image_token(conv.get_prompt(), tokenizer), np.int64
        )
        out_ids = gen.generate([ids], pixels)[0]
        if out_ids and out_ids[-1] == tokenizer.eos_token_id:
            out_ids = out_ids[:-1]
        item["response"] = tokenizer.decode(out_ids, skip_special_tokens=True).strip()
        out.write(json.dumps(item) + "\n")
        out.flush()
    out.close()


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--model-path", dest="model_path", required=True)
    parser.add_argument("--model-base", dest="model_base", default=None)
    parser.add_argument("--image-folder", dest="image_folder", default="")
    parser.add_argument("--questions-file", dest="questions_file", required=True)
    parser.add_argument("--answers-file", dest="answers_file", default="qbench.jsonl")
    parser.add_argument("--conv-mode", dest="conv_mode", default="llava_v1")
    parser.add_argument("--lang", type=str, default="en")
    parser.add_argument("--max_new_tokens", type=int, default=16)
    eval_model(parser.parse_args(argv))


if __name__ == "__main__":
    main()
