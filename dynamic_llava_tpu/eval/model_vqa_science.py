"""ScienceQA generator with CoT answer prompting
(reference /root/reference/llava/dynamic_eval/model_vqa_science.py)."""

from __future__ import annotations

import argparse
import json
import os
import uuid

import numpy as np

from .model_vqa_loader import get_chunk


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
    questions = json.load(open(os.path.expanduser(args.question_file)))
    questions = get_chunk(questions, args.num_chunks, args.chunk_idx)
    os.makedirs(os.path.dirname(os.path.abspath(args.answers_file)), exist_ok=True)
    ans_file = open(os.path.expanduser(args.answers_file), "w")

    gen = Generator(
        runtime.params, runtime.cfg,
        GenerationConfig(
            max_new_tokens=1024,
            temperature=args.temperature,
            eos_token_id=tokenizer.eos_token_id,
        ),
    )
    for line in questions:
        idx = line["id"]
        question = line["conversations"][0]
        qs = question["value"].replace("<image>", "").strip()
        pixels = None
        if "image" in line:
            image = Image.open(
                os.path.join(args.image_folder, line["image"])
            ).convert("RGB")
            pixels = process_images([image], image_processor, runtime.cfg)
            qs = DEFAULT_IMAGE_TOKEN + "\n" + qs

        if args.single_pred_prompt:
            qs = qs + "\n" + "Answer with the option's letter from the given choices directly."

        conv = conv_templates[args.conv_mode].copy()
        conv.append_message(conv.roles[0], qs)
        conv.append_message(conv.roles[1], None)
        prompt = conv.get_prompt()
        input_ids = np.asarray(tokenizer_image_token(prompt, tokenizer), np.int64)

        out_ids = gen.generate([input_ids], pixels)[0]
        if out_ids and out_ids[-1] == tokenizer.eos_token_id:
            out_ids = out_ids[:-1]
        outputs = tokenizer.decode(out_ids, skip_special_tokens=True).strip()

        ans_file.write(
            json.dumps(
                {
                    "question_id": idx,
                    "prompt": qs,
                    "text": outputs,
                    "answer_id": uuid.uuid4().hex,
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
    parser.add_argument("--conv-mode", dest="conv_mode", type=str, default="llava_v1")
    parser.add_argument("--num-chunks", dest="num_chunks", type=int, default=1)
    parser.add_argument("--chunk-idx", dest="chunk_idx", type=int, default=0)
    parser.add_argument("--temperature", type=float, default=0.0)
    parser.add_argument("--single-pred-prompt", dest="single_pred_prompt",
                        action="store_true")
    eval_model(parser.parse_args(argv))


if __name__ == "__main__":
    main()
