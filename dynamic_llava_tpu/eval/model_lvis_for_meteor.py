"""LVIS generation-quality probe: free-running generation for METEOR scoring
(reference /root/reference/llava/dynamic_eval/model_lvis_for_meteor.py).

Generates answers (instead of teacher-forcing), logs the same cache-length
accounting, and scores METEOR against the references when nltk is present
(offline environments fall back to emitting the pairs for external scoring).
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np


def try_meteor(pred: str, ref: str):
    try:
        from nltk.translate.meteor_score import meteor_score

        return float(meteor_score([ref.split()], pred.split()))
    except Exception:
        return None


def eval_model(args):
    from PIL import Image

    from ..constants import DEFAULT_IMAGE_TOKEN
    from ..conversation import conv_templates
    from ..generation.generate import GenerationConfig, Generator
    from ..mm_utils import process_images, tokenizer_image_token
    from ..models.builder import load_pretrained_model
    from ..multimodal.fusion import plan_batch

    tokenizer, runtime, image_processor, _ = load_pretrained_model(
        args.model_path, args.model_base
    )
    records = [json.loads(l) for l in open(os.path.expanduser(args.question_file))]
    if args.limit:
        records = records[: args.limit]
    os.makedirs(os.path.dirname(os.path.abspath(args.answers_file)), exist_ok=True)
    out = open(args.answers_file, "w")

    gen = Generator(
        runtime.params, runtime.cfg,
        GenerationConfig(
            max_new_tokens=args.max_new_tokens,
            temperature=args.temperature,
            eos_token_id=tokenizer.eos_token_id,
        ),
    )
    for line in records:
        conv = conv_templates[args.conv_mode].copy()
        conv.append_message(conv.roles[0], DEFAULT_IMAGE_TOKEN + "\n" + line["text"])
        conv.append_message(conv.roles[1], None)
        ids = np.asarray(
            tokenizer_image_token(conv.get_prompt(), tokenizer), np.int64
        )
        image = Image.open(
            os.path.join(args.image_folder, line["image"])
        ).convert("RGB")
        pixels = process_images([image], image_processor, runtime.cfg)

        plan = plan_batch([ids], runtime.cfg.num_image_tokens)
        state, _ = gen.prefill_from_plan(plan, pixels, args.max_new_tokens)
        prefill_post = int(np.asarray(state.cache.post.length)[-1, 0])

        out_ids = gen.generate([ids], pixels)[0]
        if out_ids and out_ids[-1] == tokenizer.eos_token_id:
            out_ids = out_ids[:-1]
        pred = tokenizer.decode(out_ids, skip_special_tokens=True).strip()
        ref = line.get("answer", "")
        rec = {
            "question_id": line.get("question_id"),
            "text": pred,
            "reference": ref,
            "meteor": try_meteor(pred, ref),
            "output_token_length": len(out_ids),
            "prefill_cache_length": prefill_post,
        }
        out.write(json.dumps(rec) + "\n")
        out.flush()
    out.close()


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--model-path", dest="model_path", required=True)
    parser.add_argument("--model-base", dest="model_base", default=None)
    parser.add_argument("--image-folder", dest="image_folder", default="")
    parser.add_argument("--question-file", dest="question_file", required=True)
    parser.add_argument("--answers-file", dest="answers_file", default="meteor.jsonl")
    parser.add_argument("--conv-mode", dest="conv_mode", default="vicuna_v1")
    parser.add_argument("--temperature", type=float, default=0.0)
    parser.add_argument("--max_new_tokens", type=int, default=256)
    parser.add_argument("--limit", type=int, default=0)
    eval_model(parser.parse_args(argv))


if __name__ == "__main__":
    main()
