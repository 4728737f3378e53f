"""LVIS generation-quality probe: teacher-forced PPL + KV-cache shrinkage.

Rebuild of /root/reference/llava/dynamic_eval/model_lvis_for_ppl.py:49-242:
walks the reference answer token by token through the decode path, logging
per-sample perplexity, ``prefill_cache_length`` / ``output_cache_length`` vs
``output_token_length`` (the direct observability of decode KV
sparsification, reference :166-181), and device memory stats (the TPU
analogue of the CUDA peak-memory probes :55-61).
"""

from __future__ import annotations

import argparse
import json
import os
from typing import Dict, List

import numpy as np


def teacher_forced_ppl(
    runtime, tokenizer, input_ids: np.ndarray, answer_ids: List[int],
    pixel_values, max_new: int = 1024,
) -> Dict:
    import jax.numpy as jnp

    from ..generation.generate import Generator, GenerationConfig
    from ..multimodal.fusion import plan_batch

    gen = Generator(runtime.params, runtime.cfg,
                    GenerationConfig(max_new_tokens=max_new))
    plan = plan_batch([input_ids], runtime.cfg.num_image_tokens
                      if pixel_values is not None else 0)
    state, info = gen.prefill_from_plan(plan, pixel_values, len(answer_ids) + 4)
    prefill_pre = int(np.asarray(state.cache.pre.length)[0, 0])
    prefill_post = int(np.asarray(state.cache.post.length)[-1, 0])

    nll = []
    for t, tok in enumerate(answer_ids):
        logits = np.asarray(state.last_logits[0], np.float32)
        logp = logits - np.log(np.sum(np.exp(logits - logits.max()))) - logits.max()
        nll.append(-logp[tok])
        state = gen._decode(gen.params, gen.cfg, jnp.asarray([tok]), state)

    out_pre = int(np.asarray(state.cache.pre.length)[0, 0])
    out_post = int(np.asarray(state.cache.post.length)[-1, 0])
    # measured memory (live buffers + model split) — the tunnel's
    # memory_stats() is None, so this uses the profiling fallbacks
    from ..profiling import memory_report

    mem = memory_report(model_params=runtime.params)
    return {
        "ppl": float(np.exp(np.mean(nll))),
        "prefill_cache_length": prefill_post,
        "prefill_full_length": prefill_pre,
        "output_token_length": len(answer_ids),
        "output_cache_length": out_post - prefill_post,
        "output_full_length": out_pre - prefill_pre,
        **mem,
    }


def eval_model(args):
    from PIL import Image

    from ..constants import DEFAULT_IMAGE_TOKEN
    from ..conversation import conv_templates
    from ..mm_utils import process_images, tokenizer_image_token
    from ..models.builder import load_pretrained_model

    tokenizer, runtime, image_processor, _ = load_pretrained_model(
        args.model_path, args.model_base
    )
    records = [json.loads(l) for l in open(os.path.expanduser(args.question_file))]
    os.makedirs(os.path.dirname(os.path.abspath(args.answers_file)), exist_ok=True)
    out = open(args.answers_file, "w")
    for line in records[: args.limit] if args.limit else records:
        conv = conv_templates[args.conv_mode].copy()
        conv.append_message(conv.roles[0], DEFAULT_IMAGE_TOKEN + "\n" + line["text"])
        conv.append_message(conv.roles[1], None)
        prompt = conv.get_prompt()
        ids = np.asarray(tokenizer_image_token(prompt, tokenizer), np.int64)
        answer_ids = tokenizer(line["answer"]).input_ids[1:]  # strip bos
        image = Image.open(os.path.join(args.image_folder, line["image"])).convert("RGB")
        pixels = process_images([image], image_processor, runtime.cfg)
        rec = teacher_forced_ppl(runtime, tokenizer, ids, answer_ids, pixels)
        rec["question_id"] = line.get("question_id")
        out.write(json.dumps(rec) + "\n")
        out.flush()
    out.close()


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--model-path", dest="model_path", required=True)
    parser.add_argument("--model-base", dest="model_base", default=None)
    parser.add_argument("--image-folder", dest="image_folder", default="")
    parser.add_argument("--question-file", dest="question_file", required=True)
    parser.add_argument("--answers-file", dest="answers_file", default="ppl.jsonl")
    parser.add_argument("--conv-mode", dest="conv_mode", default="vicuna_v1")
    parser.add_argument("--limit", type=int, default=0)
    eval_model(parser.parse_args(argv))


if __name__ == "__main__":
    main()
