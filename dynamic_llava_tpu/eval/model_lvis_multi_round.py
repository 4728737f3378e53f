"""Multi-round LVIS probes (PPL + METEOR variants).

Rebuild of /root/reference/llava/dynamic_eval/model_lvis_multi_round_for_{ppl,meteor}.py:
several QA rounds against ONE live KV cache, exercising the continuation
prefill (E5) path — the reference processes follow-up instructions with
threshold pruning (dynamic_modeling_llama.py:2506-2521). Logs per-round
cache lengths so decode + instruct sparsification is observable across
rounds.
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np


def run_rounds(runtime, tokenizer, rounds, pixels, conv_mode: str,
               max_new_tokens: int, teacher_forced: bool):
    import jax.numpy as jnp

    from ..constants import DEFAULT_IMAGE_TOKEN
    from ..conversation import conv_templates
    from ..generation.generate import GenerationConfig, Generator
    from ..mm_utils import tokenizer_image_token
    from ..models import dynamic
    from ..multimodal.fusion import plan_batch

    gen = Generator(runtime.params, runtime.cfg,
                    GenerationConfig(max_new_tokens=max_new_tokens,
                                     eos_token_id=tokenizer.eos_token_id))
    conv = conv_templates[conv_mode].copy()
    conv.append_message(conv.roles[0], DEFAULT_IMAGE_TOKEN + "\n" + rounds[0]["text"])
    conv.append_message(conv.roles[1], None)
    ids = np.asarray(tokenizer_image_token(conv.get_prompt(), tokenizer), np.int64)
    plan = plan_batch([ids], runtime.cfg.num_image_tokens)
    budget = (len(rounds) + 1) * max_new_tokens
    state, _ = gen.prefill_from_plan(plan, pixels, budget)

    records = []
    for r, item in enumerate(rounds):
        if r > 0:
            # follow-up instruct chunk through the continuation path (E5)
            follow = f" USER: {item['text']} ASSISTANT:"
            chunk = np.asarray(tokenizer(follow).input_ids[1:], np.int64)
            state = dynamic.prefill_continue(
                runtime.params, runtime.cfg, jnp.asarray(chunk[None]), state
            )
        nll = []
        gen_ids = []
        answer_ids = tokenizer(item["answer"]).input_ids[1:]
        steps = answer_ids if teacher_forced else range(max_new_tokens)
        for t in steps:
            logits = np.asarray(state.last_logits[0], np.float32)
            if teacher_forced:
                logp = logits - (np.log(np.sum(np.exp(logits - logits.max()))) + logits.max())
                nll.append(-logp[t])
                nxt = t
            else:
                nxt = int(np.argmax(logits))
                if nxt == tokenizer.eos_token_id:
                    break
                gen_ids.append(nxt)
            state = gen._decode(gen.params, gen.cfg, jnp.asarray([nxt]), state)
        rec = {
            "round": r,
            "pre_cache_length": int(np.asarray(state.cache.pre.length)[0, 0]),
            "post_cache_length": int(np.asarray(state.cache.post.length)[-1, 0]),
        }
        if teacher_forced:
            rec["ppl"] = float(np.exp(np.mean(nll))) if nll else None
            rec["output_token_length"] = len(answer_ids)
        else:
            rec["text"] = tokenizer.decode(gen_ids, skip_special_tokens=True)
        records.append(rec)
    return records


def eval_model(args):
    from PIL import Image

    from ..mm_utils import process_images
    from ..models.builder import load_pretrained_model

    tokenizer, runtime, image_processor, _ = load_pretrained_model(
        args.model_path, args.model_base
    )
    samples = [json.loads(l) for l in open(os.path.expanduser(args.question_file))]
    if args.limit:
        samples = samples[: args.limit]
    os.makedirs(os.path.dirname(os.path.abspath(args.answers_file)), exist_ok=True)
    out = open(args.answers_file, "w")
    for sample in samples:
        image = Image.open(
            os.path.join(args.image_folder, sample["image"])
        ).convert("RGB")
        pixels = process_images([image], image_processor, runtime.cfg)
        rounds = sample["rounds"] if "rounds" in sample else [sample]
        recs = run_rounds(
            runtime, tokenizer, rounds, pixels, args.conv_mode,
            args.max_new_tokens, teacher_forced=args.mode == "ppl",
        )
        out.write(json.dumps(
            {"question_id": sample.get("question_id"), "rounds": recs}
        ) + "\n")
        out.flush()
    out.close()


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--model-path", dest="model_path", required=True)
    parser.add_argument("--model-base", dest="model_base", default=None)
    parser.add_argument("--image-folder", dest="image_folder", default="")
    parser.add_argument("--question-file", dest="question_file", required=True)
    parser.add_argument("--answers-file", dest="answers_file", default="multiround.jsonl")
    parser.add_argument("--conv-mode", dest="conv_mode", default="vicuna_v1")
    parser.add_argument("--mode", choices=["ppl", "meteor"], default="ppl")
    parser.add_argument("--max_new_tokens", type=int, default=128)
    parser.add_argument("--limit", type=int, default=0)
    eval_model(parser.parse_args(argv))


if __name__ == "__main__":
    main()
