"""Interactive chat CLI.

Rebuild of /root/reference/llava/serve/cli.py:36-145: load checkpoint ->
process image -> conversation loop -> streamed generation. Token-by-token
streaming uses the jitted decode step directly.
"""

from __future__ import annotations

import argparse

import numpy as np


def load_image(image_file: str):
    from io import BytesIO

    from PIL import Image

    if image_file.startswith(("http://", "https://")):
        import requests

        resp = requests.get(image_file)
        return Image.open(BytesIO(resp.content)).convert("RGB")
    return Image.open(image_file).convert("RGB")


def main(args=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--model-path", dest="model_path", type=str, required=True)
    parser.add_argument("--model-base", dest="model_base", type=str, default=None)
    parser.add_argument("--image-file", dest="image_file", type=str, required=True)
    parser.add_argument("--conv-mode", dest="conv_mode", type=str, default=None)
    parser.add_argument("--temperature", type=float, default=0.2)
    parser.add_argument("--max-new-tokens", dest="max_new_tokens", type=int, default=512)
    parser.add_argument("--debug", action="store_true")
    args = parser.parse_args(args)

    from ..constants import DEFAULT_IMAGE_TOKEN
    from ..conversation import SeparatorStyle, conv_templates
    from ..generation.generate import GenerationConfig, Generator
    from ..mm_utils import (
        KeywordsStoppingCriteria,
        get_model_name_from_path,
        process_images,
        tokenizer_image_token,
    )
    from ..models.builder import load_pretrained_model

    model_name = get_model_name_from_path(args.model_path)
    tokenizer, runtime, image_processor, _ = load_pretrained_model(
        args.model_path, args.model_base, model_name
    )

    if args.conv_mode is None:
        name = model_name.lower()
        if "llama-2" in name:
            conv_mode = "llava_llama_2"
        elif "mpt" in name:
            conv_mode = "mpt"
        elif "v1" in name or "dynamic" in name:
            conv_mode = "llava_v1"
        else:
            conv_mode = "llava_v0"
    else:
        conv_mode = args.conv_mode

    conv = conv_templates[conv_mode].copy()
    image = load_image(args.image_file)
    pixels = process_images([image], image_processor, runtime.cfg)

    from ..generation.generate import ChatSession

    gen = Generator(
        runtime.params,
        runtime.cfg,
        GenerationConfig(
            max_new_tokens=args.max_new_tokens,
            temperature=args.temperature,
            eos_token_id=tokenizer.eos_token_id,
        ),
    )
    # multi-round chat keeps ONE live KV cache: round 1 prefills, later
    # rounds feed only the new chunk through the continuation path (E5)
    session = ChatSession(gen, max_new_tokens_total=runtime.cfg.model_max_length)

    prev_prompt = ""
    first_turn = True
    while True:
        try:
            inp = input(f"{conv.roles[0]}: ")
        except EOFError:
            inp = ""
        if not inp:
            print("exit...")
            break

        print(f"{conv.roles[1]}: ", end="", flush=True)
        if first_turn:
            inp = DEFAULT_IMAGE_TOKEN + "\n" + inp
        conv.append_message(conv.roles[0], inp)
        conv.append_message(conv.roles[1], None)
        prompt = conv.get_prompt()
        stop_str = (
            conv.sep if conv.sep_style != SeparatorStyle.TWO else conv.sep2
        )
        if first_turn:
            input_ids = np.asarray(
                tokenizer_image_token(prompt, tokenizer), np.int64
            )
            stopping = KeywordsStoppingCriteria([stop_str], tokenizer, 0)
            out_ids = session.ask(input_ids, pixels, stopping_criteria=stopping)
            first_turn = False
        else:
            # feed only the delta since the last rendered prompt (strip the
            # shared prefix; tokenize without BOS)
            delta = prompt[len(prev_prompt):]
            chunk = np.asarray(tokenizer(delta).input_ids, np.int64)
            if len(chunk) and chunk[0] == tokenizer.bos_token_id:
                chunk = chunk[1:]
            stopping = KeywordsStoppingCriteria([stop_str], tokenizer, 0)
            out_ids = session.ask(chunk, stopping_criteria=stopping)
        outputs = tokenizer.decode(out_ids, skip_special_tokens=True).strip()
        if outputs.endswith(stop_str):
            outputs = outputs[: -len(stop_str)].strip()
        print(outputs)
        conv.messages[-1][-1] = outputs
        prev_prompt = conv.get_prompt()
        if args.debug:
            print("\n", {"prompt": prompt, "outputs": outputs}, "\n")


if __name__ == "__main__":
    main()
