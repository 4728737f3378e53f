"""Visualize which image patches the vision predictor kept.

Rebuild of /root/reference/llava/dynamic_eval/visualize.py:63-188: runs a
prefill, reads the keep mask from ``PrefillInfo`` (no forward hooks needed —
the functional API returns it), reshapes to the 24x24 patch grid, and saves
the masked image with dropped patches blacked out.
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def keep_mask_to_grid(info, plan, num_patches_per_side: int) -> np.ndarray:
    """[B, S] keep mask over fused slots -> [B, P, P] patch grid."""
    mask = np.asarray(info.image_keep_mask)
    grids = []
    for i in range(plan.batch):
        start = int(plan.spans.image_start[i])
        n = num_patches_per_side * num_patches_per_side
        grids.append(mask[i, start : start + n].reshape(
            num_patches_per_side, num_patches_per_side
        ))
    return np.stack(grids)


def apply_patch_mask(image: np.ndarray, grid: np.ndarray, patch_px: int) -> np.ndarray:
    """Black out dropped patches on an [H, W, 3] uint8 image."""
    out = image.copy()
    p = patch_px
    for r in range(grid.shape[0]):
        for c in range(grid.shape[1]):
            if not grid[r, c]:
                out[r * p : (r + 1) * p, c * p : (c + 1) * p] = 0
    return out


def visualize(args):
    from PIL import Image

    from ..constants import DEFAULT_IMAGE_TOKEN
    from ..conversation import conv_templates
    from ..generation.generate import GenerationConfig, Generator
    from ..mm_utils import expand2square, process_images, tokenizer_image_token
    from ..models.builder import load_pretrained_model
    from ..multimodal.fusion import plan_batch

    tokenizer, runtime, image_processor, _ = load_pretrained_model(args.model_path)
    conv = conv_templates[args.conv_mode].copy()
    conv.append_message(conv.roles[0], DEFAULT_IMAGE_TOKEN + "\n" + args.query)
    conv.append_message(conv.roles[1], None)
    ids = np.asarray(tokenizer_image_token(conv.get_prompt(), tokenizer), np.int64)

    image = Image.open(args.image_file).convert("RGB")
    pixels = process_images([image], image_processor, runtime.cfg)
    gen = Generator(runtime.params, runtime.cfg, GenerationConfig())
    plan = plan_batch([ids], runtime.cfg.num_image_tokens)
    state, info = gen.prefill_from_plan(plan, pixels, 8)
    if info.image_keep_mask is None:
        raise SystemExit("vision predictor is disabled in this checkpoint")

    pps = runtime.cfg.vision.num_patches_per_side
    grid = keep_mask_to_grid(info, plan, pps)[0]
    kept = int(grid.sum())
    print(f"kept {kept}/{grid.size} image tokens ({kept / grid.size:.1%})")

    vis_img = expand2square(image, image_processor.background_color).resize(
        (runtime.cfg.vision.image_size,) * 2
    )
    masked = apply_patch_mask(
        np.asarray(vis_img), grid, runtime.cfg.vision.patch_size
    )
    os.makedirs(os.path.dirname(os.path.abspath(args.output)) or ".", exist_ok=True)
    Image.fromarray(masked).save(args.output)
    print(f"saved {args.output}")


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--model-path", dest="model_path", required=True)
    parser.add_argument("--image-file", dest="image_file", required=True)
    parser.add_argument("--query", type=str, default="Describe the image.")
    parser.add_argument("--output", type=str, default="visualize_out.png")
    parser.add_argument("--conv-mode", dest="conv_mode", default="vicuna_v1")
    visualize(parser.parse_args(argv))


if __name__ == "__main__":
    main()
