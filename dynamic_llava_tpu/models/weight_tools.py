"""Checkpoint weight tools.

Rebuild of the reference's weight manipulation scripts
(/root/reference/llava/model/apply_delta.py:14, make_delta.py:14,
consolidate.py:14, scripts/extract_mm_projector.py, merge_lora_weights.py)
operating directly on numpy state dicts — no torch module tree needed.

All tools read/write HF-format directories (config.json + weights) so
outputs stay interoperable with the reference ecosystem.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
from typing import Dict

import numpy as np

from .convert import load_state_dict_from_dir


def _save_state_dict(sd: Dict[str, np.ndarray], out_dir: str, src_dir: str = None):
    """Write a single-shard checkpoint + copy config/tokenizer files."""
    os.makedirs(out_dir, exist_ok=True)
    try:
        from safetensors.numpy import save_file

        save_file(
            {k: np.ascontiguousarray(v) for k, v in sd.items()},
            os.path.join(out_dir, "model.safetensors"),
        )
    except ImportError:
        import torch

        torch.save(
            {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()},
            os.path.join(out_dir, "pytorch_model.bin"),
        )
    if src_dir:
        for f in os.listdir(src_dir):
            if f.endswith((".json", ".model", ".txt")) and not f.startswith("."):
                shutil.copy(os.path.join(src_dir, f), os.path.join(out_dir, f))


def apply_delta(base_path: str, target_path: str, delta_path: str):
    """target = base + delta (reference apply_delta.py)."""
    base = load_state_dict_from_dir(base_path)
    delta = load_state_dict_from_dir(delta_path)
    out = {}
    for name, dw in delta.items():
        if name not in base:
            out[name] = dw
        elif dw.shape == base[name].shape:
            out[name] = dw + base[name]
        else:
            # embed/lm_head grown by added tokens: add into the prefix rows
            bw = base[name]
            merged = dw.copy()
            merged[: bw.shape[0], : bw.shape[1]] += bw
            out[name] = merged
    _save_state_dict(out, target_path, src_dir=delta_path)


def make_delta(base_path: str, target_path: str, delta_path: str):
    """delta = target - base (reference make_delta.py)."""
    base = load_state_dict_from_dir(base_path)
    target = load_state_dict_from_dir(target_path)
    out = {}
    for name, tw in target.items():
        if name not in base:
            out[name] = tw
        elif tw.shape == base[name].shape:
            out[name] = tw - base[name]
        else:
            bw = base[name]
            d = tw.copy()
            d[: bw.shape[0], : bw.shape[1]] -= bw
            out[name] = d
    _save_state_dict(out, delta_path, src_dir=target_path)


def extract_mm_projector(model_path: str, output_path: str):
    """Pull the mm_projector weights out of a full checkpoint
    (reference scripts/extract_mm_projector.py)."""
    sd = load_state_dict_from_dir(model_path)
    proj = {k: v for k, v in sd.items() if "mm_projector" in k}
    os.makedirs(os.path.dirname(os.path.abspath(output_path)) or ".", exist_ok=True)
    import torch

    torch.save(
        {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in proj.items()},
        output_path,
    )
    print(f"extracted {len(proj)} tensors -> {output_path}")


def merge_lora(base_sd: Dict[str, np.ndarray], lora_sd: Dict[str, np.ndarray],
               scaling: float = 1.0) -> Dict[str, np.ndarray]:
    """Merge LoRA A/B pairs into base weights: W += scaling * B @ A
    (reference merge_lora_weights.py via peft merge_and_unload)."""
    out = dict(base_sd)
    for name, a in lora_sd.items():
        if "lora_A" not in name:
            continue
        b_name = name.replace("lora_A", "lora_B")
        if b_name not in lora_sd:
            continue
        target = (
            name.replace("base_model.model.", "")
            .replace(".lora_A.weight", ".weight")
            .replace(".lora_A.default.weight", ".weight")
        )
        if target not in out:
            continue
        b = lora_sd[b_name]
        out[target] = out[target] + scaling * (b @ a)
    # non-lora trainables override directly
    for name, w in lora_sd.items():
        if "lora_" in name:
            continue
        target = name.replace("base_model.model.", "")
        out[target] = w
    return out


def merge_lora_dirs(model_path: str, model_base: str, save_path: str):
    base = load_state_dict_from_dir(model_base)
    lora = load_state_dict_from_dir(model_path)
    with open(os.path.join(model_path, "config.json")) as f:
        cfg = json.load(f)
    lora_cfg_path = os.path.join(model_path, "adapter_config.json")
    scaling = 1.0
    if os.path.exists(lora_cfg_path):
        with open(lora_cfg_path) as f:
            lc = json.load(f)
        scaling = lc.get("lora_alpha", 16) / lc.get("r", 16)
    merged = merge_lora(base, lora, scaling)
    _save_state_dict(merged, save_path, src_dir=model_path)


def consolidate(src_path: str, dst_path: str):
    """Re-save a (possibly sharded) checkpoint as one consolidated shard
    (reference consolidate.py)."""
    sd = load_state_dict_from_dir(src_path)
    _save_state_dict(sd, dst_path, src_dir=src_path)


def main(argv=None):
    parser = argparse.ArgumentParser()
    sub = parser.add_subparsers(dest="cmd", required=True)
    p = sub.add_parser("apply-delta")
    p.add_argument("--base"); p.add_argument("--target"); p.add_argument("--delta")
    p = sub.add_parser("make-delta")
    p.add_argument("--base"); p.add_argument("--target"); p.add_argument("--delta")
    p = sub.add_parser("extract-mm-projector")
    p.add_argument("--model-path"); p.add_argument("--output")
    p = sub.add_parser("merge-lora")
    p.add_argument("--model-path"); p.add_argument("--model-base")
    p.add_argument("--save-model-path")
    p = sub.add_parser("consolidate")
    p.add_argument("--src"); p.add_argument("--dst")
    args = parser.parse_args(argv)
    if args.cmd == "apply-delta":
        apply_delta(args.base, args.target, args.delta)
    elif args.cmd == "make-delta":
        make_delta(args.base, args.target, args.delta)
    elif args.cmd == "extract-mm-projector":
        extract_mm_projector(args.model_path, args.output)
    elif args.cmd == "merge-lora":
        merge_lora_dirs(args.model_path, args.model_base, args.save_model_path)
    elif args.cmd == "consolidate":
        consolidate(args.src, args.dst)


if __name__ == "__main__":
    main()
