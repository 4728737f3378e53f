"""Shared test fixtures: a word-level tokenizer whose arithmetic mirrors the
sentencepiece properties preprocess_v1 relies on (BOS prepended; '</s>' is a
single token, so per-round BOS counts cancel the separators)."""

from typing import List

import numpy as np


class WordTokenizer:
    bos_token_id = 1
    eos_token_id = 2
    unk_token_id = 0
    pad_token_id = None
    legacy = True
    model_max_length = 4096

    def __init__(self):
        self.vocab = {"<unk>": 0, "<s>": 1, "</s>": 2}

    def _id(self, w: str) -> int:
        if w not in self.vocab:
            self.vocab[w] = len(self.vocab)
        return self.vocab[w]

    def _encode(self, text: str) -> List[int]:
        # '</s>' must stay one token
        out = []
        for piece in text.replace("</s>", " </s> ").split():
            out.append(self._id(piece))
        return out

    def __call__(self, text, **kw):
        class R:
            pass

        r = R()
        if isinstance(text, list):
            r.input_ids = [[self.bos_token_id] + self._encode(t) for t in text]
        else:
            r.input_ids = [self.bos_token_id] + self._encode(text)
        return r

    def decode(self, ids) -> str:
        rev = {v: k for k, v in self.vocab.items()}
        return " ".join(rev.get(int(i), "<unk>") for i in ids)

    def convert_tokens_to_ids(self, tok: str) -> int:
        return self._id(tok)


def tiny_mix_dataset(tmp_path, with_image_file: bool = True):
    """Write a 4-sample mix665k-format JSON + a dummy image; returns paths."""
    import json

    from PIL import Image

    img_name = "img0.jpg"
    if with_image_file:
        arr = (np.random.default_rng(0).integers(0, 255, (40, 64, 3))).astype("uint8")
        Image.fromarray(arr).save(str(tmp_path / img_name))
    records = [
        {
            "id": "s1",
            "image": img_name,
            "conversations": [
                {"from": "human", "value": "<image>\nWhat is in the image ?"},
                {"from": "gpt", "value": "The picture shows a red cat ."},
                {"from": "human", "value": "What color ?"},
                {"from": "gpt", "value": "It is red ."},
            ],
        },
        {
            "id": "s2",
            "image": img_name,
            "conversations": [
                {"from": "human", "value": "Describe <image> briefly ."},
                {"from": "gpt", "value": "A small dog ."},
            ],
        },
        {
            "id": "s3",
            "conversations": [
                {"from": "human", "value": "Say hello ."},
                {"from": "gpt", "value": "hello there friend ."},
            ],
        },
        {
            "id": "s4",
            "image": img_name,
            "conversations": [
                {"from": "human", "value": "<image>\nCount the objects ."},
                {"from": "gpt", "value": "There are three objects ."},
            ],
        },
    ]
    data_path = tmp_path / "data.json"
    with open(data_path, "w") as f:
        json.dump(records, f)
    return str(data_path), str(tmp_path)


def make_tiny_checkpoint(out_dir: str) -> str:
    """Write a reference-style HF checkpoint dir with a real fast tokenizer
    and both predictors — the fixture for CLI-level e2e tests."""
    import json
    import os

    import torch
    import torch.nn as nn

    os.makedirs(out_dir, exist_ok=True)

    from tokenizers import Tokenizer, models, pre_tokenizers, trainers
    from tokenizers.processors import TemplateProcessing

    tok = Tokenizer(models.WordLevel(unk_token="<unk>"))
    tok.pre_tokenizer = pre_tokenizers.Whitespace()
    corpus = [
        "A chat between a curious human and an artificial intelligence "
        "assistant . The assistant gives helpful , detailed , and polite "
        "answers to the human ' s questions . USER : ASSISTANT : What is in "
        "the image ? Is there a dog ? yes no The picture shows a red cat . "
        "hello world describe briefly"
    ] * 5
    trainer = trainers.WordLevelTrainer(special_tokens=["<unk>", "<s>", "</s>"])
    tok.train_from_iterator(corpus, trainer)
    tok.post_processor = TemplateProcessing(
        single="<s> $A", special_tokens=[("<s>", tok.token_to_id("<s>"))]
    )
    tok.save(os.path.join(out_dir, "tokenizer.json"))
    with open(os.path.join(out_dir, "tokenizer_config.json"), "w") as f:
        json.dump({"tokenizer_class": "PreTrainedTokenizerFast",
                   "bos_token": "<s>", "eos_token": "</s>",
                   "unk_token": "<unk>", "model_max_length": 512}, f)
    vocab_size = max(tok.get_vocab_size(), 64)

    torch.manual_seed(0)
    hidden, d_model = 64, 32
    sd = {}
    from transformers import LlamaConfig as HFL, LlamaForCausalLM

    lm = LlamaForCausalLM(HFL(
        vocab_size=vocab_size, hidden_size=hidden, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
    ))
    sd.update(lm.state_dict())
    from transformers import CLIPVisionConfig as HFC, CLIPVisionModel

    tower = CLIPVisionModel(HFC(
        hidden_size=24, intermediate_size=48, num_hidden_layers=2,
        num_attention_heads=2, image_size=56, patch_size=14,
    ))
    for k, v in tower.state_dict().items():
        sd[f"model.vision_tower.vision_tower.{k}"] = v
    proj = torch.nn.Sequential(nn.Linear(24, hidden), nn.GELU(),
                               nn.Linear(hidden, hidden))
    for k, v in proj.state_dict().items():
        sd[f"model.mm_projector.{k}"] = v
    out_mlp = nn.Sequential(
        nn.LayerNorm(hidden), nn.Linear(hidden, d_model), nn.GELU(),
        nn.Linear(d_model, d_model // 2), nn.GELU(),
        nn.Linear(d_model // 2, d_model // 4), nn.GELU(),
        nn.Linear(d_model // 4, 2),
    )
    for k, v in out_mlp.state_dict().items():
        sd[f"model.output_text_score_predictor.output_mlp.{k}"] = v
    vp_down = nn.Sequential(nn.LayerNorm(hidden), nn.Linear(hidden, d_model), nn.GELU())
    for k, v in vp_down.state_dict().items():
        sd[f"model.image_score_predictor.down_mlp.{k}"] = v

    class Blk(nn.Module):
        def __init__(self):
            super().__init__()
            self.norm1 = nn.LayerNorm(d_model)
            self.attn = nn.Module()
            self.attn.qkv = nn.Linear(d_model, d_model * 3, bias=False)
            self.attn.proj = nn.Linear(d_model, d_model)
            self.norm2 = nn.LayerNorm(d_model)
            self.mlp = nn.Module()
            self.mlp.fc1 = nn.Linear(d_model, 64)
            self.mlp.fc2 = nn.Linear(64, d_model)

    for k, v in Blk().state_dict().items():
        sd[f"model.image_score_predictor.transformer.0.{k}"] = v
    vp_out = nn.Sequential(
        nn.Linear(d_model, d_model // 2), nn.GELU(),
        nn.Linear(d_model // 2, d_model // 4), nn.GELU(),
        nn.Linear(d_model // 4, 2),
    )
    for k, v in vp_out.state_dict().items():
        sd[f"model.image_score_predictor.output_mlp.{k}"] = v
    torch.save(sd, os.path.join(out_dir, "pytorch_model.bin"))

    config = {
        "model_type": "dynamic_llava_llama",
        "vocab_size": vocab_size, "hidden_size": hidden,
        "intermediate_size": 96, "num_hidden_layers": 2,
        "num_attention_heads": 4, "num_key_value_heads": 4,
        "mm_projector_type": "mlp2x_gelu",
        "mm_vision_tower": "tiny-clip",
        "mm_vision_select_layer": -2, "image_aspect_ratio": "pad",
        "model_max_length": 512,
        "sparse_config": {
            "use_vision_predictor": True, "vision_keep_rate": 0.25,
            "use_text_predictor": True,
            "use_output_text_predictor": True, "output_text_keep_rate": 0.5,
            "use_instruct_predictor": False, "sparse_layer": 1,
            "d_model": d_model, "nhead": 2, "dim_feedforward": 64,
            "num_layers": 1, "mask_loss_weight": 100.0,
        },
    }
    with open(os.path.join(out_dir, "config.json"), "w") as f:
        json.dump(config, f)
    return out_dir
