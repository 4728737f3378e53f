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
