"""Training data pipeline: preprocess dialects, dataset, collator, trainer."""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent))
from helpers import WordTokenizer, tiny_mix_dataset

import jax
import jax.numpy as jnp

from dynamic_llava_tpu import conversation as conversation_lib
from dynamic_llava_tpu.constants import IGNORE_INDEX, IMAGE_TOKEN_INDEX
from dynamic_llava_tpu.mm_utils import ClipImagePreprocessor
from dynamic_llava_tpu.train.data import (
    Collator,
    DataArguments,
    LazySupervisedDataset,
    data_loader,
    preprocess,
    preprocess_multimodal,
    preprocess_v1,
)


@pytest.fixture(autouse=True)
def _v1_template():
    old = conversation_lib.default_conversation
    conversation_lib.default_conversation = conversation_lib.conv_templates["v1"]
    yield
    conversation_lib.default_conversation = old


def _sources():
    return [[
        {"from": "human", "value": "<image>\nWhat is in the image ?"},
        {"from": "gpt", "value": "The picture shows a red cat ."},
        {"from": "human", "value": "What color ?"},
        {"from": "gpt", "value": "It is red ."},
    ]]


def test_preprocess_v1_masks_instructions_supervises_answers():
    tok = WordTokenizer()
    out = preprocess_v1(_sources(), tok, has_image=True)
    ids, labels = out["input_ids"][0], out["labels"][0]
    assert (ids == IMAGE_TOKEN_INDEX).sum() == 1
    # no tokenization-mismatch wipeout
    assert (labels != IGNORE_INDEX).any()
    sup = labels[labels != IGNORE_INDEX]
    text = tok.decode(sup)
    assert "cat" in text and "red" in text
    # answers are supervised; system prompt + question tokens are not
    assert "curious" not in text
    assert "color" not in text.replace("red", "")
    # both rounds' answers present
    assert "</s>" in text


def test_preprocess_multimodal_moves_image_tag():
    src = [[{"from": "human", "value": "tell me <image> please"},
            {"from": "gpt", "value": "ok"}]]
    out = preprocess_multimodal(src)
    assert out[0][0]["value"].startswith("<image>\n")


def test_dataset_and_collator(tmp_path):
    data_path, folder = tiny_mix_dataset(tmp_path)
    tok = WordTokenizer()
    args = DataArguments(data_path=data_path, image_folder=folder,
                         image_aspect_ratio="pad")
    proc = ClipImagePreprocessor(size=56, crop_size=56)
    ds = LazySupervisedDataset(data_path, tok, args, proc)
    assert len(ds) == 4
    # modality lengths: text-only sample is negative
    ml = ds.modality_lengths
    assert ml[2] < 0 and ml[0] > 0

    item = ds[0]
    assert item["image"].shape == (56, 56, 3)
    assert (item["input_ids"] == IMAGE_TOKEN_INDEX).sum() == 1

    n_img = 16  # pretend budget for the tiny tower
    coll = Collator(num_image_tokens=n_img, model_max_length=256, pad_bucket=32)
    plan, images = coll([ds[0], ds[2]])
    assert plan.batch == 2
    assert plan.seq_len % 32 == 0
    assert images.shape[0] == 2
    assert plan.spans.has_image.tolist() == [True, False]
    # answer span of sample 0 supervised
    i0 = plan.spans
    assert i0.answer_end[0] > i0.answer_start[0]

    # requires_image filtering drops the text-only record
    args2 = DataArguments(data_path=data_path, image_folder=folder,
                          requires_image=True)
    ds2 = LazySupervisedDataset(data_path, tok, args2, proc)
    assert len(ds2) == 3


def test_data_loader_and_trainer_e2e(tmp_path):
    """Two optimizer steps over the real pipeline on a tiny model."""
    from dynamic_llava_tpu.config import (
        ClipVisionConfig, LlamaConfig, LlavaConfig, SparseConfig,
    )
    from dynamic_llava_tpu.models import dynamic
    from dynamic_llava_tpu.train.trainer import Trainer, TrainerConfig

    data_path, folder = tiny_mix_dataset(tmp_path)
    tok = WordTokenizer()
    args = DataArguments(data_path=data_path, image_folder=folder)
    proc = ClipImagePreprocessor(size=56, crop_size=56)
    ds = LazySupervisedDataset(data_path, tok, args, proc)

    cfg = LlavaConfig(
        text=LlamaConfig(vocab_size=128, hidden_size=64, intermediate_size=96,
                         num_hidden_layers=3, num_attention_heads=4,
                         num_key_value_heads=4),
        vision=ClipVisionConfig(hidden_size=24, intermediate_size=48,
                                num_hidden_layers=2, num_attention_heads=2,
                                image_size=56, patch_size=14),
        sparse=SparseConfig(use_vision_predictor=True,
                            use_output_text_predictor=True,
                            output_text_len_for_training=2,
                            d_model=24, nhead=2, dim_feedforward=48,
                            num_layers=1),
    )
    params = dynamic.init_llava_params(jax.random.key(0), cfg)
    tc = TrainerConfig(
        output_dir=str(tmp_path / "out"), num_train_steps=2, logging_steps=1,
        save_steps=0, learning_rate=1e-4, predictor_lr=1e-3,
        gradient_checkpointing=False,
    )
    trainer = Trainer(cfg, params, tc, use_mesh=False)
    coll = Collator(num_image_tokens=cfg.num_image_tokens, model_max_length=128,
                    pad_bucket=32)
    metrics = trainer.train(data_loader(ds, coll, batch_size=2, seed=0))
    assert np.isfinite(metrics["loss"])
    assert "image_mask_loss" in metrics and "output_text_mask_loss" in metrics
    assert (tmp_path / "out" / "metrics.jsonl").exists()

    # orbax checkpoint save + resume restores the step counter
    trainer.save()
    trainer2 = Trainer(cfg, params, tc, use_mesh=False)
    assert trainer2.maybe_resume()
    assert trainer2.step == 2


class MptWordTokenizer:
    """MPT-faithful word tokenizer: NO bos (GPT-NeoX style) and the chat
    specials are atomic added tokens — the tokenization regime the mpt
    dialect's count arithmetic assumes. (WordTokenizer models a LLaMA
    tokenizer: bos on every call, whitespace-only splitting — wrong for
    the glued <|im_end|><|im_start|> boundaries of the MPT template.)"""

    bos_token_id = None
    pad_token_id = None
    legacy = False
    model_max_length = 4096

    def __init__(self):
        self.vocab = {"<unk>": 0}

    def _enc(self, text):
        for sp in ("<|im_end|>", "<|im_start|>", "<image>"):
            text = text.replace(sp, f" {sp} ")
        out = []
        for w in text.split():
            self.vocab.setdefault(w, len(self.vocab))
            out.append(self.vocab[w])
        return out

    def __call__(self, text, **kw):
        class R:
            pass

        r = R()
        if isinstance(text, list):
            r.input_ids = [self._enc(t) for t in text]
        else:
            r.input_ids = self._enc(text)
        return r

    def decode(self, ids):
        rev = {v: k for k, v in self.vocab.items()}
        return " ".join(rev.get(int(i), "?") for i in ids)

    def convert_tokens_to_ids(self, tok):
        self.vocab.setdefault(tok, len(self.vocab))
        return self.vocab[tok]


def test_preprocess_mpt_masks_instructions_supervises_answers():
    """MPT dialect (im_start/im_end template): EXACTLY the assistant
    answers + their closing <|im_end|> supervised; system prompt and user
    turns masked (reference train_sparse.py:587-682 — whose round_len
    omits each round's trailing sep and relies on the wipeout warning;
    this repo counts the sep explicitly so spans are exact)."""
    from dynamic_llava_tpu.train.data import preprocess_mpt

    tok = MptWordTokenizer()
    out = preprocess_mpt(_sources(), tok, has_image=True)
    ids, labels = out["input_ids"][0], out["labels"][0]
    assert (ids == IMAGE_TOKEN_INDEX).sum() == 1
    sup = tok.decode(labels[labels != IGNORE_INDEX])
    assert sup == (
        "The picture shows a red cat . <|im_end|> It is red . <|im_end|>"
    )
    mask = labels != IGNORE_INDEX
    np.testing.assert_array_equal(labels[mask], ids[mask])


def test_preprocess_llama_2_masks_instructions_supervises_answers():
    from dynamic_llava_tpu.train.data import preprocess_llama_2

    tok = WordTokenizer()
    out = preprocess_llama_2(_sources(), tok, has_image=True)
    ids, labels = out["input_ids"][0], out["labels"][0]
    assert (ids == IMAGE_TOKEN_INDEX).sum() == 1
    assert (labels != IGNORE_INDEX).any()
    sup = tok.decode(labels[labels != IGNORE_INDEX])
    assert "cat" in sup and "red" in sup
    assert "What" not in sup
    mask = labels != IGNORE_INDEX
    np.testing.assert_array_equal(labels[mask], ids[mask])


def test_preprocess_plain_supervises_caption_only():
    from dynamic_llava_tpu.train.data import preprocess_plain

    old = conversation_lib.default_conversation
    conversation_lib.default_conversation = conversation_lib.conv_templates[
        "plain"
    ]
    try:
        tok = WordTokenizer()
        src = [[
            {"from": "human", "value": "<image>"},
            {"from": "gpt", "value": "a red cat on a mat"},
        ]]
        out = preprocess_plain(src, tok)
        ids, labels = out["input_ids"][0], out["labels"][0]
        assert (ids == IMAGE_TOKEN_INDEX).sum() == 1
        # the image span is masked; the caption is fully supervised
        assert labels[0] == IGNORE_INDEX
        sup = tok.decode(labels[labels != IGNORE_INDEX])
        assert "cat" in sup and "mat" in sup
    finally:
        conversation_lib.default_conversation = old
