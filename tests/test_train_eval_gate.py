"""End-to-end train -> eval score regression gate (VERDICT r2 missing #2):
a tiny model trained through the real train step must reach full accuracy
on its corpus when generated through the real decode path and scored by
the real POPE scorer — the machinery chain a weights drop would ride."""

import importlib.util
from pathlib import Path

import pytest as _pytest

pytestmark = _pytest.mark.slow

_spec = importlib.util.spec_from_file_location(
    "quant_quality", Path(__file__).parent.parent / "run" / "quant_quality.py"
)
qq = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(qq)


def test_train_then_eval_scores_full_accuracy():
    from dynamic_llava_tpu.config import (
        ClipVisionConfig,
        LlamaConfig,
        LlavaConfig,
        SparseConfig,
    )
    from dynamic_llava_tpu.eval.eval_pope import score_pope

    cfg = LlavaConfig(
        text=LlamaConfig(
            vocab_size=len(qq.VOCAB), hidden_size=64, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        ),
        vision=ClipVisionConfig(
            hidden_size=32, intermediate_size=64, num_hidden_layers=2,
            num_attention_heads=2, image_size=70, patch_size=14,
        ),
        sparse=SparseConfig(
            d_model=32, nhead=2, dim_feedforward=64, num_layers=1,
            use_vision_predictor=False, use_text_predictor=False,
            use_output_text_predictor=False, use_instruct_predictor=False,
        ),
    )
    prompts, answers, labels = qq.build_corpus(16)
    params, loss = qq.train_tiny(cfg, prompts, answers, steps=40)
    assert loss < 0.1, f"training failed to converge: lm_loss {loss}"
    texts = qq.generate_answers(params, cfg, prompts, "bfloat16")
    pope = score_pope([t or "none" for t in texts], labels)
    assert pope["accuracy"] == 1.0 and pope["f1"] == 1.0, pope
    # the quantized paths stay on-task at int8 (the int4/fp8 deltas are
    # documented in docs/BENCHMARKS.md via run/quant_quality.py)
    q8 = qq.quantize_mode(params, "int8")
    texts8 = qq.generate_answers(q8, cfg, prompts, "bfloat16")
    pope8 = score_pope([t or "none" for t in texts8], labels)
    assert pope8["accuracy"] == 1.0, pope8
