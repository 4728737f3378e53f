"""Training-stage recipes: projector-only pretrain (tune_mm_mlp_adapter),
mm_projector_lr grouping, qlora (int-quantized frozen base + LoRA), and the
frozen-subset gradient path."""

import pytest as _pytest

pytestmark = _pytest.mark.slow


import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from dynamic_llava_tpu.config import (
    ClipVisionConfig,
    LlamaConfig,
    LlavaConfig,
    SparseConfig,
)
from dynamic_llava_tpu.models import dynamic
from dynamic_llava_tpu.train.optimizer import label_params, make_optimizer
from dynamic_llava_tpu.train.step import batch_from_plan, make_train_step


def _cfg(sparse=True):
    return LlavaConfig(
        text=LlamaConfig(
            vocab_size=256, hidden_size=64, intermediate_size=128,
            num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=4,
        ),
        vision=ClipVisionConfig(
            hidden_size=32, intermediate_size=64, num_hidden_layers=2,
            num_attention_heads=2, image_size=56, patch_size=14,
        ),
        sparse=SparseConfig(
            use_vision_predictor=sparse, use_output_text_predictor=sparse,
            use_instruct_predictor=False, output_text_len_for_training=2,
            d_model=32, nhead=2, dim_feedforward=64, num_layers=1,
        ),
    )


def _batch(cfg, batch_size=2):
    from dynamic_llava_tpu.multimodal.fusion import plan_batch

    rng = np.random.default_rng(0)
    ids, labels = [], []
    for _ in range(batch_size):
        row = rng.integers(3, cfg.text.vocab_size, size=(20,)).astype(np.int64)
        row[1] = -200
        lab = row.copy()
        lab[:14] = -100
        ids.append(row)
        labels.append(lab)
    plan = plan_batch(ids, cfg.num_image_tokens, labels_list=labels)
    imgs = rng.normal(
        size=(batch_size, cfg.vision.image_size, cfg.vision.image_size, 3)
    ).astype(np.float32)
    return batch_from_plan(plan, imgs)


def _changed(a, b):
    return not np.allclose(np.asarray(a, np.float32), np.asarray(b, np.float32))


def test_tune_mm_mlp_adapter_labels():
    cfg = _cfg()
    params = dynamic.init_llava_params(jax.random.key(0), cfg)
    labels = label_params(params, tune_mm_mlp_adapter=True)
    proj = set(jax.tree.leaves(labels["mm_projector"]))
    assert proj <= {"projector", "projector_nd"}
    rest = {
        leaf for key in labels if key != "mm_projector"
        for leaf in jax.tree.leaves(labels[key])
    }
    assert rest == {"frozen"}


def test_projector_only_step_touches_only_projector():
    cfg = _cfg(sparse=False)
    params = dynamic.init_llava_params(jax.random.key(0), cfg)
    labels = label_params(params, tune_mm_mlp_adapter=True)
    optimizer = make_optimizer(base_lr=1e-3, predictor_lr=1e-3,
                               tune_mm_mlp_adapter=True)
    step = make_train_step(cfg, optimizer, remat=False, labels=labels)
    batch = _batch(cfg)
    # the step donates params: snapshot what we compare against
    old_proj = np.asarray(params["mm_projector"][0]["w"], np.float32)
    old_q = np.asarray(params["llm"]["layers"]["q"], np.float32)
    old_embed = np.asarray(params["llm"]["embed"], np.float32)
    new_params, _, metrics = step(params, optimizer.init(params), batch,
                                  jax.random.key(1), jnp.float32(1.0))
    assert np.isfinite(float(metrics["loss"]))
    assert _changed(old_proj, new_params["mm_projector"][0]["w"])
    np.testing.assert_array_equal(
        old_q, np.asarray(new_params["llm"]["layers"]["q"], np.float32))
    np.testing.assert_array_equal(
        old_embed, np.asarray(new_params["llm"]["embed"], np.float32))


def test_frozen_subset_grads_match_full_grads():
    """The trainable-subset grad path must produce the same update as
    differentiating everything (frozen groups are set_to_zero anyway)."""
    cfg = _cfg()
    params = dynamic.init_llava_params(jax.random.key(0), cfg)
    optimizer = make_optimizer(base_lr=1e-3, predictor_lr=1e-3)
    batch = _batch(cfg)

    step_full = make_train_step(cfg, optimizer, remat=False)
    step_subset = make_train_step(cfg, optimizer, remat=False,
                                  labels=label_params(params))
    # steps donate their params: give each its own copy
    params2 = jax.tree.map(jnp.copy, params)
    p1, _, m1 = step_full(params, optimizer.init(params), batch,
                          jax.random.key(1), jnp.float32(1.0))
    p2, _, m2 = step_subset(params2, optimizer.init(params2), batch,
                            jax.random.key(1), jnp.float32(1.0))
    assert float(m1["loss"]) == pytest.approx(float(m2["loss"]), rel=1e-5)
    np.testing.assert_allclose(
        np.asarray(p1["llm"]["layers"]["q"], np.float32),
        np.asarray(p2["llm"]["layers"]["q"], np.float32), rtol=1e-5)


def test_mm_projector_lr_group():
    cfg = _cfg()
    params = dynamic.init_llava_params(jax.random.key(0), cfg)
    labels = label_params(params, projector_lr_group=True)
    assert set(jax.tree.leaves(labels["mm_projector"])) <= {
        "projector", "projector_nd"}
    # base LLM still trains
    assert "base" in set(jax.tree.leaves(labels["llm"]))

    # the projector group really uses its own lr
    opt = make_optimizer(base_lr=0.0, predictor_lr=0.0, projector_lr=1.0)
    state = opt.init(params)
    grads = jax.tree.map(
        lambda p: jnp.ones_like(p, jnp.float32), params)
    updates, _ = opt.update(grads, state, params)
    assert _changed(jnp.zeros(()), updates["mm_projector"][0]["w"])
    assert np.allclose(np.asarray(updates["llm"]["layers"]["q"]), 0.0)


def test_qlora_train_step():
    """int8-quantized frozen base + LoRA adapters: the step must compile
    (int leaves never hit jax.grad) and update only adapters/projector/
    predictors."""
    from dynamic_llava_tpu.ops.quant import is_quantized, quantize_llm_params
    from dynamic_llava_tpu.train.lora import attach_lora, init_lora_params

    cfg = _cfg()
    params = dynamic.init_llava_params(jax.random.key(0), cfg)
    params = quantize_llm_params(params, bits=8)
    adapters = init_lora_params(jax.random.key(1), cfg.text, rank=4,
                                alpha=8.0)
    params = attach_lora(params, adapters)
    assert is_quantized(params["llm"]["layers"]["q"])

    labels = label_params(params, lora_mode=True)
    optimizer = make_optimizer(base_lr=1e-3, predictor_lr=1e-3,
                               lora_mode=True)
    step = make_train_step(cfg, optimizer, remat=False, labels=labels)
    batch = _batch(cfg)
    old_q = np.asarray(params["llm"]["layers"]["q"]["q"])
    old_b = np.asarray(params["llm"]["layers"]["q_lora"]["b"], np.float32)
    new_params, _, metrics = step(params, optimizer.init(params), batch,
                                  jax.random.key(2), jnp.float32(1.0))
    assert np.isfinite(float(metrics["loss"]))
    # quantized base untouched, adapters moved
    np.testing.assert_array_equal(
        old_q, np.asarray(new_params["llm"]["layers"]["q"]["q"]))
    assert _changed(old_b, new_params["llm"]["layers"]["q_lora"]["b"])
