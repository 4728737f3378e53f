"""Blockwise-fused cross-entropy must be numerically equivalent to the
dense [B, S, V] logits path — loss AND gradients (VERDICT r2 item 6)."""

import numpy as np

import jax
import jax.numpy as jnp

from dynamic_llava_tpu.config import LlavaConfig, SparseConfig
from dynamic_llava_tpu.models import dynamic, llama
from dynamic_llava_tpu.multimodal.fusion import plan_batch
from dynamic_llava_tpu.train.losses import (
    lm_cross_entropy,
    lm_cross_entropy_blockwise,
)
from dynamic_llava_tpu.train.step import batch_from_plan, loss_fn


def _cfg():
    sparse = SparseConfig(
        d_model=32, nhead=2, dim_feedforward=64, num_layers=1,
        use_vision_predictor=True, use_output_text_predictor=True,
        use_instruct_predictor=False,
    )
    return LlavaConfig.tiny(sparse=sparse)


def _batch(cfg, b=2, s=33):
    rng = np.random.default_rng(0)
    ids, labels = [], []
    for _ in range(b):
        row = rng.integers(3, cfg.text.vocab_size, size=(s,)).astype(np.int64)
        row[2] = -200
        lab = row.copy()
        lab[: s // 2] = -100
        ids.append(row)
        labels.append(lab)
    plan = plan_batch(ids, cfg.num_image_tokens, labels_list=labels)
    imgs = rng.normal(
        size=(b, cfg.vision.image_size, cfg.vision.image_size, 3)
    ).astype(np.float32)
    return batch_from_plan(plan, imgs)


def test_blockwise_ce_matches_dense():
    cfg = _cfg()
    params = dynamic.init_llava_params(jax.random.key(0), cfg)
    rng = np.random.default_rng(1)
    b, s, d = 2, 19, cfg.text.hidden_size
    hidden = jnp.asarray(rng.normal(size=(b, s, d)), jnp.float32)
    labels = rng.integers(0, cfg.text.vocab_size, size=(b, s))
    labels[0, :5] = -100
    labels = jnp.asarray(labels, jnp.int32)

    dense = lm_cross_entropy(
        llama.lm_head(params["llm"], cfg.text, hidden), labels
    )
    # block_s=8 does not divide 18: exercises the padding path
    fused = lm_cross_entropy_blockwise(
        params["llm"], cfg.text, hidden, labels, block_s=8
    )
    np.testing.assert_allclose(float(fused), float(dense), rtol=1e-6)


def test_fused_loss_fn_matches_dense_loss_and_grads():
    cfg = _cfg()
    params = dynamic.init_llava_params(jax.random.key(1), cfg)
    batch = _batch(cfg)
    rng = jax.random.key(2)
    tau = jnp.float32(1.0)

    (l_dense, m_dense), g_dense = jax.value_and_grad(loss_fn, has_aux=True)(
        params, cfg, batch, rng, tau, True, "nothing", False
    )
    (l_fused, m_fused), g_fused = jax.value_and_grad(loss_fn, has_aux=True)(
        params, cfg, batch, rng, tau, True, "nothing", True
    )
    np.testing.assert_allclose(float(l_fused), float(l_dense), rtol=1e-5)
    np.testing.assert_allclose(
        float(m_fused["lm_loss"]), float(m_dense["lm_loss"]), rtol=1e-5
    )
    flat_d, _ = jax.flatten_util.ravel_pytree(g_dense)
    flat_f, _ = jax.flatten_util.ravel_pytree(g_fused)
    np.testing.assert_allclose(
        np.asarray(flat_f), np.asarray(flat_d), atol=1e-5, rtol=1e-4
    )
