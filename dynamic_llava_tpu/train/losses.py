"""Training losses: LM cross-entropy + keep-ratio MSE terms.

Matches the reference loss assembly
(/root/reference/llava/model/language_model/dynamic_modeling_llama.py:2712-2800):

* CE over shifted logits, mean over non-ignored tokens (fp32).
* For each active predictor, per-sample keep ratio over its span, squared
  error against the target keep rate, mean over batch, scaled by
  ``mask_loss_weight``. Samples whose span is shorter than the training
  threshold contribute 0 (the reference sets target = current ratio via
  ``.item()``, detaching it) but still count in the batch mean.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from ..config import SparseConfig
from ..constants import IGNORE_INDEX
from ..models.dynamic import TrainForwardOut


def lm_cross_entropy(
    logits: jax.Array,  # [B, S, V] fp32
    labels: jax.Array,  # [B, S] int32 with IGNORE_INDEX
) -> jax.Array:
    shift_logits = logits[:, :-1]
    shift_labels = labels[:, 1:]
    valid = shift_labels != IGNORE_INDEX
    safe_labels = jnp.where(valid, shift_labels, 0)
    logp = jax.nn.log_softmax(shift_logits.astype(jnp.float32), axis=-1)
    tok_logp = jnp.take_along_axis(logp, safe_labels[..., None], axis=-1)[..., 0]
    n = jnp.maximum(jnp.sum(valid), 1)
    return -jnp.sum(jnp.where(valid, tok_logp, 0.0)) / n


def _span_ratio_loss(
    mask: jax.Array,  # [B, S] keep mask (1.0 outside the span)
    span: jax.Array,  # [B, S] bool — span positions where the predictor acted
    target_rate: float,
) -> jax.Array:
    """mean_B (target - per-sample span keep ratio)^2, zero for empty spans."""
    count = jnp.sum(span, axis=1)
    ratio = jnp.sum(mask * span, axis=1) / jnp.maximum(count, 1)
    sqerr = jnp.where(count > 0, (target_rate - ratio) ** 2, 0.0)
    return jnp.mean(sqerr)


def total_loss(
    out: TrainForwardOut,
    labels: jax.Array,
    sparse: SparseConfig,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    ce = lm_cross_entropy(out.logits, labels)
    metrics = {"lm_loss": ce}
    loss = ce
    w = sparse.mask_loss_weight
    if out.image_mask is not None:
        l_img = _span_ratio_loss(out.image_mask, out.image_span, sparse.vision_keep_rate)
        metrics["image_mask_loss"] = l_img
        loss = loss + w * l_img
    if out.output_text_mask is not None:
        l_txt = _span_ratio_loss(
            out.output_text_mask, out.answer_span, sparse.output_text_keep_rate
        )
        metrics["output_text_mask_loss"] = l_txt
        loss = loss + w * l_txt
    if out.instruct_mask is not None:
        l_ins = _span_ratio_loss(
            out.instruct_mask, out.instruct_span, sparse.instruct_keep_rate
        )
        metrics["instruct_mask_loss"] = l_ins
        loss = loss + w * l_ins
    metrics["loss"] = loss
    return loss, metrics
