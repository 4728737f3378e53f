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

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import LlamaConfig, SparseConfig
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


def lm_cross_entropy_blockwise(
    llm_params,
    tcfg: LlamaConfig,
    hidden: jax.Array,  # [B, S, D] final decoder hidden states (pre final-norm)
    labels: jax.Array,  # [B, S] int32 with IGNORE_INDEX
    block_s: int = 256,
) -> jax.Array:
    """Fused/chunked CE: never materializes the [B, S, V] fp32 logits tensor.

    The lm_head projection + logsumexp + target gather run one sequence
    block at a time inside a checkpointed scan, so both forward AND
    backward peak at [B, block_s, V] (the full tensor is ~850 MB at the
    0.55B train shape and was the last unfused big consumer of the step —
    docs/BENCHMARKS.md MFU table). Numerically identical to
    ``lm_cross_entropy(lm_head(hidden), labels)``: per-token NLL is
    ``logsumexp(logits) - logits[target]`` in fp32 either way."""
    from ..models import llama

    x = hidden[:, :-1]
    y = labels[:, 1:]
    b, s, d = x.shape
    block_s = min(block_s, s)
    pad = (-s) % block_s
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
        y = jnp.pad(y, ((0, 0), (0, pad)), constant_values=IGNORE_INDEX)
    nb = (s + pad) // block_s
    xb = x.reshape(b, nb, block_s, d).transpose(1, 0, 2, 3)
    yb = y.reshape(b, nb, block_s).transpose(1, 0, 2)

    def block(xi, yi):
        logits = llama.lm_head(llm_params, tcfg, xi)  # fp32 [B, bs, V]
        valid = yi != IGNORE_INDEX
        safe = jnp.where(valid, yi, 0)
        lse = jax.nn.logsumexp(logits, axis=-1)
        tgt = jnp.take_along_axis(logits, safe[..., None], axis=-1)[..., 0]
        nll = jnp.where(valid, lse - tgt, 0.0)
        return jnp.sum(nll), jnp.sum(valid)

    block = jax.checkpoint(block)

    def body(carry, args):
        acc, n = carry
        xi, yi = args
        ds, dn = block(xi, yi)
        return (acc + ds, n + dn), None

    (total, n), _ = jax.lax.scan(
        body, (jnp.float32(0.0), jnp.int32(0)), (xb, yb)
    )
    return total / jnp.maximum(n, 1)


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
    llm_params=None,
    tcfg: Optional[LlamaConfig] = None,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """With ``out.logits`` present, uses the dense CE. When the forward ran
    with ``return_hidden=True`` (out.logits is None, out.hidden set), pass
    ``llm_params``/``tcfg`` and the CE runs blockwise-fused."""
    if out.logits is None:
        ce = lm_cross_entropy_blockwise(llm_params, tcfg, out.hidden, labels)
    else:
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
