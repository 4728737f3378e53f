"""Jitted training step with mesh sharding.

One XLA program per step: forward (Gumbel policy path) + losses + grads +
grouped-optimizer update, sharded over the (data, fsdp, tensor) mesh —
the TPU-native equivalent of the reference's DeepSpeed ZeRO-3 step
(SURVEY.md §2.8). Gradient checkpointing is applied per scanned layer.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import LlavaConfig
from ..models import dynamic
from ..multimodal.fusion import FusionPlan
from .losses import total_loss


class TrainBatch(NamedTuple):
    """Device-side training batch (built from a FusionPlan + images)."""

    token_ids: jax.Array  # [B, S]
    is_image: jax.Array  # [B, S] bool
    image_slot: jax.Array  # [B, S]
    labels: jax.Array  # [B, S]
    valid_len: jax.Array  # [B]
    image_start: jax.Array  # [B]
    answer_start: jax.Array  # [B]
    answer_end: jax.Array  # [B]
    last_instruct_start: jax.Array  # [B]
    last_instruct_end: jax.Array  # [B]
    has_image: jax.Array  # [B] bool
    pixel_values: Optional[jax.Array]  # [B, H, W, 3] or None


def batch_from_plan(plan: FusionPlan, pixel_values) -> TrainBatch:
    sp = plan.spans
    return TrainBatch(
        token_ids=jnp.asarray(plan.token_ids),
        is_image=jnp.asarray(plan.is_image),
        image_slot=jnp.asarray(plan.image_slot),
        labels=jnp.asarray(plan.labels),
        valid_len=jnp.asarray(plan.valid_len),
        image_start=jnp.asarray(sp.image_start),
        answer_start=jnp.asarray(sp.answer_start),
        answer_end=jnp.asarray(sp.answer_end),
        last_instruct_start=jnp.asarray(sp.last_instruct_start),
        last_instruct_end=jnp.asarray(sp.last_instruct_end),
        has_image=jnp.asarray(sp.has_image),
        pixel_values=None if pixel_values is None else jnp.asarray(pixel_values),
    )


def loss_fn(params, cfg: LlavaConfig, batch: TrainBatch, rng, tau, remat=True,
            remat_policy="nothing", fused_ce=True, layer_runner=None):
    # fused_ce: the [B, S, V] fp32 logits tensor never materializes — the
    # lm_head + CE run blockwise inside the loss (lm_cross_entropy_blockwise)
    out = dynamic.forward_train(
        params, cfg,
        batch.token_ids, batch.is_image, batch.image_slot, batch.valid_len,
        batch.image_start, batch.answer_start, batch.answer_end,
        batch.last_instruct_start, batch.last_instruct_end, batch.has_image,
        batch.pixel_values, rng, tau, remat=remat, remat_policy=remat_policy,
        return_hidden=fused_ce, layer_runner=layer_runner,
    )
    return total_loss(out, batch.labels, cfg.sparse,
                      llm_params=params["llm"], tcfg=cfg.text)


def make_train_step(
    cfg: LlavaConfig,
    optimizer: optax.GradientTransformation,
    mesh: Optional[Mesh] = None,
    param_specs=None,
    remat: bool = True,
    grad_accum_steps: int = 1,
    labels=None,
    remat_policy: str = "nothing",
    fused_ce: bool = True,
    layer_runner=None,
):
    """Returns jitted ``step(params, opt_state, batch, rng, tau) ->
    (params, opt_state, metrics)``. With a mesh, params/opt-state are
    sharded per ``param_specs`` and the batch over the 'data' axis.

    ``grad_accum_steps > 1`` splits the batch's leading dim into that many
    micro-batches and averages their gradients before the optimizer update —
    how the reference's global batch 64 fits devices that cannot hold it
    (the deepspeed recipe's gradient_accumulation_steps).

    ``labels`` (the optimizer's label pytree) restricts differentiation to
    non-'frozen' leaves: frozen weights never enter jax.grad, so
    projector-only pretrain does not materialize decoder gradients and
    int-quantized QLoRA base weights (which jax.grad would reject) are
    legal. Frozen slots carry 0-d zero grads into the optimizer, whose
    set_to_zero group ignores them."""

    frozen_flags = None
    if labels is not None:
        frozen_flags = tuple(
            label == "frozen" for label in jax.tree.leaves(labels)
        )
        if not any(frozen_flags):
            frozen_flags = None

    def grads_of(params, batch, rng, tau):
        if frozen_flags is None:
            return jax.value_and_grad(loss_fn, has_aux=True)(
                params, cfg, batch, rng, tau, remat, remat_policy, fused_ce,
                layer_runner,
            )
        treedef = jax.tree.structure(params)
        leaves = jax.tree.leaves(params)
        train = [p for p, f in zip(leaves, frozen_flags) if not f]
        frozen = [p for p, f in zip(leaves, frozen_flags) if f]

        def merge(train_leaves, frozen_leaves):
            it_t, it_f = iter(train_leaves), iter(frozen_leaves)
            return jax.tree.unflatten(
                treedef,
                [next(it_f) if f else next(it_t) for f in frozen_flags],
            )

        def loss_trainable(train_leaves):
            return loss_fn(merge(train_leaves, frozen), cfg, batch, rng,
                           tau, remat, remat_policy, fused_ce, layer_runner)

        (loss, metrics), g_train = jax.value_and_grad(
            loss_trainable, has_aux=True
        )(train)
        grads = merge(g_train, [jnp.zeros((), jnp.float32) for _ in frozen])
        return (loss, metrics), grads

    def step(params, opt_state, batch: TrainBatch, rng, tau):
        if grad_accum_steps == 1:
            (loss, metrics), grads = grads_of(params, batch, rng, tau)
        else:
            def split(x):
                if x is None:
                    return None
                b = x.shape[0]
                assert b % grad_accum_steps == 0, (b, grad_accum_steps)
                return x.reshape((grad_accum_steps, b // grad_accum_steps) + x.shape[1:])

            micro = TrainBatch(*[split(f) for f in batch])
            rngs = jax.random.split(rng, grad_accum_steps)

            def body(carry, xs):
                grads_acc, metrics_acc = carry
                mb, r = xs
                (loss_i, metrics_i), grads_i = grads_of(params, mb, r, tau)
                grads_acc = jax.tree.map(jnp.add, grads_acc, grads_i)
                metrics_acc = jax.tree.map(jnp.add, metrics_acc, metrics_i)
                return (grads_acc, metrics_acc), None

            mb0 = jax.tree.map(lambda x: None if x is None else x[0], micro)
            (_, m_shape), g_shape = jax.eval_shape(
                grads_of, params, mb0, rngs[0], tau
            )
            zero_grads = jax.tree.map(
                lambda s_: jnp.zeros(s_.shape, s_.dtype), g_shape
            )
            zero_metrics = jax.tree.map(
                lambda s_: jnp.zeros(s_.shape, s_.dtype), m_shape
            )
            (grads, metrics), _ = jax.lax.scan(
                body, (zero_grads, zero_metrics), (micro, rngs)
            )
            inv = 1.0 / grad_accum_steps
            grads = jax.tree.map(lambda g: g * inv, grads)
            metrics = jax.tree.map(lambda m: m * inv, metrics)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        metrics["grad_norm"] = optax.global_norm(grads)
        return params, opt_state, metrics

    if mesh is None:
        return jax.jit(step, donate_argnums=(0, 1))

    def to_sharding(spec_tree):
        return jax.tree.map(
            lambda s: NamedSharding(mesh, s),
            spec_tree,
            is_leaf=lambda x: isinstance(x, P),
        )

    params_sh = to_sharding(param_specs)

    # Only params are pinned; the opt state inherits their sharding through
    # GSPMD propagation (ZeRO-style: Adam moments shard with their params)
    # and the caller device_puts the batch over the 'data' axis
    # (see shard_batch).
    return jax.jit(
        step,
        in_shardings=(params_sh, None, None, None, None),
        out_shardings=(params_sh, None, None),
        donate_argnums=(0, 1),
    )


def shard_batch(batch: TrainBatch, mesh: Mesh) -> TrainBatch:
    sh = NamedSharding(mesh, P("data"))
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)
