"""Grouped optimizer.

Rebuild of the reference's 4-group optimizer
(/root/reference/llava/train/dynamic_llava_trainer.py:298-398): predictor
params train at ``predictor_lr`` (2e-4) while the base model trains at the
base lr (5e-6), each split into decay / no-decay (norms & biases) groups.
The frozen vision tower gets ``set_to_zero``. Implemented with
``optax.multi_transform`` over a label pytree.
"""

from __future__ import annotations

from typing import Any

import jax
import optax


def _is_no_decay(path) -> bool:
    """Norm weights and biases are excluded from weight decay."""
    keys = [getattr(p, "key", getattr(p, "name", "")) for p in path]
    flat = "/".join(str(k) for k in keys)
    return (
        flat.endswith("/b")
        or "ln" in flat.split("/")[-1]
        or "_ln" in flat
        or "norm" in flat
    )


def label_params(
    params,
    lora_mode: bool = False,
    tune_mm_mlp_adapter: bool = False,
    projector_lr_group: bool = False,
) -> Any:
    """'frozen' (vision tower) | 'predictor[_nd]' | 'projector[_nd]' |
    'base[_nd]'.

    In ``lora_mode`` only adapters (a/b), predictors, and the projector
    train; everything else in the LLM is frozen (reference lora recipe,
    train_sparse.py:1041-1072). Adapter scale leaves ('s') stay frozen.

    ``tune_mm_mlp_adapter`` is the stage-1 alignment recipe (reference
    scripts/v1_5/pretrain.sh --tune_mm_mlp_adapter True): ONLY the
    mm_projector trains. ``projector_lr_group`` routes the projector to its
    own lr group without freezing anything else (--mm_projector_lr)."""

    def label(path, leaf):
        keys = "/".join(str(getattr(p, "key", p)) for p in path)
        if keys.startswith("mm_projector"):
            if tune_mm_mlp_adapter or projector_lr_group:
                return "projector" + ("_nd" if _is_no_decay(path) else "")
            return "base" + ("_nd" if _is_no_decay(path) else "")
        if tune_mm_mlp_adapter:
            return "frozen"
        if keys.startswith("vision_tower"):
            return "frozen"
        if "_lora" in keys:
            return "frozen" if keys.endswith("/s") else "base"
        if keys.startswith("predictors"):
            return "predictor" + ("_nd" if _is_no_decay(path) else "")
        if lora_mode and keys.startswith("llm"):
            return "frozen"
        return "base" + ("_nd" if _is_no_decay(path) else "")

    return jax.tree_util.tree_map_with_path(label, params)


def make_optimizer(
    base_lr: float = 5e-6,
    predictor_lr: float = 2e-4,
    weight_decay: float = 0.0,
    predictor_weight_decay: float = 0.0,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    lr_schedule=None,
    predictor_lr_schedule=None,
    grad_clip: float = 1.0,
    lora_mode: bool = False,
    tune_mm_mlp_adapter: bool = False,
    projector_lr=None,
    projector_lr_schedule=None,
) -> optax.GradientTransformation:
    def adamw(lr, wd):
        tx = optax.adamw(lr, b1=b1, b2=b2, eps=eps, weight_decay=wd)
        if grad_clip and grad_clip > 0:
            return optax.chain(optax.clip_by_global_norm(grad_clip), tx)
        return tx

    proj_lr = (projector_lr_schedule or projector_lr
               or lr_schedule or base_lr)
    transforms = {
        "base": adamw(lr_schedule or base_lr, weight_decay),
        "base_nd": adamw(lr_schedule or base_lr, 0.0),
        "predictor": adamw(predictor_lr_schedule or predictor_lr, predictor_weight_decay),
        "predictor_nd": adamw(predictor_lr_schedule or predictor_lr, 0.0),
        "projector": adamw(proj_lr, weight_decay),
        "projector_nd": adamw(proj_lr, 0.0),
        "frozen": optax.set_to_zero(),
    }
    import functools

    return optax.multi_transform(
        transforms,
        functools.partial(
            label_params,
            lora_mode=lora_mode,
            tune_mm_mlp_adapter=tune_mm_mlp_adapter,
            projector_lr_group=projector_lr is not None
            or projector_lr_schedule is not None,
        ),
    )


def cosine_with_warmup(
    peak_lr: float, total_steps: int, warmup_ratio: float = 0.03
) -> optax.Schedule:
    """The reference recipe: cosine decay, 3% linear warmup
    (run/train_dynamic_llava_7b.sh:33-37)."""
    warmup = max(1, int(total_steps * warmup_ratio))
    return optax.warmup_cosine_decay_schedule(
        init_value=0.0,
        peak_value=peak_lr,
        warmup_steps=warmup,
        decay_steps=total_steps,
        end_value=0.0,
    )


def gumbel_tau_schedule(
    start_tau: float, end_tau: float, total_steps: int
):
    """Exponential tau annealing per step (reference
    dynamic_llava_trainer.py:243-246)."""

    def tau(step):
        import jax.numpy as jnp

        frac = jnp.clip(step / max(total_steps, 1), 0.0, 1.0)
        return jnp.exp(
            jnp.log(start_tau) + (jnp.log(end_tau) - jnp.log(start_tau)) * frac
        )

    return tau
