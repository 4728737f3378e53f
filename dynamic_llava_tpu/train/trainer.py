"""Training loop.

Rebuild of ``DynamicLLaVATrainer``
(/root/reference/llava/train/dynamic_llava_trainer.py:202-591) on the jitted
train step: exponential Gumbel-tau annealing per step (:243-246), grouped
learning rates with cosine+warmup schedules, per-step metric logging
({loss, 3 mask losses, lrs, tau} :400-539), and orbax checkpointing with
auto-resume (train_sparse.py:1173-1176).
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass
from typing import Any, Dict, Iterator

import jax
import jax.numpy as jnp

from ..config import LlavaConfig
from ..parallel.sharding import llava_param_specs, make_mesh, shard_params
from .optimizer import cosine_with_warmup, gumbel_tau_schedule, make_optimizer
from .step import batch_from_plan, make_train_step, shard_batch


@dataclass
class TrainerConfig:
    output_dir: str = "./checkpoints/run"
    learning_rate: float = 5e-6
    predictor_lr: float = 2e-4
    weight_decay: float = 0.0
    warmup_ratio: float = 0.03
    lr_scheduler_type: str = "cosine"
    num_train_steps: int = 1000
    gumbel_start_tau: float = 1.0
    gumbel_end_tau: float = 0.1
    logging_steps: int = 10
    save_steps: int = 500
    seed: int = 42
    gradient_checkpointing: bool = True
    # "nothing" (min memory, 7B) | "dots" (save projection outputs -> much
    # less backward recompute; fits sub-1B and sharded regimes)
    remat_policy: str = "nothing"
    grad_accum_steps: int = 1
    report_to: str = "jsonl"  # "jsonl" | "none"
    lora_mode: bool = False
    # stage-1 projector alignment (reference scripts/v1_5/pretrain.sh)
    tune_mm_mlp_adapter: bool = False
    # separate projector lr (reference --mm_projector_lr, lora recipes)
    mm_projector_lr: float = 0.0
    # mesh
    data_parallel: int = 1
    fsdp_parallel: int = -1
    tensor_parallel: int = 1
    # GPipe pipeline stages over the layer stack (parallel/pipeline.py);
    # 1 = off. Stage count must divide num_hidden_layers.
    pipeline_parallel: int = 1
    # microbatches per pipelined sweep (0 -> = pipeline_parallel); must
    # divide the per-step batch size. Bubble fraction is (P-1)/(M+P-1).
    pipeline_microbatches: int = 0


class MetricsLogger:
    """JSONL metrics stream (the wandb-equivalent observability surface)."""

    def __init__(self, output_dir: str, enabled: bool = True):
        self.enabled = enabled
        self.path = os.path.join(output_dir, "metrics.jsonl")
        if enabled:
            os.makedirs(output_dir, exist_ok=True)
            self._f = open(self.path, "a")

    def log(self, step: int, metrics: Dict[str, Any]):
        if not self.enabled:
            return
        rec = {"step": step, "time": time.time()}
        for k, v in metrics.items():
            try:
                rec[k] = float(v)
            except (TypeError, ValueError):
                rec[k] = v
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()


class Trainer:
    def __init__(
        self,
        cfg: LlavaConfig,
        params,
        tc: TrainerConfig,
        use_mesh: bool = True,
    ):
        self.cfg = cfg
        self.tc = tc
        n_dev = len(jax.devices())
        self.pipe_plan = None
        self._layer_runner = None
        if use_mesh and n_dev > 1:
            pipe = max(tc.pipeline_parallel, 1)
            self.mesh = make_mesh(
                data=tc.data_parallel, fsdp=tc.fsdp_parallel,
                tensor=tc.tensor_parallel, pipe=pipe,
            )
            if pipe > 1:
                from ..parallel.pipeline import (
                    make_layer_runner,
                    permute_stack,
                    plan_pipeline,
                )

                self.pipe_plan = plan_pipeline(
                    cfg.text.num_hidden_layers, cfg.sparse.sparse_layer,
                    stages=pipe,
                    microbatches=tc.pipeline_microbatches or pipe,
                )
                params = dict(params)
                params["llm"] = dict(params["llm"])
                params["llm"]["layers"] = permute_stack(
                    params["llm"]["layers"], self.pipe_plan.order
                )
                self._layer_runner = make_layer_runner(
                    self.mesh, self.pipe_plan
                )
            self.specs = llava_param_specs(cfg, params, pipe=pipe > 1)
            params = shard_params(params, self.mesh, self.specs)
        else:
            self.mesh = None
            self.specs = None

        base_sched = cosine_with_warmup(
            tc.learning_rate, tc.num_train_steps, tc.warmup_ratio
        )
        pred_sched = cosine_with_warmup(
            tc.predictor_lr, tc.num_train_steps, tc.warmup_ratio
        )
        self.base_sched, self.pred_sched = base_sched, pred_sched
        proj_sched = (
            cosine_with_warmup(tc.mm_projector_lr, tc.num_train_steps,
                               tc.warmup_ratio)
            if tc.mm_projector_lr else None
        )
        self.optimizer = make_optimizer(
            base_lr=tc.learning_rate,
            predictor_lr=tc.predictor_lr,
            weight_decay=tc.weight_decay,
            lr_schedule=base_sched,
            predictor_lr_schedule=pred_sched,
            lora_mode=tc.lora_mode,
            tune_mm_mlp_adapter=tc.tune_mm_mlp_adapter,
            projector_lr_schedule=proj_sched,
        )
        self.params = params
        self.opt_state = self.optimizer.init(params)
        self.tau_fn = gumbel_tau_schedule(
            tc.gumbel_start_tau, tc.gumbel_end_tau, tc.num_train_steps
        )
        from .optimizer import label_params

        self.labels = label_params(
            params, lora_mode=tc.lora_mode,
            tune_mm_mlp_adapter=tc.tune_mm_mlp_adapter,
            projector_lr_group=bool(tc.mm_projector_lr),
        )
        self.step_fn = make_train_step(
            cfg, self.optimizer, mesh=self.mesh, param_specs=self.specs,
            remat=tc.gradient_checkpointing,
            grad_accum_steps=tc.grad_accum_steps,
            labels=self.labels,
            remat_policy=tc.remat_policy,
            layer_runner=self._layer_runner,
        )
        self.logger = MetricsLogger(tc.output_dir, tc.report_to != "none")
        self.step = 0
        self._ckpt_mgr = None

    # -- checkpointing (orbax) ---------------------------------------------

    def _manager(self):
        if self._ckpt_mgr is None:
            import orbax.checkpoint as ocp

            self._ckpt_mgr = ocp.CheckpointManager(
                os.path.abspath(os.path.join(self.tc.output_dir, "ckpt")),
                options=ocp.CheckpointManagerOptions(max_to_keep=3),
            )
        return self._ckpt_mgr

    def unpermuted_params(self):
        """Params with the layer stack back in original order — use this
        (not ``self.params``) when exporting a pipeline-parallel run to an
        HF checkpoint (``models.export``). Orbax save/resume keeps the
        pipeline order (the plan is a pure function of the config, so a
        resumed run re-derives the same permutation)."""
        if self.pipe_plan is None:
            return self.params
        from ..parallel.pipeline import inverse_order, permute_stack

        params = dict(self.params)
        params["llm"] = dict(params["llm"])
        params["llm"]["layers"] = permute_stack(
            params["llm"]["layers"], inverse_order(self.pipe_plan.order)
        )
        return params

    def save(self):
        import orbax.checkpoint as ocp

        self._manager().save(
            self.step,
            args=ocp.args.Composite(
                params=ocp.args.StandardSave(self.params),
                opt_state=ocp.args.StandardSave(self.opt_state),
            ),
        )
        self._manager().wait_until_finished()

    def maybe_resume(self) -> bool:
        """Auto-resume from the latest checkpoint if one exists (reference
        train_sparse.py:1173-1176)."""
        import orbax.checkpoint as ocp

        mgr = self._manager()
        latest = mgr.latest_step()
        if latest is None:
            return False
        restored = mgr.restore(
            latest,
            args=ocp.args.Composite(
                params=ocp.args.StandardRestore(self.params),
                opt_state=ocp.args.StandardRestore(self.opt_state),
            ),
        )
        self.params = restored["params"]
        self.opt_state = restored["opt_state"]
        self.step = latest
        return True

    # -- loop ----------------------------------------------------------------

    def train(self, batches: Iterator) -> Dict[str, float]:
        tc = self.tc
        rng = jax.random.key(tc.seed)
        last_metrics: Dict[str, float] = {}
        t0 = time.time()
        for plan, images in batches:
            if self.step >= tc.num_train_steps:
                break
            batch = batch_from_plan(plan, images)
            if self.mesh is not None:
                batch = shard_batch(batch, self.mesh)
            rng, krng = jax.random.split(rng)
            tau = jnp.float32(self.tau_fn(self.step))
            ctx = self.mesh or _nullcontext()
            with ctx:
                self.params, self.opt_state, metrics = self.step_fn(
                    self.params, self.opt_state, batch, krng, tau
                )
            self.step += 1
            if self.step % tc.logging_steps == 0 or self.step == 1:
                metrics = {k: float(v) for k, v in metrics.items()}
                metrics["gumbel_tau"] = float(tau)
                metrics["learning_rate"] = float(self.base_sched(self.step))
                metrics["predictor_lr"] = float(self.pred_sched(self.step))
                metrics["steps_per_s"] = self.step / (time.time() - t0)
                self.logger.log(self.step, metrics)
                last_metrics = metrics
            if tc.save_steps and self.step % tc.save_steps == 0:
                self.save()
        return last_metrics


class _nullcontext:
    def __enter__(self):
        return None

    def __exit__(self, *a):
        return False
