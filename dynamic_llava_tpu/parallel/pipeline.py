"""GPipe pipeline parallelism over the scanned layer stack.

TPU-native replacement for the reference's model-parallel escape hatch
(the DeepSpeed recipes shard optimizer state, never layers — a 7B-scale
model that does not fit one chip's HBM even with ZeRO-3 has no story in
/root/reference/scripts/*.sh). Here a fourth mesh axis ``pipe`` owns
contiguous blocks of the layer-stacked parameters and microbatches flow
stage-to-stage over ICI:

* **Partial-manual shard_map**: only the ``pipe`` axis is manual
  (``jax.shard_map(..., axis_names={"pipe"})``); ``data``/``fsdp``/
  ``tensor`` stay GSPMD-automatic *inside* the pipeline body, so each
  stage's layers still run ZeRO-3 + tensor-parallel exactly as the
  non-pipelined step does.
* **Schedule**: classic GPipe. ``M`` microbatches over ``P`` stages in
  ``M + P - 1`` ticks per sweep; hidden states move to the next stage
  with a single ``ppermute`` per tick. Stage outputs are scan ``ys`` (not
  a carried output buffer), so backward residual memory stays at
  per-tick-activation scale and the backward is the transposed (reverse)
  pipeline — XLA derives it from the ``ppermute`` transpose.
* **Two sweeps around the sparsification event**: Dynamic-LLaVA's
  forward is layers ``[0, sparse_layer)`` → Gumbel policy predictors →
  layers ``[sparse_layer, L)`` with the policy mask
  (``models.dynamic.forward_train``). Each range is one pipelined sweep;
  the predictors (tiny MLPs) run between them under plain GSPMD,
  replicated over ``pipe``.
* **Pipeline layer order**: one permutation of the stacked ``[L, ...]``
  parameters puts each stage's pre-sweep chunk and post-sweep chunk into
  its contiguous ``L/P`` shard (``plan_pipeline`` / ``permute_stack``),
  so the standard param tree/optimizer/checkpoint shapes are unchanged —
  only the layer order differs, and ``inverse_order`` restores it for
  export. Stages whose pre/post chunk is shorter than the per-stage
  maximum mask the surplus layer applications (uniform SPMD program;
  the waste is zero when ``sparse_layer % P == 0``).

Use: permute + shard params with ``llama_param_specs(cfg, pipe=True)``,
then pass ``make_layer_runner(mesh, plan)`` as ``layer_runner=`` to
``train.step.make_train_step`` / ``models.dynamic.forward_train``.
Verified forward- and gradient-equivalent to the sequential step on the
virtual CPU mesh (tests/test_pipeline.py).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..config import LlamaConfig
from ..models import llama


class PipePlan(NamedTuple):
    """Static description of one pipeline layout."""

    stages: int
    num_layers: int
    sparse_layer: int
    microbatches: int
    order: tuple  # [L] permuted-slot -> original layer index
    n_pre: tuple  # [P] pre-sweep layer count per stage


def plan_pipeline(
    num_layers: int, sparse_layer: int, stages: int, microbatches: int
) -> PipePlan:
    """Build the stage layout: stage ``p`` owns permuted slots
    ``[p*L/P, (p+1)*L/P)`` = its pre-sweep chunk followed by its
    post-sweep chunk. Pre chunks split ``[0, sparse_layer)`` as evenly as
    possible (earlier stages take the remainder); post chunks fill the
    rest of each stage, which keeps original post order across stages."""
    assert stages >= 1 and microbatches >= 1
    assert num_layers % stages == 0, (num_layers, stages)
    per = num_layers // stages
    base, rem = divmod(sparse_layer, stages)
    n_pre = [base + (1 if p < rem else 0) for p in range(stages)]
    assert max(n_pre) <= per, (n_pre, per)
    order = []
    pre_cur, post_cur = 0, sparse_layer
    for p in range(stages):
        order.extend(range(pre_cur, pre_cur + n_pre[p]))
        pre_cur += n_pre[p]
        n_post = per - n_pre[p]
        order.extend(range(post_cur, post_cur + n_post))
        post_cur += n_post
    assert pre_cur == sparse_layer and post_cur == num_layers
    return PipePlan(
        stages=stages,
        num_layers=num_layers,
        sparse_layer=sparse_layer,
        microbatches=microbatches,
        order=tuple(order),
        n_pre=tuple(n_pre),
    )


def inverse_order(order) -> tuple:
    inv = np.empty(len(order), dtype=np.int64)
    inv[np.asarray(order)] = np.arange(len(order))
    return tuple(int(i) for i in inv)


def permute_stack(layers, order):
    """Reorder the stacked ``[L, ...]`` layer tree into pipeline order
    (0-d leaves — e.g. LoRA scales — pass through)."""
    idx = np.asarray(order)

    def pick(a):
        return a if jnp.ndim(a) == 0 else jnp.take(a, idx, axis=0)

    return jax.tree.map(pick, layers)


def layer_stack_specs(layers):
    """PartitionSpecs sharding only the stacked layer axis over 'pipe'
    (fsdp/tensor placement stays GSPMD-automatic inside the partial-manual
    shard_map, so the manual specs name only the manual axis)."""
    return jax.tree.map(
        lambda a: P() if jnp.ndim(a) == 0 else P("pipe"), layers
    )


# ---------------------------------------------------------------------------
# The pipelined sweep (runs inside shard_map, manual over 'pipe' only)
# ---------------------------------------------------------------------------


def _sweep(
    layers_local,
    x_mb,  # [M, mb, S, D] replicated over pipe — fp32 at the boundary
    positions_mb,  # [M, mb, S]
    policy_mb,  # [M, mb, S] or None (static)
    *,
    cfg: LlamaConfig,
    plan: PipePlan,
    sweep_pre: bool,
    remat: bool,
    remat_policy: str,
    compute_dtype,
):
    # x crosses the shard_map boundary — and stays, until each tick's
    # varying `where` — in fp32: every UNVARYING value's cotangent is
    # all-reduced over 'pipe' in the transpose, and XLA:CPU's
    # AllReducePromotion pass crashes outright on any bf16 all-reduce
    # whose reduction body carries a sharding constraint ("Invalid
    # binary instruction opcode copy" — CloneAllReduce treats the body
    # root as a binary op). fp32 all-reduces skip the promotion pass
    # entirely, and every bf16<->fp32 roundtrip here is exact, so
    # numerics are unchanged on all backends.
    stages, M = plan.stages, plan.microbatches
    per = plan.num_layers // stages
    idx = jax.lax.axis_index("pipe")
    n_pre = jnp.asarray(plan.n_pre, jnp.int32)[idx]
    if sweep_pre:
        steps = max(plan.n_pre)
        start, count = jnp.int32(0), n_pre
    else:
        steps = per - min(plan.n_pre)
        start, count = n_pre, per - n_pre
    ticks = M + stages - 1

    def layer_step(x, j, m):
        li = jnp.minimum(start + j, per - 1)
        lp = llama.index_layer(layers_local, li)
        pol = None if policy_mb is None else policy_mb[m]
        y = llama.layer_nocache(
            lp, cfg, x, positions_mb[m], None, pol, training=True
        )
        # masked slots (shorter pre/post chunk than the stage maximum)
        # pass x through; the surplus compute is dead and its params get
        # zero gradient through the select
        return jnp.where(j < count, y, x)

    if remat:
        ckpt_policy = (
            jax.checkpoint_policies.dots_with_no_batch_dims_saveable
            if remat_policy == "dots"
            else jax.checkpoint_policies.nothing_saveable
        )
        layer_step = jax.checkpoint(layer_step, policy=ckpt_policy)

    def tick(state, t):
        # stage `idx` processes microbatch m = t - idx at tick t; stage 0
        # reads fresh input, later stages read the ppermuted carry.
        # Warmup/drain ticks compute on zeros/stale values that are never
        # emitted (masked by the last-stage psum below).
        m = jnp.clip(t - idx, 0, M - 1)
        x = jnp.where(
            idx == 0,
            x_mb[jnp.minimum(t, M - 1)],  # fp32 until varying (see above)
            state.astype(jnp.float32),
        ).astype(compute_dtype)

        def body(x, j):
            return layer_step(x, j, m), None

        if steps > 0:
            x, _ = jax.lax.scan(body, x, jnp.arange(steps, dtype=jnp.int32))
        nxt = jax.lax.ppermute(
            x, "pipe", [(i, i + 1) for i in range(stages - 1)]
        )
        return nxt, x

    # fp32 through the pcast for the same reason as the boundary cast:
    # the transpose of to-varying is a psum over 'pipe', and the initial
    # carry's cotangent includes every tick's state gradient
    state0 = jax.lax.pcast(
        jnp.zeros(x_mb.shape[1:], jnp.float32), ("pipe",), to="varying"
    ).astype(compute_dtype)
    _, ys = jax.lax.scan(tick, state0, jnp.arange(ticks, dtype=jnp.int32))
    # microbatch m completes on the last stage at tick m + P - 1
    out = ys[stages - 1 : stages - 1 + M]
    # The masked psum (sum of one non-zero stage) runs in fp32: a bf16
    # psum here crashes XLA:CPU's partial-manual partitioner outright
    # ("Invalid binary instruction opcode copy" — probed op-by-op: the
    # psum is the trigger, ppermute/scan/matmuls are fine, and the bug
    # needs BOTH bf16 and auto axes in the mesh). The bf16->fp32->bf16
    # roundtrip is exact, so semantics are unchanged on every backend.
    acc = jnp.where(
        idx == stages - 1,
        out.astype(jnp.float32),
        jnp.zeros(out.shape, jnp.float32),
    )
    return jax.lax.psum(acc, "pipe").astype(out.dtype)


def make_layer_runner(mesh: Mesh, plan: PipePlan):
    """A drop-in ``layer_runner`` for ``models.dynamic.forward_train`` /
    ``llama.run_layers_nocache`` call sites: runs the requested layer
    range as one GPipe sweep over the 'pipe' mesh axis.

    ``params['layers']`` must already be in pipeline order
    (``permute_stack(layers, plan.order)``) and sharded with
    ``llama_param_specs(cfg, pipe=True)``. Only the two ranges the
    dynamic forward uses are valid: ``[0, sparse_layer)`` and
    ``[sparse_layer, num_layers)``."""

    def runner(
        params,
        cfg: LlamaConfig,
        x: jax.Array,  # [B, S, D]
        positions: jax.Array,  # [B, S]
        *,
        lo: int = 0,
        hi: Optional[int] = None,
        mask: Optional[jax.Array] = None,
        policy: Optional[jax.Array] = None,
        remat: bool = False,
        remat_policy: str = "nothing",
        training: bool = False,
    ) -> jax.Array:
        assert mask is None, "pipeline sweeps use plain causal attention"
        hi = cfg.num_hidden_layers if hi is None else hi
        if hi == lo:
            return x
        assert cfg.num_hidden_layers == plan.num_layers
        sweep_pre = lo == 0 and hi == plan.sparse_layer
        assert sweep_pre or (
            lo == plan.sparse_layer and hi == plan.num_layers
        ), (lo, hi, plan.sparse_layer)
        if sweep_pre and max(plan.n_pre) == 0:
            return x
        b, s, d = x.shape
        M = plan.microbatches
        assert b % M == 0, (b, M)
        mb = b // M
        x_mb = x.reshape(M, mb, s, d).astype(jnp.float32)  # see _sweep note
        pos_mb = positions.reshape(M, mb, s)
        args = [x_mb, pos_mb]
        in_specs = [layer_stack_specs(params["layers"]), P(), P()]
        if policy is not None:
            args.append(policy.reshape(M, mb, s))
            in_specs.append(P())

        def body(layers_local, x_mb, positions_mb, policy_mb=None):
            return _sweep(
                layers_local,
                x_mb,
                positions_mb,
                policy_mb,
                cfg=cfg,
                plan=plan,
                sweep_pre=sweep_pre,
                remat=remat,
                remat_policy=remat_policy,
                compute_dtype=x.dtype,
            )

        fn = jax.shard_map(
            body,
            mesh=mesh,
            in_specs=tuple(in_specs),
            out_specs=P(),
            axis_names={"pipe"},
        )
        out = fn(params["layers"], *args)
        return out.reshape(b, s, d)

    return runner
