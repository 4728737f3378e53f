"""Continuous batching: admit requests into live decode slots.

The reference gets continuous batching by delegating to SGLang
(/root/reference/llava/serve/sglang_worker.py) — a CUDA runtime this
framework replaces natively. The window-batched ``serve.sglang_worker``
already micro-batches concurrent requests; this engine closes the last
gap to the real thing: a new request joins a RUNNING batch the moment a
slot frees, instead of waiting for the current batch to finish.

TPU-native shape: everything is static. The engine owns one batched
``GenState`` with ``slots`` rows and fixed cache capacities; its decode
loop is the same jitted chunked-stop program the Generator/chat path
uses (per-slot ``active`` masks freeze finished rows in-graph). Admission
is two device programs:

1. the standard batch-1 ``dynamic.prefill`` into a fresh cache allocated
   at the ENGINE's capacities (one compiled program per prompt bucket),
2. ``splice_slot``: scatter that request's K/V/lengths/positions/logits
   into the freed slot of the live batched state.

Decode never stops or recompiles while requests come and go; greedy
tokens match a solo ``Generator.generate`` run of the same request
token-for-token (pinned by tests/test_continuous.py on the CPU backend,
including slot reuse). On TPU bf16 the match is semantic rather than
guaranteed-bitwise: a batch-k admission prefill may tile its matmuls
differently from the solo batch-1 program, so an exact logit near-tie
could in principle resolve differently.

Sampling is per-SLOT: each request carries its own temperature/top_p,
spliced into [slots] device vectors at admission and applied row-wise
inside the one decode program (``_sample_per_slot``) — greedy and
sampled requests ride the same batch, matching the SGLang runtime the
reference delegates to. Admission prefills BATCH: when several slots
free at once (saturated load), the queued requests prefill as ONE
batched program (power-of-two buckets, grouped by has-image) instead of
k batch-1 programs — k batch-1 prefills were the engine's main
structural cost vs the window batcher. ``kv_overflow="drop"`` only (a
ring slot's wrap bases are per-request state the splice does not carry
yet).
"""

from __future__ import annotations

import itertools
from typing import Dict, List, Optional

import numpy as np

import jax
import jax.numpy as jnp

from ..config import LlavaConfig
from ..models import dynamic
from ..multimodal.fusion import plan_batch
from ..ops.kv_cache import init_tiered_cache, splice_tiered_slot
from .generate import GenerationConfig, Generator


class Request:
    """Host-side request record."""

    def __init__(self, req_id: int, token_ids: np.ndarray,
                 pixel_values: Optional[np.ndarray], max_new: int,
                 temperature: float = 0.0, top_p: float = 1.0):
        self.id = req_id
        self.token_ids = token_ids
        self.pixel_values = pixel_values
        self.max_new = max_new
        self.temperature = temperature
        self.top_p = top_p
        self.output: List[int] = []
        self.done = False


def _row_state(state: dynamic.GenState, i: int) -> dynamic.GenState:
    """Batch-1 view of row ``i`` (static) of a batched prefill state —
    the splice source for batched admission."""

    def row_kv(kv):
        fields = dict(
            k=kv.k[:, i:i + 1], v=kv.v[:, i:i + 1],
            length=kv.length[:, i:i + 1],
        )
        if kv.quantized:
            fields["k_scale"] = kv.k_scale[:, i:i + 1]
            fields["v_scale"] = kv.v_scale[:, i:i + 1]
        return kv._replace(**fields)

    return dynamic.GenState(
        cache=state.cache._replace(
            pre=row_kv(state.cache.pre), post=row_kv(state.cache.post)
        ),
        next_pos=state.next_pos[i:i + 1],
        last_logits=state.last_logits[i:i + 1],
    )


# Module-level jitted-splice cache (keyed by admission batch size k plus
# the kernel-dispatch env knobs — see generate._env_key; JAX itself
# re-specializes on state shapes/dtypes within a wrapper): traces must
# survive engine-instance churn — a per-instance jax.jit wrapper retraces
# on every fresh engine, which measured as seconds of the
# continuous-batching bench's makespan on the 1-core host.
_SPLICE_CACHE: Dict[tuple, object] = {}


def _splice_fn_k(k: int):
    """Jitted k-row splice: scatter a batch-k prefilled state into k
    slots AND reset those slots' decode-loop vectors in ONE program
    (separate eager updates would pay one host round-trip each through
    the tunnel). ``k`` is static; slots/max_news/temps/top_ps are [k]
    device vectors."""
    from .generate import _env_key

    key = (k, _env_key())
    if key in _SPLICE_CACHE:
        return _SPLICE_CACHE[key]

    def impl(state, active, hist, n_emit, limit, temps, top_ps,
             state_k, slots, max_news, r_temps, r_top_ps):
        for i in range(k):
            slot = slots[i]
            row = _row_state(state_k, i)
            state = dynamic.GenState(
                cache=splice_tiered_slot(state.cache, row.cache, slot),
                next_pos=jax.lax.dynamic_update_slice(
                    state.next_pos, row.next_pos, (slot,)),
                last_logits=jax.lax.dynamic_update_slice(
                    state.last_logits, row.last_logits, (slot, 0)),
            )
            active = active.at[slot].set(True)
            hist = hist.at[slot].set(-7)
            n_emit = n_emit.at[slot].set(0)
            limit = limit.at[slot].set(max_news[i])
            temps = temps.at[slot].set(r_temps[i])
            top_ps = top_ps.at[slot].set(r_top_ps[i])
        return state, active, hist, n_emit, limit, temps, top_ps

    fn = jax.jit(impl, donate_argnums=(0,))
    _SPLICE_CACHE[key] = fn
    return fn


def _splice_fn_k_spec(k: int, width: int):
    """Spec-mode k-row splice: the plain splice plus the draft-context
    scatter — each admitted row's (padded) prompt tokens land in its slot's
    ctx row with ctx_len = valid_len, so prompt-lookup drafts see the new
    request immediately."""
    from .generate import _env_key

    key = (k, width, "spec", _env_key())
    if key in _SPLICE_CACHE:
        return _SPLICE_CACHE[key]

    def impl(state, active, hist, n_emit, limit, temps, top_ps,
             state_k, slots, max_news, r_temps, r_top_ps,
             ctx, ctx_len, rows, row_lens):
        for i in range(k):
            slot = slots[i]
            row = _row_state(state_k, i)
            state = dynamic.GenState(
                cache=splice_tiered_slot(state.cache, row.cache, slot),
                next_pos=jax.lax.dynamic_update_slice(
                    state.next_pos, row.next_pos, (slot,)),
                last_logits=jax.lax.dynamic_update_slice(
                    state.last_logits, row.last_logits, (slot, 0)),
            )
            active = active.at[slot].set(True)
            hist = hist.at[slot].set(-7)
            n_emit = n_emit.at[slot].set(0)
            limit = limit.at[slot].set(max_news[i])
            temps = temps.at[slot].set(r_temps[i])
            top_ps = top_ps.at[slot].set(r_top_ps[i])
            ctx = jax.lax.dynamic_update_slice(
                ctx,
                jnp.zeros((1, ctx.shape[1]), jnp.int32).at[
                    :, :width].set(rows[i][None]),
                (slot, 0))
            ctx_len = ctx_len.at[slot].set(row_lens[i])
        return state, active, hist, n_emit, limit, temps, top_ps, ctx, ctx_len

    fn = jax.jit(impl, donate_argnums=(0, 12))
    _SPLICE_CACHE[key] = fn
    return fn


class ContinuousEngine:
    """Slot-based continuous batching over a fixed decode program.

    ``prompt_bucket`` bounds (and buckets) prompt lengths; ``max_new_cap``
    bounds any request's ``max_new_tokens``. Both size the shared cache
    capacities — admission rejects requests that exceed them.
    """

    def __init__(
        self,
        params,
        cfg: LlavaConfig,
        gen_cfg: GenerationConfig = GenerationConfig(),
        *,
        slots: int = 4,
        prompt_bucket: int = 128,
        max_new_cap: int = 256,
        with_images: bool = True,
        spec_k: int = 0,
    ):
        assert gen_cfg.kv_overflow == "drop"
        if spec_k:
            # speculative verify is an argmax-chain equality check —
            # greedy-only, like every speculative mode in the repo
            assert gen_cfg.temperature == 0.0, (
                "spec_k requires greedy decoding (temperature 0)")
        self.cfg = cfg
        self.gen = Generator(params, cfg, gen_cfg)
        self.gc = gen_cfg
        self.slots = slots
        self.prompt_bucket = prompt_bucket
        self.spec_k = int(spec_k)
        self._m = self.spec_k + 1
        chunk = max(1, min(gen_cfg.decode_chunk, max_new_cap))
        # whole chunks so the final chunk's overshoot has cache room
        self.chunk = chunk
        self.max_new_cap = -(-max_new_cap // chunk) * chunk
        # capacities sized for the worst admissible request: image present
        # (longest fused prompt) and NO image-prune shrink assumed for the
        # post tier (a text-only request keeps every prompt token). A spec
        # round may write m candidates past a slot's emission budget before
        # rollback-by-lengths, so spec mode sizes for max_new + m.
        n_img = cfg.num_image_tokens if with_images else 0
        seq_len_max = prompt_bucket + (n_img - 1 if n_img else 0)
        pre_cap, post_cap = dynamic.gen_cache_sizes(
            cfg, seq_len_max, self.max_new_cap + (self._m if spec_k else 0),
            bound_output_budget=gen_cfg.bound_kv_budget,
            all_have_image=False,
            bucket=gen_cfg.pad_multiple,
        )
        self.pre_cap, self.post_cap = pre_cap, post_cap
        # admission caches hold only the prefilled PROMPT (decode tokens
        # land in the engine state), so they are sized prompt-only —
        # splice_cache_slot accepts the smaller source capacity. They are
        # also POOLED per admission batch size k and never freed: on the
        # 16 GB chip at the 7B regime, alloc/freeing ~1 GB transients per
        # admission burst measured as periodic multi-second device-side
        # allocator stalls surfacing at the next chunk (first run of each
        # arrival pattern; see prewarm); reusing the donated prefill
        # buffers removes the churn entirely.
        a_pre, a_post = dynamic.gen_cache_sizes(
            cfg, seq_len_max, 0, bound_output_budget=gen_cfg.bound_kv_budget,
            all_have_image=False, bucket=gen_cfg.pad_multiple,
        )
        self.admit_pre_cap = min(a_pre, pre_cap)
        self.admit_post_cap = min(a_post, post_cap)
        self._admit_pool: Dict[int, object] = {}  # k -> TieredCache
        self.cache_dtype = jnp.dtype(gen_cfg.cache_dtype)

        cache = init_tiered_cache(
            cfg.text, cfg.sparse.sparse_layer, slots, pre_cap, post_cap,
            self.cache_dtype,
        )
        self.state = dynamic.GenState(
            cache=cache,
            next_pos=jnp.zeros((slots,), jnp.int32),
            last_logits=jnp.zeros((slots, cfg.text.vocab_size), jnp.float32),
        )
        if spec_k:
            # draft context: padded prompt grid + room for every emitted
            # token (+m for the final round's overshoot)
            self._ctx_width = seq_len_max
            self._ctx_cap = seq_len_max + self.max_new_cap + self._m
            self.ctx = jnp.zeros((slots, self._ctx_cap), jnp.int32)
            self.ctx_len = jnp.zeros((slots,), jnp.int32)
            # one verify round per plain-chunk token: worst case (all drafts
            # rejected) emits exactly `chunk` tokens per dispatch, best case
            # chunk*m — the host protocol just sees more token rows
            self._spec_rounds = chunk
            self._chunk_fn = self.gen._spec_chunk_fn(
                chunk, self._m, self._ctx_cap)
            self._k_hist = 1
        else:
            self._chunk_fn, self._k_hist = self.gen._decode_chunk_stop_fn(
                chunk, ((gen_cfg.eos_token_id,),), per_slot_sampling=True,
                pack_results=True,
            )
        # per-slot device vectors driven from the host between chunks
        self.active = jnp.zeros((slots,), bool)
        self.hist = jnp.full((slots, self._k_hist), -7, jnp.int32)
        self.n_emit = jnp.zeros((slots,), jnp.int32)
        self.limit = jnp.zeros((slots,), jnp.int32)
        self.temps = jnp.zeros((slots,), jnp.float32)
        self.top_ps = jnp.ones((slots,), jnp.float32)
        self.admitted_batch_sizes: set = set()  # admission ks this engine ran
        self._slot_req: List[Optional[int]] = [None] * slots
        self._inflight: List[tuple] = []  # dispatched, unprocessed chunks
        self.requests: Dict[int, Request] = {}
        self._queue: List[Request] = []
        self._ids = itertools.count()
        self._rng = jax.random.key(gen_cfg.seed)

    # -- admission -----------------------------------------------------------

    def _splice_fn(self, k: int):
        return _splice_fn_k(k)

    def submit(self, token_ids: np.ndarray,
               pixel_values: Optional[np.ndarray] = None,
               max_new_tokens: Optional[int] = None,
               temperature: Optional[float] = None,
               top_p: Optional[float] = None) -> int:
        """Queue a request; it enters the running batch at the next free
        slot. ``temperature``/``top_p`` default to the engine's
        GenerationConfig — sampled and greedy requests share the batch
        (per-slot sampling). Returns the request id."""
        max_new = int(max_new_tokens or self.gc.max_new_tokens)
        if max_new > self.max_new_cap:
            raise ValueError(f"max_new {max_new} > engine cap {self.max_new_cap}")
        if self.spec_k and temperature:
            raise ValueError("spec_k engine is greedy-only")
        if len(token_ids) > self.prompt_bucket:
            raise ValueError(
                f"prompt {len(token_ids)} > bucket {self.prompt_bucket}")
        req = Request(
            next(self._ids), np.asarray(token_ids), pixel_values, max_new,
            temperature=(self.gc.temperature if temperature is None
                         else float(temperature)),
            top_p=self.gc.top_p if top_p is None else float(top_p),
        )
        self.requests[req.id] = req
        self._queue.append(req)
        return req.id

    def _free_slots(self) -> List[int]:
        return [i for i, r in enumerate(self._slot_req) if r is None]

    def _admit_batch(self, slots: List[int], reqs: List[Request]) -> None:
        """Prefill ``reqs`` (all with or all without an image) as ONE
        batch-k program and splice each row into its slot. Batching the
        admission prefill is the engine's saturated-load win: k batch-1
        prefills were its main structural cost vs the window batcher."""
        k = len(reqs)
        self.admitted_batch_sizes.add(k)
        has_image = reqs[0].pixel_values is not None
        plan = plan_batch(
            [r.token_ids for r in reqs],
            self.cfg.num_image_tokens if has_image else 0,
            max_length=self.cfg.model_max_length,
            pad_to=self.prompt_bucket,
        )
        cache_k = self._admit_pool.pop(k, None)
        if cache_k is None:
            cache_k = init_tiered_cache(
                self.cfg.text, self.cfg.sparse.sparse_layer, k,
                self.admit_pre_cap, self.admit_post_cap, self.cache_dtype,
            )
        pixels = None
        if has_image:
            pixels = jnp.asarray(np.stack([
                r.pixel_values if r.pixel_values.ndim == 3
                else r.pixel_values[0] for r in reqs
            ]))
        state_k, _ = self.gen._prefill(
            self.gen.params, self.cfg,
            jnp.asarray(plan.token_ids), jnp.asarray(plan.is_image),
            jnp.asarray(plan.image_slot), jnp.asarray(plan.valid_len),
            jnp.asarray(plan.spans.image_start),
            jnp.asarray(plan.spans.last_instruct_start),
            jnp.asarray(plan.spans.last_instruct_end),
            jnp.asarray(plan.spans.has_image),
            pixels, cache_k,
            all_have_image=has_image, ring_mode=False,
        )
        common = (
            self.state, self.active, self.hist, self.n_emit, self.limit,
            self.temps, self.top_ps,
            state_k, jnp.asarray(slots, jnp.int32),
            jnp.asarray([r.max_new for r in reqs], jnp.int32),
            jnp.asarray([r.temperature for r in reqs], jnp.float32),
            jnp.asarray([r.top_p for r in reqs], jnp.float32),
        )
        if self.spec_k:
            (self.state, self.active, self.hist, self.n_emit, self.limit,
             self.temps, self.top_ps, self.ctx, self.ctx_len) = (
                _splice_fn_k_spec(k, plan.seq_len)(
                    *common, self.ctx, self.ctx_len,
                    jnp.asarray(plan.token_ids, jnp.int32),
                    jnp.asarray(plan.valid_len, jnp.int32),
                )
            )
        else:
            (self.state, self.active, self.hist, self.n_emit, self.limit,
             self.temps, self.top_ps) = self._splice_fn(k)(*common)
        # return the prefill buffers (aliased from cache_k by donation) to
        # the pool: the splice only reads them, so the next k-admission
        # reuses the same HBM instead of an alloc/free round-trip
        self._admit_pool[k] = state_k.cache
        for slot, req in zip(slots, reqs):
            self._slot_req[slot] = req.id

    def _fill_slots(self) -> None:
        free = self._free_slots()
        while free and self._queue:
            # group the queue head by has-image (one homogeneous prefill),
            # bucket to powers of two so compiled program count stays small
            has_img = self._queue[0].pixel_values is not None
            n = 0
            while (n < len(free) and n < len(self._queue)
                   and (self._queue[n].pixel_values is not None) == has_img):
                n += 1
            k = 1 << (n.bit_length() - 1)  # largest power of two <= n
            reqs = [self._queue.pop(0) for _ in range(k)]
            self._admit_batch(free[:k], reqs)
            free = free[k:]

    # -- the decode loop ------------------------------------------------------

    def _dispatch(self) -> None:
        """Dispatch one chunk on the current device state (async — JAX
        returns immediately; nothing is fetched here). The rng split and
        the fetch payload — tokens + emitted flags + end-of-chunk active
        flags as ONE int32 array (each np.asarray is its own device->host
        fetch at the full ~25 ms tunnel round-trip) — are both IN-GRAPH
        (``pack_results``): an eager split + concat here measured ~13 ms
        of host time per chunk through the tunnel."""
        if self.spec_k:
            (self.state, self.active, self.n_emit, self.ctx, self.ctx_len,
             packed) = self._chunk_fn(
                self.gen.params, self.state, self.active, self.n_emit,
                self.limit, self.ctx, self.ctx_len,
            )
            rows = self._spec_rounds * self._m
        else:
            (self.state, self.active, self.hist, self.n_emit,
             self._rng, packed) = self._chunk_fn(
                self.gen.params, self.state, self._rng, self.active,
                self.hist, self.n_emit, self.limit, self.temps, self.top_ps,
            )
            rows = self.chunk
        # snapshot slot ownership AS OF this dispatch: a slot re-admitted
        # later must not swallow this chunk's (frozen, non-emitted) rows
        self._inflight.append((packed, rows, list(self._slot_req)))

    def _process_oldest(self) -> Dict[int, List[int]]:
        packed, chunk_rows, slot_req = self._inflight.pop(0)
        packed_np = np.asarray(packed)  # the ONE host sync per chunk
        toks_np = packed_np[:chunk_rows]
        emitted_np = packed_np[chunk_rows : 2 * chunk_rows].astype(bool)
        active_np = packed_np[-1].astype(bool)
        fresh: Dict[int, List[int]] = {}
        freed: List[int] = []
        for slot, rid in enumerate(slot_req):
            if rid is None:
                continue
            # the caller may drop a retired request's record while a
            # later-dispatched chunk still snapshots its slot
            req = self.requests.get(rid)
            if req is None:
                continue
            new = [int(t) for t, e in
                   zip(toks_np[:, slot], emitted_np[:, slot]) if e]
            if new:
                req.output.extend(new)
                fresh[rid] = new
            if not active_np[slot] and not req.done:
                req.done = True
                # free the slot only if it still belongs to this request
                if self._slot_req[slot] == rid:
                    self._slot_req[slot] = None
                    freed.append(slot)
        if freed:
            # reset the freed slots' sampling params to greedy: a retired
            # top_p<1 request must not keep the [slots, vocab] top-p sort
            # branch live in every later chunk (its lax.cond fires on
            # jnp.any(top_ps < 1.0) — generate._sample_per_slot).
            # STATIC-shaped mask, never an [n_freed] index scatter: each
            # distinct freed-group size is its own tiny XLA program, and a
            # first-seen size mid-trace costs a ~4 s remote compile on the
            # TPU tunnel — measured as the trace-pattern-specific stalls
            # (every arrival pattern frees slots in its own group sizes;
            # an identical second trace was always clean).
            mask = np.zeros((self.slots,), bool)
            mask[freed] = True
            m = jnp.asarray(mask)
            self.temps = jnp.where(m, 0.0, self.temps)
            self.top_ps = jnp.where(m, 1.0, self.top_ps)
        return fresh

    def step(self) -> Dict[int, List[int]]:
        """Admit queued requests into free slots, dispatch ONE decode
        chunk, and return the fresh tokens of the oldest COMPLETED chunk
        (one chunk behind the dispatch — the next chunk computes on
        device while this one's tokens cross the host link, hiding the
        ~29 ms tunnel round-trip exactly like ``Generator.generate``'s
        pipelined loop). Finished requests are retired as their final
        chunk is processed."""
        self._fill_slots()
        live = any(r is not None for r in self._slot_req)
        if live:
            self._dispatch()
        if not self._inflight:
            return {}
        # keep one chunk in flight while live; drain fully once idle
        if live and len(self._inflight) < 2:
            return {}
        return self._process_oldest()

    def run_until_drained(self, max_steps: int = 100_000) -> None:
        for _ in range(max_steps):
            self.step()
            if (not self._queue and not self._inflight
                    and all(r is None for r in self._slot_req)):
                return
        raise RuntimeError("engine did not drain")

    def prewarm(self, token_ids: np.ndarray,
                pixel_values: Optional[np.ndarray] = None) -> None:
        """Drive a representative load through the engine so first-request
        latency is steady-state: (1) the admission-k ladder (every
        power-of-two splice/prefill program compiles), then (2) one
        saturated pass — 2x slots requests upfront with mixed lengths, so
        full-occupancy chunks interleave with mid-flight admissions the
        way production traffic does.

        The second pass is load-bearing on the TPU tunnel, not ceremony:
        with the ladder alone, the first real trace still pays five
        ~4.2 s first-execution stalls, each surfacing at the first chunk
        AFTER an admission pattern's first realistic use (admission host
        calls stay <0.2 s — the cost lands device-side on the next
        dependent chunk). One representative pass eliminates them
        entirely (same process, same engine class: 26.1 s -> 5.2 s
        makespan on the 7B-int8 24-slot upfront trace; every chunk
        <=0.24 s). Serving workers should call this once before
        accepting traffic, exactly like the reference's CUDA runtimes
        warm their captured graphs.
        """
        first_id = next(self._ids)
        chunkier = min(2 * self.chunk, self.max_new_cap)
        k = 1
        while k <= self.slots:
            for _ in range(k):
                self.submit(token_ids, pixel_values,
                            max_new_tokens=min(4, self.max_new_cap))
            self.run_until_drained()
            k *= 2
        for i in range(2 * self.slots):
            self.submit(token_ids, pixel_values,
                        max_new_tokens=self.chunk if i % 2 else chunkier)
        self.run_until_drained()
        for rid in range(first_id, next(self._ids)):
            self.requests.pop(rid, None)
