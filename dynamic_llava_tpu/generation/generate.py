"""Autoregressive generation on top of the static-cache decoder.

Replaces the reference's HF ``GenerationMixin`` integration
(/root/reference/llava/model/language_model/dynamic_llava_llama.py:117-169,
dynamic_modeling_llama.py:2815-2895): one jitted prefill + one jitted decode
step, both compiled once per (batch, padded-length, cache-size) bucket. The
decode step donates the cache so XLA updates it in place.

Sampling: greedy and temperature/top-p, matching the eval harnesses'
``--temperature 0`` determinism requirement.
"""

from __future__ import annotations

from typing import List, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import LlavaConfig
from ..multimodal.fusion import FusionPlan, plan_batch
from ..models import dynamic


class GenerationConfig(NamedTuple):
    max_new_tokens: int = 128
    temperature: float = 0.0
    top_p: float = 1.0
    eos_token_id: int = 2
    # KV storage: "bfloat16" (exact), "float8_e4m3fn" (half the KV-read
    # bandwidth, pure cast), or "int8" (same bandwidth as fp8 + 3 extra
    # mantissa bits via per-head-vector dynamic scales — ops/kv_cache.py)
    cache_dtype: str = "bfloat16"
    # True: allocate the sparse KV tier at keep_rate * max_new and force-drop
    # beyond it (throughput/memory contract; generations that run to the full
    # max_new lose their tail's KV wholesale). False: worst-case allocation,
    # the predictor alone decides (quality-first — use for accuracy evals).
    bound_kv_budget: bool = True
    # Tokens decoded per device round-trip: the decode loop runs on device as
    # a lax.scan of this many steps, and the host only syncs between chunks
    # (EOS / stopping / streaming). 1 reproduces the per-token loop.
    decode_chunk: int = 32
    # Prompt lengths and cache capacities are rounded up to this multiple so
    # eval sweeps over thousands of distinct prompt lengths share a handful
    # of compiled programs (remote TPU compiles take minutes each).
    pad_multiple: int = 64
    # Default PRNG seed for temperature>0 sampling; generate(seed=...) overrides.
    seed: int = 0
    # KV-cache policy once a tier's decode budget is full. "drop": further
    # tokens attend this step but are never persisted (the
    # reference-faithful capacity contract). "ring": every token persists
    # by evicting the OLDEST decode-region entry of the tier — a sliding
    # recency window at a fixed TOTAL allocation (both tiers wrap
    # independently; prefill regions are protected), for generations far
    # longer than the KV budget (beyond parity: the reference's cache just
    # grows). ChatSession requires "drop" (multi-round chunk extension
    # does not wrap); incompatible with sliding_window models (a window IS
    # already a recency ring).
    kv_overflow: str = "drop"
    # Caps each tier's decode-region allocation at this many tokens (the
    # ring window size). None = the standard headroom derived from
    # max_new_tokens; see models.dynamic.gen_cache_sizes.
    kv_window: Optional[int] = None


def _sample(rng, logits: jax.Array, temperature: float, top_p: float) -> jax.Array:
    if temperature <= 0.0:
        return jnp.argmax(logits, axis=-1)
    logits = logits / temperature
    if top_p < 1.0:
        sorted_logits = jnp.sort(logits, axis=-1)[:, ::-1]
        probs = jax.nn.softmax(sorted_logits, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        cutoff_idx = jnp.sum(cum < top_p, axis=-1, keepdims=True)
        cutoff = jnp.take_along_axis(sorted_logits, cutoff_idx, axis=-1)
        logits = jnp.where(logits < cutoff, -jnp.inf, logits)
    return jax.random.categorical(rng, logits, axis=-1)


def _sample_per_slot(rng, logits: jax.Array, temps: jax.Array,
                     top_ps: jax.Array) -> jax.Array:
    """Per-ROW temperature/top-p (the continuous engine's slots carry
    per-request sampling params). Rows with temp<=0 take the argmax; the
    [B, V] top-p sort runs under a ``lax.cond`` so all-greedy /
    all-top_p=1 chunks never pay for it."""
    greedy = jnp.argmax(logits, axis=-1)
    lg = logits.astype(jnp.float32) / jnp.maximum(temps, 1e-6)[:, None]

    def mask(lg):
        sorted_logits = jnp.sort(lg, axis=-1)[:, ::-1]
        probs = jax.nn.softmax(sorted_logits, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        cutoff_idx = jnp.sum(cum < top_ps[:, None], axis=-1, keepdims=True)
        cutoff = jnp.take_along_axis(sorted_logits, cutoff_idx, axis=-1)
        return jnp.where(lg < cutoff, -jnp.inf, lg)

    lg = jax.lax.cond(jnp.any(top_ps < 1.0), mask, lambda x: x, lg)
    samp = jax.random.categorical(rng, lg, axis=-1)
    return jnp.where(temps > 0.0, samp, greedy)


# Module-level jit wrappers and trace caches, shared by every Generator
# (and so every ContinuousEngine / worker): JAX's trace cache lives on the
# WRAPPER object, so per-instance jax.jit wrappers retrace (and on a 1-core
# host re-lower for seconds) every time a harness builds a fresh
# Generator — measured as ~40% of the continuous-batching bench's engine
# makespan. cfg/gen_cfg are hashable (frozen dataclass / NamedTuple) and
# every chunk closure is keyed by them below.
#
# Kernel-dispatch env knobs are read at TRACE time, so a process-lifetime
# trace cache must key on them too: probe harnesses that toggle e.g.
# DYNAMIC_LLAVA_FLASH between paired runs would otherwise silently reuse a
# trace compiled under the old setting (wrong dispatch, perf not numerics —
# the kernels are oracle-equivalent).
_ENV_KNOBS = (
    "DYNAMIC_LLAVA_FLASH",
    "DYNAMIC_LLAVA_Q4_KERNEL",
    "DYNAMIC_LLAVA_Q8_KERNEL",
    "DYNAMIC_LLAVA_Q4_MLP",
    "DYNAMIC_LLAVA_Q4_UNPACK",
    "DYNAMIC_LLAVA_Q4_WINDOW_MB",
)


def _env_key() -> tuple:
    import os

    return tuple(os.environ.get(k) for k in _ENV_KNOBS)


_JIT_CACHE = {}  # ("prefill"|"decode", env_key) -> jit wrapper


def _prefill_jit():
    key = ("prefill", _env_key())
    if key not in _JIT_CACHE:
        _JIT_CACHE[key] = jax.jit(
            dynamic.prefill, static_argnums=(1,),
            static_argnames=("all_have_image", "ring_mode"),
            donate_argnums=(11,),
        )
    return _JIT_CACHE[key]


def _decode_jit():
    key = ("decode", _env_key())
    if key not in _JIT_CACHE:
        _JIT_CACHE[key] = jax.jit(
            dynamic.decode_step, static_argnums=(1,),
            static_argnames=("kv_overflow",), donate_argnums=(3,),
        )
    return _JIT_CACHE[key]


_CHUNK_CACHE = {}  # (cfg, gen_cfg, env_key, per-fn key) -> jitted program


class Generator:
    """Compiled-once generation harness for a fixed config.

    ``prefill`` and the decode loop are jitted; decode runs ON DEVICE as a
    ``lax.scan`` of ``decode_chunk`` steps (sampling included), so the host
    syncs once per chunk instead of once per token — the per-token host
    round-trip over the TPU tunnel would otherwise dominate tok/s. EOS,
    stopping criteria, and streaming are resolved at chunk granularity; the
    returned token lists are cut exactly at the stop point.
    """

    def __init__(self, params, cfg: LlavaConfig, gen_cfg: GenerationConfig = GenerationConfig()):
        if gen_cfg.kv_overflow not in ("drop", "ring"):
            # every downstream check is '== "ring"': an unknown value would
            # silently run drop-mode force-drops at a kv_window-sized cache
            raise ValueError(
                f"kv_overflow must be 'drop' or 'ring', got "
                f"{gen_cfg.kv_overflow!r}"
            )
        self.params = params
        self.cfg = cfg
        self.gen_cfg = gen_cfg
        # params are explicit jit arguments (a closure would bake the full
        # weight pytree into the HLO as constants); cfg is static. The
        # wrappers are module-level so traces survive instance churn; the
        # env key isolates traces compiled under different kernel knobs.
        self._prefill = _prefill_jit()
        self._decode = _decode_jit()
        self._decode_chunks = _CHUNK_CACHE
        self._cache_ns = (cfg, gen_cfg, _env_key())  # trace-cache namespace

    def _decode_chunk_fn(self, n_steps: int):
        """Jitted: sample+decode n_steps tokens on device, return the tokens.
        The state (cache) is donated so XLA updates it in place."""
        key = (*self._cache_ns, n_steps)
        if key in self._decode_chunks:
            return self._decode_chunks[key]
        cfg, gc = self.cfg, self.gen_cfg

        def chunk(params, state: dynamic.GenState, rng):
            def body(carry, krng):
                state = carry
                tok = _sample(krng, state.last_logits, gc.temperature, gc.top_p)
                state = dynamic.decode_step(params, cfg, tok, state,
                                            kv_overflow=gc.kv_overflow)
                return state, tok

            state, toks = jax.lax.scan(
                body, state, jax.random.split(rng, n_steps)
            )
            return state, toks  # toks: [n_steps, B]

        fn = jax.jit(chunk, donate_argnums=(1,))
        self._decode_chunks[key] = fn
        return fn

    def _decode_chunk_stop_fn(self, n_steps: int, stop_seqs: tuple,
                              per_slot_sampling: bool = False,
                              pack_results: bool = False):
        """Jitted chunked decode with IN-GRAPH stopping: ``stop_seqs`` is a
        static tuple of stop token-id tuples (EOS is just a length-1 stop).
        A rolling last-K-token history rides the scan carry; when a sample's
        history suffix matches any stop sequence — or its emitted count
        reaches the dynamic ``limit`` — the sample goes inactive and every
        later step is a frozen no-op (``decode_step(active=...)``), so the
        LIVE CACHE holds exactly the emitted tokens: the chunk loop can
        overshoot a stop without corrupting multi-round chat state.

        Returns (state, active, n_emit, toks [n_steps, B],
        emitted [n_steps, B] — True where the token was produced while the
        sample was still active; the stop-matching token itself is marked
        emitted, mirroring the reference's streamed-then-truncated protocol
        (serve/model_worker.py:162-264)).

        ``per_slot_sampling``: the chunk takes two extra [B] vectors
        (``temps``, ``top_ps``) and samples each row independently
        (``_sample_per_slot``) — rows at temp 0 stay exactly greedy. This
        is the continuous engine's mode: slots carry per-request sampling
        params that change as requests come and go, without recompiling.

        ``pack_results``: split the rng successor and pack the per-chunk
        host-fetch payload IN-GRAPH — the chunk additionally returns
        (next_rng, packed [2*n_steps+1, B] int32: tokens, emitted flags,
        end-of-chunk active flags). Without it a dispatch loop pays one
        eager device op per chunk for the split and one for the concat;
        through the TPU tunnel those eager dispatches measured ~13 ms of
        host time per chunk (the continuous engine's mode)."""
        key = (*self._cache_ns, n_steps, stop_seqs, per_slot_sampling,
               pack_results)
        if key in self._decode_chunks:
            return self._decode_chunks[key]
        cfg, gc = self.cfg, self.gen_cfg
        k_hist = max((len(s) for s in stop_seqs), default=1)
        # pad stop sequences to the history length; -1 never matches a token
        stop_mat = np.full((max(len(stop_seqs), 1), k_hist), -1, np.int32)
        for i, seq in enumerate(stop_seqs):
            stop_mat[i, k_hist - len(seq):] = seq
        stop_valid = stop_mat >= 0

        def chunk(params, state: dynamic.GenState, rng, active, hist, n_emit,
                  limit, temps=None, top_ps=None):
            # limit is dynamic: one program serves all max_new
            smat = jnp.asarray(stop_mat)
            svalid = jnp.asarray(stop_valid)

            def body(carry, krng):
                state, active, hist, n_emit = carry
                if per_slot_sampling:
                    tok = _sample_per_slot(
                        krng, state.last_logits, temps, top_ps
                    )
                else:
                    tok = _sample(
                        krng, state.last_logits, gc.temperature, gc.top_p
                    )
                state2 = dynamic.decode_step(params, cfg, tok, state,
                                             active=active,
                                             kv_overflow=gc.kv_overflow)
                hist2 = jnp.concatenate(
                    [hist[:, 1:], tok[:, None].astype(jnp.int32)], axis=1
                )
                # [B, n_stop, K]: positions either match or are padding
                m = (hist2[:, None, :] == smat[None]) | ~svalid[None]
                stop_hit = jnp.any(jnp.all(m, axis=-1), axis=-1)  # [B]
                n_emit2 = n_emit + active.astype(jnp.int32)
                active2 = active & ~stop_hit & (n_emit2 < limit)
                # frozen samples keep their old history (their tok is garbage)
                hist2 = jnp.where(active[:, None], hist2, hist)
                return (state2, active2, hist2, n_emit2), (tok, active)

            if pack_results:  # reserve one key as the chunk's rng successor
                krngs = jax.random.split(rng, n_steps + 1)
                next_rng, step_keys = krngs[0], krngs[1:]
            else:
                next_rng, step_keys = None, jax.random.split(rng, n_steps)
            (state, active, hist, n_emit), (toks, emitted) = jax.lax.scan(
                body, (state, active, hist, n_emit), step_keys,
            )
            if pack_results:
                packed = jnp.concatenate(
                    [
                        toks.astype(jnp.int32),
                        emitted.astype(jnp.int32),
                        active.astype(jnp.int32)[None],
                    ],
                    axis=0,
                )
                return state, active, hist, n_emit, next_rng, packed
            return state, active, hist, n_emit, toks, emitted

        fn = jax.jit(chunk, donate_argnums=(1,))
        self._decode_chunks[key] = (fn, k_hist)
        return fn, k_hist

    def _spec_chunk_fn(self, rounds: int, m: int, ctx_cap: int,
                       max_ngram: int = 3, min_ngram: int = 1):
        """Jitted SPECULATIVE decode chunk for batched serving (the
        continuous engine's ``spec_k`` mode): ``rounds`` verify rounds of
        ``m`` candidates each — in-graph prompt-lookup drafting + the fused
        verify pass (``dynamic.decode_speculative_step``) with per-slot
        active masks, so finished/frozen slots ride along as no-ops exactly
        like the plain chunk program. Greedy-only, EOS-stop-only.

        The verify pass is ONE weight read for m candidates: at weight-bound
        batch sizes every accepted draft is nearly-free throughput, which is
        what makes spec x batching compose (VERDICT r4 item 3).

        Carries (state, active, n_emit, ctx, ctx_len); ``ctx`` is the
        [B, ctx_cap] prompt+emitted token grid the drafts match against
        (spliced at admission, extended in-graph on emit). Returns the
        plain chunk's packed host-fetch payload with rounds*m token rows:
        [tokens; emitted flags; end-of-chunk active] as one int32 array."""
        key = (*self._cache_ns, "spec_chunk", rounds, m, ctx_cap, max_ngram,
               min_ngram)
        if key in self._decode_chunks:
            return self._decode_chunks[key]
        cfg, gc = self.cfg, self.gen_cfg
        eos = gc.eos_token_id
        from .speculative import device_prompt_lookup

        def chunk(params, state, active, n_emit, limit, ctx, ctx_len):
            b = ctx.shape[0]
            bidx = jnp.arange(b, dtype=jnp.int32)[:, None]
            jar = jnp.arange(m, dtype=jnp.int32)[None, :]

            def body(carry, _):
                state, active, n_emit, ctx, ctx_len = carry
                t_next = jnp.argmax(state.last_logits, -1).astype(jnp.int32)
                if m > 1:
                    # draft from the context INCLUDING the committed token
                    # (see speculative._device_loop_fn: drafting without it
                    # misaligns proposals by one and collapses acceptance)
                    ctx_d = ctx.at[
                        jnp.arange(b), jnp.minimum(ctx_len, ctx_cap - 1)
                    ].set(t_next)
                    drafts = device_prompt_lookup(
                        ctx_d, ctx_len + 1, m - 1, max_ngram, min_ngram
                    )
                    tokens = jnp.concatenate([t_next[:, None], drafts], 1)
                else:
                    tokens = t_next[:, None]
                state2, n_acc, _ = dynamic.decode_speculative_step(
                    params, cfg, tokens, state, eos, active=active
                )
                n_take = jnp.where(
                    active, jnp.minimum(n_acc, limit - n_emit), 0
                )
                emit = jar < n_take[:, None]  # [B, M]
                # non-emitted lanes scatter out of bounds and are dropped
                cpos = jnp.where(emit, ctx_len[:, None] + jar, ctx_cap)
                ctx2 = ctx.at[bidx, cpos].set(tokens, mode="drop")
                n_emit2 = n_emit + n_take
                eos_hit = jnp.any((tokens == eos) & emit, axis=1)
                active2 = active & ~eos_hit & (n_emit2 < limit)
                return ((state2, active2, n_emit2, ctx2, ctx_len + n_take),
                        (tokens, emit))

            (state, active, n_emit, ctx, ctx_len), (toks, emit) = (
                jax.lax.scan(body, (state, active, n_emit, ctx, ctx_len),
                             None, length=rounds)
            )
            # [R, B, M] -> the plain chunk's token-major grid [R*M, B]
            toks = toks.transpose(0, 2, 1).reshape(rounds * m, b)
            emit = emit.transpose(0, 2, 1).reshape(rounds * m, b)
            packed = jnp.concatenate(
                [toks.astype(jnp.int32), emit.astype(jnp.int32),
                 active.astype(jnp.int32)[None]], axis=0,
            )
            return state, active, n_emit, ctx, ctx_len, packed

        # donate the state AND the ctx grid: both are carried chunk-to-chunk
        fn = jax.jit(chunk, donate_argnums=(1, 5))
        self._decode_chunks[key] = fn
        return fn

    def _spec_fn(self, m: int):
        """Jitted speculative verify round for M candidate tokens
        (models.dynamic.decode_speculative_step); cached per M."""
        key = (*self._cache_ns, "spec", m)
        if key in self._decode_chunks:
            return self._decode_chunks[key]
        cfg, gc = self.cfg, self.gen_cfg

        def spec(params, state, tokens, active):
            return dynamic.decode_speculative_step(
                params, cfg, tokens, state, gc.eos_token_id, active=active
            )

        fn = jax.jit(spec, donate_argnums=(1,))
        self._decode_chunks[key] = fn
        return fn

    def generate_speculative(self, input_ids_list, pixel_values=None,
                             draft="prompt_lookup", draft_k: int = 4,
                             stats: Optional[dict] = None,
                             on_tokens=None,
                             max_new_tokens: Optional[int] = None):
        """Greedy generation via speculative verify rounds — identical
        tokens to ``generate``, fewer decode passes (see
        generation/speculative.py)."""
        from .speculative import generate_speculative

        return generate_speculative(
            self, input_ids_list, pixel_values, draft=draft,
            draft_k=draft_k, stats=stats, on_tokens=on_tokens,
            max_new_tokens=max_new_tokens,
        )

    def generate_speculative_device(self, input_ids_list, pixel_values=None,
                                    draft_k: int = 4,
                                    stats: Optional[dict] = None):
        """Speculative decode as ONE device program (in-graph prompt-lookup
        drafting, lax.while_loop rounds, a single host fetch) — the tunnel-
        friendly variant (see generation/speculative.py)."""
        from .speculative import generate_speculative_device

        return generate_speculative_device(
            self, input_ids_list, pixel_values, draft_k=draft_k, stats=stats,
        )

    def prefill_from_plan(self, plan: FusionPlan, pixel_values, max_new_tokens: int):
        cache_dtype = jnp.dtype(self.gen_cfg.cache_dtype)
        all_have_image = pixel_values is not None and bool(
            np.asarray(plan.spans.has_image).all()
        )
        cache = dynamic.make_gen_cache(
            self.cfg, plan.batch, plan.seq_len, max_new_tokens, cache_dtype,
            bound_output_budget=self.gen_cfg.bound_kv_budget,
            all_have_image=all_have_image,
            bucket=self.gen_cfg.pad_multiple,
            decode_window=self.gen_cfg.kv_window,
            ring=self.gen_cfg.kv_overflow == "ring",
        )
        state, info = self._prefill(
            self.params, self.cfg,
            jnp.asarray(plan.token_ids),
            jnp.asarray(plan.is_image),
            jnp.asarray(plan.image_slot),
            jnp.asarray(plan.valid_len),
            jnp.asarray(plan.spans.image_start),
            jnp.asarray(plan.spans.last_instruct_start),
            jnp.asarray(plan.spans.last_instruct_end),
            jnp.asarray(plan.spans.has_image),
            None if pixel_values is None else jnp.asarray(pixel_values),
            cache,
            all_have_image=all_have_image,
            ring_mode=self.gen_cfg.kv_overflow == "ring",
        )
        return state, info

    def generate(
        self,
        input_ids_list: List[np.ndarray],
        pixel_values: Optional[np.ndarray] = None,  # [B, H, W, 3] normalized
        stopping_criteria=None,
        pad_to: Optional[int] = None,
        seed: Optional[int] = None,
        on_chunk=None,  # callback(sample_idx, new_token_ids) for streaming
    ) -> List[List[int]]:
        """Returns generated token ids (without the prompt) per sample."""
        gc = self.gen_cfg
        plan = plan_batch(
            input_ids_list,
            self.cfg.num_image_tokens if pixel_values is not None else 0,
            max_length=self.cfg.model_max_length,
            pad_to=pad_to,
            pad_multiple=None if pad_to is not None else gc.pad_multiple,
        )
        chunk = max(1, min(gc.decode_chunk, gc.max_new_tokens))
        # round the decode budget up to whole chunks so the cache has room
        # for the overshoot of the final chunk
        n_chunks = -(-gc.max_new_tokens // chunk)
        state, _ = self.prefill_from_plan(plan, pixel_values, n_chunks * chunk)

        b = plan.batch
        rng = jax.random.key(gc.seed if seed is None else seed)
        done = np.zeros(b, bool)
        out: List[List[int]] = [[] for _ in range(b)]
        prompts = [
            list(np.asarray(plan.token_ids[i][: plan.valid_len[i]]))
            for i in range(b)
        ] if stopping_criteria is not None else None
        decode_chunk = self._decode_chunk_fn(chunk)
        # pipelined chunks: chunk k+1 is DISPATCHED before chunk k's tokens
        # are fetched, so the host round-trip (~29 ms through the tunnel)
        # overlaps device compute instead of stalling it. On early exit the
        # speculative chunk's work is discarded with the state.
        rng, krng = jax.random.split(rng)
        state, toks = decode_chunk(self.params, state, krng)
        for ci in range(n_chunks):
            if ci + 1 < n_chunks:
                rng, krng = jax.random.split(rng)
                next_state, next_toks = decode_chunk(self.params, state, krng)
            toks_np = np.asarray(toks)  # [chunk, B] — ONE host sync per chunk
            for i in range(b):
                if done[i]:
                    continue
                fresh: List[int] = []
                for j in range(toks_np.shape[0]):
                    if len(out[i]) >= gc.max_new_tokens:
                        done[i] = True
                        break
                    t = int(toks_np[j, i])
                    out[i].append(t)
                    fresh.append(t)
                    if t == gc.eos_token_id:
                        done[i] = True
                        break
                    if stopping_criteria is not None and stopping_criteria(
                        prompts[i] + out[i]
                    ):
                        done[i] = True
                        break
                if on_chunk is not None and fresh:
                    on_chunk(i, fresh)
            if done.all():
                break
            if ci + 1 < n_chunks:
                state, toks = next_state, next_toks
        return out

    def generate_anyres(
        self,
        input_ids_list: List[np.ndarray],
        images,  # list of PIL images
        grid_pinpoints,
        image_processor,
        merge_type: str = "spatial_unpad",
    ) -> List[List[int]]:
        """High-resolution (anyres) generation: tile + encode host-side,
        splice variable per-image token counts via the fusion planner, and
        run the standard prefill/decode on pre-encoded features. Dense path
        only (reference parity: anyres has no sparsification recipe)."""
        from ..mm_utils import process_anyres_image
        from ..multimodal.anyres import encode_images_anyres

        gc = self.gen_cfg
        tiles_list = [
            process_anyres_image(im, image_processor, grid_pinpoints)
            for im in images
        ]
        sizes = [im.size for im in images]
        feats = encode_images_anyres(
            self.params, self.cfg, tiles_list, sizes, grid_pinpoints, merge_type
        )
        counts = [[f.shape[0]] for f in feats]
        n_max = max(f.shape[0] for f in feats)
        feat_pad = np.zeros((len(feats), n_max, feats[0].shape[1]), np.float32)
        for i, f in enumerate(feats):
            feat_pad[i, : f.shape[0]] = f

        plan = plan_batch(
            input_ids_list, 0, tokens_per_image_list=counts,
            max_length=self.cfg.model_max_length,
        )
        chunk = max(1, min(gc.decode_chunk, gc.max_new_tokens))
        n_chunks = -(-gc.max_new_tokens // chunk)
        cache = dynamic.make_gen_cache(
            self.cfg, plan.batch, plan.seq_len, n_chunks * chunk,
            jnp.dtype(gc.cache_dtype), all_have_image=False,
            decode_window=gc.kv_window,
            ring=gc.kv_overflow == "ring",
        )
        state, _ = self._prefill(
            self.params, self.cfg,
            jnp.asarray(plan.token_ids), jnp.asarray(plan.is_image),
            jnp.asarray(plan.image_slot), jnp.asarray(plan.valid_len),
            jnp.asarray(plan.spans.image_start),
            jnp.asarray(plan.spans.last_instruct_start),
            jnp.asarray(plan.spans.last_instruct_end),
            jnp.asarray(plan.spans.has_image),
            None, cache, jnp.asarray(feat_pad),
            ring_mode=gc.kv_overflow == "ring",
        )
        b = plan.batch
        out: List[List[int]] = [[] for _ in range(b)]
        done = np.zeros(b, bool)
        rng = jax.random.key(gc.seed)
        decode_chunk = self._decode_chunk_fn(chunk)
        # pipelined like ``generate``: chunk k+1 is dispatched before chunk
        # k's tokens are fetched, hiding the host round-trip
        rng, krng = jax.random.split(rng)
        state, toks = decode_chunk(self.params, state, krng)
        for ci in range(n_chunks):
            if ci + 1 < n_chunks:
                rng, krng = jax.random.split(rng)
                next_state, next_toks = decode_chunk(self.params, state, krng)
            toks_np = np.asarray(toks)
            for i in range(b):
                if done[i]:
                    continue
                for j in range(toks_np.shape[0]):
                    if len(out[i]) >= gc.max_new_tokens:
                        done[i] = True
                        break
                    t = int(toks_np[j, i])
                    out[i].append(t)
                    if t == gc.eos_token_id:
                        done[i] = True
                        break
            if done.all():
                break
            if ci + 1 < n_chunks:
                state, toks = next_state, next_toks
        return out

    def cache_lengths(self, state: dynamic.GenState) -> np.ndarray:
        """Per-layer persisted KV lengths — the ``true_cache_length``
        observability the reference's LVIS probes log
        (model_lvis_for_ppl.py:166-181)."""
        return np.concatenate(
            [np.asarray(state.cache.pre.length), np.asarray(state.cache.post.length)],
            axis=0,
        )


class ChatSession:
    """Multi-round chat on ONE live KV cache.

    Round 1 runs the multimodal prefill; later rounds feed only the new
    instruct chunk through the continuation path (E5) instead of
    re-prefilling the whole conversation — the reference's multi-round
    cache handling (dynamic_modeling_llama.py:2506-2521), batched and
    chunked.

    Decode rides the Generator's PIPELINED chunked on-device loop with
    in-graph stopping (``_decode_chunk_stop_fn``): EOS and keyword stops
    freeze the sample inside the scan, so the live cache holds exactly the
    emitted tokens even though the host only syncs once per chunk — chat
    tok/s matches the serving workers instead of paying the ~29 ms tunnel
    round-trip per token. Arbitrary host-callable stopping criteria (no
    ``keyword_ids``) fall back to the exact per-token path.
    """

    def __init__(self, generator: Generator, max_new_tokens_total: int = 2048):
        if generator.gen_cfg.kv_overflow != "drop":
            # multi-round chunk extension (prefill_continue) force-drops at
            # capacity instead of wrapping; a wrapped ring cache would
            # silently lose instruct-chunk KV — refuse rather than degrade
            raise ValueError(
                "ChatSession requires kv_overflow='drop'; the ring mode is "
                "a single-conversation long-generation contract"
            )
        self.gen = generator
        self.budget = max_new_tokens_total
        self.state: Optional[dynamic.GenState] = None
        # replay log for the text-fallback safety net (see ask): each entry
        # is ("prefill", ids, pixels), ("chunk", ids) or ("out", fed_tokens)
        self._hist: List[tuple] = []
        self._continue = jax.jit(
            dynamic.prefill_continue, static_argnums=(1,)
        )

    def _start_round(self, input_ids, pixel_values):
        if self.state is None:
            self._hist.append(
                ("prefill", np.asarray(input_ids, np.int64).copy(),
                 None if pixel_values is None else np.asarray(pixel_values))
            )
            plan = plan_batch(
                [input_ids],
                self.gen.cfg.num_image_tokens if pixel_values is not None else 0,
                max_length=self.gen.cfg.model_max_length,
            )
            self.state, _ = self.gen.prefill_from_plan(
                plan, pixel_values, self.budget
            )
        else:
            ids = np.asarray(input_ids, np.int64)
            # the pre tier persists every chunk token; overflow would trip
            # the in-graph capacity clamp and silently shorten history
            pre_room = self.state.cache.pre.max_len - 1 - int(
                np.asarray(self.state.cache.pre.length).max()
            )
            if len(ids) > pre_room:
                raise ValueError(
                    f"chunk of {len(ids)} tokens exceeds remaining cache "
                    f"capacity {pre_room}; raise max_new_tokens_total"
                )
            self._hist.append(("chunk", ids.copy()))
            self.state = self._continue(
                self.gen.params, self.gen.cfg, jnp.asarray(ids[None]), self.state
            )

    def _replay_state(self) -> dynamic.GenState:
        """Rebuild the live state exactly from the replay log: re-prefill
        round 1, re-run each continuation chunk, and feed every recorded
        generated token through the per-token decode (reproducing each
        step's keep/drop decision — decisions depend on hidden states, not
        sampling, so replay is bit-exact). Only used by the text-fallback
        safety net in ``ask``, i.e. when a stop string matched through an
        alternate tokenization the in-graph matcher cannot see."""
        state: Optional[dynamic.GenState] = None
        for entry in self._hist:
            kind = entry[0]
            if kind == "prefill":
                _, ids, pixels = entry
                plan = plan_batch(
                    [ids],
                    self.gen.cfg.num_image_tokens if pixels is not None else 0,
                    max_length=self.gen.cfg.model_max_length,
                )
                state, _ = self.gen.prefill_from_plan(plan, pixels, self.budget)
            elif kind == "chunk":
                state = self._continue(
                    self.gen.params, self.gen.cfg,
                    jnp.asarray(entry[1][None]), state,
                )
            else:  # "out": tokens that were fed through decode
                for tok in entry[1]:
                    state = self.gen._decode(
                        self.gen.params, self.gen.cfg,
                        jnp.asarray([int(tok)]), state,
                    )
        return state

    def ask(
        self,
        input_ids: np.ndarray,  # round 1: full prompt; later: the new chunk only
        pixel_values: Optional[np.ndarray] = None,
        stopping_criteria=None,
        max_new_tokens: Optional[int] = None,
        stop_sequences: Optional[List[List[int]]] = None,
        on_chunk=None,  # callback(new_token_ids) for streaming
    ) -> List[int]:
        gc = self.gen.gen_cfg
        max_new = gc.max_new_tokens if max_new_tokens is None else max_new_tokens
        self._start_round(input_ids, pixel_values)
        if max_new <= 0:
            # the round's chunk is processed (state advanced) but nothing is
            # sampled — without this guard the in-graph loop's post-step
            # limit check would emit and persist one token
            self._hist.append(("out", []))
            return []

        stop_seqs = [(gc.eos_token_id,)]
        crit = stopping_criteria
        text_crit = None
        if crit is not None and hasattr(crit, "keyword_ids"):
            # KeywordsStoppingCriteria: its token sequences stop in-graph
            stop_seqs += [tuple(int(t) for t in kid) for kid in crit.keyword_ids]
            # ... but the criteria ALSO has a decoded-text fallback for stop
            # strings that tokenize differently in context (mm_utils.py:286);
            # keep it as a per-chunk host-side safety net below
            text_crit = crit if hasattr(crit, "tokenizer") else None
            crit = None
        if stop_sequences:
            stop_seqs += [tuple(int(t) for t in s) for s in stop_sequences]
        if crit is not None:
            return self._ask_tokenwise(crit, max_new)

        chunk = max(1, min(gc.decode_chunk, max_new))
        fn, k_hist = self.gen._decode_chunk_stop_fn(
            chunk, tuple(dict.fromkeys(stop_seqs))
        )
        params = self.gen.params
        active = jnp.ones((1,), bool)
        hist = jnp.full((1, k_hist), -1, jnp.int32)
        n_emit = jnp.zeros((1,), jnp.int32)
        limit = jnp.int32(max_new)
        rng = jax.random.key(gc.seed)

        out: List[int] = []
        fired_at = None  # earliest text-fallback stop index (token count)
        rng, krng = jax.random.split(rng)
        cur = fn(params, self.state, krng, active, hist, n_emit, limit)
        while True:
            state_c, active_c, hist_c, n_emit_c, toks, emitted = cur
            # speculative dispatch BEFORE fetching this chunk's tokens: the
            # host round-trip overlaps device compute; if the chunk turned
            # out to be final, the speculative chunk runs fully frozen and
            # its returned state is identical — use it and stop
            rng, krng = jax.random.split(rng)
            nxt = fn(params, state_c, krng, active_c, hist_c, n_emit_c, limit)
            toks_np = np.asarray(toks)[:, 0]
            em_np = np.asarray(emitted)[:, 0]
            fresh = [int(t) for t, e in zip(toks_np, em_np) if e]
            out.extend(fresh)
            if on_chunk is not None and fresh:
                on_chunk(fresh)
            if text_crit is not None and fresh and fired_at is None:
                for j in range(len(out) - len(fresh) + 1, len(out) + 1):
                    if text_crit(out[:j]):
                        fired_at = j
                        break
            inactive = not bool(np.asarray(active_c)[0])
            if fired_at is not None and not (inactive and fired_at == len(out)):
                # the decoded-text fallback caught a stop the in-graph token
                # matcher missed (alternate tokenization of the stop string):
                # trim the visible answer at the stop and rebuild the live
                # state exactly — tokens past the stop were already persisted
                # by the in-graph loop, and a multi-round cache must match the
                # per-token protocol. Rare (the token matcher covers the
                # criteria's own tokenizations), so replay cost is acceptable.
                out = out[:fired_at]
                self._hist.append(("out", list(out)))
                self.state = self._replay_state()
                return out
            if inactive:
                # in-graph stop (EOS/keyword/limit); if the text fallback
                # fired it agreed with the matcher (fired_at == len(out)), so
                # the frozen speculative chunk's state is exactly aligned
                self.state = nxt[0]
                break
            cur = nxt
        fed = list(out)  # every emitted token was fed through decode
        self._hist.append(("out", fed))
        # EOS is processed into the cache but excluded from the visible
        # answer (keyword-stop tokens stay), matching the per-token protocol
        if out and out[-1] == gc.eos_token_id:
            out.pop()
        return out

    def _ask_tokenwise(self, stopping_criteria, max_new: int) -> List[int]:
        """Exact per-token loop for arbitrary host-side stopping criteria
        (one ~29 ms round-trip per token through the tunnel — prefer
        KeywordsStoppingCriteria / stop_sequences, which run in-graph)."""
        gc = self.gen.gen_cfg
        out: List[int] = []
        fed: List[int] = []
        for _ in range(max_new):
            tok = int(np.argmax(np.asarray(self.state.last_logits[0])))
            # every emitted token is fed through decode — including the one
            # that trips EOS or a stopping criterion — so the live cache
            # stays aligned with the visible conversation for later rounds
            self.state = self.gen._decode(
                self.gen.params, self.gen.cfg, jnp.asarray([tok]), self.state
            )
            fed.append(tok)
            if tok == gc.eos_token_id:
                break
            out.append(tok)
            if stopping_criteria is not None and stopping_criteria(out):
                break
        self._hist.append(("out", fed))
        return out

    def cache_lengths(self) -> np.ndarray:
        assert self.state is not None
        return np.concatenate(
            [np.asarray(self.state.cache.pre.length),
             np.asarray(self.state.cache.post.length)], axis=0,
        )
