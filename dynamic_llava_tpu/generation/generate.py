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
    cache_dtype: str = "bfloat16"
    # True: allocate the sparse KV tier at keep_rate * max_new and force-drop
    # beyond it (throughput/memory contract; generations that run to the full
    # max_new lose their tail's KV wholesale). False: worst-case allocation,
    # the predictor alone decides (quality-first — use for accuracy evals).
    bound_kv_budget: bool = True


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


class Generator:
    """Compiled-once generation harness for a fixed config.

    ``prefill_fn`` and ``decode_fn`` are jitted; the Python loop only feeds
    tokens and checks stop conditions (one host sync per token, same as the
    reference's per-token sampling loop but with the whole layer stack fused
    into a single XLA program).
    """

    def __init__(self, params, cfg: LlavaConfig, gen_cfg: GenerationConfig = GenerationConfig()):
        self.params = params
        self.cfg = cfg
        self.gen_cfg = gen_cfg
        # params are explicit jit arguments (a closure would bake the full
        # weight pytree into the HLO as constants); cfg is static.
        self._prefill = jax.jit(
            dynamic.prefill, static_argnums=(1,), donate_argnums=(11,)
        )
        self._decode = jax.jit(
            dynamic.decode_step, static_argnums=(1,), donate_argnums=(3,)
        )

    def prefill_from_plan(self, plan: FusionPlan, pixel_values, max_new_tokens: int):
        cache_dtype = jnp.dtype(self.gen_cfg.cache_dtype)
        cache = dynamic.make_gen_cache(
            self.cfg, plan.batch, plan.seq_len, max_new_tokens, cache_dtype,
            bound_output_budget=self.gen_cfg.bound_kv_budget,
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
        )
        return state, info

    def generate(
        self,
        input_ids_list: List[np.ndarray],
        pixel_values: Optional[np.ndarray] = None,  # [B, H, W, 3] normalized
        stopping_criteria=None,
        pad_to: Optional[int] = None,
    ) -> List[List[int]]:
        """Returns generated token ids (without the prompt) per sample."""
        gc = self.gen_cfg
        plan = plan_batch(
            input_ids_list,
            self.cfg.num_image_tokens if pixel_values is not None else 0,
            max_length=self.cfg.model_max_length,
            pad_to=pad_to,
        )
        state, _ = self.prefill_from_plan(plan, pixel_values, gc.max_new_tokens)

        b = plan.batch
        rng = jax.random.key(0)
        done = np.zeros(b, bool)
        out: List[List[int]] = [[] for _ in range(b)]
        tok = None
        for step in range(gc.max_new_tokens):
            rng, krng = jax.random.split(rng)
            tok = _sample(krng, state.last_logits, gc.temperature, gc.top_p)
            tok_np = np.asarray(tok)
            for i in range(b):
                if not done[i]:
                    t = int(tok_np[i])
                    out[i].append(t)
                    if t == gc.eos_token_id:
                        done[i] = True
                    elif stopping_criteria is not None and stopping_criteria(
                        list(np.asarray(plan.token_ids[i][: plan.valid_len[i]]))
                        + out[i]
                    ):
                        done[i] = True
            if done.all() or step == gc.max_new_tokens - 1:
                break
            state = self._decode(self.params, self.cfg, tok, state)
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
        cache = dynamic.make_gen_cache(
            self.cfg, plan.batch, plan.seq_len, gc.max_new_tokens,
            jnp.dtype(gc.cache_dtype),
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
        )
        b = plan.batch
        out: List[List[int]] = [[] for _ in range(b)]
        done = np.zeros(b, bool)
        rng = jax.random.key(0)
        for step in range(gc.max_new_tokens):
            rng, krng = jax.random.split(rng)
            tok = _sample(krng, state.last_logits, gc.temperature, gc.top_p)
            tok_np = np.asarray(tok)
            for i in range(b):
                if not done[i]:
                    t = int(tok_np[i])
                    out[i].append(t)
                    if t == gc.eos_token_id:
                        done[i] = True
            if done.all() or step == gc.max_new_tokens - 1:
                break
            state = self._decode(self.params, self.cfg, tok, state)
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
    chunked. Decoded tokens stream through the normal decode step.
    """

    def __init__(self, generator: Generator, max_new_tokens_total: int = 2048):
        self.gen = generator
        self.budget = max_new_tokens_total
        self.state: Optional[dynamic.GenState] = None
        self._continue = jax.jit(
            dynamic.prefill_continue, static_argnums=(1,)
        )

    def ask(
        self,
        input_ids: np.ndarray,  # round 1: full prompt; later: the new chunk only
        pixel_values: Optional[np.ndarray] = None,
        stopping_criteria=None,
        max_new_tokens: Optional[int] = None,
    ) -> List[int]:
        gc = self.gen.gen_cfg
        max_new = max_new_tokens or gc.max_new_tokens
        if self.state is None:
            plan = plan_batch(
                [input_ids],
                self.gen.cfg.num_image_tokens if pixel_values is not None else 0,
                max_length=self.gen.cfg.model_max_length,
            )
            self.state, _ = self.gen.prefill_from_plan(
                plan, pixel_values, self.budget
            )
        else:
            chunk = jnp.asarray(np.asarray(input_ids, np.int64)[None])
            self.state = self._continue(
                self.gen.params, self.gen.cfg, chunk, self.state
            )

        out: List[int] = []
        for _ in range(max_new):
            tok = int(np.argmax(np.asarray(self.state.last_logits[0])))
            if tok == gc.eos_token_id:
                # feed EOS through so the cache stays aligned with history
                self.state = self.gen._decode(
                    self.gen.params, self.gen.cfg, jnp.asarray([tok]), self.state
                )
                break
            out.append(tok)
            if stopping_criteria is not None and stopping_criteria(out):
                break
            self.state = self.gen._decode(
                self.gen.params, self.gen.cfg, jnp.asarray([tok]), self.state
            )
        return out

    def cache_lengths(self) -> np.ndarray:
        assert self.state is not None
        return np.concatenate(
            [np.asarray(self.state.cache.pre.length),
             np.asarray(self.state.cache.post.length)], axis=0,
        )
