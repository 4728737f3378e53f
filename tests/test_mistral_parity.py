"""Mistral-family decoder parity vs HuggingFace torch (fp32, CPU).

The reference ships LLaVA-Mistral as a dense baseline
(/root/reference/llava/model/language_model/llava_mistral.py — a thin
shim over HF MistralForCausalLM). Mistral is the LLaMA architecture plus
GQA and SLIDING-WINDOW attention; this repo rides the same decoder stack
with ``LlamaConfig.sliding_window`` set. These tests pin the semantics to
HF's with the window actually BINDING (seq_len > window), and pin the
cache paths (prefill+decode, chunked extend) to the no-cache oracle.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dynamic_llava_tpu.config import LlamaConfig
from dynamic_llava_tpu.models import llama
from dynamic_llava_tpu.models.convert import llama_params_from_state_dict

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

WINDOW = 8


def _make_hf_mistral(window=WINDOW, num_kv_heads=2):
    from transformers import MistralConfig as HFMistralConfig
    from transformers import MistralForCausalLM

    hf_cfg = HFMistralConfig(
        vocab_size=512,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=4,
        num_attention_heads=4,
        num_key_value_heads=num_kv_heads,
        max_position_embeddings=512,
        rms_norm_eps=1e-5,
        rope_theta=10000.0,
        sliding_window=window,
        attn_implementation="eager",
        tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    model = MistralForCausalLM(hf_cfg).eval()
    cfg = LlamaConfig.from_hf_dict(hf_cfg.to_dict())
    assert cfg.sliding_window == window
    assert cfg.num_key_value_heads == num_kv_heads
    return model, cfg


def test_mistral_logits_match_hf_window_binding():
    """seq_len 2x the window: rows past the window boundary attend to a
    strict suffix — a full-causal stack CANNOT match these logits."""
    model, cfg = _make_hf_mistral()
    params = llama_params_from_state_dict(model.state_dict(), cfg)
    params = jax.tree.map(jnp.asarray, params)

    rng = np.random.default_rng(0)
    ids = rng.integers(0, cfg.vocab_size, size=(2, 2 * WINDOW + 1))
    with torch.no_grad():
        ref = model(torch.tensor(ids)).logits.numpy()

    ours = np.asarray(llama.forward_dense(params, cfg, jnp.asarray(ids)))
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=2e-3)

    # control: the same stack WITHOUT the window must NOT match on the
    # binding rows (proves the window branch is live, not vacuous)
    import dataclasses

    cfg_nw = dataclasses.replace(cfg, sliding_window=None)
    no_window = np.asarray(llama.forward_dense(params, cfg_nw, jnp.asarray(ids)))
    assert not np.allclose(no_window[:, WINDOW + 1:], ref[:, WINDOW + 1:], atol=1e-3)
    # pre-boundary rows see their full history either way
    np.testing.assert_allclose(no_window[:, :WINDOW], ref[:, :WINDOW], atol=2e-4, rtol=2e-3)


def test_mistral_prefill_decode_matches_nocache():
    """Prefill S then greedy-decode past the window; every decoded step's
    logits must equal the no-cache forward over the growing sequence."""
    model, cfg = _make_hf_mistral()
    params = llama_params_from_state_dict(model.state_dict(), cfg)
    params = jax.tree.map(jnp.asarray, params)

    from dynamic_llava_tpu.ops.kv_cache import advance_lengths, init_cache

    rng = np.random.default_rng(1)
    b, s, n_decode = 2, 6, WINDOW + 4  # decode well past the window
    max_len = s + n_decode + 1
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, size=(b, s)))

    cache = init_cache(cfg, b, max_len, dtype=jnp.float32)
    x = llama.embed_tokens(params, ids)
    positions = jnp.broadcast_to(jnp.arange(s, dtype=jnp.int32)[None], (b, s))
    valid = jnp.full((b,), s, jnp.int32)
    res = llama.run_layers_prefill(params, cfg, x, positions, cache, valid)
    cache = res.cache
    logits = llama.lm_head(params, cfg, res.x)[:, s - 1]

    seq = ids
    for step in range(n_decode):
        ref_logits = llama.forward_dense(params, cfg, seq)[:, -1]
        np.testing.assert_allclose(
            np.asarray(logits), np.asarray(ref_logits), atol=3e-4, rtol=3e-3
        )
        nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        seq = jnp.concatenate([seq, nxt[:, None]], axis=1)
        x = llama.embed_tokens(params, nxt[:, None])
        pos = jnp.full((b, 1), s + step, jnp.int32)
        d = llama.run_layers_decode(params, cfg, x, pos, cache)
        cache = d.cache._replace(
            length=advance_lengths(d.cache.length, jnp.ones((b,), jnp.int32), 0)
        )
        logits = llama.lm_head(params, cfg, d.x)[:, 0]


def test_mistral_extend_matches_nocache():
    """Chunked continuation (the multi-round path) with the window binding
    across the cache/chunk boundary."""
    model, cfg = _make_hf_mistral()
    params = llama_params_from_state_dict(model.state_dict(), cfg)
    params = jax.tree.map(jnp.asarray, params)

    from dynamic_llava_tpu.ops.kv_cache import init_cache

    rng = np.random.default_rng(2)
    b, s1, m = 2, WINDOW - 2, WINDOW  # chunk rows span the boundary
    max_len = s1 + m + 4
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, size=(b, s1 + m)))

    cache = init_cache(cfg, b, max_len, dtype=jnp.float32)
    x = llama.embed_tokens(params, ids[:, :s1])
    pos1 = jnp.broadcast_to(jnp.arange(s1, dtype=jnp.int32)[None], (b, s1))
    res = llama.run_layers_prefill(
        params, cfg, x, pos1, cache, jnp.full((b,), s1, jnp.int32)
    )
    x2 = llama.embed_tokens(params, ids[:, s1:])
    pos2 = jnp.broadcast_to(
        (s1 + jnp.arange(m, dtype=jnp.int32))[None], (b, m)
    )
    ext = llama.run_layers_extend(params, cfg, x2, pos2, res.cache)
    got = np.asarray(llama.lm_head(params, cfg, ext.x))

    ref = np.asarray(llama.forward_dense(params, cfg, ids))[:, s1:]
    np.testing.assert_allclose(got, ref, atol=3e-4, rtol=3e-3)


def test_sliding_window_rejects_sparse_predictors():
    from dynamic_llava_tpu.config import LlavaConfig, SparseConfig

    text = LlamaConfig.tiny(sliding_window=8)
    with pytest.raises(ValueError, match="sliding_window"):
        LlavaConfig.tiny().__class__(
            text=text,
            vision=LlavaConfig.tiny().vision,
            sparse=SparseConfig(
                d_model=32, nhead=2, dim_feedforward=64, num_layers=1
            ),
        )
    # predictors off is the supported dense configuration
    LlavaConfig.tiny().__class__(
        text=text,
        vision=LlavaConfig.tiny().vision,
        sparse=SparseConfig(
            d_model=32, nhead=2, dim_feedforward=64, num_layers=1,
            use_vision_predictor=False, use_text_predictor=False,
            use_output_text_predictor=False, use_instruct_predictor=False,
        ),
    )


def test_mistral_7b_config():
    cfg = LlamaConfig.mistral_7b()
    assert cfg.sliding_window == 4096
    assert cfg.num_key_value_heads == 8
    assert cfg.intermediate_size == 14336
    assert cfg.num_kv_groups == 4
