"""Dense LLaMA decoder parity vs HuggingFace torch (fp32, CPU).

The reference decoder is an HF-4.37 LLaMA fork; with sparsification disabled
it must match HF numerics. We build a tiny random HF LlamaForCausalLM,
convert its state dict, and compare logits.
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


def _make_hf_llama(num_kv_heads=4):
    from transformers import LlamaConfig as HFLlamaConfig, LlamaForCausalLM

    hf_cfg = HFLlamaConfig(
        vocab_size=512,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=4,
        num_attention_heads=4,
        num_key_value_heads=num_kv_heads,
        max_position_embeddings=512,
        rms_norm_eps=1e-5,
        rope_theta=10000.0,
        attn_implementation="eager",
        tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    model = LlamaForCausalLM(hf_cfg).eval()
    cfg = LlamaConfig.tiny(num_key_value_heads=num_kv_heads)
    return model, cfg


@pytest.mark.parametrize("num_kv_heads", [4, 2])
def test_dense_logits_match_hf(num_kv_heads):
    model, cfg = _make_hf_llama(num_kv_heads)
    params = llama_params_from_state_dict(model.state_dict(), cfg)
    params = jax.tree.map(jnp.asarray, params)

    rng = np.random.default_rng(0)
    ids = rng.integers(0, cfg.vocab_size, size=(2, 17))
    with torch.no_grad():
        ref = model(torch.tensor(ids)).logits.numpy()

    ours = np.asarray(llama.forward_dense(params, cfg, jnp.asarray(ids)))
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=2e-3)


def test_prefill_decode_matches_nocache():
    """KV-cache path must reproduce the no-cache forward exactly: prefill S
    tokens then decode the next, vs a single dense forward over S+1."""
    model, cfg = _make_hf_llama()
    params = llama_params_from_state_dict(model.state_dict(), cfg)
    params = jax.tree.map(jnp.asarray, params)

    from dynamic_llava_tpu.ops.kv_cache import advance_lengths, init_cache

    rng = np.random.default_rng(1)
    b, s, max_len = 2, 9, 32
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, size=(b, s + 1)))

    dense_logits = llama.forward_dense(params, cfg, ids)

    # prefill first s tokens
    cache = init_cache(cfg, b, max_len, dtype=jnp.float32)
    x = llama.embed_tokens(params, ids[:, :s])
    positions = jnp.broadcast_to(jnp.arange(s, dtype=jnp.int32)[None], (b, s))
    valid = jnp.full((b,), s, jnp.int32)
    res = llama.run_layers_prefill(params, cfg, x, positions, cache, valid)
    prefill_logits = llama.lm_head(params, cfg, res.x)
    np.testing.assert_allclose(
        np.asarray(prefill_logits), np.asarray(dense_logits[:, :s]), atol=2e-4, rtol=2e-3
    )

    # decode token s
    x_tok = llama.embed_tokens(params, ids[:, s : s + 1])
    pos_tok = jnp.full((b, 1), s, jnp.int32)
    dres = llama.run_layers_decode(params, cfg, x_tok, pos_tok, res.cache)
    decode_logits = llama.lm_head(params, cfg, dres.x)
    np.testing.assert_allclose(
        np.asarray(decode_logits[:, 0]),
        np.asarray(dense_logits[:, s]),
        atol=2e-4,
        rtol=2e-3,
    )

    # advance: all layers persist (dense decision = keep)
    newlen = advance_lengths(dres.cache.length, jnp.ones((b,), jnp.int32), 2)
    assert (np.asarray(newlen) == s + 1).all()


def test_padded_batch_prefill_matches_per_sample():
    """Right-padded batched prefill must give the same last-valid-token
    logits as per-sample unpadded runs."""
    model, cfg = _make_hf_llama()
    params = llama_params_from_state_dict(model.state_dict(), cfg)
    params = jax.tree.map(jnp.asarray, params)

    from dynamic_llava_tpu.ops.kv_cache import init_cache

    rng = np.random.default_rng(2)
    lens = [5, 9]
    s = max(lens)
    ids = np.zeros((2, s), dtype=np.int64)
    per_sample_logits = []
    for i, L in enumerate(lens):
        row = rng.integers(1, cfg.vocab_size, size=(L,))
        ids[i, :L] = row
        single = llama.forward_dense(params, cfg, jnp.asarray(row[None]))
        per_sample_logits.append(np.asarray(single[0, L - 1]))

    cache = init_cache(cfg, 2, 16, dtype=jnp.float32)
    x = llama.embed_tokens(params, jnp.asarray(ids))
    positions = jnp.broadcast_to(jnp.arange(s, dtype=jnp.int32)[None], (2, s))
    valid = jnp.asarray(lens, jnp.int32)
    res = llama.run_layers_prefill(params, cfg, x, positions, cache, valid)
    logits = llama.lm_head(params, cfg, res.x)
    for i, L in enumerate(lens):
        np.testing.assert_allclose(
            np.asarray(logits[i, L - 1]), per_sample_logits[i], atol=2e-4, rtol=2e-3
        )


def test_fused_projections_match_separate(monkeypatch):
    """DYNAMIC_LLAVA_FUSED_PROJ=1 training path (one concat-weights matmul
    for q/k/v and gate/up, sliced after) must match the separate-dots path
    exactly — with and without LoRA adapters attached."""
    cfg = LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
    )
    params = llama.init_llama_params(jax.random.key(0), cfg, jnp.float32)
    x = jax.random.normal(jax.random.key(1), (2, 16, 64))
    positions = jnp.broadcast_to(
        jnp.arange(16, dtype=jnp.int32)[None], (2, 16)
    )

    def run(fused):
        monkeypatch.setattr(llama, "_FUSED_PROJ", fused)
        return llama.run_layers_nocache(
            params, cfg, x, positions, training=True
        )

    np.testing.assert_allclose(
        np.asarray(run(True)), np.asarray(run(False)), atol=1e-6
    )

    layers = dict(params["layers"])
    key = jax.random.key(2)
    for name in ("q", "k", "v", "gate", "up"):
        out = layers[name].shape[-1]
        key, k1, k2 = jax.random.split(key, 3)
        layers[f"{name}_lora"] = {
            "a": jax.random.normal(k1, (2, 64, 8)) * 0.1,
            "b": jax.random.normal(k2, (2, 8, out)) * 0.1,
            "s": jnp.float32(0.5),
        }
    params = dict(params, layers=layers)
    np.testing.assert_allclose(
        np.asarray(run(True)), np.asarray(run(False)), atol=1e-6
    )
