"""Converter fuzz over HF config variants (VERDICT r4 item 6).

A real weights drop (Vicuna-7B/13B, a Mistral base, a grown-vocab LLaVA
finetune) arrives as an HF config.json + state dict; the chain that must
survive first-try is ``LlamaConfig.from_hf_dict`` + ``convert.
llama_params_from_state_dict``. Each variant here builds a REAL tiny HF
model with that config, derives our config FROM THE HF CONFIG DICT (not
hand-written), converts the state dict, and requires logit parity vs HF
eager — so both the config derivation and the weight mapping are
exercised end-to-end.

Variants cover what the reference zoo can carry
(/root/reference/docs/MODEL_ZOO.md; dynamic_llava_builder.py:35-249 load
paths): GQA/MQA kv-head counts, rope_theta overrides, linear/dynamic rope
scaling, tied embeddings, 13B-like geometry (40-head analogue), grown
tokenizer vocab sizes, and Mistral (sliding window) keys.
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

BASE = dict(
    vocab_size=512,
    hidden_size=64,
    intermediate_size=128,
    num_hidden_layers=3,
    num_attention_heads=4,
    num_key_value_heads=4,
    max_position_embeddings=512,
    rms_norm_eps=1e-5,
    rope_theta=10000.0,
    tie_word_embeddings=False,
)

VARIANTS = {
    "mqa_kv1": dict(num_key_value_heads=1),
    "gqa_kv2_theta1e6": dict(num_key_value_heads=2, rope_theta=1e6),
    "rope_linear_x2": dict(rope_scaling={"type": "linear", "factor": 2.0}),
    "rope_dynamic_x2": dict(rope_scaling={"type": "dynamic", "factor": 2.0}),
    "tied_embeddings": dict(tie_word_embeddings=True),
    # 13B-like geometry: more heads than the 7B default, 2.7x ffn ratio
    "geom_13b_like": dict(hidden_size=80, num_attention_heads=5,
                          num_key_value_heads=5, intermediate_size=216),
    # grown tokenizer (initialize_vision_tokenizer adds special tokens; the
    # resulting vocab is not a round multiple of anything)
    "grown_vocab": dict(vocab_size=517),
    "rms_eps_1e6": dict(rms_norm_eps=1e-6),
}


def _seq_len_for(name):
    # dynamic-NTK only rescales beyond max_position_embeddings; below it the
    # HF implementation uses the base frequencies, which this parity run
    # must reproduce too
    return 17


@pytest.mark.parametrize("name", sorted(VARIANTS))
def test_llama_variant_logits_match_hf(name):
    from transformers import LlamaConfig as HFLlamaConfig, LlamaForCausalLM

    hf_cfg = HFLlamaConfig(**{**BASE, **VARIANTS[name]},
                           attn_implementation="eager")
    torch.manual_seed(0)
    model = LlamaForCausalLM(hf_cfg).eval()

    # the production path: config derived from the HF CONFIG DICT
    cfg = LlamaConfig.from_hf_dict(hf_cfg.to_dict())
    assert cfg.num_key_value_heads == hf_cfg.num_key_value_heads
    params = llama_params_from_state_dict(model.state_dict(), cfg)
    params = jax.tree.map(jnp.asarray, params)

    rng = np.random.default_rng(1)
    ids = rng.integers(0, cfg.vocab_size, size=(2, _seq_len_for(name)))
    with torch.no_grad():
        ref = model(torch.tensor(ids)).logits.numpy()
    ours = np.asarray(llama.forward_dense(params, cfg, jnp.asarray(ids)))
    np.testing.assert_allclose(ours, ref, atol=3e-4, rtol=3e-3)


def test_mistral_keys_convert_via_hf_dict():
    """Mistral config keys (sliding_window, silently-absent rope extras)
    round through from_hf_dict + the llama converter — the key layout is
    identical; the runtime applies the window."""
    from transformers import MistralConfig, MistralForCausalLM

    hf_cfg = MistralConfig(
        vocab_size=512, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=512, sliding_window=8,
        attn_implementation="eager",
    )
    torch.manual_seed(0)
    model = MistralForCausalLM(hf_cfg).eval()
    cfg = LlamaConfig.from_hf_dict(hf_cfg.to_dict())
    assert cfg.sliding_window == 8
    params = llama_params_from_state_dict(model.state_dict(), cfg)
    params = jax.tree.map(jnp.asarray, params)

    rng = np.random.default_rng(2)
    # long enough that the sliding window binds (s > window)
    ids = rng.integers(0, cfg.vocab_size, size=(2, 21))
    with torch.no_grad():
        ref = model(torch.tensor(ids)).logits.numpy()
    ours = np.asarray(llama.forward_dense(params, cfg, jnp.asarray(ids)))
    np.testing.assert_allclose(ours, ref, atol=3e-4, rtol=3e-3)
