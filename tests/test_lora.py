"""LoRA adapters: no-op init, merge equivalence, training-step isolation."""

import numpy as np

import jax
import jax.numpy as jnp

from dynamic_llava_tpu.config import LlamaConfig
from dynamic_llava_tpu.models import llama
from dynamic_llava_tpu.train.lora import (
    attach_lora,
    init_lora_params,
    merge_lora_pytree,
    split_lora_state,
)
from dynamic_llava_tpu.train.optimizer import label_params, make_optimizer


def _setup():
    cfg = LlamaConfig.tiny()
    params = llama.init_llama_params(jax.random.key(0), cfg)
    adapters = init_lora_params(jax.random.key(1), cfg, rank=4, alpha=8.0)
    layers = dict(params["layers"])
    layers.update(adapters)
    return cfg, params, dict(params, layers=layers)


def test_lora_noop_at_init_and_merge():
    cfg, base, lora = _setup()
    ids = jnp.asarray(np.random.default_rng(0).integers(0, cfg.vocab_size, (1, 6)))
    np.testing.assert_allclose(
        np.asarray(llama.forward_dense(lora, cfg, ids)),
        np.asarray(llama.forward_dense(base, cfg, ids)),
        atol=1e-6,
    )
    # non-zero B: forward must equal merged-weights forward
    lora["layers"]["q_lora"] = dict(
        lora["layers"]["q_lora"],
        b=jnp.ones_like(lora["layers"]["q_lora"]["b"]) * 0.01,
    )
    out = llama.forward_dense(lora, cfg, ids)
    merged = merge_lora_pytree({"llm": lora})["llm"]
    assert not any(k.endswith("_lora") for k in merged["layers"])
    np.testing.assert_allclose(
        np.asarray(out),
        np.asarray(llama.forward_dense(merged, cfg, ids)),
        atol=1e-4, rtol=1e-4,
    )


def test_lora_mode_freezes_base():
    cfg, base, lora_layers = _setup()
    params = {"llm": lora_layers, "vision_tower": {"w": jnp.ones((2, 2))}}
    labels = label_params(params, lora_mode=True)
    assert labels["llm"]["layers"]["q"] == "frozen"
    assert labels["llm"]["layers"]["q_lora"]["a"] == "base"
    assert labels["llm"]["layers"]["q_lora"]["s"] == "frozen"
    assert labels["llm"]["embed"] == "frozen"

    # one optimizer step: base weights unchanged, adapters updated
    opt = make_optimizer(base_lr=1e-2, predictor_lr=1e-2, lora_mode=True)
    state = opt.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    import optax

    updates, _ = opt.update(grads, state, params)
    new = optax.apply_updates(params, updates)
    np.testing.assert_array_equal(
        np.asarray(params["llm"]["layers"]["q"]),
        np.asarray(new["llm"]["layers"]["q"]),
    )
    assert not np.allclose(
        np.asarray(params["llm"]["layers"]["q_lora"]["a"]),
        np.asarray(new["llm"]["layers"]["q_lora"]["a"]),
    )


def test_split_lora_state():
    cfg, base, lora = _setup()
    params = {"llm": lora, "mm_projector": [{"w": jnp.zeros((2, 2))}]}
    adapters, non_lora = split_lora_state(params)
    assert set(adapters) == {f"{t}_lora" for t in ("q", "k", "v", "o", "gate", "up", "down")}
    assert "mm_projector" in non_lora
