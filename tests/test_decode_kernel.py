"""Length-skipping decode kernel vs the XLA oracle (interpret mode)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dynamic_llava_tpu.ops.attention import decode_attend
from dynamic_llava_tpu.ops.decode_attention import flash_decode_attention


@pytest.mark.parametrize("hkv,nrep", [(2, 1), (2, 2)])
def test_decode_kernel_matches_oracle(hkv, nrep):
    rng = np.random.default_rng(0)
    b, maxlen, d = 3, 512, 32
    h = hkv * nrep
    q = jnp.asarray(rng.normal(size=(b, 1, h, d)), jnp.float32)
    kc = jnp.asarray(rng.normal(size=(b, maxlen, hkv, d)), jnp.float32)
    vc = jnp.asarray(rng.normal(size=(b, maxlen, hkv, d)), jnp.float32)
    length = jnp.asarray([37, 255, 256], jnp.int32)
    ref = decode_attend(q, kc, vc, length)
    got = flash_decode_attention(q, kc, vc, length, block_k=128, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=3e-5, rtol=3e-4)


def test_decode_kernel_edge_lengths():
    """length 0 (only the current token) and length == max_len - 1."""
    rng = np.random.default_rng(1)
    b, maxlen, hkv, d = 2, 256, 2, 32
    q = jnp.asarray(rng.normal(size=(b, 1, hkv, d)), jnp.float32)
    kc = jnp.asarray(rng.normal(size=(b, maxlen, hkv, d)), jnp.float32)
    vc = jnp.asarray(rng.normal(size=(b, maxlen, hkv, d)), jnp.float32)
    length = jnp.asarray([0, maxlen - 1], jnp.int32)
    ref = decode_attend(q, kc, vc, length)
    got = flash_decode_attention(q, kc, vc, length, block_k=128, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=3e-5, rtol=3e-4)


def test_fp8_kv_cache_path():
    """float8_e4m3fn KV storage (opt-in, halves KV-read bandwidth): the
    prefill+decode path must run and stay close to the bf16-cache logits."""
    import numpy as np

    import jax
    import jax.numpy as jnp

    from dynamic_llava_tpu.config import LlavaConfig, SparseConfig
    from dynamic_llava_tpu.models import dynamic
    from dynamic_llava_tpu.multimodal.fusion import plan_batch
    from dynamic_llava_tpu.ops.kv_cache import init_tiered_cache

    sparse = SparseConfig(
        use_vision_predictor=False, use_text_predictor=False,
        use_output_text_predictor=False, use_instruct_predictor=False,
        d_model=32, nhead=2, dim_feedforward=64, num_layers=1,
    )
    cfg = LlavaConfig.tiny(sparse=sparse)
    params = dynamic.init_llava_params(jax.random.key(0), cfg)
    ids = np.random.default_rng(0).integers(3, cfg.text.vocab_size, (2, 12))
    plan = plan_batch(list(ids), 0)

    def run(dtype):
        cache = init_tiered_cache(
            cfg.text, cfg.sparse.sparse_layer, plan.batch, 48, 48, dtype)
        state, _ = dynamic.prefill(
            params, cfg, jnp.asarray(plan.token_ids),
            jnp.asarray(plan.is_image), jnp.asarray(plan.image_slot),
            jnp.asarray(plan.valid_len), jnp.asarray(plan.spans.image_start),
            jnp.asarray(plan.spans.last_instruct_start),
            jnp.asarray(plan.spans.last_instruct_end),
            jnp.asarray(plan.spans.has_image), None, cache)
        for _ in range(4):
            tok = jnp.argmax(state.last_logits, axis=-1)
            state = dynamic.decode_step(params, cfg, tok, state)
        return np.asarray(state.last_logits, np.float32)

    ref = run(jnp.float32)
    f8 = run(jnp.float8_e4m3fn)
    cos = (ref * f8).sum() / (np.linalg.norm(ref) * np.linalg.norm(f8))
    assert cos > 0.98, cos
