"""MPT decoder parity vs HuggingFace torch (fp32, CPU).

The reference's third base family (llava_mpt.py — a shim over HF
MptForCausalLM). Pins the ALiBi-relative-form equivalence, the fused-Wqkv
split, the bias-free LayerNorms, the tied lm_head, and the cache decode
path against HF numerics / the no-cache oracle.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dynamic_llava_tpu.config import MptConfig
from dynamic_llava_tpu.models import mpt

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


def _make_hf_mpt(n_heads=4, tie=True):
    from transformers import MptConfig as HFMptConfig, MptForCausalLM

    hf_cfg = HFMptConfig(
        vocab_size=512,
        d_model=64,
        n_heads=n_heads,
        n_layers=4,
        max_seq_len=512,
        layer_norm_epsilon=1e-5,
        tie_word_embeddings=tie,
        attn_implementation="eager",
    )
    torch.manual_seed(0)
    model = MptForCausalLM(hf_cfg).eval()
    cfg = MptConfig.from_hf_dict(hf_cfg.to_dict())
    assert cfg.n_heads == n_heads and cfg.head_dim == 64 // n_heads
    return model, cfg


def test_alibi_slopes_match_hf():
    from transformers.models.mpt.modeling_mpt import build_mpt_alibi_tensor

    for n_heads in (4, 6, 16):  # 6 exercises the non-power-of-2 interleave
        ref = build_mpt_alibi_tensor(n_heads, 8).numpy()  # [H, 1, 8]
        slopes = mpt.alibi_slopes(n_heads)
        np.testing.assert_allclose(ref[:, 0, -1] * 0.0, 0.0)  # last col = 0
        # ref[:, 0, j] = (j - 7) * slope_h
        np.testing.assert_allclose(ref[:, 0, 0], -7.0 * slopes, rtol=1e-6)


@pytest.mark.parametrize("n_heads", [4, 2])
def test_mpt_logits_match_hf(n_heads):
    model, cfg = _make_hf_mpt(n_heads=n_heads)
    params = mpt.mpt_params_from_state_dict(model.state_dict(), cfg)

    rng = np.random.default_rng(0)
    ids = rng.integers(0, cfg.vocab_size, size=(2, 17))
    with torch.no_grad():
        ref = model(torch.tensor(ids)).logits.numpy()

    ours = np.asarray(mpt.forward_dense(params, cfg, jnp.asarray(ids)))
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=2e-3)


def test_mpt_prefill_decode_matches_nocache():
    model, cfg = _make_hf_mpt()
    params = mpt.mpt_params_from_state_dict(model.state_dict(), cfg)

    from dynamic_llava_tpu.ops.kv_cache import init_cache

    rng = np.random.default_rng(1)
    b, s, n_decode = 2, 7, 6
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, size=(b, s)))

    cache = init_cache(cfg, b, s + n_decode + 1, dtype=jnp.float32)
    x = mpt.embed_tokens(params, ids)
    pos = jnp.broadcast_to(jnp.arange(s, dtype=jnp.int32)[None], (b, s))
    res = mpt.run_layers_prefill(
        params, cfg, x, pos, cache, jnp.full((b,), s, jnp.int32)
    )
    cache = res.cache
    logits = mpt.lm_head(params, cfg, res.x)[:, s - 1]

    seq = ids
    for step in range(n_decode):
        ref = mpt.forward_dense(params, cfg, seq)[:, -1]
        np.testing.assert_allclose(
            np.asarray(logits), np.asarray(ref), atol=3e-4, rtol=3e-3
        )
        nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        seq = jnp.concatenate([seq, nxt[:, None]], axis=1)
        d = mpt.run_layers_decode(
            params, cfg, mpt.embed_tokens(params, nxt[:, None]),
            jnp.full((b, 1), s + step, jnp.int32), cache,
        )
        cache = d.cache._replace(length=d.cache.length + 1)
        logits = mpt.lm_head(params, cfg, d.x)[:, 0]


def test_mpt_generate_greedy_matches_hf_generate():
    model, cfg = _make_hf_mpt()
    params = mpt.mpt_params_from_state_dict(model.state_dict(), cfg)

    rng = np.random.default_rng(2)
    ids = rng.integers(0, cfg.vocab_size, size=(2, 9))
    n_new = 8
    with torch.no_grad():
        ref = model.generate(
            torch.tensor(ids), max_new_tokens=n_new, do_sample=False,
            pad_token_id=0,
        ).numpy()[:, 9:]

    ours = np.asarray(mpt.generate_greedy(params, cfg, jnp.asarray(ids), n_new))
    np.testing.assert_array_equal(ours, ref)


def test_mpt_untied_head_roundtrip():
    model, cfg = _make_hf_mpt(tie=False)
    params = mpt.mpt_params_from_state_dict(model.state_dict(), cfg)
    assert "lm_head" in params

    rng = np.random.default_rng(3)
    ids = rng.integers(0, cfg.vocab_size, size=(1, 11))
    with torch.no_grad():
        ref = model(torch.tensor(ids)).logits.numpy()
    ours = np.asarray(mpt.forward_dense(params, cfg, jnp.asarray(ids)))
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=2e-3)


def test_mpt_multimodal_forward():
    """LLaVA-MPT composition: tower -> projector -> splice -> ALiBi decoder.
    Text-only must equal forward_dense; with an image, rows after the image
    span must differ from a text-only control (the splice is live)."""
    from dynamic_llava_tpu.config import ClipVisionConfig
    from dynamic_llava_tpu.constants import IMAGE_TOKEN_INDEX
    from dynamic_llava_tpu.models.clip import init_clip_params
    from dynamic_llava_tpu.models.projector import init_projector_params
    from dynamic_llava_tpu.multimodal.fusion import plan_batch

    cfg = MptConfig.tiny()
    vis = ClipVisionConfig.tiny()
    key = jax.random.key(0)
    params = {
        "llm": mpt.init_mpt_params(key, cfg),
        "vision_tower": init_clip_params(jax.random.key(1), vis),
        "mm_projector": init_projector_params(
            jax.random.key(2), "mlp2x_gelu", vis.hidden_size, cfg.d_model
        ),
    }

    rng = np.random.default_rng(5)
    n_img = vis.num_patches
    prompt = np.concatenate([
        rng.integers(3, cfg.vocab_size, size=4),
        [IMAGE_TOKEN_INDEX],
        rng.integers(3, cfg.vocab_size, size=5),
    ])
    plan = plan_batch([prompt], n_img)
    pixels = rng.normal(size=(1, vis.image_size, vis.image_size, 3)).astype(
        np.float32
    )

    logits = np.asarray(mpt.forward_multimodal(
        params, cfg, vis,
        jnp.asarray(plan.token_ids), jnp.asarray(plan.is_image),
        jnp.asarray(plan.image_slot), jnp.asarray(pixels),
        valid_len=jnp.asarray(plan.valid_len),
    ))
    assert np.isfinite(logits).all()
    assert logits.shape == (1, plan.seq_len, cfg.vocab_size)

    # text-only call must reduce exactly to forward_dense
    ids = jnp.asarray(rng.integers(3, cfg.vocab_size, size=(1, 9)))
    mm = np.asarray(mpt.forward_multimodal(
        params, cfg, vis, ids,
        jnp.zeros((1, 9), bool), jnp.zeros((1, 9), jnp.int32), None,
    ))
    dense = np.asarray(mpt.forward_dense(params["llm"], cfg, ids))
    np.testing.assert_allclose(mm, dense, atol=1e-6)

    # the image changes downstream logits vs zeroed pixels (splice is live)
    logits2 = np.asarray(mpt.forward_multimodal(
        params, cfg, vis,
        jnp.asarray(plan.token_ids), jnp.asarray(plan.is_image),
        jnp.asarray(plan.image_slot), jnp.asarray(np.zeros_like(pixels)),
        valid_len=jnp.asarray(plan.valid_len),
    ))
    last = int(plan.valid_len[0]) - 1
    assert not np.allclose(logits[0, last], logits2[0, last], atol=1e-4)


def test_load_pretrained_model_routes_mpt(tmp_path):
    """An HF MPT checkpoint dir (config.json model_type=mpt +
    pytorch_model.bin) must route to the MptRuntime and produce the same
    logits as the direct converter."""
    from dynamic_llava_tpu.models.builder import MptRuntime, load_pretrained_model

    model, cfg = _make_hf_mpt()
    d = tmp_path / "mpt_ckpt"
    d.mkdir()
    (d / "config.json").write_text(
        __import__("json").dumps(model.config.to_dict())
    )
    torch.save(model.state_dict(), str(d / "pytorch_model.bin"))

    tok, runtime, imgproc, ctx = load_pretrained_model(
        str(d), dtype=jnp.float32
    )
    assert isinstance(runtime, MptRuntime)
    assert runtime.cfg.d_model == cfg.d_model
    assert ctx == cfg.max_seq_len

    rng = np.random.default_rng(7)
    ids = rng.integers(0, cfg.vocab_size, size=(1, 13))
    with torch.no_grad():
        ref = model(torch.tensor(ids)).logits.numpy()
    ours = np.asarray(
        mpt.forward_dense(runtime.params["llm"], runtime.cfg, jnp.asarray(ids))
    )
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=2e-3)
