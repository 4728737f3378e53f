"""End-to-end tests for the sparsification orchestration.

Strategy (SURVEY.md §4): the dense path is the fixture — with predictors off
(or keep budgets = 100%) the dynamic model must reproduce it; with them on,
shapes/lengths/positions must follow the method's contract.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dynamic_llava_tpu.config import LlavaConfig, SparseConfig
from dynamic_llava_tpu.models import dynamic, llama
from dynamic_llava_tpu.multimodal.fusion import plan_batch
from dynamic_llava_tpu.ops.kv_cache import TieredCache, init_tiered_cache


def _tiny_cfg(**sparse_overrides) -> LlavaConfig:
    sparse = SparseConfig(
        d_model=32, nhead=2, dim_feedforward=64, num_layers=1,
        use_vision_predictor=False, use_text_predictor=False,
        use_output_text_predictor=False, use_instruct_predictor=False,
    )
    sparse = dataclasses.replace(sparse, **sparse_overrides)
    return LlavaConfig.tiny(sparse=sparse)


def _params(cfg, seed=0):
    return dynamic.init_llava_params(jax.random.key(seed), cfg)


def _mm_batch(cfg, lens=(10, 14), seed=0):
    """Multimodal batch: <image> sentinel at position 2 of each prompt."""
    rng = np.random.default_rng(seed)
    ids_list = []
    for L in lens:
        ids = rng.integers(3, cfg.text.vocab_size, size=(L,)).astype(np.int64)
        ids[2] = -200
        ids_list.append(ids)
    plan = plan_batch(ids_list, cfg.num_image_tokens)
    imgs = rng.normal(size=(len(lens), cfg.vision.image_size, cfg.vision.image_size, 3)).astype(np.float32)
    return plan, imgs


def _run_prefill(params, cfg, plan, imgs, max_new=16, cache_dtype=jnp.float32):
    from dynamic_llava_tpu.models.dynamic import gen_cache_sizes
    pre, post = gen_cache_sizes(cfg, plan.seq_len, max_new)
    cache = init_tiered_cache(
        cfg.text, cfg.sparse.sparse_layer, plan.batch, pre, post, cache_dtype
    )
    return dynamic.prefill(
        params, cfg,
        jnp.asarray(plan.token_ids), jnp.asarray(plan.is_image),
        jnp.asarray(plan.image_slot), jnp.asarray(plan.valid_len),
        jnp.asarray(plan.spans.image_start),
        jnp.asarray(plan.spans.last_instruct_start),
        jnp.asarray(plan.spans.last_instruct_end),
        jnp.asarray(plan.spans.has_image),
        None if imgs is None else jnp.asarray(imgs),
        cache,
    )


def test_fusion_plan_layout():
    cfg = _tiny_cfg()
    plan, _ = _mm_batch(cfg, lens=(10, 14))
    n = cfg.num_image_tokens
    assert plan.seq_len == 14 - 1 + n
    # image span occupies slots [2, 2+n)
    assert plan.is_image[0, 2 : 2 + n].all()
    assert not plan.is_image[0, :2].any()
    assert plan.valid_len.tolist() == [10 - 1 + n, 14 - 1 + n]
    # text resumes after the span
    assert (plan.token_ids[0, 2 + n : plan.valid_len[0]] != 0).all()


def test_dense_prefill_matches_forward_dense_text_only():
    cfg = _tiny_cfg()
    params = _params(cfg)
    rng = np.random.default_rng(1)
    ids = rng.integers(3, cfg.text.vocab_size, size=(2, 12)).astype(np.int64)
    plan = plan_batch(list(ids), 0)
    state, _ = _run_prefill(params, cfg, plan, None)
    ref = llama.forward_dense(params["llm"], cfg.text, jnp.asarray(ids))
    np.testing.assert_allclose(
        np.asarray(state.last_logits), np.asarray(ref[:, -1]), atol=1e-4, rtol=1e-3
    )


def test_sparse_prefill_shapes_and_lengths():
    cfg = _tiny_cfg(use_vision_predictor=True, vision_keep_rate=0.25)
    params = _params(cfg)
    plan, imgs = _mm_batch(cfg)
    state, info = _run_prefill(params, cfg, plan, imgs)
    n_img = cfg.num_image_tokens
    k = cfg.sparse.vision_keep_budget(n_img)
    # pre-sparse tier holds the full sequence
    assert (np.asarray(state.cache.pre.length) == np.asarray(plan.valid_len)[None]).all()
    # post-sparse tier holds valid - n_img + k
    expect = np.asarray(plan.valid_len) - n_img + k
    assert (np.asarray(state.cache.post.length) == expect[None]).all()
    # the sparse tier buffer is allocated at the pruned budget, not full length
    assert state.cache.post.max_len < state.cache.pre.max_len
    # kept image count is exactly the budget
    ik = np.asarray(info.image_keep_mask)
    assert (ik.sum(axis=1) == k).all()
    # kept positions strictly increasing within the valid region
    kp = np.asarray(info.kept_positions)
    for i in range(plan.batch):
        v = int(np.asarray(info.new_length)[i])
        assert (np.diff(kp[i, :v]) > 0).all()


def test_keep_all_budget_matches_dense():
    """vision_keep_rate=1.0 -> compaction is the identity -> logits match the
    predictors-off model bit-for-bit (same weights)."""
    cfg_sparse = _tiny_cfg(use_vision_predictor=True, vision_keep_rate=1.0)
    cfg_dense = _tiny_cfg()
    params = _params(cfg_sparse)
    plan, imgs = _mm_batch(cfg_sparse)
    s_sparse, _ = _run_prefill(params, cfg_sparse, plan, imgs)
    s_dense, _ = _run_prefill(params, cfg_dense, plan, imgs)
    np.testing.assert_allclose(
        np.asarray(s_sparse.last_logits),
        np.asarray(s_dense.last_logits),
        atol=1e-4, rtol=1e-3,
    )


def test_decode_with_output_text_predictor():
    cfg = _tiny_cfg(use_output_text_predictor=True)
    params = _params(cfg)
    plan, imgs = _mm_batch(cfg)
    state, _ = _run_prefill(params, cfg, plan, imgs)
    pre0 = np.asarray(state.cache.pre.length).copy()
    post0 = np.asarray(state.cache.post.length).copy()
    toks = jnp.asarray(np.random.default_rng(2).integers(3, cfg.text.vocab_size, (4, plan.batch)))
    for i in range(4):
        state = dynamic.decode_step(params, cfg, toks[i], state)
    # pre-sparse layers always advance
    assert (np.asarray(state.cache.pre.length) == pre0 + 4).all()
    # post-sparse layers advance by [0, 4] depending on predictor decisions
    post = np.asarray(state.cache.post.length)
    assert (post <= post0 + 4).all() and (post >= post0).all()
    # positions advance regardless of keeps
    assert (np.asarray(state.next_pos) == np.asarray(plan.valid_len) + 4).all()


def test_dense_decode_matches_nocache_reference():
    """Predictors-off multimodal decode == no-cache forward over the fused
    sequence."""
    cfg = _tiny_cfg()
    params = _params(cfg)
    plan, imgs = _mm_batch(cfg, lens=(9,))
    state, _ = _run_prefill(params, cfg, plan, imgs)

    # manual no-cache reference: fused embeds + appended token embeds
    from dynamic_llava_tpu.multimodal.fusion import fuse_embeddings

    x = llama.embed_tokens(params["llm"], jnp.asarray(plan.token_ids))
    feats = dynamic.encode_images(params, cfg, jnp.asarray(imgs))
    x = fuse_embeddings(x, feats, jnp.asarray(plan.is_image), jnp.asarray(plan.image_slot))

    new_toks = [5, 7]
    for step, t in enumerate(new_toks):
        state = dynamic.decode_step(params, cfg, jnp.asarray([t]), state)
        emb = llama.embed_tokens(params["llm"], jnp.asarray([[t]]))
        x = jnp.concatenate([x, emb], axis=1)
        s = x.shape[1]
        pos = jnp.arange(s, dtype=jnp.int32)[None]
        h = llama.run_layers_nocache(params["llm"], cfg.text, x, pos)
        ref_logits = llama.lm_head(params["llm"], cfg.text, h)[:, -1]
        np.testing.assert_allclose(
            np.asarray(state.last_logits), np.asarray(ref_logits), atol=2e-4, rtol=2e-3,
        )


def test_forward_train_policy_none_matches_dense():
    """All predictors off -> forward_train logits == dense no-cache logits."""
    cfg = _tiny_cfg()
    params = _params(cfg)
    plan, imgs = _mm_batch(cfg, lens=(8, 11))
    out = dynamic.forward_train(
        params, cfg,
        jnp.asarray(plan.token_ids), jnp.asarray(plan.is_image),
        jnp.asarray(plan.image_slot), jnp.asarray(plan.valid_len),
        jnp.asarray(plan.spans.image_start),
        jnp.asarray(plan.spans.answer_start), jnp.asarray(plan.spans.answer_end),
        jnp.asarray(plan.spans.last_instruct_start),
        jnp.asarray(plan.spans.last_instruct_end),
        jnp.asarray(plan.spans.has_image),
        jnp.asarray(imgs), jax.random.key(0), jnp.float32(1.0), remat=False,
    )
    from dynamic_llava_tpu.multimodal.fusion import fuse_embeddings

    x = llama.embed_tokens(params["llm"], jnp.asarray(plan.token_ids))
    feats = dynamic.encode_images(params, cfg, jnp.asarray(imgs))
    x = fuse_embeddings(x, feats, jnp.asarray(plan.is_image), jnp.asarray(plan.image_slot))
    s = x.shape[1]
    pos = jnp.broadcast_to(jnp.arange(s, dtype=jnp.int32)[None], x.shape[:2])
    h = llama.run_layers_nocache(params["llm"], cfg.text, x, pos)
    ref = llama.lm_head(params["llm"], cfg.text, h)
    np.testing.assert_allclose(np.asarray(out.logits), np.asarray(ref), atol=1e-4, rtol=1e-3)


def test_forward_train_gumbel_masks():
    """With predictors on, masks are binary over their spans, 1.0 outside,
    and gradients reach the predictor params."""
    cfg = _tiny_cfg(
        use_vision_predictor=True,
        use_output_text_predictor=True,
        output_text_len_for_training=2,
    )
    params = _params(cfg)
    rng = np.random.default_rng(3)
    ids, labels = [], []
    for L in (16, 13):
        row = rng.integers(3, cfg.text.vocab_size, size=(L,)).astype(np.int64)
        row[1] = -200
        lab = row.copy()
        lab[: L - 6] = -100  # answer = last 6 tokens
        ids.append(row)
        labels.append(lab)
    plan = plan_batch(ids, cfg.num_image_tokens, labels_list=labels)
    imgs = rng.normal(size=(2, cfg.vision.image_size, cfg.vision.image_size, 3)).astype(np.float32)

    def loss_fn(p):
        out = dynamic.forward_train(
            p, cfg,
            jnp.asarray(plan.token_ids), jnp.asarray(plan.is_image),
            jnp.asarray(plan.image_slot), jnp.asarray(plan.valid_len),
            jnp.asarray(plan.spans.image_start),
            jnp.asarray(plan.spans.answer_start), jnp.asarray(plan.spans.answer_end),
            jnp.asarray(plan.spans.last_instruct_start),
            jnp.asarray(plan.spans.last_instruct_end),
            jnp.asarray(plan.spans.has_image),
            jnp.asarray(imgs), jax.random.key(1), jnp.float32(1.0), remat=False,
        )
        img_ratio = jnp.sum(out.image_mask * out.image_span) / jnp.maximum(
            jnp.sum(out.image_span), 1
        )
        txt_ratio = jnp.sum(out.output_text_mask * out.answer_span) / jnp.maximum(
            jnp.sum(out.answer_span), 1
        )
        loss = (0.2 - img_ratio) ** 2 + (0.5 - txt_ratio) ** 2 + jnp.mean(out.logits**2) * 0
        return loss, out

    (loss, out), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    im = np.asarray(out.image_mask)
    sp = np.asarray(out.image_span)
    # ST estimator: forward value = hard + soft - stopgrad(soft); float
    # cancellation leaves ~1e-7 residue around the hard {0, 1} values
    near01 = np.minimum(np.abs(im[sp]), np.abs(im[sp] - 1.0))
    assert (near01 < 1e-5).all()
    assert (im[~sp] == 1.0).all()
    g = grads["predictors"]["image_score_predictor"]["down"]["w"]
    assert np.abs(np.asarray(g)).sum() > 0, "no gradient reached the vision predictor"


def test_mixed_batch_text_only_sample_not_truncated():
    """A text-only sample batched with an image sample keeps ALL its tokens:
    the compaction bound may not assume every sample sheds N_img - K tokens
    (reference mixed-batch handling, dynamic_llava_arch.py:372-388)."""
    cfg = _tiny_cfg(use_vision_predictor=True, vision_keep_rate=0.25)
    params = _params(cfg)
    rng = np.random.default_rng(0)
    n_img = cfg.num_image_tokens
    # text-only prompt longer than padded_len - n_img + budget: under the
    # all-image truncation bound its tail would be dropped
    long_text = rng.integers(
        3, cfg.text.vocab_size, size=(n_img + 12,)
    ).astype(np.int64)
    img_ids = rng.integers(3, cfg.text.vocab_size, size=(8,)).astype(np.int64)
    img_ids[2] = -200
    plan = plan_batch([long_text, img_ids], n_img)
    assert not plan.spans.has_image[0] and plan.spans.has_image[1]
    imgs = rng.normal(
        size=(2, cfg.vision.image_size, cfg.vision.image_size, 3)
    ).astype(np.float32)

    def run(c):
        pre, post = dynamic.gen_cache_sizes(
            c, plan.seq_len, 8, all_have_image=False
        )
        cache = init_tiered_cache(
            c.text, c.sparse.sparse_layer, plan.batch, pre, post, jnp.float32
        )
        return dynamic.prefill(
            params, c,
            jnp.asarray(plan.token_ids), jnp.asarray(plan.is_image),
            jnp.asarray(plan.image_slot), jnp.asarray(plan.valid_len),
            jnp.asarray(plan.spans.image_start),
            jnp.asarray(plan.spans.last_instruct_start),
            jnp.asarray(plan.spans.last_instruct_end),
            jnp.asarray(plan.spans.has_image),
            jnp.asarray(imgs), cache, all_have_image=False,
        )

    state, info = run(cfg)
    # text-only sample: nothing pruned
    assert int(info.new_length[0]) == int(plan.valid_len[0])
    # image sample: image span pruned to budget
    budget = cfg.sparse.vision_keep_budget(n_img)
    assert int(info.new_length[1]) == int(plan.valid_len[1]) - n_img + budget

    # the text-only sample's logits must match a predictors-off run of the
    # same batch bit-for-bit in value (pruning another sample is irrelevant)
    state_d, _ = run(_tiny_cfg())
    np.testing.assert_allclose(
        np.asarray(state.last_logits[0]), np.asarray(state_d.last_logits[0]),
        rtol=2e-5, atol=2e-5,
    )


def test_extend_capacity_clamp():
    """run_layers_extend force-drops kept tokens beyond remaining capacity
    instead of letting OOB scatters silently corrupt the cache."""
    from dynamic_llava_tpu.ops.kv_cache import init_cache

    cfg = _tiny_cfg()
    tcfg = cfg.text
    params = _params(cfg)
    b, m, cap = 2, 6, 8
    cache = init_cache(tcfg, b, cap, jnp.float32)
    # pre-fill 4 slots: remaining room = cap - 1 - 4 = 3 < m
    cache = cache._replace(length=jnp.full_like(cache.length, 4))
    x = jax.random.normal(jax.random.key(0), (b, m, tcfg.hidden_size))
    positions = jnp.broadcast_to(jnp.arange(4, 4 + m, dtype=jnp.int32)[None], (b, m))
    d = llama.run_layers_extend(params["llm"], tcfg, x, positions, cache)
    assert np.asarray(d.kept).tolist() == [3, 3]
    new_len = d.cache.length + d.kept[None, :]
    assert int(np.asarray(new_len).max()) == cap - 1  # scratch slot untouched
