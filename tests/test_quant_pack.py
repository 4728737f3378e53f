"""Packed-int4 weight format: nibble-packed int8 is the at-rest int4
representation (jnp.int4 buffers cannot be jit args or host-read through
the axon TPU tunnel; packed int8 reads the same 0.5 bytes/weight)."""

import os

import numpy as np

import jax
import jax.numpy as jnp

from dynamic_llava_tpu.ops.quant import (
    dequantize_weight,
    is_quantized,
    pack_int4,
    quantize_weight,
    transfer_quantized_params,
    unpack_int4,
)


def test_pack_unpack_roundtrip_2d():
    rng = np.random.default_rng(0)
    q = rng.integers(-8, 8, size=(16, 12)).astype(np.int8)
    packed = pack_int4(jnp.asarray(q))
    assert packed.shape == (16, 6)
    assert packed.dtype == jnp.int8
    restored = unpack_int4(packed)
    assert restored.dtype == jnp.int8
    np.testing.assert_array_equal(np.asarray(restored), q)


def test_pack_unpack_roundtrip_3d_negative_values():
    rng = np.random.default_rng(1)
    q = rng.integers(-8, 8, size=(3, 10, 6)).astype(np.int8)
    restored = unpack_int4(pack_int4(jnp.asarray(q)))
    np.testing.assert_array_equal(np.asarray(restored), q)


def test_pack_unpack_under_jit():
    rng = np.random.default_rng(2)
    q = rng.integers(-8, 8, size=(8, 8)).astype(np.int8)
    restored = jax.jit(lambda p: unpack_int4(p))(pack_int4(jnp.asarray(q)))
    np.testing.assert_array_equal(np.asarray(restored), q)


def test_quantize_bits4_produces_packed_leaf():
    rng = np.random.default_rng(3)
    w = jnp.asarray(rng.normal(size=(8, 6)), jnp.bfloat16)
    leaf = quantize_weight(w, axis=0, bits=4)
    assert is_quantized(leaf)
    assert set(leaf) == {"q4", "s"}
    assert leaf["q4"].shape == (8, 3)
    deq = np.asarray(dequantize_weight(leaf), np.float32)
    # 4-bit quantization error is bounded by half a step per element
    step = np.asarray(leaf["s"], np.float32)
    assert np.all(np.abs(deq - np.asarray(w, np.float32)) <= step + 1e-6)


def test_transfer_quantized_params_tree():
    rng = np.random.default_rng(4)
    w = jnp.asarray(rng.normal(size=(8, 6)), jnp.bfloat16)
    leaf4 = quantize_weight(w, axis=0, bits=4)
    params = {"layers": {"q": leaf4, "ln": jnp.ones((6,), jnp.bfloat16)}}
    moved = transfer_quantized_params(params, jax.devices()[0])
    assert moved["layers"]["q"]["q4"].dtype == jnp.int8
    np.testing.assert_allclose(
        np.asarray(dequantize_weight(moved["layers"]["q"]), np.float32),
        np.asarray(dequantize_weight(leaf4), np.float32))


def test_init_quantized_bits4_nibble_range_and_stats():
    """Random int4 bench init must match the real quantizer's value range
    (clips to ±7 — never -8) and dequantized stddev ~0.02 (ADVICE r2)."""
    from dynamic_llava_tpu.config import LlamaConfig
    from dynamic_llava_tpu.ops.quant import (
        dequantize_weight,
        init_quantized_llama_params,
        unpack_int4,
    )

    cfg = LlamaConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
    )
    params = init_quantized_llama_params(jax.random.key(0), cfg, bits=4)
    leaf = params["layers"]["q"]
    nibbles = np.asarray(unpack_int4(leaf["q4"]))
    assert nibbles.min() >= -7 and nibbles.max() <= 7
    deq = np.asarray(dequantize_weight(leaf), np.float32)
    assert abs(float(deq.std()) - 0.02) < 0.002


def test_matmul_q4_pallas_matches_xla_oracle():
    """Interpret-mode Pallas single-read dequant matmul vs the XLA split
    path (the semantic oracle) across row regimes and out dtypes."""
    from dynamic_llava_tpu.ops.quant import quantize_weight
    from dynamic_llava_tpu.ops.quant_matmul import (
        matmul_q4_pallas,
        q4_kernel_supported,
    )

    rng = np.random.default_rng(7)
    k_dim, out = 256, 512  # tiles: tk=256, tn=256
    w = jnp.asarray(rng.normal(size=(k_dim, out)) * 0.02, jnp.bfloat16)
    leaf = quantize_weight(w, axis=0, bits=4)
    assert q4_kernel_supported(leaf["q4"].shape, rows=1)

    for rows in (1, 3, 70):
        x = jnp.asarray(rng.normal(size=(rows, k_dim)), jnp.bfloat16)
        # build the XLA oracle explicitly (kernel dispatch is platform-gated)
        p, s = leaf["q4"], leaf["s"]
        half = p.shape[-1]
        lo = (jnp.left_shift(p, 4) >> 4).astype(x.dtype) * s[..., :half].astype(x.dtype)
        hi = (p >> 4).astype(x.dtype) * s[..., half:].astype(x.dtype)
        ref = jnp.concatenate([
            jnp.einsum("ri,io->ro", x, lo), jnp.einsum("ri,io->ro", x, hi)
        ], axis=-1)
        got = matmul_q4_pallas(x, p, s, interpret=True)
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(ref, np.float32),
            atol=2e-2, rtol=2e-2,
        )
        got32 = matmul_q4_pallas(x, p, s, out_fp32=True, interpret=True)
        assert got32.dtype == jnp.float32
        np.testing.assert_allclose(
            np.asarray(got32), np.asarray(ref, np.float32), atol=2e-2, rtol=2e-2
        )

    # leading batch dims reshape correctly
    x3 = jnp.asarray(rng.normal(size=(2, 5, k_dim)), jnp.bfloat16)
    got3 = matmul_q4_pallas(x3, leaf["q4"], leaf["s"], interpret=True)
    assert got3.shape == (2, 5, out)


def test_matmul_q4_pallas_mask_unpack_matches_i32():
    """The narrow-lane nibble unpack (DYNAMIC_LLAVA_Q4_UNPACK=mask: i8
    ANDs + exact bf16 rescale/select — the only i8 op Mosaic legalizes
    on v5e is AND) must be bit-identical to the i32 shift path: both
    recover the same ±7 nibble values exactly."""
    from dynamic_llava_tpu.ops.quant import quantize_weight
    from dynamic_llava_tpu.ops.quant_matmul import matmul_q4_pallas

    rng = np.random.default_rng(21)
    k_dim, out = 256, 512
    w = jnp.asarray(rng.normal(size=(k_dim, out)) * 0.02, jnp.bfloat16)
    leaf = quantize_weight(w, axis=0, bits=4)
    for rows in (1, 24):
        x = jnp.asarray(rng.normal(size=(rows, k_dim)), jnp.bfloat16)
        a = matmul_q4_pallas(
            x, leaf["q4"], leaf["s"], interpret=True, unpack="i32"
        )
        b = matmul_q4_pallas(
            x, leaf["q4"], leaf["s"], interpret=True, unpack="mask"
        )
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_matmul_q4_col_split_matches_oracle():
    """The packed-column split path (vocab-width int4 lm_head at
    batched-decode rows > 48) must reproduce the XLA split-half oracle
    INCLUDING the lo-first output-column layout, and the parts rule must
    engage exactly when the one-block plan does not fit."""
    from dynamic_llava_tpu.ops.quant import quantize_weight
    from dynamic_llava_tpu.ops.quant_matmul import (
        matmul_q4_col_split,
        q4_col_split_parts,
        q4_kernel_supported,
    )

    # real int4 lm_head shape (half=16000): one-block fits through rows=48,
    # a column split covers the rest of the decode row range
    assert q4_kernel_supported((4096, 16000), rows=48)
    assert not q4_kernel_supported((4096, 16000), rows=49)
    # 16000 lanes split 5-ways (3200): halves/quarters are not 128-aligned
    assert q4_col_split_parts((4096, 16000), rows=64) == 5
    assert q4_col_split_parts((4096, 16000), rows=65) == 0
    assert q4_col_split_parts((3, 4096, 16000), rows=24) == 0  # stacked

    rng = np.random.default_rng(17)
    k_dim, out = 256, 1024  # half=512 splits into 2x256-lane blocks
    w = jnp.asarray(rng.normal(size=(k_dim, out)) * 0.02, jnp.bfloat16)
    leaf = quantize_weight(w, axis=0, bits=4)
    p, s = leaf["q4"], leaf["s"]
    half = p.shape[-1]
    assert q4_col_split_parts(p.shape, rows=5) >= 2
    x = jnp.asarray(rng.normal(size=(5, k_dim)), jnp.bfloat16)
    lo = (jnp.left_shift(p, 4) >> 4).astype(x.dtype) * s[..., :half].astype(x.dtype)
    hi = (p >> 4).astype(x.dtype) * s[..., half:].astype(x.dtype)
    ref = jnp.concatenate([
        jnp.einsum("ri,io->ro", x, lo), jnp.einsum("ri,io->ro", x, hi)
    ], axis=-1)
    got = matmul_q4_col_split(x, p, s, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32),
        atol=2e-2, rtol=2e-2,
    )
    got32 = matmul_q4_col_split(x, p, s, out_fp32=True, interpret=True)
    assert got32.dtype == jnp.float32
    np.testing.assert_allclose(
        np.asarray(got32), np.asarray(ref, np.float32), atol=2e-2, rtol=2e-2
    )


def test_matmul_q4_pallas_stacked_layer_index():
    """The streaming kernel consumes the FULL [L, K, half] stack plus a
    layer index (no sliced copy inside a layer scan); every layer must
    match the per-layer XLA oracle."""
    from dynamic_llava_tpu.ops.quant import quantize_weight
    from dynamic_llava_tpu.ops.quant_matmul import matmul_q4_pallas

    rng = np.random.default_rng(8)
    n_layers, k_dim, out = 3, 128, 256
    w = jnp.asarray(rng.normal(size=(n_layers, k_dim, out)) * 0.02, jnp.bfloat16)
    leaf = quantize_weight(w, axis=1, bits=4)  # {"q4": [L,K,half], "s": [L,1,out]}
    x = jnp.asarray(rng.normal(size=(2, k_dim)), jnp.bfloat16)

    for li in range(n_layers):
        p_l = leaf["q4"][li]
        s_l = leaf["s"][li]
        half = p_l.shape[-1]
        lo = (jnp.left_shift(p_l, 4) >> 4).astype(x.dtype) * s_l[..., :half].astype(x.dtype)
        hi = (p_l >> 4).astype(x.dtype) * s_l[..., half:].astype(x.dtype)
        ref = jnp.concatenate(
            [jnp.einsum("ri,io->ro", x, lo), jnp.einsum("ri,io->ro", x, hi)],
            axis=-1,
        )
        got = matmul_q4_pallas(
            x, leaf["q4"], s_l, layer=jnp.int32(li), interpret=True
        )
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(ref, np.float32),
            atol=2e-2, rtol=2e-2,
        )


def test_index_layer_keeps_q4_stack():
    """index_layer must NOT slice packed-int4 stacks (a pallas input can't
    fuse the slice); it attaches the layer index instead."""
    from dynamic_llava_tpu.models.llama import index_layer
    from dynamic_llava_tpu.ops.quant import matmul_q4, quantize_weight

    rng = np.random.default_rng(9)
    w = jnp.asarray(rng.normal(size=(2, 16, 32)) * 0.02, jnp.bfloat16)
    layers = {
        "q": quantize_weight(w, axis=1, bits=4),
        "input_ln": jnp.ones((2, 16), jnp.bfloat16),
    }
    lp = index_layer(layers, jnp.int32(1))
    assert lp["q"]["q4"].shape == (2, 16, 16)  # full stack kept
    assert lp["q"]["s"].shape == (1, 32)  # scales sliced
    assert int(lp["q"]["li"]) == 1
    assert lp["input_ln"].shape == (16,)  # plain leaves still sliced

    # the XLA fallback slices in-graph and matches the dense product
    x = jnp.asarray(rng.normal(size=(1, 16)), jnp.bfloat16)
    got = matmul_q4(x, lp["q"])
    from dynamic_llava_tpu.ops.quant import dequantize_weight

    ref = x @ dequantize_weight(
        {"q4": layers["q"]["q4"][1], "s": layers["q"]["s"][1]}, jnp.bfloat16
    )
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32),
        atol=2e-2, rtol=2e-2,
    )


def test_q4_kernel_dispatch_vmem_rule():
    """Dispatch must reject shapes whose scoped-VMEM stack charge (fp32
    outputs + accumulator carries + DMA window) exceeds the 16 MiB limit:
    the vocab-width lm_head at rows=64 compiled to a 19.4 MiB stack and was
    rejected by the TPU compiler. Layer-width matmuls stay on the kernel at
    every decode batch; lm_head falls back above rows=48."""
    from dynamic_llava_tpu.ops.quant_matmul import q4_kernel_supported

    lm_head = (4096, 16000)  # 32k vocab split-half
    assert q4_kernel_supported(lm_head, rows=8)
    assert q4_kernel_supported(lm_head, rows=48)  # 15.6 MiB — measured ok
    assert not q4_kernel_supported(lm_head, rows=64)  # 20.5 MiB — compiler OOM

    for shape in ((4096, 2048), (4096, 5504), (11008, 2048)):  # 7B layers
        assert q4_kernel_supported(shape, rows=64), shape
    assert not q4_kernel_supported(lm_head, rows=65)  # row cap


def test_matmul_q8_pallas_matches_xla_oracle():
    """Interpret-mode int8 streaming GEMV vs the fused-dequant einsum (the
    semantic oracle) across row regimes, out dtypes, and leading dims."""
    from dynamic_llava_tpu.ops.quant import quantize_weight
    from dynamic_llava_tpu.ops.quant_matmul import (
        matmul_q8_pallas,
        q8_kernel_supported,
    )

    rng = np.random.default_rng(10)
    k_dim, out = 256, 512
    w = jnp.asarray(rng.normal(size=(k_dim, out)) * 0.02, jnp.bfloat16)
    leaf = quantize_weight(w, axis=0, bits=8)
    assert q8_kernel_supported(leaf["q"].shape, rows=1)

    for rows in (1, 3, 24):
        x = jnp.asarray(rng.normal(size=(rows, k_dim)), jnp.bfloat16)
        wd = leaf["q"].astype(x.dtype) * leaf["s"].astype(x.dtype)
        ref = jnp.einsum("ri,io->ro", x, wd)
        got = matmul_q8_pallas(x, leaf["q"], leaf["s"], interpret=True)
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(ref, np.float32),
            atol=2e-2, rtol=2e-2,
        )
        got32 = matmul_q8_pallas(
            x, leaf["q"], leaf["s"], out_fp32=True, interpret=True
        )
        assert got32.dtype == jnp.float32
        np.testing.assert_allclose(
            np.asarray(got32), np.asarray(ref, np.float32),
            atol=2e-2, rtol=2e-2,
        )

    x3 = jnp.asarray(rng.normal(size=(2, 5, k_dim)), jnp.bfloat16)
    got3 = matmul_q8_pallas(x3, leaf["q"], leaf["s"], interpret=True)
    assert got3.shape == (2, 5, out)


def test_matmul_q8_pallas_stacked_layer_index():
    """The int8 kernel consumes the FULL [L, K, N] stack plus a layer
    index (no sliced copy inside a layer scan); every layer must match
    the per-layer oracle."""
    from dynamic_llava_tpu.ops.quant import quantize_weight
    from dynamic_llava_tpu.ops.quant_matmul import matmul_q8_pallas

    rng = np.random.default_rng(11)
    n_layers, k_dim, out = 3, 128, 256
    w = jnp.asarray(
        rng.normal(size=(n_layers, k_dim, out)) * 0.02, jnp.bfloat16
    )
    leaf = quantize_weight(w, axis=1, bits=8)  # {"q": [L,K,N], "s": [L,1,N]}
    x = jnp.asarray(rng.normal(size=(2, k_dim)), jnp.bfloat16)

    for li in range(n_layers):
        wd = leaf["q"][li].astype(x.dtype) * leaf["s"][li].astype(x.dtype)
        ref = jnp.einsum("ri,io->ro", x, wd)
        got = matmul_q8_pallas(
            x, leaf["q"], leaf["s"][li], layer=jnp.int32(li), interpret=True
        )
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(ref, np.float32),
            atol=2e-2, rtol=2e-2,
        )


def test_index_layer_keeps_q8_stack():
    """index_layer must NOT slice int8 stacks either (same pallas-input
    contract as q4); the XLA fallback slices in-graph and matches."""
    from dynamic_llava_tpu.models.llama import index_layer
    from dynamic_llava_tpu.ops.quant import (
        dequantize_weight,
        matmul_q8,
        quantize_weight,
    )

    rng = np.random.default_rng(12)
    w = jnp.asarray(rng.normal(size=(2, 16, 32)) * 0.02, jnp.bfloat16)
    layers = {
        "q": quantize_weight(w, axis=1, bits=8),
        "input_ln": jnp.ones((2, 16), jnp.bfloat16),
    }
    lp = index_layer(layers, jnp.int32(1))
    assert lp["q"]["q"].shape == (2, 16, 32)  # full stack kept
    assert lp["q"]["s"].shape == (1, 32)  # scales sliced
    assert int(lp["q"]["li"]) == 1
    assert lp["input_ln"].shape == (16,)

    x = jnp.asarray(rng.normal(size=(1, 16)), jnp.bfloat16)
    got = matmul_q8(x, lp["q"])
    ref = x @ dequantize_weight(
        {"q": layers["q"]["q"][1], "s": layers["q"]["s"][1]}, jnp.bfloat16
    )
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32),
        atol=2e-2, rtol=2e-2,
    )


def test_q8_kernel_dispatch_vmem_rule():
    """int8 dispatch: decode row counts only; the unsplit-N output block
    must keep the scoped-VMEM stack (fp32 out + fp32 accumulator + DMA
    window) under the scoped limit — the vocab-width lm_head falls back
    above rows=24; 7B layer widths stay on the kernel at every decode
    batch."""
    from dynamic_llava_tpu.ops.quant_matmul import q8_kernel_supported

    lm_head = (4096, 32000)
    assert q8_kernel_supported(lm_head, rows=8)
    assert q8_kernel_supported(lm_head, rows=16)  # 14.3 MiB (3-copy charge)
    assert not q8_kernel_supported(lm_head, rows=24)  # compiler measured
    # 16.38 MiB scoped at this shape; and tk would be 64 lanes at a 2 MB
    # window — the 4 MB tier keeps the K tile at 128 lanes
    for shape in ((4096, 4096), (4096, 11008), (11008, 4096)):
        assert q8_kernel_supported(shape, rows=64), shape
    assert not q8_kernel_supported((4096, 4096), rows=65)  # row cap


def test_matmul_q8_col_split_matches_oracle():
    """The vocab-width column-split path (lm_head at batched-decode rows)
    must reproduce the fused-dequant einsum; the parts rule must engage
    exactly when the one-block plan does not fit."""
    from dynamic_llava_tpu.ops.quant import quantize_weight
    from dynamic_llava_tpu.ops.quant_matmul import (
        matmul_q8_col_split,
        q8_col_split_parts,
        q8_kernel_supported,
    )

    # real lm_head shape: one-block fails at rows=24, a column half fits
    assert not q8_kernel_supported((4096, 32000), rows=24)
    assert q8_col_split_parts((4096, 32000), rows=24) == 2
    assert q8_col_split_parts((4096, 32000), rows=64) == 5  # 32000/4 is
    # not 128-lane aligned; five 6400-wide blocks are
    assert q8_col_split_parts((4096, 32000), rows=65) == 0
    assert q8_col_split_parts((3, 4096, 32000), rows=24) == 0  # stacked

    rng = np.random.default_rng(13)
    k_dim, out = 256, 512
    w = jnp.asarray(rng.normal(size=(k_dim, out)) * 0.02, jnp.bfloat16)
    leaf = quantize_weight(w, axis=0, bits=8)
    x = jnp.asarray(rng.normal(size=(5, k_dim)), jnp.bfloat16)
    wd = leaf["q"].astype(x.dtype) * leaf["s"].astype(x.dtype)
    ref = jnp.einsum("ri,io->ro", x, wd)
    got = matmul_q8_col_split(x, leaf["q"], leaf["s"], interpret=True)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32),
        atol=2e-2, rtol=2e-2,
    )
    got32 = matmul_q8_col_split(
        x, leaf["q"], leaf["s"], out_fp32=True, interpret=True
    )
    assert got32.dtype == jnp.float32


def test_matmul_q8_multi_matches_oracle():
    """The grouped (q/k/v, gate/up) streaming GEMV must match per-weight
    fused-dequant einsums for stacked weights at every layer index."""
    from dynamic_llava_tpu.ops.quant import quantize_weight
    from dynamic_llava_tpu.ops.quant_matmul import (
        _q8_multi_plan,
        matmul_q8_multi_pallas,
    )

    rng = np.random.default_rng(14)
    n_layers, k_dim = 2, 256
    ns = (128, 128, 256)
    leaves = [
        quantize_weight(
            jnp.asarray(
                rng.normal(size=(n_layers, k_dim, n)) * 0.02, jnp.bfloat16
            ),
            axis=1, bits=8,
        )
        for n in ns
    ]
    assert _q8_multi_plan(k_dim, list(ns), rows=3)
    x = jnp.asarray(rng.normal(size=(3, k_dim)), jnp.bfloat16)
    for li in range(n_layers):
        got = matmul_q8_multi_pallas(
            x,
            tuple(l["q"] for l in leaves),
            tuple(l["s"][li] for l in leaves),
            layer=jnp.int32(li),
            interpret=True,
        )
        assert len(got) == len(ns)
        for y, leaf in zip(got, leaves):
            wd = leaf["q"][li].astype(x.dtype) * leaf["s"][li].astype(x.dtype)
            ref = jnp.einsum("ri,io->ro", x, wd)
            np.testing.assert_allclose(
                np.asarray(y, np.float32), np.asarray(ref, np.float32),
                atol=2e-2, rtol=2e-2,
            )


def test_q8_multi_plan_shapes():
    """7B q/k/v and gate/up groups must be plannable at batched-decode
    rows; mixed contraction dims and prefill rows must not."""
    from dynamic_llava_tpu.ops.quant import matmul_q8_group
    from dynamic_llava_tpu.ops.quant_matmul import _q8_multi_plan

    assert _q8_multi_plan(4096, [4096, 4096, 4096], rows=24)
    assert _q8_multi_plan(4096, [4096, 4096, 4096], rows=64)
    assert _q8_multi_plan(4096, [11008, 11008], rows=24)
    assert not _q8_multi_plan(4096, [4096], rows=65)

    # group dispatch: mismatched layer-index identity bails to None
    rng = np.random.default_rng(15)
    import jax as _jax

    from dynamic_llava_tpu.ops.quant import quantize_weight

    w = jnp.asarray(rng.normal(size=(16, 32)) * 0.02, jnp.bfloat16)
    la = quantize_weight(w, axis=0, bits=8)
    lb = dict(quantize_weight(w, axis=0, bits=8))
    la2 = dict(la)
    la2["li"] = jnp.int32(0)
    lb["li"] = jnp.int32(1)  # different index object/value
    x = jnp.asarray(rng.normal(size=(1, 16)), jnp.bfloat16)
    assert matmul_q8_group(x, {"a": la2, "b": lb}, ("a", "b")) is None
    # non-quantized member bails too
    assert matmul_q8_group(x, {"a": la, "b": w}, ("a", "b")) is None


def test_matmul_q4_multi_matches_oracle():
    """The grouped int4 streaming GEMV (q/k/v, gate/up — one launch per
    group) must match per-weight XLA split-half oracles for stacked
    weights at every layer index, in both unpack modes."""
    from dynamic_llava_tpu.ops.quant import quantize_weight
    from dynamic_llava_tpu.ops.quant_matmul import (
        _q4_multi_plan,
        matmul_q4_multi_pallas,
    )

    rng = np.random.default_rng(23)
    n_layers, k_dim = 2, 256
    ns = (256, 256, 512)  # out widths -> halves 128/128/256
    leaves = [
        quantize_weight(
            jnp.asarray(
                rng.normal(size=(n_layers, k_dim, n)) * 0.02, jnp.bfloat16
            ),
            axis=1, bits=4,
        )
        for n in ns
    ]
    halves = [l["q4"].shape[-1] for l in leaves]
    assert _q4_multi_plan(k_dim, halves, rows=3)
    x = jnp.asarray(rng.normal(size=(3, k_dim)), jnp.bfloat16)
    for li in range(n_layers):
        for unpack in ("i32", "mask"):
            got = matmul_q4_multi_pallas(
                x,
                tuple(l["q4"] for l in leaves),
                tuple(l["s"][li] for l in leaves),
                layer=jnp.int32(li),
                interpret=True,
                unpack=unpack,
            )
            assert len(got) == len(ns)
            for y, leaf, half in zip(got, leaves, halves):
                p, s = leaf["q4"][li], leaf["s"][li]
                lo = (jnp.left_shift(p, 4) >> 4).astype(x.dtype) * s[
                    ..., :half
                ].astype(x.dtype)
                hi = (p >> 4).astype(x.dtype) * s[..., half:].astype(
                    x.dtype
                )
                ref = jnp.concatenate([
                    jnp.einsum("ri,io->ro", x, lo),
                    jnp.einsum("ri,io->ro", x, hi),
                ], axis=-1)
                np.testing.assert_allclose(
                    np.asarray(y, np.float32), np.asarray(ref, np.float32),
                    atol=2e-2, rtol=2e-2,
                )


def test_q4_group_dispatch_and_plans():
    """7B int4 q/k/v and gate/up groups must be plannable at decode rows;
    the group dispatcher must bail (not crash) on mixed leaves, mismatched
    layer indices, and prefill row counts."""
    from dynamic_llava_tpu.ops.quant import matmul_q4_group, quantize_weight
    from dynamic_llava_tpu.ops.quant_matmul import _q4_multi_plan

    # 7B shapes: q/k/v halves 2048; gate/up halves 5504
    assert _q4_multi_plan(4096, [2048, 2048, 2048], rows=1)
    assert _q4_multi_plan(4096, [2048, 2048, 2048], rows=24)
    assert _q4_multi_plan(4096, [5504, 5504], rows=24)
    # 13B shapes
    assert _q4_multi_plan(5120, [2560, 2560, 2560], rows=24)
    assert _q4_multi_plan(5120, [6912, 6912], rows=24)
    assert not _q4_multi_plan(4096, [2048], rows=65)

    rng = np.random.default_rng(24)
    w = jnp.asarray(rng.normal(size=(16, 64)) * 0.02, jnp.bfloat16)
    la = quantize_weight(w, axis=0, bits=4)
    lb = dict(quantize_weight(w, axis=0, bits=4))
    la2 = dict(la)
    la2["li"] = jnp.int32(0)
    lb["li"] = jnp.int32(1)
    x = jnp.asarray(rng.normal(size=(1, 16)), jnp.bfloat16)
    assert matmul_q4_group(x, {"a": la2, "b": lb}, ("a", "b")) is None
    assert matmul_q4_group(x, {"a": la, "b": w}, ("a", "b")) is None
    # int8 leaf in an int4 group bails too
    l8 = quantize_weight(w, axis=0, bits=8)
    assert matmul_q4_group(x, {"a": la, "b": l8}, ("a", "b")) is None


def test_matmul_q4_deep_pipeline_matches_oracle():
    """Shapes with many row chunks upgrade the DMA pipeline to 4 slots
    (K // tk > 4); the deeper schedule must stay exact vs the XLA split
    oracle — this is the `down`-projection regime (K=11008 at tk=256 is
    43 chunks) whose depth-2 form measured 49% of roofline."""
    from dynamic_llava_tpu.ops.quant import quantize_weight
    from dynamic_llava_tpu.ops.quant_matmul import (
        _pick_tk,
        matmul_q4_pallas,
    )

    rng = np.random.default_rng(31)
    k_dim, out = 4096, 256  # tk=512 -> 8 chunks -> depth 4
    assert k_dim // _pick_tk(k_dim, out // 2) > 4
    w = jnp.asarray(rng.normal(size=(k_dim, out)) * 0.02, jnp.bfloat16)
    leaf = quantize_weight(w, axis=0, bits=4)
    p, s = leaf["q4"], leaf["s"]
    half = p.shape[-1]
    for rows in (1, 24):
        x = jnp.asarray(rng.normal(size=(rows, k_dim)), jnp.bfloat16)
        lo = (jnp.left_shift(p, 4) >> 4).astype(x.dtype) * s[
            ..., :half
        ].astype(x.dtype)
        hi = (p >> 4).astype(x.dtype) * s[..., half:].astype(x.dtype)
        ref = jnp.concatenate([
            jnp.einsum("ri,io->ro", x, lo),
            jnp.einsum("ri,io->ro", x, hi),
        ], axis=-1)
        got = matmul_q4_pallas(x, p, s, interpret=True)
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(ref, np.float32),
            atol=2e-2, rtol=2e-2,
        )


def test_matmul_q4_multi_deep_pipeline_matches_oracle():
    """Grouped kernel with K // tk > 4 upgrades to the 4-slot DMA
    pipeline; must stay exact vs per-weight oracles."""
    from dynamic_llava_tpu.ops.quant import quantize_weight
    from dynamic_llava_tpu.ops.quant_matmul import matmul_q4_multi_pallas

    rng = np.random.default_rng(33)
    k_dim, ns = 4096, (256, 256)  # tk=512 -> 8 chunks -> depth 4
    leaves = [
        quantize_weight(
            jnp.asarray(rng.normal(size=(k_dim, n)) * 0.02, jnp.bfloat16),
            axis=0, bits=4,
        )
        for n in ns
    ]
    x = jnp.asarray(rng.normal(size=(2, k_dim)), jnp.bfloat16)
    got = matmul_q4_multi_pallas(
        x,
        tuple(l["q4"] for l in leaves),
        tuple(l["s"] for l in leaves),
        interpret=True,
    )
    for y, leaf in zip(got, leaves):
        p, s = leaf["q4"], leaf["s"]
        half = p.shape[-1]
        lo = (jnp.left_shift(p, 4) >> 4).astype(x.dtype) * s[
            ..., :half
        ].astype(x.dtype)
        hi = (p >> 4).astype(x.dtype) * s[..., half:].astype(x.dtype)
        ref = jnp.concatenate([
            jnp.einsum("ri,io->ro", x, lo),
            jnp.einsum("ri,io->ro", x, hi),
        ], axis=-1)
        np.testing.assert_allclose(
            np.asarray(y, np.float32), np.asarray(ref, np.float32),
            atol=2e-2, rtol=2e-2,
        )


def test_matmul_q4_mlp_matches_two_program_path():
    """The fused MLP kernel (gate/up/silu/down in ONE program) must match
    the two-program reference — grouped gate/up GEMV, XLA silu*mul, down
    GEMV — for stacked weights at every layer index and at batched rows.
    The fused kernel forms h in fp32 before the bf16 cast (the reference
    path scales into bf16 first), so the comparison carries the usual
    int4 kernel tolerance, not bit-equality."""
    from dynamic_llava_tpu.ops.quant import dequantize_weight, quantize_weight
    from dynamic_llava_tpu.ops.quant_matmul import (
        _q4_mlp_plan,
        matmul_q4_mlp_pallas,
    )

    rng = np.random.default_rng(31)
    n_layers, k_dim, f_dim = 2, 256, 512
    gate = quantize_weight(
        jnp.asarray(rng.normal(size=(n_layers, k_dim, f_dim)) * 0.05,
                    jnp.bfloat16), axis=1, bits=4)
    up = quantize_weight(
        jnp.asarray(rng.normal(size=(n_layers, k_dim, f_dim)) * 0.05,
                    jnp.bfloat16), axis=1, bits=4)
    down = quantize_weight(
        jnp.asarray(rng.normal(size=(n_layers, f_dim, k_dim)) * 0.05,
                    jnp.bfloat16), axis=1, bits=4)
    assert _q4_mlp_plan(k_dim, f_dim // 2, k_dim // 2, rows=1)

    for rows in (1, 24):
        x = jnp.asarray(rng.normal(size=(rows, k_dim)), jnp.bfloat16)
        for li in range(n_layers):
            got = matmul_q4_mlp_pallas(
                x, gate["q4"], up["q4"], down["q4"],
                gate["s"][li], up["s"][li], down["s"][li],
                layer=jnp.int32(li), interpret=True,
            )
            gd = dequantize_weight(
                {"q4": gate["q4"][li], "s": gate["s"][li]}, jnp.float32)
            ud = dequantize_weight(
                {"q4": up["q4"][li], "s": up["s"][li]}, jnp.float32)
            dd = dequantize_weight(
                {"q4": down["q4"][li], "s": down["s"][li]}, jnp.float32)
            xf = x.astype(jnp.float32)
            ref = (jax.nn.silu(xf @ gd) * (xf @ ud)) @ dd
            assert got.shape == (rows, k_dim)
            np.testing.assert_allclose(
                np.asarray(got, np.float32), np.asarray(ref),
                atol=5e-2, rtol=5e-2,
            )

    # leading batch dims reshape correctly
    x3 = jnp.asarray(rng.normal(size=(2, 3, k_dim)), jnp.bfloat16)
    got3 = matmul_q4_mlp_pallas(
        x3, gate["q4"], up["q4"], down["q4"],
        gate["s"][0], up["s"][0], down["s"][0], interpret=True,
    )
    assert got3.shape == (2, 3, k_dim)


def test_q4_mlp_plan_and_dispatch_rules():
    """7B and 13B MLP shapes must be plannable at decode rows; prefill
    rows must not. The ops.quant dispatcher must refuse LoRA-adapted
    leaves (the delta applies before silu, which the fused kernel cannot
    honor) and mixed-precision groups."""
    from dynamic_llava_tpu.ops.quant import matmul_q4_mlp, quantize_weight
    from dynamic_llava_tpu.ops.quant_matmul import _q4_mlp_plan

    assert _q4_mlp_plan(4096, 5504, 2048, rows=1)  # 7B B=1
    assert _q4_mlp_plan(4096, 5504, 2048, rows=24)  # 7B batched decode
    assert _q4_mlp_plan(5120, 6912, 2560, rows=1)  # 13B B=1
    assert _q4_mlp_plan(4096, 5504, 2048, rows=640) is None  # prefill

    rng = np.random.default_rng(5)
    k_dim, f_dim = 256, 512
    lp = {
        "gate": quantize_weight(
            jnp.asarray(rng.normal(size=(k_dim, f_dim)) * 0.05,
                        jnp.bfloat16), axis=0, bits=4),
        "up": quantize_weight(
            jnp.asarray(rng.normal(size=(k_dim, f_dim)) * 0.05,
                        jnp.bfloat16), axis=0, bits=4),
        "down": quantize_weight(
            jnp.asarray(rng.normal(size=(f_dim, k_dim)) * 0.05,
                        jnp.bfloat16), axis=0, bits=4),
    }
    x = jnp.asarray(rng.normal(size=(1, k_dim)), jnp.bfloat16)
    os.environ["DYNAMIC_LLAVA_Q4_KERNEL"] = "1"
    os.environ["DYNAMIC_LLAVA_Q4_MLP"] = "1"
    try:
        assert matmul_q4_mlp(x, lp, interpret=True) is not None
        lora = {"a": jnp.zeros((k_dim, 2), jnp.bfloat16),
                "b": jnp.zeros((2, f_dim), jnp.bfloat16),
                "s": jnp.float32(1.0)}
        assert matmul_q4_mlp(x, {**lp, "gate_lora": lora}) is None
        assert matmul_q4_mlp(x, {**lp, "down_lora": lora}) is None
        int8_down = quantize_weight(
            jnp.asarray(rng.normal(size=(f_dim, k_dim)) * 0.05,
                        jnp.bfloat16), axis=0, bits=8)
        assert matmul_q4_mlp(x, {**lp, "down": int8_down}) is None
    finally:
        del os.environ["DYNAMIC_LLAVA_Q4_KERNEL"]
        del os.environ["DYNAMIC_LLAVA_Q4_MLP"]
