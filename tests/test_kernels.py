"""Pallas kernel tests (interpret mode on the CPU backend)."""

import functools

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from ctranslate2_tpu.kernels.flash_attention import flash_attention
from ctranslate2_tpu.ops.attention import (
    causal_mask_bias,
    combine_bias,
    dot_product_attention,
    length_mask_bias,
    sliding_window_bias,
)


def _ref(q, k, v, scale, causal, lengths=None, window=0):
    T = q.shape[2]
    Tk = k.shape[2]
    bias = None
    if causal:
        bias = combine_bias(bias, causal_mask_bias(T, Tk))
    if lengths is not None:
        bias = combine_bias(bias, length_mask_bias(lengths, Tk))
    if window:
        bias = combine_bias(bias, sliding_window_bias(T, Tk, window))
    return dot_product_attention(q, k, v, bias=bias, queries_scale=scale)


@pytest.mark.parametrize("case", [
    dict(B=2, Hq=4, Hkv=4, T=64, D=32, causal=True),
    dict(B=2, Hq=4, Hkv=2, T=64, D=32, causal=True),   # GQA
    dict(B=1, Hq=4, Hkv=1, T=96, D=32, causal=False),  # MQA, ragged T
    dict(B=2, Hq=2, Hkv=2, T=64, D=32, causal=True, window=16),
])
def test_flash_attention_matches_reference(case):
    window = case.pop("window", 0)
    B, Hq, Hkv, T, D, causal = (case[k] for k in ("B", "Hq", "Hkv", "T", "D", "causal"))
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (B, Hq, T, D), jnp.float32)
    k = jax.random.normal(jax.random.PRNGKey(1), (B, Hkv, T, D), jnp.float32)
    v = jax.random.normal(jax.random.PRNGKey(2), (B, Hkv, T, D), jnp.float32)
    lengths = jnp.asarray([T - 10] + [T] * (B - 1), jnp.int32)
    scale = 1.0 / np.sqrt(D)

    with pltpu.force_tpu_interpret_mode():
        out = flash_attention(q, k, v, scale=scale, causal=causal,
                              lengths=lengths, window=window,
                              block_q=32, block_k=32)
    ref = _ref(q, k, v, scale, causal, lengths, window)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_flash_attention_q_offset():
    """Chunked continuation: queries at an offset attend causally."""
    B, H, T, D = 1, 2, 64, 32
    key = jax.random.PRNGKey(3)
    q = jax.random.normal(key, (B, H, 32, D), jnp.float32)
    k = jax.random.normal(jax.random.PRNGKey(4), (B, H, T, D), jnp.float32)
    v = jax.random.normal(jax.random.PRNGKey(5), (B, H, T, D), jnp.float32)
    scale = 1.0 / np.sqrt(D)

    with pltpu.force_tpu_interpret_mode():
        out = flash_attention(q, k, v, scale=scale, causal=True, q_offset=32,
                              block_q=32, block_k=32)
    # Reference: causal bias with offset.
    bias = causal_mask_bias(32, T, offset=32)
    ref = dot_product_attention(q, k, v, bias=bias, queries_scale=scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_small_top_k_matches_lax():
    from ctranslate2_tpu.decoding.sampling import small_top_k

    x = jax.random.normal(jax.random.PRNGKey(0), (4, 1000), jnp.float32)
    v1, i1 = small_top_k(x, 4)
    v2, i2 = jax.lax.top_k(x, 4)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))


# ---------------------------------------------------------------------------
# Quantized matmul kernels (interpret mode on CPU).
# ---------------------------------------------------------------------------


def test_matmul_w4a16_interpret():
    import numpy as np
    import jax.numpy as jnp
    from ctranslate2_tpu.kernels import quant_matmul as qm

    rng = np.random.default_rng(0)
    M, K, N, G = 5, 384, 256, 128
    x = rng.standard_normal((M, K)).astype(np.float32)
    w4 = rng.integers(-15, 16, (K, N)).astype(np.int8)
    gs = (rng.random((K // G, N)) * 0.1 + 0.01).astype(np.float32)
    ref = x @ (w4.astype(np.float32) * np.repeat(gs, G, 0))
    out = qm.matmul_w4a16(jnp.asarray(x), jnp.asarray(w4), jnp.asarray(gs),
                          interpret=True)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-5, atol=1e-4)
    assert qm.w4a16_supported((M, K), w4.shape, gs.shape)


def test_matmul_w4a16_multi_group_block():
    import numpy as np
    import jax.numpy as jnp
    from ctranslate2_tpu.kernels import quant_matmul as qm

    rng = np.random.default_rng(1)
    M, K, N, G = 3, 512, 128, 128
    x = rng.standard_normal((M, K)).astype(np.float32)
    w4 = rng.integers(-15, 16, (K, N)).astype(np.int8)
    gs = (rng.random((K // G, N)) * 0.1 + 0.01).astype(np.float32)
    ref = x @ (w4.astype(np.float32) * np.repeat(gs, G, 0))
    out = qm.matmul_w4a16(jnp.asarray(x), jnp.asarray(w4), jnp.asarray(gs),
                          block_k=512, interpret=True)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-5, atol=1e-4)


def test_matmul_w4a16_fold_interpret():
    """Scale-folded single-dot W4 variant == the per-group kernel."""
    import numpy as np
    import jax.numpy as jnp
    from ctranslate2_tpu.kernels import quant_matmul as qm

    rng = np.random.default_rng(3)
    M, K, N, G = 5, 512, 256, 128
    x = rng.standard_normal((M, K)).astype(np.float32)
    w4 = rng.integers(-15, 16, (K, N)).astype(np.int8)
    gs = (rng.random((K // G, N)) * 0.1 + 0.01).astype(np.float32)
    ref = x @ (w4.astype(np.float32) * np.repeat(gs, G, 0))
    out = qm.matmul_w4a16_fold(
        jnp.asarray(x), jnp.asarray(w4), jnp.asarray(gs),
        block_k=256, interpret=True)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-5, atol=1e-4)


def test_matmul_w4p_fold_interpret():
    """Scale-folded packed-nibble variant == matmul_w4p (zero-point
    correction runs as an XLA dot outside the kernel)."""
    import numpy as np
    import jax.numpy as jnp
    from ctranslate2_tpu.kernels import quant_matmul as qm

    rng = np.random.default_rng(4)
    M, K, N, G = 4, 512, 256, 128
    q4 = rng.integers(0, 16, (K, N)).astype(np.int32)
    packed = (q4[: K // 2] | (q4[K // 2:] << 4)).astype(np.uint8).astype(
        np.int8)
    gs = (rng.random((K // G, N)) * 0.1 + 0.01).astype(np.float32)
    zs = (rng.random((K // G, N)) * 0.5).astype(np.float32)
    x = rng.standard_normal((M, K)).astype(np.float32)
    w = q4.astype(np.float32) * np.repeat(gs, G, 0) - np.repeat(zs, G, 0)
    ref = x @ w
    base = qm.matmul_w4p(jnp.asarray(x), jnp.asarray(packed),
                         jnp.asarray(gs), jnp.asarray(zs),
                         block_k=128, interpret=True)
    fold = qm.matmul_w4p_fold(jnp.asarray(x), jnp.asarray(packed),
                              jnp.asarray(gs), jnp.asarray(zs),
                              block_k=128, interpret=True)
    np.testing.assert_allclose(np.asarray(base), ref, rtol=2e-4, atol=2e-3)
    np.testing.assert_allclose(np.asarray(fold), ref, rtol=2e-4, atol=2e-3)


def test_matmul_w8a8_interpret():
    import numpy as np
    import jax.numpy as jnp
    from ctranslate2_tpu.kernels import quant_matmul as qm

    rng = np.random.default_rng(2)
    M, K, N = 7, 256, 384
    q = rng.integers(-127, 128, (M, K)).astype(np.int8)
    wq = rng.integers(-127, 128, (K, N)).astype(np.int8)
    a_s = (rng.random(M) * 5 + 0.5).astype(np.float32)
    w_s = (rng.random(N) * 5 + 0.5).astype(np.float32)
    ref = (q.astype(np.int64) @ wq.astype(np.int64)) / np.outer(a_s, w_s)
    out = qm.matmul_w8a8(jnp.asarray(q), jnp.asarray(wq), jnp.asarray(a_s),
                         jnp.asarray(w_s), interpret=True)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-5)


def test_decode_attention_int8_interpret():
    import numpy as np
    import jax.numpy as jnp
    from ctranslate2_tpu.kernels.decode_attention import (
        decode_attention_int8, quantize_kv)

    rng = np.random.default_rng(0)
    B, Hq, Hkv, C, D = 2, 4, 2, 64, 32
    q = rng.standard_normal((B, Hq, 1, D)).astype(np.float32)
    k = rng.standard_normal((B, Hkv, C, D)).astype(np.float32)
    v = rng.standard_normal((B, Hkv, C, D)).astype(np.float32)
    lengths = np.array([40, 64], np.int32)
    scale = 1 / np.sqrt(D)

    k8, ks = quantize_kv(jnp.asarray(k))
    v8, vs = quantize_kv(jnp.asarray(v))
    out = decode_attention_int8(
        jnp.asarray(q), k8, ks, v8, vs, jnp.asarray(lengths), scale=scale,
        block_c=32, interpret=True)

    kd = np.asarray(k8).astype(np.float32) / np.asarray(ks)[..., None]
    vd = np.asarray(v8).astype(np.float32) / np.asarray(vs)[..., None]
    g = Hq // Hkv
    ref = np.zeros((B, Hq, 1, D), np.float32)
    for b in range(B):
        for h in range(Hq):
            s = (q[b, h, 0] * scale) @ kd[b, h // g].T
            s[lengths[b]:] = -1e30
            p = np.exp(s - s.max())
            p /= p.sum()
            ref[b, h, 0] = p @ vd[b, h // g]
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-5)


def test_decode_attention_int8_sliding_window():
    import numpy as np
    import jax.numpy as jnp
    from ctranslate2_tpu.kernels.decode_attention import (
        decode_attention_int8, quantize_kv)

    rng = np.random.default_rng(1)
    B, H, C, D, W = 1, 2, 64, 32, 16
    q = rng.standard_normal((B, H, 1, D)).astype(np.float32)
    k = rng.standard_normal((B, H, C, D)).astype(np.float32)
    v = rng.standard_normal((B, H, C, D)).astype(np.float32)
    lengths = np.array([48], np.int32)
    k8, ks = quantize_kv(jnp.asarray(k))
    v8, vs = quantize_kv(jnp.asarray(v))
    out = decode_attention_int8(
        jnp.asarray(q), k8, ks, v8, vs, jnp.asarray(lengths),
        scale=0.2, window=W, block_c=32, interpret=True)

    kd = np.asarray(k8).astype(np.float32) / np.asarray(ks)[..., None]
    vd = np.asarray(v8).astype(np.float32) / np.asarray(vs)[..., None]
    ref = np.zeros((B, H, 1, D), np.float32)
    for h in range(H):
        s = (q[0, h, 0] * 0.2) @ kd[0, h].T
        s[:48 - W] = -1e30
        s[48:] = -1e30
        p = np.exp(s - s.max())
        p /= p.sum()
        ref[0, h, 0] = p @ vd[0, h]
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-5)


def test_fused_norm_kernel():
    import numpy as np
    import jax.numpy as jnp
    from ctranslate2_tpu.kernels.norms import fused_norm
    from ctranslate2_tpu.ops.norms import layer_norm, rms_norm

    rng = np.random.default_rng(0)
    x = rng.standard_normal((5, 7, 128)).astype(np.float32)
    g = rng.standard_normal(128).astype(np.float32)
    b = rng.standard_normal(128).astype(np.float32)

    out_ln = fused_norm(jnp.asarray(x), jnp.asarray(g), jnp.asarray(b),
                        eps=1e-5, interpret=True)
    ref_ln = layer_norm(jnp.asarray(x), jnp.asarray(g), jnp.asarray(b), 1e-5)
    np.testing.assert_allclose(np.asarray(out_ln), np.asarray(ref_ln),
                               rtol=1e-5, atol=1e-5)

    out_rms = fused_norm(jnp.asarray(x), jnp.asarray(g), eps=1e-6,
                         interpret=True)
    ref_rms = rms_norm(jnp.asarray(x), jnp.asarray(g), 1e-6)
    np.testing.assert_allclose(np.asarray(out_rms), np.asarray(ref_rms),
                               rtol=1e-5, atol=1e-5)


def test_decode_attention_int8_fresh_token():
    """Fresh-token variant == append-then-attend, incl. window and a row
    whose pre-update cache is empty."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from ctranslate2_tpu.kernels.decode_attention import (
        decode_attention_int8, quantize_kv)

    rng = np.random.default_rng(2)
    B, Hq, Hkv, C, D = 3, 4, 2, 64, 32
    q = rng.standard_normal((B, Hq, 1, D)).astype(np.float32)
    k = rng.standard_normal((B, Hkv, C, D)).astype(np.float32)
    v = rng.standard_normal((B, Hkv, C, D)).astype(np.float32)
    kn = rng.standard_normal((B, Hkv, 1, D)).astype(np.float32)
    vn = rng.standard_normal((B, Hkv, 1, D)).astype(np.float32)
    pre_lengths = np.array([40, 64 - 1, 0], np.int32)
    scale = 1 / np.sqrt(D)

    k8, ks = quantize_kv(jnp.asarray(k))
    v8, vs = quantize_kv(jnp.asarray(v))
    kn8, kns = quantize_kv(jnp.asarray(kn))
    vn8, vns = quantize_kv(jnp.asarray(vn))

    for window in (0, 16):
        out = decode_attention_int8(
            jnp.asarray(q), k8, ks, v8, vs, jnp.asarray(pre_lengths),
            k_new8=kn8, kn_scale=kns, v_new8=vn8, vn_scale=vns,
            scale=scale, window=window, block_c=32, interpret=True)

        # Reference: physically append the fresh token then attend.
        k8u, ksu, v8u, vsu = (np.asarray(a).copy() for a in (k8, ks, v8, vs))
        for b in range(B):
            p = pre_lengths[b]
            k8u[b, :, p] = np.asarray(kn8)[b, :, 0]
            ksu[b, :, p] = np.asarray(kns)[b, :, 0]
            v8u[b, :, p] = np.asarray(vn8)[b, :, 0]
            vsu[b, :, p] = np.asarray(vns)[b, :, 0]
        ref = decode_attention_int8(
            jnp.asarray(q), jnp.asarray(k8u), jnp.asarray(ksu),
            jnp.asarray(v8u), jnp.asarray(vsu),
            jnp.asarray(pre_lengths + 1),
            scale=scale, window=window, block_c=32, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)


def test_flash_attention_segment_ids():
    """Packed sequences: queries attend only their own segment's keys
    (SURVEY kernel #3)."""
    B, H, T, D = 2, 2, 256, 32
    q = jax.random.normal(jax.random.PRNGKey(3), (B, H, T, D), jnp.float32)
    k = jax.random.normal(jax.random.PRNGKey(4), (B, H, T, D), jnp.float32)
    v = jax.random.normal(jax.random.PRNGKey(5), (B, H, T, D), jnp.float32)
    # Two packed sequences per row: [0]*160 + [1]*96.
    seg = jnp.asarray([[0] * 160 + [1] * 96] * B, jnp.int32)
    scale = 1.0 / np.sqrt(D)

    with pltpu.force_tpu_interpret_mode():
        out = flash_attention(q, k, v, scale=scale, causal=True,
                              segment_ids=seg, block_q=128, block_k=128)

    from ctranslate2_tpu.ops.attention import NEG_INF as XNEG

    bias = np.asarray(causal_mask_bias(T, T))
    same = (np.asarray(seg)[:, :, None] == np.asarray(seg)[:, None, :])
    bias = bias + np.where(same, 0.0, XNEG)[:, None]
    ref = dot_product_attention(q, k, v, bias=jnp.asarray(bias),
                                queries_scale=scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize("positive", [False, True])
def test_flash_attention_alibi(positive):
    """In-kernel ALiBi matches the XLA additive-bias path for both
    position conventions."""
    from ctranslate2_tpu.ops.positions import alibi_slopes

    B, H, T, D = 1, 4, 64, 32
    q = jax.random.normal(jax.random.PRNGKey(6), (B, H, T, D), jnp.float32)
    k = jax.random.normal(jax.random.PRNGKey(7), (B, H, T, D), jnp.float32)
    v = jax.random.normal(jax.random.PRNGKey(8), (B, H, T, D), jnp.float32)
    slopes = jnp.asarray(alibi_slopes(H), jnp.float32)
    scale = 1.0 / np.sqrt(D)

    with pltpu.force_tpu_interpret_mode():
        out = flash_attention(q, k, v, scale=scale, causal=True,
                              alibi_slopes=slopes, alibi_positive=positive,
                              block_q=32, block_k=32)

    positions = np.arange(T, dtype=np.float32)
    if not positive:
        positions = positions - (T - 1)
    alibi_bias = (np.asarray(slopes)[:, None, None]
                  * positions[None, None, :])  # [H, 1, T]
    bias = combine_bias(causal_mask_bias(T, T),
                        jnp.asarray(alibi_bias)[None])
    ref = dot_product_attention(q, k, v, bias=bias, queries_scale=scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize("bidirectional", [True, False])
def test_flash_attention_t5_rel_bias(bidirectional):
    """In-kernel T5 relative-position bias (recomputed bucket indices +
    SMEM table reads) matches the XLA path that materializes the dense
    [H, Tq, Tk] bias (reference: src/layers/attention.cc:51-126)."""
    from ctranslate2_tpu.ops.attention import t5_position_bias

    B, H, T, D = 2, 4, 64, 32
    num_buckets, max_distance = 32, 128
    q = jax.random.normal(jax.random.PRNGKey(9), (B, H, T, D), jnp.float32)
    k = jax.random.normal(jax.random.PRNGKey(10), (B, H, T, D), jnp.float32)
    v = jax.random.normal(jax.random.PRNGKey(11), (B, H, T, D), jnp.float32)
    table = jax.random.normal(jax.random.PRNGKey(12), (num_buckets, H),
                              jnp.float32)
    causal = not bidirectional  # encoder: bidirectional; decoder: causal
    scale = 1.0 / np.sqrt(D)

    with pltpu.force_tpu_interpret_mode():
        out = flash_attention(q, k, v, scale=scale, causal=causal,
                              rel_bias_table=table,
                              rel_max_distance=max_distance,
                              rel_bidirectional=bidirectional,
                              block_q=32, block_k=32)

    bias = t5_position_bias(table, T, T, max_distance, bidirectional)[None]
    if causal:
        bias = combine_bias(causal_mask_bias(T, T), bias)
    ref = dot_product_attention(q, k, v, bias=bias, queries_scale=scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)
