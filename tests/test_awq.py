"""AWQ 4-bit quantization: layouts, dequant identity, and end-to-end load.

Covers the capability of the reference's AWQ op family
(reference: src/ops/awq/*, converter side transformers.py:237-248).
"""

import numpy as np
import pytest
import jax.numpy as jnp

from ctranslate2_tpu.ops import awq
from ctranslate2_tpu.ops.linear import linear
from ctranslate2_tpu.converters.builder import build_decoder_only_model
from ctranslate2_tpu import Generator


def test_pack_unpack_gemm_roundtrip():
    rng = np.random.default_rng(0)
    w4 = rng.integers(0, 16, size=(64, 48), dtype=np.uint8)
    packed = awq.pack_awq_gemm(w4)
    assert packed.shape == (64, 6)
    assert packed.dtype == np.int32
    np.testing.assert_array_equal(awq.unpack_awq_gemm(packed), w4)


def test_pack_unpack_gemv_roundtrip():
    rng = np.random.default_rng(1)
    w4 = rng.integers(0, 16, size=(48, 64), dtype=np.uint8)  # (out, in)
    packed = awq.pack_awq_gemv(w4)
    assert packed.shape == (48, 8)
    np.testing.assert_array_equal(awq.unpack_awq_gemv(packed), w4)


@pytest.mark.parametrize("quant_type", [awq.AWQ_GEMM, awq.AWQ_GEMV])
def test_quantize_dequantize_error(quant_type):
    rng = np.random.default_rng(2)
    w = (rng.standard_normal((96, 64)) * 0.1).astype(np.float32)  # (out, in)
    qw, scales, qz = awq.quantize_awq(w, group_size=16, quant_type=quant_type)
    w_hat = awq.dequantize_awq(qw, scales, qz, quant_type)  # (in, out)
    assert w_hat.shape == (64, 96)
    # 4-bit asymmetric min/max quant: error bounded by half a step per group.
    step = (w.max(axis=1) - w.min(axis=1)).max() / 15.0
    assert np.max(np.abs(w_hat - w.T)) <= step / 2 + 1e-6


@pytest.mark.parametrize("quant_type", [awq.AWQ_GEMM, awq.AWQ_GEMV])
def test_linear_w4_matches_dequant_matmul(quant_type):
    rng = np.random.default_rng(3)
    w = (rng.standard_normal((32, 64)) * 0.1).astype(np.float32)  # (out, in)
    x = rng.standard_normal((4, 64)).astype(np.float32)
    qw, scales, qz = awq.quantize_awq(w, group_size=32, quant_type=quant_type)

    params = awq.build_awq_linear(qw, scales, qz, quant_type)
    params = {k: jnp.asarray(v) for k, v in params.items()}
    y = np.asarray(linear(params, jnp.asarray(x)))

    w_hat = awq.dequantize_awq(qw, scales, qz, quant_type)
    np.testing.assert_allclose(y, x @ w_hat, rtol=1e-5, atol=1e-5)


def test_zero_point_folding_is_exact():
    rng = np.random.default_rng(4)
    w = (rng.standard_normal((16, 32)) * 0.3).astype(np.float32)
    qw, scales, qz = awq.quantize_awq(w, group_size=8)
    w4, zeros, s = awq.unpack_to_in_out(qw, scales, qz)
    params = awq.build_awq_linear(qw, scales, qz)
    G = w4.shape[0] // zeros.shape[0]
    manual = (w4.astype(np.float32) - np.repeat(zeros, G, 0)) \
        * np.repeat(s, G, 0)
    folded = params["w4"].astype(np.float32) * np.repeat(s, G, 0)
    np.testing.assert_array_equal(manual, folded)


@pytest.fixture(scope="module")
def awq_model_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("awq"))
    build_decoder_only_model(d, vocab_size=32, num_layers=2, num_heads=4,
                             d_model=32, d_ff=64, quantization="awq_gemm")
    return d


def test_awq_model_generates(awq_model_dir):
    gen = Generator(awq_model_dir)
    out = gen.generate_batch([["tok1", "tok2"]], max_length=6)
    assert out[0].sequences


def test_awq_logits_close_to_float(awq_model_dir, tmp_path_factory):
    """AWQ forward tracks the float model within 4-bit group-quant error."""
    d_float = str(tmp_path_factory.mktemp("float"))
    build_decoder_only_model(d_float, vocab_size=32, num_layers=2,
                             num_heads=4, d_model=32, d_ff=64)
    ga = Generator(awq_model_dir)
    gf = Generator(d_float)
    prompts = [["tok1", "tok2", "tok3", "tok4"]]
    la = ga.forward_batch(prompts)
    lf = gf.forward_batch(prompts)
    assert np.allclose(np.asarray(la), np.asarray(lf), atol=0.15)


def test_awq_hf_conversion(tmp_path):
    """Converting a checkpoint whose linears are AutoAWQ-style modules
    passes the packed payload through and reproduces the float logits."""
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    from ctranslate2_tpu.converters.transformers_conv import (
        TransformersConverter,
    )
    from ctranslate2_tpu.models.loader import load_model
    from ctranslate2_tpu.models import transformer as T

    cfg = transformers.LlamaConfig(
        vocab_size=64, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64)
    model = transformers.LlamaForCausalLM(cfg).eval()

    class WQLinear_GEMM(torch.nn.Module):
        w_bit = 4
        group_size = 16

        def __init__(self, lin):
            super().__init__()
            qw, scales, qz = awq.quantize_awq(
                lin.weight.detach().numpy(), self.group_size, awq.AWQ_GEMM)
            self.qweight = torch.tensor(qw)
            self.scales = torch.tensor(scales)
            self.qzeros = torch.tensor(qz)
            self.bias = lin.bias
            # Make the torch forward use the dequantized weights so the HF
            # reference logits include the quantization error.
            self.w_hat = torch.tensor(
                awq.dequantize_awq(qw, scales, qz, awq.AWQ_GEMM))

        def forward(self, x):
            y = x @ self.w_hat
            return y if self.bias is None else y + self.bias

    for layer in model.model.layers:
        a, m = layer.self_attn, layer.mlp
        a.q_proj = WQLinear_GEMM(a.q_proj)
        a.k_proj = WQLinear_GEMM(a.k_proj)
        a.v_proj = WQLinear_GEMM(a.v_proj)
        a.o_proj = WQLinear_GEMM(a.o_proj)
        m.gate_proj = WQLinear_GEMM(m.gate_proj)
        m.up_proj = WQLinear_GEMM(m.up_proj)
        m.down_proj = WQLinear_GEMM(m.down_proj)

    class DummyTokenizer:
        bos_token, eos_token, unk_token = "<s>", "</s>", "<unk>"

        def get_vocab(self):
            return {f"tk{i}": i for i in range(64)}

    out_dir = str(tmp_path / "awq_llama")
    TransformersConverter(model=model, tokenizer=DummyTokenizer()).convert(
        out_dir, force=True)

    m = load_model(out_dir, compute_type="float32")
    assert int(m.config["quantization_type"]) == awq.AWQ_GEMM
    ids = jnp.asarray([[4, 9, 17, 23, 5, 11, 30, 8]], dtype=jnp.int32)
    lengths = jnp.full((1,), ids.shape[1], jnp.int32)
    ours, _, _ = T.decoder_forward_jit(
        m.arch, m.params, m.consts, ids, jnp.int32(0), None, None, None,
        lengths=lengths, quantize_acts=False, out_dtype=jnp.float32)

    import torch as _t
    with _t.no_grad():
        theirs = model(_t.tensor(np.asarray(ids), dtype=_t.long)).logits
    np.testing.assert_allclose(
        np.asarray(ours), theirs.float().numpy(), atol=2e-3, rtol=1e-3)


def test_packed_w4_layout_roundtrip():
    rng = np.random.default_rng(10)
    w = (rng.standard_normal((96, 256)) * 0.1).astype(np.float32)
    qw, s, qz = awq.quantize_awq(w, group_size=128)
    p = awq.build_awq_linear_packed(qw, s, qz)
    w4, zeros, sc = awq.unpack_to_in_out(qw, s, qz)
    np.testing.assert_array_equal(awq.unpack_w4p(p["w4p"]), w4)
    # dequant identity: q*s - z*s == (q - z)*s
    G = 128
    deq1 = (w4.astype(np.float32) - np.repeat(zeros, G, 0)) * np.repeat(sc, G, 0)
    deq2 = (awq.unpack_w4p(p["w4p"]).astype(np.float32)
            * np.repeat(p["g_scale"], G, 0) - np.repeat(p["g_zs"], G, 0))
    np.testing.assert_allclose(deq1, deq2, rtol=1e-6)


def test_matmul_w4p_kernel():
    import jax
    from ctranslate2_tpu.kernels.quant_matmul import matmul_w4p, w4p_supported

    rng = np.random.default_rng(11)
    K, N, G, M = 512, 256, 128, 5
    w = (rng.standard_normal((N, K)) * 0.1).astype(np.float32)
    qw, s, qz = awq.quantize_awq(w, group_size=G)
    p = awq.build_awq_linear_packed(qw, s, qz)
    x = rng.standard_normal((M, K)).astype(np.float32)
    assert w4p_supported((M, K), p["w4p"].shape, p["g_scale"].shape)

    # The CPU backend's default matmul is low-precision; force exact dots
    # so the comparison isolates kernel correctness.
    with jax.default_matmul_precision("highest"):
        out = matmul_w4p(
            jnp.asarray(x), jnp.asarray(p["w4p"]),
            jnp.asarray(p["g_scale"]), jnp.asarray(p["g_zs"]),
            block_k=128, interpret=True)
        ref = x @ awq.dequantize_awq(qw, s, qz)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=2e-4)


def test_packed_w4_linear_fallback(monkeypatch):
    """The XLA fallback path of the packed layout matches dequant matmul."""
    import jax
    from ctranslate2_tpu.ops.linear import linear as lin

    rng = np.random.default_rng(12)
    K, N, G, M = 256, 128, 128, 3
    w = (rng.standard_normal((N, K)) * 0.1).astype(np.float32)
    qw, s, qz = awq.quantize_awq(w, group_size=G)
    p = {k: jnp.asarray(v) for k, v in
         awq.build_awq_linear_packed(qw, s, qz).items()}
    x = rng.standard_normal((M, K)).astype(np.float32)
    with jax.default_matmul_precision("highest"):
        y = np.asarray(lin(p, jnp.asarray(x)))
        ref = x @ awq.dequantize_awq(qw, s, qz)
    np.testing.assert_allclose(y, ref, rtol=2e-4, atol=2e-4)


def test_awq_packed_model_generates(tmp_path, monkeypatch):
    """End-to-end: packed payload (CT2TPU_W4_PACKED=1) generates the same
    tokens as the unpacked layout."""
    from ctranslate2_tpu.converters.builder import build_decoder_only_model

    d = build_decoder_only_model(
        str(tmp_path / "awqp"), vocab_size=32, num_layers=2, num_heads=4,
        d_model=32, d_ff=64, quantization="awq_gemm")
    monkeypatch.setenv("CT2TPU_W4_PACKED", "0")
    ref = Generator(d).generate_batch([["tok1", "tok2"]],
                                      max_length=8)[0].sequences[0]
    monkeypatch.setenv("CT2TPU_W4_PACKED", "1")
    out = Generator(d).generate_batch([["tok1", "tok2"]],
                                      max_length=8)[0].sequences[0]
    assert out == ref
