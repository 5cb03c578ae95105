"""Wav2Vec2Bert (conformer) encoder: spec, params, and forward.

Capability parity with the reference's Wav2Vec2Bert stack
(reference: src/layers/wav2vec2bert.cc, python wav2vec2bert_spec.py):
feature projection -> N conformer encoder layers (half-step FFN sandwich,
self-attention with asymmetric relative positions, GLU pointwise +
causal depthwise conv module) -> M adapter layers (stride-2 GLU convs +
attention + FFN) -> optional CTC LM head.

Artifact scopes: ``encoder/fp_layer_norm``, ``encoder/encoder_layers_i/*``
(reference: include/ctranslate2/layers/common.h:26-38 list naming),
``encoder/adapter_layers_i/*``, ``encoder/lm_head``.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from ..formats.model_file import ModelFile
from ..ops.activations import relu, swish
from ..ops.conv import conv1d
from ..ops.linear import linear
from ..ops.norms import apply_norm
from ..ops import attention as attn_ops


@dataclass(frozen=True)
class Wav2Vec2BertSpec:
    num_encoder_layers: int
    num_adapter_layers: int
    num_heads: int
    rel_left_max: int
    rel_right_max: int
    has_lm_head: bool


def extract_wav2vec2bert(mf: ModelFile) -> Wav2Vec2BertSpec:
    sc = "encoder"
    n_enc = 0
    while f"{sc}/encoder_layers_{n_enc}/enc_ffn1/linear_0/weight" in mf:
        n_enc += 1
    n_adpt = 0
    while f"{sc}/adapter_layers_{n_adpt}/adpt_ffn/linear_0/weight" in mf:
        n_adpt += 1
    l0 = f"{sc}/encoder_layers_0"
    return Wav2Vec2BertSpec(
        num_encoder_layers=n_enc,
        num_adapter_layers=n_adpt,
        # The reference defaults to 16 heads; the spec serializes none
        # (reference: src/layers/wav2vec2bert.cc:11).
        num_heads=int(mf.attribute(f"{l0}/enc_attn/num_heads",
                                   mf.attribute(f"{l0}/num_heads", 16))),
        rel_left_max=int(mf.attribute(f"{l0}/enc_attn/relative_left_max_position", 0)),
        rel_right_max=int(mf.attribute(f"{l0}/enc_attn/relative_right_max_position", 0)),
        has_lm_head=f"{sc}/lm_head/weight" in mf,
    )


def is_wav2vec2bert(mf: ModelFile) -> bool:
    return (mf.spec_name == "Wav2Vec2BertSpec"
            or "encoder/encoder_layers_0/enc_ffn1/linear_0/weight" in mf)


def build_wav2vec2bert_params(mf: ModelFile, spec: Wav2Vec2BertSpec, policy):
    from .params import ParamsBuilder, finalize_params

    b = ParamsBuilder(mf, policy)
    sc = "encoder"
    out = {
        "fp_layer_norm": b.norm(f"{sc}/fp_layer_norm"),
        "fp_projection": b.linear(f"{sc}/fp_projection"),
        "encoder_layers": [],
        "adapter_layers": [],
    }
    for i in range(spec.num_encoder_layers):
        ls = f"{sc}/encoder_layers_{i}"
        att = f"{ls}/enc_attn"
        lp = {
            "enc_ffn1_layer_norm": b.norm(f"{ls}/enc_ffn1_layer_norm"),
            "enc_ffn1": {
                "linear_0": b.linear(f"{ls}/enc_ffn1/linear_0"),
                "linear_1": b.linear(f"{ls}/enc_ffn1/linear_1"),
            },
            "enc_attn_layer_norm": b.norm(f"{ls}/enc_attn_layer_norm"),
            "enc_attn": {
                "linear_0": b.linear(f"{att}/linear_0"),
                "linear_1": b.linear(f"{att}/linear_1"),
            },
            "enc_conv_layer_norm": b.norm(f"{ls}/enc_conv_layer_norm"),
            "enc_conv_pointwise_conv1": b.conv(f"{ls}/enc_conv_pointwise_conv1"),
            "enc_conv_depthwise_conv": b.conv(f"{ls}/enc_conv_depthwise_conv"),
            "enc_conv_depthwise_layer_norm": b.norm(
                f"{ls}/enc_conv_depthwise_layer_norm"),
            "enc_conv_pointwise_conv2": b.conv(f"{ls}/enc_conv_pointwise_conv2"),
            "enc_ffn2_layer_norm": b.norm(f"{ls}/enc_ffn2_layer_norm"),
            "enc_ffn2": {
                "linear_0": b.linear(f"{ls}/enc_ffn2/linear_0"),
                "linear_1": b.linear(f"{ls}/enc_ffn2/linear_1"),
            },
            "enc_final_layer_norm": b.norm(f"{ls}/enc_final_layer_norm"),
        }
        rel = b.array(f"{att}/relative_asymmetric_position_keys",
                      dtype=jnp.float32)
        if rel is not None:
            lp["enc_attn"]["relative_asymmetric_position_keys"] = rel
        out["encoder_layers"].append(lp)

    for i in range(spec.num_adapter_layers):
        ls = f"{sc}/adapter_layers_{i}"
        out["adapter_layers"].append({
            "adpt_residual_layer_norm": b.norm(f"{ls}/adpt_residual_layer_norm"),
            "adpt_residual_conv": b.conv(f"{ls}/adpt_residual_conv"),
            "adpt_attn_layer_norm": b.norm(f"{ls}/adpt_attn_layer_norm"),
            "adpt_attn_conv": b.conv(f"{ls}/adpt_attn_conv"),
            "adpt_attn_layer": {
                "linear_0": b.linear(f"{ls}/adpt_attn_layer/linear_0"),
                "linear_1": b.linear(f"{ls}/adpt_attn_layer/linear_1"),
            },
            "adpt_ffn_layer_norm": b.norm(f"{ls}/adpt_ffn_layer_norm"),
            "adpt_ffn": {
                "linear_0": b.linear(f"{ls}/adpt_ffn/linear_0"),
                "linear_1": b.linear(f"{ls}/adpt_ffn/linear_1"),
            },
        })

    if spec.has_lm_head:
        out["lm_head"] = b.linear(f"{sc}/lm_head")
    out = finalize_params(out)
    return out


def _norm(p, x, eps=1e-5):
    if p is None:
        return x
    return apply_norm(p, x, eps)


def _glu_channels(x):
    """GLU over the channel axis of [B, C, T]: first half * sigmoid(second)
    (reference: src/layers/wav2vec2bert.cc:72-76)."""
    a, g = jnp.split(x, 2, axis=1)
    return a * jax.nn.sigmoid(g)


def _self_attention(ap: dict, spec: Wav2Vec2BertSpec, x, *, rel=False,
                    quantize_acts=True):
    """Fused-QKV self-attention, optionally with asymmetric relative
    position keys (reference: src/layers/attention.cc:128-165)."""
    H = spec.num_heads
    qkv = linear(ap["linear_0"], x, quantize_activations=quantize_acts)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = attn_ops.split_heads(q, H)
    k = attn_ops.split_heads(k, H)
    v = attn_ops.split_heads(v, H)
    D = q.shape[-1]

    rel_positions = None
    rel_keys = None
    if rel and "relative_asymmetric_position_keys" in ap:
        T = x.shape[1]
        rel_positions = attn_ops.make_relative_positions(
            T, T, 0, asymmetric=True,
            left_max=spec.rel_left_max, right_max=spec.rel_right_max)
        rel_keys = ap["relative_asymmetric_position_keys"]

    ctx = attn_ops.dot_product_attention(
        q, k, v,
        bias=None,
        queries_scale=1.0 / (D ** 0.5),
        rel_position_keys=rel_keys,
        rel_positions=rel_positions,
    )
    out = attn_ops.combine_heads(ctx)
    return linear(ap["linear_1"], out, quantize_activations=quantize_acts)


def _half_ffn(lnp, fp, x, activation, quantize_acts):
    """Conformer half-step FFN: ``x + 0.5 * ffn(ln(x))``
    (reference: src/layers/wav2vec2bert.cc:44-48)."""
    h = _norm(lnp, x)
    h = linear(fp["linear_0"], h, activation=activation,
               quantize_activations=quantize_acts)
    h = linear(fp["linear_1"], h, quantize_activations=quantize_acts)
    return x + 0.5 * h


def _conformer_conv(lp, x, quantize_acts):
    """Conv module: LN -> pointwise GLU -> causal depthwise -> LN -> swish
    -> pointwise (reference: src/layers/wav2vec2bert.cc:64-89)."""
    residual = x
    h = _norm(lp["enc_conv_layer_norm"], x)
    h = jnp.transpose(h, (0, 2, 1))  # [B, C, T]
    h = conv1d(h, lp["enc_conv_pointwise_conv1"]["w"],
               lp["enc_conv_pointwise_conv1"].get("b"))
    h = _glu_channels(h)
    dw = lp["enc_conv_depthwise_conv"]["w"]
    K = dw.shape[-1]
    # Causal left padding of K-1 frames (reference pads 30 zeros for the
    # 31-tap kernel: wav2vec2bert.cc:78-83).
    h = jnp.pad(h, ((0, 0), (0, 0), (K - 1, 0)))
    h = conv1d(h, dw, lp["enc_conv_depthwise_conv"].get("b"),
               groups=dw.shape[0])
    h = jnp.transpose(h, (0, 2, 1))
    h = _norm(lp["enc_conv_depthwise_layer_norm"], h)
    h = swish(h)
    h = jnp.transpose(h, (0, 2, 1))
    h = conv1d(h, lp["enc_conv_pointwise_conv2"]["w"],
               lp["enc_conv_pointwise_conv2"].get("b"))
    h = jnp.transpose(h, (0, 2, 1))
    return h + residual


def wav2vec2bert_forward(spec: Wav2Vec2BertSpec, params: dict, features,
                         quantize_acts: bool = True, out_dtype=jnp.float32):
    """[B, T, C_feat] input features -> CTC logits (or hidden states).

    Reference call path: src/layers/wav2vec2bert.cc:166-215.
    """
    x = features.astype(out_dtype)
    x = _norm(params["fp_layer_norm"], x)
    x = linear(params["fp_projection"], x, quantize_activations=quantize_acts)

    for lp in params["encoder_layers"]:
        x = _half_ffn(lp["enc_ffn1_layer_norm"], lp["enc_ffn1"], x, swish,
                      quantize_acts)
        h = _norm(lp["enc_attn_layer_norm"], x)
        x = x + _self_attention(lp["enc_attn"], spec, h, rel=True,
                                quantize_acts=quantize_acts)
        x = _conformer_conv(lp, x, quantize_acts)
        x = _half_ffn(lp["enc_ffn2_layer_norm"], lp["enc_ffn2"], x, swish,
                      quantize_acts)
        x = _norm(lp["enc_final_layer_norm"], x)

    for lp in params["adapter_layers"]:
        # Residual branch: LN -> stride-2 GLU conv
        # (reference: wav2vec2bert.cc:122-137).
        h = _norm(lp["adpt_residual_layer_norm"], x)
        h = jnp.transpose(h, (0, 2, 1))
        h = conv1d(h, lp["adpt_residual_conv"]["w"],
                   lp["adpt_residual_conv"].get("b"), stride=2, padding=1)
        residual = jnp.transpose(_glu_channels(h), (0, 2, 1))
        # Attention branch: LN -> stride-2 GLU conv -> attention.
        h = _norm(lp["adpt_attn_layer_norm"], x)
        h = jnp.transpose(h, (0, 2, 1))
        h = conv1d(h, lp["adpt_attn_conv"]["w"],
                   lp["adpt_attn_conv"].get("b"), stride=2, padding=1)
        h = jnp.transpose(_glu_channels(h), (0, 2, 1))
        h = _self_attention(lp["adpt_attn_layer"], spec, h,
                            quantize_acts=quantize_acts)
        x = h + residual
        # FFN (full-step, ReLU: reference builds the adapter FFN with
        # ActivationType::ReLU, wav2vec2bert.cc:175-179).
        h = _norm(lp["adpt_ffn_layer_norm"], x)
        h = linear(lp["adpt_ffn"]["linear_0"], h, activation=relu,
                   quantize_activations=quantize_acts)
        h = linear(lp["adpt_ffn"]["linear_1"], h,
                   quantize_activations=quantize_acts)
        x = x + h

    if spec.has_lm_head:
        x = linear(params["lm_head"], x, quantize_activations=quantize_acts)
    return x


wav2vec2bert_forward_jit = jax.jit(
    wav2vec2bert_forward, static_argnames=("spec", "quantize_acts", "out_dtype"))
