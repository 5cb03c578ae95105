"""Linear (dense) op with CT2-compatible weight quantization.

Capability parity with the reference Dense layer
(reference: src/layers/common.cc:266-442):

- float path: ``y = act(x @ w + b) (+ residual)``
- int8 path (W8A8 dynamic): activations are quantized per row with
  ``a_scale = 127 / amax(row)`` and rounded
  (reference: src/ops/quantize_cpu.cc:11-25), multiplied on the int8
  MXU path (``lax.dot_general`` with int32 accumulation), then the output
  is dequantized with the outer product of activation/weight scales and
  fused with bias + activation + residual
  (reference: src/ops/dequantize.cc:13-59).
- int8 weight-only: weights dequantized to the activation dtype on the
  fly (``w = q / scale``); higher-accuracy alternative used when
  activation quantization is disabled.

Weights are stored transposed relative to the artifact, as ``(in, out)``
with per-output-channel scales, the layout XLA prefers for ``x @ w``.

Param dict keys:
  ``w``        float weight (in, out)                      [float path]
  ``wq``       int8/int4-unpacked weight (in, out)         [quantized path]
  ``scale``    per-output-channel scale (out,) or scalar
  ``w4``       AWQ int8 (q - zero) values (in, out)        [W4A16 path]
  ``g_scale``  AWQ per-group scales (in/G, out)
  ``b``        optional bias (out,)
"""

from __future__ import annotations

import os
from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp


def _use_pallas_qmm(num_rows: int, kind: str = "") -> bool:
    """Static dispatch to the Pallas quantized-matmul kernels.

    The kernels dequantize in VMEM so each decode step streams the int8
    payload instead of an XLA-hoisted float copy; measured ~3x faster than
    the XLA int8 dot at decode shapes on v5e, while XLA wins at prefill
    shapes (compute-bound) — hence the row threshold.

    Per-payload thresholds (``kind`` in W4P/W4/W8A8) implement the
    batch-adaptive W4 strategy (reference anchor: the AWQ GEMM's
    >=1024-token dequantize-then-GEMM fallback,
    /root/reference/src/layers/common.cc:408-425): the packed-nibble
    kernel is HBM-optimal at decode M but pays VPU unpack cost per
    weight, so larger M can route to XLA's fused dequant-dot instead.
    Crossovers are measured by tools/bench_w4.py.
    """
    if os.environ.get("CT2TPU_QMM", "1") == "0":
        return False
    if jax.default_backend() != "tpu":
        return False
    default = os.environ.get("CT2TPU_QMM_MAX_M", "512")
    limit = os.environ.get(f"CT2TPU_QMM_MAX_M_{kind}", default) \
        if kind else default
    return num_rows <= int(limit)


def quantize_per_row(x, round_before_cast: bool = True):
    """Quantize activations to int8 with per-row (last-axis) amax scales.

    Returns (q, scale) where ``x ≈ q / scale`` and scale has shape
    ``x.shape[:-1]``.
    """
    x32 = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(x32), axis=-1)
    scale = jnp.where(amax > 0, 127.0 / amax, 1.0)
    scaled = x32 * scale[..., None]
    if round_before_cast:
        scaled = jnp.rint(scaled)
    q = jnp.clip(scaled, -128, 127).astype(jnp.int8)
    return q, scale


def linear(
    params: dict,
    x,
    activation: Optional[Callable] = None,
    residual=None,
    quantize_activations: bool = True,
):
    """Apply a dense layer. ``x``: (..., in) -> (..., out)."""
    out_dtype = x.dtype
    bias = params.get("b")

    if "w4p" in params:
        # TRUE 4-bit AWQ payload: nibbles unpack in the Pallas kernel
        # (half a byte of HBM per weight); the XLA fallback unpacks with
        # shifts (correct everywhere, used on CPU / unsupported shapes).
        w4p = params["w4p"]
        gs = params["g_scale"]
        gzs = params["g_zs"]
        K2, N = w4p.shape
        K = 2 * K2
        lead = x.shape[:-1]
        num_rows = 1
        for d in lead:
            num_rows *= d
        from ..kernels.quant_matmul import matmul_w4p, w4p_supported

        if _use_pallas_qmm(num_rows, "W4P") and w4p_supported(
            (num_rows, K), w4p.shape, gs.shape
        ):
            y = matmul_w4p(x.reshape(num_rows, K), w4p, gs, gzs)
            y = y.reshape(lead + (N,))
        else:
            u = w4p.astype(jnp.int32) & 0xFF
            q4 = jnp.concatenate([u & 0xF, (u >> 4) & 0xF], axis=0)
            n_groups = gs.shape[0]
            G = K // n_groups
            w = (
                q4.astype(jnp.float32).reshape(n_groups, G, N) * gs[:, None, :]
                - jnp.repeat(gzs, G, axis=0).reshape(n_groups, G, N)
            ).reshape(K, N)
            y = jnp.dot(
                x.astype(jnp.float32), w, preferred_element_type=jnp.float32
            )
    elif "w4" in params:
        # AWQ W4A16: group-dequant the (q - z) payload and run a float
        # matmul (reference dequant identity: src/ops/awq/dequantize_gpu.cu
        # sub + fma per nibble). XLA fuses the dequant into the dot's
        # weight-operand read; the Pallas kernel path covers decode GEMVs.
        w4 = params["w4"]
        gs = params["g_scale"]
        K, N = w4.shape
        n_groups = gs.shape[0]
        G = K // n_groups
        lead = x.shape[:-1]
        num_rows = 1
        for d in lead:
            num_rows *= d
        from ..kernels.quant_matmul import matmul_w4a16, w4a16_supported

        if _use_pallas_qmm(num_rows, "W4") and w4a16_supported(
            (num_rows, K), w4.shape, gs.shape
        ):
            y = matmul_w4a16(x.reshape(num_rows, K), w4, gs)
            y = y.reshape(lead + (N,))
        else:
            w = (
                w4.astype(jnp.float32).reshape(n_groups, G, N) * gs[:, None, :]
            ).reshape(K, N)
            y = jnp.dot(
                x.astype(jnp.float32), w, preferred_element_type=jnp.float32
            )
    elif "wq" in params:
        wq = params["wq"]
        w_scale = params["scale"].astype(jnp.float32)
        if quantize_activations and wq.dtype == jnp.int8:
            q, a_scale = quantize_per_row(x)
            K, N = wq.shape
            lead = x.shape[:-1]
            num_rows = 1
            for d in lead:
                num_rows *= d
            from ..kernels.quant_matmul import matmul_w8a8, w8a8_supported

            if _use_pallas_qmm(num_rows, "W8A8") and w8a8_supported(
                (num_rows, K), wq.shape
            ):
                y = matmul_w8a8(
                    q.reshape(num_rows, K),
                    wq,
                    a_scale.reshape(num_rows),
                    w_scale,
                ).reshape(lead + (N,))
            else:
                acc = jax.lax.dot_general(
                    q,
                    wq,
                    dimension_numbers=(((q.ndim - 1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
                y = acc.astype(jnp.float32) / (a_scale[..., None] * w_scale)
        else:
            w = wq.astype(jnp.float32) / w_scale
            y = jnp.dot(x.astype(jnp.float32), w, preferred_element_type=jnp.float32)
    else:
        w = params["w"]
        y = jnp.dot(x, w.astype(x.dtype), preferred_element_type=jnp.float32)

    if bias is not None:
        y = y + bias.astype(y.dtype)
    if activation is not None:
        y = activation(y)
    y = y.astype(out_dtype)
    if residual is not None:
        y = y + residual.astype(out_dtype)
    return y


def _weight(params: dict):
    for k in ("w", "wq", "w4", "w4p"):
        if k in params:
            return params[k]
    raise KeyError("no weight in linear params")


def output_size(params: dict) -> int:
    return _weight(params).shape[-1]


def input_size(params: dict) -> int:
    n = _weight(params).shape[0]
    return 2 * n if "w4p" in params else n
