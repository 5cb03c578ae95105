"""Pallas fused LayerNorm / RMSNorm (SURVEY kernel #5).

The reference carries dedicated CUDA kernels for these
(reference: src/ops/layer_norm_gpu.cu, src/ops/rms_norm_gpu.cu). On TPU,
XLA already fuses the reduce + normalize + affine chain into neighboring
ops, so the standalone kernels below only win when a norm is isolated
(e.g. called eagerly). They are kept for completeness and benchmarked by
tests; the ops/norms.py entry points route to XLA by default and can be
pointed here with CT2TPU_PALLAS_NORMS=1.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _ln_kernel(x_ref, g_ref, b_ref, o_ref, *, eps: float, rms: bool):
    x = x_ref[...].astype(jnp.float32)
    if rms:
        ms = jnp.mean(x * x, axis=-1, keepdims=True)
        y = x * jax.lax.rsqrt(ms + eps)
    else:
        mu = jnp.mean(x, axis=-1, keepdims=True)
        xc = x - mu
        var = jnp.mean(xc * xc, axis=-1, keepdims=True)
        y = xc * jax.lax.rsqrt(var + eps)
    y = y * g_ref[...].astype(jnp.float32)
    if b_ref is not None:
        y = y + b_ref[...].astype(jnp.float32)
    o_ref[...] = y.astype(o_ref.dtype)


def fused_norm(x, gamma, beta=None, *, eps: float = 1e-5,
               block_rows: int = 256, interpret: bool = False):
    """LayerNorm (beta given) or RMSNorm over the last axis of ``x``."""
    orig_shape = x.shape
    D = orig_shape[-1]
    rows = 1
    for d in orig_shape[:-1]:
        rows *= d
    x2 = x.reshape(rows, D)
    pad = (-rows) % 8
    if pad:
        x2 = jnp.pad(x2, ((0, pad), (0, 0)))
    block_rows = min(block_rows, x2.shape[0])

    rms = beta is None
    kernel = functools.partial(_ln_kernel, eps=eps, rms=rms)
    in_specs = [
        pl.BlockSpec((block_rows, D), lambda i: (i, 0)),
        pl.BlockSpec((D,), lambda i: (0,)),
    ]
    args = [x2, gamma]
    if beta is not None:
        in_specs.append(pl.BlockSpec((D,), lambda i: (0,)))
        args.append(beta)
    else:
        kernel = functools.partial(_ln_kernel, eps=eps, rms=True)

        def kernel2(x_ref, g_ref, o_ref):
            return _ln_kernel(x_ref, g_ref, None, o_ref, eps=eps, rms=True)

        kernel = kernel2

    out = pl.pallas_call(
        kernel,
        grid=(pl.cdiv(x2.shape[0], block_rows),),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((block_rows, D), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct(x2.shape, x.dtype),
        interpret=interpret,
    )(*args)
    if pad:
        out = out[:rows]
    return out.reshape(orig_shape)
