"""Layer normalization ops.

Semantics mirror the reference (reference: src/layers/common.cc:445-472):
a norm layer with ``beta`` is a full LayerNorm; gamma-only is RMSNorm,
optionally with the ``(1 + gamma)`` residual-weight variant
(reference: src/cpu/kernels.cc:544-569). Statistics are accumulated in
float32 regardless of activation dtype.
"""

from __future__ import annotations

import jax.numpy as jnp


def layer_norm(x, gamma, beta, epsilon: float = 1e-5):
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    normed = (x32 - mean) / jnp.sqrt(var + epsilon)
    out = normed * gamma.astype(jnp.float32) + beta.astype(jnp.float32)
    return out.astype(x.dtype)


def rms_norm(x, gamma, epsilon: float = 1e-6, use_residual: bool = False):
    x32 = x.astype(jnp.float32)
    inv_rms = 1.0 / jnp.sqrt(jnp.mean(jnp.square(x32), axis=-1, keepdims=True) + epsilon)
    g = gamma.astype(jnp.float32)
    if use_residual:
        g = 1.0 + g
    return (x32 * inv_rms * g).astype(x.dtype)


def apply_norm(params: dict, x, epsilon: float, use_residual: bool = False):
    """Apply a norm given its param dict ({"gamma": ..., "beta"?: ...})."""
    if "beta" in params:
        return layer_norm(x, params["gamma"], params["beta"], epsilon)
    return rms_norm(x, params["gamma"], epsilon, use_residual)


def _use_pallas_norms() -> bool:
    import os

    import jax

    return (os.environ.get("CT2TPU_PALLAS_NORMS", "0") == "1"
            and jax.default_backend() == "tpu")


_orig_apply_norm = apply_norm


def apply_norm(params: dict, x, epsilon: float, use_residual: bool = False):  # noqa: F811
    """Apply a norm given its param dict ({"gamma": ..., "beta"?: ...}).

    Routes to the Pallas fused kernel (kernels/norms.py, SURVEY kernel #5)
    when CT2TPU_PALLAS_NORMS=1; XLA's own fusion is the measured default.
    """
    if _use_pallas_norms() and not use_residual and x.shape[-1] % 128 == 0:
        from ..kernels.norms import fused_norm

        return fused_norm(x, params["gamma"], params.get("beta"), eps=epsilon)
    return _orig_apply_norm(params, x, epsilon, use_residual)
