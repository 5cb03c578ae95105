"""Compute-type policy: how stored weight dtypes map to runtime dtypes.

Mirrors the capability surface of the reference's ComputeType resolution
(reference: include/ctranslate2/types.h:16-66, src/types.cc), adapted to TPU:

- activations run in float32 or bfloat16 (TPU-native); ``float16`` requests
  are honored as bfloat16 on TPU (and float32 on CPU test backend) since the
  MXU has no fp16 path.
- ``int8*`` keeps weights as int8 + per-output-channel scales and runs
  W8A8 dynamic-quantized matmuls (activation per-row scales), the TPU MXU
  int8 path; falls back to weight-only dequant where the backend lacks
  int8 matmul support.
- ``int16`` has no TPU benefit: weights are dequantized at load
  (capability parity; the artifact still loads and runs).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

COMPUTE_TYPES = (
    "default",
    "auto",
    "float32",
    "float16",
    "bfloat16",
    "int8",
    "int8_float32",
    "int8_float16",
    "int8_bfloat16",
    "int16",
)


@dataclass(frozen=True)
class DTypePolicy:
    """Resolved dtype plan for a loaded model."""

    weight_dtype: str  # "float32" | "bfloat16" | "int8"
    activation_dtype: str  # "float32" | "bfloat16"
    quantize_activations: bool  # W8A8 dynamic activation quantization

    @property
    def activation_jnp(self):
        return jnp.bfloat16 if self.activation_dtype == "bfloat16" else jnp.float32


def _default_float(platform: str) -> str:
    return "bfloat16" if platform == "tpu" else "float32"


def resolve_compute_type(
    compute_type: str,
    weights_dtype: str,
    platform: str | None = None,
) -> DTypePolicy:
    """Resolve a user compute-type request against the stored weight dtype.

    ``weights_dtype`` is the dtype of the model's linear weights on disk
    (one of float32/float16/bfloat16/int8/int16).
    """
    if platform is None:
        platform = jax.default_backend()
    if isinstance(compute_type, dict):
        # Per-device mapping (reference: Translator(compute_type={"cuda":
        # "float16", "cpu": "int8"}), python/cpp/module.cc ComputeType
        # dict overload). "cuda" doubles as the accelerator entry for
        # users porting reference configs to TPU.
        compute_type = (compute_type.get(platform)
                        or (compute_type.get("cuda")
                            if platform == "tpu" else None)
                        or "default")
    elif not isinstance(compute_type, (str, type(None))):
        raise TypeError(
            "compute_type must be a string or a {device: compute_type} "
            f"dict, got {type(compute_type).__name__}")
    compute_type = compute_type or "default"
    if compute_type not in COMPUTE_TYPES:
        raise ValueError(f"unknown compute type: {compute_type!r}")

    if compute_type in ("default", "auto"):
        # Keep the model's own quantization; pick the platform's fast float.
        if weights_dtype == "int8":
            return DTypePolicy("int8", _default_float(platform), True)
        if weights_dtype == "int16":
            # int16 GEMM has no TPU path: dequantize, run in fast float.
            return DTypePolicy(_default_float(platform), _default_float(platform), False)
        if weights_dtype in ("float16", "bfloat16"):
            return DTypePolicy(_default_float(platform), _default_float(platform), False)
        return DTypePolicy(
            "float32" if platform != "tpu" else "bfloat16",
            "float32" if platform != "tpu" else "bfloat16",
            False,
        )

    if compute_type == "float32":
        return DTypePolicy("float32", "float32", False)
    if compute_type in ("float16", "bfloat16"):
        f = _default_float(platform)
        return DTypePolicy(f, f, False)
    if compute_type == "int16":
        f = _default_float(platform)
        return DTypePolicy(f, f, False)

    # int8 family.
    if compute_type == "int8_float32":
        act = "float32"
    elif compute_type in ("int8_float16", "int8_bfloat16"):
        act = _default_float(platform)
    else:  # "int8"
        act = _default_float(platform)
    return DTypePolicy("int8", act, True)
