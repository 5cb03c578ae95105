"""1-D convolution (speech frontends).

Matches the reference ops::Conv1D (reference: src/ops/conv1d.cc,
src/ops/conv1d_cpu.cc): input [B, C_in, T], weight [C_out, C_in/groups, K],
optional bias, stride/padding/dilation/groups. Runs on the MXU via
``lax.conv_general_dilated``.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp


def conv1d(
    x,  # [B, C_in, T]
    weight,  # [C_out, C_in/groups, K]
    bias=None,
    stride: int = 1,
    padding: int = 0,
    dilation: int = 1,
    groups: int = 1,
    activation: Optional[Callable] = None,
):
    out = jax.lax.conv_general_dilated(
        x.astype(jnp.float32),
        weight.astype(jnp.float32),
        window_strides=(stride,),
        padding=[(padding, padding)],
        rhs_dilation=(dilation,),
        feature_group_count=groups,
        dimension_numbers=("NCH", "OIH", "NCH"),
    )
    if bias is not None:
        out = out + bias.astype(out.dtype)[None, :, None]
    if activation is not None:
        out = activation(out)
    return out.astype(x.dtype)
