"""Pallas quantized matmul kernels (weight-stationary dequant-in-kernel).

TPU-native equivalents of the reference's quantized GEMM stack
(reference: src/ops/gemm.cc:28-186 + src/cpu/primitives.cc:543-900 int8
backends, and src/ops/awq/gemm*.cu W4 kernels): the weight payload stays
quantized in HBM and is dequantized in VMEM right before hitting the MXU,
so the matmul reads 1 byte/weight instead of 4 (f32) — the decisive factor
for the HBM-bound decode GEMMs.

Two kernels:

- ``matmul_w4a16``: AWQ-style group-quantized weights. The k-block size is
  pinned to the group size so the per-(group, out-channel) scale is a
  constant over each partial dot: ``acc += (x_blk @ w_blk) * s[g, :]`` is
  exact. Payload is the zero-folded ``(q - z)`` int8 produced by
  ops/awq.py; values |w| <= 15 convert losslessly to bf16 for the MXU.
- ``matmul_w8a8``: CT2-style per-row activation scales x per-output-channel
  weight scales. int8 x int8 -> int32 accumulation on the MXU int8 path,
  with the dequant epilogue fused in the kernel
  (reference: src/ops/dequantize.cc:13-59 fused GEMM-output dequant).

Both carry an ``interpret`` path so CPU tests exercise the same code.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pad_rows(x, multiple: int):
    m = x.shape[0]
    pad = (-m) % multiple
    if pad:
        x = jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1))
    return x, m


# ---------------------------------------------------------------------------
# W4A16: group-quantized weights, float activations.
# ---------------------------------------------------------------------------


def _w4a16_kernel(x_ref, w_ref, s_ref, o_ref, acc_ref, *, group: int,
                  groups_per_step: int):
    k = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(k == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    x = x_ref[:]
    w = w_ref[:].astype(x.dtype)  # |q - z| <= 15: lossless in bf16
    acc = acc_ref[:]
    for gi in range(groups_per_step):  # static unroll
        part = jax.lax.dot_general(
            x[:, gi * group:(gi + 1) * group],
            w[gi * group:(gi + 1) * group, :],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        # s_ref holds all group rows for this n-block; pick this group's.
        s = s_ref[pl.ds(k * groups_per_step + gi, 1), :].astype(jnp.float32)
        acc = acc + part * s
    acc_ref[:] = acc

    @pl.when(k == nk - 1)
    def _done():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def matmul_w4a16(
    x,  # [M, K] float
    w4,  # [K, N] int8 (q - z values)
    g_scale,  # [K // G, N] float32 group scales
    *,
    block_m: int = 256,
    block_n: int = 1024,
    block_k: int = 1024,
    interpret: bool = False,
):
    """Group-dequant matmul: returns ``x @ (w4 * expand(g_scale))``.

    The k-block is a multiple of the quantization group size G, so every
    partial dot sees a constant scale row per group (exact rescaling).
    """
    M, K = x.shape
    N = w4.shape[1]
    G = K // g_scale.shape[0]

    x, true_m = _pad_rows(x, min(block_m, 8))
    block_m = min(block_m, x.shape[0])
    block_n = min(block_n, N)
    block_k = max(G, min(block_k - block_k % G, K))
    while K % block_k:
        block_k -= G
    groups_per_step = block_k // G
    Mp = x.shape[0]

    grid = (pl.cdiv(Mp, block_m), pl.cdiv(N, block_n), K // block_k)

    out = pl.pallas_call(
        functools.partial(
            _w4a16_kernel, group=G, groups_per_step=groups_per_step
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_m, block_k), lambda i, j, k: (i, k)),
            pl.BlockSpec((block_k, block_n), lambda i, j, k: (k, j)),
            # All group rows stay VMEM-resident per n-block (small array;
            # a (1, bn) block would break the 8-sublane divisibility rule).
            pl.BlockSpec((K // G, block_n), lambda i, j, k: (0, j)),
        ],
        out_specs=pl.BlockSpec((block_m, block_n), lambda i, j, k: (i, j)),
        scratch_shapes=[pltpu.VMEM((block_m, block_n), jnp.float32)],
        out_shape=jax.ShapeDtypeStruct((Mp, N), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(x, w4, g_scale)
    return out[:true_m]


def _w4a16_fold_kernel(x_ref, w_ref, s_ref, o_ref, acc_ref, *, group: int,
                       groups_per_step: int):
    """Scale-folded W4A16: fold the per-group scale into the int8 (q-z)
    payload on the VPU, then ONE full-contraction dot per k-step (vs one
    dot per group in _w4a16_kernel) — larger MXU ops, no per-group
    accumulate chain."""
    k = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(k == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    w = w_ref[:].astype(jnp.float32)
    bk, bn = w.shape
    gps = groups_per_step
    s = s_ref[pl.ds(k * gps, gps), :].astype(jnp.float32)  # [gps, bn]
    sw = jnp.broadcast_to(s[:, None, :], (gps, group, bn)).reshape(bk, bn)
    acc_ref[:] += jax.lax.dot_general(
        x_ref[:].astype(jnp.float32), w * sw, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(k == nk - 1)
    def _done():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def matmul_w4a16_fold(
    x,  # [M, K] float
    w4,  # [K, N] int8 (q - z values)
    g_scale,  # [K // G, N] float32 group scales
    *,
    block_m: int = 256,
    block_n: int = 1024,
    block_k: int = 1024,
    interpret: bool = False,
):
    """Group-dequant matmul, scale-folded single-dot variant (same
    result as matmul_w4a16; see _w4a16_fold_kernel)."""
    M, K = x.shape
    N = w4.shape[1]
    G = K // g_scale.shape[0]

    x, true_m = _pad_rows(x, min(block_m, 8))
    block_m = min(block_m, x.shape[0])
    block_n = min(block_n, N)
    block_k = max(G, min(block_k - block_k % G, K))
    while K % block_k:
        block_k -= G
    groups_per_step = block_k // G
    Mp = x.shape[0]

    grid = (pl.cdiv(Mp, block_m), pl.cdiv(N, block_n), K // block_k)

    out = pl.pallas_call(
        functools.partial(
            _w4a16_fold_kernel, group=G, groups_per_step=groups_per_step
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_m, block_k), lambda i, j, k: (i, k)),
            pl.BlockSpec((block_k, block_n), lambda i, j, k: (k, j)),
            pl.BlockSpec((K // G, block_n), lambda i, j, k: (0, j)),
        ],
        out_specs=pl.BlockSpec((block_m, block_n), lambda i, j, k: (i, j)),
        scratch_shapes=[pltpu.VMEM((block_m, block_n), jnp.float32)],
        out_shape=jax.ShapeDtypeStruct((Mp, N), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(x, w4, g_scale)
    return out[:true_m]


def w4a16_supported(x_shape, w4_shape, g_scale_shape) -> bool:
    K, N = w4_shape
    if g_scale_shape[0] == 0 or K % g_scale_shape[0]:
        return False
    G = K // g_scale_shape[0]
    # One scale row per k-step; keep G MXU-aligned and N lane-aligned.
    return G % 128 == 0 and N % 128 == 0


# ---------------------------------------------------------------------------
# W8A8: dynamic per-row activation scales, per-channel weight scales.
# ---------------------------------------------------------------------------


def _w8a8_kernel(q_ref, w_ref, as_ref, ws_ref, o_ref, acc_ref):
    k = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(k == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jax.lax.dot_general(
        q_ref[:], w_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )

    @pl.when(k == nk - 1)
    def _done():
        scale = as_ref[:, 0][:, None] * ws_ref[0, :][None, :]
        o_ref[:] = (acc_ref[:].astype(jnp.float32) / scale).astype(o_ref.dtype)


def matmul_w8a8(
    q,  # [M, K] int8 quantized activations
    wq,  # [K, N] int8 weights
    a_scale,  # [M] float32 (x ~= q / a_scale)
    w_scale,  # [N] float32 (w ~= wq / w_scale)
    *,
    block_m: int = 256,
    block_n: int = 1024,
    block_k: int = 1024,
    interpret: bool = False,
):
    """int8 x int8 -> int32 matmul with the fused dequant epilogue
    ``y = acc / (a_scale ⊗ w_scale)`` (reference: src/ops/dequantize.cc)."""
    M, K = q.shape
    N = wq.shape[1]

    q, true_m = _pad_rows(q, min(block_m, 32))
    a_scale = jnp.pad(
        jnp.where(a_scale == 0, 1.0, a_scale)[:, None],
        ((0, q.shape[0] - M), (0, 0)), constant_values=1.0)
    block_m = min(block_m, q.shape[0])
    block_n = min(block_n, N)
    block_k = min(block_k, K)
    Mp = q.shape[0]

    grid = (pl.cdiv(Mp, block_m), pl.cdiv(N, block_n), pl.cdiv(K, block_k))

    out = pl.pallas_call(
        _w8a8_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_m, block_k), lambda i, j, k: (i, k)),
            pl.BlockSpec((block_k, block_n), lambda i, j, k: (k, j)),
            pl.BlockSpec((block_m, 1), lambda i, j, k: (i, 0)),
            pl.BlockSpec((1, block_n), lambda i, j, k: (0, j)),
        ],
        out_specs=pl.BlockSpec((block_m, block_n), lambda i, j, k: (i, j)),
        scratch_shapes=[pltpu.VMEM((block_m, block_n), jnp.int32)],
        out_shape=jax.ShapeDtypeStruct((Mp, N), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(q, wq, a_scale, w_scale[None, :])
    return out[:true_m]


def w8a8_supported(q_shape, wq_shape) -> bool:
    K, N = wq_shape
    return K % 128 == 0 and N % 128 == 0


# ---------------------------------------------------------------------------
# Packed W4A16: TRUE 4-bit payload (two nibbles per byte, half-split rows).
# ---------------------------------------------------------------------------


def _w4p_kernel(x_lo_ref, x_hi_ref, w_ref, s_ref, zs_ref, o_ref, acc_ref, *,
                group: int, groups_per_step: int, k_half_groups: int):
    k = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(k == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    packed = w_ref[:].astype(jnp.int32)
    lo = (packed & 0xF).astype(jnp.float32)          # rows [0, K/2)
    hi = ((packed >> 4) & 0xF).astype(jnp.float32)   # rows [K/2, K)

    x_lo = x_lo_ref[:].astype(jnp.float32)
    x_hi = x_hi_ref[:].astype(jnp.float32)

    acc = acc_ref[:]
    for gi in range(groups_per_step):  # static unroll
        sl = slice(gi * group, (gi + 1) * group)
        g_lo = k * groups_per_step + gi
        g_hi = k_half_groups + g_lo
        for x_g, w_g, g_idx in ((x_lo[:, sl], lo[sl], g_lo),
                                (x_hi[:, sl], hi[sl], g_hi)):
            part = jax.lax.dot_general(
                x_g, w_g, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            s = s_ref[pl.ds(g_idx, 1), :].astype(jnp.float32)
            zs = zs_ref[pl.ds(g_idx, 1), :].astype(jnp.float32)
            xsum = jnp.sum(x_g, axis=1, keepdims=True)  # [M, 1]
            # w = q * s - z*s  (zero-point GEMM identity).
            acc = acc + part * s - xsum * zs
    acc_ref[:] = acc

    @pl.when(k == nk - 1)
    def _done():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def matmul_w4p(
    x,  # [M, K] float
    w4p,  # [K/2, N] int8: low nibbles rows [0,K/2), high rows [K/2,K)
    g_scale,  # [K/G, N] f32
    g_zs,  # [K/G, N] f32 (zero * scale)
    *,
    block_m: int = 256,
    block_n: int = 1024,
    block_k: int = 1024,  # packed rows per step
    interpret: bool = False,
):
    """True-4-bit matmul: HBM reads half a byte per weight."""
    M, K = x.shape
    K2, N = w4p.shape
    G = K // g_scale.shape[0]
    k_half_groups = (K // 2) // G

    x, true_m = _pad_rows(x, min(block_m, 8))
    block_m = min(block_m, x.shape[0])
    block_n = min(block_n, N)
    block_k = max(G, min(block_k - block_k % G, K2))
    while K2 % block_k:
        block_k -= G
    groups_per_step = block_k // G
    Mp = x.shape[0]

    grid = (pl.cdiv(Mp, block_m), pl.cdiv(N, block_n), K2 // block_k)
    half = K // 2

    out = pl.pallas_call(
        functools.partial(
            _w4p_kernel, group=G, groups_per_step=groups_per_step,
            k_half_groups=k_half_groups),
        grid=grid,
        in_specs=[
            # x columns for the lo and hi halves of this k-step.
            pl.BlockSpec((block_m, block_k), lambda i, j, k: (i, k)),
            pl.BlockSpec((block_m, block_k),
                         lambda i, j, k, o=half // block_k: (i, k + o)),
            pl.BlockSpec((block_k, block_n), lambda i, j, k: (k, j)),
            pl.BlockSpec((K // G, block_n), lambda i, j, k: (0, j)),
            pl.BlockSpec((K // G, block_n), lambda i, j, k: (0, j)),
        ],
        out_specs=pl.BlockSpec((block_m, block_n), lambda i, j, k: (i, j)),
        scratch_shapes=[pltpu.VMEM((block_m, block_n), jnp.float32)],
        out_shape=jax.ShapeDtypeStruct((Mp, N), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(x, x, w4p, g_scale, g_zs)
    return out[:true_m]


def _w4p_fold_kernel(x_lo_ref, x_hi_ref, w_ref, s_ref, o_ref, acc_ref, *,
                     group: int, groups_per_step: int, k_half_groups: int):
    """Scale-folded packed-W4 kernel: unpack nibbles, fold the per-group
    scale into the weight block on the VPU, then run ONE full-contraction
    dot per half instead of one dot per group — fewer, larger MXU ops
    (better utilization at mid M) and no per-group accumulate chain.
    The zero-point term is linear in x and handled OUTSIDE the kernel:
    y = x @ (q * s) - xsum_g @ (z * s)  (see matmul_w4p_fold)."""
    k = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(k == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    packed = w_ref[:]
    lo = (packed & 0xF).astype(jnp.float32)          # rows [0, K/2)
    hi = ((packed >> 4) & 0xF).astype(jnp.float32)   # rows [K/2, K)
    bk, bn = lo.shape
    gps = groups_per_step

    def fold(w_half, g0):
        s = s_ref[pl.ds(g0, gps), :].astype(jnp.float32)  # [gps, bn]
        sw = jnp.broadcast_to(
            s[:, None, :], (gps, group, bn)).reshape(bk, bn)
        return w_half * sw

    lo = fold(lo, k * gps)
    hi = fold(hi, k_half_groups + k * gps)

    acc = acc_ref[:]
    acc = acc + jax.lax.dot_general(
        x_lo_ref[:].astype(jnp.float32), lo, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    acc = acc + jax.lax.dot_general(
        x_hi_ref[:].astype(jnp.float32), hi, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    acc_ref[:] = acc

    @pl.when(k == nk - 1)
    def _done():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def matmul_w4p_fold(
    x,  # [M, K] float
    w4p,  # [K/2, N] int8 packed nibbles
    g_scale,  # [K/G, N] f32
    g_zs,  # [K/G, N] f32 (zero * scale)
    *,
    block_m: int = 256,
    block_n: int = 1024,
    block_k: int = 1024,
    interpret: bool = False,
):
    """Packed-W4 matmul, scale-folded variant (see _w4p_fold_kernel).
    Same result as matmul_w4p; the zero-point correction runs as an XLA
    [M, K/G] @ [K/G, N] dot fused around the kernel."""
    M, K = x.shape
    K2, N = w4p.shape
    G = K // g_scale.shape[0]
    k_half_groups = (K // 2) // G

    x_pad, true_m = _pad_rows(x, min(block_m, 8))
    block_m = min(block_m, x_pad.shape[0])
    block_n = min(block_n, N)
    block_k = max(G, min(block_k - block_k % G, K2))
    while K2 % block_k:
        block_k -= G
    groups_per_step = block_k // G
    Mp = x_pad.shape[0]

    grid = (pl.cdiv(Mp, block_m), pl.cdiv(N, block_n), K2 // block_k)
    half = K // 2

    out = pl.pallas_call(
        functools.partial(
            _w4p_fold_kernel, group=G, groups_per_step=groups_per_step,
            k_half_groups=k_half_groups),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_m, block_k), lambda i, j, k: (i, k)),
            pl.BlockSpec((block_m, block_k),
                         lambda i, j, k, o=half // block_k: (i, k + o)),
            pl.BlockSpec((block_k, block_n), lambda i, j, k: (k, j)),
            pl.BlockSpec((K // G, block_n), lambda i, j, k: (0, j)),
        ],
        out_specs=pl.BlockSpec((block_m, block_n), lambda i, j, k: (i, j)),
        scratch_shapes=[pltpu.VMEM((block_m, block_n), jnp.float32)],
        out_shape=jax.ShapeDtypeStruct((Mp, N), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(x_pad, x_pad, w4p, g_scale)
    # Zero-point term: sum x per group, one small XLA dot.
    xsum = jnp.sum(
        x.astype(jnp.float32).reshape(M, K // G, G), axis=-1)  # [M, K/G]
    zero = jnp.dot(xsum, g_zs, preferred_element_type=jnp.float32)
    return out[:true_m] - zero


def w4p_supported(x_shape, w4p_shape, g_scale_shape) -> bool:
    K = x_shape[-1]
    K2, N = w4p_shape
    if K != 2 * K2 or g_scale_shape[0] == 0 or K % g_scale_shape[0]:
        return False
    G = K // g_scale_shape[0]
    return (G % 128 == 0 and N % 128 == 0 and (K // 2) % G == 0)
