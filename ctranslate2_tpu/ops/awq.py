"""AWQ 4-bit group quantization: packing, unpacking, and the W4A16 path.

Capability parity with the reference's AWQ op family
(reference: src/ops/awq/dequantize_gpu.cu, gemm.cc, gemv.cc and the
converter side at python/ctranslate2/converters/transformers.py:237-248):
models carry int32-packed unsigned 4-bit weights with per-group scales and
packed zero-points. Two on-disk layouts exist, selected by
``config.json["quantization_type"]``:

- AWQ_GEMM (1): ``weight``  [in,  out/8] int32, nibbles in AWQ interleaved
  order; ``weight_scale`` [in/G, out]; ``weight_zero`` [in/G, out/8] int32
  (same interleave). (reference: src/ops/awq/dequantize_gpu.cu:8-66)
- AWQ_GEMV (2): ``weight``  [out, in/8] int32, natural LSB-first nibble
  order; ``weight_scale`` [out, in/G]; ``weight_zero`` [out, ceil(in/G/8)]
  int32. (reference: src/ops/awq/gemv_gpu.cu:280-284)

Instead of translating the CUDA dequant-in-flight kernels, the TPU design
unpacks once at load time into ``(q - z)`` int8 values (lossless: the AWQ
dequant is exactly ``w = (q - z) * s``) with float group scales kept
separate, so the runtime matmul is a group-dequant-then-dot that XLA fuses
onto the MXU; a Pallas weight-stationary kernel covers the HBM-bound decode
shapes (see kernels/quant_matmul.py).
"""

from __future__ import annotations

import numpy as np

# Nibble position of logical channel j inside a packed int32
# (llm-awq pack order; its inverse is [0, 4, 1, 5, 2, 6, 3, 7]).
AWQ_ORDER = np.array([0, 2, 4, 6, 1, 3, 5, 7])
AWQ_REVERSE_ORDER = np.array([0, 4, 1, 5, 2, 6, 3, 7])

AWQ_GEMM = 1
AWQ_GEMV = 2


def _unpack_nibbles(packed: np.ndarray) -> np.ndarray:
    """[..., n] int32 -> [..., n*8] uint8, LSB-first nibble order."""
    shifts = np.arange(0, 32, 4, dtype=np.uint32)
    vals = (packed.astype(np.uint32)[..., None] >> shifts) & 0xF
    return vals.reshape(packed.shape[:-1] + (-1,)).astype(np.uint8)


def _pack_nibbles(vals: np.ndarray) -> np.ndarray:
    """[..., n*8] uint8 -> [..., n] int32, LSB-first nibble order."""
    v = vals.astype(np.uint32).reshape(vals.shape[:-1] + (-1, 8))
    shifts = np.arange(0, 32, 4, dtype=np.uint32)
    return (v << shifts).sum(axis=-1, dtype=np.uint32).view(np.int32)


def _reorder_awq(vals: np.ndarray, reverse: bool) -> np.ndarray:
    """(Un)apply the AWQ nibble interleave on the last axis."""
    order = AWQ_REVERSE_ORDER if reverse else AWQ_ORDER
    idx = (np.arange(vals.shape[-1]) // 8) * 8 + order[np.arange(vals.shape[-1]) % 8]
    return vals[..., idx]


def unpack_awq_gemm(qweight: np.ndarray) -> np.ndarray:
    """[in, out/8] int32 (AWQ order) -> [in, out] uint8 4-bit values."""
    return _reorder_awq(_unpack_nibbles(qweight), reverse=True)


def pack_awq_gemm(w4: np.ndarray) -> np.ndarray:
    """[in, out] uint8 4-bit values -> [in, out/8] int32 (AWQ order)."""
    return _pack_nibbles(_reorder_awq(w4, reverse=False))


def unpack_awq_gemv(qweight: np.ndarray) -> np.ndarray:
    """[out, in/8] int32 (natural order) -> [out, in] uint8 values."""
    return _unpack_nibbles(qweight)


def pack_awq_gemv(w4: np.ndarray) -> np.ndarray:
    """[out, in] uint8 values -> [out, in/8] int32 (natural order)."""
    return _pack_nibbles(w4)


def dequantize_awq(
    qweight: np.ndarray,
    scales: np.ndarray,
    qzeros: np.ndarray,
    quant_type: int = AWQ_GEMM,
):
    """Full numpy dequantization to a float32 ``(in, out)`` matrix."""
    w4, zeros, scales_io = unpack_to_in_out(qweight, scales, qzeros, quant_type)
    G = w4.shape[0] // zeros.shape[0]
    z = np.repeat(zeros.astype(np.float32), G, axis=0)
    s = np.repeat(scales_io.astype(np.float32), G, axis=0)
    return (w4.astype(np.float32) - z) * s


def unpack_to_in_out(
    qweight: np.ndarray,
    scales: np.ndarray,
    qzeros: np.ndarray,
    quant_type: int = AWQ_GEMM,
):
    """Normalize either on-disk layout to ``(in, out)`` orientation.

    Returns (w4 [in, out] uint8, zeros [in/G, out] uint8,
    scales [in/G, out] float32).
    """
    if quant_type == AWQ_GEMM:
        w4 = unpack_awq_gemm(qweight)
        zeros = _reorder_awq(_unpack_nibbles(qzeros), reverse=True)
        return w4, zeros, np.asarray(scales, dtype=np.float32)
    if quant_type == AWQ_GEMV:
        # GEMV stores (out, in); transpose to (in, out).
        w4 = unpack_awq_gemv(qweight).T
        in_dim = w4.shape[0]
        n_groups = scales.shape[1]
        zeros = _unpack_nibbles(qzeros)[:, :n_groups].T
        return w4, zeros, np.ascontiguousarray(np.asarray(scales, np.float32).T)
    raise ValueError(f"unknown AWQ quantization type: {quant_type}")


def build_awq_linear(
    qweight: np.ndarray,
    scales: np.ndarray,
    qzeros: np.ndarray,
    quant_type: int = AWQ_GEMM,
):
    """Load-time conversion to the runtime W4A16 param layout.

    Returns ``{"w4": int8 (in, out) holding (q - z), "g_scale": float32
    (in/G, out)}`` — the zero-point is folded into the payload, which is
    exact because AWQ dequant is ``(q - z) * s`` with both q and z in
    [0, 15], so (q - z) fits int8.
    """
    w4, zeros, s = unpack_to_in_out(qweight, scales, qzeros, quant_type)
    G = w4.shape[0] // zeros.shape[0]
    z = np.repeat(zeros, G, axis=0)
    qz = w4.astype(np.int16) - z.astype(np.int16)
    return {
        "w4": qz.astype(np.int8),
        "g_scale": s,
    }


def quantize_awq(
    w: np.ndarray,
    group_size: int = 128,
    quant_type: int = AWQ_GEMM,
):
    """Quantize a float (out, in) weight matrix to the AWQ on-disk layout
    (asymmetric 4-bit per input-dim group, like AutoAWQ's real quantizer
    minus the activation-aware scale search).

    Returns (qweight, scales, qzeros) in the requested layout's
    orientation, ready to serialize as weight / weight_scale / weight_zero.
    """
    w_io = np.asarray(w, dtype=np.float32).T  # (in, out)
    K, N = w_io.shape
    if K % group_size:
        raise ValueError(f"in_dim {K} not divisible by group size {group_size}")
    g = w_io.reshape(K // group_size, group_size, N)
    wmax = g.max(axis=1)
    wmin = g.min(axis=1)
    scales = np.maximum((wmax - wmin) / 15.0, 1e-10).astype(np.float32)  # (in/G, out)
    zeros = np.clip(np.rint(-wmin / scales), 0, 15).astype(np.uint8)  # (in/G, out)
    q = np.clip(
        np.rint(g / scales[:, None, :]) + zeros[:, None, :], 0, 15
    ).astype(np.uint8)
    w4 = q.reshape(K, N)

    if quant_type == AWQ_GEMM:
        return pack_awq_gemm(w4), scales, pack_awq_gemm(zeros)
    if quant_type == AWQ_GEMV:
        zt = zeros.T  # (out, in/G); pad groups to a multiple of 8 to pack
        pad = (-zt.shape[1]) % 8
        if pad:
            zt = np.pad(zt, ((0, 0), (0, pad)))
        return (
            pack_awq_gemv(w4.T),
            np.ascontiguousarray(scales.T),
            pack_awq_gemv(zt),
        )
    raise ValueError(f"unknown AWQ quantization type: {quant_type}")


def build_awq_linear_packed(
    qweight: np.ndarray,
    scales: np.ndarray,
    qzeros: np.ndarray,
    quant_type: int = AWQ_GEMM,
):
    """Load-time conversion to the TRUE 4-bit runtime layout.

    The in-dim is split in half and two 4-bit values pack into one byte:
    low nibbles hold rows [0, K/2), high nibbles rows [K/2, K) — so a
    kernel can unpack with two cheap bitwise ops and run two half-dots
    without any row interleaving. Zero points fold into a per-group
    correction ``zs = z * s`` applied as ``- rowsum(x_g) * zs[g]`` (the
    standard zero-point GEMM identity), so the payload stays unsigned
    4-bit.

    Returns {"w4p": uint8 [K/2, N], "g_scale": f32 [K/G, N],
    "g_zs": f32 [K/G, N]}.
    """
    w4, zeros, s = unpack_to_in_out(qweight, scales, qzeros, quant_type)
    K, N = w4.shape
    if K % 2:
        raise ValueError("packed W4 needs an even in-dim")
    lo = w4[: K // 2].astype(np.uint8)
    hi = w4[K // 2:].astype(np.uint8)
    return {
        "w4p": (lo | (hi << 4)).astype(np.uint8).view(np.int8),
        "g_scale": s.astype(np.float32),
        "g_zs": (zeros.astype(np.float32) * s).astype(np.float32),
    }


def unpack_w4p(w4p: np.ndarray):
    """[K/2, N] packed -> [K, N] uint8 values (host/XLA fallback)."""
    u = w4p.view(np.uint8) if isinstance(w4p, np.ndarray) else w4p
    lo = u & 0x0F
    hi = (u >> 4) & 0x0F
    return np.concatenate([lo, hi], axis=0)


# ---------------------------------------------------------------------------
# Deferred (device-side) load path: the nibble unpack / reorder / repack
# above are expensive strided numpy passes when run per weight on the
# host; these jnp twins run inside the ONE batched finalize dispatch
# (models/params.py finalize_params), so an 8B AWQ load ships the raw
# int32 payloads and transforms them on device.
# ---------------------------------------------------------------------------


def _jnp_unpack_nibbles(packed, order=None):
    """int32 [..., n] -> uint8 [..., n*8].

    ``order`` permutes nibbles within each int32 by folding the permutation
    into the SHIFT amounts — a TPU-friendly formulation: a last-axis gather
    (jnp.take over the lane dimension) serializes on TPU, while shifted
    masks vectorize."""
    import jax.numpy as jnp

    shifts_np = 4 * (np.arange(8, dtype=np.uint32) if order is None
                     else np.asarray(order, np.uint32))
    shifts = jnp.asarray(shifts_np, jnp.uint32)
    vals = (packed.astype(jnp.uint32)[..., None] >> shifts) & 0xF
    return vals.reshape(packed.shape[:-1] + (-1,)).astype(jnp.uint8)


def _jnp_w4_in_out(qweight, quant_type: int):
    if quant_type == AWQ_GEMM:
        # unpack+reorder fused: out[j] = (x >> 4*REVERSE_ORDER[j]) & 0xF.
        return _jnp_unpack_nibbles(qweight, order=AWQ_REVERSE_ORDER)
    return _jnp_unpack_nibbles(qweight).T  # GEMV stores (out, in)


def build_awq_linear_lazy(qweight, scales, qzeros, quant_type: int,
                          packed: bool):
    """Deferred version of build_awq_linear / build_awq_linear_packed.

    Returns the same dict with the heavy payload as a Pending marker
    (resolved on device in the batched finalize); zero/scale parts are
    small (1/group_size of the payload) and stay eager numpy.
    """
    from ..utils.lazy import Pending

    w4_np, zeros, s = None, None, None
    # Zeros/scales: small; unpack on host.
    if quant_type == AWQ_GEMM:
        zeros = _reorder_awq(_unpack_nibbles(qzeros), reverse=True)
        s = np.asarray(scales, dtype=np.float32)
    else:
        n_groups = scales.shape[1]
        zeros = _unpack_nibbles(qzeros)[:, :n_groups].T
        s = np.ascontiguousarray(np.asarray(scales, np.float32).T)

    meta = {"kind": "awq"}
    if packed:
        def fn(qw):
            import jax.numpy as jnp

            w4 = _jnp_w4_in_out(qw, quant_type)
            K = w4.shape[0]
            lo = w4[: K // 2]
            hi = w4[K // 2:]
            return (lo | (hi << 4)).astype(jnp.uint8).view(jnp.int8)

        def host_fn(qw):
            return build_awq_linear_packed(qw, scales, qzeros,
                                           quant_type)["w4p"]

        import jax.numpy as jnp

        return {
            "w4p": Pending(fn, (qweight,), host_fn=host_fn, meta=meta),
            "g_scale": jnp.asarray(s, jnp.float32),
            "g_zs": jnp.asarray(zeros.astype(np.float32) * s, jnp.float32),
        }

    G = None

    def fn(qw, z):
        import jax.numpy as jnp

        w4 = _jnp_w4_in_out(qw, quant_type)
        g = w4.shape[0] // z.shape[0]
        zz = jnp.repeat(z, g, axis=0)
        return (w4.astype(jnp.int16) - zz.astype(jnp.int16)).astype(jnp.int8)

    def host_fn(qw, z):
        return build_awq_linear(qw, scales, qzeros, quant_type)["w4"]

    import jax.numpy as jnp

    return {
        "w4": Pending(fn, (qweight, zeros), host_fn=host_fn, meta=meta),
        "g_scale": jnp.asarray(s, jnp.float32),
    }
