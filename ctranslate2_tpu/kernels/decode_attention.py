"""Pallas decode attention over an INT8-quantized KV cache.

SURVEY kernel #4 ("paged/blocked KV-cache decode attention with INT8 KV"):
the reference keeps fp16/fp32 KV caches and recomputes attention with full
dense reads (reference: src/layers/attention.cc:536-563); on TPU the decode
step is HBM-bound on the cache read, so keys/values are stored as int8 with
one float scale per (batch, head, position) vector — halving both cache
memory and decode-step bandwidth vs bf16 — and dequantized in VMEM right
before the MXU (the technique of INT8 KV-cache serving systems, e.g.
QServe/BitDecoding-style decode kernels).

Single-step (T=1) blockwise online-softmax kernel. The GQA query group is
folded into the query block so each KV block is streamed from HBM exactly
once and the Q.K dot runs at (group x block) MXU shape.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def quantize_kv(x):
    """Per-vector symmetric int8 quantization over the last axis.

    Returns (q int8, scale f32) with ``x ~= q / scale``; zero vectors get
    scale 1.
    """
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1)
    scale = jnp.where(amax > 0, 127.0 / amax, 1.0)
    q = jnp.clip(jnp.rint(x.astype(jnp.float32) * scale[..., None]),
                 -127, 127).astype(jnp.int8)
    return q, scale


def _decode_kernel(
    lengths_ref,  # scalar prefetch: [B] int32 valid KV lengths
    q_ref,  # [1, Hkv, G, D]  (all query heads of this batch row)
    k_ref,  # [1, Hkv, BC, D] int8
    ks_ref,  # [1, Hkv, 1, BC] f32
    v_ref,  # [1, Hkv, BC, D] int8
    vs_ref,  # [1, Hkv, 1, BC] f32
    *rest,  # [fresh refs: kn, kns, vn, vns] + o_ref + scratch (m, l, acc)
    scale: float,
    block_c: int,
    num_kv_heads: int,
    window: int,
    has_fresh: bool = False,
):
    if has_fresh:
        # kn_ref/vn_ref: [1, Hkv, 1, D] int8; kns_ref/vns_ref: [1, Hkv, 1, 1]
        kn_ref, kns_ref, vn_ref, vns_ref, o_ref, m_ref, l_ref, acc_ref = rest
    else:
        o_ref, m_ref, l_ref, acc_ref = rest
    # Grid = (batch rows, cache blocks): each step DMAs ALL kv heads' K/V
    # for one row, keeping transfers large (a per-(row, head) grid moves
    # tens of KB per step and is DMA-latency-bound).
    b = pl.program_id(0)
    cj = pl.program_id(1)
    nc = pl.num_programs(1)

    @pl.when(cj == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    length = lengths_ref[b]
    c_start = cj * block_c

    run = c_start < length
    if window > 0:
        run = run & (c_start + block_c > length - window)

    @pl.when(run)
    def _compute():
        pos = c_start + jax.lax.broadcasted_iota(jnp.int32, (1, block_c), 1)
        mask = pos < length
        if window > 0:
            mask = mask & (pos >= length - window)

        for h in range(num_kv_heads):  # static unroll over kv heads
            q = q_ref[0, h].astype(jnp.float32) * scale  # [G, D]
            k = k_ref[0, h].astype(jnp.float32)  # [BC, D]
            # scores = (q . k8) / k_scale — exact rescaling (one scale per
            # cached vector, constant along the contraction).
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)  # [G, BC]
            s = s / ks_ref[0, h]
            s = jnp.where(mask, s, NEG_INF)

            m_prev = m_ref[h]
            m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
            p = jnp.exp(s - m_new)
            corr = jnp.exp(m_prev - m_new)

            l_ref[h] = l_ref[h] * corr + jnp.sum(p, axis=-1, keepdims=True)
            pv = p / vs_ref[0, h]  # fold the V dequant scale into the weights
            acc_ref[h] = acc_ref[h] * corr + jax.lax.dot_general(
                pv, v_ref[0, h].astype(jnp.float32),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            m_ref[h] = m_new

    @pl.when(cj == nc - 1)
    def _done():
        if has_fresh:
            # Merge this step's fresh K/V (kept out of the cache so the
            # cache append can be the decode loop body's LAST writer and
            # run in place) into the online softmax as a 1-key block.
            for h in range(num_kv_heads):
                q = q_ref[0, h].astype(jnp.float32) * scale  # [G, D]
                kn = kn_ref[0, h, 0].astype(jnp.float32)  # [D]
                lf = jnp.sum(q * kn[None, :], axis=-1, keepdims=True)
                lf = lf / kns_ref[0, h, 0, 0]  # [G, 1]
                m_prev = m_ref[h]
                m_new = jnp.maximum(m_prev, lf)
                p = jnp.exp(lf - m_new)
                corr = jnp.exp(m_prev - m_new)
                l_ref[h] = l_ref[h] * corr + p
                vn = vn_ref[0, h, 0].astype(jnp.float32)  # [D]
                acc_ref[h] = acc_ref[h] * corr + (
                    p / vns_ref[0, h, 0, 0]) * vn[None, :]
        denom = jnp.maximum(l_ref[:], 1e-20)
        o_ref[0] = (acc_ref[:] / denom).astype(o_ref.dtype)


def decode_attention_int8(
    q,  # [B, Hq, 1, D] float
    k8,  # [B, Hkv, C, D] int8
    k_scale,  # [B, Hkv, C] f32
    v8,  # [B, Hkv, C, D] int8
    v_scale,  # [B, Hkv, C] f32
    lengths,  # [B] int32 valid cache lengths
    *,
    k_new8=None,  # [B, Hkv, 1, D] int8: this step's key (NOT yet in cache)
    kn_scale=None,  # [B, Hkv, 1] f32
    v_new8=None,
    vn_scale=None,
    scale: float = 1.0,
    window: int = 0,
    block_c: int = 2048,
    interpret: bool = False,
):
    """Single-step attention over the int8 cache; returns [B, Hq, 1, D].

    When ``k_new8``/``v_new8`` are given, ``lengths`` are PRE-append
    lengths and the fresh token is merged in-kernel, so the caller can
    append to the cache AFTER attention (in-place carry update).
    """
    B, Hq, Tq, D = q.shape
    Hkv, C = k8.shape[1], k8.shape[2]
    group = Hq // Hkv
    has_fresh = k_new8 is not None
    if has_fresh and window > 0:
        # ``window`` is in post-append terms (fresh token counts as one of
        # the window keys); the cache part therefore shows window-1 keys.
        if window == 1:
            lengths = jnp.zeros_like(lengths)  # fresh token only
            window = 0
        else:
            window -= 1

    out_d = D
    if D % 128:
        pad = 128 - D % 128
        q = jnp.pad(q, ((0, 0), (0, 0), (0, 0), (0, pad)))
        k8 = jnp.pad(k8, ((0, 0), (0, 0), (0, 0), (0, pad)))
        v8 = jnp.pad(v8, ((0, 0), (0, 0), (0, 0), (0, pad)))
        if has_fresh:
            k_new8 = jnp.pad(k_new8, ((0, 0), (0, 0), (0, 0), (0, pad)))
            v_new8 = jnp.pad(v_new8, ((0, 0), (0, 0), (0, 0), (0, pad)))
        D += pad

    # Keep the per-step K+V blocks (all kv heads) within ~2MB of VMEM so
    # double buffering fits the 16MB scoped limit.
    vmem_budget = 2 * 1024 * 1024
    cap = max(128, (vmem_budget // (Hkv * D * 2)) // 128 * 128)
    block_c = min(block_c, C, cap)
    nc = pl.cdiv(C, block_c)
    if C % block_c:
        pad_c = nc * block_c - C
        k8 = jnp.pad(k8, ((0, 0), (0, 0), (0, pad_c), (0, 0)))
        v8 = jnp.pad(v8, ((0, 0), (0, 0), (0, pad_c), (0, 0)))
        k_scale = jnp.pad(k_scale, ((0, 0), (0, 0), (0, pad_c)),
                          constant_values=1.0)
        v_scale = jnp.pad(v_scale, ((0, 0), (0, 0), (0, pad_c)),
                          constant_values=1.0)
        C = nc * block_c

    # Group queries by kv head: [B, Hkv, group, D].
    qr = q.reshape(B, Hkv, group, D)
    ksr = k_scale.reshape(B, Hkv, 1, C)
    vsr = v_scale.reshape(B, Hkv, 1, C)

    in_specs = [
        pl.BlockSpec((1, Hkv, group, D), lambda b, cj, lens: (b, 0, 0, 0)),
        pl.BlockSpec((1, Hkv, block_c, D),
                     lambda b, cj, lens: (b, 0, cj, 0)),
        pl.BlockSpec((1, Hkv, 1, block_c),
                     lambda b, cj, lens: (b, 0, 0, cj)),
        pl.BlockSpec((1, Hkv, block_c, D),
                     lambda b, cj, lens: (b, 0, cj, 0)),
        pl.BlockSpec((1, Hkv, 1, block_c),
                     lambda b, cj, lens: (b, 0, 0, cj)),
    ]
    operands = [lengths.astype(jnp.int32), qr, k8, ksr, v8, vsr]
    if has_fresh:
        in_specs += [
            pl.BlockSpec((1, Hkv, 1, D), lambda b, cj, lens: (b, 0, 0, 0)),
            pl.BlockSpec((1, Hkv, 1, 1), lambda b, cj, lens: (b, 0, 0, 0)),
            pl.BlockSpec((1, Hkv, 1, D), lambda b, cj, lens: (b, 0, 0, 0)),
            pl.BlockSpec((1, Hkv, 1, 1), lambda b, cj, lens: (b, 0, 0, 0)),
        ]
        operands += [
            k_new8, kn_scale.reshape(B, Hkv, 1, 1).astype(jnp.float32),
            v_new8, vn_scale.reshape(B, Hkv, 1, 1).astype(jnp.float32),
        ]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, nc),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, Hkv, group, D),
                               lambda b, cj, lens: (b, 0, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((Hkv, group, 1), jnp.float32),
            pltpu.VMEM((Hkv, group, 1), jnp.float32),
            pltpu.VMEM((Hkv, group, D), jnp.float32),
        ],
    )

    out = pl.pallas_call(
        functools.partial(
            _decode_kernel,
            scale=scale,
            block_c=block_c,
            num_kv_heads=Hkv,
            window=window,
            has_fresh=has_fresh,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Hkv, group, D), jnp.float32),
        interpret=interpret,
    )(*operands)

    out = out.reshape(B, Hq, 1, D)
    if out_d != D:
        out = out[..., :out_d]
    return out
