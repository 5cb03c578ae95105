"""Pallas flash attention (prefill / full-sequence).

TPU-native replacement for the reference's vendored FA2 CUDA kernels
(reference: src/ops/flash_attention_gpu.cu, src/ops/flash-attention/*):
blockwise online-softmax attention that never materializes the [Tq, Tk]
score matrix. Grid = (batch*heads, q_blocks, k_blocks); the TPU grid is
executed sequentially over the last dimension, so the running max / sum /
accumulator live in VMEM scratch across k-block iterations.

Supports GQA/MQA (kv-head indexing by query-head group), causal masking
with a query position offset, per-batch KV valid lengths, sliding
windows, SEGMENT IDS for packed sequences (SURVEY kernel #3), in-kernel
ALiBi (per-head slopes, positive or negative position conventions), and
an in-kernel T5 RELATIVE-POSITION BIAS hook: the [num_buckets, H]
learned table rides scalar-prefetch SMEM and the bucket index is
recomputed per score block (reference: src/layers/attention.cc:51-101),
so the [Tq, Tk]-sized bias tensor the XLA path materializes never
exists. Shaw-style relative keys/values still fall back (they gather
score-matrix-sized *embeddings*, not per-head scalars).
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30

# ALiBi conventions (reference: src/layers/attention_layer.cc:13-52):
ALIBI_NONE = 0
ALIBI_NEGATIVE = 1  # bias = slope * (k_pos - (T_valid - 1))
ALIBI_POSITIVE = 2  # bias = slope * k_pos

# T5 relative-position bias modes:
REL_NONE = 0
REL_CAUSAL = 1  # bidirectional=False (decoder self-attention)
REL_BIDIRECTIONAL = 2  # bidirectional=True (encoder self-attention)


def _attn_kernel(
    # scalar prefetch
    lengths_ref,  # [B] int32
    slopes_ref,  # [Hq] f32 ALiBi slopes (zeros when unused)
    tab_ref,  # [Hq, NB] f32 T5 bucket table ([1, 1] zeros when unused)
    # inputs
    q_ref,  # [BQ, D]
    k_ref,  # [BK, D]
    v_ref,  # [BK, D]
    qseg_ref,  # [B, BQ] int32 or None (packed-sequence segment ids)
    kseg_ref,  # [B, BK] int32 or None
    # outputs
    o_ref,  # [BQ, D]
    # scratch
    m_ref,  # [BQ, 1] f32 running max
    l_ref,  # [BQ, 1] f32 running sum
    acc_ref,  # [BQ, D] f32 accumulator
    *,
    scale: float,
    causal: bool,
    q_offset: int,
    block_q: int,
    block_k: int,
    num_heads: int,
    window: int,
    has_lengths: bool,
    has_segments: bool,
    alibi: int,
    alibi_offs: int,
    rel: int,
    rel_nb: int,
    rel_maxd: int,
):
    bh = pl.program_id(0)
    qi = pl.program_id(1)
    kj = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(kj == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q_start = qi * block_q + q_offset
    k_start = kj * block_k

    # Block-level skip for causal / sliding-window locality.
    run = jnp.bool_(True)
    if causal:
        run = run & (k_start <= q_start + block_q - 1)
    if window > 0:
        run = run & (k_start + block_k - 1 > q_start - window)

    @pl.when(run)
    def _compute():
        q = q_ref[:].astype(jnp.float32) * scale
        k = k_ref[:].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)  # [BQ, BK]

        q_pos = q_start + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 0)
        k_pos = k_start + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 1)

        if alibi != ALIBI_NONE:
            slope = slopes_ref[bh % num_heads]
            s = s + slope * (k_pos - alibi_offs).astype(jnp.float32)

        if rel != REL_NONE:
            # Recompute the T5 bucket index for this block (mirrors
            # ops/attention.py relative_position_bucket, reference
            # src/layers/attention.cc:51-101) and fold the learned
            # per-(head, bucket) scalars in via NB selects — no
            # score-matrix-sized bias tensor is ever materialized.
            relp = k_pos - q_pos  # [BQ, BK] int32
            if rel == REL_BIDIRECTIONAL:
                nbh = rel_nb // 2
                base = jnp.where(relp > 0, nbh, 0)
                r = jnp.abs(relp)
            else:
                nbh = rel_nb
                base = jnp.zeros_like(relp)
                r = -jnp.minimum(relp, 0)
            max_exact = nbh // 2
            is_small = r < max_exact
            r_safe = jnp.maximum(r, 1).astype(jnp.float32)
            large = max_exact + (
                jnp.log(r_safe / max_exact)
                / math.log(rel_maxd / max_exact)
                * (nbh - max_exact)
            ).astype(jnp.int32)
            large = jnp.minimum(large, nbh - 1)
            bucket = base + jnp.where(is_small, r, large)
            h = bh % num_heads
            bias = jnp.zeros((block_q, block_k), jnp.float32)
            for b in range(rel_nb):
                bias = jnp.where(bucket == b, tab_ref[h, b], bias)
            s = s + bias

        mask = jnp.ones((block_q, block_k), jnp.bool_)
        if causal:
            mask = mask & (k_pos <= q_pos)
        if window > 0:
            mask = mask & (k_pos > q_pos - window)
        if has_lengths:
            b = bh // num_heads
            mask = mask & (k_pos < lengths_ref[b])
        if has_segments:
            b = bh // num_heads
            qs = qseg_ref[b, :]
            ks = kseg_ref[b, :]
            mask = mask & (qs[:, None] == ks[None, :])
        s = jnp.where(mask, s, NEG_INF)

        m_prev = m_ref[:]
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)

        p = jnp.exp(s - m_new)  # [BQ, BK]
        # Fully-masked blocks contribute nothing (exp(NEG-NEG)=1 guard).
        p = jnp.where(m_new > NEG_INF / 2, p, 0.0)
        correction = jnp.exp(m_prev - m_new)  # [BQ, 1]

        l_ref[:] = l_ref[:] * correction + jnp.sum(p, axis=-1, keepdims=True)
        acc_ref[:] = acc_ref[:] * correction + jax.lax.dot_general(
            p.astype(v_ref.dtype), v_ref[:],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        m_ref[:] = m_new

    @pl.when(kj == nk - 1)
    def _finish():
        denom = jnp.maximum(l_ref[:], 1e-20)
        o_ref[:] = (acc_ref[:] / denom).astype(o_ref.dtype)


def flash_attention(
    q,  # [B, Hq, Tq, D]
    k,  # [B, Hkv, Tk, D]
    v,  # [B, Hkv, Tk, D]
    *,
    scale: float = 1.0,
    causal: bool = False,
    q_offset: int = 0,
    lengths=None,  # [B] int32 valid KV lengths
    window: int = 0,
    segment_ids=None,  # [B, T] int32 packed-sequence ids (self-attention:
    # Tq == Tk); queries only attend keys of the same segment
    alibi_slopes=None,  # [Hq] f32 per-head slopes (scale_alibi prefolded)
    alibi_positive: bool = False,
    rel_bias_table=None,  # [num_buckets, Hq] learned T5 table (as stored)
    rel_max_distance: int = 0,
    rel_bidirectional: bool = True,
    block_q: int = 256,
    block_k: int = 256,
):
    """Blockwise attention; returns [B, Hq, Tq, D]."""
    B, Hq, Tq, D = q.shape
    Hkv, Tk = k.shape[1], k.shape[2]
    group = Hq // Hkv

    # Mosaic wants 128-lane tiles: pad the head dim with zeros (no effect on
    # logits; padded V columns are sliced off below).
    out_d = D
    if D % 128:
        pad_d = 128 - D % 128
        q = jnp.pad(q, ((0, 0), (0, 0), (0, 0), (0, pad_d)))
        k = jnp.pad(k, ((0, 0), (0, 0), (0, 0), (0, pad_d)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, 0), (0, pad_d)))
        D = D + pad_d

    block_q = min(block_q, max(Tq, 16))
    block_k = min(block_k, max(Tk, 16))
    nq = pl.cdiv(Tq, block_q)
    nk = pl.cdiv(Tk, block_k)

    # Pad to block multiples.
    pq = nq * block_q - Tq
    pk = nk * block_k - Tk
    if pq:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, pq), (0, 0)))
    if pk:
        k = jnp.pad(k, ((0, 0), (0, 0), (0, pk), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, pk), (0, 0)))
        if lengths is None:
            lengths = jnp.full((B,), Tk, jnp.int32)

    has_lengths = lengths is not None
    if lengths is None:
        lengths = jnp.zeros((B,), jnp.int32)  # placeholder

    has_segments = segment_ids is not None
    if has_segments:
        # Mosaic block tiling wants the minor dims (8, 128)-aligned: the
        # segment blocks span the whole batch axis ((B, block) == array
        # dim on the sublane axis) and the kernel row-indexes by batch.
        if block_q % 128 or block_k % 128:
            raise ValueError(
                "segment_ids require 128-aligned block_q/block_k")
        # Padded keys get segment -1 (matches nothing); padded query rows
        # are sliced off after the call.
        qseg = jnp.pad(segment_ids.astype(jnp.int32), ((0, 0), (0, pq)),
                       constant_values=-1)
        kseg = jnp.pad(segment_ids.astype(jnp.int32), ((0, 0), (0, pk)),
                       constant_values=-1)

    alibi = ALIBI_NONE
    alibi_offs = 0
    if alibi_slopes is not None:
        alibi = ALIBI_POSITIVE if alibi_positive else ALIBI_NEGATIVE
        # Negative convention ends at 0 on the last valid key: for the
        # full-sequence path cur_len == Tq (+ q_offset) (reference:
        # src/layers/attention_layer.cc:38-41).
        alibi_offs = 0 if alibi_positive else (q_offset + Tq - 1)
        slopes = alibi_slopes.astype(jnp.float32)
    else:
        slopes = jnp.zeros((Hq,), jnp.float32)

    rel = REL_NONE
    rel_nb = 0
    if rel_bias_table is not None:
        rel = REL_BIDIRECTIONAL if rel_bidirectional else REL_CAUSAL
        rel_nb = rel_bias_table.shape[0]
        if rel_bias_table.shape[1] != Hq:
            raise ValueError("rel_bias_table must be [num_buckets, Hq]")
        # [Hq, NB] in scalar-prefetch SMEM; the kernel reads one scalar
        # per (head, bucket).
        tab = jnp.transpose(rel_bias_table).astype(jnp.float32)
    else:
        tab = jnp.zeros((1, 1), jnp.float32)

    qr = q.reshape(B * Hq, nq * block_q, D)
    kr = k.reshape(B * Hkv, nk * block_k, D)
    vr = v.reshape(B * Hkv, nk * block_k, D)

    in_specs = [
        pl.BlockSpec((1, block_q, D),
                     lambda bh, qi, kj, *_: (bh, qi, 0)),
        pl.BlockSpec((1, block_k, D),
                     lambda bh, qi, kj, *_, g=group: (bh // g, kj, 0)),
        pl.BlockSpec((1, block_k, D),
                     lambda bh, qi, kj, *_, g=group: (bh // g, kj, 0)),
    ]
    inputs = [qr, kr, vr]
    if has_segments:
        in_specs += [
            pl.BlockSpec((B, block_q), lambda bh, qi, kj, *_: (0, qi)),
            pl.BlockSpec((B, block_k), lambda bh, qi, kj, *_: (0, kj)),
        ]
        inputs += [qseg, kseg]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(B * Hq, nq, nk),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, block_q, D),
                               lambda bh, qi, kj, *_: (bh, qi, 0)),
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, D), jnp.float32),
        ],
    )

    def kernel3d(lengths_ref, slopes_ref, tab_ref, q_ref, k_ref, v_ref,
                 *rest):
        if has_segments:
            qseg_ref, kseg_ref, o_ref, m_ref, l_ref, acc_ref = rest
        else:
            (o_ref, m_ref, l_ref, acc_ref), qseg_ref, kseg_ref = rest, None, None
        return _attn_kernel(
            lengths_ref, slopes_ref, tab_ref,
            q_ref.at[0], k_ref.at[0], v_ref.at[0],
            qseg_ref, kseg_ref, o_ref.at[0],
            m_ref, l_ref, acc_ref,
            scale=scale, causal=causal, q_offset=q_offset,
            block_q=block_q, block_k=block_k, num_heads=Hq,
            window=window, has_lengths=has_lengths,
            has_segments=has_segments, alibi=alibi, alibi_offs=alibi_offs,
            rel=rel, rel_nb=rel_nb, rel_maxd=rel_max_distance)

    out = pl.pallas_call(
        kernel3d,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B * Hq, nq * block_q, D), q.dtype),
    )(lengths, slopes, tab, *inputs)

    out = out.reshape(B, Hq, nq * block_q, D)
    if pq:
        out = out[:, :, :Tq]
    if out_d != D:
        out = out[..., :out_d]
    return out
