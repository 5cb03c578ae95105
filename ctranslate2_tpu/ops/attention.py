"""Scaled dot-product attention with GQA/MQA grouping, masks, and biases.

TPU-first design: instead of the reference's replicate-KV-heads + dynamic
Concat cache (reference: src/layers/attention.cc:295-313, 536-557), KV heads
stay un-replicated and queries are grouped ([B, Hkv, G, Tq, D]) so the MXU
contracts full tiles without materializing repeated keys; the KV cache is a
fixed-capacity ring written with ``dynamic_update_slice``. Softmax runs in
float32. Masks are additive f32 biases built from lengths/step inside jit.

Relative-position machinery (T5 buckets, Shaw keys/values, asymmetric) mirrors
reference: src/layers/attention.cc:16-165.
"""

from __future__ import annotations

import math
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

NEG_INF = -1e9


# ---------------------------------------------------------------------------
# Mask builders (all return additive f32 biases broadcastable to
# [B, H, Tq, Tk]; 0 = attend, NEG_INF = masked).
# ---------------------------------------------------------------------------

def length_mask_bias(lengths, num_keys: int):
    """[B, 1, 1, Tk] bias masking keys >= length."""
    key_pos = jnp.arange(num_keys, dtype=jnp.int32)
    valid = key_pos[None, :] < lengths[:, None]
    return jnp.where(valid, 0.0, NEG_INF).astype(jnp.float32)[:, None, None, :]


def causal_mask_bias(num_queries: int, num_keys: int, offset=0):
    """[1, 1, Tq, Tk] causal bias; query i attends keys <= i + offset.

    ``offset`` may be a [B] vector of per-row positions (continuous
    batching: each slot decodes at its own position); then Tq must be 1
    and the result is [B, 1, 1, Tk].
    """
    if getattr(offset, "ndim", 0) > 0:
        # Per-row offsets: [B, 1, Tq, Tk] (row b's query i sits at
        # absolute position offset[b] + i).
        q_pos = (offset[:, None, None]
                 + jnp.arange(num_queries, dtype=jnp.int32)[None, :, None])
        k_pos = jnp.arange(num_keys, dtype=jnp.int32)[None, None, :]
        valid = k_pos <= q_pos
        return jnp.where(valid, 0.0, NEG_INF).astype(jnp.float32)[:, None]
    q_pos = jnp.arange(num_queries, dtype=jnp.int32)[:, None] + offset
    k_pos = jnp.arange(num_keys, dtype=jnp.int32)[None, :]
    valid = k_pos <= q_pos
    return jnp.where(valid, 0.0, NEG_INF).astype(jnp.float32)[None, None]


def sliding_window_bias(num_queries: int, num_keys: int, window: int, offset=0):
    """Restrict attention to the last ``window`` keys (inclusive of self).

    ``offset`` may be a [B] vector (per-row decode positions; row b's
    query i sits at absolute position offset[b] + i, e.g. a speculative
    verify chunk); then the result is [B, 1, Tq, Tk].
    """
    if getattr(offset, "ndim", 0) > 0:
        q_pos = (offset[:, None, None]
                 + jnp.arange(num_queries, dtype=jnp.int32)[None, :, None])
        k_pos = jnp.arange(num_keys, dtype=jnp.int32)[None, None, :]
        valid = k_pos > q_pos - window
        return jnp.where(valid, 0.0, NEG_INF).astype(jnp.float32)[:, None]
    q_pos = jnp.arange(num_queries, dtype=jnp.int32)[:, None] + offset
    k_pos = jnp.arange(num_keys, dtype=jnp.int32)[None, :]
    valid = k_pos > q_pos - window
    return jnp.where(valid, 0.0, NEG_INF).astype(jnp.float32)[None, None]


def ring_window_bias(num_queries: int, ring: int, window: int, offset=0):
    """Attention bias for a RING KV buffer of ``ring`` slots holding a
    sliding window of ``window`` positions (TPU-native replacement for the
    reference's cache Slide/truncate eviction:
    reference src/layers/attention.cc:536-557,587-595).

    Keys are written at ``position % ring``. For a query at absolute
    position q, slot j holds absolute position ``q - d`` where
    ``d = (q - j) mod ring`` (the latest write at or before q); the slot
    is valid iff that position is inside the window (``d < window``) and
    has actually been written (``d <= q``). With ``ring >= 2*window`` and
    prefill chunks of at most ``window`` tokens, same-chunk future keys
    wrap to ``d >= window`` and are masked — so the one formula covers
    chunked prefill and decode.

    The slot with d == 0 is the query's own slot: valid for
    write-then-attend callers (prefill); decode-step callers attend the
    fresh token separately and must exclude the stale slot themselves
    (decode_step_attention's ``pos`` exclusion).

    ``offset`` may be a [B] vector (per-row decode positions, Tq == 1);
    then the result is [B, 1, 1, ring], else [1, 1, Tq, ring].
    """
    j = jnp.arange(ring, dtype=jnp.int32)
    if getattr(offset, "ndim", 0) > 0:
        # Per-row positions; num_queries > 1 = a speculative verify chunk
        # whose query t sits at absolute position offset[b] + t.
        q = offset[:, None] + jnp.arange(num_queries, dtype=jnp.int32)[None]
        d = jnp.mod(q[:, :, None] - j[None, None, :], ring)
        valid = (d < window) & (d <= q[:, :, None])
        return jnp.where(valid, 0.0, NEG_INF).astype(
            jnp.float32)[:, None, :, :]
    q = jnp.arange(num_queries, dtype=jnp.int32)[:, None] + offset
    d = jnp.mod(q - j[None, :], ring)
    valid = (d < window) & (d <= q)
    return jnp.where(valid, 0.0, NEG_INF).astype(jnp.float32)[None, None]


def combine_bias(*biases):
    out = None
    for b in biases:
        if b is None:
            continue
        out = b if out is None else out + b
    return out


# ---------------------------------------------------------------------------
# Relative position representations.
# ---------------------------------------------------------------------------

def make_relative_positions(num_queries: int, num_keys: int, max_position: int,
                            asymmetric: bool = False, left_max: int = 0,
                            right_max: int = 0, query_offset=None):
    """Clipped relative-position index matrix [Tq, Tk]
    (reference: src/layers/attention.cc:16-49).

    ``query_offset`` (may be a traced scalar) is the absolute position of
    query 0; when None, queries are assumed right-aligned with the keys
    (offset = Tk - Tq), the full-sequence convention.
    """
    if not asymmetric and getattr(query_offset, "ndim", 0) > 0:
        # Per-row offsets (continuous batching: each slot decodes at its
        # own absolute position) -> [B, Tq, Tk].
        i = jnp.arange(num_queries, dtype=jnp.int32)[None, :, None]
        j = jnp.arange(num_keys, dtype=jnp.int32)[None, None, :]
        rel = j - (i + query_offset[:, None, None])
        return (jnp.clip(rel, -max_position, max_position)
                + max_position).astype(jnp.int32)
    i = jnp.arange(num_queries, dtype=jnp.int32)[:, None]
    j = jnp.arange(num_keys, dtype=jnp.int32)[None, :]
    if asymmetric:
        rel = jnp.clip(j - i, -left_max, right_max) + left_max
    else:
        offset = (num_keys - num_queries) if query_offset is None else query_offset
        rel = jnp.clip(j - (i + offset), -max_position, max_position) + max_position
    return rel.astype(jnp.int32)


def relative_position_bucket(num_queries: int, num_keys: int, num_buckets: int,
                             max_distance: int, bidirectional: bool, query_offset=0):
    """T5 relative position buckets [Tq, Tk]
    (reference: src/layers/attention.cc:51-101). ``query_offset`` may be
    traced, and may be a [B] vector of per-row positions (continuous
    batching), giving [B, Tq, Tk]."""
    if getattr(query_offset, "ndim", 0) > 0:
        i = (jnp.arange(num_queries, dtype=jnp.int32)[None, :, None]
             + query_offset[:, None, None])
        j = jnp.arange(num_keys, dtype=jnp.int32)[None, None, :]
    else:
        i = jnp.arange(num_queries, dtype=jnp.int32)[:, None] + query_offset
        j = jnp.arange(num_keys, dtype=jnp.int32)[None, :]
    rel = j - i
    nb = num_buckets
    if bidirectional:
        nb //= 2
        buckets = jnp.where(rel > 0, nb, 0)
        rel = jnp.abs(rel)
    else:
        buckets = jnp.zeros_like(rel)
        rel = -jnp.minimum(rel, 0)
    max_exact = nb // 2
    is_small = rel < max_exact
    rel_safe = jnp.maximum(rel, 1).astype(jnp.float32)
    large = max_exact + (
        jnp.log(rel_safe / max_exact)
        / math.log(max_distance / max_exact)
        * (nb - max_exact)
    ).astype(jnp.int32)
    large = jnp.minimum(large, nb - 1)
    return (buckets + jnp.where(is_small, rel, large)).astype(jnp.int32)


def t5_position_bias(rel_attention_bias, num_queries: int, num_keys: int,
                     max_distance: int, bidirectional: bool, query_offset=0):
    """[H, Tq, Tk] additive bias from the learned [num_buckets, H] table;
    [B, H, Tq, Tk] when ``query_offset`` is a [B] per-row vector."""
    buckets = relative_position_bucket(
        num_queries, num_keys, rel_attention_bias.shape[0], max_distance,
        bidirectional, query_offset)
    values = jnp.take(rel_attention_bias, buckets, axis=0)  # [.., Tq, Tk, H]
    if buckets.ndim == 3:
        return jnp.transpose(values, (0, 3, 1, 2)).astype(jnp.float32)
    return jnp.transpose(values, (2, 0, 1)).astype(jnp.float32)


# ---------------------------------------------------------------------------
# Core attention.
# ---------------------------------------------------------------------------

def dot_product_attention(
    q,  # [B, Hq, Tq, D]
    k,  # [B, Hkv, Tk, D]
    v,  # [B, Hkv, Tk, D]
    bias=None,  # additive f32, broadcastable to [B, Hq, Tq, Tk] (or [Hq, Tq, Tk])
    queries_scale: float = 1.0,
    return_weights: bool = False,
    rel_position_keys=None,  # [2P+1, D] Shaw tables
    rel_position_values=None,
    rel_positions=None,  # [Tq, Tk] int32 indices into the tables
):
    B, Hq, Tq, D = q.shape
    Hkv = k.shape[1]
    group = Hq // Hkv

    qg = q.reshape(B, Hkv, group, Tq, D)
    logits = jnp.einsum(
        "bhgqd,bhkd->bhgqk", qg, k, preferred_element_type=jnp.float32
    ) * queries_scale

    if rel_position_keys is not None:
        # rel_rep: [Tq, Tk, D] (shared) or [B, Tq, Tk, D] (per-row
        # positions, continuous batching); logits += scale * q . rel_rep
        rel_rep = jnp.take(rel_position_keys, rel_positions, axis=0)
        eq = "bhgqd,bqkd->bhgqk" if rel_positions.ndim == 3 else \
            "bhgqd,qkd->bhgqk"
        rel_logits = jnp.einsum(
            eq, qg, rel_rep, preferred_element_type=jnp.float32
        ) * queries_scale
        logits = logits + rel_logits

    if bias is not None:
        bias = bias.astype(jnp.float32)
        if bias.ndim == 3:  # per-head [Hq, Tq, Tk]
            bias = bias.reshape(1, Hkv, group, *bias.shape[1:])
        elif bias.ndim == 4:  # [B|1, H|1, Tq, Tk]
            if bias.shape[1] == 1:
                bias = bias[:, :, None]
            else:
                bias = bias.reshape(bias.shape[0], Hkv, group,
                                    *bias.shape[2:])
        logits = logits + bias

    weights = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum(
        "bhgqk,bhkd->bhgqd", weights.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    )

    if rel_position_values is not None:
        rel_rep_v = jnp.take(rel_position_values, rel_positions, axis=0)
        eq = "bhgqk,bqkd->bhgqd" if rel_positions.ndim == 3 else \
            "bhgqk,qkd->bhgqd"
        out = out + jnp.einsum(
            eq, weights.astype(v.dtype), rel_rep_v,
            preferred_element_type=jnp.float32,
        )

    out = out.reshape(B, Hq, Tq, D).astype(q.dtype)
    if return_weights == "logits":
        # Pre-softmax scores, for consumers that re-normalize after
        # removing padding (reference: src/models/whisper.cc:520-556).
        return out, logits.reshape(B, Hq, Tq, -1)
    if return_weights:
        return out, weights.reshape(B, Hq, Tq, -1)
    return out


def split_heads(x, num_heads: int):
    """[B, T, H*D] -> [B, H, T, D]"""
    B, T, HD = x.shape
    return x.reshape(B, T, num_heads, HD // num_heads).transpose(0, 2, 1, 3)


def combine_heads(x):
    """[B, H, T, D] -> [B, T, H*D]"""
    B, H, T, D = x.shape
    return x.transpose(0, 2, 1, 3).reshape(B, T, H * D)


def beam_chain_attention(
    q,  # [N, Hq, 1, D], N = B*beam row-major
    k,  # [N, Hkv, C, D] (never physically reordered)
    v,  # [N, Hkv, C, D]
    chain,  # [N, C] int32: slot j's owning beam within the group, or -1
    *,
    beam_size: int,
    queries_scale: float = 1.0,
    bias=None,  # additive, broadcastable over slots [.., 1, C]
    alibi_bias=None,  # [Hq, 1, C]
    k_new=None,  # [N, Hkv, 1, D]: this step's fresh key (pre-append)
    v_new=None,
    fresh_bias=None,  # scalar/[Hq] additive for the fresh token
):
    """Beam attention without physical cache reordering.

    Instead of gathering KV rows by beam origin every step (3x the cache
    bytes in staging traffic), each query attends over its WHOLE beam
    group's cache [beam*C slots] with an additive mask selecting, per
    slot, the one physical beam recorded in the origin chain. The chain is
    a [N, C] int32 array updated with tiny gathers; unwritten slots are -1,
    which also subsumes the causal mask for single-token decode.
    """
    N, Hq, Tq, D = q.shape
    Hkv, C = k.shape[1], k.shape[2]
    K = beam_size
    B = N // K
    group = Hq // Hkv

    qg = q.reshape(B, K, Hkv, group, Tq, D)
    kg = k.reshape(B, K, Hkv, C, D)
    vg = v.reshape(B, K, Hkv, C, D)

    logits = jnp.einsum(
        "bkhgqd,bphcd->bkhgqpc", qg, kg,
        preferred_element_type=jnp.float32) * queries_scale

    # Chain mask: slot (p, c) visible to beam k iff chain[b, k, c] == p.
    ch = chain.reshape(B, K, C)
    valid = ch[:, :, None, :] == jnp.arange(K, dtype=chain.dtype)[None, None, :, None]
    mask = jnp.where(valid, 0.0, -1e30)  # [B, K, K, C]
    logits = logits + mask[:, :, None, None, None, :, :]

    if bias is not None:
        b4 = bias.astype(jnp.float32)
        # broadcastable over slots: [.., Tq, C] -> add over the p axis
        logits = logits + b4.reshape(
            (1,) * 4 + (Tq, 1, C) if b4.ndim <= 4 else b4.shape)
    if alibi_bias is not None:
        ab = alibi_bias.astype(jnp.float32).reshape(1, 1, Hkv, group, Tq, 1, C)
        logits = logits + ab

    flat = logits.reshape(B, K, Hkv, group, Tq, K * C)
    if k_new is not None:
        # Fresh token attends through its own row (kept out of the cache so
        # the append can be the loop body's last writer).
        lf = jnp.einsum(
            "bkhgqd,bkhd->bkhgq", qg, k_new.reshape(B, K, Hkv, D),
            preferred_element_type=jnp.float32) * queries_scale
        if fresh_bias is not None:
            lf = lf + fresh_bias
        flat = jnp.concatenate([flat, lf[..., None]], axis=-1)
    weights = jax.nn.softmax(flat, axis=-1)
    wc = weights[..., :K * C].reshape(
        B, K, Hkv, group, Tq, K, C)
    out = jnp.einsum(
        "bkhgqpc,bphcd->bkhgqd", wc.astype(v.dtype), vg,
        preferred_element_type=jnp.float32)
    if k_new is not None:
        out = out + jnp.einsum(
            "bkhgq,bkhd->bkhgqd", weights[..., K * C].astype(v.dtype),
            v_new.reshape(B, K, Hkv, D),
            preferred_element_type=jnp.float32)
    return out.reshape(N, Hq, Tq, D).astype(q.dtype)


def chunked_beam_chain_attention(
    q,  # [N, Hq, 1, D], N = B*beam row-major
    k,  # [N, Hkv, C, D]
    v,
    chain,  # [N, C] int32 origin chain
    k_new,  # [N, Hkv, 1, D]
    v_new,
    pos,  # traced scalar: number of valid cached slots
    *,
    beam_size: int,
    queries_scale: float = 1.0,
    chunk: int = 128,
):
    """``beam_chain_attention`` (fresh-token form) reading only the written
    cache prefix, via an online-softmax loop over ``ceil(pos/chunk)``
    dynamic-slice chunks (see ``chunked_decode_attention``)."""
    N, Hq, Tq, D = q.shape
    Hkv, C = k.shape[1], k.shape[2]
    K = beam_size
    B = N // K
    group = Hq // Hkv

    qg = q.reshape(B, K, Hkv, group, D)
    kg = k.reshape(B, K, Hkv, C, D)
    vg = v.reshape(B, K, Hkv, C, D)
    ch = chain.reshape(B, K, C)

    lf = jnp.einsum("bkhgd,bkhd->bkhg", qg, k_new.reshape(B, K, Hkv, D),
                    preferred_element_type=jnp.float32) * queries_scale
    m0 = lf
    l0 = jnp.ones_like(lf)
    acc0 = jnp.broadcast_to(
        v_new.reshape(B, K, Hkv, 1, D).astype(jnp.float32),
        (B, K, Hkv, group, D))

    nchunks = (pos + chunk - 1) // chunk
    beam_ids = jnp.arange(K, dtype=chain.dtype)

    def body(i, carry):
        m, l, acc = carry
        start = i * chunk
        kc = jax.lax.dynamic_slice(
            kg, (0, 0, 0, start, 0), (B, K, Hkv, chunk, D))
        vc = jax.lax.dynamic_slice(
            vg, (0, 0, 0, start, 0), (B, K, Hkv, chunk, D))
        chc = jax.lax.dynamic_slice(ch, (0, 0, start), (B, K, chunk))
        s = jnp.einsum("bkhgd,bphcd->bkhgpc", qg, kc,
                       preferred_element_type=jnp.float32) * queries_scale
        # Slot (p, c) visible to query beam k iff chain[b, k, c] == p (an
        # unwritten slot is -1, matching no beam).
        valid = chc[:, :, None, :] == beam_ids[None, None, :, None]
        s = s + jnp.where(valid, 0.0, -1e30)[:, :, None, None, :, :]
        s = s.reshape(B, K, Hkv, group, K * chunk)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1))
        p = jnp.exp(s - m_new[..., None])
        corr = jnp.exp(m - m_new)
        l = l * corr + jnp.sum(p, axis=-1)
        pw = p.reshape(B, K, Hkv, group, K, chunk).astype(vc.dtype)
        acc = acc * corr[..., None] + jnp.einsum(
            "bkhgpc,bphcd->bkhgd", pw, vc,
            preferred_element_type=jnp.float32)
        return m_new, l, acc

    _, l, acc = jax.lax.fori_loop(0, nchunks, body, (m0, l0, acc0))
    ctx = acc / l[..., None]
    return ctx.reshape(N, Hq, Tq, D).astype(q.dtype)


def decode_step_attention(
    q,  # [B, Hq, 1, D]
    k_pre,  # [B, Hkv, C, D] cache BEFORE this step's append
    v_pre,
    k_new,  # [B, Hkv, 1, D] this step's key/value
    v_new,
    pos,  # traced scalar: slot the fresh token occupies
    *,
    queries_scale: float = 1.0,
    bias=None,  # additive over cache slots, broadcastable [.., 1, C]
    alibi_bias=None,  # [Hq, Tq, C] shared or [B, Hq, Tq, C] per-row
):
    """Single-token decode attention over [pre-update cache | fresh token].

    Mathematically identical to appending first and attending over the
    updated cache, but lets the cache ``dynamic_update_slice`` be the LAST
    op touching the carried buffers in a decode loop — XLA then updates
    in place instead of staging a full copy of every cache array per step.
    Slot ``pos`` of the pre-cache (stale data) is masked out explicitly.
    """
    B, Hq, Tq, D = q.shape
    Hkv, C = k_pre.shape[1], k_pre.shape[2]
    group = Hq // Hkv

    qg = q.reshape(B, Hkv, group, Tq, D)
    lc = jnp.einsum("bhgqd,bhcd->bhgqc", qg, k_pre,
                    preferred_element_type=jnp.float32) * queries_scale
    lf = jnp.einsum("bhgqd,bhd->bhgq", qg, k_new[:, :, 0],
                    preferred_element_type=jnp.float32) * queries_scale

    # Exclude the stale slot `pos` from the cache part (the fresh token is
    # attended through lf). `pos` may be per-row ([B], continuous batching).
    if getattr(pos, "ndim", 0) > 0:
        excl = jnp.where(jnp.arange(C)[None, :] == pos[:, None], -1e30,
                         0.0).reshape(B, 1, 1, 1, C)
    else:
        excl = jnp.where(jnp.arange(C) == pos, -1e30, 0.0)
    lc = lc + excl
    if bias is not None:
        b = bias.astype(jnp.float32)
        if b.ndim == 3:
            b = b.reshape(1, Hkv, group, *b.shape[1:])
        elif b.ndim == 4:
            b = b[:, :, None] if b.shape[1] == 1 else b.reshape(
                B, Hkv, group, *b.shape[2:])
        lc = lc + b
    if alibi_bias is not None:
        # [Hq, Tq, C] shared, or [B, Hq, Tq, C] per-row (continuous
        # batching: each slot decodes at its own position).
        ab = alibi_bias.astype(jnp.float32)
        if ab.ndim == 3:
            ab = ab[None]
        lc = lc + ab.reshape(ab.shape[0], Hkv, group, Tq, C)
        if getattr(pos, "ndim", 0) > 0:
            # Fresh token sits at per-row slot pos[b]: gather its column.
            ab_f = jnp.take_along_axis(
                jnp.broadcast_to(ab, (B, Hq, Tq, C)),
                pos.reshape(B, 1, 1, 1), axis=-1)[..., 0]
            lf = lf + ab_f.reshape(B, Hkv, group, Tq)
        else:
            lf = lf + jax.lax.dynamic_slice_in_dim(
                ab, pos, 1, axis=-1).reshape(ab.shape[0], Hkv, group, Tq)

    full = jnp.concatenate([lc, lf[..., None]], axis=-1)  # [..., C+1]
    w = jax.nn.softmax(full, axis=-1)
    ctx = jnp.einsum("bhgqc,bhcd->bhgqd", w[..., :C].astype(v_pre.dtype),
                     v_pre, preferred_element_type=jnp.float32)
    ctx = ctx + jnp.einsum(
        "bhgq,bhd->bhgqd", w[..., C].astype(v_new.dtype), v_new[:, :, 0],
        preferred_element_type=jnp.float32)
    return ctx.reshape(B, Hq, Tq, D).astype(q.dtype)


def chunked_decode_attention(
    q,  # [B, Hq, 1, D]
    k_pre,  # [B, Hkv, C, D] cache BEFORE this step's append
    v_pre,
    k_new,  # [B, Hkv, 1, D]
    v_new,
    pos,  # traced scalar: number of valid cached slots (< pos)
    *,
    queries_scale: float = 1.0,
    chunk: int = 128,
):
    """``decode_step_attention`` that only READS the written cache prefix.

    The plain path contracts the full fixed capacity every step (masked,
    but the HBM reads still happen). Here an online-softmax ``fori_loop``
    with a data-dependent trip count ``ceil(pos/chunk)`` walks
    ``dynamic_slice`` chunks, so per-step traffic scales with the actual
    length — ~2x less cache bandwidth averaged over a generation. No
    rel-position/ALiBi/window support; callers fall back for those.
    """
    B, Hq, Tq, D = q.shape
    Hkv, C = k_pre.shape[1], k_pre.shape[2]
    group = Hq // Hkv

    qg = q.reshape(B, Hkv, group, D)
    # Seed the accumulators with the fresh token (its logit is the running
    # max, weight exp(0)=1).
    lf = jnp.einsum("bhgd,bhd->bhg", qg, k_new[:, :, 0],
                    preferred_element_type=jnp.float32) * queries_scale
    m0 = lf  # [B, Hkv, G]
    l0 = jnp.ones_like(lf)
    acc0 = jnp.broadcast_to(
        v_new[:, :, None, 0].astype(jnp.float32), (B, Hkv, group, D))

    # `pos` may be per-row ([B], continuous batching): walk to the longest
    # row's prefix, masking each row at its own length.
    pos_vec = getattr(pos, "ndim", 0) > 0
    nchunks = ((jnp.max(pos) if pos_vec else pos) + chunk - 1) // chunk

    def body(i, carry):
        m, l, acc = carry
        start = i * chunk
        kc = jax.lax.dynamic_slice(
            k_pre, (0, 0, start, 0), (B, Hkv, chunk, D))
        vc = jax.lax.dynamic_slice(
            v_pre, (0, 0, start, 0), (B, Hkv, chunk, D))
        s = jnp.einsum("bhgd,bhcd->bhgc", qg, kc,
                       preferred_element_type=jnp.float32) * queries_scale
        if pos_vec:
            valid = (start + jnp.arange(chunk))[None, :] < pos[:, None]
            s = jnp.where(valid[:, None, None, :], s, -1e30)
        else:
            valid = (start + jnp.arange(chunk)) < pos
            s = jnp.where(valid[None, None, None, :], s, -1e30)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1))
        p = jnp.exp(s - m_new[..., None])
        corr = jnp.exp(m - m_new)
        l = l * corr + jnp.sum(p, axis=-1)
        acc = acc * corr[..., None] + jnp.einsum(
            "bhgc,bhcd->bhgd", p.astype(vc.dtype), vc,
            preferred_element_type=jnp.float32)
        return m_new, l, acc

    _, l, acc = jax.lax.fori_loop(0, nchunks, body, (m0, l0, acc0))
    ctx = acc / l[..., None]
    return ctx.reshape(B, Hq, Tq, D).astype(q.dtype)
