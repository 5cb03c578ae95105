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
    """[1, 1, Tq, Tk] causal bias; query i attends keys <= i + offset."""
    q_pos = jnp.arange(num_queries, dtype=jnp.int32)[:, None] + offset
    k_pos = jnp.arange(num_keys, dtype=jnp.int32)[None, :]
    valid = k_pos <= q_pos
    return jnp.where(valid, 0.0, NEG_INF).astype(jnp.float32)[None, None]


def sliding_window_bias(num_queries: int, num_keys: int, window: int, offset=0):
    """Restrict attention to the last ``window`` keys (inclusive of self)."""
    q_pos = jnp.arange(num_queries, dtype=jnp.int32)[:, None] + offset
    k_pos = jnp.arange(num_keys, dtype=jnp.int32)[None, :]
    valid = k_pos > q_pos - window
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
    (reference: src/layers/attention.cc:51-101). ``query_offset`` may be traced."""
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
    """[H, Tq, Tk] additive bias from the learned [num_buckets, H] table."""
    buckets = relative_position_bucket(
        num_queries, num_keys, rel_attention_bias.shape[0], max_distance,
        bidirectional, query_offset)
    values = jnp.take(rel_attention_bias, buckets, axis=0)  # [Tq, Tk, H]
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
        # rel_rep: [Tq, Tk, D]; logits += scale * q . rel_rep
        rel_rep = jnp.take(rel_position_keys, rel_positions, axis=0)
        rel_logits = jnp.einsum(
            "bhgqd,qkd->bhgqk", qg, rel_rep, preferred_element_type=jnp.float32
        ) * queries_scale
        logits = logits + rel_logits

    if bias is not None:
        bias = bias.astype(jnp.float32)
        if bias.ndim == 3:  # per-head [Hq, Tq, Tk]
            bias = bias.reshape(1, Hkv, group, *bias.shape[1:])
        elif bias.ndim == 4:  # [B, H|1, Tq, Tk]
            if bias.shape[1] == 1:
                bias = bias[:, :, None]
            else:
                bias = bias.reshape(B, Hkv, group, *bias.shape[2:])
        logits = logits + bias

    weights = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum(
        "bhgqk,bhkd->bhgqd", weights.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    )

    if rel_position_values is not None:
        rel_rep_v = jnp.take(rel_position_values, rel_positions, axis=0)
        out = out + jnp.einsum(
            "bhgqk,qkd->bhgqd", weights.astype(v.dtype), rel_rep_v,
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
