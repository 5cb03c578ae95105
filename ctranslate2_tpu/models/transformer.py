"""Functional Transformer encoder/decoder forwards (jit-friendly).

TPU-first re-design of the reference execution model
(reference: src/layers/transformer.cc, src/layers/attention.cc):

- **static shapes everywhere**: inputs are padded to bucketed shapes by the
  host runtime; padding is handled with additive masks, not the reference's
  gather/scatter Padder (reference: src/padder.cc).
- **fixed-capacity KV cache** updated with ``lax.dynamic_update_slice``
  instead of per-step Concat/Slide (reference: src/layers/attention.cc:536-557).
  Positions are uniform across the batch, as in the reference's decoding
  loops (reference: src/decoding.cc:424-974).
- **beam-shared memory**: cross-attention keys/values are computed once per
  source sequence and shared across beams by folding the beam dimension into
  the query time axis (the reference instead excludes ``memory_*`` from beam
  replication: reference: src/layers/transformer.cc:560-563).
- GQA/MQA keep KV heads un-replicated (grouped attention einsum) rather than
  materializing tiled heads (reference: src/layers/attention.cc:295-313).

All functions are pure; the architecture is carried in frozen specs
(:mod:`.spec`) which are static under jit.
"""

from __future__ import annotations

import functools
import os
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..ops import attention as attn_ops
from ..ops.activations import get_activation
from ..ops.linear import linear
from ..ops.norms import apply_norm
from ..ops.positions import (
    alibi_slopes,
    apply_rotary,
    rotary_tables,
    sinusoidal_position_encoding,
)
from .spec import (
    ArchSpec,
    AttentionSpec,
    DecoderSpec,
    EncoderSpec,
)


# ---------------------------------------------------------------------------
# Constants (host-precomputed tables bundled as a device pytree).
# ---------------------------------------------------------------------------


def _rotary_consts(spec: AttentionSpec, attn_params: dict, max_positions: int):
    r = spec.rotary
    dim = r.dim if r.dim else spec.head_dim
    long_factor = attn_params.get("rotary_long_factor")
    short_factor = attn_params.get("rotary_short_factor")
    sin, cos = rotary_tables(
        max_positions,
        dim,
        base=r.base,
        interleave=r.interleave,
        scaling_type=r.scaling_type,
        scaling_factor=r.scaling_factor,
        long_factor=np.asarray(long_factor) if long_factor is not None else None,
        short_factor=np.asarray(short_factor) if short_factor is not None else None,
        low_freq_factor=r.low_freq_factor,
        high_freq_factor=r.high_freq_factor,
        original_max_position_embeddings=r.original_max_position_embeddings,
        max_position_embeddings=r.max_position_embeddings,
    )
    return {"sin": jnp.asarray(sin), "cos": jnp.asarray(cos)}


def make_consts(arch: ArchSpec, params: dict, max_positions: int = 4096) -> dict:
    """Precompute PE / rotary / alibi tables as a device-array pytree."""
    consts: dict = {"max_positions": max_positions}
    for side, spec in (("encoder", arch.encoder), ("decoder", arch.decoder)):
        if spec is None:
            continue
        side_consts: dict = {}
        if spec.sinusoidal_positions:
            dim = params[side]["embeddings"][0].get("w", params[side]["embeddings"][0].get("wq")).shape[-1]
            if spec.embeddings.num_features > 1 and spec.embeddings.merge == "concat":
                dim = sum(
                    e.get("w", e.get("wq")).shape[-1] for e in params[side]["embeddings"]
                )
            side_consts["sinusoidal"] = jnp.asarray(
                sinusoidal_position_encoding(max_positions, dim)
            )
        rotary_layers = {}
        for i, layer in enumerate(spec.layers):
            a = layer.self_attention
            if a.rotary is not None:
                rotary_layers[str(i)] = _rotary_consts(
                    a,
                    _layer_slice(params[side]["layers"], i)["self_attention"],
                    max_positions,
                )
        if rotary_layers:
            side_consts["rotary"] = rotary_layers
        if getattr(spec, "alibi", False):
            side_consts["alibi_slopes"] = jnp.asarray(alibi_slopes(spec.num_heads))
        consts[side] = side_consts
    return consts


# ---------------------------------------------------------------------------
# Embeddings.
# ---------------------------------------------------------------------------


def embed_tokens(emb_params: dict, ids, out_dtype):
    """Gather embedding rows, dequantizing int8 payloads after gather
    (reference: src/layers/common.cc:66-81)."""
    if "wq" in emb_params:
        rows = jnp.take(emb_params["wq"], ids, axis=0).astype(jnp.float32)
        scale = jnp.take(emb_params["scale"], ids, axis=0)
        return (rows / scale[..., None]).astype(out_dtype)
    return jnp.take(emb_params["w"], ids, axis=0).astype(out_dtype)


def embed(side_params: dict, spec, ids, out_dtype, merge: str = "concat"):
    """Single- or multi-feature embedding lookup.

    ``ids``: [B, T] or tuple of [B, T] for multi-feature models.
    """
    emb_list = side_params["embeddings"]
    if not isinstance(ids, (tuple, list)):
        ids = (ids,)
    outs = [embed_tokens(p, i, out_dtype) for p, i in zip(emb_list, ids)]
    if len(outs) == 1:
        return outs[0]
    if merge == "add":
        return functools.reduce(jnp.add, outs)
    return jnp.concatenate(outs, axis=-1)


def _apply_positions(side_params, side_consts, spec, x, offset):
    """Add learned or sinusoidal position encodings at ``offset``.

    The tables encode position t at row t (sinusoidal row t = position t+1,
    matching the reference's 1-based convention:
    reference src/layers/common.cc:203-236).
    """
    T = x.shape[1]
    if spec.has_position_embedding:
        table = side_params["position_encodings"]
    elif spec.sinusoidal_positions:
        table = side_consts["sinusoidal"]
    else:
        return x
    if getattr(offset, "ndim", 0) > 0:
        # Per-row positions (continuous batching / speculative verify).
        pos = offset[:, None] + jnp.arange(T, dtype=jnp.int32)[None, :]
        pe = jnp.take(table, pos, axis=0)  # [B, T, D]
        return x + pe.astype(x.dtype)
    pe = jax.lax.dynamic_slice_in_dim(table, offset, T, axis=0)
    return x + pe.astype(x.dtype)[None]


# ---------------------------------------------------------------------------
# Attention blocks.
# ---------------------------------------------------------------------------


def _norm(arch: ArchSpec, p: Optional[dict], x):
    if p is None:
        return x
    eps = arch.ln_epsilon
    if eps is None:
        eps = 1e-5 if "beta" in p else 1e-6
    return apply_norm(p, x, eps)


def _project_qkv(ap: dict, spec: AttentionSpec, x, quantize_acts: bool):
    """QKV projections + head split for self-attention.

    Projections are stored unfused (artifact layout [Hq*D | Hkv*D | Hkv*D],
    reference: src/layers/attention.cc:479-519) so the output axes shard
    head-aligned under tensor parallelism with no resharding.
    """
    if "qkv" in ap:
        # Single fused projection (the artifact layout, one MXU dispatch);
        # used off-mesh where head-aligned sharding is not needed.
        fused = linear(ap["qkv"], x, quantize_activations=quantize_acts)
        Dq = spec.num_heads * spec.head_dim
        Dkv = spec.num_heads_kv * spec.head_dim
        q = fused[..., :Dq]
        k = fused[..., Dq:Dq + Dkv]
        v = fused[..., Dq + Dkv:]
    else:
        q = linear(ap["q"], x, quantize_activations=quantize_acts)
        k = linear(ap["k"], x, quantize_activations=quantize_acts)
        v = linear(ap["v"], x, quantize_activations=quantize_acts)
    return (
        attn_ops.split_heads(q, spec.num_heads),
        attn_ops.split_heads(k, spec.num_heads_kv),
        attn_ops.split_heads(v, spec.num_heads_kv),
    )


def _maybe_rotary(spec: AttentionSpec, rot_consts, q, k, offset):
    if spec.rotary is None:
        return q, k
    T = q.shape[2]
    dim = spec.rotary.dim if spec.rotary.dim else spec.head_dim
    if getattr(offset, "ndim", 0) > 0:
        # Per-row positions (continuous batching / speculative verify):
        # gather each row's phases; [B, 1, T, dim] broadcasts over heads.
        pos = offset[:, None] + jnp.arange(T, dtype=jnp.int32)[None, :]
        sin = jnp.take(rot_consts["sin"], pos, axis=0)[:, None]
        cos = jnp.take(rot_consts["cos"], pos, axis=0)[:, None]
    else:
        sin = jax.lax.dynamic_slice_in_dim(rot_consts["sin"], offset, T, axis=0)
        cos = jax.lax.dynamic_slice_in_dim(rot_consts["cos"], offset, T, axis=0)
    q = apply_rotary(q, sin, cos, spec.rotary.interleave, dim)
    k = apply_rotary(k, sin, cos, spec.rotary.interleave, dim)
    return q, k


def _qk_norms(arch, ap, spec, q, k, v):
    if spec.has_q_norm:
        q = _norm(arch, ap.get("q_norm"), q)
    if spec.has_k_norm:
        k = _norm(arch, ap.get("k_norm"), k)
    if spec.has_v_norm:
        v = _norm(arch, ap.get("v_norm"), v)
    return q, k, v


def _flash_eligible(spec: AttentionSpec, q, k, alibi_bias, position_bias,
                    rel_positions, flash_lengths,
                    alibi_slopes=None, min_len=None,
                    rel_bias_table=None) -> bool:
    """Static dispatch decision for the Pallas flash-attention kernel.

    Measured crossover (tools/bench_flash.py, B4/H16/D128 causal bf16,
    one chip): ties XLA at <=2048, 2.35x faster at 4096, and at 8192 the
    XLA path OOMs on the materialized score tensor while the kernel
    runs. With ALiBi (in-kernel slopes vs materialized bias): 1.3x at
    2048, 2.7x at 4096. Hence the 2048 default threshold. T5-style
    relative-position BIAS rides the kernel's in-SMEM bucket table
    (``rel_bias_table``); Shaw relative keys/values fall back (they
    gather score-matrix-sized *embeddings*, not per-head scalars)."""
    import os

    if os.environ.get("CT2TPU_FLASH", "1") == "0":
        return False
    if jax.default_backend() != "tpu":
        return False
    if rel_positions is not None:
        return False
    if position_bias is not None and rel_bias_table is None:
        return False
    if alibi_bias is not None and alibi_slopes is None:
        return False
    threshold = (min_len if min_len is not None
                 else int(os.environ.get("CT2TPU_FLASH_MIN_LEN", "2048")))
    return q.shape[2] >= threshold and k.shape[2] >= threshold


def _decode_chunk() -> int:
    """Chunk size for length-adaptive decode attention (0 disables)."""
    return int(os.environ.get("CT2TPU_DECODE_CHUNK", "128"))


def ring_block(arch: ArchSpec) -> int:
    """Sliding-window ring granularity Wr for this model, or 0 when ring
    caches don't apply (no windows, mixed window sizes, or disabled via
    CT2TPU_WINDOW_RING=0).

    Windowed layers store only ``2*Wr`` KV slots (written at
    ``position % (2*Wr)``) instead of the full sequence capacity — the
    O(window) memory behavior of the reference's cache eviction
    (reference src/layers/attention.cc:536-557) without any data movement.
    Prefill chunks must align to multiples of Wr (see
    split_prefill_chunks)."""
    if os.environ.get("CT2TPU_WINDOW_RING", "1") == "0":
        return 0
    if arch.decoder is None:
        return 0
    windows = set()
    for layer in arch.decoder.layers:
        a = layer.self_attention
        if a.sliding_window and a.sliding_window > 1 and not a.has_memory_kv:
            windows.add(a.sliding_window)
    if len(windows) != 1:
        return 0
    (w,) = windows
    return ((w + 127) // 128) * 128


def ring_capacity(arch: ArchSpec) -> int:
    """Per-layer ring buffer capacity (0 = no ring)."""
    wr = ring_block(arch)
    return 2 * wr if wr else 0


def split_prefill_chunks(start: int, length: int, block: int):
    """Split the absolute position range [start, start+length) at every
    multiple of ``block`` (the reference's chunked prefill over
    window-size pieces: src/layers/transformer.cc:735-792). Returns a
    list of (offset, size); the whole range when block == 0."""
    if block <= 0 or length <= 0:
        return [(start, length)]
    out = []
    p = start
    end = start + length
    while p < end:
        nxt = min(((p // block) + 1) * block, end)
        out.append((p, nxt - p))
        p = nxt
    return out


def self_attention_block(
    arch: ArchSpec,
    spec: AttentionSpec,
    ap: dict,
    x,
    *,
    bias,
    rot_consts=None,
    offset=0,
    cache: Optional[dict] = None,
    pre_norm: bool = True,
    quantize_acts: bool = True,
    alibi_bias=None,
    rel_positions=None,
    position_bias=None,
    wrap_norm: bool = True,
    causal: bool = False,
    flash_lengths=None,  # [B] valid lengths enabling the flash kernel path
    causal_only=False,  # True when ``bias`` is exactly the T==1 causal mask
    # (no padding-length rows, no sliding window) — unlocks chunked decode
    # attention, which reads only the written cache prefix
    beam_chain=None,  # [N, C] int32 origin chain (beam loop, see
    # attn_ops.beam_chain_attention) — replaces physical beam reordering
    beam_chain_size: int = 1,
    ring: int = 0,  # ring KV buffer size R (0 = linear cache). Writes land
    # at ``offset % R``; ``bias`` must then be a ring_window_bias over R.
    alibi_slopes=None,  # [Hq] f32: enables in-kernel ALiBi on the flash path
    alibi_positive: bool = True,
    rel_bias_table=None,  # [num_buckets, Hq] learned T5 table: enables the
    # in-kernel relative-position bias on the flash path (position_bias
    # stays the XLA fallback and is DCE'd when the kernel is taken)
    rel_max_distance: int = 0,
    rel_bidirectional: bool = True,
    fresh_prefill: bool = False,  # the cache is empty and this call writes
    # its first T positions: attend over the FRESH tensors only (O(T^2),
    # flash-eligible) instead of the full masked capacity (O(T*C));
    # ``bias`` must then cover [*, T, T].
):
    """Self-attention with optional fixed-capacity KV cache.

    Returns (output, new_cache). ``cache`` holds {"k","v"} of shape
    [B, Hkv, C, D]; new entries are written at ``offset`` (modulo ``ring``
    when the layer uses a sliding-window ring buffer).
    """
    residual = x
    h = x
    if wrap_norm and pre_norm and spec.has_layer_norm:
        h = _norm(arch, ap.get("layer_norm"), h)
    if ring:
        assert beam_chain is None, \
            "ring KV caches are incompatible with chain-mask beam attention"

    q, k, v = _project_qkv(ap, spec, h, quantize_acts)
    q, k, v = _qk_norms(arch, ap, spec, q, k, v)
    q, k = _maybe_rotary(spec, rot_consts, q, k, offset)
    # Cache write slot: absolute position for linear caches, wrapped for
    # ring buffers (RoPE phases above always use the absolute position).
    w_off = jnp.mod(offset, ring) if ring else offset

    new_cache = None
    if cache is not None and fresh_prefill and q.shape[2] > 1:
        # First-chunk prefill: write the cache, then attend over the fresh
        # Q/K/V as if cache-less — prefill attention costs O(T^2) and can
        # take the flash kernel, instead of O(T * capacity) masked reads.
        if "k_scale" in cache:
            new_cache = _update_int8_cache(cache, k, v, w_off, ring=ring)
        else:
            new_cache = {"k": _cache_write(cache["k"], k, w_off, ring=ring),
                         "v": _cache_write(cache["v"], v, w_off, ring=ring)}
        cache = None

    if cache is not None and "k_scale" in cache:
        # INT8 KV cache (SURVEY kernel #4).
        T = q.shape[2]
        extra_free = (alibi_bias is None and position_bias is None
                      and rel_positions is None)
        if T == 1 and extra_free and spec.sliding_window != 1 \
                and not ring \
                and jax.default_backend() == "tpu" \
                and int(os.environ.get("CT2TPU_DECODE_KERNEL", "1")):
            from ..kernels.decode_attention import (
                decode_attention_int8,
                quantize_kv,
            )

            # Fresh-token ordering: attend over [pre-update cache | fresh
            # K/V] so the cache appends below are the loop body's LAST
            # writers (in-place while-carry update instead of a staging
            # copy of every int8 cache array per step).
            k8, ks = quantize_kv(k)
            v8, vs = quantize_kv(v)
            if getattr(offset, "ndim", 0) > 0:
                kv_lengths = offset  # per-row positions (continuous batching)
            else:
                kv_lengths = jnp.full((q.shape[0],), offset, jnp.int32)
            ctx = decode_attention_int8(
                q, cache["k"], cache["k_scale"][:, :, 0, :],
                cache["v"], cache["v_scale"][:, :, 0, :],
                kv_lengths, k_new8=k8, kn_scale=ks,
                v_new8=v8, vn_scale=vs, scale=spec.queries_scale,
                window=spec.sliding_window)
            new_cache = _append_int8_cache(cache, k8, ks, v8, vs, offset)
            out = attn_ops.combine_heads(ctx.astype(x.dtype))
            res = residual if (wrap_norm and spec.has_layer_norm) else None
            out = linear(ap["o"], out, residual=res,
                         quantize_activations=quantize_acts)
            if wrap_norm and not pre_norm and spec.has_layer_norm:
                out = _norm(arch, ap.get("layer_norm"), out)
            return out, new_cache
        # Prefill / CPU fallback: dequantize the whole cache for the XLA
        # masked-attention path.
        new_cache = _update_int8_cache(cache, k, v, w_off, ring=ring)
        k, v = _dequantize_cache(new_cache, q.dtype)
    elif cache is not None:
        if (q.shape[2] == 1 and beam_chain is None
                and rel_positions is None and position_bias is None
                and flash_lengths is None):
            # Decode fast path: attend over [pre-update cache | fresh
            # token] so the appends below are the LAST writers of the
            # carried cache buffers (in-place under XLA's while-loop buffer
            # assignment; appending first forces a staging copy of every
            # cache array per step).
            chunk = _decode_chunk()
            if (causal_only and alibi_bias is None and chunk
                    and cache["k"].shape[2] >= 2 * chunk
                    and cache["k"].shape[2] % chunk == 0):
                # Length-adaptive cache read: the causal mask is subsumed
                # by the valid-prefix mask, so `bias` can be dropped.
                ctx = attn_ops.chunked_decode_attention(
                    q, cache["k"], cache["v"], k.astype(cache["k"].dtype),
                    v.astype(cache["v"].dtype), offset,
                    queries_scale=spec.queries_scale, chunk=chunk)
            else:
                ctx = attn_ops.decode_step_attention(
                    q, cache["k"], cache["v"], k.astype(cache["k"].dtype),
                    v.astype(cache["v"].dtype), w_off,
                    queries_scale=spec.queries_scale,
                    bias=bias, alibi_bias=alibi_bias)
            new_cache = {
                "k": _cache_write(cache["k"], k, w_off),
                "v": _cache_write(cache["v"], v, w_off),
            }
            out = attn_ops.combine_heads(ctx)
            res = residual if (wrap_norm and spec.has_layer_norm) else None
            out = linear(ap["o"], out, residual=res,
                         quantize_activations=quantize_acts)
            if wrap_norm and not pre_norm and spec.has_layer_norm:
                out = _norm(arch, ap.get("layer_norm"), out)
            return out, new_cache
        use_chain_attn = (beam_chain is not None and q.shape[2] == 1
                          and rel_positions is None
                          and position_bias is None)
        if not use_chain_attn:
            ck = _cache_write(cache["k"], k, w_off, ring=ring)
            cv = _cache_write(cache["v"], v, w_off, ring=ring)
            new_cache = {"k": ck, "v": cv}
            k, v = ck, cv

    if (cache is not None and "k_scale" not in cache
            and beam_chain is not None and q.shape[2] == 1
            and rel_positions is None and position_bias is None):
        # Chain attention over the PRE-append cache + the fresh token, so
        # the appends below are the carried buffers' last writers (in-place
        # under XLA; see decode_step_attention).
        fresh_bias = None
        if alibi_bias is not None:
            fresh_bias = jax.lax.dynamic_slice_in_dim(
                alibi_bias.astype(jnp.float32), offset, 1, axis=-1
            ).reshape(1, 1, spec.num_heads_kv,
                      spec.num_heads // spec.num_heads_kv, 1)
        chunk = _decode_chunk()
        if (causal_only and alibi_bias is None and chunk
                and cache["k"].shape[2] >= 2 * chunk
                and cache["k"].shape[2] % chunk == 0):
            # Unwritten slots are -1 in the chain (match no beam), so the
            # causal `bias` is subsumed; read only the written prefix.
            ctx = attn_ops.chunked_beam_chain_attention(
                q, cache["k"], cache["v"], beam_chain,
                k.astype(cache["k"].dtype), v.astype(cache["v"].dtype),
                offset, beam_size=beam_chain_size,
                queries_scale=spec.queries_scale, chunk=chunk)
        else:
            ctx = attn_ops.beam_chain_attention(
                q, cache["k"], cache["v"], beam_chain,
                beam_size=beam_chain_size,
                queries_scale=spec.queries_scale,
                bias=bias, alibi_bias=alibi_bias,
                k_new=k.astype(cache["k"].dtype),
                v_new=v.astype(cache["v"].dtype),
                fresh_bias=fresh_bias)
        new_cache = {
            "k": jax.lax.dynamic_update_slice(
                cache["k"], k.astype(cache["k"].dtype), (0, 0, offset, 0)),
            "v": jax.lax.dynamic_update_slice(
                cache["v"], v.astype(cache["v"].dtype), (0, 0, offset, 0)),
        }
        out = attn_ops.combine_heads(ctx)
        res = residual if (wrap_norm and spec.has_layer_norm) else None
        out = linear(ap["o"], out, residual=res,
                     quantize_activations=quantize_acts)
        if wrap_norm and not pre_norm and spec.has_layer_norm:
            out = _norm(arch, ap.get("layer_norm"), out)
        return out, new_cache

    if (cache is None and causal and q.shape[2] > 1
            and alibi_bias is None and position_bias is None
            and rel_positions is None
            and not (spec.sliding_window and spec.sliding_window > 1)):
        # Context-parallel fresh prefill (beyond reference, SURVEY §2.6):
        # long-prompt attention shards the sequence over the mesh's
        # 'data' axis (idle during single-request prefill) while heads
        # keep the TP layout — ring attention with ppermute-rotated K/V
        # shards (parallel/context.py). Registered by
        # apply_tensor_parallel; static dispatch like the flash kernel.
        from ..parallel import context as ctx_par

        cp = ctx_par.context_parallel_config()
        if (cp is not None
                and q.shape[2] >= ctx_par.ring_prefill_min_len()
                and ctx_par.ring_prefill_eligible(
                    q.shape, k.shape[1], *cp)):
            ctx = ctx_par.ring_attention_prefill(
                q, k, v, lengths=flash_lengths,
                scale=spec.queries_scale, mesh=cp[0], axis=cp[1])
            out = attn_ops.combine_heads(ctx)
            res = residual if (wrap_norm and spec.has_layer_norm) else None
            out = linear(ap["o"], out, residual=res,
                         quantize_activations=quantize_acts)
            if wrap_norm and not pre_norm and spec.has_layer_norm:
                out = _norm(arch, ap.get("layer_norm"), out)
            return out, new_cache

    if (cache is None
            and _flash_eligible(spec, q, k, alibi_bias, position_bias,
                                rel_positions, flash_lengths,
                                alibi_slopes=alibi_slopes,
                                min_len=arch.flash_min_len,
                                rel_bias_table=rel_bias_table)):
        from ..kernels.flash_attention import flash_attention

        ctx = flash_attention(
            q, k, v,
            scale=spec.queries_scale,
            causal=causal,
            lengths=flash_lengths,
            window=spec.sliding_window,
            alibi_slopes=alibi_slopes if alibi_bias is not None else None,
            alibi_positive=alibi_positive,
            rel_bias_table=(rel_bias_table if position_bias is not None
                            else None),
            rel_max_distance=rel_max_distance,
            rel_bidirectional=rel_bidirectional,
        )
        out = attn_ops.combine_heads(ctx)
        res = residual if (wrap_norm and spec.has_layer_norm) else None
        out = linear(ap["o"], out, residual=res, quantize_activations=quantize_acts)
        if wrap_norm and not pre_norm and spec.has_layer_norm:
            out = _norm(arch, ap.get("layer_norm"), out)
        return out, new_cache

    extra_bias = attn_ops.combine_bias(alibi_bias, position_bias)
    full_bias = attn_ops.combine_bias(bias, extra_bias)

    ctx = attn_ops.dot_product_attention(
        q,
        k,
        v,
        bias=full_bias,
        queries_scale=spec.queries_scale,
        rel_position_keys=ap.get("relative_position_keys"),
        rel_position_values=ap.get("relative_position_values"),
        rel_positions=rel_positions,
    )
    out = attn_ops.combine_heads(ctx)

    res = residual if (wrap_norm and spec.has_layer_norm) else None
    out = linear(ap["o"], out, residual=res, quantize_activations=quantize_acts)
    if wrap_norm and not pre_norm and spec.has_layer_norm:
        out = _norm(arch, ap.get("layer_norm"), out)
    return out, new_cache


def merged_attention_block(
    arch: ArchSpec,
    spec: AttentionSpec,
    ap: dict,
    x,
    mem_kv: dict,  # {"k","v"} [B, Hkv, S, D] (beam-shared, k_norm applied)
    *,
    bias,  # self-keys bias (causal/lengths) [., ., T, C]
    memory_bias,  # [B, 1, 1, S] additive f32 or None
    rot_consts=None,
    offset=0,
    cache: Optional[dict] = None,
    beam_size: int = 1,
    pre_norm: bool = True,
    quantize_acts: bool = True,
    wrap_norm: bool = True,
):
    """T5Gemma2-style merged self+cross attention: one softmax over the
    concatenation [self keys | memory keys]
    (reference: src/layers/attention.cc:625-796 forward_merged). Memory K/V
    come from the ``memory_kv`` projection (k_norm only, no rotary) and are
    shared across beams.

    Returns (output, new_cache).
    """
    residual = x
    h = x
    if wrap_norm and pre_norm and spec.has_layer_norm:
        h = _norm(arch, ap.get("layer_norm"), h)

    q, k, v = _project_qkv(ap, spec, h, quantize_acts)
    q, k, v = _qk_norms(arch, ap, spec, q, k, v)
    q, k = _maybe_rotary(spec, rot_consts, q, k, offset)

    new_cache = None
    if cache is not None and "k_scale" in cache:
        new_cache = _update_int8_cache(cache, k, v, offset)
        k, v = _dequantize_cache(new_cache, q.dtype)
    elif cache is not None:
        # _cache_write handles both scalar and per-row [B] offsets
        # (continuous batching: each slot decodes at its own position).
        ck = _cache_write(cache["k"], k, offset)
        cv = _cache_write(cache["v"], v, offset)
        new_cache = {"k": ck, "v": cv}
        k, v = ck, cv

    BK, _, T, _ = q.shape
    B, _, S, _ = mem_kv["k"].shape
    beam = BK // B
    mem_k = mem_kv["k"]
    mem_v = mem_kv["v"]
    if beam > 1:
        mem_k = jnp.repeat(mem_k, beam, axis=0)
        mem_v = jnp.repeat(mem_v, beam, axis=0)
    keys = jnp.concatenate([k, mem_k.astype(k.dtype)], axis=2)
    values = jnp.concatenate([v, mem_v.astype(v.dtype)], axis=2)

    C = k.shape[2]
    self_bias = jnp.broadcast_to(
        bias.astype(jnp.float32), (BK, 1, T, C)) if bias is not None \
        else jnp.zeros((BK, 1, T, C), jnp.float32)
    if memory_bias is not None:
        mb = jnp.repeat(memory_bias.astype(jnp.float32), beam, axis=0)
        mem_b = jnp.broadcast_to(mb, (BK, 1, T, S))
    else:
        mem_b = jnp.zeros((BK, 1, T, S), jnp.float32)
    full_bias = jnp.concatenate([self_bias, mem_b], axis=-1)

    ctx = attn_ops.dot_product_attention(
        q, keys, values, bias=full_bias, queries_scale=spec.queries_scale)
    out = attn_ops.combine_heads(ctx)
    res = residual if (wrap_norm and spec.has_layer_norm) else None
    out = linear(ap["o"], out, residual=res, quantize_activations=quantize_acts)
    if wrap_norm and not pre_norm and spec.has_layer_norm:
        out = _norm(arch, ap.get("layer_norm"), out)
    return out, new_cache


def precompute_merged_memory_kv(arch: ArchSpec, spec: AttentionSpec, ap: dict,
                                memory, quantize_acts: bool = True):
    """Project encoder output through the merged-attention ``memory_kv``
    linear (k_norm only, no rotary — reference: attention.cc:706-735)."""
    Hkv = spec.num_heads_kv
    D = spec.head_dim
    fused = linear(ap["memory_kv"], memory, quantize_activations=quantize_acts)
    k, v = fused[..., :Hkv * D], fused[..., Hkv * D:]
    k = attn_ops.split_heads(k, Hkv)
    v = attn_ops.split_heads(v, Hkv)
    if spec.has_k_norm:
        k = _norm(arch, ap.get("k_norm"), k)
    return {"k": k, "v": v}


def precompute_cross_kv(arch: ArchSpec, spec: AttentionSpec, ap: dict, memory,
                        quantize_acts: bool = True):
    """Project encoder output to cross-attention K/V once
    (reference caches these on step 0: src/layers/attention.cc:371-440)."""
    Hkv = spec.num_heads_kv
    k = linear(ap["k"], memory, quantize_activations=quantize_acts)
    v = linear(ap["v"], memory, quantize_activations=quantize_acts)
    k = attn_ops.split_heads(k, Hkv)
    v = attn_ops.split_heads(v, Hkv)
    if spec.has_k_norm:
        k = _norm(arch, ap.get("k_norm"), k)
    if spec.has_v_norm:
        v = _norm(arch, ap.get("v_norm"), v)
    return {"k": k, "v": v}


def cross_attention_block(
    arch: ArchSpec,
    spec: AttentionSpec,
    ap: dict,
    x,
    mem_kv: dict,
    *,
    memory_bias,
    beam_size: int = 1,
    pre_norm: bool = True,
    quantize_acts: bool = True,
    return_weights=False,  # False | True (softmax) | "logits"
    wrap_norm: bool = True,
):
    """Cross-attention with beam-shared memory.

    ``x``: [B*beam, T, D_model]; ``mem_kv["k"]``: [B, Hkv, S, Dh].
    The beam dim folds into the query time axis so memory K/V are read once.
    """
    residual = x
    h = x
    if wrap_norm and pre_norm and spec.has_layer_norm:
        h = _norm(arch, ap.get("layer_norm"), h)

    BK, T, _ = h.shape
    B = mem_kv["k"].shape[0]
    K = BK // B

    q = linear(ap["q"], h, quantize_activations=quantize_acts)
    if spec.has_q_norm:
        q = _norm(arch, ap.get("q_norm"), q)
    q = attn_ops.split_heads(q.reshape(B, K * T, -1), spec.num_heads)

    out = attn_ops.dot_product_attention(
        q,
        mem_kv["k"],
        mem_kv["v"],
        bias=memory_bias,
        queries_scale=spec.queries_scale,
        return_weights=return_weights,
    )
    if return_weights:
        ctx, weights = out
        # [B, Hq, K*T, S] -> [B*K, Hq, T, S]
        S = weights.shape[-1]
        weights = (
            weights.reshape(B, spec.num_heads, K, T, S)
            .transpose(0, 2, 1, 3, 4)
            .reshape(BK, spec.num_heads, T, S)
        )
    else:
        ctx = out
        weights = None

    ctx = attn_ops.combine_heads(ctx).reshape(BK, T, -1)
    res = residual if (wrap_norm and spec.has_layer_norm) else None
    y = linear(ap["o"], ctx, residual=res, quantize_activations=quantize_acts)
    if wrap_norm and not pre_norm and spec.has_layer_norm:
        y = _norm(arch, ap.get("layer_norm"), y)
    return y, weights


def ffn_block(arch: ArchSpec, spec, fp: dict, x, pre_norm: bool,
              quantize_acts: bool = True, wrap_norm: bool = True):
    """Feed-forward with optional GLU (reference: src/layers/transformer.cc:8-51)."""
    residual = x
    h = x
    has_norm = "layer_norm" in fp
    if wrap_norm and pre_norm and has_norm:
        h = _norm(arch, fp.get("layer_norm"), h)
    act = get_activation(spec.activation)
    inner = linear(fp["linear_0"], h, activation=act, quantize_activations=quantize_acts)
    if spec.glu:
        gate = linear(fp["linear_0_noact"], h, quantize_activations=quantize_acts)
        inner = inner * gate
    res = residual if (wrap_norm and has_norm) else None
    out = linear(fp["linear_1"], inner, residual=res, quantize_activations=quantize_acts)
    if wrap_norm and not pre_norm and has_norm:
        out = _norm(arch, fp.get("layer_norm"), out)
    return out


# ---------------------------------------------------------------------------
# Encoder.
# ---------------------------------------------------------------------------


def encoder_forward(arch: ArchSpec, params: dict, consts: dict, ids, lengths,
                    quantize_acts: bool = True, out_dtype=jnp.float32):
    """Full encoder pass. ids [B, S] int32, lengths [B] int32 -> [B, S, D]."""
    spec = arch.encoder
    ep = params["encoder"]
    ec = consts.get("encoder", {})

    x = embed(ep, spec, ids, out_dtype, spec.embeddings.merge)
    if spec.embeddings.scale:
        x = x * jnp.asarray(spec.embeddings.scale, dtype=x.dtype)
    x = _apply_positions(ep, ec, spec, x, 0)
    if spec.has_layernorm_embedding:
        x = _norm(arch, ep.get("layernorm_embedding"), x)

    main_ids = ids[0] if isinstance(ids, (tuple, list)) else ids
    S = main_ids.shape[-1]
    bias = attn_ops.length_mask_bias(lengths, S)

    position_bias = None
    rel_table = None
    rel_maxd = 0
    for i, layer in enumerate(spec.layers):
        lp = ep["layers"][i]
        aspec = layer.self_attention
        rot = ec.get("rotary", {}).get(str(i))

        rel_positions = None
        if aspec.has_rel_position_keys or aspec.has_rel_asymmetric_keys:
            rel_positions = attn_ops.make_relative_positions(
                S, S, aspec.max_relative_position,
                asymmetric=aspec.has_rel_asymmetric_keys,
                left_max=aspec.rel_left_max, right_max=aspec.rel_right_max)
        if aspec.has_rel_attention_bias and position_bias is None:
            # Dense [H, S, S] bias for the XLA path; the raw table rides
            # the flash kernel's SMEM bucket hook instead (the dense
            # tensor is DCE'd whenever the kernel is taken).
            rel_table = lp["self_attention"]["relative_attention_bias"]
            rel_maxd = aspec.rel_max_distance
            position_bias = attn_ops.t5_position_bias(
                rel_table, S, S, rel_maxd, bidirectional=True)

        if layer.sandwich_norm:
            h = _norm(arch, lp["input_layer_norm"], x)
            ctx, _ = self_attention_block(
                arch, aspec, lp["self_attention"], h,
                bias=bias, rot_consts=rot, offset=0,
                pre_norm=spec.pre_norm, quantize_acts=quantize_acts,
                rel_positions=rel_positions, position_bias=position_bias,
                rel_bias_table=rel_table, rel_max_distance=rel_maxd,
                wrap_norm=False, causal=False, flash_lengths=lengths)
            x = x + _norm(arch, lp["post_attention_layer_norm"], ctx)
            h = _norm(arch, lp["pre_feedforward_layer_norm"], x)
            f = ffn_block(arch, layer.ffn, lp["ffn"], h, spec.pre_norm,
                          quantize_acts, wrap_norm=False)
            x = x + _norm(arch, lp["post_feedforward_layer_norm"], f)
        else:
            x, _ = self_attention_block(
                arch, aspec, lp["self_attention"], x,
                bias=bias, rot_consts=rot, offset=0,
                pre_norm=spec.pre_norm, quantize_acts=quantize_acts,
                rel_positions=rel_positions, position_bias=position_bias,
                rel_bias_table=rel_table, rel_max_distance=rel_maxd,
                causal=False, flash_lengths=lengths)
            x = ffn_block(arch, layer.ffn, lp["ffn"], x, spec.pre_norm, quantize_acts)

    if spec.has_output_norm:
        x = _norm(arch, ep.get("layer_norm"), x)
    return x


def speech_encoder_forward(arch: ArchSpec, params: dict, consts: dict, features,
                           quantize_acts: bool = True, out_dtype=jnp.float32):
    """Whisper-style conv-frontend encoder
    (reference: src/layers/whisper.cc:25-62).

    ``features``: [B, n_mels, T] -> [B, T//2, D].
    """
    from ..ops.activations import gelu
    from ..ops.conv import conv1d

    spec = arch.encoder
    ep = params["encoder"]

    x = features
    for i, conv in enumerate(ep["convs"]):
        stride = 2 if i == len(ep["convs"]) - 1 else 1
        x = conv1d(x, conv["w"], conv.get("b"), stride=stride, padding=1,
                   activation=gelu)
    x = jnp.transpose(x, (0, 2, 1)).astype(out_dtype)  # [B, T', D]

    T_out = x.shape[1]
    pe = ep["position_encodings"][:T_out]
    x = x + pe.astype(x.dtype)[None]

    position_bias = None
    ec = consts.get("encoder", {})
    for i, layer in enumerate(spec.layers):
        lp = ep["layers"][i]
        x, _ = self_attention_block(
            arch, layer.self_attention, lp["self_attention"], x,
            bias=None, rot_consts=None, offset=0,
            pre_norm=spec.pre_norm, quantize_acts=quantize_acts)
        x = ffn_block(arch, layer.ffn, lp["ffn"], x, spec.pre_norm,
                      quantize_acts)

    if spec.has_output_norm:
        x = _norm(arch, ep.get("layer_norm"), x)
    return x


speech_encoder_forward_jit = jax.jit(
    speech_encoder_forward, static_argnames=("arch", "quantize_acts", "out_dtype")
)


# ---------------------------------------------------------------------------
# Decoder.
# ---------------------------------------------------------------------------


# ---------------------------------------------------------------------------
# Cache layouts and layer-stack helpers.
#
# Two cache layouts exist:
# - per-layer list: [{"k": [N, H, C, D], ...} per layer] (general)
# - stacked dict:   {"k": [L, N, H, C, D], ...} when every decoder layer has
#   an identical spec (scan-over-layers; one gather/update for the whole
#   stack instead of one per layer).
# ---------------------------------------------------------------------------


def cache_is_stacked(cache) -> bool:
    return isinstance(cache, dict)


def _cache_axes(cache):
    """(batch_axis, position_axis_payload, position_axis_scale)."""
    if cache_is_stacked(cache):
        return 1, 3, 4
    return 0, 2, 3


def cache_gather_rows(cache, rows):
    """Reorder/select cache batch rows (beam reorder, batch pruning).

    On TPU the per-layer list layout routes through one fused Pallas pass
    (XLA emits a gather custom-call + staging copy per array — ~3x the
    cache bytes per beam step)."""
    if cache is None:
        return None
    if cache_is_stacked(cache):
        return {k: v[:, rows] for k, v in cache.items()}
    if (jax.default_backend() == "tpu"
            and os.environ.get("CT2TPU_FUSED_REORDER", "1") != "0"):
        from ..kernels.gather_rows import gather_rows_fused

        leaves, treedef = jax.tree.flatten(cache)
        return jax.tree.unflatten(treedef, gather_rows_fused(leaves, rows))
    return jax.tree.map(lambda a: a[rows], cache)


def cache_repeat_rows(cache, n: int):
    """Tile every batch row ``n`` times (beam/hypothesis replication)."""
    if cache is None:
        return None
    axis = 1 if cache_is_stacked(cache) else 0
    return jax.tree.map(lambda a: jnp.repeat(a, n, axis=axis), cache)


def cache_slice_rows(cache, start: int, size: int):
    if cache is None:
        return None
    if cache_is_stacked(cache):
        return {k: v[:, start:start + size] for k, v in cache.items()}
    return jax.tree.map(lambda a: a[start:start + size], cache)


def cache_insert_row(cache, sub_cache, slot):
    """Write a 1-row ``sub_cache`` into ``cache`` at batch row ``slot``.

    The sub-cache may have a SMALLER capacity (a prompt-length prefill
    cache): only its slots are written; stale data beyond them in the
    target row is never readable because decode masks exclude unwritten
    positions. Used by the continuous-batching scheduler to admit a
    prefilled request into a free slot."""
    stacked = cache_is_stacked(cache)

    def ins(buf, sub):
        start = [0] * buf.ndim
        start[1 if stacked else 0] = slot
        return jax.lax.dynamic_update_slice(
            buf, sub.astype(buf.dtype), tuple(start))

    return jax.tree.map(ins, cache, sub_cache)


def cache_grow(cache, n_rows: int, capacity: int, arch: ArchSpec = None):
    """Grow a cache to ``n_rows`` batch rows and ``capacity`` positions.

    INT8 scale arrays pad with 1 to keep dequantization finite. Ring
    buffers (windowed layers at exactly ``ring_capacity`` slots; needs
    ``arch`` to detect) keep their size — growing one would break the
    ``position % ring`` slot mapping."""
    if cache is None:
        return None
    baxis, paxis, saxis = _cache_axes(cache)
    rc = ring_capacity(arch) if arch is not None else 0

    def grow_one(a, axis, fill, cap):
        if a.shape[baxis] != n_rows:
            a = jnp.repeat(a, n_rows // a.shape[baxis], axis=baxis)
        if a.shape[axis] < cap:
            pad = [(0, 0)] * a.ndim
            pad[axis] = (0, cap - a.shape[axis])
            a = jnp.pad(a, pad, constant_values=fill)
        return a

    def grow_layer(d):
        cap = capacity
        if rc and d["k"].shape[paxis] == rc:
            cap = rc  # ring buffer: size is part of the slot mapping
        return {
            k: grow_one(v, saxis if k.endswith("_scale") else paxis,
                        1.0 if k.endswith("_scale") else 0.0, cap)
            for k, v in d.items()
        }

    if cache_is_stacked(cache):
        return grow_layer(cache)
    return [grow_layer(layer) for layer in cache]


def _layer_slice(tree, i):
    """Layer ``i`` of a stacked pytree (view under jit) or list entry."""
    if tree is None:
        return None
    if isinstance(tree, list):
        return tree[i]
    return jax.tree.map(lambda a: a[i], tree)


def stack_layer_list(layers):
    """Stack homogeneous per-layer pytrees along a new leading axis;
    returns None when structures or shapes differ."""
    if not layers or any(l is None for l in layers):
        return None
    try:
        structs = {jax.tree.structure(l) for l in layers}
        if len(structs) != 1:
            return None
        return jax.tree.map(lambda *xs: jnp.stack(xs), *layers)
    except (ValueError, TypeError):
        return None


def layer_cache_capacity(arch: ArchSpec, aspec, capacity: int,
                         ring: bool) -> int:
    """KV capacity for one layer: windowed layers under ring mode store
    only ``2*Wr`` slots (O(window) memory); everything else stores the
    full logical ``capacity``."""
    if not ring:
        return capacity
    if not (aspec.sliding_window and aspec.sliding_window > 1) \
            or aspec.has_memory_kv:
        return capacity
    rc = ring_capacity(arch)
    if not rc:
        return capacity
    return min(capacity, rc)


def init_self_cache(arch: ArchSpec, batch: int, capacity: int,
                    dtype=jnp.float32, stacked: bool = False,
                    ring: bool = False):
    """Fixed-capacity self-attention KV cache for every decoder layer.

    ``dtype=jnp.int8`` selects the quantized cache layout: int8 payloads
    plus one float scale per cached vector (SURVEY kernel #4; halves cache
    memory and decode-read bandwidth vs bf16). ``stacked`` produces the
    layer-stacked layout used with scan-over-layers params. ``ring=True``
    allocates windowed layers as 2*Wr-slot ring buffers (O(window)
    memory; see ring_block) — used by all single-token decode paths,
    including beam serving (the continuous beam engine runs ring=True
    unconditionally; see runtime/continuous.py and
    tests/test_continuous.py::test_continuous_beam_ring_window)."""
    spec = arch.decoder

    def layer_cache(a, lead=()):
        cap = layer_cache_capacity(arch, a, capacity, ring)
        shape = lead + (batch, a.num_heads_kv, cap, a.head_dim)
        if dtype == jnp.int8:
            sshape = lead + (batch, a.num_heads_kv, 1, cap)
            return {
                "k": jnp.zeros(shape, jnp.int8),
                "v": jnp.zeros(shape, jnp.int8),
                "k_scale": jnp.ones(sshape, jnp.float32),
                "v_scale": jnp.ones(sshape, jnp.float32),
            }
        return {"k": jnp.zeros(shape, dtype), "v": jnp.zeros(shape, dtype)}

    if stacked:
        return layer_cache(spec.layers[0].self_attention,
                           lead=(len(spec.layers),))
    return [layer_cache(layer.self_attention) for layer in spec.layers]


def _cache_write(buf, new, offset, ring: int = 0):
    """Write ``new`` [B, H, T, D] into ``buf`` [B, H, C, D] at time slot
    ``offset`` — scalar (uniform positions) or [B] vector (continuous
    batching / speculative verify; lowers to a scatter). ``ring`` wraps
    each written position into the ring buffer (vector offsets may carry
    a pre-wrapped slot; re-wrapping is idempotent)."""
    if getattr(offset, "ndim", 0) > 0:
        B, T = buf.shape[0], new.shape[2]
        if T == 1:
            return buf.at[jnp.arange(B), :, offset].set(
                new[:, :, 0].astype(buf.dtype))
        rows = jnp.arange(B)[:, None]
        cols = offset[:, None] + jnp.arange(T, dtype=jnp.int32)[None, :]
        if ring:
            cols = jnp.mod(cols, ring)
        # [B, T] advanced indices broadcast; heads slice stays in place:
        # result positions [B, T, H, D] must match the moved-axes value.
        return buf.at[rows, :, cols].set(
            jnp.swapaxes(new, 1, 2).astype(buf.dtype))
    return jax.lax.dynamic_update_slice(
        buf, new.astype(buf.dtype), (0, 0, offset, 0))


def _update_int8_cache(cache: dict, k, v, offset, ring: int = 0):
    """Quantize and append new K/V vectors at ``offset``."""
    from ..kernels.decode_attention import quantize_kv

    k8, ks = quantize_kv(k)
    v8, vs = quantize_kv(v)
    return _append_int8_cache(cache, k8, ks, v8, vs, offset, ring=ring)


def _append_int8_cache(cache: dict, k8, ks, v8, vs, offset, ring: int = 0):
    if getattr(offset, "ndim", 0) > 0:
        # Per-row write positions (continuous batching / speculative
        # verify).
        B, T = cache["k"].shape[0], k8.shape[2]
        if T == 1:
            rows = jnp.arange(B)
            return {
                "k": cache["k"].at[rows, :, offset].set(k8[:, :, 0]),
                "v": cache["v"].at[rows, :, offset].set(v8[:, :, 0]),
                "k_scale": cache["k_scale"].at[rows, :, :, offset].set(
                    ks[:, :, None, 0] if ks.ndim == 3 else ks[:, :, None]),
                "v_scale": cache["v_scale"].at[rows, :, :, offset].set(
                    vs[:, :, None, 0] if vs.ndim == 3 else vs[:, :, None]),
            }
        rows = jnp.arange(B)[:, None]
        cols = offset[:, None] + jnp.arange(T, dtype=jnp.int32)[None, :]
        if ring:
            cols = jnp.mod(cols, ring)
        return {
            "k": cache["k"].at[rows, :, cols].set(jnp.swapaxes(k8, 1, 2)),
            "v": cache["v"].at[rows, :, cols].set(jnp.swapaxes(v8, 1, 2)),
            "k_scale": cache["k_scale"].at[rows, :, :, cols].set(
                jnp.swapaxes(ks, 1, 2)[..., None]),
            "v_scale": cache["v_scale"].at[rows, :, :, cols].set(
                jnp.swapaxes(vs, 1, 2)[..., None]),
        }
    return {
        "k": jax.lax.dynamic_update_slice(cache["k"], k8, (0, 0, offset, 0)),
        "v": jax.lax.dynamic_update_slice(cache["v"], v8, (0, 0, offset, 0)),
        "k_scale": jax.lax.dynamic_update_slice(
            cache["k_scale"], ks[:, :, None, :], (0, 0, 0, offset)),
        "v_scale": jax.lax.dynamic_update_slice(
            cache["v_scale"], vs[:, :, None, :], (0, 0, 0, offset)),
    }


def _dequantize_cache(cache: dict, dtype):
    k = cache["k"].astype(jnp.float32) / jnp.swapaxes(
        cache["k_scale"], 2, 3)
    v = cache["v"].astype(jnp.float32) / jnp.swapaxes(
        cache["v_scale"], 2, 3)
    return k.astype(dtype), v.astype(dtype)


def precompute_memory(arch: ArchSpec, params: dict, memory, quantize_acts: bool = True):
    """Project encoder output into per-layer cross K/V (prefill-once)."""
    spec = arch.decoder
    layers = params["decoder"]["layers"]
    stacked = isinstance(layers, dict)
    out = []
    for i, layer in enumerate(spec.layers):
        lp = _layer_slice(layers, i)
        if layer.cross_attention is not None:
            out.append(
                precompute_cross_kv(arch, layer.cross_attention,
                                    lp["attention"], memory, quantize_acts)
            )
        elif layer.self_attention.has_memory_kv:
            out.append(
                precompute_merged_memory_kv(arch, layer.self_attention,
                                            lp["self_attention"], memory,
                                            quantize_acts)
            )
        else:
            out.append(None)
    if stacked and out and out[0] is not None:
        # Match the stacked-params layout so memory K/V scan through xs.
        return jax.tree.map(lambda *xs: jnp.stack(xs), *out)
    return out




def _scan_decoder_layers(arch, spec, stacked_lp, x, *, bias, alibi_bias,
                         rel_positions, position_bias, rot, pos, self_cache,
                         mem_kv, memory_bias, beam_size, lengths,
                         quantize_acts, causal_only=False, ring=0,
                         flash_alibi=None, fresh_prefill=False):
    """lax.scan over a uniform decoder layer stack.

    One compiled layer body serves all layers: weights, caches and memory
    K/V stream through scan xs, cutting per-step op count ~num_layers-fold
    versus the unrolled loop (decisive for decode-step latency)."""
    layer = spec.layers[0]
    aspec = layer.self_attention

    xs = {"lp": stacked_lp}
    if self_cache is not None:
        xs["cache"] = self_cache
    if mem_kv is not None:
        xs["mem"] = mem_kv

    def body(x, xs_i):
        lp = xs_i["lp"]
        cache_i = xs_i.get("cache")
        mem_i = xs_i.get("mem")

        if layer.sandwich_norm:
            h = _norm(arch, lp["input_layer_norm"], x)
            if aspec.has_memory_kv:
                ctx, nc = merged_attention_block(
                    arch, aspec, lp["self_attention"], h, mem_i,
                    bias=bias, memory_bias=memory_bias,
                    rot_consts=rot, offset=pos, cache=cache_i,
                    beam_size=beam_size, pre_norm=spec.pre_norm,
                    quantize_acts=quantize_acts, wrap_norm=False)
            else:
                ctx, nc = self_attention_block(
                    arch, aspec, lp["self_attention"], h,
                    bias=bias, rot_consts=rot, offset=pos, cache=cache_i,
                    pre_norm=spec.pre_norm, quantize_acts=quantize_acts,
                    alibi_bias=alibi_bias, rel_positions=rel_positions,
                    position_bias=position_bias, wrap_norm=False,
                    causal=True, flash_lengths=lengths,
                    causal_only=causal_only and not aspec.sliding_window,
                    ring=ring,
                    alibi_slopes=flash_alibi,
                    alibi_positive=spec.alibi_use_positive_positions,
                    fresh_prefill=fresh_prefill)
            x = x + _norm(arch, lp["post_attention_layer_norm"], ctx)
            if layer.cross_attention is not None:
                h = _norm(arch,
                          lp["external_pre_encoder_attention_layer_norm"], x) \
                    if layer.external_pre_cross_norm else x
                ctx, _ = cross_attention_block(
                    arch, layer.cross_attention, lp["attention"], h,
                    mem_i, memory_bias=memory_bias, beam_size=beam_size,
                    pre_norm=spec.pre_norm, quantize_acts=quantize_acts,
                    return_weights=False, wrap_norm=False)
                if layer.external_post_cross_norm:
                    ctx = _norm(
                        arch,
                        lp["external_post_encoder_attention_layer_norm"], ctx)
                x = x + ctx
            h = _norm(arch, lp["pre_feedforward_layer_norm"], x)
            f = ffn_block(arch, layer.ffn, lp["ffn"], h, spec.pre_norm,
                          quantize_acts, wrap_norm=False)
            x = x + _norm(arch, lp["post_feedforward_layer_norm"], f)
            if layer.layer_scalar != 1.0:
                x = x * jnp.asarray(layer.layer_scalar, dtype=x.dtype)
        elif layer.shared_layer_norm or layer.input_layer_norm:
            norm_p = lp.get("shared_layer_norm") or lp.get("input_layer_norm")
            h = _norm(arch, norm_p, x)
            a, nc = self_attention_block(
                arch, aspec, lp["self_attention"], h,
                bias=bias, rot_consts=rot, offset=pos, cache=cache_i,
                pre_norm=spec.pre_norm, quantize_acts=quantize_acts,
                alibi_bias=alibi_bias, rel_positions=rel_positions,
                position_bias=position_bias, wrap_norm=False,
                causal=True, flash_lengths=lengths,
                    causal_only=causal_only and not aspec.sliding_window,
                    ring=ring,
                    alibi_slopes=flash_alibi,
                    alibi_positive=spec.alibi_use_positive_positions,
                    fresh_prefill=fresh_prefill)
            if layer.post_attention_layer_norm:
                h = _norm(arch, lp["post_attention_layer_norm"], x)
            f = ffn_block(arch, layer.ffn, lp["ffn"], h, spec.pre_norm,
                          quantize_acts, wrap_norm=False)
            x = x + a + f
        elif aspec.has_memory_kv:
            x, nc = merged_attention_block(
                arch, aspec, lp["self_attention"], x, mem_i,
                bias=bias, memory_bias=memory_bias,
                rot_consts=rot, offset=pos, cache=cache_i,
                beam_size=beam_size, pre_norm=spec.pre_norm,
                quantize_acts=quantize_acts)
            x = ffn_block(arch, layer.ffn, lp["ffn"], x, spec.pre_norm,
                          quantize_acts)
        else:
            x, nc = self_attention_block(
                arch, aspec, lp["self_attention"], x,
                bias=bias, rot_consts=rot, offset=pos, cache=cache_i,
                pre_norm=spec.pre_norm, quantize_acts=quantize_acts,
                alibi_bias=alibi_bias, rel_positions=rel_positions,
                position_bias=position_bias,
                causal=True, flash_lengths=lengths,
                    causal_only=causal_only and not aspec.sliding_window,
                    ring=ring,
                    alibi_slopes=flash_alibi,
                    alibi_positive=spec.alibi_use_positive_positions,
                    fresh_prefill=fresh_prefill)
            if layer.cross_attention is not None:
                x, _ = cross_attention_block(
                    arch, layer.cross_attention, lp["attention"], x,
                    mem_i, memory_bias=memory_bias, beam_size=beam_size,
                    pre_norm=spec.pre_norm, quantize_acts=quantize_acts,
                    return_weights=False)
            x = ffn_block(arch, layer.ffn, lp["ffn"], x, spec.pre_norm,
                          quantize_acts)
        return x, (nc if self_cache is not None else 0)

    x, new_cache = jax.lax.scan(body, x, xs)
    return x, (new_cache if self_cache is not None else None)


def decoder_forward(
    arch: ArchSpec,
    params: dict,
    consts: dict,
    ids,  # [B*beam, T] int32
    pos,  # scalar int32: position of ids[:, 0]
    self_cache,  # list per layer of {"k","v"} [B*beam, Hkv, C, D], or None
    mem_kv=None,  # list per layer of {"k","v"} [B, Hkv, S, D] (beam-shared)
    memory_bias=None,  # [B, 1, 1, S] additive f32
    *,
    beam_size: int = 1,
    lengths=None,  # [B*beam] optional per-row valid lengths for seq mode
    return_attention: bool = False,
    alignment_pairs=None,  # tuple of (layer, head): collect these
    raw_attention: bool = False,  # return pre-softmax cross-attn scores
    quantize_acts: bool = True,
    out_dtype=jnp.float32,
    return_logits: bool = True,
    beam_chain=None,  # [N, C] int32 origin chain: beam attention by mask
    fresh_prefill: bool = False,  # the cache is empty and ``ids`` are its
    # first positions: prefill attention runs over the fresh tensors only
    # (O(T^2), flash-eligible) while still writing the cache
):
    """Decoder pass covering both modes:

    - cached step/prefill: ``self_cache`` given; keys live at [0, pos+T).
    - full-sequence (scoring): ``self_cache=None``; plain causal masking.

    Returns (logits [B*beam, T, V], new_self_cache, attention or None).
    """
    spec = arch.decoder
    dp = params["decoder"]
    dc = consts.get("decoder", {})
    T = ids.shape[-1]

    pos_vec = getattr(pos, "ndim", 0) > 0
    # Per-row positions (continuous batching T==1 steps; speculative
    # verify T==k chunks): ALiBi builds a per-row [B, H, T, C] bias below;
    # Shaw/T5 relative schemes still require shared positions (gated in
    # layer_extras).

    x = embed(dp, spec, ids, out_dtype, spec.embeddings.merge)
    if spec.start_from_zero_embedding:
        # Zero the embedding of the BOS timestep at step 0
        # (reference: src/layers/transformer.cc:637-640).
        if pos_vec:
            t_idx = pos[:, None] + jnp.arange(T, dtype=jnp.int32)[None, :]
            x = jnp.where((t_idx == 0)[:, :, None], 0.0, x)
        else:
            t_idx = jnp.arange(T, dtype=jnp.int32) + pos
            x = jnp.where((t_idx == 0)[None, :, None], 0.0, x)
    if spec.embeddings.scale:
        x = x * jnp.asarray(spec.embeddings.scale, dtype=x.dtype)
    if spec.has_project_in:
        x = linear(dp["project_in"], x, quantize_activations=quantize_acts)
    x = _apply_positions(dp, dc, spec, x, pos)
    if spec.has_layernorm_embedding:
        x = _norm(arch, dp.get("layernorm_embedding"), x)

    stacked = isinstance(dp["layers"], dict)

    fresh = fresh_prefill and self_cache is not None and T > 1

    # Self-attention bias.
    if fresh:
        # Empty-cache prefill: attention only sees the fresh T positions.
        C = (self_cache["k"].shape[3] if cache_is_stacked(self_cache)
             else self_cache[0]["k"].shape[2])
        causal_only = False
        bias = attn_ops.causal_mask_bias(T, T, offset=0)
        if lengths is not None:
            bias = bias + attn_ops.length_mask_bias(lengths, T)
    elif self_cache is not None:
        C = (self_cache["k"].shape[3] if cache_is_stacked(self_cache)
             else self_cache[0]["k"].shape[2])
        causal = attn_ops.causal_mask_bias(T, C, offset=pos)
        bias = causal
        if lengths is not None:
            bias = bias + attn_ops.length_mask_bias(lengths, C)
        # Single-token decode with no padding rows: `bias` carries no
        # information beyond "slots >= pos are unwritten", which the
        # chunked decode paths express via their valid-prefix mask.
        causal_only = (T == 1 and lengths is None)
    else:
        C = T
        causal_only = False
        bias = attn_ops.causal_mask_bias(T, T, offset=0)
        if lengths is not None:
            bias = bias + attn_ops.length_mask_bias(lengths, T)

    # Per-head ALiBi slopes for the in-kernel flash path (scale_alibi
    # prefolded; the XLA path keeps using the additive alibi_bias).
    flash_alibi = None
    if spec.alibi:
        flash_alibi = dc["alibi_slopes"]
        if spec.scale_alibi:
            flash_alibi = flash_alibi * spec.layers[0].self_attention.queries_scale

    position_bias = None
    attn_out = None
    collected_pairs = []  # [B, 1, T, S] slices for alignment_pairs
    pair_layers = {}
    if alignment_pairs is not None:
        for (li, hi) in alignment_pairs:
            pair_layers.setdefault(li, []).append(hi)
    new_cache = [] if self_cache is not None else None

    def layer_extras(i, layer, lp, cache_i=None):
        """Per-layer sliding-window / ALiBi / relative-position biases.

        Returns (bias, alibi, rel_positions, t5_bias, ring): ``ring`` is
        the ring-buffer size when this layer's cache is a sliding-window
        ring (O(window) memory; see ring_block), else 0."""
        aspec = layer.self_attention
        layer_bias = bias
        layer_ring = 0
        attn_cached = self_cache is not None and not fresh
        if aspec.sliding_window and fresh:
            # Fresh prefill attends the T fresh positions only; ring
            # detection still applies for wrap-safe writes.
            rc = ring_capacity(arch)
            cap_l = cache_i["k"].shape[-2] if cache_i is not None else C
            if (rc and cap_l == rc and aspec.sliding_window > 1
                    and not aspec.has_memory_kv):
                layer_ring = rc
            layer_bias = layer_bias + attn_ops.sliding_window_bias(
                T, T, aspec.sliding_window, offset=0)
        elif aspec.sliding_window and self_cache is not None:
            rc = ring_capacity(arch)
            cap_l = cache_i["k"].shape[-2] if cache_i is not None else C
            if (rc and cap_l == rc and aspec.sliding_window > 1
                    and not aspec.has_memory_kv):
                # Ring KV buffer: this bias REPLACES the causal+window
                # masks (it encodes both in ring-slot space). Padded-row
                # caveat: per-row `lengths` prefill is safe only while
                # total positions stay <= ring (see ring_window_bias).
                layer_ring = rc
                layer_bias = attn_ops.ring_window_bias(
                    T, rc, aspec.sliding_window, offset=pos)
            else:
                layer_bias = layer_bias + attn_ops.sliding_window_bias(
                    T, cap_l, aspec.sliding_window, offset=pos)
        elif aspec.sliding_window:
            layer_bias = layer_bias + attn_ops.sliding_window_bias(
                T, T, aspec.sliding_window, offset=0)

        alibi_bias = None
        if spec.alibi:
            Tk = C if attn_cached else T
            slopes = dc["alibi_slopes"]
            scale = aspec.queries_scale if spec.scale_alibi else 1.0
            if pos_vec and attn_cached and not spec.alibi_use_positive_positions:
                # Per-row positions (continuous batching / speculative
                # verify): the query at chunk offset j sits at absolute
                # position pos[b]+j, so negative key positions end at 0
                # on it — a per-row [B, H, T, C] bias (masked keys beyond
                # the query are killed by the causal bias anyway).
                q_pos = (pos[:, None].astype(jnp.float32)
                         + jnp.arange(T, dtype=jnp.float32)[None, :])
                positions = (jnp.arange(Tk, dtype=jnp.float32)[None, None, :]
                             - q_pos[:, :, None])  # [B, T, Tk]
                alibi_bias = (slopes[None, :, None, None]
                              * positions[:, None] * scale)
            else:
                positions = jnp.arange(Tk, dtype=jnp.float32)
                if not spec.alibi_use_positive_positions:
                    # Negative positions end at 0 on the last *current* key
                    # (reference: src/layers/attention_layer.cc:38-41).
                    cur_len = (pos + T) if attn_cached else T
                    positions = positions - (
                        jnp.asarray(cur_len, jnp.float32) - 1)
                alibi_bias = (slopes[:, None, None]
                              * positions[None, None, :] * scale)

        rel_positions = None
        if aspec.has_rel_position_keys:
            # Per-row positions (pos_vec: continuous batching /
            # speculative verify chunks) produce batched [B, T, Tk]
            # indices; shared positions keep the [T, Tk] form.
            Tk = C if attn_cached else T
            rel_positions = attn_ops.make_relative_positions(
                T, Tk, aspec.max_relative_position,
                query_offset=pos if (attn_cached or pos_vec) else None)
        pbias = None
        if aspec.has_rel_attention_bias:
            # pos_vec gives a per-row [B, H, T, Tk] bucketed bias (same
            # treatment ALiBi gets above; reference buckets:
            # src/layers/attention.cc:51-126).
            Tk = C if attn_cached else T
            pbias = attn_ops.t5_position_bias(
                lp["self_attention"]["relative_attention_bias"],
                T, Tk, aspec.rel_max_distance, bidirectional=False,
                query_offset=pos if (attn_cached or pos_vec) else 0)
        if layer_ring and (alibi_bias is not None or rel_positions is not None
                           or pbias is not None):
            raise NotImplementedError(
                "ring KV caches do not support ALiBi/relative-position "
                "layers (set CT2TPU_WINDOW_RING=0)")
        return layer_bias, alibi_bias, rel_positions, pbias, layer_ring

    # Fast path: one scanned layer body for uniform stacks (weights, cache
    # and memory K/V stream through scan xs — per-step op count drops
    # ~num_layers-fold).
    if (stacked and alignment_pairs is None and not return_attention
            and (self_cache is None or cache_is_stacked(self_cache))
            and not isinstance(mem_kv, list)):
        layer0 = spec.layers[0]
        lp0 = _layer_slice(dp["layers"], 0)
        layer_bias, alibi_bias, rel_positions, position_bias, layer_ring = \
            layer_extras(0, layer0, lp0,
                         _layer_slice(self_cache, 0)
                         if self_cache is not None else None)
        rot = dc.get("rotary", {}).get("0")
        x, new_cache = _scan_decoder_layers(
            arch, spec, dp["layers"], x,
            bias=layer_bias, alibi_bias=alibi_bias,
            rel_positions=rel_positions, position_bias=position_bias,
            rot=rot, pos=pos, self_cache=self_cache, mem_kv=mem_kv,
            memory_bias=memory_bias, beam_size=beam_size, lengths=lengths,
            quantize_acts=quantize_acts, causal_only=causal_only,
            ring=layer_ring, flash_alibi=flash_alibi, fresh_prefill=fresh)
        if spec.has_output_norm:
            x = _norm(arch, dp.get("layer_norm"), x)
        if spec.has_project_out:
            x = linear(dp["project_out"], x, quantize_activations=quantize_acts)
        if spec.has_outputs_scale:
            x = x * dp["scale_outputs"].astype(x.dtype)
        if return_logits and spec.has_projection:
            logits = linear(dp["projection"], x,
                            quantize_activations=quantize_acts)
            if spec.final_logit_softcapping:
                cap = spec.final_logit_softcapping
                logits = jnp.tanh(logits / cap) * cap
        else:
            logits = x
        return logits, new_cache, None

    for i, layer in enumerate(spec.layers):
        lp = _layer_slice(dp["layers"], i)
        aspec = layer.self_attention
        rot = dc.get("rotary", {}).get(str(i))

        cache_i = _layer_slice(self_cache, i) if self_cache is not None else None
        layer_bias, alibi_bias, rel_positions, pbias, layer_ring = \
            layer_extras(i, layer, lp, cache_i)
        if pbias is not None and position_bias is None:
            position_bias = pbias

        layer_attention = None

        if layer.sandwich_norm:
            h = _norm(arch, lp["input_layer_norm"], x)
            if aspec.has_memory_kv:
                # Merged self+cross attention (T5Gemma2,
                # reference: src/layers/attention.cc:625-796).
                ctx, nc = merged_attention_block(
                    arch, aspec, lp["self_attention"], h,
                    _layer_slice(mem_kv, i),
                    bias=layer_bias, memory_bias=memory_bias,
                    rot_consts=rot, offset=pos, cache=cache_i,
                    beam_size=beam_size, pre_norm=spec.pre_norm,
                    quantize_acts=quantize_acts, wrap_norm=False)
            else:
                ctx, nc = self_attention_block(
                    arch, aspec, lp["self_attention"], h,
                    bias=layer_bias, rot_consts=rot, offset=pos, cache=cache_i,
                    pre_norm=spec.pre_norm, quantize_acts=quantize_acts,
                    alibi_bias=alibi_bias, rel_positions=rel_positions,
                    position_bias=position_bias, wrap_norm=False,
                    causal=True, flash_lengths=lengths,
                    causal_only=causal_only and not aspec.sliding_window,
                    beam_chain=beam_chain, beam_chain_size=beam_size,
                    ring=layer_ring,
                    alibi_slopes=flash_alibi,
                    alibi_positive=spec.alibi_use_positive_positions,
                    fresh_prefill=fresh)
            x = x + _norm(arch, lp["post_attention_layer_norm"], ctx)
            if layer.cross_attention is not None:
                h = _norm(arch, lp["external_pre_encoder_attention_layer_norm"], x) \
                    if layer.external_pre_cross_norm else x
                want_w = (
                    ("logits" if raw_attention else True)
                    if (alignment_pairs is not None and i in pair_layers)
                    else (return_attention and alignment_pairs is None
                          and i == spec.alignment_layer))
                ctx, layer_attention = cross_attention_block(
                    arch, layer.cross_attention, lp["attention"], h,
                    _layer_slice(mem_kv, i),
                    memory_bias=memory_bias, beam_size=beam_size,
                    pre_norm=spec.pre_norm, quantize_acts=quantize_acts,
                    return_weights=want_w,
                    wrap_norm=False)
                if layer.external_post_cross_norm:
                    ctx = _norm(
                        arch, lp["external_post_encoder_attention_layer_norm"], ctx)
                x = x + ctx
            h = _norm(arch, lp["pre_feedforward_layer_norm"], x)
            f = ffn_block(arch, layer.ffn, lp["ffn"], h, spec.pre_norm,
                          quantize_acts, wrap_norm=False)
            x = x + _norm(arch, lp["post_feedforward_layer_norm"], f)
            if layer.layer_scalar != 1.0:
                x = x * jnp.asarray(layer.layer_scalar, dtype=x.dtype)
        elif layer.shared_layer_norm or layer.input_layer_norm:
            # Parallel residual (GPT-J / GPT-NeoX)
            # (reference: src/layers/transformer.cc:298-332).
            norm_p = lp.get("shared_layer_norm") or lp.get("input_layer_norm")
            h = _norm(arch, norm_p, x)
            a, nc = self_attention_block(
                arch, aspec, lp["self_attention"], h,
                bias=layer_bias, rot_consts=rot, offset=pos, cache=cache_i,
                pre_norm=spec.pre_norm, quantize_acts=quantize_acts,
                alibi_bias=alibi_bias, rel_positions=rel_positions,
                position_bias=position_bias, wrap_norm=False,
                causal=True, flash_lengths=lengths,
                causal_only=causal_only and not aspec.sliding_window,
                beam_chain=beam_chain, beam_chain_size=beam_size,
                    ring=layer_ring,
                    alibi_slopes=flash_alibi,
                    alibi_positive=spec.alibi_use_positive_positions,
                    fresh_prefill=fresh)
            if layer.post_attention_layer_norm:
                h = _norm(arch, lp["post_attention_layer_norm"], x)
            f = ffn_block(arch, layer.ffn, lp["ffn"], h, spec.pre_norm,
                          quantize_acts, wrap_norm=False)
            x = x + a + f
        elif aspec.has_memory_kv:
            x, nc = merged_attention_block(
                arch, aspec, lp["self_attention"], x,
                _layer_slice(mem_kv, i),
                bias=layer_bias, memory_bias=memory_bias,
                rot_consts=rot, offset=pos, cache=cache_i,
                beam_size=beam_size, pre_norm=spec.pre_norm,
                quantize_acts=quantize_acts)
            x = ffn_block(arch, layer.ffn, lp["ffn"], x, spec.pre_norm,
                          quantize_acts)
        else:
            x, nc = self_attention_block(
                arch, aspec, lp["self_attention"], x,
                bias=layer_bias, rot_consts=rot, offset=pos, cache=cache_i,
                pre_norm=spec.pre_norm, quantize_acts=quantize_acts,
                alibi_bias=alibi_bias, rel_positions=rel_positions,
                position_bias=position_bias,
                causal=True, flash_lengths=lengths,
                causal_only=causal_only and not aspec.sliding_window,
                beam_chain=beam_chain, beam_chain_size=beam_size,
                    ring=layer_ring,
                    alibi_slopes=flash_alibi,
                    alibi_positive=spec.alibi_use_positive_positions,
                    fresh_prefill=fresh)
            if layer.cross_attention is not None:
                want_w = (
                    ("logits" if raw_attention else True)
                    if (alignment_pairs is not None and i in pair_layers)
                    else (return_attention and alignment_pairs is None
                          and i == spec.alignment_layer))
                x, layer_attention = cross_attention_block(
                    arch, layer.cross_attention, lp["attention"], x,
                    _layer_slice(mem_kv, i),
                    memory_bias=memory_bias, beam_size=beam_size,
                    pre_norm=spec.pre_norm, quantize_acts=quantize_acts,
                    return_weights=want_w)
            x = ffn_block(arch, layer.ffn, lp["ffn"], x, spec.pre_norm, quantize_acts)

        if new_cache is not None:
            new_cache.append(nc)
        if layer_attention is not None:
            if alignment_pairs is not None:
                for hi in pair_layers.get(i, ()):
                    collected_pairs.append(layer_attention[:, hi:hi + 1])
            else:
                # Average the alignment heads
                # (reference: src/layers/transformer.cc:565-603, 821-836).
                attn_out = jnp.mean(
                    layer_attention[:, : spec.alignment_heads], axis=1
                )

    if alignment_pairs is not None and collected_pairs:
        attn_out = jnp.concatenate(collected_pairs, axis=1)  # [B, P, T, S]

    if stacked and new_cache is not None:
        # Keep the stacked layout across calls (rare general-path use on a
        # stacked model, e.g. attention collection).
        new_cache = jax.tree.map(lambda *xs: jnp.stack(xs), *new_cache)

    if spec.has_output_norm:
        x = _norm(arch, dp.get("layer_norm"), x)
    if spec.has_project_out:
        x = linear(dp["project_out"], x, quantize_activations=quantize_acts)
    if spec.has_outputs_scale:
        x = x * dp["scale_outputs"].astype(x.dtype)

    if return_logits and spec.has_projection:
        logits = linear(dp["projection"], x, quantize_activations=quantize_acts)
        if spec.final_logit_softcapping:
            cap = spec.final_logit_softcapping
            logits = jnp.tanh(logits / cap) * cap
    else:
        logits = x

    return logits, new_cache, attn_out


# Jitted entry points (arch/flags static, everything else traced).
encoder_forward_jit = jax.jit(
    encoder_forward, static_argnames=("arch", "quantize_acts", "out_dtype")
)
decoder_forward_jit = jax.jit(
    decoder_forward,
    static_argnames=(
        "arch",
        "beam_size",
        "return_attention",
        "alignment_pairs",
        "raw_attention",
        "quantize_acts",
        "out_dtype",
        "return_logits",
        "fresh_prefill",
    ),
)
precompute_memory_jit = jax.jit(
    precompute_memory, static_argnames=("arch", "quantize_acts")
)
