"""Context (sequence) parallelism: ring attention over a mesh axis.

Beyond-parity feature (the reference has no sequence/context parallelism —
SURVEY §2.6): long-context prefill shards the sequence axis across devices.
Each device keeps its Q shard resident and the K/V shards rotate around the
ring with ``ppermute`` while partial attention accumulates with the online
softmax — ICI traffic overlaps with the per-step attention compute
(the blockwise/ring-attention construction).

Works under ``jax.shard_map`` on any mesh axis; validated on the CPU
8-device mesh in tests.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

NEG_INF = -1e30

# Active context-parallel configuration: (mesh, cp_axis). Registered by
# apply_tensor_parallel (the CP axis is the mesh's 'data' axis, idle
# during single-request long-prompt prefill); consumed by the prefill
# dispatch in models/transformer.py attention_block.
_ACTIVE_CP = None


def enable_context_parallel(mesh: Mesh, axis: str = "data") -> None:
    global _ACTIVE_CP
    _ACTIVE_CP = (mesh, axis)


def disable_context_parallel() -> None:
    global _ACTIVE_CP
    _ACTIVE_CP = None


def context_parallel_config():
    """(mesh, axis) when context parallelism is available, else None.
    Gated off when the CP axis has size 1 or CT2TPU_RING_PREFILL=0."""
    if _ACTIVE_CP is None:
        return None
    if os.environ.get("CT2TPU_RING_PREFILL", "1") == "0":
        return None
    mesh, axis = _ACTIVE_CP
    if mesh.shape[axis] <= 1:
        return None
    return _ACTIVE_CP


def ring_prefill_min_len() -> int:
    """Sequence-length threshold for routing fresh prefill attention
    through the ring (below it the resharding cost dominates)."""
    return int(os.environ.get("CT2TPU_RING_PREFILL_MIN_LEN", "4096"))


def _ring_attention_local(q, k, v, lengths=None, *, axis_name: str,
                          causal: bool, scale: float):
    """Per-device body (inside shard_map).

    q/k/v: local shards [B, H, T_local, D] (sequence-sharded); lengths
    [B] masks key positions >= length (ragged batch rows).
    Returns the local shard of the attention output.
    """
    idx = jax.lax.axis_index(axis_name)
    n = jax.lax.axis_size(axis_name)
    B, H, Tl, D = q.shape

    q32 = q.astype(jnp.float32) * scale
    q_pos = idx * Tl + jnp.arange(Tl, dtype=jnp.int32)

    perm = [(j, (j + 1) % n) for j in range(n)]

    def step(carry, i):
        k_cur, v_cur, m, l, acc = carry
        src = (idx - i) % n  # owner of the K/V shard currently held
        k_pos = src * Tl + jnp.arange(Tl, dtype=jnp.int32)

        s = jnp.einsum("bhqd,bhkd->bhqk", q32, k_cur.astype(jnp.float32))
        if causal:
            mask = k_pos[None, :] <= q_pos[:, None]
            s = jnp.where(mask[None, None], s, NEG_INF)
        if lengths is not None:
            valid = k_pos[None, :] < lengths[:, None]  # [B, Tl]
            s = jnp.where(valid[:, None, None, :], s, NEG_INF)

        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        corr = jnp.exp(m - m_new)
        l = l * corr + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * corr + jnp.einsum(
            "bhqk,bhkd->bhqd", p, v_cur.astype(jnp.float32))

        k_next = jax.lax.ppermute(k_cur, axis_name, perm)
        v_next = jax.lax.ppermute(v_cur, axis_name, perm)
        return (k_next, v_next, m_new, l, acc), None

    m0 = jnp.full((B, H, Tl, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((B, H, Tl, 1), jnp.float32)
    acc0 = jnp.zeros((B, H, Tl, D), jnp.float32)

    (k, v, m, l, acc), _ = jax.lax.scan(
        step, (k, v, m0, l0, acc0), jnp.arange(n))
    out = acc / jnp.maximum(l, 1e-20)
    return out.astype(q.dtype)


def ring_prefill_eligible(q_shape, kv_heads: int, mesh: Mesh,
                          axis: str) -> bool:
    """Static shape checks for the fresh-prefill ring dispatch: the
    sequence must divide the CP axis; heads either divide the 'model'
    axis (TP layout preserved) or are replicated."""
    B, Hq, T, D = q_shape
    n = mesh.shape[axis]
    if T % n or T // n < 128:
        return False
    return True


def ring_attention_prefill(q, k, v, lengths=None, *, scale: float,
                           mesh: Mesh, axis: str = "data"):
    """Jit-composable fresh-prefill ring attention for long prompts:
    [B, Hq, T, D] x [B, Hkv, T, D] causal attention with the sequence
    axis sharded over the CP mesh axis and heads kept on the TP axis.
    GQA expands K/V heads before sharding (prefill-sized, cheap
    relative to the O(T^2) attention)."""
    Hq, Hkv = q.shape[1], k.shape[1]
    if Hkv != Hq:
        k = jnp.repeat(k, Hq // Hkv, axis=1)
        v = jnp.repeat(v, Hq // Hkv, axis=1)
    head_axis = "model" if ("model" in mesh.shape
                            and Hq % mesh.shape["model"] == 0) else None
    spec = P(None, head_axis, axis, None)
    in_specs = (spec, spec, spec) + ((P(None),) if lengths is not None
                                     else ())
    args = (q, k, v) + ((lengths,) if lengths is not None else ())
    if lengths is None:
        body = functools.partial(_ring_attention_local, lengths=None,
                                 axis_name=axis, causal=True, scale=scale)
    else:
        body = functools.partial(_ring_attention_local, axis_name=axis,
                                 causal=True, scale=scale)
    fn = jax.shard_map(body, mesh=mesh, in_specs=in_specs,
                       out_specs=spec, check_vma=False)
    return fn(*args)


def ring_attention(q, k, v, mesh: Mesh, *, axis: str = "model",
                   causal: bool = True, scale: float = 1.0):
    """Sequence-sharded attention: [B, H, T, D] inputs sharded on T.

    The T axis must be divisible by the mesh axis size. Inputs may be
    unsharded host arrays; they are placed with a sequence-sharded layout.
    """
    spec = P(None, None, axis, None)
    sharding = NamedSharding(mesh, spec)
    q, k, v = (jax.device_put(x, sharding) for x in (q, k, v))

    fn = jax.shard_map(
        functools.partial(_ring_attention_local, axis_name=axis,
                          causal=causal, scale=scale),
        mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
        check_vma=False,
    )
    return fn(q, k, v)
