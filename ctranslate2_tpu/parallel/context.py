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

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

NEG_INF = -1e30


def _ring_attention_local(q, k, v, *, axis_name: str, causal: bool,
                          scale: float):
    """Per-device body (inside shard_map).

    q/k/v: local shards [B, H, T_local, D] (sequence-sharded).
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
