"""On-device token sampling, fused into the decode step.

Order of operations mirrors the reference RandomSampler
(reference: src/sampling.cc:35-101): top-k restriction -> temperature ->
top-p (nucleus) mask -> categorical draw -> map back to original ids and
gather scores from the *unmodified* distribution.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .processors import DISABLE


def small_top_k(x, k: int):
    """Top-k by k iterative max passes — much faster than ``lax.top_k``'s
    sort-based lowering on TPU for small k over large vocabularies.

    Returns (values [..., k], indices [..., k]) in descending order.
    """
    if k > 16:
        return jax.lax.top_k(x, k)
    work = x
    vals = []
    idxs = []
    for _ in range(k):
        idx = jnp.argmax(work, axis=-1)
        val = jnp.take_along_axis(work, idx[..., None], axis=-1)[..., 0]
        vals.append(val)
        idxs.append(idx)
        work = jnp.where(
            jnp.arange(work.shape[-1], dtype=jnp.int32) == idx[..., None],
            DISABLE, work)
    return jnp.stack(vals, axis=-1), jnp.stack(idxs, axis=-1).astype(jnp.int32)


def top_p_mask(scores, p: float):
    """Mask scores outside the nucleus of cumulative probability ``p``.

    Keeps the smallest set of highest-probability tokens whose cumulative
    probability reaches ``p`` (the first token is always kept)
    (reference: src/ops/topp_mask.cc).
    """
    sorted_scores = jnp.sort(scores, axis=-1)[..., ::-1]
    probs = jax.nn.softmax(sorted_scores, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    # Exclusive cumulative sum: token kept while mass before it < p.
    keep_sorted = (cum - probs) < p
    # Threshold score: smallest kept score.
    num_keep = jnp.sum(keep_sorted, axis=-1, keepdims=True)
    threshold = jnp.take_along_axis(sorted_scores, num_keep - 1, axis=-1)
    return jnp.where(scores >= threshold, scores, DISABLE)


def sample_tokens(
    log_probs,  # [N, V] log-softmaxed scores
    key,
    *,
    topk: int = 1,
    topp: float = 1.0,
    temperature: float = 1.0,
    greedy: bool = False,
):
    """Returns (ids [N], scores [N]) where scores are log-probs of the picks."""
    if greedy:
        ids = jnp.argmax(log_probs, axis=-1)
        scores = jnp.take_along_axis(log_probs, ids[:, None], axis=-1)[:, 0]
        return ids.astype(jnp.int32), scores

    V = log_probs.shape[-1]
    scores = log_probs
    top_ids = None
    if 0 < topk < V:
        scores, top_ids = small_top_k(scores, topk)
    if temperature != 1.0:
        scores = scores / temperature
    if topp < 1.0:
        scores = top_p_mask(scores, topp)

    sampled = jax.random.categorical(key, scores, axis=-1)  # [N]
    if top_ids is not None:
        ids = jnp.take_along_axis(top_ids, sampled[:, None], axis=-1)[:, 0]
    else:
        ids = sampled
    out_scores = jnp.take_along_axis(log_probs, ids[:, None], axis=-1)[:, 0]
    return ids.astype(jnp.int32), out_scores


def gumbel_top_k(flat_scores, key, k: int, *, topk: int = 0,
                 topp: float = 1.0, temperature: float = 1.0):
    """``k`` draws without replacement via the Gumbel-max trick
    (reference: src/ops/gumbel_max.cc; used by RandomSampler when more than
    one sample is requested, src/sampling.cc:60-92 — the beam-search +
    random-sampling combination).

    Returns (scores, indices) where scores come from the *unperturbed*
    distribution, as the reference gathers them for beam bookkeeping.
    """
    work = flat_scores
    if topk and topk < work.shape[-1]:
        kth = small_top_k(work, topk)[0][..., -1:]
        work = jnp.where(work >= kth, work, DISABLE)
    if temperature != 1.0:
        work = work / temperature
    if topp < 1.0:
        work = top_p_mask(work, topp)
    u = jax.random.uniform(key, work.shape, minval=1e-20, maxval=1.0)
    gumbel = -jnp.log(-jnp.log(u))
    noisy = jnp.where(work <= DISABLE / 2, DISABLE, work + gumbel)
    _, idx = small_top_k(noisy, k)
    scores = jnp.take_along_axis(flat_scores, idx, axis=-1)
    return scores, idx
