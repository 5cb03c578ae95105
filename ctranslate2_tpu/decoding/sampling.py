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
    """Exact top-k with ONE full pass over the scores (block tournament).

    ``lax.top_k`` sort-lowers (many passes) and k iterated argmax+mask
    passes re-read and re-write the whole array k times; both are HBM-bound
    on [batch, vocab]-sized inputs. Here the scores are read once into
    per-block maxima, then each of the k picks re-examines only the winning
    block (a tiny gather), masking previously taken entries by flat index —
    exact for any tie pattern.

    Returns (values [..., k], indices [..., k]) in descending order.
    """
    if k > 16:
        return jax.lax.top_k(x, k)
    orig_shape = x.shape
    V = orig_shape[-1]
    B = 1
    for d in orig_shape[:-1]:
        B *= d
    x2 = x.reshape(B, V)

    bs = 512
    pad = (-V) % bs
    if pad:
        x2 = jnp.pad(x2, ((0, 0), (0, pad)), constant_values=DISABLE)
    nb = x2.shape[1] // bs
    if nb < 2:
        # Tiny rows: plain iterated argmax.
        work = x.reshape(B, V)
        vals, idxs = [], []
        for _ in range(k):
            idx = jnp.argmax(work, axis=-1)
            vals.append(jnp.take_along_axis(work, idx[:, None], -1)[:, 0])
            idxs.append(idx.astype(jnp.int32))
            work = jnp.where(
                jnp.arange(V, dtype=jnp.int32) == idx[:, None], DISABLE, work)
        return (jnp.stack(vals, -1).reshape(orig_shape[:-1] + (k,)),
                jnp.stack(idxs, -1).reshape(orig_shape[:-1] + (k,)))

    xb = x2.reshape(B, nb, bs)
    # The single full pass.
    bmax = jnp.max(xb, axis=-1)  # [B, nb]
    barg = jnp.argmax(xb, axis=-1).astype(jnp.int32)  # [B, nb]

    rows = jnp.arange(B, dtype=jnp.int32)
    in_iota = jnp.arange(bs, dtype=jnp.int32)[None, :]
    vals, idxs = [], []
    for i in range(k):
        win = jnp.argmax(bmax, axis=-1).astype(jnp.int32)  # [B]
        val = bmax[rows, win]
        flat = win * bs + barg[rows, win]
        vals.append(val)
        idxs.append(flat)
        # Re-examine only the winning block, excluding everything already
        # taken from it.
        blk = xb[rows, win]  # [B, bs]
        blk_pos = win[:, None] * bs + in_iota
        taken = jnp.zeros((B, bs), jnp.bool_)
        for f in idxs:
            taken = taken | (blk_pos == f[:, None])
        blk = jnp.where(taken, DISABLE, blk)
        bmax = bmax.at[rows, win].set(jnp.max(blk, axis=-1))
        barg = barg.at[rows, win].set(
            jnp.argmax(blk, axis=-1).astype(jnp.int32))

    out_v = jnp.stack(vals, -1).reshape(orig_shape[:-1] + (k,))
    out_i = jnp.stack(idxs, -1).reshape(orig_shape[:-1] + (k,))
    return out_v, out_i


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


def sample_tokens_per_row(
    log_probs,  # [S, V] log-softmaxed scores
    key,
    *,
    topks,  # [S] int32: 0 = full vocab, 1 = greedy, k = top-k restrict
    topps,  # [S] f32: 1.0 = off
    temps,  # [S] f32
    seeds,  # [S] int32: per-row PRNG stream (folded into ``key``)
    max_topk: int,
):
    """Row-vectorized sampler for the continuous engines: every request
    carries its OWN topk/topp/temperature/seed (reference: per-call
    options through the buffered wrapper,
    include/ctranslate2/translation.h:11-86). Rows with topk == 1 take
    the greedy pick. Returns (ids [S], scores [S]) with scores from the
    unmodified distribution.
    """
    S, V = log_probs.shape
    greedy_rows = topks == 1

    work = log_probs / jnp.maximum(temps, 1e-6)[:, None]
    if max_topk > 0:
        vals, _ = small_top_k(work, min(max_topk, V))  # desc
        kth = jnp.take_along_axis(
            vals, jnp.clip(topks - 1, 0, vals.shape[1] - 1)[:, None],
            axis=1)  # [S, 1]
        use_topk = ((topks > 1) & (topks < V))[:, None]
        work = jnp.where(use_topk & (work < kth), DISABLE, work)
    # Per-row nucleus mask (top_p_mask broadcasts an [S, 1] threshold).
    any_topp = topps < 1.0
    masked = top_p_mask(work, jnp.minimum(topps, 1.0)[:, None])
    work = jnp.where(any_topp[:, None], masked, work)

    # Per-row PRNG streams: one gumbel field keyed by fold_in(key, seed).
    row_keys = jax.vmap(lambda s: jax.random.fold_in(key, s))(seeds)
    gumbel = jax.vmap(
        lambda k: jax.random.gumbel(k, (V,), jnp.float32))(row_keys)
    sampled = jnp.argmax(work + gumbel, axis=-1).astype(jnp.int32)

    g_ids = jnp.argmax(log_probs, axis=-1).astype(jnp.int32)
    ids = jnp.where(greedy_rows, g_ids, sampled)
    scores = jnp.take_along_axis(log_probs, ids[:, None], axis=-1)[:, 0]
    return ids, scores


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


def gumbel_top_k_per_row(flat_scores, key, k: int, *, topks, topps,
                         temps, seeds, max_topk: int):
    """Row-vectorized Gumbel-top-k for the continuous beam engine:
    ``k`` draws without replacement per row, with per-request
    topk/topp/temperature/seed (reference: RandomSampler composed with
    beam search, src/sampling.cc:60-92, per-call options through the
    buffered wrapper). Rows with topk == 1 take the deterministic
    top-k picks, so mixed greedy/sampled beam traffic shares one
    dispatch. Scores come from the *unperturbed* distribution.

    Returns (scores [S, k], indices [S, k]).
    """
    S, W = flat_scores.shape
    greedy_rows = topks == 1

    work = flat_scores / jnp.maximum(temps, 1e-6)[:, None]
    if max_topk > 0:
        vals, _ = small_top_k(work, min(max_topk, W))  # desc
        kth = jnp.take_along_axis(
            vals, jnp.clip(topks - 1, 0, vals.shape[1] - 1)[:, None],
            axis=1)  # [S, 1]
        use_topk = ((topks > 1) & (topks < W))[:, None]
        work = jnp.where(use_topk & (work < kth), DISABLE, work)
    any_topp = topps < 1.0
    masked = top_p_mask(work, jnp.minimum(topps, 1.0)[:, None])
    work = jnp.where(any_topp[:, None], masked, work)

    row_keys = jax.vmap(lambda s: jax.random.fold_in(key, s))(seeds)
    gumbel = jax.vmap(
        lambda kk: jax.random.gumbel(kk, (W,), jnp.float32))(row_keys)
    noisy = jnp.where(work <= DISABLE / 2, DISABLE, work + gumbel)

    det_i = small_top_k(flat_scores, k)[1]
    smp_i = small_top_k(noisy, k)[1]
    idx = jnp.where(greedy_rows[:, None], det_i, smp_i)
    scores = jnp.take_along_axis(flat_scores, idx, axis=-1)
    return scores, idx


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
