"""Vectorized on-device logits processors.

Replaces the reference's host/GPU DisableTokens index-batching design
(reference: include/ctranslate2/decoding_utils.h:36-180,
src/decoding_utils.cc) with masked tensor ops that fuse into the jitted
decode step: no per-step host<->device synchronization.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

DISABLE = -3.4e38 / 4  # matches "lowest" semantics without producing NaNs


def disable_tokens(logits, token_ids: Tuple[int, ...]):
    """Statically disable a fixed token set."""
    if not token_ids:
        return logits
    mask = jnp.zeros((logits.shape[-1],), jnp.bool_).at[jnp.asarray(token_ids)].set(True)
    return jnp.where(mask, DISABLE, logits)


def disable_tokens_if(logits, token_ids: Tuple[int, ...], cond):
    """Disable a fixed token set for rows where ``cond`` ([N] bool) holds."""
    if not token_ids:
        return logits
    mask = jnp.zeros((logits.shape[-1],), jnp.bool_).at[jnp.asarray(token_ids)].set(True)
    return jnp.where(cond[:, None] & mask[None, :], DISABLE, logits)


def repetition_penalty(logits, alive_seq, seq_len, penalty: float):
    """Penalize tokens already generated
    (reference: src/decoding_utils.cc RepetitionPenalty::apply):
    positive logits are divided by the penalty, negative multiplied.

    ``alive_seq``: [N, L] int32 history buffer; entries >= seq_len ignored.
    """
    N, V = logits.shape
    L = alive_seq.shape[1]
    valid = jnp.arange(L, dtype=jnp.int32)[None, :] < seq_len  # [N, L]
    rows = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32)[:, None], (N, L))
    seen = jnp.zeros((N, V), jnp.bool_).at[rows, alive_seq].max(valid)
    penalized = jnp.where(logits > 0, logits / penalty, logits * penalty)
    return jnp.where(seen, penalized, logits)


def repetition_penalty_per_row(logits, seen, penalties):
    """Row-vectorized RepetitionPenalty with a per-row penalty value
    (reference: per-call options through the pool,
    include/ctranslate2/translation.h:11-86).

    ``seen``: [N, V] bool presence mask; ``penalties``: [N] float
    (1.0 rows are an exact no-op).
    """
    p = penalties[:, None]
    penalized = jnp.where(logits > 0, logits / p, logits * p)
    return jnp.where(seen, penalized, logits)


def no_repeat_ngram_per_row(logits, hist, seq_len, ngram_sizes, max_n: int):
    """Row-vectorized NoRepeatNgram with a per-row ngram size
    (0 disables the row; sizes are bounded by the static ``max_n``).

    End-position formulation: the token ``hist[e]`` is banned for row r
    iff ``hist[e-k] == hist[len-k]`` for every k in 1..n_r-1, with the
    window fully inside the generated region. Same bans as
    :func:`no_repeat_ngram` when all rows share one size.
    """
    N, V = logits.shape
    L = hist.shape[1]
    if max_n < 2:
        return logits
    n = jnp.asarray(ngram_sizes, jnp.int32)  # [N]
    seq_len = jnp.asarray(seq_len, jnp.int32)
    if seq_len.ndim == 0:
        seq_len = jnp.full((N,), seq_len, jnp.int32)
    e = jnp.arange(L, dtype=jnp.int32)                      # [L]
    k = jnp.arange(1, max_n, dtype=jnp.int32)               # [K]
    # hist[e - k] for every end position / lag.
    he = hist[:, jnp.clip(e[:, None] - k[None, :], 0, L - 1)]   # [N, L, K]
    # The row's current tail: hist[len - k].
    tail_idx = jnp.clip(seq_len[:, None] - k[None, :], 0, L - 1)  # [N, K]
    ht = jnp.take_along_axis(hist, tail_idx, axis=1)        # [N, K]
    # Lags beyond the row's n-1 don't participate (auto-match).
    lag_off = k[None, None, :] >= n[:, None, None]
    eq = (he == ht[:, None, :]) | lag_off                   # [N, L, K]
    match = jnp.all(eq, axis=-1)                            # [N, L]
    valid = ((e[None, :] >= n[:, None] - 1)
             & (e[None, :] < seq_len[:, None])
             & (seq_len[:, None] >= n[:, None])
             & (n[:, None] >= 2))
    match = match & valid
    rows = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32)[:, None], (N, L))
    ban = jnp.zeros((N, V), jnp.bool_).at[rows, hist].max(match)
    return jnp.where(ban, DISABLE, logits)


def disable_tokens_per_row(logits, token_table):
    """Disable per-row token sets given as an [N, W] id table
    (-1 entries drop; W == 0 is a no-op)."""
    if token_table.shape[1] == 0:
        return logits
    N, V = logits.shape
    rows = jnp.broadcast_to(
        jnp.arange(N, dtype=jnp.int32)[:, None], token_table.shape)
    mask = jnp.zeros((N, V), jnp.bool_).at[rows, token_table].set(
        True, mode="drop")
    return jnp.where(mask, DISABLE, logits)


def no_repeat_ngram(logits, alive_seq, seq_len, ngram_size: int):
    """Ban tokens that would complete an already-seen n-gram
    (reference: src/decoding_utils.cc NoRepeatNgram::apply).

    For each position j in the history, if history[j : j+n-1] equals the last
    n-1 generated tokens, the token history[j+n-1] is banned.
    """
    N, V = logits.shape
    L = alive_seq.shape[1]
    n = ngram_size
    if L < n:
        return logits

    # seq_len: scalar (uniform steps) or [N] per-row (continuous batching).
    seq_len = jnp.asarray(seq_len, jnp.int32)
    if seq_len.ndim == 0:
        seq_len = jnp.full((N,), seq_len, jnp.int32)

    # Last (n-1) tokens of each row: gather at positions seq_len-n+1 .. seq_len-1.
    tail_pos = (seq_len[:, None] - (n - 1)
                + jnp.arange(n - 1, dtype=jnp.int32)[None, :])  # [N, n-1]
    tail_pos = jnp.clip(tail_pos, 0, L - 1)
    tail = jnp.take_along_axis(alive_seq, tail_pos, axis=1)  # [N, n-1]

    # Compare every window start j (0..L-n) against the tail.
    num_windows = L - n + 1
    j = jnp.arange(num_windows, dtype=jnp.int32)
    # windows[:, j, t] = alive_seq[:, j+t]
    idx = j[:, None] + jnp.arange(n - 1, dtype=jnp.int32)[None, :]  # [W, n-1]
    windows = alive_seq[:, idx]  # [N, W, n-1]
    matches = jnp.all(windows == tail[:, None, :], axis=-1)  # [N, W]
    # Window must lie fully in the generated region: j + n - 1 < seq_len.
    in_range = (j[None, :] + (n - 1)) < seq_len[:, None]
    matches = matches & in_range & (seq_len[:, None] >= n)

    # banned token of window j is alive_seq[:, j + n - 1]
    banned_tokens = alive_seq[:, j + (n - 1)]  # [N, W]

    rows = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32)[:, None], matches.shape)
    ban_mask = jnp.zeros((N, V), jnp.bool_).at[rows, banned_tokens].max(matches)
    return jnp.where(ban_mask, DISABLE, logits)


def whisper_timestamp_rules(logits, alive_seq, gen_len, sample_begin,
                            eot_id: int, no_timestamps_id: int,
                            timestamp_begin_id: int, timestamp_end_id: int,
                            max_initial_timestamp_id: int):
    """Whisper timestamp sampling rules, fully vectorized on device
    (reference: src/models/whisper.cc:742-865 ApplyTimestampRules):

    - <|notimestamps|> always disabled;
    - at the very first sample (no forced text): only timestamps up to
      max_initial allowed;
    - timestamps appear in pairs (except before EOT);
    - timestamps never decrease;
    - if total timestamp probability beats every text token, force a
      timestamp.

    ``sample_begin``: [N] number of forced (prefix) steps per row.
    """
    N, V = logits.shape
    L = alive_seq.shape[1]
    l = logits
    tok = jnp.arange(V, dtype=jnp.int32)[None, :]  # [1, V]
    is_ts_vocab = tok >= timestamp_begin_id

    # gen_len / sample_begin: scalar (uniform steps) or [N] per-row
    # (continuous batching) — normalize to per-row vectors.
    gen_len = jnp.asarray(gen_len, jnp.int32)
    if gen_len.ndim == 0:
        gen_len = jnp.full((N,), gen_len, jnp.int32)
    sample_begin = jnp.asarray(sample_begin, jnp.int32)
    if sample_begin.ndim == 0:
        sample_begin = jnp.full((N,), sample_begin, jnp.int32)

    # Always disable <|notimestamps|>.
    l = jnp.where(tok == no_timestamps_id, DISABLE, l)

    # Initial step: only timestamps, capped at max_initial.
    at_init = jnp.equal(gen_len, 0) & (sample_begin == 0)  # [N]
    init_mask = (tok < timestamp_begin_id) | (tok > max_initial_timestamp_id)
    l = jnp.where(at_init[:, None] & init_mask, DISABLE, l)

    applies = gen_len > sample_begin  # [N]
    last_idx = jnp.clip(gen_len - 1, 0, L - 1)
    penult_idx = jnp.clip(gen_len - 2, 0, L - 1)
    last = jnp.take_along_axis(alive_seq, last_idx[:, None], axis=1)[:, 0]
    penult_raw = jnp.take_along_axis(
        alive_seq, penult_idx[:, None], axis=1)[:, 0]
    penult = jnp.where(gen_len - 1 > sample_begin, penult_raw, last)
    last_is_ts = last >= timestamp_begin_id
    pen_is_ts = penult >= timestamp_begin_id

    # Pairs rule.
    rule_a = applies & last_is_ts & pen_is_ts
    l = jnp.where(rule_a[:, None] & is_ts_vocab, DISABLE, l)
    rule_b = applies & last_is_ts & jnp.logical_not(pen_is_ts)
    mask_b = (tok < eot_id) | (is_ts_vocab & (tok < last[:, None]))
    l = jnp.where(rule_b[:, None] & mask_b, DISABLE, l)

    # Non-decreasing timestamps.
    pos = jnp.arange(L, dtype=jnp.int32)[None, :]
    in_window = (pos < gen_len[:, None]) & (pos >= sample_begin[:, None])
    is_ts_hist = (alive_seq >= timestamp_begin_id) & in_window
    latest_pos = jnp.max(jnp.where(is_ts_hist, pos, -1), axis=1)  # [N]
    has_ts = latest_pos >= 0
    latest_tok = jnp.take_along_axis(
        alive_seq, jnp.clip(latest_pos, 0, L - 1)[:, None], axis=1)[:, 0]
    rule_c = applies & jnp.logical_not(last_is_ts) & has_ts
    mask_c = is_ts_vocab & (tok <= latest_tok[:, None])
    l = jnp.where(rule_c[:, None] & mask_c, DISABLE, l)

    # Probability rule: if sum of timestamp probs beats the best text token,
    # only timestamps may be sampled.
    check = applies & (rule_b | jnp.logical_not(last_is_ts))
    lp = jax.nn.log_softmax(l, axis=-1)
    max_text = jnp.max(
        jnp.where(tok < timestamp_begin_id, lp, -jnp.inf), axis=1)
    ts_lse = jax.nn.logsumexp(
        jnp.where(is_ts_vocab, lp, -jnp.inf), axis=1)
    force_ts = check & (ts_lse > max_text)
    l = jnp.where(force_ts[:, None] & (tok < timestamp_begin_id), DISABLE, l)
    return l


def suppress_sequences_mask(
    logits, alive_seq, seq_len, sequences: Tuple[Tuple[int, ...], ...]
):
    """Ban the final token of any user-suppressed sequence whose previous
    tokens match the tail of the history
    (reference: src/decoding_utils.cc SuppressSequences).

    Single-token sequences are statically disabled; longer ones are matched
    against the history tail.
    """
    single = tuple(s[0] for s in sequences if len(s) == 1)
    logits = disable_tokens(logits, single)

    N, V = logits.shape
    L = alive_seq.shape[1]
    for seq in sequences:
        if len(seq) < 2:
            continue
        k = len(seq) - 1
        if k > L:
            continue
        prev = jnp.asarray(seq[:-1], dtype=jnp.int32)
        pos = seq_len - k + jnp.arange(k, dtype=jnp.int32)
        pos_c = jnp.clip(pos, 0, L - 1)
        tail = jnp.take_along_axis(
            alive_seq, jnp.broadcast_to(pos_c[None, :], (N, k)), axis=1
        )
        match = jnp.all(tail == prev[None, :], axis=-1) & (seq_len >= k)
        logits = jnp.where(
            match[:, None]
            & (jnp.arange(V, dtype=jnp.int32) == seq[-1])[None, :],
            DISABLE,
            logits,
        )
    return logits
