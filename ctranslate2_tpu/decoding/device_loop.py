"""Fully on-device decoding loops (lax.while_loop).

The reference decodes with one host round-trip per token (sampled ids come
back to the CPU for control flow: reference src/decoding.cc:860-869,
923-974). On TPU that sync is the bottleneck — especially for greedy
generation — so the entire generate loop (step forward, logits processors,
sampling, prefix forcing, EOS tracking) runs inside ONE jitted
``lax.while_loop``: a single device dispatch per request batch.

Used automatically by the engine when no per-step callback or attention
output is requested; the host loop remains the general path.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..models import transformer as T
from ..ops import attention as attn_ops
from . import processors as proc
from .sampling import gumbel_top_k, sample_tokens, small_top_k


def build_beam_loop(arch, sig, quantize_acts: bool, out_dtype,
                    max_steps: int, *, beam_size: int, num_hyp: int,
                    max_candidates: int, length_penalty: float,
                    return_prefix: bool, include_eos: bool,
                    count_eos: bool = True,
                    max_length: int, allow_early_exit: bool,
                    has_prefix: bool, has_memory: bool,
                    has_token_map: bool = False,
                    init_cache: Optional[tuple] = None):
    """Build a jitted whole-generation beam-search loop.

    Replicates the reference candidate bookkeeping (2*beam candidates, EOS
    harvesting with secondary promotion, patience, hard-prefix override —
    reference: src/decoding.cc:411-720) entirely on device: hypotheses land
    in a fixed [B, num_hyp] best-score store; the host only reads the final
    buffers.

    Returns fn(params, consts, start_tokens [B*K], start_pos, cache, mem_kv,
    mem_bias, prefix [B, P], prefix_len [B], min_steps [B], key)
    -> (store_seqs [B, M, L], store_lens [B, M], store_scores [B, M],
        store_count [B]).
    """
    K = beam_size
    K2 = 2 * K
    M = num_hyp
    NEG = -1e10
    end_ids = jnp.asarray(sig.end_ids or (0,), jnp.int32)
    has_end = bool(sig.end_ids)

    # Chain-mask beam attention: instead of physically reordering every
    # KV-cache array by beam origin each step (~3x the cache bytes in
    # gather + staging traffic), keep the cache un-reordered and track a
    # tiny [N, C] origin chain consumed as an attention mask
    # (see ops/attention.py beam_chain_attention). Needs a float per-layer
    # cache and no relative/T5 biases.
    import os as _os

    dspec = arch.decoder
    use_chain = (
        K > 1
        and _os.environ.get("CT2TPU_BEAM_CHAIN", "1") != "0"
        and init_cache is not None
        and init_cache[2] != jnp.int8 and not init_cache[3]
        and not any(
            l.self_attention.has_rel_position_keys
            or l.self_attention.has_rel_attention_bias
            or l.self_attention.has_rel_asymmetric_keys
            or l.self_attention.has_memory_kv
            for l in dspec.layers)
    )

    def is_end(tok):
        if not has_end:
            return jnp.zeros(tok.shape, jnp.bool_)
        return jnp.any(tok[..., None] == end_ids, axis=-1)

    def loop(params, consts, control, start_pos, cache, mem_kv,
             mem_bias, key, token_map=None,
             encoder_ids=None, encoder_lengths=None):
        # control [B, 3 + K + P]: prefix_len | min_steps | pad | start_tokens
        # (per beam) | prefix rows. One host->device upload per request.
        prefix_len = control[:, 0]
        min_steps = control[:, 1]
        start_tokens = control[:, 3:3 + K].reshape(-1)
        prefix = control[:, 3 + K:]
        B = control.shape[0]
        N = B * K
        L = max_steps
        if init_cache is not None:
            from ..models.transformer import init_self_cache
            arch_, capacity_, dtype_, stacked_ = init_cache
            cache = init_self_cache(arch_, N, capacity_, dtype=dtype_,
                                    stacked=stacked_)

        if encoder_ids is not None:
            # Fused encode + cross-KV projection: one dispatch per request.
            memory = T.encoder_forward(
                arch, params, consts, encoder_ids, encoder_lengths,
                quantize_acts=quantize_acts, out_dtype=out_dtype)
            mem_kv = T.precompute_memory(
                arch, params, memory, quantize_acts=quantize_acts)
            mem_bias = attn_ops.length_mask_bias(
                encoder_lengths, memory.shape[1])

        alive = jnp.zeros((B, K, L), jnp.int32)
        scores = jnp.full((B, K), NEG, jnp.float32).at[:, 0].set(0.0)
        if use_chain:
            capacity_c = init_cache[1]
            # Prefix slots (< start_pos) hold beam-identical prefill rows:
            # "self" is a correct owner; future slots are -1 (invalid, which
            # also subsumes the causal mask for single-token decode).
            self_ids = jnp.tile(jnp.arange(K, dtype=jnp.int32), B)  # [N]
            cpos = jnp.arange(capacity_c, dtype=jnp.int32)[None, :]
            chain = jnp.where(cpos < start_pos, self_ids[:, None], -1)
        else:
            chain = None
        store_seqs = jnp.zeros((B, M, L), jnp.int32)
        store_lens = jnp.zeros((B, M), jnp.int32)
        store_scores = jnp.full((B, M), -jnp.inf, jnp.float32)
        store_count = jnp.zeros(B, jnp.int32)
        top_beam_finished = jnp.zeros(B, jnp.bool_)
        batch_active = jnp.ones(B, jnp.bool_)

        plen_off = prefix_len if (has_prefix and not return_prefix) else jnp.zeros(B, jnp.int32)
        last_step_of = max_length + plen_off  # step index that forces finish

        def cond(state):
            step = state[0]
            batch_active = state[-1]
            return (step < max_steps) & jnp.any(batch_active)

        def body(state):
            (step, tokens, cache, chain_st, alive, scores, store_seqs,
             store_lens, store_scores, store_count, top_beam_finished,
             batch_active) = state

            # (With the fresh-token chain attention the current slot stays
            # -1 during the forward; its owner is recorded at selection.)
            fed = token_map[tokens] if has_token_map else tokens
            logits, cache, _ = T.decoder_forward(
                arch, params, consts, fed[:, None], start_pos + step,
                cache, mem_kv, mem_bias,
                beam_size=K,
                quantize_acts=quantize_acts,
                out_dtype=out_dtype,
                beam_chain=chain_st if use_chain else None,
            )
            l = logits[:, -1].astype(jnp.float32)  # [N, V]
            V = l.shape[-1]

            l = proc.disable_tokens(l, sig.suppress_ids)
            if sig.begin_suppress_ids:
                l = jnp.where(jnp.equal(step, 0),
                              proc.disable_tokens(l, sig.begin_suppress_ids), l)
            if sig.end_ids:
                row_min = jnp.repeat(min_steps, K)
                l = proc.disable_tokens_if(l, sig.end_ids, step < row_min)
            if sig.use_alive_seq:
                flat_alive = alive.reshape(N, L)
                if sig.repetition_penalty != 1.0:
                    l = proc.repetition_penalty(
                        l, flat_alive, step, sig.repetition_penalty)
                if sig.no_repeat_ngram_size > 0:
                    l = proc.no_repeat_ngram(
                        l, flat_alive, step, sig.no_repeat_ngram_size)
                if sig.suppress_sequences:
                    l = proc.suppress_sequences_mask(
                        l, flat_alive, step, sig.suppress_sequences)
                if sig.whisper_ts is not None:
                    l = proc.whisper_timestamp_rules(
                        l, flat_alive, step, jnp.repeat(prefix_len, K),
                        *sig.whisper_ts)

            log_probs = jax.nn.log_softmax(l, axis=-1)
            total = log_probs + scores.reshape(N)[:, None]
            flat = total.reshape(B, K * V)
            if sig.greedy_sampler:
                ts, ti = small_top_k(flat, K2)  # [B, 2K]
            else:
                # Random sampling under beam search: 2K Gumbel-max draws
                # without replacement (reference: src/sampling.cc:60-92).
                ts, ti = gumbel_top_k(
                    flat, jax.random.fold_in(key, step), K2,
                    topk=sig.sampling_topk, topp=sig.sampling_topp,
                    temperature=sig.sampling_temperature)
            words = (ti % V).astype(jnp.int32)
            origins = (ti // V).astype(jnp.int32)

            cand_idx = jnp.arange(K2, dtype=jnp.int32)[None, :]

            if has_prefix:
                P = prefix.shape[1]
                forced = (step < prefix_len)[:, None]  # [B, 1]
                ptok = jax.lax.dynamic_slice_in_dim(
                    prefix, jnp.minimum(step, P - 1), 1, axis=1)  # [B,1]
                words = jnp.where(forced, ptok, words)
                ts = jnp.where(forced, jnp.where(cand_idx == 0, 0.0, NEG), ts)
                origins = jnp.where(forced, 0, origins)
                # Penalize EOS in secondary candidates at the first free step
                # (reference: src/decoding.cc:50-57).
                boundary = (step == prefix_len)[:, None]
                eos_k = is_end(words) & (cand_idx > 0) & boundary
                words = jnp.where(eos_k, 0, words)
                ts = jnp.where(eos_k, NEG, ts)

            is_eos_cand = is_end(words)  # [B, 2K]
            past_prefix = (step >= prefix_len)[:, None] if has_prefix else True
            last_step_b = (step + 1) == last_step_of  # [B]

            # ---- harvest finished hypotheses among the first K candidates ----
            finish_k = batch_active[:, None] & (
                (is_eos_cand[:, :K] & past_prefix) | last_step_b[:, None]
            )  # [B, K]
            top_beam_finished = top_beam_finished | finish_k[:, 0]

            start_off = plen_off if not return_prefix else jnp.zeros(B, jnp.int32)

            def insert_one(k, carry):
                store_seqs, store_lens, store_scores, store_count = carry
                w_k = words[:, k]
                o_k = origins[:, k]
                seq = jnp.take_along_axis(
                    alive, o_k[:, None, None], axis=1)[:, 0]  # [B, L]
                seq = jax.lax.dynamic_update_slice(
                    seq, w_k[:, None], (0, step))
                drop_last = is_eos_cand[:, k] & (not include_eos)
                hyp_len = jnp.where(drop_last, step, step + 1)
                # Score normalization counts EOS per count_eos (reference
                # include_eos_in_hypotheses: EOS is in the hypothesis at
                # finalize time and only stripped afterwards).
                score_len = jnp.where(
                    is_eos_cand[:, k] & (not count_eos), step, step + 1)
                norm_len = jnp.maximum(score_len - start_off, 1).astype(jnp.float32)
                norm_score = ts[:, k] / jnp.power(norm_len, length_penalty)

                slot = jnp.argmin(store_scores, axis=1)  # [B]
                cur_min = jnp.take_along_axis(
                    store_scores, slot[:, None], axis=1)[:, 0]
                do = finish_k[:, k] & (norm_score > cur_min)
                new_scores_col = jnp.where(do, norm_score, cur_min)
                store_scores = jnp.where(
                    (jnp.arange(M)[None, :] == slot[:, None]) & do[:, None],
                    new_scores_col[:, None], store_scores)
                store_lens = jnp.where(
                    (jnp.arange(M)[None, :] == slot[:, None]) & do[:, None],
                    hyp_len[:, None], store_lens)
                sel = ((jnp.arange(M)[None, :, None] == slot[:, None, None])
                       & do[:, None, None])
                store_seqs = jnp.where(sel, seq[:, None, :], store_seqs)
                store_count = store_count + finish_k[:, k].astype(jnp.int32)
                return store_seqs, store_lens, store_scores, store_count

            store_seqs, store_lens, store_scores, store_count = jax.lax.fori_loop(
                0, K, insert_one,
                (store_seqs, store_lens, store_scores, store_count))

            # ---- batch finish conditions ----
            if allow_early_exit:
                finished_b = top_beam_finished & (store_count >= num_hyp)
            else:
                finished_b = store_count >= max_candidates
            batch_active = batch_active & jnp.logical_not(
                finished_b | last_step_b)

            # ---- select the next K active beams (non-EOS first, stable) ----
            order = jnp.argsort(is_eos_cand.astype(jnp.int32), axis=1,
                                stable=True)[:, :K]  # [B, K]
            new_words = jnp.take_along_axis(words, order, axis=1)
            new_scores = jnp.take_along_axis(ts, order, axis=1)
            new_origins = jnp.take_along_axis(origins, order, axis=1)

            import os as _os
            if _os.environ.get("CT2TPU_BEAM_REORDER", "gather") == "onehot":
                # Beam reorder as a batched one-hot contraction: one
                # full-bandwidth read+write of the cache on the MXU instead
                # of XLA's gather + staging-copy chain (profiled ~3x the
                # traffic on v5e).
                onehot = jax.nn.one_hot(new_origins, K, dtype=jnp.bfloat16)

                def reorder(a):
                    ar = a.reshape(B, K, -1)
                    if a.dtype == jnp.bfloat16:
                        out = jnp.einsum("bkj,bjm->bkm", onehot, ar)
                    else:
                        out = jnp.einsum(
                            "bkj,bjm->bkm", onehot.astype(jnp.float32),
                            ar.astype(jnp.float32)).astype(a.dtype)
                    return out.reshape(a.shape)

                if T.cache_is_stacked(cache):
                    cache = {k: jnp.moveaxis(
                        reorder(jnp.moveaxis(v, 1, 0)), 0, 1)
                        for k, v in cache.items()}
                else:
                    cache = jax.tree.map(reorder, cache)
            elif use_chain:
                rows = (jnp.arange(B, dtype=jnp.int32)[:, None] * K
                        + new_origins).reshape(N)
                chain_st = chain_st[rows]
                # Record who wrote slot `step`: the origin beam's row.
                chain_st = jax.lax.dynamic_update_slice(
                    chain_st, new_origins.reshape(N, 1).astype(jnp.int32),
                    (0, start_pos + step))
            else:
                rows = (jnp.arange(B, dtype=jnp.int32)[:, None] * K
                        + new_origins).reshape(N)
                cache = T.cache_gather_rows(cache, rows)
            alive = jnp.take_along_axis(
                alive, new_origins[:, :, None], axis=1)
            alive = jax.lax.dynamic_update_slice(
                alive, new_words[:, :, None], (0, 0, step))

            return (step + 1, new_words.reshape(N), cache, chain_st, alive,
                    new_scores, store_seqs, store_lens, store_scores,
                    store_count, top_beam_finished, batch_active)

        state = (jnp.int32(0), start_tokens, cache,
                 chain if chain is not None else jnp.zeros((), jnp.int32),
                 alive, scores, store_seqs, store_lens, store_scores,
                 store_count, top_beam_finished, batch_active)
        state = jax.lax.while_loop(cond, body, state)
        (_, _, _, _, _, _, store_seqs, store_lens, store_scores, store_count,
         _, _) = state
        # Pack everything into ONE int32 buffer so the host needs a single
        # device->host fetch: [B, M, L + 3] = seqs | len | score bits | count.
        packed = jnp.concatenate([
            store_seqs,
            store_lens[:, :, None],
            jax.lax.bitcast_convert_type(store_scores, jnp.int32)[:, :, None],
            jnp.broadcast_to(store_count[:, None, None], (store_seqs.shape[0], M, 1)),
        ], axis=-1)
        return packed

    return jax.jit(loop)


def build_spec_greedy_loop(arch, sig, quantize_acts: bool, out_dtype,
                           max_steps: int, spec_k: int,
                           init_cache: Optional[tuple] = None,
                           has_prefix: bool = True):
    """Whole-generation GREEDY loop with lossless self-speculation.

    Each ``lax.while_loop`` iteration drafts ``spec_k - 1`` tokens by
    on-device prompt lookup (n-gram continuation from the row's own
    emitted context — the same rule the continuous engine uses on the
    host), verifies them in ONE T=spec_k forward with per-row positions,
    and accepts the matched prefix plus one bonus token. Greedy argmax
    makes acceptance exact, so outputs are token-identical to the
    sequential loop; the win is effective matmul M of N*spec_k instead
    of N — the README's identified lever for small-batch MXU
    under-utilization. The reference GPU decode has no such lever
    (one token per step, src/decoding.cc:732-974).

    Rows advance by different amounts per iteration, so the loop carries
    per-row positions (``pos`` [N]) — the verify forward takes the same
    vector-position path the continuous engine exercises. Rejected
    speculative cache writes beyond a row's accepted position are
    masked by the per-row causal bias and overwritten later.

    Forced prefixes (the prompt remainder) are drafted AND forced, which
    turns the prompt phase into spec_k-token chunked prefill.

    Same packed output layout as build_greedy_loop.
    """
    K = spec_k
    end_ids = jnp.asarray(sig.end_ids or (0,), jnp.int32)
    has_end = bool(sig.end_ids)
    assert sig.greedy_sampler, "speculation requires greedy decoding"
    assert not sig.use_alive_seq, \
        "speculation does not support alive-seq logits processors here"

    def is_end(tok):
        if not has_end:
            return jnp.zeros(tok.shape, jnp.bool_)
        return jnp.any(tok[..., None] == end_ids, axis=-1)

    def loop(params, consts, control, start_pos, cache, mem_kv,
             mem_bias, key, token_map=None,
             encoder_ids=None, encoder_lengths=None):
        # control [N, 3 + P]: prefix_len | min_steps | start_token | prefix.
        del key, token_map, encoder_ids, encoder_lengths  # greedy, LM-only
        prefix_len = control[:, 0]
        min_steps = control[:, 1]
        start_tokens = control[:, 2]
        prefix = control[:, 3:]
        N = control.shape[0]
        P = prefix.shape[1] if has_prefix else 0
        L = max_steps
        if init_cache is not None:
            from ..models.transformer import init_self_cache
            arch_, capacity_, dtype_, stacked_ = init_cache
            cache = init_self_cache(arch_, N, capacity_, dtype=dtype_,
                                    stacked=stacked_, ring=True)
            capacity = capacity_
        else:
            # Externally prefilled cache (ring leaves may be smaller than
            # the linear capacity): skip the write clamp — scatters and
            # dynamic_update_slice clip at the buffer edge, and the
            # capacity carries a spec_k margin (engine _common_setup).
            capacity = None

        out_buf = jnp.zeros((N, L), jnp.int32)
        scores = jnp.zeros(N, jnp.float32)
        finished = jnp.zeros(N, jnp.bool_)
        gen = jnp.zeros(N, jnp.int32)  # tokens emitted per row
        pos = jnp.full((N,), start_pos, jnp.int32)

        kk = jnp.arange(K, dtype=jnp.int32)  # chunk offsets

        def draft_tokens(tokens, out_buf, gen):
            """[N, K-1] drafts: prefix tokens during the forced phase,
            else the most recent n-gram continuation of the row's own
            context [start_token | emitted...] (the continuous engine's
            host _draft rule, vectorized on device)."""
            ctx = jnp.concatenate([start_tokens[:, None], out_buf], axis=1)
            n = gen + 1  # valid context length
            b_tok = tokens
            a_tok = jnp.take_along_axis(
                ctx, jnp.maximum(n - 2, 0)[:, None], axis=1)[:, 0]
            j_idx = jnp.arange(ctx.shape[1], dtype=jnp.int32)[None, :]
            prev = jnp.concatenate(
                [jnp.zeros((N, 1), jnp.int32), ctx[:, :-1]], axis=1)
            match = ((j_idx >= 1) & (j_idx <= (n - 2)[:, None])
                     & (ctx == b_tok[:, None]) & (prev == a_tok[:, None])
                     & (n >= 3)[:, None])
            jbest = jnp.max(jnp.where(match, j_idx, -1), axis=1)  # [N]
            found = jbest >= 0
            offs = jnp.arange(1, K, dtype=jnp.int32)[None, :]  # [1, K-1]
            gpos = jbest[:, None] + offs
            valid = found[:, None] & (gpos < n[:, None])
            gathered = jnp.take_along_axis(
                ctx, jnp.clip(gpos, 0, ctx.shape[1] - 1), axis=1)
            drafts = jnp.where(valid, gathered, b_tok[:, None])
            if P > 0:
                # Forced phase: draft the prefix tokens themselves so the
                # whole forced chunk is accepted (chunked prefill).
                dpos = gen[:, None] + offs  # position each draft lands on
                ptok = jnp.take_along_axis(
                    prefix, jnp.clip(dpos, 0, P - 1), axis=1)
                drafts = jnp.where(dpos < prefix_len[:, None], ptok, drafts)
            return drafts

        def cond(state):
            it = state[0]
            finished = state[6]
            return (it < max_steps) & jnp.logical_not(jnp.all(finished))

        def body(state):
            it, tokens, pos, cache, out_buf, scores, finished, gen = state

            drafts = draft_tokens(tokens, out_buf, gen)
            fed = jnp.concatenate([tokens[:, None], drafts], axis=1)  # [N,K]
            # Clamp finished/overflowing rows' writes inside the buffer.
            safe_pos = (jnp.minimum(pos, capacity - K)
                        if capacity is not None else pos)
            logits, cache, _ = T.decoder_forward(
                arch, params, consts, fed, safe_pos, cache, mem_kv,
                mem_bias, beam_size=1, quantize_acts=quantize_acts,
                out_dtype=out_dtype)
            l = logits.astype(jnp.float32)  # [N, K, V]

            gpos = gen[:, None] + kk[None, :]  # [N, K] emit positions
            l = proc.disable_tokens(l, sig.suppress_ids)
            if sig.begin_suppress_ids:
                l = jnp.where(
                    (gpos == 0)[..., None],
                    proc.disable_tokens(l, sig.begin_suppress_ids), l)
            if sig.end_ids:
                l = jnp.where(
                    (gpos < min_steps[:, None])[..., None]
                    & jnp.zeros((l.shape[-1],), jnp.bool_).at[end_ids].set(
                        has_end)[None, None, :],
                    proc.DISABLE, l)

            greedy = jnp.argmax(l, axis=-1).astype(jnp.int32)  # [N, K]
            log_probs = jnp.take_along_axis(
                jax.nn.log_softmax(l, axis=-1), greedy[..., None],
                axis=-1)[..., 0]

            if P > 0:
                forced = gpos < prefix_len[:, None]
                ptok = jnp.take_along_axis(
                    prefix, jnp.clip(gpos, 0, P - 1), axis=1)
                greedy = jnp.where(forced, ptok, greedy)
                log_probs = jnp.where(forced, 0.0, log_probs)
            else:
                forced = jnp.zeros((N, K), jnp.bool_)

            # Accept while each fed draft matched the previous greedy
            # target; stop after EOS or the buffer edge.
            match = fed[:, 1:] == greedy[:, :-1]  # [N, K-1]
            chain_ok = jnp.concatenate(
                [jnp.ones((N, 1), jnp.bool_),
                 jnp.cumprod(match.astype(jnp.int32), axis=1).astype(
                     jnp.bool_)], axis=1)  # [N, K]
            eos = is_end(greedy) & jnp.logical_not(forced)
            eos_before = jnp.concatenate(
                [jnp.zeros((N, 1), jnp.bool_),
                 jnp.cumsum(eos.astype(jnp.int32), axis=1)[:, :-1] > 0],
                axis=1)
            accept = (chain_ok & jnp.logical_not(eos_before)
                      & (gpos < L) & jnp.logical_not(finished[:, None]))
            counts = jnp.sum(accept.astype(jnp.int32), axis=1)  # [N]

            cols = jnp.where(accept, gpos, L)  # out-of-range -> dropped
            rows = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32)[:, None],
                                    (N, K))
            out_buf = out_buf.at[rows, cols].set(greedy, mode="drop")
            scores = scores + jnp.sum(
                jnp.where(accept, log_probs, 0.0), axis=1)

            hit_end = jnp.any(accept & eos, axis=1)
            new_gen = gen + counts
            last_idx = jnp.maximum(counts - 1, 0)
            last_tok = jnp.take_along_axis(
                greedy, last_idx[:, None], axis=1)[:, 0]
            tokens = jnp.where(counts > 0, last_tok, tokens)
            pos = pos + counts
            finished = finished | hit_end | (new_gen >= L)
            return (it + 1, tokens, pos, cache, out_buf, scores, finished,
                    new_gen)

        state = (jnp.int32(0), start_tokens, pos, cache, out_buf, scores,
                 finished, gen)
        state = jax.lax.while_loop(cond, body, state)
        _, _, _, cache, out_buf, scores, _, gen = state
        packed = jnp.concatenate([
            out_buf,
            gen[:, None],
            jax.lax.bitcast_convert_type(scores, jnp.int32)[:, None],
        ], axis=-1)
        return packed

    return jax.jit(loop)


def build_greedy_loop(arch, sig, quantize_acts: bool, out_dtype,
                      max_steps: int, has_token_map: bool = False,
                      init_cache: Optional[tuple] = None,
                      has_prefix: bool = True):
    """Build a jitted whole-generation greedy/sampling loop.

    Returns fn(params, consts, start_tokens [N], start_pos, cache, mem_kv,
    mem_bias, prefix [N, P], prefix_len [N], min_steps [N], key)
    -> (tokens [N, max_steps], num_steps [N], scores [N], final_cache).
    """
    end_ids = jnp.asarray(sig.end_ids or (0,), jnp.int32)
    has_end = bool(sig.end_ids)

    def is_end(tok):
        if not has_end:
            return jnp.zeros(tok.shape, jnp.bool_)
        return jnp.any(tok[:, None] == end_ids[None, :], axis=-1)

    def loop(params, consts, control, start_pos, cache, mem_kv,
             mem_bias, key, token_map=None,
             encoder_ids=None, encoder_lengths=None):
        # control [N, 3 + P]: prefix_len | min_steps | start_token | prefix.
        prefix_len = control[:, 0]
        min_steps = control[:, 1]
        start_tokens = control[:, 2]
        prefix = control[:, 3:]
        N = control.shape[0]
        P = prefix.shape[1] if has_prefix else 0
        if init_cache is not None:
            from ..models.transformer import init_self_cache
            arch_, capacity_, dtype_, stacked_ = init_cache
            # Greedy decodes one token at a time — windowed layers can use
            # O(window) ring buffers (beam chain attention cannot).
            cache = init_self_cache(arch_, N, capacity_, dtype=dtype_,
                                    stacked=stacked_, ring=True)

        if encoder_ids is not None:
            memory = T.encoder_forward(
                arch, params, consts, encoder_ids, encoder_lengths,
                quantize_acts=quantize_acts, out_dtype=out_dtype)
            mem_kv = T.precompute_memory(
                arch, params, memory, quantize_acts=quantize_acts)
            mem_bias = attn_ops.length_mask_bias(
                encoder_lengths, memory.shape[1])

        out_buf = jnp.zeros((N, max_steps), jnp.int32)
        scores = jnp.zeros(N, jnp.float32)
        finished = jnp.zeros(N, jnp.bool_)
        num_steps = jnp.zeros(N, jnp.int32)

        def cond(state):
            step, tokens, cache, out_buf, scores, finished, num_steps = state
            return (step < max_steps) & jnp.logical_not(jnp.all(finished))

        def body(state):
            step, tokens, cache, out_buf, scores, finished, num_steps = state

            fed = token_map[tokens] if has_token_map else tokens
            logits, cache, _ = T.decoder_forward(
                arch, params, consts, fed[:, None], start_pos + step,
                cache, mem_kv, mem_bias,
                beam_size=1,
                quantize_acts=quantize_acts,
                out_dtype=out_dtype,
            )
            l = logits[:, -1].astype(jnp.float32)

            l = proc.disable_tokens(l, sig.suppress_ids)
            if sig.begin_suppress_ids:
                l = jnp.where(jnp.equal(step, 0),
                              proc.disable_tokens(l, sig.begin_suppress_ids), l)
            if sig.end_ids:
                l = proc.disable_tokens_if(l, sig.end_ids, step < min_steps)
            if sig.use_alive_seq:
                if sig.repetition_penalty != 1.0:
                    l = proc.repetition_penalty(
                        l, out_buf, step, sig.repetition_penalty)
                if sig.no_repeat_ngram_size > 0:
                    l = proc.no_repeat_ngram(
                        l, out_buf, step, sig.no_repeat_ngram_size)
                if sig.suppress_sequences:
                    l = proc.suppress_sequences_mask(
                        l, out_buf, step, sig.suppress_sequences)
                if sig.whisper_ts is not None:
                    l = proc.whisper_timestamp_rules(
                        l, out_buf, step, prefix_len, *sig.whisper_ts)

            log_probs = jax.nn.log_softmax(l, axis=-1)
            step_key = jax.random.fold_in(key, step)
            sampled, sampled_scores = sample_tokens(
                log_probs, step_key,
                topk=sig.sampling_topk,
                topp=sig.sampling_topp,
                temperature=sig.sampling_temperature,
                greedy=sig.greedy_sampler,
            )

            if P > 0:
                forced = step < prefix_len
                prefix_tok = jax.lax.dynamic_slice_in_dim(
                    prefix, jnp.minimum(step, P - 1), 1, axis=1)[:, 0]
                new_tok = jnp.where(forced, prefix_tok, sampled)
                step_score = jnp.where(forced, 0.0, sampled_scores)
            else:
                forced = jnp.zeros(N, jnp.bool_)
                new_tok = sampled
                step_score = sampled_scores

            scores = scores + jnp.where(finished, 0.0, step_score)
            out_buf = jnp.where(
                finished[:, None],
                out_buf,
                jax.lax.dynamic_update_slice(
                    out_buf, new_tok[:, None], (0, step)),
            )
            newly_finished = jnp.logical_not(finished) & (
                is_end(new_tok) & jnp.logical_not(forced))
            num_steps = jnp.where(finished, num_steps, step + 1)
            finished = finished | newly_finished
            return (step + 1, new_tok, cache, out_buf, scores, finished,
                    num_steps)

        state = (jnp.int32(0), start_tokens, cache, out_buf, scores,
                 finished, num_steps)
        state = jax.lax.while_loop(cond, body, state)
        _, _, cache, out_buf, scores, finished, num_steps = state
        # Pack [N, max_steps + 2]: tokens | num_steps | score bits.
        packed = jnp.concatenate([
            out_buf,
            num_steps[:, None],
            jax.lax.bitcast_convert_type(scores, jnp.int32)[:, None],
        ], axis=-1)
        return packed

    return jax.jit(loop)
