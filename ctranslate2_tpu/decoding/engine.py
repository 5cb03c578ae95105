"""Beam / greedy decoding engine.

Architecture (TPU-first restructuring of reference: src/decoding.cc:411-974):

- ONE jitted "step" function per (model, options-signature) fuses the decoder
  forward, logits processors, log-softmax, beam-score accumulation and
  top-k/sampling — a single device dispatch per generated token.
- The host loop only does CT2-equivalent candidate bookkeeping on tiny
  [batch, 2*beam] arrays (EOS harvesting, secondary-candidate promotion,
  hard-prefix overrides) and issues one jitted gather to reorder the KV
  cache by beam origin.
- Batches are NEVER shrunk mid-decode (the reference prunes finished rows,
  forcing reallocation: reference src/decoding.cc:683-716); finished rows
  keep running masked instead, so shapes stay static and XLA caches one
  executable per bucket.
"""

from __future__ import annotations

import dataclasses
import math
from dataclasses import dataclass
from functools import partial
from typing import List, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..models import transformer as T
from ..models.loader import LoadedModel
from ..ops import attention as attn_ops
from . import processors as proc
from .options import DecodingOptions, DecodingResult, DecodingStepResult
from .sampling import sample_tokens, small_top_k

NEG = -1e10


@dataclass(frozen=True)
class StepSig:
    """Static signature of a jitted decode step."""

    beam_size: int
    num_candidates: int  # beam: 2*beam ; greedy: 1
    end_ids: Tuple[int, ...]
    suppress_ids: Tuple[int, ...]
    begin_suppress_ids: Tuple[int, ...]
    suppress_sequences: Tuple[Tuple[int, ...], ...]
    repetition_penalty: float
    no_repeat_ngram_size: int
    use_alive_seq: bool
    return_attention: bool
    has_memory: bool
    greedy_sampler: bool  # argmax vs random sampling
    sampling_topk: int
    sampling_topp: float
    sampling_temperature: float
    use_bias_token: bool = False  # prefix-biased decoding
    prefix_bias_beta: float = 0.0
    # Whisper timestamp rules: (eot, no_ts, ts_begin, ts_end, max_initial).
    whisper_ts: tuple = None


def _round_up(x: int, multiple: int) -> int:
    return ((x + multiple - 1) // multiple) * multiple


class DecodingEngine:
    """Owns jitted step functions for one loaded model."""

    def __init__(self, model: LoadedModel):
        import threading

        self.model = model
        self._step_fns = {}
        self._loop_fns = {}
        # Guards the jit caches when worker-pool threads decode
        # concurrently (duplicate trace+compile is correct but wasteful).
        self._fns_lock = threading.Lock()
        self._reorder_fn = jax.jit(self._reorder)
        self._append_fn = jax.jit(self._append)

    # ------------------------------------------------------------------
    # Jitted pieces.
    # ------------------------------------------------------------------

    @staticmethod
    def _reorder(cache, alive_seq, rows, new_tokens, gen_step):
        cache = T.cache_gather_rows(cache, rows)
        if alive_seq is not None:
            alive_seq = alive_seq[rows]
            alive_seq = jax.lax.dynamic_update_slice(
                alive_seq, new_tokens[:, None], (0, gen_step)
            )
        return cache, alive_seq

    @staticmethod
    def _append(alive_seq, new_tokens, gen_step):
        return jax.lax.dynamic_update_slice(alive_seq, new_tokens[:, None], (0, gen_step))

    def _build_step(self, sig: StepSig):
        model = self.model
        arch = model.arch
        quantize_acts = model.policy.quantize_activations
        out_dtype = model.out_dtype

        def step(params, consts, tokens, pos, cache, mem_kv, mem_bias,
                 scores, disable_end, alive_seq, gen_len, bias_tokens, key,
                 sample_begin=None):
            logits, cache, attn = T.decoder_forward(
                arch, params, consts, tokens[:, None], pos, cache,
                mem_kv, mem_bias,
                beam_size=sig.beam_size if sig.has_memory else 1,
                return_attention=sig.return_attention,
                quantize_acts=quantize_acts,
                out_dtype=out_dtype,
            )
            l = logits[:, -1].astype(jnp.float32)  # [N, V]

            # --- logits processors (fused) ---
            l = proc.disable_tokens(l, sig.suppress_ids)
            if sig.begin_suppress_ids:
                l = jnp.where(
                    jnp.equal(gen_len, 0),
                    proc.disable_tokens(l, sig.begin_suppress_ids),
                    l,
                )
            if sig.end_ids:
                l = proc.disable_tokens_if(l, sig.end_ids, disable_end)
            if sig.use_alive_seq:
                if sig.repetition_penalty != 1.0:
                    l = proc.repetition_penalty(
                        l, alive_seq, gen_len, sig.repetition_penalty)
                if sig.no_repeat_ngram_size > 0:
                    l = proc.no_repeat_ngram(
                        l, alive_seq, gen_len, sig.no_repeat_ngram_size)
                if sig.suppress_sequences:
                    l = proc.suppress_sequences_mask(
                        l, alive_seq, gen_len, sig.suppress_sequences)
                if sig.whisper_ts is not None:
                    sb = (sample_begin if sample_begin is not None
                          else jnp.zeros(l.shape[0], jnp.int32))
                    l = proc.whisper_timestamp_rules(
                        l, alive_seq, gen_len, sb, *sig.whisper_ts)

            log_probs = jax.nn.log_softmax(l, axis=-1)

            if sig.use_bias_token:
                # Prefix-biased decoding (reference: src/decoding.cc:256-353):
                # interpolate the distribution toward the prefix token for
                # rows that have not diverged (bias_tokens >= 0, encoding
                # beta in the fractional part is avoided by making beta
                # static in the signature via sampling_temperature slot).
                V = log_probs.shape[-1]
                probs = jnp.exp(log_probs)
                onehot = jax.nn.one_hot(jnp.maximum(bias_tokens, 0), V)
                beta = sig.prefix_bias_beta
                biased = (1.0 - beta) * probs + beta * onehot
                use = (bias_tokens >= 0)[:, None]
                log_probs = jnp.where(use, jnp.log(jnp.maximum(biased, 1e-20)), log_probs)

            if sig.num_candidates > 1:  # beam strategy (incl. beam_size=1 biased)
                total = log_probs + scores[:, None]
                N, V = total.shape
                B = N // sig.beam_size
                flat = total.reshape(B, sig.beam_size * V)
                topk_scores, topk_ids = small_top_k(flat, sig.num_candidates)
                return topk_ids, topk_scores, cache, attn, log_probs, l
            else:
                ids, s = sample_tokens(
                    log_probs, key,
                    topk=sig.sampling_topk,
                    topp=sig.sampling_topp,
                    temperature=sig.sampling_temperature,
                    greedy=sig.greedy_sampler,
                )
                return ids, s, cache, attn, log_probs, l

        return jax.jit(step)

    def _get_step(self, sig: StepSig):
        with self._fns_lock:
            fn = self._step_fns.get(sig)
            if fn is None:
                fn = self._build_step(sig)
                self._step_fns[sig] = fn
            return fn

    # ------------------------------------------------------------------
    # Public entry.
    # ------------------------------------------------------------------

    def decode(
        self,
        start_ids: Sequence[int],
        options: DecodingOptions,
        *,
        memory=None,  # encoder output [B, S, D]
        memory_lengths=None,  # [B] int32
        cache=None,  # pre-filled self cache (generator prompt prefill)
        start_step: int = 0,
        prefix_ids: Optional[Sequence[Optional[Sequence[int]]]] = None,
        end_ids: Sequence[int] = (),
        capacity: Optional[int] = None,
        step_callback=None,
        params=None,
        token_map=None,
        encoder_inputs=None,  # (src_ids [B,S], src_lengths [B]) — fused encode
    ) -> List[DecodingResult]:
        if params is None:
            params = self.model.params
        # Option validation (reference wording, src/decoding.cc:1033-1040).
        if options.min_length > options.max_length:
            raise ValueError("The minimum decoding length is greater than "
                             "the maximum decoding length")
        if options.max_length == 0:
            raise ValueError("The maximum decoding length must be > 0")
        # Prefix-biased decoding always runs the beam strategy, even at
        # beam_size=1 (reference: make_search_strategy,
        # src/decoding.cc:1076-1088).
        if options.beam_size > 1 or (
                options.prefix_bias_beta > 0 and prefix_ids is not None):
            return self._beam_search(
                start_ids, options, memory=memory, memory_lengths=memory_lengths,
                cache=cache, start_step=start_step, prefix_ids=prefix_ids,
                end_ids=end_ids, capacity=capacity, params=params,
                token_map=token_map, encoder_inputs=encoder_inputs)
        return self._greedy_search(
            start_ids, options, memory=memory, memory_lengths=memory_lengths,
            cache=cache, start_step=start_step, prefix_ids=prefix_ids,
            end_ids=end_ids, capacity=capacity, step_callback=step_callback,
            params=params, token_map=token_map, encoder_inputs=encoder_inputs)

    # ------------------------------------------------------------------

    def _common_setup(self, batch_size, beam, options, memory, memory_lengths,
                      cache, start_step, prefix_ids, end_ids, capacity):
        model = self.model
        N = batch_size * beam

        use_hard_prefix = prefix_ids is not None and options.prefix_bias_beta <= 0
        max_prefix = 0
        if prefix_ids is not None:
            max_prefix = max((len(p) if p else 0) for p in prefix_ids)
        max_step = options.max_length + (max_prefix if use_hard_prefix and not options.return_prefix else 0)

        if capacity is None:
            # speculation_k: verify chunks may write up to K-1 slots past a
            # row's final token — keep them inside the buffer.
            capacity = _round_up(
                max(start_step + max_step
                    + getattr(options, "speculation_k", 0), 16), 64)
        model.ensure_consts(capacity)

        mem_kv = None
        mem_bias = None
        if memory is not None:
            mem_kv = T.precompute_memory_jit(
                model.arch, model.params, memory,
                quantize_acts=model.policy.quantize_activations)
            mem_bias = attn_ops.length_mask_bias(memory_lengths, memory.shape[1])

        if cache is None:
            pass  # fast paths initialize the cache inside the jit
        else:
            # Grow/replicate an existing cache to N rows / `capacity` cols
            # (ring-buffer leaves keep their size).
            cache = T.cache_grow(cache, N, capacity, arch=model.arch)

        return N, max_step, capacity, mem_kv, mem_bias, cache, use_hard_prefix

    def _make_sig(self, options: DecodingOptions, beam, num_candidates,
                  end_ids, has_memory, greedy_sampler,
                  use_bias: bool = False) -> StepSig:
        whisper_ts = getattr(options, "whisper_ts", None)
        use_alive = (
            options.repetition_penalty != 1.0
            or options.no_repeat_ngram_size > 0
            or bool(options.suppress_sequences)
            or whisper_ts is not None
        )
        return StepSig(
            beam_size=beam,
            num_candidates=num_candidates,
            end_ids=tuple(end_ids),
            suppress_ids=tuple(options.suppress_tokens),
            begin_suppress_ids=tuple(options.suppress_tokens_begin),
            suppress_sequences=tuple(tuple(s) for s in options.suppress_sequences),
            repetition_penalty=options.repetition_penalty,
            no_repeat_ngram_size=options.no_repeat_ngram_size,
            use_alive_seq=use_alive,
            return_attention=(options.return_attention
                              or options.coverage_penalty != 0),
            has_memory=has_memory,
            greedy_sampler=greedy_sampler,
            sampling_topk=options.sampling_topk,
            sampling_topp=options.sampling_topp,
            sampling_temperature=options.sampling_temperature,
            use_bias_token=use_bias,
            prefix_bias_beta=options.prefix_bias_beta if use_bias else 0.0,
            whisper_ts=whisper_ts,
        )

    @staticmethod
    def _finalize(result: DecodingResult, num_hypotheses, length_penalty,
                  coverage_penalty, return_scores, return_attention,
                  norm_lengths=None):
        """Normalize scores and sort hypotheses
        (reference: src/decoding.cc:176-254). ``norm_lengths`` carries the
        reference's hypothesis length at finalize time, which counts the
        terminating EOS when include_eos_in_hypotheses (the default) even
        though our hypotheses are already stripped per return_end_token."""
        for i in range(len(result.scores)):
            length = max(norm_lengths[i] if norm_lengths
                         else len(result.hypotheses[i]), 1)
            score = result.scores[i] / math.pow(length, length_penalty)
            if coverage_penalty != 0 and result.attention:
                attn = np.asarray(result.attention[i])  # [T, S]
                coverage = attn.sum(axis=0)
                penalty = np.log(np.minimum(coverage[coverage > 0], 1.0)).sum()
                score += coverage_penalty * penalty
            result.scores[i] = score
        order = sorted(range(len(result.scores)),
                       key=lambda i: -result.scores[i])[:num_hypotheses]
        result.hypotheses = [result.hypotheses[i] for i in order]
        result.scores = [result.scores[i] for i in order] if return_scores else []
        result.attention = (
            [result.attention[i] for i in order]
            if return_attention and result.attention else []
        )
        result.logits = (
            [result.logits[i] for i in order if i < len(result.logits)]
            if result.logits else []
        )
        return result

    # ------------------------------------------------------------------
    # Beam search.
    # ------------------------------------------------------------------

    def _beam_search(self, start_ids, options, *, memory, memory_lengths,
                     cache, start_step, prefix_ids, end_ids, capacity,
                     params=None, token_map=None, encoder_inputs=None):
        if params is None:
            params = self.model.params
        model = self.model
        B = len(start_ids)
        K = options.beam_size
        K2 = K * 2
        num_hyp = options.num_hypotheses
        max_candidates = max(1, round(K * options.patience))
        has_memory = memory is not None or encoder_inputs is not None

        N, max_step, capacity, mem_kv, mem_bias, cache, use_hard_prefix = (
            self._common_setup(B, K, options, memory, memory_lengths, cache,
                               start_step, prefix_ids, end_ids, capacity))

        # Prefix-biased decoding (reference: src/decoding.cc:476-483): the
        # prefix is not hard-forced; the softmax is interpolated toward it
        # until a beam diverges.
        use_bias = (prefix_ids is not None
                    and any(p for p in prefix_ids)
                    and options.prefix_bias_beta > 0)
        sig = self._make_sig(options, K, K2, end_ids, has_memory, True,
                             use_bias=use_bias)

        # Fast path: whole-generation on-device beam loop.
        if (not sig.return_attention and options.coverage_penalty == 0
                and not options.return_logits_vocab and not use_bias):
            return self._beam_device_loop(
                start_ids, options, sig, end_ids, mem_kv, mem_bias, cache,
                start_step, prefix_ids if use_hard_prefix else None,
                max_step, num_hyp, max_candidates, params, token_map,
                encoder_inputs)

        if encoder_inputs is not None and mem_kv is None:
            memory = T.encoder_forward_jit(
                self.model.arch, params, self.model.consts,
                encoder_inputs[0], encoder_inputs[1],
                quantize_acts=self.model.policy.quantize_activations,
                out_dtype=self.model.out_dtype)
            mem_kv = T.precompute_memory_jit(
                self.model.arch, params, memory,
                quantize_acts=self.model.policy.quantize_activations)
            mem_bias = attn_ops.length_mask_bias(
                encoder_inputs[1], memory.shape[1])
        if cache is None:
            cache = T.init_self_cache(
                self.model.arch, N, capacity, dtype=self.model.kv_dtype,
                stacked=self.model.scan_layers)

        step_fn = self._get_step(sig)

        V = None
        alive_seq = (
            jnp.zeros((N, max_step), jnp.int32) if sig.use_alive_seq else None
        )

        tokens = np.repeat(np.asarray(start_ids, np.int32), K)
        scores = np.zeros(N, np.float32)
        scores[np.arange(N) % K != 0] = NEG  # only beam 0 active at step 0

        history = np.zeros((N, 0), np.int64)
        attn_history: List[List[np.ndarray]] = [[] for _ in range(N)]
        results = [DecodingResult() for _ in range(B)]
        norm_lengths: List[List[int]] = [[] for _ in range(B)]
        top_beam_finished = [False] * B
        batch_active = [True] * B
        allow_early_exit = (options.length_penalty == 0
                            and options.coverage_penalty == 0)
        end_set = set(end_ids)
        key = jax.random.PRNGKey(options.seed)

        prefix_lengths = [0] * B
        if use_hard_prefix and prefix_ids is not None:
            prefix_lengths = [len(p) if p else 0 for p in prefix_ids]

        # Divergence tracking for prefix-biased decoding, indexed by beam
        # SLOT as the reference does (src/decoding.cc:326-345).
        bias_prefix = None
        diverged = None
        if use_bias:
            bias_prefix = [list(p) if p else [] for p in prefix_ids]
            diverged = np.zeros((B, K), bool)

        def is_last_step(step, prefix_length):
            return step + 1 == options.max_length + (
                0 if options.return_prefix else prefix_length)

        for step in range(max_step):
            disable_end_np = np.zeros(N, bool)
            for i in range(B):
                plen_min = prefix_lengths[i] if not options.return_prefix else 0
                if step < plen_min + options.min_length:
                    disable_end_np[i * K:(i + 1) * K] = True

            gen_len = jnp.int32(step)
            fed = tokens if token_map is None else np.asarray(token_map)[tokens]
            bias_tokens_arr = None
            if use_bias:
                bt = np.full(N, -1, np.int32)
                for i in range(B):
                    p = bias_prefix[i]
                    if step < len(p):
                        for k in range(K):
                            if not diverged[i, k]:
                                bt[i * K + k] = p[step]
                bias_tokens_arr = jnp.asarray(bt)
            topk_ids_d, topk_scores_d, cache, attn_d, _, l_d = step_fn(
                params, model.consts, jnp.asarray(fed),
                jnp.int32(start_step + step), cache, mem_kv, mem_bias,
                jnp.asarray(scores), jnp.asarray(disable_end_np),
                alive_seq, gen_len, bias_tokens_arr, key)

            topk_flat = np.array(topk_ids_d)      # [B, 2K] flat beam*V ids
            topk_scores = np.array(topk_scores_d, np.float32)  # [B, 2K]
            if V is None:
                V = (params["decoder"]["projection"].get(
                        "w", params["decoder"]["projection"].get("wq"))
                     ).shape[-1]
            words = topk_flat % V
            origins = topk_flat // V  # beam index within batch

            attn_step = None
            if attn_d is not None:
                attn_step = np.asarray(attn_d, np.float32)  # [N, 1, S]
            logits_step = (np.asarray(l_d, np.float32)
                           if options.return_logits_vocab else None)

            # Hard prefix override (reference: src/decoding.cc:21-67).
            if use_hard_prefix:
                for i in range(B):
                    plen = prefix_lengths[i]
                    if step > plen or not batch_active[i]:
                        continue
                    for k in range(K2):
                        if step < plen:
                            words[i, k] = prefix_ids[i][step]
                            topk_scores[i, k] = 0.0 if k == 0 else NEG
                            origins[i, k] = 0
                        elif k > 0 and words[i, k] in end_set:
                            words[i, k] = 0
                            topk_scores[i, k] = NEG

            # --- candidate bookkeeping (exact CT2 semantics) ---
            new_rows = np.arange(N, dtype=np.int32)
            new_tokens = np.zeros(N, np.int32)
            new_scores = np.full(N, NEG, np.float32)
            any_active = False

            for i in range(B):
                if not batch_active[i]:
                    continue
                plen = prefix_lengths[i]
                last_step = is_last_step(step, plen)
                result = results[i]
                secondary = K

                for k in range(K):
                    word = int(words[i, k])
                    next_j = k
                    if (word in end_set and step >= plen) or last_step:
                        if k == 0:
                            top_beam_finished[i] = True
                        ignore_last = word in end_set and not options.return_end_token
                        start = 0 if options.return_prefix else plen
                        end = step if ignore_last else step + 1
                        # Score normalization counts EOS per
                        # include_eos_in_hypotheses (reference strips EOS
                        # only after finalize, sequence_to_sequence.cc:383).
                        norm_end = (step if (word in end_set and
                                             not options.include_eos_in_hypotheses)
                                    else step + 1)
                        row = i * K + int(origins[i, k])
                        full = list(history[row]) + [word]
                        result.scores.append(float(topk_scores[i, k]))
                        norm_lengths[i].append(max(norm_end - start, 1))
                        result.hypotheses.append(full[start:end])
                        if attn_step is not None:
                            full_attn = attn_history[row] + [attn_step[row, 0]]
                            result.attention.append(
                                [a.tolist() for a in full_attn[start:end]])
                        if logits_step is not None:
                            # Reference beam search keeps only the step that
                            # finished the hypothesis
                            # (src/decoding.cc:633-635).
                            result.logits.append([logits_step[row].copy()])
                        # Promote a secondary candidate.
                        for j in range(secondary, K2):
                            if int(words[i, j]) not in end_set:
                                next_j = j
                                secondary = j + 1
                                break

                    slot = i * K + k
                    new_rows[slot] = i * K + int(origins[i, next_j])
                    new_tokens[slot] = int(words[i, next_j])
                    new_scores[slot] = float(topk_scores[i, next_j])

                if last_step:
                    finished = True
                elif allow_early_exit:
                    finished = top_beam_finished[i] and len(result.hypotheses) >= num_hyp
                else:
                    finished = len(result.hypotheses) >= max_candidates

                if finished:
                    batch_active[i] = False
                    self._finalize(result, num_hyp, options.length_penalty,
                                   options.coverage_penalty,
                                   options.return_scores,
                                   options.return_attention,
                                   norm_lengths=norm_lengths[i])
                else:
                    any_active = True

            # Divergence update from the SELECTED beam tokens (reference:
            # get_beams_divergence_from_prefix, src/decoding.cc:326-345).
            if use_bias:
                for i in range(B):
                    p = bias_prefix[i]
                    for k in range(K):
                        diverged[i, k] = (
                            step >= len(p) or diverged[i, k]
                            or int(new_tokens[i * K + k]) != p[step])

            if not any_active:
                break

            # Reorder device state and append tokens.
            rows_d = jnp.asarray(new_rows)
            cache, alive_seq = self._reorder_fn(
                cache, alive_seq, rows_d, jnp.asarray(new_tokens), gen_len)

            history = np.concatenate(
                [history[new_rows], new_tokens[:, None].astype(np.int64)], axis=1)
            if attn_step is not None:
                attn_history = [
                    attn_history[r] + [attn_step[r, 0]] for r in new_rows
                ]

            tokens = new_tokens
            scores = new_scores

        # Any batch that never finished (shouldn't happen) finalizes here.
        for i in range(B):
            if batch_active[i]:
                self._finalize(results[i], num_hyp, options.length_penalty,
                               options.coverage_penalty, options.return_scores,
                               options.return_attention,
                               norm_lengths=norm_lengths[i])
        return results

    # ------------------------------------------------------------------
    # Alternatives at the first unconstrained position
    # (reference: src/decoding.cc:1122-1293).
    # ------------------------------------------------------------------

    def decode_alternatives(
        self,
        start_tokens: Sequence[int],  # [start] + prefix for ONE example
        options: DecodingOptions,
        *,
        memory=None,
        memory_lengths=None,
        start_step: int = 0,
        end_ids: Sequence[int] = (),
        cache=None,  # optional pre-filled 1-row cache
        params=None,
        token_map=None,
    ) -> DecodingResult:
        model = self.model
        if params is None:
            params = model.params

        def to_orig(ids_list):
            if token_map is None:
                return ids_list
            tm = np.asarray(token_map)
            return [int(tm[t]) for t in ids_list]
        num_hyp = options.num_hypotheses
        result = DecodingResult()

        start_tokens = list(start_tokens)
        if not start_tokens:
            raise ValueError("One input has no decoder start token")
        if len(start_tokens) > options.max_length + 1:
            start_tokens = start_tokens[: options.max_length + 1]
        prefix_length = len(start_tokens) - 1

        capacity = _round_up(start_step + options.max_length + 8, 64)
        model.ensure_consts(capacity)

        mem_kv = None
        mem_bias = None
        if memory is not None:
            mem_kv = T.precompute_memory_jit(
                model.arch, model.params, memory,
                quantize_acts=model.policy.quantize_activations)
            mem_bias = attn_ops.length_mask_bias(
                memory_lengths, memory.shape[1])

        built_fresh = cache is None and start_step == 0
        if cache is None:
            cache = T.init_self_cache(model.arch, 1, capacity,
                                      dtype=model.kv_dtype,
                                      stacked=model.scan_layers)
        else:
            rows = (cache["k"] if T.cache_is_stacked(cache)
                    else cache[0]["k"]).shape[
                        1 if T.cache_is_stacked(cache) else 0]
            cache = T.cache_grow(cache, rows, capacity, arch=model.arch)

        pos = start_step
        if prefix_length > 0:
            ids = jnp.asarray([to_orig(start_tokens[:-1])], dtype=jnp.int32)
            _, cache, _ = T.decoder_forward_jit(
                model.arch, params, model.consts, ids, jnp.int32(pos),
                cache, mem_kv, mem_bias,
                quantize_acts=model.policy.quantize_activations,
                out_dtype=model.out_dtype, return_logits=False,
                fresh_prefill=built_fresh)
            pos += prefix_length
            for _ in range(num_hyp):
                result.hypotheses.append(list(start_tokens[1:]))
                if options.return_scores:
                    result.scores.append(0.0)
            if prefix_length == options.max_length:
                return result
        else:
            for _ in range(num_hyp):
                result.hypotheses.append([])
                if options.return_scores:
                    result.scores.append(0.0)
        if not result.scores:
            result.scores = [0.0] * num_hyp

        # One-step expansion: top num_hyp next tokens.
        sig = self._make_sig(options, 1, 1, end_ids, memory is not None, True)
        step_fn = self._get_step(
            dataclasses.replace(sig, beam_size=1, greedy_sampler=True))
        tok = jnp.asarray(to_orig([start_tokens[-1]]), dtype=jnp.int32)
        disable_end = np.asarray(
            [pos - start_step < options.min_length])
        _, _, cache, _, log_probs, _ = step_fn(
            params, model.consts, tok, jnp.int32(pos), cache,
            mem_kv, mem_bias, jnp.zeros(1, jnp.float32),
            jnp.asarray(disable_end), None, jnp.int32(0), None,
            jax.random.PRNGKey(options.seed))
        lp = np.asarray(log_probs[0], np.float32)
        top = np.argsort(-lp)[:num_hyp]

        expanded = []
        for j, w in enumerate(top):
            prob = float(np.exp(lp[w]))
            if prob < options.min_alternative_expansion_prob:
                break
            result.hypotheses[j].append(int(w))
            if options.return_scores:
                result.scores[j] = float(lp[w])
            expanded.append(int(w))

        num_alt = len(expanded)
        result.hypotheses = result.hypotheses[:num_alt]
        result.scores = result.scores[:num_alt]
        pos += 1
        if pos - start_step >= options.max_length or num_alt == 0:
            return result

        # Continue each alternative independently.
        cache = T.cache_repeat_rows(cache, num_alt)
        mem_rep = jnp.repeat(memory, num_alt, axis=0) if memory is not None else None
        lens_rep = (jnp.repeat(memory_lengths, num_alt, axis=0)
                    if memory_lengths is not None else None)

        cont_options = dataclasses.replace(
            options,
            num_hypotheses=1,
            max_length=max(options.max_length - (pos - start_step), 1),
            min_length=max(options.min_length - (pos - start_step), 0),
            return_scores=True,
            return_prefix=True,
        )
        suffix_results = self.decode(
            expanded, cont_options,
            memory=mem_rep, memory_lengths=lens_rep,
            cache=cache, start_step=pos, end_ids=end_ids,
            capacity=capacity, params=params, token_map=token_map)

        for j, suffix in enumerate(suffix_results):
            if options.return_scores and suffix.scores:
                # The reference adds the (normalized) suffix score directly
                # (reference: src/decoding.cc:1270-1273).
                result.scores[j] += suffix.scores[0]
            result.hypotheses[j].extend(suffix.hypotheses[0])

        if not options.return_scores:
            result.scores = []
        return result

    # ------------------------------------------------------------------
    # On-device whole-generation loops (fast paths).
    # ------------------------------------------------------------------

    def _beam_device_loop(self, start_ids, options, sig, end_ids,
                          mem_kv, mem_bias, cache, start_step, prefix_ids,
                          max_step, num_hyp, max_candidates, params=None,
                          token_map=None, encoder_inputs=None):
        if params is None:
            params = self.model.params
        from .device_loop import build_beam_loop

        model = self.model
        B = len(start_ids)
        K = options.beam_size
        has_prefix = prefix_ids is not None

        prefix_lengths = [0] * B
        P = 1
        prefix_arr = np.zeros((B, 1), np.int32)
        if has_prefix:
            prefix_lengths = [len(p) if p else 0 for p in prefix_ids]
            P = _round_up(max(max(prefix_lengths), 1), 8)
            prefix_arr = np.zeros((B, P), np.int32)
            for i, p in enumerate(prefix_ids):
                if p:
                    prefix_arr[i, : len(p)] = p

        min_steps = np.asarray(
            [(prefix_lengths[i] if not options.return_prefix else 0)
             + options.min_length for i in range(B)], np.int32)

        allow_early_exit = (options.length_penalty == 0
                            and options.coverage_penalty == 0)

        # Capacity of a fresh in-jit cache (None when a prefilled cache is
        # passed in, e.g. generator prompt prefill).
        capacity = None
        if cache is None:
            capacity = _round_up(max(start_step + max_step, 16), 64)

        key = (sig, max_step, P, num_hyp, max_candidates,
               options.length_penalty, options.return_prefix,
               options.return_end_token, options.include_eos_in_hypotheses,
               options.max_length,
               allow_early_exit, token_map is not None,
               encoder_inputs is not None, capacity)
        with self._fns_lock:
            loop_fn = self._loop_fns.get(key)
        if loop_fn is None:
            loop_fn = build_beam_loop(
                model.arch, sig, model.policy.quantize_activations,
                model.out_dtype, max_step,
                beam_size=K, num_hyp=num_hyp, max_candidates=max_candidates,
                length_penalty=options.length_penalty,
                return_prefix=options.return_prefix,
                include_eos=options.return_end_token,
                count_eos=options.include_eos_in_hypotheses,
                max_length=options.max_length,
                allow_early_exit=allow_early_exit,
                has_prefix=has_prefix,
                has_memory=sig.has_memory,
                has_token_map=token_map is not None,
                init_cache=(model.arch, capacity, model.kv_dtype,
                            model.scan_layers)
                if capacity is not None else None)
            with self._fns_lock:
                self._loop_fns[key] = loop_fn

        # Single packed control upload: prefix_len | min_steps | pad |
        # start tokens (K) | prefix rows.
        control = np.zeros((B, 3 + K + prefix_arr.shape[1]), np.int32)
        control[:, 0] = prefix_lengths
        control[:, 1] = min_steps
        control[:, 3:3 + K] = np.repeat(
            np.asarray(start_ids, np.int32)[:, None], K, axis=1)
        control[:, 3 + K:] = prefix_arr
        packed = loop_fn(
            params, model.consts, jnp.asarray(control),
            jnp.int32(start_step), cache, mem_kv, mem_bias,
            jax.random.PRNGKey(options.seed),
            token_map=token_map,
            encoder_ids=encoder_inputs[0] if encoder_inputs else None,
            encoder_lengths=encoder_inputs[1] if encoder_inputs else None)

        packed = np.asarray(packed)  # single device->host fetch
        seqs = packed[:, :, :-3]
        lens = packed[:, :, -3]
        scores = packed[:, :, -2].view(np.float32)
        counts = packed[:, 0, -1]

        results = []
        for i in range(B):
            r = DecodingResult()
            order = np.argsort(-scores[i])
            start = 0 if options.return_prefix else prefix_lengths[i]
            for j in order:
                if not np.isfinite(scores[i, j]):
                    continue
                r.hypotheses.append(
                    [int(t) for t in seqs[i, j, start:lens[i, j]]])
                r.scores.append(float(scores[i, j]))
            r.hypotheses = r.hypotheses[:num_hyp]
            r.scores = r.scores[:num_hyp] if options.return_scores else []
            results.append(r)
        return results

    def _greedy_device_loop(self, start_ids, options, sig, end_ids,
                            mem_kv, mem_bias, cache, start_step, prefix_ids,
                            max_step, B0, replicas, params=None,
                            token_map=None, encoder_inputs=None):
        if params is None:
            params = self.model.params
        from .device_loop import build_greedy_loop

        model = self.model
        B = len(start_ids)
        end_set = set(end_ids)

        prefix_lengths = [0] * B
        P = 0
        if prefix_ids is not None:
            prefix_lengths = [len(p) if p else 0 for p in prefix_ids]
            P = _round_up(max(max(prefix_lengths), 1), 8)
        prefix_arr = np.zeros((B, max(P, 1)), np.int32)
        if prefix_ids is not None:
            for i, p in enumerate(prefix_ids):
                if p:
                    prefix_arr[i, : len(p)] = p

        min_steps = np.asarray(
            [(prefix_lengths[i] if not options.return_prefix else 0)
             + options.min_length for i in range(B)], np.int32)
        # Per-row max length: prefix + max_length when the prefix is not
        # included in the output budget.
        # (The loop bound is the global max_step; per-row overshoot is
        # trimmed on the host below.)

        spec_k = getattr(options, "speculation_k", 0)
        capacity = None
        if cache is None:
            # speculation: verify chunks may write spec_k-1 slots past a
            # row's final token.
            capacity = _round_up(
                max(start_step + max_step + (spec_k if spec_k > 1 else 0),
                    16), 64)

        # Lossless self-speculation (prompt-lookup drafts verified in
        # T=spec_k chunks): greedy decoder-only runs with no alive-seq
        # logits processors (validated by the Generator API).
        use_spec = (spec_k > 1 and sig.greedy_sampler
                    and not sig.use_alive_seq
                    and token_map is None and mem_kv is None
                    and encoder_inputs is None)

        key = (sig, max_step, P > 0, token_map is not None,
               encoder_inputs is not None, capacity,
               spec_k if use_spec else 0)
        with self._fns_lock:
            loop_fn = self._loop_fns.get(key)
        if loop_fn is None:
            if use_spec:
                from .device_loop import build_spec_greedy_loop

                loop_fn = build_spec_greedy_loop(
                    model.arch, sig, model.policy.quantize_activations,
                    model.out_dtype, max_step, spec_k,
                    init_cache=(model.arch, capacity, model.kv_dtype,
                                model.scan_layers)
                    if capacity is not None else None,
                    has_prefix=P > 0)
            else:
                loop_fn = build_greedy_loop(
                    model.arch, sig, model.policy.quantize_activations,
                    model.out_dtype, max_step,
                    has_token_map=token_map is not None,
                    init_cache=(model.arch, capacity, model.kv_dtype,
                                model.scan_layers)
                    if capacity is not None else None,
                    has_prefix=P > 0)
            with self._fns_lock:
                self._loop_fns[key] = loop_fn

        control = np.zeros((B, 3 + max(prefix_arr.shape[1], 1)), np.int32)
        control[:, 0] = prefix_lengths
        control[:, 1] = min_steps
        control[:, 2] = np.asarray(start_ids, np.int32)
        control[:, 3:3 + prefix_arr.shape[1]] = prefix_arr
        packed = loop_fn(
            params, model.consts, jnp.asarray(control),
            jnp.int32(start_step),
            cache, mem_kv, mem_bias,
            jax.random.PRNGKey(options.seed),
            token_map=token_map,
            encoder_ids=encoder_inputs[0] if encoder_inputs else None,
            encoder_lengths=encoder_inputs[1] if encoder_inputs else None)

        packed = np.asarray(packed)  # single device->host fetch
        buf = packed[:, :-2]
        num_steps = packed[:, -2]
        scores_np = packed[:, -1].view(np.float32)

        results = [DecodingResult() for _ in range(B)]
        for i in range(B):
            plen = prefix_lengths[i]
            limit = options.max_length + (0 if options.return_prefix else plen)
            n = min(int(num_steps[i]), limit)
            tokens = list(buf[i, :n])
            ended_eos = bool(tokens) and tokens[-1] in end_set
            # Normalization length counts EOS per include_eos_in_hypotheses
            # (reference strips EOS only after finalize).
            norm_len = n - (0 if options.return_prefix else plen)
            if ended_eos and not options.include_eos_in_hypotheses:
                norm_len -= 1
            if ended_eos and not options.return_end_token:
                tokens = tokens[:-1]
            if not options.return_prefix:
                tokens = tokens[plen:]
            r = results[i]
            r.hypotheses.append([int(t) for t in tokens])
            r.scores.append(float(scores_np[i]))
            self._finalize(r, 1, options.length_penalty, 0.0, True, False,
                           norm_lengths=[max(norm_len, 1)])

        if replicas > 1:
            merged = [DecodingResult() for _ in range(B0)]
            for i, r in enumerate(results):
                m = merged[i // replicas]
                m.hypotheses.append(r.hypotheses[0])
                m.scores.append(r.scores[0])
            for m in merged:
                order = sorted(range(len(m.scores)), key=lambda i: -m.scores[i])
                m.hypotheses = [m.hypotheses[i] for i in order]
                m.scores = [m.scores[i] for i in order] if options.return_scores else []
            return merged

        if not options.return_scores:
            for r in results:
                r.scores = []
        return results

    # ------------------------------------------------------------------
    # Greedy / sampling search.
    # ------------------------------------------------------------------

    def _greedy_search(self, start_ids, options, *, memory, memory_lengths,
                       cache, start_step, prefix_ids, end_ids, capacity,
                       step_callback=None, params=None, token_map=None,
                       encoder_inputs=None):
        if params is None:
            params = self.model.params
        model = self.model
        num_hyp = options.num_hypotheses
        is_random = not (options.sampling_topk == 1 and options.sampling_topp >= 1.0)

        # Multiple hypotheses via batch replication
        # (reference: src/decoding.cc:753-814).
        replicas = num_hyp if (num_hyp > 1 and is_random) else 1
        B0 = len(start_ids)
        if replicas > 1:
            start_ids = [s for s in start_ids for _ in range(replicas)]
            if prefix_ids is not None:
                prefix_ids = [p for p in prefix_ids for _ in range(replicas)]
            if memory is not None:
                memory = jnp.repeat(memory, replicas, axis=0)
                memory_lengths = jnp.repeat(memory_lengths, replicas, axis=0)

        B = len(start_ids)
        has_memory = memory is not None or encoder_inputs is not None

        N, max_step, capacity, mem_kv, mem_bias, cache, use_hard_prefix = (
            self._common_setup(B, 1, options, memory, memory_lengths, cache,
                               start_step, prefix_ids, end_ids, capacity))

        sig = self._make_sig(options, 1, 1, end_ids, has_memory,
                             greedy_sampler=not is_random)

        # Fast path: whole-generation on-device loop (one dispatch) when no
        # per-step host interaction is needed.
        if (step_callback is None and not sig.return_attention
                and options.coverage_penalty == 0
                and not options.return_logits_vocab):
            return self._greedy_device_loop(
                start_ids, options, sig, end_ids, mem_kv, mem_bias, cache,
                start_step, prefix_ids, max_step, B0, replicas, params,
                token_map, encoder_inputs)

        if encoder_inputs is not None and mem_kv is None:
            memory = T.encoder_forward_jit(
                self.model.arch, params, self.model.consts,
                encoder_inputs[0], encoder_inputs[1],
                quantize_acts=self.model.policy.quantize_activations,
                out_dtype=self.model.out_dtype)
            mem_kv = T.precompute_memory_jit(
                self.model.arch, params, memory,
                quantize_acts=self.model.policy.quantize_activations)
            mem_bias = attn_ops.length_mask_bias(
                encoder_inputs[1], memory.shape[1])
        if cache is None:
            cache = T.init_self_cache(
                self.model.arch, N, capacity, dtype=self.model.kv_dtype,
                stacked=self.model.scan_layers, ring=True)

        step_fn = self._get_step(sig)

        alive_seq = (
            jnp.zeros((N, max_step), jnp.int32) if sig.use_alive_seq else None
        )

        tokens = np.asarray(start_ids, np.int32)
        results = [DecodingResult() for _ in range(B)]
        for r in results:
            r.hypotheses.append([])
            r.scores.append(0.0)
            r.attention.append([])
        active = np.ones(B, bool)
        norm_counts = [0] * B  # reference hypothesis length at finalize
        end_set = set(end_ids)
        key = jax.random.PRNGKey(options.seed)

        prefix_lengths = [0] * B
        if prefix_ids is not None:
            prefix_lengths = [len(p) if p else 0 for p in prefix_ids]

        def is_last_step(step, prefix_length):
            return step + 1 == options.max_length + (
                0 if options.return_prefix else prefix_length)

        for step in range(max_step):
            disable_end_np = np.asarray(
                [step < (prefix_lengths[i] if not options.return_prefix else 0)
                 + options.min_length for i in range(B)])

            key, subkey = jax.random.split(key)
            fed = tokens if token_map is None else np.asarray(token_map)[tokens]
            ids_d, scores_d, cache, attn_d, _, l_d = step_fn(
                params, model.consts, jnp.asarray(fed),
                jnp.int32(start_step + step), cache, mem_kv, mem_bias,
                jnp.zeros(N, jnp.float32), jnp.asarray(disable_end_np),
                alive_seq, jnp.int32(step), None, subkey)

            ids = np.array(ids_d, np.int32)
            step_scores = np.array(scores_d, np.float32)
            attn_step = np.asarray(attn_d, np.float32) if attn_d is not None else None
            logits_step = (np.asarray(l_d, np.float32)
                           if options.return_logits_vocab else None)

            # Hard prefix forcing.
            if prefix_ids is not None:
                for i in range(B):
                    if step < prefix_lengths[i]:
                        ids[i] = prefix_ids[i][step]
                        step_scores[i] = 0.0

            all_done = True
            for i in range(B):
                if not active[i]:
                    continue
                word = int(ids[i])
                plen = prefix_lengths[i]
                result = results[i]
                if logits_step is not None:
                    # Greedy search stores every decoded step's vocab logits
                    # (reference: src/decoding.cc:905-908).
                    if not result.logits:
                        result.logits.append([])
                    result.logits[0].append(logits_step[i].copy())
                if options.return_prefix or step >= plen:
                    if word not in end_set or options.return_end_token:
                        result.hypotheses[0].append(word)
                        if attn_step is not None:
                            result.attention[0].append(attn_step[i, 0].tolist())
                    if word not in end_set or options.include_eos_in_hypotheses:
                        norm_counts[i] += 1
                result.scores[0] += float(step_scores[i])

                finished = ((word in end_set and step >= plen)
                            or is_last_step(step, plen))

                if step_callback is not None and (options.return_prefix or step >= plen):
                    sr = DecodingStepResult(
                        step=step,
                        batch_id=i // replicas,
                        token_id=word,
                        hypothesis_id=i % replicas,
                        score=float(step_scores[i]) if options.return_scores else None,
                        is_last=finished,
                        log_probs=(logits_step[i].copy()
                                   if logits_step is not None else None),
                    )
                    if step_callback(sr):
                        finished = True

                if finished:
                    active[i] = False
                    self._finalize(result, 1, options.length_penalty,
                                   options.coverage_penalty,
                                   True,
                                   options.return_attention,
                                   norm_lengths=[max(norm_counts[i], 1)])
                else:
                    all_done = False
                    tokens[i] = word

            if all_done:
                break

            if alive_seq is not None:
                alive_seq = self._append_fn(alive_seq, jnp.asarray(ids), jnp.int32(step))

        # Merge replicas into single results.
        if replicas > 1:
            merged = [DecodingResult() for _ in range(B0)]
            for i, r in enumerate(results):
                m = merged[i // replicas]
                m.hypotheses.append(r.hypotheses[0])
                m.scores.append(r.scores[0])
                if options.return_attention:
                    m.attention.append(r.attention[0])
                if options.return_logits_vocab and r.logits:
                    m.logits.append(r.logits[0])
            for m in merged:
                order = sorted(range(len(m.scores)), key=lambda i: -m.scores[i])
                m.hypotheses = [m.hypotheses[i] for i in order]
                m.scores = [m.scores[i] for i in order] if options.return_scores else []
                m.attention = ([m.attention[i] for i in order]
                               if options.return_attention else [])
                m.logits = ([m.logits[i] for i in order] if m.logits else [])
            return merged

        if not options.return_scores:
            for r in results:
                r.scores = []
        if not options.return_attention:
            for r in results:
                r.attention = []
        return results
