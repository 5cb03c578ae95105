"""Generator: the decoder-only LM task API
(parity with reference: include/ctranslate2/generator.h:10-39,
src/models/language_model.cc:105-300).
"""

from __future__ import annotations

import time
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..decoding.engine import DecodingEngine, _round_up
from ..decoding.options import DecodingOptions
from ..models import transformer as T
from ..models.loader import LoadedModel, load_model, resolve_device
from .batching import pad_batch, rebatch_input
from .base import TaskAPIMixin
from .pool import WorkerPool, resolve_max_queued_batches
from .results import (
    AsyncResult,
    GenerationResult,
    GenerationStepResult,
    ScoringResult,
)


class Generator(TaskAPIMixin):
    def __init__(
        self,
        model_path: str,
        device: str = "auto",
        compute_type: str = "default",
        device_index=0,
        inter_threads: int = 1,
        intra_threads: int = 0,
        max_queued_batches: int = 0,
        **kwargs,
    ):
        # tensor_parallel loads head-aligned (unfused) QKV shards
        # (reference ctor flag: include/ctranslate2/replica_pool.h).
        jax_device = resolve_device(device, device_index)
        self.model: LoadedModel = load_model(
            model_path, compute_type=compute_type,
            files=kwargs.get("files"),
            fuse_qkv=not kwargs.get("tensor_parallel", False),
            device=jax_device)
        if not self.model.is_decoder_only:
            raise ValueError(
                f"The model at {model_path} is not a decoder-only model "
                "that can be used with Generator")
        self.device = device if device != "auto" else (
            jax_device.platform if jax_device is not None else "auto")
        self.device_index = device_index
        self.intra_threads = intra_threads
        self._tensor_parallel = bool(kwargs.get('tensor_parallel', False))
        self._setup_tensor_parallel(device, device_index)
        n_dev = (len(device_index)
                 if isinstance(device_index, (list, tuple)) else 1)
        self._pool = WorkerPool(num_workers=max(1, inter_threads) * max(1, n_dev),
                                max_queued_batches=resolve_max_queued_batches(
                                    kwargs, max_queued_batches))
        self.engine = DecodingEngine(self.model)
        self._apply_flash_flag(kwargs)
        self._init_replicas(device, device_index, DecodingEngine)
        # Static-prompt state cache
        # (reference: include/ctranslate2/layers/decoder.h:102-110).
        self._static_prompt_cache: Dict[Tuple[int, ...], tuple] = {}
        self._static_prompt_lock = __import__("threading").Lock()

    @property
    def num_generators(self) -> int:
        return self._pool.num_workers

    @property
    def num_queued_batches(self) -> int:
        return self._pool.num_queued_batches

    @property
    def num_active_batches(self) -> int:
        return self._pool.num_active_batches

    @property
    def _vocab(self):
        return self.model.target_vocabulary

    # ------------------------------------------------------------------

    def generate_batch(
        self,
        start_tokens: Sequence[Sequence[str]],
        *,
        max_batch_size: int = 0,
        batch_type: str = "examples",
        asynchronous: bool = False,
        beam_size: int = 1,
        patience: float = 1.0,
        num_hypotheses: int = 1,
        length_penalty: float = 1.0,
        repetition_penalty: float = 1.0,
        no_repeat_ngram_size: int = 0,
        disable_unk: bool = False,
        suppress_sequences: Sequence[Sequence[str]] = (),
        end_token=None,
        return_end_token: bool = False,
        max_length: int = 512,
        min_length: int = 0,
        sampling_topk: int = 1,
        sampling_topp: float = 1.0,
        sampling_temperature: float = 1.0,
        return_scores: bool = False,
        return_logits_vocab: bool = False,
        return_alternatives: bool = False,
        min_alternative_expansion_prob: float = 0.0,
        static_prompt: Optional[Sequence[str]] = None,
        cache_static_prompt: bool = True,
        include_prompt_in_result: bool = True,
        callback=None,
        seed: int = 0,
        speculation_k: int = 0,
    ) -> List[GenerationResult]:
        if len(start_tokens) == 0:
            return []
        if any(len(s) == 0 for s in start_tokens):
            raise ValueError("Generator expects at least one start token per example")
        if speculation_k > 1:
            # Lossless self-speculation in the greedy device loop
            # (losslessness holds under argmax only, and the alive-seq
            # logits processors need the sequential step order).
            if beam_size != 1:
                raise ValueError("speculation_k requires beam_size=1")
            if not (sampling_topk == 1 and sampling_topp >= 1.0):
                raise NotImplementedError(
                    "speculation requires greedy decoding (losslessness of "
                    "draft verification is only guaranteed under argmax)")
            if (repetition_penalty != 1.0 or no_repeat_ngram_size
                    or suppress_sequences):
                raise NotImplementedError(
                    "speculation_k is not supported with "
                    "repetition_penalty/no_repeat_ngram_size/"
                    "suppress_sequences in generate_batch; use the "
                    "ContinuousBatcher for those")
            if callback is not None or return_alternatives:
                raise ValueError(
                    "speculation_k is not compatible with callback or "
                    "return_alternatives")
            if T.ring_capacity(self.model.arch):
                min_window = min(
                    (l.self_attention.sliding_window
                     for l in self.model.arch.decoder.layers
                     if l.self_attention.sliding_window > 1), default=0)
                if min_window and speculation_k > min_window:
                    raise ValueError(
                        f"speculation_k ({speculation_k}) must not exceed "
                        f"the smallest sliding window ({min_window}) of a "
                        "ring-cached model")

        v = self._vocab
        end_ids = self._resolve_end_token(end_token)
        options = DecodingOptions(
            beam_size=beam_size,
            patience=patience,
            length_penalty=length_penalty,
            repetition_penalty=repetition_penalty,
            no_repeat_ngram_size=no_repeat_ngram_size,
            suppress_tokens=((v.unk_id,) if disable_unk else ()),
            suppress_sequences=tuple(
                tuple(v.to_id(t, allow_unk=False) for t in seq)
                for seq in suppress_sequences
            ),
            return_end_token=return_end_token,
            max_length=max_length,
            min_length=min_length,
            sampling_topk=sampling_topk,
            sampling_topp=sampling_topp,
            sampling_temperature=sampling_temperature,
            num_hypotheses=num_hypotheses,
            return_scores=return_scores,
            return_logits_vocab=return_logits_vocab,
            return_prefix=True,
            return_alternatives=return_alternatives,
            min_alternative_expansion_prob=min_alternative_expansion_prob,
            seed=seed,
            speculation_k=speculation_k,
        )

        results: List[Optional[GenerationResult]] = [None] * len(start_tokens)
        batches = rebatch_input(
            [len(s) for s in start_tokens], max_batch_size, batch_type)
        if not batches:
            batches = [list(range(len(start_tokens)))]
        async_results: List[Optional[AsyncResult]] = [None] * len(start_tokens)
        futures = []
        for batch in batches:
            future = self._pool.submit(
                self._generate,
                [start_tokens[i] for i in batch], options, end_ids,
                static_prompt, cache_static_prompt,
                include_prompt_in_result, callback, batch)
            futures.append((batch, future))
            for pos, i in enumerate(batch):
                async_results[i] = AsyncResult(future, pos)
        if asynchronous:
            return async_results
        for batch, future in futures:
            for pos, i in enumerate(batch):
                results[i] = future.result()[pos]
        return results

    def _resolve_end_token(self, end_token) -> tuple:
        v = self._vocab
        if end_token is None or end_token == "":
            return (v.eos_id,)
        if isinstance(end_token, str):
            return (v.to_id(end_token, allow_unk=False),)
        ids = [t if isinstance(t, int) else v.to_id(t, allow_unk=False)
               for t in end_token]
        return tuple(ids) if ids else (v.eos_id,)

    # ------------------------------------------------------------------

    def _prefill(self, ids_list: List[List[int]], cache, start_step: int,
                 capacity: int):
        """Forward a uniform-length prompt chunk into the cache.

        Sliding-window models run the prompt through Wr-aligned chunks
        (reference chunked prefill: src/layers/transformer.cc:735-792) so
        ring KV buffers only ever see window-aligned writes."""
        model = self.model
        length = len(ids_list[0])
        for off, size in T.split_prefill_chunks(
                start_step, length, T.ring_block(model.arch)):
            rel = off - start_step
            ids_arr = jnp.asarray(
                [row[rel: rel + size] for row in ids_list], dtype=jnp.int32)
            _, cache, _ = T.decoder_forward_jit(
                model.arch, model.params, model.consts,
                ids_arr, jnp.int32(off), cache, None, None,
                quantize_acts=model.policy.quantize_activations,
                out_dtype=model.out_dtype,
                return_logits=False,
                # The very first chunk of an empty cache attends only its
                # own T positions (O(T^2) prefill, flash-eligible).
                fresh_prefill=(off == 0))
        return cache

    def _generate(self, start_tokens, options, end_ids, static_prompt,
                  cache_static_prompt, include_prompt_in_result, callback,
                  batch_ids=None):
        model = self.model
        v = self._vocab
        B = len(start_tokens)
        start_ids = [
            [v.to_id(t) for t in tokens] for tokens in start_tokens
        ]

        start_step = 0
        max_prompt = max(len(s) for s in start_ids)
        static_len = len(static_prompt) if static_prompt else 0
        spec_k = getattr(options, "speculation_k", 0)
        capacity = _round_up(
            static_len + max_prompt + options.max_length + 1
            + (spec_k if spec_k > 1 else 0), 64)
        model.ensure_consts(capacity)

        # When nothing is prefilled the cache initializes INSIDE the
        # jitted decode loop (no host upload; enables the chain-mask beam
        # attention fast path).
        cache = None

        # Ring KV buffers (O(window) memory) apply to single-token decode;
        # beam search uses chain-mask attention which needs linear caches.
        use_ring = options.beam_size == 1

        def ensure_cache():
            return T.init_self_cache(
                model.arch, B * options.beam_size
                if options.beam_size > 1 else B,
                capacity, dtype=model.kv_dtype, stacked=model.scan_layers,
                ring=use_ring)

        # Static prompt (reference: src/models/language_model.cc:186-215).
        if static_prompt:
            sp_ids = tuple(v.to_id(t) for t in static_prompt)
            # Keyed per data-parallel replica: the cached arrays live on
            # the worker's device (ring caches can't serve beam runs).
            sp_key = (sp_ids, use_ring, id(model))
            with self._static_prompt_lock:
                cached = (self._static_prompt_cache.get(sp_key)
                          if cache_static_prompt else None)
            if cached is not None and cached[1] <= capacity:
                sp_cache, _ = cached
            else:
                single = T.init_self_cache(model.arch, 1, capacity,
                                           dtype=model.kv_dtype,
                                           stacked=model.scan_layers,
                                           ring=use_ring)
                sp_cache = self._prefill([list(sp_ids)], single, 0, capacity)
                if cache_static_prompt:
                    with self._static_prompt_lock:
                        self._static_prompt_cache[sp_key] = (sp_cache, capacity)
            N = B * options.beam_size if options.beam_size > 1 else B
            cache = T.cache_repeat_rows(sp_cache, N)
            start_step += len(sp_ids)

        return_prefix = options.return_prefix
        if not include_prompt_in_result:
            forward_length = min(len(s) for s in start_ids) - 1
            if forward_length > 0:
                prompt_chunk = [s[:forward_length] for s in start_ids]
                start_ids = [s[forward_length:] for s in start_ids]
                # Beam replication happens inside the engine; prefill the
                # un-replicated rows then tile.
                if options.beam_size > 1:
                    base = T.init_self_cache(model.arch, B, capacity,
                                             dtype=model.kv_dtype,
                                             stacked=model.scan_layers,
                                             ring=False)
                    if static_prompt:
                        base = T.cache_repeat_rows(sp_cache, B)
                    base = self._prefill(prompt_chunk, base, start_step, capacity)
                    cache = T.cache_repeat_rows(base, options.beam_size)
                else:
                    cache = self._prefill(prompt_chunk, cache or ensure_cache(),
                                          start_step, capacity)
                start_step += forward_length
                return_prefix = False

        options = DecodingOptions(**{
            **options.__dict__, "return_prefix": return_prefix})

        first_ids = [s[0] for s in start_ids]
        prefix_ids = [s[1:] for s in start_ids]
        if not any(prefix_ids):
            prefix_ids = None

        step_callback = None
        if callback is not None:
            def step_callback(sr):
                # Report the user's original example index (inputs are
                # length-sorted into sub-batches before decoding).
                return callback(GenerationStepResult(
                    step=sr.step,
                    batch_id=(batch_ids[sr.batch_id] if batch_ids
                              else sr.batch_id),
                    token_id=sr.token_id,
                    hypothesis_id=sr.hypothesis_id,
                    token=v.to_token(sr.token_id),
                    score=sr.score, logits=sr.log_probs, is_last=sr.is_last))

        if options.return_alternatives:
            import jax as _jax

            dec_results = []
            for i in range(B):
                cache_i = T.cache_slice_rows(cache, i, 1)
                dec_results.append(self.engine.decode_alternatives(
                    start_ids[i], options, start_step=start_step,
                    end_ids=end_ids, cache=cache_i))
        else:
            dec_results = self.engine.decode(
                first_ids, options,
                cache=cache,
                start_step=start_step,
                prefix_ids=prefix_ids,
                end_ids=end_ids,
                capacity=capacity,
                step_callback=step_callback,
            )

        out = []
        for i, dr in enumerate(dec_results):
            hyps = dr.hypotheses
            # Forward the start token to the output when it is not BOS
            # (reference: src/models/language_model.cc:258-263).
            if include_prompt_in_result and start_ids[i] and start_ids[i][0] != v.bos_id:
                hyps = [[start_ids[i][0]] + h for h in hyps]
            out.append(GenerationResult(
                sequences=[[v.to_token(t) for t in h] for h in hyps],
                sequences_ids=[list(h) for h in hyps],
                scores=dr.scores,
                logits=dr.logits if options.return_logits_vocab else [],
            ))
        return out

    # ------------------------------------------------------------------
    # Streaming sugar (reference: python/ctranslate2/extensions.py).
    # ------------------------------------------------------------------

    def generate_iterable(self, start_tokens, max_batch_size=32,
                          batch_type="examples", **kwargs):
        from .extensions import generate_iterable

        return generate_iterable(self, start_tokens, max_batch_size,
                                 batch_type, **kwargs)

    def generate_tokens(self, prompt, **kwargs):
        from .extensions import generate_tokens

        if kwargs.pop("return_log_prob", False):
            kwargs["return_scores"] = True
        return generate_tokens(self, prompt, **kwargs)

    def async_generate_tokens(self, prompt, **kwargs):
        from .extensions import async_generate_tokens

        return async_generate_tokens(self, prompt, **kwargs)

    def score_iterable(self, tokens, max_batch_size=64, **kwargs):
        from .extensions import score_iterable

        return score_iterable(self, tokens, None, max_batch_size, **kwargs)

    # ------------------------------------------------------------------

    def score_batch(
        self,
        tokens: Sequence[Sequence[str]],
        *,
        max_batch_size: int = 0,
        batch_type: str = "examples",
        max_input_length: int = 1024,
        offset: int = 0,
        asynchronous: bool = False,
    ) -> List[ScoringResult]:
        model = self.model
        v = self._vocab
        results: List[Optional[ScoringResult]] = [None] * len(tokens)

        compute_idx = [i for i, t in enumerate(tokens) if len(t) >= 2]
        for i, t in enumerate(tokens):
            if len(t) < 2:
                results[i] = ScoringResult()

        def score_rows(idx):
            ids = [
                [v.to_id(t) for t in tokens[i]][:max_input_length] for i in idx
            ]
            padded, lengths = pad_batch(ids, length_multiple=8, min_length=8)
            ids_arr = jnp.asarray(padded, dtype=jnp.int32)
            lengths_arr = jnp.asarray(lengths, dtype=jnp.int32)

            logits, _, _ = T.decoder_forward_jit(
                model.arch, model.params, model.consts,
                ids_arr[:, :-1], jnp.int32(0), None, None, None,
                lengths=lengths_arr - 1,
                quantize_acts=model.policy.quantize_activations,
                out_dtype=model.out_dtype)
            log_probs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
            token_scores = np.asarray(jnp.take_along_axis(
                log_probs, ids_arr[:, 1:, None], axis=-1)[..., 0])

            out = []
            for row in range(len(idx)):
                n = lengths[row] - 1
                r = ScoringResult()
                for t in range(offset if offset > 0 else 0, n):
                    r.tokens.append(v.to_token(ids[row][t + 1]))
                    r.tokens_score.append(float(token_scores[row, t]))
                out.append(r)
            return out

        batches = rebatch_input(
            [len(tokens[i]) for i in compute_idx], max_batch_size, batch_type)
        async_results: List[Optional[AsyncResult]] = [
            None if r is None else AsyncResult(r) for r in results
        ]
        futures = []
        for batch in batches:
            idx = [compute_idx[j] for j in batch]
            future = self._pool.submit(score_rows, idx)
            futures.append((idx, future))
            for pos, i in enumerate(idx):
                async_results[i] = AsyncResult(future, pos)
        if asynchronous:
            return async_results
        for idx, future in futures:
            for pos, i in enumerate(idx):
                results[i] = future.result()[pos]
        return results

    def forward_batch(self, inputs, lengths=None,
                      return_log_probs: bool = False):
        """Full-sequence logits (reference: language_model.cc:279-299).

        ``inputs``: batch of token strings, batch of token ids, or an
        id array (the reference's BatchTokens/BatchIds/StorageView
        variants, python/cpp/generator.cc:99-115); ``lengths`` gives the
        true row lengths for a padded dense array."""
        from .batching import normalize_input_ids

        model = self.model
        ids = normalize_input_ids(inputs, self._vocab, lengths)
        padded, lengths = pad_batch(ids, length_multiple=8, min_length=8)
        ids_arr = jnp.asarray(padded, dtype=jnp.int32)
        lengths_arr = jnp.asarray(lengths, dtype=jnp.int32)
        logits, _, _ = T.decoder_forward_jit(
            model.arch, model.params, model.consts,
            ids_arr, jnp.int32(0), None, None, None,
            lengths=lengths_arr,
            quantize_acts=model.policy.quantize_activations,
            out_dtype=model.out_dtype)
        if return_log_probs:
            return jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        return logits

