"""Translator: the sequence-to-sequence task API
(parity with reference: include/ctranslate2/translator.h:26-345,
src/models/sequence_to_sequence.cc:304-470).
"""

from __future__ import annotations

import time
from typing import List, Optional, Sequence

import numpy as np
import jax.numpy as jnp

from ..decoding.engine import DecodingEngine
from ..decoding.options import DecodingOptions
from ..formats.vocabulary_map import VocabularyMap
from ..models import transformer as T
from ..models.loader import LoadedModel, load_model, resolve_device
from ..ops import attention as attn_ops
from .batching import bucket_length, pad_batch, rebatch_input
from .base import TaskAPIMixin
from .pool import WorkerPool, resolve_max_queued_batches
from .results import AsyncResult, ExecutionStats, ScoringResult, TranslationResult

# Source-factor separator (reference: include/ctranslate2/utils.h:33).
FEATURES_SEPARATOR = "￨"


def extract_features(batch, num_features: int,
                     separator: str = FEATURES_SEPARATOR):
    """Split ``tok￨f1￨...`` factored tokens into per-feature token streams
    ([F][B][T]) (reference: src/utils.cc:158-190)."""
    if num_features == 1:
        return [[list(tokens) for tokens in batch]]
    features = [[] for _ in range(num_features)]
    for tokens in batch:
        for stream in features:
            stream.append([])
        for token in tokens:
            fields = token.split(separator)
            if len(fields) != num_features:
                raise ValueError(
                    f"Expected {num_features} input features, but token "
                    f"'{token}' has {len(fields)} features")
            for i, field in enumerate(fields):
                features[i][-1].append(field)
    return features


class Translator(TaskAPIMixin):
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
        if not self.model.is_sequence_to_sequence:
            raise ValueError(
                f"The model at {model_path} is not an encoder-decoder model "
                "that can be used with Translator")
        self.device = device if device != "auto" else (
            jax_device.platform if jax_device is not None else "auto")
        self.device_index = device_index
        # intra-op parallelism is owned by XLA on every backend; the
        # reference flag controls OpenMP threads (docs/parallel.md:3-13).
        self.intra_threads = intra_threads
        # Worker pool backing the async/batched APIs
        # (reference: inter_threads replicas, replica_pool.h:19-300).
        self._tensor_parallel = bool(kwargs.get('tensor_parallel', False))
        self._setup_tensor_parallel(device, device_index)
        # One worker group per data-parallel replica (reference: pool size
        # = devices x inter_threads, replica_pool.h:19-300).
        n_dev = (len(device_index)
                 if isinstance(device_index, (list, tuple)) else 1)
        self._pool = WorkerPool(num_workers=max(1, inter_threads) * max(1, n_dev),
                                max_queued_batches=resolve_max_queued_batches(
                                    kwargs, max_queued_batches))
        self.engine = DecodingEngine(self.model)
        self._apply_flash_flag(kwargs)
        self._init_replicas(device, device_index, DecodingEngine)
        self._vmap = None
        if self.model.vmap_path:
            self._vmap = VocabularyMap.load(
                self.model.vmap_path, self.model.target_vocabulary)
        elif self.model.vmap_text is not None:
            self._vmap = VocabularyMap.from_lines(
                self.model.vmap_text.splitlines(),
                self.model.target_vocabulary)

    @property
    def num_translators(self) -> int:
        return self._pool.num_workers

    @property
    def num_queued_batches(self) -> int:
        return self._pool.num_queued_batches

    @property
    def num_active_batches(self) -> int:
        return self._pool.num_active_batches

    # ------------------------------------------------------------------
    # Vocabulary helpers (reference: src/models/sequence_to_sequence.cc:97-233).
    # ------------------------------------------------------------------

    @property
    def _source_vocab(self):
        return self.model.source_vocabularies[0]

    @property
    def _target_vocab(self):
        return self.model.target_vocabulary

    @property
    def _num_input_features(self) -> int:
        return self.model.arch.encoder.embeddings.num_features

    def _source_feature_streams(self, source: Sequence[Sequence[str]]):
        """Split ``￨``-factored tokens once, validating the vocabulary
        count (reference: src/models/sequence_to_sequence.cc:144-166)."""
        num_features = self._num_input_features
        if len(self.model.source_vocabularies) != num_features:
            raise RuntimeError(
                f"The encoder expects {num_features} input features, but "
                f"{len(self.model.source_vocabularies)} source vocabularies "
                "are loaded")
        return extract_features(source, num_features)

    def _ids_from_streams(self, streams, max_input_length: int):
        cfg = self.model.config
        return [
            vocab.tokens_to_ids(
                stream,
                max_length=max_input_length,
                add_bos=bool(cfg.get("add_source_bos", False)),
                add_eos=bool(cfg.get("add_source_eos", False)),
            )
            for vocab, stream in zip(self.model.source_vocabularies, streams)
        ]

    def _make_source_ids(self, source: Sequence[Sequence[str]], max_input_length: int):
        """Convert (possibly ``￨``-factored) source tokens into per-feature
        id batches, shape [F][B][T]."""
        return self._ids_from_streams(
            self._source_feature_streams(source), max_input_length)

    def _decoder_start_id(self) -> Optional[int]:
        start = self.model.config.get("decoder_start_token", "<s>")
        if start is None:
            return None
        return self._target_vocab.to_id(start)

    # ------------------------------------------------------------------

    def translate_batch(
        self,
        source: Sequence[Sequence[str]],
        target_prefix: Optional[Sequence[Optional[Sequence[str]]]] = None,
        *,
        max_batch_size: int = 0,
        batch_type: str = "examples",
        asynchronous: bool = False,
        beam_size: int = 2,
        patience: float = 1.0,
        num_hypotheses: int = 1,
        length_penalty: float = 1.0,
        coverage_penalty: float = 0.0,
        repetition_penalty: float = 1.0,
        no_repeat_ngram_size: int = 0,
        disable_unk: bool = False,
        suppress_sequences: Sequence[Sequence[str]] = (),
        end_token=None,
        return_end_token: bool = False,
        prefix_bias_beta: float = 0.0,
        max_input_length: int = 1024,
        max_decoding_length: int = 256,
        min_decoding_length: int = 1,
        use_vmap: bool = False,
        return_scores: bool = False,
        return_logits_vocab: bool = False,
        return_attention: bool = False,
        return_alternatives: bool = False,
        min_alternative_expansion_prob: float = 0.0,
        sampling_topk: int = 1,
        sampling_topp: float = 1.0,
        sampling_temperature: float = 1.0,
        replace_unknowns: bool = False,
        callback=None,
    ) -> List[TranslationResult]:
        if len(source) == 0:
            return []
        try:
            # Reference wording (src/decoding.cc:1036-1039).
            if min_decoding_length > max_decoding_length:
                raise ValueError(
                    "The minimum decoding length is greater than the "
                    "maximum decoding length")
            if max_decoding_length == 0:
                raise ValueError("The maximum decoding length must be > 0")
            # Biased-decoding validation (reference: src/decoding.cc:1042-1054).
            if prefix_bias_beta >= 1:
                raise ValueError(
                    "The beta value in biased decoding must be < 1")
            if prefix_bias_beta > 0 and return_alternatives:
                raise ValueError("Biased decoding is not compatible with the "
                                 "return_alternatives mode")
            if callback is not None and prefix_bias_beta > 0:
                raise ValueError("The callback function is not compatible "
                                 "with prefix_bias_beta > 0")
        except ValueError:
            if not asynchronous:
                raise
            # Invalid options surface through the returned futures, like
            # the reference's async path (python/tests/test_translator.py
            # test_invalid_translation_options_async).
            import sys
            from concurrent.futures import Future

            failed = Future()
            failed.set_exception(sys.exc_info()[1])
            return [AsyncResult(failed, 0) for _ in source]

        tv = self._target_vocab
        end_ids = self._resolve_end_token(end_token)

        options = DecodingOptions(
            beam_size=beam_size,
            patience=patience,
            length_penalty=length_penalty,
            coverage_penalty=coverage_penalty,
            repetition_penalty=repetition_penalty,
            no_repeat_ngram_size=no_repeat_ngram_size,
            suppress_tokens=((tv.unk_id,) if disable_unk else ()),
            suppress_sequences=tuple(
                tuple(tv.to_id(t, allow_unk=False) for t in seq)
                for seq in suppress_sequences
            ),
            return_end_token=return_end_token,
            max_length=max_decoding_length,
            min_length=min_decoding_length,
            sampling_topk=sampling_topk,
            sampling_topp=sampling_topp,
            sampling_temperature=sampling_temperature,
            num_hypotheses=num_hypotheses,
            return_scores=return_scores,
            return_logits_vocab=return_logits_vocab,
            return_attention=return_attention or replace_unknowns,
            return_prefix=True,
            return_alternatives=return_alternatives,
            min_alternative_expansion_prob=min_alternative_expansion_prob,
            prefix_bias_beta=prefix_bias_beta,
        )

        results: List[Optional[TranslationResult]] = [None] * len(source)

        # Empty-source rows are resolved without running the model
        # (reference: src/models/sequence_to_sequence.cc:432-470).
        compute_idx = []
        for i, src in enumerate(source):
            if len(src) == 0:
                results[i] = self._empty_source_result(
                    target_prefix[i] if target_prefix else None,
                    options, return_attention)
            else:
                compute_idx.append(i)

        batches = rebatch_input(
            [len(source[i]) for i in compute_idx], max_batch_size, batch_type)
        async_results: List[Optional[AsyncResult]] = [
            None if r is None else AsyncResult(r) for r in results
        ]
        futures = []
        for batch in batches:
            idx = [compute_idx[j] for j in batch]
            batch_source = [source[i] for i in idx]
            batch_prefix = (
                [target_prefix[i] if target_prefix else None for i in idx]
                if target_prefix else None
            )
            future = self._pool.submit(
                self._translate_padded,
                batch_source, batch_prefix, options, max_input_length,
                replace_unknowns, return_attention, callback, end_ids,
                use_vmap=use_vmap, batch_ids=idx)
            futures.append((idx, future))
            for pos, i in enumerate(idx):
                async_results[i] = AsyncResult(future, pos)

        if asynchronous:
            return async_results
        for idx, future in futures:
            for pos, i in zip(range(len(idx)), idx):
                results[i] = future.result()[pos]
        return results

    def _resolve_end_token(self, end_token) -> tuple:
        tv = self._target_vocab
        if end_token is None or end_token == "":
            return (tv.eos_id,)
        if isinstance(end_token, str):
            return (tv.to_id(end_token, allow_unk=False),)
        ids = []
        for t in end_token:
            ids.append(t if isinstance(t, int) else tv.to_id(t, allow_unk=False))
        return tuple(ids) if ids else (tv.eos_id,)

    def _empty_source_result(self, prefix, options, return_attention):
        hypothesis: List[str] = []
        if prefix:
            hypothesis = list(prefix)[: options.max_length]
        r = TranslationResult()
        for _ in range(options.num_hypotheses):
            r.hypotheses.append(list(hypothesis))
            if options.return_scores:
                r.scores.append(0.0)
            if return_attention:
                r.attention.append([[0.0] * 0 for _ in hypothesis])
        return r

    def _pad_feature_ids(self, feature_ids):
        """Pad [F][B][T] feature id batches to one bucketed length.

        Returns (ids, lengths): ids is a single [B,S] array for F==1 or a
        tuple of per-feature arrays (all features share token positions)."""
        arrays = []
        lengths = None
        S = None
        for stream in feature_ids:
            p, l = pad_batch(stream, length_multiple=1)
            if lengths is None:
                lengths, S = l, bucket_length(len(p[0]), 8)
            p = [row + [0] * (S - len(row)) for row in p]
            arrays.append(jnp.asarray(p, dtype=jnp.int32))
        ids = arrays[0] if len(arrays) == 1 else tuple(arrays)
        return ids, jnp.asarray(lengths, dtype=jnp.int32)

    def _encode_batch(self, feature_ids):
        model = self.model
        ids_arr, lengths_arr = self._pad_feature_ids(feature_ids)
        memory = T.encoder_forward_jit(
            model.arch, model.params, model.consts, ids_arr, lengths_arr,
            quantize_acts=model.policy.quantize_activations,
            out_dtype=model.out_dtype)
        return memory, lengths_arr

    def _restricted_output_params(self, candidates, size_multiple: int = 256):
        """Build a params tree whose logits projection only contains the
        candidate columns (reference update_output_layer semantics:
        src/layers/decoder.cc:72-139 + Dense::select_weights
        src/layers/common.cc:313-337). Returns (params, to_output map,
        to_original list)."""
        import jax

        ids = list(candidates)
        new_size = len(ids)
        if new_size % size_multiple:
            pad = size_multiple - new_size % size_multiple
            ids = ids + [0] * pad
            new_size += pad
        else:
            pad = 0

        proj = self.model.params["decoder"]["projection"]
        idx = jnp.asarray(ids, dtype=jnp.int32)
        new_proj = {}
        if "w" in proj:
            new_proj["w"] = jnp.take(proj["w"], idx, axis=1)
        else:
            new_proj["wq"] = jnp.take(proj["wq"], idx, axis=1)
            s = proj["scale"]
            new_proj["scale"] = jnp.take(s, idx, axis=0) if s.ndim else s
        bias = jnp.take(proj["b"], idx, axis=0) if "b" in proj else jnp.zeros(
            new_size, jnp.float32)
        if pad:
            mask = jnp.arange(new_size) >= (new_size - pad)
            bias = jnp.where(mask, -1e10, bias)
        new_proj["b"] = bias

        params = dict(self.model.params)
        params["decoder"] = dict(params["decoder"])
        params["decoder"]["projection"] = new_proj

        to_original = ids
        to_output = {}
        for i, orig in enumerate(ids):
            to_output.setdefault(orig, i)
        return params, to_output, to_original

    def _translate_padded(self, source, target_prefix, options,
                          max_input_length, replace_unknowns,
                          return_attention, callback, end_ids,
                          use_vmap: bool = False, batch_ids=None):
        tv = self._target_vocab
        streams = self._source_feature_streams(source)
        feature_ids = self._ids_from_streams(streams, max_input_length)
        source_ids = feature_ids[0]
        # Factored models report/replace with the main-feature tokens
        # (reference: sequence_to_sequence.cc:396).
        source_tokens = streams[0]

        # Pad source ids once; encoding is fused into the decode dispatch
        # unless a path needs the encoder output on the host.
        enc_ids, enc_lengths = self._pad_feature_ids(feature_ids)
        memory = None
        memory_lengths = None
        if options.return_alternatives:
            memory, memory_lengths = self._encode_batch(feature_ids)

        start_id = self._decoder_start_id()
        prefix_ids = None
        if target_prefix is not None and any(p for p in target_prefix):
            prefix_ids = [
                (tv.tokens_to_ids([p])[0] if p else []) for p in target_prefix
            ]
        if start_id is None:
            if prefix_ids is None or any(not p for p in prefix_ids):
                raise ValueError(
                    "The model requires a target prefix as the decoder start token")
            start_ids = [p[0] for p in prefix_ids]
            prefix_ids = [p[1:] for p in prefix_ids]
        else:
            start_ids = [start_id] * len(source)

        step_callback = None
        if callback is not None:
            from .results import GenerationStepResult

            def step_callback(sr):
                # Report the user's original example index: inputs are
                # length-sorted into sub-batches before decoding
                # (reference: batch ids are remapped back through the
                # batch_offset, src/decoding.cc:899-901).
                return callback(GenerationStepResult(
                    step=sr.step,
                    batch_id=(batch_ids[sr.batch_id] if batch_ids
                              else sr.batch_id),
                    token_id=sr.token_id,
                    hypothesis_id=sr.hypothesis_id,
                    token=tv.to_token(sr.token_id),
                    score=sr.score, is_last=sr.is_last))

        # Vocabulary-map restriction of the output layer.
        run_params = None
        to_original = None
        token_map = None
        if use_vmap and self._vmap is not None:
            import dataclasses as _dc

            # Factored inputs match vmap n-grams on the main feature
            # (reference: sequence_to_sequence.cc:332).
            candidates = self._vmap.get_candidates(
                [list(s) for s in source_tokens], prefix_ids or [])
            run_params, to_output, to_original = (
                self._restricted_output_params(candidates))
            token_map = jnp.asarray(to_original, dtype=jnp.int32)
            start_ids = [to_output[i] for i in start_ids]
            if prefix_ids is not None:
                prefix_ids = [
                    [to_output[t] for t in p if t in to_output]
                    for p in prefix_ids
                ]
            end_ids = tuple(to_output[e] for e in end_ids if e in to_output)
            options = _dc.replace(
                options,
                suppress_tokens=tuple(
                    to_output[t] for t in options.suppress_tokens
                    if t in to_output),
                suppress_sequences=tuple(
                    tuple(to_output[t] for t in seq if t in to_output)
                    for seq in options.suppress_sequences),
            )

        if options.return_alternatives:
            dec_results = []
            for i in range(len(source)):
                start_tokens = [start_ids[i]] + (
                    list(prefix_ids[i]) if prefix_ids else [])
                dec_results.append(self.engine.decode_alternatives(
                    start_tokens, options,
                    memory=memory[i:i + 1],
                    memory_lengths=memory_lengths[i:i + 1],
                    end_ids=end_ids,
                    params=run_params,
                    token_map=token_map))
        else:
            dec_results = self.engine.decode(
                start_ids, options,
                memory=memory, memory_lengths=memory_lengths,
                encoder_inputs=(enc_ids, enc_lengths),
                prefix_ids=prefix_ids,
                end_ids=end_ids,
                step_callback=step_callback,
                params=run_params,
                token_map=token_map,
            )

        if to_original is not None:
            for dr in dec_results:
                dr.hypotheses = [
                    [to_original[t] for t in h] for h in dr.hypotheses
                ]

        out = []
        for i, dr in enumerate(dec_results):
            hyps = [[tv.to_token(t) for t in h] for h in dr.hypotheses]
            attention = []
            if dr.attention:
                src_len = len(source_ids[i])
                cfg = self.model.config
                for h, attn in enumerate(dr.attention):
                    rows = []
                    for vec in attn:
                        vec = list(vec[:src_len])
                        if cfg.get("add_source_bos"):
                            vec = vec[1:]
                        if cfg.get("add_source_eos"):
                            vec = vec[:-1]
                        # Resize to the original tokens.
                        vec = vec[: len(source[i])]
                        vec += [0.0] * (len(source[i]) - len(vec))
                        rows.append(vec)
                    attention.append(rows)
                    if replace_unknowns:
                        for t, tok in enumerate(hyps[h]):
                            if tok == tv.unk_token and t < len(rows):
                                best = int(np.argmax(rows[t]))
                                hyps[h][t] = source_tokens[i][best]
            r = TranslationResult(
                hypotheses=hyps,
                scores=dr.scores if options.return_scores else [],
                attention=attention if return_attention else [],
                logits=dr.logits if options.return_logits_vocab else [],
            )
            out.append(r)
        return out

    # ------------------------------------------------------------------
    # Streaming sugar (reference: python/ctranslate2/extensions.py).
    # ------------------------------------------------------------------

    def translate_iterable(self, source, target_prefix=None,
                           max_batch_size=32, batch_type="examples", **kwargs):
        from .extensions import translate_iterable

        return translate_iterable(self, source, target_prefix,
                                  max_batch_size, batch_type, **kwargs)

    def translate_tokens(self, source, target_prefix=None, **kwargs):
        from .extensions import translate_tokens

        if kwargs.pop("return_log_prob", False):
            kwargs["return_scores"] = True
        return translate_tokens(self, source, target_prefix, **kwargs)

    # Reference name for token streaming on a translator
    # (python/ctranslate2/extensions.py translator_generate_tokens).
    generate_tokens = translate_tokens

    def score_iterable(self, source, target, max_batch_size=64, **kwargs):
        from .extensions import score_iterable

        return score_iterable(self, source, target, max_batch_size, **kwargs)

    # ------------------------------------------------------------------
    # Scoring (reference: src/scoring.cc:5-68).
    # ------------------------------------------------------------------

    def score_batch(
        self,
        source: Sequence[Sequence[str]],
        target: Sequence[Sequence[str]],
        *,
        max_batch_size: int = 0,
        batch_type: str = "examples",
        max_input_length: int = 1024,
        offset: int = 0,
        asynchronous: bool = False,
    ) -> List[ScoringResult]:
        tv = self._target_vocab
        start_id = self._decoder_start_id()
        results: List[Optional[ScoringResult]] = [None] * len(source)

        compute_idx = []
        for i in range(len(source)):
            if len(self._make_source_ids([source[i]], max_input_length)[0][0]) == 0:
                r = ScoringResult()
                ids = tv.tokens_to_ids([target[i]], max_input_length)[0]
                for t in ids:
                    r.tokens.append(tv.to_token(t))
                    r.tokens_score.append(0.0)
                results[i] = r
            else:
                compute_idx.append(i)

        batches = rebatch_input(
            [len(source[i]) for i in compute_idx], max_batch_size, batch_type)
        async_results: List[Optional[AsyncResult]] = [
            None if r is None else AsyncResult(r) for r in results
        ]
        futures = []
        for batch in batches:
            idx = [compute_idx[j] for j in batch]
            future = self._pool.submit(
                self._score_padded,
                [source[i] for i in idx], [target[i] for i in idx],
                max_input_length, start_id)
            futures.append((idx, future))
            for pos, i in enumerate(idx):
                async_results[i] = AsyncResult(future, pos)
        if asynchronous:
            return async_results
        for idx, future in futures:
            for pos, i in enumerate(idx):
                results[i] = future.result()[pos]
        return results

    def _score_padded(self, source, target, max_input_length, start_id):
        model = self.model
        tv = self._target_vocab
        source_ids = self._make_source_ids(source, max_input_length)
        memory, memory_lengths = self._encode_batch(source_ids)
        mem_kv = T.precompute_memory_jit(
            model.arch, model.params, memory,
            quantize_acts=model.policy.quantize_activations)
        mem_bias = attn_ops.length_mask_bias(memory_lengths, memory.shape[1])

        # Full target sequence: start + tokens + eos.
        full_ids = []
        for t in target:
            ids = tv.tokens_to_ids([t], max_input_length)[0]
            seq = ([start_id] if start_id is not None else []) + ids + [tv.eos_id]
            full_ids.append(seq)

        padded, lengths = pad_batch(full_ids, length_multiple=8, min_length=8)
        ids_arr = jnp.asarray(padded, dtype=jnp.int32)
        lengths_arr = jnp.asarray(lengths, dtype=jnp.int32)

        logits, _, _ = T.decoder_forward_jit(
            model.arch, model.params, model.consts,
            ids_arr[:, :-1], jnp.int32(0), None, mem_kv, mem_bias,
            lengths=lengths_arr - 1,
            quantize_acts=model.policy.quantize_activations,
            out_dtype=model.out_dtype)
        import jax

        log_probs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        token_scores = jnp.take_along_axis(
            log_probs, ids_arr[:, 1:, None], axis=-1)[..., 0]
        scores = np.asarray(token_scores)

        out = []
        for i, seq in enumerate(full_ids):
            n = len(seq) - 1
            r = ScoringResult()
            for t in range(n):
                r.tokens.append(tv.to_token(seq[t + 1]))
                r.tokens_score.append(float(scores[i, t]))
            out.append(r)
        return out

    # ------------------------------------------------------------------

    def translate_file(self, source_path: str, output_path: str,
                       target_path: Optional[str] = None,
                       max_batch_size: int = 32, read_batch_size: int = 0,
                       batch_type: str = "examples",
                       with_scores: bool = False,
                       source_tokenize_fn=None,
                       target_tokenize_fn=None,
                       target_detokenize_fn=None,
                       **kwargs) -> ExecutionStats:
        """Translate a tokenized (or, with the tokenize/detokenize
        callbacks, raw) text file (reference: translate_text_file /
        translate_raw_text_file, include/ctranslate2/translator.h:68-211,
        python/cpp/translator.cc translate_file)."""
        if bool(source_tokenize_fn) != bool(target_detokenize_fn):
            raise ValueError(
                "source_tokenize_fn and target_detokenize_fn should both "
                "be set or none at all")
        if target_path and source_tokenize_fn and not target_tokenize_fn:
            raise ValueError(
                "target_tokenize_fn should be set when passing a target "
                "file")
        import contextlib
        import itertools

        from .batching import consume_stream, default_read_batch_size

        start = time.time()
        num_tokens = 0
        num_examples = 0
        src_tok = source_tokenize_fn or (lambda text: text.split())
        tgt_tok = target_tokenize_fn or (lambda text: text.split())
        if with_scores:
            kwargs.setdefault("return_scores", True)
        detok = target_detokenize_fn or (lambda tokens: " ".join(tokens))

        # Streaming consume loop (reference: consume_batches,
        # include/ctranslate2/replica_pool.h:191-226).
        read_batch_size = default_read_batch_size(
            read_batch_size, max_batch_size)

        with contextlib.ExitStack() as stack:
            fin = stack.enter_context(open(source_path, encoding="utf-8"))
            fin_tgt = (stack.enter_context(open(target_path,
                                                encoding="utf-8"))
                       if target_path is not None else None)
            fout = stack.enter_context(
                open(output_path, "w", encoding="utf-8"))

            def read_window():
                window = list(itertools.islice(fin, read_batch_size))
                if not window:
                    if fin_tgt is not None and fin_tgt.readline():
                        raise ValueError(
                            "source and target files do not have the same "
                            "number of lines")
                    return None
                lines = [src_tok(line.rstrip("\n")) for line in window]
                target_prefix = None
                if fin_tgt is not None:
                    tgt_window = list(itertools.islice(fin_tgt, len(window)))
                    if len(tgt_window) != len(window):
                        raise ValueError(
                            "source and target files do not have the same "
                            "number of lines")
                    target_prefix = [
                        tgt_tok(line.rstrip("\n")) for line in tgt_window]
                return lines, target_prefix

            def submit(window):
                lines, target_prefix = window
                return self.translate_batch(
                    lines, target_prefix=target_prefix,
                    max_batch_size=max_batch_size, batch_type=batch_type,
                    asynchronous=True, **kwargs)

            def write_result(r):
                nonlocal num_tokens, num_examples
                hypotheses = r.hypotheses or [[]]
                num_tokens += len(hypotheses[0])
                num_examples += 1
                for n, tokens in enumerate(hypotheses):
                    line = detok(tokens)
                    if with_scores:
                        score = r.scores[n] if r.scores else 0
                        line = f"{score} ||| {line}"
                    fout.write(line)
                    fout.write("\n")

            consume_stream(read_window, submit, write_result,
                           max_pending=4 * (read_batch_size or 0))
        return ExecutionStats(
            num_tokens=num_tokens,
            num_examples=num_examples,
            total_time_in_ms=(time.time() - start) * 1000.0,
        )

    def score_file(self, source_path: str, target_path: str,
                   output_path: str, max_batch_size: int = 32,
                   read_batch_size: int = 0,
                   batch_type: str = "examples",
                   with_tokens_score: bool = False, **kwargs) -> ExecutionStats:
        """Score a parallel file pair, writing ``mean_score ||| target``
        lines (reference: include/ctranslate2/translator.h score_file and
        python/cpp/translator.cc). Streams like translate_file."""
        import itertools

        from .batching import consume_stream, default_read_batch_size

        start = time.time()
        num_tokens = 0
        num_examples = 0
        read_batch_size = default_read_batch_size(
            read_batch_size, max_batch_size)

        with open(source_path, encoding="utf-8") as fsrc, \
                open(target_path, encoding="utf-8") as ftgt, \
                open(output_path, "w", encoding="utf-8") as fout:

            def read_window():
                src_window = list(itertools.islice(fsrc, read_batch_size))
                if not src_window:
                    if ftgt.readline():
                        raise ValueError(
                            "source and target files do not have the same "
                            "number of lines")
                    return None
                tgt_window = list(itertools.islice(ftgt, len(src_window)))
                if len(tgt_window) != len(src_window):
                    raise ValueError(
                        "source and target files do not have the same "
                        "number of lines")
                return src_window, tgt_window

            def submit(window):
                src_window, tgt_window = window
                return self.score_batch(
                    [line.split() for line in src_window],
                    [line.split() for line in tgt_window],
                    max_batch_size=max_batch_size, batch_type=batch_type,
                    asynchronous=True, **kwargs)

            def write_result(r):
                nonlocal num_tokens, num_examples
                num_tokens += len(r.tokens)
                num_examples += 1
                mean = (sum(r.tokens_score) / len(r.tokens_score)
                        if r.tokens_score else 0.0)
                line = f"{mean:.6f} ||| {' '.join(r.tokens)}"
                if with_tokens_score:
                    line += " ||| " + " ".join(
                        f"{s:.6f}" for s in r.tokens_score)
                fout.write(line + "\n")

            consume_stream(read_window, submit, write_result,
                           max_pending=4 * (read_batch_size or 0))
        return ExecutionStats(
            num_tokens=num_tokens,
            num_examples=num_examples,
            total_time_in_ms=(time.time() - start) * 1000.0,
        )

