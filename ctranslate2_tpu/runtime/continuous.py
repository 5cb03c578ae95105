"""Iteration-level (continuous) batching engine for decoder-only models.

This is the TPU-native answer to the serving capability the reference
approximates with a replica pool + buffered batcher (reference:
include/ctranslate2/replica_pool.h:19-300,
src/buffered_translation_wrapper.cc:68-111): instead of grouping whole
requests into batches that run to completion, a persistent jitted
``decode_step`` advances a FIXED set of slots one token per dispatch, and
between steps the host harvests finished slots and admits queued requests
into the freed rows (prefill writes the prompt KV into the slot's cache
rows). A request submitted mid-decode of another starts on the very next
step — no waiting for the running request's full generation.

TPU-first design points:
- static shapes everywhere: ``num_slots`` rows x ``capacity`` KV slots,
  so ONE executable serves the whole serving lifetime;
- per-slot positions: every slot decodes at its own ``pos`` (vector
  positions thread through rotary/position encodings, causal masks and
  cache scatters — see models/transformer.py);
- donated cache: the step function donates the KV cache buffers, so XLA
  updates them in place across dispatches;
- the only host<->device traffic per step is the sampled token row
  ([num_slots] int32) plus tiny control vectors.
"""

from __future__ import annotations

import os
import queue
import threading
import time
from collections import deque
from concurrent.futures import Future
from dataclasses import dataclass, field
from typing import List, Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from ..decoding import processors as proc
from ..decoding.sampling import sample_tokens
from ..models import transformer as T
from .results import GenerationResult, GenerationStepResult


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


class _DistControl:
    """Multi-host verb broadcast for the continuous engines (reference
    anchor: the whole serving stack runs per-rank under mpirun,
    /root/reference/docs/parallel.md:43-90). Process 0 is the leader: it
    owns the request queue and host bookkeeping and broadcasts one
    control record per scheduler iteration (admitted requests + whether
    to step); followers replay the records so every process dispatches
    the SAME global computations in the SAME order — the single-program
    contract the batch APIs already rely on (docs/parallel.md).

    Transport: fixed-size uint8 frames through
    ``multihost_utils.broadcast_one_to_all`` (a device collective —
    gloo on CPU, ICI/DCN on TPU slices). The first frame carries the
    total record length; records larger than one frame (e.g. a Whisper
    admit whose mel features ride the record, or a very long prompt)
    continue over follow-up frames — both sides derive the identical
    frame count from the length, so no size limit applies."""

    MAXLEN = 1 << 16

    def __init__(self):
        import jax

        self.is_leader = jax.process_index() == 0
        self._zeros = np.zeros(self.MAXLEN, np.uint8)

    def send(self, obj) -> None:
        import json as _json

        from jax.experimental import multihost_utils

        data = _json.dumps(obj).encode()
        total = len(data)
        head = min(total, self.MAXLEN - 4)
        buf = np.zeros(self.MAXLEN, np.uint8)
        buf[:4] = np.frombuffer(np.uint32(total).tobytes(), np.uint8)
        buf[4: 4 + head] = np.frombuffer(data[:head], np.uint8)
        multihost_utils.broadcast_one_to_all(buf)
        off = head
        while off < total:
            n = min(total - off, self.MAXLEN)
            chunk = np.zeros(self.MAXLEN, np.uint8)
            chunk[:n] = np.frombuffer(data[off: off + n], np.uint8)
            multihost_utils.broadcast_one_to_all(chunk)
            off += n

    def recv(self):
        import json as _json

        from jax.experimental import multihost_utils

        buf = np.asarray(multihost_utils.broadcast_one_to_all(self._zeros))
        total = int(np.frombuffer(buf[:4].tobytes(), np.uint32)[0])
        head = min(total, self.MAXLEN - 4)
        parts = [buf[4: 4 + head].tobytes()]
        off = head
        while off < total:
            chunk = np.asarray(
                multihost_utils.broadcast_one_to_all(self._zeros))
            n = min(total - off, self.MAXLEN)
            parts.append(chunk[:n].tobytes())
            off += n
        return _json.loads(b"".join(parts).decode())


@dataclass
class _Request:
    prompt_ids: List[int]
    max_length: int
    min_length: int
    temperature: float = 0.0  # 0 = the batcher's default
    # Per-request sampling overrides (None = the batcher's default;
    # reference: full options per call through the buffered wrapper,
    # include/ctranslate2/translation.h:11-86).
    topk: Optional[int] = None
    topp: Optional[float] = None
    seed: Optional[int] = None
    end_ids: Optional[tuple] = None
    # Per-request logits-processor overrides (None = batcher default).
    rep_penalty: Optional[float] = None
    ngram: Optional[int] = None
    suppress_ids: Optional[tuple] = None
    future: Future = field(default_factory=Future)
    # Token-streaming callback (reference GenerationStepResult callback
    # semantics: return True to stop this request early).
    callback: Optional[object] = None
    # Multi-token stop sequences (token id tuples); matched host-side on
    # the generated tail (greedy) or device-side in the candidate
    # bookkeeping (beam), matched suffix trimmed from the result.
    stop_sequences: tuple = ()
    # Per-request hypothesis count (beam serving; None = batcher default).
    num_hypotheses: Optional[int] = None
    # Beam streaming: number of committed tokens already delivered.
    streamed: int = 0
    # Filled while decoding:
    generated: List[int] = field(default_factory=list)
    score: float = 0.0
    stopped: bool = False
    # Multi-host bookkeeping: a callback-driven stop is leader-local
    # state until it has been broadcast in a control record
    # (stop_sync=True); until then followers keep consuming, so the
    # leader records the stop point (stop_len/stop_score) and trims the
    # symmetric overshoot at finish.
    stop_sync: bool = False
    stop_len: Optional[int] = None
    stop_score: float = 0.0
    callback_error: Optional[BaseException] = None
    # Serving-latency bookkeeping: submission time and time of the
    # first generated token (drives the TTFT percentiles in stats()).
    t_submit: float = field(default_factory=time.monotonic)
    t_first: Optional[float] = None
    # Rolling per-token scores (stop-sequence trimming refunds them).
    recent_scores: List[float] = field(default_factory=list)
    max_stop_len: int = 0

    def __post_init__(self):
        self.max_stop_len = max(
            (len(s) for s in self.stop_sequences), default=0)


class ContinuousBatcher:
    """Continuous batching front-end over a ``Generator``'s model.

    Serves every decoder position family: rotary / learned / sinusoidal /
    ALiBi / T5 relative bias / Shaw relative positions (position-dependent
    biases are rebuilt per step from each slot's own row position).

    Construction fixes the options *signature* (beam width, defaults);
    sampling settings (topk/topp/temperature/seed), end tokens, stop
    sequences, streaming callbacks, repetition_penalty,
    no_repeat_ngram_size and suppress_tokens are per request on
    ``submit``, mirroring the reference's per-call option structs
    (include/ctranslate2/generation.h:14-78).
    """

    def __init__(self, generator, **kw):
        model = generator.model
        if not model.is_decoder_only:
            raise ValueError("ContinuousBatcher requires a decoder-only model")
        self._init_common(model, **kw)
        self._start_loop()

    def _init_common(
        self,
        model,
        *,
        num_slots: int = 8,
        capacity: int = 1024,
        end_token=None,
        suppress_tokens: Sequence[str] = (),
        sampling_topk: int = 1,
        sampling_topp: float = 1.0,
        sampling_temperature: float = 1.0,
        repetition_penalty: float = 1.0,
        no_repeat_ngram_size: int = 0,
        seed: int = 0,
        prefill_bucket: int = 16,
        steps_per_sync: int = 8,
        speculation_k: int = 0,
        draft_model=None,
        max_sampling_topk: int = 64,
        max_no_repeat_ngram_size: int = 8,
        beam_size: int = 1,
        num_hypotheses: int = 1,
        length_penalty: float = 1.0,
        patience: float = 1.0,
        pipeline_depth: int = None,
    ):
        self._beam = max(1, int(beam_size))
        self._bsample = False
        if self._beam > 1:
            # Beam serving (reference: beam search is the serving default,
            # src/decoding.cc:411-720): K beam rows per slot, candidate
            # bookkeeping fully on device (same algorithm as the batch
            # engine's build_beam_loop, per-slot vectors instead of
            # scalars). Sampling composes with beam per request
            # (reference RandomSampler + beam, src/sampling.cc:60-92):
            # candidate selection switches to per-row Gumbel-top-2K
            # draws for rows with topk != 1, mirroring the batch
            # engine's gumbel beam sampling (decoding/device_loop.py).
            self._bsample = not (sampling_topk == 1
                                 and sampling_topp >= 1.0)
            if speculation_k or draft_model is not None:
                raise NotImplementedError(
                    "speculation requires greedy decoding (beam_size=1)")
            if not (1 <= num_hypotheses <= self._beam):
                raise ValueError(
                    "num_hypotheses must be in [1, beam_size]")
        self._num_hyp = int(num_hypotheses)
        self._length_penalty = float(length_penalty)
        self._max_candidates = max(1, round(self._beam * patience))
        self._allow_early_exit = length_penalty == 0
        if speculation_k:
            if not (sampling_topk == 1 and sampling_topp >= 1.0):
                raise NotImplementedError(
                    "speculation requires greedy decoding (losslessness of "
                    "draft verification is only guaranteed under argmax)")
            if T.ring_capacity(model.arch):
                # Ring verify chunks reuse the ring_window_bias formula,
                # which is exact while a chunk spans at most one window.
                min_window = min(
                    (l.self_attention.sliding_window
                     for l in model.arch.decoder.layers
                     if l.self_attention.sliding_window > 1),
                    default=0)
                if min_window and speculation_k > min_window:
                    raise ValueError(
                        f"speculation_k ({speculation_k}) must not exceed "
                        f"the smallest sliding window ({min_window}) of a "
                        "ring-cached model")
        if draft_model is not None and speculation_k <= 1:
            raise ValueError("draft_model requires speculation_k > 1")
        self.model = model
        self._vocab = model.target_vocabulary
        self._num_slots = num_slots
        self._capacity = capacity
        self._prefill_bucket = prefill_bucket
        # Steps per device dispatch: an in-jit lax.scan advances all slots
        # `block` tokens between host syncs, amortizing dispatch overhead;
        # harvest/admit happen at block boundaries. 1 = per-token control.
        self._block = max(1, steps_per_sync)
        # Prompt-lookup speculation: the host drafts spec_k-1 tokens by
        # n-gram continuation from the request's own context; ONE T=spec_k
        # verify dispatch accepts 1..spec_k tokens (lossless under greedy).
        # Directly attacks small-batch MXU under-utilization: the verify
        # matmuls run S*spec_k rows instead of S.
        self._spec_k = max(0, int(speculation_k))
        self._greedy = sampling_topk == 1 and sampling_topp >= 1.0
        self._topk = sampling_topk
        self._topp = sampling_topp
        self._temperature = sampling_temperature
        # Repetition penalty over each slot's generated tokens (reference
        # RepetitionPenalty semantics, decoding/processors.py): tracked as
        # a per-slot [V] presence table on device. Both penalties are
        # per-request (vectorized per slot); the batcher values are the
        # defaults.
        self._rep_penalty = float(repetition_penalty)
        self._ngram = int(no_repeat_ngram_size)
        self._max_ngram = max(int(max_no_repeat_ngram_size), self._ngram, 2)
        v = self._vocab
        if end_token is None or end_token == "":
            self._end_ids = (v.eos_id,)
        elif isinstance(end_token, str):
            self._end_ids = (v.to_id(end_token, allow_unk=False),)
        else:
            self._end_ids = tuple(
                t if isinstance(t, int) else v.to_id(t, allow_unk=False)
                for t in end_token)
        self._suppress_ids = tuple(
            v.to_id(t, allow_unk=False) for t in suppress_tokens)
        self._key = jax.random.PRNGKey(seed)

        model.ensure_consts(capacity)

        # Penalty tables: [S, V] generated-token presence (repetition
        # penalty) and [S, capacity] generated-token history
        # (no-repeat-ngram; entry t = the t-th generated token). Zero-row
        # tables mean "penalties off": the jitted step functions key on
        # the static shape, so enabling them (at construction, or lazily
        # when the first request carries an override) only changes the
        # argument shapes and jax.jit recompiles — no closure rebuild.
        pen_rows = (num_slots
                    if (self._rep_penalty != 1.0 or self._ngram) else 0)
        self._seen = jnp.zeros((pen_rows, len(v)), jnp.bool_)
        self._hist = jnp.zeros((pen_rows, capacity), jnp.int32)

        def _hist_admit(hist, slot, tok):
            # tok < 0 resets the row without recording a token (entry 0
            # is then dead until the first in-step scatter overwrites it).
            row = jnp.zeros((hist.shape[1],), jnp.int32).at[0].set(
                jnp.maximum(tok, 0))
            return jax.lax.dynamic_update_slice(hist, row[None], (slot, 0))

        def _hist_accept(hist, toks, counts, gen_len):
            # toks [S, K] emitted tokens of a speculative round; row s
            # accepted counts[s], written at gen_len[s]..+counts[s]-1.
            S_h, K_h = toks.shape
            Lh = hist.shape[1]
            valid = (jnp.arange(K_h, dtype=jnp.int32)[None]
                     < counts[:, None])
            posn = (gen_len[:, None]
                    + jnp.arange(K_h, dtype=jnp.int32)[None])
            posn = jnp.where(valid & (posn < Lh), posn, Lh)
            rows = jnp.broadcast_to(
                jnp.arange(S_h, dtype=jnp.int32)[:, None], toks.shape)
            return hist.at[rows, posn].set(toks, mode="drop")

        self._hist_admit = jax.jit(_hist_admit, donate_argnums=(0,))
        self._hist_accept = jax.jit(_hist_accept, donate_argnums=(0,))

        def _seen_admit(seen, slot, tok):
            # tok < 0 resets the row empty (mode="drop" discards the
            # negative scatter index instead of wrapping it).
            row = jnp.zeros((seen.shape[1],), jnp.bool_).at[tok].set(
                True, mode="drop")
            return jax.lax.dynamic_update_slice(seen, row[None], (slot, 0))

        def _seen_accept(seen, toks, counts):
            # toks [S, K] emitted tokens; rows valid up to counts[s].
            K = toks.shape[1]
            valid = (jnp.arange(K, dtype=jnp.int32)[None]
                     < counts[:, None])
            rows = jnp.broadcast_to(
                jnp.arange(seen.shape[0], dtype=jnp.int32)[:, None],
                toks.shape)
            return seen.at[rows, toks].max(valid)

        self._seen_admit = jax.jit(_seen_admit, donate_argnums=(0,))
        self._seen_accept = jax.jit(_seen_accept, donate_argnums=(0,))

        # Device state (owned by the scheduler thread after start).
        # Windowed layers use O(window) ring buffers (single-token decode).
        self._ring = T.ring_capacity(model.arch)
        self._cache = T.init_self_cache(
            model.arch, num_slots * self._beam, capacity,
            dtype=model.kv_dtype, stacked=model.scan_layers, ring=True)
        if self._beam > 1:
            self._beam_has_memory = model.is_sequence_to_sequence
            self._step_fn = None
            # Built lazily in _decode_step_beam: the step's candidate
            # selection keys on self._bsample, which a later request's
            # sampling override may flip (recompile, like the penalty
            # tables).
            self._beam_step_fn = None
            self._bsample_compiled = None
            self._beam_reset_fn = self._build_beam_reset()
            self._cache_prefill_fns = {}
            # The hypothesis store is sized at K rows (the per-request
            # num_hypotheses ceiling); the ctor value is the default.
            K, M, L = self._beam, self._beam, capacity
            self._bstate = {
                "tokens": jnp.zeros((num_slots, K), jnp.int32),
                "pos": jnp.zeros((num_slots,), jnp.int32),
                "gen": jnp.zeros((num_slots,), jnp.int32),
                "scores": jnp.full((num_slots, K), -1e10, jnp.float32),
                "alive": jnp.zeros((num_slots, K, L), jnp.int32),
                # Per-position cumulative scores along each alive beam /
                # stored hypothesis: stop-sequence trimming refunds the
                # matched suffix and streaming reports per-token scores.
                "alive_sc": jnp.zeros((num_slots, K, L), jnp.float32),
                "store_seqs": jnp.zeros((num_slots, M, L), jnp.int32),
                "store_sc": jnp.zeros((num_slots, M, L), jnp.float32),
                "store_lens": jnp.zeros((num_slots, M), jnp.int32),
                "store_scores": jnp.full((num_slots, M), -jnp.inf,
                                         jnp.float32),
                "store_count": jnp.zeros((num_slots,), jnp.int32),
                "top_fin": jnp.zeros((num_slots,), jnp.bool_),
                "active": jnp.zeros((num_slots,), jnp.bool_),
            }
            self._b_active_host = np.zeros(num_slots, bool)
            # Per-slot hypothesis targets and stop-sequence tables (the
            # stop tables start zero-size — exact no-op — and grow on the
            # first request that carries stop_sequences, recompiling the
            # step like the penalty tables do).
            self._nhyps = np.full(num_slots, self._num_hyp, np.int32)
            self._bstop_tab = np.full((num_slots, 0, 0), -1, np.int32)
            self._bstop_len = np.zeros((num_slots, 0), np.int32)
            self._bpen = (self._rep_penalty != 1.0 or self._ngram > 0)
        else:
            self._step_fn = (self._build_spec_step() if self._spec_k > 1
                             else self._build_step())
        self._prefill_fns = {}
        self._insert_fn = jax.jit(
            T.cache_insert_row, donate_argnums=(0,))

        # Device-resident slot control state for the block engines
        # (tokens/pos/gen carried on device between dispatches): block
        # N+1 can be dispatched from block N's returned state BEFORE the
        # host has fetched block N's tokens — the double-buffered
        # pipeline that hides the dispatch+fetch round-trip (reference
        # anchor: the replica pool's always-busy workers,
        # include/ctranslate2/replica_pool.h:19-300). Admits write the
        # slot's row through a jitted scatter that queues after any
        # in-flight block.
        if self._beam == 1 and self._spec_k <= 1:
            self._dstate = {
                "tokens": jnp.zeros((num_slots,), jnp.int32),
                "pos": jnp.zeros((num_slots,), jnp.int32),
                "gen": jnp.zeros((num_slots,), jnp.int32),
            }
        else:
            self._dstate = None

        def _slot_write(state, slot, tok, p, g):
            return {
                "tokens": state["tokens"].at[slot].set(tok),
                "pos": state["pos"].at[slot].set(p),
                "gen": state["gen"].at[slot].set(g),
            }

        self._slot_write = jax.jit(_slot_write, donate_argnums=(0,))

        # Pipeline depth: how many blocks may be in flight at once.
        # 2 (double buffering) hides the host round-trip behind the next
        # block's device time; speculation is host-driven (depth 1) and
        # multi-host keeps the lockstep record-per-iteration protocol.
        if pipeline_depth is None:
            pipeline_depth = int(os.environ.get(
                "CT2TPU_PIPELINE_DEPTH", "2"))
        self._depth = max(1, min(int(pipeline_depth), 4))
        if self._spec_k > 1:
            self._depth = 1
        self._ttfts = deque(maxlen=10000)

        # Draft-MODEL speculation (lossless, same verify machinery as
        # prompt-lookup): a small model proposes spec_k-1 tokens in ONE
        # scanned dispatch; the target verifies them in one T=spec_k
        # forward. The draft's cache needs no rollback — its valid prefix
        # always equals the target's accepted prefix, because a draft
        # token is only fed (and cached) at position p+1 after the target
        # accepted the token at position p.
        self._draft_model = None
        if draft_model is not None:
            dm = draft_model
            if isinstance(dm, str):
                from ..models.loader import load_model as _load_model

                dm = _load_model(dm, compute_type="default")
            # Accept a task object (Generator/Translator) or a LoadedModel.
            self._init_draft(getattr(dm, "model", dm))

        # Host slot state.
        self._slots: List[Optional[_Request]] = [None] * num_slots
        self._pos = np.zeros(num_slots, np.int32)
        self._tokens = np.zeros(num_slots, np.int32)
        self._temps = np.full(num_slots, self._temperature or 1.0,
                              np.float32)
        # Per-slot sampling state (per-request overrides; defaults = the
        # batcher's options). topk semantics: 1 = greedy, 0 = full vocab.
        self._max_topk = max(int(max_sampling_topk),
                             self._topk if 1 < self._topk else 1)
        self._topks = np.full(num_slots, max(self._topk, 0), np.int32)
        self._topps = np.full(num_slots, min(self._topp, 1.0), np.float32)
        self._seeds = np.full(num_slots, seed, np.int32)
        # Per-slot end-token table [S, E] (-1 padding rows).
        self._end_cols = max(4, len(self._end_ids))
        self._end_table = np.full((num_slots, self._end_cols), -1, np.int32)
        for e, eid in enumerate(self._end_ids):
            self._end_table[:, e] = eid
        # Per-slot logits-processor values (per-request overrides; the
        # batcher options are the defaults). The suppress table starts
        # zero-width (exact no-op) and grows on the first request that
        # carries per-request suppress_tokens.
        self._rep_pens = np.full(num_slots, self._rep_penalty, np.float32)
        self._ngrams = np.full(num_slots, self._ngram, np.int32)
        self._sup_table = np.full((num_slots, 0), -1, np.int32)
        self._step_count = 0
        self._steps_while_pending = 0
        # Serving counters (ExecutionStats analog for the continuous
        # engine: reference include/ctranslate2/translator.h:9-13 +
        # replica_pool introspection).
        self._tokens_out = 0
        self._requests_done = 0
        self._slot_steps = 0  # slot-step occupancy numerator
        self._accepted_tokens = 0  # speculation: tokens emitted
        self._spec_dispatches = 0  # speculation: per-slot verify dispatches
        import time as _time

        self._started_at = _time.monotonic()

        self._queue: "queue.Queue[_Request]" = queue.Queue()
        self._closed = False
        self._wake = threading.Event()

        # Multi-host serving: every process constructs the batcher with
        # the SAME kwargs (like the batch APIs under tensor_parallel);
        # process 0 leads, the rest follow (_leader_loop/_follower_loop).
        self._dist = None
        if jax.process_count() > 1:
            if self._draft_model is not None:
                raise NotImplementedError(
                    "draft-model speculation is not supported in "
                    "multi-host continuous serving yet")
            mesh = getattr(model, "mesh", None)
            if mesh is None:
                raise ValueError(
                    "multi-host continuous serving requires the model to "
                    "be loaded with tensor_parallel=True (a global mesh)")
            self._dist = _DistControl()
            from ..parallel.sharding import shard_cache, NamedSharding, P

            # Device state must be GLOBAL arrays on the mesh: the KV
            # cache with its TP layout, everything else replicated.
            # Round-trip through host values — device_put from uniform
            # host data forms global arrays on every process.
            self._cache = shard_cache(
                jax.tree.map(np.asarray, self._cache), model.arch, mesh)
            rep = NamedSharding(mesh, P())

            def _replicate(x):
                return jax.device_put(np.asarray(x), rep)

            self._seen = _replicate(self._seen)
            self._hist = _replicate(self._hist)
            if self._beam > 1:
                self._bstate = jax.tree.map(_replicate, self._bstate)
            if self._dstate is not None:
                self._dstate = jax.tree.map(_replicate, self._dstate)
            # Multi-host keeps the lockstep one-record-per-iteration
            # protocol: no speculative block pipelining.
            self._depth = 1
            # PRNG keys stay host-side so they enter jit as replicated
            # values on every process.
            self._key = np.asarray(self._key)

    def _init_draft(self, dm):
        if not dm.is_decoder_only:
            raise ValueError("draft_model must be a decoder-only model")
        if T.ring_capacity(dm.arch):
            raise NotImplementedError(
                "sliding-window draft models are not supported")
        if len(dm.target_vocabulary) != len(self._vocab):
            raise ValueError(
                "draft model vocabulary size "
                f"({len(dm.target_vocabulary)}) must match the target "
                f"model ({len(self._vocab)})")
        dm.ensure_consts(self._capacity)
        self._draft_model = dm
        self._draft_cache = T.init_self_cache(
            dm.arch, self._num_slots, self._capacity, dtype=dm.kv_dtype,
            stacked=dm.scan_layers, ring=True)
        self._draft_fn = self._build_draft_fn()
        self._draft_prefill_fns = {}

    def _start_loop(self):
        # The scheduler thread compiles the block-step executables: give
        # it the same large stack as the pool workers (see
        # pool.spawn_compile_thread — the default stack segfaults inside
        # XLA:CPU's compiler on big device-loop graphs).
        from .pool import spawn_compile_thread

        self._thread = spawn_compile_thread(
            self._loop, name="ct2tpu-continuous")

    # ------------------------------------------------------------------
    # Public API.
    # ------------------------------------------------------------------

    def submit(self, prompt: Sequence[str], *, max_length: int = 256,
               min_length: int = 0,
               sampling_temperature: float = None,
               sampling_topk: int = None,
               sampling_topp: float = None,
               seed: int = None,
               end_token=None,
               repetition_penalty: float = None,
               no_repeat_ngram_size: int = None,
               suppress_tokens: Sequence = None,
               num_hypotheses: int = None,
               callback=None,
               stop_sequences: Sequence[Sequence] = None) -> Future:
        """Queue one prompt; the Future resolves to a GenerationResult
        holding the GENERATED continuation (prompt not included).

        ``callback`` streams tokens: called with a GenerationStepResult
        per generated token from the scheduler thread (keep it cheap — it
        blocks the decode loop); return True to stop this request early
        (reference callback semantics). A callback exception cancels the
        request and surfaces through its future."""
        if self._closed:
            raise RuntimeError("The batcher is closed")
        self._check_distributed_submit(callback)
        if not prompt:
            raise ValueError("The prompt must contain at least one token")
        ids = [self._vocab.to_id(t) if isinstance(t, str) else int(t)
               for t in prompt]
        margin = max(self._block, self._spec_k)
        if len(ids) + max_length + margin > self._capacity:
            raise ValueError(
                f"prompt ({len(ids)}) + max_length ({max_length}) + "
                f"dispatch margin ({margin}) exceeds the slot "
                f"capacity ({self._capacity})")
        self._validate_request_sampling(sampling_topk, sampling_topp, seed)
        self._validate_beam_request(num_hypotheses)
        rep, ngram, sup_ids = self._validate_request_penalties(
            repetition_penalty, no_repeat_ngram_size, suppress_tokens)
        # Window models: prompts longer than one ring block run through
        # the chunked prefill path (see _prefill_chunked).
        req = _Request(prompt_ids=ids, max_length=max_length,
                       min_length=min_length,
                       temperature=sampling_temperature or 0.0,
                       topk=sampling_topk, topp=sampling_topp, seed=seed,
                       end_ids=self._resolve_request_end_ids(end_token),
                       rep_penalty=rep, ngram=ngram, suppress_ids=sup_ids,
                       num_hypotheses=num_hypotheses,
                       callback=callback,
                       stop_sequences=self._stop_ids(stop_sequences))
        self._queue.put(req)
        self._wake.set()
        return req.future

    def stream(self, *args, **kwargs):
        """Iterator of GenerationStepResults for one request — the
        serving-side analog of ``generate_tokens``. Arguments are passed
        to :meth:`submit`. Closing the iterator (``break`` +
        ``.close()``, or garbage collection) stops the request early;
        request errors re-raise at the end of iteration."""
        import queue as _queue

        q: "_queue.Queue" = _queue.Queue()
        stop = threading.Event()

        def on_token(sr):
            q.put(sr)
            return stop.is_set()

        future = self.submit(*args, callback=on_token, **kwargs)
        future.add_done_callback(lambda f: q.put(None))
        finished = False
        try:
            while True:
                item = q.get()
                if item is None:
                    finished = True
                    break
                yield item
        finally:
            stop.set()
            if finished:
                future.result()  # surface request errors
            else:
                # Early close: wait for the stop to take effect; the
                # consumer walked away, so swallow request errors.
                self._settle(future)

    async def async_stream(self, *args, **kwargs):
        """Asyncio variant of :meth:`stream` (per-token
        GenerationStepResults for one request, e.g. for SSE handlers)."""
        import asyncio

        loop = asyncio.get_running_loop()
        q: "asyncio.Queue" = asyncio.Queue()
        stop = threading.Event()

        def on_token(sr):
            loop.call_soon_threadsafe(q.put_nowait, sr)
            return stop.is_set()

        future = self.submit(*args, callback=on_token, **kwargs)
        future.add_done_callback(
            lambda f: loop.call_soon_threadsafe(q.put_nowait, None))
        finished = False
        try:
            while True:
                item = await q.get()
                if item is None:
                    finished = True
                    break
                yield item
        finally:
            stop.set()
            if finished:
                future.result()
            else:
                await loop.run_in_executor(None, self._settle, future)

    @staticmethod
    def _settle(future):
        try:
            future.result(timeout=600)
        except Exception:
            pass

    def _req_end_ids(self, req) -> tuple:
        """The request's end-token ids (per-request end_token override or
        the batcher default)."""
        return req.end_ids if req.end_ids is not None else self._end_ids

    def _resolve_request_end_ids(self, end_token):
        """Map a per-request ``end_token`` (token/ids or list) to ids,
        bounded by the slot end-table width."""
        if end_token is None:
            return None
        v = self._vocab
        if isinstance(end_token, str):
            ids = (v.to_id(end_token, allow_unk=False),)
        else:
            ids = tuple(t if isinstance(t, int)
                        else v.to_id(t, allow_unk=False) for t in end_token)
        if not ids:
            return None
        if len(ids) > self._end_cols:
            raise ValueError(
                f"end_token lists up to {self._end_cols} ids per request")
        return ids

    def _ensure_pen_tables(self) -> None:
        """Allocate the seen/hist penalty tables on first use, exactly
        backfilling the generated history of every in-flight slot from
        the host-side request records (runs on the scheduler thread)."""
        if self._seen.shape[0]:
            return
        S, V, C = self._num_slots, len(self._vocab), self._capacity
        seen = np.zeros((S, V), bool)
        hist = np.zeros((S, C), np.int32)
        for s, req in enumerate(self._slots):
            if req is None:
                continue
            gen = req.generated[:C]
            hist[s, : len(gen)] = gen
            seen[s, gen] = True
        if self._dist is not None:
            # Multi-host: the tables must be GLOBAL replicated arrays
            # like the rest of the device state (both sides allocate at
            # the same admit, so the backfill is identical).
            from ..parallel.sharding import NamedSharding, P

            rep = NamedSharding(self.model.mesh, P())
            self._seen = jax.device_put(seen, rep)
            self._hist = jax.device_put(hist, rep)
        else:
            self._seen = jnp.asarray(seen)
            self._hist = jnp.asarray(hist)

    def _set_slot_sampling(self, slot: int, req: _Request) -> None:
        """Write the request's sampling overrides into the per-slot
        device-step arrays (defaults = the batcher's options)."""
        self._temps[slot] = req.temperature or self._temperature or 1.0
        self._topks[slot] = (req.topk if req.topk is not None
                             else max(self._topk, 0))
        self._topps[slot] = (req.topp if req.topp is not None
                             else min(self._topp, 1.0))
        self._seeds[slot] = (req.seed if req.seed is not None else 0)
        self._end_table[slot, :] = -1
        for e, eid in enumerate(self._req_end_ids(req)):
            self._end_table[slot, e] = eid
        rp = (req.rep_penalty if req.rep_penalty is not None
              else self._rep_penalty)
        ng = req.ngram if req.ngram is not None else self._ngram
        if rp != 1.0 or ng:
            self._ensure_pen_tables()
        self._rep_pens[slot] = rp
        self._ngrams[slot] = ng
        self._set_slot_suppress(slot, req)

    def _set_slot_suppress(self, slot: int, req: _Request) -> None:
        """Per-request suppress_tokens into the [S, W] id table (grows
        on demand; zero width is an exact no-op)."""
        sup = req.suppress_ids or ()
        if len(sup) > self._sup_table.shape[1]:
            W = _round_up(len(sup), 4)
            grown = np.full((self._num_slots, W), -1, np.int32)
            grown[:, : self._sup_table.shape[1]] = self._sup_table
            self._sup_table = grown
        self._sup_table[slot, :] = -1
        self._sup_table[slot, : len(sup)] = sup

    def _validate_request_sampling(self, topk, topp, seed) -> None:
        if topk is not None and topk != 0 and not (
                1 <= topk <= self._max_topk):
            raise ValueError(
                f"per-request sampling_topk must be 0 (full vocabulary) or "
                f"in [1, {self._max_topk}] (raise max_sampling_topk at "
                "construction for larger values)")
        if self._spec_k > 1 and (
                (topk is not None and topk != 1)
                or (topp is not None and topp < 1.0)):
            raise NotImplementedError(
                "speculation requires greedy decoding; per-request "
                "sampling overrides must keep topk=1/topp=1")

    def _validate_request_penalties(self, rep_penalty, ngram,
                                    suppress_tokens) -> tuple:
        """Validate per-request logits-processor overrides and resolve
        suppress tokens to ids. Returns (rep_penalty, ngram, sup_ids)."""
        if rep_penalty is not None and rep_penalty <= 0:
            raise ValueError("repetition_penalty must be positive")
        if ngram is not None and ngram != 0:
            if ngram < 2:
                raise ValueError("no_repeat_ngram_size must be 0 or >= 2")
            if ngram > self._max_ngram:
                raise ValueError(
                    f"per-request no_repeat_ngram_size must be <= "
                    f"{self._max_ngram} (raise max_no_repeat_ngram_size "
                    "at construction for larger values)")
        sup_ids = None
        if suppress_tokens:
            v = self._vocab
            sup_ids = tuple(
                t if isinstance(t, int) else v.to_id(t, allow_unk=False)
                for t in suppress_tokens)
        return rep_penalty, ngram, sup_ids

    def _check_distributed_submit(self, callback) -> None:
        if self._dist is None:
            return
        if not self._dist.is_leader:
            raise RuntimeError(
                "multi-host continuous serving: submit() is leader-only "
                "(process 0); this process is a follower")
        # Streaming callbacks run on the leader only; a callback-driven
        # early stop becomes effective when it is broadcast in the next
        # control record (see _leader_loop_inner), keeping the follower
        # replay in lockstep.

    def _validate_beam_request(self, num_hypotheses) -> None:
        """Per-request num_hypotheses: under beam serving any value in
        [1, beam_size]; the greedy engines return a single hypothesis."""
        if num_hypotheses is None:
            return
        if self._beam > 1:
            if not (1 <= num_hypotheses <= self._beam):
                raise ValueError(
                    f"num_hypotheses must be in [1, beam_size] "
                    f"(= [1, {self._beam}])")
        elif num_hypotheses != 1:
            raise NotImplementedError(
                "num_hypotheses > 1 requires beam serving (construct "
                "with beam_size > 1) or the batch APIs")

    def _stop_ids(self, stop_sequences) -> tuple:
        v = self._vocab
        for seq in (stop_sequences or ()):
            if isinstance(seq, str):
                raise ValueError(
                    "each stop sequence must be a list of tokens or ids "
                    f"(got the string {seq!r}; wrap single tokens in a "
                    "list)")
        return tuple(
            tuple(t if isinstance(t, int) else v.to_id(t, allow_unk=False)
                  for t in seq)
            for seq in (stop_sequences or ()) if seq)

    def _emit(self, req: _Request, tok: int, score: float) -> None:
        """Append one generated token and stream it to the request's
        callback (is_last reflects the end/max-length conditions the
        decode loops break on)."""
        req.generated.append(tok)
        req.score += score
        if req.t_first is None:
            req.t_first = time.monotonic()
            self._ttfts.append(req.t_first - req.t_submit)
        if req.stop_sequences:
            req.recent_scores.append(score)
            del req.recent_scores[: -req.max_stop_len]
            forced = getattr(req, "forced_len", 0)
            for seq in req.stop_sequences:
                n = len(seq)
                # Stops apply to generated tokens only: the matched suffix
                # must lie entirely beyond the forced prefix.
                if len(req.generated) >= forced + n and \
                        tuple(req.generated[-n:]) == seq:
                    del req.generated[-n:]
                    req.score -= sum(req.recent_scores[-n:])
                    req.stopped = True
                    return
        if req.callback is None or req.stopped:
            return
        done = ((tok in self._req_end_ids(req)
                 and len(req.generated) > req.min_length)
                or len(req.generated) >= req.max_length)
        try:
            if req.callback(GenerationStepResult(
                    step=len(req.generated) - 1, batch_id=0,
                    token_id=tok, hypothesis_id=0,
                    token=self._vocab.to_token(tok),
                    score=score, is_last=done)):
                req.stopped = True
                req.stop_len = len(req.generated)
                req.stop_score = req.score
        except BaseException as e:  # noqa: BLE001
            req.callback_error = e
            req.stopped = True
            req.stop_len = len(req.generated)
            req.stop_score = req.score

    @property
    def num_active_slots(self) -> int:
        return sum(1 for s in self._slots if s is not None)

    @property
    def num_queued_requests(self) -> int:
        return self._queue.qsize()

    def stats(self) -> dict:
        """Serving counters: generated tokens, finished requests, decode
        steps, mean slot occupancy, tokens/s and time-to-first-token
        percentiles since construction."""
        import time as _time

        dt = max(_time.monotonic() - self._started_at, 1e-9)
        tt = np.asarray(self._ttfts, np.float64)
        return {
            "ttft_mean_ms": (float(tt.mean() * 1e3) if tt.size else None),
            "ttft_p50_ms": (float(np.percentile(tt, 50) * 1e3)
                            if tt.size else None),
            "ttft_p95_ms": (float(np.percentile(tt, 95) * 1e3)
                            if tt.size else None),
            "pipeline_depth": self._depth,
            "num_tokens": self._tokens_out,
            "num_requests": self._requests_done,
            "num_steps": self._step_count,
            "tokens_per_sec": self._tokens_out / dt,
            "mean_slot_occupancy": (
                self._slot_steps / max(self._step_count * self._num_slots, 1)),
            "uptime_s": dt,
            "spec_tokens_per_dispatch": (
                self._accepted_tokens / max(self._spec_dispatches, 1)
                if self._spec_k > 1 else None),
            "spec_draft": (None if self._spec_k <= 1 else
                           "model" if self._draft_model is not None
                           else "prompt-lookup"),
            "num_queued": self._queue.qsize(),
        }

    @property
    def num_steps(self) -> int:
        """Total decode steps dispatched (each advances every active slot)."""
        return self._step_count

    def close(self):
        self._closed = True
        self._wake.set()
        self._thread.join(timeout=30)

    def join(self, timeout: Optional[float] = None) -> None:
        """Block until the scheduler thread exits. Multi-host followers
        use this to wait for the leader's close broadcast (the leader
        must be closed first; follower close() alone cannot interrupt
        the blocking collective recv)."""
        self._thread.join(timeout)

    # ------------------------------------------------------------------
    # Jitted pieces.
    # ------------------------------------------------------------------

    def _end_mask(self, end_table, V: int):
        """[S, V] bool mask of each slot's end tokens (per-request
        end_token; -1 table entries drop)."""
        S = end_table.shape[0]
        rows = jnp.broadcast_to(
            jnp.arange(S, dtype=jnp.int32)[:, None], end_table.shape)
        return jnp.zeros((S, V), jnp.bool_).at[rows, end_table].set(
            True, mode="drop")

    def _sample_logits(self, l, disable_end, key, temps, topks=None,
                       topps=None, seeds=None, end_table=None,
                       sup_table=None):
        """Row-vectorized sampling with per-request
        topk/topp/temperature/seed/end_token (reference: per-call options
        through the buffered wrapper, translation.h:11-86). Rows with
        topk == 1 take the greedy pick; scores are reported from the raw
        distribution (reference RandomSampler gathers unmodified scores,
        src/sampling.cc:94-99)."""
        from ..decoding.sampling import sample_tokens_per_row

        l = l.astype(jnp.float32)
        l = proc.disable_tokens(l, self._suppress_ids)
        if sup_table is not None:
            l = proc.disable_tokens_per_row(l, sup_table)
        if end_table is not None:
            l = jnp.where(
                disable_end[:, None] & self._end_mask(end_table, l.shape[-1]),
                proc.DISABLE, l)
        else:
            l = proc.disable_tokens_if(l, self._end_ids, disable_end)
        S = l.shape[0]
        if topks is None:
            topks = jnp.full((S,), max(self._topk, 0), jnp.int32)
        if topps is None:
            topps = jnp.full((S,), min(self._topp, 1.0), jnp.float32)
        if seeds is None:
            seeds = jnp.zeros((S,), jnp.int32)
        log_probs = jax.nn.log_softmax(l, axis=-1)
        return sample_tokens_per_row(
            log_probs, key, topks=topks, topps=topps,
            temps=(temps if temps is not None
                   else jnp.full((S,), self._temperature or 1.0)),
            seeds=seeds, max_topk=self._max_topk)

    def _apply_rep_penalty(self, l, seen, penalties, intra=None):
        """Reference RepetitionPenalty: positive logits divided, negative
        multiplied (processors.py:35-48), with a per-row penalty vector
        (1.0 rows are an exact no-op). ``penalties`` [S] broadcasts into
        ``l``'s shape; ``seen`` may broadcast against an optional
        intra-chunk mask."""
        P = penalties.reshape(penalties.shape + (1,) * (l.ndim - 1))
        mask = seen if intra is None else (seen | intra)
        penalized = jnp.where(l > 0, l / P, l * P)
        return jnp.where(mask, penalized, l)

    def _build_step(self):
        model = self.model
        arch = model.arch
        quantize_acts = model.policy.quantize_activations
        out_dtype = model.out_dtype
        max_ngram = self._max_ngram
        cap = self._capacity

        block = self._block

        def step(params, consts, cache, state, min_len,
                 temps, topks, topps, seeds, end_table, sup_table,
                 rep_pens, ngrams, key, n, seen, hist):
            # Slot control state (tokens/pos/gen) lives on device so the
            # next block can be dispatched from this block's returned
            # state without a host round-trip (see _dispatch_block).
            tokens, pos, gen_len = (state["tokens"], state["pos"],
                                    state["gen"])
            # Overshoot clamp: a slot that finished while a speculative
            # block was in flight keeps advancing until re-admitted; its
            # writes stay inside the buffer (the admit prefill resets
            # the row).
            pos = jnp.minimum(pos, cap - block)
            # Penalties compile in iff the tables have rows (the host
            # enables them by allocating [S, ...] tables; 1.0/0 rows are
            # exact no-ops so mixed traffic shares one dispatch).
            pen = seen.shape[0] > 0

            def body(carry, i):
                tokens, pos, gen_len, cache, seen, hist = carry
                logits, cache, _ = T.decoder_forward(
                    arch, params, consts, tokens[:, None], pos, cache,
                    None, None, quantize_acts=quantize_acts,
                    out_dtype=out_dtype)
                l = logits[:, -1].astype(jnp.float32)
                if pen:
                    l = self._apply_rep_penalty(l, seen, rep_pens)
                    l = proc.no_repeat_ngram_per_row(
                        l, hist, gen_len, ngrams, max_ngram)
                disable_end = gen_len < min_len
                ids, scores = self._sample_logits(
                    l, disable_end,
                    jax.random.fold_in(key, n * block + i), temps=temps,
                    topks=topks, topps=topps, seeds=seeds,
                    end_table=end_table, sup_table=sup_table)
                rows = jnp.arange(ids.shape[0])
                if pen:
                    seen = seen.at[rows, ids].set(True)
                    hist = hist.at[rows, gen_len].set(ids)
                return ((ids, pos + 1, gen_len + 1, cache, seen, hist),
                        (ids, scores))

            (tokens, pos, gen_len, cache, seen, hist), (ids_k, scores_k) = \
                jax.lax.scan(
                    body, (tokens, pos, gen_len, cache, seen, hist),
                    jnp.arange(block, dtype=jnp.int32))
            out_state = {"tokens": tokens, "pos": pos, "gen": gen_len}
            return ids_k, scores_k, cache, out_state, seen, hist

        return jax.jit(step, donate_argnums=(2, 3, 15, 16))

    # ------------------------------------------------------------------
    # Continuous beam search (reference: beam is the serving default,
    # src/decoding.cc:411-720). K beam rows per slot; the candidate
    # bookkeeping of the batch engine's build_beam_loop runs per slot with
    # vector step counters, so slots at different generation depths share
    # one dispatch. All beam state is device-resident; the host fetches
    # only the [S] active flags per block and a finished slot's store rows.
    # ------------------------------------------------------------------

    def _build_beam_step(self):
        model = self.model
        arch = model.arch
        quantize_acts = model.policy.quantize_activations
        out_dtype = model.out_dtype
        K, M = self._beam, self._beam
        K2 = 2 * K
        block = self._block
        lp_pen = self._length_penalty
        max_cand = self._max_candidates
        early = self._allow_early_exit
        NEG = -1e10
        has_memory = self._beam_has_memory
        S_max = getattr(self, "_max_src", 0)
        cap = self._capacity
        from ..decoding.sampling import gumbel_top_k_per_row, small_top_k

        max_ngram = self._max_ngram
        wts = getattr(self, "_wts", None)
        sample = self._bsample
        max_topk = self._max_topk

        def step(params, consts, cache, bstate, min_len, max_len,
                 prefix, plen, end_table, nhyp, stop_tab, stop_lens,
                 rep_pens, ngrams, sup_table, ts_on, temps, topks, topps,
                 seeds, key, n, mem=None, src_len=None):
            S = bstate["gen"].shape[0]
            mem_bias = None
            if has_memory:
                from ..ops import attention as attn_ops

                mem_bias = attn_ops.length_mask_bias(src_len, S_max)
            rows_s = jnp.arange(S, dtype=jnp.int32)
            # Per-slot end tokens (per-request end_token override; -1
            # table entries never match a real token id).
            NS, LS = stop_tab.shape[1], stop_tab.shape[2]
            has_stop = NS > 0 and LS > 0

            def is_end(tok):
                # tok [S, C] -> [S, C] any of the slot's end ids.
                return jnp.any(
                    tok[:, :, None] == end_table[:, None, :], axis=-1)

            def body(it, carry):
                cache, st = carry
                tokens, pos, gen = st["tokens"], st["pos"], st["gen"]
                scores, alive, active = (st["scores"], st["alive"],
                                         st["active"])
                alive_sc = st["alive_sc"]

                fed = tokens.reshape(S * K)
                pos_rows = jnp.repeat(jnp.minimum(pos, cap - 1), K)
                logits, cache, _ = T.decoder_forward(
                    arch, params, consts, fed[:, None], pos_rows, cache,
                    mem, mem_bias, beam_size=K,
                    quantize_acts=quantize_acts, out_dtype=out_dtype)
                l = logits[:, -1].astype(jnp.float32)  # [S*K, V]
                V = l.shape[-1]
                Lb = alive.shape[2]
                l = proc.disable_tokens(l, self._suppress_ids)
                if sup_table.shape[1]:
                    l = proc.disable_tokens_per_row(
                        l, jnp.repeat(sup_table, K, axis=0))
                if rep_pens.shape[0]:
                    # Per-beam-row penalties over each row's own alive
                    # history — the batch engine's alive_seq semantics
                    # (generated tokens only), derived statelessly.
                    alive_flat = alive.reshape(S * K, Lb)
                    gen_rows = jnp.repeat(gen, K)
                    valid = (jnp.arange(Lb, dtype=jnp.int32)[None, :]
                             < gen_rows[:, None])
                    rows_f = jnp.broadcast_to(
                        jnp.arange(S * K, dtype=jnp.int32)[:, None],
                        (S * K, Lb))
                    seen = jnp.zeros((S * K, V), jnp.bool_).at[
                        rows_f, alive_flat].max(valid)
                    l = proc.repetition_penalty_per_row(
                        l, seen, jnp.repeat(rep_pens, K))
                    l = proc.no_repeat_ngram_per_row(
                        l, alive_flat, gen_rows, jnp.repeat(ngrams, K),
                        max_ngram)
                if wts is not None:
                    # Whisper timestamp rules under beam (the reference
                    # default is beam 5 + rules, whisper.cc:742-865):
                    # per beam row over its own alive history, computed
                    # over the suppress/end-disabled state the batch
                    # device loop sees, gated per slot by the prompt.
                    af = alive.reshape(S * K, alive.shape[2])
                    gr = jnp.repeat(gen, K)
                    # l already carries the global + per-row suppressions
                    # applied above; only the min-length end-disable needs
                    # re-deriving here.
                    lp = jnp.where(
                        jnp.repeat(
                            (gen < min_len)[:, None]
                            & self._end_mask(end_table, l.shape[-1]),
                            K, axis=0),
                        proc.DISABLE, l)
                    lp = proc.whisper_timestamp_rules(
                        lp, af, gr, jnp.repeat(plen, K), *wts)
                    l = jnp.where(jnp.repeat(ts_on, K)[:, None], lp, l)
                end_mask = self._end_mask(end_table, V)  # [S, V]
                l = jnp.where(
                    jnp.repeat((gen < min_len)[:, None] & end_mask, K,
                               axis=0),
                    proc.DISABLE, l)

                log_probs = jax.nn.log_softmax(l, axis=-1)
                total = log_probs + scores.reshape(S * K)[:, None]
                flat = total.reshape(S, K * V)
                if sample:
                    # Per-request beam sampling: Gumbel-top-2K draws
                    # without replacement for rows with topk != 1
                    # (greedy rows take the deterministic picks inside).
                    ts, ti = gumbel_top_k_per_row(
                        flat, jax.random.fold_in(key, n * block + it),
                        K2, topks=topks, topps=topps, temps=temps,
                        seeds=seeds, max_topk=max_topk)
                else:
                    ts, ti = small_top_k(flat, K2)  # [S, 2K]
                words = (ti % V).astype(jnp.int32)
                origins = (ti // V).astype(jnp.int32)
                cand_idx = jnp.arange(K2, dtype=jnp.int32)[None, :]

                # Hard-prefix override (reference update_sample_with_prefix,
                # src/decoding.cc:21-67): force the prefix token as
                # candidate 0 with score 0 while gen < plen; penalize EOS
                # among secondary candidates at the first free step.
                forced = (gen < plen)[:, None]
                ptok = jnp.take_along_axis(
                    prefix, jnp.minimum(gen, prefix.shape[1] - 1)[:, None],
                    axis=1)
                words = jnp.where(forced, ptok, words)
                ts = jnp.where(forced,
                               jnp.where(cand_idx == 0, 0.0, NEG), ts)
                origins = jnp.where(forced, 0, origins)
                boundary = (gen == plen)[:, None]
                eos_k = is_end(words) & (cand_idx > 0) & boundary
                words = jnp.where(eos_k, 0, words)
                ts = jnp.where(eos_k, NEG, ts)

                is_eos_cand = is_end(words)  # [S, 2K]
                past_prefix = (gen >= plen)[:, None]
                last_step_b = (gen + 1) >= max_len  # [S]
                Lb = alive.shape[2]
                wcol = jnp.minimum(gen, Lb - 1)

                # Stop-sequence matching (beyond parity; the greedy
                # engines match host-side): a candidate whose token tail
                # [gen-n+1 .. gen] equals a stop sequence finishes like
                # EOS, with the matched suffix trimmed and its scores
                # refunded from the cumulative-score table.
                if has_stop:
                    n_st = stop_lens  # [S, NS]
                    i_idx = jnp.arange(LS, dtype=jnp.int32)
                    # Absolute generated index of stop element i.
                    p_idx = (gen[:, None, None, None]
                             - n_st[:, None, :, None] + 1
                             + i_idx[None, None, None, :])  # [S,2K?,NS,LS]
                    seqs = jnp.take_along_axis(
                        alive, origins[:, :, None], axis=1)  # [S, 2K, L]
                    pc = jnp.broadcast_to(
                        jnp.clip(p_idx, 0, Lb - 1), (S, K2, NS, LS))
                    toks = jnp.take_along_axis(
                        seqs[:, :, None, :],
                        pc.reshape(S, K2, NS * LS)[:, :, None, :],
                        axis=-1).reshape(S, K2, NS, LS)
                    tok_p = jnp.where(p_idx == gen[:, None, None, None],
                                      words[:, :, None, None], toks)
                    valid_i = i_idx[None, None, None, :] < \
                        n_st[:, None, :, None]
                    eq_all = jnp.all(
                        (tok_p == stop_tab[:, None, :, :]) | ~valid_i,
                        axis=-1)  # [S, 2K, NS]
                    # A match must fit the generated range and lie fully
                    # beyond the forced prefix.
                    okn = ((n_st > 0)
                           & ((gen[:, None] + 1) >= n_st)
                           & ((gen[:, None] + 1 - n_st)
                              >= plen[:, None]))  # [S, NS]
                    stop_hit = eq_all & okn[:, None, :]
                    stop_n = jnp.max(
                        jnp.where(stop_hit, n_st[:, None, :], 0),
                        axis=-1)  # [S, 2K]
                else:
                    stop_n = jnp.zeros((S, K2), jnp.int32)
                stopped_cand = stop_n > 0
                dead_cand = is_eos_cand | stopped_cand

                # Harvest finished hypotheses among the first K candidates.
                finish_k = active[:, None] & (
                    (is_eos_cand[:, :K] & past_prefix)
                    | stopped_cand[:, :K]
                    | last_step_b[:, None])
                top_fin = st["top_fin"] | finish_k[:, 0]

                def insert_one(k, c):
                    sseq, s_sc, slen, ssc, scount = c
                    o_k = origins[:, k]
                    seq = jnp.take_along_axis(
                        alive, o_k[:, None, None], axis=1)[:, 0]  # [S, L]
                    seq_sc = jnp.take_along_axis(
                        alive_sc, o_k[:, None, None], axis=1)[:, 0]
                    seq = seq.at[rows_s, wcol].set(words[:, k])
                    seq_sc = seq_sc.at[rows_s, wcol].set(ts[:, k])
                    # include_eos=False: EOS never lands in the hypothesis;
                    # count_eos=True: the norm length still counts it
                    # (reference include_eos_in_hypotheses default). Stop
                    # matches trim the suffix and refund its scores.
                    sn = stop_n[:, k]
                    stp = sn > 0
                    is_e = is_eos_cand[:, k]
                    hyp_len = jnp.where(
                        stp, gen + 1 - sn, jnp.where(is_e, gen, gen + 1))
                    kept = jnp.clip(gen - sn, 0, Lb - 1)
                    cum_kept = jnp.take_along_axis(
                        seq_sc, kept[:, None], axis=1)[:, 0]
                    raw = jnp.where(
                        stp, jnp.where(gen - sn >= 0, cum_kept, 0.0),
                        ts[:, k])
                    norm_len = jnp.maximum(
                        jnp.where(stp, hyp_len, gen + 1), 1
                    ).astype(jnp.float32)
                    norm_score = raw / jnp.power(norm_len, lp_pen)
                    slot = jnp.argmin(ssc, axis=1)  # [S]
                    cur_min = jnp.take_along_axis(
                        ssc, slot[:, None], axis=1)[:, 0]
                    do = finish_k[:, k] & (norm_score > cur_min)
                    hit = (jnp.arange(M)[None, :] == slot[:, None]) \
                        & do[:, None]
                    ssc = jnp.where(hit, norm_score[:, None], ssc)
                    slen = jnp.where(hit, hyp_len[:, None], slen)
                    sseq = jnp.where(hit[:, :, None], seq[:, None, :], sseq)
                    s_sc = jnp.where(hit[:, :, None], seq_sc[:, None, :],
                                     s_sc)
                    scount = scount + finish_k[:, k].astype(jnp.int32)
                    return sseq, s_sc, slen, ssc, scount

                sseq, s_sc, slen, ssc, scount = jax.lax.fori_loop(
                    0, K, insert_one,
                    (st["store_seqs"], st["store_sc"], st["store_lens"],
                     st["store_scores"], st["store_count"]))

                if early:
                    finished_b = top_fin & (scount >= nhyp)
                else:
                    finished_b = scount >= max_cand
                # A stop match on the TOP candidate ends the request at
                # this step (greedy contract: the emitted stream matched),
                # instead of letting longer continuations outscore the
                # trimmed hypothesis.
                finished_b = finished_b | stopped_cand[:, 0]
                new_active = active & jnp.logical_not(
                    finished_b | last_step_b)

                # Select the next K active beams (live-first, stable).
                order = jnp.argsort(dead_cand.astype(jnp.int32), axis=1,
                                    stable=True)[:, :K]
                new_words = jnp.take_along_axis(words, order, axis=1)
                new_scores = jnp.take_along_axis(ts, order, axis=1)
                new_origins = jnp.take_along_axis(origins, order, axis=1)

                rows = (rows_s[:, None] * K + new_origins).reshape(S * K)
                cache = T.cache_gather_rows(cache, rows)
                new_alive = jnp.take_along_axis(
                    alive, new_origins[:, :, None], axis=1)
                k_arange = jnp.arange(K, dtype=jnp.int32)[None, :]
                new_alive = new_alive.at[
                    rows_s[:, None], k_arange, wcol[:, None]].set(new_words)
                new_alive_sc = jnp.take_along_axis(
                    alive_sc, new_origins[:, :, None], axis=1)
                new_alive_sc = new_alive_sc.at[
                    rows_s[:, None], k_arange, wcol[:, None]].set(new_scores)

                a_i = active.astype(jnp.int32)
                st = {
                    "tokens": jnp.where(active[:, None], new_words, tokens),
                    "pos": pos + a_i,
                    "gen": gen + a_i,
                    "scores": jnp.where(active[:, None], new_scores, scores),
                    "alive": jnp.where(active[:, None, None], new_alive,
                                       alive),
                    "alive_sc": jnp.where(active[:, None, None],
                                          new_alive_sc, alive_sc),
                    "store_seqs": sseq, "store_sc": s_sc,
                    "store_lens": slen,
                    "store_scores": ssc, "store_count": scount,
                    "top_fin": top_fin, "active": new_active,
                }
                return cache, st

            return jax.lax.fori_loop(0, block, body, (cache, bstate))

        return jax.jit(step, donate_argnums=(2, 3))

    def _build_beam_reset(self):
        K = self._beam

        def reset(st, slot, start_tok, pos0):
            L = st["alive"].shape[2]
            M = st["store_lens"].shape[1]
            out = dict(st)
            out["tokens"] = jax.lax.dynamic_update_slice(
                st["tokens"], jnp.full((1, K), start_tok, jnp.int32),
                (slot, 0))
            out["pos"] = st["pos"].at[slot].set(pos0)
            out["gen"] = st["gen"].at[slot].set(0)
            out["scores"] = jax.lax.dynamic_update_slice(
                st["scores"],
                jnp.full((1, K), -1e10, jnp.float32).at[0, 0].set(0.0),
                (slot, 0))
            out["alive"] = jax.lax.dynamic_update_slice(
                st["alive"], jnp.zeros((1, K, L), jnp.int32), (slot, 0, 0))
            out["alive_sc"] = jax.lax.dynamic_update_slice(
                st["alive_sc"], jnp.zeros((1, K, L), jnp.float32),
                (slot, 0, 0))
            out["store_seqs"] = jax.lax.dynamic_update_slice(
                st["store_seqs"], jnp.zeros((1, M, L), jnp.int32),
                (slot, 0, 0))
            out["store_sc"] = jax.lax.dynamic_update_slice(
                st["store_sc"], jnp.zeros((1, M, L), jnp.float32),
                (slot, 0, 0))
            out["store_lens"] = jax.lax.dynamic_update_slice(
                st["store_lens"], jnp.zeros((1, M), jnp.int32), (slot, 0))
            out["store_scores"] = jax.lax.dynamic_update_slice(
                st["store_scores"], jnp.full((1, M), -jnp.inf, jnp.float32),
                (slot, 0))
            out["store_count"] = st["store_count"].at[slot].set(0)
            out["top_fin"] = st["top_fin"].at[slot].set(False)
            out["active"] = st["active"].at[slot].set(True)
            return out

        return jax.jit(reset, donate_argnums=(0,))

    def _get_cache_prefill(self, padded_len: int):
        """Prompt prefill that returns ONLY the cache (beam admits expand
        from the re-fed last prompt token, so no token is sampled here)."""
        fn = self._cache_prefill_fns.get(padded_len)
        if fn is not None:
            return fn
        model = self.model
        arch = model.arch
        quantize_acts = model.policy.quantize_activations
        out_dtype = model.out_dtype
        kv_dtype = model.kv_dtype
        stacked = model.scan_layers

        def prefill(params, consts, ids, length):
            cache = T.init_self_cache(arch, 1, padded_len, dtype=kv_dtype,
                                      stacked=stacked, ring=True)
            _, cache, _ = T.decoder_forward(
                arch, params, consts, ids, jnp.int32(0), cache,
                None, None, lengths=length[None],
                quantize_acts=quantize_acts, out_dtype=out_dtype,
                fresh_prefill=True)
            return cache

        fn = jax.jit(prefill)
        self._cache_prefill_fns[padded_len] = fn
        return fn

    def _beam_cache_chunked(self, ids):
        """Ring-model prompts longer than one ring block: the reference's
        chunked prefill (see _prefill_chunked) through a 1-row
        slot-capacity ring cache, returning only the cache."""
        model = self.model
        rb = T.ring_block(model.arch)
        cache = T.init_self_cache(
            model.arch, 1, self._capacity, dtype=model.kv_dtype,
            stacked=model.scan_layers, ring=True)
        for off, size in T.split_prefill_chunks(0, len(ids), rb):
            pad = _round_up(size, self._prefill_bucket)
            chunk = np.zeros((1, pad), np.int32)
            chunk[0, :size] = ids[off: off + size]
            _, cache, _ = T.decoder_forward_jit(
                model.arch, model.params, model.consts,
                jnp.asarray(chunk), jnp.int32(off), cache, None, None,
                quantize_acts=model.policy.quantize_activations,
                out_dtype=model.out_dtype,
                fresh_prefill=(off == 0))
        return cache

    def _set_beam_slot_options(self, slot: int, req: _Request) -> None:
        """Write the request's beam-mode per-slot options: end tokens,
        hypothesis count, stop sequences (tables grow on demand, like the
        penalty tables — the jitted step keys on the static shapes)."""
        self._end_table[slot, :] = -1
        for e, eid in enumerate(self._req_end_ids(req)):
            self._end_table[slot, e] = eid
        self._nhyps[slot] = req.num_hypotheses or self._num_hyp
        # Per-request sampling under beam (reference: RandomSampler
        # composes with beam, src/sampling.cc:60-92): the step compiles
        # the Gumbel selection in once any request (or the batcher
        # defaults) enables it; topk == 1 rows stay deterministic.
        self._temps[slot] = req.temperature or self._temperature or 1.0
        self._topks[slot] = (req.topk if req.topk is not None
                             else max(self._topk, 0))
        self._topps[slot] = (req.topp if req.topp is not None
                             else min(self._topp, 1.0))
        self._seeds[slot] = (req.seed if req.seed is not None else 0)
        if self._topks[slot] != 1 or self._topps[slot] < 1.0:
            self._bsample = True
        # Penalties per beam row are STATELESS (the alive table is the
        # per-row generated history the batch engine penalizes over);
        # the step compiles them in once any request/batcher enables
        # them (zero-length vectors = exact no-op signature).
        rp = (req.rep_penalty if req.rep_penalty is not None
              else self._rep_penalty)
        ng = req.ngram if req.ngram is not None else self._ngram
        self._rep_pens[slot] = rp
        self._ngrams[slot] = ng
        if rp != 1.0 or ng:
            self._bpen = True
        self._set_slot_suppress(slot, req)
        stops = req.stop_sequences
        ns = len(stops)
        ls = max((len(s) for s in stops), default=0)
        NS, LS = self._bstop_tab.shape[1], self._bstop_tab.shape[2]
        if ns > NS or ls > LS:
            NSn, LSn = max(ns, NS, 1), max(_round_up(ls, 2), LS, 2)
            grown = np.full((self._num_slots, NSn, LSn), -1, np.int32)
            lens = np.zeros((self._num_slots, NSn), np.int32)
            grown[:, :NS, :LS] = self._bstop_tab
            lens[:, :NS] = self._bstop_len
            self._bstop_tab, self._bstop_len = grown, lens
        self._bstop_tab[slot] = -1
        self._bstop_len[slot] = 0
        for j, seq in enumerate(stops):
            self._bstop_tab[slot, j, : len(seq)] = seq
            self._bstop_len[slot, j] = len(seq)

    def _prefill_into_slot_beam(self, slot: int, req: _Request):
        """Decoder-only beam admit: write the prompt-minus-last-token KV
        into all K rows of the slot, then start every beam from the LAST
        prompt token at its original position — the first decode step
        recomputes its KV (identical) and the beam expansion falls out of
        the unified candidate step (only beam 0 carries score 0)."""
        model = self.model
        ids = req.prompt_ids
        K = self._beam
        pos0 = len(ids) - 1
        if pos0 > 0:
            rb = T.ring_block(model.arch)
            if rb and pos0 > rb:
                sub = self._beam_cache_chunked(ids[:-1])
            else:
                P = _round_up(pos0, self._prefill_bucket)
                padded = np.zeros((1, P), np.int32)
                padded[0, :pos0] = ids[:-1]
                sub = self._get_cache_prefill(P)(
                    model.params, model.consts, jnp.asarray(padded),
                    jnp.int32(pos0))
            for k in range(K):
                self._cache = self._insert_fn(
                    self._cache, sub, jnp.int32(slot * K + k))
        self._set_beam_slot_options(slot, req)
        self._bstate = self._beam_reset_fn(
            self._bstate, jnp.int32(slot), jnp.int32(ids[-1]),
            jnp.int32(pos0))
        self._slots[slot] = req
        self._b_active_host[slot] = True
        self._pos[slot] = pos0

    def _decode_step_beam(self, active: List[int]):
        model = self.model
        S = self._num_slots
        min_len = np.zeros(S, np.int32)
        max_len = np.full(S, 1, np.int32)
        for i in active:
            req = self._slots[i]
            min_len[i] = req.min_length
            max_len[i] = req.max_length
        prefix = getattr(self, "_prefix", None)
        if prefix is None:
            prefix = np.zeros((S, 1), np.int32)
            plen = np.zeros(S, np.int32)
        else:
            plen = self._plen
        pen_on = getattr(self, "_bpen", False)
        rp = self._rep_pens if pen_on else np.zeros(0, np.float32)
        ng = self._ngrams if pen_on else np.zeros(0, np.int32)
        ts_on = getattr(self, "_ts_on", None)
        if ts_on is None:
            ts_on = np.zeros(S, np.bool_)
        args = [model.params, model.consts, self._cache, self._bstate,
                jnp.asarray(min_len), jnp.asarray(max_len),
                jnp.asarray(prefix), jnp.asarray(plen),
                jnp.asarray(self._end_table), jnp.asarray(self._nhyps),
                jnp.asarray(self._bstop_tab), jnp.asarray(self._bstop_len),
                jnp.asarray(rp), jnp.asarray(ng),
                jnp.asarray(self._sup_table), jnp.asarray(ts_on),
                jnp.asarray(self._temps), jnp.asarray(self._topks),
                jnp.asarray(self._topps), jnp.asarray(self._seeds),
                self._key,
                jnp.int32((self._step_count // max(1, self._block))
                          + 0x40000000)]
        if self._beam_has_memory:
            args += [self._mem, jnp.asarray(self._src_len)]
        if self._beam_step_fn is None \
                or self._bsample_compiled != self._bsample:
            self._beam_step_fn = self._build_beam_step()
            self._bsample_compiled = self._bsample
        self._cache, self._bstate = self._beam_step_fn(*args)
        self._step_count += self._block
        self._slot_steps += len(active) * self._block
        if not self._queue.empty():
            self._steps_while_pending += 1
        # The only per-block fetch: which slots are still decoding
        # (callback slots additionally fetch the streaming snapshot in
        # _harvest_beam). Copied BEFORE the next dispatch donates the
        # bstate buffers, so the pipelined loop can fetch it while the
        # next block runs.
        return jnp.copy(self._bstate["active"])

    _BEAM_SNAP_KEYS = ("alive", "alive_sc", "gen", "scores", "store_seqs",
                       "store_sc", "store_lens", "store_scores")

    def _beam_snapshot(self):
        return {k: np.asarray(self._bstate[k])
                for k in self._BEAM_SNAP_KEYS}

    def _harvest_beam(self):
        need = any(r is not None and (r.callback is not None or r.stopped)
                   for r in self._slots)
        snap = self._beam_snapshot() if need else None
        for i, req in enumerate(self._slots):
            if req is None:
                continue
            if not self._b_active_host[i]:
                self._finish_beam(i, req, snap)
                continue
            if req.callback is not None and not req.stopped:
                self._stream_beam_slot(i, req, snap)
            if req.stopped and (self._dist is None or req.stop_sync):
                # Callback-requested stop (or callback error): force the
                # slot inactive and finish with the best hypothesis so
                # far (stored, else the top alive beam). Multi-host
                # defers the device update until the stop has been
                # broadcast, so both sides mutate bstate in the same
                # iteration.
                self._bstate["active"] = \
                    self._bstate["active"].at[i].set(False)
                self._b_active_host[i] = False
                self._finish_beam(i, req, snap)

    def _stream_beam_slot(self, slot: int, req: _Request, snap) -> None:
        """Stream COMMITTED tokens: the longest prefix shared by every
        alive beam and compatible with every stored hypothesis — any
        future finished hypothesis descends from a current alive row, so
        a committed token is guaranteed to be a prefix of the request's
        final best hypothesis. A holdback of the stop-sequence window
        (min 1 token, so is_last can always be delivered at finish)
        protects against future stop-suffix trimming."""
        gen = int(snap["gen"][slot])
        hold = max(1, req.max_stop_len)
        cap = gen - hold
        if cap <= req.streamed:
            return
        alive = snap["alive"][slot]  # [K, L]
        ne = np.flatnonzero(
            ~(alive[:1, :cap] == alive[:, :cap]).all(axis=0))
        lcp = int(ne[0]) if ne.size else cap
        ssc = snap["store_scores"][slot]
        slen = snap["store_lens"][slot]
        sseq = snap["store_seqs"][slot]
        for j in np.flatnonzero(np.isfinite(ssc)):
            # An existing finished hypothesis may win the final ranking:
            # commit only what matches it (strictly short of its end).
            m = max(min(int(slen[j]) - 1, lcp), 0)
            dif = np.flatnonzero(sseq[j, :m] != alive[0, :m])
            lcp = int(dif[0]) if dif.size else m
        if lcp <= req.streamed:
            return
        cum = snap["alive_sc"][slot, 0]
        v = self._vocab
        if req.t_first is None:
            req.t_first = time.monotonic()
            self._ttfts.append(req.t_first - req.t_submit)
        for t in range(req.streamed, lcp):
            prev = float(cum[t - 1]) if t > 0 else 0.0
            tok = int(alive[0, t])
            try:
                stop = req.callback(GenerationStepResult(
                    step=t, batch_id=0, token_id=tok, hypothesis_id=0,
                    token=v.to_token(tok), score=float(cum[t]) - prev,
                    is_last=False))
            except BaseException as e:  # noqa: BLE001
                req.callback_error = e
                req.stopped = True
                return
            req.streamed = t + 1
            if stop:
                req.stopped = True
                return

    def _finish_beam(self, slot: int, req: _Request, snap=None):
        v = self._vocab
        if req.t_first is None:
            # Beam TTFT is delivery-based: first streamed commit, else
            # the finish that materializes the hypotheses.
            req.t_first = time.monotonic()
            self._ttfts.append(req.t_first - req.t_submit)
        if snap is not None:
            def get(k):
                return snap[k][slot]
        else:
            def get(k):
                return np.asarray(self._bstate[k][slot])
        sseq, slen = get("store_seqs"), get("store_lens")
        ssc, s_sc = get("store_scores"), get("store_sc")
        self._slots[slot] = None
        hyps, scores, hyp_sc = [], [], []
        for j in np.argsort(-ssc):
            if not np.isfinite(ssc[j]):
                continue
            hyps.append([int(t) for t in sseq[j, : slen[j]]])
            scores.append(float(ssc[j]))
            hyp_sc.append(s_sc[j])
        if not hyps:
            # Early stop with nothing stored yet: fall back to the best
            # alive hypothesis so far, normalized like a finished one.
            alive, bsc = get("alive"), get("scores")
            gen = int(get("gen"))
            b = int(np.argmax(bsc))
            hyps = [[int(t) for t in alive[b, :gen]]]
            scores = [float(bsc[b])
                      / max(gen, 1) ** self._length_penalty]
            hyp_sc = [get("alive_sc")[b]]
        nh = req.num_hypotheses or self._num_hyp
        hyps, scores = hyps[:nh], scores[:nh]
        self._tokens_out += len(hyps[0])
        self._requests_done += 1
        if req.callback is not None and not req.stopped \
                and req.callback_error is None:
            # Flush the final best hypothesis's tail through the callback
            # (committed streaming holds back at least one token, so the
            # is_last event is always delivered here).
            cum = hyp_sc[0]
            for t in range(req.streamed, len(hyps[0])):
                prev = float(cum[t - 1]) if t > 0 else 0.0
                try:
                    req.callback(GenerationStepResult(
                        step=t, batch_id=0, token_id=hyps[0][t],
                        hypothesis_id=0, token=v.to_token(hyps[0][t]),
                        score=float(cum[t]) - prev,
                        is_last=(t == len(hyps[0]) - 1)))
                except BaseException as e:  # noqa: BLE001
                    req.callback_error = e
                    break
            req.streamed = len(hyps[0])
        if req.callback_error is not None:
            if not req.future.done():
                req.future.set_exception(req.callback_error)
            return
        result = GenerationResult(
            sequences=[[v.to_token(t) for t in h] for h in hyps],
            sequences_ids=[list(h) for h in hyps],
            scores=scores)
        if not req.future.done():
            req.future.set_result(result)

    def _build_spec_step(self):
        model = self.model
        arch = model.arch
        quantize_acts = model.policy.quantize_activations
        out_dtype = model.out_dtype
        K = self._spec_k
        max_ngram = self._max_ngram

        def step(params, consts, cache, tokens, pos, gen_len, min_len,
                 temps, end_table, sup_table, rep_pens, ngrams, key, n,
                 seen, hist):
            # tokens [S, K]: [last accepted | K-1 drafted]; verify in one
            # T=K forward. Position i's logits give the greedy target for
            # the token at position i+1.
            pen = seen.shape[0] > 0
            logits, cache, _ = T.decoder_forward(
                arch, params, consts, tokens, pos, cache, None, None,
                quantize_acts=quantize_acts, out_dtype=out_dtype)
            l = logits.astype(jnp.float32)  # [S, K, V]
            if pen:
                # Intra-chunk history: the token FED at position m (>= 1)
                # is an emitted token for every query at positions >= m —
                # exactly what the sequential penalty would have seen.
                S_n, V_n = l.shape[0], l.shape[-1]
                oh = jax.nn.one_hot(tokens[:, 1:], V_n, dtype=jnp.bool_)
                cum = jax.lax.associative_scan(
                    jnp.logical_or, oh, axis=1)  # [S, K-1, V]
                intra = jnp.concatenate(
                    [jnp.zeros((S_n, 1, V_n), jnp.bool_), cum], axis=1)
                l = self._apply_rep_penalty(l, seen[:, None, :], rep_pens,
                                            intra)
                # Sequentialized intra-chunk ngram state: position j bans
                # with history = hist[:gen_len] + the fed draft tokens at
                # generated indices gen_len..gen_len+j-1 (exactly what the
                # sequential step would have seen; logits past the first
                # draft mismatch are discarded by the host anyway).
                Lh = hist.shape[1]
                rows_h = jnp.arange(S_n, dtype=jnp.int32)[:, None]
                posn = (gen_len[:, None]
                        + jnp.arange(K - 1, dtype=jnp.int32)[None, :])
                posn = jnp.where(posn < Lh, posn, Lh)
                hist_fed = hist.at[rows_h, posn].set(
                    tokens[:, 1:], mode="drop")
                l = jnp.stack(
                    [proc.no_repeat_ngram_per_row(
                        l[:, j], hist_fed, gen_len + j, ngrams, max_ngram)
                     for j in range(K)], axis=1)
            l = proc.disable_tokens(l, self._suppress_ids)
            if sup_table.shape[1]:
                l = jnp.where(
                    self._end_mask(sup_table, l.shape[-1])[:, None, :],
                    proc.DISABLE, l)
            gl = gen_len[:, None] + jnp.arange(K, dtype=jnp.int32)[None]
            disable = gl < min_len[:, None]
            mask = self._end_mask(end_table, l.shape[-1])  # [S, V]
            l = jnp.where(disable[..., None] & mask[:, None, :],
                          proc.DISABLE, l)
            greedy = jnp.argmax(l, axis=-1).astype(jnp.int32)  # [S, K]
            picked = jnp.take_along_axis(
                jax.nn.log_softmax(l, axis=-1), greedy[..., None],
                axis=-1)[..., 0]
            return greedy, picked, cache

        return jax.jit(step, donate_argnums=(2,))

    def _build_draft_fn(self):
        dm = self._draft_model
        arch = dm.arch
        quantize_acts = dm.policy.quantize_activations
        out_dtype = dm.out_dtype
        K = self._spec_k

        def draft(params, consts, cache, last, pos):
            # last [S]: the latest accepted token; propose K-1 greedy
            # continuations, advancing per-row positions pos+j. The scan
            # runs K feeds (not K-1) so the LAST proposal's K/V is cached
            # too: when the target accepts all drafts plus its bonus token,
            # the next round starts at pos+K and must attend position
            # pos+K-1 — which only the extra feed has written.
            def body(carry, j):
                tok, cache = carry
                logits, cache, _ = T.decoder_forward(
                    arch, params, consts, tok[:, None], pos + j, cache,
                    None, None, quantize_acts=quantize_acts,
                    out_dtype=out_dtype)
                l = logits[:, -1].astype(jnp.float32)
                # Mirror the verifier's unconditional suppressions so a
                # suppressed token never wastes a draft position.
                l = proc.disable_tokens(l, self._suppress_ids)
                nxt = jnp.argmax(l, axis=-1).astype(jnp.int32)
                return (nxt, cache), nxt

            (_, cache), drafts = jax.lax.scan(
                body, (last, cache), jnp.arange(K, dtype=jnp.int32))
            return jnp.transpose(drafts)[:, : K - 1], cache  # [S, K-1]

        return jax.jit(draft, donate_argnums=(2,))

    def _draft_prefill(self, slot: int, ids):
        """Prefill the draft model's cache row for a newly admitted prompt
        (one extra small-model dispatch per admit)."""
        dm = self._draft_model
        P = _round_up(len(ids), self._prefill_bucket)
        padded = np.zeros((1, P), np.int32)
        padded[0, : len(ids)] = ids
        fn = self._draft_prefill_fns.get(P)
        if fn is None:
            arch = dm.arch
            quantize_acts = dm.policy.quantize_activations
            out_dtype = dm.out_dtype
            kv_dtype = dm.kv_dtype
            stacked = dm.scan_layers

            def prefill(params, consts, ids_arr, length):
                cache = T.init_self_cache(arch, 1, P, dtype=kv_dtype,
                                          stacked=stacked, ring=True)
                _, cache, _ = T.decoder_forward(
                    arch, params, consts, ids_arr, jnp.int32(0), cache,
                    None, None, lengths=length[None],
                    quantize_acts=quantize_acts, out_dtype=out_dtype,
                    fresh_prefill=True)
                return cache

            fn = jax.jit(prefill)
            self._draft_prefill_fns[P] = fn
        sub = fn(dm.params, dm.consts, jnp.asarray(padded),
                 jnp.int32(len(ids)))
        # _insert_fn is shape-polymorphic (jit caches per cache geometry),
        # so the target's jitted insert serves the draft cache too.
        self._draft_cache = self._insert_fn(
            self._draft_cache, sub, jnp.int32(slot))

    def _draft(self, req, k: int):
        """Prompt-lookup draft: continue the latest match of the current
        bigram in the request's own context; pad with the last token."""
        ctx = req.prompt_ids + req.generated
        draft = []
        if len(ctx) >= 3:
            a, b = ctx[-2], ctx[-1]
            for j in range(len(ctx) - 2, 0, -1):
                if ctx[j] == b and ctx[j - 1] == a:
                    draft = ctx[j + 1: j + 1 + k]
                    break
        while len(draft) < k:
            draft.append(ctx[-1])
        return draft[:k]

    def _decode_step_spec(self, active):
        model = self.model
        S, K = self._num_slots, self._spec_k
        tokens = np.zeros((S, K), np.int32)
        min_len = np.zeros(S, np.int32)
        gen_len = np.zeros(S, np.int32)
        pos = np.minimum(self._pos, self._capacity - K)
        model_drafts = None
        if self._draft_model is not None:
            drafts_d, self._draft_cache = self._draft_fn(
                self._draft_model.params, self._draft_model.consts,
                self._draft_cache, jnp.asarray(self._tokens),
                jnp.asarray(pos))
            model_drafts = np.asarray(drafts_d)
        for i in active:
            req = self._slots[i]
            min_len[i] = req.min_length
            gen_len[i] = len(req.generated)
            tokens[i, 0] = self._tokens[i]
            tokens[i, 1:] = (model_drafts[i] if model_drafts is not None
                             else self._draft(req, K - 1))

        ids_d, scores_d, self._cache = self._step_fn(
            model.params, model.consts, self._cache,
            jnp.asarray(tokens), jnp.asarray(pos),
            jnp.asarray(gen_len), jnp.asarray(min_len),
            jnp.asarray(self._temps), jnp.asarray(self._end_table),
            jnp.asarray(self._sup_table), jnp.asarray(self._rep_pens),
            jnp.asarray(self._ngrams), self._key,
            jnp.int32(self._step_count + 0x40000000), self._seen,
            self._hist)
        self._step_count += 1
        self._slot_steps += len(active)
        self._accept_spec_round(active, np.asarray(ids_d),
                                np.asarray(scores_d, np.float32), tokens, K,
                                gen_len)

    def _accept_spec_round(self, active, greedy, scores, tokens, K,
                           gen_len=None):
        """Consume one speculative verify dispatch: accept greedy targets
        until an end/stop condition or the first draft mismatch."""
        # The device ngram history can only stay correct if the caller
        # provides per-slot generated lengths; fail loudly rather than
        # silently stop updating it.
        assert not self._hist.shape[0] or gen_len is not None, (
            "speculative accept with an active ngram history requires "
            "gen_len")
        counts = np.zeros(greedy.shape[0], np.int32)
        for i in active:
            req = self._slots[i]
            emitted = 0
            for j in range(K):
                tok = int(greedy[i, j])
                self._emit(req, tok, float(scores[i, j]))
                self._tokens[i] = tok
                emitted = j + 1
                self._accepted_tokens += 1
                if (tok in self._req_end_ids(req)
                        and len(req.generated) > req.min_length):
                    break
                if len(req.generated) >= req.max_length:
                    break
                if req.stopped and self._dist is None:
                    break
                # The next fed token (draft) must equal this greedy target
                # or verification stops here.
                if j + 1 < K and int(tokens[i, j + 1]) != tok:
                    break
            self._pos[i] += emitted
            counts[i] = emitted
            self._spec_dispatches += 1
        if self._seen.shape[0]:
            self._seen = self._seen_accept(
                self._seen, jnp.asarray(greedy), jnp.asarray(counts))
            self._hist = self._hist_accept(
                self._hist, jnp.asarray(greedy), jnp.asarray(counts),
                jnp.asarray(gen_len))

    def _get_prefill(self, padded_len: int):
        fn = self._prefill_fns.get(padded_len)
        if fn is not None:
            return fn
        model = self.model
        arch = model.arch
        quantize_acts = model.policy.quantize_activations
        out_dtype = model.out_dtype
        kv_dtype = model.kv_dtype
        stacked = model.scan_layers

        def prefill(params, consts, ids, length, disable_end, temp, topk,
                    topp, seed, end_row, sup_row, key, n):
            # ids [1, P] padded; real prompt occupies [0, length). The
            # prefill cache is prompt-sized (O(P^2) attention, not O(P*C));
            # cache_insert_row pads it into the full-capacity slot row.
            cache = T.init_self_cache(arch, 1, padded_len, dtype=kv_dtype,
                                      stacked=stacked, ring=True)
            logits, cache, _ = T.decoder_forward(
                arch, params, consts, ids, jnp.int32(0), cache,
                None, None, lengths=length[None],
                quantize_acts=quantize_acts, out_dtype=out_dtype,
                fresh_prefill=True)
            last = jnp.take(logits[0], length - 1, axis=0)
            ids_out, scores = self._sample_logits(
                last[None], disable_end[None], jax.random.fold_in(key, n),
                temps=temp[None], topks=topk[None], topps=topp[None],
                seeds=seed[None], end_table=end_row[None],
                sup_table=sup_row[None])
            return ids_out[0], scores[0], cache

        fn = jax.jit(prefill)
        self._prefill_fns[padded_len] = fn
        return fn

    def _prefill_chunked(self, slot: int, req: _Request, rb: int):
        """Window-model prompts longer than one ring block: run the
        reference's chunked prefill (Wr-aligned chunks) through a 1-row
        slot-shaped ring cache, then insert the whole row (the chunk
        caches match the slot's per-layer ring capacities exactly)."""
        model = self.model
        ids = req.prompt_ids
        cache = T.init_self_cache(
            model.arch, 1, self._capacity, dtype=model.kv_dtype,
            stacked=model.scan_layers, ring=True)
        logits = None
        last_len = 0
        for off, size in T.split_prefill_chunks(0, len(ids), rb):
            pad = _round_up(size, self._prefill_bucket)
            chunk = np.zeros((1, pad), np.int32)
            chunk[0, :size] = ids[off: off + size]
            # No lengths mask: it would wrongly mask EARLIER chunks' keys
            # (its semantics are whole-cache valid length). The padded
            # tail writes garbage at positions >= len(ids), which decode
            # overwrites before those positions ever become attendable.
            logits, cache, _ = T.decoder_forward_jit(
                model.arch, model.params, model.consts,
                jnp.asarray(chunk), jnp.int32(off), cache, None, None,
                quantize_acts=model.policy.quantize_activations,
                out_dtype=model.out_dtype,
                fresh_prefill=(off == 0))
            last_len = size
        self._set_slot_sampling(slot, req)
        last = logits[0, last_len - 1].astype(jnp.float32)
        tok, score = self._sample_logits(
            last[None],
            jnp.asarray([req.min_length > 0]),
            jax.random.fold_in(self._key, self._step_count),
            temps=jnp.asarray(self._temps[slot: slot + 1]),
            topks=jnp.asarray(self._topks[slot: slot + 1]),
            topps=jnp.asarray(self._topps[slot: slot + 1]),
            seeds=jnp.asarray(self._seeds[slot: slot + 1]),
            end_table=jnp.asarray(self._end_table[slot: slot + 1]),
            sup_table=jnp.asarray(self._sup_table[slot: slot + 1]))
        self._cache = self._insert_fn(self._cache, cache, jnp.int32(slot))
        first = int(tok[0])
        if self._seen.shape[0]:
            self._seen = self._seen_admit(
                self._seen, jnp.int32(slot), jnp.int32(first))
            self._hist = self._hist_admit(
                self._hist, jnp.int32(slot), jnp.int32(first))
        self._emit(req, first, float(score[0]))
        self._slots[slot] = req
        self._pos[slot] = len(ids)
        self._tokens[slot] = first
        self._temps[slot] = req.temperature or self._temperature or 1.0
        if self._dstate is not None:
            self._dstate = self._slot_write(
                self._dstate, jnp.int32(slot), jnp.int32(first),
                jnp.int32(len(ids)), jnp.int32(1))

    # ------------------------------------------------------------------
    # Scheduler loop.
    # ------------------------------------------------------------------

    def _loop(self):
        try:
            if self._dist is not None:
                if self._dist.is_leader:
                    self._leader_loop()
                else:
                    self._follower_loop()
                return
            # Pipelined single-host loop: up to self._depth blocks in
            # flight. With depth 2 (default) the host fetches block N's
            # tokens WHILE block N+1 runs on device, hiding the
            # dispatch+fetch round-trip behind device time (reference
            # anchor: the replica pool's always-busy workers,
            # include/ctranslate2/replica_pool.h:19-300).
            inflight = deque()
            while True:
                self._harvest_any()
                self._admit()
                active = [i for i, s in enumerate(self._slots)
                          if s is not None]
                if not active and not inflight:
                    if self._closed:
                        self._fail_pending(RuntimeError("Batcher closed"))
                        return
                    self._wake.wait(timeout=0.05)
                    self._wake.clear()
                    continue
                if active:
                    h = self._dispatch_any(active)
                    if h is not None:
                        inflight.append(h)
                depth = self._depth
                if self._beam > 1 and depth > 1 and any(
                        r is not None and r.callback is not None
                        for r in self._slots):
                    # Beam streaming runs lockstep: a callback-driven
                    # early stop must finish from the state of the block
                    # the callback saw, not one block later (greedy
                    # engines are exempt — their consume path replays
                    # the exact stop point).
                    depth = 1
                while len(inflight) >= (depth if active else 1):
                    self._consume_any(inflight.popleft())
        except BaseException as e:  # noqa: BLE001
            self._fail_pending(e)
            for s in self._slots:
                if s is not None and not s.future.done():
                    s.future.set_exception(e)

    def _harvest_any(self):
        if self._beam > 1:
            self._harvest_beam()
        else:
            self._harvest()

    def _dispatch_any(self, active):
        """Dispatch one decode block; returns a consume handle, or None
        when the engine consumed inline (speculation is host-driven)."""
        if self._beam > 1:
            return ("beam", self._decode_step_beam(active))
        if self._spec_k > 1:
            self._decode_step_spec(active)
            return None
        return ("greedy", self._dispatch_block(active))

    def _consume_any(self, handle):
        kind, h = handle
        if kind == "beam":
            # np.array: a WRITABLE copy (np.asarray of a jax array is
            # read-only, and _prefill_into_slot_beam writes slots).
            self._b_active_host = np.array(h)
        else:
            self._consume_block(h)

    def _dispatch_step(self, active):
        """Dispatch + consume one block synchronously (the lockstep path
        used by the multi-host leader/follower loops)."""
        h = self._dispatch_any(active)
        if h is not None:
            self._consume_any(h)

    # ------------------------------------------------------------------
    # Multi-host serving: leader (process 0) broadcasts one control
    # record per scheduler iteration; followers replay it so every
    # process dispatches identical global computations in identical
    # order (see _DistControl; design: docs/parallel.md).
    # ------------------------------------------------------------------

    def _leader_loop(self):
        try:
            self._leader_loop_inner()
        except BaseException:
            # Best effort: unblock followers (they would otherwise wait
            # in the broadcast collective forever) before the generic
            # exception handling in _loop fails the pending futures.
            try:
                self._dist.send({"op": "iter", "admits": [],
                                 "step": False, "close": True})
            except BaseException:  # noqa: BLE001
                pass
            raise

    def _leader_loop_inner(self):
        while True:
            # Callback-driven stops raised since the last record become
            # effective THIS iteration on every process: mark them
            # synced (the local harvest below acts on synced stops) and
            # ship the slot list to the followers.
            stops = [i for i, r in enumerate(self._slots)
                     if r is not None and r.stopped and not r.stop_sync]
            for i in stops:
                self._slots[i].stop_sync = True
            self._harvest_any()
            admits = self._collect_admits()
            step = bool(admits) or any(
                s is not None for s in self._slots)
            closing = self._closed and not step
            self._dist.send({
                "op": "iter", "stops": stops,
                "admits": [{"slot": s, "req": self._req_payload(r)}
                           for s, r in admits],
                "step": step, "close": closing})
            for slot, req in admits:
                self._prefill_into_slot(slot, req)
            if closing:
                self._fail_pending(RuntimeError("Batcher closed"))
                return
            if step:
                self._dispatch_step(
                    [i for i, s in enumerate(self._slots)
                     if s is not None])
            else:
                self._wake.wait(timeout=0.05)
                self._wake.clear()

    def _follower_loop(self):
        while True:
            msg = self._dist.recv()
            for i in msg.get("stops", ()):
                req = self._slots[i]
                if req is not None:
                    req.stopped = True
                    req.stop_sync = True
            self._harvest_any()
            for a in msg["admits"]:
                self._prefill_into_slot(
                    a["slot"], self._req_from_payload(a["req"]))
            if msg.get("close"):
                return
            if msg["step"]:
                self._dispatch_step(
                    [i for i, s in enumerate(self._slots)
                     if s is not None])

    def _req_payload(self, req: _Request) -> dict:
        return {
            "prompt_ids": list(req.prompt_ids),
            "max_length": req.max_length,
            "min_length": req.min_length,
            "temperature": req.temperature,
            "topk": req.topk, "topp": req.topp, "seed": req.seed,
            "end_ids": (list(req.end_ids)
                        if req.end_ids is not None else None),
            "rep_penalty": req.rep_penalty, "ngram": req.ngram,
            "suppress_ids": (list(req.suppress_ids)
                             if req.suppress_ids else None),
            "num_hypotheses": req.num_hypotheses,
            "stop_sequences": [list(s) for s in req.stop_sequences],
        }

    def _req_from_payload(self, p: dict) -> _Request:
        return _Request(
            prompt_ids=list(p["prompt_ids"]),
            max_length=p["max_length"], min_length=p["min_length"],
            temperature=p["temperature"],
            topk=p["topk"], topp=p["topp"], seed=p["seed"],
            end_ids=(tuple(p["end_ids"])
                     if p["end_ids"] is not None else None),
            rep_penalty=p["rep_penalty"], ngram=p["ngram"],
            suppress_ids=(tuple(p["suppress_ids"])
                          if p["suppress_ids"] else None),
            num_hypotheses=p["num_hypotheses"],
            stop_sequences=tuple(
                tuple(s) for s in p["stop_sequences"]))

    def _fail_pending(self, exc):
        while True:
            try:
                req = self._queue.get_nowait()
            except queue.Empty:
                return
            if req.future.set_running_or_notify_cancel():
                req.future.set_exception(exc)

    def _harvest(self):
        for i, req in enumerate(self._slots):
            if req is None:
                continue
            done = False
            if req.generated and req.generated[-1] in \
                    self._req_end_ids(req) \
                    and len(req.generated) > req.min_length:
                req.generated.pop()  # drop the end token (reference strips it)
                done = True
            elif len(req.generated) >= req.max_length:
                done = True
            elif req.stopped and (self._dist is None or req.stop_sync):
                # Callback requested stop (or raised). In multi-host
                # mode the stop only takes effect once broadcast
                # (stop_sync), so leader and followers free the slot in
                # the same iteration.
                done = True
            elif int(self._pos[i]) + max(self._block, self._spec_k) \
                    > self._capacity:
                done = True  # slot capacity exhausted
            if done:
                self._finish(i, req)

    def _finish(self, slot: int, req: _Request):
        v = self._vocab
        if req.stop_len is not None and len(req.generated) > req.stop_len:
            # Multi-host: followers kept consuming until the stop was
            # broadcast; trim the leader's symmetric overshoot back to
            # the exact stop point.
            del req.generated[req.stop_len:]
            req.score = req.stop_score
        self._slots[slot] = None
        self._tokens_out += len(req.generated)
        self._requests_done += 1
        if req.callback_error is not None:
            if not req.future.done():
                req.future.set_exception(req.callback_error)
            return
        result = GenerationResult(
            sequences=[[v.to_token(t) for t in req.generated]],
            sequences_ids=[list(req.generated)],
            scores=[req.score],
        )
        if not req.future.done():
            req.future.set_result(result)

    def _admit(self):
        for slot, req in self._collect_admits():
            self._prefill_into_slot(slot, req)

    def _collect_admits(self):
        """Pop admissible requests and assign free slots. Cancellation is
        resolved here (leader-side in multi-host mode — followers only
        ever see admitted requests)."""
        picked = []
        free = [i for i, s in enumerate(self._slots) if s is None]
        # Bound the control record in multi-host mode (prompt ids ride
        # the broadcast buffer).
        cap = 4 if self._dist is not None else len(free)
        while free and len(picked) < max(cap, 1):
            try:
                req = self._queue.get_nowait()
            except queue.Empty:
                break
            # Queued requests can be cancelled through their future
            # before they claim a slot; set_running_or_notify_cancel also
            # NOTIFIES waiters of a cancelled future (wait()/as_completed()
            # would hang on a merely-CANCELLED one).
            if not req.future.set_running_or_notify_cancel():
                continue
            picked.append((free.pop(0), req))
        return picked

    def _prefill_into_slot(self, slot: int, req: _Request):
        if self._beam > 1:
            return self._prefill_into_slot_beam(slot, req)
        model = self.model
        ids = req.prompt_ids
        rb = T.ring_block(model.arch)
        if rb and len(ids) > rb:
            return self._prefill_chunked(slot, req, rb)
        P = _round_up(len(ids), self._prefill_bucket)
        padded = np.zeros((1, P), np.int32)
        padded[0, : len(ids)] = ids
        self._set_slot_sampling(slot, req)
        fn = self._get_prefill(P)
        tok, score, sub_cache = fn(
            model.params, model.consts, jnp.asarray(padded),
            jnp.int32(len(ids)),
            jnp.asarray(req.min_length > 0),
            jnp.float32(self._temps[slot]),
            jnp.int32(self._topks[slot]), jnp.float32(self._topps[slot]),
            jnp.int32(self._seeds[slot]),
            jnp.asarray(self._end_table[slot]),
            jnp.asarray(self._sup_table[slot]),
            self._key, jnp.int32(self._step_count))
        self._cache = self._insert_fn(
            self._cache, sub_cache, jnp.int32(slot))
        if self._draft_model is not None:
            self._draft_prefill(slot, ids)
        first = int(tok)
        if self._seen.shape[0]:
            self._seen = self._seen_admit(
                self._seen, jnp.int32(slot), jnp.int32(first))
            self._hist = self._hist_admit(
                self._hist, jnp.int32(slot), jnp.int32(first))
        self._emit(req, first, float(score))
        self._slots[slot] = req
        self._pos[slot] = len(ids)
        self._tokens[slot] = first
        self._temps[slot] = req.temperature or self._temperature or 1.0
        if self._dstate is not None:
            # Device slot state: queued after any in-flight block, so
            # the next dispatched block sees the admitted row.
            self._dstate = self._slot_write(
                self._dstate, jnp.int32(slot), jnp.int32(first),
                jnp.int32(len(ids)), jnp.int32(1))

    def _dispatch_block(self, active: List[int]):
        """Dispatch one block step from the device-resident slot state
        (non-blocking: JAX async dispatch returns futures). Returns a
        handle for _consume_block; the block's tokens are fetched there,
        possibly after the NEXT block has been dispatched."""
        model = self.model
        min_len = np.zeros(self._num_slots, np.int32)
        binding = {}
        for i in active:
            req = self._slots[i]
            min_len[i] = req.min_length
            binding[i] = req

        ids_d, scores_d, self._cache, self._dstate, self._seen, \
            self._hist = self._step_fn(
                model.params, model.consts, self._cache, self._dstate,
                jnp.asarray(min_len),
                jnp.asarray(self._temps), jnp.asarray(self._topks),
                jnp.asarray(self._topps), jnp.asarray(self._seeds),
                jnp.asarray(self._end_table), jnp.asarray(self._sup_table),
                jnp.asarray(self._rep_pens), jnp.asarray(self._ngrams),
                self._key,
                jnp.int32((self._step_count // max(1, self._block))
                          + 0x40000000), self._seen, self._hist)
        self._step_count += self._block
        self._slot_steps += len(active) * self._block
        if not self._queue.empty():
            self._steps_while_pending += 1
        return (ids_d, scores_d, binding)

    def _consume_block(self, handle):
        """Fetch one dispatched block's tokens (the sync point) and emit
        them. A slot whose request changed since the dispatch (finished
        and re-admitted while this block was in flight) is skipped — its
        tokens are a discarded speculative continuation."""
        ids_d, scores_d, binding = handle
        ids = np.asarray(ids_d)          # [block, S]
        scores = np.asarray(scores_d, np.float32)
        for i, req in binding.items():
            if self._slots[i] is not req:
                continue
            for j in range(self._block):
                tok = int(ids[j, i])
                self._emit(req, tok, float(scores[j, i]))
                self._tokens[i] = tok
                self._pos[i] += 1
                if req.stopped and self._dist is None:
                    # Multi-host keeps consuming (followers can't see the
                    # leader-local stop yet); _finish trims the overshoot.
                    break
                # Stop consuming once this request is done (its remaining
                # block tokens are a discarded speculative continuation);
                # _harvest frees the slot right after.
                if (tok in self._req_end_ids(req)
                        and len(req.generated) > req.min_length):
                    break
                if len(req.generated) >= req.max_length:
                    break

    def _decode_step(self, active: List[int]):
        self._consume_block(self._dispatch_block(active))


class ContinuousTranslator(ContinuousBatcher):
    """Iteration-level batching for ENCODER-DECODER models (beyond the
    reference, whose serving runs translation batches to completion).

    Each slot additionally owns fixed-shape cross-attention memory:
    admit encodes the source (one prefill-sized dispatch), projects it
    through the per-layer cross K/V linears, and inserts the result into
    the slot's rows of [num_slots, Hkv, max_source_len, D] buffers; a
    per-slot length mask handles ragged sources. Decode steps then run
    the merged fleet exactly like the decoder-only engine — the first
    target token comes from feeding the decoder start token, so no
    decoder-side prefill is needed.

    Serves every encoder-decoder attention family the batch engine
    models: separate cross-attention, merged self+cross (T5Gemma2,
    per-slot memory via the memory_kv projection), T5 relative bias and
    Shaw relative positions (per-row bucketed biases), and
    source-factor inputs (per-feature id streams split at submit).
    Target prefixes ARE supported (forced-prefix buffers, see
    ``submit(target_prefix=...)``), including models with
    ``decoder_start_token=null`` where the prefix's first token plays
    the start-token role (reference:
    src/models/sequence_to_sequence.cc:169-186).
    """

    def __init__(self, translator, *, max_source_len: int = 128,
                 max_target_prefix: int = 32, **kw):
        model = translator.model
        if not model.is_sequence_to_sequence:
            raise ValueError(
                "ContinuousTranslator requires an encoder-decoder model")
        self._translator = translator
        self._max_src = max_source_len
        self._src_vocab = model.source_vocabularies[0]
        # Source-factor models: per-feature id streams are split at
        # submit and encoded together (reference factored inputs:
        # src/utils.cc:158-190 + src/layers/common.cc:49-148).
        self._num_features = model.arch.encoder.embeddings.num_features
        start = model.config.get("decoder_start_token", "<s>")
        # start=None: the model has no decoder start token; each request
        # must carry a target_prefix whose FIRST token plays that role
        # (reference: make_target_ids with a null decoder_start_token,
        # src/models/sequence_to_sequence.cc:169-186 — mirrored by the
        # batch path, runtime/translator.py:_translate_padded).
        self._start_id = (None if start is None
                          else model.target_vocabulary.to_id(start))
        # Force the decoder-only check off; init the shared machinery.
        self._init_common(model, **kw)
        self._init_seq2seq_state(max_target_prefix)
        self._start_loop()

    def _init_seq2seq_state(self, max_target_prefix: int):
        """Per-slot cross-attention memory (zeros attend as masked) and
        forced target-prefix buffers."""
        model = self.model
        self._mem = []
        for layer in model.arch.decoder.layers:
            # Merged-attention (T5Gemma2) layers carry their memory K/V
            # through the self-attention memory_kv projection; geometry
            # comes from the self-attention spec then.
            a = layer.cross_attention
            if a is None and layer.self_attention.has_memory_kv:
                a = layer.self_attention
            if a is None:
                self._mem.append(None)
                continue
            shape = (self._num_slots, a.num_heads_kv, self._max_src,
                     a.head_dim)
            self._mem.append({
                "k": jnp.zeros(shape, model.out_dtype),
                "v": jnp.zeros(shape, model.out_dtype),
            })
        if self._dist is not None:
            # Multi-host: the per-slot memory buffers must be GLOBAL
            # arrays like the KV cache (replicated; GSPMD reshards
            # inside the jitted step as the attention layout needs).
            from ..parallel.sharding import NamedSharding, P

            rep = NamedSharding(self.model.mesh, P())
            self._mem = [
                None if m is None else
                {k: jax.device_put(np.asarray(v), rep)
                 for k, v in m.items()}
                for m in self._mem
            ]
        self._src_len = np.zeros(self._num_slots, np.int32)
        # Per-slot forced target prefixes (on-device so forcing happens
        # INSIDE the block scan — the forced token must be what gets fed,
        # or the cache would hold the wrong K/V).
        self._max_prefix = max_target_prefix
        self._prefix = np.zeros((self._num_slots, max(1, max_target_prefix)),
                                np.int32)
        self._plen = np.zeros(self._num_slots, np.int32)
        # Whisper timestamp rules per slot (always False outside
        # ContinuousWhisper; the step compiles the rules only when the
        # engine carries _wts ids).
        self._ts_on = np.zeros(self._num_slots, np.bool_)
        self._encode_fns = {}
        self._mem_insert = jax.jit(self._mem_insert_impl, donate_argnums=(0,))

    # ContinuousBatcher.__init__ is replaced by _init_common + _start_loop
    # so this subclass can set up memory buffers in between; see below.

    def submit(self, source: Sequence[str], *, max_length: int = 256,
               min_length: int = 0,
               sampling_temperature: float = None,
               sampling_topk: int = None,
               sampling_topp: float = None,
               seed: int = None,
               end_token=None,
               repetition_penalty: float = None,
               no_repeat_ngram_size: int = None,
               suppress_tokens: Sequence = None,
               num_hypotheses: int = None,
               target_prefix: Sequence[str] = None,
               callback=None,
               stop_sequences: Sequence[Sequence] = None) -> Future:
        """Queue one tokenized source sentence; the Future resolves to a
        GenerationResult holding the target tokens (including the forced
        ``target_prefix``, reference return_prefix semantics). ``callback``
        streams target tokens (same contract as ContinuousBatcher.submit)."""
        if self._closed:
            raise RuntimeError("The batcher is closed")
        self._check_distributed_submit(callback)
        if not source:
            raise ValueError("The source must contain at least one token")
        if len(source) > self._max_src:
            raise ValueError(
                f"source length {len(source)} exceeds max_source_len "
                f"({self._max_src})")
        cfg = self.model.config
        feature_ids = None
        if self._num_features > 1:
            from .translator import extract_features

            streams = extract_features([list(source)], self._num_features)
            feature_ids = [
                vocab.tokens_to_ids(
                    stream,
                    add_bos=bool(cfg.get("add_source_bos", False)),
                    add_eos=bool(cfg.get("add_source_eos", False)))[0]
                for vocab, stream in zip(self.model.source_vocabularies,
                                         streams)
            ]
            ids = feature_ids[0]
        else:
            ids = self._src_vocab.tokens_to_ids(
                [list(source)],
                add_bos=bool(cfg.get("add_source_bos", False)),
                add_eos=bool(cfg.get("add_source_eos", False)))[0]
        if max_length + self._block > self._capacity:
            raise ValueError("max_length exceeds the slot capacity")
        prefix_ids = []
        if target_prefix:
            tv = self.model.target_vocabulary
            prefix_ids = [tv.to_id(t) for t in target_prefix]
        start_id = self._start_id
        if start_id is None:
            # User decoder start tokens: the prefix's first token is fed
            # as the start token; the rest is the forced prefix (matches
            # translate_batch, runtime/translator.py start_ids=[p[0]]).
            if not prefix_ids:
                raise ValueError(
                    "The model requires a target prefix as the decoder "
                    "start token")
            start_id, prefix_ids = prefix_ids[0], prefix_ids[1:]
        if len(prefix_ids) > self._max_prefix:
            raise ValueError(
                f"target_prefix length {len(prefix_ids)} exceeds "
                f"max_target_prefix ({self._max_prefix})")
        self._validate_request_sampling(sampling_topk, sampling_topp, seed)
        self._validate_beam_request(num_hypotheses)
        rep, ngram, sup_ids = self._validate_request_penalties(
            repetition_penalty, no_repeat_ngram_size, suppress_tokens)
        req = _Request(prompt_ids=ids, max_length=max_length,
                       min_length=min_length + len(prefix_ids),
                       temperature=sampling_temperature or 0.0,
                       topk=sampling_topk, topp=sampling_topp, seed=seed,
                       end_ids=self._resolve_request_end_ids(end_token),
                       rep_penalty=rep, ngram=ngram, suppress_ids=sup_ids,
                       num_hypotheses=num_hypotheses,
                       callback=callback,
                       stop_sequences=self._stop_ids(stop_sequences))
        req.prefix_ids = prefix_ids
        req.forced_len = len(prefix_ids)
        req.start_id = start_id
        req.feature_ids = feature_ids
        self._queue.put(req)
        self._wake.set()
        return req.future

    # ------------------------------------------------------------------

    def _req_payload(self, req: _Request) -> dict:
        p = super()._req_payload(req)
        p["prefix_ids"] = list(getattr(req, "prefix_ids", []) or [])
        p["forced_len"] = getattr(req, "forced_len", 0)
        p["start_id"] = getattr(req, "start_id", None)
        feats = getattr(req, "feature_ids", None)
        p["feature_ids"] = ([list(f) for f in feats]
                            if feats is not None else None)
        return p

    def _req_from_payload(self, p: dict) -> _Request:
        req = super()._req_from_payload(p)
        req.prefix_ids = list(p["prefix_ids"])
        req.forced_len = p["forced_len"]
        req.start_id = p["start_id"]
        req.feature_ids = ([list(f) for f in p["feature_ids"]]
                           if p["feature_ids"] is not None else None)
        return req

    @staticmethod
    def _mem_insert_impl(mem, sub, slot):
        def ins(buf, s):
            return jax.lax.dynamic_update_slice(
                buf, s.astype(buf.dtype), (slot, 0, 0, 0))

        return [
            None if m is None else {k: ins(m[k], s[k]) for k in m}
            for m, s in zip(mem, sub)
        ]

    def _get_encode(self, padded_len: int):
        fn = self._encode_fns.get(padded_len)
        if fn is None:
            fn = self._make_encode_fn(self.model, padded_len)
            self._encode_fns[padded_len] = fn
        return fn

    def _get_draft_encode(self, padded_len: int):
        fn = self._draft_encode_fns.get(padded_len)
        if fn is None:
            fn = self._make_encode_fn(self._draft_model, padded_len)
            self._draft_encode_fns[padded_len] = fn
        return fn

    def _make_encode_fn(self, model, padded_len: int, speech: bool = False):
        arch = model.arch
        quantize_acts = model.policy.quantize_activations
        out_dtype = model.out_dtype
        S_max = self._max_src

        def encode(params, consts, ids, length=None):
            if speech:
                memory = T.speech_encoder_forward(
                    arch, params, consts, ids,
                    quantize_acts=quantize_acts, out_dtype=out_dtype)
            else:
                memory = T.encoder_forward(
                    arch, params, consts, ids, length[None],
                    quantize_acts=quantize_acts, out_dtype=out_dtype)
            mem_kv = T.precompute_memory(arch, params, memory,
                                         quantize_acts=quantize_acts)
            pad = S_max - memory.shape[1]

            def pad_kv(a):
                return jnp.pad(a, ((0, 0), (0, 0), (0, pad), (0, 0)))

            return [
                None if m is None else {k: pad_kv(v) for k, v in m.items()}
                for m in mem_kv
            ]

        return jax.jit(encode)

    def _prefill_into_slot(self, slot: int, req: _Request):
        model = self.model
        ids = req.prompt_ids
        P = min(_round_up(max(len(ids), 1), self._prefill_bucket),
                self._max_src)

        def pad_ids(row):
            padded = np.zeros((1, P), np.int32)
            padded[0, : len(row)] = row[:P]
            return jnp.asarray(padded)

        feature_ids = getattr(req, "feature_ids", None)
        enc_ids = (tuple(pad_ids(f) for f in feature_ids)
                   if feature_ids is not None else pad_ids(ids))
        sub = self._get_encode(P)(
            model.params, model.consts, enc_ids,
            jnp.int32(min(len(ids), P)))
        self._mem = self._mem_insert(self._mem, sub, jnp.int32(slot))
        if self._draft_model is not None:
            # Draft models are single-feature (checked in _init_draft);
            # they encode the MAIN feature's ids.
            dm = self._draft_model
            dsub = self._get_draft_encode(P)(
                dm.params, dm.consts, pad_ids(ids),
                jnp.int32(min(len(ids), P)))
            self._draft_mem = self._draft_mem_insert(
                self._draft_mem, dsub, jnp.int32(slot))
        self._slots[slot] = req
        self._src_len[slot] = min(len(ids), P)
        self._pos[slot] = 0
        prefix = getattr(req, "prefix_ids", None) or []
        self._prefix[slot, :] = 0
        self._prefix[slot, : len(prefix)] = prefix
        self._plen[slot] = len(prefix)
        start_id = getattr(req, "start_id", None)
        if start_id is None:
            start_id = self._start_id
        if self._beam > 1:
            # Beam rows all start from the decoder start token at
            # position 0; only beam 0 carries score 0, so the first step's
            # candidate selection performs the initial expansion.
            self._set_beam_slot_options(slot, req)
            self._bstate = self._beam_reset_fn(
                self._bstate, jnp.int32(slot), jnp.int32(start_id),
                jnp.int32(0))
            self._b_active_host[slot] = True
            return
        self._tokens[slot] = start_id
        self._set_slot_sampling(slot, req)
        if self._dstate is not None:
            # The decoder starts from the start token at position 0 (no
            # decoder-side prefill for encoder-decoder admits).
            self._dstate = self._slot_write(
                self._dstate, jnp.int32(slot), jnp.int32(start_id),
                jnp.int32(0), jnp.int32(0))
        if self._seen.shape[0]:
            # Reset the slot's penalty history (no token generated yet —
            # the -1 sentinel resets without recording).
            self._seen = self._seen_admit(
                self._seen, jnp.int32(slot), jnp.int32(-1))
            self._hist = self._hist_admit(
                self._hist, jnp.int32(slot), jnp.int32(-1))

    def _init_draft(self, dm):
        """Encoder-decoder draft model: per-slot cross-attention memory of
        its own plus a parallel self-cache; the draft encodes the same
        source at admit and proposes K-1 target tokens per round."""
        if not dm.is_sequence_to_sequence:
            raise ValueError(
                "the continuous translator's draft_model must be an "
                "encoder-decoder model")
        if T.ring_capacity(dm.arch):
            raise NotImplementedError(
                "sliding-window draft models are not supported")
        if any(l.self_attention.has_memory_kv
               for l in dm.arch.decoder.layers):
            raise NotImplementedError(
                "merged-attention draft models are not supported")
        if dm.arch.encoder.embeddings.num_features > 1:
            raise NotImplementedError(
                "source-factor draft models are not supported")
        if len(dm.target_vocabulary) != len(self._vocab):
            raise ValueError(
                "draft model vocabulary size "
                f"({len(dm.target_vocabulary)}) must match the target "
                f"model ({len(self._vocab)})")
        if len(dm.source_vocabularies[0]) != len(self._src_vocab):
            raise ValueError(
                "draft model source vocabulary size must match the "
                "target model")
        self._alloc_draft_state(dm)
        self._draft_encode_fns = {}

    def _alloc_draft_state(self, dm):
        """Shared draft-state allocation for the encoder-decoder engines:
        parallel self-cache + per-slot cross-attention memory + the
        memory-aware draft scan."""
        dm.ensure_consts(self._capacity)
        self._draft_model = dm
        self._draft_cache = T.init_self_cache(
            dm.arch, self._num_slots, self._capacity, dtype=dm.kv_dtype,
            stacked=dm.scan_layers, ring=True)
        self._draft_mem = []
        for layer in dm.arch.decoder.layers:
            a = layer.cross_attention
            if a is None:
                self._draft_mem.append(None)
                continue
            shape = (self._num_slots, a.num_heads_kv, self._max_src,
                     a.head_dim)
            self._draft_mem.append({
                "k": jnp.zeros(shape, dm.out_dtype),
                "v": jnp.zeros(shape, dm.out_dtype),
            })
        self._draft_mem_insert = jax.jit(
            self._mem_insert_impl, donate_argnums=(0,))
        self._draft_fn = self._build_draft_fn()

    def _build_draft_fn(self):
        dm = self._draft_model
        arch = dm.arch
        quantize_acts = dm.policy.quantize_activations
        out_dtype = dm.out_dtype
        K = self._spec_k
        S_max = self._max_src

        def draft(params, consts, cache, mem, src_len, last, pos,
                  gen_len, prefix, plen):
            from ..ops import attention as attn_ops

            mem_bias = attn_ops.length_mask_bias(src_len, S_max)

            # Same K-feed scan as the decoder-only draft (the extra feed
            # keeps the bonus-token path cache-complete), with the forced
            # target prefix applied INSIDE the scan so the draft cache
            # matches the accepted stream during the forced phase.
            def body(carry, j):
                tok, cache = carry
                logits, cache, _ = T.decoder_forward(
                    arch, params, consts, tok[:, None], pos + j, cache,
                    mem, mem_bias, quantize_acts=quantize_acts,
                    out_dtype=out_dtype)
                l = logits[:, -1].astype(jnp.float32)
                l = proc.disable_tokens(l, self._suppress_ids)
                nxt = jnp.argmax(l, axis=-1).astype(jnp.int32)
                idx = gen_len + j
                forced = jnp.take_along_axis(
                    prefix, jnp.minimum(idx, prefix.shape[1] - 1)[:, None],
                    axis=1)[:, 0]
                nxt = jnp.where(idx < plen, forced, nxt)
                return (nxt, cache), nxt

            (_, cache), drafts = jax.lax.scan(
                body, (last, cache), jnp.arange(K, dtype=jnp.int32))
            return jnp.transpose(drafts)[:, : K - 1], cache

        return jax.jit(draft, donate_argnums=(2,))

    def _draft(self, req, k: int):
        # Translation drafts from the TARGET side only (source ids live in
        # a different vocabulary space).
        start = getattr(req, "start_id", None)
        if start is None:
            start = self._start_id
        ctx = [start] + req.generated
        draft = []
        if len(ctx) >= 3:
            a, b = ctx[-2], ctx[-1]
            for j in range(len(ctx) - 2, 0, -1):
                if ctx[j] == b and ctx[j - 1] == a:
                    draft = ctx[j + 1: j + 1 + k]
                    break
        while len(draft) < k:
            draft.append(ctx[-1])
        return draft[:k]

    def _build_spec_step(self):
        model = self.model
        arch = model.arch
        quantize_acts = model.policy.quantize_activations
        out_dtype = model.out_dtype
        K = self._spec_k
        S_max = self._max_src
        max_ngram = self._max_ngram

        def step(params, consts, cache, mem, src_len, tokens, pos,
                 gen_len, min_len, temps, end_table, sup_table, rep_pens,
                 ngrams, prefix, plen, key, n, seen, hist):
            from ..ops import attention as attn_ops

            pen = seen.shape[0] > 0
            mem_bias = attn_ops.length_mask_bias(src_len, S_max)
            logits, cache, _ = T.decoder_forward(
                arch, params, consts, tokens, pos, cache, mem, mem_bias,
                quantize_acts=quantize_acts, out_dtype=out_dtype)
            l = logits.astype(jnp.float32)  # [S, K, V]
            if pen:
                # Same sequentialized intra-chunk state as the
                # decoder-only spec step (see _build_spec_step above).
                S_n, V_n = l.shape[0], l.shape[-1]
                oh = jax.nn.one_hot(tokens[:, 1:], V_n, dtype=jnp.bool_)
                cum = jax.lax.associative_scan(
                    jnp.logical_or, oh, axis=1)
                intra = jnp.concatenate(
                    [jnp.zeros((S_n, 1, V_n), jnp.bool_), cum], axis=1)
                l = self._apply_rep_penalty(l, seen[:, None, :], rep_pens,
                                            intra)
                Lh = hist.shape[1]
                rows_h = jnp.arange(S_n, dtype=jnp.int32)[:, None]
                posn = (gen_len[:, None]
                        + jnp.arange(K - 1, dtype=jnp.int32)[None, :])
                posn = jnp.where(posn < Lh, posn, Lh)
                hist_fed = hist.at[rows_h, posn].set(
                    tokens[:, 1:], mode="drop")
                l = jnp.stack(
                    [proc.no_repeat_ngram_per_row(
                        l[:, j], hist_fed, gen_len + j, ngrams, max_ngram)
                     for j in range(K)], axis=1)
            l = proc.disable_tokens(l, self._suppress_ids)
            if sup_table.shape[1]:
                l = jnp.where(
                    self._end_mask(sup_table, l.shape[-1])[:, None, :],
                    proc.DISABLE, l)
            gl = gen_len[:, None] + jnp.arange(K, dtype=jnp.int32)[None]
            disable = gl < min_len[:, None]
            mask = self._end_mask(end_table, l.shape[-1])
            l = jnp.where(disable[..., None] & mask[:, None, :],
                          proc.DISABLE, l)
            greedy = jnp.argmax(l, axis=-1).astype(jnp.int32)
            # Hard target prefixes force the emitted token per position.
            gl = gen_len[:, None] + jnp.arange(K, dtype=jnp.int32)[None]
            forced = jnp.take_along_axis(
                prefix, jnp.minimum(gl, prefix.shape[1] - 1), axis=1)
            use = gl < plen[:, None]
            greedy = jnp.where(use, forced, greedy)
            picked = jnp.take_along_axis(
                jax.nn.log_softmax(l, axis=-1), greedy[..., None],
                axis=-1)[..., 0]
            picked = jnp.where(use, 0.0, picked)
            return greedy, picked, cache

        return jax.jit(step, donate_argnums=(2,))

    def _build_step(self):
        model = self.model
        arch = model.arch
        quantize_acts = model.policy.quantize_activations
        out_dtype = model.out_dtype
        block = self._block
        S_max = self._max_src
        max_ngram = self._max_ngram
        cap = self._capacity

        wts = getattr(self, "_wts", None)

        def step(params, consts, cache, mem, src_len, state,
                 min_len, temps, topks, topps, seeds, end_table,
                 sup_table, rep_pens, ngrams, prefix, plen, ts_on, key, n,
                 seen, hist):
            from ..ops import attention as attn_ops

            tokens, pos, gen_len = (state["tokens"], state["pos"],
                                    state["gen"])
            pos = jnp.minimum(pos, cap - block)
            pen = seen.shape[0] > 0
            mem_bias = attn_ops.length_mask_bias(src_len, S_max)

            def body(carry, i):
                tokens, pos, gen_len, cache, seen, hist = carry
                logits, cache, _ = T.decoder_forward(
                    arch, params, consts, tokens[:, None], pos, cache,
                    mem, mem_bias, quantize_acts=quantize_acts,
                    out_dtype=out_dtype)
                l = logits[:, -1].astype(jnp.float32)
                if pen:
                    l = self._apply_rep_penalty(l, seen, rep_pens)
                    l = proc.no_repeat_ngram_per_row(
                        l, hist, gen_len, ngrams, max_ngram)
                disable_end = gen_len < min_len
                if wts is not None and pen:
                    # Whisper timestamp rules per slot (reference:
                    # whisper.cc:742-865 via processors.py), applied
                    # over the same suppress/end-disable state the batch
                    # engine's step sees, gated by each slot's prompt
                    # (<|notimestamps|> turns them off). The generated
                    # history is the penalty hist table; plen is the
                    # forced-prompt length (sample_begin).
                    lp = proc.disable_tokens(l, self._suppress_ids)
                    if sup_table.shape[1]:
                        lp = proc.disable_tokens_per_row(lp, sup_table)
                    lp = jnp.where(
                        disable_end[:, None]
                        & self._end_mask(end_table, lp.shape[-1]),
                        proc.DISABLE, lp)
                    lp = proc.whisper_timestamp_rules(
                        lp, hist, gen_len, plen, *wts)
                    l = jnp.where(ts_on[:, None], lp, l)
                ids, scores = self._sample_logits(
                    l, disable_end,
                    jax.random.fold_in(key, n * block + i), temps=temps,
                    topks=topks, topps=topps, seeds=seeds,
                    end_table=end_table, sup_table=sup_table)
                # Hard target prefix: force while gen_len < plen (the
                # forced token is what gets FED, so the cache stays right).
                forced = jnp.take_along_axis(
                    prefix, jnp.minimum(gen_len, prefix.shape[1] - 1)[:, None],
                    axis=1)[:, 0]
                use = gen_len < plen
                ids = jnp.where(use, forced, ids)
                scores = jnp.where(use, 0.0, scores)
                if pen:
                    rows = jnp.arange(ids.shape[0])
                    seen = seen.at[rows, ids].set(True)
                    hist = hist.at[rows, gen_len].set(ids)
                return ((ids, pos + 1, gen_len + 1, cache, seen, hist),
                        (ids, scores))

            (tokens, pos, gen_len, cache, seen, hist), (ids_k, scores_k) = \
                jax.lax.scan(
                    body, (tokens, pos, gen_len, cache, seen, hist),
                    jnp.arange(block, dtype=jnp.int32))
            out_state = {"tokens": tokens, "pos": pos, "gen": gen_len}
            return ids_k, scores_k, cache, out_state, seen, hist

        return jax.jit(step, donate_argnums=(2, 5, 20, 21))

    def _decode_step_spec(self, active):
        model = self.model
        S, K = self._num_slots, self._spec_k
        tokens = np.zeros((S, K), np.int32)
        min_len = np.zeros(S, np.int32)
        gen_len = np.zeros(S, np.int32)
        for i in active:
            req = self._slots[i]
            min_len[i] = req.min_length
            gen_len[i] = len(req.generated)
        pos = np.minimum(self._pos, self._capacity - K)
        model_drafts = None
        if self._draft_model is not None:
            dm = self._draft_model
            drafts_d, self._draft_cache = self._draft_fn(
                dm.params, dm.consts, self._draft_cache, self._draft_mem,
                jnp.asarray(self._src_len), jnp.asarray(self._tokens),
                jnp.asarray(pos), jnp.asarray(gen_len),
                jnp.asarray(self._prefix), jnp.asarray(self._plen))
            model_drafts = np.asarray(drafts_d)
        for i in active:
            tokens[i, 0] = self._tokens[i]
            tokens[i, 1:] = (model_drafts[i] if model_drafts is not None
                             else self._draft(self._slots[i], K - 1))

        greedy_d, scores_d, self._cache = self._step_fn(
            model.params, model.consts, self._cache, self._mem,
            jnp.asarray(self._src_len), jnp.asarray(tokens),
            jnp.asarray(pos), jnp.asarray(gen_len), jnp.asarray(min_len),
            jnp.asarray(self._temps), jnp.asarray(self._end_table),
            jnp.asarray(self._sup_table), jnp.asarray(self._rep_pens),
            jnp.asarray(self._ngrams), jnp.asarray(self._prefix),
            jnp.asarray(self._plen), self._key,
            jnp.int32(self._step_count + 0x40000000), self._seen,
            self._hist)
        self._step_count += 1
        self._slot_steps += len(active)
        self._accept_spec_round(active, np.asarray(greedy_d),
                                np.asarray(scores_d, np.float32), tokens, K,
                                gen_len)

    def _dispatch_block(self, active: List[int]):
        model = self.model
        min_len = np.zeros(self._num_slots, np.int32)
        binding = {}
        for i in active:
            req = self._slots[i]
            min_len[i] = req.min_length
            binding[i] = req

        ids_d, scores_d, self._cache, self._dstate, self._seen, \
            self._hist = self._step_fn(
                model.params, model.consts, self._cache, self._mem,
                jnp.asarray(self._src_len), self._dstate,
                jnp.asarray(min_len),
                jnp.asarray(self._temps), jnp.asarray(self._topks),
                jnp.asarray(self._topps), jnp.asarray(self._seeds),
                jnp.asarray(self._end_table),
                jnp.asarray(self._sup_table),
                jnp.asarray(self._rep_pens), jnp.asarray(self._ngrams),
                jnp.asarray(self._prefix),
                jnp.asarray(self._plen), jnp.asarray(self._ts_on),
                self._key,
                jnp.int32((self._step_count // max(1, self._block))
                          + 0x40000000), self._seen, self._hist)
        self._step_count += self._block
        self._slot_steps += len(active) * self._block
        if not self._queue.empty():
            self._steps_while_pending += 1
        return (ids_d, scores_d, binding)


class ContinuousWhisper(ContinuousTranslator):
    """Iteration-level serving for Whisper-style speech models (beyond the
    reference, whose Whisper runs batches to completion).

    ``submit(features, prompt)`` encodes the request's mel features
    [n_mels, frames] into the slot's cross-attention memory (one
    dispatch) and forces the prompt (the SOT token sequence) exactly like
    a target prefix. Whisper's timestamp-rules processor (reference:
    src/models/whisper.cc:742-865) applies per slot whenever the
    request's prompt does not end with ``<|notimestamps|>``, under
    greedy AND beam serving (speculation requires notimestamps
    prompts); the model's config ``suppress_ids`` are suppressed every
    step.
    """

    def __init__(self, whisper, *, max_target_prefix: int = 16,
                 max_initial_timestamp_index: int = 50, **kw):
        model = whisper.model
        enc = model.arch.encoder
        if enc is None or not enc.num_conv_layers:
            raise ValueError(
                "ContinuousWhisper requires a Whisper-style speech model")
        # Timestamp-rules ids (reference ApplyTimestampRules,
        # src/models/whisper.cc:742-865): applied per request when its
        # prompt does NOT end with <|notimestamps|>, like the batch API.
        self._wts = None
        v = model.target_vocabulary
        if "<|notimestamps|>" in v and "<|endoftext|>" in v:
            no_ts = v.to_id("<|notimestamps|>")
            ts_begin = no_ts + 1
            self._wts = (v.to_id("<|endoftext|>"), no_ts, ts_begin,
                         len(v) - 1,
                         ts_begin + max_initial_timestamp_index)
        self._translator = whisper
        # The encoder output capacity is the sinusoidal PE table length
        # (max_source_positions; reference src/layers/whisper.cc:44-49).
        self._max_src = int(
            model.params["encoder"]["position_encodings"].shape[0])
        self._src_vocab = None
        self._start_id = None  # per request: prompt[0]
        if "end_token" not in kw and "<|endoftext|>" in model.target_vocabulary:
            kw["end_token"] = "<|endoftext|>"
        self._init_common(model, **kw)
        sup = tuple(int(i) for i in (model.config.get("suppress_ids") or ()))
        self._suppress_ids = tuple(sorted(set(self._suppress_ids) | set(sup)))
        self._init_seq2seq_state(max_target_prefix)
        self._speech_encode_fns = {}
        self._start_loop()

    def _init_draft(self, dm):
        """Speech draft model (a smaller Whisper): encodes the same mel
        segment into its own per-slot memory at admit; the inherited
        translator draft scan (memory + forced-prefix) proposes tokens."""
        enc = dm.arch.encoder
        if enc is None or not enc.num_conv_layers:
            raise ValueError(
                "ContinuousWhisper's draft_model must be a Whisper-style "
                "speech model")
        if T.ring_capacity(dm.arch):
            raise NotImplementedError(
                "sliding-window draft models are not supported")
        if any(l.self_attention.has_memory_kv
               for l in dm.arch.decoder.layers):
            raise NotImplementedError(
                "merged-attention draft models are not supported")
        if len(dm.target_vocabulary) != len(self._vocab):
            raise ValueError(
                "draft model vocabulary size "
                f"({len(dm.target_vocabulary)}) must match the target "
                f"model ({len(self._vocab)})")
        n_mels = self.model.params["encoder"]["convs"][0]["w"].shape[1]
        d_mels = dm.params["encoder"]["convs"][0]["w"].shape[1]
        if d_mels != n_mels:
            raise ValueError(
                f"draft model expects {d_mels} mel bins, the target model "
                f"{n_mels}")
        if dm.params["encoder"]["position_encodings"].shape[0] < self._max_src:
            raise ValueError(
                "draft model encoder capacity is smaller than the target's")
        self._alloc_draft_state(dm)
        self._draft_speech_encode_fns = {}

    def _get_draft_speech_encode(self, frames: int):
        fn = self._draft_speech_encode_fns.get(frames)
        if fn is None:
            fn = self._make_encode_fn(self._draft_model, frames,
                                      speech=True)
            self._draft_speech_encode_fns[frames] = fn
        return fn

    # Multi-host: the mel features ride the admit record (base64 over
    # the chunked _DistControl broadcast) so followers replay the same
    # speech encode; see _leader_loop_inner.

    def _req_payload(self, req: _Request) -> dict:
        import base64

        p = super()._req_payload(req)
        p["features_shape"] = list(req.features.shape)
        p["features_b64"] = base64.b64encode(
            np.ascontiguousarray(req.features).tobytes()).decode("ascii")
        p["ts_on"] = bool(getattr(req, "ts_on", False))
        return p

    def _req_from_payload(self, p: dict) -> _Request:
        import base64

        req = super()._req_from_payload(p)
        req.features = np.frombuffer(
            base64.b64decode(p["features_b64"]), np.float32).reshape(
                p["features_shape"])
        req.ts_on = bool(p["ts_on"])
        return req

    def submit(self, features, prompt: Sequence, *, max_length: int = 256,
               min_length: int = 0,
               sampling_temperature: float = None,
               sampling_topk: int = None,
               sampling_topp: float = None,
               seed: int = None,
               end_token=None,
               repetition_penalty: float = None,
               no_repeat_ngram_size: int = None,
               suppress_tokens: Sequence = None,
               num_hypotheses: int = None,
               callback=None,
               stop_sequences: Sequence[Sequence] = None) -> Future:
        """Queue one audio segment: ``features`` [n_mels, frames] mel
        input, ``prompt`` the SOT token sequence (tokens or ids). The
        Future resolves to a GenerationResult whose tokens start with the
        forced prompt tail (``prompt[1:]``, like ContinuousTranslator's
        target_prefix) followed by the transcription; the start token
        itself is excluded."""
        if self._closed:
            raise RuntimeError("The batcher is closed")
        self._check_distributed_submit(callback)
        if not prompt:
            raise ValueError("The prompt must contain at least one token")
        v = self._vocab
        ids = [t if isinstance(t, int) else v.to_id(t, allow_unk=False)
               for t in prompt]
        if len(ids) - 1 > self._max_prefix:
            raise ValueError(
                f"prompt length {len(ids)} exceeds max_target_prefix + 1 "
                f"({self._max_prefix + 1})")
        if max_length + max(self._block, self._spec_k) > self._capacity:
            raise ValueError("max_length exceeds the slot capacity")
        feats = np.asarray(features, np.float32)
        if feats.ndim != 2:
            raise ValueError(
                "features must be one segment of shape [n_mels, frames]")
        # Stride-2 conv output length is ceil(frames / 2) (kernel 3, pad 1).
        if (feats.shape[-1] + 1) // 2 > self._max_src:
            raise ValueError(
                f"features length {feats.shape[-1]} exceeds the encoder "
                f"capacity ({2 * self._max_src} frames)")
        self._validate_request_sampling(sampling_topk, sampling_topp, seed)
        self._validate_beam_request(num_hypotheses)
        rep, ngram, sup_ids = self._validate_request_penalties(
            repetition_penalty, no_repeat_ngram_size, suppress_tokens)
        req = _Request(prompt_ids=[], max_length=max_length,
                       min_length=min_length + (len(ids) - 1),
                       temperature=sampling_temperature or 0.0,
                       topk=sampling_topk, topp=sampling_topp, seed=seed,
                       end_ids=self._resolve_request_end_ids(end_token),
                       rep_penalty=rep, ngram=ngram, suppress_ids=sup_ids,
                       num_hypotheses=num_hypotheses,
                       callback=callback,
                       stop_sequences=self._stop_ids(stop_sequences))
        req.start_id = ids[0]
        req.prefix_ids = ids[1:]
        req.forced_len = len(ids) - 1
        req.features = feats
        # Timestamp rules apply when the prompt doesn't opt out with
        # <|notimestamps|> (batch-API semantics, runtime/whisper.py).
        req.ts_on = self._wts is not None and ids[-1] != self._wts[1]
        if req.ts_on and self._spec_k > 1:
            raise NotImplementedError(
                "Whisper timestamp rules are not compatible with "
                "speculation; use <|notimestamps|> prompts or "
                "speculation_k=0")
        self._queue.put(req)
        self._wake.set()
        return req.future

    def _get_speech_encode(self, frames: int):
        # One executable per distinct frame count. Whisper serving feeds a
        # FIXED mel length (the 30 s window padded upstream, as in the
        # reference), so this compiles once; zero-padding variable frames
        # here would be wrong — the speech encoder attends all frames
        # unmasked, like the reference's (src/layers/whisper.cc:25-62).
        fn = self._speech_encode_fns.get(frames)
        if fn is None:
            fn = self._make_encode_fn(self.model, frames, speech=True)
            self._speech_encode_fns[frames] = fn
        return fn

    def _prefill_into_slot(self, slot: int, req: _Request):
        model = self.model
        feats = req.features[None]  # [1, n_mels, frames]
        sub = self._get_speech_encode(feats.shape[-1])(
            model.params, model.consts, jnp.asarray(feats))
        self._mem = self._mem_insert(self._mem, sub, jnp.int32(slot))
        if self._draft_model is not None:
            dm = self._draft_model
            dsub = self._get_draft_speech_encode(feats.shape[-1])(
                dm.params, dm.consts, jnp.asarray(feats))
            self._draft_mem = self._draft_mem_insert(
                self._draft_mem, dsub, jnp.int32(slot))
        self._slots[slot] = req
        # Encoder output length: ceil(frames / 2) (the stride-2 conv with
        # kernel 3, padding 1), capped by the PE table.
        self._src_len[slot] = min((feats.shape[-1] + 1) // 2, self._max_src)
        self._pos[slot] = 0
        prefix = req.prefix_ids or []
        self._prefix[slot, :] = 0
        self._prefix[slot, : len(prefix)] = prefix
        self._plen[slot] = len(prefix)
        self._ts_on[slot] = getattr(req, "ts_on", False)
        if self._beam > 1:
            self._set_beam_slot_options(slot, req)
            self._bstate = self._beam_reset_fn(
                self._bstate, jnp.int32(slot), jnp.int32(req.start_id),
                jnp.int32(0))
            self._b_active_host[slot] = True
            return
        self._tokens[slot] = req.start_id
        if self._dstate is not None:
            self._dstate = self._slot_write(
                self._dstate, jnp.int32(slot), jnp.int32(req.start_id),
                jnp.int32(0), jnp.int32(0))
        if self._ts_on[slot]:
            # The greedy rules read the generated history from the
            # penalty hist table — make sure it exists (1.0/0 penalty
            # rows stay no-ops for neighbors). Beam rows use the alive
            # table instead.
            self._ensure_pen_tables()
        self._set_slot_sampling(slot, req)
        if self._seen.shape[0]:
            self._seen = self._seen_admit(
                self._seen, jnp.int32(slot), jnp.int32(-1))
            self._hist = self._hist_admit(
                self._hist, jnp.int32(slot), jnp.int32(-1))
