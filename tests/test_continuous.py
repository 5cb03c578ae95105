"""Continuous (iteration-level) batching tests.

The key property the reference's serving runtime lacks and this engine
provides: a request submitted mid-decode of another joins the running
batch at the next step and completes WITHOUT waiting for the first
request's full generation."""

import time

import numpy as np
import pytest

from ctranslate2_tpu import ContinuousBatcher, Generator
from ctranslate2_tpu.converters.builder import build_decoder_only_model


@pytest.fixture(scope="module")
def gen_model(tmp_path_factory):
    d = tmp_path_factory.mktemp("ctsmodel")
    path = build_decoder_only_model(str(d / "m"), quantization=None)
    return Generator(path)


def _batcher(gen, **kw):
    kw.setdefault("num_slots", 4)
    kw.setdefault("capacity", 256)
    return ContinuousBatcher(gen, **kw)


def test_single_request_matches_generate_batch(gen_model):
    prompt = ["tok1", "tok2", "tok3"]
    expected = gen_model.generate_batch(
        [prompt], max_length=16, include_prompt_in_result=False,
        return_scores=True)[0]
    cb = _batcher(gen_model)
    try:
        result = cb.submit(prompt, max_length=16).result(timeout=300)
        assert result.sequences_ids[0] == expected.sequences_ids[0]
    finally:
        cb.close()


def test_parallel_requests_match_sequential(gen_model):
    prompts = [["tok1"], ["tok2", "tok3"], ["tok4", "tok1", "tok2"],
               ["tok3", "tok4"], ["tok2"], ["tok1", "tok4"]]
    expected = [
        gen_model.generate_batch([p], max_length=12,
                                 include_prompt_in_result=False)[0]
        for p in prompts
    ]
    cb = _batcher(gen_model, num_slots=3)
    try:
        futures = [cb.submit(p, max_length=12) for p in prompts]
        for f, e in zip(futures, expected):
            assert f.result(timeout=300).sequences_ids[0] == e.sequences_ids[0]
    finally:
        cb.close()


def test_join_mid_decode(gen_model):
    """A short request submitted while a long one is decoding finishes
    first — iteration-level batching, not run-to-completion."""
    cb = _batcher(gen_model, num_slots=2)
    try:
        long_f = cb.submit(["tok1"], max_length=120)
        # Wait until the long request is actually decoding.
        deadline = time.time() + 120
        while cb.num_steps < 5 and time.time() < deadline:
            time.sleep(0.01)
        assert cb.num_steps >= 5 and not long_f.done()
        steps_before = cb.num_steps
        short_f = cb.submit(["tok2"], max_length=3)
        short = short_f.result(timeout=300)
        assert len(short.sequences_ids[0]) <= 3
        # The short request completed while the long one was still running.
        assert not long_f.done()
        assert cb.num_steps > steps_before
        long_r = long_f.result(timeout=600)
        assert len(long_r.sequences_ids[0]) <= 120
    finally:
        cb.close()


def test_more_requests_than_slots(gen_model):
    cb = _batcher(gen_model, num_slots=2)
    try:
        futures = [cb.submit([f"tok{1 + i % 4}"], max_length=8)
                   for i in range(7)]
        results = [f.result(timeout=600) for f in futures]
        assert all(len(r.sequences_ids[0]) <= 8 for r in results)
    finally:
        cb.close()


def test_min_length_and_end_token(gen_model):
    cb = _batcher(gen_model)
    try:
        r = cb.submit(["tok1"], max_length=10, min_length=6).result(timeout=300)
        assert len(r.sequences_ids[0]) >= 6
    finally:
        cb.close()


def test_capacity_validation(gen_model):
    cb = _batcher(gen_model, capacity=32)
    try:
        with pytest.raises(ValueError, match="capacity"):
            cb.submit(["tok1"] * 20, max_length=100)
        with pytest.raises(ValueError):
            cb.submit([])
    finally:
        cb.close()


def test_close_rejects_new_requests(gen_model):
    cb = _batcher(gen_model)
    cb.close()
    with pytest.raises(RuntimeError):
        cb.submit(["tok1"])


def test_sampled_mode_runs(gen_model):
    cb = _batcher(gen_model, sampling_topk=5, sampling_temperature=0.8, seed=7)
    try:
        r = cb.submit(["tok1", "tok2"], max_length=10).result(timeout=300)
        assert 0 < len(r.sequences_ids[0]) <= 10
    finally:
        cb.close()


def test_int8_model_continuous(tmp_path):
    path = build_decoder_only_model(str(tmp_path / "m8"), quantization="int8")
    gen = Generator(path)
    expected = gen.generate_batch(
        [["tok1", "tok2"]], max_length=8,
        include_prompt_in_result=False)[0]
    cb = _batcher(gen)
    try:
        r = cb.submit(["tok1", "tok2"], max_length=8).result(timeout=300)
        assert r.sequences_ids[0] == expected.sequences_ids[0]
    finally:
        cb.close()


@pytest.mark.parametrize("positive", [True, False])
def test_alibi_model_continuous(tmp_path, positive):
    """ALiBi steps build a per-row bias from each slot's own position:
    staggered-position continuous decode must match the batch engine
    token-for-token (both position conventions)."""
    path = build_decoder_only_model(
        str(tmp_path / f"alibi{positive}"), alibi=True,
        alibi_positive=positive)
    gen = Generator(path)
    prompts = [["tok1"], ["tok2", "tok3", "tok4"], ["tok5", "tok6"],
               ["tok7", "tok1", "tok2", "tok3"]]
    expected = [
        gen.generate_batch([p], max_length=12,
                           include_prompt_in_result=False)[0]
        for p in prompts
    ]
    cb = _batcher(gen, num_slots=3)  # staggered positions across slots
    try:
        futures = [cb.submit(p, max_length=12) for p in prompts]
        for f, e in zip(futures, expected):
            assert f.result(timeout=300).sequences_ids[0] == \
                e.sequences_ids[0]
    finally:
        cb.close()


def test_alibi_speculation_matches_greedy(tmp_path):
    """Speculative verify chunks (T=K, per-row positions) must stay
    lossless on ALiBi models: each in-chunk query gets its own bias row."""
    path = build_decoder_only_model(str(tmp_path / "alibispec"), alibi=True,
                                    alibi_positive=False)
    gen = Generator(path)
    prompts = [["tok1", "tok2"], ["tok3"], ["tok4", "tok5", "tok6"]]
    expected = [
        gen.generate_batch([p], max_length=14,
                           include_prompt_in_result=False)[0]
        for p in prompts
    ]
    cb = _batcher(gen, num_slots=2, speculation_k=4)
    try:
        futures = [cb.submit(p, max_length=14) for p in prompts]
        for f, e in zip(futures, expected):
            assert f.result(timeout=300).sequences_ids[0] == \
                e.sequences_ids[0]
    finally:
        cb.close()


# ----------------------------------------------------------------------
# Encoder-decoder continuous batching (beyond reference).
# ----------------------------------------------------------------------


def test_continuous_translator_matches_translate_batch():
    from ctranslate2_tpu import ContinuousTranslator, Translator

    MODEL = "/root/reference/tests/data/models/v2/aren-transliteration"
    SRC1 = ["آ", "ت", "ز", "م", "و", "ن"]
    SRC2 = ["آ", "ت", "ش", "ي", "س", "و", "ن"]
    t = Translator(MODEL)
    expected = t.translate_batch([SRC1, SRC2], beam_size=1)
    ct = ContinuousTranslator(t, num_slots=3, capacity=128,
                              max_source_len=32)
    try:
        f1 = ct.submit(SRC1, max_length=32)
        f2 = ct.submit(SRC2, max_length=32)
        v = t.model.target_vocabulary
        got1 = [v.to_token(i) for i in f1.result(timeout=300).sequences_ids[0]]
        got2 = [v.to_token(i) for i in f2.result(timeout=300).sequences_ids[0]]
        assert got1 == expected[0].hypotheses[0]
        assert got2 == expected[1].hypotheses[0]
    finally:
        ct.close()


def test_continuous_translator_many_requests():
    from ctranslate2_tpu import ContinuousTranslator, Translator

    MODEL = "/root/reference/tests/data/models/v2/aren-transliteration"
    t = Translator(MODEL)
    srcs = [["آ", "ت", "ز", "م", "و", "ن"],
            ["آ", "ت", "ش", "ي", "س", "و", "ن"]] * 3
    expected = t.translate_batch(srcs, beam_size=1)
    ct = ContinuousTranslator(t, num_slots=2, capacity=128,
                              max_source_len=32)
    try:
        futures = [ct.submit(s, max_length=32) for s in srcs]
        v = t.model.target_vocabulary
        for f, e in zip(futures, expected):
            got = [v.to_token(i)
                   for i in f.result(timeout=600).sequences_ids[0]]
            assert got == e.hypotheses[0]
    finally:
        ct.close()


def test_continuous_translator_validation():
    from ctranslate2_tpu import ContinuousTranslator, Translator

    MODEL = "/root/reference/tests/data/models/v2/aren-transliteration"
    t = Translator(MODEL)
    ct = ContinuousTranslator(t, num_slots=2, capacity=64, max_source_len=16)
    try:
        with pytest.raises(ValueError, match="max_source_len"):
            ct.submit(["آ"] * 20)
        with pytest.raises(ValueError):
            ct.submit([])
    finally:
        ct.close()


def test_per_request_temperature(gen_model):
    """Different temperatures coexist in one fleet: temp→0 in sampled mode
    converges to the greedy continuation while a hot request differs."""
    greedy = gen_model.generate_batch(
        [["tok1", "tok2"]], max_length=12,
        include_prompt_in_result=False)[0]
    cb = _batcher(gen_model, sampling_topk=0, sampling_temperature=1.0,
                  seed=3)
    try:
        cold = cb.submit(["tok1", "tok2"], max_length=12,
                         sampling_temperature=1e-4)
        # min_length=1 keeps the assertion robust to the ~1.5% chance of
        # the hot request sampling EOS as its very first token.
        hot = cb.submit(["tok1", "tok2"], max_length=12, min_length=1,
                        sampling_temperature=5.0)
        assert cold.result(timeout=300).sequences_ids[0] == \
            greedy.sequences_ids[0]
        assert hot.result(timeout=300).sequences_ids[0]
    finally:
        cb.close()


def test_continuous_translator_target_prefix():
    from ctranslate2_tpu import ContinuousTranslator, Translator

    MODEL = "/root/reference/tests/data/models/v2/aren-transliteration"
    SRC1 = ["آ", "ت", "ز", "م", "و", "ن"]
    t = Translator(MODEL)
    expected = t.translate_batch([SRC1], target_prefix=[["a", "t", "s"]],
                                 beam_size=1)[0]
    ct = ContinuousTranslator(t, num_slots=2, capacity=128,
                              max_source_len=32)
    try:
        f = ct.submit(SRC1, max_length=32, target_prefix=["a", "t", "s"])
        v = t.model.target_vocabulary
        got = [v.to_token(i) for i in f.result(timeout=300).sequences_ids[0]]
        assert got[:3] == ["a", "t", "s"]
        assert got == expected.hypotheses[0]
        with pytest.raises(ValueError, match="max_target_prefix"):
            ct.submit(SRC1, max_length=32, target_prefix=["a"] * 64)
    finally:
        ct.close()


def test_stats(gen_model):
    cb = _batcher(gen_model)
    try:
        cb.submit(["tok1"], max_length=8).result(timeout=300)
        s = cb.stats()
        assert s["num_requests"] == 1
        assert s["num_tokens"] >= 1
        assert s["num_steps"] >= 1
        assert 0.0 < s["mean_slot_occupancy"] <= 1.0
        assert s["tokens_per_sec"] > 0
    finally:
        cb.close()


# ----------------------------------------------------------------------
# Prompt-lookup speculative decoding (lossless under greedy).
# ----------------------------------------------------------------------


@pytest.mark.parametrize("spec_k", [2, 4])
def test_speculation_matches_greedy(gen_model, spec_k):
    prompts = [["tok1", "tok2", "tok3"], ["tok2"],
               ["tok4", "tok1", "tok4", "tok1"]]
    expected = [
        gen_model.generate_batch([p], max_length=24,
                                 include_prompt_in_result=False)[0]
        for p in prompts
    ]
    cb = _batcher(gen_model, num_slots=3, speculation_k=spec_k)
    try:
        futures = [cb.submit(p, max_length=24) for p in prompts]
        for f, e in zip(futures, expected):
            assert f.result(timeout=600).sequences_ids[0] == \
                e.sequences_ids[0]
        s = cb.stats()
        assert s["spec_tokens_per_dispatch"] >= 1.0
    finally:
        cb.close()


def test_speculation_min_max_length(gen_model):
    cb = _batcher(gen_model, speculation_k=4)
    try:
        r = cb.submit(["tok1"], max_length=9, min_length=6).result(timeout=300)
        assert 6 <= len(r.sequences_ids[0]) <= 9
    finally:
        cb.close()


def test_speculation_validation(gen_model):
    with pytest.raises(NotImplementedError, match="greedy"):
        _batcher(gen_model, speculation_k=4, sampling_topk=5)


# ----------------------------------------------------------------------
# Token-streaming callbacks.
# ----------------------------------------------------------------------


def test_streaming_callback(gen_model):
    expected = gen_model.generate_batch(
        [["tok1", "tok2"]], max_length=12,
        include_prompt_in_result=False)[0].sequences_ids[0]
    cb = _batcher(gen_model)
    try:
        seen = []

        def on_tok(sr):
            seen.append((sr.step, sr.token_id, sr.is_last))

        r = cb.submit(["tok1", "tok2"], max_length=12,
                      callback=on_tok).result(timeout=300)
        ids = r.sequences_ids[0]
        assert ids == expected
        streamed = [t for _, t, _ in seen]
        # The stripped end token may trail the streamed sequence.
        assert streamed[: len(ids)] == ids
        assert [s for s, _, _ in seen] == list(range(len(seen)))
        assert seen[-1][2] or len(streamed) == len(ids)
    finally:
        cb.close()


def test_streaming_early_stop(gen_model):
    cb = _batcher(gen_model)
    try:
        r = cb.submit(["tok1"], max_length=32,
                      callback=lambda sr: sr.step >= 2).result(timeout=300)
        assert len(r.sequences_ids[0]) == 3
    finally:
        cb.close()


def test_http_server_example(gen_model):
    """The stdlib HTTP front-end (examples/http_server.py) serves
    non-streaming and SSE-streaming requests over the batcher."""
    import json
    import os
    import sys
    import urllib.request

    examples_dir = os.path.join(os.path.dirname(__file__), "..", "examples")
    sys.path.insert(0, examples_dir)
    try:
        import http_server as hs
    finally:
        sys.path.pop(0)

    cb = _batcher(gen_model)
    server = hs.serve(cb, port=0)
    port = server.server_address[1]
    base = f"http://127.0.0.1:{port}"
    try:
        expected = gen_model.generate_batch(
            [["tok1", "tok2"]], max_length=10,
            include_prompt_in_result=False)[0].sequences_ids[0]

        body = json.dumps({"prompt": ["tok1", "tok2"],
                           "max_length": 10}).encode()
        with urllib.request.urlopen(urllib.request.Request(
                f"{base}/generate", data=body,
                headers={"Content-Type": "application/json"}),
                timeout=600) as r:
            out = json.loads(r.read())
        assert out["token_ids"] == expected

        body = json.dumps({"prompt": ["tok1", "tok2"], "max_length": 10,
                           "stream": True}).encode()
        with urllib.request.urlopen(urllib.request.Request(
                f"{base}/generate", data=body), timeout=600) as r:
            lines = [ln for ln in r.read().decode().splitlines()
                     if ln.startswith("data: ")]
        assert lines[-1] == "data: [DONE]"
        streamed = [json.loads(ln[6:])["token_id"] for ln in lines[:-1]]
        assert streamed[: len(expected)] == expected

        with urllib.request.urlopen(f"{base}/stats", timeout=60) as r:
            stats = json.loads(r.read())
        assert stats["num_requests"] >= 2
    finally:
        server.shutdown()
        server.server_close()
        cb.close()


def test_no_repeat_ngram_matches_generate_batch(gen_model):
    """Per-slot no-repeat-ngram (device history buffer) matches the batch
    engine under greedy; slot reuse resets the history."""
    expected = gen_model.generate_batch(
        [["tok1", "tok2"]], max_length=24, include_prompt_in_result=False,
        no_repeat_ngram_size=2)[0].sequences_ids[0]
    plain = gen_model.generate_batch(
        [["tok1", "tok2"]], max_length=24,
        include_prompt_in_result=False)[0].sequences_ids[0]
    assert expected != plain  # the ban must actually bite

    cb = _batcher(gen_model, no_repeat_ngram_size=2)
    try:
        for _ in range(2):  # second pass reuses the slot
            got = cb.submit(
                ["tok1", "tok2"],
                max_length=24).result(timeout=600).sequences_ids[0]
            assert got == expected
    finally:
        cb.close()


@pytest.mark.parametrize("spec_k", [2, 4])
def test_no_repeat_ngram_with_speculation(gen_model, spec_k):
    """The verify chunk sequentializes the intra-chunk ngram state:
    position j bans with history + the fed draft tokens before it, so
    speculation stays lossless vs the sequential batch engine."""
    prompts = [["tok1", "tok2"], ["tok3"], ["tok4", "tok1"]]
    expected = [
        gen_model.generate_batch(
            [p], max_length=24, include_prompt_in_result=False,
            no_repeat_ngram_size=2)[0].sequences_ids[0]
        for p in prompts
    ]
    # The ban must actually bite on at least one prompt.
    plain = gen_model.generate_batch(
        [prompts[0]], max_length=24,
        include_prompt_in_result=False)[0].sequences_ids[0]
    assert expected[0] != plain

    cb = _batcher(gen_model, no_repeat_ngram_size=2, speculation_k=spec_k,
                  num_slots=2)
    try:
        futures = [cb.submit(p, max_length=24) for p in prompts]
        for f, e in zip(futures, expected):
            assert f.result(timeout=600).sequences_ids[0] == e
    finally:
        cb.close()


def test_stop_sequences(gen_model):
    """Multi-token stop sequences end the request and are trimmed from
    the result (all engines share the host-side matcher)."""
    expected = gen_model.generate_batch(
        [["tok1", "tok2"]], max_length=24,
        include_prompt_in_result=False)[0].sequences_ids[0]
    assert len(expected) >= 4
    stop = expected[2:4]
    cb = _batcher(gen_model)
    try:
        got = cb.submit(["tok1", "tok2"], max_length=24,
                        stop_sequences=[stop]
                        ).result(timeout=600).sequences_ids[0]
        assert got == expected[:2]
        # Token-string stop sequences resolve through the vocabulary.
        v = gen_model.model.target_vocabulary
        r2 = cb.submit(["tok1", "tok2"], max_length=24,
                       stop_sequences=[[v.to_token(t) for t in stop]],
                       ).result(timeout=600)
        assert r2.sequences_ids[0] == expected[:2]
        # Trimmed stop tokens don't leak into the score: the truncated
        # run's summed log-prob must be >= the full run's (fewer negative
        # terms).
        full = cb.submit(["tok1", "tok2"],
                         max_length=24).result(timeout=600)
        assert r2.scores[0] >= full.scores[0] - 1e-6
        # Bare strings are rejected with a clear error.
        with pytest.raises(ValueError, match="wrap single tokens"):
            cb.submit(["tok1"], max_length=8, stop_sequences=["</s>"])
    finally:
        cb.close()

    # Stops never fire inside a forced target prefix.
    from ctranslate2_tpu import ContinuousTranslator, Translator

    MODEL = "/root/reference/tests/data/models/v2/aren-transliteration"
    t = Translator(MODEL)
    v = t.model.target_vocabulary
    ct = ContinuousTranslator(t, num_slots=2, capacity=128,
                              max_source_len=32)
    try:
        src = ["آ", "ت", "ز", "م", "و", "ن"]
        ref = t.translate_batch([src], target_prefix=[["a", "t"]],
                                beam_size=1)[0].hypotheses[0]
        got = ct.submit(src, max_length=32, target_prefix=["a", "t"],
                        stop_sequences=[[v.to_id("t")]]
                        ).result(timeout=600).sequences_ids[0]
        # The forced "t" survives; a LATER "t" (if any) stops the request.
        toks = [v.to_token(i) for i in got]
        assert toks[:2] == ["a", "t"]
        assert toks == ref[:len(toks)]
    finally:
        ct.close()


def test_async_stream_and_cancel(gen_model):
    """async_stream yields the same tokens the future resolves to;
    queued-request futures are cancellable before they claim a slot."""
    import asyncio

    expected = gen_model.generate_batch(
        [["tok1", "tok2"]], max_length=10,
        include_prompt_in_result=False)[0].sequences_ids[0]
    cb = _batcher(gen_model)
    try:
        async def collect():
            toks = []
            async for sr in cb.async_stream(["tok1", "tok2"],
                                            max_length=10):
                toks.append(sr.token_id)
            return toks

        toks = asyncio.run(collect())
        assert toks[: len(expected)] == expected
    finally:
        cb.close()

    # Cancellation: saturate 1 slot, queue more, cancel a queued one.
    cb2 = _batcher(gen_model, num_slots=1)
    try:
        f1 = cb2.submit(["tok1"], max_length=48)
        f2 = cb2.submit(["tok2"], max_length=8)
        f3 = cb2.submit(["tok3"], max_length=8)
        assert f3.cancel() or f3.done()
        f1.result(timeout=600)
        f2.result(timeout=600)
        if f3.cancelled():
            import concurrent.futures

            with pytest.raises(concurrent.futures.CancelledError):
                f3.result(timeout=60)
            # A cancelled future must be NOTIFIED, or wait() hangs.
            done, not_done = concurrent.futures.wait([f3], timeout=30)
            assert f3 in done
        # The cancelled request is drained by a later _admit pass.
        import time as _time

        deadline = _time.time() + 30
        while cb2.stats()["num_queued"] and _time.time() < deadline:
            _time.sleep(0.05)
        assert cb2.stats()["num_queued"] == 0
    finally:
        cb2.close()


def test_repetition_penalty_matches_generate_batch(gen_model, tmp_path):
    """Per-slot repetition penalty (presence table on device) matches the
    batch engine's RepetitionPenalty under greedy — plain blocks, slot
    reuse, and speculative verify chunks."""
    expected = gen_model.generate_batch(
        [["tok1", "tok2"]], max_length=24, include_prompt_in_result=False,
        repetition_penalty=1.4)[0].sequences_ids[0]
    plain = gen_model.generate_batch(
        [["tok1", "tok2"]], max_length=24,
        include_prompt_in_result=False)[0].sequences_ids[0]
    assert expected != plain  # the penalty must actually bite

    cb = _batcher(gen_model, repetition_penalty=1.4)
    try:
        got = cb.submit(["tok1", "tok2"],
                        max_length=24).result(timeout=600).sequences_ids[0]
        assert got == expected
        # Slot reuse: the presence table resets at admit.
        got2 = cb.submit(["tok1", "tok2"],
                         max_length=24).result(timeout=600).sequences_ids[0]
        assert got2 == expected
    finally:
        cb.close()

    cbs = _batcher(gen_model, repetition_penalty=1.4, speculation_k=3)
    try:
        got3 = cbs.submit(["tok1", "tok2"],
                          max_length=24).result(timeout=600).sequences_ids[0]
        assert got3 == expected
    finally:
        cbs.close()

    # Encoder-decoder engines serve it too (batcher-level default).
    from ctranslate2_tpu import ContinuousTranslator, Translator
    from ctranslate2_tpu.converters.builder import build_seq2seq_model

    s2s = build_seq2seq_model(str(tmp_path / "s2s"))
    tr = Translator(s2s)
    src = ["tok1", "tok2", "tok3"]
    texp = tr.translate_batch([src], max_decoding_length=16,
                              beam_size=1,
                              repetition_penalty=1.4)[0].hypotheses[0]
    tplain = tr.translate_batch([src], max_decoding_length=16,
                                beam_size=1)[0].hypotheses[0]
    assert texp != tplain  # the penalty must bite on the seq2seq model too
    ct = ContinuousTranslator(tr, max_source_len=16,
                              repetition_penalty=1.4)
    try:
        v = tr.model.target_vocabulary
        got = ct.submit(src, max_length=16).result(timeout=600)
        assert [v.to_token(i) for i in got.sequences_ids[0]] == texp
    finally:
        ct.close()


def test_per_request_penalties_mixed_traffic(gen_model):
    """One slot runs repetition_penalty + no_repeat_ngram, its neighbor
    does not, in the SAME batcher with neutral defaults (exercising the
    lazy table enable): each matches the batch engine (reference:
    per-call options through the pool, translation.h:11-86)."""
    prompt = ["tok1", "tok2"]
    exp_pen = gen_model.generate_batch(
        [prompt], max_length=24, include_prompt_in_result=False,
        repetition_penalty=1.4,
        no_repeat_ngram_size=2)[0].sequences_ids[0]
    exp_plain = gen_model.generate_batch(
        [prompt], max_length=24,
        include_prompt_in_result=False)[0].sequences_ids[0]
    assert exp_pen != exp_plain  # the penalties must actually bite

    cb = _batcher(gen_model, num_slots=2)  # neutral defaults
    try:
        f_pen = cb.submit(prompt, max_length=24, repetition_penalty=1.4,
                          no_repeat_ngram_size=2)
        f_plain = cb.submit(prompt, max_length=24)
        assert f_pen.result(timeout=600).sequences_ids[0] == exp_pen
        assert f_plain.result(timeout=600).sequences_ids[0] == exp_plain
        # Tables stay enabled; later neutral traffic is still exact.
        f3 = cb.submit(prompt, max_length=24)
        assert f3.result(timeout=600).sequences_ids[0] == exp_plain
        # And a later penalized request reuses the (reset) slot state.
        f4 = cb.submit(prompt, max_length=24, repetition_penalty=1.4,
                       no_repeat_ngram_size=2)
        assert f4.result(timeout=600).sequences_ids[0] == exp_pen
    finally:
        cb.close()


def test_per_request_penalties_enable_mid_flight(gen_model):
    """Enabling the penalty tables while another request is mid-decode
    backfills its history exactly: the in-flight neutral request is
    unaffected and finishes identical to the batch engine."""
    long_prompt = ["tok3", "tok4"]
    exp_long = gen_model.generate_batch(
        [long_prompt], max_length=48,
        include_prompt_in_result=False)[0].sequences_ids[0]
    exp_pen = gen_model.generate_batch(
        [["tok1", "tok2"]], max_length=16, include_prompt_in_result=False,
        repetition_penalty=1.4)[0].sequences_ids[0]

    cb = _batcher(gen_model, num_slots=2, steps_per_sync=1)
    try:
        import threading as _threading

        started = _threading.Event()
        f_long = cb.submit(long_prompt, max_length=48,
                           callback=lambda sr: bool(started.set()))
        # Admit the penalized request only once the first is mid-decode.
        assert started.wait(timeout=300)
        f_pen = cb.submit(["tok1", "tok2"], max_length=16,
                          repetition_penalty=1.4)
        assert f_pen.result(timeout=600).sequences_ids[0] == exp_pen
        assert f_long.result(timeout=600).sequences_ids[0] == exp_long
    finally:
        cb.close()


@pytest.mark.parametrize("spec_k", [3])
def test_per_request_penalties_with_speculation(gen_model, spec_k):
    """Per-request penalties stay lossless under speculative decoding
    (the verify chunk sequentializes per-row intra-chunk state)."""
    prompt = ["tok1", "tok2"]
    exp_pen = gen_model.generate_batch(
        [prompt], max_length=24, include_prompt_in_result=False,
        repetition_penalty=1.4,
        no_repeat_ngram_size=2)[0].sequences_ids[0]
    exp_plain = gen_model.generate_batch(
        [prompt], max_length=24,
        include_prompt_in_result=False)[0].sequences_ids[0]

    cb = _batcher(gen_model, num_slots=2, speculation_k=spec_k)
    try:
        f_pen = cb.submit(prompt, max_length=24, repetition_penalty=1.4,
                          no_repeat_ngram_size=2)
        f_plain = cb.submit(prompt, max_length=24)
        assert f_pen.result(timeout=600).sequences_ids[0] == exp_pen
        assert f_plain.result(timeout=600).sequences_ids[0] == exp_plain
    finally:
        cb.close()


def test_per_request_suppress_tokens(gen_model):
    """Per-request suppress_tokens (zero-width table grown on demand)
    matches the batch engine's single-token suppress_sequences."""
    prompt = ["tok1", "tok2"]
    plain = gen_model.generate_batch(
        [prompt], max_length=12,
        include_prompt_in_result=False)[0].sequences_ids[0]
    v = gen_model.model.target_vocabulary
    banned = v.to_token(plain[0])
    exp = gen_model.generate_batch(
        [prompt], max_length=12, include_prompt_in_result=False,
        suppress_sequences=[[banned]])[0].sequences_ids[0]
    assert exp != plain

    cb = _batcher(gen_model, num_slots=2)
    try:
        f_sup = cb.submit(prompt, max_length=12, suppress_tokens=[banned])
        f_plain = cb.submit(prompt, max_length=12)
        assert f_sup.result(timeout=600).sequences_ids[0] == exp
        assert f_plain.result(timeout=600).sequences_ids[0] == plain
    finally:
        cb.close()


def test_per_request_penalty_validation(gen_model):
    cb = _batcher(gen_model, num_slots=2)
    try:
        with pytest.raises(ValueError, match="max_no_repeat_ngram_size"):
            cb.submit(["tok1"], max_length=4, no_repeat_ngram_size=99)
        with pytest.raises(ValueError, match="positive"):
            cb.submit(["tok1"], max_length=4, repetition_penalty=0.0)
        with pytest.raises(ValueError, match="no_repeat_ngram_size"):
            cb.submit(["tok1"], max_length=4, no_repeat_ngram_size=1)
    finally:
        cb.close()
    # Beam mode shares the same per-request validation (penalties under
    # beam are SUPPORTED since round 4 — see
    # test_continuous_beam_penalties for the equivalence checks).
    cbb = _batcher(gen_model, num_slots=2, beam_size=2)
    try:
        with pytest.raises(ValueError, match="positive"):
            cbb.submit(["tok1"], max_length=4, repetition_penalty=-1.0)
    finally:
        cbb.close()


def test_user_decoder_start_tokens(tmp_path):
    """Models with decoder_start_token=null are served continuously: the
    target_prefix's first token plays the start-token role (reference:
    src/models/sequence_to_sequence.cc:169-186), matching translate_batch
    with the same target_prefix."""
    import json
    import os

    from ctranslate2_tpu import ContinuousTranslator, Translator
    from ctranslate2_tpu.converters.builder import build_seq2seq_model

    s2s = build_seq2seq_model(str(tmp_path / "s2s_nostart"))
    cfg_path = os.path.join(s2s, "config.json")
    with open(cfg_path, encoding="utf-8") as f:
        cfg = json.load(f)
    cfg["decoder_start_token"] = None
    with open(cfg_path, "w", encoding="utf-8") as f:
        json.dump(cfg, f)
    tr = Translator(s2s)
    src = ["tok1", "tok2", "tok3"]
    prefix = ["tok4", "tok5"]
    exp = tr.translate_batch(
        [src], target_prefix=[prefix], max_decoding_length=16,
        beam_size=1)[0].hypotheses[0]
    ct = ContinuousTranslator(tr, num_slots=2, capacity=64,
                              max_source_len=16)
    try:
        v = tr.model.target_vocabulary
        got = ct.submit(src, max_length=16,
                        target_prefix=prefix).result(timeout=600)
        assert [v.to_token(i) for i in got.sequences_ids[0]] == exp
        # prefix[0] is consumed as the start token; the rest is forced.
        assert [v.to_token(i)
                for i in got.sequences_ids[0][:1]] == prefix[1:]
        with pytest.raises(ValueError, match="target prefix"):
            ct.submit(src, max_length=16)
    finally:
        ct.close()


def test_per_request_penalties_seq2seq(tmp_path):
    """The continuous translator serves per-request penalties too: one
    slot penalized, the neighbor not, each matching translate_batch."""
    from ctranslate2_tpu import ContinuousTranslator, Translator
    from ctranslate2_tpu.converters.builder import build_seq2seq_model

    s2s = build_seq2seq_model(str(tmp_path / "s2sp"))
    tr = Translator(s2s)
    src = ["tok1", "tok2", "tok3"]
    exp_pen = tr.translate_batch(
        [src], max_decoding_length=16, beam_size=1,
        repetition_penalty=1.4)[0].hypotheses[0]
    exp_plain = tr.translate_batch(
        [src], max_decoding_length=16, beam_size=1)[0].hypotheses[0]
    assert exp_pen != exp_plain
    ct = ContinuousTranslator(tr, num_slots=2, capacity=64,
                              max_source_len=16)
    try:
        v = tr.model.target_vocabulary
        f_pen = ct.submit(src, max_length=16, repetition_penalty=1.4)
        f_plain = ct.submit(src, max_length=16)
        assert [v.to_token(i)
                for i in f_pen.result(timeout=600).sequences_ids[0]] \
            == exp_pen
        assert [v.to_token(i)
                for i in f_plain.result(timeout=600).sequences_ids[0]] \
            == exp_plain
    finally:
        ct.close()


def test_stream_iterator(gen_model):
    """batcher.stream() yields the same tokens the future resolves to;
    closing it early stops the request."""
    expected = gen_model.generate_batch(
        [["tok1", "tok2"]], max_length=12,
        include_prompt_in_result=False)[0].sequences_ids[0]
    cb = _batcher(gen_model)
    try:
        toks = [sr.token_id for sr in cb.stream(["tok1", "tok2"],
                                                max_length=12)]
        assert toks[: len(expected)] == expected
        # Early close stops the request without raising.
        it = cb.stream(["tok1"], max_length=64)
        first = next(it)
        assert first.token_id >= 0
        it.close()
        # The engine keeps serving afterwards.
        r = cb.submit(["tok1"], max_length=8).result(timeout=300)
        assert r.sequences_ids[0]
    finally:
        cb.close()


def test_streaming_callback_exception(gen_model):
    cb = _batcher(gen_model)
    try:
        def boom(sr):
            raise RuntimeError("boom")

        f = cb.submit(["tok1"], max_length=8, callback=boom)
        with pytest.raises(RuntimeError, match="boom"):
            f.result(timeout=300)
        # Other requests are unaffected.
        ok = cb.submit(["tok1"], max_length=8).result(timeout=300)
        assert ok.sequences_ids[0]
    finally:
        cb.close()


# ----------------------------------------------------------------------
# Draft-MODEL speculative decoding (lossless under greedy).
# ----------------------------------------------------------------------


def test_draft_model_speculation(gen_model, tmp_path):
    prompts = [["tok1", "tok2", "tok3"], ["tok2"],
               ["tok4", "tok1", "tok4", "tok1"]]
    expected = [
        gen_model.generate_batch([p], max_length=24,
                                 include_prompt_in_result=False)[0]
        for p in prompts
    ]

    # An UNRELATED draft model: speculation must stay lossless even when
    # every proposal is wrong.
    draft_dir = build_decoder_only_model(str(tmp_path / "draft"),
                                         num_layers=1, seed=4242)
    cb = _batcher(gen_model, num_slots=3, speculation_k=4,
                  draft_model=draft_dir)
    try:
        futures = [cb.submit(p, max_length=24) for p in prompts]
        for f, e in zip(futures, expected):
            assert f.result(timeout=600).sequences_ids[0] == \
                e.sequences_ids[0]
        assert cb.stats()["spec_draft"] == "model"
    finally:
        cb.close()

    # A PERFECT draft (the target itself): outputs identical and most
    # dispatches accept multiple tokens.
    cb2 = _batcher(gen_model, num_slots=3, speculation_k=4,
                   draft_model=gen_model)
    try:
        futures = [cb2.submit(p, max_length=24) for p in prompts]
        for f, e in zip(futures, expected):
            assert f.result(timeout=600).sequences_ids[0] == \
                e.sequences_ids[0]
        assert cb2.stats()["spec_tokens_per_dispatch"] > 1.5
    finally:
        cb2.close()


def test_alibi_draft_model_speculation(tmp_path):
    """ALiBi target + ALiBi draft under draft-model speculation: the
    per-row bias covers the draft scan's vector positions too."""
    target_dir = build_decoder_only_model(str(tmp_path / "at"), alibi=True,
                                          alibi_positive=False)
    gen = Generator(target_dir)
    prompts = [["tok1", "tok2"], ["tok3"]]
    expected = [
        gen.generate_batch([p], max_length=16,
                           include_prompt_in_result=False)[0]
        for p in prompts
    ]
    draft_dir = build_decoder_only_model(str(tmp_path / "ad"), alibi=True,
                                         alibi_positive=False,
                                         num_layers=1, seed=4242)
    cb = _batcher(gen, num_slots=2, speculation_k=3, draft_model=draft_dir)
    try:
        futures = [cb.submit(p, max_length=16) for p in prompts]
        for f, e in zip(futures, expected):
            assert f.result(timeout=600).sequences_ids[0] == \
                e.sequences_ids[0]
    finally:
        cb.close()


def test_draft_model_validation(gen_model, tmp_path):
    draft_dir = build_decoder_only_model(str(tmp_path / "d1"), num_layers=1)
    with pytest.raises(ValueError, match="speculation_k"):
        _batcher(gen_model, draft_model=draft_dir)
    small_vocab = build_decoder_only_model(str(tmp_path / "d2"),
                                           vocab_size=32)
    with pytest.raises(ValueError, match="vocabulary size"):
        _batcher(gen_model, speculation_k=4, draft_model=small_vocab)


@pytest.mark.parametrize("spec_k", [3])
def test_translator_speculation_matches_greedy(spec_k):
    from ctranslate2_tpu import ContinuousTranslator, Translator

    MODEL = "/root/reference/tests/data/models/v2/aren-transliteration"
    srcs = [["آ", "ت", "ز", "م", "و", "ن"],
            ["آ", "ت", "ش", "ي", "س", "و", "ن"]]
    t = Translator(MODEL)
    expected = t.translate_batch(srcs, beam_size=1)
    ct = ContinuousTranslator(t, num_slots=2, capacity=128,
                              max_source_len=32, speculation_k=spec_k)
    try:
        futures = [ct.submit(s, max_length=32) for s in srcs]
        v = t.model.target_vocabulary
        for f, e in zip(futures, expected):
            got = [v.to_token(i)
                   for i in f.result(timeout=600).sequences_ids[0]]
            assert got == e.hypotheses[0]
        # Prefix + speculation interplay stays lossless.
        pf = ct.submit(srcs[0], max_length=32,
                       target_prefix=["a", "t", "s"])
        got = [v.to_token(i) for i in pf.result(timeout=600).sequences_ids[0]]
        ref = t.translate_batch([srcs[0]], target_prefix=[["a", "t", "s"]],
                                beam_size=1)[0]
        assert got == ref.hypotheses[0]
    finally:
        ct.close()


def test_speculation_with_ring_window(tmp_path):
    """Speculative verify chunks on sliding-window RING caches: lossless
    across multiple ring wraps (Mistral/Gemma-style serving)."""
    d = build_decoder_only_model(str(tmp_path / "w"), sliding_window=8,
                                 rotary_dim=0)
    gen = Generator(d)
    prompts = [["tok1", "tok2", "tok3"], ["tok4"]]
    expected = [
        gen.generate_batch([p], max_length=40,
                           include_prompt_in_result=False)[0].sequences_ids[0]
        for p in prompts
    ]
    cb = _batcher(gen, num_slots=2, speculation_k=4, capacity=256)
    try:
        futs = [cb.submit(p, max_length=40) for p in prompts]
        assert [f.result(timeout=600).sequences_ids[0]
                for f in futs] == expected
    finally:
        cb.close()
    # A verify chunk must fit inside the smallest window.
    with pytest.raises(ValueError, match="sliding window"):
        _batcher(gen, speculation_k=9)


def test_speculation_with_window_mask_no_ring(tmp_path, monkeypatch):
    """Windowed models WITHOUT ring caches (mixed windows / ring disabled)
    speculate through the masked linear-cache path — the multi-query
    per-row sliding_window_bias."""
    monkeypatch.setenv("CT2TPU_WINDOW_RING", "0")
    d = build_decoder_only_model(str(tmp_path / "wm"), sliding_window=8,
                                 rotary_dim=0)
    gen = Generator(d)
    expected = gen.generate_batch(
        [["tok1", "tok2"]], max_length=30,
        include_prompt_in_result=False)[0].sequences_ids[0]
    cb = _batcher(gen, num_slots=2, speculation_k=4, capacity=256)
    try:
        got = cb.submit(["tok1", "tok2"],
                        max_length=30).result(timeout=600).sequences_ids[0]
    finally:
        cb.close()
    assert got == expected


def test_speculation_with_hybrid_windows(tmp_path):
    """Gemma-style hybrid stacks (alternating window/global layers:
    windowed layers get O(window) ring buffers, global layers full
    capacity) speculate losslessly."""
    d = build_decoder_only_model(str(tmp_path / "hyb"), sliding_window=8,
                                 sliding_window_pattern=2, rotary_dim=0)
    gen = Generator(d)
    assert gen.model.arch.decoder.layers[0].self_attention.sliding_window
    assert not gen.model.arch.decoder.layers[1].self_attention.sliding_window
    expected = gen.generate_batch(
        [["tok1", "tok2"]], max_length=30,
        include_prompt_in_result=False)[0].sequences_ids[0]
    cb = _batcher(gen, num_slots=2, speculation_k=4, capacity=256)
    try:
        got = cb.submit(["tok1", "tok2"],
                        max_length=30).result(timeout=600).sequences_ids[0]
    finally:
        cb.close()
    assert got == expected


def test_speculation_with_ring_window_int8_kv(tmp_path, monkeypatch):
    """Ring + speculation + INT8 KV cache: the quantized-cache scatter
    also wraps ring positions; spec stays lossless vs the int8 baseline."""
    monkeypatch.setenv("CT2TPU_KV_CACHE", "int8")
    d = build_decoder_only_model(str(tmp_path / "w8"), sliding_window=8,
                                 rotary_dim=0)
    gen = Generator(d)
    expected = gen.generate_batch(
        [["tok1", "tok2", "tok3"]], max_length=40,
        include_prompt_in_result=False)[0].sequences_ids[0]
    cb = _batcher(gen, num_slots=2, speculation_k=4, capacity=256)
    try:
        got = cb.submit(["tok1", "tok2", "tok3"],
                        max_length=40).result(timeout=600).sequences_ids[0]
    finally:
        cb.close()
    assert got == expected


@pytest.mark.parametrize("kwargs", [
    dict(num_heads_kv=2, glu=True, rms_norm=True),   # GQA / Llama-style
    dict(quantization="int8"),                       # quantized weights
    dict(rotary_dim=0),                              # full-dim RoPE
])
def test_continuous_spec_architecture_sweep(tmp_path, kwargs):
    """Continuous + speculation stays token-identical to generate_batch
    across architecture variants (GQA/GLU/RMS, int8, full RoPE)."""
    d = build_decoder_only_model(str(tmp_path / "m"), **kwargs)
    ct = "int8" if kwargs.get("quantization") == "int8" else "default"
    gen = Generator(d, compute_type=ct)
    prompts = [["tok1", "tok2", "tok3"], ["tok4"]]
    expected = [
        gen.generate_batch([p], max_length=20,
                           include_prompt_in_result=False)[0].sequences_ids[0]
        for p in prompts
    ]
    cb = _batcher(gen, num_slots=2, speculation_k=3)
    try:
        futs = [cb.submit(p, max_length=20) for p in prompts]
        assert [f.result(timeout=600).sequences_ids[0]
                for f in futs] == expected
    finally:
        cb.close()


def test_continuous_whisper(tmp_path):
    """Speech serving: per-request mel encode into slot memory + forced
    SOT prompt; matches a bare greedy decode (config suppress_ids, no
    timestamp rules)."""
    import numpy as np
    import jax.numpy as jnp

    from ctranslate2_tpu import ContinuousWhisper, Whisper
    from ctranslate2_tpu.converters.builder import build_whisper_model
    from ctranslate2_tpu.decoding.options import DecodingOptions

    d, vocab = build_whisper_model(str(tmp_path / "w"))
    w = Whisper(d)
    v = w.model.target_vocabulary
    rng = np.random.default_rng(0)
    feats = [rng.standard_normal((24, 64)).astype(np.float32)
             for _ in range(3)]
    prompt = ["<|startoftranscript|>", "<|en|>", "<|transcribe|>",
              "<|notimestamps|>"]
    prompt_ids = [v.to_id(t) for t in prompt]
    sup = tuple(int(i) for i in w.model.config["suppress_ids"])
    eot = v.to_id("<|endoftext|>")

    expected = []
    for f in feats:
        mem = w.encode(f[None])
        opts = DecodingOptions(beam_size=1, max_length=16, min_length=0,
                               suppress_tokens=sup, num_hypotheses=1,
                               return_prefix=True)
        rs = w.engine.decode(
            [prompt_ids[0]], opts, memory=mem,
            memory_lengths=jnp.asarray([mem.shape[1]]),
            prefix_ids=[prompt_ids[1:]], end_ids=(eot,))
        expected.append(rs[0].hypotheses[0])

    cw = ContinuousWhisper(w, num_slots=2, capacity=64)
    try:
        futs = [cw.submit(f, prompt, max_length=16) for f in feats]
        got = [f.result(timeout=600).sequences_ids[0] for f in futs]
    finally:
        cw.close()
    assert got == expected

    # Prompt-lookup speculation stays lossless for speech serving too.
    cw2 = ContinuousWhisper(w, num_slots=2, capacity=64, speculation_k=3)
    try:
        futs = [cw2.submit(f, prompt, max_length=16) for f in feats]
        got2 = [f.result(timeout=600).sequences_ids[0] for f in futs]
    finally:
        cw2.close()
    assert got2 == expected

    # Draft-MODEL speculation (perfect speech draft = the target itself):
    # lossless and >1 token per dispatch.
    cw3 = ContinuousWhisper(w, num_slots=2, capacity=64, speculation_k=3,
                            draft_model=w)
    try:
        futs = [cw3.submit(f, prompt, max_length=16) for f in feats]
        got3 = [f.result(timeout=600).sequences_ids[0] for f in futs]
        assert cw3.stats()["spec_tokens_per_dispatch"] > 1.2
    finally:
        cw3.close()
    assert got3 == expected


def test_translator_streaming_callback():
    from ctranslate2_tpu import ContinuousTranslator, Translator

    MODEL = "/root/reference/tests/data/models/v2/aren-transliteration"
    t = Translator(MODEL)
    v = t.model.target_vocabulary
    src = ["آ", "ت", "ز", "م", "و", "ن"]
    expected = t.translate_batch([src], beam_size=1)[0].hypotheses[0]
    ct = ContinuousTranslator(t, num_slots=2, capacity=128,
                              max_source_len=32)
    try:
        seen = []
        r = ct.submit(src, max_length=32,
                      callback=lambda sr: seen.append(sr.token)
                      ).result(timeout=600)
        got = [v.to_token(i) for i in r.sequences_ids[0]]
        assert got == expected
        assert seen[: len(got)] == got
    finally:
        ct.close()


def test_translator_draft_model_speculation(tmp_path):
    """Encoder-decoder draft-model speculation stays lossless (wrong and
    perfect drafts), including under forced target prefixes."""
    from ctranslate2_tpu import ContinuousTranslator, Translator
    from ctranslate2_tpu.converters.builder import build_seq2seq_model

    MODEL = "/root/reference/tests/data/models/v2/aren-transliteration"
    srcs = [["آ", "ت", "ز", "م", "و", "ن"],
            ["آ", "ت", "ش", "ي", "س", "و", "ن"]]
    t = Translator(MODEL)
    v = t.model.target_vocabulary
    expected = t.translate_batch(srcs, beam_size=1)

    # Perfect draft: the target itself. Outputs identical, and most
    # dispatches accept multiple tokens.
    ct = ContinuousTranslator(t, num_slots=2, capacity=128,
                              max_source_len=32, speculation_k=4,
                              draft_model=t)
    try:
        futures = [ct.submit(s, max_length=32) for s in srcs]
        for f, e in zip(futures, expected):
            got = [v.to_token(i)
                   for i in f.result(timeout=600).sequences_ids[0]]
            assert got == e.hypotheses[0]
        assert ct.stats()["spec_tokens_per_dispatch"] > 1.5
        assert ct.stats()["spec_draft"] == "model"
        # Forced prefix + draft model stays lossless.
        pf = ct.submit(srcs[0], max_length=32,
                       target_prefix=["a", "t", "s"])
        got = [v.to_token(i)
               for i in pf.result(timeout=600).sequences_ids[0]]
        ref = t.translate_batch([srcs[0]], target_prefix=[["a", "t", "s"]],
                                beam_size=1)[0]
        assert got == ref.hypotheses[0]
    finally:
        ct.close()

    # An imperfect draft (the INT8 artifact: same vocabulary, quantization
    # noise in the logits): still lossless.
    ct2 = ContinuousTranslator(t, num_slots=2, capacity=128,
                               max_source_len=32, speculation_k=4,
                               draft_model=MODEL + "-i8")
    try:
        futures = [ct2.submit(s, max_length=32) for s in srcs]
        for f, e in zip(futures, expected):
            got = [v.to_token(i)
                   for i in f.result(timeout=600).sequences_ids[0]]
            assert got == e.hypotheses[0]
    finally:
        ct2.close()

    # Geometry-mismatched (wrong) draft via a synthetic seq2seq model is
    # rejected on vocabulary size.
    other = build_seq2seq_model(str(tmp_path / "other"))
    with pytest.raises(ValueError, match="vocabulary size"):
        ContinuousTranslator(t, num_slots=2, capacity=128,
                             max_source_len=32, speculation_k=4,
                             draft_model=other)
    # A decoder-only draft is rejected for the translator.
    dec = build_decoder_only_model(str(tmp_path / "dec"))
    with pytest.raises(ValueError, match="encoder-decoder"):
        ContinuousTranslator(t, num_slots=2, capacity=128,
                             max_source_len=32, speculation_k=4,
                             draft_model=dec)


# ----------------------------------------------------------------------
# Relative-position families in the continuous engines (round-3: the
# per-row treatment round 2 gave ALiBi, extended to T5 buckets and Shaw
# relative positions — reference: src/layers/attention.cc:51-165).
# ----------------------------------------------------------------------


@pytest.fixture(scope="module")
def shaw_gen(tmp_path_factory):
    d = tmp_path_factory.mktemp("shaw")
    return Generator(build_decoder_only_model(
        str(d / "m"), rel_position_max=8))


@pytest.fixture(scope="module")
def t5bias_gen(tmp_path_factory):
    d = tmp_path_factory.mktemp("t5b")
    return Generator(build_decoder_only_model(
        str(d / "m"), rel_bias_buckets=8, rel_bias_max_distance=16,
        rms_norm=True))


@pytest.mark.parametrize("fixture", ["shaw_gen", "t5bias_gen"])
def test_relative_model_continuous(fixture, request):
    """Staggered-position continuous decode on relative-position models
    must match the batch engine token-for-token: each slot's queries get
    their own bucketed bias row at their own absolute position."""
    gen = request.getfixturevalue(fixture)
    prompts = [["tok1"], ["tok2", "tok3", "tok4"], ["tok5", "tok6"],
               ["tok7", "tok1", "tok2", "tok3"]]
    expected = [
        gen.generate_batch([p], max_length=12,
                           include_prompt_in_result=False)[0]
        for p in prompts
    ]
    cb = _batcher(gen, num_slots=3)  # staggered positions across slots
    try:
        futures = [cb.submit(p, max_length=12) for p in prompts]
        for f, e in zip(futures, expected):
            assert f.result(timeout=300).sequences_ids[0] == \
                e.sequences_ids[0]
    finally:
        cb.close()


@pytest.mark.parametrize("fixture", ["shaw_gen", "t5bias_gen"])
def test_relative_model_speculation(fixture, request):
    """Speculative verify chunks (T=K, per-row positions) stay lossless
    on relative-position models."""
    gen = request.getfixturevalue(fixture)
    prompts = [["tok1", "tok2"], ["tok3"], ["tok4", "tok5", "tok6"]]
    expected = [
        gen.generate_batch([p], max_length=14,
                           include_prompt_in_result=False)[0]
        for p in prompts
    ]
    cb = _batcher(gen, num_slots=2, speculation_k=4)
    try:
        futures = [cb.submit(p, max_length=14) for p in prompts]
        for f, e in zip(futures, expected):
            assert f.result(timeout=300).sequences_ids[0] == \
                e.sequences_ids[0]
    finally:
        cb.close()


def test_t5_geometry_continuous_translator(tmp_path):
    """A converted HF T5 (rel-bias encoder-decoder) through the
    ContinuousTranslator matches translate_batch, including forced
    target prefixes that stagger the slots' decode positions."""
    import sys

    import transformers

    sys.path.insert(0, str(__import__("pathlib").Path(__file__).parent))
    from test_transformers_converters import DummyTokenizer

    from ctranslate2_tpu import ContinuousTranslator, Translator
    from ctranslate2_tpu.converters.transformers_conv import (
        TransformersConverter,
    )

    cfg = transformers.T5Config(
        vocab_size=64, d_model=32, d_kv=8, d_ff=64, num_layers=2,
        num_heads=4, relative_attention_num_buckets=8,
        relative_attention_max_distance=16, feed_forward_proj="relu",
        decoder_start_token_id=3, tie_word_embeddings=True)
    model = transformers.T5ForConditionalGeneration(cfg).eval()
    out_dir = TransformersConverter(
        model=model, tokenizer=DummyTokenizer(64)).convert(
            str(tmp_path / "t5"))

    t = Translator(out_dir)
    sources = [["tk5", "tk9"], ["tk12", "tk7", "tk4"], ["tk3"]]
    prefixes = [["tk8", "tk11"], None, ["tk21"]]
    expected = [
        t.translate_batch([s], target_prefix=[p], beam_size=1,
                          max_decoding_length=10)[0]
        for s, p in zip(sources, prefixes)
    ]
    ct = ContinuousTranslator(t, num_slots=2, capacity=64,
                              max_source_len=16)
    try:
        futs = [ct.submit(s, max_length=10, target_prefix=p)
                for s, p in zip(sources, prefixes)]
        for f, e in zip(futs, expected):
            assert f.result(timeout=300).sequences == e.hypotheses
    finally:
        ct.close()


def test_merged_attention_continuous_translator(tmp_path):
    """Merged self+cross attention (T5Gemma2 layout) through the
    ContinuousTranslator: per-slot memory_kv buffers + vector-position
    cache writes match the batch engine."""
    from ctranslate2_tpu import ContinuousTranslator, Translator
    from ctranslate2_tpu.converters.builder import build_seq2seq_model

    d = build_seq2seq_model(str(tmp_path / "merged"),
                            merged_attention=True)
    t = Translator(d)
    sources = [["tok5", "tok9"], ["tok12", "tok7", "tok4"], ["tok3"]]
    expected = [t.translate_batch([s], beam_size=1,
                                  max_decoding_length=10)[0]
                for s in sources]
    ct = ContinuousTranslator(t, num_slots=2, capacity=64,
                              max_source_len=16)
    try:
        futs = [ct.submit(s, max_length=10) for s in sources]
        for f, e in zip(futs, expected):
            assert f.result(timeout=300).sequences == e.hypotheses
    finally:
        ct.close()


def test_source_factors_continuous_translator(tmp_path):
    """Source-factor models through the ContinuousTranslator: factored
    tokens split into per-feature id streams at submit."""
    from ctranslate2_tpu import ContinuousTranslator, Translator
    from ctranslate2_tpu.converters.builder import build_seq2seq_model

    d = build_seq2seq_model(str(tmp_path / "factors"),
                            num_source_features=2)
    t = Translator(d)
    sources = [["tok5￨tok2", "tok9￨tok1"],
               ["tok12￨tok3", "tok7￨tok2", "tok4￨tok1"]]
    expected = [t.translate_batch([s], beam_size=1,
                                  max_decoding_length=10)[0]
                for s in sources]
    ct = ContinuousTranslator(t, num_slots=2, capacity=64,
                              max_source_len=16)
    try:
        futs = [ct.submit(s, max_length=10) for s in sources]
        for f, e in zip(futs, expected):
            assert f.result(timeout=300).sequences == e.hypotheses
    finally:
        ct.close()


# ----------------------------------------------------------------------
# Per-request sampling options (round 3): topk/topp/seed/end_token per
# submit, mixed greedy+sampled traffic in one batcher (reference:
# per-call options through the buffered wrapper, translation.h:11-86).
# ----------------------------------------------------------------------


def test_per_request_mixed_greedy_and_sampled(gen_model):
    """A topk=1 request in a SAMPLED batcher reproduces the greedy
    continuation while hot sampled neighbors decode in the same fleet."""
    greedy = gen_model.generate_batch(
        [["tok1", "tok2"]], max_length=12,
        include_prompt_in_result=False)[0]
    cb = _batcher(gen_model, sampling_topk=0, sampling_temperature=1.0,
                  seed=11)
    try:
        g = cb.submit(["tok1", "tok2"], max_length=12, sampling_topk=1)
        hot = cb.submit(["tok1", "tok2"], max_length=12,
                        sampling_temperature=5.0, seed=1)
        hot2 = cb.submit(["tok1", "tok2"], max_length=12,
                         sampling_temperature=5.0, seed=2)
        assert g.result(timeout=300).sequences_ids[0] == \
            greedy.sequences_ids[0]
        r1 = hot.result(timeout=300).sequences_ids[0]
        r2 = hot2.result(timeout=300).sequences_ids[0]
        assert r1 and r2
        # Distinct per-request seeds give distinct sample streams.
        assert r1 != r2
    finally:
        cb.close()


def test_per_request_sampled_in_greedy_batcher(gen_model):
    """The inverse mix: a sampled request joins a GREEDY-default
    batcher; greedy neighbors stay exact."""
    greedy = gen_model.generate_batch(
        [["tok3"]], max_length=10, include_prompt_in_result=False)[0]
    cb = _batcher(gen_model)  # greedy default
    try:
        g = cb.submit(["tok3"], max_length=10)
        s = cb.submit(["tok3"], max_length=10, sampling_topk=5,
                      sampling_temperature=2.0, seed=9)
        assert g.result(timeout=300).sequences_ids[0] == \
            greedy.sequences_ids[0]
        assert 0 < len(s.result(timeout=300).sequences_ids[0]) <= 10
    finally:
        cb.close()


def test_per_request_topp(gen_model):
    """topp=tiny keeps only the top token: equivalent to greedy."""
    greedy = gen_model.generate_batch(
        [["tok2", "tok4"]], max_length=10,
        include_prompt_in_result=False)[0]
    cb = _batcher(gen_model, sampling_topk=0, sampling_temperature=1.0)
    try:
        r = cb.submit(["tok2", "tok4"], max_length=10,
                      sampling_topp=1e-9).result(timeout=300)
        assert r.sequences_ids[0] == greedy.sequences_ids[0]
    finally:
        cb.close()


def test_per_request_end_token(gen_model):
    """A per-request end_token stops generation where the batch engine
    does, while default-end neighbors are unaffected."""
    base = gen_model.generate_batch(
        [["tok1", "tok2"]], max_length=12,
        include_prompt_in_result=False)[0].sequences_ids[0]
    assert len(base) >= 4
    stop_tok = base[3]
    expected = gen_model.generate_batch(
        [["tok1", "tok2"]], max_length=12, end_token=[stop_tok],
        include_prompt_in_result=False)[0]
    cb = _batcher(gen_model, num_slots=2)
    try:
        f1 = cb.submit(["tok1", "tok2"], max_length=12,
                       end_token=[stop_tok])
        f2 = cb.submit(["tok1", "tok2"], max_length=12)
        assert f1.result(timeout=300).sequences_ids[0] == \
            expected.sequences_ids[0]
        assert f2.result(timeout=300).sequences_ids[0] == base
    finally:
        cb.close()


def test_per_request_sampling_validation(gen_model):
    cb = _batcher(gen_model, max_sampling_topk=32)
    try:
        with pytest.raises(ValueError, match="max_sampling_topk"):
            cb.submit(["tok1"], max_length=8, sampling_topk=100)
    finally:
        cb.close()
    cbs = _batcher(gen_model, speculation_k=3)
    try:
        with pytest.raises(NotImplementedError, match="greedy"):
            cbs.submit(["tok1"], max_length=8, sampling_topk=5)
    finally:
        cbs.close()


def test_per_request_options_continuous_translator():
    """Per-request end_token + mixed temperature through the
    encoder-decoder engine."""
    from ctranslate2_tpu import ContinuousTranslator, Translator

    MODEL = "/root/reference/tests/data/models/v2/aren-transliteration"
    SRC = ["آ", "ت", "ز", "م", "و", "ن"]
    t = Translator(MODEL)
    base = t.translate_batch([SRC], beam_size=1)[0].hypotheses[0]
    stop = base[2]
    expected = t.translate_batch([SRC], beam_size=1,
                                 end_token=stop)[0].hypotheses[0]
    ct = ContinuousTranslator(t, num_slots=2, capacity=128,
                              max_source_len=32)
    try:
        f1 = ct.submit(SRC, max_length=32, end_token=stop)
        f2 = ct.submit(SRC, max_length=32)
        assert f1.result(timeout=300).sequences == [expected]
        assert f2.result(timeout=300).sequences == [base]
    finally:
        ct.close()


# ----------------------------------------------------------------------
# Beam search in the continuous engines (round 3): per-slot on-device
# candidate bookkeeping, K beam rows per slot (reference: beam is the
# serving default, src/decoding.cc:411-720).
# ----------------------------------------------------------------------


def test_continuous_beam_matches_generate_batch(gen_model):
    """beam_size=2 serving reproduces the batch engine's beam tokens AND
    normalized scores, including a mid-decode join."""
    e1 = gen_model.generate_batch(
        [["tok1", "tok2"]], max_length=12, beam_size=2,
        include_prompt_in_result=False, return_scores=True)[0]
    e2 = gen_model.generate_batch(
        [["tok3"]], max_length=12, beam_size=2,
        include_prompt_in_result=False, return_scores=True)[0]
    cb = _batcher(gen_model, num_slots=3, beam_size=2)
    try:
        f1 = cb.submit(["tok1", "tok2"], max_length=12)
        f2 = cb.submit(["tok3"], max_length=12)
        r1, r2 = f1.result(timeout=300), f2.result(timeout=300)
        assert r1.sequences_ids[0] == e1.sequences_ids[0]
        assert r2.sequences_ids[0] == e2.sequences_ids[0]
        assert abs(r1.scores[0] - e1.scores[0]) < 1e-4
        # Mid-decode join: the fleet is already decoding when this lands.
        e3 = gen_model.generate_batch(
            [["tok2", "tok4"]], max_length=10, beam_size=2,
            include_prompt_in_result=False)[0]
        f3 = cb.submit(["tok2", "tok4"], max_length=10)
        assert f3.result(timeout=300).sequences_ids[0] == e3.sequences_ids[0]
    finally:
        cb.close()


def test_continuous_beam_num_hypotheses(gen_model):
    """num_hypotheses=2 at beam_size=3 with an explicit length penalty:
    both returned hypotheses and their normalized scores match."""
    exp = gen_model.generate_batch(
        [["tok1", "tok2"]], max_length=12, beam_size=3, num_hypotheses=2,
        length_penalty=1.0, include_prompt_in_result=False,
        return_scores=True)[0]
    cb = _batcher(gen_model, num_slots=2, beam_size=3, num_hypotheses=2,
                  length_penalty=1.0)
    try:
        r = cb.submit(["tok1", "tok2"], max_length=12).result(timeout=300)
        assert r.sequences_ids == exp.sequences_ids
        assert all(abs(a - b) < 1e-4 for a, b in zip(r.scores, exp.scores))
    finally:
        cb.close()


def test_continuous_beam_translator():
    """Encoder-decoder beam serving (the reference's flagship mode):
    token- and score-identical to translate_batch(beam_size=2) on mixed
    traffic, including forced target prefixes."""
    from ctranslate2_tpu import ContinuousTranslator, Translator

    MODEL = "/root/reference/tests/data/models/v2/aren-transliteration"
    SRC1 = ["آ", "ت", "ز", "م", "و", "ن"]
    SRC2 = ["آ", "ت", "ش", "ي", "س", "و", "ن"]
    t = Translator(MODEL)
    e1 = t.translate_batch([SRC1], beam_size=2, return_scores=True)[0]
    e2 = t.translate_batch([SRC2], beam_size=2, return_scores=True)[0]
    ep = t.translate_batch([SRC1], beam_size=2, return_scores=True,
                           target_prefix=[["a", "t", "z"]])[0]
    ct = ContinuousTranslator(t, num_slots=2, capacity=128,
                              max_source_len=32, beam_size=2)
    try:
        f1 = ct.submit(SRC1, max_length=32)
        f2 = ct.submit(SRC2, max_length=32)
        fp = ct.submit(SRC1, max_length=32, target_prefix=["a", "t", "z"])
        r1, r2, rp = (f1.result(timeout=300), f2.result(timeout=300),
                      fp.result(timeout=300))
        assert r1.sequences == [e1.hypotheses[0]]
        assert abs(r1.scores[0] - e1.scores[0]) < 1e-4
        assert r2.sequences == [e2.hypotheses[0]]
        assert rp.sequences == [ep.hypotheses[0]]
        assert abs(rp.scores[0] - ep.scores[0]) < 1e-4
    finally:
        ct.close()


def test_continuous_beam_whisper(tmp_path):
    """Speech beam serving (the reference Whisper default is beam=5)."""
    import numpy as np
    import jax.numpy as jnp

    from ctranslate2_tpu import ContinuousWhisper, Whisper
    from ctranslate2_tpu.converters.builder import build_whisper_model
    from ctranslate2_tpu.decoding.options import DecodingOptions

    d, vocab = build_whisper_model(str(tmp_path / "w"))
    w = Whisper(d)
    v = w.model.target_vocabulary
    rng = np.random.default_rng(3)
    feats = [rng.standard_normal((24, 64)).astype(np.float32)
             for _ in range(2)]
    prompt = ["<|startoftranscript|>", "<|en|>", "<|transcribe|>",
              "<|notimestamps|>"]
    prompt_ids = [v.to_id(t) for t in prompt]
    sup = tuple(int(i) for i in w.model.config["suppress_ids"])
    eot = v.to_id("<|endoftext|>")

    expected = []
    for f in feats:
        mem = w.encode(f[None])
        opts = DecodingOptions(beam_size=2, max_length=16, min_length=0,
                               suppress_tokens=sup, num_hypotheses=1,
                               return_prefix=True)
        rs = w.engine.decode(
            [prompt_ids[0]], opts, memory=mem,
            memory_lengths=jnp.asarray([mem.shape[1]]),
            prefix_ids=[prompt_ids[1:]], end_ids=(eot,))
        expected.append(rs[0].hypotheses[0])

    cw = ContinuousWhisper(w, num_slots=2, capacity=64, beam_size=2)
    try:
        futs = [cw.submit(f, prompt, max_length=16) for f in feats]
        got = [f.result(timeout=600).sequences_ids[0] for f in futs]
    finally:
        cw.close()
    assert got == expected


def test_continuous_beam_validation(gen_model):
    with pytest.raises(NotImplementedError, match="greedy"):
        _batcher(gen_model, beam_size=2, speculation_k=3)
    with pytest.raises(ValueError, match="num_hypotheses"):
        _batcher(gen_model, beam_size=2, num_hypotheses=3)
    cb = _batcher(gen_model, beam_size=2)
    try:
        with pytest.raises(ValueError, match="num_hypotheses"):
            cb.submit(["tok1"], max_length=8, num_hypotheses=3)
    finally:
        cb.close()
    cbg = _batcher(gen_model)  # greedy: multiple hypotheses need beam
    try:
        with pytest.raises(NotImplementedError, match="beam"):
            cbg.submit(["tok1"], max_length=8, num_hypotheses=2)
    finally:
        cbg.close()


def test_continuous_beam_sampling_mixed(gen_model):
    """Sampling composes with beam serving per request (reference:
    RandomSampler + beam, src/sampling.cc:60-92): a topk=1 request in
    the same fleet stays token-identical to the batch engine's beam,
    while sampled neighbors draw per-request Gumbel-top-2K candidates
    with distinct seed streams."""
    exp = gen_model.generate_batch(
        [["tok1", "tok2"]], max_length=12, beam_size=2,
        include_prompt_in_result=False, return_scores=True)[0]
    cb = _batcher(gen_model, num_slots=3, beam_size=2)
    try:
        g = cb.submit(["tok1", "tok2"], max_length=12, sampling_topk=1)
        s1 = cb.submit(["tok1", "tok2"], max_length=12, sampling_topk=0,
                       sampling_temperature=5.0, seed=3)
        s2 = cb.submit(["tok1", "tok2"], max_length=12, sampling_topk=0,
                       sampling_temperature=5.0, seed=4)
        assert g.result(timeout=300).sequences_ids[0] == \
            exp.sequences_ids[0]
        r1 = s1.result(timeout=300).sequences_ids[0]
        r2 = s2.result(timeout=300).sequences_ids[0]
        assert r1 and r2
        assert r1 != r2  # distinct per-request seed streams
        # A later greedy join is still exact after the sampled phase
        # (the recompiled step keeps topk=1 rows deterministic).
        e3 = gen_model.generate_batch(
            [["tok3"]], max_length=10, beam_size=2,
            include_prompt_in_result=False)[0]
        f3 = cb.submit(["tok3"], max_length=10)
        assert f3.result(timeout=300).sequences_ids[0] == \
            e3.sequences_ids[0]
    finally:
        cb.close()


def test_continuous_beam_sampling_reproducible(gen_model):
    """Seeded beam sampling reproduces across batcher instances (same
    ctor seed + per-request seed + deterministic traffic), and respects
    num_hypotheses."""
    def run():
        cb = _batcher(gen_model, num_slots=2, beam_size=2,
                      num_hypotheses=2, sampling_topk=8,
                      sampling_temperature=2.0, seed=7)
        try:
            r = cb.submit(["tok3"], max_length=10,
                          seed=5).result(timeout=300)
            assert len(r.sequences_ids) == 2
            assert all(s <= 0 for s in r.scores)
            return r.sequences_ids
        finally:
            cb.close()

    assert run() == run()


def test_continuous_beam_stop_sequences(gen_model):
    """Stop sequences under beam serving: a beam whose tail matches a
    stop finishes like EOS with the suffix trimmed and its scores
    refunded; a neighbor slot without stops stays token-identical to the
    batch engine."""
    expected = gen_model.generate_batch(
        [["tok1", "tok2"]], max_length=16, beam_size=2,
        include_prompt_in_result=False, return_scores=True)[0]
    full = expected.sequences_ids[0]
    assert len(full) >= 4
    stop = full[2:4]
    cb = _batcher(gen_model, num_slots=2, beam_size=2)
    try:
        f_stop = cb.submit(["tok1", "tok2"], max_length=16,
                           stop_sequences=[stop])
        f_plain = cb.submit(["tok1", "tok2"], max_length=16)
        r_stop = f_stop.result(timeout=600)
        assert r_stop.sequences_ids[0] == full[:2]
        assert f_plain.result(timeout=600).sequences_ids[0] == full
        # The trimmed suffix's scores are refunded: the stopped
        # hypothesis's normalized score reflects only the kept tokens.
        r_again = cb.submit(["tok1", "tok2"], max_length=16,
                            stop_sequences=[stop]).result(timeout=600)
        assert r_again.sequences_ids[0] == full[:2]
        assert r_again.scores[0] == pytest.approx(r_stop.scores[0])
    finally:
        cb.close()


def test_continuous_beam_per_request_end_token(gen_model):
    """Per-request end_token under beam serving matches the batch engine
    given the same end_token; the neighbor keeps the default."""
    base = gen_model.generate_batch(
        [["tok1", "tok2"]], max_length=16, beam_size=2,
        include_prompt_in_result=False)[0].sequences_ids[0]
    assert len(base) >= 3
    v = gen_model.model.target_vocabulary
    end_tok = v.to_token(base[2])
    exp = gen_model.generate_batch(
        [["tok1", "tok2"]], max_length=16, beam_size=2, end_token=end_tok,
        include_prompt_in_result=False)[0].sequences_ids[0]
    cb = _batcher(gen_model, num_slots=2, beam_size=2)
    try:
        f_end = cb.submit(["tok1", "tok2"], max_length=16,
                          end_token=end_tok)
        f_plain = cb.submit(["tok1", "tok2"], max_length=16)
        assert f_end.result(timeout=600).sequences_ids[0] == exp
        assert f_plain.result(timeout=600).sequences_ids[0] == base
    finally:
        cb.close()


def test_continuous_beam_per_request_num_hypotheses(gen_model):
    """num_hypotheses is per request under beam serving: one request asks
    for 2 hypotheses, its neighbor keeps the default 1."""
    exp2 = gen_model.generate_batch(
        [["tok1", "tok2"]], max_length=12, beam_size=3, num_hypotheses=2,
        include_prompt_in_result=False, return_scores=True)[0]
    exp1 = gen_model.generate_batch(
        [["tok3"]], max_length=12, beam_size=3,
        include_prompt_in_result=False)[0]
    cb = _batcher(gen_model, num_slots=2, beam_size=3)
    try:
        f2 = cb.submit(["tok1", "tok2"], max_length=12, num_hypotheses=2)
        f1 = cb.submit(["tok3"], max_length=12)
        r2, r1 = f2.result(timeout=600), f1.result(timeout=600)
        assert r2.sequences_ids == exp2.sequences_ids
        assert all(abs(a - b) < 1e-4
                   for a, b in zip(r2.scores, exp2.scores))
        assert r1.sequences_ids == [exp1.sequences_ids[0]]
    finally:
        cb.close()


def test_continuous_beam_streaming_callback(gen_model):
    """Beam streaming delivers committed tokens (prefix of the final
    best hypothesis), per-token scores summing to the raw cumulative
    score, and exactly one is_last event."""
    exp = gen_model.generate_batch(
        [["tok1", "tok2"]], max_length=12, beam_size=2,
        include_prompt_in_result=False, return_scores=True)[0]
    seen = []

    def on_token(sr):
        seen.append(sr)
        return False

    cb = _batcher(gen_model, num_slots=2, beam_size=2, steps_per_sync=2)
    try:
        r = cb.submit(["tok1", "tok2"], max_length=12,
                      callback=on_token).result(timeout=600)
        assert r.sequences_ids[0] == exp.sequences_ids[0]
        assert [sr.token_id for sr in seen] == exp.sequences_ids[0]
        assert [sr.step for sr in seen] == list(range(len(seen)))
        assert [sr.is_last for sr in seen].count(True) == 1
        assert seen[-1].is_last
        # Raw per-token scores sum to the unnormalized total.
        n = len(exp.sequences_ids[0])
        raw = exp.scores[0] * max(n, 1) ** 1.0
        assert sum(sr.score for sr in seen) == pytest.approx(raw, abs=1e-3)
    finally:
        cb.close()


def test_continuous_beam_streaming_early_stop(gen_model):
    """Returning True from a beam callback stops the request early; the
    result is consistent with the streamed prefix and the slot is freed
    for the neighbor."""
    exp = gen_model.generate_batch(
        [["tok1", "tok2"]], max_length=48, beam_size=2,
        include_prompt_in_result=False)[0].sequences_ids[0]
    got = []

    def on_token(sr):
        got.append(sr.token_id)
        return len(got) >= 3

    cb = _batcher(gen_model, num_slots=1, beam_size=2, steps_per_sync=2)
    try:
        r = cb.submit(["tok1", "tok2"], max_length=48,
                      callback=on_token).result(timeout=600)
        assert len(got) >= 3
        assert r.sequences_ids[0][: len(got)] == got
        # The slot was freed: a follow-up request is served normally.
        r2 = cb.submit(["tok1", "tok2"], max_length=8).result(timeout=600)
        assert r2.sequences_ids[0] == exp[:8] or r2.sequences_ids[0]
    finally:
        cb.close()


def test_continuous_beam_callback_exception(gen_model):
    """A raising beam callback cancels the request and surfaces through
    its future (greedy contract mirrored)."""
    def boom(sr):
        raise RuntimeError("beam-cb-fail")

    cb = _batcher(gen_model, num_slots=2, beam_size=2, steps_per_sync=2)
    try:
        f = cb.submit(["tok1", "tok2"], max_length=32, callback=boom)
        with pytest.raises(RuntimeError, match="beam-cb-fail"):
            f.result(timeout=600)
        # The engine keeps serving.
        r = cb.submit(["tok3"], max_length=6).result(timeout=600)
        assert len(r.sequences_ids[0]) > 0
    finally:
        cb.close()


def test_continuous_beam_ring_window(tmp_path):
    """Beam serving on a sliding-window (ring-cache) model: tokens match
    the batch engine's beam output, including a prompt longer than one
    ring block (chunked prefill path)."""
    from ctranslate2_tpu.converters.builder import build_decoder_only_model

    path = build_decoder_only_model(
        str(tmp_path / "win"), sliding_window=128, rotary_dim=8,
        num_heads_kv=2, glu=True, rms_norm=True, quantization=None)
    gen = Generator(path)
    short = ["tok1", "tok2"]
    v = gen.model.target_vocabulary
    rng = np.random.default_rng(5)
    long_prompt = [v.to_token(int(t))
                   for t in rng.integers(4, 40, size=140)]
    e_short = gen.generate_batch(
        [short], max_length=12, beam_size=2,
        include_prompt_in_result=False)[0].sequences_ids[0]
    e_long = gen.generate_batch(
        [long_prompt], max_length=12, beam_size=2,
        include_prompt_in_result=False)[0].sequences_ids[0]
    cb = ContinuousBatcher(gen, num_slots=2, capacity=512, beam_size=2)
    try:
        f1 = cb.submit(short, max_length=12)
        f2 = cb.submit(long_prompt, max_length=12)
        assert f1.result(timeout=600).sequences_ids[0] == e_short
        assert f2.result(timeout=600).sequences_ids[0] == e_long
    finally:
        cb.close()


def test_continuous_beam_translator_stream_and_end(tmp_path):
    """Beam streaming + per-request end_token through the seq2seq
    engine."""
    from ctranslate2_tpu import ContinuousTranslator, Translator

    MODEL = "/root/reference/tests/data/models/v2/aren-transliteration"
    SRC = ["آ", "ت", "ز", "م", "و", "ن"]
    t = Translator(MODEL)
    exp = t.translate_batch([SRC], beam_size=2)[0].hypotheses[0]
    seen = []
    ct = ContinuousTranslator(t, num_slots=2, capacity=128,
                              max_source_len=32, beam_size=2,
                              steps_per_sync=2)
    try:
        r = ct.submit(SRC, max_length=32,
                      callback=lambda sr: seen.append(sr) or False
                      ).result(timeout=600)
        v = t.model.target_vocabulary
        assert [v.to_token(i) for i in r.sequences_ids[0]] == exp
        assert [sr.token_id for sr in seen] == r.sequences_ids[0]
        assert seen[-1].is_last
        # Per-request end_token: stop at an early token of the expected
        # output.
        end_tok = exp[2]
        e_end = t.translate_batch([SRC], beam_size=2,
                                  end_token=end_tok)[0].hypotheses[0]
        r_end = ct.submit(SRC, max_length=32,
                          end_token=end_tok).result(timeout=600)
        assert [v.to_token(i) for i in r_end.sequences_ids[0]] == e_end
    finally:
        ct.close()


def test_continuous_beam_penalties(gen_model):
    """repetition_penalty / no_repeat_ngram_size under beam serving are
    per request (applied over each beam row's own generated history) and
    match the batch engine; a neutral neighbor slot is unaffected."""
    exp_pen = gen_model.generate_batch(
        [["tok1", "tok2"]], max_length=14, beam_size=2,
        repetition_penalty=1.4, include_prompt_in_result=False,
        return_scores=True)[0]
    exp_ngram = gen_model.generate_batch(
        [["tok3"]], max_length=14, beam_size=2, no_repeat_ngram_size=2,
        include_prompt_in_result=False)[0]
    exp_plain = gen_model.generate_batch(
        [["tok1", "tok2"]], max_length=14, beam_size=2,
        include_prompt_in_result=False)[0]
    assert exp_pen.sequences_ids[0] != exp_plain.sequences_ids[0]
    cb = _batcher(gen_model, num_slots=3, beam_size=2)
    try:
        f_pen = cb.submit(["tok1", "tok2"], max_length=14,
                          repetition_penalty=1.4)
        f_ng = cb.submit(["tok3"], max_length=14, no_repeat_ngram_size=2)
        f_plain = cb.submit(["tok1", "tok2"], max_length=14)
        assert f_pen.result(timeout=600).sequences_ids[0] == \
            exp_pen.sequences_ids[0]
        assert abs(f_pen.result().scores[0] - exp_pen.scores[0]) < 1e-4
        assert f_ng.result(timeout=600).sequences_ids[0] == \
            exp_ngram.sequences_ids[0]
        assert f_plain.result(timeout=600).sequences_ids[0] == \
            exp_plain.sequences_ids[0]
    finally:
        cb.close()

    # Batcher-level defaults work too.
    cb2 = _batcher(gen_model, num_slots=2, beam_size=2,
                   repetition_penalty=1.4)
    try:
        got = cb2.submit(["tok1", "tok2"],
                         max_length=14).result(timeout=600)
        assert got.sequences_ids[0] == exp_pen.sequences_ids[0]
    finally:
        cb2.close()


def test_continuous_beam_per_request_suppress(gen_model):
    """Per-request suppress_tokens under beam serving match the batch
    engine's suppress_tokens option."""
    base = gen_model.generate_batch(
        [["tok1", "tok2"]], max_length=12, beam_size=2,
        include_prompt_in_result=False)[0].sequences_ids[0]
    v = gen_model.model.target_vocabulary
    banned = v.to_token(base[1])
    # A 1-token suppress sequence is the batch API's static token ban.
    exp = gen_model.generate_batch(
        [["tok1", "tok2"]], max_length=12, beam_size=2,
        suppress_sequences=[[banned]],
        include_prompt_in_result=False)[0].sequences_ids[0]
    assert exp != base
    cb = _batcher(gen_model, num_slots=2, beam_size=2)
    try:
        f_sup = cb.submit(["tok1", "tok2"], max_length=12,
                          suppress_tokens=[banned])
        f_plain = cb.submit(["tok1", "tok2"], max_length=12)
        assert f_sup.result(timeout=600).sequences_ids[0] == exp
        assert f_plain.result(timeout=600).sequences_ids[0] == base
    finally:
        cb.close()


def test_continuous_whisper_timestamp_rules(tmp_path):
    """Timestamp-rules serving: a prompt WITHOUT <|notimestamps|> gets
    the reference's timestamp sampling rules (pairs, non-decreasing,
    probability forcing), token-identical to the batch engine; a
    neighbor slot that opts out with <|notimestamps|> is untouched."""
    import numpy as np
    import jax.numpy as jnp

    from ctranslate2_tpu import ContinuousWhisper, Whisper
    from ctranslate2_tpu.converters.builder import build_whisper_model
    from ctranslate2_tpu.decoding.options import DecodingOptions

    d, _ = build_whisper_model(str(tmp_path / "wts"))
    w = Whisper(d)
    v = w.model.target_vocabulary
    rng = np.random.default_rng(11)
    feats = rng.standard_normal((24, 64)).astype(np.float32)
    prompt_ts = ["<|startoftranscript|>", "<|en|>", "<|transcribe|>"]
    prompt_no = prompt_ts + ["<|notimestamps|>"]
    sup = tuple(int(i) for i in w.model.config["suppress_ids"])
    eot = v.to_id("<|endoftext|>")
    no_ts = v.to_id("<|notimestamps|>")
    wts = (eot, no_ts, no_ts + 1, len(v) - 1, no_ts + 1 + 50)

    def batch_expected(prompt, whisper_ts):
        ids = [v.to_id(t) for t in prompt]
        mem = w.encode(feats[None])
        opts = DecodingOptions(
            beam_size=1, max_length=16, min_length=0,
            suppress_tokens=sup, return_prefix=True,
            whisper_ts=whisper_ts)
        rs = w.engine.decode(
            [ids[0]], opts, memory=mem,
            memory_lengths=jnp.asarray([mem.shape[1]]),
            prefix_ids=[ids[1:]], end_ids=(eot,))
        return rs[0].hypotheses[0]

    exp_ts = batch_expected(prompt_ts, wts)
    exp_no = batch_expected(prompt_no, None)
    # The rules must actually bite on this model (timestamps appear).
    assert any(t >= no_ts + 1 for t in exp_ts[len(prompt_ts) - 1:])

    cw = ContinuousWhisper(w, num_slots=2, capacity=64)
    try:
        f_ts = cw.submit(feats, prompt_ts, max_length=16)
        f_no = cw.submit(feats, prompt_no, max_length=16)
        assert f_ts.result(timeout=600).sequences_ids[0] == exp_ts
        assert f_no.result(timeout=600).sequences_ids[0] == exp_no
    finally:
        cw.close()

    # BEAM serving with timestamp rules (the reference default is
    # beam 5 + rules): token-identical to the batch engine at beam 2.
    def batch_expected_beam(prompt, whisper_ts):
        ids = [v.to_id(t) for t in prompt]
        mem = w.encode(feats[None])
        opts = DecodingOptions(
            beam_size=2, max_length=16, min_length=0,
            suppress_tokens=sup, return_prefix=True,
            whisper_ts=whisper_ts)
        rs = w.engine.decode(
            [ids[0]], opts, memory=mem,
            memory_lengths=jnp.asarray([mem.shape[1]]),
            prefix_ids=[ids[1:]], end_ids=(eot,))
        return rs[0].hypotheses[0]

    exp_beam = batch_expected_beam(prompt_ts, wts)
    cwb = ContinuousWhisper(w, num_slots=2, capacity=64, beam_size=2)
    try:
        r = cwb.submit(feats, prompt_ts, max_length=16).result(timeout=600)
        assert r.sequences_ids[0] == exp_beam
        # Speculation with timestamp prompts still rejects clearly.
    finally:
        cwb.close()
    cws = ContinuousWhisper(w, num_slots=2, capacity=64, speculation_k=3)
    try:
        with pytest.raises(NotImplementedError, match="timestamp"):
            cws.submit(feats, prompt_ts, max_length=8)
    finally:
        cws.close()
