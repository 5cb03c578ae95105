"""Whisper task API tests on a fabricated tiny model."""

import numpy as np
import pytest

from ctranslate2_tpu.converters.builder import build_whisper_model
from ctranslate2_tpu.runtime.whisper import Whisper, median_filter, negative_dtw


@pytest.fixture(scope="module")
def whisper_model(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("whisper"))
    build_whisper_model(d)
    return d


@pytest.fixture(scope="module")
def whisper(whisper_model):
    return Whisper(whisper_model)


def _features(whisper, batch=1, time=16, seed=0):
    rng = np.random.default_rng(seed)
    return rng.standard_normal((batch, whisper.n_mels, time)).astype(np.float32)


def test_properties(whisper):
    assert whisper.is_multilingual
    assert whisper.n_mels == 24
    assert whisper.num_languages == 2


def test_encode(whisper):
    feats = _features(whisper)
    out = whisper.encode(feats, to_cpu=True)
    assert out.shape == (1, 8, 32)  # time // 2, d_model


def test_encode_passthrough(whisper):
    feats = _features(whisper)
    enc = whisper.encode(feats)
    out = whisper._maybe_encode(enc)
    np.testing.assert_allclose(np.asarray(out), np.asarray(enc))


def test_detect_language(whisper):
    feats = _features(whisper)
    results = whisper.detect_language(feats)
    assert len(results) == 1
    langs = dict(results[0])
    assert set(langs) == {"<|en|>", "<|fr|>"}
    assert abs(sum(langs.values()) - 1.0) < 1e-3
    # Sorted descending.
    probs = [p for _, p in results[0]]
    assert probs == sorted(probs, reverse=True)


def test_generate(whisper):
    feats = _features(whisper)
    prompt = ["<|startoftranscript|>", "<|en|>", "<|transcribe|>"]
    results = whisper.generate(feats, [prompt], beam_size=2, max_length=12,
                               return_scores=True)
    assert len(results) == 1
    assert results[0].sequences_ids[0]
    # Timestamp rules: first sampled token must be a timestamp.
    v = whisper._vocab
    first_free = results[0].sequences_ids[0][len(prompt):]
    if first_free:
        assert first_free[0] > whisper._no_timestamps_id


def test_generate_greedy_no_timestamps(whisper):
    feats = _features(whisper)
    prompt = ["<|startoftranscript|>", "<|en|>", "<|transcribe|>",
              "<|notimestamps|>"]
    results = whisper.generate(feats, [prompt], beam_size=1, max_length=12)
    seq = results[0].sequences_ids[0]
    # With <|notimestamps|> the rules processor is off: no constraint that
    # the first token is a timestamp.
    assert seq


def test_generate_no_speech_prob(whisper):
    feats = _features(whisper)
    prompt = ["<|startoftranscript|>", "<|en|>", "<|transcribe|>"]
    results = whisper.generate(feats, [prompt], beam_size=1, max_length=8,
                               return_no_speech_prob=True)
    assert 0.0 <= results[0].no_speech_prob <= 1.0


def test_align(whisper):
    feats = _features(whisper)
    v = whisper._vocab
    sot = v.bos_id
    text = [v.to_id("w1"), v.to_id("w2"), v.to_id("w3")]
    results = whisper.align(feats, [sot], [text], num_frames=16)
    assert len(results) == 1
    r = results[0]
    assert len(r.text_token_probs) == 3
    assert all(0 <= p <= 1 for p in r.text_token_probs)
    assert r.alignments
    # DTW path is monotonic.
    xs = [a[0] for a in r.alignments]
    ys = [a[1] for a in r.alignments]
    assert xs == sorted(xs) and ys == sorted(ys)


def test_negative_dtw_simple():
    x = np.asarray([[1.0, 0.0], [0.0, 1.0]], np.float32)
    path = negative_dtw(x)
    assert path[0] == (0, 0)
    assert path[-1] == (1, 1)


def test_median_filter():
    x = np.asarray([[1.0, 9.0, 1.0, 1.0, 1.0]], np.float32)
    out = median_filter(x, 3)
    assert out.shape == x.shape
    assert out[0, 1] == 1.0  # spike removed


def test_generate_max_length_budget(whisper):
    """max_length halving at the prompt boundary (reference:
    src/models/whisper.cc:294-303 — decoding budget is
    min(total/2, total - start_step))."""
    feats = _features(whisper)
    prompt = ["<|startoftranscript|>", "<|en|>", "<|transcribe|>",
              "<|notimestamps|>"]
    # total=10: start_step = len(prompt)-1 = 3 -> budget min(5, 7) = 5.
    r = whisper.generate(feats, [prompt], beam_size=1, max_length=10)[0]
    assert len(r.sequences_ids[0]) <= len(prompt) + 5
    # Boundary: total barely above the prompt -> budget total-start = 2.
    r2 = whisper.generate(feats, [prompt], beam_size=1, max_length=5)[0]
    assert len(r2.sequences_ids[0]) <= len(prompt) + 2


def test_generate_async_and_options(whisper):
    feats = _features(whisper)
    prompt = ["<|startoftranscript|>", "<|en|>", "<|transcribe|>",
              "<|notimestamps|>"]
    handles = whisper.generate(
        feats, [prompt], asynchronous=True, beam_size=1, max_length=8,
        sampling_topk=4, sampling_topp=0.95, sampling_temperature=0.9,
        return_logits_vocab=True)
    r = handles[0].result(timeout=300)
    assert r.sequences_ids[0]
    assert r.logits and len(r.logits[0]) >= 1
