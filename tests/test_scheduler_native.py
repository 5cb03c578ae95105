"""Serving scheduler + native host-core tests."""

import threading
import time

import pytest

from ctranslate2_tpu import Translator
from ctranslate2_tpu.runtime.scheduler import (
    ServingScheduler,
    translation_scheduler,
)
from ctranslate2_tpu import native


def test_native_available():
    # The toolchain in this environment must build the native core.
    assert native.available


def test_native_vocab_matches_python():
    from ctranslate2_tpu.formats.vocabulary import Vocabulary

    tokens = ["a", "b", "a", "<unk>", "c"]
    pyv = Vocabulary(tokens)
    nv = native.Vocabulary(tokens)
    batch = [["a", "b", "c", "missing"]]
    assert nv.tokens_to_ids(batch) == pyv.tokens_to_ids(batch)


def test_native_rebatch_matches_python():
    import importlib

    from ctranslate2_tpu.runtime import batching

    lengths = [5, 2, 9, 9, 1, 7]
    native_batches = native.rebatch(lengths, 2, "examples")
    # Compare against the documented semantics: desc order, chunks of 2.
    order = sorted(range(len(lengths)), key=lambda i: -lengths[i])
    expected = [order[i:i + 2] for i in range(0, len(order), 2)]
    assert [list(b) for b in native_batches] == expected


def test_native_model_index_roundtrip(tiny_model_path):
    from ctranslate2_tpu.formats.model_file import load_model_file

    mf = load_model_file(tiny_model_path)
    assert mf.spec_name == "TransformerBase"
    w = mf.get("encoder/layer_0/self_attention/linear_0/weight")
    assert w.shape == (96, 32)
    # mmap-backed arrays are read-only views.
    assert not w.array.flags.writeable


def test_scheduler_batches_requests():
    calls = []

    def run_batch(examples, options):
        calls.append(len(examples))
        return [e * 2 for e in examples]

    # Generous flush timeout: under heavy CPU contention (full-suite
    # runs) submissions can trickle in; the batching property we assert
    # is "fewer batches than requests", not an exact count.
    sched = ServingScheduler(run_batch, max_batch_size=8,
                             batch_timeout_ms=200)
    futures = [sched.submit(i) for i in range(6)]
    results = [f.result(timeout=30) for f in futures]
    assert results == [0, 2, 4, 6, 8, 10]
    sched.close()
    # All 6 should have been served in fewer batches than requests
    # (micro-batching works).
    assert sum(calls) == 6
    assert len(calls) <= 4


def test_scheduler_groups_by_options():
    seen = []

    def run_batch(examples, options):
        seen.append((len(examples), options.get("mode")))
        return examples

    sched = ServingScheduler(run_batch, max_batch_size=8, batch_timeout_ms=50)
    fa = [sched.submit(i, mode="a") for i in range(3)]
    fb = [sched.submit(i, mode="b") for i in range(3)]
    for f in fa + fb:
        f.result(timeout=5)
    sched.close()
    modes = {m for _, m in seen}
    assert modes == {"a", "b"}


def test_scheduler_propagates_errors():
    def run_batch(examples, options):
        raise ValueError("boom")

    sched = ServingScheduler(run_batch, batch_timeout_ms=20)
    f = sched.submit("x")
    with pytest.raises(ValueError, match="boom"):
        f.result(timeout=5)
    sched.close()


def test_translation_scheduler_end_to_end(tiny_model_path):
    translator = Translator(tiny_model_path)
    sched = translation_scheduler(translator, max_batch_size=4,
                                  batch_timeout_ms=30)
    srcs = [["آ", "ت", "ز", "م", "و", "ن"],
            ["آ", "ت", "ش", "ي", "س", "و", "ن"]]
    futures = [sched.submit(s) for s in srcs]
    results = [f.result(timeout=120) for f in futures]
    assert results[0].hypotheses == [["a", "t", "z", "m", "o", "n"]]
    assert results[1].hypotheses == [["a", "c", "h", "i", "s", "o", "n"]]
    sched.close()


def test_buffered_translation_wrapper(tiny_model_path):
    """Public reference-parity facade: single-example translate_async
    calls micro-batch behind one Translator (reference:
    src/buffered_translation_wrapper.cc:5-111)."""
    from ctranslate2_tpu import BufferedTranslationWrapper

    translator = Translator(tiny_model_path)
    expected = translator.translate_batch(
        [["آ", "ت", "ز", "م", "و", "ن"]],
        [["a", "t", "z"]])[0]
    wrapper = BufferedTranslationWrapper(
        translator, max_batch_size=4, batch_timeout_in_micros=30_000)
    futs = [wrapper.translate_async(["آ", "ت", "ز", "م", "و", "ن"])
            for _ in range(3)]
    # A per-example target prefix rides with its example inside the
    # same batch group.
    fp = wrapper.translate_async(["آ", "ت", "ز", "م", "و", "ن"],
                                 target_prefix=["a", "t", "z"])
    for f in futs:
        assert f.result(timeout=120).hypotheses == \
            [["a", "t", "z", "m", "o", "n"]]
    assert fp.result(timeout=120).hypotheses == expected.hypotheses
    assert wrapper.num_queued == 0
    wrapper.close()
