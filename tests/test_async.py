"""Async / worker-pool API tests (reference behavior:
python/tests/test_translator.py async futures tests +
include/ctranslate2/replica_pool.h:173-300)."""

import threading
import time

import pytest

from ctranslate2_tpu import Generator, Translator
from ctranslate2_tpu.runtime.pool import WorkerPool

MODEL = "/root/reference/tests/data/models/v2/aren-transliteration"

SRC1 = ["آ", "ت", "ز", "م", "و", "ن"]
SRC2 = ["آ", "ت", "ش", "ي", "س", "و", "ن"]
HYP1 = ["a", "t", "z", "m", "o", "n"]
HYP2 = ["a", "c", "h", "i", "s", "o", "n"]


# ----------------------------------------------------------------------
# WorkerPool unit tests (host-only logic).
# ----------------------------------------------------------------------


def test_pool_returns_futures_before_completion():
    pool = WorkerPool(num_workers=1)
    release = threading.Event()

    def job(x):
        release.wait(timeout=10)
        return x * 2

    futures = [pool.submit(job, i) for i in range(3)]
    # Submission must not block on execution.
    assert any(not f.done() for f in futures)
    release.set()
    assert [f.result(timeout=10) for f in futures] == [0, 2, 4]
    pool.close()


def test_pool_propagates_exceptions():
    pool = WorkerPool(num_workers=2)

    def boom():
        raise ValueError("failed job")

    future = pool.submit(boom)
    with pytest.raises(ValueError, match="failed job"):
        future.result(timeout=10)
    pool.close()


def test_pool_parallel_workers():
    pool = WorkerPool(num_workers=2)
    barrier = threading.Barrier(2, timeout=10)

    def job():
        # Both workers must be inside a job at once to pass the barrier.
        barrier.wait()
        return True

    f1, f2 = pool.submit(job), pool.submit(job)
    assert f1.result(timeout=10) and f2.result(timeout=10)
    pool.close()


def test_pool_introspection_and_close():
    pool = WorkerPool(num_workers=1)
    release = threading.Event()
    pool.submit(release.wait, 10)
    pool.submit(lambda: None)
    deadline = time.time() + 5
    while pool.num_active_batches < 2 and time.time() < deadline:
        time.sleep(0.01)
    assert pool.num_active_batches == 2
    release.set()
    pool.close()
    with pytest.raises(RuntimeError):
        pool.submit(lambda: None)


# ----------------------------------------------------------------------
# Task-API async integration.
# ----------------------------------------------------------------------


@pytest.fixture(scope="module")
def translator():
    return Translator(MODEL, inter_threads=2)


def test_translate_batch_async(translator):
    results = translator.translate_batch(
        [SRC1, SRC2], asynchronous=True, return_scores=True)
    assert len(results) == 2
    assert results[0].result().hypotheses == [HYP1]
    assert results[1].result().hypotheses == [HYP2]
    assert results[0].done() and results[1].done()


def test_translate_batch_async_empty_source(translator):
    results = translator.translate_batch([[], SRC1], asynchronous=True)
    # Empty sources resolve immediately, without a device dispatch.
    assert results[0].done()
    assert results[0].result().hypotheses == [[]]
    assert results[1].result().hypotheses == [HYP1]


def test_translate_batch_async_split_batches(translator):
    # max_batch_size=1 -> one future per example.
    results = translator.translate_batch(
        [SRC1, SRC2], max_batch_size=1, asynchronous=True)
    assert results[0].result().hypotheses == [HYP1]
    assert results[1].result().hypotheses == [HYP2]


def test_score_batch_async(translator):
    results = translator.score_batch([SRC1], [HYP1], asynchronous=True)
    r = results[0].result()
    assert len(r.tokens_score) == len(HYP1) + 1  # includes </s>


def test_concurrent_submission(translator):
    # Overlapping requests from multiple client threads all complete.
    out = {}

    def client(tag, src, hyp):
        res = translator.translate_batch([src], asynchronous=True)
        out[tag] = (res[0].result().hypotheses[0], hyp)

    threads = [
        threading.Thread(target=client, args=(i, src, hyp))
        for i, (src, hyp) in enumerate([(SRC1, HYP1), (SRC2, HYP2)] * 2)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
    assert len(out) == 4
    for got, want in out.values():
        assert got == want


def test_pipelined_translate_iterable(translator):
    sources = [SRC1, SRC2] * 4
    results = list(translator.translate_iterable(iter(sources), max_batch_size=2))
    assert len(results) == len(sources)
    for src, r in zip(sources, results):
        assert r.hypotheses[0] == (HYP1 if src is SRC1 else HYP2)


def test_pool_introspection_on_translator(translator):
    assert translator.num_translators == 2
    assert translator.num_queued_batches >= 0
    assert translator.num_active_batches >= 0


def test_device_argument():
    t = Translator(MODEL, device="cpu")
    assert t.device == "cpu"
    out = t.translate_batch([SRC1])
    assert out[0].hypotheses == [HYP1]
    with pytest.raises(ValueError):
        Translator(MODEL, device="cuda")
    with pytest.raises(ValueError):
        Translator(MODEL, device="cpu", device_index=100)


def test_task_api_surface(translator):
    """Read-only attributes every reference pybind class exposes
    (python/cpp/translator.cc def_property_readonly list)."""
    assert translator.compute_type in (
        "float32", "bfloat16", "int8", "int8_bfloat16", "int8_float32")
    assert translator.tensor_parallel is False
    assert translator.device in ("auto", "cpu", "tpu")
    assert translator.model_is_loaded
    assert translator.num_translators >= 1


def test_whisper_encoder_surface(tmp_path):
    from ctranslate2_tpu import Wav2Vec2
    from ctranslate2_tpu.converters.builder import build_decoder_only_model
    from ctranslate2_tpu import Generator

    d = build_decoder_only_model(str(tmp_path / "g"), quantization="int8")
    g = Generator(d, compute_type="int8")
    assert g.compute_type.startswith("int8")
    assert g.num_generators == 1 and g.num_workers == 1
    # Residency round-trip through the mixin.
    g.unload_model(to_cpu=True)
    assert not g.model_is_loaded
    g.load_model()
    assert g.model_is_loaded
    out = g.generate_batch([["tok1"]], max_length=4)
    assert out[0].sequences_ids[0]
