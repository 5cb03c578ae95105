"""Data-parallel model replicas via device_index=[0,1,..]
(reference behavior: one model replica per listed device with a shared
worker pool, include/ctranslate2/replica_pool.h:19-300 and
docs/parallel.md "Model and data parallelism")."""

import threading

import jax
import pytest

from ctranslate2_tpu import Generator, Translator
from ctranslate2_tpu.models.loader import resolve_devices

MODEL = "/root/reference/tests/data/models/v2/aren-transliteration"

SRC1 = ["آ", "ت", "ز", "م", "و", "ن"]
SRC2 = ["آ", "ت", "ش", "ي", "س", "و", "ن"]
HYP1 = ["a", "t", "z", "m", "o", "n"]
HYP2 = ["a", "c", "h", "i", "s", "o", "n"]


def _leaf_devices(tree):
    return {
        next(iter(leaf.devices()))
        for leaf in jax.tree_util.tree_leaves(tree)
        if hasattr(leaf, "devices")
    }


def test_resolve_devices():
    assert resolve_devices("auto", 0) is None
    devs = resolve_devices("cpu", [0, 1])
    assert [d.id for d in devs] == [0, 1]
    devs = resolve_devices("auto", [2, 3])
    assert [d.id for d in devs] == [2, 3]
    with pytest.raises(ValueError):
        resolve_devices("cpu", [0, 99])


def test_replicas_on_distinct_devices():
    t = Translator(MODEL, device="cpu", device_index=[0, 1])
    assert t.num_replicas == 2
    assert t._pool.num_workers == 2
    models = t._all_models()
    d0 = _leaf_devices(models[0].params)
    d1 = _leaf_devices(models[1].params)
    assert d0 == {jax.devices("cpu")[0]}
    assert d1 == {jax.devices("cpu")[1]}
    # max_positions bookkeeping stays a plain int on every replica.
    assert isinstance(models[1].consts["max_positions"], int)


def test_replica_translations_match():
    t = Translator(MODEL, device="cpu", device_index=[0, 1])
    # Route jobs through both workers; every result must be identical to
    # the single-device output regardless of which replica served it.
    batches = [
        t.translate_batch([SRC1, SRC2], asynchronous=True) for _ in range(4)
    ]
    for results in batches:
        assert results[0].result().hypotheses[0] == HYP1
        assert results[1].result().hypotheses[0] == HYP2


def test_replicas_execute_concurrently():
    t = Translator(MODEL, device="cpu", device_index=[0, 1])
    seen = set()
    barrier = threading.Barrier(2, timeout=20)

    def probe():
        # Both workers must be inside a job at once to pass the barrier,
        # and each must see its own replica.
        barrier.wait()
        seen.add(id(t.model))

    f1 = t._pool.submit(probe)
    f2 = t._pool.submit(probe)
    f1.result(timeout=30)
    f2.result(timeout=30)
    assert len(seen) == 2


def test_replica_consts_growth_stays_on_device():
    t = Translator(MODEL, device="cpu", device_index=[0, 1])
    replica = t._all_models()[1]
    consts = replica.ensure_consts(5000)
    assert consts["max_positions"] >= 5000
    assert _leaf_devices(consts) <= {jax.devices("cpu")[1]}


def test_generator_replicas():
    path = "/root/reference/tests/data/models/v2/aren-transliteration"
    # The transliteration model is seq2seq; use the Translator-backed
    # check above for decoding and just validate Generator wiring errors
    # cleanly on a non-LM artifact.
    with pytest.raises(ValueError):
        Generator(path, device="cpu", device_index=[0, 1])


def test_unload_reload_replicas():
    t = Translator(MODEL, device="cpu", device_index=[0, 1])
    t.unload_model(to_cpu=True)
    assert not t.model_is_loaded
    for m in t._all_models():
        assert m.params is None
    t.load_model()
    assert t.model_is_loaded
    models = t._all_models()
    assert _leaf_devices(models[0].params) == {jax.devices("cpu")[0]}
    assert _leaf_devices(models[1].params) == {jax.devices("cpu")[1]}
    res = t.translate_batch([SRC1])
    assert res[0].hypotheses[0] == HYP1
