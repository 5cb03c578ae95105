"""API-surface parity tests mirroring the reference's
python/tests/test_translator.py cases that had no analog here yet:
logging, unicode paths, invalid inputs/options, model unload semantics,
token streaming, per-callback batch/hypothesis ids, and raw-text file
translation."""

import collections
import inspect
import logging
import os
import shutil

import pytest

import ctranslate2_tpu
from ctranslate2_tpu import Translator

MODEL = "/root/reference/tests/data/models/v2/aren-transliteration"

SRC1 = ["آ", "ت", "ز", "م", "و", "ن"]
SRC2 = ["آ", "ت", "ش", "ي", "س", "و", "ن"]
HYP1 = ["a", "t", "z", "m", "o", "n"]
HYP2 = ["a", "c", "h", "i", "s", "o", "n"]


@pytest.fixture(scope="module")
def translator():
    return Translator(MODEL)


# ---------------------------------------------------------------------------
# Module-level API (reference: test_logging, test_get_supported_compute_types)
# ---------------------------------------------------------------------------


def test_package_exports():
    """Every public name the reference package exports has an analog here
    (reference: python/ctranslate2/__init__.py)."""
    names = [
        "AsyncGenerationResult", "AsyncScoringResult",
        "AsyncTranslationResult", "DataType", "Device", "Encoder",
        "EncoderForwardOutput", "ExecutionStats", "GenerationResult",
        "GenerationStepResult", "Generator", "MpiInfo", "ScoringResult",
        "TranslationResult", "Translator", "contains_model",
        "get_cuda_device_count", "get_supported_compute_types",
        "set_random_seed", "get_log_level", "set_log_level",
        "converters", "models", "specs", "__version__",
        # Task classes beyond the core set.
        "Whisper", "Wav2Vec2", "Wav2Vec2Bert",
        "ContinuousBatcher", "ContinuousTranslator", "ContinuousWhisper",
    ]
    missing = [n for n in names if not hasattr(ctranslate2_tpu, n)]
    assert not missing, missing
    assert ctranslate2_tpu.get_cuda_device_count() == 0
    assert ctranslate2_tpu.contains_model(MODEL)
    import ctranslate2_tpu.specs as specs

    assert "SpecBuilder" in specs.__all__
    # Reference ctranslate2.models namespace (python/ctranslate2/models/).
    from ctranslate2_tpu import models as models_ns

    for n in ("Whisper", "Wav2Vec2", "Wav2Vec2Bert",
              "WhisperGenerationResult"):
        assert getattr(models_ns, n) is not None


def test_max_queued_batches_arg():
    """Reference ctor arg name and value convention (replica_pool.h:252-255:
    0 = auto 4/worker, -1 = unlimited); the old max_queue_size alias still
    works."""
    t = Translator(MODEL, max_queued_batches=2)
    assert t._pool._queue.maxsize == 2
    t2 = Translator(MODEL, max_queued_batches=-1)
    assert t2._pool._queue.maxsize == 0  # unbounded
    t3 = Translator(MODEL, inter_threads=2)
    assert t3._pool._queue.maxsize == 8  # auto: 4 per worker
    t4 = Translator(MODEL, max_queue_size=3)
    assert t4._pool._queue.maxsize == 3
    # The legacy alias keeps its ORIGINAL meaning: 0 = unbounded.
    t5 = Translator(MODEL, max_queue_size=0)
    assert t5._pool._queue.maxsize == 0
    # Submitting more work than the bound still completes (blocking put).
    rs = t.translate_batch([SRC1] * 12, max_batch_size=1,
                           asynchronous=True)
    assert [r.result().hypotheses[0] for r in rs] == [HYP1] * 12


def test_logging_level_roundtrip():
    assert ctranslate2_tpu.get_log_level() == logging.WARNING
    ctranslate2_tpu.set_log_level(logging.INFO)
    assert ctranslate2_tpu.get_log_level() == logging.INFO
    # The reference's CT2_VERBOSE -3..3 scale is accepted too.
    ctranslate2_tpu.set_log_level(2)
    assert ctranslate2_tpu.get_log_level() == logging.DEBUG
    ctranslate2_tpu.set_log_level(logging.WARNING)
    assert ctranslate2_tpu.get_log_level() == logging.WARNING


def test_get_supported_compute_types():
    types = ctranslate2_tpu.get_supported_compute_types("cpu")
    assert "float32" in types and "int8" in types and "bfloat16" in types
    with pytest.raises(ValueError):
        ctranslate2_tpu.get_supported_compute_types("cuda")


# ---------------------------------------------------------------------------
# Construction errors (reference: test_invalid_model_path,
# test_invalid_model_type, test_invalid_device_settings, test_unicode_path)
# ---------------------------------------------------------------------------


def test_invalid_model_path():
    with pytest.raises(Exception, match="xxx"):
        Translator("xxx")


def test_invalid_model_type():
    from ctranslate2_tpu import Generator

    with pytest.raises(ValueError, match="not a decoder-only"):
        Generator(MODEL)


def test_invalid_device_settings():
    with pytest.raises(ValueError, match="device index"):
        Translator(MODEL, device_index=[])
    with pytest.raises(ValueError, match="device index"):
        Translator(MODEL, device="cpu", device_index=[0, 99])


def test_unicode_path(tmp_path):
    dst = str(tmp_path / "测试" / "model")
    shutil.copytree(MODEL, dst)
    t = Translator(dst)
    assert t.translate_batch([SRC1])[0].hypotheses[0] == HYP1


# ---------------------------------------------------------------------------
# Option validation (reference: test_invalid_translation_options{,_async})
# ---------------------------------------------------------------------------


def test_invalid_translation_options(translator):
    with pytest.raises(ValueError, match="is greater than"):
        translator.translate_batch(
            [SRC1], min_decoding_length=10, max_decoding_length=5)


def test_invalid_translation_options_async(translator):
    outputs = translator.translate_batch(
        [SRC1], min_decoding_length=10, max_decoding_length=5,
        asynchronous=True)
    for _ in range(2):
        with pytest.raises(ValueError, match="is greater than"):
            outputs[0].result()
        assert outputs[0].done()


# ---------------------------------------------------------------------------
# Model unload (reference: test_model_unload{,_while_async_translation})
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("to_cpu", [False, True])
def test_model_unload(to_cpu):
    translator = Translator(MODEL)
    translator.unload_model(to_cpu=to_cpu)
    assert not translator.model_is_loaded
    if not to_cpu:
        with pytest.raises(RuntimeError, match="unloaded"):
            translator.load_model()
        return
    translator.load_model()
    assert translator.model_is_loaded
    output = translator.translate_batch([SRC1])
    assert output[0].hypotheses[0] == HYP1


def test_model_unload_while_async_translation():
    translator = Translator(MODEL)
    # Warm up the jit cache so the async job is in flight briefly but the
    # unload call below races with real work at least once in CI.
    outputs = translator.translate_batch([SRC1], asynchronous=True)
    translator.unload_model()
    # Either the unload was skipped (job still active) or it ran after
    # completion; the result must resolve correctly regardless.
    assert outputs[0].result().hypotheses[0] == HYP1


# ---------------------------------------------------------------------------
# Token streaming (reference: test_token_streaming{,_exception})
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("return_log_prob", [True, False])
def test_token_streaming(translator, return_log_prob):
    expected = translator.translate_batch([SRC1], return_scores=True)[0]

    step_results = translator.generate_tokens(
        SRC1, return_log_prob=return_log_prob)
    assert inspect.isgenerator(step_results) or hasattr(
        step_results, "__next__")

    tokens = []
    cum_log_probs = 0.0
    for step_result in step_results:
        assert isinstance(step_result, ctranslate2_tpu.GenerationStepResult)
        tokens.append(step_result.token)
        if return_log_prob:
            cum_log_probs += step_result.log_prob
        else:
            assert step_result.log_prob is None

    assert tokens[: len(expected.hypotheses[0])] == expected.hypotheses[0]
    if return_log_prob:
        assert cum_log_probs / len(tokens) == pytest.approx(
            expected.scores[0], abs=1e-4)


def test_token_streaming_exception(translator):
    step_results = translator.generate_tokens(
        SRC1, min_decoding_length=2, max_decoding_length=1)
    with pytest.raises(ValueError, match="decoding length"):
        list(step_results)


# ---------------------------------------------------------------------------
# Callback ids (reference: test_callback_batch_id, test_callback_hypothesis_id)
# ---------------------------------------------------------------------------


def test_callback_hypothesis_id(translator):
    hypotheses = collections.defaultdict(list)

    def _callback(step_result):
        assert step_result.batch_id == 0
        hypotheses[step_result.hypothesis_id].append(step_result.token)

    translator.translate_batch(
        [SRC1], beam_size=1, sampling_topk=20, num_hypotheses=3,
        callback=_callback)
    assert len(hypotheses) == 3


def test_callback_batch_id(translator):
    # Inputs are internally sorted by length; returned batch ids must
    # match the user's order.
    source = [["ن"] * 1, ["ن"] * 2, ["ن"] * 3]
    target_prefix = [["a"], ["b"], ["c"]]
    seen = set()

    def _callback(step_result):
        if step_result.step == 0:
            assert (step_result.token
                    == target_prefix[step_result.batch_id][0])
            seen.add(step_result.batch_id)
        return True

    translator.translate_batch(
        source, target_prefix, max_batch_size=2, beam_size=1,
        callback=_callback)
    assert seen == {0, 1, 2}


def test_file_translation_streaming_windows(translator, tmp_path):
    """translate_file streams read_batch_size windows with in-order writes
    (reference consume_batches, replica_pool.h:191-226); a window smaller
    than the file must produce the identical output, and target/source
    line-count mismatches raise."""
    input_path = str(tmp_path / "in.txt")
    with open(input_path, "w", encoding="utf-8") as f:
        for _ in range(3):
            f.write(" ".join(SRC1) + "\n")
            f.write(" ".join(SRC2) + "\n")

    out_all = str(tmp_path / "out_all.txt")
    out_win = str(tmp_path / "out_win.txt")
    stats = translator.translate_file(input_path, out_all)
    assert stats.num_examples == 6
    stats = translator.translate_file(
        input_path, out_win, max_batch_size=2, read_batch_size=2)
    assert stats.num_examples == 6
    with open(out_all) as a, open(out_win) as b:
        assert a.read() == b.read()
    expected = [" ".join(HYP1), " ".join(HYP2)] * 3
    assert open(out_win).read().splitlines() == expected

    # Line-count mismatch in the prefix file raises (both directions).
    short_tgt = str(tmp_path / "short.txt")
    with open(short_tgt, "w", encoding="utf-8") as f:
        f.write("a\n")
    with pytest.raises(ValueError, match="same number of lines"):
        translator.translate_file(
            input_path, str(tmp_path / "x.txt"), target_path=short_tgt,
            read_batch_size=2)
    long_tgt = str(tmp_path / "long.txt")
    with open(long_tgt, "w", encoding="utf-8") as f:
        for _ in range(7):
            f.write("a\n")
    with pytest.raises(ValueError, match="same number of lines"):
        translator.translate_file(
            input_path, str(tmp_path / "x.txt"), target_path=long_tgt,
            read_batch_size=2)


def test_score_file_streaming(translator, tmp_path):
    src = str(tmp_path / "src.txt")
    tgt = str(tmp_path / "tgt.txt")
    with open(src, "w", encoding="utf-8") as f:
        for _ in range(4):
            f.write(" ".join(SRC1) + "\n")
    with open(tgt, "w", encoding="utf-8") as f:
        for _ in range(4):
            f.write(" ".join(HYP1) + "\n")
    out_all = str(tmp_path / "s_all.txt")
    out_win = str(tmp_path / "s_win.txt")
    translator.score_file(src, tgt, out_all)
    stats = translator.score_file(src, tgt, out_win, max_batch_size=1)
    assert stats.num_examples == 4

    def parse(path):
        rows = [line.split(" ||| ") for line in open(path)]
        return ([float(r[0]) for r in rows], [r[1] for r in rows])

    scores_a, toks_a = parse(out_all)
    scores_b, toks_b = parse(out_win)
    assert toks_a == toks_b and len(scores_a) == 4
    # Different batch shapes reorder reductions: scores match to float32
    # noise, not bit-exactly.
    for sa, sb in zip(scores_a, scores_b):
        assert abs(sa - sb) < 1e-4


# ---------------------------------------------------------------------------
# Raw-text file translation (reference: test_raw_file_translation{,_with_prefix})
# ---------------------------------------------------------------------------


def test_raw_file_translation(translator, tmp_path):
    input_path = str(tmp_path / "input.txt")
    output_path = str(tmp_path / "output.txt")
    with open(input_path, "w", encoding="utf-8") as f:
        f.write("آتزمون\n")
        f.write("آتشيسون\n")

    tokenize_fn = lambda text: list(text)  # noqa: E731
    detokenize_fn = lambda tokens: "".join(tokens)  # noqa: E731

    with pytest.raises(ValueError, match="target_detokenize_fn"):
        translator.translate_file(
            input_path, output_path, source_tokenize_fn=tokenize_fn)
    with pytest.raises(ValueError, match="source_tokenize_fn"):
        translator.translate_file(
            input_path, output_path, target_detokenize_fn=detokenize_fn)

    translator.translate_file(
        input_path, output_path,
        source_tokenize_fn=tokenize_fn,
        target_detokenize_fn=detokenize_fn)
    with open(output_path, encoding="utf-8") as f:
        lines = f.readlines()
    assert lines[0].strip() == "atzmon"
    assert lines[1].strip() == "achison"


def test_raw_file_translation_with_prefix(translator, tmp_path):
    source_path = str(tmp_path / "input.txt")
    target_path = str(tmp_path / "target.txt")
    output_path = str(tmp_path / "output.txt")
    with open(source_path, "w", encoding="utf-8") as f:
        f.write("آتزمون\n")
        f.write("آتشيسون\n")
    with open(target_path, "w", encoding="utf-8") as f:
        # Target written reversed to force a distinct tokenization.
        f.write("sta\n")
        f.write("\n")

    source_tokenize_fn = lambda text: list(text)  # noqa: E731
    target_tokenize_fn = lambda text: list(reversed(list(text)))  # noqa: E731
    detokenize_fn = lambda tokens: "".join(tokens)  # noqa: E731

    with pytest.raises(ValueError, match="target_tokenize_fn"):
        translator.translate_file(
            source_path, output_path, target_path=target_path,
            source_tokenize_fn=source_tokenize_fn,
            target_detokenize_fn=detokenize_fn)

    translator.translate_file(
        source_path, output_path, target_path=target_path,
        source_tokenize_fn=source_tokenize_fn,
        target_tokenize_fn=target_tokenize_fn,
        target_detokenize_fn=detokenize_fn)
    with open(output_path, encoding="utf-8") as f:
        lines = f.readlines()
    # First line constrained by the prefix "ats".
    assert lines[0].strip().startswith("ats")
    assert lines[1].strip() == "achison"


def test_file_translation_with_prefix(translator, tmp_path):
    source_path = str(tmp_path / "input.txt")
    target_path = str(tmp_path / "target.txt")
    output_path = str(tmp_path / "output.txt")
    with open(source_path, "w", encoding="utf-8") as f:
        f.write("آ ت ز م و ن\n")
        f.write("آ ت ش ي س و ن\n")
    with open(target_path, "w", encoding="utf-8") as f:
        f.write("a t s\n")
        f.write("\n")

    translator.translate_file(
        source_path, output_path, target_path=target_path)
    with open(output_path, encoding="utf-8") as f:
        lines = f.readlines()
    assert lines[0].strip().startswith("a t s")
    assert lines[1].strip() == "a c h i s o n"


def test_file_translation_with_scores(translator, tmp_path):
    source_path = str(tmp_path / "input.txt")
    output_path = str(tmp_path / "output.txt")
    with open(source_path, "w", encoding="utf-8") as f:
        f.write("آ ت ز م و ن\n")

    translator.translate_file(source_path, output_path, with_scores=True)
    with open(output_path, encoding="utf-8") as f:
        line = f.readline().strip()
    score, text = line.split(" ||| ")
    float(score)
    assert text == "a t z m o n"
