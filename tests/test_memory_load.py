"""Loading a model from in-memory files (reference:
python/tests/test_translator.py::test_load_model_from_memory, backed by
the files= constructor argument of every task class)."""

import io
import os

import pytest

from ctranslate2_tpu import Translator
from ctranslate2_tpu.formats.model_file import load_model_file_from_files

MODEL = "/root/reference/tests/data/models/v2/aren-transliteration"

SRC = ["آ", "ت", "ز", "م", "و", "ن"]
HYP = ["a", "t", "z", "m", "o", "n"]


def _read_files(as_file_object: bool):
    files = {}
    for filename in os.listdir(MODEL):
        with open(os.path.join(MODEL, filename), "rb") as f:
            content = f.read()
        files[filename] = io.BytesIO(content) if as_file_object else content
    return files


@pytest.mark.parametrize("as_file_object", [False, True])
def test_load_model_from_memory(as_file_object):
    files = _read_files(as_file_object)
    translator = Translator("aren-transliteration", files=files)

    def _translate():
        output = translator.translate_batch([SRC])
        assert output[0].hypotheses[0] == HYP

    if as_file_object:
        for handle in files.values():
            handle.close()

    _translate()

    translator.unload_model(to_cpu=True)
    translator.load_model()

    _translate()


def test_memory_model_file_parses_vocab_and_config():
    files = _read_files(False)
    mf = load_model_file_from_files("aren", files)
    assert mf.spec_name == "TransformerBase"
    assert "model.bin" not in mf.variables  # sanity: parsed, not stored raw
    assert len(mf.variables) > 10


def test_missing_model_bin_raises():
    with pytest.raises(ValueError, match="model.bin"):
        load_model_file_from_files("empty", {})


def test_memory_load_matches_disk_outputs():
    t_mem = Translator("aren", files=_read_files(False))
    t_disk = Translator(MODEL)
    src2 = ["آ", "ت", "ش", "ي", "س", "و", "ن"]
    out_mem = t_mem.translate_batch([SRC, src2], beam_size=2,
                                    return_scores=True)
    out_disk = t_disk.translate_batch([SRC, src2], beam_size=2,
                                      return_scores=True)
    for a, b in zip(out_mem, out_disk):
        assert a.hypotheses == b.hypotheses
        assert a.scores == pytest.approx(b.scores, abs=1e-4)
