"""Vocabulary-map restricted decoding and return_alternatives
(reference goldens: python/tests/test_translator.py:610-636)."""

import os
import shutil

import pytest

from ctranslate2_tpu import Translator

SRC = ["آ", "ت", "ز", "م", "و", "ن"]


@pytest.fixture
def vmap_model(tmp_path, tiny_model_path):
    dst = str(tmp_path / "model")
    shutil.copytree(tiny_model_path, dst)
    with open(os.path.join(dst, "vmap.txt"), "w", encoding="utf-8") as f:
        f.write("ن\tz s u m o n\n")
    return dst


def test_return_alternatives(tiny_model_path):
    translator = Translator(tiny_model_path)
    output = translator.translate_batch(
        [SRC], target_prefix=[["a", "t"]], num_hypotheses=10,
        return_alternatives=True)
    assert len(output[0].hypotheses) == 10
    assert output[0].hypotheses[0] == ["a", "t", "z", "m", "o", "n"]
    assert output[0].hypotheses[1] == ["a", "t", "s", "u", "m", "o", "n"]


def test_return_alternatives_with_vmap(vmap_model):
    translator = Translator(vmap_model)
    output = translator.translate_batch(
        [SRC], target_prefix=[["a", "t"]], num_hypotheses=2,
        return_alternatives=True, use_vmap=True)
    assert len(output[0].hypotheses) == 2
    assert output[0].hypotheses[0] == ["a", "t", "z", "m", "o", "n"]
    assert output[0].hypotheses[1] == ["a", "t", "s", "u", "m", "o", "n"]


def test_vmap_restricted_beam_and_greedy(vmap_model):
    translator = Translator(vmap_model)
    # All output tokens must come from the candidate set (+specials).
    allowed = {"z", "s", "u", "m", "o", "n", "<unk>", "<s>", "</s>"}
    for beam in (1, 2):
        out = translator.translate_batch([SRC], use_vmap=True, beam_size=beam)
        assert out[0].hypotheses[0]
        assert set(out[0].hypotheses[0]) <= allowed


def test_generator_return_alternatives(tmp_path):
    from ctranslate2_tpu import Generator
    from ctranslate2_tpu.converters.builder import build_decoder_only_model

    d = str(tmp_path / "gpt")
    build_decoder_only_model(d, vocab_size=32, num_layers=2, num_heads=4,
                             d_model=32, d_ff=64)
    g = Generator(d)
    out = g.generate_batch([["tok1", "tok2"]], num_hypotheses=3,
                           return_alternatives=True, max_length=6,
                           return_scores=True)
    assert len(out[0].sequences) == 3
    # All alternatives share the prompt prefix and differ at the expansion.
    firsts = [s[2] for s in out[0].sequences if len(s) > 2]
    assert len(set(firsts)) == len(firsts)
