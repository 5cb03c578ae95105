"""Lossless self-speculation in the batch generate_batch device loop
(VERDICT r2 item 5): prompt-lookup drafts verified in T=K chunks must be
token- and score-identical to plain greedy. The reference GPU decode has
no such lever (one token per step, reference: src/decoding.cc:732-974).
"""

import pytest

from ctranslate2_tpu import Generator
from ctranslate2_tpu.converters.builder import build_decoder_only_model

PROMPTS = [["tok1", "tok2"], ["tok3"], ["tok4", "tok5", "tok6", "tok7"]]


@pytest.fixture(scope="module")
def llama_gen(tmp_path_factory):
    d = tmp_path_factory.mktemp("specbatch")
    return Generator(build_decoder_only_model(
        str(d / "m"), vocab_size=64, num_layers=2, num_heads=8,
        num_heads_kv=4, d_model=64, d_ff=128, rotary_dim=8, glu=True,
        rms_norm=True, activation="swish"))


@pytest.mark.parametrize("spec_k", [2, 4, 6])
@pytest.mark.parametrize("include_prompt", [True, False])
def test_speculation_matches_greedy(llama_gen, spec_k, include_prompt):
    ref = llama_gen.generate_batch(
        PROMPTS, max_length=16, include_prompt_in_result=include_prompt,
        return_scores=True)
    spec = llama_gen.generate_batch(
        PROMPTS, max_length=16, include_prompt_in_result=include_prompt,
        return_scores=True, speculation_k=spec_k)
    for r, s in zip(ref, spec):
        assert r.sequences_ids == s.sequences_ids
        assert r.scores[0] == pytest.approx(s.scores[0], abs=1e-4)


def test_speculation_min_length(llama_gen):
    ref = llama_gen.generate_batch(PROMPTS, max_length=12, min_length=6)
    spec = llama_gen.generate_batch(PROMPTS, max_length=12, min_length=6,
                                    speculation_k=4)
    for r, s in zip(ref, spec):
        assert r.sequences_ids == s.sequences_ids


def test_speculation_static_prompt(llama_gen):
    ref = llama_gen.generate_batch(
        PROMPTS, max_length=16, static_prompt=["tok9", "tok8"])
    spec = llama_gen.generate_batch(
        PROMPTS, max_length=16, static_prompt=["tok9", "tok8"],
        speculation_k=4)
    for r, s in zip(ref, spec):
        assert r.sequences_ids == s.sequences_ids


def test_speculation_int8_and_int8_kv(tmp_path, monkeypatch):
    d = build_decoder_only_model(
        str(tmp_path / "i8"), quantization="int8", rotary_dim=8,
        num_heads=8, num_heads_kv=4, d_model=64, d_ff=128, glu=True,
        rms_norm=True)
    g = Generator(d)
    ref = g.generate_batch(PROMPTS, max_length=16)
    spec = g.generate_batch(PROMPTS, max_length=16, speculation_k=4)
    for r, s in zip(ref, spec):
        assert r.sequences_ids == s.sequences_ids

    monkeypatch.setenv("CT2TPU_KV_CACHE", "int8")
    g2 = Generator(d)
    ref = g2.generate_batch(PROMPTS, max_length=16)
    spec = g2.generate_batch(PROMPTS, max_length=16, speculation_k=4)
    for r, s in zip(ref, spec):
        assert r.sequences_ids == s.sequences_ids


def test_speculation_windowed_ring(tmp_path):
    d = build_decoder_only_model(
        str(tmp_path / "win"), sliding_window=16, rotary_dim=8,
        num_heads=8, num_heads_kv=4, d_model=64, d_ff=128, glu=True,
        rms_norm=True)
    g = Generator(d)
    ref = g.generate_batch(PROMPTS, max_length=20)
    spec = g.generate_batch(PROMPTS, max_length=20, speculation_k=4)
    for r, s in zip(ref, spec):
        assert r.sequences_ids == s.sequences_ids
    # spec_k above the smallest window is rejected.
    with pytest.raises(ValueError, match="sliding window"):
        g.generate_batch(PROMPTS, max_length=8, speculation_k=32)


def test_speculation_validation(llama_gen):
    with pytest.raises(ValueError, match="beam_size"):
        llama_gen.generate_batch(PROMPTS, beam_size=2, speculation_k=4)
    with pytest.raises(NotImplementedError, match="greedy"):
        llama_gen.generate_batch(PROMPTS, sampling_topk=5, speculation_k=4)
    with pytest.raises(NotImplementedError, match="ContinuousBatcher"):
        llama_gen.generate_batch(PROMPTS, no_repeat_ngram_size=2,
                                 speculation_k=4)
    with pytest.raises(ValueError, match="callback"):
        llama_gen.generate_batch(PROMPTS, callback=lambda r: None,
                                 speculation_k=4)
