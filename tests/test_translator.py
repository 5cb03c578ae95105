"""Translator API tests mirroring the reference's Python test surface
(reference: python/tests/test_translator.py)."""

import os

import pytest

from ctranslate2_tpu import Translator

SRC1 = ["آ", "ت", "ز", "م", "و", "ن"]
SRC2 = ["آ", "ت", "ش", "ي", "س", "و", "ن"]


@pytest.fixture(scope="module")
def translator():
    return Translator("/root/reference/tests/data/models/v2/aren-transliteration")


def test_source_factors(tmp_path):
    """Factored source input ('tok￨feat'): separator splitting, per-feature
    vocabularies, and the reference's error on missing features
    (reference: src/utils.cc:158-190, src/models/sequence_to_sequence.cc:
    144-166, python/tests/test_opennmt_py.py source-features case)."""
    import numpy as np

    from ctranslate2_tpu.converters.builder import build_seq2seq_model

    plain = build_seq2seq_model(str(tmp_path / "plain"), seed=7)
    fact = build_seq2seq_model(
        str(tmp_path / "fact"), seed=7, num_source_features=2,
        features_merge="add", zero_extra_features=True)
    t_plain = Translator(plain)
    t_fact = Translator(fact)
    src = [["tok4", "tok9", "tok17"], ["tok5", "tok11"]]

    with pytest.raises(ValueError, match="features"):
        t_fact.translate_batch(src)

    factored = [[f"{tok}￨tok{j % 8}" for j, tok in enumerate(ex)]
                for ex in src]
    r_fact = t_fact.translate_batch(factored, beam_size=2, return_scores=True)
    r_plain = t_plain.translate_batch(src, beam_size=2, return_scores=True)
    # A zeroed 'add' feature is numerically a no-op: outputs must match the
    # single-feature twin exactly.
    for a, b in zip(r_fact, r_plain):
        assert a.hypotheses == b.hypotheses
        np.testing.assert_allclose(a.scores, b.scores, atol=1e-4)

    # Concat-merge factored model runs end to end (greedy + beam).
    cat = build_seq2seq_model(str(tmp_path / "cat"), seed=7,
                              num_source_features=2,
                              features_merge="concat")
    t_cat = Translator(cat)
    for beam in (1, 2):
        out = t_cat.translate_batch(factored, beam_size=beam)
        assert len(out) == 2


def test_golden_matrix_all_versions_and_compute_types(any_tiny_model_path):
    """Golden beam-search outputs over every serialization version ×
    requested compute type, exercising quantize-on-load and
    dequantize-on-load (reference: tests/translator_test.cc:50-70
    parameterization)."""
    for compute_type in ("float32", "int8", "int16", "bfloat16"):
        t = Translator(any_tiny_model_path, compute_type=compute_type)
        res = t.translate_batch([SRC1, SRC2], beam_size=2)
        assert res[0].hypotheses[0] == list("atzmon"), compute_type
        assert res[1].hypotheses[0] == list("achison"), compute_type


@pytest.mark.parametrize("max_batch_size", [0, 1])
def test_batch_translation(translator, max_batch_size):
    output = translator.translate_batch(
        [SRC1, SRC2], max_batch_size=max_batch_size, return_scores=True)
    assert len(output) == 2
    assert output[0].hypotheses == [["a", "t", "z", "m", "o", "n"]]
    assert output[1].hypotheses == [["a", "c", "h", "i", "s", "o", "n"]]
    assert output[0].scores[0] < 0
    assert not output[0].attention


def test_batch_translation_tokens_batch_type(translator):
    output = translator.translate_batch(
        [SRC1, SRC2], max_batch_size=10, batch_type="tokens")
    assert output[0].hypotheses == [["a", "t", "z", "m", "o", "n"]]
    assert output[1].hypotheses == [["a", "c", "h", "i", "s", "o", "n"]]


def test_greedy(translator):
    output = translator.translate_batch([SRC1], beam_size=1)
    assert output[0].hypotheses[0][:6] == ["a", "t", "z", "m", "o", "n"]


def test_ignore_scores(translator):
    output = translator.translate_batch([SRC1], beam_size=1, return_scores=False)
    assert not output[0].scores


def test_empty_source(translator):
    output = translator.translate_batch([[], SRC1, []], return_scores=True)
    assert output[0].hypotheses == [[]]
    assert output[0].scores == [0.0]
    assert output[1].hypotheses == [["a", "t", "z", "m", "o", "n"]]
    assert output[2].hypotheses == [[]]


def test_target_prefix(translator):
    output = translator.translate_batch([SRC1], target_prefix=[["a", "t", "s"]])
    assert output[0].hypotheses[0][:3] == ["a", "t", "s"]


def test_num_hypotheses(translator):
    output = translator.translate_batch([SRC1], beam_size=4, num_hypotheses=4)
    assert len(output[0].hypotheses) == 4


def test_max_decoding_length(translator):
    output = translator.translate_batch([SRC1], max_decoding_length=2)
    assert len(output[0].hypotheses[0]) <= 2


def test_min_decoding_length(translator):
    output = translator.translate_batch([SRC1], min_decoding_length=7)
    assert len(output[0].hypotheses[0]) >= 7


def test_return_attention(translator):
    output = translator.translate_batch([SRC1], return_attention=True)
    attention = output[0].attention[0]
    assert len(attention) == 6
    for vector in attention:
        assert len(vector) == 6
        assert all(isinstance(v, float) for v in vector)


def test_invalid_decoding_lengths(translator):
    with pytest.raises(ValueError):
        translator.translate_batch([SRC1], min_decoding_length=10,
                                   max_decoding_length=5)


def test_async(translator):
    output = translator.translate_batch([SRC1], asynchronous=True)
    assert output[0].result().hypotheses == [["a", "t", "z", "m", "o", "n"]]
    assert output[0].done()


def test_score_batch(translator):
    output = translator.score_batch([SRC1], [["a", "t", "z", "m", "o", "n"]])
    r = output[0]
    assert r.tokens == ["a", "t", "z", "m", "o", "n", "</s>"]
    assert len(r.tokens_score) == 7
    assert all(s <= 0 for s in r.tokens_score)
    assert -5 < r.normalized_score() < 0


def test_file_translation(translator, tmp_path):
    input_path = str(tmp_path / "input.txt")
    output_path = str(tmp_path / "output.txt")
    with open(input_path, "w", encoding="utf-8") as f:
        f.write("آ ت ز م و ن\n")
        f.write("آ ت ش ي س و ن\n")
    stats = translator.translate_file(input_path, output_path)
    with open(output_path, encoding="utf-8") as f:
        lines = f.readlines()
    assert lines[0].strip() == "a t z m o n"
    assert lines[1].strip() == "a c h i s o n"
    assert stats.num_tokens == 13
    assert stats.num_examples == 2


def test_random_sampling_multiple_hypotheses(translator):
    output = translator.translate_batch(
        [SRC1], beam_size=1, sampling_topk=20, num_hypotheses=3,
        return_scores=True)
    assert len(output[0].hypotheses) == 3
    # Scores sorted descending.
    scores = output[0].scores
    assert scores == sorted(scores, reverse=True)


def test_repetition_penalty_runs(translator):
    output = translator.translate_batch([SRC1], repetition_penalty=1.5)
    assert output[0].hypotheses[0]


def test_no_repeat_ngram_runs(translator):
    output = translator.translate_batch([SRC1], no_repeat_ngram_size=2)
    assert output[0].hypotheses[0]


def test_callback_streaming(translator):
    tokens = []

    def callback(step_result):
        tokens.append(step_result.token)
        return False

    translator.translate_batch([SRC1], beam_size=1, callback=callback)
    assert tokens[:6] == ["a", "t", "z", "m", "o", "n"]


# ---------------------------------------------------------------------------
# Merged self+cross attention (T5Gemma2 layout,
# reference: src/layers/attention.cc:625-796).
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def merged_model_dir(tmp_path_factory):
    from ctranslate2_tpu.converters.builder import build_seq2seq_model

    d = str(tmp_path_factory.mktemp("merged"))
    build_seq2seq_model(d, merged_attention=True)
    return d


def test_merged_attention_translates(merged_model_dir):
    from ctranslate2_tpu import Translator

    t = Translator(merged_model_dir)
    res = t.translate_batch([["tok5", "tok6", "tok7"]], beam_size=2,
                            max_decoding_length=6, return_scores=True)
    assert res[0].hypotheses[0] is not None
    res_g = t.translate_batch([["tok5", "tok6", "tok7"]], beam_size=1,
                              max_decoding_length=6)
    assert res_g[0].hypotheses[0] is not None


def test_merged_attention_step_vs_sequence(merged_model_dir):
    """Iterative cached decode equals the teacher-forced sequence pass
    (the reference asserts the same equivalence: tests/model_test.cc:59-151).
    """
    import numpy as np
    import jax.numpy as jnp

    from ctranslate2_tpu.models import transformer as T
    from ctranslate2_tpu.models.loader import load_model
    from ctranslate2_tpu.ops import attention as attn_ops

    m = load_model(merged_model_dir, compute_type="float32")
    src = jnp.asarray([[5, 9, 12, 30]], jnp.int32)
    lengths = jnp.full((1,), 4, jnp.int32)
    memory = T.encoder_forward_jit(m.arch, m.params, m.consts, src, lengths,
                                   quantize_acts=False, out_dtype=jnp.float32)
    mem_kv = T.precompute_memory_jit(m.arch, m.params, memory,
                                     quantize_acts=False)
    mem_bias = attn_ops.length_mask_bias(lengths, src.shape[1])

    tgt = jnp.asarray([[1, 5, 8, 11]], jnp.int32)
    seq_logits, _, _ = T.decoder_forward_jit(
        m.arch, m.params, m.consts, tgt, jnp.int32(0), None, mem_kv, mem_bias,
        lengths=jnp.full((1,), 4, jnp.int32),
        quantize_acts=False, out_dtype=jnp.float32)

    cache = T.init_self_cache(m.arch, 1, 8)
    step_logits = []
    for t_idx in range(4):
        lg, cache, _ = T.decoder_forward_jit(
            m.arch, m.params, m.consts, tgt[:, t_idx:t_idx + 1],
            jnp.int32(t_idx), cache, mem_kv, mem_bias,
            quantize_acts=False, out_dtype=jnp.float32)
        step_logits.append(np.asarray(lg[:, 0]))

    np.testing.assert_allclose(
        np.stack(step_logits, axis=1), np.asarray(seq_logits),
        rtol=1e-4, atol=1e-4)


def test_score_file(translator, tmp_path):
    src = tmp_path / "src.txt"
    tgt = tmp_path / "tgt.txt"
    out = tmp_path / "scores.txt"
    src.write_text(" ".join(SRC1) + "\n" + " ".join(SRC2) + "\n")
    tgt.write_text("a t z m o n\na t c h i s o n\n")
    stats = translator.score_file(str(src), str(tgt), str(out))
    assert stats.num_examples == 2
    lines = out.read_text().splitlines()
    assert len(lines) == 2
    assert "|||" in lines[0]
    float(lines[0].split("|||")[0])  # parseable mean score


def test_unload_reload(translator):
    ref = translator.translate_batch([SRC1])[0].hypotheses[0]
    translator.unload_model(to_cpu=True)
    assert not translator.model_is_loaded
    translator.load_model()
    assert translator.model_is_loaded
    assert translator.translate_batch([SRC1])[0].hypotheses[0] == ref


def test_beam_chain_equals_gather(tmp_path, monkeypatch):
    """Chain-mask beam attention (no physical cache reorder) must produce
    exactly the gather implementation's hypotheses and scores."""
    import numpy as np
    from ctranslate2_tpu.converters.builder import build_seq2seq_model

    d = build_seq2seq_model(str(tmp_path / "chain"), seed=3)

    def run():
        t = Translator(d)
        r = t.translate_batch([["tok5", "tok6", "tok7"], ["tok9"]],
                              beam_size=4, max_decoding_length=10,
                              num_hypotheses=2, return_scores=True)
        return ([h for x in r for h in x.hypotheses],
                [s for x in r for s in x.scores])

    monkeypatch.setenv("CT2TPU_BEAM_CHAIN", "0")
    hyp_a, sc_a = run()
    monkeypatch.setenv("CT2TPU_BEAM_CHAIN", "1")
    hyp_b, sc_b = run()
    assert hyp_a == hyp_b
    assert np.allclose(sc_a, sc_b, atol=1e-4)


def test_return_logits_vocab(tiny_model_path):
    import numpy as np
    import ctranslate2_tpu

    t = ctranslate2_tpu.Translator(tiny_model_path)
    src = [["آ", "ت", "ز", "م", "و", "ن"]]

    # Greedy: one logits vector per decoded step.
    r = t.translate_batch(src, beam_size=1, return_logits_vocab=True)[0]
    assert len(r.logits) == 1
    steps = r.logits[0]
    assert len(steps) >= len(r.hypotheses[0])  # includes the EOS step
    v = np.asarray(steps[0])
    assert v.ndim == 1 and v.shape[0] > 20  # full vocab
    # The argmax of each step's logits reproduces the greedy tokens.
    ref = t.translate_batch(src, beam_size=1)[0]
    toks = [int(np.argmax(np.asarray(s))) for s in steps[:len(ref.hypotheses[0])]]
    got = [t._target_vocab.to_id(x) for x in ref.hypotheses[0]]
    assert toks == got

    # Beam: finishing-step logits per hypothesis (reference semantics).
    r = t.translate_batch(src, beam_size=4, num_hypotheses=2,
                          return_logits_vocab=True)[0]
    assert len(r.logits) == 2
    assert all(len(h) == 1 for h in r.logits)
    assert np.asarray(r.logits[0][0]).shape == v.shape

    # Off by default.
    r = t.translate_batch(src, beam_size=1)[0]
    assert r.logits == []


@pytest.mark.parametrize("beam_size", [1, 2])
def test_strongly_biased_target_prefix(translator, beam_size):
    # Reference: python/tests/test_translator.py test_strongly_biased_target_prefix.
    output = translator.translate_batch(
        [SRC1, SRC2],
        target_prefix=[["a", "t", "s"], None],
        beam_size=beam_size,
        prefix_bias_beta=0.9999999,
    )
    assert output[0].hypotheses[0][:3] == ["a", "t", "s"]
    assert output[1].hypotheses[0] == ["a", "c", "h", "i", "s", "o", "n"]


@pytest.mark.parametrize("beam_size", [1, 2])
def test_weakly_biased_target_prefix(translator, beam_size):
    # Reference: python/tests/test_translator.py test_weakly_biased_target_prefix.
    unconstrained = translator.translate_batch(
        [SRC1, SRC2], beam_size=beam_size, return_scores=True)
    weakly_biased = translator.translate_batch(
        [SRC1, SRC2],
        target_prefix=[["a", "t", "s"], ["s", "i", "o"]],
        beam_size=beam_size,
        prefix_bias_beta=0.0000001,
        return_scores=True,
    )
    for u, w in zip(unconstrained, weakly_biased):
        assert u.hypotheses[0] == w.hypotheses[0]
        assert abs(u.scores[0] - w.scores[0]) < 0.00001


def test_biased_decoding_validation(translator):
    with pytest.raises(ValueError):
        translator.translate_batch(
            [SRC1], target_prefix=[["a"]], prefix_bias_beta=1.0)
    with pytest.raises(ValueError):
        translator.translate_batch(
            [SRC1], target_prefix=[["a"]], prefix_bias_beta=0.5,
            return_alternatives=True, num_hypotheses=2)
