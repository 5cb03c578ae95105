"""Generator API tests on fabricated tiny decoder-only models."""

import numpy as np
import pytest

from ctranslate2_tpu import Generator
from ctranslate2_tpu.converters.builder import build_decoder_only_model


@pytest.fixture(scope="module")
def gpt_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("gpt"))
    build_decoder_only_model(d, vocab_size=32, num_layers=2, num_heads=4,
                             d_model=32, d_ff=64)
    return d


@pytest.fixture(scope="module")
def generator(gpt_dir):
    return Generator(gpt_dir)


def test_generate_basic(generator):
    out = generator.generate_batch([["tok1", "tok2"]], max_length=8,
                                   return_scores=True)
    assert len(out) == 1
    assert out[0].sequences
    # include_prompt_in_result=True by default: output starts with the prompt.
    assert out[0].sequences[0][:2] == ["tok1", "tok2"]
    assert out[0].sequences_ids[0] == [
        generator._vocab.to_id(t) for t in out[0].sequences[0]]


def test_generate_without_prompt_in_result(generator):
    out = generator.generate_batch([["tok1", "tok2", "tok3"]],
                                   max_length=6,
                                   include_prompt_in_result=False)
    seq = out[0].sequences[0]
    assert len(seq) <= 6


def test_generate_ragged_batch(generator):
    out = generator.generate_batch(
        [["tok1"], ["tok1", "tok2", "tok3"]],
        max_length=5, include_prompt_in_result=False)
    assert len(out) == 2


def test_prompt_consistency(generator):
    """Prefilled prompt must give the same continuation as step-by-step."""
    a = generator.generate_batch([["tok1", "tok2", "tok3"]], max_length=5)
    b = generator.generate_batch([["tok1", "tok2", "tok3"]], max_length=5,
                                 include_prompt_in_result=False)
    # a includes the prompt; strip it to compare continuations.
    cont_a = a[0].sequences[0][3:]
    cont_b = b[0].sequences[0]
    assert cont_a[: len(cont_b)] == cont_b[: len(cont_a)]


def test_static_prompt(generator):
    out1 = generator.generate_batch([["tok3"]], static_prompt=["tok1", "tok2"],
                                    max_length=5)
    # Cached second call must return the same result.
    out2 = generator.generate_batch([["tok3"]], static_prompt=["tok1", "tok2"],
                                    max_length=5)
    assert out1[0].sequences == out2[0].sequences
    # And must match the explicit full prompt continuation.
    full = generator.generate_batch([["tok1", "tok2", "tok3"]], max_length=5,
                                    include_prompt_in_result=False)
    with_static = generator.generate_batch(
        [["tok3"]], static_prompt=["tok1", "tok2"], max_length=5,
        include_prompt_in_result=False)
    assert full[0].sequences == with_static[0].sequences


def test_beam_generation(generator):
    out = generator.generate_batch([["tok1", "tok2"]], beam_size=3,
                                   num_hypotheses=2, max_length=6,
                                   return_scores=True)
    assert len(out[0].sequences) == 2
    assert out[0].scores[0] >= out[0].scores[1]


def test_score_batch(generator):
    out = generator.score_batch([["tok1", "tok2", "tok3", "tok4"]])
    r = out[0]
    assert r.tokens == ["tok2", "tok3", "tok4"]
    assert len(r.tokens_score) == 3


def test_score_matches_generate_scores(generator):
    """Greedy generation scores must equal teacher-forced scores of the
    generated sequence (no logits processors active so distributions match)."""
    gen = generator.generate_batch(
        [["tok1"]], max_length=4, return_scores=True,
        return_end_token=True, include_prompt_in_result=True)
    seq = gen[0].sequences[0]
    score = generator.score_batch([seq])[0]
    # Generation cumulative score == sum of token scores (up to length norm).
    gen_score = gen[0].scores[0] * len(gen[0].sequences_ids[0][1:])
    assert np.isclose(gen_score, sum(score.tokens_score), atol=1e-3)


def test_sampling_determinism(gpt_dir):
    g = Generator(gpt_dir)
    a = g.generate_batch([["tok1"]], sampling_topk=10, max_length=6, seed=7)
    b = g.generate_batch([["tok1"]], sampling_topk=10, max_length=6, seed=7)
    c = g.generate_batch([["tok1"]], sampling_topk=10, max_length=6, seed=8)
    assert a[0].sequences == b[0].sequences
    assert a != c or True  # different seed may still coincide


def test_forward_batch(generator):
    out = generator.forward_batch([["tok1", "tok2", "tok3"]])
    assert out.shape[0] == 1
    assert out.shape[-1] == 32
    # Ids and array inputs match the token-string variant (the reference's
    # BatchTokens/BatchIds/StorageView overloads, generator.cc:99-115).
    import numpy as np

    ids = [[generator._vocab.to_id(t) for t in ["tok1", "tok2", "tok3"]]]
    np.testing.assert_array_equal(
        np.asarray(generator.forward_batch(ids), np.float32),
        np.asarray(out, np.float32))
    np.testing.assert_array_equal(
        np.asarray(generator.forward_batch(np.asarray(ids, np.int32)),
                   np.float32),
        np.asarray(out, np.float32))
    # A padded dense array with explicit lengths scores like the ragged
    # batch (pads must not be attended as real tokens).
    padded = np.zeros((1, 6), np.int32)
    padded[0, :3] = ids[0]
    out_len = generator.forward_batch(padded, lengths=[3])
    np.testing.assert_array_equal(
        np.asarray(out_len, np.float32), np.asarray(out, np.float32))


@pytest.mark.parametrize("kwargs", [
    dict(num_heads_kv=2),              # GQA
    dict(num_heads_kv=1),              # MQA
    dict(rotary_dim=0),                # RoPE full-dim
    dict(glu=True, rms_norm=True, activation="swish"),  # Llama-style
    dict(alibi=True),                  # ALiBi
    dict(parallel_residual=True, shared_layer_norm=True),   # GPT-J
    dict(parallel_residual=True, shared_layer_norm=False),  # GPT-NeoX
    dict(sliding_window=8, rotary_dim=0),  # Mistral-style
    dict(quantization="int8"),
])
def test_architecture_variants(tmp_path, kwargs):
    d = str(tmp_path)
    build_decoder_only_model(d, vocab_size=32, num_layers=2, num_heads=4,
                             d_model=32, d_ff=64, **kwargs)
    g = Generator(d)
    out = g.generate_batch([["tok1", "tok2"]], max_length=6)
    assert out[0].sequences[0]

    # Cached decode must match full-sequence forward argmax continuation.
    import jax.numpy as jnp
    ids = out[0].sequences_ids[0]
    if len(ids) >= 3:
        logits = g.forward_batch([[g._vocab.to_token(i) for i in ids[:-1]]])
        nxt = int(jnp.argmax(logits[0, len(ids) - 2]))
        assert nxt == ids[-1]


def test_beam_with_random_sampling(generator):
    """Beam search + random sampling = Gumbel-max draws
    (reference: src/sampling.cc:60-92)."""
    import ctranslate2_tpu

    outs = []
    for seed in (1, 2):
        ctranslate2_tpu.set_random_seed(seed)
        out = generator.generate_batch(
            [["tok1", "tok2"]], max_length=8, beam_size=2,
            sampling_topk=10, sampling_temperature=2.0)
        outs.append(tuple(out[0].sequences[0]))
        assert len(out[0].sequences[0]) >= 2
    # High-temperature sampling with different seeds should diverge.
    assert outs[0] != outs[1] or len(outs[0]) <= 3


def test_int8_kv_cache(gpt_dir, monkeypatch):
    """INT8 KV cache (CT2TPU_KV_CACHE=int8) tracks the float-cache output
    (SURVEY kernel #4; quantized-cache decode)."""
    import ctranslate2_tpu
    from ctranslate2_tpu import Generator

    ref = Generator(gpt_dir).generate_batch(
        [["tok1", "tok2"]], max_length=8)[0].sequences[0]
    monkeypatch.setenv("CT2TPU_KV_CACHE", "int8")
    out = Generator(gpt_dir).generate_batch(
        [["tok1", "tok2"]], max_length=8)[0].sequences[0]
    # 8-bit per-vector quantization: greedy argmax chain should match on a
    # tiny random model.
    assert out == ref


def test_generate_return_logits_vocab(generator):
    import numpy as np

    r = generator.generate_batch([["tok3", "tok4"]], max_length=5,
                                 include_prompt_in_result=False,
                                 return_logits_vocab=True)[0]
    assert len(r.logits) == 1
    assert len(r.logits[0]) >= len(r.sequences_ids[0])
    step0 = np.asarray(r.logits[0][0])
    assert step0.ndim == 1 and step0.shape[0] == 32
    # Greedy argmax chain must reproduce the generated ids.
    plain = generator.generate_batch([["tok3", "tok4"]], max_length=5,
                                     include_prompt_in_result=False)[0]
    toks = [int(np.argmax(np.asarray(s)))
            for s in r.logits[0][:len(plain.sequences_ids[0])]]
    assert toks == plain.sequences_ids[0]
