"""OpenNMT-tf and eole converter tests.

Neither framework is installed here (as in many reference CI jobs), so:
- eole: the spec builder works from a plain state dict + config
  namespace and is tested directly;
- OpenNMT-tf: a minimal mock `opennmt`/layer-object structure exercises
  the live-model traversal.
Converted models are loaded and run end to end."""

import sys
import types

import numpy as np
import pytest

from ctranslate2_tpu import Generator, Translator
from ctranslate2_tpu.models.loader import load_model

RNG = np.random.RandomState(7)
D = 32
HEADS = 4
FF = 64
VOCAB = 32


def _w(*shape):
    return (RNG.standard_normal(shape) * 0.08).astype(np.float32)


def _vocab_tokens():
    toks = ["<blank>", "<s>", "</s>", "<unk>"]
    toks += [f"w{i}" for i in range(VOCAB - len(toks))]
    return toks


# ----------------------------------------------------------------------
# eole
# ----------------------------------------------------------------------


def _eole_state_dict(decoder_only, layers=2, glu=False, rms=False,
                     rotary=False):
    v = {}

    def add_side(side, prefix_emb):
        v[f"{prefix_emb}.embeddings.weight"] = _w(VOCAB, D)
        if not rotary:
            pe = np.zeros((1, 128, D), np.float32)
            pe[0] = _w(128, D)
            v[f"{prefix_emb}.pe.pe"] = pe
        v[f"{side}.layer_norm.weight"] = 1 + 0.1 * _w(D)
        if not rms:
            v[f"{side}.layer_norm.bias"] = 0.05 * _w(D)
        for i in range(layers):
            p = f"{side}.transformer_layers.{i}"
            for lin in ("linear_query", "linear_keys", "linear_values"):
                v[f"{p}.self_attn.{lin}.weight"] = _w(D, D)
            v[f"{p}.self_attn.final_linear.weight"] = _w(D, D)
            v[f"{p}.input_layernorm.weight"] = 1 + 0.1 * _w(D)
            v[f"{p}.post_attention_layernorm.weight"] = 1 + 0.1 * _w(D)
            if not rms:
                v[f"{p}.input_layernorm.bias"] = 0.05 * _w(D)
                v[f"{p}.post_attention_layernorm.bias"] = 0.05 * _w(D)
            if side == "decoder" and not decoder_only:
                for lin in ("linear_query", "linear_keys", "linear_values"):
                    v[f"{p}.context_attn.{lin}.weight"] = _w(D, D)
                v[f"{p}.context_attn.final_linear.weight"] = _w(D, D)
                v[f"{p}.precontext_layernorm.weight"] = 1 + 0.1 * _w(D)
                if not rms:
                    v[f"{p}.precontext_layernorm.bias"] = 0.05 * _w(D)
            v[f"{p}.mlp.gate_up_proj.weight"] = _w(FF, D)
            if glu:
                v[f"{p}.mlp.up_proj.weight"] = _w(FF, D)
            v[f"{p}.mlp.down_proj.weight"] = _w(D, FF)

    if not decoder_only:
        add_side("encoder", "src_emb")
    add_side("decoder", "tgt_emb")
    v["generator.weight"] = _w(VOCAB, D)
    return v


def _eole_config(decoder_only, layers=2, glu=False, rms=False, rotary=False):
    ns = types.SimpleNamespace
    return ns(
        decoder=ns(layers=layers, heads=HEADS, heads_kv=0,
                   decoder_type="transformer_lm" if decoder_only
                   else "transformer",
                   lambda_align=0),
        encoder=None if decoder_only else ns(layers=layers),
        embeddings=ns(position_encoding_type="Rotary" if rotary else None),
        mlp_activation_fn="gated-silu" if glu else "relu",
        layer_norm="rms" if rms else "standard",
        sliding_window=0,
        rope_config=ns(rotary_interleave=False),
    )


def _save_eole(b, out, decoder_only):
    import json
    import os

    b.save(out, config={"unk_token": "<unk>", "bos_token": "<s>",
                        "eos_token": "</s>",
                        **({} if decoder_only
                           else {"decoder_start_token": "<s>"})})
    toks = _vocab_tokens()
    if decoder_only:
        names = ["vocabulary.json"]
    else:
        names = ["source_vocabulary.json", "target_vocabulary.json"]
    for n in names:
        with open(os.path.join(out, n), "w") as f:
            json.dump(toks, f)


def test_eole_seq2seq(tmp_path):
    from ctranslate2_tpu.converters.eole_conv import build_from_state_dict

    cfg = _eole_config(decoder_only=False)
    b = build_from_state_dict(cfg, _eole_state_dict(False),
                              decoder_only=False)
    out = str(tmp_path / "eole_s2s")
    _save_eole(b, out, decoder_only=False)

    t = Translator(out)
    r = t.translate_batch([["w1", "w2", "w3"]], beam_size=2,
                          max_decoding_length=6)[0]
    assert isinstance(r.hypotheses[0], list)


def test_eole_lm_rotary_glu_rms(tmp_path):
    from ctranslate2_tpu.converters.eole_conv import build_from_state_dict

    cfg = _eole_config(decoder_only=True, glu=True, rms=True, rotary=True)
    b = build_from_state_dict(
        cfg, _eole_state_dict(True, glu=True, rms=True, rotary=True),
        decoder_only=True)
    out = str(tmp_path / "eole_lm")
    _save_eole(b, out, decoder_only=True)

    m = load_model(out)
    spec = m.arch.decoder
    assert spec.layers[0].ffn.glu
    assert spec.layers[0].self_attention.rotary is not None
    g = Generator(out)
    r = g.generate_batch([["w1", "w2"]], max_length=6,
                         include_prompt_in_result=False)[0]
    assert len(r.sequences_ids[0]) <= 6


def test_eole_rejects_unsupported():
    from ctranslate2_tpu.converters.eole_conv import build_from_state_dict

    cfg = _eole_config(decoder_only=False, rotary=True)
    with pytest.raises(ValueError, match="Rotary"):
        build_from_state_dict(cfg, {}, decoder_only=False)


# ----------------------------------------------------------------------
# OpenNMT-tf (mock opennmt + tf-like variable objects)
# ----------------------------------------------------------------------


class _TFVar:
    def __init__(self, a):
        self._a = np.asarray(a, np.float32)

    def numpy(self):
        return self._a


class _TFLinear:
    def __init__(self, out_d, in_d, bias=True):
        # OpenNMT-tf Dense kernels are [in, out] with transpose=False.
        self.kernel = _TFVar(_w(in_d, out_d))
        self.transpose = False
        self.bias = _TFVar(_w(out_d)) if bias else None


class _TFNorm:
    def __init__(self, d):
        self.gamma = _TFVar(1 + 0.1 * _w(d))
        self.beta = _TFVar(0.05 * _w(d))


class _TFWrapped:
    """TransformerLayerWrapper: pre-norm => input_layer_norm set."""

    def __init__(self, layer, d):
        self.layer = layer
        self.input_layer_norm = _TFNorm(d)
        self.output_layer_norm = None


class _TFMHA:
    def __init__(self, d, heads, rel=False):
        self.num_heads = heads
        self.linear_queries = _TFLinear(d, d)
        self.linear_keys = _TFLinear(d, d)
        self.linear_values = _TFLinear(d, d)
        self.linear_output = _TFLinear(d, d)
        self.maximum_relative_position = 8 if rel else None
        if rel:
            self.relative_position_keys = _TFVar(_w(17, d // heads))
            self.relative_position_values = _TFVar(_w(17, d // heads))


class _TFFFNInner:
    def __init__(self, d, ff):
        self.inner = _TFLinear(ff, d)
        self.outer = _TFLinear(d, ff)
        self.inner.activation = None


class _TFLayer:
    def __init__(self, d, heads, ff, cross=False):
        self.self_attention = _TFWrapped(_TFMHA(d, heads), d)
        inner = _TFFFNInner(d, ff)

        def relu():
            pass

        inner.inner.activation = relu
        self.ffn = _TFWrapped(inner, d)
        self.attention = [_TFWrapped(_TFMHA(d, heads), d)] if cross else []


@pytest.fixture
def mock_opennmt(monkeypatch):
    onmt = types.ModuleType("opennmt")

    class WordEmbedder:
        def __init__(self, vocab):
            self.embedding = _TFVar(_w(VOCAB, D))
            self.vocabulary_file = vocab
            self.mark_start = True
            self.mark_end = True

    class ParallelInputter:
        pass

    class MultiInputter:
        pass

    class Transformer:
        pass

    class LanguageModel:
        pass

    class SelfAttentionEncoder:
        pass

    class SelfAttentionDecoder:
        pass

    class PositionEmbedder:
        def __init__(self):
            self.embedding = _TFVar(_w(129, D))

    class MHAReduction:
        AVERAGE_ALL_LAYERS = 0
        AVERAGE_LAST_LAYER = 1
        FIRST_HEAD_LAST_LAYER = 2

    class ConcatReducer:
        pass

    class SumReducer:
        pass

    class Vocab:
        def __init__(self, words):
            self.words = words

        @classmethod
        def from_file(cls, path):
            return cls(_vocab_tokens()[:-1])  # without <unk> -> appended

    onmt.models = types.SimpleNamespace(
        Transformer=Transformer, LanguageModel=LanguageModel)
    onmt.encoders = types.SimpleNamespace(
        SelfAttentionEncoder=SelfAttentionEncoder)
    onmt.decoders = types.SimpleNamespace(
        SelfAttentionDecoder=SelfAttentionDecoder)
    onmt.inputters = types.SimpleNamespace(
        WordEmbedder=WordEmbedder, ParallelInputter=ParallelInputter,
        MultiInputter=MultiInputter)
    onmt.layers = types.SimpleNamespace(
        MultiHeadAttentionReduction=MHAReduction,
        ConcatReducer=ConcatReducer, SumReducer=SumReducer,
        PositionEmbedder=PositionEmbedder)
    onmt.data = types.SimpleNamespace(Vocab=Vocab)
    monkeypatch.setitem(sys.modules, "opennmt", onmt)
    return onmt


def test_opennmt_tf_seq2seq(mock_opennmt, tmp_path):
    from ctranslate2_tpu.converters.opennmt_tf_conv import OpenNMTTFConverter

    onmt = mock_opennmt
    layers = 2

    class Encoder(onmt.encoders.SelfAttentionEncoder):
        def __init__(self):
            self.layers = [_TFLayer(D, HEADS, FF) for _ in range(layers)]
            self.position_encoder = onmt.layers.PositionEmbedder()
            self.layer_norm = _TFNorm(D)

    class Decoder:
        def __init__(self):
            self.layers = [_TFLayer(D, HEADS, FF, cross=True)
                           for _ in range(layers)]
            self.position_encoder = onmt.layers.PositionEmbedder()
            self.layer_norm = _TFNorm(D)
            self.output_layer = _TFLinear(VOCAB, D)
            self.attention_reduction = \
                onmt.layers.MultiHeadAttentionReduction.FIRST_HEAD_LAST_LAYER

    class Model(onmt.models.Transformer):
        def __init__(self):
            self.encoder = Encoder()
            self.decoder = Decoder()
            self.features_inputter = onmt.inputters.WordEmbedder("src.vocab")
            self.labels_inputter = onmt.inputters.WordEmbedder("tgt.vocab")

    out = str(tmp_path / "onmt_tf")
    OpenNMTTFConverter(Model()).convert(out, force=True)

    m = load_model(out)
    assert m.is_sequence_to_sequence
    assert m.config["add_source_bos"] and m.config["add_source_eos"]
    t = Translator(out)
    r = t.translate_batch([["w1", "w2", "w3"]], beam_size=2,
                          max_decoding_length=6)[0]
    assert isinstance(r.hypotheses[0], list)


def test_opennmt_tf_language_model(mock_opennmt, tmp_path):
    from ctranslate2_tpu.converters.opennmt_tf_conv import OpenNMTTFConverter

    onmt = mock_opennmt

    class Decoder(onmt.decoders.SelfAttentionDecoder):
        def __init__(self):
            self.layers = [_TFLayer(D, HEADS, FF) for _ in range(2)]
            self.position_encoder = onmt.layers.PositionEmbedder()
            self.layer_norm = _TFNorm(D)
            self.output_layer = _TFLinear(VOCAB, D)

    class Model(onmt.models.LanguageModel):
        def __init__(self):
            self.decoder = Decoder()
            self.features_inputter = onmt.inputters.WordEmbedder("vocab")

    out = str(tmp_path / "onmt_tf_lm")
    OpenNMTTFConverter(Model()).convert(out, force=True)
    g = Generator(out)
    r = g.generate_batch([["w1", "w2"]], max_length=6,
                         include_prompt_in_result=False)[0]
    assert len(r.sequences_ids[0]) <= 6
