"""Marian / OPUS-MT / OpenNMT-py / Fairseq converter tests on fabricated
checkpoints (the reference ships equivalent converters:
python/ctranslate2/converters/{marian,opus_mt,opennmt_py,fairseq}.py)."""

import os

import numpy as np
import pytest

from ctranslate2_tpu import Translator, Generator
from ctranslate2_tpu.models.loader import load_model

D, H, FF, V, LAYERS = 16, 2, 32, 32, 2


def _r(rng, *shape):
    return (rng.standard_normal(shape) * 0.1).astype(np.float32)


# ---------------------------------------------------------------------------
# Marian
# ---------------------------------------------------------------------------


def _make_marian_npz(path, rng):
    import yaml

    config = {
        "type": "transformer",
        "transformer-decoder-autoreg": "self-attention",
        "transformer-no-projection": False,
        "transformer-ffn-activation": "relu",
        "transformer-preprocess": "",
        "transformer-postprocess": "dan",
        "transformer-postprocess-emb": "d",
        "transformer-heads": H,
        "enc-depth": LAYERS,
        "dec-depth": LAYERS,
        "transformer-guided-alignment-layer": "last",
    }
    arrays = {
        "special:model.yml": np.frombuffer(
            yaml.dump(config).encode() + b"\x00", dtype=np.int8),
        "Wemb": _r(rng, V, D),
    }

    def add_attn(scope):
        for n in "qkvo":
            arrays[f"{scope}_W{n}"] = _r(rng, D, D)  # (in, out) layout
            arrays[f"{scope}_b{n}"] = _r(rng, 1, D)
        arrays[f"{scope}_Wo_ln_scale"] = np.ones((1, D), np.float32)
        arrays[f"{scope}_Wo_ln_bias"] = np.zeros((1, D), np.float32)

    for side, depth in (("encoder", LAYERS), ("decoder", LAYERS)):
        for i in range(1, depth + 1):
            ms = f"{side}_l{i}"
            add_attn(f"{ms}_self")
            if side == "decoder":
                add_attn(f"{ms}_context")
            arrays[f"{ms}_ffn_W1"] = _r(rng, D, FF)
            arrays[f"{ms}_ffn_b1"] = _r(rng, 1, FF)
            arrays[f"{ms}_ffn_W2"] = _r(rng, FF, D)
            arrays[f"{ms}_ffn_b2"] = _r(rng, 1, D)
            arrays[f"{ms}_ffn_ffn_ln_scale"] = np.ones((1, D), np.float32)
            arrays[f"{ms}_ffn_ffn_ln_bias"] = np.zeros((1, D), np.float32)

    arrays["decoder_ff_logit_out_b"] = _r(rng, 1, V)
    np.savez(path, **arrays)


def _write_marian_vocab(path):
    with open(path, "w", encoding="utf-8") as f:
        f.write("</s>: 0\n<unk>: 1\n")
        for i in range(2, V):
            f.write(f"tok{i}: {i}\n")


def test_marian_converter(tmp_path):
    from ctranslate2_tpu.converters.marian_conv import MarianConverter

    rng = np.random.default_rng(0)
    npz = str(tmp_path / "model.npz")
    vocab = str(tmp_path / "vocab.yml")
    _make_marian_npz(npz, rng)
    _write_marian_vocab(vocab)

    out = MarianConverter(npz, [vocab, vocab]).convert(
        str(tmp_path / "converted"), force=True)

    # Weight round trip: our artifact stores (out, in); Marian stored (in, out).
    m = load_model(out, compute_type="float32")
    src = np.load(npz)
    fused_q = np.asarray(
        m.mf.get("encoder/layer_0/self_attention/linear_0/weight").array)
    np.testing.assert_allclose(fused_q[:D], src["encoder_l1_self_Wq"].T,
                               rtol=1e-6)

    t = Translator(out)
    res = t.translate_batch([["tok5", "tok6"]], beam_size=2, max_decoding_length=6)
    assert res[0].hypotheses[0] is not None


def test_opus_mt_converter(tmp_path):
    import yaml

    from ctranslate2_tpu.converters.marian_conv import OpusMTConverter

    rng = np.random.default_rng(1)
    model_dir = tmp_path / "opus"
    model_dir.mkdir()
    _make_marian_npz(str(model_dir / "model.intgemm.npz"), rng)
    _write_marian_vocab(str(model_dir / "opus.spm32k-spm32k.vocab.yml"))
    with open(model_dir / "decoder.yml", "w") as f:
        yaml.dump({"vocabs": ["opus.spm32k-spm32k.vocab.yml",
                              "opus.spm32k-spm32k.vocab.yml"]}, f)

    out = OpusMTConverter(str(model_dir)).convert(
        str(tmp_path / "converted"), force=True)
    t = Translator(out)
    res = t.translate_batch([["tok5", "tok6"]], max_decoding_length=5)
    assert res[0].hypotheses[0] is not None


# ---------------------------------------------------------------------------
# OpenNMT-py
# ---------------------------------------------------------------------------


def _onmt_attn(rng, model, scope):
    for part in ("query", "keys", "values"):
        model[f"{scope}.linear_{part}.weight"] = _r(rng, D, D)
        model[f"{scope}.linear_{part}.bias"] = _r(rng, D)
    model[f"{scope}.final_linear.weight"] = _r(rng, D, D)
    model[f"{scope}.final_linear.bias"] = _r(rng, D)


def _onmt_ffn(rng, model, scope):
    model[f"{scope}.w_1.weight"] = _r(rng, FF, D)
    model[f"{scope}.w_1.bias"] = _r(rng, FF)
    model[f"{scope}.w_2.weight"] = _r(rng, D, FF)
    model[f"{scope}.w_2.bias"] = _r(rng, D)
    model[f"{scope}.layer_norm.weight"] = np.ones(D, np.float32)
    model[f"{scope}.layer_norm.bias"] = np.zeros(D, np.float32)


def _onmt_ln(rng, model, scope):
    model[f"{scope}.weight"] = np.ones(D, np.float32)
    model[f"{scope}.bias"] = np.zeros(D, np.float32)


def test_opennmt_py_seq2seq(tmp_path):
    torch = pytest.importorskip("torch")
    from ctranslate2_tpu.converters.opennmt_py_conv import OpenNMTPyConverter

    rng = np.random.default_rng(2)
    model = {}
    pe = _r(rng, 64, 1, D)
    for side, lscope in (("encoder", "encoder.transformer"),
                         ("decoder", "decoder.transformer_layers")):
        model[f"{side}.embeddings.make_embedding.emb_luts.0.weight"] = _r(rng, V, D)
        model[f"{side}.embeddings.make_embedding.pe.pe"] = pe
        _onmt_ln(rng, model, f"{side}.layer_norm")
        for i in range(LAYERS):
            _onmt_attn(rng, model, f"{lscope}.{i}.self_attn")
            _onmt_ffn(rng, model, f"{lscope}.{i}.feed_forward")
            if side == "encoder":
                _onmt_ln(rng, model, f"{lscope}.{i}.layer_norm")
            else:
                _onmt_attn(rng, model, f"{lscope}.{i}.context_attn")
                _onmt_ln(rng, model, f"{lscope}.{i}.layer_norm_1")
                _onmt_ln(rng, model, f"{lscope}.{i}.layer_norm_2")

    vocab = ["<unk>", "<blank>", "<s>", "</s>"] + [
        f"tok{i}" for i in range(V - 4)]
    ckpt = {
        "model": {k: torch.tensor(v) for k, v in model.items()},
        "generator": {"weight": torch.tensor(_r(rng, V, D)),
                      "bias": torch.tensor(_r(rng, V))},
        "opt": {"decoder_type": "transformer", "encoder_type": "transformer",
                "heads": H, "position_encoding": True,
                "pos_ffn_activation_fn": "relu"},
        "vocab": {"src": vocab, "tgt": vocab},
    }
    path = str(tmp_path / "onmt.pt")
    torch.save(ckpt, path)

    out = OpenNMTPyConverter(path).convert(str(tmp_path / "converted"),
                                           force=True)
    t = Translator(out)
    res = t.translate_batch([["tok5", "tok6", "tok7"]], beam_size=2,
                            max_decoding_length=6, return_scores=True)
    assert res[0].hypotheses[0] is not None


def test_opennmt_py_lm(tmp_path):
    torch = pytest.importorskip("torch")
    from ctranslate2_tpu.converters.opennmt_py_conv import OpenNMTPyConverter

    rng = np.random.default_rng(3)
    model = {}
    model["decoder.embeddings.make_embedding.emb_luts.0.weight"] = _r(rng, V, D)
    _onmt_ln(rng, model, "decoder.layer_norm")
    for i in range(LAYERS):
        _onmt_attn(rng, model, f"decoder.transformer_layers.{i}.self_attn")
        _onmt_ffn(rng, model, f"decoder.transformer_layers.{i}.feed_forward")
        _onmt_ln(rng, model, f"decoder.transformer_layers.{i}.layer_norm_1")

    vocab = ["<unk>", "<blank>", "<s>", "</s>"] + [
        f"tok{i}" for i in range(V - 4)]
    ckpt = {
        "model": {k: torch.tensor(v) for k, v in model.items()},
        "generator": {"weight": torch.tensor(_r(rng, V, D)),
                      "bias": torch.tensor(_r(rng, V))},
        "opt": {"decoder_type": "transformer_lm",
                "encoder_type": "transformer_lm",
                "heads": H, "position_encoding": False,
                "max_relative_positions": -1,  # rotary
                "pos_ffn_activation_fn": "relu"},
        "vocab": {"src": vocab, "tgt": vocab},
    }
    path = str(tmp_path / "onmt_lm.pt")
    torch.save(ckpt, path)

    out = OpenNMTPyConverter(path).convert(str(tmp_path / "converted"),
                                           force=True)
    g = Generator(out)
    res = g.generate_batch([["tok5", "tok6"]], max_length=6)
    assert res[0].sequences[0]


# ---------------------------------------------------------------------------
# Fairseq
# ---------------------------------------------------------------------------


def test_fairseq_seq2seq(tmp_path):
    torch = pytest.importorskip("torch")
    from ctranslate2_tpu.converters.fairseq_conv import FairseqConverter

    rng = np.random.default_rng(4)
    model = {}

    def attn(scope):
        for p in ("q_proj", "k_proj", "v_proj", "out_proj"):
            model[f"{scope}.{p}.weight"] = _r(rng, D, D)
            model[f"{scope}.{p}.bias"] = _r(rng, D)

    def ln(scope):
        model[f"{scope}.weight"] = np.ones(D, np.float32)
        model[f"{scope}.bias"] = np.zeros(D, np.float32)

    for side in ("encoder", "decoder"):
        model[f"{side}.embed_tokens.weight"] = _r(rng, V, D)
        for i in range(LAYERS):
            s = f"{side}.layers.{i}"
            attn(f"{s}.self_attn")
            ln(f"{s}.self_attn_layer_norm")
            if side == "decoder":
                attn(f"{s}.encoder_attn")
                ln(f"{s}.encoder_attn_layer_norm")
            model[f"{s}.fc1.weight"] = _r(rng, FF, D)
            model[f"{s}.fc1.bias"] = _r(rng, FF)
            model[f"{s}.fc2.weight"] = _r(rng, D, FF)
            model[f"{s}.fc2.bias"] = _r(rng, D)
            ln(f"{s}.final_layer_norm")
    model["decoder.output_projection.weight"] = _r(rng, V, D)

    data_dir = tmp_path / "data"
    data_dir.mkdir()
    with open(data_dir / "dict.src.txt", "w") as f:
        for i in range(V - 4):
            f.write(f"tok{i} 1\n")
    with open(data_dir / "dict.tgt.txt", "w") as f:
        for i in range(V - 4):
            f.write(f"tok{i} 1\n")

    ckpt = {
        "args": None,
        "cfg": {"model": {"arch": "transformer", "activation_fn": "relu",
                          "encoder_attention_heads": H,
                          "decoder_attention_heads": H,
                          "decoder_normalize_before": False,
                          "source_lang": "src", "target_lang": "tgt",
                          "max_source_positions": 64}},
        "model": {k: torch.tensor(v) for k, v in model.items()},
    }
    path = str(tmp_path / "fairseq.pt")
    torch.save(ckpt, path)

    out = FairseqConverter(path, str(data_dir), source_lang="src",
                           target_lang="tgt").convert(
        str(tmp_path / "converted"), force=True)

    m = load_model(out, compute_type="float32")
    assert m.mf.config["decoder_start_token"] == "</s>"
    t = Translator(out)
    res = t.translate_batch([["tok1", "tok2"]], max_decoding_length=5)
    assert res[0].hypotheses[0] is not None


# ---------------------------------------------------------------------------
# OpenAI GPT-2 (TensorFlow checkpoint)
# ---------------------------------------------------------------------------


def test_openai_gpt2(tmp_path):
    tf = pytest.importorskip("tensorflow")
    from ctranslate2_tpu.converters.openai_gpt2_conv import OpenAIGPT2Converter

    import json

    rng = np.random.default_rng(5)
    model_dir = tmp_path / "gpt2"
    model_dir.mkdir()

    g = tf.Graph()
    with g.as_default():
        def var(name, val):
            tf.compat.v1.get_variable(name, initializer=val)

        var("model/wte", _r(rng, V, D))
        var("model/wpe", _r(rng, 64, D))
        var("model/ln_f/g", np.ones(D, np.float32))
        var("model/ln_f/b", np.zeros(D, np.float32))
        for i in range(LAYERS):
            var(f"model/h{i}/ln_1/g", np.ones(D, np.float32))
            var(f"model/h{i}/ln_1/b", np.zeros(D, np.float32))
            var(f"model/h{i}/attn/c_attn/w", _r(rng, 1, D, 3 * D))
            var(f"model/h{i}/attn/c_attn/b", _r(rng, 3 * D))
            var(f"model/h{i}/attn/c_proj/w", _r(rng, 1, D, D))
            var(f"model/h{i}/attn/c_proj/b", _r(rng, D))
            var(f"model/h{i}/ln_2/g", np.ones(D, np.float32))
            var(f"model/h{i}/ln_2/b", np.zeros(D, np.float32))
            var(f"model/h{i}/mlp/c_fc/w", _r(rng, 1, D, FF))
            var(f"model/h{i}/mlp/c_fc/b", _r(rng, FF))
            var(f"model/h{i}/mlp/c_proj/w", _r(rng, 1, FF, D))
            var(f"model/h{i}/mlp/c_proj/b", _r(rng, D))
        saver = tf.compat.v1.train.Saver()
        with tf.compat.v1.Session(graph=g) as sess:
            sess.run(tf.compat.v1.global_variables_initializer())
            saver.save(sess, str(model_dir / "model.ckpt"))

    with open(model_dir / "hparams.json", "w") as f:
        json.dump({"n_layer": LAYERS, "n_head": H, "n_embd": D,
                   "n_vocab": V, "n_ctx": 64}, f)
    with open(model_dir / "encoder.json", "w") as f:
        json.dump({("<|endoftext|>" if i == 0 else f"tok{i}"): i
                   for i in range(V)}, f)

    out = OpenAIGPT2Converter(str(model_dir)).convert(
        str(tmp_path / "converted"), force=True)
    g2 = Generator(out)
    res = g2.generate_batch([["tok5", "tok6"]], max_length=6)
    assert res[0].sequences[0]
