"""Converter parity tests: tiny randomly-initialized HF models are converted
and our forward logits are compared against the HF (torch CPU) forward.

This is a stronger offline analog of the reference's converter round-trip
tests (reference: python/tests/test_transformers.py)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp

from ctranslate2_tpu.converters.transformers_conv import TransformersConverter
from ctranslate2_tpu.models.loader import load_model
from ctranslate2_tpu.models import transformer as T


class DummyTokenizer:
    bos_token = "<s>"
    eos_token = "</s>"
    unk_token = "<unk>"
    pad_token = "<pad>"

    def __init__(self, vocab_size):
        self._vocab = {f"tk{i}": i for i in range(vocab_size)}
        self._vocab["<s>"] = 0
        self._vocab["</s>"] = 1
        self._vocab["<unk>"] = 2
        self._vocab["<pad>"] = 3

    def get_vocab(self):
        return self._vocab

    def convert_ids_to_tokens(self, idx):
        for k, v in self._vocab.items():
            if v == idx:
                return k
        return "<unk>"


def _convert(model, tmp_path, vocab_size=64, quantization=None):
    tok = DummyTokenizer(vocab_size)
    conv = TransformersConverter(model=model, tokenizer=tok)
    out = str(tmp_path / "converted")
    conv.convert(out, quantization=quantization, force=True)
    return out


def _our_logits(model_dir, ids, compute_type="float32"):
    m = load_model(model_dir, compute_type=compute_type)
    ids_arr = jnp.asarray(ids, dtype=jnp.int32)
    lengths = jnp.full((ids_arr.shape[0],), ids_arr.shape[1], jnp.int32)
    logits, _, _ = T.decoder_forward_jit(
        m.arch, m.params, m.consts, ids_arr, jnp.int32(0), None, None, None,
        lengths=lengths, quantize_acts=m.policy.quantize_activations,
        out_dtype=m.out_dtype)
    return np.asarray(logits.astype(jnp.float32)), m


def _hf_logits(model, ids):
    with torch.no_grad():
        out = model(torch.tensor(ids, dtype=torch.long))
    return out.logits.float().numpy()


IDS = [[4, 9, 17, 23, 5, 11, 30, 8]]


def _check(model, tmp_path, atol=2e-3, vocab_size=64):
    model = model.eval()
    out_dir = _convert(model, tmp_path, vocab_size)
    ours, _ = _our_logits(out_dir, IDS)
    theirs = _hf_logits(model, IDS)
    np.testing.assert_allclose(ours, theirs[..., : ours.shape[-1]],
                               atol=atol, rtol=1e-3)


def test_gpt2(tmp_path):
    cfg = transformers.GPT2Config(
        vocab_size=64, n_positions=64, n_embd=32, n_layer=2, n_head=4)
    _check(transformers.GPT2LMHeadModel(cfg), tmp_path)


def test_llama_gqa(tmp_path):
    cfg = transformers.LlamaConfig(
        vocab_size=64, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64)
    _check(transformers.LlamaForCausalLM(cfg), tmp_path)


def test_llama_rope_llama3(tmp_path):
    cfg = transformers.LlamaConfig(
        vocab_size=64, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        max_position_embeddings=128,
        rope_scaling={"rope_type": "llama3", "factor": 8.0,
                      "low_freq_factor": 1.0, "high_freq_factor": 4.0,
                      "original_max_position_embeddings": 64})
    _check(transformers.LlamaForCausalLM(cfg), tmp_path)


def test_mistral_sliding_window(tmp_path):
    cfg = transformers.MistralConfig(
        vocab_size=64, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        sliding_window=4, max_position_embeddings=64, pad_token_id=3)
    _check(transformers.MistralForCausalLM(cfg), tmp_path)


def test_qwen2(tmp_path):
    cfg = transformers.Qwen2Config(
        vocab_size=64, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64)
    _check(transformers.Qwen2ForCausalLM(cfg), tmp_path)


def test_opt(tmp_path):
    cfg = transformers.OPTConfig(
        vocab_size=64, hidden_size=32, ffn_dim=64, num_hidden_layers=2,
        num_attention_heads=4, max_position_embeddings=64,
        word_embed_proj_dim=32)
    _check(transformers.OPTForCausalLM(cfg), tmp_path)


def test_gpt_neox(tmp_path):
    cfg = transformers.GPTNeoXConfig(
        vocab_size=64, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, rotary_pct=0.5,
        max_position_embeddings=64)
    _check(transformers.GPTNeoXForCausalLM(cfg), tmp_path)


def test_bloom(tmp_path):
    cfg = transformers.BloomConfig(
        vocab_size=64, hidden_size=32, n_layer=2, n_head=4)
    _check(transformers.BloomForCausalLM(cfg), tmp_path)


def test_gemma(tmp_path):
    cfg = transformers.GemmaConfig(
        vocab_size=64, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=8, max_position_embeddings=64)
    _check(transformers.GemmaForCausalLM(cfg), tmp_path, atol=5e-3)


def test_t5(tmp_path):
    cfg = transformers.T5Config(
        vocab_size=64, d_model=32, d_kv=8, d_ff=64, num_layers=2,
        num_heads=4, relative_attention_num_buckets=8,
        relative_attention_max_distance=16, feed_forward_proj="relu",
        decoder_start_token_id=3, tie_word_embeddings=True)
    model = transformers.T5ForConditionalGeneration(cfg).eval()
    out_dir = _convert(model, tmp_path)

    src = [[5, 9, 12, 7]]
    tgt = [[3, 8, 15, 21]]
    m = load_model(out_dir, compute_type="float32")
    src_arr = jnp.asarray(src, jnp.int32)
    src_len = jnp.asarray([4], jnp.int32)
    memory = T.encoder_forward_jit(
        m.arch, m.params, m.consts, src_arr, src_len, quantize_acts=False)
    mem_kv = T.precompute_memory_jit(m.arch, m.params, memory,
                                     quantize_acts=False)
    from ctranslate2_tpu.ops import attention as A

    mem_bias = A.length_mask_bias(src_len, memory.shape[1])
    logits, _, _ = T.decoder_forward_jit(
        m.arch, m.params, m.consts, jnp.asarray(tgt, jnp.int32),
        jnp.int32(0), None, mem_kv, mem_bias, quantize_acts=False)
    ours = np.asarray(logits)

    with torch.no_grad():
        theirs = model(
            input_ids=torch.tensor(src), decoder_input_ids=torch.tensor(tgt)
        ).logits.numpy()
    np.testing.assert_allclose(ours, theirs, atol=2e-3, rtol=1e-3)


def test_bart(tmp_path):
    cfg = transformers.BartConfig(
        vocab_size=64, d_model=32, encoder_layers=2, decoder_layers=2,
        encoder_attention_heads=4, decoder_attention_heads=4,
        encoder_ffn_dim=64, decoder_ffn_dim=64, max_position_embeddings=64,
        scale_embedding=False, decoder_start_token_id=2)
    model = transformers.BartForConditionalGeneration(cfg).eval()
    out_dir = _convert(model, tmp_path)

    src = [[5, 9, 12, 7]]
    tgt = [[2, 8, 15, 21]]
    m = load_model(out_dir, compute_type="float32")
    src_arr = jnp.asarray(src, jnp.int32)
    src_len = jnp.asarray([4], jnp.int32)
    memory = T.encoder_forward_jit(
        m.arch, m.params, m.consts, src_arr, src_len, quantize_acts=False)
    mem_kv = T.precompute_memory_jit(m.arch, m.params, memory,
                                     quantize_acts=False)
    from ctranslate2_tpu.ops import attention as A

    mem_bias = A.length_mask_bias(src_len, memory.shape[1])
    logits, _, _ = T.decoder_forward_jit(
        m.arch, m.params, m.consts, jnp.asarray(tgt, jnp.int32),
        jnp.int32(0), None, mem_kv, mem_bias, quantize_acts=False)
    ours = np.asarray(logits)

    with torch.no_grad():
        theirs = model(
            input_ids=torch.tensor(src), decoder_input_ids=torch.tensor(tgt)
        ).logits.numpy()
    np.testing.assert_allclose(ours, theirs, atol=2e-3, rtol=1e-3)


def test_bert(tmp_path):
    cfg = transformers.BertConfig(
        vocab_size=64, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=64)
    model = transformers.BertModel(cfg).eval()
    out_dir = _convert(model, tmp_path)

    m = load_model(out_dir, compute_type="float32")
    ids = [[4, 9, 17, 23]]
    ids_arr = jnp.asarray(ids, jnp.int32)
    lengths = jnp.asarray([4], jnp.int32)
    ours = np.asarray(T.encoder_forward_jit(
        m.arch, m.params, m.consts,
        (ids_arr, jnp.zeros_like(ids_arr)), lengths, quantize_acts=False))

    with torch.no_grad():
        theirs = model(torch.tensor(ids)).last_hidden_state.numpy()
    np.testing.assert_allclose(ours, theirs, atol=2e-3, rtol=1e-3)


def test_whisper(tmp_path):
    cfg = transformers.WhisperConfig(
        vocab_size=64, num_mel_bins=16, d_model=32,
        encoder_layers=2, decoder_layers=2,
        encoder_attention_heads=4, decoder_attention_heads=4,
        encoder_ffn_dim=64, decoder_ffn_dim=64,
        max_source_positions=32, max_target_positions=32,
        pad_token_id=3, bos_token_id=1, eos_token_id=2,
        decoder_start_token_id=1)
    model = transformers.WhisperForConditionalGeneration(cfg).eval()
    out_dir = _convert(model, tmp_path)

    m = load_model(out_dir, compute_type="float32")
    feats = np.random.default_rng(0).standard_normal(
        (1, 16, 64)).astype(np.float32)
    enc_ours = np.asarray(T.speech_encoder_forward_jit(
        m.arch, m.params, m.consts, jnp.asarray(feats), quantize_acts=False))
    with torch.no_grad():
        enc_theirs = model.model.encoder(
            torch.tensor(feats)).last_hidden_state.numpy()
    np.testing.assert_allclose(enc_ours, enc_theirs, atol=2e-3, rtol=1e-3)


def test_gpt2_int8_quantized_conversion(tmp_path):
    cfg = transformers.GPT2Config(
        vocab_size=64, n_positions=64, n_embd=32, n_layer=2, n_head=4)
    model = transformers.GPT2LMHeadModel(cfg).eval()
    tok = DummyTokenizer(64)
    conv = TransformersConverter(model=model, tokenizer=tok)
    out = str(tmp_path / "converted_i8")
    conv.convert(out, quantization="int8", force=True)
    ours, m = _our_logits(out, IDS, compute_type="int8_float32")
    assert m.policy.weight_dtype == "int8"
    theirs = _hf_logits(model, IDS)
    # INT8: loose comparison — argmax parity per position.
    assert (ours.argmax(-1) == theirs.argmax(-1)).mean() > 0.7


def test_wav2vec2(tmp_path):
    cfg = transformers.Wav2Vec2Config(
        vocab_size=32, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64,
        conv_dim=(16, 16, 32), conv_stride=(5, 2, 2),
        conv_kernel=(10, 3, 3), num_feat_extract_layers=3,
        do_stable_layer_norm=True, feat_extract_norm="layer",
        num_conv_pos_embeddings=128, num_conv_pos_embedding_groups=16)
    model = transformers.Wav2Vec2ForCTC(cfg).eval()
    out_dir = _convert(model, tmp_path, vocab_size=32)

    from ctranslate2_tpu.runtime.wav2vec2 import Wav2Vec2

    w = Wav2Vec2(out_dir, compute_type="float32")
    audio = np.random.default_rng(0).standard_normal((1, 400)).astype(np.float32)
    ours = w.encode(audio[:, None, :], to_cpu=True)

    with torch.no_grad():
        theirs = model(torch.tensor(audio)).logits.numpy()
    np.testing.assert_allclose(ours, theirs, atol=3e-3, rtol=1e-3)


def test_wav2vec2bert(tmp_path):
    cfg = transformers.Wav2Vec2BertConfig(
        hidden_size=32, num_hidden_layers=2, num_adapter_layers=1,
        num_attention_heads=4, intermediate_size=64,
        feature_projection_input_dim=48, output_hidden_size=32,
        vocab_size=20, left_max_position_embeddings=8,
        right_max_position_embeddings=8,
        position_embeddings_type="relative_key",
        conv_depthwise_kernel_size=31, add_adapter=True,
        layerdrop=0.0, feat_proj_dropout=0.0, hidden_dropout=0.0)
    model = transformers.Wav2Vec2BertForCTC(cfg).eval()
    out_dir = _convert(model, tmp_path, vocab_size=20)

    from ctranslate2_tpu import Wav2Vec2Bert

    enc = Wav2Vec2Bert(out_dir, compute_type="float32")
    rng = np.random.default_rng(0)
    feats = rng.standard_normal((2, 12, 48)).astype(np.float32)
    ours = enc.encode(feats, to_cpu=True)

    with torch.no_grad():
        theirs = model(torch.tensor(feats)).logits.numpy()
    assert ours.shape == theirs.shape
    np.testing.assert_allclose(ours, theirs, atol=2e-3, rtol=1e-3)


def test_gptj(tmp_path):
    cfg = transformers.GPTJConfig(
        vocab_size=64, n_positions=64, n_embd=32, n_layer=2, n_head=4,
        rotary_dim=8)
    _check(transformers.GPTJForCausalLM(cfg), tmp_path)


def test_codegen(tmp_path):
    cfg = transformers.CodeGenConfig(
        vocab_size=64, n_positions=64, n_embd=32, n_layer=2, n_head=4,
        rotary_dim=8, n_inner=None)
    _check(transformers.CodeGenForCausalLM(cfg), tmp_path)


def test_gpt_bigcode(tmp_path):
    cfg = transformers.GPTBigCodeConfig(
        vocab_size=64, n_positions=64, n_embd=32, n_layer=2, n_head=4,
        multi_query=True)
    _check(transformers.GPTBigCodeForCausalLM(cfg), tmp_path)


def test_falcon_new_arch(tmp_path):
    cfg = transformers.FalconConfig(
        vocab_size=64, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, num_kv_heads=2, new_decoder_architecture=True,
        parallel_attn=True, bias=False, alibi=False)
    _check(transformers.FalconForCausalLM(cfg), tmp_path)


def test_falcon_alibi(tmp_path):
    cfg = transformers.FalconConfig(
        vocab_size=64, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, new_decoder_architecture=False,
        multi_query=True, parallel_attn=True, bias=False, alibi=True)
    _check(transformers.FalconForCausalLM(cfg), tmp_path)


def test_mpt(tmp_path):
    cfg = transformers.MptConfig(
        vocab_size=64, d_model=32, n_layers=2, n_heads=4,
        max_seq_len=64)
    _check(transformers.MptForCausalLM(cfg), tmp_path)


def test_phi(tmp_path):
    cfg = transformers.PhiConfig(
        vocab_size=64, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4,
        partial_rotary_factor=0.5, max_position_embeddings=64)
    _check(transformers.PhiForCausalLM(cfg), tmp_path)


def test_phi3(tmp_path):
    cfg = transformers.Phi3Config(
        vocab_size=64, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, pad_token_id=3)
    _check(transformers.Phi3ForCausalLM(cfg), tmp_path)


def test_pegasus(tmp_path):
    cfg = transformers.PegasusConfig(
        vocab_size=64, d_model=32, encoder_layers=2, decoder_layers=2,
        encoder_attention_heads=4, decoder_attention_heads=4,
        encoder_ffn_dim=64, decoder_ffn_dim=64, max_position_embeddings=64,
        scale_embedding=True)
    model = transformers.PegasusForConditionalGeneration(cfg).eval()
    out_dir = _convert(model, tmp_path, vocab_size=64)

    src = [[5, 9, 12, 30]]
    tgt_in = [[0, 7, 21]]
    m = load_model(out_dir, compute_type="float32")
    import jax.numpy as jnp
    from ctranslate2_tpu.models import transformer as T

    src_arr = jnp.asarray(src, jnp.int32)
    lengths = jnp.full((1,), src_arr.shape[1], jnp.int32)
    memory = T.encoder_forward_jit(m.arch, m.params, m.consts, src_arr,
                                   lengths, quantize_acts=False,
                                   out_dtype=jnp.float32)
    mem_kv = T.precompute_memory_jit(m.arch, m.params, memory,
                                     quantize_acts=False)
    from ctranslate2_tpu.ops import attention as attn_ops

    mem_bias = attn_ops.length_mask_bias(lengths, src_arr.shape[1])
    tgt_arr = jnp.asarray(tgt_in, jnp.int32)
    ours, _, _ = T.decoder_forward_jit(
        m.arch, m.params, m.consts, tgt_arr, jnp.int32(0), None, mem_kv,
        mem_bias, lengths=jnp.full((1,), 3, jnp.int32),
        quantize_acts=False, out_dtype=jnp.float32)

    with torch.no_grad():
        theirs = model(
            input_ids=torch.tensor(src), attention_mask=torch.ones(1, 4),
            decoder_input_ids=torch.tensor(tgt_in)).logits.numpy()
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=2e-3, rtol=1e-3)


def test_distilbert(tmp_path):
    cfg = transformers.DistilBertConfig(
        vocab_size=64, dim=32, n_layers=2, n_heads=4, hidden_dim=64,
        max_position_embeddings=64)
    model = transformers.DistilBertModel(cfg).eval()
    out_dir = _convert(model, tmp_path, vocab_size=64)

    from ctranslate2_tpu import Encoder

    enc = Encoder(out_dir, compute_type="float32")
    ids = [[4, 9, 17, 23]]
    out = enc.forward_batch([[f"tk{i}" for i in row] for row in ids])
    ours = np.asarray(out.last_hidden_state)
    with torch.no_grad():
        theirs = model(torch.tensor(ids)).last_hidden_state.numpy()
    np.testing.assert_allclose(ours[:, : theirs.shape[1]], theirs,
                               atol=2e-3, rtol=1e-3)


def test_mbart(tmp_path):
    cfg = transformers.MBartConfig(
        vocab_size=64, d_model=32, encoder_layers=2, decoder_layers=2,
        encoder_attention_heads=4, decoder_attention_heads=4,
        encoder_ffn_dim=64, decoder_ffn_dim=64, max_position_embeddings=64)
    model = transformers.MBartForConditionalGeneration(cfg).eval()
    out_dir = _convert(model, tmp_path, vocab_size=64)

    import jax.numpy as jnp
    from ctranslate2_tpu.models import transformer as T
    from ctranslate2_tpu.ops import attention as attn_ops

    src = [[5, 9, 12, 30]]
    tgt_in = [[2, 7, 21]]
    m = load_model(out_dir, compute_type="float32")
    src_arr = jnp.asarray(src, jnp.int32)
    lengths = jnp.full((1,), src_arr.shape[1], jnp.int32)
    memory = T.encoder_forward_jit(m.arch, m.params, m.consts, src_arr,
                                   lengths, quantize_acts=False,
                                   out_dtype=jnp.float32)
    mem_kv = T.precompute_memory_jit(m.arch, m.params, memory,
                                     quantize_acts=False)
    mem_bias = attn_ops.length_mask_bias(lengths, src_arr.shape[1])
    ours, _, _ = T.decoder_forward_jit(
        m.arch, m.params, m.consts, jnp.asarray(tgt_in, jnp.int32),
        jnp.int32(0), None, mem_kv, mem_bias,
        lengths=jnp.full((1,), 3, jnp.int32),
        quantize_acts=False, out_dtype=jnp.float32)

    with torch.no_grad():
        theirs = model(
            input_ids=torch.tensor(src), attention_mask=torch.ones(1, 4),
            decoder_input_ids=torch.tensor(tgt_in)).logits.numpy()
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=2e-3, rtol=1e-3)


def test_gemma3(tmp_path):
    cfg = transformers.Gemma3TextConfig(
        vocab_size=64, hidden_size=32, intermediate_size=64,
        num_hidden_layers=3, num_attention_heads=4, num_key_value_heads=2,
        head_dim=8, max_position_embeddings=64, sliding_window=4,
        sliding_window_pattern=2, query_pre_attn_scalar=8,
        rope_theta=1_000_000.0, rope_local_base_freq=10_000.0)
    _check(transformers.Gemma3ForCausalLM(cfg), tmp_path, atol=5e-3)


def test_t5gemma(tmp_path):
    enc = transformers.T5GemmaModuleConfig(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, head_dim=8, intermediate_size=64,
        vocab_size=64, sliding_window=4, query_pre_attn_scalar=8,
        layer_types=["sliding_attention", "full_attention"],
        max_position_embeddings=64)
    cfg = transformers.T5GemmaConfig(encoder=enc, decoder=enc, vocab_size=64)
    model = transformers.T5GemmaForConditionalGeneration(cfg).eval()
    out_dir = _convert(model, tmp_path, vocab_size=64)

    import jax.numpy as jnp
    from ctranslate2_tpu.models import transformer as T
    from ctranslate2_tpu.ops import attention as attn_ops

    src = [[5, 9, 12, 30]]
    tgt_in = [[2, 7, 21]]
    m = load_model(out_dir, compute_type="float32")
    src_arr = jnp.asarray(src, jnp.int32)
    lengths = jnp.full((1,), src_arr.shape[1], jnp.int32)
    memory = T.encoder_forward_jit(m.arch, m.params, m.consts, src_arr,
                                   lengths, quantize_acts=False,
                                   out_dtype=jnp.float32)
    mem_kv = T.precompute_memory_jit(m.arch, m.params, memory,
                                     quantize_acts=False)
    mem_bias = attn_ops.length_mask_bias(lengths, src_arr.shape[1])
    ours, _, _ = T.decoder_forward_jit(
        m.arch, m.params, m.consts, jnp.asarray(tgt_in, jnp.int32),
        jnp.int32(0), None, mem_kv, mem_bias,
        lengths=jnp.full((1,), 3, jnp.int32),
        quantize_acts=False, out_dtype=jnp.float32)

    with torch.no_grad():
        theirs = model(
            input_ids=torch.tensor(src), attention_mask=torch.ones(1, 4),
            decoder_input_ids=torch.tensor(tgt_in)).logits.numpy()
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=5e-3, rtol=1e-3)


def test_bert_encoder_api_token_types(tmp_path):
    """The Encoder task API must feed token-type embeddings (zeros by
    default) like the reference's placeholder
    (reference: src/models/language_model.cc:371-381)."""
    from ctranslate2_tpu import Encoder

    cfg = transformers.BertConfig(
        vocab_size=64, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=64)
    model = transformers.BertModel(cfg).eval()
    out_dir = _convert(model, tmp_path)

    enc = Encoder(out_dir, compute_type="float32")
    toks = [["tk4", "tk9", "tk17", "tk23", "tk5", "tk11", "tk30", "tk8"]]
    out = enc.forward_batch(toks)
    with torch.no_grad():
        ref = model(torch.tensor([[4, 9, 17, 23, 5, 11, 30, 8]]))
    np.testing.assert_allclose(
        np.asarray(out.last_hidden_state, np.float32),
        ref.last_hidden_state.numpy(), atol=2e-3, rtol=1e-3)
    # Explicit type ids change the result consistently with HF.
    out1 = enc.forward_batch(toks, token_type_ids=[[0, 0, 0, 0, 1, 1, 1, 1]])
    with torch.no_grad():
        ref1 = model(torch.tensor([[4, 9, 17, 23, 5, 11, 30, 8]]),
                     token_type_ids=torch.tensor([[0, 0, 0, 0, 1, 1, 1, 1]]))
    np.testing.assert_allclose(
        np.asarray(out1.last_hidden_state, np.float32),
        ref1.last_hidden_state.numpy(), atol=2e-3, rtol=1e-3)
    # Async variant resolves to the same output.
    h = enc.forward_batch_async(toks)
    np.testing.assert_allclose(
        np.asarray(h.result().last_hidden_state, np.float32),
        np.asarray(out.last_hidden_state, np.float32))
    # Pooler parity: reference scope "pooler_dense" + tanh on the first
    # token (reference: src/models/language_model.cc:345-390,
    # transformer_spec.py:797).
    assert out.pooler_output is not None
    np.testing.assert_allclose(
        np.asarray(out.pooler_output, np.float32),
        ref.pooler_output.numpy(), atol=2e-3, rtol=1e-3)
    # Id-list input matches token-string input (reference
    # BatchTokens/BatchIds variants, encoder.cc:15-40).
    out_ids = enc.forward_batch([[4, 9, 17, 23, 5, 11, 30, 8]])
    np.testing.assert_array_equal(
        np.asarray(out_ids.last_hidden_state, np.float32),
        np.asarray(out.last_hidden_state, np.float32))


def test_gemma2(tmp_path):
    cfg = transformers.Gemma2Config(
        vocab_size=64, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=8, sliding_window=16, query_pre_attn_scalar=8,
        attn_logit_softcapping=None, final_logit_softcapping=30.0)
    _check(transformers.Gemma2ForCausalLM(cfg), tmp_path, atol=5e-3)


def test_qwen3(tmp_path):
    cfg = transformers.Qwen3Config(
        vocab_size=64, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=8)
    _check(transformers.Qwen3ForCausalLM(cfg), tmp_path, atol=5e-3)


def test_m2m100(tmp_path):
    torch.manual_seed(0)
    cfg = transformers.M2M100Config(
        vocab_size=64, d_model=32, encoder_layers=2, decoder_layers=2,
        encoder_attention_heads=4, decoder_attention_heads=4,
        encoder_ffn_dim=64, decoder_ffn_dim=64,
        max_position_embeddings=64, scale_embedding=True)
    model = transformers.M2M100ForConditionalGeneration(cfg).eval()
    out_dir = _convert(model, tmp_path)

    src = [[5, 9, 12, 7]]
    tgt = [[2, 8, 15, 21]]
    m = load_model(out_dir, compute_type="float32")
    src_arr = jnp.asarray(src, jnp.int32)
    src_len = jnp.asarray([4], jnp.int32)
    memory = T.encoder_forward_jit(
        m.arch, m.params, m.consts, src_arr, src_len, quantize_acts=False)
    mem_kv = T.precompute_memory_jit(m.arch, m.params, memory,
                                     quantize_acts=False)
    from ctranslate2_tpu.ops import attention as A

    mem_bias = A.length_mask_bias(src_len, memory.shape[1])
    logits, _, _ = T.decoder_forward_jit(
        m.arch, m.params, m.consts, jnp.asarray(tgt, jnp.int32),
        jnp.int32(0), None, mem_kv, mem_bias, quantize_acts=False)
    ours = np.asarray(logits)
    with torch.no_grad():
        theirs = model(
            input_ids=torch.tensor(src), decoder_input_ids=torch.tensor(tgt)
        ).logits.numpy()
    # Exact float32 parity (the loose 1e-2 tolerance here previously
    # masked a pre-norm/post-norm conversion bug).
    np.testing.assert_allclose(ours, theirs, atol=2e-5, rtol=1e-4)


def test_roberta(tmp_path):
    cfg = transformers.RobertaConfig(
        vocab_size=64, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=68, pad_token_id=1)
    model = transformers.RobertaModel(cfg).eval()
    out_dir = _convert(model, tmp_path)
    m = load_model(out_dir, compute_type="float32")
    ids = [[4, 9, 17, 23]]
    # RoBERTa position ids start at pad+1: HF offsets internally; the
    # converter stores the shifted table, so positions align from 0.
    ids_arr = jnp.asarray(ids, jnp.int32)
    lengths = jnp.asarray([4], jnp.int32)
    ours = np.asarray(T.encoder_forward_jit(
        m.arch, m.params, m.consts,
        (ids_arr, jnp.zeros_like(ids_arr)), lengths, quantize_acts=False))
    with torch.no_grad():
        theirs = model(torch.tensor(ids)).last_hidden_state.numpy()
    np.testing.assert_allclose(ours, theirs, atol=2e-3, rtol=1e-3)


def test_mt5(tmp_path):
    cfg = transformers.MT5Config(
        vocab_size=64, d_model=32, d_kv=8, d_ff=64, num_layers=2,
        num_heads=4, relative_attention_num_buckets=8,
        relative_attention_max_distance=16,
        feed_forward_proj="gated-gelu", decoder_start_token_id=3,
        tie_word_embeddings=False)
    model = transformers.MT5ForConditionalGeneration(cfg).eval()
    out_dir = _convert(model, tmp_path)

    src = [[5, 9, 12, 7]]
    tgt = [[3, 8, 15, 21]]
    m = load_model(out_dir, compute_type="float32")
    src_arr = jnp.asarray(src, jnp.int32)
    src_len = jnp.asarray([4], jnp.int32)
    memory = T.encoder_forward_jit(
        m.arch, m.params, m.consts, src_arr, src_len, quantize_acts=False)
    mem_kv = T.precompute_memory_jit(m.arch, m.params, memory,
                                     quantize_acts=False)
    from ctranslate2_tpu.ops import attention as A

    mem_bias = A.length_mask_bias(src_len, memory.shape[1])
    logits, _, _ = T.decoder_forward_jit(
        m.arch, m.params, m.consts, jnp.asarray(tgt, jnp.int32),
        jnp.int32(0), None, mem_kv, mem_bias, quantize_acts=False)
    with torch.no_grad():
        theirs = model(
            input_ids=torch.tensor(src), decoder_input_ids=torch.tensor(tgt)
        ).logits.numpy()
    np.testing.assert_allclose(np.asarray(logits), theirs,
                               atol=2e-3, rtol=1e-3)


def test_marian_hf(tmp_path):
    cfg = transformers.MarianConfig(
        vocab_size=64, d_model=32, encoder_layers=2, decoder_layers=2,
        encoder_attention_heads=4, decoder_attention_heads=4,
        encoder_ffn_dim=64, decoder_ffn_dim=64,
        max_position_embeddings=64, decoder_start_token_id=3,
        static_position_embeddings=True, pad_token_id=63)
    model = transformers.MarianMTModel(cfg).eval()
    out_dir = _convert(model, tmp_path)

    src = [[5, 9, 12, 7]]
    tgt = [[3, 8, 15, 21]]
    m = load_model(out_dir, compute_type="float32")
    src_arr = jnp.asarray(src, jnp.int32)
    src_len = jnp.asarray([4], jnp.int32)
    memory = T.encoder_forward_jit(
        m.arch, m.params, m.consts, src_arr, src_len, quantize_acts=False)
    mem_kv = T.precompute_memory_jit(m.arch, m.params, memory,
                                     quantize_acts=False)
    from ctranslate2_tpu.ops import attention as A

    mem_bias = A.length_mask_bias(src_len, memory.shape[1])
    logits, _, _ = T.decoder_forward_jit(
        m.arch, m.params, m.consts, jnp.asarray(tgt, jnp.int32),
        jnp.int32(0), None, mem_kv, mem_bias, quantize_acts=False)
    with torch.no_grad():
        theirs = model(
            input_ids=torch.tensor(src), decoder_input_ids=torch.tensor(tgt)
        ).logits.numpy()
    np.testing.assert_allclose(np.asarray(logits), theirs,
                               atol=1e-2, rtol=1e-3)


def test_opt_smoothquant_activation_scales(tmp_path):
    """activation_scales smoothing is a numerical identity for the float
    model: converting with scales must reproduce the HF logits, and the
    folded layer norms must actually change (reference:
    TransformersConverter activation_scales, transformers.py:161-165 +
    converters/utils.py:78-105)."""
    torch.manual_seed(0)
    cfg = transformers.OPTConfig(
        vocab_size=64, hidden_size=32, ffn_dim=64, num_hidden_layers=2,
        num_attention_heads=4, max_position_embeddings=64,
        word_embed_proj_dim=32)
    model = transformers.OPTForCausalLM(cfg).eval()
    theirs = _hf_logits(model, IDS)

    scales = {}
    for i in range(cfg.num_hidden_layers):
        scope = f"model.decoder.layers.{i}"
        scales[f"{scope}.self_attn.q_proj"] = (
            torch.rand(cfg.hidden_size) * 4 + 0.1)
        scales[f"{scope}.fc1"] = torch.rand(cfg.hidden_size) * 4 + 0.1

    tok = DummyTokenizer(64)
    out = str(tmp_path / "smooth")
    TransformersConverter(model=model, tokenizer=tok,
                          activation_scales=scales).convert(out, force=True)
    ours, m = _our_logits(out, IDS)
    np.testing.assert_allclose(ours, theirs[..., : ours.shape[-1]],
                               atol=2e-3, rtol=1e-3)
    # The smoothing really rescaled the torch modules (identity overall,
    # not a no-op fold).
    ln = model.model.decoder.layers[0].self_attn_layer_norm.weight
    assert not torch.allclose(ln, torch.ones_like(ln) * ln.mean())


def test_smoothquant_unsupported_model(tmp_path):
    cfg = transformers.GPT2Config(
        vocab_size=64, n_positions=64, n_embd=32, n_layer=1, n_head=4)
    model = transformers.GPT2LMHeadModel(cfg).eval()
    with pytest.raises(NotImplementedError, match="smoothing"):
        TransformersConverter(
            model=model, tokenizer=DummyTokenizer(64),
            activation_scales={}).convert(str(tmp_path / "x"), force=True)
