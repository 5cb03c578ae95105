"""Converter tests for the loaders whose architectures are not in the
installed `transformers` (Gemma4 / MixFormerSequential / T5Gemma2):
mock torch modules reproduce the HF module structure, and for Gemma4 a
hand-rolled torch forward provides the logit reference (validating the
proportional-partial-RoPE permutation and base rescale)."""

import math

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from ctranslate2_tpu.converters.transformers_conv import TransformersConverter
from ctranslate2_tpu.models.loader import load_model
from ctranslate2_tpu.models import transformer as T


class Tok:
    bos_token = "<s>"
    eos_token = "</s>"
    unk_token = "<unk>"
    chat_template = None

    def __init__(self, n):
        self._v = {f"tk{i}": i for i in range(n)}
        self._v["<s>"] = 0
        self._v["</s>"] = 1
        self._v["<unk>"] = 2

    def get_vocab(self):
        return self._v


def lin(out_d, in_d, bias=False, seed=0):
    g = torch.Generator().manual_seed(seed)
    m = torch.nn.Linear(in_d, out_d, bias=bias)
    with torch.no_grad():
        m.weight.copy_(torch.randn(out_d, in_d, generator=g) * 0.08)
        if bias:
            m.bias.copy_(torch.randn(out_d, generator=g) * 0.02)
    return m


class RMSW(torch.nn.Module):
    def __init__(self, d, seed=0):
        super().__init__()
        g = torch.Generator().manual_seed(seed)
        self.weight = torch.nn.Parameter(
            1.0 + 0.1 * torch.randn(d, generator=g))


def rms(x, w, eps=1e-6):
    var = x.float().pow(2).mean(-1, keepdim=True)
    return (x.float() * torch.rsqrt(var + eps)) * w.float()


# ----------------------------------------------------------------------
# Gemma4
# ----------------------------------------------------------------------

VOCAB = 64
HID = 32
HEADS = 4
KV = 2
HD = 16  # sliding head_dim
GHD = 16  # global head_dim
GRD = 8   # global rotary dim (partial factor 0.5)
LAYERS = ["sliding_attention", "full_attention"]
WINDOW = 16


class G4Cfg:
    __qualname__ = "Gemma4TextConfig"
    num_hidden_layers = 2
    num_attention_heads = HEADS
    num_key_value_heads = KV
    head_dim = HD
    global_head_dim = GHD
    hidden_size = HID
    hidden_activation = "gelu_pytorch_tanh"
    sliding_window = WINDOW
    layer_types = LAYERS
    rms_norm_eps = 1e-6
    vocab_size = VOCAB
    final_logit_softcapping = 30.0
    attention_k_eq_v = False
    rope_parameters = {
        "sliding_attention": {"rope_theta": 10000.0},
        "full_attention": {"rope_theta": 1000000.0,
                           "partial_rotary_factor": GRD / GHD},
    }


G4Cfg.__name__ = "Gemma4TextConfig"


class G4Attn(torch.nn.Module):
    def __init__(self, layer_type, seed):
        super().__init__()
        self.layer_type = layer_type
        self.q_proj = lin(HEADS * HD, HID, seed=seed + 1)
        self.k_proj = lin(KV * HD, HID, seed=seed + 2)
        self.v_proj = lin(KV * HD, HID, seed=seed + 3)
        self.o_proj = lin(HID, HEADS * HD, seed=seed + 4)
        self.q_norm = RMSW(HD, seed=seed + 5)
        self.k_norm = RMSW(HD, seed=seed + 6)


class G4Layer(torch.nn.Module):
    def __init__(self, layer_type, seed):
        super().__init__()
        self.self_attn = G4Attn(layer_type, seed)
        self.mlp = torch.nn.Module()
        self.mlp.gate_proj = lin(64, HID, seed=seed + 7)
        self.mlp.up_proj = lin(64, HID, seed=seed + 8)
        self.mlp.down_proj = lin(HID, 64, seed=seed + 9)
        self.input_layernorm = RMSW(HID, seed=seed + 10)
        self.post_attention_layernorm = RMSW(HID, seed=seed + 11)
        self.pre_feedforward_layernorm = RMSW(HID, seed=seed + 12)
        self.post_feedforward_layernorm = RMSW(HID, seed=seed + 13)
        self.layer_scalar = torch.tensor(0.9 if seed % 2 else 1.0)


class G4Model(torch.nn.Module):
    def __init__(self):
        super().__init__()
        self.config = G4Cfg()
        self.model = torch.nn.Module()
        g = torch.Generator().manual_seed(42)
        self.model.embed_tokens = torch.nn.Embedding(VOCAB, HID)
        with torch.no_grad():
            self.model.embed_tokens.weight.copy_(
                torch.randn(VOCAB, HID, generator=g) * 0.3)
        self.model.layers = torch.nn.ModuleList(
            [G4Layer(t, 100 * i) for i, t in enumerate(LAYERS)])
        self.model.norm = RMSW(HID, seed=999)
        self.lm_head = lin(VOCAB, HID, seed=1000)


def g4_rope(x, pos, theta, rotary_dim, head_dim):
    """HF proportional partial RoPE: pairs (i, head_dim/2 + i) rotate with
    angle pos * theta^(-2i/head_dim) for i < rotary_dim/2; other channels
    pass through (zero-padded frequencies)."""
    out = x.clone()
    half = head_dim // 2
    for i in range(rotary_dim // 2):
        freq = theta ** (-2.0 * i / head_dim)
        ang = pos.float() * freq
        cos, sin = torch.cos(ang), torch.sin(ang)
        a = x[..., i].clone()
        b = x[..., half + i].clone()
        out[..., i] = a * cos - b * sin
        out[..., half + i] = a * sin + b * cos
    return out


def g4_reference_forward(model, ids):
    cfg = model.config
    x = model.model.embed_tokens(ids).float() * math.sqrt(HID)
    B, S = ids.shape
    pos = torch.arange(S)
    for li, layer in enumerate(model.model.layers):
        full = cfg.layer_types[li] == "full_attention"
        theta = (cfg.rope_parameters["full_attention"]["rope_theta"] if full
                 else cfg.rope_parameters["sliding_attention"]["rope_theta"])
        rd = GRD if full else HD
        at = layer.self_attn
        h = rms(x, layer.input_layernorm.weight)
        q = at.q_proj(h).view(B, S, HEADS, HD)
        k = at.k_proj(h).view(B, S, KV, HD)
        v = at.v_proj(h).view(B, S, KV, HD)
        q = rms(q, at.q_norm.weight)
        k = rms(k, at.k_norm.weight)
        v = rms(v, torch.ones(HD))
        q = g4_rope(q, pos[None, :, None], theta, rd, HD)
        k = g4_rope(k, pos[None, :, None], theta, rd, HD)
        # GQA: repeat kv heads; queries_scale = 1.0 (no 1/sqrt scaling).
        rep = HEADS // KV
        k = k.repeat_interleave(rep, dim=2)
        v = v.repeat_interleave(rep, dim=2)
        s = torch.einsum("bqhd,bkhd->bhqk", q, k)
        mask = torch.tril(torch.ones(S, S, dtype=torch.bool))
        if not full:
            near = (pos[:, None] - pos[None, :]) < cfg.sliding_window
            mask = mask & near
        s = s.masked_fill(~mask, -1e30)
        w = torch.softmax(s, dim=-1)
        ctx = torch.einsum("bhqk,bkhd->bqhd", w, v).reshape(B, S, HEADS * HD)
        x = x + rms(at.o_proj(ctx), layer.post_attention_layernorm.weight)
        h2 = rms(x, layer.pre_feedforward_layernorm.weight)
        f = layer.mlp.down_proj(
            torch.nn.functional.gelu(layer.mlp.gate_proj(h2), approximate="tanh")
            * layer.mlp.up_proj(h2))
        x = x + rms(f, layer.post_feedforward_layernorm.weight)
        x = x * layer.layer_scalar
    x = rms(x, model.model.norm.weight)
    logits = model.lm_head(x)
    cap = cfg.final_logit_softcapping
    return torch.tanh(logits / cap) * cap


def test_gemma4_logit_parity(tmp_path):
    model = G4Model().eval()
    conv = TransformersConverter(model=model, tokenizer=Tok(VOCAB))
    out = conv.convert(str(tmp_path / "g4"), force=True)

    ids = [[4, 9, 17, 23, 5, 11, 30, 8, 40, 3, 22, 51]]
    with torch.no_grad():
        ref = g4_reference_forward(model, torch.tensor(ids)).numpy()

    m = load_model(out, compute_type="float32")
    spec = m.arch.decoder
    assert spec.layers[0].self_attention.sliding_window == WINDOW
    assert spec.layers[1].self_attention.sliding_window == 0
    assert spec.layers[1].self_attention.rotary.dim == GRD
    assert spec.final_logit_softcapping == 30.0

    ids_arr = jnp.asarray(ids, jnp.int32)
    lengths = jnp.full((1,), ids_arr.shape[1], jnp.int32)
    logits, _, _ = T.decoder_forward_jit(
        m.arch, m.params, m.consts, ids_arr, jnp.int32(0), None, None, None,
        lengths=lengths, quantize_acts=False, out_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(logits), ref, atol=1e-4, rtol=1e-3)


def test_gemma4_k_eq_v(tmp_path):
    model = G4Model().eval()
    model.config = G4Cfg()
    model.config.attention_k_eq_v = True
    conv = TransformersConverter(model=model, tokenizer=Tok(VOCAB))
    out = conv.convert(str(tmp_path / "g4kv"), force=True)
    m = load_model(out, compute_type="float32")
    # Full-attention layer (1) reuses K as V: the V slice of the fused QKV
    # is the ORIGINAL k_proj (the K slice additionally carries the
    # partial-RoPE permutation, reference: transformers.py:2318-2351).
    qkv = np.asarray(m.params["decoder"]["layers"][1]["self_attention"]["qkv"]["w"])
    Dq, Dkv = HEADS * HD, KV * HD
    kw = model.model.layers[1].self_attn.k_proj.weight.detach().numpy()
    np.testing.assert_allclose(qkv[:, Dq + Dkv:], kw.T, atol=1e-6)
    assert np.abs(qkv[:, Dq:Dq + Dkv] - qkv[:, Dq + Dkv:]).max() > 0


def test_gemma4_generates(tmp_path):
    from ctranslate2_tpu import Generator

    model = G4Model().eval()
    conv = TransformersConverter(model=model, tokenizer=Tok(VOCAB))
    out = conv.convert(str(tmp_path / "g4g"), force=True)
    g = Generator(out)
    r = g.generate_batch([["tk5", "tk6"]], max_length=8,
                         include_prompt_in_result=False)[0]
    assert len(r.sequences_ids[0]) <= 8


# ----------------------------------------------------------------------
# MixFormerSequential (phi-1)
# ----------------------------------------------------------------------


class MixCfg:
    num_hidden_layers = 2
    n_layer = 2
    n_head = 4
    n_embd = 32
    rotary_dim = 4
    activation_function = "gelu_new"
    vocab_size = VOCAB


MixCfg.__name__ = "MixFormerSequentialConfig"


class MixModel(torch.nn.Module):
    def __init__(self):
        super().__init__()
        self.config = MixCfg()
        d = self.config.n_embd
        emb = torch.nn.Module()
        g = torch.Generator().manual_seed(3)
        emb.wte = torch.nn.Embedding(VOCAB, d)
        with torch.no_grad():
            emb.wte.weight.copy_(torch.randn(VOCAB, d, generator=g) * 0.3)
        blocks = [emb]
        for i in range(self.config.n_layer):
            blk = torch.nn.Module()
            blk.ln = torch.nn.LayerNorm(d)
            with torch.no_grad():
                blk.ln.weight.copy_(1 + 0.1 * torch.randn(d, generator=g))
                blk.ln.bias.copy_(0.05 * torch.randn(d, generator=g))
            blk.mixer = torch.nn.Module()
            blk.mixer.Wqkv = lin(3 * d, d, bias=True, seed=10 * i)
            blk.mixer.out_proj = lin(d, d, bias=True, seed=10 * i + 1)
            blk.mlp = torch.nn.Module()
            blk.mlp.fc1 = lin(4 * d, d, bias=True, seed=10 * i + 2)
            blk.mlp.fc2 = lin(d, 4 * d, bias=True, seed=10 * i + 3)
            blocks.append(blk)
        head = torch.nn.Module()
        head.ln = torch.nn.LayerNorm(d)
        with torch.no_grad():
            head.ln.weight.copy_(1 + 0.1 * torch.randn(d, generator=g))
            head.ln.bias.copy_(0.05 * torch.randn(d, generator=g))
        head.linear = lin(VOCAB, d, bias=True, seed=777)
        blocks.append(head)
        self.layers = torch.nn.ModuleList(blocks)


def mix_reference_forward(model, ids):
    cfg = model.config
    d = cfg.n_embd
    H = cfg.n_head
    hd = d // H
    rd = cfg.rotary_dim
    x = model.layers[0].wte(ids).float()
    B, S = ids.shape
    pos = torch.arange(S)
    for blk in model.layers[1:-1]:
        h = torch.nn.functional.layer_norm(
            x, (d,), blk.ln.weight, blk.ln.bias)
        qkv = blk.mixer.Wqkv(h)
        q, k, v = qkv.split(d, dim=-1)
        q = q.view(B, S, H, hd)
        k = k.view(B, S, H, hd)
        v = v.view(B, S, H, hd)

        # NeoX-style half-split partial rotary over rotary_dim channels.
        def rope(t):
            out = t.clone()
            half = rd // 2
            for i in range(half):
                freq = 10000.0 ** (-2.0 * i / rd)
                ang = pos.float() * freq
                cos, sin = torch.cos(ang), torch.sin(ang)
                a = t[..., i].clone()
                b = t[..., half + i].clone()
                out[..., i] = a * cos[None, :, None] - b * sin[None, :, None]
                out[..., half + i] = a * sin[None, :, None] + b * cos[None, :, None]
            return out

        q, k = rope(q), rope(k)
        s = torch.einsum("bqhd,bkhd->bhqk", q, k) / math.sqrt(hd)
        mask = torch.tril(torch.ones(S, S, dtype=torch.bool))
        s = s.masked_fill(~mask, -1e30)
        w = torch.softmax(s, dim=-1)
        ctx = torch.einsum("bhqk,bkhd->bqhd", w, v).reshape(B, S, d)
        attn_out = blk.mixer.out_proj(ctx)
        mlp_out = blk.mlp.fc2(torch.nn.functional.gelu(
            blk.mlp.fc1(h), approximate="tanh"))
        x = x + attn_out + mlp_out
    head = model.layers[-1]
    x = torch.nn.functional.layer_norm(x, (d,), head.ln.weight, head.ln.bias)
    return head.linear(x)


def test_mixformer_logit_parity(tmp_path):
    model = MixModel().eval()
    conv = TransformersConverter(model=model, tokenizer=Tok(VOCAB))
    out = conv.convert(str(tmp_path / "mix"), force=True)
    ids = [[4, 9, 17, 23, 5, 11, 30, 8]]
    with torch.no_grad():
        ref = mix_reference_forward(model, torch.tensor(ids)).numpy()
    m = load_model(out, compute_type="float32")
    spec = m.arch.decoder
    assert spec.layers[0].shared_layer_norm
    assert spec.layers[0].self_attention.rotary.dim == 4
    ids_arr = jnp.asarray(ids, jnp.int32)
    lengths = jnp.full((1,), ids_arr.shape[1], jnp.int32)
    logits, _, _ = T.decoder_forward_jit(
        m.arch, m.params, m.consts, ids_arr, jnp.int32(0), None, None, None,
        lengths=lengths, quantize_acts=False, out_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(logits), ref, atol=1e-4, rtol=1e-3)


# ----------------------------------------------------------------------
# T5Gemma2 (merged self+cross attention)
# ----------------------------------------------------------------------


class TG2Side:
    num_hidden_layers = 2
    num_attention_heads = 4
    num_key_value_heads = 2
    head_dim = 8
    hidden_size = 32
    hidden_activation = "gelu_pytorch_tanh"
    sliding_window = 0
    rms_norm_eps = 1e-6
    layer_types = None
    rope_parameters = {"full_attention": {"rope_theta": 10000.0}}


class TG2Cfg:
    vocab_size = VOCAB

    def __init__(self):
        self.encoder = type("Enc", (), {"text_config": TG2Side()})()
        self.decoder = TG2Side()


TG2Cfg.__name__ = "T5Gemma2Config"


class TG2SideModule(torch.nn.Module):
    def __init__(self, seed):
        super().__init__()
        cfg = TG2Side()
        d = cfg.hidden_size
        g = torch.Generator().manual_seed(seed)
        self.embed_tokens = torch.nn.Embedding(VOCAB, d)
        with torch.no_grad():
            self.embed_tokens.weight.copy_(
                torch.randn(VOCAB, d, generator=g) * 0.3)
        self.norm = RMSW(d, seed=seed)
        self.layers = torch.nn.ModuleList()
        for i in range(cfg.num_hidden_layers):
            layer = torch.nn.Module()
            layer.self_attn = torch.nn.Module()
            layer.self_attn.q_proj = lin(
                cfg.num_attention_heads * cfg.head_dim, d, seed=seed + 10 * i)
            layer.self_attn.k_proj = lin(
                cfg.num_key_value_heads * cfg.head_dim, d,
                seed=seed + 10 * i + 1)
            layer.self_attn.v_proj = lin(
                cfg.num_key_value_heads * cfg.head_dim, d,
                seed=seed + 10 * i + 2)
            layer.self_attn.o_proj = lin(
                d, cfg.num_attention_heads * cfg.head_dim,
                seed=seed + 10 * i + 3)
            layer.self_attn.q_norm = None
            layer.self_attn.k_norm = None
            layer.mlp = torch.nn.Module()
            layer.mlp.gate_proj = lin(64, d, seed=seed + 10 * i + 4)
            layer.mlp.up_proj = lin(64, d, seed=seed + 10 * i + 5)
            layer.mlp.down_proj = lin(d, 64, seed=seed + 10 * i + 6)
            layer.pre_self_attn_layernorm = RMSW(d, seed=seed + 10 * i + 7)
            layer.post_self_attn_layernorm = RMSW(d, seed=seed + 10 * i + 8)
            layer.pre_feedforward_layernorm = RMSW(d, seed=seed + 10 * i + 9)
            layer.post_feedforward_layernorm = RMSW(d, seed=seed + 10 * i + 20)
            self.layers.append(layer)


class TG2Model(torch.nn.Module):
    def __init__(self):
        super().__init__()
        self.config = TG2Cfg()
        self.model = torch.nn.Module()
        self.model.encoder = TG2SideModule(5)
        self.model.decoder = TG2SideModule(55)
        self.lm_head = lin(VOCAB, 32, seed=888)


def test_t5gemma2_converts_and_translates(tmp_path):
    from ctranslate2_tpu import Translator

    model = TG2Model().eval()
    conv = TransformersConverter(model=model, tokenizer=Tok(VOCAB))
    out = conv.convert(str(tmp_path / "tg2"), force=True)
    m = load_model(out, compute_type="float32")
    assert m.is_sequence_to_sequence
    dec = m.arch.decoder
    assert dec.layers[0].self_attention.has_memory_kv
    assert dec.layers[0].sandwich_norm
    # memory_kv == fused [k|v] self projections.
    mkv = np.asarray(m.params["decoder"]["layers"][0]["self_attention"]["memory_kv"]["w"])
    kw = model.model.decoder.layers[0].self_attn.k_proj.weight.detach().numpy()
    vw = model.model.decoder.layers[0].self_attn.v_proj.weight.detach().numpy()
    np.testing.assert_allclose(mkv, np.concatenate([kw, vw], 0).T, atol=1e-6)

    t = Translator(out)
    r = t.translate_batch([["tk4", "tk5", "tk6"]], beam_size=2,
                          max_decoding_length=8)[0]
    assert isinstance(r.hypotheses[0], list)
