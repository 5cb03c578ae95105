"""End-to-end forward tests against the reference tiny transliteration model."""

import jax.numpy as jnp
import pytest

from ctranslate2_tpu.models.loader import load_model
from ctranslate2_tpu.models import transformer as T
from ctranslate2_tpu.ops import attention as A

SRC = ["آ", "ت", "ز", "م", "و", "ن"]
SRC2 = ["آ", "ت", "ش", "ي", "س", "و", "ن"]


def _greedy(m, src_tokens, max_len=30, quantize_acts=False):
    sv = m.source_vocabularies[0]
    tv = m.target_vocabulary
    ids = [sv.to_id(t) for t in src_tokens] + [sv.eos_id]
    ids_arr = jnp.asarray([ids], dtype=jnp.int32)
    lengths = jnp.asarray([len(ids)], dtype=jnp.int32)
    enc = T.encoder_forward_jit(m.arch, m.params, m.consts, ids_arr, lengths,
                            quantize_acts=quantize_acts,
                            out_dtype=m.out_dtype)
    mem_kv = T.precompute_memory_jit(m.arch, m.params, enc, quantize_acts=quantize_acts)
    mem_bias = A.length_mask_bias(lengths, enc.shape[1])
    cache = T.init_self_cache(m.arch, 1, 64, dtype=m.out_dtype)
    tok = jnp.asarray([[tv.bos_id]], dtype=jnp.int32)
    out = []
    for pos in range(max_len):
        logits, cache, _ = T.decoder_forward_jit(
            m.arch, m.params, m.consts, tok, jnp.int32(pos), cache, mem_kv,
            mem_bias, quantize_acts=quantize_acts, out_dtype=m.out_dtype)
        nxt = int(jnp.argmax(logits[0, -1]))
        if nxt == tv.eos_id:
            break
        out.append(tv.to_token(nxt))
        tok = jnp.asarray([[nxt]], dtype=jnp.int32)
    return out


def test_greedy_fp32(tiny_model_path):
    m = load_model(tiny_model_path, compute_type="float32")
    assert _greedy(m, SRC)[:6] == ["a", "t", "z", "m", "o", "n"]
    assert _greedy(m, SRC2)[:7] == ["a", "c", "h", "i", "s", "o", "n"]


def test_greedy_all_model_versions(any_tiny_model_path):
    m = load_model(any_tiny_model_path, compute_type="default")
    quant = m.policy.quantize_activations
    assert _greedy(m, SRC, quantize_acts=quant)[:6] == ["a", "t", "z", "m", "o", "n"]


def test_cached_matches_sequence_decoding(tiny_model_path):
    """Iterative (cached) decoding must match one full-sequence pass
    (the reference asserts the same: tests/model_test.cc:59-151)."""
    m = load_model(tiny_model_path, compute_type="float32")
    sv = m.source_vocabularies[0]
    tv = m.target_vocabulary
    ids = [sv.to_id(t) for t in SRC] + [sv.eos_id]
    ids_arr = jnp.asarray([ids], dtype=jnp.int32)
    lengths = jnp.asarray([len(ids)], dtype=jnp.int32)
    enc = T.encoder_forward_jit(m.arch, m.params, m.consts, ids_arr, lengths,
                            quantize_acts=False)
    mem_kv = T.precompute_memory_jit(m.arch, m.params, enc, quantize_acts=False)
    mem_bias = A.length_mask_bias(lengths, enc.shape[1])

    tgt = [tv.bos_id] + [tv.to_id(t) for t in ["a", "t", "z", "m"]]
    tgt_arr = jnp.asarray([tgt], dtype=jnp.int32)

    # Full-sequence (scoring-style) pass without cache.
    seq_logits, _, _ = T.decoder_forward_jit(
        m.arch, m.params, m.consts, tgt_arr, jnp.int32(0), None, mem_kv,
        mem_bias, quantize_acts=False)

    # Iterative pass with cache.
    cache = T.init_self_cache(m.arch, 1, 16)
    step_logits = []
    for pos, tok in enumerate(tgt):
        logits, cache, _ = T.decoder_forward_jit(
            m.arch, m.params, m.consts,
            jnp.asarray([[tok]], dtype=jnp.int32), jnp.int32(pos),
            cache, mem_kv, mem_bias, quantize_acts=False)
        step_logits.append(logits[:, 0])
    step_logits = jnp.stack(step_logits, axis=1)

    assert jnp.allclose(seq_logits, step_logits, atol=1e-4)


def test_prefill_matches_stepwise(tiny_model_path):
    """Multi-token cached prefill == token-by-token stepping."""
    m = load_model(tiny_model_path, compute_type="float32")
    tv = m.target_vocabulary
    sv = m.source_vocabularies[0]
    ids = [sv.to_id(t) for t in SRC] + [sv.eos_id]
    ids_arr = jnp.asarray([ids], dtype=jnp.int32)
    lengths = jnp.asarray([len(ids)], dtype=jnp.int32)
    enc = T.encoder_forward_jit(m.arch, m.params, m.consts, ids_arr, lengths,
                            quantize_acts=False)
    mem_kv = T.precompute_memory_jit(m.arch, m.params, enc, quantize_acts=False)
    mem_bias = A.length_mask_bias(lengths, enc.shape[1])

    tgt = [tv.bos_id] + [tv.to_id(t) for t in ["a", "t"]]

    cache1 = T.init_self_cache(m.arch, 1, 16)
    logits1, cache1, _ = T.decoder_forward_jit(
        m.arch, m.params, m.consts, jnp.asarray([tgt], dtype=jnp.int32),
        jnp.int32(0), cache1, mem_kv, mem_bias, quantize_acts=False)

    cache2 = T.init_self_cache(m.arch, 1, 16)
    last = None
    for pos, tok in enumerate(tgt):
        last, cache2, _ = T.decoder_forward_jit(
            m.arch, m.params, m.consts, jnp.asarray([[tok]], dtype=jnp.int32),
            jnp.int32(pos), cache2, mem_kv, mem_bias, quantize_acts=False)

    assert jnp.allclose(logits1[:, -1], last[:, 0], atol=1e-4)
    import jax as _jax

    _jax.tree.map(
        lambda a, b: None if bool(jnp.allclose(a, b, atol=1e-4))
        else (_ for _ in ()).throw(AssertionError("cache mismatch")),
        cache1, cache2)


def test_scan_layers_equivalence(tmp_path):
    """Stacked (lax.scan) and per-layer-loop decoder params produce the
    same logits and generations."""
    import numpy as np
    from ctranslate2_tpu.converters.builder import build_decoder_only_model
    from ctranslate2_tpu.models.loader import load_model as _lm

    model_dir = build_decoder_only_model(
        str(tmp_path / "scan_eq"), vocab_size=32, num_layers=3, num_heads=4,
        d_model=32, d_ff=64, rotary_dim=0, glu=True, rms_norm=True,
        activation="swish", num_heads_kv=2)
    m_scan = _lm(model_dir, compute_type="float32", stack_layers=True)
    m_loop = _lm(model_dir, compute_type="float32", stack_layers=False,
                 fuse_qkv=False)
    assert m_scan.scan_layers
    assert not m_loop.scan_layers

    ids = jnp.asarray([[4, 9, 17, 23]], jnp.int32)
    lengths = jnp.full((1,), 4, jnp.int32)
    kwargs = dict(lengths=lengths, quantize_acts=False,
                  out_dtype=jnp.float32)
    la, _, _ = T.decoder_forward_jit(
        m_scan.arch, m_scan.params, m_scan.consts, ids, jnp.int32(0),
        None, None, None, **kwargs)
    lb, _, _ = T.decoder_forward_jit(
        m_loop.arch, m_loop.params, m_loop.consts, ids, jnp.int32(0),
        None, None, None, **kwargs)
    np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                               rtol=1e-4, atol=1e-4)

    # Cached stepwise equivalence through the stacked cache.
    cache = T.init_self_cache(m_scan.arch, 1, 16, stacked=True)
    outs = []
    for t in range(4):
        lg, cache, _ = T.decoder_forward_jit(
            m_scan.arch, m_scan.params, m_scan.consts, ids[:, t:t + 1],
            jnp.int32(t), cache, None, None,
            quantize_acts=False, out_dtype=jnp.float32)
        outs.append(np.asarray(lg[:, 0]))
    np.testing.assert_allclose(np.stack(outs, 1), np.asarray(la),
                               rtol=1e-4, atol=1e-4)


def test_beam_chain_attention_op():
    """beam_chain_attention == per-beam attention over gathered histories."""
    import numpy as np
    from ctranslate2_tpu.ops import attention as A

    rng = np.random.default_rng(0)
    B, K, Hq, Hkv, C, D = 2, 2, 4, 2, 8, 16
    N = B * K
    q = rng.standard_normal((N, Hq, 1, D)).astype(np.float32)
    k = rng.standard_normal((N, Hkv, C, D)).astype(np.float32)
    v = rng.standard_normal((N, Hkv, C, D)).astype(np.float32)
    pos = 5  # slots 0..5 written
    # random origin chains within each group; future slots invalid
    chain = np.full((N, C), -1, np.int32)
    for n in range(N):
        chain[n, : pos + 1] = rng.integers(0, K, pos + 1)

    out = np.asarray(A.beam_chain_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(chain),
        beam_size=K, queries_scale=0.3))

    # reference: materialize each logical beam's history then plain attention
    g = Hq // Hkv
    ref = np.zeros_like(out)
    for b in range(B):
        for kk in range(K):
            n = b * K + kk
            hist_k = np.stack([k[b * K + chain[n, j]][:, j]
                               for j in range(pos + 1)], axis=1)
            hist_v = np.stack([v[b * K + chain[n, j]][:, j]
                               for j in range(pos + 1)], axis=1)
            for h in range(Hq):
                s = (q[n, h, 0] * 0.3) @ hist_k[h // g].T
                p = np.exp(s - s.max())
                p /= p.sum()
                ref[n, h, 0] = p @ hist_v[h // g]
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_chunked_decode_attention_matches_plain():
    import numpy as np
    import jax
    import jax.numpy as jnp
    from ctranslate2_tpu.ops import attention as attn_ops

    with jax.default_matmul_precision("highest"):
        rng = np.random.default_rng(5)
        B, Hq, Hkv, C, D = 2, 8, 4, 96, 32
        q = jnp.asarray(rng.standard_normal((B, Hq, 1, D)), jnp.float32)
        kc = jnp.asarray(rng.standard_normal((B, Hkv, C, D)), jnp.float32)
        vc = jnp.asarray(rng.standard_normal((B, Hkv, C, D)), jnp.float32)
        kn = jnp.asarray(rng.standard_normal((B, Hkv, 1, D)), jnp.float32)
        vn = jnp.asarray(rng.standard_normal((B, Hkv, 1, D)), jnp.float32)
        scale = 1 / np.sqrt(D)

        for pos in (0, 1, 31, 32, 65, 95):
            ref = attn_ops.decode_step_attention(
                q, kc, vc, kn, vn, jnp.int32(pos), queries_scale=scale,
                bias=attn_ops.causal_mask_bias(1, C, offset=pos))
            out = attn_ops.chunked_decode_attention(
                q, kc, vc, kn, vn, jnp.int32(pos), queries_scale=scale,
                chunk=32)
            np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                       rtol=2e-5, atol=2e-5)


def test_chunked_beam_chain_attention_matches_plain():
    import numpy as np
    import jax
    import jax.numpy as jnp
    from ctranslate2_tpu.ops import attention as attn_ops

    with jax.default_matmul_precision("highest"):
        rng = np.random.default_rng(6)
        B, K, Hq, Hkv, C, D = 2, 3, 4, 2, 64, 16
        N = B * K
        q = jnp.asarray(rng.standard_normal((N, Hq, 1, D)), jnp.float32)
        kc = jnp.asarray(rng.standard_normal((N, Hkv, C, D)), jnp.float32)
        vc = jnp.asarray(rng.standard_normal((N, Hkv, C, D)), jnp.float32)
        kn = jnp.asarray(rng.standard_normal((N, Hkv, 1, D)), jnp.float32)
        vn = jnp.asarray(rng.standard_normal((N, Hkv, 1, D)), jnp.float32)
        scale = 1 / np.sqrt(D)

        for pos in (0, 7, 16, 33, 63):
            chain_np = np.full((N, C), -1, np.int32)
            for r in range(N):
                chain_np[r, :pos] = rng.integers(0, K, pos)
            chain = jnp.asarray(chain_np)
            ref = attn_ops.beam_chain_attention(
                q, kc, vc, chain, beam_size=K, queries_scale=scale,
                k_new=kn, v_new=vn)
            out = attn_ops.chunked_beam_chain_attention(
                q, kc, vc, chain, kn, vn, jnp.int32(pos), beam_size=K,
                queries_scale=scale, chunk=16)
            np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                       rtol=2e-5, atol=2e-5)
