"""Tensor-parallel sharding tests on the 8-device virtual CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ctranslate2_tpu.models.loader import load_model
from ctranslate2_tpu.models import transformer as T
from ctranslate2_tpu.converters.builder import build_decoder_only_model
from ctranslate2_tpu.parallel.sharding import (
    make_mesh,
    shard_consts,
    shard_params,
)


@pytest.fixture(scope="module")
def llama_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("llama"))
    build_decoder_only_model(
        d, vocab_size=64, num_layers=2, num_heads=8, num_heads_kv=4,
        d_model=64, d_ff=128, rotary_dim=0, glu=True, rms_norm=True,
        activation="swish")
    return d


def test_mesh_construction():
    assert len(jax.devices()) == 8
    mesh = make_mesh(num_data=2, num_model=4)
    assert mesh.shape == {"data": 2, "model": 4}


def test_sharded_forward_matches_single_device(llama_dir):
    model = load_model(llama_dir, compute_type="float32", fuse_qkv=False)
    mesh = make_mesh(num_data=2, num_model=4)

    ids = jnp.asarray(np.random.default_rng(0).integers(3, 64, (4, 8)),
                      dtype=jnp.int32)
    lengths = jnp.asarray([8, 8, 8, 8], dtype=jnp.int32)

    # Single-device reference.
    ref_logits, _, _ = T.decoder_forward_jit(
        model.arch, model.params, model.consts, ids, jnp.int32(0),
        None, None, None, lengths=lengths, quantize_acts=False)

    # Sharded run.
    sharded_params = shard_params(model.params, model.arch, mesh)
    sharded_consts = shard_consts(model.consts, mesh)
    with jax.set_mesh(mesh):
        tp_logits, _, _ = T.decoder_forward_jit(
            model.arch, sharded_params, sharded_consts, ids, jnp.int32(0),
            None, None, None, lengths=lengths, quantize_acts=False)

    np.testing.assert_allclose(
        np.asarray(ref_logits), np.asarray(tp_logits), atol=2e-4, rtol=2e-3)


def test_sharded_cached_decode(llama_dir):
    model = load_model(llama_dir, compute_type="float32", fuse_qkv=False)
    mesh = make_mesh(num_data=1, num_model=8)
    sharded_params = shard_params(model.params, model.arch, mesh)
    sharded_consts = shard_consts(model.consts, mesh)

    ids = jnp.asarray([[5, 9, 11]], dtype=jnp.int32)

    ref_cache = T.init_self_cache(model.arch, 1, 16)
    ref_logits, ref_cache, _ = T.decoder_forward_jit(
        model.arch, model.params, model.consts, ids, jnp.int32(0),
        ref_cache, None, None, quantize_acts=False)

    with jax.set_mesh(mesh):
        cache = T.init_self_cache(model.arch, 1, 16)
        tp_logits, cache, _ = T.decoder_forward_jit(
            model.arch, sharded_params, sharded_consts, ids, jnp.int32(0),
            cache, None, None, quantize_acts=False)

    np.testing.assert_allclose(
        np.asarray(ref_logits[:, -1]), np.asarray(tp_logits[:, -1]),
        atol=2e-4, rtol=2e-3)


def test_sharded_generation(llama_dir):
    """End-to-end Generator on a sharded model must match unsharded."""
    from ctranslate2_tpu import Generator

    g = Generator(llama_dir)
    ref = g.generate_batch([["tok1", "tok2"]], max_length=8)

    g2 = Generator(llama_dir, tensor_parallel=True)
    mesh = make_mesh(num_data=1, num_model=4)
    g2.model.params = shard_params(g2.model.params, g2.model.arch, mesh)
    g2.model.consts = shard_consts(g2.model.consts, mesh)
    with jax.set_mesh(mesh):
        tp = g2.generate_batch([["tok1", "tok2"]], max_length=8)

    assert ref[0].sequences == tp[0].sequences


def test_ring_attention_matches_dense():
    """Sequence-sharded ring attention == dense attention (beyond-parity
    context parallelism, SURVEY §2.6)."""
    import numpy as np
    import jax.numpy as jnp

    from ctranslate2_tpu.parallel.context import ring_attention
    from ctranslate2_tpu.parallel.sharding import make_mesh

    rng = np.random.default_rng(0)
    B, H, T, D = 2, 4, 64, 32
    q = rng.standard_normal((B, H, T, D)).astype(np.float32)
    k = rng.standard_normal((B, H, T, D)).astype(np.float32)
    v = rng.standard_normal((B, H, T, D)).astype(np.float32)
    scale = 1 / np.sqrt(D)

    mesh = make_mesh(num_data=1, num_model=8)
    out = np.asarray(ring_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), mesh,
        causal=True, scale=scale))

    # dense reference
    s = np.einsum("bhqd,bhkd->bhqk", q * scale, k)
    mask = np.tril(np.ones((T, T), bool))
    s = np.where(mask[None, None], s, -1e30)
    p = np.exp(s - s.max(-1, keepdims=True))
    p = p / p.sum(-1, keepdims=True)
    ref = np.einsum("bhqk,bhkd->bhqd", p, v)
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_ring_attention_non_causal():
    import numpy as np
    import jax.numpy as jnp

    from ctranslate2_tpu.parallel.context import ring_attention
    from ctranslate2_tpu.parallel.sharding import make_mesh

    rng = np.random.default_rng(1)
    B, H, T, D = 1, 2, 32, 16
    q = rng.standard_normal((B, H, T, D)).astype(np.float32)
    k = rng.standard_normal((B, H, T, D)).astype(np.float32)
    v = rng.standard_normal((B, H, T, D)).astype(np.float32)
    mesh = make_mesh(num_data=1, num_model=8)
    out = np.asarray(ring_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), mesh,
        causal=False, scale=0.25))
    s = np.einsum("bhqd,bhkd->bhqk", q * 0.25, k)
    p = np.exp(s - s.max(-1, keepdims=True))
    p = p / p.sum(-1, keepdims=True)
    ref = np.einsum("bhqk,bhkd->bhqd", p, v)
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_sharded_int8_generation(llama_dir):
    """Whole-generation device loop with INT8 weights (activation quant +
    per-row scales sharded with their output axes) under the mesh."""
    from ctranslate2_tpu import Generator

    ref = Generator(llama_dir, compute_type="int8").generate_batch(
        [["tok1", "tok2"], ["tok3"]], max_length=8, return_scores=True)

    g = Generator(llama_dir, compute_type="int8", tensor_parallel=True)
    mesh = make_mesh(num_data=1, num_model=4)
    g.model.params = shard_params(g.model.params, g.model.arch, mesh)
    g.model.consts = shard_consts(g.model.consts, mesh)
    with jax.set_mesh(mesh):
        tp = g.generate_batch([["tok1", "tok2"], ["tok3"]], max_length=8,
                              return_scores=True)
    for r, t in zip(ref, tp):
        assert r.sequences == t.sequences


def test_sharded_beam_generation(llama_dir):
    """Beam device loop (chain-mask beam attention) under the mesh."""
    from ctranslate2_tpu import Generator

    ref = Generator(llama_dir).generate_batch(
        [["tok1", "tok2"]], beam_size=2, num_hypotheses=2, max_length=8,
        return_scores=True)

    g = Generator(llama_dir, tensor_parallel=True)
    mesh = make_mesh(num_data=1, num_model=4)
    g.model.params = shard_params(g.model.params, g.model.arch, mesh)
    g.model.consts = shard_consts(g.model.consts, mesh)
    with jax.set_mesh(mesh):
        tp = g.generate_batch([["tok1", "tok2"]], beam_size=2,
                              num_hypotheses=2, max_length=8,
                              return_scores=True)
    assert ref[0].sequences == tp[0].sequences


def test_sharded_int8_kv_cache(llama_dir, monkeypatch):
    """INT8 KV cache decode under the mesh (scales shard with heads)."""
    from ctranslate2_tpu import Generator

    monkeypatch.setenv("CT2TPU_KV_CACHE", "int8")
    ref = Generator(llama_dir).generate_batch(
        [["tok1", "tok2", "tok3"]], max_length=8)

    g = Generator(llama_dir, tensor_parallel=True)
    mesh = make_mesh(num_data=1, num_model=4)
    g.model.params = shard_params(g.model.params, g.model.arch, mesh)
    g.model.consts = shard_consts(g.model.consts, mesh)
    with jax.set_mesh(mesh):
        tp = g.generate_batch([["tok1", "tok2", "tok3"]], max_length=8)
    assert ref[0].sequences == tp[0].sequences


def test_shard_cache_placement(llama_dir):
    """cache_specs/shard_cache place KV caches batch-on-data,
    heads-on-model; a sharded decode step accepts the placed cache."""
    from ctranslate2_tpu.parallel.sharding import shard_cache

    model = load_model(llama_dir, compute_type="float32", fuse_qkv=False)
    mesh = make_mesh(num_data=2, num_model=4)
    cache = T.init_self_cache(model.arch, 4, 32)
    placed = shard_cache(cache, model.arch, mesh)
    sh = placed[0]["k"].sharding
    assert sh.spec == jax.sharding.PartitionSpec("data", "model", None, None)

    params = shard_params(model.params, model.arch, mesh)
    consts = shard_consts(model.consts, mesh)
    ids = jnp.asarray([[5], [7], [9], [11]], dtype=jnp.int32)
    with jax.set_mesh(mesh):
        logits, new_cache, _ = T.decoder_forward_jit(
            model.arch, params, consts, ids, jnp.int32(0), placed,
            None, None, quantize_acts=False)
    assert np.isfinite(np.asarray(logits)).all()


def test_sharded_windowed_ring_generation(tmp_path):
    """Ring KV cache decode under the mesh."""
    from ctranslate2_tpu import Generator

    d = str(tmp_path / "win")
    build_decoder_only_model(
        d, sliding_window=128, rotary_dim=8, num_heads_kv=4, num_heads=8,
        d_model=64, d_ff=128, glu=True, rms_norm=True)
    ref = Generator(d).generate_batch([["tok1", "tok2"]], max_length=8)

    g = Generator(d, tensor_parallel=True)
    mesh = make_mesh(num_data=1, num_model=4)
    g.model.params = shard_params(g.model.params, g.model.arch, mesh)
    g.model.consts = shard_consts(g.model.consts, mesh)
    with jax.set_mesh(mesh):
        tp = g.generate_batch([["tok1", "tok2"]], max_length=8)
    assert ref[0].sequences == tp[0].sequences


def test_continuous_batcher_under_mesh(llama_dir):
    """Continuous serving with TP-sharded params: the persistent decode
    step runs under the mesh and matches the unsharded engine."""
    from ctranslate2_tpu import ContinuousBatcher, Generator

    ref_gen = Generator(llama_dir)
    expected = ref_gen.generate_batch(
        [["tok1", "tok2"]], max_length=8, include_prompt_in_result=False)[0]

    g = Generator(llama_dir, tensor_parallel=True)
    mesh = make_mesh(num_data=1, num_model=4)
    g.model.params = shard_params(g.model.params, g.model.arch, mesh)
    g.model.consts = shard_consts(g.model.consts, mesh)
    with jax.set_mesh(mesh):
        cb = ContinuousBatcher(g, num_slots=2, capacity=128)
        try:
            r = cb.submit(["tok1", "tok2"], max_length=8).result(timeout=600)
        finally:
            cb.close()
    assert r.sequences_ids[0] == expected.sequences_ids[0]

    # Speculative verify steps (T=K forwards) under the same mesh stay
    # lossless.
    with jax.set_mesh(mesh):
        cbs = ContinuousBatcher(g, num_slots=2, capacity=128,
                                speculation_k=3)
        try:
            rs = cbs.submit(["tok1", "tok2"],
                            max_length=8).result(timeout=600)
        finally:
            cbs.close()
    assert rs.sequences_ids[0] == expected.sequences_ids[0]


def test_one_flag_tensor_parallel(llama_dir):
    """tensor_parallel=True must shard at load with ZERO manual steps
    (reference ergonomics: src/models/model.cc:827-899 — the flag does
    the whole job). No make_mesh/shard_params/set_mesh in user code."""
    from ctranslate2_tpu import Generator

    ref = Generator(llama_dir).generate_batch(
        [["tok1", "tok2"]], max_length=8, return_scores=True)

    g = Generator(llama_dir, tensor_parallel=True)
    # The flag built the mesh and committed TP shardings at load.
    assert g.model.mesh is not None
    assert dict(g.model.mesh.shape) == {"data": 1, "model": 8}
    w = g.model.params["decoder"]["layers"][0]["ffn"]["linear_0"]["w"]
    assert w.sharding.spec == jax.sharding.PartitionSpec(None, "model")
    tp = g.generate_batch([["tok1", "tok2"]], max_length=8,
                          return_scores=True)
    assert ref[0].sequences == tp[0].sequences
    assert ref[0].scores == pytest.approx(tp[0].scores, abs=1e-4)

    # Beam + int8 through the same already-sharded instance.
    refb = Generator(llama_dir).generate_batch(
        [["tok1", "tok2"]], beam_size=2, num_hypotheses=2, max_length=8)
    tpb = g.generate_batch([["tok1", "tok2"]], beam_size=2,
                           num_hypotheses=2, max_length=8)
    assert refb[0].sequences == tpb[0].sequences


def test_one_flag_tp_int8(llama_dir):
    from ctranslate2_tpu import Generator

    ref = Generator(llama_dir, compute_type="int8").generate_batch(
        [["tok1", "tok2"], ["tok3"]], max_length=8)
    g = Generator(llama_dir, compute_type="int8", tensor_parallel=True)
    tp = g.generate_batch([["tok1", "tok2"], ["tok3"]], max_length=8)
    for r, t in zip(ref, tp):
        assert r.sequences == t.sequences


def test_one_flag_tp_translator(tiny_model_path):
    """Encoder-decoder one-flag TP on the reference tiny model."""
    from ctranslate2_tpu import Translator

    src = [["آ", "ت", "ز", "م", "و", "ن"]]
    ref = Translator(tiny_model_path).translate_batch(src)
    t = Translator(tiny_model_path, tensor_parallel=True)
    assert t.model.mesh is not None
    tp = t.translate_batch(src)
    assert ref[0].hypotheses == tp[0].hypotheses


def test_one_flag_tp_continuous(llama_dir):
    """Continuous serving (+speculation) over a one-flag-TP generator,
    with no mesh context anywhere in user code."""
    from ctranslate2_tpu import ContinuousBatcher, Generator

    expected = Generator(llama_dir).generate_batch(
        [["tok1", "tok2"]], max_length=8, include_prompt_in_result=False)[0]
    g = Generator(llama_dir, tensor_parallel=True)
    cb = ContinuousBatcher(g, num_slots=2, capacity=128, speculation_k=3)
    try:
        r = cb.submit(["tok1", "tok2"], max_length=8).result(timeout=600)
    finally:
        cb.close()
    assert r.sequences_ids[0] == expected.sequences_ids[0]


def test_one_flag_tp_data_axis(llama_dir):
    """tensor_parallel=True + device_index list: the list sizes the
    mesh's data axis (replica groups), model axis spans the rest."""
    from ctranslate2_tpu import Generator

    ref = Generator(llama_dir).generate_batch(
        [["tok1", "tok2"], ["tok3"], ["tok4"], ["tok5", "tok6"]],
        max_length=8)
    g = Generator(llama_dir, tensor_parallel=True, device_index=[0, 1])
    assert dict(g.model.mesh.shape) == {"data": 2, "model": 4}
    # The data axis must not create host-side replicas (the mesh does DP).
    assert g.num_replicas == 1
    tp = g.generate_batch(
        [["tok1", "tok2"], ["tok3"], ["tok4"], ["tok5", "tok6"]],
        max_length=8)
    for r, t in zip(ref, tp):
        assert r.sequences == t.sequences


def test_one_flag_tp_unload_reload(llama_dir):
    """unload_model/load_model must restore the TP shardings."""
    from ctranslate2_tpu import Generator

    g = Generator(llama_dir, tensor_parallel=True)
    ref = g.generate_batch([["tok1", "tok2"]], max_length=8)
    g.unload_model(to_cpu=True)
    assert not g.model_is_loaded
    g.load_model()
    w = g.model.params["decoder"]["layers"][0]["ffn"]["linear_0"]["w"]
    assert w.sharding.spec == jax.sharding.PartitionSpec(None, "model")
    again = g.generate_batch([["tok1", "tok2"]], max_length=8)
    assert ref[0].sequences == again[0].sequences


def test_context_parallel_ring_prefill(llama_dir, monkeypatch):
    """Context parallelism reaches user code: a long-prompt
    Generator.generate_batch on a (data=2, model=4) mesh routes fresh
    prefill attention through ring attention over the data axis
    (models/transformer.py dispatch -> parallel/context.py), and the
    generation stays token-identical to the unsharded engine."""
    from ctranslate2_tpu import Generator
    from ctranslate2_tpu.parallel import context as ctx_par

    # 257 tokens: include_prompt_in_result=False prefills the first 256
    # (an even length, so the sequence divides the data axis).
    prompt = [f"tok{1 + (i % 5)}" for i in range(257)]
    monkeypatch.setenv("CT2TPU_RING_PREFILL", "0")
    ref = Generator(llama_dir).generate_batch(
        [prompt], max_length=8, include_prompt_in_result=False)

    monkeypatch.setenv("CT2TPU_RING_PREFILL", "1")
    monkeypatch.setenv("CT2TPU_RING_PREFILL_MIN_LEN", "64")
    calls = []
    orig = ctx_par.ring_attention_prefill

    def counted(*a, **k):
        calls.append(1)
        return orig(*a, **k)

    monkeypatch.setattr(ctx_par, "ring_attention_prefill", counted)
    try:
        g = Generator(llama_dir, tensor_parallel=True, device_index=[0, 1])
        assert dict(g.model.mesh.shape) == {"data": 2, "model": 4}
        assert ctx_par.context_parallel_config() is not None
        tp = g.generate_batch([prompt], max_length=8,
                              include_prompt_in_result=False)
        assert calls, "ring prefill dispatch did not fire"
        assert ref[0].sequences == tp[0].sequences
    finally:
        ctx_par.disable_context_parallel()


def test_initialize_distributed_single_process():
    """Multi-host wiring smoke test at process_count=1 (the analog of the
    reference's ScopedMPISetter bootstrap). Runs in a subprocess because
    jax.distributed.initialize mutates global state."""
    import subprocess
    import sys

    code = (
        "import os; os.environ['JAX_PLATFORMS']='cpu';"
        "from ctranslate2_tpu.parallel.sharding import initialize_distributed;"
        "info = initialize_distributed("
        "    coordinator_address='127.0.0.1:9917',"
        "    num_processes=1, process_id=0);"
        "assert info['process_count'] == 1 and info['process_index'] == 0;"
        "print('DIST_OK')"
    )
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        timeout=180, env={**__import__("os").environ,
                          "PYTHONPATH": "/root/repo"})
    assert "DIST_OK" in out.stdout, out.stderr[-500:]
