"""Sliding-window ring KV cache + chunked prefill tests
(reference behavior: cache eviction src/layers/attention.cc:536-557,587-595
and chunked prefill src/layers/transformer.cc:735-792 — reimplemented as
O(window) ring buffers with position%ring writes)."""

import numpy as np
import jax.numpy as jnp
import pytest

from ctranslate2_tpu import ContinuousBatcher, Generator
from ctranslate2_tpu.converters.builder import build_decoder_only_model
from ctranslate2_tpu.models import transformer as T

WINDOW = 128  # ring block Wr = 128, ring capacity = 256


@pytest.fixture(scope="module")
def windowed_model(tmp_path_factory):
    d = tmp_path_factory.mktemp("winmodel")
    return build_decoder_only_model(
        str(d / "m"), sliding_window=WINDOW, rotary_dim=8,
        num_heads_kv=2, glu=True, rms_norm=True, quantization=None)


def test_split_prefill_chunks():
    assert T.split_prefill_chunks(0, 100, 128) == [(0, 100)]
    assert T.split_prefill_chunks(0, 300, 128) == [
        (0, 128), (128, 128), (256, 44)]
    assert T.split_prefill_chunks(100, 100, 128) == [(100, 28), (128, 72)]
    assert T.split_prefill_chunks(0, 100, 0) == [(0, 100)]
    assert T.split_prefill_chunks(5, 0, 128) == [(5, 0)]


def test_ring_cache_is_o_window(windowed_model):
    gen = Generator(windowed_model)
    arch = gen.model.arch
    assert T.ring_block(arch) == 128
    assert T.ring_capacity(arch) == 256
    cache = T.init_self_cache(arch, 1, 2048, ring=True)
    # Windowed layers store 256 slots regardless of the 2048 logical
    # capacity — O(window), not O(sequence).
    for layer in cache:
        assert layer["k"].shape[2] == 256
    full = T.init_self_cache(arch, 1, 2048, ring=False)
    for layer in full:
        assert layer["k"].shape[2] == 2048


def test_ring_decode_logit_equivalence(windowed_model):
    """Step-by-step decode over a ring cache produces the same logits as
    the full-capacity masked cache, including after the ring wraps."""
    gen = Generator(windowed_model)
    model = gen.model
    arch = model.arch
    rng = np.random.RandomState(0)
    total = 300  # wraps the 256-slot ring
    ids = rng.randint(4, 60, size=total)
    capacity = 512
    model.ensure_consts(capacity)

    ring_cache = T.init_self_cache(arch, 1, capacity, ring=True)
    full_cache = T.init_self_cache(arch, 1, capacity, ring=False)

    check_at = {0, 1, WINDOW - 1, WINDOW, 255, 256, 257, 280, total - 1}
    for t in range(total):
        tok = jnp.asarray([[ids[t]]], jnp.int32)
        lr, ring_cache, _ = T.decoder_forward_jit(
            arch, model.params, model.consts, tok, jnp.int32(t),
            ring_cache, None, None, quantize_acts=False,
            out_dtype=jnp.float32)
        lf, full_cache, _ = T.decoder_forward_jit(
            arch, model.params, model.consts, tok, jnp.int32(t),
            full_cache, None, None, quantize_acts=False,
            out_dtype=jnp.float32)
        if t in check_at:
            np.testing.assert_allclose(
                np.asarray(lr), np.asarray(lf), rtol=2e-4, atol=2e-4,
                err_msg=f"step {t}")


def test_chunked_prefill_equivalence(windowed_model):
    """A 300-token prompt prefilled through Wr-aligned chunks into a ring
    cache continues exactly like the full-capacity masked path."""
    gen = Generator(windowed_model)
    prompt_ids = list(np.random.RandomState(1).randint(4, 60, size=300))
    v = gen.model.target_vocabulary
    prompt = [v.to_token(int(t)) for t in prompt_ids]

    out_ring = gen.generate_batch(
        [prompt], max_length=8, include_prompt_in_result=False)[0]

    import os
    os.environ["CT2TPU_WINDOW_RING"] = "0"
    try:
        gen2 = Generator(windowed_model)
        out_full = gen2.generate_batch(
            [prompt], max_length=8, include_prompt_in_result=False)[0]
    finally:
        del os.environ["CT2TPU_WINDOW_RING"]

    assert out_ring.sequences_ids[0] == out_full.sequences_ids[0]


def test_windowed_beam_still_works(windowed_model):
    # Beam search keeps linear caches (chain attention); just verify it runs
    # and matches itself deterministically.
    gen = Generator(windowed_model)
    out = gen.generate_batch([["tok1", "tok2"]], beam_size=2, max_length=12,
                             include_prompt_in_result=False,
                             return_scores=True)[0]
    assert out.sequences_ids[0]


def test_continuous_batcher_with_window(windowed_model):
    gen = Generator(windowed_model)
    expected = gen.generate_batch(
        [["tok1", "tok2"]], max_length=10,
        include_prompt_in_result=False)[0]
    cb = ContinuousBatcher(gen, num_slots=2, capacity=512)
    try:
        r = cb.submit(["tok1", "tok2"], max_length=10).result(timeout=300)
        assert r.sequences_ids[0] == expected.sequences_ids[0]
    finally:
        cb.close()


def test_continuous_batcher_window_long_prompt(windowed_model):
    """Prompts longer than the ring block run the chunked prefill path
    and match the Generator's chunked prefill exactly."""
    gen = Generator(windowed_model)
    prompt = [f"tok{1 + i % 4}" for i in range(300)]  # > ring block 128
    expected = gen.generate_batch(
        [prompt], max_length=10, include_prompt_in_result=False)[0]
    cb = ContinuousBatcher(gen, num_slots=2, capacity=512)
    try:
        r = cb.submit(prompt, max_length=10).result(timeout=600)
        assert r.sequences_ids[0] == expected.sequences_ids[0]
    finally:
        cb.close()


def test_long_generation_crosses_ring(windowed_model):
    """Greedy generation that wraps the ring (device loop path) matches
    the mask-only full-capacity path."""
    gen = Generator(windowed_model)
    out_ring = gen.generate_batch(
        [["tok1", "tok2", "tok3"]], max_length=300, min_length=300,
        include_prompt_in_result=False)[0]
    assert len(out_ring.sequences_ids[0]) == 300

    import os
    os.environ["CT2TPU_WINDOW_RING"] = "0"
    try:
        gen2 = Generator(windowed_model)
        out_full = gen2.generate_batch(
            [["tok1", "tok2", "tok3"]], max_length=300, min_length=300,
            include_prompt_in_result=False)[0]
    finally:
        del os.environ["CT2TPU_WINDOW_RING"]
    # Greedy argmax chains can drift after hundreds of steps from float
    # reduction-order differences; require a long exact common prefix.
    a, b = out_ring.sequences_ids[0], out_full.sequences_ids[0]
    common = sum(1 for x, y in zip(a, b) if x == y)
    assert a[:64] == b[:64] and common >= 250
