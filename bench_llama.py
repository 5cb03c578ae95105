"""Llama-8B-geometry INT8 decode benchmark on one chip.

BASELINE.json's north star compares tokens/sec/chip against CTranslate2
INT8 on an A100 for Llama-3-8B. This benchmark measures this engine's
decode throughput on the real Llama-3-8B geometry (32 layers, d=4096,
32q/8kv heads, ffn=14336, vocab=128256) with INT8 weights fabricated
directly in quantized form (no float intermediates), running the
whole-generation greedy loop.

Prints ONE JSON line. Tune with LLAMA_BATCH / LLAMA_PREFILL / LLAMA_DECODE /
LLAMA_LAYERS (reduce layers for a quick smoke run).
"""

import json
import os
import time

import numpy as np

BATCH = int(os.environ.get("LLAMA_BATCH", "4"))
PREFILL = int(os.environ.get("LLAMA_PREFILL", "128"))
DECODE = int(os.environ.get("LLAMA_DECODE", "256"))
LAYERS = int(os.environ.get("LLAMA_LAYERS", "32"))
D_MODEL = int(os.environ.get("LLAMA_D_MODEL", "4096"))
D_FF = int(os.environ.get("LLAMA_FF", "14336"))
VOCAB = int(os.environ.get("LLAMA_VOCAB", "128256"))
HEADS, HEADS_KV = 32, 8
QUANT = os.environ.get("LLAMA_QUANT", "int8")  # int8 | w4


def build_llama_int8_modelfile(layers=None, quant=None):
    """Fabricate the geometry directly as int8 payloads + scales."""
    from ctranslate2_tpu.formats.model_file import ModelFile, make_variable

    LAYERS = layers if layers is not None else globals()["LAYERS"]
    QUANT = quant if quant is not None else globals()["QUANT"]
    rng = np.random.default_rng(0)
    mf = ModelFile(spec_name="TransformerDecoderSpec", spec_revision=8,
                   binary_version=6)
    mf.config = {"unk_token": "<unk>", "bos_token": "<s>",
                 "eos_token": "</s>", "layer_norm_epsilon": 1e-5}
    if QUANT == "w4":
        mf.config.update({"quantization_type": 1, "quantization_bits": 4,
                          "quantization_group_size": 128})

    def add(name, value, dtype=None):
        mf.variables[name] = make_variable(name, value, dtype)

    def lin(scope, out_dim, in_dim, seed):
        r = np.random.default_rng(seed)
        if QUANT == "w4":
            # AWQ on-disk layout: int32-packed nibbles [in, out/8]
            # (values are random; only the memory/throughput shape matters).
            G = 128
            add(f"{scope}/weight",
                r.integers(-2**31, 2**31 - 1, (in_dim, out_dim // 8),
                           dtype=np.int64).astype(np.int32), "int32")
            add(f"{scope}/weight_scale",
                np.full((in_dim // G, out_dim), 0.01, np.float32))
            add(f"{scope}/weight_zero",
                np.full((in_dim // G, out_dim // 8), 0x77777777, np.int32),
                "int32")
        else:
            add(f"{scope}/weight",
                r.integers(-127, 128, (out_dim, in_dim), dtype=np.int8),
                "int8")
            add(f"{scope}/weight_scale",
                np.full((out_dim,), 127.0 / 0.05, np.float32))

    sc = "decoder"
    add(f"{sc}/num_heads", HEADS, "int16")
    add(f"{sc}/pre_norm", 1, "int8")
    add(f"{sc}/activation", 2, "int8")  # swish
    add(f"{sc}/scale_embeddings", 0, "int8")
    head_dim = D_MODEL // HEADS

    add(f"{sc}/embeddings/weight",
        rng.integers(-127, 128, (VOCAB, D_MODEL), dtype=np.int8), "int8")
    add(f"{sc}/embeddings/weight_scale",
        np.full((VOCAB,), 127.0 / 0.05, np.float32))
    add(f"{sc}/layer_norm/gamma", np.ones(D_MODEL, np.float32))
    lin(f"{sc}/projection", VOCAB, D_MODEL, 1)

    for i in range(LAYERS):
        ls = f"{sc}/layer_{i}"
        asc = f"{ls}/self_attention"
        qkv_out = HEADS * head_dim + 2 * HEADS_KV * head_dim
        lin(f"{asc}/linear_0", qkv_out, D_MODEL, 10 + i)
        lin(f"{asc}/linear_1", D_MODEL, HEADS * head_dim, 1000 + i)
        add(f"{asc}/layer_norm/gamma", np.ones(D_MODEL, np.float32))
        add(f"{asc}/num_heads_kv", HEADS_KV, "int32")
        add(f"{asc}/rotary_dim", 0, "int32")
        add(f"{asc}/rotary_interleave", 0, "int8")
        add(f"{asc}/rotary_base", 500000.0, "float32")
        lin(f"{ls}/ffn/linear_0", D_FF, D_MODEL, 2000 + i)
        lin(f"{ls}/ffn/linear_0_noact", D_FF, D_MODEL, 3000 + i)
        lin(f"{ls}/ffn/linear_1", D_MODEL, D_FF, 4000 + i)
        add(f"{ls}/ffn/layer_norm/gamma", np.ones(D_MODEL, np.float32))
    return mf


def main():
    import jax.numpy as jnp

    from ctranslate2_tpu.decoding.engine import DecodingEngine
    from ctranslate2_tpu.decoding.options import DecodingOptions
    from ctranslate2_tpu.models.loader import load_model
    from ctranslate2_tpu.models import transformer as T

    t0 = time.perf_counter()
    mf = build_llama_int8_modelfile()
    print(f"# fabricated int8 weights in {time.perf_counter() - t0:.1f}s",
          flush=True)

    t0 = time.perf_counter()
    model = load_model(mf, compute_type="int8", max_positions=2048)
    engine = DecodingEngine(model)
    print(f"# loaded to device in {time.perf_counter() - t0:.1f}s", flush=True)

    rng = np.random.default_rng(7)
    capacity = ((PREFILL + DECODE + 64) // 64) * 64
    prompts = rng.integers(10, VOCAB - 10, (BATCH, PREFILL)).tolist()

    def run():
        # Prefill the prompt then run the whole-generation greedy loop.
        cache = T.init_self_cache(model.arch, BATCH, capacity,
                                  dtype=model.kv_dtype,
                                  stacked=model.scan_layers)
        ids = jnp.asarray([p[:-1] for p in prompts], jnp.int32)
        _, cache, _ = T.decoder_forward_jit(
            model.arch, model.params, model.consts, ids,
            jnp.int32(0), cache, None, None,
            quantize_acts=model.policy.quantize_activations,
            out_dtype=model.out_dtype, return_logits=False)
        sampling = int(os.environ.get("LLAMA_SAMPLING", "0"))
        # LLAMA_SPEC > 1 turns on lossless self-speculation in the batch
        # device loop (prompt-lookup drafting): effective matmul M of
        # BATCH*K per verify dispatch — the README's identified lever for
        # small-batch MXU under-utilization.
        spec_k = int(os.environ.get("LLAMA_SPEC", "0"))
        opts = DecodingOptions(
            max_length=DECODE, min_length=DECODE, beam_size=1,
            sampling_topk=40 if sampling else 1,
            sampling_temperature=0.8 if sampling else 1.0,
            speculation_k=0 if sampling else spec_k)
        return engine.decode(
            [p[-1] for p in prompts], opts, cache=cache,
            start_step=PREFILL - 1, end_ids=(2,), capacity=capacity)

    t0 = time.perf_counter()
    run()
    compile_s = time.perf_counter() - t0
    print(f"# first call (compile) {compile_s:.1f}s", flush=True)

    t0 = time.perf_counter()
    results = run()
    elapsed = time.perf_counter() - t0
    total = sum(len(r.hypotheses[0]) for r in results)
    row = {
        "metric": f"llama8b_{QUANT}_decode_tokens_per_sec",
        "value": round(total / elapsed, 1),
        "unit": "tokens/s/chip",
        "batch": BATCH,
        "prefill": PREFILL,
        "decode": DECODE,
        "layers": LAYERS,
        "quant": QUANT,
        **roofline(elapsed / DECODE, BATCH, model),
    }
    spec_k = int(os.environ.get("LLAMA_SPEC", "0"))
    if spec_k > 1:
        row["speculation_k"] = spec_k
    print(json.dumps(row))


def roofline(step_s, batch, model):
    """Per-step HBM-traffic model and achieved-bandwidth fraction.

    Decode is weight/KV-bandwidth bound: every step must read all weight
    bytes once (weight-stationary, batch-amortized) plus each row's live
    KV prefix. Peak HBM defaults to TPU v5e (819 GB/s); override with
    TPU_HBM_GBPS.
    """
    head_dim = D_MODEL // HEADS
    qkv_out = HEADS * head_dim + 2 * HEADS_KV * head_dim
    per_layer = D_MODEL * qkv_out + D_MODEL * D_MODEL + 3 * D_MODEL * D_FF
    w_bytes = LAYERS * per_layer
    if QUANT == "w4":
        w_bytes = w_bytes // 2 + w_bytes // 128 * 4  # nibbles + group scales
    proj_bytes = VOCAB * D_MODEL * (1 if QUANT != "w4" else 0.5)
    emb_bytes = batch * D_MODEL  # one row gather per step per row
    import jax.numpy as jnp

    kv_elem = 1 if model.kv_dtype == jnp.int8 else 2
    avg_len = PREFILL + DECODE / 2
    chunk = int(os.environ.get("CT2TPU_DECODE_CHUNK", "128"))
    if chunk:
        avg_len = ((avg_len + chunk - 1) // chunk) * chunk  # chunked reads
    kv_bytes = LAYERS * 2 * HEADS_KV * head_dim * avg_len * kv_elem * batch
    total_bytes = w_bytes + proj_bytes + emb_bytes + kv_bytes
    peak = float(os.environ.get("TPU_HBM_GBPS", "819")) * 1e9
    achieved = total_bytes / step_s
    return {
        "step_ms": round(step_s * 1000.0, 3),
        "hbm_model_gb_per_step": round(total_bytes / 1e9, 3),
        "weight_gb": round((w_bytes + proj_bytes) / 1e9, 3),
        "kv_gb": round(kv_bytes / 1e9, 3),
        "achieved_gbps": round(achieved / 1e9, 1),
        "hbm_roofline_frac": round(achieved / peak, 3),
    }


def sweep():
    """Batch-scaling sweep: tokens/s + roofline fraction per batch size
    (VERDICT round-1 item 7). Run with LLAMA_SWEEP='8,16,32,64'."""
    global BATCH
    for b in [int(x) for x in os.environ["LLAMA_SWEEP"].split(",")]:
        BATCH = b
        main()


def prefill_suite():
    """Prefill measurement (VERDICT r4 item 4): tokens/s, step time and
    MFU at real 8B geometry for prompt lengths LLAMA_PREFILL_SUITE
    (e.g. '512,2048,8192'), flash kernel vs XLA attention — re-derives
    the CT2TPU_FLASH_MIN_LEN crossover at full-model scale (reference
    anchor: the FA2 prefill path, src/ops/flash_attention_gpu.cu).

    MFU is reported against the bf16 MXU peak (TPU_BF16_TFLOPS, default
    197 for v5e); the linear layers actually run int8xint8 (2x peak), so
    the bf16-relative figure is conservative.
    """
    import jax
    import jax.numpy as jnp

    from ctranslate2_tpu.models.loader import load_model
    from ctranslate2_tpu.models import transformer as T

    lengths = [int(x) for x in os.environ["LLAMA_PREFILL_SUITE"].split(",")]
    B = BATCH
    t0 = time.perf_counter()
    mf = build_llama_int8_modelfile()
    model = load_model(mf, compute_type="int8",
                       max_positions=max(lengths) + 64)
    print(f"# fabricated+loaded in {time.perf_counter() - t0:.1f}s",
          flush=True)

    head_dim = D_MODEL // HEADS
    qkv_out = HEADS * head_dim + 2 * HEADS_KV * head_dim
    per_layer = D_MODEL * qkv_out + D_MODEL * D_MODEL + 3 * D_MODEL * D_FF
    peak = float(os.environ.get("TPU_BF16_TFLOPS", "197")) * 1e12
    rng = np.random.default_rng(1)

    for P in lengths:
        ids = jnp.asarray(rng.integers(10, VOCAB - 10, (B, P)), jnp.int32)
        cap = ((P + 63) // 64) * 64
        for flash in ("1", "0"):
            os.environ["CT2TPU_FLASH"] = flash
            jax.clear_caches()

            def run():
                cache = T.init_self_cache(
                    model.arch, B, cap, dtype=model.kv_dtype,
                    stacked=model.scan_layers)
                _, cache2, _ = T.decoder_forward_jit(
                    model.arch, model.params, model.consts, ids,
                    jnp.int32(0), cache, None, None,
                    quantize_acts=model.policy.quantize_activations,
                    out_dtype=model.out_dtype, return_logits=False,
                    fresh_prefill=True)
                leaf = (cache2["k"] if T.cache_is_stacked(cache2)
                        else cache2[0]["k"])
                # Scalar fetch forces completion through the tunnel.
                return float(jnp.sum(leaf[0, 0, 0].astype(jnp.float32)))

            try:
                tc = time.perf_counter()
                run()  # compile
                compile_s = time.perf_counter() - tc
                times = []
                for _ in range(3):
                    tr = time.perf_counter()
                    run()
                    times.append(time.perf_counter() - tr)
                t = min(times)
            except Exception as e:  # noqa: BLE001
                print(json.dumps({
                    "metric": "llama8b_prefill", "prompt": P, "batch": B,
                    "flash": flash == "1", "error": str(e)[:160]}),
                    flush=True)
                continue
            lin_flops = 2 * B * P * per_layer * LAYERS
            attn_flops = 2 * B * HEADS * P * P * head_dim  # causal halves
            row = {
                "metric": "llama8b_prefill_tokens_per_sec",
                "value": round(B * P / t, 1),
                "unit": "tokens/s/chip",
                "prompt": P, "batch": B, "layers": LAYERS,
                "quant": QUANT,
                "flash": flash == "1",
                "time_ms": round(t * 1e3, 1),
                "compile_s": round(compile_s, 1),
                "mfu_vs_bf16_peak": round(
                    (lin_flops + attn_flops) / t / peak, 3),
                "attn_flops_frac": round(
                    attn_flops / (lin_flops + attn_flops), 3),
            }
            print(json.dumps(row), flush=True)


if __name__ == "__main__":
    if os.environ.get("LLAMA_PREFILL_SUITE"):
        prefill_suite()
    elif os.environ.get("LLAMA_SWEEP"):
        sweep()
    else:
        main()
