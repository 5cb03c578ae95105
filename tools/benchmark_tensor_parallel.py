"""Tensor-parallel decode benchmark (analog of the reference's
tools/benchmark_tensor_parallel/ mpirun harness).

Measures per-step decode latency and throughput of a Llama-geometry
model under (data=1, model=N) meshes for every N that divides the
available device count, and reports scaling efficiency vs N=1. Run on a
TPU slice for real numbers; on CPU with
``XLA_FLAGS=--xla_force_host_platform_device_count=8`` it validates the
sharded step end to end (timings are then meaningless).

Usage:
    python tools/benchmark_tensor_parallel.py [--layers 8] [--d-model 1024]
        [--batch 8] [--steps 64] [--compute int8] [--mesh 1,2,4,8]
"""

import argparse
import json
import tempfile
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--layers", type=int, default=8)
    ap.add_argument("--d-model", type=int, default=1024)
    ap.add_argument("--heads", type=int, default=16)
    ap.add_argument("--heads-kv", type=int, default=8)
    ap.add_argument("--vocab", type=int, default=32000)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--prompt", type=int, default=32)
    ap.add_argument("--steps", type=int, default=64)
    ap.add_argument("--capacity", type=int, default=256)
    ap.add_argument("--compute", default="float16")
    ap.add_argument("--mesh", default=None,
                    help="Comma-separated TP sizes (default: divisors of "
                         "the device count)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from ctranslate2_tpu.converters.builder import build_decoder_only_model
    from ctranslate2_tpu.models import transformer as T
    from ctranslate2_tpu.models.loader import load_model
    from ctranslate2_tpu.parallel.sharding import (
        make_mesh, shard_consts, shard_params)

    n_dev = len(jax.devices())
    if args.mesh:
        tp_sizes = [int(x) for x in args.mesh.split(",")]
    else:
        tp_sizes = [n for n in (1, 2, 4, 8, 16) if n <= n_dev and
                    n_dev % n == 0 and args.heads_kv % n == 0]

    d = build_decoder_only_model(
        tempfile.mkdtemp(prefix="tp_bench_"),
        vocab_size=args.vocab, num_layers=args.layers, num_heads=args.heads,
        num_heads_kv=args.heads_kv, d_model=args.d_model,
        d_ff=4 * args.d_model, rotary_dim=args.d_model // args.heads,
        glu=True, rms_norm=True, activation="swish",
        quantization=None if args.compute in ("float16", "bfloat16",
                                              "float32") else args.compute)
    base = None
    for tp in tp_sizes:
        model = load_model(d, compute_type=args.compute, fuse_qkv=(tp == 1))
        arch = model.arch
        mesh = make_mesh(num_data=1, num_model=tp)
        params = shard_params(model.params, arch, mesh) if tp > 1 \
            else model.params
        consts = shard_consts(model.consts, mesh) if tp > 1 else model.consts
        quant = model.policy.quantize_activations

        B, P, C = args.batch, args.prompt, args.capacity

        def prefill(params, consts, ids):
            cache = T.init_self_cache(arch, B, C, dtype=model.kv_dtype)
            logits, cache, _ = T.decoder_forward(
                arch, params, consts, ids, jnp.int32(0), cache, None, None,
                quantize_acts=quant, out_dtype=model.out_dtype)
            return jnp.argmax(logits[:, -1], -1).astype(jnp.int32), cache

        def decode(params, consts, tokens, pos, cache):
            logits, cache, _ = T.decoder_forward(
                arch, params, consts, tokens[:, None], pos, cache,
                None, None, quantize_acts=quant, out_dtype=model.out_dtype)
            return jnp.argmax(logits[:, -1], -1).astype(jnp.int32), cache

        ids = jnp.ones((B, P), jnp.int32)
        ctx = jax.set_mesh(mesh) if tp > 1 else None
        if ctx:
            ctx.__enter__()
        try:
            prefill_j = jax.jit(prefill)
            decode_j = jax.jit(decode, donate_argnums=(4,))
            tokens, cache = prefill_j(params, consts, ids)
            # Warmup + compile.
            tokens, cache = decode_j(params, consts, tokens, jnp.int32(P),
                                     cache)
            jax.block_until_ready(tokens)
            t0 = time.time()
            for s in range(args.steps):
                tokens, cache = decode_j(params, consts, tokens,
                                         jnp.int32(P + 1 + s), cache)
            jax.block_until_ready(tokens)
            dt = time.time() - t0
        finally:
            if ctx:
                ctx.__exit__(None, None, None)

        step_ms = dt / args.steps * 1000.0
        toks = args.steps * B / dt
        if base is None:
            base = (tp, toks)
        eff = toks / (base[1] * tp / base[0])
        print(json.dumps({
            "tp": tp,
            "step_ms": round(step_ms, 3),
            "tokens_per_s": round(toks, 1),
            "scaling_efficiency_vs_tp1": round(eff, 3),
            "batch": B,
            "compute": args.compute,
        }))


if __name__ == "__main__":
    main()
