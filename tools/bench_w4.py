"""W4 strategy microbench: per-M crossover for the batch-adaptive W4
dispatch (VERDICT r4 item 2; reference anchor: the AWQ GEMM's
>=1024-token dequantize-then-GEMM fallback,
/root/reference/src/layers/common.cc:408-425).

Times every W4 execution strategy at Llama-8B layer geometry
(K=4096 -> N=14336 by default) across a sweep of M (token rows):

  w4p        Pallas packed-nibble kernel (0.5 B/weight HBM; VPU unpack)
  w4p_fold   scale-folded packed kernel (one big dot per half per k-step)
  w4p_xla    XLA unpack+dequant+dot fallback (materializes f32 weights
             unless XLA fuses the dequant into the dot operand)
  w4         Pallas unpacked (q-z) int8 kernel (1 B/weight, no unpack)
  w4_fold    scale-folded unpacked kernel
  w4_xla     XLA dequant+dot on the unpacked payload
  w8a8       Pallas int8xint8 kernel (the INT8 baseline to beat)

Timing protocol (see .claude/skills/verify: the tunnel can ACK at
dispatch): each strategy runs `reps` calls inside one timed region and
syncs with a scalar fetch of the summed outputs.

Usage:
    PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_w4.py \
        [--ms 4,8,16,32,64,128,256] [--n 14336] [--reps 20]

Prints one JSON line per (M, strategy) with ms/call and effective GB/s
of weight traffic, plus a summary of the fastest strategy per M.
"""

import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ms", default="4,8,16,32,64,128,256,512")
    ap.add_argument("--k", type=int, default=4096)
    ap.add_argument("--n", type=int, default=14336)
    ap.add_argument("--g", type=int, default=128)
    ap.add_argument("--reps", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from ctranslate2_tpu.kernels import quant_matmul as qm

    K, N, G = args.k, args.n, args.g
    rng = np.random.default_rng(0)
    q4 = rng.integers(0, 16, (K, N)).astype(np.int32)
    packed = jnp.asarray(
        (q4[: K // 2] | (q4[K // 2:] << 4)).astype(np.uint8).view(np.int8))
    gs = jnp.asarray((rng.random((K // G, N)) * 0.01 + 0.001)
                     .astype(np.float32))
    zs = jnp.asarray((rng.random((K // G, N)) * 0.05).astype(np.float32))
    w4 = jnp.asarray(rng.integers(-15, 16, (K, N)).astype(np.int8))
    wq = jnp.asarray(rng.integers(-127, 128, (K, N)).astype(np.int8))
    ws = jnp.asarray(np.full((N,), 127.0 / 0.05, np.float32))

    def xla_w4p(x, packed, gs, zs):
        u = packed.astype(jnp.int32) & 0xFF
        q = jnp.concatenate([u & 0xF, (u >> 4) & 0xF], axis=0)
        n_groups = gs.shape[0]
        w = (q.astype(jnp.float32).reshape(n_groups, K // n_groups, N)
             * gs[:, None, :]
             - jnp.repeat(zs, K // n_groups, axis=0)
             .reshape(n_groups, K // n_groups, N)).reshape(K, N)
        return jnp.dot(x, w, preferred_element_type=jnp.float32)

    def xla_w4(x, w4, gs):
        n_groups = gs.shape[0]
        w = (w4.astype(jnp.float32).reshape(n_groups, K // n_groups, N)
             * gs[:, None, :]).reshape(K, N)
        return jnp.dot(x, w, preferred_element_type=jnp.float32)

    def w8a8(x, wq, ws):
        from ctranslate2_tpu.ops.linear import quantize_per_row

        q, a_s = quantize_per_row(x)
        return qm.matmul_w8a8(q, wq, a_s, ws)

    strategies = {
        "w4p": lambda x: qm.matmul_w4p(x, packed, gs, zs),
        "w4p_fold": lambda x: qm.matmul_w4p_fold(x, packed, gs, zs),
        "w4p_xla": lambda x: xla_w4p(x, packed, gs, zs),
        "w4": lambda x: qm.matmul_w4a16(x, w4, gs),
        "w4_fold": lambda x: qm.matmul_w4a16_fold(x, w4, gs),
        "w4_xla": lambda x: xla_w4(x, w4, gs),
        "w8a8": lambda x: w8a8(x, wq, ws),
    }
    bytes_per = {
        "w4p": K * N // 2, "w4p_fold": K * N // 2, "w4p_xla": K * N // 2,
        "w4": K * N, "w4_fold": K * N, "w4_xla": K * N, "w8a8": K * N,
    }

    best = {}
    for M in [int(m) for m in args.ms.split(",")]:
        x = jnp.asarray(rng.standard_normal((M, K)).astype(np.float32))
        for name, fn in strategies.items():
            reps = args.reps

            @jax.jit
            def run(x):
                # Each call depends on the previous result (acc*1e-20
                # perturbation): serializes the reps and defeats CSE, so
                # the timed region really runs `reps` matmuls.
                acc = jnp.float32(0)
                for _ in range(reps):
                    y = fn(x + acc * 1e-20)
                    acc = acc + y[0, 0]
                return acc

            try:
                np.asarray(run(x))  # compile + warm
                t0 = time.perf_counter()
                np.asarray(run(x))  # scalar fetch = real sync
                dt = (time.perf_counter() - t0) / reps
            except Exception as e:  # noqa: BLE001
                print(json.dumps({"m": M, "strategy": name,
                                  "error": str(e)[:120]}))
                continue
            row = {
                "m": M, "strategy": name,
                "ms_per_call": round(dt * 1e3, 3),
                "weight_gbps": round(bytes_per[name] / dt / 1e9, 1),
            }
            print(json.dumps(row), flush=True)
            if M not in best or dt < best[M][1]:
                best[M] = (name, dt)
    print(json.dumps({"summary_best_per_m": {
        str(m): {"strategy": n, "ms": round(d * 1e3, 3)}
        for m, (n, d) in sorted(best.items())}}))


if __name__ == "__main__":
    main()
