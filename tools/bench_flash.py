"""Flash-attention crossover benchmark: Pallas kernel vs the XLA path.

Measures causal self-attention (the prefill/scoring shape) at several
sequence lengths to find where the flash kernel beats XLA fusion — the
evidence behind the CT2TPU_FLASH_MIN_LEN default.

Usage (on TPU):
    python tools/bench_flash.py [--heads 16] [--head-dim 128] [--batch 4]
        [--lengths 256,512,1024,2048,4096,8192]
"""

import argparse
import json
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--heads", type=int, default=16)
    ap.add_argument("--heads-kv", type=int, default=16)
    ap.add_argument("--head-dim", type=int, default=128)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--lengths", default="256,512,1024,2048,4096,8192")
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--alibi", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from ctranslate2_tpu.kernels.flash_attention import flash_attention
    from ctranslate2_tpu.ops.attention import (
        causal_mask_bias, combine_bias, dot_product_attention)
    from ctranslate2_tpu.ops.positions import alibi_slopes

    B, H, Hkv, D = args.batch, args.heads, args.heads_kv, args.head_dim
    scale = 1.0 / (D ** 0.5)
    slopes = (jnp.asarray(alibi_slopes(H), jnp.float32)
              if args.alibi else None)

    for T in [int(x) for x in args.lengths.split(",")]:
        key = jax.random.PRNGKey(T)
        q = jax.random.normal(key, (B, H, T, D), jnp.bfloat16)
        k = jax.random.normal(key, (B, Hkv, T, D), jnp.bfloat16)
        v = jax.random.normal(key, (B, Hkv, T, D), jnp.bfloat16)

        def xla_fn(q, k, v):
            bias = causal_mask_bias(T, T)
            if slopes is not None:
                pos = jnp.arange(T, dtype=jnp.float32) - (T - 1)
                bias = combine_bias(
                    bias, (slopes[:, None, None] * pos[None, None, :])[None])
            return dot_product_attention(q, k, v, bias=bias,
                                         queries_scale=scale)

        def flash_fn(q, k, v):
            return flash_attention(q, k, v, scale=scale, causal=True,
                                   alibi_slopes=slopes,
                                   alibi_positive=False)

        row = {"T": T, "batch": B, "heads": H, "head_dim": D}
        for name, fn in (("xla", xla_fn), ("flash", flash_fn)):
            # Chain iterations through a fori_loop (each step consumes the
            # previous output) so device work is serialized — per-call
            # wall timing is unreliable through the TPU tunnel's async
            # dispatch.
            def chained(q, k, v, fn=fn):
                return jax.lax.fori_loop(
                    0, args.iters, lambda i, qq: fn(qq, k, v).astype(q.dtype),
                    q)

            try:
                import numpy as _np

                jf = jax.jit(chained)
                # A scalar FETCH is the only reliable sync through the TPU
                # tunnel (block_until_ready can return at dispatch).
                _np.asarray(jnp.sum(jf(q, k, v)).astype(jnp.float32))
                t0 = time.perf_counter()
                _np.asarray(jnp.sum(jf(q, k, v)).astype(jnp.float32))
                dt = (time.perf_counter() - t0) / args.iters
                row[f"{name}_ms"] = round(dt * 1000.0, 3)
            except Exception as e:  # noqa: BLE001
                row[f"{name}_ms"] = None
                row[f"{name}_error"] = f"{type(e).__name__}: {str(e)[:160]}"
        if row.get("xla_ms") and row.get("flash_ms"):
            row["flash_speedup"] = round(row["xla_ms"] / row["flash_ms"], 3)
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
