"""Benchmark: WMT14-style Transformer-base translation throughput.

Mirrors the reference's headline benchmark setting (En-De newstest2014,
target tokens/s, beam search — reference README.md benchmark tables,
produced by tools/benchmark/): a Transformer-base encoder-decoder
(6+6 layers, d_model=512, ffn=2048, 8 heads, 32k vocab), batches of
~25-token sentences, beam=2 (the reference's default beam size used by its
benchmark harness), target tokens/s measured end-to-end through the
Translator API.

Baseline: 10990.7 target tokens/s = CT2 float16 on an NVIDIA A10G
(reference README.md:115), the strongest published single-GPU number.

Prints ONE JSON line with the result.
"""

import json
import os
import tempfile
import time

import numpy as np

BASELINE_TOKENS_PER_SEC = 10990.7

BATCH_SIZE = int(os.environ.get("BENCH_BATCH", "256"))
SRC_LEN = int(os.environ.get("BENCH_SRC_LEN", "25"))
BEAM = int(os.environ.get("BENCH_BEAM", "2"))
MAX_DEC = int(os.environ.get("BENCH_MAX_DEC", "32"))
ITERS = int(os.environ.get("BENCH_ITERS", "8"))
COMPUTE = os.environ.get("BENCH_COMPUTE", "float16")  # bf16 on TPU


def main():
    from ctranslate2_tpu import Translator
    from ctranslate2_tpu.converters.builder import build_seq2seq_model

    tmpdir = tempfile.mkdtemp(prefix="bench_model_")
    build_seq2seq_model(
        tmpdir,
        vocab_size=32000,
        num_layers=6,
        num_heads=8,
        d_model=512,
        d_ff=2048,
        seed=7,
    )

    # One pool worker per client thread: synchronous translate_batch calls
    # route through the worker pool, so the pool must be as wide as the
    # client concurrency to keep host prep overlapped with device compute.
    translator = Translator(tmpdir, compute_type=COMPUTE,
                            inter_threads=int(os.environ.get(
                                "BENCH_CLIENTS", "3")))

    rng = np.random.default_rng(42)
    vocab = translator._source_vocab

    def make_batch(seed_offset):
        r = np.random.default_rng(1000 + seed_offset)
        batch = []
        for _ in range(BATCH_SIZE):
            length = int(r.integers(SRC_LEN - 5, SRC_LEN + 6))
            batch.append(
                [vocab.to_token(int(t)) for t in r.integers(3, 31990, length)]
            )
        return batch

    opts = dict(
        beam_size=BEAM,
        max_decoding_length=MAX_DEC,
        min_decoding_length=MAX_DEC,  # random weights: force full length
        return_scores=False,
    )

    # Warmup (compile).
    translator.translate_batch(make_batch(0), **opts)

    total_tokens = 0
    # Pipeline the iterations with concurrent client threads so host-side
    # batch prep and device<->host transfers overlap with device compute
    # (a serving deployment sees the same overlap from concurrent requests).
    from concurrent.futures import ThreadPoolExecutor

    workers = int(os.environ.get("BENCH_CLIENTS", "3"))
    batches = [make_batch(i + 1) for i in range(ITERS)]
    start = time.perf_counter()
    with ThreadPoolExecutor(max_workers=workers) as pool:
        futures = [
            pool.submit(translator.translate_batch, b, **opts)
            for b in batches
        ]
        for f in futures:
            for r in f.result():
                total_tokens += len(r.hypotheses[0])
    elapsed = time.perf_counter() - start

    tokens_per_sec = total_tokens / elapsed
    print(json.dumps({
        "metric": "translation_target_tokens_per_sec",
        "value": round(tokens_per_sec, 1),
        "unit": "tokens/s",
        "vs_baseline": round(tokens_per_sec / BASELINE_TOKENS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
