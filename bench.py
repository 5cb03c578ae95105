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

Caveats (recorded here because they shape the comparison): the primary
number is a random-weight throughput CEILING (min=max decoding length, 3
concurrent clients) — not an apples-to-apples corpus run. Two honesty
metrics accompany it in the same JSON line: the same setting under INT8
weights (the reference's flagship quantized mode), and a REAL-WEIGHTS run
of the bundled aren-transliteration model with natural EOS termination.

Prints ONE JSON line with all results (primary metric first).
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
MODES = os.environ.get("BENCH_MODES", "bf16,int8,aren").split(",")

AREN_MODEL = "/root/reference/tests/data/models/v2/aren-transliteration"


def run_synthetic(compute: str) -> float:
    """Transformer-base ceiling run at the given compute type; returns
    target tokens/s."""
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
        quantization="int8" if compute.startswith("int8") else None,
    )

    # One pool worker per client thread: synchronous translate_batch calls
    # route through the worker pool, so the pool must be as wide as the
    # client concurrency to keep host prep overlapped with device compute.
    clients = int(os.environ.get("BENCH_CLIENTS", "3"))
    translator = Translator(tmpdir, compute_type=compute,
                            inter_threads=clients)
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

    batches = [make_batch(i + 1) for i in range(ITERS)]
    start = time.perf_counter()
    with ThreadPoolExecutor(max_workers=clients) as pool:
        futures = [
            pool.submit(translator.translate_batch, b, **opts)
            for b in batches
        ]
        for f in futures:
            for r in f.result():
                total_tokens += len(r.hypotheses[0])
    elapsed = time.perf_counter() - start
    return total_tokens / elapsed


def run_aren() -> float:
    """REAL-weights secondary metric: the bundled aren-transliteration
    model (reference test fixture), natural EOS termination, beam=2.
    Returns target tokens/s."""
    from ctranslate2_tpu import Translator

    if not os.path.isdir(AREN_MODEL):
        return 0.0
    clients = int(os.environ.get("BENCH_CLIENTS", "3"))
    t = Translator(AREN_MODEL, inter_threads=clients)
    vocab = t._source_vocab
    tokens = [vocab.to_token(i) for i in range(4, len(vocab))]

    def make_batch(seed_offset):
        r = np.random.default_rng(2000 + seed_offset)
        batch = []
        for _ in range(BATCH_SIZE):
            length = int(r.integers(4, 12))
            batch.append([tokens[int(i)] for i in
                          r.integers(0, len(tokens), length)])
        return batch

    opts = dict(beam_size=BEAM, max_decoding_length=32)
    t.translate_batch(make_batch(0), **opts)  # warmup/compile

    from concurrent.futures import ThreadPoolExecutor

    total_tokens = 0
    batches = [make_batch(i + 1) for i in range(ITERS)]
    start = time.perf_counter()
    with ThreadPoolExecutor(max_workers=clients) as pool:
        futures = [pool.submit(t.translate_batch, b, **opts)
                   for b in batches]
        for f in futures:
            for r in f.result():
                total_tokens += len(r.hypotheses[0])
    elapsed = time.perf_counter() - start
    return total_tokens / elapsed


def main():
    out = {}
    if "bf16" in MODES:
        tps = run_synthetic(COMPUTE)
        out.update({
            "metric": "translation_target_tokens_per_sec",
            "value": round(tps, 1),
            "unit": "tokens/s",
            "vs_baseline": round(tps / BASELINE_TOKENS_PER_SEC, 3),
        })
    if "int8" in MODES:
        tps8 = run_synthetic("int8")
        out["int8_tokens_per_sec"] = round(tps8, 1)
        out["int8_vs_baseline_int8fp16"] = round(tps8 / 8725.4, 3)
    if "aren" in MODES:
        aren = run_aren()
        if aren:
            out["real_weights_aren_tokens_per_sec"] = round(aren, 1)
            out["real_weights_natural_termination"] = True
    print(json.dumps(out))


if __name__ == "__main__":
    main()
