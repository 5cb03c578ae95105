"""Benchmark harness: tokens/s, peak host memory, optional BLEU.

Parity analog of the reference's docker-based harness
(reference: tools/benchmark/benchmark.py:18-50): translates a tokenized
file, reporting target tokens/s and peak RSS; computes BLEU via sacrebleu
when available and a reference file is given.

Usage:
  python tools/benchmark.py --model <ct2_model_dir> --source src.tok \
      [--reference ref.detok] [--beam 4] [--batch 64] [--compute int8]
"""

from __future__ import annotations

import argparse
import json
import resource
import time


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", required=True)
    p.add_argument("--source", required=True, help="Tokenized source file")
    p.add_argument("--output", default="/tmp/bench_output.tok")
    p.add_argument("--reference", help="Reference file for BLEU (detok)")
    p.add_argument("--beam", type=int, default=4)
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--compute", default="default")
    p.add_argument("--num_runs", type=int, default=3)
    args = p.parse_args()

    from ctranslate2_tpu import Translator

    translator = Translator(args.model, compute_type=args.compute)

    stats_list = []
    for _ in range(args.num_runs):
        stats = translator.translate_file(
            args.source, args.output, max_batch_size=args.batch,
            beam_size=args.beam)
        stats_list.append(stats)

    best = max(stats_list,
               key=lambda s: s.num_tokens / (s.total_time_in_ms / 1000.0))
    tokens_per_sec = best.num_tokens / (best.total_time_in_ms / 1000.0)
    peak_rss_mb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0

    out = {
        "tokens_per_sec": round(tokens_per_sec, 1),
        "num_tokens": best.num_tokens,
        "num_examples": best.num_examples,
        "peak_host_memory_mb": round(peak_rss_mb, 1),
    }

    if args.reference:
        try:
            import sacrebleu

            with open(args.output, encoding="utf-8") as f:
                hyp = [line.replace(" ", "").replace("▁", " ").strip()
                       for line in f]
            with open(args.reference, encoding="utf-8") as f:
                ref = [line.strip() for line in f]
            out["bleu"] = round(
                sacrebleu.corpus_bleu(hyp, [ref]).score, 2)
        except ImportError:
            out["bleu"] = None

    print(json.dumps(out))


if __name__ == "__main__":
    main()
