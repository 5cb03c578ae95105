"""Streamed file translation with throughput stats.

    python examples/translate_file.py --model ende_ct2 \
        --src input.tok --out output.tok --beam 2 --compute int8
"""

import argparse


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", required=True)
    p.add_argument("--src", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--beam", type=int, default=2)
    p.add_argument("--compute", default="default")
    p.add_argument("--max_batch_size", type=int, default=32)
    p.add_argument("--batch_type", default="examples",
                   choices=["examples", "tokens"])
    args = p.parse_args()

    import ctranslate2_tpu

    translator = ctranslate2_tpu.Translator(
        args.model, compute_type=args.compute)
    stats = translator.translate_file(
        args.src, args.out, max_batch_size=args.max_batch_size,
        batch_type=args.batch_type, beam_size=args.beam)
    secs = stats.total_time_in_ms / 1000.0
    print(f"{stats.num_examples} sentences, {stats.num_tokens} target "
          f"tokens in {secs:.1f}s ({stats.num_tokens / secs:.1f} tok/s)")


if __name__ == "__main__":
    main()
