"""``ct2tpu-transformers-converter``: HF checkpoint -> model directory
(parity with the reference console script ``ct2-transformers-converter``,
reference: python/setup.py:110-118, converters/transformers.py CLI)."""

from __future__ import annotations

import argparse
import sys


def main(argv=None) -> int:
    p = argparse.ArgumentParser(
        "ct2tpu-transformers-converter",
        description="Convert a Hugging Face Transformers checkpoint")
    p.add_argument("--model", required=True,
                   help="Local path of the model to convert")
    p.add_argument("--output_dir", required=True)
    p.add_argument("--quantization", default=None,
                   choices=[None, "int8", "int8_float32", "int8_float16",
                            "int8_bfloat16", "int16", "float16", "bfloat16"])
    p.add_argument("--force", action="store_true")
    p.add_argument("--trust_remote_code", action="store_true")
    args = p.parse_args(argv)

    from ..converters.transformers_conv import TransformersConverter

    converter = TransformersConverter(
        args.model, trust_remote_code=args.trust_remote_code)
    out = converter.convert(args.output_dir, quantization=args.quantization,
                            force=args.force)
    print(out)
    return 0


if __name__ == "__main__":
    sys.exit(main())
