"""Whisper transcription with optional word-timestamp alignment.

Expects precomputed log-mel features (e.g. from
transformers.WhisperFeatureExtractor) saved as a .npy of shape
[batch, n_mels, frames].

    python examples/whisper_transcribe.py --model whisper_ct2 \
        --features mel.npy --language "<|en|>"
"""

import argparse


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", required=True)
    p.add_argument("--features", required=True)
    p.add_argument("--language", default=None,
                   help="language token; autodetected when omitted")
    p.add_argument("--beam", type=int, default=5)
    p.add_argument("--max_length", type=int, default=224,
                   help="decoding budget (Whisper's prompt+text limit)")
    p.add_argument("--align", action="store_true")
    args = p.parse_args()

    import numpy as np

    import ctranslate2_tpu

    model = ctranslate2_tpu.Whisper(args.model)
    feats = np.load(args.features)

    lang = args.language
    if lang is None:
        detected = model.detect_language(feats)
        lang = detected[0][0][0]
        print(f"detected language: {lang} (p={detected[0][0][1]:.2f})")

    prompt = ["<|startoftranscript|>", lang, "<|transcribe|>"]
    results = model.generate(feats, [prompt] * len(feats),
                             beam_size=args.beam,
                             max_length=args.max_length,
                             return_no_speech_prob=True)
    for i, r in enumerate(results):
        print(f"[{i}] {' '.join(r.sequences[0])} "
              f"(no_speech={r.no_speech_prob:.3f})")

    if args.align:
        v = model.model.target_vocabulary
        start_ids = [v.to_id(t) for t in prompt]
        text_ids = [[t for t in r.sequences_ids[0]] for r in results]
        aligns = model.align(feats, start_ids, text_ids,
                             num_frames=feats.shape[-1])
        for i, a in enumerate(aligns):
            print(f"[{i}] alignments: {a.alignments[:8]} ...")


if __name__ == "__main__":
    main()
