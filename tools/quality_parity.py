"""Quality-parity harness: the accuracy contract, measured.

The reference publishes BLEU next to every throughput number
(reference README.md:86-126) with the contract "INT8 within ~±0.1 BLEU
of FP32" on newstest2014. Its CI downloads the evaluation corpora from
S3; this environment has no egress, so this harness measures the same
contract self-contained:

1. Transliteration quantization parity: translate a deterministic
   synthetic source corpus with the bundled reference models
   (fp32 v2 / int8 v2 / int16 v2 / v1 fp32+int16) and with
   quantize-on-load compute types, using the fp32 model's beam outputs
   as the reference. Reports BLEU (sacrebleu) + exact-match rate of
   every quantized mode against fp32. Parity = BLEU ≈ 100 / EM ≈ 1.0
   — a STRICTER check than equal corpus BLEU: it requires the
   quantized model to produce the same translations, not merely
   equally-scored ones.

2. AWQ-INT4 perplexity parity on a Llama-geometry model: build the
   same random-weight model in float16 and AWQ-INT4 (group scales +
   zero points), score identical token sequences, and report the
   perplexity delta of W4 vs the float path.

Usage: python tools/quality_parity.py [--examples N] [--json out.json]
"""

from __future__ import annotations

import argparse
import json
import math
import random


MODELS = "/root/reference/tests/data/models"


def _load_vocab_tokens(path):
    toks = []
    with open(path, encoding="utf-8") as f:
        for line in f:
            t = line.rstrip("\n")
            if t and not (t.startswith("<") and t.endswith(">")):
                toks.append(t)
    return toks


def make_corpus(n, seed=1234):
    """Deterministic synthetic Arabic-character source corpus."""
    src_vocab = _load_vocab_tokens(
        f"{MODELS}/v2/aren-transliteration/source_vocabulary.txt")
    rng = random.Random(seed)
    corpus = []
    for _ in range(n):
        length = rng.randint(3, 12)
        corpus.append([rng.choice(src_vocab) for _ in range(length)])
    return corpus


def bleu(hyps, refs):
    try:
        import sacrebleu

        return round(sacrebleu.corpus_bleu(
            [" ".join(h) for h in hyps],
            [[" ".join(r) for r in refs]]).score, 2)
    except ImportError:
        # Sentence-level unigram-to-4gram BLEU fallback.
        import collections

        def ngrams(seq, n):
            return collections.Counter(
                tuple(seq[i:i + n]) for i in range(len(seq) - n + 1))

        log_p = 0.0
        hyp_len = ref_len = 0
        for n in range(1, 5):
            match = total = 0
            for h, r in zip(hyps, refs):
                hn, rn = ngrams(h, n), ngrams(r, n)
                match += sum((hn & rn).values())
                total += max(sum(hn.values()), 1)
            log_p += math.log(max(match, 1e-9) / total) / 4
        hyp_len = sum(len(h) for h in hyps)
        ref_len = sum(len(r) for r in refs)
        bp = math.exp(min(0.0, 1.0 - ref_len / max(hyp_len, 1)))
        return round(100.0 * bp * math.exp(log_p), 2)


def translit_parity(n_examples):
    from ctranslate2_tpu import Translator

    corpus = make_corpus(n_examples)

    def run(model_dir, compute="default"):
        t = Translator(model_dir, compute_type=compute)
        out = t.translate_batch(corpus, beam_size=4, max_batch_size=64)
        return [r.hypotheses[0] for r in out]

    scorer = Translator(f"{MODELS}/v2/aren-transliteration")

    def mean_score(hyps):
        """Mean per-token fp32-model score of the hypotheses — the quality
        judge when outputs differ (mirrors how the reference's int8 BLEU
        26.78 ≈ fp32 26.77 holds although their translations differ)."""
        results = scorer.score_batch(corpus, hyps, max_batch_size=64)
        scores = [r.normalized_score() for r in results if r.tokens_score]
        return sum(scores) / max(len(scores), 1)

    reference = run(f"{MODELS}/v2/aren-transliteration")
    ref_score = mean_score(reference)
    results = []
    cases = [
        ("v2-int8-artifact", f"{MODELS}/v2/aren-transliteration-i8", "default"),
        ("v2-int16-artifact", f"{MODELS}/v2/aren-transliteration-i16", "default"),
        ("v1-fp32-artifact", f"{MODELS}/v1/aren-transliteration", "default"),
        ("v1-int16-artifact", f"{MODELS}/v1/aren-transliteration-i16", "default"),
        ("fp32-as-int8", f"{MODELS}/v2/aren-transliteration", "int8"),
        ("fp32-as-int8_float16", f"{MODELS}/v2/aren-transliteration",
         "int8_float16"),
        ("fp32-as-float16", f"{MODELS}/v2/aren-transliteration", "float16"),
        ("fp32-as-bfloat16", f"{MODELS}/v2/aren-transliteration", "bfloat16"),
    ]
    for name, path, compute in cases:
        hyps = run(path, compute)
        em = sum(1 for h, r in zip(hyps, reference) if h == r) / len(reference)
        results.append({
            "case": name,
            "bleu_vs_fp32": bleu(hyps, reference),
            "exact_match": round(em, 4),
            "fp32_score_delta": round(mean_score(hyps) - ref_score, 4),
        })
    return results


def awq_perplexity(n_examples=32, seq_len=64):
    """Perplexity delta: AWQ-INT4 weights vs the same weights in fp16."""
    import tempfile

    import numpy as np

    from ctranslate2_tpu import Generator
    from ctranslate2_tpu.converters.builder import build_decoder_only_model

    kw = dict(vocab_size=256, num_layers=4, num_heads=8, d_model=256,
              d_ff=1024, num_heads_kv=4, rotary_dim=32, glu=True,
              rms_norm=True, seed=7)
    d_float = build_decoder_only_model(
        tempfile.mkdtemp(prefix="qp_f_"), quantization="float16", **kw)
    d_awq = build_decoder_only_model(
        tempfile.mkdtemp(prefix="qp_awq_"), quantization="awq_gemm", **kw)

    gen_f = Generator(d_float)
    v = gen_f.model.target_vocabulary
    vocab = [v.to_token(i) for i in range(4, min(len(v), 250))]
    rng = random.Random(99)
    seqs = [[rng.choice(vocab) for _ in range(seq_len)]
            for _ in range(n_examples)]

    def ppl(gen):
        total = 0.0
        count = 0
        for r in gen.score_batch(seqs, max_batch_size=16):
            total += sum(r.tokens_score)
            count += len(r.tokens_score)
        return math.exp(-total / max(count, 1))

    p_f = ppl(gen_f)
    p_awq = ppl(Generator(d_awq))
    return {
        "float16_ppl": round(p_f, 4),
        "awq_int4_ppl": round(p_awq, 4),
        "rel_delta_pct": round(100.0 * (p_awq - p_f) / p_f, 3),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--examples", type=int, default=500)
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    report = {
        "transliteration_quantization_parity": translit_parity(args.examples),
        "awq_perplexity_parity": awq_perplexity(),
    }
    text = json.dumps(report, indent=2)
    print(text)
    if args.json:
        with open(args.json, "w") as f:
            f.write(text + "\n")


if __name__ == "__main__":
    main()
