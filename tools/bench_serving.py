"""Serving benchmark: continuous batching vs run-to-completion batching.

Simulates online traffic with mixed generation lengths — the workload
where iteration-level batching wins: short requests joining mid-decode
don't wait for the longest request in a batch.

Usage:
    python tools/bench_serving.py [--model DIR] [--requests N]
        [--slots S] [--max-new MAX] [--seed K]

Without --model, a synthetic Llama-style decoder is fabricated in memory.
Prints one JSON line per engine with tokens/s and per-request latency.
"""

import argparse
import json
import random
import time


def make_model(args):
    if args.model:
        return args.model
    import tempfile

    from ctranslate2_tpu.converters.builder import build_decoder_only_model

    d = tempfile.mkdtemp(prefix="ct2tpu_serving_")
    return build_decoder_only_model(
        d, vocab_size=256, num_layers=args.layers, num_heads=8,
        d_model=args.d_model, d_ff=4 * args.d_model, num_heads_kv=4,
        rotary_dim=args.d_model // 8, glu=True, rms_norm=True,
        quantization=args.quantization)


class _ModelShim:
    """Generator-shaped wrapper for a LoadedModel (the continuous engines
    only touch ``.model``)."""

    def __init__(self, model):
        self.model = model


def make_llama8b(args):
    """Flagship-geometry serving target: the real Llama-3-8B shape
    (32L/d4096/32q8kv/ffn14336/V128256) with W4 (AWQ-layout) weights
    fabricated in memory — same fabrication as bench_llama.py, wrapped
    for the continuous engines. Returns (shim_generator, draft_or_None)."""
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import bench_llama

    from ctranslate2_tpu.formats.vocabulary import Vocabulary
    from ctranslate2_tpu.models.loader import load_model

    quant = args.quantization or "w4"
    mf = bench_llama.build_llama_int8_modelfile(quant=quant)
    max_pos = args.capacity + 64
    model = load_model(mf, compute_type="int8", max_positions=max_pos)
    V = bench_llama.VOCAB
    vocab = Vocabulary(["<unk>", "<s>", "</s>"]
                       + [f"t{i}" for i in range(V - 3)])
    model.target_vocabulary = vocab
    draft = None
    if args.draft_layers > 0:
        dmf = bench_llama.build_llama_int8_modelfile(
            layers=args.draft_layers, quant=quant)
        draft = load_model(dmf, compute_type="int8", max_positions=max_pos)
        draft.target_vocabulary = vocab
    return _ModelShim(model), draft


def gen_traffic(vocab, n, max_new, seed):
    rng = random.Random(seed)
    out = []
    for _ in range(n):
        plen = rng.randint(1, 12)
        prompt = [vocab[rng.randrange(len(vocab))] for _ in range(plen)]
        # Bimodal: mostly short replies, some long — the continuous-batching
        # sweet spot.
        new = rng.randint(4, 16) if rng.random() < 0.7 else rng.randint(
            max_new // 2, max_new)
        out.append((prompt, new))
    return out


def bench_continuous(gen, traffic, slots, capacity, speculation_k=0,
                     draft_model=None, steps_per_sync=8,
                     pipeline_depth=None):
    from ctranslate2_tpu import ContinuousBatcher

    cb = ContinuousBatcher(gen, num_slots=slots, capacity=capacity,
                           speculation_k=speculation_k,
                           draft_model=draft_model,
                           steps_per_sync=steps_per_sync,
                           pipeline_depth=pipeline_depth)
    try:
        # Warmup compile (generous: an 8B engine compile on a contended
        # host can exceed 10 minutes).
        cb.submit(traffic[0][0], max_length=4).result(timeout=3600)
        t0 = time.time()
        futures = [cb.submit(prompt, max_length=new)
                   for prompt, new in traffic]
        tokens = 0
        done_at = [None] * len(futures)

        def watch(i, f):
            f.result(timeout=3600)
            done_at[i] = time.time() - t0

        import threading
        watchers = [threading.Thread(target=watch, args=(i, f))
                    for i, f in enumerate(futures)]
        for w in watchers:
            w.start()
        for w in watchers:
            w.join()
        for f in futures:
            tokens += len(f.result().sequences_ids[0])
        dt = time.time() - t0
        latencies = done_at
        stats = cb.stats()
        spec_rate = stats["spec_tokens_per_dispatch"]
        extra = {
            "ttft_p50_ms": (round(stats["ttft_p50_ms"], 1)
                            if stats["ttft_p50_ms"] is not None else None),
            "ttft_p95_ms": (round(stats["ttft_p95_ms"], 1)
                            if stats["ttft_p95_ms"] is not None else None),
            "pipeline_depth": stats["pipeline_depth"],
            "mean_slot_occupancy": round(stats["mean_slot_occupancy"], 3),
        }
    finally:
        cb.close()
    return tokens, dt, latencies, spec_rate, extra


def bench_sequential(gen, traffic, slots):
    """Run-to-completion dynamic batching: groups of `slots` requests,
    each group decodes to its LONGEST member before the next starts."""
    # Warmup compile path.
    gen.generate_batch([traffic[0][0]], max_length=4,
                       include_prompt_in_result=False)
    t0 = time.time()
    tokens = 0
    latencies = []
    for i in range(0, len(traffic), slots):
        group = traffic[i:i + slots]
        results = gen.generate_batch(
            [p for p, _ in group],
            max_length=max(n for _, n in group),
            include_prompt_in_result=False)
        # All requests were available at t0; a group's members finish when
        # the group does (run-to-completion semantics).
        done = time.time() - t0
        for r, (_, new) in zip(results, group):
            tokens += min(len(r.sequences_ids[0]), new)
            latencies.append(done)
    dt = time.time() - t0
    return tokens, dt, latencies, None, {}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default=None)
    ap.add_argument("--requests", type=int, default=64)
    ap.add_argument("--slots", type=int, default=8)
    ap.add_argument("--capacity", type=int, default=512)
    ap.add_argument("--max-new", type=int, default=128)
    ap.add_argument("--layers", type=int, default=4)
    ap.add_argument("--d-model", type=int, default=256)
    ap.add_argument("--quantization", default=None)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--speculation_k", type=int, default=0,
                    help="also run the continuous engine with speculation")
    ap.add_argument("--draft_layers", type=int, default=0,
                    help=">0: fabricate an N-layer draft model (same "
                         "geometry/vocab) for draft-model speculation")
    ap.add_argument("--draft_model", default=None,
                    help="existing draft model directory")
    ap.add_argument("--llama8b", action="store_true",
                    help="serve the Llama-3-8B W4 geometry (fabricated "
                         "in memory; skips the sequential comparator — "
                         "bench_llama.py records the batch-API number)")
    ap.add_argument("--steps-per-sync", default="8",
                    help="comma list of block sizes to sweep (e.g. 1,4,8,16)")
    ap.add_argument("--slots-sweep", default=None,
                    help="comma list of slot counts to sweep (overrides "
                         "--slots, e.g. 8,16,32)")
    ap.add_argument("--pipeline-depth", default=None,
                    help="comma list of pipeline depths to sweep (1 = "
                         "lockstep, 2 = double-buffered dispatch)")
    args = ap.parse_args()

    blocks = [int(b) for b in str(args.steps_per_sync).split(",")]
    slot_list = ([int(s) for s in args.slots_sweep.split(",")]
                 if args.slots_sweep else [args.slots])
    depth_list = ([int(d) for d in args.pipeline_depth.split(",")]
                  if args.pipeline_depth else [None])

    draft = None
    if args.llama8b:
        gen, draft = make_llama8b(args)
        ids = list(range(10, 1010))
        traffic = gen_traffic(ids, args.requests, args.max_new, args.seed)
    else:
        from ctranslate2_tpu import Generator

        path = make_model(args)
        gen = Generator(path)
        tv = gen.model.target_vocabulary
        vocab = [tv.to_token(i) for i in range(len(tv))]
        vocab = [t for t in vocab if not t.startswith("<")][:200]
        traffic = gen_traffic(vocab, args.requests, args.max_new, args.seed)

        draft = args.draft_model
        if draft is None and args.draft_layers > 0:
            import tempfile

            from ctranslate2_tpu.converters.builder import (
                build_decoder_only_model,
            )

            # Match the target model's vocabulary so the draft verifies.
            tv_full = gen.model.target_vocabulary
            draft = build_decoder_only_model(
                tempfile.mkdtemp(prefix="bench_draft_"),
                vocab_size=len(tv_full),
                vocabulary=[tv_full.to_token(i) for i in range(len(tv_full))],
                num_layers=args.draft_layers, num_heads=8,
                d_model=args.d_model, d_ff=4 * args.d_model, num_heads_kv=4,
                rotary_dim=args.d_model // 8, glu=True, rms_norm=True)

    runs = []
    if not args.llama8b:
        runs.append(
            ("sequential", lambda: bench_sequential(gen, traffic,
                                                    args.slots)))
    sweep = len(blocks) > 1 or len(slot_list) > 1 or len(depth_list) > 1
    for s in slot_list:
        for b in blocks:
            for d in depth_list:
                name = "continuous" if not sweep else (
                    f"continuous/slots{s}/block{b}"
                    + (f"/depth{d}" if d is not None else ""))
                runs.append((name, lambda s=s, b=b, d=d: bench_continuous(
                    gen, traffic, s, args.capacity, steps_per_sync=b,
                    pipeline_depth=d)))
    if args.speculation_k > 1:
        runs.append(("continuous+spec", lambda: bench_continuous(
            gen, traffic, args.slots, args.capacity,
            speculation_k=args.speculation_k,
            steps_per_sync=blocks[0])))
        if draft is not None:
            runs.append(("continuous+draft", lambda: bench_continuous(
                gen, traffic, args.slots, args.capacity,
                speculation_k=args.speculation_k, draft_model=draft,
                steps_per_sync=blocks[0])))

    for name, fn in runs:
        tokens, dt, lat, spec_rate, extra = fn()
        lat.sort()
        row = {
            "engine": name,
            "requests": len(traffic),
            "tokens": tokens,
            "tokens_per_s": round(tokens / dt, 1),
            "total_s": round(dt, 2),
            "p50_latency_s": round(lat[len(lat) // 2], 3),
            "p95_latency_s": round(lat[int(len(lat) * 0.95)], 3),
        }
        row.update(extra)
        if args.llama8b:
            row["model"] = "llama3-8b-" + (args.quantization or "w4")
        if spec_rate is not None:
            row["spec_tokens_per_dispatch"] = round(spec_rate, 2)
        print(json.dumps(row))


if __name__ == "__main__":
    main()
