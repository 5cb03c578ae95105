"""Multi-process execution proof: N localhost processes, one global mesh.

The TPU-native analog of the reference's ``mpirun``-launched tensor
parallelism (reference: src/devices.cc:141-230 ScopedMPISetter + NCCL
bootstrap; docs/parallel.md:43-90): each process calls
``initialize_distributed`` (jax.distributed), the one-flag
``tensor_parallel=True`` path builds the GLOBAL mesh spanning every
process's devices, and ``generate_batch`` runs sharded end to end —
collectives cross the process boundary (gloo on CPU; ICI/DCN on real
TPU slices).

Run without arguments to self-spawn the workers (no mpirun needed):

    python tools/run_multiprocess.py --num-processes 2 --devices-per-process 4

Each worker prints ``MP_OK rank=i ...`` and asserts that
 (a) every rank computes identical outputs, and
 (b) they match a single-process (unsharded) reference run.

Set CT2TPU_MP_PHASES to a comma list (greedy,spec,beam,translator,
streaming,whisper) to isolate phases.
"""

from __future__ import annotations

import argparse
import json
import os
import socket
import subprocess
import sys
import tempfile

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

PROMPTS = [["tok1", "tok2"], ["tok3"], ["tok4", "tok1", "tok5"]]


def build_model(model_dir: str) -> None:
    from ctranslate2_tpu.converters.builder import (
        build_decoder_only_model,
        build_seq2seq_model,
        build_whisper_model,
    )

    build_decoder_only_model(
        model_dir, vocab_size=64, num_layers=2, num_heads=8, num_heads_kv=4,
        d_model=64, d_ff=128, rotary_dim=0, glu=True, rms_norm=True,
        activation="swish")
    build_seq2seq_model(model_dir + "_s2s", vocab_size=64, num_layers=2,
                        num_heads=8, d_model=64, d_ff=128)
    build_whisper_model(model_dir + "_whisper")


def run_generation(model_dir: str, tensor_parallel: bool):
    from ctranslate2_tpu import Generator

    g = Generator(model_dir, tensor_parallel=tensor_parallel)
    greedy = g.generate_batch(PROMPTS, max_length=8, return_scores=True)
    beam = g.generate_batch(PROMPTS[:1], beam_size=2, num_hypotheses=2,
                            max_length=8)
    return {
        "greedy": [r.sequences_ids for r in greedy],
        "scores": [[round(s, 4) for s in r.scores] for r in greedy],
        "beam": beam[0].sequences_ids,
        "mesh": (dict(g.model.mesh.shape) if g.model.mesh is not None
                 else None),
    }


CONT_TRAFFIC = [
    # (prompt, submit kwargs) — mixed lengths, per-request penalties,
    # stop sequences and end tokens through the continuous engine.
    (["tok1", "tok2"], {"max_length": 10}),
    (["tok3"], {"max_length": 6}),
    (["tok4", "tok1", "tok5"], {"max_length": 12,
                                "repetition_penalty": 1.3}),
    (["tok2", "tok4"], {"max_length": 8, "no_repeat_ngram_size": 2}),
    (["tok1"], {"max_length": 10, "stop_sequences": [[5, 25]]}),
    (["tok5", "tok3"], {"max_length": 7}),
]


def _follower_wait(batcher, name: str) -> None:
    """Follower-side phase wait that FAILS LOUDLY on a wedged replay
    loop instead of silently timing out (a silent timeout desyncs every
    later phase's collectives and wedges the leader)."""
    batcher.join(timeout=600)
    if batcher._thread.is_alive():
        raise RuntimeError(
            f"follower replay loop for phase {name!r} did not reach the "
            "leader's close within 600s (wedged collective?)")


def run_continuous(model_dir: str, tensor_parallel: bool):
    """Serve mixed traffic through the continuous engines (greedy
    blocks, speculative verify, beam, encoder-decoder, leader-side
    streaming callbacks, Whisper); on follower ranks each phase
    constructs the batcher (entering the follower replay loop) and
    waits for the leader's close. Returns the leader's results."""
    import jax

    from ctranslate2_tpu import ContinuousBatcher, Generator

    g = Generator(model_dir, tensor_parallel=tensor_parallel)
    follower = jax.process_count() > 1 and jax.process_index() != 0
    sel = os.environ.get("CT2TPU_MP_PHASES", "")
    selected = set(sel.split(",")) if sel else None

    def want(name):
        return selected is None or name in selected

    phases = [
        ("greedy", {"steps_per_sync": 4}, CONT_TRAFFIC),
        ("spec", {"speculation_k": 3}, CONT_TRAFFIC[:3]),
        ("beam", {"beam_size": 2}, [
            (["tok1", "tok2"], {"max_length": 10}),
            (["tok3"], {"max_length": 8, "num_hypotheses": 2}),
        ]),
    ]
    out = {}
    for name, kw, traffic in phases:
        if not want(name):
            continue
        cb = ContinuousBatcher(g, num_slots=2, capacity=64, **kw)
        if follower:
            _follower_wait(cb, name)
            continue
        try:
            futures = [cb.submit(p, **skw) for p, skw in traffic]
            results = [f.result(timeout=600) for f in futures]
            out[name] = {
                "sequences": [r.sequences_ids for r in results],
                "scores": [[round(s, 4) for s in r.scores]
                           for r in results],
            }
        finally:
            cb.close()

    # Encoder-decoder serving across hosts (the reference's flagship
    # mpirun mode is translation): per-slot cross-attention memory as
    # global arrays, encode replayed on followers.
    if want("translator"):
        from ctranslate2_tpu import ContinuousTranslator, Translator

        t = Translator(model_dir + "_s2s", tensor_parallel=tensor_parallel)
        ct = ContinuousTranslator(t, num_slots=2, capacity=64,
                                  max_source_len=16)
        if follower:
            _follower_wait(ct, "translator")
        else:
            try:
                srcs = [(["tok1", "tok2", "tok3"], {}),
                        (["tok4"], {"target_prefix": ["tok5", "tok6"]}),
                        (["tok2", "tok5"], {"repetition_penalty": 1.3})]
                futures = [ct.submit(s, max_length=12, **kw)
                           for s, kw in srcs]
                results = [f.result(timeout=600) for f in futures]
                out["translator"] = {
                    "sequences": [r.sequences_ids for r in results],
                    "scores": [[round(s, 4) for s in r.scores]
                               for r in results],
                }
            finally:
                ct.close()

    # Streaming callbacks across hosts: tokens are delivered on the
    # leader only; a callback-driven early stop is broadcast in the
    # next control record (runtime/continuous.py _leader_loop_inner),
    # so the result is identical to a single-process early stop.
    if want("streaming"):
        cb = ContinuousBatcher(g, num_slots=2, capacity=64,
                               steps_per_sync=4)
        if follower:
            _follower_wait(cb, "streaming")
        else:
            try:
                streamed = [[], []]
                stop_after = 3

                def on_tok_0(sr):
                    streamed[0].append(sr.token_id)
                    return False

                def on_tok_1(sr):
                    streamed[1].append(sr.token_id)
                    return len(streamed[1]) >= stop_after  # early stop

                f0 = cb.submit(PROMPTS[0], max_length=10,
                               callback=on_tok_0)
                f1 = cb.submit(PROMPTS[2], max_length=12,
                               callback=on_tok_1)
                r0 = f0.result(timeout=600)
                r1 = f1.result(timeout=600)
                out["streaming"] = {
                    "sequences": [r0.sequences_ids, r1.sequences_ids],
                    "streamed": streamed,
                    "scores": [[round(s, 4) for s in r0.scores],
                               [round(s, 4) for s in r1.scores]],
                }
                assert r1.sequences_ids[0] == streamed[1], (r1, streamed)
            finally:
                cb.close()

    # Whisper serving across hosts: mel features ride the admit record
    # (chunked broadcast); followers replay the speech encode.
    if want("whisper"):
        import numpy as np

        from ctranslate2_tpu import ContinuousWhisper, Whisper

        w = Whisper(model_dir + "_whisper",
                    tensor_parallel=tensor_parallel)
        rng = np.random.default_rng(0)
        feats = [rng.standard_normal((24, 64)).astype(np.float32)
                 for _ in range(3)]
        prompts = [
            ["<|startoftranscript|>", "<|en|>", "<|transcribe|>",
             "<|notimestamps|>"],
            ["<|startoftranscript|>", "<|en|>", "<|transcribe|>"],
            ["<|startoftranscript|>", "<|en|>", "<|transcribe|>",
             "<|notimestamps|>"],
        ]
        cw = ContinuousWhisper(w, num_slots=2, capacity=64)
        if follower:
            _follower_wait(cw, "whisper")
        else:
            try:
                futs = [cw.submit(f, p, max_length=16)
                        for f, p in zip(feats, prompts)]
                results = [f.result(timeout=600) for f in futs]
                out["whisper"] = {
                    "sequences": [r.sequences_ids for r in results],
                    "scores": [[round(s, 4) for s in r.scores]
                               for r in results],
                }
            finally:
                cw.close()

    return None if follower else out


def worker(args) -> int:
    # Stall diagnostics: dump every thread's stack if a worker wedges
    # (repeats every 300 s; harmless noise on healthy long compiles).
    import faulthandler

    faulthandler.dump_traceback_later(300, repeat=True)
    # Device/backend setup must precede the jax import.
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={args.devices_per_process}")
    os.environ.setdefault("JAX_CPU_COLLECTIVES_IMPLEMENTATION", "gloo")
    import jax

    jax.config.update("jax_platforms", "cpu")

    from ctranslate2_tpu.parallel.sharding import initialize_distributed

    info = initialize_distributed(
        coordinator_address=args.coordinator,
        num_processes=args.num_processes,
        process_id=args.rank)
    assert info["process_count"] == args.num_processes, info
    assert info["global_devices"] == (
        args.num_processes * args.devices_per_process), info

    if args.continuous:
        out = run_continuous(args.model_dir, tensor_parallel=True)
        if out is None:  # follower rank: replay loops ran to close
            print(f"MP_OK rank={args.rank} follower", flush=True)
            return 0
        expected = json.load(open(args.expected))
        for phase in expected:
            assert out[phase]["sequences"] == \
                expected[phase]["sequences"], (phase, out, expected)
            assert out[phase]["scores"] == expected[phase]["scores"], (
                phase, out, expected)
        print(f"MP_OK rank={args.rank} continuous "
              f"phases={sorted(out)}", flush=True)
        return 0

    out = run_generation(args.model_dir, tensor_parallel=True)
    expected_devices = args.num_processes * args.devices_per_process
    assert out["mesh"] == {"data": 1, "model": expected_devices}, out["mesh"]

    expected = json.load(open(args.expected))
    assert out["greedy"] == expected["greedy"], (out, expected)
    assert out["scores"] == expected["scores"], (out, expected)
    assert out["beam"] == expected["beam"], (out, expected)
    print(f"MP_OK rank={args.rank} mesh={out['mesh']} "
          f"greedy={out['greedy'][0]}", flush=True)
    return 0


def launcher(args) -> int:
    tmp = tempfile.mkdtemp(prefix="ct2tpu_mp_")
    model_dir = os.path.join(tmp, "model")

    # Single-process reference (unsharded) in a subprocess so the parent
    # never initializes a jax backend that would conflict with reuse.
    expected_path = os.path.join(tmp, "expected.json")
    run_fn = "run_continuous" if args.continuous else "run_generation"
    ref_code = (
        "import os, sys, json;"
        "os.environ['XLA_FLAGS']='--xla_force_host_platform_device_count=1';"
        "import jax; jax.config.update('jax_platforms', 'cpu');"
        f"sys.path.insert(0, {os.path.dirname(os.path.dirname(os.path.abspath(__file__)))!r});"
        f"from tools.run_multiprocess import build_model, {run_fn};"
        f"build_model({model_dir!r});"
        f"out = {run_fn}({model_dir!r}, tensor_parallel=False);"
        f"json.dump(out, open({expected_path!r}, 'w'))"
    )
    subprocess.run([sys.executable, "-c", ref_code], check=True,
                   timeout=900)

    # Pick a free coordinator port.
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        coordinator = f"127.0.0.1:{s.getsockname()[1]}"

    procs = []
    for rank in range(args.num_processes):
        procs.append(subprocess.Popen(
            [sys.executable, os.path.abspath(__file__),
             "--rank", str(rank),
             "--num-processes", str(args.num_processes),
             "--devices-per-process", str(args.devices_per_process),
             "--coordinator", coordinator,
             "--model-dir", model_dir,
             "--expected", expected_path]
            + (["--continuous"] if args.continuous else []),
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    rc = 0
    for rank, p in enumerate(procs):
        try:
            out, _ = p.communicate(timeout=args.timeout)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
            rc = 1
        if p.returncode != 0:
            rc = 1
        marker = f"MP_OK rank={rank}"
        status = "ok" if marker in out else "FAILED"
        print(f"--- rank {rank}: {status} (rc={p.returncode})")
        log_path = os.path.join(tmp, f"rank{rank}.log")
        with open(log_path, "w") as lf:
            lf.write(out)
        if marker not in out:
            print(f"full log: {log_path}")
            print(out[-4000:])
            rc = 1
        else:
            print([line for line in out.splitlines()
                   if line.startswith("MP_OK")][0])
    if rc == 0:
        print(f"MULTIPROCESS_OK processes={args.num_processes} "
              f"devices_per_process={args.devices_per_process}")
    return rc


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rank", type=int, default=None,
                    help="worker rank (internal; omit to self-spawn)")
    ap.add_argument("--num-processes", type=int, default=2)
    ap.add_argument("--devices-per-process", type=int, default=4)
    ap.add_argument("--coordinator", default=None)
    ap.add_argument("--model-dir", default=None)
    ap.add_argument("--expected", default=None)
    ap.add_argument("--continuous", action="store_true",
                    help="serve mixed traffic through the continuous "
                         "engines (leader on rank 0, follower replay on "
                         "the rest) instead of the batch APIs")
    ap.add_argument("--timeout", type=float, default=900.0)
    args = ap.parse_args()
    if args.rank is None:
        return launcher(args)
    return worker(args)


if __name__ == "__main__":
    sys.exit(main())
