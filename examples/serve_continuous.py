"""Continuous batching under concurrent clients.

Requests join a persistent decode loop between steps (iteration-level
batching), so a request submitted mid-decode of another completes without
waiting for it — the serving capability documented in docs/serving.md.

    python examples/serve_continuous.py --model gpt2_ct2 --clients 8
"""

import argparse
import threading
import time


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", required=True)
    p.add_argument("--clients", type=int, default=8)
    p.add_argument("--requests", type=int, default=4)
    p.add_argument("--max_length", type=int, default=64)
    p.add_argument("--speculation_k", type=int, default=0)
    args = p.parse_args()

    import ctranslate2_tpu

    generator = ctranslate2_tpu.Generator(args.model)
    batcher = ctranslate2_tpu.ContinuousBatcher(
        generator, speculation_k=args.speculation_k)

    done = []
    lock = threading.Lock()

    def client(cid):
        for r in range(args.requests):
            fut = batcher.submit([cid + 3, r + 3, 5],
                                 max_length=args.max_length)
            result = fut.result()
            with lock:
                done.append(len(result.sequences_ids[0]))

    t0 = time.time()
    threads = [threading.Thread(target=client, args=(i,))
               for i in range(args.clients)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    dt = time.time() - t0
    total = sum(done)
    print(f"{len(done)} requests, {total} tokens in {dt:.2f}s "
          f"({total / dt:.1f} tok/s)")
    print("stats:", batcher.stats())
    batcher.close()


if __name__ == "__main__":
    main()
