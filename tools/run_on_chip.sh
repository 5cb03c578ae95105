#!/bin/bash
# One-stop on-chip validation + benchmark sweep (run when a TPU is
# attached; results land in /tmp/onchip/).
set -u
export PYTHONPATH=/root/repo:/root/.axon_site
OUT=${1:-/tmp/onchip}
mkdir -p "$OUT"
cd /root/repo

run() {
  name=$1; shift
  echo "=== $name ==="
  timeout 3600 "$@" 2>&1 | tee "$OUT/$name.log" | tail -5
}

run smoke python tools/smoke_tpu.py
run bench python bench.py
run bench_int8 env BENCH_COMPUTE=int8 python bench.py
run llama python bench_llama.py
run llama_b16 env LLAMA_BATCH=16 python bench_llama.py
run llama_w4 env LLAMA_QUANT=w4 LLAMA_BATCH=16 python bench_llama.py
# W4 strategy microbench: per-M crossover for the batch-adaptive W4
# dispatch (tools/bench_w4.py; VERDICT r4 item 2).
run w4_micro python tools/bench_w4.py
# Prefill suite: tokens/s + MFU, flash vs XLA (VERDICT r4 item 4).
run llama_prefill env LLAMA_PREFILL_SUITE=512,2048,8192 python bench_llama.py
# Serving: slot x block x pipeline-depth sweep with TTFT stats
# (VERDICT r4 item 1).
run serving python tools/bench_serving.py --requests 48 --speculation_k 4 --draft_layers 1
run serving8b python tools/bench_serving.py --llama8b --requests 96 \
  --slots-sweep 8,16,32 --capacity 512 --max-new 128 \
  --steps-per-sync 16 --pipeline-depth 1,2
run flash python tools/bench_flash.py
run quality python tools/quality_parity.py
echo "=== done; logs in $OUT ==="
