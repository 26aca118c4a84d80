#!/bin/bash
# Round-4 queue #3: the depth-4 overlap bench (the r4a bench exposed a
# ~13.5 ms RTT wall at overlap_depth=2: the loop blocks on step t-2's
# token fetch, and 2 x step < the tunnel's ~27 ms RTT once the host
# path got fast), then the v9 tile sweep (bf16 + int8), then a
# page-128 bench variant (per-page cost amortized over 2x bytes; the
# full page-128 kernel path is chipless-AOT-validated).
cd /root/repo
L=/tmp/r4_queue.log
export PYTHONPATH=/root/.axon_site:/root/repo

while ! grep -q "queue2 done" $L 2>/dev/null; do sleep 60; done
echo "== queue3 start $(date +%H:%M:%S)" >> $L

run_retry() {
  local tag=$1 log=$2; shift 2
  for i in $(seq 1 60); do
    echo "== $tag attempt $i $(date +%H:%M:%S)" >> $L
    "$@" > "$log" 2>&1
    rc=$?
    echo "== $tag rc=$rc $(date +%H:%M:%S)" >> $L
    if [ $rc -eq 0 ]; then return 0; fi
    if ! grep -q "UNAVAILABLE\|Socket closed\|failed to connect" "$log"; then
      echo "== $tag non-transient failure, not retrying" >> $L
      return $rc
    fi
    sleep 120
  done
  echo "== $tag exhausted retries" >> $L
  return 1
}

run_retry bench_r4b /tmp/bench_r4b.log python bench.py
run_retry r10_v9t /tmp/r10_v9t.log python scripts/probe_r10_v9t.py
XLLM_BENCH_BS=128 run_retry bench_r4c_bs128 /tmp/bench_r4c.log \
  env XLLM_BENCH_BS=128 XLLM_BENCH_SKIP_8B=1 python bench.py
echo "== queue3 done $(date +%H:%M:%S)" >> $L
