#!/bin/bash
# Round-4 queue #6: KV-pool allocation-order A/B (bench with
# XLLM_KV_FIRST=1 — pool before weights). The bench TPOT (12.07)
# matches the "slow-pool" decode-attention rate the drift probes
# exposed; if ordering moves the pool into the fast regime the step
# gains ~2 ms. Primary-metric phases only (skip 8B for time).
cd /root/repo
L=/tmp/r4_queue.log
export PYTHONPATH=/root/.axon_site:/root/repo

while ! grep -q "queue5 done" $L 2>/dev/null; do sleep 60; done
echo "== queue6 start $(date +%H:%M:%S)" >> $L

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

run_retry bench_kvfirst /tmp/bench_kvfirst.log \
  env XLLM_KV_FIRST=1 XLLM_BENCH_SKIP_8B=1 python bench.py
echo "== queue6 done $(date +%H:%M:%S)" >> $L
