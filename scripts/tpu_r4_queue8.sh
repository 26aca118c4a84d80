#!/bin/bash
# Round-4 queue #8: fixed prefill-matmul MFU probe (stacks as explicit
# jit args this time) + final confirmation bench on the end-of-round
# code state.
cd /root/repo
L=/tmp/r4_queue.log
export PYTHONPATH=/root/.axon_site:/root/repo

while ! grep -q "queue7 done" $L 2>/dev/null; do sleep 60; done
echo "== queue8 start $(date +%H:%M:%S)" >> $L

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

run_retry r11_mm2 /tmp/r11_mm2.log python scripts/probe_r11_prefill_mm.py
run_retry bench_r4e /tmp/bench_r4e.log python bench.py
echo "== queue8 done $(date +%H:%M:%S)" >> $L
