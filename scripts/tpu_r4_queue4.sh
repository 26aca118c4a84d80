#!/bin/bash
# Round-4 queue #4: verify drive (packed dispatch + adaptive drain on
# the real chip), then the final bench, then the prefill-matmul MFU
# probe. Gated on queue #3's done marker.
cd /root/repo
L=/tmp/r4_queue.log
export PYTHONPATH=/root/.axon_site:/root/repo

while ! grep -q "queue3 done" $L 2>/dev/null; do sleep 60; done
echo "== queue4 start $(date +%H:%M:%S)" >> $L

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

run_retry verify_r4d /tmp/verify_r4d.log python scripts/verify_r4_drive.py
run_retry bench_r4d /tmp/bench_r4d.log python bench.py
run_retry r11_mm /tmp/r11_mm.log python scripts/probe_r11_prefill_mm.py
echo "== queue4 done $(date +%H:%M:%S)" >> $L
