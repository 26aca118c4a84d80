#!/bin/bash
# Round-4 queue #7: v10 (narrow-score) vs v9t4 interleaved A/B,
# bf16 and int8 variants, over shared pools.
cd /root/repo
L=/tmp/r4_queue.log
export PYTHONPATH=/root/.axon_site:/root/repo

while ! grep -q "queue6 done" $L 2>/dev/null; do sleep 60; done
echo "== queue7 start $(date +%H:%M:%S)" >> $L

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

run_retry ab_v10 /tmp/ab_v10.log \
  env XLLM_AB="v9t4,v10t4,v10t4i,v9t4i" python scripts/probe_ab_interleaved.py
echo "== queue7 done $(date +%H:%M:%S)" >> $L
