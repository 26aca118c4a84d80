#!/bin/bash
# Round-4 queue #5: drift-immune interleaved kernel A/B — v9t4 bf16 vs
# v9t4 int8 vs v5 bf16 over shared pools (the sweep's sequential
# fresh-pool runs drifted monotonically; this is the clean ranking).
cd /root/repo
L=/tmp/r4_queue.log
export PYTHONPATH=/root/.axon_site:/root/repo

while ! grep -q "queue4 done" $L 2>/dev/null; do sleep 60; done
echo "== queue5 start $(date +%H:%M:%S)" >> $L

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

run_retry ab_kernels /tmp/ab_kernels.log \
  env XLLM_AB="v9t4,v9t4i,v5" python scripts/probe_ab_interleaved.py
echo "== queue5 done $(date +%H:%M:%S)" >> $L
