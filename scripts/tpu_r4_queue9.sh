#!/bin/bash
# Round-4 queue #9: end-of-round bench with the warm-spec phase.
cd /root/repo
L=/tmp/r4_queue.log
export PYTHONPATH=/root/.axon_site:/root/repo
while ! grep -q "queue8 done" $L 2>/dev/null; do sleep 60; done
echo "== queue9 start $(date +%H:%M:%S)" >> $L
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
run_retry bench_r4f /tmp/bench_r4f.log python bench.py
echo "== queue9 done $(date +%H:%M:%S)" >> $L
