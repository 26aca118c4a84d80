#!/bin/bash
# Chained r3 queue #4: waits for queue #3, then runs the v9 tournament.
cd /root/repo
L=/tmp/r3_queue.log
export PYTHONPATH=/root/.axon_site:/root/repo

while ! grep -q "queue3 done" $L 2>/dev/null; do sleep 60; done

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
}

run_retry r7_v9 /tmp/r7_v9.log python scripts/probe_r7_v9.py
echo "== queue4 done $(date +%H:%M:%S)" >> $L
