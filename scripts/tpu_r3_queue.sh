#!/bin/bash
# r3 TPU work queue. One job at a time, NO timeout kills (a hung attempt
# blocks until the tunnel returns and then completes — see CLAUDE.md).
# UNAVAILABLE errors fail fast and retry on a sleep loop.
cd /root/repo
L=/tmp/r3_queue.log
export PYTHONPATH=/root/.axon_site:/root/repo

run_retry() {  # run_retry <tag> <logfile> <cmd...>
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

run_retry r5_floor /tmp/r5_floor.log python scripts/probe_r5_floor.py
run_retry qmm_scan /tmp/qmm_scan.log python scripts/probe_qmm_scan.py
run_retry bench /tmp/bench_r3a.log python bench.py
echo "== queue done $(date +%H:%M:%S)" >> $L
