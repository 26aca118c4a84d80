#!/bin/bash
# Round-3 session-b queue #2: waits for queue #1 (v9 tournament + bench),
# then runs the fp8-KV decode A/B.
cd /root/repo
L=/tmp/r3b_queue.log
export PYTHONPATH=/root/.axon_site:/root/repo

while ! grep -q "queue1 done" $L 2>/dev/null; do sleep 60; done

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

run_retry r8_fp8kv /tmp/r8_fp8kv.log python scripts/probe_r8_fp8kv.py
run_retry prof_r3b /tmp/prof_r3b.log python scripts/profile_decode.py
echo "== queue2 done $(date +%H:%M:%S)" >> $L
