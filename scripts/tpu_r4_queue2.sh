#!/bin/bash
# Round-4 queue #2: int8-KV kernel A/B, then the full bench (v9t4
# default + host-path fixes + int8-KV int8 phases), then the prefill
# ablation profile. Gated on queue #1's fresh done marker; int8 traces
# were chipless-AOT-validated first (test_decode_int8_kv_compiles,
# test_prefill_and_writers_int8_kv_compile).
cd /root/repo
L=/tmp/r4_queue.log
export PYTHONPATH=/root/.axon_site:/root/repo

while ! grep -q "queue1 done" $L 2>/dev/null; do sleep 60; done
echo "== queue2 start $(date +%H:%M:%S)" >> $L

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

run_retry r9_int8kv /tmp/r9_int8kv.log python scripts/probe_r9_int8kv.py
run_retry bench_r4a /tmp/bench_r4a.log python bench.py
run_retry prefill_prof /tmp/prefill_prof.log python scripts/profile_prefill.py
echo "== queue2 done $(date +%H:%M:%S)" >> $L
