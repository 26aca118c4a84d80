#!/bin/bash
# Round-3 session-b queue #1: v9 decode-kernel tournament, then the full
# bench (incl. the 8B int8 phase). Pattern per CLAUDE.md: ONE detached
# process; first blocks (no timeout) on a tiny op until the tunnel is up;
# each work item fails fast on UNAVAILABLE and retries on a sleep loop.
cd /root/repo
L=/tmp/r3b_queue.log
export PYTHONPATH=/root/.axon_site:/root/repo

: > $L  # fresh log: queue2 gates on THIS run's 'queue1 done' marker
echo "== queue start $(date +%H:%M:%S)" >> $L
python - <<'PY' >> $L 2>&1
import jax, jax.numpy as jnp, numpy as np
np.asarray(jnp.zeros(8) + 1)  # blocks until the tunnel serves
print("tunnel up")
PY

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

run_retry r7_v9 /tmp/r7_v9.log python scripts/probe_r7_v9.py \
  && run_retry bench_r3b /tmp/bench_r3b.log python bench.py \
  && echo "== queue1 done $(date +%H:%M:%S)" >> $L
