#!/bin/bash
# Round-4 queue #1: int8-KV decode-kernel A/B (probe_r9_int8kv).
# Pattern per CLAUDE.md: ONE detached process; first blocks (no timeout)
# on a tiny op until the tunnel serves; each work item fails fast on
# UNAVAILABLE and retries on a sleep loop. Fresh log each run; later
# queues gate on THIS run's done marker (r3-advice fix).
cd /root/repo
L=/tmp/r4_queue.log
export PYTHONPATH=/root/.axon_site:/root/repo

: > $L
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

# queue1 = the verify drive only; the int8-KV probe ships in queue2
# AFTER the chipless AOT suite has validated its Mosaic trace
# (tests/test_kernel_aot_compile.py::test_decode_int8_kv_compiles —
# an unvalidated kernel crash wedges the tunnel ~18 min, CLAUDE.md)
run_retry verify_r4 /tmp/verify_r4.log python scripts/verify_r4_drive.py \
  && echo "== queue1 done $(date +%H:%M:%S)" >> $L
