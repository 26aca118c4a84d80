#!/bin/bash
# Generic patient TPU work queue (CLAUDE.md tunnel discipline).
#
#   scripts/tpu_queue.sh NAME [WAIT_MARKER] -- TAG1 CMD1 -- TAG2 CMD2 ...
#
# - ONE detached process; blocks (no timeout) on a tiny op until the
#   tunnel serves, then runs the items in order.
# - Each item logs to /tmp/<TAG>.log, fails fast on transient tunnel
#   errors (UNAVAILABLE/Socket closed) and retries on a sleep loop;
#   non-transient failures stop the chain.
# - Writes "== NAME done" to /tmp/<NAME>_queue.log on success; a later
#   queue can gate on a previous one via WAIT_MARKER (the previous
#   queue's name). The queue log is truncated fresh per run so stale
#   markers can never release a waiter early (r3-advice bug class).
#
# Example:
#   setsid nohup bash scripts/tpu_queue.sh q1 -- bench "python bench.py" &
#   setsid nohup bash scripts/tpu_queue.sh q2 q1 -- ab \
#       "env XLLM_AB=v9t4,v5 python scripts/probe_ab_interleaved.py" &
set -u
cd /root/repo
NAME=$1; shift
WAIT=""
if [ "${1:-}" != "--" ]; then WAIT=$1; shift; fi
[ "${1:-}" = "--" ] && shift
L=/tmp/${NAME}_queue.log
export PYTHONPATH=/root/.axon_site:/root/repo

if [ -n "$WAIT" ]; then
  while ! grep -q "== $WAIT done" "/tmp/${WAIT}_queue.log" 2>/dev/null; do
    sleep 60
  done
fi
: > "$L"
echo "== $NAME start $(date +%H:%M:%S)" >> "$L"
python - <<'PY' >> "$L" 2>&1
import jax, jax.numpy as jnp, numpy as np
np.asarray(jnp.zeros(8) + 1)  # blocks until the tunnel serves
print("tunnel up")
PY

run_retry() {
  local tag=$1 cmd=$2
  for i in $(seq 1 60); do
    echo "== $tag attempt $i $(date +%H:%M:%S)" >> "$L"
    bash -c "$cmd" > "/tmp/$tag.log" 2>&1
    rc=$?
    echo "== $tag rc=$rc $(date +%H:%M:%S)" >> "$L"
    if [ $rc -eq 0 ]; then return 0; fi
    if ! grep -q "UNAVAILABLE\|Socket closed\|failed to connect" "/tmp/$tag.log"; then
      echo "== $tag non-transient failure, stopping" >> "$L"
      return $rc
    fi
    sleep 120
  done
  echo "== $tag exhausted retries" >> "$L"
  return 1
}

ok=1
while [ $# -gt 0 ]; do
  tag=$1; cmd=$2; shift 2
  [ "${1:-}" = "--" ] && shift
  if ! run_retry "$tag" "$cmd"; then ok=0; break; fi
done
[ $ok -eq 1 ] && echo "== $NAME done $(date +%H:%M:%S)" >> "$L"
