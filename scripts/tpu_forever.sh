#!/bin/bash
# Wait (indefinitely) for the axon tunnel, then run the TPU work queue.
LOG=/tmp/tpu_queue.log
cd /root/repo
while true; do
  PYTHONPATH=/root/.axon_site:/root/repo python - <<'PY' >> /tmp/tunnel_wait.log 2>&1
import jax
jax.devices()  # raises while the tunnel is down
print("tunnel up")
PY
  if [ $? -eq 0 ]; then break; fi
  sleep 120
done
echo "== tunnel back $(date +%H:%M:%S)" >> "$LOG"
PYTHONPATH=/root/.axon_site:/root/repo python /root/repo/scripts/probe_decode_kernel.py > /tmp/v6_probe5.log 2>&1
echo "== probe done rc=$? $(date +%H:%M:%S)" >> "$LOG"
PYTHONPATH=/root/.axon_site:/root/repo python /root/repo/scripts/profile_decode.py > /tmp/prof_r5.log 2>&1
echo "== profile done rc=$? $(date +%H:%M:%S)" >> "$LOG"
PYTHONPATH=/root/.axon_site:/root/repo XLLM_BENCH_SKIP_8B=1 python /root/repo/bench.py > /tmp/bench_r2a.log 2>&1
echo "== bench done rc=$? $(date +%H:%M:%S)" >> "$LOG"
