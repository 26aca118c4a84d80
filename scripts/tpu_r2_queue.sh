#!/bin/bash
# Round-2 TPU work list. ONE process, sequential, no timeout-kills.
# Step 0 blocks on a tiny op until the tunnel is live (UNAVAILABLE fails
# fast and is retried on a sleep loop; a hang = service mid-restart and
# the blocked op completes when it returns — never kill it).
cd /root/repo
L=/tmp/r2queue.log
export PYTHONPATH=/root/.axon_site:/root/repo

echo "== waiting for tunnel $(date +%H:%M:%S)" >> $L
for i in $(seq 1 200); do
  python - <<'EOF' >> $L 2>&1
import jax, jax.numpy as jnp, numpy as np
x = jnp.ones((8, 8))
print("tunnel ok:", float(np.asarray(x.sum())), jax.devices())
EOF
  rc=$?
  if [ $rc -eq 0 ]; then break; fi
  echo "== probe rc=$rc, sleep 60 $(date +%H:%M:%S)" >> $L
  sleep 60
done

echo "== kernel probe $(date +%H:%M:%S)" >> $L
python scripts/probe_decode_kernel.py > /tmp/v7_probe.log 2>&1
echo "== probe rc=$? $(date +%H:%M:%S)" >> $L

echo "== bf16mm $(date +%H:%M:%S)" >> $L
python scripts/bench_bf16mm_tpu.py > /tmp/bf16mm.log 2>&1
echo "== bf16mm rc=$? $(date +%H:%M:%S)" >> $L

echo "== qmm $(date +%H:%M:%S)" >> $L
python scripts/bench_qmm_tpu.py > /tmp/qmm.log 2>&1
echo "== qmm rc=$? $(date +%H:%M:%S)" >> $L

echo "== queue done $(date +%H:%M:%S)" >> $L
