#!/bin/bash
# Retry the TPU work list until it succeeds. Each attempt runs WITHOUT
# kills: UNAVAILABLE fails fast; a hang means the service is mid-restart
# and the blocked op completes when it returns (never kill it).
cd /root/repo
L=/tmp/retry.log
for i in $(seq 1 200); do
  echo "== attempt $i $(date +%H:%M:%S)" >> $L
  PYTHONPATH=/root/.axon_site:/root/repo XLLM_BENCH_SKIP_8B=1 python bench.py > /tmp/bench_r2c.log 2>&1
  rc=$?
  echo "== bench rc=$rc $(date +%H:%M:%S)" >> $L
  if [ $rc -eq 0 ]; then break; fi
  sleep 300
done
echo "== bench OK, running probe $(date +%H:%M:%S)" >> $L
PYTHONPATH=/root/.axon_site:/root/repo python scripts/probe_decode_kernel.py > /tmp/v7_probe.log 2>&1
echo "== probe rc=$? $(date +%H:%M:%S)" >> $L
PYTHONPATH=/root/.axon_site:/root/repo python scripts/bench_bf16mm_tpu.py > /tmp/bf16mm.log 2>&1
echo "== bf16mm rc=$? $(date +%H:%M:%S)" >> $L
PYTHONPATH=/root/.axon_site:/root/repo python scripts/bench_qmm_tpu.py > /tmp/qmm.log 2>&1
echo "== qmm rc=$? $(date +%H:%M:%S)" >> $L
