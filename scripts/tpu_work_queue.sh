#!/bin/bash
# Sequential TPU work once the tunnel is back. One TPU process at a time.
LOG=/tmp/tpu_queue.log
cd /root/repo
echo "== queue start $(date +%H:%M:%S)" >> "$LOG"
/root/repo/scripts/patient_run.sh /tmp/v6_probe4.log python /root/repo/scripts/probe_decode_kernel.py
echo "== probe done rc=$? $(date +%H:%M:%S)" >> "$LOG"
PYTHONPATH=/root/.axon_site:/root/repo python /root/repo/scripts/profile_decode.py > /tmp/prof_r5.log 2>&1
echo "== profile done rc=$? $(date +%H:%M:%S)" >> "$LOG"
PYTHONPATH=/root/.axon_site:/root/repo XLLM_BENCH_SKIP_8B=1 python /root/repo/bench.py > /tmp/bench_r2a.log 2>&1
echo "== bench done rc=$? $(date +%H:%M:%S)" >> "$LOG"
