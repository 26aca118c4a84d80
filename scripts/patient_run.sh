#!/bin/bash
# Retry a TPU script until the axon tunnel is back (fresh process each try).
# Usage: patient_run.sh <logfile> <cmd...>
LOG="$1"; shift
for i in $(seq 1 60); do
  echo "== attempt $i $(date +%H:%M:%S)" >> "$LOG"
  PYTHONPATH=/root/.axon_site:/root/repo "$@" >> "$LOG" 2>&1
  rc=$?
  if [ $rc -eq 0 ]; then echo "== done rc=0" >> "$LOG"; exit 0; fi
  echo "== attempt $i failed rc=$rc; sleeping 90s" >> "$LOG"
  sleep 90
done
echo "== gave up" >> "$LOG"; exit 1
