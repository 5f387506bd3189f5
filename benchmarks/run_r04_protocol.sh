#!/bin/bash
# Round-4 on-chip protocol (run AFTER the booster-freeze run releases the chip).
# Captures, in judged priority order:
#   1. SAC N=256 cold run with init-cache ON: warms the XLA persistent cache,
#      saves the init state + fusion event hints sidecar.
#   2. SAC N=256 warm repeat: the sub-300 s attempt (VERDICT r3 task 2).
#   3. SAC N=1024 full-protocol convergence row (VERDICT r3 task 6).
#   4. prm estimator triage on the chip (VERDICT r3 task 4).
# Each step logs to benchmarks/r04/ and is individually resumable.
set -u
cd /root/repo
mkdir -p benchmarks/r04
stamp() { date -u +%FT%TZ; }
log() { echo "$(stamp) $*" >> benchmarks/r04/protocol.log; }

log "r04 protocol start"

log "[1/4] SAC N=256 cold (init-cache on)"
timeout 5400 python benchmarks/parity.py --model SAC --x0 -4 -n 256 \
  --reopt-time 20 --init-cache 1 \
  > benchmarks/r04/parity_tpu_sac_n256_cold.json \
  2> benchmarks/r04/parity_tpu_sac_n256_cold.err
log "[1/4] rc=$?"

log "[2/4] SAC N=256 warm (sub-300s attempt)"
timeout 5400 python benchmarks/parity.py --model SAC --x0 -4 -n 256 \
  --reopt-time 20 --init-cache 1 \
  > benchmarks/r04/parity_tpu_sac_n256_warm.json \
  2> benchmarks/r04/parity_tpu_sac_n256_warm.err
log "[2/4] rc=$?"

log "[3/4] SAC N=1024 convergence row"
timeout 10800 python benchmarks/parity.py --model SAC --x0 -4 -n 1024 \
  --reopt-time 20 \
  > benchmarks/r04/parity_tpu_sac_n1024.json \
  2> benchmarks/r04/parity_tpu_sac_n1024.err
log "[3/4] rc=$?"

log "[4/4] prm triage on-chip"
timeout 3600 python benchmarks/prm_triage.py \
  > benchmarks/r04/prm_triage_tpu.log 2>&1
log "[4/4] rc=$?"

log "r04 protocol done"
