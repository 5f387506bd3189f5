#!/bin/bash
# Round-5 on-chip protocol, in judged priority order (VERDICT r4):
#   1. bench.py N=1024 headline with the batched 4-way SPD inverse (task 7).
#   2. SAC N=256 cold at RESTORED defaults (task 1: mci <= 0.068, wall <= 471 s;
#      also warms the XLA cache + init state + event hints for step 3).
#   3. SAC N=256 warm repeat (task 4: sub-300 s, init <= 30 s, instrumented).
#   4. SAC N=1024 convergence row at restored defaults.
#   5. prm estimator triage on-chip (task 5).
#   6. DAC + ECR full-protocol rows at head (task 9).
# Each step SKIPS if its output file already exists and is non-empty (a rerun
# must not clobber completed chip-time, ADVICE r4); delete a file to redo it.
set -u
cd /root/repo
mkdir -p benchmarks/r05
stamp() { date -u +%FT%TZ; }
log() { echo "$(stamp) $*" >> benchmarks/r05/protocol.log; }
done_already() { [ -s "$1" ] && ! grep -q '^null$' "$1" 2>/dev/null; }

log "r05 protocol start"

OUT=benchmarks/r05/bench_n1024.json
if done_already "$OUT"; then log "[1/7] skip (exists)"; else
  log "[1/7] bench N=1024"
  BENCH_TUNNEL_WAIT_S=300 timeout 5400 python bench.py -n 1024 --steps 10 \
    > "$OUT" 2> "${OUT%.json}.err"
  log "[1/7] rc=$?"
fi

OUT=benchmarks/r05/parity_tpu_sac_n256_cold.json
if done_already "$OUT"; then log "[2/7] skip (exists)"; else
  log "[2/7] SAC N=256 cold (init-cache on)"
  timeout 5400 python benchmarks/parity.py --model SAC --x0 -4 -n 256 \
    --reopt-time 20 --init-cache 1 \
    > "$OUT" 2> "${OUT%.json}.err"
  log "[2/7] rc=$?"
fi

OUT=benchmarks/r05/parity_tpu_sac_n256_warm.json
if done_already "$OUT"; then log "[3/7] skip (exists)"; else
  log "[3/7] SAC N=256 warm (sub-300s attempt)"
  timeout 5400 python benchmarks/parity.py --model SAC --x0 -4 -n 256 \
    --reopt-time 20 --init-cache 1 \
    > "$OUT" 2> "${OUT%.json}.err"
  log "[3/7] rc=$?"
fi

OUT=benchmarks/r05/parity_tpu_sac_n1024.json
if done_already "$OUT"; then log "[4/7] skip (exists)"; else
  log "[4/7] SAC N=1024 convergence row"
  timeout 10800 python benchmarks/parity.py --model SAC --x0 -4 -n 1024 \
    --reopt-time 20 \
    > "$OUT" 2> "${OUT%.json}.err"
  log "[4/7] rc=$?"
fi

OUT=benchmarks/r05/prm_triage_tpu.log
if done_already "$OUT"; then log "[5/7] skip (exists)"; else
  log "[5/7] prm triage on-chip"
  timeout 3600 python benchmarks/prm_triage.py > "$OUT" 2>&1
  log "[5/7] rc=$?"
fi

OUT=benchmarks/r05/parity_tpu_dac_n256.json
if done_already "$OUT"; then log "[6/7] skip (exists)"; else
  log "[6/7] DAC full protocol (r02-comparable config)"
  timeout 7200 python benchmarks/parity.py --model DAC --x0 -4 --p0 20 \
    -n 256 --reopt-time 20 \
    > "$OUT" 2> "${OUT%.json}.err"
  log "[6/7] rc=$?"
fi

OUT=benchmarks/r05/parity_tpu_ecr_n256.json
if done_already "$OUT"; then log "[7/7] skip (exists)"; else
  log "[7/7] ECR full protocol (r02-comparable config)"
  timeout 7200 python benchmarks/parity.py --model ECR --x0 -4 --p0 20 \
    -n 256 --reopt-time 20 \
    > "$OUT" 2> "${OUT%.json}.err"
  log "[7/7] rc=$?"
fi

log "r05 protocol done"
