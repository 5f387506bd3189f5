#!/bin/bash
# On-chip artifact protocol: run the moment the axon tunnel is alive.
# Captures (in order of judged priority):
#   1. bench.py at N=1024 on the chip (headline s/step + MFU)
#   2. full Tully-A (SAC) protocol ON the TPU (north star: < 5 min wall)
#   3. N=1024 convergence row (both estimators)
# Each step logs to benchmarks/tpu_r03/ and is individually resumable.
set -u
cd /root/repo
mkdir -p benchmarks/tpu_r03
stamp() { date -u +%FT%TZ; }

echo "$(stamp) protocol start" >> benchmarks/tpu_r03/protocol.log

echo "$(stamp) [1/3] bench N=1024" >> benchmarks/tpu_r03/protocol.log
BENCH_TUNNEL_WAIT_S=120 timeout 5400 python bench.py -n 1024 --steps 10 \
  > benchmarks/tpu_r03/bench_n1024.json 2> benchmarks/tpu_r03/bench_n1024.err
echo "$(stamp) [1/3] rc=$?" >> benchmarks/tpu_r03/protocol.log

echo "$(stamp) [2/3] SAC full protocol on TPU (N=256)" >> benchmarks/tpu_r03/protocol.log
timeout 5400 python benchmarks/parity.py --model SAC --x0 -4 -n 256 --reopt-time 20 \
  > benchmarks/tpu_r03/parity_tpu_sac_n256.json 2> benchmarks/tpu_r03/parity_tpu_sac_n256.err
echo "$(stamp) [2/3] rc=$?" >> benchmarks/tpu_r03/protocol.log

echo "$(stamp) [3/3] SAC N=1024 convergence row on TPU" >> benchmarks/tpu_r03/protocol.log
timeout 10800 python benchmarks/parity.py --model SAC --x0 -4 -n 1024 --reopt-time 20 \
  > benchmarks/tpu_r03/parity_tpu_sac_n1024.json 2> benchmarks/tpu_r03/parity_tpu_sac_n1024.err
echo "$(stamp) [3/3] rc=$?" >> benchmarks/tpu_r03/protocol.log

echo "$(stamp) protocol done" >> benchmarks/tpu_r03/protocol.log
