#!/bin/bash
# Round-3 measurement sequence — fire the moment the TPU tunnel is back.
# One TPU process at a time (axon rule); each is timeout-bounded and logs
# to /tmp/r3_measure.log so a tunnel flap mid-sequence still leaves data.
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/r3_measure.log
run() {
  echo "=== $* === $(date +%H:%M:%S)" | tee -a "$LOG"
  timeout "$1" python "${@:2}" 2>&1 | tail -40 | tee -a "$LOG"
}
# 1. serving wall: padflat int8 + bf16, fresh process (headline preview)
run 2400 benchmarks/padflat_wall.py 128 10
# 2. per-op attribution of the int8 pf serving graph
run 2400 benchmarks/profile_s2d_attr.py int8pf
# 3. train sweep incl. the B>=160 probes and the remat row
run 3000 benchmarks/train_sweep.py 20 128 160 192 r192
# 4. full bench (headline JSON + BENCH_DETAILS.json)
run 4800 bench.py
echo "=== DONE === $(date +%H:%M:%S)" | tee -a "$LOG"
