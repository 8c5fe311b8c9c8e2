#!/bin/bash
# Round-5 measurement queue — run AFTER bench.py finishes (one TPU
# process at a time; each row pays the ~100 s per-process backend
# warmup). Decision-critical first; risky compiles last.
set -x
cd "$(dirname "$0")/.."
mkdir -p /tmp/r5
timeout 1800 python benchmarks/profile_train_cats.py 128 3 2>&1 | tee /tmp/r5/traincats.log
timeout 1800 python benchmarks/dgrad_bench.py 128        2>&1 | tee /tmp/r5/dgrad.log
timeout 1800 python benchmarks/profile_s2d_attr.py 128 3 int8pf 2>&1 | tee /tmp/r5/attr.log
timeout 1500 python benchmarks/spatial_1chip.py 1024 1   2>&1 | tee /tmp/r5/spatial.log
echo ALL-DONE
