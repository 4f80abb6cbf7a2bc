#!/bin/bash
# Round-3 TPU bench battery: run everything the BENCHMARKS round-3 rows
# need, one after another, logging JSON lines.  Run from the repo root;
# logs to bench_r3.log.  Order: headline first (warms the shared
# compile cache), then the feature benches.
set -x
log=bench_r3.log
: > $log
run() { echo "### $*" >> $log; timeout 3000 "$@" >> $log 2>&1; echo "exit=$?" >> $log; }

run python bench.py                                   # 512^3 headline
run python scripts/bench_norm.py 512 10               # fused tolerance check
run python scripts/bench_dist3d.py 512 10 1           # shard_map overhead (3D)
run python scripts/bench_smoothers.py 512 10          # chebyshev vs rbgs vs jacobi
run python scripts/bench_p2.py 64 10 3                # P2 vs P1 at equal DOFs
run python scripts/bench_batched.py 192 4             # batched lax.map vs vmap
run python scripts/bench_planes3.py 256 10            # variable-kappa device build
run python scripts/bench_dist2d.py 2048 20 1          # shard_map overhead (2D)
run python scripts/big_demo.py 768 10                 # 768^3 scale point
echo DONE >> $log
