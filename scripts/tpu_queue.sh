#!/bin/bash
# Sequential TPU work backlog — run when the tunnel comes back.
# Each step logs to $OUT/NN_name.log; the chip is serial so order matters:
# correctness first, then the perf probes that motivated this round.
#
#   bash scripts/tpu_queue.sh [outdir]
set -u
OUT=${1:-/tmp/tpu_queue}
mkdir -p "$OUT"
export PYTHONPATH=/root/.axon_site:/root/repo
cd /root/repo

run() {
  local name=$1; shift
  echo "=== $name: $* ($(date +%H:%M:%S))"
  timeout 2400 "$@" >"$OUT/$name.log" 2>&1
  echo "    rc=$? tail:"; tail -3 "$OUT/$name.log" | sed 's/^/    /'
}

# 1. on-device grad check of the edited joint kernels (blank matvec, tiles)
run 01_gradcheck python scripts/check_joint_grads_tpu.py

# 2. large-196M step + component breakdown (donation now on = real HBM):
#    fused one-kernel backward vs the default rechunk path A/B
run 02_large_breakdown env CAIMAN_JOINT_FUSED_BWD=1 \
    python scripts/bench_train.py --large
run 02b_large_rechunk python scripts/bench_train.py --large --step-only

# 3. large ragged/packed (the apples-to-apples vs the A100 baseline)
run 03_large_ragged python scripts/bench_train.py --large --ragged --step-only

# 4. stored-u headroom at large now that donation freed ~3 GB:
#    partial vocab-column storage at two budgets
run 04_large_zstore2g env CAIMAN_JOINT_ZSTORE_PARTIAL=1 CAIMAN_JOINT_ZSTORE_MB=2048 \
    python scripts/bench_train.py --large --step-only
run 05_large_zstore4g env CAIMAN_JOINT_ZSTORE_PARTIAL=1 CAIMAN_JOINT_ZSTORE_MB=4096 \
    python scripts/bench_train.py --large --step-only

# 6. base re-baseline after the kernel edits: fused stored-u vs two-kernel
run 06_base env CAIMAN_JOINT_FUSED_BWD=1 python scripts/bench_train.py --step-only
run 06b_base_twokernel python scripts/bench_train.py --step-only
run 07_base_ragged python scripts/bench_train.py --ragged --step-only

# 8. the headline serving bench
run 08_bench python bench.py

echo "queue done; logs in $OUT"
