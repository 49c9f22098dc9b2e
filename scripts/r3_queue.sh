#!/bin/bash
# Round-3 verification backlog on the attached chip, in priority order:
# large-model serving rungs at the engine-e2e paced tier (VERDICT r2 #5),
# then the real-speech training that feeds the live UPL probe (#10).
#
#   bash scripts/r3_queue.sh [outdir]
set -u
OUT=${1:-/tmp/r3_queue}
mkdir -p "$OUT"
export PYTHONPATH=/root/.axon_site:/root/repo
cd /root/repo

run() {
  local name=$1; shift
  echo "=== $name: $* ($(date +%H:%M:%S))"
  timeout 2400 "$@" >"$OUT/$name.log" 2>&1
  echo "    rc=$? tail:"; tail -4 "$OUT/$name.log" | sed 's/^/    /'
}

# 1. large-196M greedy, co-located paced tier: ladder to the CL99 edge
run 01_lg_greedy_6144 python scripts/bench_beam_serving.py \
    --model large --decoder greedy --batch 6144 --paced --reuse-upload --iters 320
run 02_lg_greedy_8192 python scripts/bench_beam_serving.py \
    --model large --decoder greedy --batch 8192 --paced --reuse-upload --iters 320

# 2. large-196M beam-4, same tier
run 03_lg_beam_1024 python scripts/bench_beam_serving.py \
    --model large --decoder beam --batch 1024 --paced --reuse-upload --iters 320
run 04_lg_beam_1536 python scripts/bench_beam_serving.py \
    --model large --decoder beam --batch 1536 --paced --reuse-upload --iters 320

# 3. throughput (mean) tier at the same rungs for the docs table
run 05_lg_greedy_tp python scripts/bench_beam_serving.py \
    --model large --decoder greedy --batch 8192 --reuse-upload --iters 100
run 06_lg_beam_tp python scripts/bench_beam_serving.py \
    --model large --decoder beam --batch 1536 --reuse-upload --iters 100

# 4. the trained toy model the UPL probe serves
run 07_rse_train python scripts/real_speech_e2e.py \
    --workdir /tmp/rse_upl/dense_s1 --seed 1

echo "queue done; logs in $OUT"
