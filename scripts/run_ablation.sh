#!/bin/bash
# Reference-protocol three-way sampling ablation (README.md:60-67 of
# the reference): implicit-only vs uniform iso-points vs loss-weighted
# iso-points, EQUAL wall-clock budget each, sequentially (never two
# TPU processes at once). train_mvr.py exits 3 on --exit-after by
# design. The tunneled TPU worker occasionally crashes mid-run
# (UNAVAILABLE); a crashed arm is WIPED and restarted so every arm
# gets one clean full-budget run (up to 3 attempts).
# Usage: scripts/run_ablation.sh [budget_seconds] [arms...]
set -u
BUDGET=${1:-5400}
shift || true
ARMS=${@:-"implicit uni lossS"}
cd "$(dirname "$0")/.."

if [ ! -f out/data_compound/data_dict.npz ]; then
  echo "dataset missing: run scripts/make_ablation_data.py out/data_compound first" >&2
  exit 1
fi

for arm in $ARMS; do
  for attempt in 1 2 3; do
    echo "=== ablation arm: $arm (budget ${BUDGET}s, attempt $attempt) ==="
    rm -rf "out/ablation_${arm}"
    # raised priority: the tunneled-TPU client is latency-sensitive —
    # background CPU load on this box has caused worker-heartbeat
    # faults (UNAVAILABLE) mid-arm. Keep the box quiet during arms.
    nice -n -5 python train_mvr.py configs/ablation_compound_${arm}.yml \
      --out-dir out/ablation_${arm} \
      --max-iters 1000000 --exit-after "$BUDGET" \
      --validate-every 500 --checkpoint-every 1000 --print-every 100 \
      --eval-mesh-resolution 128
    code=$?
    if [ "$code" = "3" ] || [ "$code" = "0" ]; then
      break
    fi
    echo "arm $arm attempt $attempt FAILED with exit $code" >&2
    if [ "$attempt" = "3" ]; then
      echo "arm $arm giving up after 3 attempts" >&2
    fi
    sleep 60
  done
done
python scripts/summarize_ablation.py out/ablation_implicit \
  out/ablation_uni out/ablation_lossS --budget "$BUDGET"
