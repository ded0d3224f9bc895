#!/bin/bash
# Crash-RESUMING single-arm ablation runner.
#
# run_ablation.sh / run_all_arms.sh wipe and restart a crashed arm from
# scratch (clean-run purity) — but the tunneled TPU worker dies
# deterministically at specific resample-bearing iterations of the iso
# arms (r4: uni attempts 2 and 3 both died ~it 1000 with identical
# losses), so a wipe-based runner can burn its whole budget re-reaching
# the same crash. This runner RESUMES from the last checkpoint instead:
# train_mvr auto-loads <out-dir>/model.npz, and the host KeyChain is a
# sequential stream that is NOT checkpointed, so a resumed process
# draws different keys at the crash iteration — a data-dependent fault
# does not replay. metrics.jsonl is append-mode, so curves survive.
#
# Budget accounting: wall-clock of every attempt (including compile
# re-pay and the crashed segments) counts against the arm budget —
# crash recovery cost is real and stays inside the equal budget.
#
# Usage: run_arm_resume.sh <arm> <budget_s> [fresh]
set -u
arm=$1
budget=$2
outdir="out/ablation_${arm}"
cd /root/repo
mkdir -p ablation_metrics
if [ "${3:-fresh}" = "fresh" ]; then
  rm -rf "$outdir"
fi
left=$budget
attempt=0
mkdir -p "$outdir"
while [ "$left" -gt 90 ]; do
  attempt=$((attempt + 1))
  echo "=== arm $arm attempt $attempt start $(date +%H:%M:%S) left=${left}s ==="
  t0=$(date +%s)
  # tee stdout+stderr: a crashed attempt must leave its traceback /
  # watchdog stack dump in the out dir (VERDICT r4 weak #4 — four
  # identical crashes with zero forensic evidence)
  nice -n -5 python train_mvr.py "configs/ablation_compound_${arm}.yml" \
    --out-dir "$outdir" \
    --max-iters 1000000 --exit-after "$left" \
    --validate-every 500 --checkpoint-every 250 --print-every 100 \
    --eval-mesh-resolution 128 --restart-every-resample \
    > >(tee "$outdir/train_attempt${attempt}.log") 2>&1
  code=$?
  # the 20 s inter-attempt sleep counts against the budget too (it is
  # wall-clock the arm consumed), so deduct it inside the timed region.
  # exit 4 = planned restart-every-resample handoff (not a crash): no
  # cool-down needed
  if [ "$code" != "3" ] && [ "$code" != "0" ] && [ "$code" != "4" ]; then
    sleep 20
  fi
  t1=$(date +%s)
  left=$((left - (t1 - t0)))
  echo "=== arm $arm attempt $attempt exit=$code $(date +%H:%M:%S) left=${left}s ==="
  if [ "$code" = "3" ] || [ "$code" = "0" ]; then
    break
  fi
done
# evidence hygiene (VERDICT r4 item 7): metrics land in the tracked
# ablation_metrics/ dir and are staged immediately so a finished arm
# never sits untracked
cp "$outdir/metrics.jsonl" "ablation_metrics/${arm}.jsonl" 2>/dev/null
git add "ablation_metrics/${arm}.jsonl" 2>/dev/null
echo "=== arm $arm done $(date +%H:%M:%S) ==="
