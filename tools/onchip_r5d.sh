#!/usr/bin/env bash
# Round-5 fourth queue (runs after r5c): the scale-fixed peptide chain +
# the budget-attribution arm. The r5 queue's 50k arms were preempted once
# the 6k scale=10 arm landed val pos 0.0030 (0.30 scale-1-equivalent,
# 17x below the old 5.1 floor) — the critical path is the stage-2 + JSD
# re-run on that lineage, not more stage-1 budget.
#
#   r5d_s2_sc10       stage-2 (1000 ep) on bisect-s1-sc10-6k
#   r5d_eval_sc10     dopri5 JSD bundle       r5d_eval_sc10_ctl  control
#   r5d_forecast_sc10 forecast-gap (persistence/ensmean baselines)
#   r5d_s1_sc1_b25k   scale=1 at 25k epochs — does budget ALONE move the
#                     old floor? (isolates budget from scale)
#   r5d_s1_sc10_50k   resume of the preempted reference-budget arm (last;
#                     fills remaining wall-clock)
set -u
cd "${LAM_SLIDE_REPO:-$(dirname "$0")/..}"
mkdir -p /tmp/onchip
echo $$ > /tmp/onchip/r5d.pid
LOGDIR=/tmp/onchip
WATCH=$LOGDIR/r5d.log
DEADLINE=${LAM_SLIDE_R5D_DEADLINE:-30000}
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/tmp/lam_slide_jax_cache}
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"
mkdir -p "$JAX_COMPILATION_CACHE_DIR"
source tools/onchip_lib.sh

wait_for_runner_exit /tmp/onchip/r5c.pid || { note "r5d aborted waiting on r5c"; exit 1; }
note "r5c done; starting r5d queue"

s1_arm() { # run_id epochs extra-args...
  local id=$1 ep=$2; shift 2
  python -m lam_slide_tpu.train.cli \
    --experiment peptide_first_stage \
    --workspace runs/bisect --run-id "$id" --no-mesh --resume \
    --epochs "$ep" \
    --exp-set synthetic_version=2 \
    --exp-set synthetic_peptides=128 --exp-set synthetic_frames=600 \
    --exp-set repeats=4 --exp-set frame_holdout=0.15 \
    --set val_every_n_epochs=500 --set ckpt_every_n_epochs=1000 "$@"
}
export -f s1_arm

one_pass() {
  run_step r5d_s2_sc10 5400 python -m lam_slide_tpu.train.cli \
    --experiment peptide_second_stage \
    --workspace runs/bisect --run-id bisect-s2-sc10 --no-mesh --resume \
    --first-stage-run bisect-s1-sc10-6k --epochs 1000 \
    --exp-set synthetic_version=2 \
    --exp-set synthetic_peptides=16 --exp-set synthetic_frames=4000 \
    --exp-set repeats=4 --exp-set frame_holdout=0.3 \
    --set val_every_n_epochs=50 --set ckpt_every_n_epochs=50
  run_step r5d_eval_sc10 3600 python -m lam_slide_tpu.analysis.eval_cli \
    --run bisect-s2-sc10 --workspace runs/bisect --num-rollouts 3
  run_step r5d_eval_sc10_ctl 3600 python -m lam_slide_tpu.analysis.eval_cli \
    --run bisect-s2-sc10 --workspace runs/bisect --num-rollouts 3 --control
  run_step r5d_forecast_sc10 3600 python tools/eval_forecast_gap.py \
    --run bisect-s2-sc10 --workspace runs/bisect
  run_step r5d_s1_sc1_b25k 7200 bash -c 's1_arm bisect-s1-sc1-b25k 25000'
  run_step r5d_s1_sc10_50k 10800 bash -c 's1_arm bisect-s1-sc10 50000 --exp-set scale=10'
}

one_pass
for pass in 2 3; do
  [ "$SECONDS" -ge "$DEADLINE" ] && break
  note "retry pass $pass"
  one_pass
done
note "r5d queue done (elapsed ${SECONDS}s)"
