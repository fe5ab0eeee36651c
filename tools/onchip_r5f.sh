#!/usr/bin/env bash
# Round-5 final queue. The VM restart that ended the previous session
# cleared /tmp (checkpoints + compile cache) before the r5d/r5e queues
# ran, so this queue re-derives their prerequisites and runs the
# remaining round-5 deliverables in strict priority order:
#
#   r5f_s1_sc10_6k    retrain the scale-fixed stage-1 (ckpt was in the
#                     gitignored checkpoints/ dir — gone with the VM);
#                     identical config/budget to the committed
#                     bisect-s1-sc10-6k artifact (val pos 0.0030)
#   r5d_s2_sc10       stage-2 on that lineage (1000 ep)
#   r5d_eval_sc10     dopri5 JSD bundle        r5d_eval_sc10_ctl  control
#   r5d_forecast_sc10 forecast-gap with persistence/ensemble baselines
#                     — together: the JSD inversion-flip deliverable
#   r5e_bench_full    full bench.py under the round-5 shipping defaults
#   r5f_md17_s1       retrain conv-md17-s1 (same reason; convergence.py
#                     args verbatim)
#   r5e_md17_h2_train MD17 stage-2 2x128 head-split parity arm at the
#                     committed conv-md17-s2's REALIZED budget (8 epochs,
#                     test ADE 1.405 / FDE 1.415)
#   r5e_md17_ab_clean clean-chip MD17 head-split step A/B
#   r5e_train_loop    trainer-loop ms/step at both stage-2 shapes
#   r5d_s1_sc1_b25k   budget-only attribution arm (scale=1, 25k epochs)
#   r5d_s1_sc10_50k   reference-budget scale arm (fills remaining clock)
set -u
cd "${LAM_SLIDE_REPO:-$(dirname "$0")/..}"
mkdir -p /tmp/onchip
echo $$ > /tmp/onchip/r5f.pid
LOGDIR=/tmp/onchip
WATCH=$LOGDIR/r5f.log
DEADLINE=${LAM_SLIDE_R5F_DEADLINE:-15000}
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/tmp/lam_slide_jax_cache}
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"
mkdir -p "$JAX_COMPILATION_CACHE_DIR"
source tools/onchip_lib.sh

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
  run_step r5f_s1_sc10_6k 2400 bash -c 's1_arm bisect-s1-sc10-6k 6000 --exp-set scale=10'
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
  run_step r5e_bench_full 3600 python bench.py
  run_step r5f_md17_s1 1800 python -m lam_slide_tpu.train.cli \
    --experiment md17_first_stage --molecule aspirin \
    --workspace runs/convergence --run-id conv-md17-s1 --no-mesh --resume \
    --epochs 120 --set val_every_n_epochs=4 \
    --exp-set synthetic_frames=90000
  run_step r5e_md17_h2_train 3600 python -m lam_slide_tpu.train.cli \
    --experiment md17_second_stage --molecule aspirin \
    --workspace runs/convergence --run-id conv-md17-s2-h2 --no-mesh --resume \
    --first-stage-run conv-md17-s1 --epochs 8 \
    --set val_every_n_epochs=2 --test \
    --exp-set synthetic_frames=90000 --exp-set batch_size=32 \
    --exp-set num_heads=2
  run_step r5e_md17_ab_clean 3600 python tools/measure_md17_dh_ab.py \
    --arms h8_dh32,h2_dh128
  run_step r5e_train_loop 2400 python tools/measure_train_loop.py --config both
  run_step r5d_s1_sc1_b25k 7200 bash -c 's1_arm bisect-s1-sc1-b25k 25000'
  run_step r5d_s1_sc10_50k 10800 bash -c 's1_arm bisect-s1-sc10 50000 --exp-set scale=10'
}

one_pass
for pass in 2 3; do
  [ "$SECONDS" -ge "$DEADLINE" ] && break
  note "retry pass $pass"
  one_pass
done
note "r5f queue done (elapsed ${SECONDS}s)"
