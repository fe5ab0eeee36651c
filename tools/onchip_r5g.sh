#!/usr/bin/env bash
# Round-5 closing queue: the stage-2 budget extension on the scale-fixed
# lineage — the measured JSD-flip lever (val si_loss was still falling
# 20%/100ep at the 1000-epoch cut with no plateau: 0.0107@799 →
# 0.00841@999) — then its eval/forecast, then the r5f leftovers that
# were deferred to buy it wall-clock.
#
#   r5g_s2_ext        resume bisect-s2-sc10 to 2600 epochs (cosine warm
#                     restart over the extended schedule)
#   r5g_eval_ext      dopri5 JSD bundle of the extended model -> eval_ext/
#                     (the 1000-ep eval/ and the training-independent
#                     random-init eval_control/ stay committed as-is)
#   r5g_forecast_ext  forecast-gap -> eval_forecast_ext.json
#   r5e_md17_ab_clean / r5e_train_loop / r5d_s1_sc1_b25k  leftovers,
#                     lowest priority, run only if wall-clock remains
set -u
cd "${LAM_SLIDE_REPO:-$(dirname "$0")/..}"
mkdir -p /tmp/onchip
echo $$ > /tmp/onchip/r5g.pid
LOGDIR=/tmp/onchip
WATCH=$LOGDIR/r5g.log
DEADLINE=${LAM_SLIDE_R5G_DEADLINE:-12000}
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/tmp/lam_slide_jax_cache}
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"
mkdir -p "$JAX_COMPILATION_CACHE_DIR"
source tools/onchip_lib.sh

wait_for_runner_exit /tmp/onchip/r5f.pid || { note "r5g aborted waiting on r5f"; exit 1; }
note "r5f done; starting r5g queue"

one_pass() {
  run_step r5g_s2_ext 3900 python -m lam_slide_tpu.train.cli \
    --experiment peptide_second_stage \
    --workspace runs/bisect --run-id bisect-s2-sc10 --no-mesh --resume \
    --first-stage-run bisect-s1-sc10-6k --epochs 2600 \
    --exp-set synthetic_version=2 \
    --exp-set synthetic_peptides=16 --exp-set synthetic_frames=4000 \
    --exp-set repeats=4 --exp-set frame_holdout=0.3 \
    --set val_every_n_epochs=50 --set ckpt_every_n_epochs=50
  run_step r5g_eval_ext 1800 python -m lam_slide_tpu.analysis.eval_cli \
    --run bisect-s2-sc10 --workspace runs/bisect --num-rollouts 3 \
    --outdir runs/bisect/bisect-s2-sc10/eval_ext
  run_step r5g_forecast_ext 1800 python tools/eval_forecast_gap.py \
    --run bisect-s2-sc10 --workspace runs/bisect \
    --out runs/bisect/bisect-s2-sc10/eval_forecast_ext.json
  run_step r5g_md17_ab_clean 1800 python tools/measure_md17_dh_ab.py \
    --arms h8_dh32,h2_dh128
  run_step r5g_train_loop 1800 python tools/measure_train_loop.py --config both
  run_step r5g_s1_sc1_b25k 7200 python -m lam_slide_tpu.train.cli \
    --experiment peptide_first_stage \
    --workspace runs/bisect --run-id bisect-s1-sc1-b25k --no-mesh --resume \
    --epochs 25000 \
    --exp-set synthetic_version=2 \
    --exp-set synthetic_peptides=128 --exp-set synthetic_frames=600 \
    --exp-set repeats=4 --exp-set frame_holdout=0.15 \
    --set val_every_n_epochs=500 --set ckpt_every_n_epochs=1000
}

one_pass
for pass in 2; do
  [ "$SECONDS" -ge "$DEADLINE" ] && break
  note "retry pass $pass"
  one_pass
done
note "r5g queue done (elapsed ${SECONDS}s)"
