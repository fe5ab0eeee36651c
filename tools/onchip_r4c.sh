#!/usr/bin/env bash
# Round-4 MD17 head-split convergence-parity queue (verdict item 3: "show
# MD17 convergence parity vs the reference split on the synthetic chain").
# Trains one MD17 stage-1 lineage, then three stage-2 arms at identical
# budgets/data/seed differing ONLY in the DiT head split:
#
#   par-md17-s2-h16  16 heads x dh=16 (reference split — in-session control)
#   par-md17-s2-h2    2 heads x dh=128 (packed-flash TPU-native split)
#   par-md17-s2-h8    8 heads x dh=32
#
# Each arm ends with the fp32 --test protocol; parity = matching val
# si_loss curves and test ADE/FDE across arms. Runs strictly after the r4
# and r4b queues exit (one chip — never concurrent with them).
set -u
cd "${LAM_SLIDE_REPO:-$(dirname "$0")/..}"
mkdir -p /tmp/onchip
echo $$ > /tmp/onchip/r4c.pid
LOGDIR=/tmp/onchip
WATCH=$LOGDIR/r4c.log
DEADLINE=${LAM_SLIDE_R4C_DEADLINE:-21600}
. "$(dirname "$0")/onchip_lib.sh"

export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/tmp/lam_slide_jax_cache}
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"
mkdir -p "$JAX_COMPILATION_CACHE_DIR"

WS=runs/dh_parity

s2_arm() { # heads epochs
  local h=$1
  python -m lam_slide_tpu.train.cli \
    --experiment md17_second_stage --molecule aspirin \
    --workspace "$WS" --run-id "par-md17-s2-h$h" --no-mesh \
    --first-stage-run par-md17-s1 --epochs 12 \
    --set val_every_n_epochs=2 --test \
    --exp-set "num_heads=$h" \
    --exp-set synthetic_frames=90000 --exp-set batch_size=32
}
export -f s2_arm
export WS

one_pass() {
  run_step par_md17_s1 3600 python -m lam_slide_tpu.train.cli \
    --experiment md17_first_stage --molecule aspirin \
    --workspace "$WS" --run-id par-md17-s1 --no-mesh --epochs 120 \
    --set val_every_n_epochs=8 \
    --exp-set synthetic_frames=90000
  run_step par_s2_h16 5400 bash -c 's2_arm 16'
  run_step par_s2_h2 5400 bash -c 's2_arm 2'
  run_step par_s2_h8 5400 bash -c 's2_arm 8'
}

wait_for_runner_exit "$LOGDIR/r4.pid" || exit 1
wait_for_runner_exit "$LOGDIR/r4f.pid" || exit 1
wait_for_runner_exit "$LOGDIR/r4b.pid" || exit 1
wait_for_runner_exit "$LOGDIR/r4d.pid" || exit 1
wait_for_runner_exit "$LOGDIR/r4e.pid" || exit 1
note "r4/r4f/r4b/r4d/r4e finished; starting MD17 parity arms"
one_pass
for pass in 2 3; do
  [ "$SECONDS" -ge "$DEADLINE" ] && break
  note "retry pass $pass"
  one_pass
done
note "r4c queue done (elapsed ${SECONDS}s)"
