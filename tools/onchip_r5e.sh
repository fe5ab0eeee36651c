#!/usr/bin/env bash
# Round-5 fifth queue (runs after r5d):
#   r5e_bench_full      full bench.py under the round-5 shipping defaults
#                       (fused_mlp everywhere + kernel_normrope at
#                       dh%128==0) — the in-session record preceding the
#                       driver's BENCH_r05.json
#   r5e_md17_ab_clean   re-run of the MD17 head-split step A/B on an idle
#                       chip (the first run overlapped the tail of a
#                       training arm; its baseline matched the historical
#                       1872-1877 ms trace, but re-measure cleanly)
#   r5e_train_loop      trainer-loop numbers at both stage-2 shapes under
#                       the new defaults (fused_mlp primal runs in the
#                       training forward too)
#   r5e_md17_h2_train   MD17 stage-2 head-split convergence-parity arm
#                       (2x128 at hidden 256 — the split that HALVES the
#                       step) + fp32 test protocol, same budget/lineage
#                       as conv-md17-s2
set -u
cd "${LAM_SLIDE_REPO:-$(dirname "$0")/..}"
mkdir -p /tmp/onchip
echo $$ > /tmp/onchip/r5e.pid
LOGDIR=/tmp/onchip
WATCH=$LOGDIR/r5e.log
DEADLINE=${LAM_SLIDE_R5E_DEADLINE:-32000}
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/tmp/lam_slide_jax_cache}
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"
mkdir -p "$JAX_COMPILATION_CACHE_DIR"
source tools/onchip_lib.sh

wait_for_runner_exit /tmp/onchip/r5d.pid || { note "r5e aborted waiting on r5d"; exit 1; }
note "r5d done; starting r5e queue"

one_pass() {
  run_step r5e_bench_full 3600 python bench.py
  run_step r5e_md17_ab_clean 3600 python tools/measure_md17_dh_ab.py \
    --arms h8_dh32,h2_dh128
  run_step r5e_train_loop 2400 python tools/measure_train_loop.py --config both
  run_step r5e_md17_h2_train 5400 python -m lam_slide_tpu.train.cli \
    --experiment md17_second_stage \
    --workspace runs/convergence --run-id conv-md17-s2-h2 --no-mesh --resume \
    --first-stage-run conv-md17-s1 --epochs 16 \
    --set val_every_n_epochs=2 --test \
    --exp-set synthetic_frames=90000 --exp-set batch_size=32 \
    --exp-set num_heads=2
}

one_pass
for pass in 2 3; do
  [ "$SECONDS" -ge "$DEADLINE" ] && break
  note "retry pass $pass"
  one_pass
done
note "r5e queue done (elapsed ${SECONDS}s)"
