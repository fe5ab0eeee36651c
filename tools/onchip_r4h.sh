#!/usr/bin/env bash
# Round-4 forecast-gap runner: the dynamics-aware trained-vs-control
# metric (tools/eval_forecast_gap.py) on both convergence chains — the
# learning evidence the equilibrium-JSD control inverts at compressed
# budgets (docs/CONVERGENCE.md). Cheap (~2 min warm per run). Runs after
# the measurement queues; the parity-training runner waits on this.
set -u
cd "${LAM_SLIDE_REPO:-$(dirname "$0")/..}"
mkdir -p /tmp/onchip
echo $$ > /tmp/onchip/r4h.pid
LOGDIR=/tmp/onchip
WATCH=$LOGDIR/r4h.log
DEADLINE=${LAM_SLIDE_R4H_DEADLINE:-28800}
. "$(dirname "$0")/onchip_lib.sh"

export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/tmp/lam_slide_jax_cache}
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"
mkdir -p "$JAX_COMPILATION_CACHE_DIR"

one_pass() {
  run_step forecast_pep2 1800 python tools/eval_forecast_gap.py \
    --run conv-pep2-s2 --workspace runs/convergence
  run_step forecast_pep1 1800 python tools/eval_forecast_gap.py \
    --run conv-pep-s2 --workspace runs/convergence
}

for p in r4 r4g r4f r4d r4e; do
  wait_for_runner_exit "$LOGDIR/$p.pid" || exit 1
done
note "queues ahead finished; running forecast-gap arms"
one_pass
for pass in 2 3; do
  [ "$SECONDS" -ge "$DEADLINE" ] && break
  note "retry pass $pass"
  one_pass
done
note "r4h queue done (elapsed ${SECONDS}s)"
