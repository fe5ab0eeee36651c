#!/usr/bin/env bash
# Round-4 bench-warm runner: one full bench.py pass (headline B-sweep +
# tpu_split variant + dopri5 arm) immediately after the r4 queue exits, so
# the driver's end-of-round bench hits a WARM compile cache (fresh /tmp
# this session = cold cache; ~10 solver compiles over the tunnel would
# otherwise land inside the driver's own run). The v2 convergence chain
# (tools/onchip_r4f.sh) waits on this runner.
set -u
cd "${LAM_SLIDE_REPO:-$(dirname "$0")/..}"
mkdir -p /tmp/onchip
echo $$ > /tmp/onchip/r4g.pid
LOGDIR=/tmp/onchip
WATCH=$LOGDIR/r4g.log
DEADLINE=${LAM_SLIDE_R4G_DEADLINE:-28800}
. "$(dirname "$0")/onchip_lib.sh"

export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/tmp/lam_slide_jax_cache}
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"
mkdir -p "$JAX_COMPILATION_CACHE_DIR"

one_pass() {
  run_step bench_full 4200 env LAM_SLIDE_BENCH_WORKER_TIMEOUT=3900 \
    python bench.py
}

wait_for_runner_exit "$LOGDIR/r4.pid" || exit 1
note "r4 finished; running full bench warm"
one_pass
for pass in 2 3; do
  [ "$SECONDS" -ge "$DEADLINE" ] && break
  note "retry pass $pass"
  one_pass
done
note "r4g queue done (elapsed ${SECONDS}s)"
