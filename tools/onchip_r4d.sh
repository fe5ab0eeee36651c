#!/usr/bin/env bash
# Round-4 dopri5 layout A/B queue (verdict item 4: close the dopri5 18%
# gap). Runs tools/measure_dopri5_layouts.py in two steps: the safe arms
# (euler_scan + dopri5_scan — cached layouts) first, the NEW-SHAPE
# unrolled dopri5 compile as its own LAST step so a pathological compile
# wedge costs nothing upstream. Waits for the r4 and r4b queues to exit
# (one chip); tools/onchip_r4c.sh (MD17 parity) is launched to wait on
# THIS runner's pid.
set -u
cd "${LAM_SLIDE_REPO:-$(dirname "$0")/..}"
mkdir -p /tmp/onchip
echo $$ > /tmp/onchip/r4d.pid
LOGDIR=/tmp/onchip
WATCH=$LOGDIR/r4d.log
DEADLINE=${LAM_SLIDE_R4D_DEADLINE:-21600}
. "$(dirname "$0")/onchip_lib.sh"

export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/tmp/lam_slide_jax_cache}
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"
mkdir -p "$JAX_COMPILATION_CACHE_DIR"

one_pass() {
  run_step d5_layouts_safe 2400 python tools/measure_dopri5_layouts.py \
    --skip-unrolled
  run_step d5_layout_unrolled 3000 python tools/measure_dopri5_layouts.py
}

wait_for_runner_exit "$LOGDIR/r4.pid" || exit 1
wait_for_runner_exit "$LOGDIR/r4f.pid" || exit 1
note "r4/r4f finished; starting dopri5 layout arms"
one_pass
for pass in 2 3; do
  [ "$SECONDS" -ge "$DEADLINE" ] && break
  note "retry pass $pass"
  one_pass
done
note "r4d queue done (elapsed ${SECONDS}s)"
