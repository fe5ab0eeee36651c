#!/usr/bin/env bash
# Round-5 third queue: MD17 head-split + fused-MLP step A/B (runs after
# r5b; one chip). See tools/measure_md17_dh_ab.py.
set -u
cd "${LAM_SLIDE_REPO:-$(dirname "$0")/..}"
mkdir -p /tmp/onchip
echo $$ > /tmp/onchip/r5c.pid
LOGDIR=/tmp/onchip
WATCH=$LOGDIR/r5c.log
DEADLINE=${LAM_SLIDE_R5C_DEADLINE:-38000}
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/tmp/lam_slide_jax_cache}
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"
mkdir -p "$JAX_COMPILATION_CACHE_DIR"
source tools/onchip_lib.sh

wait_for_runner_exit /tmp/onchip/r5b.pid || { note "r5c aborted waiting on r5b"; exit 1; }
note "r5b done; starting r5c queue"

one_pass() {
  run_step r5c_md17_dh_ab 3600 python tools/measure_md17_dh_ab.py \
    --arms h8_dh32,h2_dh128,h2_dh128_fmlp,h8_dh32_fmlp
}

one_pass
for pass in 2 3; do
  [ "$SECONDS" -ge "$DEADLINE" ] && break
  note "retry pass $pass"
  one_pass
done
note "r5c queue done (elapsed ${SECONDS}s)"
