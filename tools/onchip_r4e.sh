#!/usr/bin/env bash
# Round-4 short-attention measurement queue: land the on-chip numbers
# PERF.md has been waiting on since round 3 ("results below when the
# tunnel heals") — the grouped VMEM-resident short-axis attention kernel
# (ops/short_attention.py) vs the XLA path at the MD17 stage-2 temporal
# shape, kernel-level and end-to-end train-step A/B. Waits for the r4,
# r4b and r4d queues to exit (one chip); tools/onchip_r4c.sh (MD17
# parity) waits on THIS runner.
set -u
cd "${LAM_SLIDE_REPO:-$(dirname "$0")/..}"
mkdir -p /tmp/onchip
echo $$ > /tmp/onchip/r4e.pid
LOGDIR=/tmp/onchip
WATCH=$LOGDIR/r4e.log
DEADLINE=${LAM_SLIDE_R4E_DEADLINE:-28800}
. "$(dirname "$0")/onchip_lib.sh"

export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/tmp/lam_slide_jax_cache}
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"
mkdir -p "$JAX_COMPILATION_CACHE_DIR"

one_pass() {
  run_step short_attn_kernel 2400 python tools/measure_short_attention.py
  run_step short_attn_md17 3600 python tools/measure_md17_short_ab.py --steps 6
}

wait_for_runner_exit "$LOGDIR/r4.pid" || exit 1
wait_for_runner_exit "$LOGDIR/r4f.pid" || exit 1
wait_for_runner_exit "$LOGDIR/r4d.pid" || exit 1
note "r4/r4f/r4d finished; starting short-attention arms"
one_pass
for pass in 2 3; do
  [ "$SECONDS" -ge "$DEADLINE" ] && break
  note "retry pass $pass"
  one_pass
done
note "r4e queue done (elapsed ${SECONDS}s)"
