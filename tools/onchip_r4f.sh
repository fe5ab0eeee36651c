#!/usr/bin/env bash
# Round-4 v2-generator convergence chain: the conv-pep2-* artifact — the
# same two-stage peptide protocol as the r4 queue's conv-pep-* chain but
# on the STRUCTURED synthetic generator (synthetic_version=2: a k=2
# metastable latent drives all torsions), where the autoencoder has
# something to compress and the TICA/MSM/JSD eval metrics measure real
# basin structure. Runs right after the r4 queue (highest-value artifact
# after the v1 chain); the later parity/measurement queues wait on this.
set -u
cd "${LAM_SLIDE_REPO:-$(dirname "$0")/..}"
mkdir -p /tmp/onchip
echo $$ > /tmp/onchip/r4f.pid
LOGDIR=/tmp/onchip
WATCH=$LOGDIR/r4f.log
DEADLINE=${LAM_SLIDE_R4F_DEADLINE:-28800}
. "$(dirname "$0")/onchip_lib.sh"

export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/tmp/lam_slide_jax_cache}
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"
mkdir -p "$JAX_COMPILATION_CACHE_DIR"

one_pass() {
  # s2 at 600 epochs (vs the v1 chain's 1000): the v1 curve shows val
  # si_loss already well-converged by then, and the remaining wall-clock
  # this round has to also fit the parity/measurement queues behind this.
  run_step pep2_convergence 7200 python tools/convergence.py \
    --skip-md17 --synthetic-version 2 --pep-s2-epochs 600 \
    --workspace runs/convergence
}

wait_for_runner_exit "$LOGDIR/r4.pid" || exit 1
wait_for_runner_exit "$LOGDIR/r4g.pid" || exit 1
note "r4/r4g finished; starting v2 convergence chain"
one_pass
for pass in 2 3; do
  [ "$SECONDS" -ge "$DEADLINE" ] && break
  note "retry pass $pass"
  one_pass
done
note "r4f queue done (elapsed ${SECONDS}s)"
