#!/usr/bin/env bash
# Round-5 follow-on queue: runs after tools/onchip_r5.sh (one chip).
#
#   r5b_fused_mlp_h3    NEW lever at the dh=128 packed layout: the MLP
#                       branch (linear1 mlp-slice -> gelu -> linear2
#                       mlp-slice) in one VMEM-resident Pallas kernel
#                       (ops/fused_mlp.py) — the only glue chain the dh=24
#                       negative-result set never targeted. A/B at B=8
#                       num_heads=3 vs the shipping composition.
#   r5b_fused_mlp_ref   same lever at the reference split (B=2, 16x24).
#   r5b_forecast_pep2   re-run the forecast-gap artifact for conv-pep2-s2
#                       with the hardened metric (persistence + ensemble
#                       baselines, held-out-tail conditioning).
#   r5b_forecast_pep1   same for conv-pep-s2 (v1 chain).
#   r5b_forecast_sc10   forecast-gap for the scale=10 bisect chain.
set -u
cd "${LAM_SLIDE_REPO:-$(dirname "$0")/..}"
mkdir -p /tmp/onchip
echo $$ > /tmp/onchip/r5b.pid
LOGDIR=/tmp/onchip
WATCH=$LOGDIR/r5b.log
DEADLINE=${LAM_SLIDE_R5B_DEADLINE:-34000}
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/tmp/lam_slide_jax_cache}
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"
mkdir -p "$JAX_COMPILATION_CACHE_DIR"
source tools/onchip_lib.sh

wait_for_runner_exit /tmp/onchip/r5.pid || { note "r5b aborted waiting on r5"; exit 1; }
note "r5 done; starting r5b queue"

one_pass() {
  # combo: the dh=128 kernel_normrope win (1.047x) stacked with fused_mlp,
  # in-session controls for both solos — the 5x gate is ~1180 steps/s
  run_step r5b_fused_mlp_h3 3600 python tools/measure_fused_ab.py \
    --num-heads 3 --batch 8 \
    --arms unfused,fused_mlp,kernel_normrope,normrope_mlp
  run_step r5b_fused_mlp_ref 2400 python tools/measure_fused_ab.py \
    --num-heads 16 --batch 2 --arms unfused,fused_mlp
  run_step r5b_forecast_pep2 3600 python tools/eval_forecast_gap.py \
    --run conv-pep2-s2 --workspace runs/convergence
  run_step r5b_forecast_pep1 3600 python tools/eval_forecast_gap.py \
    --run conv-pep-s2 --workspace runs/convergence
  run_step r5b_forecast_sc10 3600 python tools/eval_forecast_gap.py \
    --run bisect-s2-sc10 --workspace runs/bisect
}

one_pass
for pass in 2 3; do
  [ "$SECONDS" -ge "$DEADLINE" ] && break
  note "retry pass $pass"
  one_pass
done
note "r5b queue done (elapsed ${SECONDS}s)"
