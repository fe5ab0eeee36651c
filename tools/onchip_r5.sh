#!/usr/bin/env bash
# Round-5 on-chip queue (single v5e chip, tunneled; serialized behind the
# still-running r4b parity runner). Two workstreams, measurements first:
#
# A. Perf (verdict r4 items 1+7):
#    r5_variance     N=5 repeat band for the two headline bench points
#    r5_dh128_sweep  fill-in tpu_split batches 4/6/12 (peak hunt)
#    r5_fused_dh128  the ENTIRE fusion/glue A/B set re-run at 3xdh=128 —
#                    every dh=24 "not realizably fusible" verdict is
#                    untested at the packed layout where the 4.34x->5x gap
#                    now lives
#
# B. Peptide stage-1 floor bisect (verdict r4 item 3): the ~5.1 A^2 floor
#    is identical on compressible v2 and incompressible v1 data. Two
#    suspects, isolated as arms at the conv-pep2-s1 config (128 peptides,
#    v2, bs 512):
#    r5_s1_sc10_6k   scale=10 (nm-range coordinates — the protocol-faithful
#                    normalization: mdtraj yields nm; the synthetic
#                    generator emits Angstroms), SAME 6k budget
#    r5_s1_sc10_50k  scale=10 at the reference 50k-epoch budget
#    r5_s1_sc1_50k   scale=1 at 50k — isolates budget from scale
#    then the chain on the protocol-faithful arm:
#    r5_s2_sc10      stage-2 (v2, same budget as conv-pep2-s2 + 1000ep)
#    r5_eval_sc10    dopri5 JSD bundle   r5_eval_sc10_ctl  random-init arm
#
# Discipline: dedicated pid slot, wedge-aware retries, hard deadline
# (tools/onchip_lib.sh).
set -u
cd "${LAM_SLIDE_REPO:-$(dirname "$0")/..}"
mkdir -p /tmp/onchip
echo $$ > /tmp/onchip/r5.pid
LOGDIR=/tmp/onchip
WATCH=$LOGDIR/r5.log
DEADLINE=${LAM_SLIDE_R5_DEADLINE:-30000}
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/tmp/lam_slide_jax_cache}
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"
mkdir -p "$JAX_COMPILATION_CACHE_DIR"
source tools/onchip_lib.sh

# one chip: wait for the r4b parity runner (mid h12 arm) to exit
wait_for_runner_exit /tmp/onchip/r4b.pid || { note "r5 aborted waiting on r4b"; exit 1; }
note "r4b done; starting r5 queue"

s1_arm() { # run_id epochs extra-args...
  local id=$1 ep=$2; shift 2
  python -m lam_slide_tpu.train.cli \
    --experiment peptide_first_stage \
    --workspace runs/bisect --run-id "$id" --no-mesh --resume \
    --epochs "$ep" \
    --exp-set synthetic_version=2 \
    --exp-set synthetic_peptides=128 --exp-set synthetic_frames=600 \
    --exp-set repeats=4 --exp-set frame_holdout=0.15 \
    --set val_every_n_epochs=500 --set ckpt_every_n_epochs=1000 "$@"
}
export -f s1_arm

one_pass() {
  # measurements first: they complete in minutes and gate code decisions
  run_step r5_variance 4500 python tools/measure_bench_variance.py --reps 5
  run_step r5_dh128_sweep 2400 python tools/measure_dh_ab.py --heads 3 --batches 4,6,12
  run_step r5_fused_dh128 5400 python tools/measure_fused_ab.py --num-heads 3 --batch 8 \
    --arms unfused,fused,adaln_only,spatial_only,headmajor,kernel_normrope,emit_headmajor

  # stage-1 floor bisect
  run_step r5_s1_sc10_6k 1800 bash -c 's1_arm bisect-s1-sc10-6k 6000 --exp-set scale=10'
  run_step r5_s1_sc10_50k 7200 bash -c 's1_arm bisect-s1-sc10 50000 --exp-set scale=10'
  run_step r5_s1_sc1_50k 7200 bash -c 's1_arm bisect-s1-sc1 50000'

  # chain on the protocol-faithful arm (scale=10, reference budget)
  run_step r5_s2_sc10 5400 python -m lam_slide_tpu.train.cli \
    --experiment peptide_second_stage \
    --workspace runs/bisect --run-id bisect-s2-sc10 --no-mesh --resume \
    --first-stage-run bisect-s1-sc10 --epochs 1000 \
    --exp-set synthetic_version=2 \
    --exp-set synthetic_peptides=16 --exp-set synthetic_frames=4000 \
    --exp-set repeats=4 --exp-set frame_holdout=0.3 \
    --set val_every_n_epochs=50 --set ckpt_every_n_epochs=50
  run_step r5_eval_sc10 3600 python -m lam_slide_tpu.analysis.eval_cli \
    --run bisect-s2-sc10 --workspace runs/bisect --num-rollouts 3
  run_step r5_eval_sc10_ctl 3600 python -m lam_slide_tpu.analysis.eval_cli \
    --run bisect-s2-sc10 --workspace runs/bisect --num-rollouts 3 --control
}

one_pass
for pass in 2 3; do
  [ "$SECONDS" -ge "$DEADLINE" ] && break
  note "retry pass $pass"
  one_pass
done
note "r5 queue done (elapsed ${SECONDS}s)"
