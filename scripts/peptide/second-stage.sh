#!/bin/bash
# Reference budget: 1500 epochs, bs 16 (scripts/peptide/second-stage.sh);
# eval: python -m lam_slide_tpu.analysis.eval_cli --run <run_id> --sampling-method dopri5
set -e
export OMP_NUM_THREADS=1
RUN_ID=${1:?usage: second-stage.sh <first_stage_run_id> [flags]}; shift
python -m lam_slide_tpu.train.cli --experiment peptide_second_stage \
    --first-stage-run "$RUN_ID" "$@"
