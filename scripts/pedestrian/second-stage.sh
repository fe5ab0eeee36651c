#!/bin/bash
# Reference budget: 2000-3000 epochs, bs 256-1024 (scripts/pedestrian/second-stage.sh)
set -e
export OMP_NUM_THREADS=1
RUN_ID=${1:?usage: second-stage.sh <first_stage_run_id> [flags]}; shift
python -m lam_slide_tpu.train.cli --experiment pedestrian_second_stage \
    --first-stage-run "$RUN_ID" --test "$@"
