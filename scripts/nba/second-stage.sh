#!/bin/bash
# Reference budget: 1000 epochs, bs 1024 (scripts/nba/second-stage.sh)
set -e
export OMP_NUM_THREADS=1
RUN_ID=${1:?usage: second-stage.sh <first_stage_run_id> [flags]}; shift
python -m lam_slide_tpu.train.cli --experiment nba_second_stage \
    --first-stage-run "$RUN_ID" --test "$@"
