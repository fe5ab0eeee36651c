#!/bin/bash
# Reference budget: 10000 epochs, bs 64 (scripts/nba/first-stage.sh)
set -e
export OMP_NUM_THREADS=1
python -m lam_slide_tpu.train.cli --experiment nba_first_stage "$@"
