#!/bin/bash
# Reference budget: 3000 epochs, bs 256 (scripts/md17/first-stage.sh)
set -e
export OMP_NUM_THREADS=1
python -m lam_slide_tpu.train.cli --experiment md17_first_stage "$@"
