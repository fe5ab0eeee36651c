#!/bin/bash
# Reference budget: bs 256 (scripts/pedestrian/first-stage.sh)
set -e
export OMP_NUM_THREADS=1
python -m lam_slide_tpu.train.cli --experiment pedestrian_first_stage "$@"
