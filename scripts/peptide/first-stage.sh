#!/bin/bash
# Reference budget: 50000 epochs, bs 512 (scripts/peptide/first-stage.sh)
set -e
export OMP_NUM_THREADS=1
python -m lam_slide_tpu.train.cli --experiment peptide_first_stage "$@"
