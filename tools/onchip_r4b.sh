#!/usr/bin/env bash
# Round-4 follow-on queue: head-split CONVERGENCE-PARITY arms (verdict
# item 3's second half — tools/measure_dh_ab.py measures raw throughput;
# this measures whether the TPU-native splits LEARN like the reference
# split). Trains peptide stage-2 variants off the conv-pep-s1 lineage the
# r4 queue produces, with identical budgets/data to conv-pep-s2, then
# runs the dopri5 eval bundle on each:
#
#   conv-pep-s2      16 heads x dh=24  (reference split — r4 queue)
#   conv-pep-s2-h3    3 heads x dh=128 (packed-flash variant)
#   conv-pep-s2-h12  12 heads x dh=32
#
# Serialization: ONE chip — this runner refuses to start a step while the
# r4 queue process is alive (pid /tmp/onchip/r4.pid), and requires
# pep_convergence.ok (the lineage + the baseline arm) before training.
#
# Dedicated pid slot (r4b.pid), stderr-aware wedge classification, hard
# wall-clock deadline — same discipline as tools/onchip_r4.sh.
set -u
cd "${LAM_SLIDE_REPO:-$(dirname "$0")/..}"
mkdir -p /tmp/onchip
echo $$ > /tmp/onchip/r4b.pid
LOGDIR=/tmp/onchip
WATCH=$LOGDIR/r4b.log
DEADLINE=${LAM_SLIDE_R4B_DEADLINE:-21600}
note() { echo "$(date -u +%H:%M:%S) $*" >> "$WATCH"; }

export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/tmp/lam_slide_jax_cache}
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"
mkdir -p "$JAX_COMPILATION_CACHE_DIR"

r4_alive() {
  local pid
  pid=$(cat "$LOGDIR/r4.pid" 2>/dev/null) || return 1
  [ -n "$pid" ] && kill -0 "$pid" 2>/dev/null
}

wait_for_r4() {
  while r4_alive; do
    [ "$SECONDS" -ge "$DEADLINE" ] && { note "deadline while waiting on r4"; return 1; }
    sleep 60
  done
  # also run behind the bench-warm, v2-chain, and short-measurement
  # runners — one chip; the short A/Bs go first (they COMPLETE in
  # minutes; a partial parity training is still usable evidence, a
  # partial A/B is not)
  local pid p
  for p in r4g r4f r4d r4e r4h; do
    while pid=$(cat "$LOGDIR/$p.pid" 2>/dev/null) && [ -n "$pid" ] \
        && kill -0 "$pid" 2>/dev/null; do
      [ "$SECONDS" -ge "$DEADLINE" ] && { note "deadline while waiting on $p"; return 1; }
      sleep 60
    done
  done
  [ -e "$LOGDIR/pep_convergence.ok" ] || { note "r4 done but no pep lineage"; return 1; }
  return 0
}

probe() {
  timeout 90 python - <<'EOF' >/dev/null 2>&1
import jax, jax.numpy as jnp
print(float(jax.jit(lambda a: (a @ a).sum())(jnp.ones((128, 128)))))
EOF
}

wait_for_heal() {
  local i
  for i in $(seq 1 400); do
    [ "$SECONDS" -ge "$DEADLINE" ] && { note "deadline hit in wait_for_heal"; return 1; }
    if probe; then note "heal detected (probe $i)"; return 0; fi
    note "wedged (probe $i)"
    sleep 100
  done
  return 1
}

wedged_output() {
  grep -Eq 'tpu_unavailable|"status": "timeout' \
    "$LOGDIR/$1.log" "$LOGDIR/$1.err" 2>/dev/null
}

run_step() { # name timeout cmd...
  local name=$1 to=$2; shift 2
  [ -e "$LOGDIR/$name.ok" ] && { note "$name: already done, skip"; return 0; }
  [ "$SECONDS" -ge "$DEADLINE" ] && { note "$name: skipped (deadline)"; return 1; }
  local attempts
  attempts=$(cat "$LOGDIR/$name.attempts" 2>/dev/null || echo 0)
  if [ "$attempts" -ge 5 ]; then note "$name: attempt cap reached, skip"; return 0; fi
  wait_for_heal || return 1
  note "$name: start (timeout ${to}s, attempt $((attempts + 1)))"
  timeout "$to" "$@" > "$LOGDIR/$name.log" 2> "$LOGDIR/$name.err"
  local rc=$?
  if [ "$rc" -eq 0 ] && [ -s "$LOGDIR/$name.log" ] && ! wedged_output "$name"; then
    touch "$LOGDIR/$name.ok"
    note "$name: OK"
  elif [ "$rc" -eq 124 ] || wedged_output "$name"; then
    note "$name: wedged mid-run rc=$rc (free retry next heal)"
  else
    echo $((attempts + 1)) > "$LOGDIR/$name.attempts"
    note "$name: failed rc=$rc (attempt $((attempts + 1))/5, retry next heal)"
  fi
  return 0
}

train_parity() { # heads
  local h=$1
  python -m lam_slide_tpu.train.cli \
    --experiment peptide_second_stage \
    --workspace runs/convergence --run-id "conv-pep-s2-h$h" --no-mesh \
    --first-stage-run conv-pep-s1 --epochs 1000 --resume \
    --exp-set "num_heads=$h" \
    --exp-set synthetic_peptides=16 --exp-set synthetic_frames=4000 \
    --exp-set repeats=4 --exp-set frame_holdout=0.3 \
    --set val_every_n_epochs=50 --set ckpt_every_n_epochs=50
}

one_pass() {
  run_step parity_h3_train 5400 bash -c 'train_parity 3'
  run_step parity_h3_eval 3600 python -m lam_slide_tpu.analysis.eval_cli \
    --run conv-pep-s2-h3 --workspace runs/convergence --num-rollouts 3
  run_step parity_h12_train 5400 bash -c 'train_parity 12'
  run_step parity_h12_eval 3600 python -m lam_slide_tpu.analysis.eval_cli \
    --run conv-pep-s2-h12 --workspace runs/convergence --num-rollouts 3
}
export -f train_parity

wait_for_r4 || { note "r4b aborting (no lineage)"; exit 1; }
note "r4 queue finished; starting parity arms"
one_pass
for pass in 2 3; do
  [ "$SECONDS" -ge "$DEADLINE" ] && break
  note "retry pass $pass"
  one_pass
done
note "r4b queue done (elapsed ${SECONDS}s)"
