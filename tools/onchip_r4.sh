#!/usr/bin/env bash
# Round-4 on-chip queue: bench warm (driver cache + fresh headline with
# the new steps_accepted field), the peptide convergence chain (round-3
# verdict item 2: 128-peptide synthetic set, frame-holdout val, trained +
# random-control eval), trained-model NFE (item 4), the timed full eval
# protocol (item 7), and the head-split throughput A/B (item 3 — new-shape
# compiles, so it runs LAST: a mid-compile wedge then costs nothing
# upstream).
#
# Advisor fixes vs the r3 runners: dedicated pid slot (r4.pid — r3c
# clobbered r3b's and orphaned its watchdog coverage), wedge
# classification greps stderr too (tpu_unavailable tracebacks land there),
# and a hard internal wall-clock deadline instead of unbounded
# probe-count loops.
set -u
cd "${LAM_SLIDE_REPO:-$(dirname "$0")/..}"
mkdir -p /tmp/onchip
echo $$ > /tmp/onchip/r4.pid
LOGDIR=/tmp/onchip
WATCH=$LOGDIR/r4.log
DEADLINE=${LAM_SLIDE_R4_DEADLINE:-21600}  # total wall seconds for the queue
note() { echo "$(date -u +%H:%M:%S) $*" >> "$WATCH"; }

export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/tmp/lam_slide_jax_cache}
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"
mkdir -p "$JAX_COMPILATION_CACHE_DIR"

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

wedged_output() { # name — tunnel-flavored failure in stdout OR stderr
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

one_pass() {
  run_step bench_warm 3000 env LAM_SLIDE_BENCH_WORKER_TIMEOUT=2700 \
    python bench.py
  run_step pep_convergence 7200 python tools/convergence.py \
    --skip-md17 --workspace runs/convergence
  run_step nfe_pep 1800 python tools/measure_trained_nfe.py \
    --run conv-pep-s2 --workspace runs/convergence --init-model
  run_step nfe_md17 1800 python tools/measure_trained_nfe.py \
    --run conv-md17-s2 --workspace runs/convergence --init-model
  run_step eval_walltime 3600 python -m lam_slide_tpu.analysis.eval_cli \
    --run conv-pep-s2 --workspace runs/convergence --num-rollouts 10 \
    --outdir runs/convergence/conv-pep-s2/eval_full
  run_step dh_ab 3500 python tools/measure_dh_ab.py --batches 2,8 --heads 12,3
}

one_pass
for pass in 2 3; do
  [ "$SECONDS" -ge "$DEADLINE" ] && break
  note "retry pass $pass"
  one_pass
done
note "r4 queue done (elapsed ${SECONDS}s)"
