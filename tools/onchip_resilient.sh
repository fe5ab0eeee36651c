#!/usr/bin/env bash
# Resilient on-chip measurement runner (supersedes onchip_queue.sh for
# flappy-tunnel conditions: observed heal windows are 10-85 min).
#
# Differences from the plain queue:
#   * probes the tunnel (bounded 90s matmul) BEFORE each step and between
#     retries — a wedged tunnel costs a 90s probe, not the step's full
#     timeout budget;
#   * per-step done-markers (/tmp/onchip/<name>.ok): a completed step is
#     never re-run, so the runner resumes mid-queue across heal windows;
#   * per-step attempt caps (3) so a genuinely failing step can't loop.
#
# Success = rc 0 AND the log has content AND no "tpu_unavailable" line
# (bench.py exits 0 with a diagnostic line when its worker starves).
set -u
cd "$(dirname "$0")/.."
mkdir -p /tmp/onchip
echo $$ > /tmp/onchip/resilient.pid
LOGDIR=/tmp/onchip
WATCH=$LOGDIR/resilient.log
note() { echo "$(date -u +%H:%M:%S) $*" >> "$WATCH"; }

# Persistent XLA compilation cache: the expensive part of every step is
# the first compile (minutes over the tunnel); with the cache, a step
# retried in a LATER heal window skips straight to execution, so even
# sub-4-minute windows land numbers. Safe if the plugin declines to
# serialize (cache writes just warn).
# Same default dir as bench.py so the driver's round-end bench reuses
# every compile the queue already paid for.
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/tmp/lam_slide_jax_cache}
mkdir -p "$JAX_COMPILATION_CACHE_DIR"

probe() {
  timeout 90 python - <<'EOF' >/dev/null 2>&1
import jax, jax.numpy as jnp
print(float(jax.jit(lambda a: (a @ a).sum())(jnp.ones((128, 128)))))
EOF
}

wait_for_heal() { # blocks until the tunnel answers; ~2.5 min between probes
  local i
  for i in $(seq 1 400); do
    if probe; then note "heal detected (probe $i)"; return 0; fi
    note "wedged (probe $i)"
    sleep 140
  done
  return 1
}

run_step() { # name timeout cmd...
  local name=$1 to=$2; shift 2
  [ -e "$LOGDIR/$name.ok" ] && { note "$name: already done, skip"; return 0; }
  local attempts
  attempts=$(cat "$LOGDIR/$name.attempts" 2>/dev/null || echo 0)
  if [ "$attempts" -ge 5 ]; then note "$name: attempt cap reached, skip"; return 0; fi
  wait_for_heal || return 1
  note "$name: start (timeout ${to}s, attempt $((attempts + 1)))"
  timeout "$to" "$@" > "$LOGDIR/$name.log" 2> "$LOGDIR/$name.err"
  local rc=$?
  # An A/B step can exit 0 with individual arms starved by a mid-window
  # wedge — those statuses must not be latched as done.
  if [ "$rc" -eq 0 ] && [ -s "$LOGDIR/$name.log" ] \
      && ! grep -q tpu_unavailable "$LOGDIR/$name.log" \
      && ! grep -Eq '"status": "(timeout|failed)' "$LOGDIR/$name.log"; then
    touch "$LOGDIR/$name.ok"
    note "$name: OK"
  elif [ "$rc" -eq 124 ] || grep -Eq 'tpu_unavailable|"status": "timeout' \
      "$LOGDIR/$name.log" 2>/dev/null; then
    # Tunnel-flavored failure: do not burn the attempt cap — the step
    # never got a fair run. The wait_for_heal gate bounds total work.
    note "$name: wedged mid-run rc=$rc (free retry next heal)"
  else
    echo $((attempts + 1)) > "$LOGDIR/$name.attempts"
    note "$name: failed rc=$rc (attempt $((attempts + 1))/5, retry next heal)"
  fi
  return 0
}

# Highest-value first; short steps early so brief windows still land numbers.
one_pass() {
  run_step bench_fast 900 env LAM_SLIDE_BENCH_SWEEP=8 \
    LAM_SLIDE_BENCH_WORKER_TIMEOUT=600 python bench.py
  # headmajor measured 0.888x (twice) — closed; normrope's Mosaic lowering
  # was fixed after its failed arm (51fd5ce), so it gets a fresh A/B step.
  run_step normrope_ab 2700 python tools/measure_fused_ab.py \
    --arms unfused,kernel_normrope
  run_step bench 3000 python bench.py
  run_step revalidate 2400 python tools/revalidate_tpu.py --full
  run_step fused_ab 4800 python tools/measure_fused_ab.py \
    --arms unfused,fused,adaln_only,spatial_only
  run_step b_scaling 2400 python tools/profile_b_scaling.py
  run_step trace 1200 python tools/capture_trace.py
  run_step md17_bwd 2000 python tools/measure_md17_bwd.py
}

one_pass
note "queue pass complete"
# Re-loop over failed steps until all done or capped (a wedge mid-step
# leaves its .ok absent; the per-step attempt cap bounds total work).
for pass in 2 3; do
  note "retry pass $pass"
  one_pass
done
note "resilient runner done"
