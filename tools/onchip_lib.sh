# Shared machinery for the resilient on-chip queue runners (sourced by
# tools/onchip_r4c.sh and later rounds' runners; r4/r4b predate this lib
# and carry inlined copies — do not edit those mid-flight).
#
# Contract: the sourcing script sets LOGDIR, WATCH, DEADLINE and calls
# run_step NAME TIMEOUT CMD... . Discipline (advisor r3 findings):
# dedicated pid slot per runner, wedge classification greps stdout AND
# stderr, and every wait is bounded by the wall-clock DEADLINE.

note() { echo "$(date -u +%H:%M:%S) $*" >> "$WATCH"; }

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

# wait until the runner owning $1 (a pid file) exits; bounded by DEADLINE
wait_for_runner_exit() {
  local pidfile=$1 pid
  while pid=$(cat "$pidfile" 2>/dev/null) && [ -n "$pid" ] \
      && kill -0 "$pid" 2>/dev/null; do
    [ "$SECONDS" -ge "$DEADLINE" ] && { note "deadline waiting on $pidfile"; return 1; }
    sleep 60
  done
  return 0
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
