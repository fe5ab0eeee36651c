#!/usr/bin/env bash
# Probe the TPU tunnel every ~4 min; on the first heal, run the on-chip
# measurement queue once and exit. Bounded probes (a wedged tunnel hangs
# forever); pids recorded for targeted kills (never pattern-kill).
set -u
cd "$(dirname "$0")/.."
mkdir -p /tmp/onchip
echo $$ > /tmp/onchip/watch.pid

probe() {
  timeout 90 python - <<'EOF' >/dev/null 2>&1
import jax, jax.numpy as jnp
print(float(jax.jit(lambda a: (a @ a).sum())(jnp.ones((128, 128)))))
EOF
}

for i in $(seq 1 200); do
  if probe; then
    echo "$(date -u +%H:%M:%S) heal detected (attempt $i); running queue" \
      >> /tmp/onchip/watch.log
    bash tools/onchip_queue.sh >> /tmp/onchip/queue_run_watch.log 2>&1
    echo "$(date -u +%H:%M:%S) queue finished" >> /tmp/onchip/watch.log
    exit 0
  fi
  echo "$(date -u +%H:%M:%S) wedged (attempt $i)" >> /tmp/onchip/watch.log
  sleep 150
done
echo "gave up after 200 attempts" >> /tmp/onchip/watch.log
