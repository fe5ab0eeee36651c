#!/usr/bin/env bash
# Round-2 on-chip measurement queue (docs/STATUS.md "Pending on-chip").
# Run when the TPU tunnel heals; serializes the chip jobs, bounds each one,
# and logs everything under /tmp/onchip/. Safe to re-run — each step is
# independent and overwrites its own log.
set -u
mkdir -p /tmp/onchip
cd "$(dirname "$0")/.."

run() { # name timeout cmd...
  local name=$1 to=$2; shift 2
  echo "=== $name (timeout ${to}s) ==="
  timeout "$to" "$@" >"/tmp/onchip/$name.log" 2>"/tmp/onchip/$name.err"
  local rc=$?
  echo "rc=$rc"; tail -3 "/tmp/onchip/$name.log" || true
  return 0
}

# 1. Headline B-sweep (bench.py bounds itself: probe + 2400s worker).
run bench 3000 python bench.py

# 2. Fused-kernel A/B (evidence for the PERF.md tracked wins).
run fused_ab 2000 python tools/measure_fused_ab.py

# 3. MD17 attention-backward pathology measurements (VERDICT r1 #7).
run md17_bwd 2000 python tools/measure_md17_bwd.py

# 4. Post-outage revalidation: dopri5 + scan_layers compile, full-size step.
run revalidate 2400 python tools/revalidate_tpu.py --full

echo "=== queue done; logs in /tmp/onchip/ ==="
