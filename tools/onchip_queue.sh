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

# The tunnel heal windows can be sub-10-minutes: land the highest-value
# numbers first and keep the early steps short.

# 1. FAST headline at the measured-best batch (~4 min incl. compile) —
#    gets the unfused-default number on record even if the window closes.
#    Outer timeout must exceed bench.py's internal probes (~200s) + worker
#    watchdog, or the salvage/diagnostic line never gets printed.
run bench_fast 900 env LAM_SLIDE_BENCH_SWEEP=8 \
  LAM_SLIDE_BENCH_WORKER_TIMEOUT=600 python bench.py

# 2. The untested hypothesis: head-major norm/rope arm vs default (~8 min).
run headmajor_ab 1800 python tools/measure_fused_ab.py --arms unfused,headmajor

# 3. Full headline B-sweep (bench.py bounds itself; worker salvage keeps
#    completed points if the tunnel wedges mid-sweep).
run bench 3000 python bench.py

# 4. Post-outage revalidation: dopri5 + scan_layers compile at T=100/1000,
#    full-size stage-2 train step (PYTHONPATH fix 2026-08-17).
run revalidate 2400 python tools/revalidate_tpu.py --full

# 5. Fused-kernel A/B — the per-family arms (adaln_only/spatial_only)
#    were cut off by the 22:10 wedge. Includes the unfused baseline in the
#    SAME session so the vs_unfused attribution summary actually prints.
run fused_ab 4800 python tools/measure_fused_ab.py --arms unfused,fused,adaln_only,spatial_only

# 6. Component decomposition of the super-linear B scaling (new tool).
run b_scaling 2400 python tools/profile_b_scaling.py

# 7. Fresh op-level trace of the default (unfused) drift eval.
run trace 1200 python tools/capture_trace.py

# 8. MD17 attention-backward A/B through the new tiled default.
run md17_bwd 2000 python tools/measure_md17_bwd.py

echo "=== queue done; logs in /tmp/onchip/ ==="
