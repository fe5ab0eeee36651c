"""On-chip A/B of the fused DiT glue kernels (docs/STATUS.md queue item 4).

Runs bench.py's B=8 measurement twice in bounded subprocesses — once with
the fused residual+AdaLN and one-pass spatial-block kernels active (the
default on TPU) and once with LAM_SLIDE_NO_FUSED=1 — and prints both
throughputs plus the delta. This is the measured evidence for the two
"tracked wins" of docs/PERF.md.

    python tools/measure_fused_ab.py [--batch 8] [--timeout 900]
"""

import argparse
import json
import os
import subprocess
import sys

WORKER = r"""
import sys
sys.path.insert(0, {repo!r})
from bench import measure
print("RESULT", measure({batch}))
"""


def run_mode(name: str, batch: int, env_extra: dict, timeout: int) -> dict:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    code = WORKER.format(repo=repo, batch=batch)
    try:
        p = subprocess.run([sys.executable, "-c", code],
                           env={**os.environ, **env_extra},
                           capture_output=True, text=True, timeout=timeout)
    except subprocess.TimeoutExpired:
        return {"mode": name, "status": f"timeout>{timeout}s"}
    for line in p.stdout.splitlines():
        if line.startswith("RESULT"):
            return {"mode": name, "status": "ok",
                    "steps_per_s": round(float(line.split()[1]), 1)}
    tail = (p.stderr.strip().splitlines() or ["?"])[-1][:200]
    return {"mode": name, "status": f"failed rc={p.returncode}: {tail}"}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--timeout", type=int, default=900)
    args = ap.parse_args()
    fused = run_mode("fused", args.batch, {}, args.timeout)
    print(json.dumps(fused), flush=True)
    unfused = run_mode("unfused", args.batch, {"LAM_SLIDE_NO_FUSED": "1"},
                       args.timeout)
    print(json.dumps(unfused), flush=True)
    if fused.get("status") == "ok" and unfused.get("status") == "ok":
        a, b = fused["steps_per_s"], unfused["steps_per_s"]
        print(json.dumps({"speedup": round(a / b, 3),
                          "batch": args.batch}))


if __name__ == "__main__":
    main()
