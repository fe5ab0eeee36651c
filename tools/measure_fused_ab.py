"""On-chip A/B of the fused DiT glue kernels (docs/STATUS.md queue item 4).

Runs bench.py's B=8 measurement twice in bounded subprocesses — once with
the fused residual+AdaLN and one-pass spatial-block kernels active (the
default on TPU) and once with LAM_SLIDE_NO_FUSED=1 — and prints both
throughputs plus the delta. This is the measured evidence for the two
"tracked wins" of docs/PERF.md. All kernel-path knobs are pinned per arm
(tools/_subproc.py) so a lingering session knob cannot turn this into an
A/A comparison.

    python tools/measure_fused_ab.py [--batch 8] [--timeout 900]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from _subproc import run_worker  # noqa: E402

WORKER = r"""
import sys
sys.path.insert(0, {repo!r})
from bench import measure
print("RESULT", measure({batch}))
"""


def run_mode(name: str, batch: int, env_pins: dict, timeout: int) -> dict:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    code = WORKER.format(repo=repo, batch=batch)
    return run_worker(name, code, env_pins, timeout,
                      lambda t: {"steps_per_s": round(float(t[0]), 1)})


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
