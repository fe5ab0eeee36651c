"""MD17 stage-2 head-split + fused-MLP train-step A/B.

The MD17 s2 trace (docs/PERF.md, 1872 ms/step at B=64/T=30/L=192/8x32)
attributes ~17% to head-transpose data formatting and ~21% to the
N=192 spatial flash path. dh=128 variants (2 heads at hidden 256)
engage the packed flash kernel (no relayouts) exactly as the peptide
3x128 split does, and LAM_SLIDE_FUSED_MLP=1 removes the gelu
intermediate's HBM round-trip in the temporal linears. Equal capacity:
identical param shapes except the per-head-dim QKNorm scales (same
argument as test_head_split_same_param_count).

    python tools/measure_md17_dh_ab.py [--steps 8] [--timeout 1500]
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
sys.path.insert(0, {tools!r})
from measure_train_loop import CONFIGS, measure
cfg = dict(CONFIGS["md17"], heads={heads})
r = measure("md17", cfg, {steps})
print("RESULT", r["raw_step_ms"])
"""

ARMS = {
    "h8_dh32": (8, {}),
    "h2_dh128": (2, {}),
    "h2_dh128_fmlp": (2, {"LAM_SLIDE_FUSED_MLP": "1"}),
    "h8_dh32_fmlp": (8, {"LAM_SLIDE_FUSED_MLP": "1"}),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--timeout", type=int, default=1500)
    ap.add_argument("--arms", default="h8_dh32,h2_dh128,h2_dh128_fmlp")
    args = ap.parse_args()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    tools = os.path.dirname(os.path.abspath(__file__))
    results = {}
    for arm in args.arms.split(","):
        heads, pins = ARMS[arm]
        code = WORKER.format(repo=repo, tools=tools, heads=heads,
                             steps=args.steps)
        r = run_worker(arm, code, pins, args.timeout,
                       lambda t: {"raw_step_ms": round(float(t[0]), 1)})
        results[arm] = r
        print(json.dumps(r), flush=True)
    ok = {a: r["raw_step_ms"] for a, r in results.items()
          if r.get("status") == "ok"}
    if "h8_dh32" in ok:
        base = ok["h8_dh32"]
        print(json.dumps({"vs_h8_dh32_speedup": {
            a: round(base / v, 3) for a, v in ok.items()}}))


if __name__ == "__main__":
    main()
