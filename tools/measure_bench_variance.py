"""Driver-bench run-to-run variance band (round-4 verdict weak #3).

Same-day full-bench headline numbers differed by 4.7% (588.68 vs 616.51)
while PERF.md quoted 3-significant-figure deltas as signal. This tool
repeats the two headline measurement points N times each — the
reference-split peak (B=2, 16x24) and the TPU-native variant peak (B=8,
3x128) — each repetition in its own bounded subprocess (fresh process =
fresh dispatch state; the persistent compile cache makes repeat compiles
cheap), and reports mean / stdev / min / max / span so PERF.md can state
the band and stop quoting sub-band deltas.

    python tools/measure_bench_variance.py [--reps 5] [--timeout 600]
"""

import argparse
import json
import os
import statistics
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from _subproc import run_worker  # noqa: E402

WORKER = r"""
import sys
sys.path.insert(0, {repo!r})
from bench import measure
print("RESULT", measure({batch}, num_heads={num_heads}))
"""

POINTS = {
    "ref_split_b2": {"batch": 2, "num_heads": 16},
    "tpu_split_b8": {"batch": 8, "num_heads": 3},
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--timeout", type=int, default=600)
    ap.add_argument("--points", default="ref_split_b2,tpu_split_b8")
    args = ap.parse_args()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    summary = {}
    for point in args.points.split(","):
        spec = POINTS[point]
        vals = []
        for rep in range(args.reps):
            code = WORKER.format(repo=repo, **spec)
            r = run_worker(f"{point}_r{rep}", code, {}, args.timeout,
                           lambda t: {"steps_per_s": round(float(t[0]), 2)})
            print(json.dumps({"point": point, "rep": rep, **r}), flush=True)
            if r.get("status") == "ok":
                vals.append(r["steps_per_s"])
        if len(vals) >= 2:
            mean = statistics.mean(vals)
            summary[point] = {
                "n": len(vals), "mean": round(mean, 1),
                "stdev": round(statistics.stdev(vals), 2),
                "min": min(vals), "max": max(vals),
                "span_pct": round(100 * (max(vals) - min(vals)) / mean, 2),
            }
    print(json.dumps({"variance_band": summary}))


if __name__ == "__main__":
    main()
