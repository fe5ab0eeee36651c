"""Attribute the superlinear batch scaling of the 4AA drift eval (B=2 vs B=8).

bench.py's sweep peaks at B=2 and per-eval cost grows SUPER-linearly in B —
the opposite of what an MXU-bound model should do, and unexplained by the
PERF.md floor model (round-3 verdict weak #1). This captures jax.profiler
device traces of the EXACT headline solve (bench.build_solver) at each
batch, groups device time by op name, and prints which ops grow faster than
linearly in B — a per-component ms/solve table with B-ratios.

    python tools/trace_b_scaling.py [--batches 2,8] [--out PREFIX]

Each solve is 10 chained Euler steps of the full-size DiT (depth 7, T=1000,
L=2), so ms/solve / 10 = ms per drift eval; a component scaling linearly in
B has ratio == B2/B1; ratio above that is the superlinear term.
"""

import argparse
import json
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from tools.capture_trace import capture, summarize  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="2,8")
    ap.add_argument("--out", default="/tmp/b_scaling_trace")
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--summarize-only", action="store_true")
    args = ap.parse_args()
    batches = [int(s) for s in args.batches.split(",")]

    results = {}
    for b in batches:
        out_dir = f"{args.out}_b{b}"
        if not args.summarize_only:
            capture(b, out_dir)
        results[b] = summarize(out_dir, top=args.top)
        if results[b] is None:  # summarize printed its own error JSON
            raise SystemExit(f"no trace files under {out_dir}")

    b_lo, b_hi = batches[0], batches[-1]
    scale = b_hi / b_lo  # ratio a perfectly linear-in-B component shows
    lo, hi = results[b_lo], results[b_hi]

    def table(key):
        rows = []
        names = set(lo.get(key, {})) | set(hi.get(key, {}))
        for n in names:
            a, c = lo.get(key, {}).get(n, 0.0), hi.get(key, {}).get(n, 0.0)
            rows.append({"name": n, f"ms_b{b_lo}": a, f"ms_b{b_hi}": c,
                         "ratio": round(c / a, 2) if a else None,
                         "vs_linear": round(c / (a * scale), 2) if a else None})
        rows.sort(key=lambda r: -(r[f"ms_b{b_hi}"]))
        return rows

    report = {
        "batches": batches,
        "linear_ratio": scale,
        "device_total_ms": {b: results[b]["device_total_ms"] for b in batches},
        "total_vs_linear": round(
            hi["device_total_ms"] / (lo["device_total_ms"] * scale), 3),
        "categories": table("categories_ms"),
        "top_ops": table("top_ops_ms")[: args.top],
    }
    print(json.dumps(report))


if __name__ == "__main__":
    main()
