"""Capture + summarize a device trace of one 4AA drift eval (bench shapes).

The round-1 op breakdown in docs/PERF.md was taken with the fused kernels
active; they are now opt-in (measured 0.95x), so the remaining-headroom
hunt needs a fresh breakdown of the shipping XLA-composition path. This
captures a jax.profiler trace of a chained Euler solve at the given batch,
parses the trace-viewer JSON (no tensorboard needed), and prints the
per-op-category totals for the TPU device track.

    python tools/capture_trace.py [--batch 8] [--out /tmp/dit_trace]
"""

import argparse
import glob
import gzip
import json
import os
import re
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def capture(batch: int, out_dir: str) -> None:
    import time

    import jax
    import jax.numpy as jnp

    from bench import _enable_compile_cache, build_solver  # the EXACT program the headline times

    _enable_compile_cache()
    setup = build_solver(batch)
    solve, noise = setup["solve"], setup["noise"]

    @jax.jit
    def one_solve(noise):
        return jnp.sum(solve(noise))

    float(one_solve(noise))  # compile + warm
    t0 = time.perf_counter()
    with jax.profiler.trace(out_dir):
        float(one_solve(noise))
    print(f"# traced solve: {(time.perf_counter()-t0)*1e3:.1f} ms wall",
          file=sys.stderr)


_CATEGORIES = (
    ("flash_attention", re.compile(r"flash|pallas", re.I)),
    # conv(?!ert): 'convert'/'bitcast-convert' are dtype casts, not convs
    ("convert", re.compile(r"convert", re.I)),
    ("matmul", re.compile(r"\bdot|conv(?!ert)|matmul", re.I)),
    ("copy/transpose", re.compile(r"copy|transpose|bitcast", re.I)),
    ("fusion(elementwise)", re.compile(r"fusion|add|mul|sub|divide|exp|tanh|"
                                       r"gelu|rsqrt|erf", re.I)),
    ("reduce", re.compile(r"reduce", re.I)),
    ("dynamic-slice/update", re.compile(r"slice|gather|scatter|pad", re.I)),
)


def summarize(out_dir: str, top: int = 25, by_source: bool = False) -> None:
    files = sorted(glob.glob(os.path.join(
        out_dir, "**", "*.trace.json.gz"), recursive=True))
    if not files:
        print(json.dumps({"error": "no trace files", "dir": out_dir}))
        return
    with gzip.open(files[-1], "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    # device track: pid whose process_name mentions TPU
    tpu_pids = {e["pid"] for e in events
                if e.get("ph") == "M" and e.get("name") == "process_name"
                and "TPU" in str(e.get("args", {}).get("name", ""))}
    # Per-op events live on 'XLA Ops' threads; 'XLA Modules' / 'Steps'
    # threads carry one whole-program roll-up event per module execution —
    # summing those would double-count the device time.
    thread_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            thread_names[(e.get("pid"), e.get("tid"))] = str(
                e.get("args", {}).get("name", ""))
    op_tids = {k for k, v in thread_names.items() if "XLA Ops" in v}
    rollup_tids = {k for k, v in thread_names.items()
                   if "Module" in v or "Steps" in v}
    per_op, total = {}, 0.0
    for e in events:
        key = (e.get("pid"), e.get("tid"))
        if e.get("ph") != "X" or e.get("pid") not in tpu_pids:
            continue
        if op_tids:
            if key not in op_tids:
                continue
        elif key in rollup_tids:  # no 'XLA Ops' naming: exclude roll-ups
            continue
        name = e.get("name", "")
        tid_dur = float(e.get("dur", 0.0))
        if name.lower() in ("steps",) or tid_dur <= 0:
            continue
        per_op[name] = per_op.get(name, 0.0) + tid_dur
        total += tid_dur
    cats = {}
    for name, dur in per_op.items():
        for cat, pat in _CATEGORIES:
            if pat.search(name):
                cats[cat] = cats.get(cat, 0.0) + dur
                break
        else:
            cats.setdefault("other", 0.0)
            cats["other"] += dur
    out = {
        "trace": files[-1],
        "device_total_ms": round(total / 1e3, 3),
        "categories_ms": {k: round(v / 1e3, 3)
                          for k, v in sorted(cats.items(),
                                             key=lambda kv: -kv[1])},
        "top_ops_ms": {k: round(v / 1e3, 3)
                       for k, v in sorted(per_op.items(),
                                          key=lambda kv: -kv[1])[:top]},
    }
    if by_source:
        # Per-op events carry the emitting python source line in their args.
        # `while` wrapper events are excluded: on the TPU track they cover
        # their body ops, so summing both double-counts (scan/remat bodies).
        by_src = {}
        for e in events:
            key = (e.get("pid"), e.get("tid"))
            if (e.get("ph") != "X" or e.get("pid") not in tpu_pids
                    or (op_tids and key not in op_tids)
                    or str(e.get("name", "")).startswith("while")):
                continue
            dur = float(e.get("dur", 0.0))
            if dur <= 0:
                continue
            src = str(e.get("args", {}).get("source", "<none>"))
            by_src[src] = by_src.get(src, 0.0) + dur
        out["by_source_ms"] = {
            k: round(v / 1e3, 3)
            for k, v in sorted(by_src.items(), key=lambda kv: -kv[1])[:top]}
        out["device_total_ex_while_ms"] = round(
            sum(by_src.values()) / 1e3, 3)
    print(json.dumps(out))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--out", default="/tmp/dit_trace")
    ap.add_argument("--summarize-only", action="store_true",
                    help="parse an existing trace dir, no chip needed")
    args = ap.parse_args()
    if not args.summarize_only:
        capture(args.batch, args.out)
    summarize(args.out)


if __name__ == "__main__":
    main()
