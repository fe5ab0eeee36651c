"""On-chip A/B of the fused DiT glue kernels (docs/STATUS.md queue item 4).

Runs bench.py's B=8 measurement per arm in bounded subprocesses: the
shipping default (XLA composition — the fused kernels are opt-in since
the 2026-08-17 measurement showed fused = 0.95x), both fused kernels
(LAM_SLIDE_FUSED=1), and each fused family alone. All kernel-path knobs
are pinned per arm (tools/_subproc.py) so a lingering session knob
cannot turn this into an A/A comparison.

    python tools/measure_fused_ab.py [--batch 8] [--timeout 900] \
        [--num-heads 16]

--num-heads 3 re-runs the set at the TPU-native dh=128 packed layout
(round-4 verdict: every fusion rejection was measured at 16x24 only; the
dh=128 arm has different operand layouts, no relayout traffic, and a
B=8 peak, so none of the dh=24 negative results transfer).
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
print("RESULT", measure({batch}, num_heads={num_heads}))
"""


def run_mode(name: str, batch: int, env_pins: dict, timeout: int,
             num_heads: int = 16) -> dict:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    code = WORKER.format(repo=repo, batch=batch, num_heads=num_heads)
    return run_worker(name, code, env_pins, timeout,
                      lambda t: {"steps_per_s": round(float(t[0]), 1)})


ARMS = {
    # arm -> env pins (un-pinned knobs are forced to "0" by run_worker).
    # The fused kernels are OPT-IN since the 2026-08-17 measurement
    # (fused = 0.95x unfused), so the fused arms set LAM_SLIDE_FUSED=1 and
    # "unfused" is the shipping default.
    "fused": {"LAM_SLIDE_FUSED": "1"},
    "unfused": {},
    "adaln_only": {"LAM_SLIDE_FUSED": "1", "LAM_SLIDE_NO_FUSED_SPATIAL": "1"},
    "spatial_only": {"LAM_SLIDE_FUSED": "1", "LAM_SLIDE_NO_FUSED_ADALN": "1"},
    # Head-major elementwise QKNorm/RoPE after the transpose (fuses into
    # the copy) instead of packed-layout matmul versions before it.
    "headmajor": {"LAM_SLIDE_HEADMAJOR_NORMROPE": "1"},
    # QKNorm/RoPE fused INTO the flash kernel's panel loads — the raw
    # head-major q/k feed the kernel directly (ops/flash_normrope.py).
    "kernel_normrope": {"LAM_SLIDE_KERNEL_NORMROPE": "1"},
    # linear1 emits head-major q/k/v (3D-weight einsum: the head transpose
    # rides the matmul's output write) and linear2 contracts the 4D attn
    # directly — VERDICT r2 levers (a)+(b).
    "emit_headmajor": {"LAM_SLIDE_EMIT_HEADMAJOR": "1"},
    # MLP branch (linear1 mlp-slice -> gelu -> linear2 mlp-slice) in one
    # VMEM-resident kernel — the gelu intermediate never touches HBM
    # (ops/fused_mlp.py; round-5 dh=128 glue lever).
    "fused_mlp": {"LAM_SLIDE_FUSED_MLP": "1"},
    # The round-5 dh=128 winner (kernel_normrope 1.047x) stacked with the
    # MLP-branch kernel — the two touch disjoint parts of the layer.
    "normrope_mlp": {"LAM_SLIDE_KERNEL_NORMROPE": "1",
                     "LAM_SLIDE_FUSED_MLP": "1"},
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--num-heads", type=int, default=16)
    ap.add_argument("--timeout", type=int, default=900)
    ap.add_argument("--arms",
                    default="fused,unfused,adaln_only,spatial_only,headmajor")
    args = ap.parse_args()
    results = {}
    for arm in args.arms.split(","):
        results[arm] = run_mode(arm, args.batch, ARMS[arm], args.timeout,
                                num_heads=args.num_heads)
        print(json.dumps({"num_heads": args.num_heads, **results[arm]}),
              flush=True)
    ok = {a: r["steps_per_s"] for a, r in results.items()
          if r.get("status") == "ok"}
    if "unfused" in ok:
        base = ok["unfused"]
        print(json.dumps({"batch": args.batch, "num_heads": args.num_heads,
                          "vs_unfused": {a: round(v / base, 3)
                                         for a, v in ok.items()}}))


if __name__ == "__main__":
    main()
