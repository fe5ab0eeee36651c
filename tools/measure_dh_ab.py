"""Head-split architecture A/B: 16x24 (reference) vs 12x32 vs 3x128.

PERF.md proves the reference's dh=24 head split pays a layout-invariant
5.3x MXU lane tax in the attention matmuls (the MXU contracts 128 lanes;
24-wide contractions pad 5.3x) and pins ~975 steps/s as the dh=24 ceiling.
The designed escape is an architecture knob: same hidden width 384, same
linear1/linear2 shapes and near-identical parameter count, different head
split. dh=32 pads 4x; dh=128 pads 1x AND engages the packed-layout flash
kernel (flash_attention_packed lowers for dh % 128 == 0), eliminating the
head-relayout copies too.

Convergence parity of the variants is checked separately on the synthetic
MD17 chain (tools/convergence.py + --exp-set num_heads=...); this measures
raw sampler throughput at the bench shapes.

    python tools/measure_dh_ab.py [--batches 2,8] [--heads 16,12,3]
"""

import argparse
import json
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="2,8")
    ap.add_argument("--heads", default="16,12,3")
    args = ap.parse_args()

    from bench import measure

    out = {}
    for h in (int(s) for s in args.heads.split(",")):
        for b in (int(s) for s in args.batches.split(",")):
            v = measure(b, num_heads=h)
            out[f"heads{h}_dh{384 // h}_b{b}"] = round(v, 1)
            print(json.dumps({"num_heads": h, "dh": 384 // h, "batch": b,
                              "traj_steps_per_sec": round(v, 1)}), flush=True)
    print(json.dumps({"summary": out}))


if __name__ == "__main__":
    main()
