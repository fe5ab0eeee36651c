"""Regenerate the committed XTC golden artifact.

Encodes a deterministic 4AA-sized trajectory with the independent pure-
Python spec encoder (tests/support_xtc_pyref.py) and stores both the raw
bytes and the expected decoded values. Run from the repo root:

    python tests/golden/gen_xtc_golden.py
"""

import os
import sys

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))

import support_xtc_pyref as pyref  # noqa: E402


def main():
    rng = np.random.default_rng(4242)
    t_len, n = 6, 44
    base = rng.normal(0, 0.05, (n, 3)).cumsum(axis=0) + 1.5
    positions = base[None] + rng.normal(0, 0.003, (t_len, n, 3))
    time = np.arange(t_len, dtype=np.float32) * 0.002
    step = np.arange(t_len, dtype=np.int32) * 10
    box = np.broadcast_to(np.eye(3, dtype=np.float32) * 3.2, (t_len, 3, 3))

    raw = pyref.encode_trajectory(positions, time=time, step=step, box=box,
                                  precision=1000.0)
    with open(os.path.join(HERE, "xtc_pyref.xtc"), "wb") as f:
        f.write(raw)
    np.savez(os.path.join(HERE, "xtc_pyref_expected.npz"),
             positions=positions.astype(np.float64), time=time, step=step,
             box=np.asarray(box))
    print(f"wrote {len(raw)} bytes, {t_len} frames x {n} atoms")


if __name__ == "__main__":
    main()
