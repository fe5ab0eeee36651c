"""Keep only the FINAL training run's records in a metrics.jsonl.

Run dirs reused across rounds accumulated multi-segment metric streams
(append-mode logging; the r3 convergence artifact had to caveat exactly
this). Trainer now truncates on fresh fits (train/trainer.py), but files
written before that fix — or by a process predating it — still carry a
superseded leading segment. This trims everything before the last
`split == "train", epoch == 0` record, i.e. the start of the final
from-scratch run. Resumed continuations (which never restart at epoch 0)
are preserved.

    python tools/strip_metrics_segments.py RUN_DIR... [--dry-run]
"""

import argparse
import json
import sys


def strip(path: str, dry: bool) -> str:
    recs = [json.loads(l) for l in open(path)]
    starts = [i for i, r in enumerate(recs)
              if r.get("split") == "train" and r.get("epoch") == 0]
    if not starts or starts[-1] == 0:
        return f"{path}: single segment ({len(recs)} records), unchanged"
    cut = starts[-1]
    if not dry:
        # the in-place rewrite is destructive — keep the dropped prefix
        # recoverable (advisor r4)
        with open(path + ".stripped.bak", "w") as f:
            for r in recs[:cut]:
                f.write(json.dumps(r) + "\n")
        with open(path, "w") as f:
            for r in recs[cut:]:
                f.write(json.dumps(r) + "\n")
    return (f"{path}: dropped {cut} superseded records "
            f"(saved to {path}.stripped.bak), "
            f"kept {len(recs) - cut}{' (dry-run)' if dry else ''}")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("run_dirs", nargs="+")
    p.add_argument("--dry-run", action="store_true")
    args = p.parse_args()
    import os
    for d in args.run_dirs:
        path = os.path.join(d, "metrics.jsonl") if os.path.isdir(d) else d
        print(strip(path, args.dry_run))


if __name__ == "__main__":
    sys.exit(main())
