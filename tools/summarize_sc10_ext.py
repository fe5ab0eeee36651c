"""Summarize the r5g stage-2 extension arm next to the 1000-ep artifact.

Prints the JSD summary table (extended trained vs the committed
random-init control), the per-marginal win count, and the forecast
horizon table — the numbers docs/CONVERGENCE.md's "Scale-fixed chain"
section quotes for the extension.
"""

import json
import statistics

RUN = "runs/bisect/bisect-s2-sc10"


def main():
    t0 = json.load(open(f"{RUN}/eval/metrics.json"))
    te = json.load(open(f"{RUN}/eval_ext/metrics.json"))
    c = json.load(open(f"{RUN}/eval_control/metrics.json"))
    print(f"{'metric':10} {'1000ep':>8} {'ext':>8} {'control':>8}  winner(ext vs ctl)")
    wins = 0
    for k in te["summary"]:
        w = te["summary"][k] < c["summary"][k]
        wins += w
        print(f"{k:10} {t0['summary'][k]:8.4f} {te['summary'][k]:8.4f} "
              f"{c['summary'][k]:8.4f}  {'TRAINED' if w else 'control'}")
    print(f"summary wins: {wins}/6")
    for name, tr in (("1000ep", t0), ("ext", te)):
        w = l = 0
        for pep in tr["per_peptide"]:
            for k in tr["per_peptide"][pep]:
                if k in c["per_peptide"].get(pep, {}):
                    if tr["per_peptide"][pep][k] < c["per_peptide"][pep][k]:
                        w += 1
                    else:
                        l += 1
        print(f"per-marginal {name}: trained {w}/{w + l}")
    try:
        f = json.load(open(f"{RUN}/eval_forecast_ext.json"))
    except FileNotFoundError:
        print("no eval_forecast_ext.json yet")
        return
    print(f"{'h':>6} {'trained':>9} {'control':>9} {'persist':>9} {'ensmean':>9}")
    for h in f["horizons"]:
        row = {k: statistics.mean(p[f"{k}@{h}"] for p in f["per_peptide"].values())
               for k in ("trained", "control", "persistence", "ensmean")}
        print(f"{h:>6} {row['trained']:9.4f} {row['control']:9.4f} "
              f"{row['persistence']:9.4f} {row['ensmean']:9.4f}")


if __name__ == "__main__":
    main()
