"""Evaluation figures (matplotlib, Agg backend).

Compact port of the reference's plotting surface (src/utils/plots.py +
plotting.py + pyemma.plots usage): Ramachandran maps, TICA free-energy
surfaces, feature histograms, 3D point clouds, and pedestrian/NBA
trajectory overlays. Figures return the matplotlib Figure; callers save.
"""

from typing import Optional, Sequence

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np


def ramachandran(phi: np.ndarray, psi: np.ndarray, ax=None, bins: int = 64, title=""):
    """2D φ/ψ density map (plots.py ramachandran figures)."""
    if ax is None:
        _, ax = plt.subplots()
    h, xe, ye = np.histogram2d(
        phi, psi, bins=bins, range=[[-np.pi, np.pi], [-np.pi, np.pi]], density=True
    )
    ax.imshow(h.T + 1e-12, origin="lower", extent=(-np.pi, np.pi, -np.pi, np.pi),
              aspect="auto", cmap="viridis")
    ax.set_xlabel(r"$\phi$")
    ax.set_ylabel(r"$\psi$")
    ax.set_title(title)
    return ax


def free_energy_surface(x: np.ndarray, y: np.ndarray, ax=None, bins: int = 50,
                        kt: float = 1.0, title=""):
    """-kT log p(x, y) surface (pyemma.plots.plot_free_energy equivalent)."""
    if ax is None:
        _, ax = plt.subplots()
    h, xe, ye = np.histogram2d(x, y, bins=bins, density=True)
    f = -kt * np.log(h.T + 1e-12)
    f -= f.min()
    im = ax.contourf(0.5 * (xe[:-1] + xe[1:]), 0.5 * (ye[:-1] + ye[1:]), f,
                     levels=20, cmap="nipy_spectral")
    ax.set_title(title)
    return ax, im


def feature_histograms(feats: np.ndarray, labels: Optional[Sequence[str]] = None,
                       ax=None, color="C0", range_=(-np.pi, np.pi)):
    """Stacked per-feature histograms (pyemma.plots.plot_feature_histograms)."""
    if ax is None:
        _, ax = plt.subplots(figsize=(5, 1 + feats.shape[1] * 0.5))
    for i in range(feats.shape[1]):
        h, e = np.histogram(feats[:, i], bins=60, range=range_, density=True)
        ax.plot(0.5 * (e[:-1] + e[1:]), h / max(h.max(), 1e-12) * 0.9 + i, color=color)
        if labels is not None:
            ax.text(range_[0], i + 0.4, labels[i], fontsize=7, va="center")
    ax.set_yticks([])
    return ax


def point_cloud(pos: np.ndarray, ax=None, color=None, title=""):
    """3D scatter of a molecular frame (plotting.py pointcloud figures)."""
    if ax is None:
        fig = plt.figure()
        ax = fig.add_subplot(projection="3d")
    ax.scatter(pos[:, 0], pos[:, 1], pos[:, 2], c=color, s=18)
    ax.set_title(title)
    return ax


def trajectories_2d(pos: np.ndarray, mask: Optional[np.ndarray] = None, ax=None,
                    cond_end: Optional[int] = None, title=""):
    """Pedestrian/NBA 2D trajectory overlay: pos [T, N, 2]
    (plotting.py pedestrian figures)."""
    if ax is None:
        _, ax = plt.subplots()
    t, n = pos.shape[:2]
    for a in range(n):
        if mask is not None and not mask[a]:
            continue
        ax.plot(pos[:, a, 0], pos[:, a, 1], lw=1.0, alpha=0.8)
        if cond_end is not None:
            ax.plot(pos[:cond_end, a, 0], pos[:cond_end, a, 1], lw=2.5, alpha=0.9)
        ax.scatter(pos[-1, a, 0], pos[-1, a, 1], s=12)
    ax.set_aspect("equal")
    ax.set_title(title)
    return ax


def eval_summary_figure(per_peptide: dict, path: Optional[str] = None):
    """Grid figure per evaluated peptide: torsion JSD bars + metastable probs
    (condensed version of the reference's 4x4 eval figure)."""
    names = list(per_peptide)
    fig, axes = plt.subplots(len(names), 2, figsize=(10, 3 * len(names)), squeeze=False)
    for i, name in enumerate(names):
        m = per_peptide[name]
        jsd_items = [(k, v) for k, v in m["JSD"].items() if "|" not in k]
        axes[i, 0].bar(range(len(jsd_items)), [v for _, v in jsd_items])
        axes[i, 0].set_xticks(range(len(jsd_items)))
        axes[i, 0].set_xticklabels([k for k, _ in jsd_items], rotation=90, fontsize=6)
        axes[i, 0].set_title(f"{name} JSD")
        if "ref_metastable_probs" in m:
            w = 0.4
            x = np.arange(len(m["ref_metastable_probs"]))
            axes[i, 1].bar(x - w / 2, m["ref_metastable_probs"], w, label="MD")
            axes[i, 1].bar(x + w / 2, m["traj_metastable_probs"], w, label="ours")
            axes[i, 1].legend(fontsize=7)
            axes[i, 1].set_title("metastable occupation")
    fig.tight_layout()
    if path:
        fig.savefig(path, dpi=120)
    return fig
