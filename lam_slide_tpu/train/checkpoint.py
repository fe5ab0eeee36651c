"""Orbax checkpointing + local run registry.

Replaces two reference subsystems:

* Lightning ``ModelCheckpoint`` (+ EMA injected into the checkpoint dict,
  lightning_base.py:109-119): here one Orbax checkpoint holds
  ``{step, params, ema_params, opt_state, constants}`` with best/last
  retention keyed on a monitored metric.
* The wandb run-ID lineage between stages (src/utils/utils.py:180-199):
  stage 2 resolved its frozen stage-1 checkpoint through the wandb API.
  Here a plain JSON registry under the workspace root maps run_id →
  {run_dir, config, best/last checkpoint paths}; ``resolve_run`` is the
  offline, dependency-free equivalent.
"""

import json
import os
import time
from dataclasses import asdict, dataclass, field
from typing import Any, Dict, Optional

import jax
import orbax.checkpoint as ocp

from lam_slide_tpu.train.state import TrainState


class CheckpointManager:
    """best/last checkpoint retention on a monitored metric (mode 'min'|'max')."""

    def __init__(self, run_dir: str, monitor: str = "loss", mode: str = "min"):
        self.run_dir = os.path.abspath(run_dir)
        self.ckpt_dir = os.path.join(self.run_dir, "checkpoints")
        os.makedirs(self.ckpt_dir, exist_ok=True)
        self.monitor = monitor
        self.mode = mode
        self.best_metric: Optional[float] = None
        self._ckptr = ocp.StandardCheckpointer()
        self._load_meta()

    def _meta_path(self):
        return os.path.join(self.ckpt_dir, "meta.json")

    def _load_meta(self):
        if os.path.exists(self._meta_path()):
            with open(self._meta_path()) as f:
                meta = json.load(f)
            self.best_metric = meta.get("best_metric")

    def _save_meta(self, extra: Dict[str, Any]):
        meta = {"monitor": self.monitor, "mode": self.mode, "best_metric": self.best_metric}
        meta.update(extra)
        with open(self._meta_path(), "w") as f:
            json.dump(meta, f, indent=2)

    def _is_better(self, value: float) -> bool:
        if self.best_metric is None:
            return True
        return value < self.best_metric if self.mode == "min" else value > self.best_metric

    def save(self, state: TrainState, metrics: Optional[Dict[str, float]] = None):
        """Save 'last'; promote to 'best' when the monitored metric improves.

        Orbax writes are atomic (tmp dir + rename at finalize); we just wait
        for completion so a following restore sees the files.
        """
        step = int(state.step)
        self._ckptr.save(os.path.join(self.ckpt_dir, "last"), state, force=True)
        extra = {"last_step": step}
        value = None if metrics is None else metrics.get(self.monitor)
        if value is not None and self._is_better(float(value)):
            self.best_metric = float(value)
            self._ckptr.save(os.path.join(self.ckpt_dir, "best"), state, force=True)
            extra["best_step"] = step
        self._ckptr.wait_until_finished()
        self._save_meta(extra)

    def restore(self, target: TrainState, which: str = "last") -> TrainState:
        path = os.path.join(self.ckpt_dir, which)
        if not os.path.exists(path):
            raise FileNotFoundError(f"no '{which}' checkpoint under {self.ckpt_dir}")
        return self._ckptr.restore(path, target)

    def has(self, which: str = "last") -> bool:
        return os.path.exists(os.path.join(self.ckpt_dir, which))


# ---------------------------------------------------------------------------
# Run registry (offline wandb-lineage replacement)
# ---------------------------------------------------------------------------


def _registry_path(workspace: str) -> str:
    return os.path.join(workspace, "runs.json")


def register_run(
    workspace: str,
    run_id: str,
    run_dir: str,
    config: Optional[Dict[str, Any]] = None,
):
    """Record a run so later stages can resolve it by ID (utils.py:180-199).

    The read-modify-write is guarded by an fcntl lock so parallel sweep
    launchers (experiments/sweeps.py --jobs N) can register concurrently.
    """
    import fcntl

    os.makedirs(workspace, exist_ok=True)
    path = _registry_path(workspace)
    with open(path + ".lock", "w") as lock:
        fcntl.flock(lock, fcntl.LOCK_EX)
        registry = {}
        if os.path.exists(path):
            with open(path) as f:
                registry = json.load(f)
        registry[run_id] = {
            "run_dir": os.path.abspath(run_dir),
            "config": config or {},
            "time": time.time(),
        }
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(registry, f, indent=2)
        os.replace(tmp, path)


def resolve_run(workspace: str, run_id: str) -> Dict[str, Any]:
    """run_id -> {run_dir, config}; raises KeyError when unknown."""
    path = _registry_path(workspace)
    if not os.path.exists(path):
        raise KeyError(f"no run registry at {path}")
    with open(path) as f:
        registry = json.load(f)
    if run_id not in registry:
        raise KeyError(f"run_id {run_id!r} not in registry {path}")
    return registry[run_id]
