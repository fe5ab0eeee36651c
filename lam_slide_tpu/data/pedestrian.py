"""Pedestrian ETH/UCY trajectories (EqMotion-preprocessed splits).

Numpy port of the reference pipeline (src/datasets/geo_tdm/eth_new.py +
src/datasets/pedestrian.py): ``<scene>_data_{train,test}.npy`` holds padded
scenes ``[S, N_max, T, 2]`` with true agent counts in
``<scene>_num_{train,test}.npy``; 8 past + 12 future frames; per-sample 2D
rotation / vertical+horizontal flip / translation augmentation; random
entity IDs per scene. The reference reuses the test split as "val" for
comparability (pedestrian.py:198-204) — so do we.

A synthetic fallback generates scenes of constant-velocity walkers with
social noise when the npy files are absent. Note: the reference's stage-1
random frame pick draws the index from [0, N) instead of [0, T)
(pedestrian.py:97-99) — a bug we do not replicate; we draw from [0, T).
"""

import os
from dataclasses import dataclass
from typing import Dict, Optional

import numpy as np

from lam_slide_tpu.data.augment import random_rotation_matrix_2d, rotate
from lam_slide_tpu.data.loader import Dataset

SCENE_COND_INDICES = {"zara1": 0, "zara2": 1, "univ": 2, "hotel": 3, "eth": 4}


def _synthetic_scenes(scene: str, n_scenes: int, t: int, n_max: int, seed: int = 0):
    rng = np.random.default_rng(abs(hash((scene, seed))) % (2**32))
    counts = rng.integers(2, n_max + 1, size=n_scenes)
    data = np.zeros((n_scenes, n_max, t, 2), dtype=np.float32)
    for s in range(n_scenes):
        n = counts[s]
        start = rng.standard_normal((n, 2)) * 3.0
        vel = rng.standard_normal((n, 2)) * 0.15
        steps = np.arange(t)[None, :, None]
        traj = start[:, None] + vel[:, None] * steps
        traj += 0.03 * rng.standard_normal((n, t, 2)).cumsum(axis=1)
        data[s, :n] = traj
    return data.astype(np.float32), counts.astype(np.int64)


def load_pedestrian_split(
    root: Optional[str],
    scene: str,
    phase: str,
    traj_scale: float = 1.0,
    synthetic_scenes: int = 64,
    n_frames: int = 20,
    n_max: int = 10,
):
    """→ (data [S, N_max, T, 2], counts [S]); phase in {train, test}."""
    assert phase in ("train", "test")
    if root is not None:
        dpath = os.path.join(root, f"{scene}_data_{phase}.npy")
        npath = os.path.join(root, f"{scene}_num_{phase}.npy")
        if os.path.exists(dpath):
            data = np.load(dpath).astype(np.float32) / traj_scale
            counts = np.load(npath).astype(np.int64)
            return data, counts
    data, counts = _synthetic_scenes(scene, synthetic_scenes, n_frames, n_max)
    return data / traj_scale, counts


@dataclass
class PedestrianDataset(Dataset):
    scene: str
    phase: str  # "train" | "test"
    root: Optional[str] = None
    first_stage: bool = True
    past_frames: int = 8
    future_frames: int = 12
    traj_scale: float = 1.0
    rand_rotation: bool = False
    rand_translation: Optional[float] = None
    flip_vertical: bool = False
    flip_horizontal: bool = False
    num_entities: int = 10
    shift: float = 0.0
    scale: float = 1.0
    synthetic_scenes: int = 64

    def __post_init__(self):
        t = self.past_frames + self.future_frames
        self.data, self.counts = load_pedestrian_split(
            self.root, self.scene, self.phase, self.traj_scale,
            synthetic_scenes=self.synthetic_scenes, n_frames=t,
            n_max=self.num_entities,
        )
        if self.data.shape[2] < t:
            raise ValueError(f"scene frames {self.data.shape[2]} < past+future {t}")
        self.n_frames = t
        self.cond_index = np.int64(SCENE_COND_INDICES[self.scene])

    def __len__(self) -> int:
        return self.data.shape[0]

    def _augment(self, pos: np.ndarray, rng: np.random.Generator) -> np.ndarray:
        if self.rand_rotation:
            pos = rotate(pos, random_rotation_matrix_2d(rng))
        if self.flip_vertical and rng.random() < 0.5:
            pos = pos.copy()
            pos[..., 0] *= -1
        if self.flip_horizontal and rng.random() < 0.5:
            pos = pos.copy()
            pos[..., 1] *= -1
        if self.rand_translation is not None:
            pos = pos + (rng.standard_normal(2) * self.rand_translation).astype(np.float32)
        return pos

    def sample(self, idx: int, rng: np.random.Generator) -> Dict[str, np.ndarray]:
        n = int(self.counts[idx])
        pos = self.data[idx, :n, : self.n_frames]  # [N, T, 2]
        pos = np.transpose(pos, (1, 0, 2)).astype(np.float32)  # [T, N, 2]
        pos = (pos - self.shift) / self.scale
        pos = self._augment(pos, rng)
        entities = rng.permutation(self.num_entities)[:n].astype(np.int64)

        if self.first_stage:
            frame = int(rng.integers(0, self.n_frames))
            return {"pos": pos[frame], "cond_scene": self.cond_index, "entities": entities}
        return {
            "pos": pos,
            "cond_scene": self.cond_index,
            "entities": np.broadcast_to(entities, (self.n_frames, n)).copy(),
        }
