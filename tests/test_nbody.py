"""GeoTDM trajectory container + NBody dataset port (data/nbody.py).

Pins the TrajData windowing semantics (geo_tdm/trajdata.py) and the NBody
edge/noise/span behavior (geo_tdm/nbody.py) the reference vendors.
"""

import numpy as np
import pytest

from lam_slide_tpu.data import pad_collate_temporal
from lam_slide_tpu.data.loader import Loader
from lam_slide_tpu.data.nbody import (
    NBodyDataset,
    Trajectory,
    fully_connected_edges,
    nbody_edge_attr,
)


def _traj(t=6, n=4):
    rng = np.random.default_rng(0)
    return Trajectory(
        x=rng.standard_normal((t, n, 3)).astype(np.float32),
        v=rng.standard_normal((t, n, 3)).astype(np.float32),
        h=rng.standard_normal((n, 1)).astype(np.float32),
        t=np.arange(t, dtype=np.float32),
    )


class TestTrajectory:
    def test_len_and_n_windows(self):
        traj = _traj(t=6)
        assert len(traj) == 6
        # trajdata.py:48-49: len - span + 1
        assert traj.n_windows(4) == 3
        assert traj.n_windows(6) == 1

    def test_single_frame_promotes_to_length_one(self):
        traj = Trajectory(x=np.zeros((4, 3), np.float32))
        assert traj.x.shape == (1, 4, 3)
        assert len(traj) == 1

    def test_at_slice_and_int(self):
        traj = _traj()
        win = traj.at(slice(1, 4))
        assert win.x.shape == (3, 4, 3)
        np.testing.assert_array_equal(win.x, traj.x[1:4])
        np.testing.assert_array_equal(win.t, traj.t[1:4])
        one = traj.at(2)
        assert one.x.shape == (1, 4, 3)  # trajdata keeps a time dim
        np.testing.assert_array_equal(one.x[0], traj.x[2])

    def test_at_preserves_extras_and_h(self):
        traj = _traj()
        traj.extras["system_id"] = np.asarray([7.0])
        win = traj.at(slice(0, 2))
        np.testing.assert_array_equal(win.h, traj.h)
        np.testing.assert_array_equal(win.extras["system_id"], [7.0])

    def test_cut_in_place(self):
        traj = _traj()
        ref = traj.x[2:5].copy()
        traj.cut(slice(2, 5))
        np.testing.assert_array_equal(traj.x, ref)
        assert traj.v.shape == (3, 4, 3) and traj.t.shape == (3,)

    def test_roll_advances_window(self):
        # trajdata.py:100-110: drop oldest delta frames, append new ones.
        traj = _traj(t=5)
        old = traj.x.copy()
        nxt = np.ones((2, 4, 3), np.float32)
        traj.roll(next_x=nxt, next_t=np.asarray([5.0, 6.0]))
        assert traj.x.shape == (5, 4, 3)
        np.testing.assert_array_equal(traj.x[:3], old[2:])
        np.testing.assert_array_equal(traj.x[3:], nxt)
        np.testing.assert_array_equal(traj.t, [2, 3, 4, 5, 6])

    def test_snapshot_last_and_concat(self):
        traj = _traj(t=3, n=4)
        snap = traj.snapshot()
        np.testing.assert_array_equal(snap["x"], traj.x[-1])
        assert snap["t"] == traj.t[-1]
        concat = traj.snapshot(reduce_x="concat")
        assert concat["x"].shape == (4, 9)
        # time-major flatten: [N, T*3] with frame f at columns [3f:3f+3]
        np.testing.assert_array_equal(concat["x"][:, 3:6], traj.x[1])

    def test_state_stacks_x_v(self):
        traj = _traj()
        assert traj.state.shape == (6, 4, 3, 2)
        np.testing.assert_array_equal(traj.state[..., 0], traj.x)
        np.testing.assert_array_equal(traj.state[..., 1], traj.v)


class TestEdges:
    def test_fully_connected_no_self_loops(self):
        ei = fully_connected_edges(4)
        assert ei.shape == (2, 12)
        assert np.all(ei[0] != ei[1])
        # row-major (i, j) order as the reference builds it (nbody.py:108-119)
        np.testing.assert_array_equal(ei[:, :4], [[0, 0, 0, 1], [1, 2, 3, 0]])

    def test_edge_attr_modes(self):
        ei = fully_connected_edges(3)
        charges = np.asarray([[1.0], [-1.0], [1.0]], np.float32)
        springs = np.asarray(
            [[0, 1, 0], [1, 0, 1], [0, 1, 0]], np.float32
        )
        spring = nbody_edge_attr("spring_train", ei, charges, springs)
        np.testing.assert_array_equal(spring.reshape(-1), springs[ei[0], ei[1]])
        grav = nbody_edge_attr("gravity_train", ei, charges)
        assert grav.shape == (6, 1) and not grav.any()
        charged = nbody_edge_attr("charged_train", ei, charges)
        np.testing.assert_array_equal(
            charged.reshape(-1), charges.reshape(-1)[ei[0]] * charges.reshape(-1)[ei[1]]
        )


class TestNBodyDataset:
    def test_span_cut_and_shapes(self):
        ds = NBodyDataset(name="spring_train", span=10, num_entities=8)
        traj = ds.trajectory(0)
        assert traj.x.shape == (10, 5, 3)
        assert traj.extras["edge_attr"].shape == (20, 1)

    def test_force_length(self):
        ds = NBodyDataset(name="spring_train", force_length=3)
        assert len(ds) == 3

    def test_obs_noise_deterministic_scaled(self):
        a = NBodyDataset(name="charged_train", obs_noise_scale=0.1, span=None)
        b = NBodyDataset(name="charged_train", obs_noise_scale=0.2, span=None)
        clean = NBodyDataset(name="charged_train", span=None)
        # same fixed noise matrix, linearly scaled (nbody.py:105-108)
        d1 = a.trajectory(0).x - clean.trajectory(0).x
        d2 = b.trajectory(0).x - clean.trajectory(0).x
        np.testing.assert_allclose(d2, 2 * d1, rtol=1e-5, atol=1e-6)

    def test_project_centers(self):
        ds = NBodyDataset(name="gravity_train", project=True, span=20)
        traj = ds.trajectory(1)
        np.testing.assert_allclose(traj.x.mean(axis=(0, 1)), 0.0, atol=1e-5)

    def test_gravity_edges_zero_spring_connectivity(self):
        ds = NBodyDataset(name="gravity_train", span=5)
        assert not ds.trajectory(0).extras["edge_attr"].any()

    def test_return_index(self):
        ds = NBodyDataset(name="spring_train", return_index=True, span=5)
        assert ds.trajectory(4).extras["system_id"][0] == 4.0

    def test_second_stage_sample_through_loader(self):
        ds = NBodyDataset(
            name="charged_train", span=8, num_entities=8, include_edges=False,
            first_stage=False,
        )
        import functools

        loader = Loader(
            ds, batch_size=4,
            collate_fn=functools.partial(pad_collate_temporal, num_entities=5),
            seed=0,
        )
        batch = next(iter(loader))
        assert batch["pos"].shape == (4, 8, 5, 3)
        assert batch["entities"].shape == (4, 8, 5)
        assert batch["attention_mask"].shape == (4, 8, 5)
        assert batch["attention_mask"].all()  # no padding at N=5

    def test_first_stage_sample_entities_permuted(self):
        ds = NBodyDataset(name="spring_train", span=8, num_entities=10,
                          include_edges=False, first_stage=True)
        rng = np.random.default_rng(0)
        s = ds.sample(0, rng)
        assert s["pos"].shape == (5, 3)
        ents = s["entities"]
        assert len(np.unique(ents)) == 5 and ents.max() < 10
