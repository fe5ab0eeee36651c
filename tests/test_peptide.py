"""Peptide workload tests: dataset precompute, stage-1 training, stage-2 loss."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from lam_slide_tpu.composites.peptide import (
    PeptideFirstStageConfig,
    PeptideSecondStageConfig,
    build_peptide_first_stage,
    build_peptide_second_stage,
    make_peptide_first_stage_loss,
    make_peptide_second_stage_loss,
)
from lam_slide_tpu.data import Loader, pad_collate
from lam_slide_tpu.data.peptide import (
    PeptideDataset,
    kabsch_rotation,
    superpose_center,
)
from lam_slide_tpu.geometry import constants as pc
from lam_slide_tpu.train import create_train_state, make_train_step


def _tiny_fs_cfg():
    return PeptideFirstStageConfig(
        num_entities=8, dim_input=32, dim_latent=16, dim_entity=32, max_res=10,
        num_latents=2, num_split=4, dim_head_cross=8, dim_head_latent=8,
        dropout_query=0.0,
    )


def _collate(samples):
    # tetrapeptides all share length; stack directly + all-ones mask
    out = {k: np.stack([s[k] for s in samples]) for k in samples[0]}
    out["attention_mask"] = np.ones(out["aatype"].shape, dtype=bool)
    return out


class TestKabsch:
    def test_recovers_rotation(self):
        rng = np.random.default_rng(0)
        p = rng.standard_normal((10, 3))
        p -= p.mean(0)
        from lam_slide_tpu.data.augment import uniform_rotation_matrix

        r_true = uniform_rotation_matrix(rng)
        q = p @ r_true.T
        r = kabsch_rotation(p, q)
        np.testing.assert_allclose(p @ r.T, q, atol=1e-5)

    def test_superpose_collapses_rigid_motion(self):
        rng = np.random.default_rng(1)
        base = rng.standard_normal((7, 3)).astype(np.float32)
        frames = []
        from lam_slide_tpu.data.augment import uniform_rotation_matrix

        for t in range(5):
            r = uniform_rotation_matrix(rng)
            frames.append(base @ r.T + rng.standard_normal(3))
        xyz = np.stack(frames)
        aligned = superpose_center(xyz)
        for t in range(1, 5):
            np.testing.assert_allclose(aligned[t], aligned[0], atol=1e-4)


class TestPeptideDataset:
    def test_precompute_shapes(self):
        ds = PeptideDataset(first_stage=True, synthetic_peptides=2, synthetic_frames=60,
                            n_timesteps=20)
        traj = ds.trajectories[0]
        t, r = traj["aatype"].shape
        assert traj["atom14_pos"].shape == (t, r, 14, 3)
        assert traj["torsions"].shape == (t, r, 7, 2)
        assert traj["atom14_mask"].shape == (t, r, 14)
        # mask matches residue identity table
        np.testing.assert_array_equal(
            traj["atom14_mask"][0], pc.RESTYPE_ATOM14_MASK[traj["aatype"][0]].astype(bool)
        )

    def test_synthetic_cache_roundtrip(self, tmp_path, monkeypatch):
        """The node-local synthetic cache returns bit-identical trajectories
        and invalidates on key inputs (frames/scale/version)."""
        monkeypatch.setenv("LAM_SLIDE_DATA_CACHE", str(tmp_path))
        kw = dict(first_stage=True, synthetic_peptides=2, synthetic_frames=60,
                  n_timesteps=20)
        fresh = PeptideDataset(**kw)
        assert len(list(tmp_path.glob("*.npz"))) == 2
        cached = PeptideDataset(**kw)
        for a, b in zip(fresh.trajectories, cached.trajectories):
            assert a["name"] == b["name"] and a["n_frames"] == b["n_frames"]
            for k in ("atom14_pos", "atom14_mask", "atom14_pos_frame",
                      "torsions", "torsions_mask", "aatype"):
                np.testing.assert_array_equal(a[k], b[k])
                assert a[k].dtype == b[k].dtype
        # different frames -> different cache entries, not a stale hit
        other = PeptideDataset(**{**kw, "synthetic_frames": 40})
        assert other.trajectories[0]["n_frames"] == 40
        # disable knob bypasses the cache entirely
        monkeypatch.setenv("LAM_SLIDE_NO_DATA_CACHE", "1")
        bypass = PeptideDataset(**kw)
        np.testing.assert_array_equal(bypass.trajectories[0]["atom14_pos"],
                                      fresh.trajectories[0]["atom14_pos"])

    def test_synthetic_v2_structured(self):
        """v2 trajectories are low-intrinsic-dimension (a k=2 latent drives
        all torsions) with metastable switching — the properties that make
        the autoencoder and the TICA/MSM/JSD eval meaningful on synthetic
        data. v1 random-walk torsions have neither."""
        from lam_slide_tpu.data.peptide import _synthetic_angles

        ang2, aa2, _ = _synthetic_angles("synth0", 4, 600, version=2)
        ang2b, aa2b, _ = _synthetic_angles("synth0", 4, 600, version=2)
        np.testing.assert_array_equal(ang2, ang2b)  # deterministic by name
        np.testing.assert_array_equal(aa2, aa2b)
        ang1, _, _ = _synthetic_angles("synth0", 4, 600, version=1)
        assert not np.allclose(ang2, ang1)

        def top2_var_frac(a):
            x = a.reshape(len(a), -1)
            x = x - x.mean(0)
            s = np.linalg.svd(x, compute_uv=False)
            return float((s[:2] ** 2).sum() / (s**2).sum())

        # v2: two latent modes explain almost all torsion variance; v1
        # random walks spread variance across many directions
        assert top2_var_frac(ang2) > 0.9
        assert top2_var_frac(ang1) < 0.8

    def test_dataset_synthetic_version_plumbs(self, tmp_path, monkeypatch):
        monkeypatch.setenv("LAM_SLIDE_DATA_CACHE", str(tmp_path))
        kw = dict(first_stage=True, synthetic_peptides=1, synthetic_frames=60,
                  n_timesteps=20)
        d1 = PeptideDataset(**kw)
        d2 = PeptideDataset(**kw, synthetic_version=2)
        assert not np.allclose(d1.trajectories[0]["atom14_pos"],
                               d2.trajectories[0]["atom14_pos"])
        # distinct cache entries per generator version
        assert len(list(tmp_path.glob("*-g1-*.npz"))) == 1
        assert len(list(tmp_path.glob("*-g2-*.npz"))) == 1

    def test_stage1_and_stage2_samples(self):
        rng = np.random.default_rng(0)
        ds1 = PeptideDataset(first_stage=True, synthetic_peptides=2, synthetic_frames=60,
                             n_timesteps=20)
        s = ds1.sample(0, rng)
        assert s["atom14_pos"].shape[1:] == (14, 3)
        ds2 = PeptideDataset(first_stage=False, synthetic_peptides=2, synthetic_frames=60,
                             n_timesteps=20, rand_rotation=True)
        s2 = ds2.sample(1, rng)
        assert s2["atom14_pos"].shape[0] == 20
        assert np.all(s2["entities"] == s2["entities"][0][None])
        # masked atoms are zeroed
        assert np.all(s2["atom14_pos"][~s2["atom14_mask"]] == 0)

    def test_repeats_multiplies_epoch_length(self):
        ds = PeptideDataset(first_stage=True, synthetic_peptides=3,
                            synthetic_frames=30, repeats=5)
        assert len(ds) == 15
        rng = np.random.default_rng(0)
        s = ds.sample(14, rng)  # idx wraps back onto trajectory 14 % 3 == 2
        ref = ds.trajectories[2]
        assert s["aatype"].shape == ref["aatype"][0].shape

    def test_frame_split_restricts_draws(self):
        """Stage-1 frames come only from the split range; stage-2 windows
        stay inside it; an undersized range raises."""
        ds = PeptideDataset(first_stage=True, synthetic_peptides=1,
                            synthetic_frames=100, frame_split=(0.8, 1.0))
        traj = ds.trajectories[0]
        rng = np.random.default_rng(0)
        tail = traj["atom14_pos"][80:]
        for _ in range(20):
            s = PeptideDataset.sample(ds, 0, rng)
            # the unaugmented frame must be one of the tail frames
            # (identity rotation, centered) — match by torsions, which the
            # augmentation does not touch
            match = (np.abs(traj["torsions"][80:] - s["torsions"][None][0]
                            ).reshape(20, -1).max(-1) < 1e-6)
            assert match.any()
        ds2 = PeptideDataset(first_stage=False, synthetic_peptides=1,
                             synthetic_frames=100, n_timesteps=30,
                             frame_split=(0.0, 0.6))
        for _ in range(10):
            s2 = ds2.sample(0, rng)
            assert s2["atom14_pos"].shape[0] == 30
        with pytest.raises(ValueError, match="too short"):
            PeptideDataset(first_stage=False, synthetic_peptides=1,
                           synthetic_frames=100, n_timesteps=30,
                           frame_split=(0.8, 1.0)).sample(0, rng)

    def test_synthetic_pose_is_generic(self):
        """Each synthetic trajectory carries one fixed Haar-generic
        orientation: the backbone must NOT be axis-aligned (the raw FK pose
        was measure-zero under rotation augmentation — canonical-pose
        validation diverged while rotated validation tracked train)."""
        ds = PeptideDataset(first_stage=True, synthetic_peptides=4,
                            synthetic_frames=10)
        for traj in ds.trajectories:
            ca = traj["atom14_pos"][0, :, 1]  # CA atoms of frame 0
            axis = ca[-1] - ca[0]
            axis = axis / np.linalg.norm(axis)
            assert abs(abs(axis[0]) - 1.0) > 1e-3  # not the +x march


class TestPeptideStage1:
    def test_trains_and_metrics(self):
        cfg = _tiny_fs_cfg()
        model = build_peptide_first_stage(cfg)
        ds = PeptideDataset(first_stage=True, synthetic_peptides=4, synthetic_frames=60,
                            n_timesteps=20, num_entities=8)
        loader = Loader(ds, batch_size=4, collate_fn=_collate, seed=0, drop_last=False)
        batch = jax.tree.map(jnp.asarray, next(iter(loader)))
        variables = model.init(jax.random.PRNGKey(0), batch)
        loss_fn = make_peptide_first_stage_loss(model, cfg)
        tx = optax.adamw(2e-3)
        state = create_train_state(variables, tx)
        step = make_train_step(loss_fn, tx)
        losses = []
        for _ in range(30):
            state, m = step(state, batch, jax.random.PRNGKey(0))
            losses.append(float(m["loss"]))
        assert np.isfinite(losses).all()
        assert np.mean(losses[-5:]) < np.mean(losses[:5])
        for k in ("pos_frame_loss", "torsion_loss", "res_type_loss", "res_accuracy"):
            assert k in m


class TestPeptideStage2:
    def test_loss_and_sampling(self):
        fs_cfg = _tiny_fs_cfg()
        fs = build_peptide_first_stage(fs_cfg)
        T = 12
        ds = PeptideDataset(first_stage=False, synthetic_peptides=2, synthetic_frames=60,
                            n_timesteps=T, num_entities=8)
        loader = Loader(ds, batch_size=2, collate_fn=_collate, seed=0, drop_last=False)
        batch = jax.tree.map(jnp.asarray, next(iter(loader)))
        frame0 = {k: v[:, 0] for k, v in batch.items()}
        fs_vars = fs.init(jax.random.PRNGKey(0), frame0)

        cfg2 = PeptideSecondStageConfig(
            depth=2, in_dim=fs_cfg.dim_latent, hidden_size=32, num_heads=4,
            cond_idx=(0, 1), num_timesteps=T,
        )
        ss = build_peptide_second_stage(cfg2, fs, fs_vars)
        x1, mk = ss.prepare_batch(fs_vars, batch)
        assert x1.shape == (2, T, 2, 16)
        params = ss.backbone.init(
            jax.random.PRNGKey(1), x1, jnp.zeros((2,)), mk["x_cond"], mk["x_cond_mask"]
        )["params"]

        loss_fn = make_peptide_second_stage_loss(ss, cfg2)
        loss, metrics = loss_fn(params, {"first_stage": fs_vars}, batch,
                                jax.random.PRNGKey(2), True)
        assert np.isfinite(float(loss))
        assert "pos_frame_loss" in metrics and "torsion_loss" in metrics
        g = jax.grad(lambda p: loss_fn(p, {"first_stage": fs_vars}, batch,
                                       jax.random.PRNGKey(2), True)[0])(params)
        gn = float(optax.global_norm(g))
        assert np.isfinite(gn) and gn > 0

        sample = jax.jit(ss.make_sample_fn(
            sampling_method="ODE",
            sampling_kwargs={"sampling_method": "euler", "num_steps": 3}))
        out = sample(params, fs_vars, batch, jax.random.PRNGKey(3))
        assert out["atom14_pos"].shape == (2, T, 4, 42)
        assert np.isfinite(np.asarray(out["atom14_pos"])).all()
