"""Pedestrian + NBA workloads: datasets, stage-1 losses, stage-2 protocols, kmeans."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from lam_slide_tpu.composites.evaluation import per_entity_min_k_ade_fde
from lam_slide_tpu.composites.nba import (
    NBAFirstStageConfig,
    NBASecondStageConfig,
    build_nba_first_stage,
    build_nba_second_stage,
    classification_metrics,
    make_nba_first_stage_loss,
)
from lam_slide_tpu.composites.pedestrian import (
    PedestrianFirstStageConfig,
    PedestrianSecondStageConfig,
    build_pedestrian_first_stage,
    build_pedestrian_second_stage,
    make_pedestrian_first_stage_loss,
)
from lam_slide_tpu.data import Loader, pad_collate, pad_collate_temporal
from lam_slide_tpu.data.nba import NBADataset
from lam_slide_tpu.data.pedestrian import PedestrianDataset
from lam_slide_tpu.ops.kmeans import kmeans
from lam_slide_tpu.train import create_train_state, make_train_step


class TestPedestrianData:
    def test_first_stage_sample(self):
        ds = PedestrianDataset(scene="eth", phase="train", num_entities=10)
        s = ds.sample(0, np.random.default_rng(0))
        assert s["pos"].ndim == 2 and s["pos"].shape[1] == 2
        assert s["entities"].shape[0] == s["pos"].shape[0]

    def test_second_stage_window(self):
        ds = PedestrianDataset(scene="zara1", phase="test", first_stage=False,
                               num_entities=10)
        s = ds.sample(1, np.random.default_rng(0))
        assert s["pos"].shape[0] == 20  # 8 past + 12 future
        assert np.all(s["entities"] == s["entities"][0][None])
        batch = pad_collate_temporal([s, s], num_entities=10)
        assert batch["pos"].shape == (2, 20, 10, 2)


class TestNBAData:
    def test_first_stage_sample(self):
        ds = NBADataset(scene="score", num_entities=11)
        s = ds.sample(0, np.random.default_rng(0))
        assert s["pos"].shape == (11, 2)
        assert set(np.unique(s["team"])) <= {0, 1, 2}

    def test_team_flip(self):
        ds = NBADataset(scene="score", num_entities=11, flip=True)
        team = np.array([0, 1, 1, 2, 2])
        pos = np.zeros((5, 2), np.float32)
        flipped = False
        for seed in range(20):
            _, t2 = ds._augment(pos, team, np.random.default_rng(seed))
            if np.array_equal(t2, np.array([0, 2, 2, 1, 1])):
                flipped = True
            else:
                assert np.array_equal(t2, team)
        assert flipped

    def test_windows(self):
        ds = NBADataset(scene="rebound", first_stage=False, num_frames=20, num_entities=11)
        assert len(ds) == sum(g["pos"].shape[0] - 20 + 1 for g in ds.games)
        s = ds.sample(len(ds) - 1, np.random.default_rng(0))
        assert s["pos"].shape == (20, 11, 2)
        assert s["cond_scene"] == 1


class TestStage1Losses:
    def test_pedestrian_trains(self):
        cfg = PedestrianFirstStageConfig(
            num_entities=10, dim_input=32, dim_latent=8, dim_entity=32, num_latents=2,
            dim_head_cross=8, dim_head_latent=8, num_head_cross=2, dropout_query=0.0,
        )
        model = build_pedestrian_first_stage(cfg)
        ds = PedestrianDataset(scene="eth", phase="train", num_entities=10,
                               synthetic_scenes=32)
        loader = Loader(ds, batch_size=16, collate_fn=lambda b: pad_collate(b, 10), seed=0)
        batch = next(iter(loader))
        variables = model.init(jax.random.PRNGKey(0), jax.tree.map(jnp.asarray, batch))
        loss_fn = make_pedestrian_first_stage_loss(model, cfg)
        tx = optax.adamw(3e-3)
        state = create_train_state(variables, tx)
        step = make_train_step(loss_fn, tx)
        losses = []
        for _ in range(8):
            for b in loader:
                state, m = step(state, b, jax.random.PRNGKey(0))
                losses.append(float(m["loss"]))
        assert np.isfinite(losses).all()
        assert np.mean(losses[-3:]) < np.mean(losses[:3])

    def test_nba_loss_and_metrics(self):
        cfg = NBAFirstStageConfig(
            num_entities=11, dim_input=32, dim_latent=8, dim_entity=32, num_latents=4,
            dim_head_cross=8, dim_head_latent=8, dropout_query=0.0,
        )
        model = build_nba_first_stage(cfg)
        ds = NBADataset(scene="score", num_entities=11, synthetic_games=8)
        loader = Loader(ds, batch_size=8, collate_fn=lambda b: pad_collate(b, 11),
                        drop_last=False, seed=0)
        batch = next(iter(loader))
        variables = model.init(jax.random.PRNGKey(0), jax.tree.map(jnp.asarray, batch))
        loss_fn = make_nba_first_stage_loss(model, cfg)
        loss, metrics = loss_fn(variables["params"], variables.get("constants"), batch,
                                jax.random.PRNGKey(0), False)
        assert np.isfinite(float(loss))
        for k in ("team_loss", "group_loss", "team_accuracy", "group_accuracy"):
            assert k in metrics

    def test_classification_metrics_perfect(self):
        logits = jax.nn.one_hot(jnp.array([0, 1, 2, 1]), 3) * 10
        targets = jnp.array([0, 1, 2, 1])
        m = classification_metrics(logits, targets, jnp.ones(4, bool))
        assert float(m["accuracy"]) == 1.0
        assert float(m["precision"]) == 1.0
        assert float(m["recall"]) == 1.0


class TestKMeans:
    def test_separated_clusters(self):
        rng = np.random.default_rng(0)
        centers_true = np.array([[0.0, 0.0], [10.0, 0.0], [0.0, 10.0]])
        pts = np.concatenate([c + 0.1 * rng.standard_normal((30, 2)) for c in centers_true])
        centers, assign = kmeans(jnp.asarray(pts, jnp.float32), 3, 15)
        centers = np.sort(np.asarray(centers), axis=0)
        np.testing.assert_allclose(centers, np.sort(centers_true, axis=0), atol=0.2)
        # each true cluster maps to one label
        labels = np.asarray(assign).reshape(3, 30)
        for row in labels:
            assert len(np.unique(row)) == 1


class TestStage2Protocols:
    def _setup(self, Cfg, build_fs, build_ss, DS, collate_keys, ne, dskw, fs_kw, ss_kw):
        fs_cfg = Cfg(**fs_kw)
        fs = build_fs(fs_cfg)
        ds = DS(**dskw)
        loader = Loader(ds, batch_size=2,
                        collate_fn=lambda b: pad_collate_temporal(b, ne),
                        shuffle=False, seed=0)
        batch = jax.tree.map(jnp.asarray, next(iter(loader)))
        frame0 = {k: v[:, 0] for k, v in batch.items() if not k.startswith("cond")}
        fs_vars = fs.init(jax.random.PRNGKey(0), frame0)
        ss = build_ss(ss_kw, fs, fs_vars)
        return ss, fs_vars, batch

    def test_pedestrian_second_stage_fpc(self):
        fs_kw = dict(num_entities=10, dim_input=16, dim_latent=8, dim_entity=16,
                     num_latents=2, dim_head_cross=4, dim_head_latent=4,
                     num_head_cross=2, dropout_query=0.0)
        ss_cfg = PedestrianSecondStageConfig(
            depth=1, in_dim=8, hidden_size=16, num_heads=2, cond_idx=(0, 8),
            num_timesteps=20, class_conditional=True, vec_in_dim=16,
        )
        ss, fs_vars, batch = self._setup(
            PedestrianFirstStageConfig, build_pedestrian_first_stage,
            lambda c, f, v: build_pedestrian_second_stage(c, f, v), PedestrianDataset,
            None, 10,
            dict(scene="eth", phase="test", first_stage=False, num_entities=10,
                 synthetic_scenes=8),
            fs_kw, ss_cfg,
        )
        x1, mk = ss.prepare_batch(fs_vars, batch)
        assert mk["y_class"].shape[0] == 2
        params = ss.backbone.init(jax.random.PRNGKey(1), x1, jnp.zeros((2,)),
                                  mk["x_cond"], mk["x_cond_mask"], mk["y_class"])["params"]
        sample_k = jax.jit(ss.make_k_sample_fn(
            k=6, sampling_method="ODE",
            sampling_kwargs={"sampling_method": "euler", "num_steps": 2}))
        out = sample_k(params, fs_vars, batch, jax.random.PRNGKey(2))
        pred_k = out["pos"][:, :, 8:]
        true = batch["pos"][:, 8:]
        emask = batch["attention_mask"][:, 0]
        ade, fde = per_entity_min_k_ade_fde(pred_k, true, emask, num_runs=4, fpc=False)
        ade_fpc, fde_fpc = per_entity_min_k_ade_fde(pred_k, true, emask, num_runs=4,
                                                    fpc=True, kmeans_iters=5)
        for v in (ade, fde, ade_fpc, fde_fpc):
            assert np.isfinite(float(v))
        # min over all 6 ≤ min over first 4
        ade_all, _ = per_entity_min_k_ade_fde(pred_k, true, emask, num_runs=6, fpc=False)
        assert float(ade_all) <= float(ade) + 1e-6

    def test_nba_second_stage_smoke(self):
        fs_kw = dict(num_entities=11, dim_input=16, dim_latent=8, dim_entity=16,
                     num_latents=4, dim_head_cross=4, dim_head_latent=4,
                     num_head_cross=2, dropout_query=0.0)
        ss_cfg = NBASecondStageConfig(depth=1, in_dim=8, hidden_size=16, num_heads=2,
                                      cond_idx=(0, 8), num_timesteps=20)
        ss, fs_vars, batch = self._setup(
            NBAFirstStageConfig, build_nba_first_stage,
            lambda c, f, v: build_nba_second_stage(c, f, v), NBADataset,
            None, 11,
            dict(scene="score", first_stage=False, num_frames=20, num_entities=11,
                 synthetic_games=2),
            fs_kw, ss_cfg,
        )
        x1, mk = ss.prepare_batch(fs_vars, batch)
        assert x1.shape == (2, 20, 4, 8)
        params = ss.backbone.init(jax.random.PRNGKey(1), x1, jnp.zeros((2,)),
                                  mk["x_cond"], mk["x_cond_mask"])["params"]
        loss_fn = ss.make_loss(calc_additional_losses=True, weight_pos_loss=0.25,
                               weight_inter_dist_loss=0.25)
        loss, metrics = loss_fn(params, {"first_stage": fs_vars}, batch,
                                jax.random.PRNGKey(0), True)
        assert np.isfinite(float(loss))
