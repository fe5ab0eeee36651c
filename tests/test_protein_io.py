"""Protein PDB IO + test-protocol runners + utils tests."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lam_slide_tpu.data.peptide import PeptideDataset
from lam_slide_tpu.geometry import ops as geo
from lam_slide_tpu.geometry.protein import (
    atom14_to_pdb,
    create_full_prot,
    from_pdb_string,
    prots_to_pdb,
    to_pdb,
)
from lam_slide_tpu.utils.rng import per_sample_keys, stacked_normal


@pytest.fixture(scope="module")
def pep():
    ds = PeptideDataset(first_stage=True, synthetic_peptides=1, synthetic_frames=12,
                        n_timesteps=4)
    t = ds.trajectories[0]
    return t["atom14_pos"], t["aatype"][0]


def test_pdb_roundtrip(pep):
    atom14, aatype = pep
    atom37 = np.asarray(geo.atom14_to_atom37(atom14[0], aatype))
    prot = create_full_prot(atom37, aatype=aatype)
    pdb = to_pdb(prot)
    assert pdb.count("ATOM") >= int(prot.atom_mask.sum())
    back = from_pdb_string(pdb)
    np.testing.assert_array_equal(back.aatype, prot.aatype)
    np.testing.assert_allclose(back.atom_mask, prot.atom_mask)
    # coordinates round-trip at PDB's 3-decimal precision
    m = prot.atom_mask.astype(bool)
    np.testing.assert_allclose(back.atom_positions[m], prot.atom_positions[m], atol=2e-3)


def test_multi_model_trajectory(pep, tmp_path):
    atom14, aatype = pep
    path = str(tmp_path / "traj.pdb")
    atom14_to_pdb(atom14[:3], aatype, path)
    content = open(path).read()
    assert content.count("MODEL") == 3
    assert content.count("ENDMDL") == 3
    back = from_pdb_string(content)  # parses first model
    assert back.aatype.shape[0] == len(aatype)


def test_per_sample_keys_reproducible():
    base = jax.random.PRNGKey(0)
    seeds = jnp.asarray([5, 9, 5])
    keys = per_sample_keys(base, seeds)
    np.testing.assert_array_equal(np.asarray(keys[0]), np.asarray(keys[2]))
    assert not np.array_equal(np.asarray(keys[0]), np.asarray(keys[1]))
    x = stacked_normal(base, seeds, (3, 4))
    np.testing.assert_allclose(np.asarray(x[0]), np.asarray(x[2]))


def test_md17_test_protocol_runner():
    from lam_slide_tpu.composites.md17 import (
        MD17FirstStageConfig, MD17SecondStageConfig,
        build_md17_first_stage, build_md17_second_stage,
    )
    from lam_slide_tpu.composites.testing import evaluate_md17
    from lam_slide_tpu.data import Loader, pad_collate_temporal
    from lam_slide_tpu.data.md17 import MD17Dataset

    ne, span = 12, 8
    fs_cfg = MD17FirstStageConfig(num_entities=ne, dim_input=16, dim_latent=8,
                                  dim_entity=16, num_latents=4, dim_head_cross=4,
                                  dim_head_latent=4, num_head_cross=2, dropout_query=0.0)
    fs = build_md17_first_stage(fs_cfg)
    ds = MD17Dataset(molecule="benzene", mode="test", span=span, first_stage=False,
                     num_entities=ne, force_length=4, rand_rotation=False,
                     synthetic_frames=1500)
    loader = Loader(ds, batch_size=2, collate_fn=lambda b: pad_collate_temporal(b, ne),
                    shuffle=False, seed=0, drop_last=False)
    batch = jax.tree.map(jnp.asarray, next(iter(loader)))
    frame0 = {k: v[:, 0] for k, v in batch.items() if not k.startswith("cond")}
    fs_vars = fs.init(jax.random.PRNGKey(0), frame0)
    cfg2 = MD17SecondStageConfig(in_dim=8, depth=1, hidden_size=16, num_heads=2,
                                 cond_idx=(0, 3), num_timesteps=span)
    ss = build_md17_second_stage(cfg2, fs, fs_vars)
    x1, mk = ss.prepare_batch(fs_vars, batch)
    params = ss.backbone.init(jax.random.PRNGKey(1), x1, jnp.zeros((2,)),
                              mk["x_cond"], mk["x_cond_mask"])["params"]
    out = evaluate_md17(ss, params, fs_vars, {"benzene": loader}, scale=1.169, k=2,
                        sampling_kwargs={"sampling_method": "euler", "num_steps": 2})
    assert "test/benzene/ade" in out and np.isfinite(out["test/benzene/ade"])
    assert out["test/benzene/fde"] >= 0


def test_min_k_protocol_runner():
    from lam_slide_tpu.composites.pedestrian import (
        PedestrianFirstStageConfig, PedestrianSecondStageConfig,
        build_pedestrian_first_stage, build_pedestrian_second_stage,
    )
    from lam_slide_tpu.composites.testing import evaluate_min_k
    from lam_slide_tpu.data import Loader, pad_collate_temporal
    from lam_slide_tpu.data.pedestrian import PedestrianDataset

    fs_cfg = PedestrianFirstStageConfig(num_entities=10, dim_input=16, dim_latent=8,
                                        dim_entity=16, num_latents=2, dim_head_cross=4,
                                        dim_head_latent=4, num_head_cross=2,
                                        dropout_query=0.0)
    fs = build_pedestrian_first_stage(fs_cfg)
    ds = PedestrianDataset(scene="eth", phase="test", first_stage=False,
                           num_entities=10, synthetic_scenes=4)
    loader = Loader(ds, batch_size=2, collate_fn=lambda b: pad_collate_temporal(b, 10),
                    shuffle=False, seed=0, drop_last=False)
    batch = jax.tree.map(jnp.asarray, next(iter(loader)))
    frame0 = {k: v[:, 0] for k, v in batch.items() if not k.startswith("cond")}
    fs_vars = fs.init(jax.random.PRNGKey(0), frame0)
    cfg2 = PedestrianSecondStageConfig(in_dim=8, depth=1, hidden_size=16, num_heads=2,
                                       cond_idx=(0, 8), num_timesteps=20)
    ss = build_pedestrian_second_stage(cfg2, fs, fs_vars)
    x1, mk = ss.prepare_batch(fs_vars, batch)
    params = ss.backbone.init(jax.random.PRNGKey(1), x1, jnp.zeros((2,)),
                              mk["x_cond"], mk["x_cond_mask"])["params"]
    out = evaluate_min_k(
        ss, params, fs_vars, {"eth": loader}, k=4, num_runs=3, post_process=True,
        sampling_kwargs={"sampling_method": "euler", "num_steps": 2})
    for key in ("test/eth/ade", "test/eth/fde", "test/eth/ade_post", "test/eth/fde_post"):
        assert key in out and np.isfinite(out[key])
    with pytest.raises(ValueError):
        evaluate_min_k(ss, params, fs_vars, {}, k=2, num_runs=5)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs the 8-device virtual mesh")
def test_md17_protocol_on_mesh_matches_single_device():
    """evaluate_md17 with a data-parallel mesh: identical metrics, sharded
    sampling — the multi-chip test pass the reference never had."""
    from lam_slide_tpu.composites.md17 import (
        MD17FirstStageConfig, MD17SecondStageConfig,
        build_md17_first_stage, build_md17_second_stage,
    )
    from lam_slide_tpu.composites.testing import evaluate_md17
    from lam_slide_tpu.data import Loader, pad_collate_temporal
    from lam_slide_tpu.data.md17 import MD17Dataset
    from lam_slide_tpu.parallel import MeshSpec, make_mesh

    ne, span = 12, 8
    fs_cfg = MD17FirstStageConfig(num_entities=ne, dim_input=16, dim_latent=8,
                                  dim_entity=16, num_latents=4, dim_head_cross=4,
                                  dim_head_latent=4, num_head_cross=2,
                                  dropout_query=0.0)
    fs = build_md17_first_stage(fs_cfg)
    ds = MD17Dataset(molecule="benzene", mode="test", span=span, first_stage=False,
                     num_entities=ne, force_length=8, rand_rotation=False,
                     synthetic_frames=1500)
    loader = Loader(ds, batch_size=8, collate_fn=lambda b: pad_collate_temporal(b, ne),
                    shuffle=False, seed=0, drop_last=True)
    batch = jax.tree.map(jnp.asarray, next(iter(loader)))
    frame0 = {k: v[:, 0] for k, v in batch.items() if not k.startswith("cond")}
    fs_vars = fs.init(jax.random.PRNGKey(0), frame0)
    cfg2 = MD17SecondStageConfig(in_dim=8, depth=1, hidden_size=16, num_heads=2,
                                 cond_idx=(0, 3), num_timesteps=span)
    ss = build_md17_second_stage(cfg2, fs, fs_vars)
    x1, mk = ss.prepare_batch(fs_vars, batch)
    params = ss.backbone.init(jax.random.PRNGKey(1), x1, jnp.zeros((8,)),
                              mk["x_cond"], mk["x_cond_mask"])["params"]
    kwargs = dict(scale=1.169, k=2,
                  sampling_kwargs={"sampling_method": "euler", "num_steps": 2})
    single = evaluate_md17(ss, params, fs_vars, {"benzene": loader}, **kwargs)
    mesh = make_mesh(MeshSpec(data=8, model=1))
    sharded = evaluate_md17(ss, params, fs_vars, {"benzene": loader}, mesh=mesh,
                            **kwargs)
    for key in single:
        np.testing.assert_allclose(sharded[key], single[key], rtol=5e-3,
                                   err_msg=key)


def test_md17_protocol_mixed_device_commitments():
    """Regression: after a mesh-trained fit, `--test` (no --test-mesh)
    hands evaluate_md17 params committed across the training mesh's
    devices while fs_variables sit on one device — mixing commitments in
    one jit raised 'Received incompatible devices'. The runner must
    normalize both when mesh is None."""
    from lam_slide_tpu.composites.md17 import (
        MD17FirstStageConfig, MD17SecondStageConfig,
        build_md17_first_stage, build_md17_second_stage,
    )
    from lam_slide_tpu.composites.testing import evaluate_md17
    from lam_slide_tpu.data import Loader, pad_collate_temporal
    from lam_slide_tpu.data.md17 import MD17Dataset
    from lam_slide_tpu.parallel import MeshSpec, make_mesh, replicated

    ne, span = 12, 8
    fs_cfg = MD17FirstStageConfig(num_entities=ne, dim_input=16, dim_latent=8,
                                  dim_entity=16, num_latents=4, dim_head_cross=4,
                                  dim_head_latent=4, num_head_cross=2,
                                  dropout_query=0.0)
    fs = build_md17_first_stage(fs_cfg)
    ds = MD17Dataset(molecule="benzene", mode="test", span=span, first_stage=False,
                     num_entities=ne, force_length=4, rand_rotation=False,
                     synthetic_frames=1500)
    loader = Loader(ds, batch_size=2, collate_fn=lambda b: pad_collate_temporal(b, ne),
                    shuffle=False, seed=0, drop_last=False)
    batch = jax.tree.map(jnp.asarray, next(iter(loader)))
    frame0 = {k: v[:, 0] for k, v in batch.items() if not k.startswith("cond")}
    fs_vars = fs.init(jax.random.PRNGKey(0), frame0)  # default device only
    cfg2 = MD17SecondStageConfig(in_dim=8, depth=1, hidden_size=16, num_heads=2,
                                 cond_idx=(0, 3), num_timesteps=span)
    ss = build_md17_second_stage(cfg2, fs, fs_vars)
    x1, mk = ss.prepare_batch(fs_vars, batch)
    params = ss.backbone.init(jax.random.PRNGKey(1), x1, jnp.zeros((2,)),
                              mk["x_cond"], mk["x_cond_mask"])["params"]
    # Commit params across a 2-device mesh, the way a mesh-trained
    # TrainState hands them to the post-fit test protocol.
    mesh = make_mesh(MeshSpec(data=2, model=1), devices=jax.devices()[:2])
    params = jax.tree.map(lambda x: jax.device_put(x, replicated(mesh)), params)
    out = evaluate_md17(ss, params, fs_vars, {"benzene": loader}, scale=1.0,
                        k=2, mesh=None,
                        sampling_kwargs={"sampling_method": "euler",
                                         "num_steps": 2})
    assert np.isfinite(out["test/benzene/ade"])
