"""Experiment registry — the Hydra-experiment-tree replacement.

Each builder assembles the full run (model, loss, loaders, trainer config)
for one reference experiment (configs/experiment/<domain>/<stage>.yaml),
with the same hyperparameters, in plain Python. ``smoke=True`` shrinks
everything to a CPU-runnable few-step run (the reference's
configs/debug/default.yaml semantics: tiny data, few batches).

Cross-stage lineage: stage-2 builders resolve the frozen stage-1 weights
through the local run registry (run_id → run_dir → checkpoint; replaces the
wandb run-ID lookup, src/utils/utils.py:180-199) and load the *EMA* params,
matching ``load_ema_weights`` + ``freeze()`` (second_stage/md17.py:46-51).
"""

import functools
import os
from dataclasses import dataclass, field
from typing import Any, Callable, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp
from jax import numpy as jnp

from lam_slide_tpu.data import Loader, pad_collate, pad_collate_temporal
from lam_slide_tpu.train.checkpoint import resolve_run
from lam_slide_tpu.train.trainer import TrainerConfig

MD17_SCALES = {
    "aspirin": 1.721, "benzene": 1.169, "ethanol": 0.893, "malonaldehyde": 0.989,
    "naphthalene": 1.515, "salicylic": 1.429, "toluene": 1.339, "uracil": 1.173,
    "all": 1.376,
}


@dataclass
class ExperimentRun:
    name: str
    trainer_cfg: TrainerConfig
    variables: dict
    loss_fn: Callable
    train_loader: Loader
    val_loaders: Dict[str, Loader]
    model: Any
    meta: Dict[str, Any] = field(default_factory=dict)
    sample_batch: Any = None
    eval_fns: Dict[str, Callable] = field(default_factory=dict)
    # --test protocol surface (reference src/train.py:100-118): the held-out
    # test split and an fp32 rebuild of the stage-2 model — the reference
    # re-instantiates its trainer with precision="32-true" for the test pass
    # after bf16-mixed training. None → fall back to val_loaders / model.
    test_loaders: Optional[Dict[str, Loader]] = None
    test_model: Any = None


def _concat_loaders_batch(loader):
    return jax.tree.map(jnp.asarray, next(iter(loader)))


def load_checkpoint_raw(run_dir: str, which: str = "best") -> dict:
    """Read an Orbax checkpoint without a target skeleton → nested dict.

    Falls back ``best`` → ``last`` (a run that never improved its monitored
    metric has no ``best``) with a visible warning — silently testing a
    different checkpoint than requested would misattribute the metrics.
    """
    run_dir = os.path.abspath(run_dir)  # Orbax requires absolute paths
    path = os.path.join(run_dir, "checkpoints", which)
    if not os.path.exists(path):
        fallback = os.path.join(run_dir, "checkpoints", "last")
        if which != "last" and os.path.exists(fallback):
            print(f"WARNING: no '{which}' checkpoint in {run_dir}; "
                  "falling back to 'last'", flush=True)
            path = fallback
        else:
            raise FileNotFoundError(f"no '{which}' checkpoint under "
                                    f"{run_dir}/checkpoints")
    try:
        return ocp.StandardCheckpointer().restore(path)
    except ValueError:
        # Cross-device restore (e.g. a checkpoint written by the CPU-side
        # torch importer read in a TPU process): the saved sharding metadata
        # names devices that don't exist here. Restore leaves as host numpy
        # arrays instead — callers device_put on first use anyway.
        ckptr = ocp.PyTreeCheckpointer()
        meta = ckptr.metadata(path)
        tree = getattr(getattr(meta, "item_metadata", meta), "tree", meta)
        restore_args = jax.tree.map(
            lambda _: ocp.RestoreArgs(restore_type=np.ndarray), tree)
        return ckptr.restore(path, restore_args=restore_args)


def load_first_stage_variables(workspace: str, run_id: str, which: str = "best") -> dict:
    """run_id → frozen stage-1 variables {params: EMA, constants} + config."""
    info = resolve_run(workspace, run_id)
    raw = load_checkpoint_raw(info["run_dir"], which)
    params = raw.get("ema_params") or raw["params"]
    variables = {"params": params}
    if raw.get("constants") is not None:
        variables["constants"] = raw["constants"]
    return variables, info.get("config", {})


# ---------------------------------------------------------------------------
# MD17
# ---------------------------------------------------------------------------


def _md17_datasets(smoke, data_root, first_stage, molecules, num_entities, span, scales,
                   with_test=False, synthetic_frames=None):
    from lam_slide_tpu.data.md17 import MD17Dataset

    # default synthetic fallback is sized for tests; non-smoke runs on
    # synthetic data (e.g. tools/convergence.py) pass a larger value so the
    # 5000-window train split actually fills the reference batch sizes
    kw = dict(
        root=data_root, span=span, first_stage=first_stage, num_entities=num_entities,
        synthetic_frames=synthetic_frames or (3000 if smoke else 4000),
    )
    train_sets = [
        MD17Dataset(molecule=m, mode="train", scale=scales[m], rand_rotation=True,
                    force_length=48 if smoke else None, **kw)
        for m in molecules
    ]
    val_sets = {
        m: MD17Dataset(molecule=m, mode="val", scale=scales[m], rand_rotation=False,
                       force_length=16 if smoke else 256, **kw)
        for m in molecules
    }
    if not with_test:
        return train_sets, val_sets
    # held-out chronological test split, 1000 eval samples per molecule
    # (geo_tdm/md17.py:120-154) — the --test protocol's data
    test_sets = {
        m: MD17Dataset(molecule=m, mode="test", scale=scales[m], rand_rotation=False,
                       force_length=16 if smoke else None, **kw)
        for m in molecules
    }
    return train_sets, val_sets, test_sets


class _ConcatDataset:
    def __init__(self, datasets):
        self.datasets = datasets
        self.offsets = np.cumsum([0] + [len(d) for d in datasets])

    def __len__(self):
        return int(self.offsets[-1])

    def sample(self, idx, rng):
        d = int(np.searchsorted(self.offsets, idx, side="right")) - 1
        return self.datasets[d].sample(idx - int(self.offsets[d]), rng)


def md17_first_stage(smoke=False, data_root=None, workspace="runs", seed=0,
                     molecule="all", synthetic_frames=None, **_):
    from lam_slide_tpu.composites.md17 import (
        MD17FirstStageConfig, build_md17_first_stage, make_md17_first_stage_loss,
    )

    molecules = list(MD17_SCALES)[:-1] if molecule == "all" else [molecule]
    if smoke:
        molecules = molecules[:2]
    scale = MD17_SCALES[molecule]
    cfg = MD17FirstStageConfig(num_entities=32, scale=scale) if not smoke else (
        MD17FirstStageConfig(num_entities=32, dim_input=32, dim_latent=8, dim_entity=32,
                             num_latents=8, dim_head_cross=8, dim_head_latent=8,
                             num_head_cross=2, scale=scale)
    )
    model = build_md17_first_stage(cfg)
    train_sets, val_sets = _md17_datasets(
        smoke, data_root, True, molecules, cfg.num_entities, 30, MD17_SCALES,
        synthetic_frames=synthetic_frames,
    )
    bs = 16 if smoke else 256
    collate = functools.partial(pad_collate, num_entities=cfg.num_entities)
    train_loader = Loader(_ConcatDataset(train_sets), bs, collate, seed=seed)
    val_loaders = {
        m: Loader(ds, bs, collate, shuffle=False, seed=seed, drop_last=False)
        for m, ds in val_sets.items()
    }
    batch = _concat_loaders_batch(train_loader)
    variables = model.init(jax.random.PRNGKey(seed), batch)
    trainer_cfg = TrainerConfig(
        max_epochs=2 if smoke else 3000, lr=4e-4, monitor="pos_loss",
        val_every_n_epochs=1 if smoke else 25, seed=seed,
    )
    return ExperimentRun(
        name="md17_first_stage", trainer_cfg=trainer_cfg, variables=variables,
        loss_fn=make_md17_first_stage_loss(model, cfg), train_loader=train_loader,
        val_loaders=val_loaders, model=model, sample_batch=batch,
        meta={"config": cfg.__dict__, "stage": 1, "domain": "md17"},
    )


def md17_second_stage(smoke=False, data_root=None, workspace="runs", seed=0,
                      molecule="all", first_stage_run=None, dit_dtype=None,
                      synthetic_frames=None, batch_size=None, num_heads=None,
                      **_):
    from lam_slide_tpu.composites.md17 import (
        MD17FirstStageConfig, MD17SecondStageConfig, build_md17_first_stage,
        build_md17_second_stage,
    )

    molecules = list(MD17_SCALES)[:-1] if molecule == "all" else [molecule]
    if smoke:
        molecules = molecules[:2]
    scale = MD17_SCALES[molecule]

    # frozen stage 1: from the registry, or freshly initialized in smoke mode
    if first_stage_run is not None:
        fs_vars, fs_cfg_dict = load_first_stage_variables(workspace, first_stage_run)
        fs_cfg = MD17FirstStageConfig(**{
            k: v for k, v in fs_cfg_dict.get("config", fs_cfg_dict).items()
            if k in MD17FirstStageConfig.__dataclass_fields__
        })
    elif smoke:
        fs_cfg = MD17FirstStageConfig(num_entities=32, dim_input=32, dim_latent=8,
                                      dim_entity=32, num_latents=8, dim_head_cross=8,
                                      dim_head_latent=8, num_head_cross=2, scale=scale)
        fs_vars = None
    else:
        raise ValueError("md17_second_stage requires first_stage_run (see run registry)")

    fs_model = build_md17_first_stage(fs_cfg)
    train_sets, val_sets, test_sets = _md17_datasets(
        smoke, data_root, False, molecules, fs_cfg.num_entities, 30, MD17_SCALES,
        with_test=True, synthetic_frames=synthetic_frames,
    )
    # reference bs=64 assumes an 80 GB training card; one 16 GB v5e fits
    # bs<=32 for the full remat'd step (batch_size override, e.g. sweeps /
    # tools/convergence.py) — multi-chip data parallelism restores 64+
    bs = batch_size or (4 if smoke else 64)
    collate = functools.partial(pad_collate_temporal, num_entities=fs_cfg.num_entities)
    train_loader = Loader(_ConcatDataset(train_sets), bs, collate, seed=seed)
    val_loaders = {
        m: Loader(ds, bs, collate, shuffle=False, seed=seed, drop_last=False)
        for m, ds in val_sets.items()
    }
    test_loaders = {
        m: Loader(ds, bs, collate, shuffle=False, seed=seed, drop_last=False)
        for m, ds in test_sets.items()
    }
    batch = _concat_loaders_batch(train_loader)
    if fs_vars is None:
        frame0 = {k: v[:, 0] for k, v in batch.items() if not k.startswith("cond")}
        fs_vars = fs_model.init(jax.random.PRNGKey(seed), frame0)

    # num_heads: head-split A/B (PERF.md dh lane-tax analysis) — same hidden
    # width, different per-head dim; reference-exact split stays the default
    cfg2 = (
        MD17SecondStageConfig(in_dim=fs_cfg.dim_latent, class_conditional=True,
                              scan_layers=True,
                              **({"num_heads": num_heads} if num_heads else {}))
        if not smoke
        else MD17SecondStageConfig(in_dim=fs_cfg.dim_latent, depth=2, hidden_size=32,
                                   num_heads=num_heads or 4,
                                   class_conditional=True, vec_in_dim=32)
    )
    # bf16-mixed stage-2 by default; dit_dtype overrides (sweeps / tests)
    dit_dtype = (jnp.dtype(dit_dtype) if dit_dtype is not None
                 else (jnp.float32 if smoke else jnp.bfloat16))
    ss = build_md17_second_stage(cfg2, fs_model, fs_vars, dtype=dit_dtype)
    # fp32 rebuild for the --test pass (src/train.py:106-118 precision="32-true")
    ss_test = build_md17_second_stage(cfg2, fs_model, fs_vars, dtype=jnp.float32)
    x1, mk = ss.prepare_batch(fs_vars, batch)
    params = ss.backbone.init(
        jax.random.PRNGKey(seed + 1), x1, jnp.zeros((x1.shape[0],)),
        mk["x_cond"], mk["x_cond_mask"], mk.get("y_class"),
    )["params"]
    variables = {"params": params, "constants": {"first_stage": fs_vars}}
    loss_fn = ss.make_loss(
        weight_si_loss=cfg2.weight_si_loss, weight_pos_loss=cfg2.weight_pos_loss,
        weight_inter_dist_loss=cfg2.weight_inter_dist_loss,
        calc_additional_losses=cfg2.calc_additional_losses, scale=scale,
    )
    trainer_cfg = TrainerConfig(
        max_epochs=2 if smoke else 1000, lr=1e-3, monitor="si_loss",
        val_every_n_epochs=1 if smoke else 10, seed=seed,
        limit_val_batches=0 if smoke else 5,  # reference limit_val_batches: 5
    )
    from lam_slide_tpu.composites.testing import make_protocol_val_hook

    # sampled val ADE/FDE each val epoch (reference second_stage/md17.py:75-113)
    hook = make_protocol_val_hook(ss, val_loaders, "md17", scale=scale,
                                  k=2 if smoke else 5, limit_batches=1)
    return ExperimentRun(
        name="md17_second_stage", trainer_cfg=trainer_cfg, variables=variables,
        loss_fn=loss_fn, train_loader=train_loader, val_loaders=val_loaders,
        model=ss, sample_batch=batch, eval_fns={"val_sample": hook},
        test_loaders=test_loaders, test_model=ss_test,
        meta={"config": cfg2.__dict__, "stage": 2, "domain": "md17",
              "first_stage_run": first_stage_run},
    )


# ---------------------------------------------------------------------------
# Pedestrian
# ---------------------------------------------------------------------------

PED_SCENES = ["zara1", "zara2", "univ", "hotel", "eth"]


def pedestrian_first_stage(smoke=False, data_root=None, workspace="runs", seed=0, **_):
    from lam_slide_tpu.composites.pedestrian import (
        PedestrianFirstStageConfig, build_pedestrian_first_stage,
        make_pedestrian_first_stage_loss,
    )
    from lam_slide_tpu.data.pedestrian import PedestrianDataset

    scenes = PED_SCENES[:2] if smoke else PED_SCENES
    cfg = PedestrianFirstStageConfig() if not smoke else PedestrianFirstStageConfig(
        dim_input=32, dim_latent=8, dim_entity=32, dim_head_cross=8, dim_head_latent=8,
        num_head_cross=2)
    model = build_pedestrian_first_stage(cfg)
    kw = dict(root=data_root, num_entities=cfg.num_entities,
              synthetic_scenes=24 if smoke else 64)
    train_sets = [PedestrianDataset(scene=s, phase="train", rand_rotation=True, **kw)
                  for s in scenes]
    # reference uses the test split for val (pedestrian.py:198-204)
    val_sets = {s: PedestrianDataset(scene=s, phase="test", **kw) for s in scenes}
    bs = 16 if smoke else 512
    collate = functools.partial(pad_collate, num_entities=cfg.num_entities)
    train_loader = Loader(_ConcatDataset(train_sets), bs, collate, seed=seed)
    val_loaders = {s: Loader(ds, bs, collate, shuffle=False, seed=seed, drop_last=False)
                   for s, ds in val_sets.items()}
    batch = _concat_loaders_batch(train_loader)
    variables = model.init(jax.random.PRNGKey(seed), batch)
    trainer_cfg = TrainerConfig(max_epochs=2 if smoke else 2000, lr=1e-3,
                                monitor="pos_loss", val_every_n_epochs=1 if smoke else 25,
                                seed=seed)
    return ExperimentRun(
        name="pedestrian_first_stage", trainer_cfg=trainer_cfg, variables=variables,
        loss_fn=make_pedestrian_first_stage_loss(model, cfg), train_loader=train_loader,
        val_loaders=val_loaders, model=model, sample_batch=batch,
        meta={"config": cfg.__dict__, "stage": 1, "domain": "pedestrian"},
    )


def pedestrian_second_stage(smoke=False, data_root=None, workspace="runs", seed=0,
                            first_stage_run=None, dit_dtype=None, **_):
    from lam_slide_tpu.composites.pedestrian import (
        PedestrianFirstStageConfig, PedestrianSecondStageConfig,
        build_pedestrian_first_stage, build_pedestrian_second_stage,
    )
    from lam_slide_tpu.data.pedestrian import PedestrianDataset

    scenes = PED_SCENES[:2] if smoke else PED_SCENES
    if first_stage_run is not None:
        fs_vars, fs_cfg_dict = load_first_stage_variables(workspace, first_stage_run)
        fs_cfg = PedestrianFirstStageConfig(**{
            k: v for k, v in fs_cfg_dict.get("config", fs_cfg_dict).items()
            if k in PedestrianFirstStageConfig.__dataclass_fields__})
    elif smoke:
        fs_cfg = PedestrianFirstStageConfig(dim_input=32, dim_latent=8, dim_entity=32,
                                            dim_head_cross=8, dim_head_latent=8,
                                            num_head_cross=2)
        fs_vars = None
    else:
        raise ValueError("pedestrian_second_stage requires first_stage_run")
    fs_model = build_pedestrian_first_stage(fs_cfg)

    kw = dict(root=data_root, num_entities=fs_cfg.num_entities, first_stage=False,
              synthetic_scenes=12 if smoke else 64)
    train_sets = [PedestrianDataset(scene=s, phase="train", rand_rotation=True,
                                    flip_vertical=True, flip_horizontal=True, **kw)
                  for s in scenes]
    val_sets = {s: PedestrianDataset(scene=s, phase="test", **kw) for s in scenes}
    bs = 4 if smoke else 256
    collate = functools.partial(pad_collate_temporal, num_entities=fs_cfg.num_entities)
    train_loader = Loader(_ConcatDataset(train_sets), bs, collate, seed=seed)
    val_loaders = {s: Loader(ds, bs, collate, shuffle=False, seed=seed, drop_last=False)
                   for s, ds in val_sets.items()}
    batch = _concat_loaders_batch(train_loader)
    if fs_vars is None:
        frame0 = {k: v[:, 0] for k, v in batch.items() if not k.startswith("cond")}
        fs_vars = fs_model.init(jax.random.PRNGKey(seed), frame0)

    cfg2 = (PedestrianSecondStageConfig(in_dim=fs_cfg.dim_latent, class_conditional=True,
                                        scan_layers=True)
            if not smoke else
            PedestrianSecondStageConfig(in_dim=fs_cfg.dim_latent, depth=1, hidden_size=16,
                                        num_heads=2, class_conditional=True, vec_in_dim=16))
    # bf16-mixed stage-2 by default; dit_dtype overrides (sweeps / tests)
    dit_dtype = (jnp.dtype(dit_dtype) if dit_dtype is not None
                 else (jnp.float32 if smoke else jnp.bfloat16))
    ss = build_pedestrian_second_stage(cfg2, fs_model, fs_vars, dtype=dit_dtype)
    # fp32 rebuild for the --test pass (src/train.py:106-118 precision="32-true")
    ss_test = build_pedestrian_second_stage(cfg2, fs_model, fs_vars, dtype=jnp.float32)
    x1, mk = ss.prepare_batch(fs_vars, batch)
    params = ss.backbone.init(
        jax.random.PRNGKey(seed + 1), x1, jnp.zeros((x1.shape[0],)),
        mk["x_cond"], mk["x_cond_mask"], mk.get("y_class"))["params"]
    variables = {"params": params, "constants": {"first_stage": fs_vars}}
    loss_fn = ss.make_loss(
        weight_si_loss=cfg2.weight_si_loss, weight_pos_loss=cfg2.weight_pos_loss,
        weight_inter_dist_loss=cfg2.weight_inter_dist_loss,
        calc_additional_losses=cfg2.calc_additional_losses)
    trainer_cfg = TrainerConfig(max_epochs=2 if smoke else 3000, lr=1e-3,
                                monitor="si_loss", val_every_n_epochs=1 if smoke else 25,
                                seed=seed)
    from lam_slide_tpu.composites.testing import make_protocol_val_hook

    # sampled val min-ADE/FDE (reference second_stage/pedestrian.py:148-190)
    hook = make_protocol_val_hook(ss, val_loaders, "pedestrian",
                                  k=2 if smoke else 20,
                                  num_runs=2 if smoke else 20, limit_batches=1)
    return ExperimentRun(
        name="pedestrian_second_stage", trainer_cfg=trainer_cfg, variables=variables,
        loss_fn=loss_fn, train_loader=train_loader, val_loaders=val_loaders, model=ss,
        sample_batch=batch, eval_fns={"val_sample": hook},
        # the reference's pedestrian val IS the test split (its datamodule has
        # no held-out val; pedestrian.py:198-204) — test reuses the same loaders
        test_loaders=val_loaders, test_model=ss_test,
        meta={"config": cfg2.__dict__, "stage": 2, "domain": "pedestrian",
              "first_stage_run": first_stage_run},
    )


# ---------------------------------------------------------------------------
# NBA
# ---------------------------------------------------------------------------

NBA_SHIFT = {"score": 47.5787, "rebound": 47.2872}
NBA_SCALE = {"score": 24.7269, "rebound": 26.5484}


def nba_first_stage(smoke=False, data_root=None, workspace="runs", seed=0,
                    scene="score", **_):
    from lam_slide_tpu.composites.nba import (
        NBAFirstStageConfig, build_nba_first_stage, make_nba_first_stage_loss,
    )
    from lam_slide_tpu.data.nba import NBADataset

    cfg = NBAFirstStageConfig(scale=NBA_SCALE[scene]) if not smoke else NBAFirstStageConfig(
        dim_input=32, dim_latent=8, dim_entity=32, num_latents=4, dim_head_cross=8,
        dim_head_latent=8, scale=NBA_SCALE[scene])
    model = build_nba_first_stage(cfg)
    # root points at the scene's processed directory with train/test subdirs
    # (the reference's data_dir/<scene>/<mode> SocialVAE layout); val uses
    # the TEST split (the reference's documented test-as-val comparability
    # quirk, nba.py:233-240) — disjoint from train by construction.
    root = None if data_root is None else os.path.join(data_root, scene)
    kw = dict(root=root, num_entities=cfg.num_entities, shift=NBA_SHIFT[scene],
              scale=NBA_SCALE[scene], synthetic_games=16 if smoke else 64)
    train = NBADataset(scene=scene, flip=True, rand_rotation=True, split="train", **kw)
    val = NBADataset(scene=scene, split="test", **kw)
    bs = 8 if smoke else 1024
    collate = functools.partial(pad_collate, num_entities=cfg.num_entities)
    train_loader = Loader(train, bs, collate, seed=seed, drop_last=False)
    val_loaders = {scene: Loader(val, bs, collate, shuffle=False, seed=seed, drop_last=False)}
    batch = _concat_loaders_batch(train_loader)
    variables = model.init(jax.random.PRNGKey(seed), batch)
    trainer_cfg = TrainerConfig(max_epochs=2 if smoke else 10_000, lr=4e-4,
                                monitor="pos_loss", val_every_n_epochs=1 if smoke else 100,
                                seed=seed)
    return ExperimentRun(
        name="nba_first_stage", trainer_cfg=trainer_cfg, variables=variables,
        loss_fn=make_nba_first_stage_loss(model, cfg), train_loader=train_loader,
        val_loaders=val_loaders, model=model, sample_batch=batch,
        meta={"config": cfg.__dict__, "stage": 1, "domain": "nba", "scene": scene},
    )


def nba_second_stage(smoke=False, data_root=None, workspace="runs", seed=0,
                     batch_size=None,
                     scene="score", first_stage_run=None, dit_dtype=None, **_):
    from lam_slide_tpu.composites.nba import (
        NBAFirstStageConfig, NBASecondStageConfig, build_nba_first_stage,
        build_nba_second_stage,
    )
    from lam_slide_tpu.data.nba import NBADataset

    if first_stage_run is not None:
        fs_vars, fs_cfg_dict = load_first_stage_variables(workspace, first_stage_run)
        fs_cfg = NBAFirstStageConfig(**{
            k: v for k, v in fs_cfg_dict.get("config", fs_cfg_dict).items()
            if k in NBAFirstStageConfig.__dataclass_fields__})
    elif smoke:
        fs_cfg = NBAFirstStageConfig(dim_input=32, dim_latent=8, dim_entity=32,
                                     num_latents=4, dim_head_cross=8, dim_head_latent=8,
                                     scale=NBA_SCALE[scene])
        fs_vars = None
    else:
        raise ValueError("nba_second_stage requires first_stage_run")
    fs_model = build_nba_first_stage(fs_cfg)

    # val/test use the TEST split (reference test-as-val quirk, nba.py:233-240)
    root = None if data_root is None else os.path.join(data_root, scene)
    kw = dict(root=root, num_entities=fs_cfg.num_entities, first_stage=False,
              shift=NBA_SHIFT[scene], scale=NBA_SCALE[scene],
              synthetic_games=4 if smoke else 64)
    train = NBADataset(scene=scene, flip=True, rand_rotation=True, split="train", **kw)
    val = NBADataset(scene=scene, split="test", **kw)
    bs = batch_size or (4 if smoke else 1024)
    collate = functools.partial(pad_collate_temporal, num_entities=fs_cfg.num_entities)
    train_loader = Loader(train, bs, collate, seed=seed)
    val_loaders = {scene: Loader(val, bs, collate, shuffle=False, seed=seed, drop_last=False)}
    batch = _concat_loaders_batch(train_loader)
    if fs_vars is None:
        frame0 = {k: v[:, 0] for k, v in batch.items() if not k.startswith("cond")}
        fs_vars = fs_model.init(jax.random.PRNGKey(seed), frame0)

    cfg2 = (NBASecondStageConfig(in_dim=fs_cfg.dim_latent, class_conditional=True,
                                 scan_layers=True)
            if not smoke else
            NBASecondStageConfig(in_dim=fs_cfg.dim_latent, depth=1, hidden_size=16,
                                 num_heads=2, class_conditional=True, vec_in_dim=16))
    # bf16-mixed stage-2 by default; dit_dtype overrides (sweeps / tests)
    dit_dtype = (jnp.dtype(dit_dtype) if dit_dtype is not None
                 else (jnp.float32 if smoke else jnp.bfloat16))
    ss = build_nba_second_stage(cfg2, fs_model, fs_vars, dtype=dit_dtype)
    # fp32 rebuild for the --test pass (src/train.py:106-118 precision="32-true")
    ss_test = build_nba_second_stage(cfg2, fs_model, fs_vars, dtype=jnp.float32)
    x1, mk = ss.prepare_batch(fs_vars, batch)
    params = ss.backbone.init(
        jax.random.PRNGKey(seed + 1), x1, jnp.zeros((x1.shape[0],)),
        mk["x_cond"], mk["x_cond_mask"], mk.get("y_class"))["params"]
    variables = {"params": params, "constants": {"first_stage": fs_vars}}
    loss_fn = ss.make_loss(
        weight_si_loss=cfg2.weight_si_loss, weight_pos_loss=cfg2.weight_pos_loss,
        weight_inter_dist_loss=cfg2.weight_inter_dist_loss,
        calc_additional_losses=cfg2.calc_additional_losses)
    trainer_cfg = TrainerConfig(max_epochs=2 if smoke else 1000, lr=1e-3,
                                monitor="si_loss", val_every_n_epochs=1 if smoke else 10,
                                seed=seed)
    from lam_slide_tpu.composites.testing import make_protocol_val_hook

    # sampled val min-ADE/FDE (reference second_stage/nba.py pattern)
    hook = make_protocol_val_hook(ss, val_loaders, "nba",
                                  k=2 if smoke else 20,
                                  num_runs=2 if smoke else 20, limit_batches=1)
    return ExperimentRun(
        name="nba_second_stage", trainer_cfg=trainer_cfg, variables=variables,
        loss_fn=loss_fn, train_loader=train_loader, val_loaders=val_loaders, model=ss,
        sample_batch=batch, eval_fns={"val_sample": hook},
        # NBA val already reads the test split (test-as-val quirk) → reuse
        test_loaders=val_loaders, test_model=ss_test,
        meta={"config": cfg2.__dict__, "stage": 2, "domain": "nba", "scene": scene,
              "first_stage_run": first_stage_run},
    )


# ---------------------------------------------------------------------------
# Peptide
# ---------------------------------------------------------------------------


def _pep_collate(samples):
    out = {k: np.stack([s[k] for s in samples]) for k in samples[0]}
    out["attention_mask"] = np.ones(out["aatype"].shape, dtype=bool)
    return out


def peptide_first_stage(smoke=False, data_root=None, workspace="runs", seed=0,
                        synthetic_peptides=None, synthetic_frames=None,
                        repeats=1, batch_size=None, frame_holdout=0.0,
                        synthetic_version=1, scale=1.0, **_):
    """frame_holdout > 0 (synthetic only): validate on the last ``h`` fraction
    of FRAMES of the training sequences instead of disjoint valsynth
    sequences — cross-sequence generalization needs the real ~3100-peptide
    mdgen split, unobtainable here (docs/CONVERGENCE.md). Rejected with
    data_root: the real split is already sequence-disjoint and the
    reference protocol uses whole trajectories."""
    if frame_holdout and data_root is not None:
        raise ValueError("frame_holdout is the synthetic-data validation "
                         "protocol; real data (data_root) uses the "
                         "sequence-disjoint reference splits")
    from lam_slide_tpu.composites.peptide import (
        PeptideFirstStageConfig, build_peptide_first_stage, make_peptide_first_stage_loss,
    )
    from lam_slide_tpu.data.peptide import PeptideDataset

    # scale: coordinate normalization divisor (reference `scale` hparam,
    # configs/experiment/peptide/first-stage.yaml). The real 4AA protocol is
    # scale=1 over mdtraj NANOMETER coordinates; the synthetic generator
    # emits ANGSTROM-scale geometry (AlphaFold tables), so scale=10 is the
    # protocol-faithful synthetic setting — at scale=1 every position loss
    # runs 100x the reference magnitude and the scale-independent aatype CE
    # term is effectively 100x weaker than the reference loss mix.
    scale = float(scale)
    cfg = (PeptideFirstStageConfig(scale=scale) if not smoke
           else PeptideFirstStageConfig(
        dim_input=32, dim_latent=16, dim_entity=32, num_latents=2, num_split=4,
        dim_head_cross=8, dim_head_latent=8, scale=scale))
    model = build_peptide_first_stage(cfg)
    kw = dict(num_entities=cfg.num_entities, n_timesteps=100, scale=scale,
              synthetic_peptides=synthetic_peptides or (4 if smoke else 8),
              synthetic_frames=synthetic_frames or (120 if smoke else 1200),
              repeats=repeats, synthetic_version=synthetic_version)
    if frame_holdout:
        kw["frame_split"] = (0.0, 1.0 - frame_holdout)
    train = PeptideDataset(data_dir=None if data_root is None else f"{data_root}/train",
                           first_stage=True, rand_rotation=True, **kw)
    val_kw = dict(kw, repeats=1)
    if frame_holdout:
        val_kw["frame_split"] = (1.0 - frame_holdout, 1.0)
        val_kw["synthetic_prefix"] = "synth"  # same sequences, held-out frames
    else:
        val_kw["synthetic_prefix"] = "valsynth"
    val = PeptideDataset(data_dir=None if data_root is None else f"{data_root}/val",
                         first_stage=True, **val_kw)
    bs = batch_size or (4 if smoke else 512)
    train_loader = Loader(train, bs, _pep_collate, seed=seed, drop_last=False)
    val_loaders = {"val": Loader(val, bs, _pep_collate, shuffle=False, seed=seed,
                                 drop_last=False)}
    batch = _concat_loaders_batch(train_loader)
    variables = model.init(jax.random.PRNGKey(seed), batch)
    trainer_cfg = TrainerConfig(max_epochs=2 if smoke else 50_000, lr=1e-3,
                                monitor="pos_loss",
                                val_every_n_epochs=1 if smoke else 500, seed=seed)
    return ExperimentRun(
        name="peptide_first_stage", trainer_cfg=trainer_cfg, variables=variables,
        loss_fn=make_peptide_first_stage_loss(model, cfg), train_loader=train_loader,
        val_loaders=val_loaders, model=model, sample_batch=batch,
        meta={"config": cfg.__dict__, "stage": 1, "domain": "peptide"},
    )


def peptide_second_stage(smoke=False, data_root=None, workspace="runs", seed=0,
                         first_stage_run=None, dit_dtype=None,
                         synthetic_peptides=None, synthetic_frames=None,
                         repeats=1, batch_size=None, n_timesteps=None,
                         frame_holdout=0.0, num_heads=None,
                         synthetic_version=1, **_):
    if frame_holdout and data_root is not None:
        raise ValueError("frame_holdout is the synthetic-data validation "
                         "protocol; real data (data_root) uses the "
                         "sequence-disjoint reference splits")
    from lam_slide_tpu.composites.peptide import (
        PeptideFirstStageConfig, PeptideSecondStageConfig, build_peptide_first_stage,
        build_peptide_second_stage, make_peptide_second_stage_loss,
    )
    from lam_slide_tpu.data.peptide import PeptideDataset

    n_t = n_timesteps or (16 if smoke else 1000)
    if first_stage_run is not None:
        fs_vars, fs_cfg_dict = load_first_stage_variables(workspace, first_stage_run)
        fs_cfg = PeptideFirstStageConfig(**{
            k: v for k, v in fs_cfg_dict.get("config", fs_cfg_dict).items()
            if k in PeptideFirstStageConfig.__dataclass_fields__})
    elif smoke:
        fs_cfg = PeptideFirstStageConfig(dim_input=32, dim_latent=16, dim_entity=32,
                                         num_latents=2, num_split=4, dim_head_cross=8,
                                         dim_head_latent=8)
        fs_vars = None
    else:
        raise ValueError("peptide_second_stage requires first_stage_run")
    fs_model = build_peptide_first_stage(fs_cfg)

    # datasets inherit the stage-1 lineage's coordinate normalization
    kw = dict(num_entities=fs_cfg.num_entities, n_timesteps=n_t, first_stage=False,
              scale=fs_cfg.scale, shift=fs_cfg.shift,
              synthetic_peptides=synthetic_peptides or (2 if smoke else 8),
              synthetic_frames=synthetic_frames or (60 if smoke else 2000),
              repeats=repeats, synthetic_version=synthetic_version)
    tr_kw, val_kw = dict(kw), dict(kw, repeats=1)
    if frame_holdout:  # same sequences, temporally held-out windows
        tr_kw["frame_split"] = (0.0, 1.0 - frame_holdout)
        val_kw["frame_split"] = (1.0 - frame_holdout, 1.0)
        val_kw["synthetic_prefix"] = "synth"
    else:
        val_kw["synthetic_prefix"] = "valsynth"
    train = PeptideDataset(data_dir=None if data_root is None else f"{data_root}/train",
                           rand_rotation=True, **tr_kw)
    val = PeptideDataset(data_dir=None if data_root is None else f"{data_root}/val",
                         **val_kw)
    bs = batch_size or (2 if smoke else 16)
    train_loader = Loader(train, bs, _pep_collate, seed=seed, drop_last=False)
    val_loaders = {"val": Loader(val, bs, _pep_collate, shuffle=False, seed=seed,
                                 drop_last=False)}
    batch = _concat_loaders_batch(train_loader)
    if fs_vars is None:
        frame0 = {k: v[:, 0] for k, v in batch.items()}
        fs_vars = fs_model.init(jax.random.PRNGKey(seed), frame0)

    # num_heads: head-split A/B (PERF.md dh lane-tax analysis; 16x24
    # reference default vs TPU-native 12x32 / 3x128 at the same width)
    cfg2 = (PeptideSecondStageConfig(in_dim=fs_cfg.dim_latent, num_timesteps=n_t,
                                     scan_layers=True,
                                     **({"num_heads": num_heads} if num_heads
                                        else {}))
            if not smoke else
            PeptideSecondStageConfig(in_dim=fs_cfg.dim_latent, depth=2, hidden_size=32,
                                     num_heads=num_heads or 4, num_timesteps=n_t))
    # bf16-mixed stage-2 by default; dit_dtype overrides (sweeps / tests)
    dit_dtype = (jnp.dtype(dit_dtype) if dit_dtype is not None
                 else (jnp.float32 if smoke else jnp.bfloat16))
    ss = build_peptide_second_stage(cfg2, fs_model, fs_vars, dtype=dit_dtype)
    # fp32 rebuild: the 4AA protocol is "fp32 sampling of the bf16-trained
    # model" (configs/eval_peptide.yaml:19-25) — eval_cli resolves this model
    ss_test = build_peptide_second_stage(cfg2, fs_model, fs_vars, dtype=jnp.float32)
    x1, mk = ss.prepare_batch(fs_vars, batch)
    params = ss.backbone.init(jax.random.PRNGKey(seed + 1), x1,
                              jnp.zeros((x1.shape[0],)), mk["x_cond"],
                              mk["x_cond_mask"])["params"]
    variables = {"params": params, "constants": {"first_stage": fs_vars}}
    loss_fn = make_peptide_second_stage_loss(ss, cfg2)
    # grad-clip 0.5 for peptide stage 2 (configs/experiment/peptide/second-stage.yaml:37)
    trainer_cfg = TrainerConfig(max_epochs=2 if smoke else 1500, lr=1e-3,
                                monitor="si_loss", grad_clip=0.5,
                                val_every_n_epochs=1 if smoke else 10, seed=seed)
    test = PeptideDataset(data_dir=None if data_root is None else f"{data_root}/test",
                          synthetic_prefix="testsynth", **dict(kw, repeats=1))
    test_loaders = {"test": Loader(test, bs, _pep_collate, shuffle=False, seed=seed,
                                   drop_last=False)}
    return ExperimentRun(
        name="peptide_second_stage", trainer_cfg=trainer_cfg, variables=variables,
        loss_fn=loss_fn, train_loader=train_loader, val_loaders=val_loaders, model=ss,
        sample_batch=batch, test_loaders=test_loaders, test_model=ss_test,
        meta={"config": cfg2.__dict__, "stage": 2, "domain": "peptide",
              "first_stage_run": first_stage_run},
    )


EXPERIMENTS = {
    "md17_first_stage": md17_first_stage,
    "md17_second_stage": md17_second_stage,
    "pedestrian_first_stage": pedestrian_first_stage,
    "pedestrian_second_stage": pedestrian_second_stage,
    "nba_first_stage": nba_first_stage,
    "nba_second_stage": nba_second_stage,
    "peptide_first_stage": peptide_first_stage,
    "peptide_second_stage": peptide_second_stage,
}


def build_experiment(name: str, **kwargs) -> ExperimentRun:
    if name not in EXPERIMENTS:
        raise KeyError(f"unknown experiment {name!r}; available: {sorted(EXPERIMENTS)}")
    return EXPERIMENTS[name](**kwargs)
