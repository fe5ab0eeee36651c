"""Shared builder for the real multi-process (multihost) train-step test.

Builds the same tiny MD17 stage-2 setup as ``__graft_entry__``'s multichip
dryrun, but fully deterministically (no shuffle, fixed seeds, one epoch
draw), so the SAME global batch and the SAME initial parameters are
reproduced in every process — single-process or multi-process. ``run``
executes two data-parallel training steps over a mesh spanning all global
devices and returns the two loss values; a 2-process run (each process
feeding its slice, or each holding the full batch) must match the
single-process 8-device run on the same global batch.

Used by tests/test_multihost.py both in-process (reference value) and from
the spawned worker processes (after ``jax.distributed.initialize``).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import optax

# Kept deliberately tiny: this box has ONE cpu core, and the 2-process
# gloo pair contends with the pytest process for it — compile time
# dominates, so small shapes + depth 1 keep the pair inside its bound.
GLOBAL_BATCH = 8
SPAN = 8
NUM_ENTITIES = 16


def _to_np(tree):
    # Init products are process-local device arrays; hand the jitted step
    # host numpy instead so its explicit in_shardings lay them out globally
    # (required under multi-process — a committed single-device array can't
    # be resharded into a global layout).
    return jax.tree.map(np.asarray, tree)


_BUILD_CACHE = {}


def run(mode: str, n_devices: int = 8):
    """mode: 'single' | 'shard' | 'full' -> [loss_step1, loss_step2].

    The model/batch build is cached per process so a worker can run both
    feeding modes in one distributed session (each mode still starts from
    a fresh, identical optimizer state).
    """
    built = _BUILD_CACHE.get(n_devices)
    if built is None:
        built = _BUILD_CACHE[n_devices] = _build(n_devices)
    return _run_mode(built, mode)


def _build(n_devices: int):
    from lam_slide_tpu.composites.md17 import (
        MD17FirstStageConfig,
        MD17SecondStageConfig,
        build_md17_first_stage,
        build_md17_second_stage,
    )
    from lam_slide_tpu.data import Loader, pad_collate_temporal
    from lam_slide_tpu.data.md17 import MD17Dataset
    from lam_slide_tpu.parallel import MeshSpec, make_mesh
    from lam_slide_tpu.train import create_train_state, make_train_step

    devices = jax.devices()
    assert len(devices) == n_devices, (len(devices), n_devices)
    mesh = make_mesh(MeshSpec(data=n_devices, model=1), devices=devices)

    fs_cfg = MD17FirstStageConfig(
        num_entities=NUM_ENTITIES, dim_input=32, dim_latent=8, dim_entity=32,
        num_latents=8, dim_head_cross=8, dim_head_latent=8, num_head_cross=2,
        dropout_query=0.0)
    fs = build_md17_first_stage(fs_cfg)
    ds = MD17Dataset(molecule="ethanol", mode="train", span=SPAN,
                     first_stage=False, num_entities=NUM_ENTITIES,
                     force_length=GLOBAL_BATCH, rand_rotation=False,
                     synthetic_frames=1500)
    # Every process draws the identical full global batch: same dataset,
    # same seed, shuffle off, first epoch — the rng streams are equal, so
    # the per-sample permutation draws are equal too.
    loader = Loader(ds, batch_size=GLOBAL_BATCH,
                    collate_fn=functools.partial(pad_collate_temporal,
                                                 num_entities=NUM_ENTITIES),
                    shuffle=False, seed=0, drop_last=True)
    batch = next(iter(loader))
    batch = {k: np.asarray(v) for k, v in batch.items()}

    frame0 = {k: jnp.asarray(v[:, 0]) for k, v in batch.items()
              if not k.startswith("cond")}
    fs_vars = _to_np(fs.init(jax.random.PRNGKey(0), frame0))

    cfg2 = MD17SecondStageConfig(in_dim=fs_cfg.dim_latent, depth=1,
                                 hidden_size=32, num_heads=4, cond_idx=(0, 4),
                                 num_timesteps=SPAN, class_conditional=True,
                                 vec_in_dim=16)
    ss = build_md17_second_stage(cfg2, fs, fs_vars)
    jbatch = jax.tree.map(jnp.asarray, batch)
    x1, mk = ss.prepare_batch(fs_vars, jbatch)
    params = _to_np(ss.backbone.init(
        jax.random.PRNGKey(1), x1, jnp.zeros((x1.shape[0],)),
        mk["x_cond"], mk["x_cond_mask"], mk["y_class"])["params"])
    loss_fn = ss.make_loss(weight_pos_loss=0.25, weight_inter_dist_loss=0.25,
                           calc_additional_losses=True)
    tx = optax.adamw(1e-3)
    step = make_train_step(loss_fn, tx, mesh=mesh, donate_state=False)

    def fresh_state():
        return create_train_state({"params": params}, tx).replace(
            constants={"first_stage": fs_vars})

    return dict(mesh=mesh, step=step, fresh_state=fresh_state,
                batch=batch, jbatch=jbatch)


def _run_mode(built, mode: str):
    from lam_slide_tpu.parallel import shard_batch

    mesh, batch = built["mesh"], built["batch"]
    if mode == "single":
        assert jax.process_count() == 1
        sharded = shard_batch(built["jbatch"], mesh)
    elif mode == "shard":
        # Per-process feeding: this process's contiguous slice of the global
        # batch (the Loader process_shard layout), assembled into the global
        # array by shard_batch via make_array_from_process_local_data.
        pi, pc = jax.process_index(), jax.process_count()
        local = GLOBAL_BATCH // pc
        local_rows = {k: v[pi * local:(pi + 1) * local] for k, v in batch.items()}
        sharded = shard_batch(local_rows, mesh, full_local=False)
    elif mode == "full":
        # full_batch_feed fallback: every process holds the identical full
        # batch; shard_batch slices out the addressable rows.
        sharded = shard_batch(batch, mesh, full_local=True)
    else:
        raise ValueError(mode)

    losses = []
    state = built["fresh_state"]()
    rng = jax.random.PRNGKey(7)
    for _ in range(2):
        state, metrics = built["step"](state, sharded, rng)
        losses.append(float(metrics["loss"]))
    return losses
