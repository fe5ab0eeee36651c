"""Domain test protocols — the reference test_step/test_epoch_end loops.

Each runner drives the jitted K-sampling over a test loader and reduces to
the paper metrics. Pass ``mesh`` to shard evaluation over the data axis of
a device mesh (batches land pre-sharded in HBM, parameters replicate, XLA
partitions the sampling program — same metrics, Nx chips; the multi-chip
analogue of the reference's single-device fp32 test pass, src/train.py:100-112):

* MD17 (second_stage/md17.py:139-179): zero target frames, K=5 repeats,
  mean ADE/FDE x dataset scale, per molecule.
* Pedestrian (second_stage/pedestrian.py:148-239): per-entity trajectories,
  min over num_runs=20 of K=20 samples, optional k-means FPC; x scale.
* NBA (second_stage/nba.py): same with K=60, min over first 20 + FPC.
"""

from typing import Dict, Optional

import jax
import numpy as np
from jax import numpy as jnp

from lam_slide_tpu.composites.evaluation import (
    mean_over_k_ade_fde,
    per_entity_min_k_ade_fde,
    zero_target_frames,
)


def _replicate_if_mesh(params, fs_variables, mesh):
    if mesh is None:
        # Single-device protocol after a mesh-trained fit: the state's
        # params arrive committed across the training mesh's devices while
        # fs_variables may sit on one device (or vice versa after a
        # checkpoint load) — mixing commitments in one jit is an error.
        # Pull both to host and let jit place them.
        to_host = lambda t: jax.tree.map(np.asarray, t)
        return to_host(params), to_host(fs_variables)
    from lam_slide_tpu.parallel.mesh import replicated

    rep = replicated(mesh)
    put = lambda t: jax.tree.map(lambda x: jax.device_put(x, rep), t)
    return put(params), put(fs_variables)


def _shard_or_device(batch, mesh, loader=None):
    if mesh is None:
        return jax.tree.map(jnp.asarray, batch)
    from lam_slide_tpu.parallel.mesh import shard_batch

    n_data = mesh.shape.get("data", 1)
    b = len(next(iter(batch.values())))
    if b % n_data:  # remainder batch (drop_last=False loaders): run replicated
        return jax.tree.map(jnp.asarray, batch)
    # Multihost: full_batch_feed loaders hand every process the FULL global
    # batch, so shard_batch must slice this process's rows out rather than
    # treating the whole batch as process-local (same contract as
    # trainer._put — without it the assembled global batch would contain
    # every sample process_count times).
    full = bool(getattr(loader, "full_batch_feed", False))
    return shard_batch(batch, mesh, full_local=full)


def evaluate_md17(
    ss,
    params,
    fs_variables,
    loaders: Dict[str, object],
    scale: float,
    k: int = 5,
    rng: Optional[jax.Array] = None,
    sampling_kwargs: Optional[dict] = None,
    mesh=None,
    k_chunk: Optional[int] = None,
) -> Dict[str, float]:
    """-> {"test/<molecule>/ade": ..., "test/<molecule>/fde": ...}."""
    rng = jax.random.PRNGKey(0) if rng is None else rng
    params, fs_variables = _replicate_if_mesh(params, fs_variables, mesh)
    cond_end = ss.cond_idx[1]
    sample_k = jax.jit(
        ss.make_k_sample_fn(k=k, k_chunk=k_chunk, sampling_method="ODE",
                            sampling_kwargs=sampling_kwargs or
                            {"sampling_method": "euler", "num_steps": 10})
    )
    out = {}
    for name, loader in loaders.items():
        ades, fdes = [], []
        for batch in loader:
            batch = _shard_or_device(batch, mesh, loader)
            true_pos = batch["pos"][:, cond_end:]
            mask = batch["attention_mask"][:, cond_end:]
            batch = zero_target_frames(batch, cond_end)
            rng, key = jax.random.split(rng)
            preds = sample_k(params, fs_variables, batch, key)
            ade, fde = mean_over_k_ade_fde(preds["pos"][:, :, cond_end:], true_pos, mask)
            ades.append(np.asarray(ade))
            fdes.append(np.asarray(fde))
        out[f"test/{name}/ade"] = float(np.concatenate(ades).mean() * scale)
        out[f"test/{name}/fde"] = float(np.concatenate(fdes).mean() * scale)
    return out


def evaluate_min_k(
    ss,
    params,
    fs_variables,
    loaders: Dict[str, object],
    scale: float = 1.0,
    k: int = 20,
    num_runs: int = 20,
    post_process: bool = False,
    rng: Optional[jax.Array] = None,
    sampling_kwargs: Optional[dict] = None,
    pos_key: str = "pos",
    mesh=None,
    k_chunk: Optional[int] = None,
) -> Dict[str, float]:
    """Pedestrian/NBA protocol -> test/<scene>/{ade,fde}[,_post]."""
    if k < num_runs:
        raise ValueError("K must be >= num_runs (second_stage/pedestrian.py:44-47)")
    rng = jax.random.PRNGKey(0) if rng is None else rng
    params, fs_variables = _replicate_if_mesh(params, fs_variables, mesh)
    cond_end = ss.cond_idx[1]
    sample_k = jax.jit(
        ss.make_k_sample_fn(k=k, k_chunk=k_chunk, sampling_method="ODE",
                            sampling_kwargs=sampling_kwargs or
                            {"sampling_method": "euler", "num_steps": 10})
    )
    metric = jax.jit(lambda p, t, m: per_entity_min_k_ade_fde(
        p, t, m, num_runs=num_runs, fpc=False))
    metric_fpc = jax.jit(lambda p, t, m: per_entity_min_k_ade_fde(
        p, t, m, num_runs=num_runs, fpc=True))

    out = {}
    for name, loader in loaders.items():
        accum = {"ade": [], "fde": [], "ade_post": [], "fde_post": []}
        for batch in loader:
            batch = _shard_or_device(batch, mesh, loader)
            true_pos = batch[pos_key][:, cond_end:]
            emask = batch["attention_mask"][:, 0]
            batch = zero_target_frames(batch, cond_end, keys=(pos_key,))
            rng, key = jax.random.split(rng)
            preds = sample_k(params, fs_variables, batch, key)
            pred_k = preds[pos_key][:, :, cond_end:]
            ade, fde = metric(pred_k, true_pos, emask)  # min over first num_runs
            accum["ade"].append(float(ade))
            accum["fde"].append(float(fde))
            if post_process:
                ade_p, fde_p = metric_fpc(pred_k, true_pos, emask)
                accum["ade_post"].append(float(ade_p))
                accum["fde_post"].append(float(fde_p))
        out[f"test/{name}/ade"] = float(np.mean(accum["ade"]) * scale)
        out[f"test/{name}/fde"] = float(np.mean(accum["fde"]) * scale)
        if post_process:
            out[f"test/{name}/ade_post"] = float(np.mean(accum["ade_post"]) * scale)
            out[f"test/{name}/fde_post"] = float(np.mean(accum["fde_post"]) * scale)
    return out


class _LimitLoader:
    """First-n-batches view of a loader (reference limit_val_batches)."""

    def __init__(self, loader, n):
        self.loader, self.n = loader, n

    def __iter__(self):
        for i, batch in enumerate(self.loader):
            if i >= self.n:
                break
            yield batch


def make_protocol_val_hook(
    ss,
    loaders: Dict[str, object],
    domain: str,
    scale: float = 1.0,
    k: int = 5,
    num_runs: Optional[int] = None,
    limit_batches: int = 1,
    interval: int = 1,
    sampling_kwargs: Optional[dict] = None,
):
    """Trainer eval_fn: sampled val ADE/FDE each ``interval`` val epochs —
    the reference's stage-2 validation_step behavior (second_stage/md17.py:
    75-113, pedestrian.py:148-190), run on EMA weights over
    ``limit_batches`` batches per loader with the euler/10 val sampler.
    """
    counter = {"n": 0}
    limited = {name: _LimitLoader(l, limit_batches) for name, l in loaders.items()}

    def hook(state, epoch):
        counter["n"] += 1
        if (counter["n"] - 1) % interval != 0:
            return None
        params = state.ema_params if state.ema_params is not None else state.params
        fs_vars = state.constants["first_stage"]
        rng = jax.random.PRNGKey(1234 + epoch)
        if domain == "md17":
            out = evaluate_md17(ss, params, fs_vars, limited, scale=scale, k=k,
                                rng=rng, sampling_kwargs=sampling_kwargs)
        else:
            out = evaluate_min_k(ss, params, fs_vars, limited, scale=scale, k=k,
                                 num_runs=num_runs or k, rng=rng,
                                 sampling_kwargs=sampling_kwargs)
        ades = [v for kk, v in out.items() if kk.endswith("/ade")]
        fdes = [v for kk, v in out.items() if kk.endswith("/fde")]
        return {"ade": float(np.mean(ades)), "fde": float(np.mean(fdes))}

    return hook
