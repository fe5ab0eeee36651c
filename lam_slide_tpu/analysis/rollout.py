"""Autoregressive trajectory rollout sampling.

JAX port of ``SIAtom14SamplingWrapper`` (src/modules/sampling.py:16-100):
build a T-frame batch from one conditioning frame (frame broadcast over
time, first frame visible via cond_idx=(0,1)), sample the latent ODE,
decode, feed the final frame back as the next conditioning frame, repeat.
The per-rollout sample is one jitted program; the outer chain is a Python
loop (num_rollouts ~ 10) whose state is a single [R, 14, 3] frame.
"""

from typing import Dict, Optional

import jax
import numpy as np
from jax import numpy as jnp


class RolloutSampler:
    def __init__(
        self,
        second_stage,
        params,
        fs_variables,
        scale: float = 1.0,
        shift: float = 0.0,
        sampling_method: str = "ODE",
        sampling_kwargs: Optional[dict] = None,
    ):
        self.ss = second_stage
        self.params = params
        self.fs_variables = fs_variables
        self.scale = scale
        self.shift = shift
        self._sample = jax.jit(
            second_stage.make_sample_fn(
                sampling_method=sampling_method, sampling_kwargs=sampling_kwargs
            )
        )

    def create_batch(self, pos: jnp.ndarray, res: jnp.ndarray, res_mask: jnp.ndarray):
        """Conditioning frame(s) -> T-frame batch (sampling.py:24-42).

        Accepts one frame ([R, 14, 3]) or a stack of B frames
        ([B, R, 14, 3]) — the batched form drives every test peptide
        through one device program instead of the reference's serial
        per-peptide loop (eval_peptide.py:352-367).
        """
        if pos.ndim == 3:
            pos, res, res_mask = pos[None], res[None], res_mask[None]
        b, r = res.shape
        t = self.ss.num_timesteps
        pos = pos * res_mask[..., None]
        return {
            "atom14_pos": jnp.broadcast_to(pos[:, None], (b, t, r, 14, 3)),
            "aatype": jnp.broadcast_to(res[:, None], (b, t, r)),
            "attention_mask": jnp.ones((b, t, r), bool),
            "entities": jnp.broadcast_to(jnp.arange(r)[None, None], (b, t, r)),
        }

    def sample_rollout(
        self,
        rng: jax.Array,
        cond_pos: jnp.ndarray,
        res: jnp.ndarray,
        res_mask: jnp.ndarray,
        num_rollouts: int = 1,
    ) -> np.ndarray:
        """Chained rollouts (sampling.py:44-63) -> [num_rollouts*T, R, 14, 3]."""
        cond_pos = (cond_pos - self.shift) / self.scale
        pos = cond_pos
        chunks = []
        for i in range(num_rollouts):
            batch = self.create_batch(pos, res, res_mask)
            rng, key = jax.random.split(rng)
            out = self._sample(self.params, self.fs_variables, batch, key)
            pred = out["atom14_pos"].reshape(self.ss.num_timesteps, res.shape[0], 14, 3)
            chunks.append(np.asarray(pred))
            pos = pred[-1]
        positions = np.concatenate(chunks)
        positions[0] = np.asarray(cond_pos)  # sampling.py:62 exact-cond first frame
        positions = positions * np.asarray(res_mask)[None, :, :, None]
        return positions * self.scale + self.shift

    def sample_rollout_batched(
        self,
        rng: jax.Array,
        cond_pos: jnp.ndarray,
        res: jnp.ndarray,
        res_mask: jnp.ndarray,
        num_rollouts: int = 1,
    ) -> np.ndarray:
        """Batched chained rollouts: [B, R, 14, 3] conditioning frames ->
        [B, num_rollouts*T, R, 14, 3].

        Same chain semantics as ``sample_rollout`` but all B peptides ride
        one device program per rollout — the TPU-native replacement for the
        reference's serial per-peptide sampling loop. One rng key is drawn
        per rollout window for the whole batch (the same chain the serial
        path walks, so B=1 reproduces ``sample_rollout`` exactly); a
        peptide's noise slice therefore depends on which peptides share
        its batch. The eval protocol is statistical (JSD over sampled
        ensembles), so batch composition changes the draw, not the
        distribution.
        """
        cond_pos = (cond_pos - self.shift) / self.scale
        b = res.shape[0]
        pos = cond_pos
        chunks = []
        for _ in range(num_rollouts):
            batch = self.create_batch(pos, res, res_mask)
            rng, key = jax.random.split(rng)
            out = self._sample(self.params, self.fs_variables, batch, key)
            pred = out["atom14_pos"].reshape(
                b, self.ss.num_timesteps, res.shape[1], 14, 3)
            chunks.append(np.asarray(pred))
            pos = pred[:, -1]
        positions = np.concatenate(chunks, axis=1)
        positions[:, 0] = np.asarray(cond_pos)
        positions = positions * np.asarray(res_mask)[:, None, :, :, None]
        return positions * self.scale + self.shift
