"""Headline benchmark: 4AA latent-ODE sampler throughput on one TPU chip.

Measures the reference's north-star quantity (BASELINE.json): latent-ODE
sampler steps/sec/chip for the full-size 4AA peptide stage-2 denoiser
(depth 7, hidden 384, T=1000 frames, L=2 latent tokens, in_dim 96 —
configs/model/peptide/second-stage.yaml) integrating the probability-flow
ODE with the training-time Euler sampler. One "step" = one DiT drift
evaluation for one trajectory (batch x num_steps per solve).

The reference publishes no A100 number ("published": {}), so vs_baseline is
reported against an analytic A100 anchor: this architecture is small-op
dominated (L=2 spatial axis, hidden 384 — tiny matmuls between layout
ops), a regime where compiled torch on A100 sustains ~5% MFU; the anchor is
sustained FLOP/s divided by FLOPs per trajectory-step:
    anchor = 312 TFLOP/s x 5% / (linear-matmul FLOPs per traj drift eval),
i.e. ~236 traj-ODE-steps/s regardless of batch (batching is already what
lets the GPU sustain that MFU; an earlier revision multiplied by batch,
which modeled an A100 at 40% MFU on a latency-bound model — corrected).
The anchor is generous to the baseline: it prices only the linear matmuls,
ignoring the O(T^2) attention FLOPs and all layout/softmax work.
vs_baseline = measured / anchor, >1 means faster than a well-compiled
A100 reference run.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import jax
import jax.numpy as jnp

from lam_slide_tpu.models import LatentDiT
from lam_slide_tpu.transport import Sampler, create_transport

B, T, L, DIN = 8, 1000, 2, 96
NUM_STEPS = 10


def main():
    model = LatentDiT(depth=7, in_dim=DIN, hidden_size=384, num_heads=16, mlp_ratio=2,
                      n_timesteps=T, dtype=jnp.bfloat16)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (B, T, L, DIN))
    x_cond = jnp.zeros_like(x)
    mask = jnp.zeros((B, T, L), jnp.int32).at[:, :1].set(1)
    variables = jax.jit(
        lambda: model.init(key, x, jnp.zeros((B,)), x_cond, mask)
    )()

    transport = create_transport(path_type="GVP", prediction="data")
    sample_fn = Sampler(transport).sample_ode(sampling_method="euler", num_steps=NUM_STEPS)

    def model_fn(xt, t, **kw):
        return model.apply(variables, xt, t, **kw)

    import functools

    @functools.partial(jax.jit, static_argnames="n_solves")
    def run(noise, n_solves):
        # Chain solves in-graph (each feeding perturbed noise to the next)
        # and reduce to one scalar: the float() below forces a host readback
        # — the only reliable sync over a tunneled TPU — and chaining
        # amortizes the tunnel round-trip out of the measurement.
        def body(c, _):
            out = sample_fn(None, c, model_fn, x_cond=x_cond, x_cond_mask=mask)
            return c + 1e-6 * out, jnp.sum(out)
        _, sums = jax.lax.scan(body, noise, None, length=n_solves)
        return jnp.sum(sums)

    noise = jax.random.normal(key, x.shape)
    for n in (1, 4):
        float(run(noise, n))  # compile + warm both lengths

    def best_time(n, reps=3):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(run(noise, n))
            best = min(best, time.perf_counter() - t0)
        return best

    dt = (best_time(4) - best_time(1)) / 3  # per-solve device time

    steps_per_sec = B * NUM_STEPS / dt  # trajectory-level ODE steps per second
    # analytic A100 estimate (see module docstring)
    flops_per_eval = 2 * 7 * (  # 7 layers, 2 blocks each (spatial+temporal)
        2 * (T * L) * (3 * 384 + 768) * 384 + 2 * (T * L) * 384 * (384 + 768)
    )  # linear1 + linear2 matmul FLOPs per trajectory; attention excluded
    a100_estimate = 312e12 * 0.05 / flops_per_eval  # traj-steps/s, batch-invariant
    vs = steps_per_sec / a100_estimate
    print(json.dumps({
        "metric": "4aa_latent_ode_sampler_steps_per_sec_per_chip",
        "value": round(steps_per_sec, 2),
        "unit": "traj_ode_steps/s",
        "vs_baseline": round(vs, 3),
    }))


if __name__ == "__main__":
    main()
