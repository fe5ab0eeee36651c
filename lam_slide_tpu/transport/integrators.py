"""jit-compiled ODE/SDE integrators.

Replaces torchdiffeq + Python step loops (reference
src/modules/transport/integrators.py) with XLA-native control flow:

* fixed-grid Euler/Heun ODE and Euler–Maruyama/Heun SDE as ``lax.scan`` —
  the sampler the training-time validation actually uses
  (``sampling_kwargs: {sampling_method: euler, num_steps: 10}``);
* adaptive Dormand–Prince 5(4) as a bounded ``lax.while_loop`` with a PI-free
  step controller and FSAL reuse — eval parity with the reference's
  ``dopri5 (atol 1e-6, rtol 1e-3)`` protocol (configs/eval_peptide.yaml:23).

``drift_fn(x, t_vec)`` takes a [B] time vector like the reference model
closures; model params/kwargs are closed over by the caller so every
integrator jits into a single XLA program with the model inlined.
"""

from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax import lax


def _tvec(x: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    return jnp.full((x.shape[0],), t, dtype=jnp.result_type(jnp.float32, t))


def ode_fixed(
    drift_fn: Callable,
    x0: jnp.ndarray,
    t0: float,
    t1: float,
    num_steps: int,
    method: str = "euler",
) -> jnp.ndarray:
    """Fixed-grid ODE solve over linspace(t0, t1, num_steps) (num_steps-1 steps)."""
    ts = jnp.linspace(t0, t1, num_steps)
    dts = ts[1:] - ts[:-1]

    def euler_step(x, t_dt):
        t, dt = t_dt
        return x + dt * drift_fn(x, _tvec(x, t)), None

    def heun_step(x, t_dt):
        t, dt = t_dt
        k1 = drift_fn(x, _tvec(x, t))
        k2 = drift_fn(x + dt * k1, _tvec(x, t + dt))
        return x + 0.5 * dt * (k1 + k2), None

    step = {"euler": euler_step, "heun": heun_step}[method]
    x, _ = lax.scan(step, x0, (ts[:-1], dts))
    return x


def sde_fixed(
    rng: jax.Array,
    drift_fn: Callable,
    diffusion_fn: Callable,
    x0: jnp.ndarray,
    t0: float,
    t1: float,
    num_steps: int,
    method: str = "euler",
) -> jnp.ndarray:
    """Fixed-grid SDE solve (reference integrators.py:7-78).

    Euler–Maruyama: x += drift dt + sqrt(2 D) dW. Heun: noise-first predictor/
    corrector. Returns the state after the num_steps-1 grid steps; the last
    deterministic step (Mean/Tweedie/Euler) is applied by the Sampler.
    """
    ts = jnp.linspace(t0, t1, num_steps)
    dt = ts[1] - ts[0]
    sqrt_dt = jnp.sqrt(dt)

    def em_step(x, inp):
        t, key = inp
        w = jax.random.normal(key, x.shape, dtype=x.dtype)
        tv = _tvec(x, t)
        drift = drift_fn(x, tv)
        diffusion = diffusion_fn(x, tv)
        mean_x = x + drift * dt
        return mean_x + jnp.sqrt(2.0 * diffusion) * (w * sqrt_dt), None

    def heun_step(x, inp):
        t, key = inp
        w = jax.random.normal(key, x.shape, dtype=x.dtype)
        tv = _tvec(x, t)
        diffusion = diffusion_fn(x, tv)
        xhat = x + jnp.sqrt(2.0 * diffusion) * (w * sqrt_dt)
        k1 = drift_fn(xhat, tv)
        xp = xhat + dt * k1
        k2 = drift_fn(xp, _tvec(x, t + dt))
        return xhat + 0.5 * dt * (k1 + k2), None

    step = {"euler": em_step, "heun": heun_step}[method]
    keys = jax.random.split(rng, num_steps - 1)
    x, _ = lax.scan(step, x0, (ts[:-1], keys))
    return x


# Dormand–Prince 5(4) Butcher tableau. A is stored as a dense square
# lower-triangular [7, 7] matrix so the stage loop can run as a lax.scan
# over rows (stage i contracts row i against the stacked k's; the zero
# entries above the diagonal multiply the not-yet-computed k slots).
_DP_C = jnp.array([0.0, 1 / 5, 3 / 10, 4 / 5, 8 / 9, 1.0, 1.0])
_DP_A_ROWS = [
    [],
    [1 / 5],
    [3 / 40, 9 / 40],
    [44 / 45, -56 / 15, 32 / 9],
    [19372 / 6561, -25360 / 2187, 64448 / 6561, -212 / 729],
    [9017 / 3168, -355 / 33, 46732 / 5247, 49 / 176, -5103 / 18656],
    [35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84],
]
_DP_A = jnp.array([row + [0.0] * (7 - len(row)) for row in _DP_A_ROWS])
_DP_B5 = jnp.array([35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84, 0.0])
_DP_B4 = jnp.array(
    [5179 / 57600, 0.0, 7571 / 16695, 393 / 640, -92097 / 339200, 187 / 2100, 1 / 40]
)


def ode_dopri5(
    drift_fn: Callable,
    x0: jnp.ndarray,
    t0: float,
    t1: float,
    rtol: float = 1e-3,
    atol: float = 1e-6,
    max_steps: int = 1000,
    safety: float = 0.9,
    min_factor: float = 0.2,
    max_factor: float = 10.0,
    return_stats: bool = False,
) -> jnp.ndarray:
    """Adaptive RK45 with FSAL under a bounded while_loop (jit-safe).

    Data-dependent step counts are expressed as a while_loop with a hard
    ``max_steps`` cap (SURVEY §7 hard part #1); the error norm is the usual
    RMS of err / (atol + rtol * max(|y|, |y_new|)).

    The 6 non-FSAL stage evaluations run as a ``lax.scan`` over tableau
    rows, so ``drift_fn`` is traced ONCE into the while body instead of
    six times — that keeps the compile small enough to use the UNROLLED
    DiT layout (the 6x-inlined form at depth 7 compiled 23+ min and
    wedged the TPU tunnel; see docs/PERF.md), which is the layout the
    Euler headline measures.

    ``return_stats=True`` → ``(x, (n_iters, n_accepted))``: attempted and
    accepted step counts; NFE = 1 + 6 * n_iters by FSAL. Static python
    flag, jit-safe.
    """
    t0 = jnp.asarray(t0, jnp.float32)
    t1 = jnp.asarray(t1, jnp.float32)
    f0 = drift_fn(x0, _tvec(x0, t0))
    dt0 = (t1 - t0) * 0.02

    def err_norm(err, y0, y1):
        scale = atol + rtol * jnp.maximum(jnp.abs(y0), jnp.abs(y1))
        r = (err / scale).astype(jnp.float32)
        return jnp.sqrt(jnp.mean(jnp.square(r)))

    def cond(state):
        x, t, dt, k1, n, n_acc = state
        return jnp.logical_and(t < t1 - 1e-9, n < max_steps)

    def body(state):
        x, t, dt, k1, n, n_acc = state
        dt = jnp.minimum(dt, t1 - t)
        ks0 = jnp.zeros((7,) + x.shape, x.dtype).at[0].set(k1)

        def stage(ks, row):
            a_row, c = row
            xi = x + dt * jnp.tensordot(a_row, ks, axes=1)
            return None, drift_fn(xi, _tvec(x, t + dt * c))

        # rows 1..6; each contracts the full [7, ...] stack (zeros sit in
        # the not-yet-filled slots) — O(x) extra elementwise traffic per
        # stage, paid to keep the model traced once
        def scan_body(carry, row):
            ks, i = carry
            _, ki = stage(ks, row)
            return (ks.at[i].set(ki), i + 1), None

        (ks, _), _ = lax.scan(scan_body, (ks0, jnp.int32(1)),
                              (_DP_A[1:], _DP_C[1:]))
        x5 = x + dt * jnp.tensordot(_DP_B5, ks, axes=1)
        err = dt * jnp.tensordot(_DP_B5 - _DP_B4, ks, axes=1)
        ratio = err_norm(err, x, x5)
        accept = ratio <= 1.0
        factor = jnp.clip(
            safety * jnp.power(jnp.maximum(ratio, 1e-10), -0.2), min_factor, max_factor
        )
        new_dt = dt * factor
        x_next = jnp.where(accept, x5, x)
        t_next = jnp.where(accept, t + dt, t)
        k1_next = jnp.where(accept, ks[6], k1)  # FSAL: k7 = f(t+dt, x5)
        return (x_next, t_next, new_dt, k1_next, n + 1,
                n_acc + accept.astype(jnp.int32))

    x, t, dt, _, n, n_acc = lax.while_loop(
        cond, body, (x0, t0, dt0, f0, jnp.int32(0), jnp.int32(0)))
    if return_stats:
        return x, (n, n_acc)
    return x


def hutchinson_logp_drift(drift_fn: Callable, x: jnp.ndarray, t: jnp.ndarray, eps: jnp.ndarray):
    """(-drift, eps^T (∂drift/∂x) eps) for likelihood ODEs (transport.py:432-443)."""
    drift, vjp_fn = jax.vjp(lambda y: drift_fn(y, t), x)
    (g,) = vjp_fn(eps)
    logp_grad = jnp.sum(
        (g * eps).reshape(x.shape[0], -1),
        axis=1,
    )
    return -drift, logp_grad
