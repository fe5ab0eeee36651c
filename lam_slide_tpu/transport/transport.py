"""Stochastic-interpolant transport: training objective + samplers.

JAX port of the SiT framework as extended by the reference
(src/modules/transport/transport.py): four model parametrizations
(NOISE/SCORE/VELOCITY/DATA — DATA is the reference's addition and the one
all experiments use), three loss weightings, ODE/SDE samplers and a
Hutchinson likelihood sampler. Everything is functional: models enter as
``model_fn(x, t, **kwargs)`` closures and RNG is explicit, so a whole
sample loop jits into one XLA program.
"""

import enum
import math
from dataclasses import dataclass, field
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp

from lam_slide_tpu.nn.losses import mean_flat
from lam_slide_tpu.transport import integrators
from lam_slide_tpu.transport.path import GVPCPlan, ICPlan, VPCPlan, expand_t


class ModelType(enum.Enum):
    NOISE = enum.auto()
    SCORE = enum.auto()
    VELOCITY = enum.auto()
    DATA = enum.auto()


class PathType(enum.Enum):
    LINEAR = enum.auto()
    GVP = enum.auto()
    VP = enum.auto()


class WeightType(enum.Enum):
    NONE = enum.auto()
    VELOCITY = enum.auto()
    LIKELIHOOD = enum.auto()


_PATHS = {
    PathType.LINEAR: ICPlan,
    PathType.GVP: GVPCPlan,
    PathType.VP: VPCPlan,
}


@dataclass(frozen=True)
class Transport:
    """Interpolant training/sampling state (transport.py:39-226)."""

    model_type: ModelType
    path_type: PathType
    loss_type: WeightType
    train_eps: float
    sample_eps: float

    @property
    def path_sampler(self):
        return _PATHS[self.path_type]()

    def prior_logp(self, z: jnp.ndarray) -> jnp.ndarray:
        """Standard-normal prior log density per batch element (transport.py:62-67)."""
        n = z[0].size
        flat = z.reshape(z.shape[0], -1)
        return -n / 2.0 * math.log(2 * math.pi) - jnp.sum(flat**2, axis=1) / 2.0

    def check_interval(
        self,
        train_eps: float,
        sample_eps: float,
        *,
        diffusion_form: str = "SBDM",
        sde: bool = False,
        reverse: bool = False,
        eval: bool = False,
        last_step_size: float = 0.0,
    ):
        """Integration interval [t0, t1] avoiding endpoint singularities (transport.py:69-101)."""
        t0, t1 = 0.0, 1.0
        eps = train_eps if not eval else sample_eps
        if self.path_type == PathType.VP:
            t1 = 1.0 - eps if (not sde or last_step_size == 0) else 1.0 - last_step_size
        elif self.path_type in (PathType.LINEAR, PathType.GVP) and (
            self.model_type != ModelType.VELOCITY or sde
        ):
            t0 = (
                eps
                if (diffusion_form == "SBDM" and sde) or self.model_type != ModelType.VELOCITY
                else 0.0
            )
            t1 = 1.0 - eps if (not sde or last_step_size == 0) else 1.0 - last_step_size
        if reverse:
            t0, t1 = 1.0 - t0, 1.0 - t1
        return t0, t1

    def sample(self, rng: jax.Array, x1: jnp.ndarray):
        """Draw x0 ~ N(0, I) and t ~ U(t0, t1) (transport.py:103-114)."""
        k_noise, k_t = jax.random.split(rng)
        x0 = jax.random.normal(k_noise, x1.shape, dtype=x1.dtype)
        t0, t1 = self.check_interval(self.train_eps, self.sample_eps)
        t = jax.random.uniform(k_t, (x1.shape[0],), dtype=jnp.float32) * (t1 - t0) + t0
        return t, x0, x1

    def training_losses(
        self,
        rng: jax.Array,
        model_fn: Callable,
        x1: jnp.ndarray,
        model_kwargs: Optional[Dict[str, Any]] = None,
    ) -> Dict[str, jnp.ndarray]:
        """Interpolant loss (transport.py:116-156). Returns {'loss': [B], 'pred': ...}."""
        model_kwargs = model_kwargs or {}
        t, x0, x1 = self.sample(rng, x1)
        t, xt, ut = self.path_sampler.plan(t, x0, x1)
        model_output = model_fn(xt, t, **model_kwargs)
        assert model_output.shape == xt.shape

        terms: Dict[str, jnp.ndarray] = {"pred": model_output}
        if self.model_type == ModelType.VELOCITY:
            terms["loss"] = mean_flat((model_output - ut) ** 2)
        elif self.model_type == ModelType.DATA:
            terms["loss"] = mean_flat((model_output - x1) ** 2)
        else:
            _, drift_var = self.path_sampler.compute_drift(xt, t)
            sigma_t, _ = self.path_sampler.compute_sigma_t(expand_t(t, xt))
            if self.loss_type == WeightType.VELOCITY:
                weight = (drift_var / sigma_t) ** 2
            elif self.loss_type == WeightType.LIKELIHOOD:
                weight = drift_var / (sigma_t**2)
            elif self.loss_type == WeightType.NONE:
                weight = 1.0
            else:
                raise NotImplementedError()
            if self.model_type == ModelType.NOISE:
                terms["loss"] = mean_flat(weight * (model_output - x0) ** 2)
            else:
                terms["loss"] = mean_flat(weight * (model_output * sigma_t + x0) ** 2)
        return terms

    def get_drift(self) -> Callable:
        """Probability-flow ODE drift (transport.py:158-202)."""
        path = self.path_sampler

        def score_ode(x, t, model_fn, **kw):
            drift_mean, drift_var = path.compute_drift(x, t)
            return -drift_mean + drift_var * model_fn(x, t, **kw)

        def noise_ode(x, t, model_fn, **kw):
            drift_mean, drift_var = path.compute_drift(x, t)
            sigma_t, _ = path.compute_sigma_t(expand_t(t, x))
            score = model_fn(x, t, **kw) / -sigma_t
            return -drift_mean + drift_var * score

        def velocity_ode(x, t, model_fn, **kw):
            return model_fn(x, t, **kw)

        def data_ode(x, t, model_fn, **kw):
            # The reference's DATA extension (transport.py:177-184).
            drift_mean, drift_var = path.compute_drift(x, t)
            sigma_t, _ = path.compute_sigma_t(expand_t(t, x))
            alpha_t, _ = path.compute_alpha_t(expand_t(t, x))
            score = -(1.0 / sigma_t**2) * (x - alpha_t * model_fn(x, t, **kw))
            return -drift_mean + drift_var * score

        return {
            ModelType.NOISE: noise_ode,
            ModelType.SCORE: score_ode,
            ModelType.VELOCITY: velocity_ode,
            ModelType.DATA: data_ode,
        }[self.model_type]

    def get_score(self) -> Callable:
        """Score of x_t = alpha_t x1 + sigma_t x0 from the model head (transport.py:204-226)."""
        path = self.path_sampler
        if self.model_type == ModelType.NOISE:
            return lambda x, t, m, **kw: m(x, t, **kw) / -path.compute_sigma_t(expand_t(t, x))[0]
        if self.model_type == ModelType.SCORE:
            return lambda x, t, m, **kw: m(x, t, **kw)
        if self.model_type == ModelType.VELOCITY:
            return lambda x, t, m, **kw: path.get_score_from_velocity(m(x, t, **kw), x, t)
        if self.model_type == ModelType.DATA:
            return lambda x, t, m, **kw: path.get_score_from_data(m(x, t, **kw), x, t)
        raise NotImplementedError()


class Sampler:
    """Sampler factory over a Transport (transport.py:229-503)."""

    def __init__(self, transport: Transport):
        self.transport = transport
        self.drift = transport.get_drift()
        self.score = transport.get_score()

    def _sde_drift_diffusion(self, diffusion_form: str, diffusion_norm: float):
        path = self.transport.path_sampler

        def diffusion_fn(x, t):
            return path.compute_diffusion(x, t, form=diffusion_form, norm=diffusion_norm)

        def sde_drift(x, t, model_fn, **kw):
            return self.drift(x, t, model_fn, **kw) + diffusion_fn(x, t) * self.score(
                x, t, model_fn, **kw
            )

        return sde_drift, diffusion_fn

    def _last_step_fn(self, sde_drift, last_step: Optional[str], last_step_size: float):
        path = self.transport.path_sampler
        if last_step is None:
            return lambda x, t, m, **kw: x
        if last_step == "Mean":
            return lambda x, t, m, **kw: x + sde_drift(x, t, m, **kw) * last_step_size
        if last_step == "Tweedie":

            def tweedie(x, t, m, **kw):
                alpha = path.compute_alpha_t(t)[0][0]
                sigma = path.compute_sigma_t(t)[0][0]
                return x / alpha + (sigma**2) / alpha * self.score(x, t, m, **kw)

            return tweedie
        if last_step == "Euler":
            return lambda x, t, m, **kw: x + self.drift(x, t, m, **kw) * last_step_size
        raise NotImplementedError(last_step)

    def sample_sde(
        self,
        *,
        sampling_method: str = "Euler",
        diffusion_form: str = "SBDM",
        diffusion_norm: float = 1.0,
        last_step: Optional[str] = "Mean",
        last_step_size: float = 0.04,
        num_steps: int = 250,
    ) -> Callable:
        """SDE sample fn: (rng, init, model_fn, **kwargs) -> final x (transport.py:301-363)."""
        if last_step is None:
            last_step_size = 0.0
        sde_drift, sde_diffusion = self._sde_drift_diffusion(diffusion_form, diffusion_norm)
        t0, t1 = self.transport.check_interval(
            self.transport.train_eps,
            self.transport.sample_eps,
            diffusion_form=diffusion_form,
            sde=True,
            eval=True,
            reverse=False,
            last_step_size=last_step_size,
        )
        last_step_fn = self._last_step_fn(sde_drift, last_step, last_step_size)

        def _sample(rng, init, model_fn, **kw):
            x = integrators.sde_fixed(
                rng,
                lambda x, t: sde_drift(x, t, model_fn, **kw),
                lambda x, t: sde_diffusion(x, t),
                init,
                t0,
                t1,
                num_steps,
                method=sampling_method.lower(),
            )
            ts = jnp.full((init.shape[0],), t1, dtype=jnp.float32)
            return last_step_fn(x, ts, model_fn, **kw)

        return _sample

    def sample_ode(
        self,
        *,
        sampling_method: str = "dopri5",
        num_steps: int = 50,
        atol: float = 1e-6,
        rtol: float = 1e-3,
        reverse: bool = False,
        return_stats: bool = False,
    ) -> Callable:
        """ODE sample fn: (rng, init, model_fn, **kwargs) -> final x (transport.py:365-411).

        rng is accepted for API uniformity and ignored (the flow is
        deterministic given the init noise). ``return_stats=True`` (dopri5
        only) → ``(x, (n_iters, n_accepted))`` with the adaptive solver's
        attempted/accepted step counts (NFE = 1 + 6 * n_iters), for
        protocol benchmarking.
        """
        if reverse:
            drift = lambda x, t, m, **kw: self.drift(x, jnp.ones_like(t) * (1 - t), m, **kw)
        else:
            drift = self.drift
        t0, t1 = self.transport.check_interval(
            self.transport.train_eps,
            self.transport.sample_eps,
            sde=False,
            eval=True,
            reverse=reverse,
            last_step_size=0.0,
        )

        def _sample(rng, init, model_fn, **kw):
            del rng
            f = lambda x, t: drift(x, t, model_fn, **kw)
            method = sampling_method.lower()
            if method in ("euler", "heun"):
                return integrators.ode_fixed(f, init, t0, t1, num_steps, method=method)
            if method == "dopri5":
                return integrators.ode_dopri5(f, init, t0, t1, rtol=rtol, atol=atol,
                                              return_stats=return_stats)
            raise NotImplementedError(sampling_method)

        return _sample

    def sample_ode_likelihood(
        self,
        *,
        sampling_method: str = "euler",
        num_steps: int = 50,
        atol: float = 1e-6,
        rtol: float = 1e-3,
    ) -> Callable:
        """Likelihood fn: (rng, x, model_fn, **kwargs) -> (logp, drift) (transport.py:413-473)."""
        t0, t1 = self.transport.check_interval(
            self.transport.train_eps,
            self.transport.sample_eps,
            sde=False,
            eval=True,
            reverse=False,
            last_step_size=0.0,
        )

        def _sample(rng, x, model_fn, **kw):
            eps = (
                jax.random.randint(rng, x.shape, 0, 2, dtype=jnp.int32).astype(x.dtype) * 2.0 - 1.0
            )

            def drift_fn(y, t):
                return self.drift(y, jnp.ones_like(t) * (1 - t), model_fn, **kw)

            def aug_drift(state, t):
                y, _ = state
                neg_drift, logp_grad = integrators.hutchinson_logp_drift(drift_fn, y, t, eps)
                return (neg_drift, logp_grad)

            # integrate the augmented system with fixed-grid euler/heun
            ts = jnp.linspace(t0, t1, num_steps)
            dts = ts[1:] - ts[:-1]

            def step(state, t_dt):
                t, dt = t_dt
                y, logp = state
                tv = jnp.full((y.shape[0],), t, dtype=jnp.float32)
                dy, dlogp = aug_drift((y, logp), tv)
                return (y + dt * dy, logp + dt * dlogp), None

            init = (x, jnp.zeros((x.shape[0],), dtype=jnp.float32))
            (drift_final, delta_logp), _ = jax.lax.scan(step, init, (ts[:-1], dts))
            prior_logp = self.transport.prior_logp(drift_final)
            return prior_logp - delta_logp, drift_final

        return _sample

    def get_sample_fn(
        self, sampling_method: str = "ODE", sampling_kwargs: Optional[Dict[str, Any]] = None
    ) -> Callable:
        """Dispatch with the reference's default kwargs (transport.py:475-503)."""
        sampling_kwargs = dict(sampling_kwargs or {})
        if sampling_method == "SDE":
            kw = {
                "sampling_method": "Euler",
                "diffusion_form": "linear",
                "diffusion_norm": 1.0,
                "last_step": "Mean",
                "last_step_size": 0.04,
                "num_steps": 250,
            }
            kw.update(sampling_kwargs)
            return self.sample_sde(**kw)
        if sampling_method == "ODE":
            kw = {
                "sampling_method": "dopri5",
                "num_steps": 50,
                "atol": 1e-6,
                "rtol": 1e-3,
                "reverse": False,
            }
            kw.update(sampling_kwargs)
            return self.sample_ode(**kw)
        raise NotImplementedError(sampling_method)


def create_transport(
    path_type: str = "Linear",
    prediction: str = "velocity",
    loss_weight: Optional[str] = None,
    train_eps: Optional[float] = None,
    sample_eps: Optional[float] = None,
) -> Transport:
    """String-config factory with eps defaults (transport/__init__.py:7-79)."""
    model_type = {
        "noise": ModelType.NOISE,
        "score": ModelType.SCORE,
        "data": ModelType.DATA,
    }.get(prediction, ModelType.VELOCITY)
    loss_type = {
        "velocity": WeightType.VELOCITY,
        "likelihood": WeightType.LIKELIHOOD,
    }.get(loss_weight, WeightType.NONE)
    ptype = {"Linear": PathType.LINEAR, "GVP": PathType.GVP, "VP": PathType.VP}[path_type]

    if ptype == PathType.VP:
        train_eps = 1e-5 if train_eps is None else train_eps
        sample_eps = 1e-3 if sample_eps is None else sample_eps
    elif ptype in (PathType.GVP, PathType.LINEAR) and model_type != ModelType.VELOCITY:
        train_eps = 1e-3 if train_eps is None else train_eps
        sample_eps = 1e-3 if sample_eps is None else sample_eps
    else:
        train_eps = 0.0
        sample_eps = 0.0

    return Transport(
        model_type=model_type,
        path_type=ptype,
        loss_type=loss_type,
        train_eps=train_eps,
        sample_eps=sample_eps,
    )
