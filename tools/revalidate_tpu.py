"""Re-drive the on-chip validation queue after a TPU tunnel outage.

Runs, in order, with one-line verdicts (see docs/STATUS.md):
1. trivial jit (tunnel health)
2. bench.py headline number
3. dopri5 sampler compile+run at reduced size with scan_layers (the fix for
   the pathological unrolled-RK45 compile) and, optionally, full size
4. one full-size 4AA stage-2 training step (flash backward path)

    PYTHONPATH=/root/repo:$PYTHONPATH python tools/revalidate_tpu.py [--full]
"""

import argparse
import os
import subprocess
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def step(name, fn):
    t0 = time.perf_counter()
    try:
        result = fn()
        print(f"[OK]   {name}: {result} ({time.perf_counter()-t0:.1f}s)", flush=True)
        return True
    except Exception as e:
        print(f"[FAIL] {name}: {type(e).__name__}: {e}", flush=True)
        return False


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--full", action="store_true",
                   help="also run the full-size dopri5 eval shapes (slow compile)")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    # Persistent compile cache so full-size shapes recompiled after a
    # tunnel wedge come back from disk (see bench._enable_compile_cache).
    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/lam_slide_jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    if not step("trivial jit", lambda: float(
            jax.jit(lambda a: (a @ a).sum())(jnp.ones((128, 128))))):
        sys.exit(1)

    def bench():
        # bench.py's own budget: up to ~390s of tunnel probes + a 2400s
        # measurement worker (5-point B-sweep) — a shorter cap here would
        # kill a healthy in-progress benchmark and misreport the outage.
        out = subprocess.run([sys.executable, os.path.join(_REPO, "bench.py")],
                             capture_output=True, text=True, timeout=3000,
                             cwd=_REPO)
        line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
        return line

    step("bench.py", bench)

    def dopri(t_len):
        from lam_slide_tpu.models import LatentDiT
        from lam_slide_tpu.transport import Sampler, create_transport

        model = LatentDiT(depth=7, in_dim=96, hidden_size=384, num_heads=16,
                          mlp_ratio=2, n_timesteps=t_len, dtype=jnp.bfloat16,
                          scan_layers=True)
        key = jax.random.PRNGKey(0)
        x = jax.random.normal(key, (1, t_len, 2, 96))
        x_cond = jnp.zeros_like(x)
        mask = jnp.zeros((1, t_len, 2), jnp.int32).at[:, :1].set(1)
        variables = jax.jit(lambda: model.init(key, x, jnp.zeros((1,)), x_cond, mask))()
        transport = create_transport(path_type="GVP", prediction="data")
        fn = Sampler(transport).sample_ode(sampling_method="dopri5",
                                           atol=1e-6, rtol=1e-3)
        out = jax.jit(lambda n: fn(
            None, n, lambda xt, t, **kw: model.apply(variables, xt, t, **kw),
            x_cond=x_cond, x_cond_mask=mask))(x)
        return f"finite={bool(jnp.all(jnp.isfinite(out)))}"

    step("dopri5 + scan_layers (T=100)", lambda: dopri(100))
    if args.full:
        step("dopri5 + scan_layers (T=1000, protocol size)", lambda: dopri(1000))

    def train_step():
        # One full-size 4AA stage-2 training step: grad through the DiT
        # (flash backward path) + transport loss, at the registry shapes.
        import optax

        from lam_slide_tpu.models import LatentDiT
        from lam_slide_tpu.transport import create_transport

        b, t_len = 16, 1000
        model = LatentDiT(depth=7, in_dim=96, hidden_size=384, num_heads=16,
                          mlp_ratio=2, n_timesteps=t_len, dtype=jnp.bfloat16)
        key = jax.random.PRNGKey(0)
        x1 = jax.random.normal(key, (b, t_len, 2, 96))
        x_cond = jnp.zeros_like(x1)
        mask = jnp.zeros((b, t_len, 2), jnp.int32).at[:, :1].set(1)
        variables = jax.jit(lambda: model.init(key, x1, jnp.zeros((b,)),
                                               x_cond, mask))()
        transport = create_transport(path_type="GVP", prediction="data")
        opt = optax.adamw(1e-4)
        opt_state = jax.jit(opt.init)(variables)

        @jax.jit
        def one_step(params, opt_state, key):
            def loss_fn(p):
                out = transport.training_losses(
                    key, lambda xt, t, **kw: model.apply(p, xt, t, **kw),
                    x1, model_kwargs={"x_cond": x_cond,
                                      "x_cond_mask": mask})
                return out["loss"].mean()

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = opt.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        t0 = time.perf_counter()
        params, opt_state, loss = one_step(variables, opt_state, key)
        loss = float(loss)
        compile_and_first = time.perf_counter() - t0
        t0 = time.perf_counter()
        _, _, loss2 = one_step(params, opt_state, jax.random.PRNGKey(1))
        loss2 = float(loss2)
        step_s = time.perf_counter() - t0
        return (f"loss={loss:.4f}->{loss2:.4f} compile+1st={compile_and_first:.1f}s "
                f"step={step_s*1e3:.0f}ms (B={b}, T={t_len})")

    if args.full:
        step("full-size 4AA stage-2 train step", train_step)


if __name__ == "__main__":
    main()
