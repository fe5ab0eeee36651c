"""Headline benchmark: 4AA latent-ODE sampler throughput on one TPU chip.

Measures the reference's north-star quantity (BASELINE.json): latent-ODE
sampler steps/sec/chip for the full-size 4AA peptide stage-2 denoiser
(depth 7, hidden 384, T=1000 frames, L=2 latent tokens, in_dim 96 —
configs/model/peptide/second-stage.yaml) integrating the probability-flow
ODE with the training-time Euler sampler. One "step" = one DiT drift
evaluation for one trajectory (batch x num_steps per solve).

Throughput protocol: steps/s/chip is a *throughput* metric and the eval
protocol legitimately batches wide (10 rollouts x several test peptides),
so the harness sweeps B in {8, 16, 32, 64, 128} and reports the best
sustained throughput as the headline, with the full sweep in the
"sweep" field (VERDICT r1 item 3: B=8 was a measurement choice, not a
protocol constraint).

The reference publishes no A100 number ("published": {}), so vs_baseline is
reported against an analytic A100 anchor: this architecture is small-op
dominated (L=2 spatial axis, hidden 384 — tiny matmuls between layout
ops), a regime where compiled torch on A100 sustains ~5% MFU; the anchor is
sustained FLOP/s divided by FLOPs per trajectory-step:
    anchor = 312 TFLOP/s x 5% / (linear-matmul FLOPs per traj drift eval),
i.e. ~236 traj-ODE-steps/s regardless of batch (batching is already what
lets the GPU sustain that MFU). The anchor is generous to the baseline:
it prices only the linear matmuls, ignoring the O(T^2) attention FLOPs
and all layout/softmax work. vs_baseline = measured / anchor, >1 means
faster than a well-compiled A100 reference run.

Outage behavior (VERDICT r1 weak #2): the measurement runs in a bounded
worker subprocess behind a short tunnel-health probe; a wedged TPU tunnel
(which hangs forever in-process) produces a fast one-line diagnostic JSON
{"...", "error": "tpu_unavailable"} instead of a traceback.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
"""

import json
import os
import subprocess
import sys
import time


def _enable_compile_cache() -> None:
    """Persistent XLA compilation cache: the expensive part of a bench run
    over the flappy tunnel is the first compile; with the cache a re-run
    after a tunnel wedge skips straight to execution, which is what lets
    short heal windows land numbers. Safe if the backend declines
    executable serialization (writes just warn). jax 0.9 ignores the
    JAX_COMPILATION_CACHE_DIR env var — the explicit update is required;
    call this only in the worker (importing jax in the parent is fine, but
    keep the parent's behavior minimal)."""
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/lam_slide_jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

T, L, DIN = 1000, 2, 96
NUM_STEPS = 10
# Override for opportunistic runs inside short tunnel-heal windows, e.g.
# LAM_SLIDE_BENCH_SWEEP=8 measures just the (measured-best) headline batch.
# Default sweep brackets the measured peak: throughput RISES as batch
# shrinks below the r02 sweep's floor and peaks at B=2 (2026-08-19
# bench_small: B=1 549.9, B=2 587.9, B=4 571.5, B=6 557.2, B=8 539.6,
# docs/measurements) — the per-eval cost grows superlinearly in B, so
# small solves win; B=16 documents the falloff on the wide side.
BATCH_SWEEP = tuple(
    int(t) for t in os.environ.get("LAM_SLIDE_BENCH_SWEEP",
                                   "1,2,4,6,8,16").split(","))
METRIC = {
    "metric": "4aa_latent_ode_sampler_steps_per_sec_per_chip",
    "unit": "traj_ode_steps/s",
}

# analytic A100 anchor (see module docstring); batch-invariant
_FLOPS_PER_EVAL = 2 * 7 * (
    2 * (T * L) * (3 * 384 + 768) * 384 + 2 * (T * L) * 384 * (384 + 768)
)  # linear1 + linear2 matmul FLOPs per trajectory; attention excluded
A100_ANCHOR = 312e12 * 0.05 / _FLOPS_PER_EVAL  # traj-steps/s


def build_solver(batch: int, method: str = "euler", num_heads: int = 16,
                 scan_layers: bool = None) -> dict:
    """The exact program the headline measures: full-size 4AA denoiser +
    Euler-10 probability-flow solve at the given batch. Shared with
    tools/capture_trace.py so the op-level trace profiles the same program
    the benchmark times. ``method="dopri5"`` builds the eval-protocol
    adaptive solver instead (atol 1e-6 / rtol 1e-3,
    configs/eval_peptide.yaml:23); its solve returns
    (x, (n_iters, n_accepted)).

    ``num_heads`` is the head-split A/B knob (PERF.md: the reference's
    16x24 split pays a 5.3x MXU lane tax; 12x32 and 3x128 are the
    TPU-native variants — same hidden width, near-identical param count).
    The headline always runs the reference-exact 16 (tools/measure_dh_ab.py
    measures the variants)."""
    import jax
    import jax.numpy as jnp

    from lam_slide_tpu.models import LatentDiT
    from lam_slide_tpu.transport import Sampler, create_transport

    # dopri5 arm: scan_layers=True matches the shipping eval config (the
    # non-smoke peptide stage-2 builder rolls the depth loop into nn.scan)
    # AND keeps the bounded-while compile small — the old 6x-inlined
    # dopri5 body at depth 7 compiled 23+ min UNROLLED and wedged the TPU
    # tunnel (docs/STATUS.md). Since the stage-scan rewrite
    # (transport/integrators.py traces the drift once per while body) the
    # unrolled layout is compile-feasible for dopri5 too —
    # tools/measure_dopri5_layouts.py A/Bs it; ``scan_layers`` overrides.
    # The Euler headline keeps the unrolled layout it has always measured.
    if scan_layers is None:
        scan_layers = method == "dopri5"
    model = LatentDiT(depth=7, in_dim=DIN, hidden_size=384, num_heads=num_heads,
                      mlp_ratio=2, n_timesteps=T, dtype=jnp.bfloat16,
                      scan_layers=scan_layers)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (batch, T, L, DIN))
    x_cond = jnp.zeros_like(x)
    mask = jnp.zeros((batch, T, L), jnp.int32).at[:, :1].set(1)
    variables = jax.jit(
        lambda: model.init(key, x, jnp.zeros((batch,)), x_cond, mask)
    )()

    transport = create_transport(path_type="GVP", prediction="data")
    if method == "dopri5":
        sample_fn = Sampler(transport).sample_ode(
            sampling_method="dopri5", atol=1e-6, rtol=1e-3, return_stats=True)
    else:
        sample_fn = Sampler(transport).sample_ode(sampling_method="euler",
                                                  num_steps=NUM_STEPS)

    def model_fn(xt, t, **kw):
        return model.apply(variables, xt, t, **kw)

    def solve(noise):  # one full ODE solve -> [B, T, L, DIN]
        return sample_fn(None, noise, model_fn, x_cond=x_cond,
                         x_cond_mask=mask)

    noise = jax.random.normal(key, x.shape)
    return {"solve": solve, "noise": noise, "model_fn": model_fn,
            "x_cond": x_cond, "mask": mask}


def measure(batch: int, num_heads: int = 16) -> float:
    """Best sustained traj-ODE-steps/s at the given batch."""
    _enable_compile_cache()
    import jax
    import jax.numpy as jnp

    setup = build_solver(batch, num_heads=num_heads)
    solve, noise = setup["solve"], setup["noise"]

    import functools

    @functools.partial(jax.jit, static_argnames="n_solves")
    def run(noise, n_solves):
        # Chain solves in-graph (each feeding perturbed noise to the next)
        # and reduce to one scalar: the float() below forces a host readback
        # — the only reliable sync over a tunneled TPU — and chaining
        # amortizes the tunnel round-trip out of the measurement.
        def body(c, _):
            out = solve(c)
            return c + 1e-6 * out, jnp.sum(out)
        _, sums = jax.lax.scan(body, noise, None, length=n_solves)
        return jnp.sum(sums)

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
    return batch * NUM_STEPS / dt


def measure_dopri5(batch: int = 8, scan_layers: bool = None) -> dict:
    """Protocol-sampler arm: the dopri5 atol 1e-6 / rtol 1e-3 solve the 4AA
    eval actually uses (configs/eval_peptide.yaml:23), at the protocol batch.
    Reports drift-evals/s (comparable to the Euler headline: both count DiT
    drift evaluations) and the adaptive solver's NFE. The NFE is an
    at-init NFE — a trained drift may differ — but drift-evals/s is
    NFE-invariant: it measures the bounded-while_loop path's per-eval cost
    next to the scan-Euler path's."""
    _enable_compile_cache()
    import functools

    import jax
    import jax.numpy as jnp

    setup = build_solver(batch, method="dopri5", scan_layers=scan_layers)
    solve, noise = setup["solve"], setup["noise"]

    @functools.partial(jax.jit, static_argnames="n_solves")
    def run(noise, n_solves):
        def body(c, _):
            out, (n_iters, n_acc) = solve(c)
            return c + 1e-6 * out, (jnp.sum(out), n_iters, n_acc)
        _, (sums, iters, accs) = jax.lax.scan(body, noise, None, length=n_solves)
        return jnp.sum(sums), jnp.max(iters), jnp.max(accs)

    n_iters = n_accepted = None
    for n in (1, 4):
        _, it, ac = run(noise, n)
        n_iters, n_accepted = int(it), int(ac)

    def best_time(n, reps=3):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            s, _, _ = run(noise, n)
            float(s)
            best = min(best, time.perf_counter() - t0)
        return best

    dt = (best_time(4) - best_time(1)) / 3
    nfe = 1 + 6 * n_iters  # FSAL
    return {"batch": batch, "nfe": nfe, "steps_accepted": n_accepted,
            "drift_evals_per_sec": round(batch * nfe / dt, 2),
            "solve_ms": round(dt * 1e3, 2)}


def _result_json(sweep, errors, partial_after=None, dopri5=None,
                 tpu_split=None) -> str:
    best_b = max(sweep, key=sweep.get)
    value = sweep[best_b]
    out = {
        **METRIC,
        "value": round(value, 2),
        "vs_baseline": round(value / A100_ANCHOR, 3),
        "batch": best_b,
        "sweep": {str(b): round(v, 2) for b, v in sweep.items()},
    }
    if tpu_split is not None:
        # TPU-native head split (3 x dh=128 at the same hidden width/param
        # count — engages the packed flash kernel, no dh=24 MXU lane tax).
        # Reported as a labeled VARIANT: the headline above stays the
        # reference-exact 16 x dh=24 architecture. Convergence parity of
        # the variant is the runs/convergence conv-pep-s2-h3 arm.
        out["tpu_split"] = tpu_split
    if dopri5 is not None:
        out["dopri5"] = dopri5  # the eval protocol's adaptive sampler arm
    if errors:
        out["sweep_errors"] = {str(b): e for b, e in errors.items()}
    if partial_after is not None:
        out["partial"] = f"sweep cut off after B={partial_after}"
    return json.dumps(out)


def worker() -> None:
    # Per-batch isolation: one failing sweep point (OOM at wide B, a shape
    # or compile bug) must not discard the points already measured or get
    # misreported as a tunnel outage downstream. A full result line is
    # (re)printed after EVERY point so a mid-sweep tunnel wedge (worker
    # killed by the watchdog) still leaves a salvageable best-so-far line
    # in the captured stdout.
    sweep, errors = {}, {}
    for b in BATCH_SWEEP:
        try:
            sweep[b] = measure(b)
            print(f"# B={b}: {sweep[b]:.1f} steps/s", file=sys.stderr, flush=True)
        except Exception as e:
            errors[b] = f"{type(e).__name__}: {e}"[:200]
            print(f"# B={b}: FAILED {errors[b]}", file=sys.stderr, flush=True)
        if sweep:
            print(_result_json(sweep, errors,
                               partial_after=b if b != BATCH_SWEEP[-1] else None),
                  flush=True)
    if not sweep:
        print(json.dumps({**METRIC, "value": None, "vs_baseline": None,
                          "error": "bench_failed",
                          "detail": "; ".join(f"B={b}: {e}" for b, e in errors.items())[:300]}))
        return
    # TPU-native head-split arm (3 x dh=128) at the measured-best batches;
    # a labeled variant next to the reference-exact headline (skippable for
    # opportunistic short-window runs)
    # Unlike the dh=24 reference split (which peaks at B=2 — its HBM-bound
    # relayout/glue degrades with batch), the packed dh=128 layout SCALES
    # UP in B (measured 2026-08-21: 976.8 @B=2 vs 1035.4 @B=8), so the
    # variant sweep continues where the reference-split sweep stops.
    tpu_split = None
    if os.environ.get("LAM_SLIDE_BENCH_NO_TPU_SPLIT") != "1":
        tpu_split = {}
        for b in (2, 8, 16, 32):
            try:
                tpu_split[str(b)] = round(measure(b, num_heads=3), 2)
                print(f"# tpu_split B={b}: {tpu_split[str(b)]}",
                      file=sys.stderr, flush=True)
            except Exception as e:
                tpu_split[str(b)] = f"FAILED {type(e).__name__}"[:80]
                print(f"# tpu_split B={b} FAILED {type(e).__name__}: {e}",
                      file=sys.stderr, flush=True)
        print(_result_json(sweep, errors, tpu_split=tpu_split), flush=True)
    # eval-protocol arm: the dopri5 sampler the 4AA protocol actually runs
    # (skippable for opportunistic short-window runs)
    if os.environ.get("LAM_SLIDE_BENCH_NO_DOPRI5") != "1":
        try:
            d5 = measure_dopri5()
            print(f"# dopri5: {d5}", file=sys.stderr, flush=True)
            print(_result_json(sweep, errors, dopri5=d5, tpu_split=tpu_split),
                  flush=True)
        except Exception as e:
            print(f"# dopri5 arm FAILED {type(e).__name__}: {e}",
                  file=sys.stderr, flush=True)


def _probe_tunnel(timeout_s: float) -> tuple[bool, str]:
    """Trivial jit in a bounded subprocess (a wedged tunnel hangs forever)."""
    code = ("import jax, jax.numpy as jnp;"
            "print(float(jax.jit(lambda a:(a@a).sum())(jnp.ones((128,128)))))")
    try:
        p = subprocess.run([sys.executable, "-c", code], timeout=timeout_s,
                           capture_output=True, text=True)
    except subprocess.TimeoutExpired:
        return False, f"health probe hung >{timeout_s:.0f}s (tunnel wedged)"
    if p.returncode != 0:
        return False, (p.stderr.strip().splitlines() or ["unknown"])[-1][:300]
    return True, ""


def _diagnostic(detail: str) -> None:
    print(json.dumps({**METRIC, "value": None, "vs_baseline": None,
                      "error": "tpu_unavailable", "detail": detail[:300]}))


def main() -> None:
    here = os.path.dirname(os.path.abspath(__file__))
    # Fail fast on a dead/wedged tunnel; one retry after a short pause in
    # case it is mid-heal. A healthy tunnel answers the trivial jit in
    # ~2s (30s with a cold compile cache); 90s headroom is plenty, and the
    # heal windows are sometimes shorter than two 180s probes.
    ok, detail = _probe_tunnel(90)
    if not ok:
        time.sleep(20)
        ok, detail = _probe_tunnel(90)
    if not ok:
        _diagnostic(detail)
        return
    # Tunnel is healthy: run the measurement in a bounded worker so a
    # mid-benchmark wedge still yields a diagnostic line, not a hang.
    # LAM_SLIDE_BENCH_WORKER_TIMEOUT shrinks the watchdog for opportunistic
    # short-window runs (tools/onchip_queue.sh bench_fast) — any OUTER
    # timeout wrapped around bench.py must exceed probes (~200s) + this
    # value, or it kills the process before the salvage/diagnostic line.
    worker_timeout = int(os.environ.get("LAM_SLIDE_BENCH_WORKER_TIMEOUT",
                                        "2400"))
    try:
        p = subprocess.run([sys.executable, os.path.abspath(__file__),
                            "--worker"], timeout=worker_timeout, cwd=here,
                           capture_output=True, text=True)
    except subprocess.TimeoutExpired as e:
        # The worker reprints a best-so-far result line after every sweep
        # point — salvage the completed points instead of discarding the
        # whole run as an outage.
        out = e.stdout if isinstance(e.stdout, str) else (
            e.stdout.decode(errors="replace") if e.stdout else "")
        for line in reversed(out.splitlines()):
            if line.startswith("{"):
                try:
                    json.loads(line)  # the kill can truncate the last line
                except ValueError:
                    continue
                print(line)
                return
        _diagnostic(f"benchmark worker exceeded {worker_timeout}s "
                    "(tunnel wedged mid-run?)")
        return
    sys.stderr.write(p.stderr)
    lines = [l for l in p.stdout.splitlines() if l.startswith("{")]
    if p.returncode != 0 or not lines:
        # The tunnel probed healthy, so a dead worker is a software failure
        # in the benchmark itself — do not masquerade it as an outage.
        tail = (p.stderr.strip().splitlines() or ["unknown"])[-1][:300]
        print(json.dumps({**METRIC, "value": None, "vs_baseline": None,
                          "error": "bench_failed",
                          "detail": f"worker rc={p.returncode}: {tail}"}))
        return
    print(lines[-1])


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        worker()
    else:
        main()
