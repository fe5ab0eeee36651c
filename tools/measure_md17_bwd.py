"""On-chip A/B of the attention backward at the MD17 spatial shapes.

The MD17 stage-2 spatial axis is bh = B·T·heads = 64·30·16 = 30720
programs over N = 192 tokens of dh = 24 — the regime round 1 suspected
of degenerate Mosaic compile times and routed to the chunked XLA path.
Measured 2026-08-17: tiled compiles in 0.8 s and wins steady-state
(72.4 ms vs 77.7 ms chunked); the grouped whole-attention "short" kernel
RESOURCE_EXHAUSTed from (8,128)-tile padding at dh=24 and was retired to
ops/ablations/short_backward.py. The tiled backward is now the default;
this script re-drives the A/B in bounded subprocesses:

  tiled   : the shipping default (tiled FlashAttention-2 backward)
  chunked : budget-chunked XLA recompute (LAM_SLIDE_NO_FLASH_BWD=1)

reporting compile time and steady-state grad step time for each. Modes
that hang past --timeout are reported as such (that IS the pathology).

    python tools/measure_md17_bwd.py [--timeout 600]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from _subproc import run_worker  # noqa: E402

WORKER = r"""
import time, sys
import jax, jax.numpy as jnp
from lam_slide_tpu.ops.flash_attention import flash_attention

B, H, N, DH = 1920, 16, 192, 24  # MD17 s2 spatial axis: (64 traj x 30 frames) heads=16
key = jax.random.PRNGKey(0)
q = jax.random.normal(key, (B, H, N, DH), jnp.bfloat16)
k = jax.random.normal(jax.random.fold_in(key, 1), (B, H, N, DH), jnp.bfloat16)
v = jax.random.normal(jax.random.fold_in(key, 2), (B, H, N, DH), jnp.bfloat16)

def loss(q, k, v):
    return jnp.sum(flash_attention(q, k, v).astype(jnp.float32))

grad = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))
t0 = time.perf_counter()
dq, dk, dv = grad(q, k, v)
jax.block_until_ready(dq)
compile_s = time.perf_counter() - t0

# steady state: difference two chain lengths to cancel dispatch overhead
import functools
@functools.partial(jax.jit, static_argnames="n")
def chain(q, k, v, n):
    def body(c, _):
        dq, dk, dv = jax.grad(loss, argnums=(0, 1, 2))(c, k, v)
        return c + 1e-6 * dq, jnp.sum(dq)
    _, s = jax.lax.scan(body, q, None, length=n)
    return jnp.sum(s)

for n in (1, 4):
    float(chain(q, k, v, n))
def best(n, reps=3):
    b = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(chain(q, k, v, n))
        b = min(b, time.perf_counter() - t0)
    return b
step_ms = (best(4) - best(1)) / 3 * 1e3
print(f"RESULT {compile_s:.1f} {step_ms:.2f}")
"""


def run_mode(name: str, env_pins: dict, timeout: int) -> dict:
    return run_worker(
        name, WORKER, env_pins, timeout,
        lambda t: {"compile_s": float(t[0]), "grad_step_ms": float(t[1])},
        timeout_note=" (compile pathology)")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--timeout", type=int, default=600)
    ap.add_argument("--modes", default="chunked,tiled")
    args = ap.parse_args()
    # run_worker pins every other kernel knob to "0" per arm, so e.g. a
    # session LAM_SLIDE_NO_FLASH_BWD=1 cannot veto the tiled arm.
    envs = {
        "chunked": {"LAM_SLIDE_NO_FLASH_BWD": "1"},
        "tiled": {},  # the shipping default path
    }
    for mode in args.modes.split(","):
        r = run_mode(mode, envs[mode], args.timeout)
        print(json.dumps(r), flush=True)


if __name__ == "__main__":
    main()
