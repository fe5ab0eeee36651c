"""On-chip A/B: short temporal attention backends at the MD17 stage-2 shape.

The MD17 stage-2 temporal axis (bh=B·L·H=98304, n=30, dh=32) is the
train step's single largest component on the XLA path (~28%,
docs/PERF.md train-step attribution): the fp32 [bh, n, n] logits pad
their minor dim 30->128 and make three HBM round-trips. Arms:

  xla    — current default dispatch (_pick_backend_packed: n<128 -> xla)
  short  — grouped VMEM-resident kernel (ops/short_attention.py)
  pallas — the long-axis flash kernel forced at n=30 (single k-block)

Each arm measures packed->packed end-to-end (head relayouts included),
fwd and fwd+bwd, with the chained-scan protocol (naive block_until_ready
lies over the tunneled TPU — docs/PERF.md measurement discipline).
"""

import functools
import json
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from bench import _enable_compile_cache  # noqa: E402
from lam_slide_tpu.ops.attention import dot_product_attention_packed  # noqa: E402

B, N, H, DH = 12288, 30, 8, 32


def main() -> None:
    _enable_compile_cache()
    d = H * DH
    q = jax.random.normal(jax.random.PRNGKey(0), (B, N, d), jnp.bfloat16)
    k = jax.random.normal(jax.random.PRNGKey(1), (B, N, d), jnp.bfloat16)
    v = jax.random.normal(jax.random.PRNGKey(2), (B, N, d), jnp.bfloat16)
    q, k, v = jax.device_put((q, k, v))

    def run(name: str, backend: str) -> None:
        def fwd(q_):
            return dot_product_attention_packed(q_, k, v, H, backend=backend)

        def bwd(q_):
            return jax.grad(
                lambda t: jnp.sum(fwd(t).astype(jnp.float32) ** 2))(q_)

        for mode, step in (("fwd", fwd), ("fwdbwd", bwd)):
            @functools.partial(jax.jit, static_argnames="n_iters")
            def chain(q0, n_iters, step=step):
                def body(c, _):
                    out = step(c)
                    return (c + (1e-6 * out).astype(c.dtype),
                            jnp.sum(out.astype(jnp.float32)))
                _, sums = jax.lax.scan(body, q0, None, length=n_iters)
                return jnp.sum(sums)

            try:
                for n in (2, 10):
                    float(chain(q, n))  # compile + warm both lengths

                def t(n, reps=3):
                    best = float("inf")
                    for _ in range(reps):
                        t0 = time.perf_counter()
                        float(chain(q, n))
                        best = min(best, time.perf_counter() - t0)
                    return best

                ms = (t(10) - t(2)) / 8 * 1e3
                print(json.dumps({"backend": name, "mode": mode,
                                  "ms": round(ms, 3)}), flush=True)
            except Exception as e:  # noqa: BLE001
                print(json.dumps({"backend": name, "mode": mode,
                                  "error": str(e)[:300]}), flush=True)

    run("xla", "xla")
    run("short", "short")
    run("pallas", "pallas")


if __name__ == "__main__":
    main()
