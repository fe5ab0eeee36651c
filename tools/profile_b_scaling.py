"""Component-level timing of the 4AA DiT drift eval across batch sizes.

bench.py's B-sweep (2026-08-17) showed per-eval time growing SUPER-linearly
with batch (B=8: 15.6 ms/eval -> B=128: 324 ms/eval, 20.8x for 16x batch)
while the headline steps/s *fell* with B — the opposite of what an
MXU-bound model should do. This tool decomposes one drift eval into its
per-layer components at the bench shapes (T=1000, L=2, D=384, H=16,
dh=24, depth 7) and times each on-chip at several batch sizes, so the
super-linear term can be located instead of guessed at:

  full            whole model.apply (one drift eval)
  temporal_attn   Pallas flash fwd  [B*L, H, T, dh]
  temporal_heads  pack->head-major transpose + back
  temporal_linear linear1 (D->3D+M) + gelu + linear2 on [B*L, T, .]
  packed_normrope packed QKNorm + RoPE on q,k     [B*L, T, D]
  spatial_block   whole spatial block             [B*T, L, D]
  residual_adaln  residual+LN+modulate x2         [B, T, L, D]
  axis_swap       [B,T,L,D] -> [B*L,T,D] -> back

spatial_block and residual_adaln go through the same dispatchers the model
uses (fused Pallas kernel iff LAM_SLIDE_FUSED=1, else the XLA reference
composition — opt-in since the 2026-08-17 A/B); the active path is
recorded in the output as "fused_active" so rows can't be misattributed.

Prints one JSON line per (B, component) and a summary with the
depth-scaled component sum vs the measured full eval.

    python tools/profile_b_scaling.py [--batches 8,32,128] [--depth 7]
"""

import argparse
import functools
import json
import time

import jax
import jax.numpy as jnp

import os as _os
jax.config.update("jax_compilation_cache_dir",
                  _os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                  "/tmp/lam_slide_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

T, L, D, H = 1000, 2, 384, 16
DH = D // H
MLP = 2 * D  # mlp_ratio 2
SCALE = DH**-0.5


def timeit(fn, *args, reps=5, chain=(8, 32)):
    """Best-of-reps chained-scan timing: per-call seconds.

    chain lengths must make the length-difference (24 calls) comfortably
    exceed the ±1-2 ms tunnel dispatch noise: the 2026-08-20 run with
    chain=(1, 4) produced NEGATIVE per-call times for every sub-ms
    component at B=1 (3 calls of a 0.1-0.3 ms op vs ms-scale noise)."""

    @functools.partial(jax.jit, static_argnames="n")
    def run(n, *a):
        def body(c, _):
            out = fn(c, *a[1:]) if a else fn(c)
            # fold output back into the carry so the scan can't be collapsed
            first = jax.tree.leaves(out)[0]
            red = jnp.sum(first).astype(c.dtype)
            return c + 0 * red, red

        _, s = jax.lax.scan(body, a[0], None, length=n)
        return jnp.sum(s)

    for n in chain:
        float(run(n, *args))  # compile + warm

    def best(n):
        b = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(run(n, *args))
            b = min(b, time.perf_counter() - t0)
        return b

    return (best(chain[1]) - best(chain[0])) / (chain[1] - chain[0])


def components(b):
    key = jax.random.PRNGKey(0)
    bt = jnp.bfloat16
    out = {}

    # --- full model ---
    from lam_slide_tpu.models import LatentDiT

    model = LatentDiT(depth=7, in_dim=96, hidden_size=D, num_heads=H,
                      mlp_ratio=2, n_timesteps=T, dtype=bt)
    x = jax.random.normal(key, (b, T, L, 96))
    x_cond = jnp.zeros_like(x)
    mask = jnp.zeros((b, T, L), jnp.int32).at[:, :1].set(1)
    variables = jax.jit(lambda: model.init(key, x, jnp.zeros((b,)), x_cond, mask))()
    tvec = jnp.full((b,), 0.5)

    def full(xc):
        return model.apply(variables, xc, tvec, x_cond, mask)

    out["full"] = timeit(full, x)

    # --- temporal attention (per layer) ---
    from lam_slide_tpu.ops.flash_attention import flash_attention

    qh = jax.random.normal(key, (b * L, H, T, DH), bt)

    def t_attn(q):
        return flash_attention(q, q, q, scale=SCALE)

    out["temporal_attn"] = timeit(t_attn, qh)

    # --- head-major transpose + back (per layer, x3 tensors in, x1 out) ---
    qp = jax.random.normal(key, (b * L, T, D), bt)

    def heads_rt(t3):
        h4 = t3.reshape(b * L, T, H, DH).transpose(0, 2, 1, 3)
        return (h4 + 1).transpose(0, 2, 1, 3).reshape(b * L, T, D)

    out["temporal_heads"] = timeit(heads_rt, qp)

    # --- temporal linears (per layer) ---
    w1 = jax.random.normal(key, (D, 3 * D + MLP), bt) * 0.02
    w2 = jax.random.normal(key, (D + MLP, D), bt) * 0.02

    def t_linear(xq):
        h = jax.lax.dot_general(xq, w1, (((2,), (0,)), ((), ())))
        attn, mlp = h[..., :D], h[..., 3 * D:]
        g = jax.nn.gelu(mlp, approximate=False)
        o = jax.lax.dot_general(attn, w2[:D], (((2,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        o = o + jax.lax.dot_general(g, w2[D:], (((2,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
        return o.astype(bt)

    out["temporal_linear"] = timeit(t_linear, qp)

    # --- packed norm + rope on q and k (per layer) ---
    from lam_slide_tpu.models.latent_dit import rope_cos_sin
    from lam_slide_tpu.ops.packed_attention import (
        lane_rope_tables, packed_rmsnorm, packed_rope)

    cos, sin = rope_cos_sin(T, DH)  # [T, dh/2]
    cos_l, sin_l = lane_rope_tables(cos, sin, H)
    qs = jnp.ones((DH,), jnp.float32)

    def normrope(q):
        a = packed_rope(packed_rmsnorm(q, H, qs), cos_l, sin_l)
        bq = packed_rope(packed_rmsnorm(q, H, qs), cos_l, sin_l)
        return a + bq

    out["packed_normrope"] = timeit(normrope, qp)

    # --- spatial block (per layer; fused or reference per dispatch) ---
    from lam_slide_tpu.ops.fused_spatial_block import fused_spatial_block

    xs = jax.random.normal(key, (b * T, L, D), bt)
    cos_s, sin_s = rope_cos_sin(L, DH)
    cos_sl, sin_sl = lane_rope_tables(cos_s, sin_s, H)
    b1 = jnp.zeros((3 * D + MLP,), jnp.float32)
    b2 = jnp.zeros((D,), jnp.float32)

    def sp(xb):
        return fused_spatial_block(xb, w1.astype(jnp.float32), b1, qs, qs,
                                   w2.astype(jnp.float32), b2, cos_sl, sin_sl,
                                   H, scale=SCALE)

    out["spatial_block"] = timeit(sp, xs)

    # --- residual adaln (x2 per layer; fused or reference per the
    #     LAM_SLIDE_FUSED dispatch — recorded in the output) ---
    from lam_slide_tpu.ops.fused_adaln import residual_adaln_modulate

    x4 = jax.random.normal(key, (b, T, L, D), bt)
    # mods broadcast over (T, L) exactly as the model passes them
    # (latent_dit.py Modulation: out[:, None, None, :])
    shift = jnp.zeros((b, 1, 1, D), bt)
    scl = jnp.zeros((b, 1, 1, D), bt)
    gate = jnp.ones((b, 1, 1, D), bt)

    def ra(xb):
        x1, h1 = residual_adaln_modulate(xb, xb, gate, shift, scl)
        x2_, h2 = residual_adaln_modulate(x1, h1, gate, shift, scl)
        return x2_ + h2

    out["residual_adaln"] = timeit(ra, x4)

    # --- axis swap T<->L (per layer) ---
    def swap(xb):
        h = xb.transpose(0, 2, 1, 3).reshape(b * L, T, D)
        return (h + 1).reshape(b, L, T, D).transpose(0, 2, 1, 3)

    out["axis_swap"] = timeit(swap, x4)

    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="8,32,128")
    ap.add_argument("--depth", type=int, default=7)
    args = ap.parse_args()
    from lam_slide_tpu.ops import fused_adaln, fused_spatial_block

    fused_active = {"adaln": fused_adaln._use_kernel(),
                    "spatial": fused_spatial_block._use_kernel()}
    for b in (int(s) for s in args.batches.split(",")):
        r = components(b)
        per_layer = (r["temporal_attn"] + r["temporal_heads"]
                     + r["temporal_linear"] + r["packed_normrope"]
                     + r["spatial_block"] + r["residual_adaln"]
                     + r["axis_swap"])
        print(json.dumps({
            "batch": b,
            "fused_active": fused_active,
            "ms": {k: round(v * 1e3, 3) for k, v in r.items()},
            "depth_scaled_sum_ms": round(per_layer * args.depth * 1e3, 2),
            "full_ms": round(r["full"] * 1e3, 2),
        }), flush=True)


if __name__ == "__main__":
    main()
