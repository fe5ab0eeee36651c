"""Bounded-subprocess harness shared by the on-chip measurement tools.

Each measurement arm runs in its own subprocess with EVERY kernel-path
knob pinned explicitly: the knobs (LAM_SLIDE_NO_FUSED,
LAM_SLIDE_NO_FLASH_BWD) are documented session debug switches, and one
lingering in the parent environment would silently turn an A/B comparison
into A/A (e.g. a stale LAM_SLIDE_NO_FLASH_BWD=1 vetoes the tiled arm
inside flash_attention._core_bwd).
"""

import os
import subprocess
import sys

# Every knob that selects a kernel path; arms pin all of them.
KNOBS = (
    "LAM_SLIDE_FUSED",
    "LAM_SLIDE_NO_FUSED",
    "LAM_SLIDE_NO_FUSED_ADALN",
    "LAM_SLIDE_NO_FUSED_SPATIAL",
    "LAM_SLIDE_NO_FLASH_BWD",
    "LAM_SLIDE_HEADMAJOR_NORMROPE",
    "LAM_SLIDE_KERNEL_NORMROPE",
    "LAM_SLIDE_EMIT_HEADMAJOR",
    "LAM_SLIDE_NO_PACKED_FLASH",
    "LAM_SLIDE_SHORT_ATTN",
    "LAM_SLIDE_FUSED_MLP",
    "LAM_SLIDE_NO_FUSED_MLP",
    "LAM_SLIDE_NO_KERNEL_NORMROPE",
)


# Persistent-compile-cache preamble prepended to every worker: lets an arm
# starved by a mid-window tunnel wedge skip its compile when retried in a
# later heal window. jax 0.9 ignores the env var; the explicit config
# update is required (see bench._enable_compile_cache).
_CACHE_PREAMBLE = (
    "import os as _os, jax as _jax\n"
    "_jax.config.update('jax_compilation_cache_dir',"
    " _os.environ.get('JAX_COMPILATION_CACHE_DIR',"
    " '/tmp/lam_slide_jax_cache'))\n"
    "_jax.config.update('jax_persistent_cache_min_compile_time_secs', 5.0)\n"
)


def run_worker(name, code, env_pins, timeout, parse, timeout_note=""):
    """Run `code` in a bounded subprocess and parse its RESULT line.

    `env_pins` maps knob -> value for the knobs this arm sets to "1";
    every other KNOB is pinned to "0" so the parent session's state cannot
    leak in. `parse` maps the whitespace-split fields after "RESULT" to a
    dict merged into the ok-result.
    """
    pins = {k: "0" for k in KNOBS}
    # Round-5 default flips (fused_mlp everywhere, kernel_normrope at
    # dh%128==0): the A/B baseline stays "everything off", so the vetoes
    # are pinned ON by default and arms opt features back in explicitly
    # (the explicit LAM_SLIDE_<FEATURE>=1 beats its veto in the dispatch).
    pins["LAM_SLIDE_NO_FUSED_MLP"] = "1"
    pins["LAM_SLIDE_NO_KERNEL_NORMROPE"] = "1"
    pins.update(env_pins)
    env = {**os.environ, **pins}
    code = _CACHE_PREAMBLE + code
    try:
        p = subprocess.run([sys.executable, "-c", code], env=env,
                           capture_output=True, text=True, timeout=timeout)
    except subprocess.TimeoutExpired:
        return {"mode": name, "status": f"timeout>{timeout}s{timeout_note}"}
    for line in p.stdout.splitlines():
        if line.startswith("RESULT"):
            return {"mode": name, "status": "ok", **parse(line.split()[1:])}
    # Preserve the full stderr — the one-line status strips the traceback
    # that a Mosaic lowering failure needs for diagnosis.
    errpath = f"/tmp/onchip/arm_{name}.stderr"
    try:
        os.makedirs("/tmp/onchip", exist_ok=True)
        with open(errpath, "w") as f:
            f.write(p.stderr)
    except OSError:
        errpath = "?"
    tail = (p.stderr.strip().splitlines() or ["?"])[-1][:200]
    return {"mode": name, "status": f"failed rc={p.returncode}: {tail}",
            "stderr": errpath}
