"""Root conftest: force tests onto a virtual 8-device CPU mesh.

The reference had no distributed test harness at all (SURVEY.md §4); we use
XLA's host-platform device multiplexing as the TPU-native "fake backend" so
multi-chip sharding is exercised in every CI run without real hardware.
"""

import os

# Unconditional: the ambient environment may point JAX at a tunneled TPU
# (JAX_PLATFORMS=axon); unit tests must run on the virtual CPU mesh. The
# axon PJRT plugin ignores the env var, so also force it via jax.config.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Persistent compilation cache: the suite's 12-18 min is mostly jit
# compiles of programs that do not change between runs; cached reruns cut
# that substantially. Keyed by HLO hash, so code changes re-compile.
# (jax 0.9 ignores the JAX_COMPILATION_CACHE_DIR env var — the explicit
# config update is required.)
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/lam_slide_jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
