"""REAL multi-process (multihost) SPMD test on CPU.

The reference's only distribution is Lightning DDP, never tested
(SURVEY.md §4 item 4). Here the multi-host path is exercised for real:
two OS processes, each owning 4 virtual CPU devices, joined by
``jax.distributed.initialize`` over a localhost coordinator with gloo CPU
collectives — 8 global devices, process_count==2, exactly the topology of
a 2-host pod slice modulo the interconnect. Both multi-host feeding modes
(per-process slice feeding and the full_batch_feed fallback used by
ragged eval loaders) must reproduce the single-process 8-device training
losses on the same deterministic global batch, two optimizer steps deep.

This is the strongest distribution evidence available without multi-host
hardware: the actual ``make_array_from_process_local_data`` assembly, the
actual cross-process grad psum (through gloo), the actual train step. One
worker pair runs both modes in a single distributed session (the build is
cached per process) to keep wall-clock bounded.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

_HERE = os.path.dirname(os.path.abspath(__file__))
_REPO = os.path.dirname(_HERE)
_MODES = ("shard", "full")
# Generous: the pair shares this box's ONE cpu core with the pytest
# process, and jit compile time dominates the workers' wall-clock.
_PAIR_TIMEOUT_S = 2400

WORKER = r"""
import os, sys
pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
flags = " ".join(f for f in flags.split()
                 if "host_platform_device_count" not in f)
os.environ["XLA_FLAGS"] = (
    flags + " --xla_force_host_platform_device_count=4").strip()
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")
jax.distributed.initialize(coordinator_address="127.0.0.1:" + port,
                           num_processes=nproc, process_id=pid)
assert jax.process_count() == nproc, jax.process_count()
assert jax.local_device_count() == 4, jax.local_device_count()
assert jax.device_count() == 8, jax.device_count()
sys.path.insert(0, os.environ["LAM_SLIDE_TEST_DIR"])
import support_multihost as sm
for mode in sys.argv[4:]:
    losses = sm.run(mode)
    print("LOSSES", mode, " ".join("%.8f" % l for l in losses), flush=True)
"""


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _spawn(pid: int, nproc: int, port: int) -> subprocess.Popen:
    env = dict(os.environ)
    env["PYTHONPATH"] = _REPO + os.pathsep + env.get("PYTHONPATH", "")
    env["LAM_SLIDE_TEST_DIR"] = _HERE
    return subprocess.Popen(
        [sys.executable, "-c", WORKER, str(pid), str(nproc), str(port),
         *_MODES],
        env=env, cwd=_REPO, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        text=True)


@pytest.fixture(scope="module")
def pair_losses():
    """{mode: [[proc0 losses], [proc1 losses]]} from one 2-process session."""
    import threading

    port = _free_port()
    procs = [_spawn(i, 2, port) for i in range(2)]
    # Drain BOTH pipes concurrently: a sequential communicate() would let
    # the other worker fill its 64KB stderr pipe, block in write(), stop
    # participating in the cross-process psum, and deadlock the pair.
    results = [None, None]

    def drain(i):
        results[i] = procs[i].communicate()

    threads = [threading.Thread(target=drain, args=(i,)) for i in range(2)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=_PAIR_TIMEOUT_S)
    if any(t.is_alive() for t in threads):
        for q in procs:
            q.kill()
        for t in threads:
            t.join(timeout=30)
        raise TimeoutError(
            f"multihost worker pair hung past {_PAIR_TIMEOUT_S}s")
    outs = []
    for p, res in zip(procs, results):
        out, err = res
        assert p.returncode == 0, f"worker failed:\n{err[-3000:]}"
        outs.append(out)
    result = {m: [] for m in _MODES}
    for out in outs:
        for line in out.splitlines():
            if line.startswith("LOSSES"):
                toks = line.split()
                result[toks[1]].append([float(t) for t in toks[2:]])
    assert all(len(v) == 2 for v in result.values()), result
    return result


@pytest.fixture(scope="module")
def single_process_losses():
    import support_multihost as sm

    return sm.run("single")


@pytest.mark.parametrize("mode", _MODES)
def test_two_process_matches_single_process(mode, pair_losses,
                                            single_process_losses):
    per_proc = pair_losses[mode]
    # Both processes see the same replicated loss...
    np.testing.assert_allclose(per_proc[0], per_proc[1], rtol=1e-6)
    # ...and it matches the single-process 8-device run on the same global
    # batch (reduction order may differ across process topologies).
    np.testing.assert_allclose(per_proc[0], single_process_losses,
                               rtol=2e-5, atol=1e-6)
    # Two steps: the optimizer moved, so the losses must differ.
    assert per_proc[0][0] != per_proc[0][1]
