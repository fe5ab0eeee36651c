"""The on-chip measurement tools' subprocess harness must pin EVERY
kernel-path knob per arm — a knob lingering in the parent environment
(e.g. LAM_SLIDE_NO_FLASH_BWD=1 from an earlier debug session) would
otherwise silently veto the path an arm claims to measure, turning the
A/B comparison into A/A."""

import importlib.util
import os

_SPEC = importlib.util.spec_from_file_location(
    "_subproc", os.path.join(os.path.dirname(__file__), "..", "tools",
                             "_subproc.py"))
_subproc = importlib.util.module_from_spec(_SPEC)
_SPEC.loader.exec_module(_subproc)

_ECHO = r"""
import os
knobs = ("LAM_SLIDE_NO_FUSED", "LAM_SLIDE_NO_FLASH_BWD")
print("RESULT", *(os.environ.get(k, "?") for k in knobs))
"""


def test_lingering_session_knob_is_pinned_off(monkeypatch):
    monkeypatch.setenv("LAM_SLIDE_NO_FLASH_BWD", "1")  # stale debug knob
    r = _subproc.run_worker(
        "tiled", _ECHO, {"LAM_SLIDE_NO_FUSED": "1"}, timeout=60,
        parse=lambda t: {"knobs": t})
    assert r["status"] == "ok"
    no_fused, no_flash = r["knobs"]
    assert no_flash == "0", "stale NO_FLASH_BWD must not veto the tiled arm"
    assert no_fused == "1", "the arm's own pin must come through"


def test_timeout_reported_with_note(monkeypatch):
    r = _subproc.run_worker("hang", "import time; time.sleep(30)", {},
                            timeout=1, parse=lambda t: {},
                            timeout_note=" (compile pathology)")
    assert r["status"] == "timeout>1s (compile pathology)"


def test_worker_failure_reports_stderr_tail():
    r = _subproc.run_worker("boom", "raise RuntimeError('kaput')", {},
                            timeout=30, parse=lambda t: {})
    assert r["status"].startswith("failed rc=1") and "kaput" in r["status"]


def test_measure_trained_nfe_on_smoke_run(tmp_path):
    """tools/measure_trained_nfe.py end-to-end on a CPU smoke lineage:
    train a 2-epoch peptide pair via the CLI, then report trained + init
    NFE from the registered run (round-3 verdict weak #3: init-NFE may not
    reflect a converged field — this is the measurement pathway)."""
    import json
    import sys

    from lam_slide_tpu.train.cli import main as train_main

    ws = str(tmp_path / "ws")
    train_main(["--experiment", "peptide_first_stage", "--smoke",
                "--workspace", ws, "--run-id", "s1", "--no-mesh"])
    train_main(["--experiment", "peptide_second_stage", "--smoke",
                "--workspace", ws, "--run-id", "s2", "--no-mesh",
                "--first-stage-run", "s1"])

    tool_path = os.path.join(os.path.dirname(__file__), "..", "tools",
                             "measure_trained_nfe.py")
    spec = importlib.util.spec_from_file_location("measure_trained_nfe", tool_path)
    tool = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(tool)

    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = tool.main(["--run", "s2", "--workspace", ws, "--init-model"])
    assert rc == 0
    out = json.loads(buf.getvalue().strip().splitlines()[-1])
    for arm in ("trained", "init"):
        assert out[arm]["n_iters"] >= out[arm]["steps_accepted"] > 0
        assert out[arm]["nfe"] == 1 + 6 * out[arm]["n_iters"]
