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
