"""bench.py harness behavior (no TPU needed): the B-sweep isolates
per-batch failures and distinguishes software failures from outages."""

import json


def _last_json(capsys):
    out = capsys.readouterr().out
    return json.loads([l for l in out.splitlines() if l.startswith("{")][-1])


def test_worker_isolates_one_failing_batch(monkeypatch, capsys):
    import bench

    fail_b = bench.BATCH_SWEEP[-1]  # widest point OOMs
    ok = [b for b in bench.BATCH_SWEEP if b != fail_b]

    def fake_measure(b):
        if b == fail_b:
            raise RuntimeError("RESOURCE_EXHAUSTED: out of memory")
        return 100.0 + b

    monkeypatch.setattr(bench, "measure", fake_measure)
    fake_d5 = {"batch": 8, "nfe": 97, "drift_evals_per_sec": 400.0,
               "solve_ms": 1940.0}
    monkeypatch.setattr(bench, "measure_dopri5", lambda batch=8: fake_d5)
    bench.worker()
    rec = _last_json(capsys)
    # the measured points survive; the failure is reported, not fatal,
    # and not mislabeled as a tunnel outage
    assert rec["value"] == 100.0 + max(ok) and rec["batch"] == max(ok)
    assert set(rec["sweep"]) == {str(b) for b in ok}
    assert "RESOURCE_EXHAUSTED" in rec["sweep_errors"][str(fail_b)]
    assert "error" not in rec
    assert rec["dopri5"] == fake_d5  # the eval-protocol arm rides along


def test_worker_all_batches_failing_is_bench_failed(monkeypatch, capsys):
    import bench

    def fake_measure(b):
        raise ValueError("shape mismatch")

    monkeypatch.setattr(bench, "measure", fake_measure)
    bench.worker()
    rec = _last_json(capsys)
    assert rec["value"] is None
    assert rec["error"] == "bench_failed"  # tunnel was fine; code was not
    assert "shape mismatch" in rec["detail"]


def test_worker_reprints_result_after_every_point(monkeypatch, capsys):
    """A mid-sweep kill must leave a salvageable best-so-far line: the
    worker reprints the full result JSON after every sweep point, with a
    'partial' marker on all but the final one."""
    import bench

    monkeypatch.setattr(bench, "measure",
                        lambda b, num_heads=16: 100.0 + b + num_heads)
    # the dopri5 arm failing must not lose the sweep result either
    monkeypatch.setattr(bench, "measure_dopri5",
                        lambda batch=8: (_ for _ in ()).throw(RuntimeError("x")))
    bench.worker()
    lines = [json.loads(l) for l in capsys.readouterr().out.splitlines()
             if l.startswith("{")]
    # one line per sweep point + the tpu_split variant line
    assert len(lines) == len(bench.BATCH_SWEEP) + 1
    sweep_lines = lines[:len(bench.BATCH_SWEEP)]
    assert all("partial" in rec for rec in sweep_lines[:-1])
    assert "partial" not in sweep_lines[-1]
    assert sweep_lines[0]["sweep"] == {str(bench.BATCH_SWEEP[0]):
                                       100.0 + bench.BATCH_SWEEP[0] + 16}
    # the variant arm is labeled, measured at its own head split, and does
    # not displace the reference-exact headline
    assert lines[-1]["tpu_split"] == {"2": 105.0, "8": 111.0,
                                      "16": 119.0, "32": 135.0}
    assert lines[-1]["value"] == sweep_lines[-1]["value"]


def test_main_salvages_partial_sweep_on_worker_timeout(monkeypatch, capsys):
    """If the watchdog kills a wedged worker, main() emits the last VALID
    result line from the partial stdout instead of a blanket outage."""
    import subprocess

    import bench

    good = json.dumps({**bench.METRIC, "value": 123.0, "vs_baseline": 0.5,
                       "batch": 8, "sweep": {"8": 123.0},
                       "partial": "sweep cut off after B=8"})
    partial_stdout = good + "\n" + '{"metric": "truncat'  # kill mid-print

    def fake_run(*a, **k):
        raise subprocess.TimeoutExpired(cmd=a[0], timeout=2400,
                                        output=partial_stdout, stderr="")

    monkeypatch.setattr(bench, "_probe_tunnel", lambda t: (True, ""))
    monkeypatch.setattr(bench.subprocess, "run", fake_run)
    bench.main()
    rec = _last_json(capsys)
    assert rec["value"] == 123.0 and rec["partial"]


def test_main_reports_outage_when_no_partial_line(monkeypatch, capsys):
    import subprocess

    import bench

    def fake_run(*a, **k):
        raise subprocess.TimeoutExpired(cmd=a[0], timeout=2400,
                                        output="", stderr="")

    monkeypatch.setattr(bench, "_probe_tunnel", lambda t: (True, ""))
    monkeypatch.setattr(bench.subprocess, "run", fake_run)
    bench.main()
    rec = _last_json(capsys)
    assert rec["error"] == "tpu_unavailable"
