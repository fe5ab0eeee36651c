"""bench.py harness behavior (no TPU needed): the B-sweep isolates
per-batch failures and distinguishes software failures from outages."""

import json


def _last_json(capsys):
    out = capsys.readouterr().out
    return json.loads([l for l in out.splitlines() if l.startswith("{")][-1])


def test_worker_isolates_one_failing_batch(monkeypatch, capsys):
    import bench

    def fake_measure(b):
        if b == 64:
            raise RuntimeError("RESOURCE_EXHAUSTED: out of memory")
        return 100.0 + b

    monkeypatch.setattr(bench, "measure", fake_measure)
    bench.worker()
    rec = _last_json(capsys)
    # the measured points survive; the failure is reported, not fatal,
    # and not mislabeled as a tunnel outage
    assert rec["value"] == 132.0 and rec["batch"] == 32
    assert set(rec["sweep"]) == {"8", "16", "32"}
    assert "RESOURCE_EXHAUSTED" in rec["sweep_errors"]["64"]
    assert "error" not in rec


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
