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
    bench.worker()
    rec = _last_json(capsys)
    # the measured points survive; the failure is reported, not fatal,
    # and not mislabeled as a tunnel outage
    assert rec["value"] == 100.0 + max(ok) and rec["batch"] == max(ok)
    assert set(rec["sweep"]) == {str(b) for b in ok}
    assert "RESOURCE_EXHAUSTED" in rec["sweep_errors"][str(fail_b)]
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
