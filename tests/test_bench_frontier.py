"""bench.py frontier extras: the one-checkpoint quality+RTF block must be
fail-safe — the headline metric line may never be broken by a missing or
corrupt frontier artifact (VERDICT r3 item 3: quality and RTF from one
checkpoint, reported only once the trained run exists)."""

import json

import bench


def test_frontier_absent_artifact_is_silent(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)  # no outputs/ here at all
    assert bench.bench_frontier() == {}


def test_frontier_corrupt_artifact_reports_error(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    workdir = tmp_path / "outputs" / "imf_frontier_v2"
    workdir.mkdir(parents=True)
    (workdir / "evaluation_results_step65k.json").write_text("{not json")
    out = bench.bench_frontier()
    assert "frontier_error" in out
    assert "frontier_rtf" not in out


def test_frontier_missing_checkpoint_reports_error(tmp_path, monkeypatch):
    """A valid eval JSON but no checkpoint dir -> error field, no raise."""
    monkeypatch.chdir(tmp_path)
    workdir = tmp_path / "outputs" / "imf_frontier_v2"
    workdir.mkdir(parents=True)
    payload = {"nfe_sweep": {"1": {"si_snr_db": 15.0, "nsim": 0.9}}}
    (workdir / "evaluation_results_step65k.json").write_text(
        json.dumps(payload))
    out = bench.bench_frontier()
    assert "frontier_error" in out
    assert "frontier_rtf" not in out
