"""Tools layer: config generation, migration CLI, aggregation, tables."""

import json
from pathlib import Path

import pytest

from meanflow_audio_codec_tpu.configs import load_config_from_json
from meanflow_audio_codec_tpu.tools.aggregate_results import (
    group_stats,
    load_rows,
    write_csv,
)
from meanflow_audio_codec_tpu.tools.generate_configs import (
    generate_ablations,
    generate_matrix,
)
from meanflow_audio_codec_tpu.tools.generate_tables import (
    generate_tables,
    render_table,
)
from meanflow_audio_codec_tpu.tools.migrate_configs import migrate_file


def test_generate_matrix_48_configs(tmp_path):
    written = generate_matrix(tmp_path, workdir_root=str(tmp_path / "out"))
    assert len(written) == 48
    names = {p.stem for p in written}
    assert ("method=improved_mean_flow--architecture=convnet--dataset=audio"
            "--tokenization=mdct") in names
    # every config loads and validates
    for path in written:
        config = load_config_from_json(path)
        assert config.method in ("autoencoder", "flow_matching", "mean_flow",
                                 "improved_mean_flow")


def test_generate_ablations(tmp_path):
    written = generate_ablations(tmp_path, workdir_root=str(tmp_path))
    names = {p.stem for p in written}
    assert any(n.startswith("ablation--gamma=") for n in names)
    assert any(n.startswith("ablation--size=") for n in names)
    assert "ablation--no_stop_gradient" in names
    assert any(n.startswith("ablation--full_interval=") for n in names)
    for path in written:
        load_config_from_json(path)


def test_migrate_file(tmp_path):
    flat = {"batch_size": 8, "n_steps": 10, "base_lr": 1e-4,
            "weight_decay": 0.0, "seed": 0, "noise_dimension": 16,
            "condition_dimension": 4, "latent_dimension": 4, "num_blocks": 1,
            "sample_every": 5, "sample_seed": 0, "sample_steps": 2,
            "workdir": "/tmp/w"}
    src = tmp_path / "v1.json"
    src.write_text(json.dumps(flat))
    assert migrate_file(src, src) is True
    migrated = json.loads(src.read_text())
    assert migrated["config_version"] == "2.0"
    assert migrated["base"]["batch_size"] == 8
    assert migrate_file(src, src) is False  # idempotent


def test_aggregate_and_tables(tmp_path):
    csv_path = tmp_path / "metrics.csv"
    csv_path.write_text(
        "method,architecture,nfe,mse,psnr_db\n"
        "imf,mlp,1,0.5,20.0\n"
        "imf,mlp,1,0.7,19.0\n"
        "imf,mlp,10,0.2,25.0\n"
        "fm,mlp,10,0.9,15.0\n")
    rows = load_rows(csv_path)
    assert rows[0]["mse"] == 0.5

    summary = group_stats(rows, ("method", "nfe"))
    by_key = {(r["method"], r["nfe"]): r for r in summary}
    assert by_key[("imf", 1.0)]["mse_mean"] == pytest.approx(0.6)
    assert by_key[("imf", 1.0)]["n"] == 2

    out_csv = tmp_path / "agg.csv"
    write_csv(summary, out_csv)
    assert out_csv.exists()

    written = generate_tables(csv_path, tmp_path / "tables")
    extensions = {p.suffix for p in written}
    assert extensions == {".tex", ".md", ".csv", ".html"}
    latex = next(p for p in written if p.suffix == ".tex")
    assert "\\begin{table}" in latex.read_text()
    markdown = next(p for p in written
                    if p.suffix == ".md" and "method_ablation" in p.name)
    assert "|" in markdown.read_text()


def test_curated_tables(tmp_path):
    """One call renders the reference's 8 named tables (Tables 1-8,
    reference tools/generate_tables.py:43-421) from the run CSVs."""
    from meanflow_audio_codec_tpu.tools.generate_tables import (
        generate_curated_tables,
    )
    root = tmp_path
    (root / "outputs/matrix_mnist").mkdir(parents=True)
    (root / "outputs/ablations").mkdir(parents=True)
    (root / "outputs/imf_audio_quality_v2").mkdir(parents=True)
    header = ("config,method,architecture,dataset,tokenization,nfe,"
              "param_count,inference_mean_sec,mse,psnr_db,ssim,fid_pixel\n")
    (root / "outputs/matrix_mnist/metrics.csv").write_text(
        header
        + "c,mean_flow,mlp,mnist,reshape,1,1e6,0.1,0.1,20.0,0.8,10.0\n"
        + "c,mean_flow,mlp,mnist,reshape,10,1e6,0.3,0.05,23.0,0.9,5.0\n"
        + "c,flow_matching,convnet,mnist,mdct,1,2e6,0.2,0.4,12.0,0.5,90.0\n")
    (root / "outputs/ablations/metrics.csv").write_text(
        header
        + "ablation--lr=0.001,mean_flow,mlp,mnist,reshape,1,1e6,"
          "0.1,0.2,18.0,0.7,20.0\n")
    (root / "outputs/imf_audio_quality_v2/metrics.csv").write_text(
        "config,method,architecture,dataset,tokenization,nfe,param_count,"
        "inference_mean_sec,mse,si_snr_db,stoi\n"
        "c,improved_mean_flow,convnet,audio,mdct,1,1e8,9.0,0.06,17.9,0.91\n")
    written = generate_curated_tables(root, root / "outputs/tables")
    names = {p.stem for p in written}
    assert names == {"main_results", "method_ablation",
                     "architecture_ablation", "tokenization",
                     "hyperparameter_sensitivity", "efficiency",
                     "dataset_transfer", "baseline_comparison"}
    assert {p.suffix for p in written} == {".tex", ".md", ".csv", ".html"}
    hyper = (root / "outputs/tables/hyperparameter_sensitivity.md").read_text()
    assert "| lr | 0.001 |" in hyper
    transfer = (root / "outputs/tables/dataset_transfer.md").read_text()
    assert "audio" in transfer and "mnist" in transfer
    main = (root / "outputs/tables/main_results.md").read_text()
    assert "17.9" in main  # the audio codec row carries SI-SNR


def test_render_table_formats():
    rows = [{"a": 1.23456, "b": "x"}]
    assert "1.235" in render_table(rows, "csv")
    assert render_table(rows, "markdown").startswith("| a | b |")
    assert "<table>" in render_table(rows, "html")
    with pytest.raises(ValueError):
        render_table(rows, "org")
    assert render_table([], "csv") == ""


def test_benchmark_audio_decoders(tmp_path, capsys):
    """Decoder comparison runs on a synthetic corpus; available backends
    emit rate rows, missing backends emit skip rows (never crash)."""
    from meanflow_audio_codec_tpu.tools.benchmarks.benchmark_audio_decoders import (
        main as bench_main,
    )
    rc = bench_main(["--n-files", "3", "--seconds", "0.2", "--repeats", "1"])
    assert rc == 0
    rows = [json.loads(line) for line in
            capsys.readouterr().out.strip().splitlines()]
    by_backend = {r["backend"]: r for r in rows}
    # the always-present core set; new optional backends may add rows
    # (skip rows at minimum) without invalidating the benchmark contract
    assert {"stdlib_wave", "native_cpp", "native_cpp_flac", "soundfile",
            "librosa", "minimp3py", "sdl_mixer"} <= set(by_backend)
    wave_row = by_backend["stdlib_wave"]
    assert wave_row["files"] == 3 and wave_row["files_per_sec"] > 0
    assert by_backend["minimp3py"].get("skipped")  # no mp3 files in corpus


def test_ablation_tables(tmp_path):
    from meanflow_audio_codec_tpu.tools.ablation_tables import (
        build_family_tables,
        main as ablation_main,
        parse_knob,
    )

    assert parse_knob("ablation--gamma=0.5") == ("gamma", "0.5")
    assert parse_knob("ablation--no_stop_gradient") == ("stop_gradient",
                                                        "False")
    assert parse_knob("ablation--unweighted_loss") == ("loss_weighting",
                                                       "unweighted")
    assert parse_knob("matrix--foo") is None

    csv_path = tmp_path / "metrics.csv"
    csv_path.write_text(
        "config,nfe,mse,psnr_db\n"
        "ablation--gamma=1.0,1,0.10,16.0\n"
        "ablation--gamma=0.5,1,0.20,13.0\n"
        "ablation--gamma=0.5,10,0.15,14.0\n"
        "ablation--no_stop_gradient,1,0.30,11.0\n")
    rows = [dict(r) for r in __import__("csv").DictReader(
        csv_path.open())]
    tables = build_family_tables(rows)
    assert set(tables) == {"gamma", "stop_gradient"}
    gamma = tables["gamma"]
    # numeric sort: 0.5 row before 1.0 row; missing nfe cell is an em dash
    assert gamma.index("| 0.5 ") < gamma.index("| 1.0 ")
    assert "—" in gamma

    out_dir = tmp_path / "tables"
    assert ablation_main(["--csv", str(csv_path),
                          "--out-dir", str(out_dir)]) == 0
    assert (out_dir / "ablation_gamma.md").exists()


def test_eval_suite_multi_cross_family(tmp_path, monkeypatch):
    """--cross-family accepts several families (round 5): a mixed-family
    run's evidence protocol needs a per-family breakdown, one result file
    per family, all in one process (compile sharing on the tunnel)."""
    from meanflow_audio_codec_tpu.tools import eval_suite

    (tmp_path / "config.json").write_text("{}")
    calls = []

    def fake_evaluate(config_path, results_name=None, **kwargs):
        calls.append((results_name, kwargs.get("synthetic_family")))

    monkeypatch.setattr(eval_suite, "evaluate_config", fake_evaluate)
    rc = eval_suite.main([
        "--workdir", str(tmp_path), "--label", "_stepX",
        "--nfe", "1", "--latent-steps", "--latent-bits", "0",
        "--cross-family", "tonal", "rich", "speech"])
    assert rc == 0
    tags = [c[0] for c in calls]
    assert tags == [
        "evaluation_results_stepX.json",
        "evaluation_results_stepX_tonal.json",
        "evaluation_results_stepX_rich.json",
        "evaluation_results_stepX_speech.json"]
    assert [c[1] for c in calls[1:]] == ["tonal", "rich", "speech"]


def test_eval_suite_empty_cross_family_skips(tmp_path, monkeypatch):
    from meanflow_audio_codec_tpu.tools import eval_suite

    (tmp_path / "config.json").write_text("{}")
    calls = []
    monkeypatch.setattr(
        eval_suite, "evaluate_config",
        lambda config_path, results_name=None, **kw: calls.append(results_name))
    rc = eval_suite.main([
        "--workdir", str(tmp_path), "--nfe", "1", "--latent-steps",
        "--latent-bits", "0", "--cross-family"])
    assert rc == 0
    assert calls == ["evaluation_results.json"]
