"""CLI surface (reference analog: click extract/reconstruct commands,
design.md:2432-2457): gen-fixture -> run -> verify round-trip, plus config
validation errors surfacing at build time."""

import json

import pytest

from audio_feature_extraction_ray.cli import main
from audio_feature_extraction_ray.config import PipelineConfig


def test_cli_run_and_verify(ray_session, tmp_path, capsys):
    fx = tmp_path / "fx"
    rc = main(["gen-fixture", "--out", str(fx), "--rows", "500", "--files", "2"])
    assert rc == 0
    paths = json.loads(capsys.readouterr().out.strip())

    out = tmp_path / "out"
    rc = main(
        [
            "run",
            "--input", paths["pages"],
            "--signals", paths["signals"],
            "--output", str(out),
            "--partitions", "4",
        ]
    )
    assert rc == 0
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert report["partitions"] == 4 and report["rows_out"] > 0

    rc = main(["verify", "--output", str(out)])
    assert rc == 0
    v = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert v == {"ok": True, "partitions_checked": 4}


def test_cli_run_resume_flag(ray_session, tmp_path, capsys):
    fx = tmp_path / "fx"
    main(["gen-fixture", "--out", str(fx), "--rows", "300", "--files", "1"])
    paths = json.loads(capsys.readouterr().out.strip())
    out = tmp_path / "out"
    args = ["run", "--input", paths["pages"], "--signals", paths["signals"],
            "--output", str(out), "--partitions", "3"]
    main(args)
    capsys.readouterr()
    rc = main(args + ["--resume"])
    assert rc == 0
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert report["resumed_partitions"] == 3 and report["rows_out"] > 0


def test_config_from_file_and_validation(tmp_path):
    p = tmp_path / "cfg.json"
    p.write_text(json.dumps({"input_path": "/x", "features": {"window_k": 3}}))
    cfg = PipelineConfig.from_file(p)
    assert cfg.features.window_k == 3

    bad = tmp_path / "bad.json"
    bad.write_text(json.dumps({"features": {"window_k": 0}}))
    with pytest.raises(ValueError, match="window_k"):
        PipelineConfig.from_file(bad)

    with pytest.raises(ValueError, match="resume"):
        PipelineConfig.from_dict({"engine": {"resume": True}})
