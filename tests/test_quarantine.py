"""Bad-record policy (SURVEY M4/P8): error vs quarantine, typed errors,
quarantine accounting in the job report."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _corrupted_dir(tmp_path, pages, n_bad_url=2, n_bad_html=1):
    """Write the pages fixture with nulls planted in required columns."""
    url = pages.column("url").to_pylist()
    html = pages.column("html").to_pylist()
    bad_rows = set()
    for i in range(n_bad_url):
        url[7 + 13 * i] = None
        bad_rows.add(7 + 13 * i)
    for i in range(n_bad_html):
        html[31 + 17 * i] = None
        bad_rows.add(31 + 17 * i)
    corrupted = pa.table(
        {
            "url": pa.array(url, pa.string()),
            "warc_ts": pages.column("warc_ts"),
            "html": pa.array(html, pa.binary()),
            "text": pages.column("text"),
            "lang": pages.column("lang"),
        }
    )
    d = tmp_path / "corrupt_pages"
    d.mkdir()
    pq.write_table(corrupted, d / "part-0.parquet")
    return str(d), len(bad_rows)


def test_error_policy_fails_fast(ray_session, small_fixture, tmp_path):
    from audio_feature_extraction_ray.config import EngineConfig, PipelineConfig
    from audio_feature_extraction_ray.pipelines.features import run

    pages, _ = small_fixture
    in_dir, _ = _corrupted_dir(tmp_path, pages)
    cfg = PipelineConfig(
        input_path=in_dir,
        engine=EngineConfig(num_partitions=4, output_dir=str(tmp_path / "out_err")),
    )
    # Ray wraps worker exceptions (RayTaskError); assert on the typed message
    with pytest.raises(Exception, match="SchemaError|nulls"):
        run(cfg)


def test_quarantine_policy_skips_and_counts(ray_session, small_fixture, tmp_path):
    from audio_feature_extraction_ray.config import EngineConfig, FeatureConfig, PipelineConfig
    from audio_feature_extraction_ray.pipelines.features import run

    pages, _ = small_fixture
    in_dir, n_bad = _corrupted_dir(tmp_path, pages)
    cfg = PipelineConfig(
        input_path=in_dir,
        features=FeatureConfig(bad_rows="quarantine"),
        engine=EngineConfig(num_partitions=4, output_dir=str(tmp_path / "out_q")),
    )
    report = run(cfg)
    assert report["rows_quarantined"] == n_bad
    assert report["rows_in"] == pages.num_rows - n_bad
    # quarantined urls are absent from the output
    out = pq.read_table(f"{tmp_path}/out_q/part=00000/data.parquet", columns=["url"])
    assert out.column("url").null_count == 0


def test_clean_input_quarantine_count_is_zero(ray_session, small_fixture_dir, tmp_path):
    from audio_feature_extraction_ray.config import EngineConfig, FeatureConfig, PipelineConfig
    from audio_feature_extraction_ray.pipelines.features import run

    pages_dir, _ = small_fixture_dir
    cfg = PipelineConfig(
        input_path=pages_dir,
        features=FeatureConfig(bad_rows="quarantine"),
        engine=EngineConfig(num_partitions=4, output_dir=str(tmp_path / "out_clean")),
    )
    report = run(cfg)
    assert report["rows_quarantined"] == 0


def test_error_hierarchy_and_config_error(ray_session):
    from audio_feature_extraction_ray.config import FeatureConfig, PipelineConfig
    from audio_feature_extraction_ray.errors import ConfigError, PipelineError, SchemaError

    assert issubclass(ConfigError, PipelineError)
    assert issubclass(SchemaError, PipelineError)
    assert issubclass(PipelineError, ValueError)  # legacy except-sites keep working
    cfg = PipelineConfig(input_path="x", features=FeatureConfig(bad_rows="nope"))
    with pytest.raises(ConfigError, match="bad_rows"):
        cfg.validate()


def test_quarantine_changes_fingerprint():
    from audio_feature_extraction_ray.config import FeatureConfig, PipelineConfig

    a = PipelineConfig(input_path="x").semantics_fingerprint()
    b = PipelineConfig(
        input_path="x", features=FeatureConfig(bad_rows="quarantine")
    ).semantics_fingerprint()
    assert a != b  # policy changes outputs -> resume must not mix them
