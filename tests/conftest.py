import pytest


@pytest.fixture(scope="session")
def ray_session():
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=4,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def small_fixture():
    """(pages Table, signals Table) at sf-small, deterministic."""
    from audio_feature_extraction_ray.testdata import generate_pages

    return generate_pages(2000)


@pytest.fixture(scope="session")
def small_fixture_dir(tmp_path_factory):
    """Materialized parquet fixture: (pages_dir, signals_path)."""
    from audio_feature_extraction_ray.testdata import materialize_fixture

    d = tmp_path_factory.mktemp("afe_small")
    return materialize_fixture(d, 2000, n_files=2)
