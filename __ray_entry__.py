"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported: nothing here
(or in the library) calls ray.init()/ray.shutdown().

- entry(): flagship point-in-time feature pipeline (as-of + LOCF + lag +
  rolling + sessionize) over the deterministic synthetic `pages` fixture
  (FIXTURES.md) sized for sf0.001, plus a sanity read of the sf0.001 events
  table through the same operator family.
- queries(): one entry per operator family from SURVEY.md §2 over the
  driver's parquet tables.
- oracle_sql(): DuckDB-equivalent SQL with IDENTICAL column names; money
  aggregates are computed in integer cents on both sides so values match
  bit-exactly. Non-SQL-expressible ops omit the oracle (rows-only check).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    from audio_feature_extraction_ray.config import EngineConfig, FeatureConfig, PipelineConfig
    from audio_feature_extraction_ray.pipelines.features import feature_dataset
    from audio_feature_extraction_ray.testdata import materialize_fixture

    pages_dir, signals_path = materialize_fixture("/tmp/afe_fixtures/entry", 2_000, n_files=2)
    cfg = PipelineConfig(
        input_path=pages_dir,
        features=FeatureConfig(signals_path=signals_path),
        engine=EngineConfig(num_partitions=8),
    )
    return feature_dataset(cfg)


def queries() -> dict[str, Callable[[str], Any]]:
    from audio_feature_extraction_ray.pipelines import events, relational

    q: dict[str, Callable[[str], Any]] = {
        # point-in-time feature family (SURVEY §2.3/2.5/2.9) over `events`
        "events_lag_lead": events.lag_lead,
        "events_sessionize": events.sessionize,
        "events_rolling": events.rolling,
        "events_locf": events.locf,
        "events_asof_join": events.asof_join,
        "events_dedup_first": events.dedup_first,
        "events_window_agg": events.window_agg,
        # relational family (SURVEY §2.1/2.2/2.5/2.6/2.7)
        "q1_pricing": relational.q1_pricing,
        "revenue_by_segment": relational.revenue_by_segment,
        "topk_parts": relational.topk_parts,
        "filter_project": relational.filter_project,
        "segment_stats": relational.segment_stats,
    }
    return q


def oracle_sql() -> dict[str, str]:
    from audio_feature_extraction_ray.pipelines import events, relational

    return {
        "events_lag_lead": events.LAG_LEAD_SQL,
        "events_sessionize": events.SESSIONIZE_SQL,
        "events_rolling": events.ROLLING_SQL,
        "events_locf": events.LOCF_SQL,
        "events_asof_join": events.ASOF_JOIN_SQL,
        "events_dedup_first": events.DEDUP_FIRST_SQL,
        "events_window_agg": events.WINDOW_AGG_SQL,
        "q1_pricing": relational.Q1_SQL,
        "revenue_by_segment": relational.REVENUE_BY_SEGMENT_SQL,
        "topk_parts": relational.TOPK_PARTS_SQL,
        "filter_project": relational.FILTER_PROJECT_SQL,
        "segment_stats": relational.SEGMENT_STATS_SQL,
    }
