"""Property-based equivalence (SURVEY §5.2.6): random small pages tables ->
single-process oracle == pure merge kernels, and chunked == one-shot.

Ray-free: the kernels are pure (state, rows) -> (state, rows) functions, so
hypothesis can hammer them cheaply. The distributed path over the same kernels
is pinned by tests/test_pipeline_oracle.py.
"""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from audio_feature_extraction_ray.config import FeatureConfig
from audio_feature_extraction_ray.oracle import oracle_features
from audio_feature_extraction_ray.stages.text_stage import prepare_batch
from audio_feature_extraction_ray.state.kernels import (
    SignalsLookup,
    StreamingMerger,
    _sort_dedup,
    merge_partition,
)
from audio_feature_extraction_ray.testdata import _make_html

_URLS = [
    "https://a.example.com/p/1",
    "https://a.example.com/p/2",
    "https://b.example.org/q",
    "https://c.example.net/r",
]
_HOSTS = ["a.example.com", "b.example.org", "c.example.net", "d.example.io"]
_WORDS = ["web", "page", "data", "ray", "arrow", "the", "crawl", "&x", "<y>"]
_BASE_US = 1_700_000_000_000_000  # µs epoch base

row_st = st.tuples(
    st.integers(0, len(_URLS) - 1),            # url
    st.integers(0, 400),                        # ts step units
    st.lists(st.sampled_from(_WORDS), max_size=6),  # tokens
    st.sampled_from(["en", "de", "fr"]),        # lang
)

sig_st = st.tuples(
    st.integers(0, len(_HOSTS) - 1),
    st.integers(0, 400),
    st.floats(0, 10, allow_nan=False),
    st.integers(0, 99),
)


def _pages_table(rows, gap_units: int):
    # ts unit chosen so some gaps straddle the session threshold exactly
    unit_us = 1_000_000
    urls = [_URLS[r[0]] for r in rows]
    ts = [_BASE_US + r[1] * unit_us for r in rows]
    texts = [" ".join(r[2]) for r in rows]
    langs = [r[3] for r in rows]
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(ts, pa.timestamp("us")),
            "html": pa.array([_make_html(t, "t") for t in texts], pa.binary()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
        }
    )


def _signals_table(sigs):
    order = sorted(range(len(sigs)), key=lambda i: (sigs[i][1], sigs[i][0]))
    return pa.table(
        {
            "host": pa.array([_HOSTS[sigs[i][0]] for i in order], pa.string()),
            "ts": pa.array([_BASE_US + sigs[i][1] * 1_000_000 for i in order], pa.timestamp("us")),
            "rank": pa.array([round(sigs[i][2], 4) for i in order], pa.float64()),
            "fetch_ok": pa.array([sigs[i][3] for i in order], pa.int32()),
        }
    )


@settings(max_examples=60, deadline=None)
@given(
    rows=st.lists(row_st, min_size=1, max_size=40),
    sigs=st.lists(sig_st, max_size=10),
    window_k=st.integers(1, 6),
    gap_units=st.integers(1, 50),
)
def test_kernels_match_oracle(rows, sigs, window_k, gap_units):
    pages = _pages_table(rows, gap_units)
    signals = _signals_table(sigs)
    cfg = FeatureConfig(
        window_k=window_k,
        session_gap_s=float(gap_units),  # seconds; ts unit is 1 s
        signals_path="enabled",
    )

    prepared = prepare_batch(pages, cfg)
    engine = merge_partition(prepared, cfg, SignalsLookup(signals))
    oracle = oracle_features(pages, cfg, signals)

    assert engine.num_rows == len(oracle)
    assert engine.column("text").to_pylist() == list(oracle["text"])  # byte identity
    W = len(cfg.feature_order)
    fa = np.array(
        engine.column("features").combine_chunks().flatten().to_numpy(zero_copy_only=False)
    ).reshape(-1, W)
    fb = np.stack(oracle["features"].to_numpy()) if len(oracle) else np.zeros((0, W))
    np.testing.assert_allclose(fa, fb, equal_nan=True, atol=1e-12)


@settings(max_examples=40, deadline=None)
@given(
    rows=st.lists(row_st, min_size=2, max_size=40),
    cut=st.data(),
    window_k=st.integers(1, 6),
)
def test_chunked_equals_oneshot(rows, cut, window_k):
    pages = _pages_table(rows, 10)
    cfg = FeatureConfig(window_k=window_k, session_gap_s=10.0)
    prepared = _sort_dedup(prepare_batch(pages, cfg))
    one = StreamingMerger(cfg).process_chunk(prepared)

    n = prepared.num_rows
    i = cut.draw(st.integers(1, n - 1)) if n > 1 else 1
    m = StreamingMerger(cfg)
    parts = [m.process_chunk(prepared.slice(0, i)), m.process_chunk(prepared.slice(i))]
    two = pa.concat_tables(parts)

    W = len(cfg.feature_order)
    a = np.array(one.column("features").combine_chunks().flatten().to_numpy(zero_copy_only=False))
    b = np.array(two.column("features").combine_chunks().flatten().to_numpy(zero_copy_only=False))
    np.testing.assert_array_equal(a.reshape(-1, W).view(np.uint64), b.reshape(-1, W).view(np.uint64))


# ---------------------------------------------------------------------------
# window-stage kernel properties (pure, no Ray)


@given(
    st.lists(
        st.tuples(
            st.integers(0, 5),                # key (few -> collisions)
            st.integers(-50, 50),             # value scaled to 0.1 steps -> ties
        ),
        min_size=1,
        max_size=200,
    ),
    st.integers(1, 5),  # k
    st.booleans(),      # descending
)
@settings(max_examples=60, deadline=None)
def test_topk_kernel_matches_pandas_and_is_idempotent_combiner(rows, k, descending):
    import pandas as pd

    from audio_feature_extraction_ray.stages.window import _topk_kernel

    tbl = pa.table(
        {
            "k": pa.array([r[0] for r in rows], pa.int64()),
            "id": pa.array(range(len(rows)), pa.int64()),
            "v": pa.array([r[1] / 10.0 for r in rows], pa.float64()),
        }
    )
    out = _topk_kernel(tbl, "k", "v", "id", k, descending, with_rank=True).to_pandas()
    ref = tbl.to_pandas()
    ref["rank"] = (
        ref.sort_values(["v", "id"], ascending=[not descending, True])
        .groupby("k")
        .cumcount()
        .add(1)
    )
    ref = ref[ref["rank"] <= k]
    a = out.sort_values(["k", "rank"]).reset_index(drop=True)
    b = ref.sort_values(["k", "rank"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a[["k", "id", "v", "rank"]], b[["k", "id", "v", "rank"]])
    # combiner property: splitting the input, pre-filtering each half with
    # the same kernel, then finishing == finishing the raw input directly
    cut = len(rows) // 2
    halves = [tbl.slice(0, cut), tbl.slice(cut)]
    pre = pa.concat_tables(
        _topk_kernel(h, "k", "v", "id", k, descending, with_rank=False)
        for h in halves
        if h.num_rows
    )
    out2 = _topk_kernel(pre, "k", "v", "id", k, descending, with_rank=True).to_pandas()
    c = out2.sort_values(["k", "rank"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a[["k", "id", "v", "rank"]], c[["k", "id", "v", "rank"]])
