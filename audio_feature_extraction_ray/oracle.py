"""Single-process reference oracle for the point-in-time feature pipeline.

This is the semantics CONTRACT (north rule: distributed output must match this
allclose at every (url, warc_ts) with zero temporal leakage). Deliberately
simple pandas/numpy; shares only the deterministic leaf functions
(extract_text, hashing) with the engine — all windowing / sessionization /
as-of logic here is written independently of the Ray implementation.

Reference analog: the spec's single-threaded PipelineExecutor / StreamBuffer
semantics (design.md:1725-1792, 1851-2002) — explicit carried state, chunk
order = time order.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .config import FeatureConfig
from .functions.text import (
    char_count,
    extract_text,
    jaccard,
    ngram_bucket_hist,
    token_count,
    token_hashes64,
)


def host_of(url: str) -> str:
    return url.split("/")[2]


def oracle_features(
    pages: pa.Table | pd.DataFrame,
    cfg: FeatureConfig,
    signals: pa.Table | pd.DataFrame | None = None,
) -> pd.DataFrame:
    """Compute the full feature table single-process. Returns a DataFrame
    sorted by (url, warc_ts) with the columns of cfg.feature_order plus
    url, warc_ts, text, host, and the packed `features` list column."""
    df = pages.to_pandas() if isinstance(pages, pa.Table) else pages.copy()
    # 1. extract text (byte-identity invariant vs stored `text` checked in tests)
    df["text"] = [extract_text(h) for h in df["html"]]
    df["host"] = [host_of(u) for u in df["url"]]
    df = df.drop(columns=["html"])

    # 2. sort + dedup exact (url, warc_ts) keep-first
    df = df.sort_values(["url", "warc_ts"], kind="mergesort").reset_index(drop=True)
    df = df.drop_duplicates(subset=["url", "warc_ts"], keep="first").reset_index(drop=True)

    # 3. per-row text features
    B = cfg.ngram_buckets
    df["token_count"] = [float(token_count(t)) for t in df["text"]]
    df["char_count"] = [float(char_count(t)) for t in df["text"]]
    hists = np.stack([ngram_bucket_hist(t, B) for t in df["text"]]) if len(df) else np.zeros((0, B))
    for i in range(B):
        df[f"ngram_b{i}"] = hists[:, i]

    # 4. history features per url (ascending warc_ts; leakage-free: only rows
    #    with ts <= current contribute)
    g = df.groupby("url", sort=False)
    df["ts_since_prev"] = (df["warc_ts"] - g["warc_ts"].shift(1)).dt.total_seconds()  # NaN at head

    new_sess = (df["ts_since_prev"] > cfg.session_gap_s).fillna(False)
    df["session_id"] = new_sess.groupby(df["url"], sort=False).cumsum().astype("float64")
    df["session_len"] = df.groupby(["url", "session_id"], sort=False).cumcount().astype("float64") + 1.0

    lang_change = (df["lang"] != g["lang"].shift(1)) | df["ts_since_prev"].isna()
    run_id = lang_change.groupby(df["url"], sort=False).cumsum()
    df["lang_run_length"] = df.groupby(["url", run_id], sort=False).cumcount().astype("float64") + 1.0

    df["lag1_token_count"] = g["token_count"].shift(1)

    k = cfg.window_k
    df["rw_mean_token_count"] = g["token_count"].transform(
        lambda s: s.rolling(k, min_periods=1).mean()
    )
    df["rw_max_token_count"] = g["token_count"].transform(
        lambda s: s.rolling(k, min_periods=1).max()
    )

    # text churn vs previous revisit: 1 - jaccard(token hash sets)
    churn = np.full(len(df), np.nan)
    hashes = [token_hashes64(t) for t in df["text"]]
    url_arr = df["url"].to_numpy()
    for i in range(len(df)):
        if i > 0 and url_arr[i] == url_arr[i - 1]:
            churn[i] = 1.0 - jaccard(hashes[i], hashes[i - 1])
    df["text_churn"] = churn

    # 5. as-of LOCF against signals (right.ts <= warc_ts, exact tie matches)
    if signals is not None:
        sig = signals.to_pandas() if isinstance(signals, pa.Table) else signals.copy()
        sig = sig.sort_values(["ts", "host"], kind="mergesort")
        left = df[["url", "warc_ts", "host"]].reset_index()  # keep original row order
        left = left.sort_values(["warc_ts", "url"], kind="mergesort")
        merged = pd.merge_asof(
            left,
            sig.rename(columns={"rank": "locf_rank", "fetch_ok": "locf_fetch_ok"}),
            left_on="warc_ts",
            right_on="ts",
            by="host",
            allow_exact_matches=True,
            direction="backward",
        )
        merged = merged.sort_values("index")
        df["locf_rank"] = merged["locf_rank"].to_numpy(dtype="float64", na_value=np.nan)
        df["locf_fetch_ok"] = merged["locf_fetch_ok"].to_numpy(dtype="float64", na_value=np.nan)

    # 5b. plugin extractors (same registered pure functions as the engine —
    # the oracle checks the distribution, ordering and state logic, which is
    # where the two implementations are independent)
    extra_cols: list[str] = []
    if cfg.extra_features:
        import pyarrow as _pa

        from .functions.registry import get_feature

        tbl = _pa.Table.from_pandas(df, preserve_index=False)
        for name in cfg.extra_features:
            for cname, arr in get_feature(name)(tbl).items():
                df[cname] = np.asarray(arr, dtype="float64")
                extra_cols.append(cname)

    # 5c. lead labels (reversed pass; label_ prefix, never packed as features)
    label_cols: list[str] = []
    if cfg.emit_labels:
        df["label_lead1_token_count"] = g["token_count"].shift(-1)
        df["label_ts_to_next"] = (
            g["warc_ts"].shift(-1) - df["warc_ts"]
        ).dt.total_seconds()
        label_cols = ["label_lead1_token_count", "label_ts_to_next"]

    # 6. pack the fixed-width feature vector (nulls -> NaN)
    order = cfg.feature_order
    mat = df[order].to_numpy(dtype="float64", na_value=np.nan)
    df["features"] = list(mat)

    out_cols = (
        ["url", "warc_ts", "host", "text", "lang"] + order + extra_cols + label_cols + ["features"]
    )
    return df[out_cols].reset_index(drop=True)
