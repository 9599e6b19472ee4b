"""Hive-layout partitioned source: key=value directory discovery with
partition pruning BEFORE any file is listed or read, and the partition
value re-attached as a column.

Scale shape: at 100 TB the corpus lives in thousands of key=value
directories; a filter on the partition key must prune whole directories at
plan time (a driver-side metadata listing — one readdir), so the pruned
partitions never contribute file-listing, metadata-fetch, or read tasks.
The surviving directories each become an independent `read_parquet` (their
own projection pushdown), unioned lazily — Ray streams the union without
materializing either side.

The registered query (`events_hive_pruned`) builds an idempotent
partitioned mirror of the `events` table under /tmp (write once, `_DONE`
marker, layout keyed by the source fingerprint), reads it back pruned to
PRUNE_KEEP, and aggregates — oracled by the equivalent WHERE ... IN SQL
over the unpartitioned table. A pytest pins the pruning contract via
`input_files()`: no file outside the kept directories is ever touched.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

PRUNE_KEEP = ("click", "purchase")
_HIVE_KEY = "event_type"


def build_hive_fixture(sf_dir: str) -> str:
    """Partition events.parquet by event_type into a key=value layout under
    /tmp. Idempotent: keyed by (absolute source path, file size) so every
    sf_dir gets its own mirror; a _DONE marker skips rebuilds."""
    src = os.path.abspath(f"{sf_dir}/events.parquet")
    tag = hashlib.sha256(
        f"{src}:{os.path.getsize(src)}".encode()
    ).hexdigest()[:16]
    root = f"/tmp/audio_feature_extraction_hive_{tag}"
    done = os.path.join(root, "_DONE")
    if os.path.exists(done):
        return root
    ds = ray.data.read_parquet(src)
    ds.write_parquet(root, partition_cols=[_HIVE_KEY])
    with open(done, "w") as f:
        f.write(src)
    return root


def prune_hive_dirs(root: str, key: str, allowed: tuple[str, ...]) -> list[tuple[str, str]]:
    """Plan-time partition pruning: ONE driver readdir; returns the
    (value, path) list of surviving key=value directories. Pruned
    directories are never listed further, so they contribute no
    file-listing, metadata, or read tasks downstream."""
    keep = []
    for entry in sorted(os.listdir(root)):
        if not entry.startswith(f"{key}="):
            continue
        value = entry.split("=", 1)[1]
        if value in allowed:
            keep.append((value, os.path.join(root, entry)))
    return keep


def read_hive_partitioned(
    root: str,
    key: str,
    allowed: tuple[str, ...],
    columns: list[str] | None = None,
) -> ray.data.Dataset:
    """Read only the key=value directories whose value is in `allowed`;
    the partition value is re-attached as a string column (hive layouts do
    not store it in the files)."""
    keep = prune_hive_dirs(root, key, allowed)
    parts = []
    for value, path in keep:
        ds = ray.data.read_parquet(path, columns=columns)
        parts.append(
            ds.map_batches(
                lambda t, v=value: t.append_column(
                    key, pa.array(np.full(t.num_rows, v, dtype=object), pa.string())
                ),
                batch_format="pyarrow",
            )
        )
    if not parts:
        return ray.data.from_arrow(
            pa.table({key: pa.array([], pa.string())})
        ).limit(0)
    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    return out


def hive_pruned_agg(sf_dir: str) -> pd.DataFrame:
    """Count + integer-cents sum per kept partition, read through the pruned
    hive layout."""
    root = build_hive_fixture(sf_dir)
    ds = read_hive_partitioned(root, _HIVE_KEY, PRUNE_KEEP, columns=["value"])

    def partial(tbl: pa.Table) -> pa.Table:
        vc = np.round(
            tbl.column("value").to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        ty = tbl.column(_HIVE_KEY)
        de = pc.dictionary_encode(ty.combine_chunks() if isinstance(ty, pa.ChunkedArray) else ty)
        codes = de.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        k = len(de.dictionary)
        n = np.zeros(k, dtype=np.int64)
        s = np.zeros(k, dtype=np.int64)
        np.add.at(n, codes, 1)
        np.add.at(s, codes, vc)
        return pa.table(
            {
                "event_type": de.dictionary,
                "n_events": pa.array(n, pa.int64()),
                "sum_value_c": pa.array(s, pa.int64()),
            }
        )

    from ..stages.fold import exchange_fold

    folded = exchange_fold(
        ds.map_batches(partial, batch_format="pyarrow"),
        lambda t: t.group_by("event_type")
        .aggregate([("n_events", "sum"), ("sum_value_c", "sum")])
        .rename_columns(["event_type", "n_events", "sum_value_c"]),
    )
    if folded is None:
        return pd.DataFrame(
            {
                "event_type": pd.Series([], dtype=object),
                "n_events": pd.Series([], dtype=np.int64),
                "sum_value_c": pd.Series([], dtype=np.int64),
            }
        )
    return (
        folded.to_pandas()
        .groupby("event_type", as_index=False)[["n_events", "sum_value_c"]]
        .sum()
        .sort_values("event_type")
        .reset_index(drop=True)
    )


_KEEP_IN = ", ".join(f"'{v}'" for v in PRUNE_KEEP)
HIVE_PRUNED_SQL = f"""
SELECT event_type, count(*) AS n_events,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_value_c
FROM events WHERE event_type IN ({_KEEP_IN})
GROUP BY 1 ORDER BY 1
"""
