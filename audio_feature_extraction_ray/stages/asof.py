"""Generic co-partitioned sorted-merge as-of join (SURVEY §2.5 J2, large
right side).

When the right side is too big to broadcast (engine.broadcast_signals_max_rows),
both sides are hash-partitioned ON THE SAME KEY into the same partition ids,
unioned with a side tag, and merged per partition with one sorted forward
pass per key segment ("<=" tie semantics: an equal-timestamp right row IS
visible to the left row).

Partitioning contract: the join key must be the partition key of both sides
(for the pages pipeline that means partitioning by host instead of url when
signals are host-keyed — a config choice; url-keyed partitioning keeps the
broadcast path).
"""

from __future__ import annotations

import functools

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from ..state.partition import url_hash64


def _tag_and_project(
    tbl: pa.Table,
    side: int,
    key: str,
    ts: str,
    all_cols: list[str],
    col_types: dict,
    num_partitions: int,
) -> pa.Table:
    n = tbl.num_rows
    cols: dict[str, pa.Array] = {}
    keys = tbl.column(key).to_pylist()
    pid = (url_hash64([str(k) for k in keys]) % np.uint64(num_partitions)).astype(np.int32)
    cols["__pid"] = pa.array(pid)
    cols["__side"] = pa.array(np.full(n, side, dtype=np.int8))
    cols["__key"] = tbl.column(key).cast(pa.string())
    cols["__ts"] = tbl.column(ts).cast(pa.int64())
    for c in all_cols:
        # absent columns are typed from the OTHER side's schema so the union
        # of the two tagged datasets has one consistent schema
        cols[c] = tbl.column(c) if c in tbl.column_names else pa.nulls(n, col_types[c])
    return pa.table(cols)


def asof_join_copartitioned(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    key: str,
    left_ts: str,
    right_ts: str,
    left_cols: list[str],
    right_value_cols: list[str],
    num_partitions: int = 32,
    prefix: str = "asof_",
) -> ray.data.Dataset:
    """Returns left_cols + key + ts + prefixed right value columns (float64,
    NaN when no right row with right.ts <= left.ts exists for the key)."""

    all_left = left_cols
    all_cols = all_left + right_value_cols
    lschema, rschema = left.schema(), right.schema()  # ray.data.Schema
    ltypes = dict(zip(lschema.names, lschema.types))
    rtypes = dict(zip(rschema.names, rschema.types))
    col_types = {c: ltypes.get(c, rtypes.get(c)) for c in all_cols}
    tag_l = functools.partial(
        _tag_and_project, side=0, key=key, ts=left_ts, all_cols=all_cols,
        col_types=col_types, num_partitions=num_partitions,
    )
    tag_r = functools.partial(
        _tag_and_project, side=1, key=key, ts=right_ts, all_cols=all_cols,
        col_types=col_types, num_partitions=num_partitions,
    )
    lt = left.map_batches(tag_l, batch_format="pyarrow")
    rt = right.map_batches(tag_r, batch_format="pyarrow")
    unioned = lt.union(rt)

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        # sort: key, ts, side (right first on ts ties -> "<=" semantics)
        df = df.sort_values(["__key", "__ts", "__side"], kind="mergesort").reset_index(drop=True)
        keys = df["__key"].to_numpy()
        ts = df["__ts"].to_numpy()
        side = df["__side"].to_numpy()
        n = len(df)
        is_r = side == 1
        out_vals = {c: np.full(n, np.nan) for c in right_value_cols}
        seg_starts = (
            np.concatenate([[0], np.nonzero(keys[1:] != keys[:-1])[0] + 1, [n]])
            if n
            else np.array([0])
        )
        rvals = {c: df[c].to_numpy(dtype="float64", na_value=np.nan) for c in right_value_cols}
        for s, e in zip(seg_starts[:-1], seg_starts[1:]):
            ridx = np.nonzero(is_r[s:e])[0]
            if ridx.size == 0:
                continue
            rts = ts[s:e][ridx]
            # positions of left rows within segment
            lmask = ~is_r[s:e]
            pos = np.searchsorted(rts, ts[s:e][lmask], side="right") - 1
            ok = pos >= 0
            sel = ridx[pos[ok]]
            li = np.nonzero(lmask)[0]
            for c in right_value_cols:
                seg = out_vals[c][s:e]
                seg[li[ok]] = rvals[c][s:e][sel]
        keep = ~is_r
        out = pd.DataFrame({key: keys[keep]})
        out[left_ts] = pd.Series(ts[keep]).astype("datetime64[us]").to_numpy()
        for c in all_left:
            out[c] = df[c].to_numpy()[keep]
        for c in right_value_cols:
            out[prefix + c] = out_vals[c][keep]
        return out

    return unioned.groupby("__pid").map_groups(
        lambda g: merge(g.drop(columns=["__pid"])), batch_format="pandas"
    )
