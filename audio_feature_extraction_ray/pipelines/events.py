"""Point-in-time feature-engineering operators over a generic event stream
(`events` table: event_id, ts, user_id, event_type, value).

Same operator family as the flagship pages pipeline (as-of, LOCF, lag/lead,
sessionization, rolling windows — SURVEY §2.3/2.5/2.9), expressed over the
driver's testdata so every operator has a DuckDB SQL oracle.

Execution idiom (identical to pipelines/features.py): entity-hash partition
-> groupby(partition_id).map_groups(vectorized kernel over the sorted
partition). Entity = user_id; a user never spans partitions. Money values are
aggregated as integer cents so distributed results are bit-identical to the
SQL oracle (no float-summation-order drift).
"""

from __future__ import annotations

import functools

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

NUM_PARTITIONS = 32
_GOLD = np.uint64(0x9E3779B97F4A7C15)


def read_events(sf_dir: str, columns: list[str] | None = None) -> ray.data.Dataset:
    return ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=columns)


def _assign_pid(tbl: pa.Table, key: str, num_partitions: int) -> pa.Table:
    k = tbl.column(key).to_numpy(zero_copy_only=False).astype(np.uint64)
    with np.errstate(over="ignore"):
        pid = ((k * _GOLD) >> np.uint64(33)) % np.uint64(num_partitions)
    return tbl.append_column("partition_id", pa.array(pid.astype(np.int32)))


def partitioned_ordered(
    ds: ray.data.Dataset,
    kernel,
    key: str = "user_id",
    order: tuple[str, ...] = ("ts", "event_id"),
    num_partitions: int = NUM_PARTITIONS,
) -> ray.data.Dataset:
    """Entity-hash partition + per-partition (key, *order) sort + pandas
    kernel. The kernel sees every row of each entity exactly once, in time
    order — the same ordering contract as the pages merge kernel."""

    def group_fn(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key, *order], kind="mergesort").reset_index(drop=True)
        df = df.drop(columns=["partition_id"])
        return kernel(df)

    ds = ds.map_batches(
        functools.partial(_assign_pid, key=key, num_partitions=num_partitions),
        batch_format="pyarrow",
    )
    return ds.groupby("partition_id").map_groups(group_fn, batch_format="pandas")


# ---------------------------------------------------------------------------
# lag / lead (reference analog: MFCC delta / delta-delta frames,
# tasks.md:637-658 — frame-to-frame differences). Lead is a LABEL: emitted
# under label_ prefix, never a feature (leakage discipline SURVEY §4.3).


def lag_lead(sf_dir: str) -> ray.data.Dataset:
    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("user_id", sort=False)
        df["lag1_value"] = g["value"].shift(1)
        df["label_lead1_value"] = g["value"].shift(-1)
        df["delta_value"] = df["value"] - df["lag1_value"]
        return df[["event_id", "user_id", "ts", "value", "lag1_value", "label_lead1_value", "delta_value"]]

    return partitioned_ordered(read_events(sf_dir), kernel)


LAG_LEAD_SQL = """
SELECT event_id, user_id, ts, value,
       lag(value)  OVER w AS lag1_value,
       lead(value) OVER w AS label_lead1_value,
       value - lag(value) OVER w AS delta_value
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


# ---------------------------------------------------------------------------
# gap-based sessionization (north rule; reference analog: silence-gap
# trimming design.md:837-859). Gap strictly greater than threshold starts a
# new session.

SESSION_GAP_S = 1800.0


def sessionize(sf_dir: str) -> ray.data.Dataset:
    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("user_id", sort=False)
        dt = (df["ts"] - g["ts"].shift(1)).dt.total_seconds()
        df["ts_since_prev_s"] = dt
        new_sess = (dt > SESSION_GAP_S).fillna(False)
        df["session_id"] = new_sess.groupby(df["user_id"], sort=False).cumsum().astype("int64")
        df["session_len"] = df.groupby(["user_id", "session_id"], sort=False).cumcount() + 1
        return df[["event_id", "user_id", "ts", "ts_since_prev_s", "session_id", "session_len"]]

    return partitioned_ordered(read_events(sf_dir), kernel)


SESSIONIZE_SQL = f"""
WITH g AS (
  SELECT event_id, user_id, ts,
         date_diff('microsecond', lag(ts) OVER w, ts) / 1000000.0 AS ts_since_prev_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), s AS (
  SELECT *,
         sum(CASE WHEN ts_since_prev_s > {SESSION_GAP_S} THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS UNBOUNDED PRECEDING) AS session_id
  FROM g
)
SELECT event_id, user_id, ts, ts_since_prev_s,
       CAST(session_id AS BIGINT) AS session_id,
       row_number() OVER (PARTITION BY user_id, session_id ORDER BY ts, event_id)
         AS session_len
FROM s
"""


# ---------------------------------------------------------------------------
# rolling window over the last k rows incl. current (reference analog: STFT
# frame window n_fft/hop, design.md:533-555). Integer-cents sums for
# bit-exactness vs the SQL oracle.

ROLL_K = 5


def rolling(sf_dir: str) -> ray.data.Dataset:
    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        cents = (df["value"] * 100).round().astype("int64")
        g = cents.groupby(df["user_id"], sort=False)
        rsum = g.rolling(ROLL_K, min_periods=1).sum().reset_index(drop=True)
        rcnt = g.rolling(ROLL_K, min_periods=1).count().reset_index(drop=True)
        df["rw_count"] = rcnt.astype("int64")
        df["rw_sum_value"] = rsum / 100.0
        df["rw_mean_value"] = rsum / (100.0 * df["rw_count"])
        df["rw_max_value"] = (
            df.groupby("user_id", sort=False)["value"].rolling(ROLL_K, min_periods=1).max().reset_index(drop=True)
        )
        return df[["event_id", "user_id", "ts", "value", "rw_count", "rw_sum_value", "rw_mean_value", "rw_max_value"]]

    return partitioned_ordered(read_events(sf_dir), kernel)


ROLLING_SQL = f"""
SELECT event_id, user_id, ts, value,
       count(*) OVER w AS rw_count,
       sum(CAST(round(value * 100) AS BIGINT)) OVER w / 100.0 AS rw_sum_value,
       sum(CAST(round(value * 100) AS BIGINT)) OVER w
         / (100.0 * count(*) OVER w) AS rw_mean_value,
       max(value) OVER w AS rw_max_value
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN {ROLL_K - 1} PRECEDING AND CURRENT ROW)
"""


# ---------------------------------------------------------------------------
# LOCF backfill (reference analog: Griffin-Lim partial-information
# reconstruction idea, design.md:684-744 -> fill at t from latest obs <= t):
# carry the latest 'purchase' value forward onto every event of the user.


def locf(sf_dir: str) -> ray.data.Dataset:
    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        pv = df["value"].where(df["event_type"] == "purchase")
        df["locf_purchase_value"] = pv.groupby(df["user_id"], sort=False).ffill()
        return df[["event_id", "user_id", "ts", "event_type", "locf_purchase_value"]]

    return partitioned_ordered(read_events(sf_dir), kernel)


LOCF_SQL = """
SELECT event_id, user_id, ts, event_type,
       last_value(CASE WHEN event_type = 'purchase' THEN value END IGNORE NULLS)
         OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS UNBOUNDED PRECEDING) AS locf_purchase_value
FROM events
"""


# ---------------------------------------------------------------------------
# sorted-merge as-of join (J2, the north rule's core operator): attach to each
# event the latest signup-event value of the same user with signup.ts <= ts
# ("<=": an event matches itself when it IS the signup).


def asof_join(sf_dir: str) -> ray.data.Dataset:
    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        # right side = signups of the same partition (co-partitioned by user)
        out_rank = np.full(len(df), np.nan)
        out_ts = np.full(len(df), np.datetime64("NaT"), dtype="datetime64[us]")
        ts = df["ts"].to_numpy(dtype="datetime64[us]")
        uid = df["user_id"].to_numpy()
        is_sig = (df["event_type"] == "signup").to_numpy()
        val = df["value"].to_numpy()
        # sorted-merge per user segment: searchsorted as-of cursor
        # (rows arrive sorted by user_id, ts — the as-of cursor of SURVEY §2.5)
        n = len(df)
        seg_starts = np.concatenate([[0], np.nonzero(uid[1:] != uid[:-1])[0] + 1, [n]]) if n else np.array([0])
        for s, e in zip(seg_starts[:-1], seg_starts[1:]):
            seg = slice(s, e)
            sig_idx = np.nonzero(is_sig[seg])[0]
            if sig_idx.size:
                sig_ts = ts[seg][sig_idx]
                pos = np.searchsorted(sig_ts, ts[seg], side="right") - 1
                ok = pos >= 0
                rel = sig_idx[pos[ok]]
                out_rank[s:e][ok] = val[seg][rel]
                out_ts[s:e][ok] = sig_ts[pos[ok]]
        df["asof_signup_value"] = out_rank
        df["asof_signup_ts"] = pd.Series(out_ts, index=df.index)
        return df[["event_id", "user_id", "ts", "asof_signup_value", "asof_signup_ts"]]

    return partitioned_ordered(read_events(sf_dir), kernel)


ASOF_JOIN_SQL = """
WITH signups AS (
  SELECT user_id, ts AS sig_ts, value AS sig_value
  FROM events WHERE event_type = 'signup'
)
SELECT e.event_id, e.user_id, e.ts,
       s.sig_value AS asof_signup_value,
       s.sig_ts    AS asof_signup_ts
FROM events e
ASOF LEFT JOIN signups s
  ON e.user_id = s.user_id AND e.ts >= s.sig_ts
"""


# ---------------------------------------------------------------------------
# exact dedup / keep-first-per-key (SURVEY §2.8): first event per
# (user_id, event_type) in (ts, event_id) order.


def dedup_first(sf_dir: str) -> ray.data.Dataset:
    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        first = df.drop_duplicates(subset=["user_id", "event_type"], keep="first")
        return first[["user_id", "event_type", "event_id", "ts", "value"]]

    return partitioned_ordered(read_events(sf_dir), kernel)


DEDUP_FIRST_SQL = """
SELECT user_id, event_type, event_id, ts, value
FROM (
  SELECT *, row_number() OVER (PARTITION BY user_id, event_type
                               ORDER BY ts, event_id) AS rn
  FROM events
) WHERE rn = 1
"""


# ---------------------------------------------------------------------------
# tumbling window aggregate with map-side partial aggregation (SURVEY §2.6 A5,
# "pre-aggregate inside map_batches before the groupby"): per user x hour.


def window_agg(sf_dir: str) -> ray.data.Dataset:
    def partial(tbl: pa.Table) -> pa.Table:
        ts = tbl.column("ts").cast(pa.int64()).to_numpy()
        win = (ts // 3_600_000_000) * 3_600_000_000
        uid = tbl.column("user_id").to_numpy(zero_copy_only=False)
        cents = np.round(tbl.column("value").to_numpy(zero_copy_only=False) * 100).astype(np.int64)
        df = pd.DataFrame({"user_id": uid, "win": win, "cents": cents})
        agg = df.groupby(["user_id", "win"], sort=False).agg(
            n_events=("cents", "size"), sum_cents=("cents", "sum")
        ).reset_index()
        return pa.Table.from_pandas(agg, preserve_index=False)

    ds = read_events(sf_dir, columns=["user_id", "ts", "value"])
    partials = ds.map_batches(partial, batch_format="pyarrow")
    from ray.data.aggregate import Sum

    out = partials.groupby(["user_id", "win"]).aggregate(
        Sum("n_events", alias_name="n_events"), Sum("sum_cents", alias_name="sum_cents")
    )

    def finish(tbl: pa.Table) -> pa.Table:
        win_ts = pa.array(tbl.column("win").to_numpy(), pa.int64()).cast(pa.timestamp("us"))
        sum_value = pa.array(tbl.column("sum_cents").to_numpy() / 100.0, pa.float64())
        return pa.table(
            {
                "user_id": tbl.column("user_id"),
                "win_start": win_ts,
                "n_events": tbl.column("n_events").cast(pa.int64()),
                "sum_value": sum_value,
            }
        )

    return out.map_batches(finish, batch_format="pyarrow")


WINDOW_AGG_SQL = """
SELECT user_id,
       time_bucket(INTERVAL 1 HOUR, ts) AS win_start,
       count(*) AS n_events,
       sum(CAST(round(value * 100) AS BIGINT)) / 100.0 AS sum_value
FROM events
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# exact distinct aggregate with map-side set partials (SURVEY §2.6; "emit one
# partial per batch, merge in a tiny second stage" — the mergeable-sketch
# shape, here with exact sets since user-id cardinality is bounded per type).


def distinct_users(sf_dir: str) -> ray.data.Dataset:
    def partial(tbl: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "event_type": tbl.column("event_type").to_pylist(),
                "user_id": tbl.column("user_id").to_numpy(),
            }
        ).drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    partials = read_events(sf_dir, ["event_type", "user_id"]).map_batches(
        partial, batch_format="pyarrow"
    )

    def count_distinct(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "event_type": [g["event_type"].iloc[0]],
                "n_users": [np.int64(g["user_id"].nunique())],
            }
        )

    return partials.groupby("event_type").map_groups(count_distinct, batch_format="pandas")


DISTINCT_USERS_SQL = """
SELECT event_type, count(DISTINCT user_id) AS n_users
FROM events GROUP BY event_type
"""


# ---------------------------------------------------------------------------
# two-table as-of join via the GENERIC co-partitioned stage (stages/asof.py):
# left = all events, right = the signups table, hash-co-partitioned on
# user_id, merged with one sorted forward pass per key segment. Same result
# contract as asof_join (which merges within the single partitioned stream);
# this exercises the union + side-tag exchange that the large-right-side path
# uses at scale.


def asof_join_two_table(sf_dir: str) -> ray.data.Dataset:
    import pyarrow.compute as pc

    from ..stages.asof import asof_join_copartitioned

    ev = read_events(sf_dir, ["event_id", "user_id", "ts"])

    def mk_signups(tbl: pa.Table) -> pa.Table:
        t = tbl.filter(pc.equal(tbl.column("event_type"), "signup"))
        return pa.table(
            {"user_id": t.column("user_id"), "ts": t.column("ts"), "sig_value": t.column("value")}
        )

    sig = read_events(sf_dir, ["user_id", "ts", "event_type", "value"]).map_batches(
        mk_signups, batch_format="pyarrow"
    )
    out = asof_join_copartitioned(
        ev,
        sig,
        key="user_id",
        left_ts="ts",
        right_ts="ts",
        left_cols=["event_id"],
        right_value_cols=["sig_value"],
        num_partitions=NUM_PARTITIONS,
    )

    def finish(tbl: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_id": pc.cast(tbl.column("event_id"), pa.int64()),
                "user_id": pc.cast(tbl.column("user_id"), pa.int64()),
                "ts": tbl.column("ts"),
                "asof_sig_value": tbl.column("asof_sig_value"),
            }
        )

    return out.map_batches(finish, batch_format="pyarrow")


ASOF_TWO_TABLE_SQL = """
WITH signups AS (
  SELECT user_id, ts AS sig_ts, value AS sig_value
  FROM events WHERE event_type = 'signup'
)
SELECT e.event_id, e.user_id, e.ts, s.sig_value AS asof_sig_value
FROM events e
ASOF LEFT JOIN signups s
  ON e.user_id = s.user_id AND e.ts >= s.sig_ts
"""
