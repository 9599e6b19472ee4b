"""Relational operators over the TPC-H-ish testdata tables: vectorized
filter/project, grouped aggregation with map-side partials, broadcast hash
join (small side via ray.put), sort + top-k, distinct.

Money aggregates run in integer cents (prices/discounts have exactly 2
decimals) so distributed sums are bit-identical to the DuckDB oracle —
no float-summation-order drift.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data
from ray.data.aggregate import Count, Max, Min, Sum


def _read(sf_dir: str, name: str, columns=None) -> ray.data.Dataset:
    return ray.data.read_parquet(f"{sf_dir}/{name}.parquet", columns=columns)


def _cents(col) -> np.ndarray:
    return np.round(np.asarray(col, dtype=np.float64) * 100).astype(np.int64)


# ---------------------------------------------------------------------------
# Q1-style pricing summary: filter -> map-side partial agg -> small groupby.


def q1_pricing(sf_dir: str) -> ray.data.Dataset:
    cutoff = pa.scalar(np.datetime64("1998-09-02", "us"))

    def partial(tbl: pa.Table) -> pa.Table:
        tbl = tbl.filter(pc.less_equal(tbl.column("l_shipdate"), cutoff))
        qty_c = _cents(tbl.column("l_quantity").to_numpy(zero_copy_only=False))
        price_c = _cents(tbl.column("l_extendedprice").to_numpy(zero_copy_only=False))
        disc_pct = _cents(tbl.column("l_discount").to_numpy(zero_copy_only=False))
        # disc price in 1e-4 dollars: price_c * (100 - disc_pct)
        disc_price = price_c * (100 - disc_pct)
        df = pd.DataFrame(
            {
                "l_returnflag": tbl.column("l_returnflag").to_pylist(),
                "l_linestatus": tbl.column("l_linestatus").to_pylist(),
                "qty_c": qty_c,
                "price_c": price_c,
                "disc_price_4": disc_price,
            }
        )
        agg = (
            df.groupby(["l_returnflag", "l_linestatus"], sort=False)
            .agg(
                sum_qty_c=("qty_c", "sum"),
                sum_price_c=("price_c", "sum"),
                sum_disc_price_4=("disc_price_4", "sum"),
                n=("qty_c", "size"),
            )
            .reset_index()
        )
        return pa.Table.from_pandas(agg, preserve_index=False)

    partials = _read(
        sf_dir,
        "lineitem",
        ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount", "l_shipdate"],
    ).map_batches(partial, batch_format="pyarrow")

    out = partials.groupby(["l_returnflag", "l_linestatus"]).aggregate(
        Sum("sum_qty_c", alias_name="sum_qty_c"),
        Sum("sum_price_c", alias_name="sum_price_c"),
        Sum("sum_disc_price_4", alias_name="sum_disc_price_4"),
        Sum("n", alias_name="count_order"),
    )

    def finish(tbl: pa.Table) -> pa.Table:
        n = tbl.column("count_order").to_numpy()
        return pa.table(
            {
                "l_returnflag": tbl.column("l_returnflag"),
                "l_linestatus": tbl.column("l_linestatus"),
                "sum_qty": pa.array(tbl.column("sum_qty_c").to_numpy() / 100.0),
                "sum_base_price": pa.array(tbl.column("sum_price_c").to_numpy() / 100.0),
                "sum_disc_price": pa.array(tbl.column("sum_disc_price_4").to_numpy() / 10000.0),
                "avg_qty": pa.array(tbl.column("sum_qty_c").to_numpy() / (100.0 * n)),
                "count_order": pa.array(n, pa.int64()),
            }
        )

    return out.map_batches(finish, batch_format="pyarrow")


Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       sum(CAST(round(l_quantity*100) AS BIGINT)) / 100.0 AS sum_qty,
       sum(CAST(round(l_extendedprice*100) AS BIGINT)) / 100.0 AS sum_base_price,
       sum(CAST(round(l_extendedprice*100) AS BIGINT)
           * (100 - CAST(round(l_discount*100) AS BIGINT))) / 10000.0 AS sum_disc_price,
       sum(CAST(round(l_quantity*100) AS BIGINT))
         / (100.0 * count(*)) AS avg_qty,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


# ---------------------------------------------------------------------------
# broadcast hash join: revenue per market segment.
# orders+customer are the small side -> ray.put a orderkey->segment dict once;
# lineitem streams through map_batches doing a numpy lookup. No shuffle join.


def revenue_by_segment(sf_dir: str) -> ray.data.Dataset:
    import pyarrow.parquet as pq

    orders = pq.read_table(f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"])
    cust = pq.read_table(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"])
    seg_of_cust = dict(zip(cust.column("c_custkey").to_pylist(), cust.column("c_mktsegment").to_pylist()))
    segs = sorted(set(seg_of_cust.values()))
    seg_id = {s: i for i, s in enumerate(segs)}
    okeys = np.asarray(orders.column("o_orderkey").to_numpy())
    oseg = np.asarray(
        [seg_id[seg_of_cust[c]] for c in orders.column("o_custkey").to_pylist()], dtype=np.int32
    )
    order_sort = np.argsort(okeys)
    side = ray.put((okeys[order_sort], oseg[order_sort], segs))

    def partial(tbl: pa.Table) -> pa.Table:
        okeys_s, oseg_s, segs_l = ray.get(side)
        lk = tbl.column("l_orderkey").to_numpy()
        pos = np.searchsorted(okeys_s, lk)
        # every lineitem has an order; assert instead of guessing
        seg = oseg_s[pos]
        price_c = _cents(tbl.column("l_extendedprice").to_numpy(zero_copy_only=False))
        disc = _cents(tbl.column("l_discount").to_numpy(zero_copy_only=False))
        rev4 = price_c * (100 - disc)
        sums = np.bincount(seg, weights=rev4, minlength=len(segs_l)).astype(np.int64)
        cnts = np.bincount(seg, minlength=len(segs_l))
        return pa.table(
            {
                "c_mktsegment": pa.array(segs_l, pa.string()),
                "rev4": pa.array(sums, pa.int64()),
                "n_items": pa.array(cnts, pa.int64()),
            }
        )

    partials = _read(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount"]).map_batches(
        partial, batch_format="pyarrow"
    )
    out = partials.groupby("c_mktsegment").aggregate(
        Sum("rev4", alias_name="rev4"), Sum("n_items", alias_name="n_items")
    )

    def finish(tbl: pa.Table) -> pa.Table:
        return pa.table(
            {
                "c_mktsegment": tbl.column("c_mktsegment"),
                "revenue": pa.array(tbl.column("rev4").to_numpy() / 10000.0),
                "n_items": tbl.column("n_items").cast(pa.int64()),
            }
        )

    return out.map_batches(finish, batch_format="pyarrow")


REVENUE_BY_SEGMENT_SQL = """
SELECT c.c_mktsegment,
       sum(CAST(round(l.l_extendedprice*100) AS BIGINT)
           * (100 - CAST(round(l.l_discount*100) AS BIGINT))) / 10000.0 AS revenue,
       count(*) AS n_items
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY c.c_mktsegment
"""


# ---------------------------------------------------------------------------
# top-k: top 10 parts by revenue (groupby -> sort -> limit).


def topk_parts(sf_dir: str) -> ray.data.Dataset:
    def partial(tbl: pa.Table) -> pa.Table:
        pk = tbl.column("l_partkey").to_numpy()
        price_c = _cents(tbl.column("l_extendedprice").to_numpy(zero_copy_only=False))
        disc = _cents(tbl.column("l_discount").to_numpy(zero_copy_only=False))
        rev4 = price_c * (100 - disc)
        df = pd.DataFrame({"l_partkey": pk, "rev4": rev4})
        agg = df.groupby("l_partkey", sort=False)["rev4"].sum().reset_index()
        return pa.Table.from_pandas(agg, preserve_index=False)

    partials = _read(sf_dir, "lineitem", ["l_partkey", "l_extendedprice", "l_discount"]).map_batches(
        partial, batch_format="pyarrow"
    )
    agg = partials.groupby("l_partkey").aggregate(Sum("rev4", alias_name="rev4"))

    def finish(tbl: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_partkey": tbl.column("l_partkey").cast(pa.int64()),
                "revenue": pa.array(tbl.column("rev4").to_numpy() / 10000.0),
            }
        )

    out = agg.map_batches(finish, batch_format="pyarrow")
    return out.sort(["revenue", "l_partkey"], descending=[True, False]).limit(10)


TOPK_PARTS_SQL = """
SELECT l_partkey,
       sum(CAST(round(l_extendedprice*100) AS BIGINT)
           * (100 - CAST(round(l_discount*100) AS BIGINT))) / 10000.0 AS revenue
FROM lineitem
GROUP BY l_partkey
ORDER BY revenue DESC, l_partkey
LIMIT 10
"""


# ---------------------------------------------------------------------------
# vectorized filter + computed projection (pushdown at the read).


def filter_project(sf_dir: str) -> ray.data.Dataset:
    lo = pa.scalar(np.datetime64("1996-03-01", "us"))
    hi = pa.scalar(np.datetime64("1996-06-01", "us"))

    def fn(tbl: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.greater_equal(tbl.column("l_shipdate"), lo), pc.less(tbl.column("l_shipdate"), hi)
        )
        tbl = tbl.filter(m)
        price_c = _cents(tbl.column("l_extendedprice").to_numpy(zero_copy_only=False))
        disc = _cents(tbl.column("l_discount").to_numpy(zero_copy_only=False))
        rev = price_c * (100 - disc) / 10000.0
        return pa.table(
            {
                "l_orderkey": tbl.column("l_orderkey"),
                "l_linenumber": tbl.column("l_linenumber").cast(pa.int32()),
                "l_shipdate": tbl.column("l_shipdate"),
                "revenue": pa.array(rev, pa.float64()),
            }
        )

    return _read(
        sf_dir, "lineitem", ["l_orderkey", "l_linenumber", "l_shipdate", "l_extendedprice", "l_discount"]
    ).map_batches(fn, batch_format="pyarrow")


FILTER_PROJECT_SQL = """
SELECT l_orderkey, l_linenumber, l_shipdate,
       CAST(round(l_extendedprice*100) AS BIGINT)
         * (100 - CAST(round(l_discount*100) AS BIGINT)) / 10000.0 AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-03-01' AND l_shipdate < TIMESTAMP '1996-06-01'
"""


# ---------------------------------------------------------------------------
# distinct (shuffle) + order stats per group via built-in aggregates.


def segment_stats(sf_dir: str) -> ray.data.Dataset:
    ds = _read(sf_dir, "customer", ["c_mktsegment", "c_acctbal"])

    def to_cents(tbl: pa.Table) -> pa.Table:
        return pa.table(
            {
                "c_mktsegment": tbl.column("c_mktsegment"),
                "bal_c": pa.array(_cents(tbl.column("c_acctbal").to_numpy(zero_copy_only=False))),
            }
        )

    out = ds.map_batches(to_cents, batch_format="pyarrow").groupby("c_mktsegment").aggregate(
        Count(alias_name="n_customers"),
        Sum("bal_c", alias_name="sum_bal_c"),
        Min("bal_c", alias_name="min_bal_c"),
        Max("bal_c", alias_name="max_bal_c"),
    )

    def finish(tbl: pa.Table) -> pa.Table:
        return pa.table(
            {
                "c_mktsegment": tbl.column("c_mktsegment"),
                "n_customers": tbl.column("n_customers").cast(pa.int64()),
                "sum_acctbal": pa.array(tbl.column("sum_bal_c").to_numpy() / 100.0),
                "min_acctbal": pa.array(tbl.column("min_bal_c").to_numpy() / 100.0),
                "max_acctbal": pa.array(tbl.column("max_bal_c").to_numpy() / 100.0),
            }
        )

    return out.map_batches(finish, batch_format="pyarrow")


SEGMENT_STATS_SQL = """
SELECT c_mktsegment,
       count(*) AS n_customers,
       sum(CAST(round(c_acctbal*100) AS BIGINT)) / 100.0 AS sum_acctbal,
       min(CAST(round(c_acctbal*100) AS BIGINT)) / 100.0 AS min_acctbal,
       max(CAST(round(c_acctbal*100) AS BIGINT)) / 100.0 AS max_acctbal
FROM customer
GROUP BY c_mktsegment
"""
