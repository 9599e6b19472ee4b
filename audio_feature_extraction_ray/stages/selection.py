"""Distributed selection: EXACT k-th smallest value(s) of a column without a
full value exchange — the scale path for exact global order statistics
(median, p90) at 100 TB, complementing stages.window.grouped_quantiles
(which co-locates every (key, value) pair and is exact but shuffle-heavy).

Algorithm (classic iterative histogram selection): each round makes ONE
streaming pass over the input computing, per still-active rank query, a
B-bin histogram of the current candidate range with per-bin exact value
min/max. The bin containing the target rank becomes the next range. Per-bin
(min, max) makes the narrowing EXACT: bin index is monotone in the value, so
bins are value-ordered intervals and [vmin_bin, vmax_bin] contains precisely
the bin's values — no float-edge ambiguity can leak or double-count a value.
A range collapses when all its values are equal (vmin == vmax -> answer) or
when its count fits under `collect_cap`, at which point one final filtered
pass ships just those <= collect_cap values to the driver for an exact sort.

Per round the exchange carries only (query, bin) -> (count, vmin, vmax)
partials through stages.fold.exchange_fold — counters, never data. All rank
queries share each pass: one histogram stage serves every active query.
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import pyarrow as pa
import ray.data

from ..errors import SchemaError
from .fold import exchange_fold

SELECT_BINS = 2048
SELECT_COLLECT_CAP = 65536
_MAX_ROUNDS = 64  # float64 has <= 64 halvings of any range; bins >> 2 converges far faster


def multi_kth_smallest(
    make_ds: Callable[[], ray.data.Dataset],
    col: str,
    ks,
    *,
    bins: int = SELECT_BINS,
    collect_cap: int = SELECT_COLLECT_CAP,
) -> tuple[int, list[float]]:
    """Return (n, values) where values[i] is the ks[i]-th smallest (1-indexed)
    of `col` across the dataset produced by make_ds(). make_ds is called once
    per pass (each pass is a fresh streaming read — nothing materializes).
    `ks` may be a callable n -> list[int] so ranks derived from the row count
    (median, p90) reuse the same stats pass instead of paying an extra one."""

    # ---- pass 1: global n / min / max / NaN guard --------------------------
    def stats_partial(tbl: pa.Table) -> pa.Table:
        v = tbl.column(col).to_numpy(zero_copy_only=False).astype(np.float64)
        nan = int(np.isnan(v).sum())
        ok = v[~np.isnan(v)]
        return pa.table(
            {
                "n": pa.array([int(v.size)], pa.int64()),
                "nan": pa.array([nan], pa.int64()),
                "vmin": pa.array([float(ok.min()) if ok.size else np.inf], pa.float64()),
                "vmax": pa.array([float(ok.max()) if ok.size else -np.inf], pa.float64()),
            }
        )

    def stats_fold(tbl: pa.Table) -> pa.Table:
        return pa.table(
            {
                "n": pa.array([int(np.sum(tbl.column("n").to_numpy()))], pa.int64()),
                "nan": pa.array([int(np.sum(tbl.column("nan").to_numpy()))], pa.int64()),
                "vmin": pa.array([float(np.min(tbl.column("vmin").to_numpy()))], pa.float64()),
                "vmax": pa.array([float(np.max(tbl.column("vmax").to_numpy()))], pa.float64()),
            }
        )

    folded = exchange_fold(
        make_ds().map_batches(stats_partial, batch_format="pyarrow"), stats_fold
    )
    if folded is None:
        raise SchemaError("multi_kth_smallest: empty input")
    st = stats_fold(folded)
    n = int(st.column("n")[0].as_py())
    if int(st.column("nan")[0].as_py()):
        raise SchemaError("multi_kth_smallest: NaN values have no rank")
    lo0, hi0 = st.column("vmin")[0].as_py(), st.column("vmax")[0].as_py()
    if callable(ks):
        ks = list(ks(n))
    for k in ks:
        if not 1 <= k <= n:
            raise SchemaError(f"multi_kth_smallest: rank {k} outside [1, {n}]")

    # active[sid] = dict(k, lo, hi, below, count)  — r = k - below is the
    # target's 1-indexed rank within the current [lo, hi] value set
    active = {
        i: {"k": k, "lo": lo0, "hi": hi0, "below": 0, "count": n} for i, k in enumerate(ks)
    }
    answers: dict[int, float] = {}

    def _resolve_trivial() -> None:
        for sid in list(active):
            s = active[sid]
            if s["lo"] == s["hi"]:
                answers[sid] = s["lo"]
                del active[sid]

    _resolve_trivial()

    # ---- narrowing rounds --------------------------------------------------
    rounds = 0
    while any(s["count"] > collect_cap for s in active.values()):
        rounds += 1
        if rounds > _MAX_ROUNDS:
            raise SchemaError("multi_kth_smallest: failed to converge")
        hist_states = {
            sid: (s["lo"], s["hi"]) for sid, s in active.items() if s["count"] > collect_cap
        }
        states_items = sorted(hist_states.items())

        def hist_partial(tbl: pa.Table, _states=states_items, _bins=bins) -> pa.Table:
            v = tbl.column(col).to_numpy(zero_copy_only=False).astype(np.float64)
            sids, bs, cnts, mins, maxs = [], [], [], [], []
            for sid, (lo, hi) in _states:
                m = (v >= lo) & (v <= hi)
                if not m.any():
                    continue
                vv = v[m]
                idx = np.clip(
                    np.floor((vv - lo) / (hi - lo) * _bins).astype(np.int64), 0, _bins - 1
                )
                order = np.argsort(idx, kind="stable")
                ii, vs = idx[order], vv[order]
                starts = np.flatnonzero(np.r_[True, ii[1:] != ii[:-1]])
                ends = np.r_[starts[1:], ii.size]
                sids.append(np.full(starts.size, sid, dtype=np.int64))
                bs.append(ii[starts])
                cnts.append(ends - starts)
                mins.append(np.minimum.reduceat(vs, starts))
                maxs.append(np.maximum.reduceat(vs, starts))
            if not sids:
                return pa.table(
                    {
                        "sid": pa.array([], pa.int64()),
                        "bin": pa.array([], pa.int64()),
                        "cnt": pa.array([], pa.int64()),
                        "vmin": pa.array([], pa.float64()),
                        "vmax": pa.array([], pa.float64()),
                    }
                )
            return pa.table(
                {
                    "sid": pa.array(np.concatenate(sids), pa.int64()),
                    "bin": pa.array(np.concatenate(bs), pa.int64()),
                    "cnt": pa.array(np.concatenate(cnts), pa.int64()),
                    "vmin": pa.array(np.concatenate(mins), pa.float64()),
                    "vmax": pa.array(np.concatenate(maxs), pa.float64()),
                }
            )

        def hist_fold(tbl: pa.Table) -> pa.Table:
            sid = tbl.column("sid").to_numpy()
            b = tbl.column("bin").to_numpy()
            key = sid * np.int64(bins) + b
            uniq, codes = np.unique(key, return_inverse=True)
            cnt = np.zeros(uniq.size, dtype=np.int64)
            np.add.at(cnt, codes, tbl.column("cnt").to_numpy())
            vmin = np.full(uniq.size, np.inf)
            np.minimum.at(vmin, codes, tbl.column("vmin").to_numpy())
            vmax = np.full(uniq.size, -np.inf)
            np.maximum.at(vmax, codes, tbl.column("vmax").to_numpy())
            return pa.table(
                {
                    "sid": pa.array(uniq // bins, pa.int64()),
                    "bin": pa.array(uniq % bins, pa.int64()),
                    "cnt": pa.array(cnt, pa.int64()),
                    "vmin": pa.array(vmin, pa.float64()),
                    "vmax": pa.array(vmax, pa.float64()),
                }
            )

        merged = exchange_fold(
            make_ds().map_batches(hist_partial, batch_format="pyarrow"),
            hist_fold,
            pid_of=lambda t: (
                (t.column("sid").to_numpy() * np.int64(bins) + t.column("bin").to_numpy())
                % 32
            ),
        )
        if merged is None:  # unreachable: every active state has count > 0
            raise SchemaError("multi_kth_smallest: histogram pass lost all rows")
        msid = merged.column("sid").to_numpy()
        for sid, _ in states_items:
            rows = np.flatnonzero(msid == sid)
            order = rows[np.argsort(merged.column("bin").to_numpy()[rows])]
            cnts = merged.column("cnt").to_numpy()[order]
            cum = np.cumsum(cnts)
            s = active[sid]
            r = s["k"] - s["below"]
            j = int(np.searchsorted(cum, r, side="left"))
            s["below"] += int(cum[j - 1]) if j else 0
            s["lo"] = float(merged.column("vmin").to_numpy()[order][j])
            s["hi"] = float(merged.column("vmax").to_numpy()[order][j])
            s["count"] = int(cnts[j])
        _resolve_trivial()

    # ---- final collect: every remaining range holds <= collect_cap values --
    if active:
        coll_items = sorted((sid, (s["lo"], s["hi"])) for sid, s in active.items())

        def collect(tbl: pa.Table, _states=coll_items) -> pa.Table:
            v = tbl.column(col).to_numpy(zero_copy_only=False).astype(np.float64)
            sids, vals = [], []
            for sid, (lo, hi) in _states:
                m = (v >= lo) & (v <= hi)
                if m.any():
                    sids.append(np.full(int(m.sum()), sid, dtype=np.int64))
                    vals.append(v[m])
            if not sids:
                return pa.table(
                    {"sid": pa.array([], pa.int64()), "v": pa.array([], pa.float64())}
                )
            return pa.table(
                {
                    "sid": pa.array(np.concatenate(sids), pa.int64()),
                    "v": pa.array(np.concatenate(vals), pa.float64()),
                }
            )

        got = (
            make_ds()
            .map_batches(collect, batch_format="pyarrow")
            .to_pandas()  # bounded: <= collect_cap values per active query
        )
        for sid, s in active.items():
            vals = np.sort(got.loc[got["sid"] == sid, "v"].to_numpy())
            if vals.size != s["count"]:
                raise SchemaError(
                    f"multi_kth_smallest: collect drift ({vals.size} != {s['count']})"
                )
            answers[sid] = float(vals[s["k"] - s["below"] - 1])

    return n, [answers[i] for i in range(len(ks))]
