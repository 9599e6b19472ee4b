"""Pure streaming merge kernels: (state, rows) -> (state, feature_rows).

The webtext recast of the reference's explicit-state streaming design
(StreamBuffer ring buffer + carried overlap state, design.md:1851-2002;
extract_streaming's (output, state) pairs, design.md:594-609). Everything here
is plain numpy/pyarrow — no Ray imports — so the kernels are unit-testable
single-process and identical code runs inside map_groups / actor stages.

Ordering contract: input rows of one partition arrive sorted by
(url, warc_ts); a url never spans two partitions. Chunked processing
(StreamingMerger) must equal one-shot processing (merge_partition) exactly —
pinned by tests/test_kernels.py.

Leakage discipline (SURVEY §4.3): every output value at row i is a function of
rows j <= i of the same url (plus signals rows with ts <= ts_i). Features are
computed BEFORE the current row is folded into any carried state.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from zlib import crc32

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..config import FeatureConfig

# ---------------------------------------------------------------------------
# token hashing with a per-process cache (stateful setup done once per worker,
# the actor-pool idiom — reference: model/state loaded once, design.md:1743)

_TOKEN_HASH_CACHE: dict[str, int] = {}


def _token_hash_set(text: str) -> np.ndarray:
    toks = text.split()
    if not toks:
        return np.empty(0, dtype=np.uint32)
    cache = _TOKEN_HASH_CACHE
    out = np.empty(len(toks), dtype=np.uint32)
    for i, t in enumerate(toks):
        h = cache.get(t)
        if h is None:
            h = crc32(t.encode("utf-8"))
            if len(cache) < 2_000_000:  # bound worker memory
                cache[t] = h
        out[i] = h
    return np.unique(out)


def _jaccard(a: np.ndarray, b: np.ndarray) -> float:
    if a.size == 0 and b.size == 0:
        return 1.0
    inter = np.intersect1d(a, b, assume_unique=True).size
    return inter / (a.size + b.size - inter)


# ---------------------------------------------------------------------------
# as-of right side: host -> sorted observation arrays (broadcast via ray.put
# once, ray.get'd per worker — never re-shipped per batch)


class SignalsLookup:
    """Sorted per-host signal series for O(log n) as-of (ts <= t) lookups."""

    def __init__(self, signals: pa.Table):
        host = signals.column("host").to_pylist()
        ts = signals.column("ts").cast(pa.int64()).to_numpy()
        rank = signals.column("rank").to_numpy(zero_copy_only=False)
        ok = signals.column("fetch_ok").to_numpy(zero_copy_only=False).astype(np.float64)
        self._by_host: dict[str, tuple[np.ndarray, np.ndarray, np.ndarray]] = {}
        order = np.lexsort((ts, np.asarray(host, dtype=object)))
        host_s = [host[i] for i in order]
        ts_s, rank_s, ok_s = ts[order], rank[order], ok[order]
        start = 0
        for i in range(1, len(host_s) + 1):
            if i == len(host_s) or host_s[i] != host_s[start]:
                self._by_host[host_s[start]] = (ts_s[start:i], rank_s[start:i], ok_s[start:i])
                start = i

    def locf(self, host: str, ts_us: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """Vectorized last-observation-carried-forward for one host: for each
        query ts (µs), the rank/fetch_ok of the latest obs with obs.ts <= ts
        (exact ties match — "<=" semantics); NaN when no prior obs."""
        series = self._by_host.get(host)
        n = ts_us.size
        if series is None:
            return np.full(n, np.nan), np.full(n, np.nan)
        sts, srank, sok = series
        idx = np.searchsorted(sts, ts_us, side="right") - 1
        ok_mask = idx >= 0
        r = np.full(n, np.nan)
        o = np.full(n, np.nan)
        r[ok_mask] = srank[idx[ok_mask]]
        o[ok_mask] = sok[idx[ok_mask]]
        return r, o


# ---------------------------------------------------------------------------
# carried per-url state across chunk boundaries


@dataclass
class _UrlCarry:
    url: str = ""
    ts_us: int = 0
    lang: str = ""
    session_id: float = 0.0
    session_len: float = 0.0
    run_len: float = 0.0
    token_hashes: np.ndarray = field(default_factory=lambda: np.empty(0, dtype=np.uint32))
    # trailing token counts, most recent LAST, at most window_k-1 entries
    recent_tok: list[float] = field(default_factory=list)


def _segment_bounds(url_arr: np.ndarray) -> np.ndarray:
    """Indices where a new url segment starts (input sorted by url)."""
    n = url_arr.size
    head = np.ones(n, dtype=bool)
    head[1:] = url_arr[1:] != url_arr[:-1]
    return head


def _propagate_last(head_vals: np.ndarray, head_mask: np.ndarray) -> np.ndarray:
    """For each row, the value of head_vals at the most recent True in
    head_mask (inclusive). head_vals must be 0 where head_mask is False."""
    idx = np.where(head_mask, np.arange(head_mask.size), 0)
    np.maximum.accumulate(idx, out=idx)
    return head_vals[idx]


def _history_features(
    url_arr: np.ndarray,
    ts_us: np.ndarray,
    lang_arr: np.ndarray,
    tokc: np.ndarray,
    texts: list[str],
    cfg: FeatureConfig,
    carry: _UrlCarry | None,
) -> tuple[dict[str, np.ndarray], _UrlCarry]:
    """Vectorized history features over a sorted, deduped chunk.

    `carry` holds the state of the last url of the PREVIOUS chunk; only the
    first segment of this chunk can continue it. Returns (columns, new_carry).
    """
    n = url_arr.size
    gap_s = cfg.session_gap_s
    k = cfg.window_k
    head = _segment_bounds(url_arr)
    cont = carry is not None and n > 0 and url_arr[0] == carry.url  # first segment continues

    # --- ts_since_prev -----------------------------------------------------
    dt = np.full(n, np.nan)
    dt[1:] = (ts_us[1:] - ts_us[:-1]) / 1e6
    dt[head] = np.nan
    if cont:
        dt[0] = (ts_us[0] - carry.ts_us) / 1e6

    # --- sessions ----------------------------------------------------------
    sess_flag = np.zeros(n, dtype=bool)
    with np.errstate(invalid="ignore"):
        sess_flag = dt > gap_s  # NaN -> False
    c = np.cumsum(sess_flag)
    # session_id = flags since url head (head rows restart at 0; a continuing
    # chunk head may itself carry a True flag, already included in c)
    head_c = np.where(head, c - sess_flag, 0)
    session_id = (c - _propagate_last(head_c, head)).astype(np.float64)
    # session_len = rows since last session head (head of url or sess_flag)
    seg_head = head | sess_flag
    ar = np.arange(n)
    session_len = ar - _propagate_last(np.where(seg_head, ar, 0), seg_head) + 1.0
    if cont:
        seg0 = int(np.argmax(head[1:]) + 1) if n > 1 and head[1:].any() else n  # first segment end
        session_id[:seg0] += carry.session_id
        if not sess_flag[0]:
            # rows of the first *session* sub-segment continue the carried length
            sub_end = seg0
            flags_in_seg = np.nonzero(sess_flag[:seg0])[0]
            if flags_in_seg.size:
                sub_end = int(flags_in_seg[0])
            session_len[:sub_end] += carry.session_len

    # --- lang run length ---------------------------------------------------
    lang_change = np.ones(n, dtype=bool)
    lang_change[1:] = lang_arr[1:] != lang_arr[:-1]
    run_head = head | lang_change
    run_len = ar - _propagate_last(np.where(run_head, ar, 0), run_head) + 1.0
    if cont and lang_arr[0] == carry.lang:
        seg0 = int(np.argmax(head[1:]) + 1) if n > 1 and head[1:].any() else n
        run_end = seg0
        changes = np.nonzero(lang_change[1:seg0])[0]
        if changes.size:
            run_end = int(changes[0]) + 1
        run_len[:run_end] += carry.run_len

    # --- lag1 token count --------------------------------------------------
    lag1 = np.full(n, np.nan)
    lag1[1:] = tokc[:-1]
    lag1[head] = np.nan
    if cont:
        lag1[0] = carry.recent_tok[-1] if carry.recent_tok else np.nan

    # --- rolling window over last k (incl. current) ------------------------
    # stack k shifted copies; invalidate entries that cross a url head / carry
    shifted = np.full((k, n), np.nan)
    shifted[0] = tokc
    for j in range(1, k):
        shifted[j, j:] = tokc[:-j] if j < n else np.nan
    # distance to url head: rows_since_head
    rows_since_head = ar - _propagate_last(np.where(head, ar, 0), head)
    for j in range(1, k):
        shifted[j, rows_since_head < j] = np.nan
    if cont and carry.recent_tok:
        seg0 = int(np.argmax(head[1:]) + 1) if n > 1 and head[1:].any() else n
        rt = carry.recent_tok  # most recent last
        for i in range(min(seg0, k - 1)):
            # row i of continuing segment: shifts i+1..k-1 come from carry
            for j in range(i + 1, k):
                back = j - i  # how far into carry (1 = most recent)
                if back <= len(rt):
                    shifted[j, i] = rt[-back]
    with np.errstate(invalid="ignore"):
        rw_mean = np.nanmean(shifted, axis=0)
        rw_max = np.nanmax(shifted, axis=0)

    # --- text churn (1 - jaccard vs previous revisit) ----------------------
    churn = np.full(n, np.nan)
    hset_prev: np.ndarray | None = carry.token_hashes if cont else None
    prev_url_ok = cont
    hsets = [None] * n
    for i in range(n):
        hs = _token_hash_set(texts[i])
        hsets[i] = hs
        if i > 0 and not head[i]:
            churn[i] = 1.0 - _jaccard(hs, hsets[i - 1])
        elif i == 0 and prev_url_ok and hset_prev is not None:
            churn[0] = 1.0 - _jaccard(hs, hset_prev)

    # --- new carry (state of the last url in this chunk) -------------------
    if n:
        last_seg = int(_propagate_last(np.where(head, ar, 0), head)[-1])
        new_recent: list[float]
        seg_len_tail = n - last_seg
        if cont and last_seg == 0:
            new_recent = (list(carry.recent_tok) + list(tokc))[-(k - 1) :] if k > 1 else []
        else:
            new_recent = list(tokc[max(n - (k - 1), last_seg) : n]) if k > 1 else []
        new_carry = _UrlCarry(
            url=str(url_arr[-1]),
            ts_us=int(ts_us[-1]),
            lang=str(lang_arr[-1]),
            session_id=float(session_id[-1]),
            session_len=float(session_len[-1]),
            run_len=float(run_len[-1]),
            token_hashes=hsets[-1],
            recent_tok=new_recent,
        )
    else:
        new_carry = carry if carry is not None else _UrlCarry()

    return (
        {
            "ts_since_prev": dt,
            "session_id": session_id.astype(np.float64),
            "session_len": session_len.astype(np.float64),
            "lang_run_length": run_len.astype(np.float64),
            "lag1_token_count": lag1,
            "rw_mean_token_count": rw_mean,
            "rw_max_token_count": rw_max,
            "text_churn": churn,
        },
        new_carry,
    )


def _sort_dedup(tbl: pa.Table) -> pa.Table:
    tbl = tbl.sort_by([("url", "ascending"), ("warc_ts", "ascending")])
    url = np.asarray(tbl.column("url").to_pylist(), dtype=object)
    ts = tbl.column("warc_ts").cast(pa.int64()).to_numpy()
    keep = np.ones(len(url), dtype=bool)
    keep[1:] = (url[1:] != url[:-1]) | (ts[1:] != ts[:-1])
    if keep.all():
        return tbl
    return tbl.filter(pa.array(keep))


class StreamingMerger:
    """Chunk-at-a-time merger carrying per-url state across chunk boundaries
    (the reference's StreamBuffer/process_chunk shape, design.md:1794-1846).

    Chunks must arrive sorted by (url, warc_ts) and already deduped, with
    per-row text features attached (token_count, char_count, ngram_b*)."""

    def __init__(self, cfg: FeatureConfig, signals: SignalsLookup | None = None):
        self.cfg = cfg
        self.signals = signals
        self._carry: _UrlCarry | None = None

    def process_chunk(self, tbl: pa.Table) -> pa.Table:
        cfg = self.cfg
        n = tbl.num_rows
        url_arr = np.asarray(tbl.column("url").to_pylist(), dtype=object)
        ts_us = tbl.column("warc_ts").cast(pa.int64()).to_numpy()
        lang_arr = np.asarray(tbl.column("lang").to_pylist(), dtype=object)
        tokc = tbl.column("token_count").to_numpy(zero_copy_only=False).astype(np.float64)
        texts = tbl.column("text").to_pylist()

        cols, self._carry = _history_features(url_arr, ts_us, lang_arr, tokc, texts, cfg, self._carry)

        out = tbl
        for name, arr in cols.items():
            out = out.append_column(name, pa.array(arr, pa.float64()))

        if self.signals is not None and cfg.signals_path is not None:
            hosts = tbl.column("host").to_pylist()
            rank = np.empty(n)
            ok = np.empty(n)
            start = 0
            for i in range(1, n + 1):
                # hosts come in runs within the url-sorted order only per url;
                # group contiguous equal hosts (urls of one host sort together)
                if i == n or hosts[i] != hosts[start]:
                    r, o = self.signals.locf(hosts[start], ts_us[start:i])
                    rank[start:i] = r
                    ok[start:i] = o
                    start = i
            out = out.append_column("locf_rank", pa.array(rank, pa.float64()))
            out = out.append_column("locf_fetch_ok", pa.array(ok, pa.float64()))

        # pack the fixed-width feature vector (null -> NaN), declared order
        order = cfg.feature_order
        mat = np.empty((n, len(order)), dtype=np.float64)
        for j, name in enumerate(order):
            col = out.column(name)
            mat[:, j] = col.to_numpy(zero_copy_only=False).astype(np.float64)
        out = out.append_column(
            "features", pa.FixedSizeListArray.from_arrays(pa.array(mat.ravel(), pa.float64()), len(order))
        )
        return out


def merge_partition(
    tbl: pa.Table, cfg: FeatureConfig, signals: SignalsLookup | None = None
) -> pa.Table:
    """One-shot partition merge: sort -> dedup-keep-first -> history features
    -> as-of LOCF -> packed vector. Equivalent to StreamingMerger over the
    whole partition in one chunk."""
    tbl = _sort_dedup(tbl)
    return StreamingMerger(cfg, signals).process_chunk(tbl)
