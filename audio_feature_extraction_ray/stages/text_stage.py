"""Stateless Arrow batch stages: extract_text + validation + per-row text
features + partition-id assignment.

All kernels are vectorized (pyarrow.compute / numpy over Arrow buffers) and
run as plain map_batches tasks with batch_format="pyarrow" (zero-copy from the
object store). The reference analogs: AudioFileLoader + AudioPreprocessor +
__post_init__ schema validation (design.md:451-475, 749-910, 117-204).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..config import FeatureConfig
from ..functions.text import extract_text_arrow

_P1 = np.uint64(0x100000001B3)
_P2 = np.uint64(0x1000193)


# Per-process scratch-buffer pool. This sandbox (and many container runtimes)
# has very slow first-touch page faults, so a fresh >128KB numpy temporary per
# op costs orders of magnitude more than the arithmetic. Buffers are faulted
# once per worker and reused across batches (the actor-pool/worker-reuse
# idiom: pay setup once, design.md:1743).
class _ScratchPool(dict):
    """Pickles as EMPTY: the package ships to workers by value (cloudpickle),
    and serializing driver-side buffer contents would both bloat task specs and
    arrive as read-only object-store memory."""

    def __reduce__(self):
        return (_ScratchPool, ())


_SCRATCH: dict[str, np.ndarray] = _ScratchPool()


def _scratch(name: str, size: int, dtype) -> np.ndarray:
    buf = _SCRATCH.get(name)
    if buf is None or not buf.flags.writeable or buf.size < size or buf.dtype != np.dtype(dtype):
        cap = max(size, 1 << 16)
        if buf is not None and buf.dtype == np.dtype(dtype):
            cap = max(cap, buf.size * 2)
        buf = np.empty(cap, dtype=dtype)
        buf[:] = 0  # fault all pages now
        _SCRATCH[name] = buf
    return buf[:size]


# Row-chunk size for the trigram kernel. Sized so the uint64 scratch arrays
# (~8x the chunk's text bytes, x4 arrays) stay L2-resident: this machine's
# DRAM bandwidth saturates near 8 concurrent streaming workers (measured:
# chunk=2048 scales 4.2x at 32 procs; chunk<=512 scales ~25-30x), so cache
# residency — not allocation reuse — is what buys multi-worker scaling.
_NGRAM_ROW_CHUNK = 256


def ngram_hist_batch(arr: pa.Array | pa.ChunkedArray, buckets: int) -> np.ndarray:
    """Vectorized byte-trigram bucket histograms for a whole string column.

    Operates directly on the Arrow offsets/data buffers (no per-row Python).
    Processes in fixed-size row chunks so the per-worker scratch buffers stay
    small and warm regardless of batch size (slow-page-fault environments
    price every fresh large allocation). Row-identical to
    functions.text.ngram_bucket_hist.
    """
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    n = len(arr)
    if n > _NGRAM_ROW_CHUNK:
        return np.vstack(
            [
                ngram_hist_batch(arr.slice(i, _NGRAM_ROW_CHUNK), buckets)
                for i in range(0, n, _NGRAM_ROW_CHUNK)
            ]
        )
    out = np.zeros((n, buckets), dtype=np.float64)
    if n == 0:
        return out
    off_dtype = np.int64 if pa.types.is_large_string(arr.type) else np.int32
    off = np.frombuffer(arr.buffers()[1], dtype=off_dtype)[arr.offset : arr.offset + n + 1].astype(np.int64)
    data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)
    g0, g1 = int(off[0]), int(off[-1])
    L = g1 - g0
    if L < 3:
        return out
    m = L - 2  # number of trigram start positions (incl. row-crossing ones)
    d = _scratch("ngram_d", L, np.uint64)
    d[:] = data[g0:g1]
    h = _scratch("ngram_h", m, np.uint64)
    t = _scratch("ngram_t", m, np.uint64)
    with np.errstate(over="ignore"):
        np.multiply(d[:m], _P1, out=h)
        np.multiply(d[1 : m + 1], _P2, out=t)
        np.add(h, t, out=h)
        np.add(h, d[2 : m + 2], out=h)
    np.mod(h, np.uint64(buckets), out=h)
    # row id per position via cumsum of boundary indicators (no searchsorted)
    row = _scratch("ngram_row", m, np.int64)
    row[:] = 0
    inner = off[1:-1] - g0  # row boundaries strictly inside the data span
    inner = inner[inner < m]
    np.add.at(row, inner, 1)
    np.cumsum(row, out=row)
    # combined key = row * buckets + bucket; count everything, then subtract
    # the <=2 row-crossing trigrams at each boundary
    key = _scratch("ngram_key", m, np.int64)
    np.multiply(row, buckets, out=key)
    np.add(key, h.view(np.int64), out=key)  # h already < buckets, view is safe
    counts = np.bincount(key, minlength=n * buckets).astype(np.float64)
    lens = off[1:] - off[:-1]
    # invalid positions: for each row r (except the last), positions
    # off[r+1]-2, off[r+1]-1 when they lie within row r's byte span
    for j in (1, 2):
        p = off[1:] - j - g0  # candidate invalid start position in row r
        sel = (p >= off[:-1] - g0) & (p < m) & (p >= 0)
        if sel.any():
            rows_sel = np.nonzero(sel)[0]
            bads = rows_sel * buckets + h[p[sel]].astype(np.int64)
            np.subtract.at(counts, bads, 1.0)
    counts = counts[: n * buckets].reshape(n, buckets)
    tri = np.maximum(lens - 2, 0).astype(np.float64)
    np.divide(counts, tri[:, None], out=counts, where=tri[:, None] > 0)
    out = counts
    return out


def _host_from_url(url_col: pa.ChunkedArray | pa.Array) -> pa.Array | pa.ChunkedArray:
    # "https://host/path" -> "host": strip scheme, cut at first "/"
    no_scheme = pc.replace_substring_regex(url_col, pattern="^[a-z][a-z0-9+.-]*://", replacement="")
    return pc.replace_substring_regex(no_scheme, pattern="/.*$", replacement="")


from ..errors import SchemaError  # noqa: E402  (re-export: legacy import site)

_REQUIRED_PAGE_COLS = ("url", "warc_ts", "html")


def validate_pages_batch(tbl: pa.Table) -> None:
    for col in _REQUIRED_PAGE_COLS:
        if col not in tbl.column_names:
            raise SchemaError(f"missing required column {col!r}")
        nulls = tbl.column(col).null_count
        if nulls:
            raise SchemaError(
                f"column {col!r} has {nulls} nulls "
                "(set features.bad_rows='quarantine' to skip-and-count instead)"
            )


def quarantine_pages_batch(tbl: pa.Table) -> pa.Table:
    """Bad-record policy 'quarantine' (spec recovery rule design.md:2373-2376:
    skip, log, continue): drop rows with nulls in any required column instead
    of failing the job. A missing required COLUMN is still a hard SchemaError
    — that is a schema mismatch, not a bad record. The dropped count is
    observable as job_report['rows_quarantined'] (input metadata rows minus
    prepared rows)."""
    for col in _REQUIRED_PAGE_COLS:
        if col not in tbl.column_names:
            raise SchemaError(f"missing required column {col!r}")
    bad = np.zeros(tbl.num_rows, dtype=bool)
    for col in _REQUIRED_PAGE_COLS:
        c = tbl.column(col)
        if c.null_count:
            bad |= pc.is_null(c).to_numpy(zero_copy_only=False)
    if bad.any():
        tbl = tbl.filter(pa.array(~bad))
    return tbl


# Row-chunk for the whole per-row prepare path: every pass (re2 replace,
# entity substitution, ws normalize) allocates an output the size of its
# input, so a 16k-row block streams >100MB of temporaries through DRAM.
# 256-row slices keep each pass's working set cache-resident — the same
# bandwidth-saturation fix as _NGRAM_ROW_CHUNK (results are identical:
# everything in prepare_batch is per-row).
_PREPARE_ROW_CHUNK = 256


def prepare_batch(tbl: pa.Table, cfg: FeatureConfig) -> pa.Table:
    """extract_text -> host; drops the heavy `html` column BEFORE the shuffle
    (SURVEY §7.4: wide rows are dead weight).

    Derivable per-row numerics (token/char counts, ngram histograms) are NOT
    computed here: they are pure functions of `text`, so shipping them through
    the exchange would add ~80 bytes/row of shuffle volume for nothing — the
    merge kernel attaches them post-shuffle (per_row_text_features), after
    dedup has already dropped re-fetches."""
    if tbl.num_rows > _PREPARE_ROW_CHUNK:
        return pa.concat_tables(
            prepare_batch(tbl.slice(i, _PREPARE_ROW_CHUNK), cfg)
            for i in range(0, tbl.num_rows, _PREPARE_ROW_CHUNK)
        ).combine_chunks()
    if cfg.bad_rows == "quarantine":
        tbl = quarantine_pages_batch(tbl)
    else:
        validate_pages_batch(tbl)
    text = extract_text_arrow(tbl.column("html"))
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    host = _host_from_url(tbl.column("url"))
    lang = tbl.column("lang") if "lang" in tbl.column_names else pa.nulls(tbl.num_rows, pa.string())
    return pa.table(
        {
            "url": tbl.column("url"),
            "warc_ts": tbl.column("warc_ts"),
            "host": host,
            "text": text,
            "lang": lang,
        }
    )


def per_row_text_features(tbl: pa.Table, cfg: FeatureConfig) -> pa.Table:
    """Append token_count/char_count/ngram_b* (pure functions of `text`).

    Runs post-shuffle inside the merge kernel; chunked for cache residency.
    token_count: extract_text output is single-space normalized & stripped,
    so count = spaces + 1 (0 for empty) — matches str.split()."""
    if tbl.num_rows > _PREPARE_ROW_CHUNK:
        return pa.concat_tables(
            per_row_text_features(tbl.slice(i, _PREPARE_ROW_CHUNK), cfg)
            for i in range(0, tbl.num_rows, _PREPARE_ROW_CHUNK)
        ).combine_chunks()
    text = tbl.column("text")
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    nonempty = pc.not_equal(pc.utf8_length(text), 0)
    spaces = pc.count_substring(text, " ")
    tokc = pc.if_else(nonempty, pc.add(spaces, 1), 0)
    charc = pc.utf8_length(text)
    hists = ngram_hist_batch(text, cfg.ngram_buckets)
    tbl = tbl.append_column("token_count", pc.cast(tokc, pa.float64()))
    tbl = tbl.append_column("char_count", pc.cast(charc, pa.float64()))
    for i in range(cfg.ngram_buckets):
        tbl = tbl.append_column(f"ngram_b{i}", pa.array(hists[:, i], pa.float64()))
    return tbl


def assign_partition_batch(tbl: pa.Table, partitioner) -> pa.Table:
    pids = partitioner.partition_ids(tbl.column("url"))
    return tbl.append_column("partition_id", pa.array(pids, pa.int32()))
