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


def ngram_hist_batch(arr: pa.Array | pa.ChunkedArray, buckets: int) -> np.ndarray:
    """Vectorized byte-trigram bucket histograms for a whole string column.

    Operates directly on the Arrow offsets/data buffers (no per-row Python);
    row-identical to functions.text.ngram_bucket_hist.
    """
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    n = len(arr)
    out = np.zeros((n, buckets), dtype=np.float64)
    if n == 0:
        return out
    off_dtype = np.int64 if pa.types.is_large_string(arr.type) else np.int32
    off = np.frombuffer(arr.buffers()[1], dtype=off_dtype)[arr.offset : arr.offset + n + 1].astype(np.int64)
    data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)
    g0, g1 = int(off[0]), int(off[-1])
    if g1 - g0 < 3:
        return out
    d = data[g0:g1].astype(np.uint64)
    with np.errstate(over="ignore"):
        h = d[:-2] * _P1 + d[1:-1] * _P2 + d[2:]
    bucket = (h % np.uint64(buckets)).astype(np.int64)
    gpos = np.arange(g0, g1 - 2, dtype=np.int64)  # global start byte of each trigram
    row = np.searchsorted(off, gpos, side="right") - 1
    valid = gpos + 3 <= off[row + 1]
    counts = np.bincount(row[valid] * buckets + bucket[valid], minlength=n * buckets)
    out = counts.reshape(n, buckets).astype(np.float64)
    sums = out.sum(axis=1, keepdims=True)
    np.divide(out, sums, out=out, where=sums > 0)
    return out


def _host_from_url(url_col: pa.ChunkedArray | pa.Array) -> pa.Array | pa.ChunkedArray:
    # "https://host/path" -> "host": strip scheme, cut at first "/"
    no_scheme = pc.replace_substring_regex(url_col, pattern="^[a-z][a-z0-9+.-]*://", replacement="")
    return pc.replace_substring_regex(no_scheme, pattern="/.*$", replacement="")


class SchemaError(ValueError):
    """Input violates the declared pages schema (reference analog:
    __post_init__ validation errors, design.md:117-149)."""


def validate_pages_batch(tbl: pa.Table) -> None:
    for col in ("url", "warc_ts", "html"):
        if col not in tbl.column_names:
            raise SchemaError(f"missing required column {col!r}")
        nulls = tbl.column(col).null_count
        if nulls:
            raise SchemaError(f"column {col!r} has {nulls} nulls")


def prepare_batch(tbl: pa.Table, cfg: FeatureConfig) -> pa.Table:
    """extract_text -> host -> per-row text features; drops the heavy `html`
    column BEFORE the shuffle (SURVEY §7.4: wide rows are dead weight)."""
    validate_pages_batch(tbl)
    text = extract_text_arrow(tbl.column("html"))
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    host = _host_from_url(tbl.column("url"))
    lang = tbl.column("lang") if "lang" in tbl.column_names else pa.nulls(tbl.num_rows, pa.string())

    # token_count: extract_text output is single-space normalized & stripped,
    # so count = spaces + 1 (0 for empty) — vectorized, matches str.split()
    nonempty = pc.not_equal(pc.utf8_length(text), 0)
    spaces = pc.count_substring(text, " ")
    tokc = pc.if_else(nonempty, pc.add(spaces, 1), 0)
    charc = pc.utf8_length(text)

    hists = ngram_hist_batch(text, cfg.ngram_buckets)

    cols: dict[str, pa.Array | pa.ChunkedArray] = {
        "url": tbl.column("url"),
        "warc_ts": tbl.column("warc_ts"),
        "host": host,
        "text": text,
        "lang": lang,
        "token_count": pc.cast(tokc, pa.float64()),
        "char_count": pc.cast(charc, pa.float64()),
    }
    for i in range(cfg.ngram_buckets):
        cols[f"ngram_b{i}"] = pa.array(hists[:, i], pa.float64())
    return pa.table(cols)


def assign_partition_batch(tbl: pa.Table, partitioner) -> pa.Table:
    urls = tbl.column("url").to_pylist()
    pids = partitioner.partition_ids(urls)
    return tbl.append_column("partition_id", pa.array(pids, pa.int32()))
