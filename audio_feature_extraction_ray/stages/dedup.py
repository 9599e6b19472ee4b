"""Deduplication family for training-data pipelines (SURVEY §2.8 + north-rule
additions): exact (hash-partition + per-group first), MinHash+LSH near-dup,
SimHash near-dup, exact n-gram Jaccard pairs.

Scale shape:
- exact: vectorized content-hash in map_batches -> groupby(hash) (the one
  shuffle) -> keep first per group. At 10^12 docs the groupby key is the
  16-byte digest; partial dedup-within-batch first keeps shuffle volume down.
- MinHash-LSH: signature per doc (stateless, numpy) -> explode to
  (band_hash, doc_id, sig) rows -> groupby(band_hash) -> candidate pairs with
  signature-estimated Jaccard >= threshold -> distinct pairs. No broadcast of
  texts; the signature travels with the band row so verification is local to
  the group.
- SimHash: 64-bit signature -> 4x16-bit band explode -> groupby(band) ->
  pairs with Hamming distance <= max_hamming.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from ..functions.hashing import minhash_signatures_batch
from ..state.kernels import _token_hash_set, _token_hashes64_batch


def simhash_signatures_batch(texts: pa.Array | pa.ChunkedArray) -> np.ndarray:
    """Vectorized 64-bit SimHash for a string column (uint64[n]).

    Per row: unique 64-bit token hashes (Arrow-buffer token hashing, shared
    with the churn kernel) -> per-bit majority vote. All rows at once:
    unpack every hash to a (M, 64) bit matrix, segment-sum per row with
    add.reduceat, set bit where votes*2 > token count. Empty rows -> 0.
    The scalar twin is `simhash64_tokens` (pinned in tests)."""
    hs, row_off = _token_hashes64_batch(texts)
    n = row_off.size - 1
    out = np.zeros(n, dtype=np.uint64)
    if hs.size == 0:
        return out
    bits = np.unpackbits(hs.view(np.uint8).reshape(-1, 8), axis=1, bitorder="little")  # (M, 64)
    sizes = np.diff(row_off)
    nz = sizes > 0
    votes = np.add.reduceat(bits, row_off[:-1][nz], axis=0).astype(np.int64)  # (n_nz, 64)
    set_bits = votes * 2 > sizes[nz, None]
    weights = (np.uint64(1) << np.arange(64, dtype=np.uint64))[None, :]
    out[nz] = np.where(set_bits, weights, np.uint64(0)).sum(axis=1, dtype=np.uint64)
    return out


def simhash64_tokens(text: str) -> int:
    """Scalar twin of simhash_signatures_batch for one text."""
    return int(simhash_signatures_batch(pa.array([text], pa.string()))[0])

NUM_PERM = 64
BANDS = 16  # 16 bands x 4 rows: catches jaccard >~ 0.5 candidates reliably


def add_md5(tbl: pa.Table, text_col: str = "text") -> pa.Table:
    fps = [hashlib.md5(t.encode("utf-8")).digest().hex() for t in tbl.column(text_col).to_pylist()]
    return tbl.append_column("content_md5", pa.array(fps, pa.string()))


def exact_dedup(ds: ray.data.Dataset, id_col: str = "doc_id", text_col: str = "text") -> ray.data.Dataset:
    """Keep the min-id row per identical text (hash-partitioned exact dedup)."""

    def partial(tbl: pa.Table) -> pa.Table:
        tbl = add_md5(tbl, text_col)
        # within-batch pre-dedup: shrink the shuffle
        df = tbl.select([id_col, "content_md5"]).to_pandas()
        keep = df.groupby("content_md5", sort=False)[id_col].idxmin()
        return tbl.take(pa.array(sorted(keep.to_numpy())))

    def first(g: pd.DataFrame) -> pd.DataFrame:
        return g.nsmallest(1, id_col)

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("content_md5")
        .map_groups(first, batch_format="pandas")
    )


# ---------------------------------------------------------------------------
# MinHash + LSH


def _signature_batch(tbl: pa.Table, text_col: str, id_col: str) -> pa.Table:
    ids = tbl.column(id_col).to_pylist()
    # fully vectorized (ordered token hashes -> uint64 shingle combine ->
    # chunked permutations); bit-identical to minhash_signature_tokens
    sigs = minhash_signatures_batch(tbl.column(text_col), num_perm=NUM_PERM)
    return pa.table(
        {
            id_col: pa.array(ids),
            "sig": pa.FixedSizeListArray.from_arrays(
                pa.array(sigs.ravel().view(np.int64), pa.int64()), NUM_PERM
            ),
        }
    )


_BAND_W = np.empty(NUM_PERM // BANDS, dtype=np.uint64)
_BAND_W[0] = np.uint64(0x100000001B3)
with np.errstate(over="ignore"):
    for _j in range(1, _BAND_W.size):
        _BAND_W[_j] = _BAND_W[_j - 1] * np.uint64(0x100000001B3)


def _band_rows(tbl: pa.Table, id_col: str) -> pa.Table:
    n = tbl.num_rows
    if n == 0:
        return pa.table({id_col: pa.array([], pa.int64()), "band_hash": pa.array([], pa.int64()),
                         "sig": pa.array([], pa.list_(pa.int64(), NUM_PERM))})
    sigs = np.asarray(tbl.column("sig").combine_chunks().flatten().to_numpy(zero_copy_only=False)).reshape(n, NUM_PERM)
    r = NUM_PERM // BANDS
    ids = tbl.column(id_col).to_numpy()
    out_ids = np.repeat(ids, BANDS)
    # vectorized band bucket key: polynomial combine of each band's signature
    # values (one einsum over (n, BANDS, r)), band index folded into the top
    # bits so buckets never cross bands
    with np.errstate(over="ignore"):
        mix = np.einsum(
            "nbr,r->nb", sigs.view(np.uint64).reshape(n, BANDS, r), _BAND_W, dtype=np.uint64
        )
    band_hashes = ((mix >> np.uint64(9)) | (np.arange(BANDS, dtype=np.uint64) << np.uint64(55))).astype(
        np.int64, casting="unsafe"
    ).ravel()
    sig_rep = pa.FixedSizeListArray.from_arrays(
        pa.array(np.repeat(sigs, BANDS, axis=0).ravel(), pa.int64()), NUM_PERM
    )
    return pa.table({id_col: pa.array(out_ids), "band_hash": pa.array(band_hashes), "sig": sig_rep})


# Buckets larger than this are dropped by the pair stages: a band value
# shared by thousands of documents is a degenerate signal (boilerplate /
# tiny-vocabulary collisions), and the within-bucket pair loop is O(g^2) —
# the standard LSH mega-bucket guard. A genuinely near-duplicate pair
# sharing a mega-bucket still surfaces through its other (selective) bands,
# so recall loss is confined to pairs whose EVERY matching band is
# degenerate. Tune per corpus via the max_bucket parameter.
MAX_BUCKET = 2000


def minhash_lsh_pairs(
    ds: ray.data.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
    max_bucket: int = MAX_BUCKET,
) -> ray.data.Dataset:
    """Candidate near-dup pairs (a < b) with signature-estimated Jaccard >=
    threshold. Deduplicated across bands via a final distinct."""

    sigs = ds.map_batches(
        lambda t: _signature_batch(t, text_col, id_col), batch_format="pyarrow"
    )
    bands = sigs.map_batches(lambda t: _band_rows(t, id_col), batch_format="pyarrow")

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2 or len(g) > max_bucket:
            return pd.DataFrame({"a": [], "b": [], "est_jaccard": []})
        g = g.sort_values(id_col)
        ids = g[id_col].to_numpy()
        sig = np.stack(g["sig"].to_numpy())
        out_a, out_b, out_j = [], [], []
        for i in range(len(g)):
            eq = (sig[i + 1 :] == sig[i]).mean(axis=1)
            hit = np.nonzero(eq >= threshold)[0]
            for h in hit:
                out_a.append(int(ids[i]))
                out_b.append(int(ids[i + 1 + h]))
                out_j.append(float(eq[h]))
        return pd.DataFrame({"a": out_a, "b": out_b, "est_jaccard": out_j})

    cand = bands.groupby("band_hash").map_groups(pairs, batch_format="pandas")

    def dedup_pairs(g: pd.DataFrame) -> pd.DataFrame:
        return g.head(1)

    return cand.groupby(["a", "b"]).map_groups(dedup_pairs, batch_format="pandas")


# ---------------------------------------------------------------------------
# SimHash near-dup


def _u64_to_i64(v: int) -> int:
    return v - (1 << 64) if v >= (1 << 63) else v


def simhash_signatures(ds: ray.data.Dataset, id_col: str = "doc_id", text_col: str = "text") -> ray.data.Dataset:
    def fn(tbl: pa.Table) -> pa.Table:
        sh = simhash_signatures_batch(tbl.column(text_col))
        return pa.table({id_col: tbl.column(id_col), "simhash": pa.array(sh.view(np.int64))})

    return ds.map_batches(fn, batch_format="pyarrow")


def simhash_pairs(
    ds: ray.data.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 6,
    max_bucket: int = MAX_BUCKET,
) -> ray.data.Dataset:
    """Near-dup pairs by SimHash banding: 4x16-bit bands (any pair within
    Hamming distance <= 16/band-count must collide on >= 1 band for <=3 flipped
    bands; max_hamming up to ~6 still has high recall on random bit positions)."""

    sigs = simhash_signatures(ds, id_col, text_col)

    def bands(tbl: pa.Table) -> pa.Table:
        sh = tbl.column("simhash").to_numpy().view(np.uint64)
        ids = tbl.column(id_col).to_numpy()
        out_id = np.repeat(ids, 4)
        out_band = np.empty(sh.size * 4, dtype=np.int64)
        for b in range(4):
            part = ((sh >> np.uint64(16 * b)) & np.uint64(0xFFFF)).astype(np.int64)
            out_band[b::4] = (b << 16) | part
        return pa.table(
            {
                id_col: pa.array(out_id),
                "band": pa.array(out_band),
                "simhash": pa.array(np.repeat(sh, 4).view(np.int64)),
            }
        )

    band_rows = sigs.map_batches(bands, batch_format="pyarrow")

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2 or len(g) > max_bucket:
            return pd.DataFrame({"a": [], "b": [], "hamming": []})
        g = g.sort_values(id_col).drop_duplicates(id_col)
        ids = g[id_col].to_numpy()
        sh = g["simhash"].to_numpy().view(np.uint64)
        out_a, out_b, out_h = [], [], []
        for i in range(len(g)):
            x = sh[i + 1 :] ^ sh[i]
            # vectorized popcount via unpackbits on the 8-byte view
            if x.size:
                hd = np.unpackbits(x.view(np.uint8).reshape(-1, 8), axis=1).sum(axis=1)
                hit = np.nonzero(hd <= max_hamming)[0]
                for h in hit:
                    out_a.append(int(ids[i]))
                    out_b.append(int(ids[i + 1 + h]))
                    out_h.append(int(hd[h]))
        return pd.DataFrame({"a": out_a, "b": out_b, "hamming": out_h})

    cand = band_rows.groupby("band").map_groups(pairs, batch_format="pandas")
    return cand.groupby(["a", "b"]).map_groups(lambda g: g.head(1), batch_format="pandas")


# ---------------------------------------------------------------------------
# exact n-gram (token-set) Jaccard pairs — O(n^2), for small candidate sets /
# SQL-checkable sample queries.


def jaccard_pairs(
    ds: ray.data.Dataset, id_col: str = "doc_id", text_col: str = "text", min_jaccard: float = 0.0
) -> ray.data.Dataset:
    def fn(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(id_col)
        ids = df[id_col].to_numpy()
        sets = [_token_hash_set(t) for t in df[text_col]]
        out_a, out_b, out_j = [], [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                inter = np.intersect1d(sets[i], sets[j], assume_unique=True).size
                union = sets[i].size + sets[j].size - inter
                jac = inter / union if union else 1.0
                if jac >= min_jaccard:
                    out_a.append(int(ids[i]))
                    out_b.append(int(ids[j]))
                    out_j.append(np.floor(jac * 1e6 + 0.5) / 1e6)
        return pd.DataFrame({"a": out_a, "b": out_b, "jaccard": out_j})

    # single group: the caller limits ds to a small sample
    ds = ds.map_batches(
        lambda t: t.append_column("_g", pa.array(np.zeros(t.num_rows, dtype=np.int32))),
        batch_format="pyarrow",
    )
    out = ds.groupby("_g").map_groups(lambda g: fn(g.drop(columns=["_g"])), batch_format="pandas")
    return out
