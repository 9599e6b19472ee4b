"""Dataset splitting and deterministic augmentation.

- deterministic hash split (reference analog: DatasetSplitter TASK-021
  tasks.md:688-709): bucket = url-hash % 100 -> train/val/test by ratio
  boundaries. Reproducible, shuffle-free, entity-coherent (all revisits of a
  url land in the same split — no leakage between splits).
- seeded augmentation (reference analog: DataAugmentation TASK-020
  tasks.md:662-684): per-row RNG seeded by hash(key, salt) so retries and
  reruns produce byte-identical output (determinism requirement §4.2).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from ..state.partition import url_hash64


def add_split_column(
    tbl: pa.Table,
    key_col: str = "url",
    ratios: tuple[float, float, float] = (0.8, 0.1, 0.1),
) -> pa.Table:
    h = url_hash64(tbl.column(key_col).to_pylist()) % np.uint64(100)
    b1 = int(ratios[0] * 100)
    b2 = b1 + int(ratios[1] * 100)
    split = np.where(h < b1, "train", np.where(h < b2, "val", "test"))
    return tbl.append_column("split", pa.array(split.tolist(), pa.string()))


def split_dataset(
    ds: ray.data.Dataset,
    key_col: str = "url",
    ratios: tuple[float, float, float] = (0.8, 0.1, 0.1),
) -> ray.data.Dataset:
    import functools

    return ds.map_batches(
        functools.partial(add_split_column, key_col=key_col, ratios=ratios),
        batch_format="pyarrow",
    )


# ---------------------------------------------------------------------------
# arithmetic-hash augmentation variants (reference analog: the spec's three
# augmentation types, tasks.md:662-684). Unlike the RNG dropout below, these
# two derive every decision from (key, token-index) integer arithmetic, so
# they are deterministic AND exactly SQL-expressible — the DuckDB oracle
# reproduces the augmented text byte-for-byte (1-based token index matches
# DuckDB's list lambda index).

_AUG_A = 1000003
_AUG_B = 10007
MASK_TOKEN = "<mask>"
MASK_SPAN_LEN = 5


def _flat_tokens(text: pa.Array | pa.ChunkedArray):
    """(flat tokens, per-row counts, offsets, 1-based token index) for a
    string column, with SQL string_split semantics (empty text -> [''])."""
    import pyarrow.compute as pc

    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    toks = pc.split_pattern(text, " ")
    flat = pc.list_flatten(toks)
    counts = pc.list_value_length(toks).cast(pa.int64()).to_numpy()
    offs = np.concatenate([[0], np.cumsum(counts)])
    tok_i = np.arange(offs[-1], dtype=np.int64) - np.repeat(offs[:-1], counts) + 1
    return flat, counts, offs, tok_i


def hashdrop_batch(
    tbl: pa.Table, text_col: str = "text", id_col: str = "doc_id", drop_pct: int = 10
) -> pa.Table:
    """Token dropout by integer hash: token i (1-based) of key d is dropped
    iff (d*A + i*B) % 100 < drop_pct. Fully vectorized (Arrow split ->
    numpy mask -> rebuilt list -> binary_join); appends `text_aug`."""
    import pyarrow.compute as pc

    ids = tbl.column(id_col).to_numpy()
    flat, counts, offs, tok_i = _flat_tokens(tbl.column(text_col))
    d = np.repeat(ids, counts)
    keep = (d * _AUG_A + tok_i * _AUG_B) % 100 >= drop_pct
    c = np.concatenate([[0], np.cumsum(keep, dtype=np.int64)])
    kept = c[offs[1:]] - c[offs[:-1]]
    new_offs = np.concatenate([[0], np.cumsum(kept)])
    lst = pa.ListArray.from_arrays(
        pa.array(new_offs, pa.int32()), flat.filter(pa.array(keep))
    )
    return tbl.append_column("text_aug", pc.binary_join(lst, " "))


def mask_spans_batch(
    tbl: pa.Table,
    text_col: str = "text",
    id_col: str = "doc_id",
    span_len: int = MASK_SPAN_LEN,
) -> pa.Table:
    """Deterministic span masking: replace span_len consecutive tokens with
    MASK_TOKEN, span start s = (d*A) % max(ntok - span_len + 1, 1) + 1
    (1-based). Vectorized; appends `text_aug`."""
    import pyarrow.compute as pc

    ids = tbl.column(id_col).to_numpy()
    flat, counts, offs, tok_i = _flat_tokens(tbl.column(text_col))
    s = (ids * _AUG_A) % np.maximum(counts - span_len + 1, 1) + 1
    s_tok = np.repeat(s, counts)
    m = (tok_i >= s_tok) & (tok_i < s_tok + span_len)
    new_flat = pc.if_else(pa.array(m), pa.scalar(MASK_TOKEN), flat)
    lst = pa.ListArray.from_arrays(pa.array(offs, pa.int32()), new_flat)
    return tbl.append_column("text_aug", pc.binary_join(lst, " "))


_SPLITMIX_GOLD = np.uint64(0x9E3779B97F4A7C15)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer (public-domain constants): uint64 ->
    well-mixed uint64. The counter-based RNG behind augment_texts."""
    with np.errstate(over="ignore"):
        z = x + _SPLITMIX_GOLD
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return z ^ (z >> np.uint64(31))


def augment_texts(
    ds: ray.data.Dataset,
    text_col: str = "text",
    key_col: str = "url",
    drop_prob: float = 0.1,
    salt: int = 17,
) -> ray.data.Dataset:
    """Deterministic token dropout: the keep/drop decision for token i of a
    row is a counter-based hash uniform over (key-hash ^ salt, i) — the same
    row always augments identically (retry/rerun-safe) with NO per-row RNG
    object or Python loop (round-1 verdict: the default_rng-per-row loop was
    the slowest text op per byte in the repo)."""
    import pyarrow.compute as pc

    def fn(tbl: pa.Table) -> pa.Table:
        keys = url_hash64([str(v) for v in tbl.column(key_col).to_pylist()])
        flat, counts, offs, tok_i = _flat_tokens(tbl.column(text_col))
        key_tok = np.repeat(keys ^ np.uint64(salt), counts)
        with np.errstate(over="ignore"):
            mix = _splitmix64(key_tok ^ (tok_i.astype(np.uint64) * _SPLITMIX_GOLD))
        u = mix.astype(np.float64) / float(1 << 64)
        # empty-string rows split to [''] like SQL; keep that token so the
        # augmented text stays '' (python str.split semantics: no tokens)
        keep = (u >= drop_prob) | (pc.equal(flat, "").to_numpy(zero_copy_only=False))
        c = np.concatenate([[0], np.cumsum(keep, dtype=np.int64)])
        kept = c[offs[1:]] - c[offs[:-1]]
        new_offs = np.concatenate([[0], np.cumsum(kept)])
        lst = pa.ListArray.from_arrays(
            pa.array(new_offs, pa.int32()), flat.filter(pa.array(keep))
        )
        return tbl.append_column("text_aug", pc.binary_join(lst, " "))

    return ds.map_batches(fn, batch_format="pyarrow")
