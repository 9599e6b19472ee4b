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


def augment_texts(
    ds: ray.data.Dataset,
    text_col: str = "text",
    key_col: str = "url",
    drop_prob: float = 0.1,
    salt: int = 17,
) -> ray.data.Dataset:
    """Deterministic token dropout: per-row RNG seeded from
    (key-hash, salt) so the same row always augments identically."""

    def fn(tbl: pa.Table) -> pa.Table:
        keys = url_hash64([str(v) for v in tbl.column(key_col).to_pylist()])
        out = []
        for k, t in zip(keys, tbl.column(text_col).to_pylist()):
            rng = np.random.default_rng(int(k) ^ salt)
            toks = t.split()
            keep = rng.random(len(toks)) >= drop_prob
            out.append(" ".join(tok for tok, kp in zip(toks, keep) if kp))
        return tbl.append_column("text_aug", pa.array(out, pa.string()))

    return ds.map_batches(fn, batch_format="pyarrow")
