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
