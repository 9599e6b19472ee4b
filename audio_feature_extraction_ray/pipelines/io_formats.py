"""Columnar source formats beyond parquet: ORC and Feather/Arrow-IPC.

Ray Data 2.49 ships read_parquet/read_csv/read_json but no ORC or IPC
reader; both formats are Arrow-native in this container (pyarrow.orc,
pyarrow.feather), so the sources are built the Ray-Data-first way:

- the FILE list is the parallelism unit (one driver-side listing), each
  file becomes one read task via from_items + flat map;
- inside a task, ORC decodes PER STRIPE and IPC per RECORD BATCH, so a
  single large file still streams through bounded blocks instead of
  materializing whole-file tables;
- projection pushes into the format reader (ORC `columns=`, IPC column
  selection per batch) — only requested columns leave the decoder.

Scale shape: at 100 TB inputs arrive as many files; per-file tasks give
cluster-wide parallelism and the per-stripe/per-batch yield keeps block
sizes bounded regardless of file size. A single giant file is the one
degenerate case (documented): its stripes decode within one task —
re-shard upstream or repartition right after the read.

The registered query (`events_orc_roundtrip`) builds an idempotent ORC
mirror of the `events` table under /tmp (write once, _DONE marker keyed
by the source fingerprint), reads it back through this source, and
aggregates — oracled by the equivalent SQL over the parquet original, so
the round-trip is value-exact, not just row-counted.
"""

from __future__ import annotations

import glob
import hashlib
import os
from collections.abc import Iterator

import numpy as np
import pyarrow as pa
import ray.data

_ORC_EXTS = (".orc",)
_IPC_EXTS = (".feather", ".arrow", ".ipc")


def _list_files(path: str, exts: tuple[str, ...]) -> list[str]:
    if os.path.isdir(path):
        out = sorted(
            p
            for p in glob.glob(os.path.join(path, "*"))
            if p.endswith(exts)
        )
        if not out:
            raise FileNotFoundError(f"no {exts} files under {path}")
        return out
    return [path]


def read_orc(
    path: str, columns: list[str] | None = None, stripes_per_block: int = 4
) -> ray.data.Dataset:
    """ORC source: one task per file, yielding `stripes_per_block` stripes
    per output block (bounded blocks however large the file)."""
    files = _list_files(path, _ORC_EXTS)

    def decode(batch: dict) -> Iterator[pa.Table]:
        from pyarrow import orc as _orc

        for p in batch["path"]:
            f = _orc.ORCFile(p)
            n = f.nstripes
            for s0 in range(0, n, stripes_per_block):
                parts = [
                    f.read_stripe(s, columns=columns)
                    for s in range(s0, min(s0 + stripes_per_block, n))
                ]
                tables = [
                    pa.Table.from_batches([t]) if isinstance(t, pa.RecordBatch) else t
                    for t in parts
                ]
                yield pa.concat_tables(tables)

    return ray.data.from_items([{"path": p} for p in files]).map_batches(
        decode, batch_size=1, batch_format="numpy"
    )


def read_ipc(path: str, columns: list[str] | None = None) -> ray.data.Dataset:
    """Feather/Arrow-IPC source: one task per file, one output block per
    record batch (the writer's chunking is the streaming unit)."""
    files = _list_files(path, _IPC_EXTS)

    def decode(batch: dict) -> Iterator[pa.Table]:
        for p in batch["path"]:
            with pa.memory_map(p) as src:
                reader = pa.ipc.open_file(src)
                for i in range(reader.num_record_batches):
                    t = pa.Table.from_batches([reader.get_batch(i)])
                    yield t.select(columns) if columns else t

    return ray.data.from_items([{"path": p} for p in files]).map_batches(
        decode, batch_size=1, batch_format="numpy"
    )


def write_orc(ds: ray.data.Dataset, out_dir: str, rows_per_file: int = 200_000) -> int:
    """Distributed ORC sink: each write TASK lands its batch as one file,
    atomically (tmp + rename), named by the batch's content hash — so the
    write is idempotent (a retried task re-lands the same file) and never
    funnels data through the driver. Returns the number of files written
    (the only thing the driver sees)."""

    os.makedirs(out_dir, exist_ok=True)

    def write_block(tbl: pa.Table) -> pa.Table:
        from pyarrow import orc as _orc

        if tbl.num_rows == 0:
            return pa.table({"files": pa.array([], pa.int64())})
        h = hashlib.sha256()
        for c in tbl.column_names:
            h.update(c.encode())
            for chunk in tbl.column(c).chunks:
                for b in chunk.buffers():
                    if b is not None:
                        h.update(b)
        name = h.hexdigest()[:24]
        tmp = os.path.join(out_dir, f".part-{name}.orc.tmp")
        dst = os.path.join(out_dir, f"part-{name}.orc")
        if not os.path.exists(dst):
            _orc.write_table(tbl, tmp)
            os.replace(tmp, dst)
        return pa.table({"files": pa.array([1], pa.int64())})

    counts = ds.map_batches(
        write_block, batch_size=rows_per_file, batch_format="pyarrow"
    ).take_all()  # <= one tiny row per written file
    return int(sum(r["files"] for r in counts))


def build_orc_fixture(sf_dir: str) -> str:
    """Idempotent ORC mirror of events.parquet under /tmp, keyed by the
    source fingerprint (the hive-fixture discipline)."""
    src = os.path.abspath(f"{sf_dir}/events.parquet")
    tag = hashlib.sha256(f"{src}:{os.path.getsize(src)}".encode()).hexdigest()[:16]
    root = f"/tmp/audio_feature_extraction_orc_{tag}"
    done = os.path.join(root, "_DONE")
    if os.path.exists(done):
        return root
    write_orc(
        ray.data.read_parquet(src), root, rows_per_file=50_000
    )
    with open(done, "w") as f:
        f.write(src)
    return root


def events_orc_roundtrip(sf_dir: str):
    """Driver-contract query: per-type count + integer-cents sum computed
    FROM THE ORC MIRROR through this source; the oracle runs on the parquet
    original — value-exact round-trip evidence."""
    import pandas as pd
    import pyarrow.compute as pc

    from ..stages.fold import exchange_fold

    root = build_orc_fixture(sf_dir)
    ds = read_orc(root, columns=["event_type", "value"])

    def partial(tbl: pa.Table) -> pa.Table:
        tcol = tbl.column("event_type").to_numpy(zero_copy_only=False)
        cents = np.rint(
            tbl.column("value").to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        uniq, codes = np.unique(tcol, return_inverse=True)
        n = np.bincount(codes, minlength=uniq.size).astype(np.int64)
        s = np.zeros(uniq.size, dtype=np.int64)
        np.add.at(s, codes, cents)
        return pa.table(
            {
                "event_type": pa.array(list(uniq), pa.string()),
                "n": pa.array(n, pa.int64()),
                "sum_cents": pa.array(s, pa.int64()),
            }
        )

    folded = exchange_fold(
        ds.map_batches(partial, batch_format="pyarrow"),
        lambda t: (
            t.group_by("event_type")
            .aggregate([("n", "sum"), ("sum_cents", "sum")])
            .rename_columns(["event_type", "n", "sum_cents"])
        ),
    )
    if folded is None:
        return pd.DataFrame(
            {
                "event_type": pd.Series([], dtype=str),
                "n": pd.Series([], dtype=np.int64),
                "sum_cents": pd.Series([], dtype=np.int64),
            }
        )
    df = (
        folded.to_pandas()
        .groupby("event_type", as_index=False)
        .sum()
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    return df


EVENTS_ORC_ROUNDTRIP_SQL = """
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents
FROM events
GROUP BY event_type
ORDER BY event_type
"""
