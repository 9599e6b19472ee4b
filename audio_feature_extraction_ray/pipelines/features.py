"""The flagship pipeline: pages Parquet -> point-in-time feature table.

Idiomatic Ray Data (SURVEY §3.4):

    read_parquet(columns pruned)                       # S1: projection pushdown
      -> map_batches(prepare_batch, pyarrow)           # M3/M4/M1: extract_text,
                                                       #   validate, per-row feats,
                                                       #   DROP html pre-shuffle
      -> map_batches(assign_partition, pyarrow)        # §4: url-hash or sampled
                                                       #   range bounds (+salting)
      -> groupby(partition_id).map_groups(kernel)      # the ONE wide shuffle;
                                                       #   kernel = sort, dedup,
                                                       #   streaming merge, LOCF
      -> feature Dataset | per-partition parquet+manifest

The as-of right side (signals) is broadcast: ray.put once on the driver,
ray.get inside the grouped kernel (per-task deserialize of a node-local
object — never re-shipped per batch). Resume: completed partitions (valid
manifest) are filtered out BEFORE the shuffle.
"""

from __future__ import annotations

import functools
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray
import ray.data

from ..config import FeatureConfig, PipelineConfig
from ..state.checkpoint import job_report, load_completed, write_partition, write_partition_stream
from ..state.kernels import SignalsLookup, merge_partition, merge_partition_chunks
from ..state.partition import HashPartitioner, RangePartitioner
from ..stages.text_stage import assign_partition_batch, prepare_batch

INPUT_COLUMNS = ["url", "warc_ts", "html", "lang"]  # prune `text` at the read


def _build_partitioner(cfg: PipelineConfig, ds: ray.data.Dataset):
    e = cfg.engine
    if e.partitioner == "hash":
        return HashPartitioner(e.num_partitions)
    # range: driver-side url sample -> bounds (+ hot-range salting)
    n = ds.count()
    frac = min(1.0, e.range_sample_size / max(1, n))
    sample = ds.select_columns(["url"]).random_sample(frac, seed=7).take_all()
    urls = [r["url"] for r in sample]
    return RangePartitioner.from_sample(urls, e.num_partitions, hot_salt=e.hot_salt)


def _make_group_fn(fcfg: FeatureConfig, signals_ref, output_dir: str | None):
    """Grouped kernel; one call per partition_id group (whole partition as one
    Arrow table). Pure + deterministic -> safe under Ray task retries."""

    def group_fn(tbl: pa.Table) -> pa.Table:
        t0 = time.time()
        pid = int(tbl.column("partition_id")[0].as_py()) if tbl.num_rows else -1
        rows_in = tbl.num_rows
        tbl = tbl.drop_columns(["partition_id"])
        signals = ray.get(signals_ref) if signals_ref is not None else None
        if output_dir is not None and not fcfg.emit_labels:
            # bounded-memory path: stream chunks straight into the parquet
            # writer — the partition's output is never resident at once
            manifest = write_partition_stream(
                output_dir,
                pid,
                merge_partition_chunks(tbl, fcfg, signals),
                {"rows_in": rows_in},
            )
            manifest["dup_dropped"] = rows_in - manifest["rows_out"]
            manifest["wall_s"] = round(time.time() - t0, 4)
            return pa.table({k: [v] for k, v in manifest.items() if k not in ("output",)})
        out = merge_partition(tbl, fcfg, signals)
        dup_dropped = rows_in - out.num_rows
        if output_dir is not None:
            manifest = write_partition(
                output_dir,
                pid,
                out,
                {"rows_in": rows_in, "dup_dropped": dup_dropped, "wall_s": round(time.time() - t0, 4)},
            )
            return pa.table({k: [v] for k, v in manifest.items() if k not in ("output",)})
        return out

    return group_fn


def _load_signals(fcfg: FeatureConfig):
    if fcfg.signals_path is None:
        return None
    return ray.put(SignalsLookup(pq.read_table(fcfg.signals_path)))


def build_dataset(cfg: PipelineConfig) -> ray.data.Dataset:
    """Lazy Dataset of prepared + partition-tagged rows (pre-shuffle)."""
    cfg.validate()
    ds = ray.data.read_parquet(cfg.input_path, columns=INPUT_COLUMNS)
    prep = functools.partial(prepare_batch, cfg=cfg.features)
    ds = ds.map_batches(prep, batch_format="pyarrow", batch_size=cfg.engine.batch_size)
    partitioner = _build_partitioner(cfg, ds)
    ds = ds.map_batches(
        functools.partial(assign_partition_batch, partitioner=partitioner),
        batch_format="pyarrow",
        batch_size=cfg.engine.batch_size,
    )
    return ds


def feature_dataset(cfg: PipelineConfig) -> ray.data.Dataset:
    """Full pipeline returning the feature table as a (lazy) Dataset."""
    ds = build_dataset(cfg)
    signals_ref = _load_signals(cfg.features)
    fn = _make_group_fn(cfg.features, signals_ref, output_dir=None)
    return ds.groupby("partition_id").map_groups(fn, batch_format="pyarrow")


def decode_features(output_dir: str, fcfg: FeatureConfig) -> ray.data.Dataset:
    """Output decoder (reference analog: AudioReconstructor.reconstruct_from_
    dataset, design.md:1581-1674): read a run's partitioned parquet back and
    unpack the fixed-width `features` vector into its named columns per
    cfg.feature_order, verifying the width invariant per batch. The inverse
    of the writer's packing — feature rows are reproducible from the stored
    vector alone."""
    order = fcfg.feature_order
    width = len(order)

    def unpack(tbl: pa.Table) -> pa.Table:
        fcol = tbl.column("features")
        if isinstance(fcol, pa.ChunkedArray):
            fcol = fcol.combine_chunks()
        if fcol.type.list_size != width:
            raise ValueError(
                f"feature width invariant violated: {fcol.type.list_size} != {width}"
            )
        mat = np.asarray(fcol.flatten().to_numpy(zero_copy_only=False)).reshape(-1, width)
        cols: dict[str, pa.Array] = {
            "url": tbl.column("url"),
            "warc_ts": tbl.column("warc_ts"),
        }
        for j, name in enumerate(order):
            cols[f"decoded_{name}"] = pa.array(mat[:, j], pa.float64())
        return pa.table(cols)

    ds = ray.data.read_parquet(f"{output_dir}")
    return ds.map_batches(unpack, batch_format="pyarrow")


def run(cfg: PipelineConfig) -> dict:
    """Checkpointed run: per-partition parquet + manifests under
    cfg.engine.output_dir; returns the reduced job report. With resume=True,
    completed partitions are skipped before the shuffle."""
    if not cfg.engine.output_dir:
        raise ValueError("run() requires engine.output_dir")
    ds = build_dataset(cfg)
    done = load_completed(cfg.engine.output_dir) if cfg.engine.resume else {}
    if done:
        done_ids = np.array(sorted(done), dtype=np.int32)

        def drop_done(tbl: pa.Table) -> pa.Table:
            pids = tbl.column("partition_id").to_numpy()
            keep = ~np.isin(pids, done_ids)
            return tbl.filter(pa.array(keep))

        ds = ds.map_batches(drop_done, batch_format="pyarrow")
    signals_ref = _load_signals(cfg.features)
    fn = _make_group_fn(cfg.features, signals_ref, output_dir=cfg.engine.output_dir)
    manifest_rows = ds.groupby("partition_id").map_groups(fn, batch_format="pyarrow").take_all()
    report = job_report(list(done.values()) + manifest_rows)
    report["resumed_partitions"] = len(done)
    return report
