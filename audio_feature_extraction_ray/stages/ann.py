"""Similarity search over an embedding column (list<float>).

- Brute-force cosine top-k: the exact baseline. Query matrix broadcast once
  (ray.put); every batch computes a float64 GEMM against it and emits only its
  LOCAL top-k per query (k rows per query per batch leave the task, not the
  batch), then a tiny groupby(query_id) merge keeps the global top-k.
- IVF: the scale path. Seeded driver-side k-means (on a sample) -> broadcast
  centroids -> per-batch cluster assignment; queries probe the nprobe nearest
  clusters and score only candidate rows. Approximate: recall measured in
  tests against the brute-force baseline.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data


def _emb_matrix(tbl: pa.Table, col: str = "embedding") -> np.ndarray:
    arr = tbl.column(col).combine_chunks()
    flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    return flat.reshape(tbl.num_rows, -1)


def _norm_rows(m: np.ndarray) -> np.ndarray:
    n = np.sqrt((m * m).sum(axis=1, keepdims=True))
    n[n == 0] = 1.0
    return m / n


def brute_force_topk(
    ds: ray.data.Dataset,
    queries: np.ndarray,
    query_ids: np.ndarray,
    k: int = 5,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    exclude_self: bool = True,
) -> ray.data.Dataset:
    qn = _norm_rows(queries.astype(np.float64))
    qref = ray.put((qn, query_ids.astype(np.int64)))

    def partial(tbl: pa.Table) -> pa.Table:
        qm, qids = ray.get(qref)
        if tbl.num_rows == 0:
            return pa.table(
                {"query_id": pa.array([], pa.int64()), "neighbor_id": pa.array([], pa.int64()),
                 "cos_sim": pa.array([], pa.float64())}
            )
        cm = _norm_rows(_emb_matrix(tbl, emb_col))
        ids = tbl.column(id_col).to_numpy().astype(np.int64)
        sims = cm @ qm.T  # (n, Q)
        if exclude_self:
            for qi, qid in enumerate(qids):
                sims[ids == qid, qi] = -np.inf
        kk = min(k, sims.shape[0])
        top = np.argpartition(-sims, kk - 1, axis=0)[:kk]  # (kk, Q)
        out_q, out_n, out_s = [], [], []
        for qi, qid in enumerate(qids):
            sel = top[:, qi]
            out_q.extend([int(qid)] * len(sel))
            out_n.extend(ids[sel].tolist())
            out_s.extend(sims[sel, qi].tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "neighbor_id": pa.array(out_n, pa.int64()),
                "cos_sim": pa.array(out_s, pa.float64()),
            }
        )

    partials = ds.map_batches(partial, batch_format="pyarrow")

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g[np.isfinite(g["cos_sim"])]
        g = g.sort_values(["cos_sim", "neighbor_id"], ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        g["cos_sim"] = np.floor(g["cos_sim"] * 1e6 + 0.5) / 1e6
        return g[["query_id", "rank", "neighbor_id", "cos_sim"]]

    return partials.groupby("query_id").map_groups(merge, batch_format="pandas")


# ---------------------------------------------------------------------------
# IVF (inverted file) variant


def _kmeans(sample: np.ndarray, n_clusters: int, iters: int = 10, seed: int = 11) -> np.ndarray:
    rng = np.random.default_rng(seed)
    idx = rng.choice(sample.shape[0], size=min(n_clusters, sample.shape[0]), replace=False)
    cent = sample[idx].copy()
    for _ in range(iters):
        d = ((sample[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for c in range(cent.shape[0]):
            m = assign == c
            if m.any():
                cent[c] = sample[m].mean(axis=0)
    return cent


def ivf_topk(
    ds: ray.data.Dataset,
    queries: np.ndarray,
    query_ids: np.ndarray,
    k: int = 5,
    n_clusters: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    sample: np.ndarray | None = None,
    exclude_self: bool = True,
) -> ray.data.Dataset:
    """Approximate top-k: score only rows whose IVF cell is among each query's
    nprobe nearest cells. Same output schema as brute_force_topk."""
    if sample is None:
        sample_tbl = pa.concat_tables(
            b for b in ds.limit(4096).iter_batches(batch_size=4096, batch_format="pyarrow")
        )
        sample = _emb_matrix(sample_tbl, emb_col)
    cent = _kmeans(sample.astype(np.float64), n_clusters)
    qn = _norm_rows(queries.astype(np.float64))
    qd = ((qn[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
    probe = np.argsort(qd, axis=1)[:, :nprobe]  # (Q, nprobe)
    ref = ray.put((qn, query_ids.astype(np.int64), cent, probe))

    def partial(tbl: pa.Table) -> pa.Table:
        qm, qids, cents, probes = ray.get(ref)
        empty = pa.table(
            {"query_id": pa.array([], pa.int64()), "neighbor_id": pa.array([], pa.int64()),
             "cos_sim": pa.array([], pa.float64())}
        )
        if tbl.num_rows == 0:
            return empty
        cm_raw = _emb_matrix(tbl, emb_col)
        cm = _norm_rows(cm_raw)
        ids = tbl.column(id_col).to_numpy().astype(np.int64)
        d = ((cm_raw[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        cell = d.argmin(axis=1)  # (n,)
        out_q, out_n, out_s = [], [], []
        for qi, qid in enumerate(qids):
            cand = np.isin(cell, probes[qi])
            if exclude_self:
                cand &= ids != qid
            if not cand.any():
                continue
            sims = cm[cand] @ qm[qi]
            cids = ids[cand]
            kk = min(k, sims.size)
            sel = np.argpartition(-sims, kk - 1)[:kk]
            out_q.extend([int(qid)] * kk)
            out_n.extend(cids[sel].tolist())
            out_s.extend(sims[sel].tolist())
        if not out_q:
            return empty
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "neighbor_id": pa.array(out_n, pa.int64()),
                "cos_sim": pa.array(out_s, pa.float64()),
            }
        )

    partials = ds.map_batches(partial, batch_format="pyarrow")

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["cos_sim", "neighbor_id"], ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        g["cos_sim"] = np.floor(g["cos_sim"] * 1e6 + 0.5) / 1e6
        return g[["query_id", "rank", "neighbor_id", "cos_sim"]]

    return partials.groupby("query_id").map_groups(merge, batch_format="pandas")
