"""sf_dir-facing queries for the dedup family and similarity search
(documents + embeddings tables), with DuckDB oracles where exactly
SQL-expressible."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data

from ..stages import ann, dedup

N_QUERIES = 8
TOP_K = 5


def _docs(sf_dir: str) -> ray.data.Dataset:
    return ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])


# --- exact dedup: keep min doc_id per identical text ------------------------


def dedup_exact_docs(sf_dir: str) -> ray.data.Dataset:
    out = dedup.exact_dedup(_docs(sf_dir), id_col="doc_id", text_col="text")
    return out.map_batches(
        lambda t: t.select(["doc_id", "content_md5"]), batch_format="pyarrow"
    )


DEDUP_EXACT_DOCS_SQL = """
SELECT doc_id, md5(text) AS content_md5
FROM (
  SELECT doc_id, text, row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
  FROM documents
) WHERE rn = 1
"""


# --- incremental dedup: new batch vs already-ingested corpus ----------------


def _split_id(sf_dir: str) -> int:
    """floor(max_doc_id / 2) from parquet FOOTER stats (no data read)."""
    md = pq.read_metadata(f"{sf_dir}/documents.parquet")
    mx = None
    for rg in range(md.num_row_groups):
        for ci in range(md.row_group(rg).num_columns):
            col = md.row_group(rg).column(ci)
            if col.path_in_schema == "doc_id" and col.statistics is not None:
                m = col.statistics.max
                mx = m if mx is None else max(mx, m)
    if mx is None:  # stats absent: one tiny column scan
        import pyarrow.compute as pc

        mx = int(pc.max(pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id"]).column("doc_id")).as_py())
    return int(mx) // 2


def dedup_incremental_docs(sf_dir: str) -> ray.data.Dataset:
    """Docs with doc_id >= split are the incoming batch; keep those whose
    content never occurs among doc_id < split (the ingested corpus), min-id
    per content within the batch. One digest-keyed exchange over BOTH sides."""
    return dedup.incremental_dedup(_docs(sf_dir), split_id=_split_id(sf_dir))


DEDUP_INCREMENTAL_DOCS_SQL = """
WITH split AS (SELECT CAST(floor(max(doc_id) / 2) AS BIGINT) AS s FROM documents),
old AS (SELECT DISTINCT md5(text) AS h FROM documents, split WHERE doc_id < s),
new AS (SELECT doc_id, md5(text) AS h FROM documents, split WHERE doc_id >= s)
SELECT doc_id, h AS content_md5
FROM (
  SELECT doc_id, h, row_number() OVER (PARTITION BY h ORDER BY doc_id) AS rn
  FROM new WHERE h NOT IN (SELECT h FROM old)
) WHERE rn = 1
"""


# --- keep-best representative per duplicate cluster -------------------------


def dedup_keep_best_docs(sf_dir: str) -> ray.data.Dataset:
    """Per identical text keep the copy with the highest quality score
    (fixed-point, identical arithmetic to the doc_quality oracle), ties ->
    min doc_id."""
    from .text_analysis import quality_scores

    def attach_quality(tbl: pa.Table) -> pa.Table:
        q = quality_scores(tbl.column("text"))
        return tbl.append_column("quality", pa.array(q, pa.float64()))

    ds = _docs(sf_dir).map_batches(attach_quality, batch_format="pyarrow")
    out = dedup.keep_best_dedup(ds, score_col="quality", id_col="doc_id", text_col="text")
    return out.map_batches(
        lambda t: t.select(["doc_id", "content_md5", "quality"]), batch_format="pyarrow"
    )


def _dedup_keep_best_sql() -> str:
    from .text_analysis import QUALITY_EXPR, QUALITY_T_CTE

    return f"""
WITH {QUALITY_T_CTE},
q AS (SELECT doc_id, md5(text) AS content_md5, {QUALITY_EXPR} AS quality FROM t)
SELECT doc_id, content_md5, quality
FROM (
  SELECT *, row_number() OVER (PARTITION BY content_md5
                               ORDER BY quality DESC, doc_id) AS rn
  FROM q
) WHERE rn = 1
"""


# --- keep-first-per-key over a coarser key (real drops on this data) --------


def docs_first_per_key(sf_dir: str) -> ray.data.Dataset:
    """Min-id row per (lang, source): the repo's bounded-pid exchange idiom
    (map-side keep-min partial -> hash route on the composite key -> one
    vectorized keep-first kernel per partition) rather than a native
    multi-column groupby — group count never dictates task count."""
    import pyarrow.compute as pc

    from ..functions.hashing import string_hash_strong
    from ..stages.dedup import _neq_prev_mask

    P = 8
    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang", "source", "n_chars"]
    )

    def partial(tbl: pa.Table) -> pa.Table:
        key = pc.binary_join_element_wise(
            tbl.column("lang").cast(pa.string()),
            tbl.column("source").cast(pa.string()),
            "\x1f",
        )
        if isinstance(key, pa.ChunkedArray):
            key = key.combine_chunks()
        ids = tbl.column("doc_id").to_numpy()
        kobj = np.asarray(key, dtype=object)
        order = np.lexsort((ids, kobj))
        ks = kobj[order]
        first = np.ones(order.size, dtype=bool)
        first[1:] = ks[1:] != ks[:-1]
        keep = np.sort(order[first])
        tbl = tbl.append_column("__key", key).append_column(
            "__pid",
            pa.array((string_hash_strong(key) % np.uint64(P)).astype(np.int32)),
        )
        return tbl.take(pa.array(keep)) if keep.size < tbl.num_rows else tbl

    def keep_first(tbl: pa.Table) -> pa.Table:
        tbl = tbl.sort_by([("__key", "ascending"), ("doc_id", "ascending")])
        head = _neq_prev_mask(tbl.column("__key"))
        out = tbl if head.all() else tbl.filter(pa.array(head))
        return out.drop_columns(["__key", "__pid"])

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("__pid")
        .map_groups(keep_first, batch_format="pyarrow")
    )


DOCS_FIRST_PER_KEY_SQL = """
SELECT doc_id, lang, source, n_chars
FROM (
  SELECT *, row_number() OVER (PARTITION BY lang, source ORDER BY doc_id) AS rn
  FROM documents
) WHERE rn = 1
"""


# --- exact token-set Jaccard pairs over a small sample (SQL-checkable) ------

JACCARD_SAMPLE_N = 400  # 10x the round-2 sample — the vectorized Gram kernel
# needs no per-pair Python, so the bound is oracle cost, not engine cost
JACCARD_MIN = 0.05


def jaccard_pairs_sample(sf_dir: str) -> ray.data.Dataset:
    import pyarrow.compute as pc

    ds = _docs(sf_dir).map_batches(
        lambda t: t.filter(pc.less(t.column("doc_id"), JACCARD_SAMPLE_N)),
        batch_format="pyarrow",
    )
    return dedup.jaccard_pairs(ds, min_jaccard=JACCARD_MIN)


# token-set jaccard: distinct tokens (crc32-hash free: set semantics on the
# token strings gives the same cardinalities as the unique-hash sets modulo
# crc32 collisions, which the fixture vocabulary cannot produce)
JACCARD_PAIRS_SQL = f"""
WITH d AS (
  SELECT doc_id, list_distinct(string_split(text, ' ')) AS toks
  FROM documents WHERE doc_id < {JACCARD_SAMPLE_N}
)
SELECT a.doc_id AS a, b.doc_id AS b,
       floor(CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
             / (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks)))
             * 1e6 + 0.5) / 1e6 AS jaccard
FROM d a JOIN d b ON a.doc_id < b.doc_id
WHERE CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
      / (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks))) >= {JACCARD_MIN}
"""


# --- near-dup candidates (rows-only checks: not SQL-expressible) ------------


def minhash_lsh_docs(sf_dir: str, max_bucket: int = dedup.MAX_BUCKET) -> ray.data.Dataset:
    """max_bucket is the LSH mega-bucket guard (dropped buckets are logged
    per partition — see stages.dedup.MAX_BUCKET)."""
    return dedup.minhash_lsh_pairs(_docs(sf_dir), threshold=0.5, max_bucket=max_bucket)


def simhash_pairs_docs(sf_dir: str, max_bucket: int = dedup.MAX_BUCKET) -> ray.data.Dataset:
    return dedup.simhash_pairs(_docs(sf_dir), max_hamming=6, max_bucket=max_bucket)


def doc_signatures(sf_dir: str) -> ray.data.Dataset:
    """SimHash + rolling-fingerprint + MinHash-first-perm signature table
    (rows-only check: the hash functions are not SQL-expressible; determinism
    and self-consistency are pinned in pytest)."""
    from ..functions.hashing import minhash_signatures_batch
    from ..functions.text import fingerprint64
    from ..stages.dedup import _u64_to_i64, simhash_signatures_batch

    def fn(tbl: pa.Table) -> pa.Table:
        texts = tbl.column("text").to_pylist()
        sh = simhash_signatures_batch(tbl.column("text"))
        fp = [_u64_to_i64(fingerprint64(t)) for t in texts]
        mh0 = minhash_signatures_batch(tbl.column("text"), num_perm=16)[:, 0]
        return pa.table(
            {
                "doc_id": tbl.column("doc_id"),
                "simhash": pa.array(sh.view(np.int64)),
                "fp64": pa.array(fp, pa.int64()),
                "minhash0": pa.array(mh0.view(np.int64)),
            }
        )

    return _docs(sf_dir).map_batches(fn, batch_format="pyarrow")


# --- similarity search ------------------------------------------------------


def _load_queries(sf_dir: str) -> tuple[np.ndarray, np.ndarray]:
    # pushdown-filtered read: only row groups containing the query id range
    # leave storage — never a driver-side full-table materialization
    sub = pq.read_table(
        f"{sf_dir}/embeddings.parquet",
        columns=["vec_id", "embedding"],
        filters=[("vec_id", "<", N_QUERIES)],
    )
    q = ann._emb_matrix(sub)
    return q, sub.column("vec_id").to_numpy()


def _query_side(sf_dir: str, max_id: int) -> ray.data.Dataset:
    import pyarrow.compute as pc

    return ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    ).map_batches(
        lambda t: t.filter(pc.less(t.column("vec_id"), max_id)), batch_format="pyarrow"
    )


def _kmeans_sample(sf_dir: str) -> np.ndarray:
    # bounded pushdown-filtered driver read so the corpus plan is never
    # executed just to sample it
    return ann._emb_matrix(
        pq.read_table(
            f"{sf_dir}/embeddings.parquet",
            columns=["embedding"],
            filters=[("vec_id", "<", 4096)],
        )
    )


def ann_bruteforce(sf_dir: str) -> ray.data.Dataset:
    """Exact cosine top-k via the Dataset x Dataset join at FULL probe
    (round-2 verdict #7: both sides distributed, no driver-side query
    matrix — exactness is unchanged because every cell is probed).
    ann.brute_force_topk remains as the ndarray convenience for tiny
    in-memory query sets."""
    corpus = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    return ann.ivf_knn_join(
        corpus,
        _query_side(sf_dir, N_QUERIES),
        k=TOP_K,
        n_clusters=8,
        nprobe=8,
        sample=_kmeans_sample(sf_dir),
    )


ANN_BRUTEFORCE_SQL = f"""
WITH q AS (
  SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qe
  FROM embeddings WHERE vec_id < {N_QUERIES}
), c AS (
  SELECT vec_id AS nid, CAST(embedding AS DOUBLE[]) AS ne FROM embeddings
), s AS (
  SELECT qid, nid,
         list_dot_product(qe, ne)
           / (sqrt(list_dot_product(qe, qe)) * sqrt(list_dot_product(ne, ne))) AS sim
  FROM q CROSS JOIN c
  WHERE qid != nid
), r AS (
  SELECT qid, nid, sim,
         row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rank
  FROM s
)
SELECT qid AS query_id, rank, nid AS neighbor_id,
       floor(sim * 1e6 + 0.5) / 1e6 AS cos_sim
FROM r WHERE rank <= {TOP_K}
"""


EMB_DUP_N = 200
EMB_DUP_THRESHOLD = 0.35


def embedding_dups(sf_dir: str) -> ray.data.Dataset:
    """Embedding-cosine near-dup pairs (a < b, cos >= threshold) over the
    first EMB_DUP_N vectors — blocked matmul per batch against a broadcast
    candidate matrix; SQL oracle does the exact pairwise form."""
    import pyarrow.compute as pc
    import ray as _ray

    sub = pq.read_table(
        f"{sf_dir}/embeddings.parquet",
        columns=["vec_id", "embedding"],
        filters=[("vec_id", "<", EMB_DUP_N)],
    )
    cand = ann._norm_rows(ann._emb_matrix(sub))
    cand_ids = sub.column("vec_id").to_numpy().astype(np.int64)
    ref = _ray.put((cand, cand_ids))

    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    ds = ds.map_batches(
        lambda tb: tb.filter(pc.less(tb.column("vec_id"), EMB_DUP_N)), batch_format="pyarrow"
    )

    def pairs(tbl: pa.Table) -> pa.Table:
        cm, cids = _ray.get(ref)
        empty = pa.table(
            {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
             "cos_sim": pa.array([], pa.float64())}
        )
        if tbl.num_rows == 0:
            return empty
        m = ann._norm_rows(ann._emb_matrix(tbl))
        ids = tbl.column("vec_id").to_numpy().astype(np.int64)
        sims = m @ cm.T
        ii, jj = np.nonzero((sims >= EMB_DUP_THRESHOLD) & (ids[:, None] < cids[None, :]))
        if ii.size == 0:
            return empty
        return pa.table(
            {
                "a": pa.array(ids[ii], pa.int64()),
                "b": pa.array(cids[jj], pa.int64()),
                "cos_sim": pa.array(np.floor(sims[ii, jj] * 1e6 + 0.5) / 1e6, pa.float64()),
            }
        )

    return ds.map_batches(pairs, batch_format="pyarrow")


EMBEDDING_DUPS_SQL = f"""
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
  FROM embeddings WHERE vec_id < {EMB_DUP_N}
), s AS (
  SELECT a.vec_id AS a, b.vec_id AS b,
         list_dot_product(a.v, b.v)
           / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) AS sim
  FROM e a JOIN e b ON a.vec_id < b.vec_id
)
SELECT a, b, floor(sim * 1e6 + 0.5) / 1e6 AS cos_sim
FROM s WHERE sim >= {EMB_DUP_THRESHOLD}
"""


def ann_ivf(sf_dir: str) -> ray.data.Dataset:
    """Approximate IVF top-k via the distributed Dataset x Dataset join
    (round-2 verdict #7); recall vs brute force pinned in pytest."""
    corpus = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    return ann.ivf_knn_join(
        corpus,
        _query_side(sf_dir, N_QUERIES),
        k=TOP_K,
        n_clusters=16,
        nprobe=4,
        sample=_kmeans_sample(sf_dir),
    )


KNN_JOIN_QUERIES = 100
KNN_JOIN_K = 3


def knn_join_exact(sf_dir: str) -> ray.data.Dataset:
    """Dataset x Dataset k-NN join (both sides distributed — no driver-side
    query matrix, the scale path for large query sets). Full probe -> exact,
    hash-checked against the SQL cross-join oracle."""
    corpus = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    import pyarrow.compute as pc

    queries = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    ).map_batches(
        lambda t: t.filter(pc.less(t.column("vec_id"), KNN_JOIN_QUERIES)),
        batch_format="pyarrow",
    )
    # k-means sample from a pushdown-filtered driver read (bounded) so the
    # corpus plan is not executed a third time just to sample it
    sample = ann._emb_matrix(
        pq.read_table(
            f"{sf_dir}/embeddings.parquet",
            columns=["embedding"],
            filters=[("vec_id", "<", 4096)],
        )
    )
    return ann.ivf_knn_join(
        corpus, queries, k=KNN_JOIN_K, n_clusters=8, nprobe=8, sample=sample
    )


KNN_JOIN_EXACT_SQL = f"""
WITH q AS (
  SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qe
  FROM embeddings WHERE vec_id < {KNN_JOIN_QUERIES}
), c AS (
  SELECT vec_id AS nid, CAST(embedding AS DOUBLE[]) AS ne FROM embeddings
), s AS (
  SELECT qid, nid,
         list_dot_product(qe, ne)
           / (sqrt(list_dot_product(qe, qe)) * sqrt(list_dot_product(ne, ne))) AS sim
  FROM q CROSS JOIN c
  WHERE qid != nid
), r AS (
  SELECT qid, nid, sim,
         row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rank
  FROM s
)
SELECT qid AS query_id, rank, nid AS neighbor_id,
       floor(sim * 1e6 + 0.5) / 1e6 AS cos_sim
FROM r WHERE rank <= {KNN_JOIN_K}
"""


def ann_ivf_fullprobe(sf_dir: str) -> ray.data.Dataset:
    """IVF with nprobe == n_clusters: every cell is probed, so the result is
    EXACTLY the brute-force top-k — which gives the whole IVF machinery
    (k-means, broadcast centroids, cell assignment, candidate scoring, tie
    -break merge) a hash-checked SQL oracle. The approximate path (ann_ivf,
    nprobe=4) stays rows-only with its recall pinned in pytest."""
    q, qids = _load_queries(sf_dir)
    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    return ann.ivf_topk(ds, q, qids, k=TOP_K, n_clusters=16, nprobe=16)


# ---------------------------------------------------------------------------
# embedding transform: L2 normalization, emitted long-format (vec_id, dim,
# nval) so the flat schema is hash-comparable. Norms are computed with a
# SEQUENTIAL cumsum reduction, matching DuckDB's left-to-right
# list_dot_product order bit-for-bit (numpy's pairwise .sum() would not).

NORM_IDS = 50


def embedding_normalize(sf_dir: str) -> ray.data.Dataset:
    import pyarrow.compute as pc

    ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    ).map_batches(
        lambda t: t.filter(pc.less(t.column("vec_id"), NORM_IDS)),
        batch_format="pyarrow",
    )

    def fn(tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0:
            return pa.table(
                {"vec_id": pa.array([], pa.int64()), "dim": pa.array([], pa.int64()),
                 "nval": pa.array([], pa.float64())}
            )
        arr = tbl.column("embedding").combine_chunks()
        flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
        m = flat.reshape(tbl.num_rows, -1)
        d = m.shape[1]
        # sequential (left-to-right) sum of squares == SQL list_dot_product
        norm = np.sqrt(np.cumsum(m * m, axis=1)[:, -1])
        norm[norm == 0] = 1.0
        nv = m / norm[:, None]
        return pa.table(
            {
                "vec_id": pa.array(np.repeat(tbl.column("vec_id").to_numpy(), d), pa.int64()),
                "dim": pa.array(np.tile(np.arange(d, dtype=np.int64), tbl.num_rows)),
                "nval": pa.array(np.floor(nv.ravel() * 1e6 + 0.5) / 1e6, pa.float64()),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


EMBEDDING_NORMALIZE_SQL = f"""
WITH t AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
  FROM embeddings WHERE vec_id < {NORM_IDS}
)
SELECT vec_id,
       unnest(range(len(e))) AS dim,
       unnest(list_transform(e, x -> floor(x / sqrt(list_dot_product(e, e)) * 1e6 + 0.5) / 1e6))
         AS nval
FROM t
"""


# ---------------------------------------------------------------------------
# int8 scalar quantization (symmetric, per-vector absmax scale) — the
# standard 4x embedding-compression step before an ANN index at corpus
# scale (FAISS SQ8 / product-quantizer front end): q_i = round(e_i / s),
# s = max|e| / 127, so every component lands in [-127, 127]. Purely
# per-row (one map_batches, no exchange); all outputs INTEGER (the code
# q_i, and the scale quantized to nano units) so the SQL oracle
# hash-matches exactly. round is floor(x + 0.5) on BOTH sides — numpy
# round() is banker's and would disagree with SQL at .5 boundaries.


def embedding_quantize(sf_dir: str) -> ray.data.Dataset:
    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])

    def fn(tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0:
            return pa.table(
                {"vec_id": pa.array([], pa.int64()), "dim": pa.array([], pa.int64()),
                 "qval": pa.array([], pa.int64()), "scale_e9": pa.array([], pa.int64())}
            )
        arr = tbl.column("embedding").combine_chunks()
        flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
        m = flat.reshape(tbl.num_rows, -1)
        d = m.shape[1]
        s = np.abs(m).max(axis=1) / 127.0
        safe = np.where(s == 0, 1.0, s)
        q = np.floor(m / safe[:, None] + 0.5).astype(np.int64)
        q[s == 0] = 0
        return pa.table(
            {
                "vec_id": pa.array(np.repeat(tbl.column("vec_id").to_numpy(), d), pa.int64()),
                "dim": pa.array(np.tile(np.arange(d, dtype=np.int64), tbl.num_rows)),
                "qval": pa.array(q.ravel(), pa.int64()),
                "scale_e9": pa.array(
                    np.repeat(np.floor(s * 1e9 + 0.5).astype(np.int64), d), pa.int64()
                ),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


EMBEDDING_QUANTIZE_SQL = """
WITH t AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
         list_max(list_transform(CAST(embedding AS DOUBLE[]), x -> abs(x))) / 127.0 AS s
  FROM embeddings
)
SELECT vec_id,
       unnest(range(len(e))) AS dim,
       unnest(list_transform(e, x -> CASE WHEN s = 0 THEN 0
                                          ELSE CAST(floor(x / s + 0.5) AS BIGINT) END)) AS qval,
       CAST(floor(s * 1e9 + 0.5) AS BIGINT) AS scale_e9
FROM t
"""


# ---------------------------------------------------------------------------
# near-dup clustering: connected components over exact-Jaccard pairs (the
# iterative label-propagation operator in stages/graph.py), hash-checked
# against a recursive-CTE SQL oracle.

CLUSTER_N = 500
CLUSTER_MIN_J = 0.9


def dup_clusters(sf_dir: str) -> ray.data.Dataset:
    import pyarrow.compute as pc

    from ..stages.graph import connected_components

    ds = _docs(sf_dir).map_batches(
        lambda t: t.filter(pc.less(t.column("doc_id"), CLUSTER_N)),
        batch_format="pyarrow",
    )
    pairs = dedup.jaccard_pairs(ds, min_jaccard=CLUSTER_MIN_J)
    out = connected_components(pairs, a_col="a", b_col="b")
    return out.map_batches(
        lambda t: pa.table(
            {"doc_id": t.column("node"), "cluster_id": t.column("label")}
        ),
        batch_format="pyarrow",
    )


DUP_CLUSTERS_SQL = f"""
WITH RECURSIVE d AS (
  SELECT doc_id, list_distinct(string_split(text, ' ')) AS toks
  FROM documents WHERE doc_id < {CLUSTER_N}
), e0 AS (
  SELECT a.doc_id AS a, b.doc_id AS b
  FROM d a JOIN d b ON a.doc_id < b.doc_id
  WHERE CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
        / (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks)))
        >= {CLUSTER_MIN_J}
), e AS (
  SELECT a, b FROM e0 UNION ALL SELECT b, a FROM e0
), reach(id, anc) AS (
  SELECT a, a FROM e
  UNION
  SELECT e.a, reach.anc FROM e JOIN reach ON reach.id = e.b
)
SELECT id AS doc_id, CAST(min(anc) AS BIGINT) AS cluster_id
FROM reach GROUP BY id
"""


# ---------------------------------------------------------------------------
# PageRank over the near-dup similarity graph (fixed-point integer
# arithmetic -> bit-exact; the SQL oracle unrolls the same integer update).

PR_N = 300
PR_ITERS = 5


def doc_pagerank(sf_dir: str) -> ray.data.Dataset:
    import pyarrow.compute as pc

    from ..stages.graph import pagerank

    ds = _docs(sf_dir).map_batches(
        lambda t: t.filter(pc.less(t.column("doc_id"), PR_N)),
        batch_format="pyarrow",
    )
    pairs = dedup.jaccard_pairs(ds, min_jaccard=CLUSTER_MIN_J)
    out = pagerank(pairs, a_col="a", b_col="b", iters=PR_ITERS)
    return out.map_batches(
        lambda t: pa.table({"doc_id": t.column("node"), "rank_fp": t.column("rank_fp")}),
        batch_format="pyarrow",
    )


def _pagerank_sql() -> str:
    head = f"""
WITH d AS (
  SELECT doc_id, list_distinct(string_split(text, ' ')) AS toks
  FROM documents WHERE doc_id < {PR_N}
), e0 AS (
  SELECT a.doc_id AS a, b.doc_id AS b
  FROM d a JOIN d b ON a.doc_id < b.doc_id
  WHERE CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
        / (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks)))
        >= {CLUSTER_MIN_J}
), e AS (
  SELECT a AS src, b AS dst FROM e0 UNION ALL SELECT b, a FROM e0
), deg AS (
  SELECT src, count(*) AS deg FROM e GROUP BY src
), nn AS (SELECT count(*) AS c FROM deg),
p0 AS (
  SELECT deg.src AS node,
         CAST(1000000000000 // nn.c AS BIGINT) AS r
  FROM deg, nn
)"""
    step = """,
p{i} AS (
  SELECT e.dst AS node,
         CAST((SELECT CAST(floor(0.15 * 1000000000000.0 / c) AS BIGINT) FROM nn)
              + 85 * sum(p.r // dg.deg) // 100 AS BIGINT) AS r
  FROM e
  JOIN p{prev} p ON p.node = e.src
  JOIN deg dg ON dg.src = e.src
  GROUP BY e.dst
)"""
    body = "".join(step.format(i=i, prev=i - 1) for i in range(1, PR_ITERS + 1))
    return head + body + f"\nSELECT node AS doc_id, r AS rank_fp FROM p{PR_ITERS}"


DOC_PAGERANK_SQL = _pagerank_sql()


# ---------------------------------------------------------------------------
# edit-distance near-dup pairs (sample-bound), SQL-oracled via DuckDB's
# levenshtein over the same prefixes.

EDIST_N = 40
EDIST_PREFIX = 64
EDIST_MAX = 45


def edit_distance_pairs_sample(sf_dir: str) -> ray.data.Dataset:
    import pyarrow.compute as pc

    ds = _docs(sf_dir).map_batches(
        lambda t: t.filter(pc.less(t.column("doc_id"), EDIST_N)),
        batch_format="pyarrow",
    )
    return dedup.edit_distance_pairs(
        ds, prefix_len=EDIST_PREFIX, max_dist=EDIST_MAX
    )


EDIT_DISTANCE_PAIRS_SQL = f"""
SELECT a.doc_id AS a, b.doc_id AS b,
       levenshtein(substr(a.text, 1, {EDIST_PREFIX}), substr(b.text, 1, {EDIST_PREFIX})) AS edist
FROM documents a JOIN documents b ON a.doc_id < b.doc_id
WHERE a.doc_id < {EDIST_N} AND b.doc_id < {EDIST_N}
  AND levenshtein(substr(a.text, 1, {EDIST_PREFIX}), substr(b.text, 1, {EDIST_PREFIX})) <= {EDIST_MAX}
"""


# --- corpus-curation macro-pipeline: dedup -> quality filter -> pack --------

CURATE_MIN_QUALITY = 0.5


def curate_pack(sf_dir: str) -> ray.data.Dataset:
    """The end-to-end corpus-curation pipeline in one lazy Dataset chain:
    keep the best-quality copy per identical text (keep_best_dedup), drop
    docs below the quality floor, then sequence-pack the SURVIVORS in
    doc_id order (GPT-style pack-and-chunk layout). Three operator families
    composed — digest exchange, vectorized filter, distributed prefix sum —
    with one SQL oracle for the whole chain."""
    import pyarrow.compute as pc

    from .text_analysis import _pack_bounds, _pack_docs, quality_scores

    def attach_quality(tbl: pa.Table) -> pa.Table:
        q = quality_scores(tbl.column("text"))
        return tbl.append_column("quality", pa.array(q, pa.float64()))

    ds = _docs(sf_dir).map_batches(attach_quality, batch_format="pyarrow")
    best = dedup.keep_best_dedup(ds, score_col="quality", id_col="doc_id", text_col="text")
    survivors = best.map_batches(
        lambda t: t.filter(
            pc.greater_equal(t.column("quality"), CURATE_MIN_QUALITY)
        ).select(["doc_id", "text"]),
        batch_format="pyarrow",
    )
    return _pack_docs(survivors, _pack_bounds(sf_dir))


def _curate_pack_sql() -> str:
    from .text_analysis import QUALITY_EXPR, QUALITY_T_CTE, SEQ_LEN

    return f"""
WITH {QUALITY_T_CTE},
q AS (
  SELECT doc_id, md5(text) AS h, ntok, {QUALITY_EXPR} AS quality
  FROM t
),
best AS (
  SELECT doc_id, CAST(ntok AS BIGINT) AS n_tokens, quality
  FROM (
    SELECT *, row_number() OVER (PARTITION BY h
                                 ORDER BY quality DESC, doc_id) AS rn
    FROM q
  ) WHERE rn = 1
),
surv AS (SELECT doc_id, n_tokens FROM best WHERE quality >= {CURATE_MIN_QUALITY}),
c AS (
  SELECT doc_id, n_tokens,
         CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS off
  FROM surv
)
SELECT doc_id, n_tokens, off AS token_offset,
       off // {SEQ_LEN} AS seq_first,
       (off + greatest(n_tokens, 1) - 1) // {SEQ_LEN} AS seq_last,
       off % {SEQ_LEN} AS offset_in_seq
FROM c
"""


# ---------------------------------------------------------------------------
# LSH-bucketed embedding near-dup: the SCALE path for embedding-cosine
# deduplication (embedding_dups above broadcasts a candidate matrix — right
# for a bounded candidate set, wrong when BOTH sides are the whole corpus).
# Random-hyperplane (SimHash-for-vectors, Charikar 2002) signatures: 64 sign
# bits from a seeded Gaussian projection, banded 8x8 so pairs at cosine
# >= ~0.9 collide in >= 1 band w.h.p.; band-keyed exchange, partition-local
# vectorized bucket pair-gen (the dedup.py segment kernel, mega-bucket
# guarded), exact-cosine verification in-partition (each band row carries its
# L2-normalized vector — float32, dim-bounded; the co-partitioned fetch plan
# of minhash_lsh_pairs is the alternative when dim is large), then an a-keyed
# distinct. Deterministic end to end (fixed hyperplane seed) — pytest
# replicates the exact collision set in numpy and pins planted-dup recall.

EMB_LSH_BANDS = 8  # 8 bands x 8 bits of a 64-bit hyperplane signature
EMB_LSH_SEED = 271828
EMB_LSH_THRESHOLD = 0.9


def _hyperplanes(dim: int) -> np.ndarray:
    rng = np.random.default_rng(EMB_LSH_SEED)
    return rng.standard_normal((dim, 64))


def embedding_lsh_pairs(
    ds: ray.data.Dataset,
    threshold: float = EMB_LSH_THRESHOLD,
    num_partitions: int = 16,
    max_bucket: int = 2000,
) -> ray.data.Dataset:
    """(a, b, cos_sim) for band-colliding pairs with cosine >= threshold.
    `ds` columns: vec_id int64, embedding list<float>."""

    def sign_bands(tbl: pa.Table) -> pa.Table:
        # the (dim x 64) seeded Gaussian is rebuilt per batch — cheaper than
        # a broadcast at this size and identical by construction
        if tbl.num_rows == 0:
            return pa.table(
                {"vec_id": pa.array([], pa.int64()), "band": pa.array([], pa.int64()),
                 "vec": pa.array([], pa.list_(pa.float32()))}
            )
        m = ann._norm_rows(ann._emb_matrix(tbl))
        planes = _hyperplanes(m.shape[1])
        bits = (m @ planes) >= 0.0
        sig = (bits.astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum(axis=1)
        ids = tbl.column("vec_id").to_numpy().astype(np.int64)
        nb = EMB_LSH_BANDS
        width = 64 // nb
        out_id = np.repeat(ids, nb)
        out_band = np.empty(sig.size * nb, dtype=np.int64)
        for b in range(nb):
            part = ((sig >> np.uint64(width * b)) & np.uint64((1 << width) - 1)).astype(np.int64)
            out_band[b::nb] = (b << width) | part
        vec32 = np.repeat(m.astype(np.float32), nb, axis=0)
        return pa.table(
            {
                "vec_id": pa.array(out_id),
                "band": pa.array(out_band),
                "vec": pa.FixedSizeListArray.from_arrays(
                    pa.array(vec32.ravel(), pa.float32()), m.shape[1]
                ),
                "__pid": pa.array(dedup._pid_of_u64(out_band.view(np.uint64), num_partitions)),
            }
        )

    band_rows = ds.map_batches(sign_bands, batch_format="pyarrow")

    def pairs_kernel(tbl: pa.Table) -> pa.Table:
        empty = pa.table(
            {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
             "cos_sim": pa.array([], pa.float64())}
        )
        if tbl.num_rows == 0:
            return empty
        tbl = tbl.sort_by([("band", "ascending"), ("vec_id", "ascending")])
        band = tbl.column("band").to_numpy()
        ids = tbl.column("vec_id").to_numpy()
        a_idx, b_idx = dedup._segment_pairs(band, max_bucket, "embedding_lsh_pairs")
        if a_idx.size == 0:
            return empty
        vcol = tbl.column("vec").combine_chunks()
        vecs = vcol.flatten().to_numpy(zero_copy_only=False).astype(np.float64).reshape(
            tbl.num_rows, -1
        )
        cos = (vecs[a_idx] * vecs[b_idx]).sum(axis=1)
        keep = (cos >= threshold) & (ids[a_idx] != ids[b_idx])
        return pa.table(
            {
                "a": pa.array(ids[a_idx][keep], pa.int64()),
                "b": pa.array(ids[b_idx][keep], pa.int64()),
                "cos_sim": pa.array(np.floor(cos[keep] * 1e6 + 0.5) / 1e6, pa.float64()),
            }
        )

    cand = band_rows.groupby("__pid").map_groups(
        lambda g: pairs_kernel(g.drop_columns(["__pid"])), batch_format="pyarrow"
    )

    def tag_by_a(tbl: pa.Table) -> pa.Table:
        a = tbl.column("a").to_numpy()
        return tbl.append_column(
            "__pid", pa.array(dedup._pid_of_u64(a.view(np.uint64), num_partitions))
        )

    def distinct_kernel(tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0:
            return pa.table(
                {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
                 "cos_sim": pa.array([], pa.float64())}
            )
        a = tbl.column("a").to_numpy()
        b = tbl.column("b").to_numpy()
        order = np.lexsort((b, a))
        first = np.ones(order.size, dtype=bool)
        first[1:] = (a[order][1:] != a[order][:-1]) | (b[order][1:] != b[order][:-1])
        return tbl.take(pa.array(np.sort(order[first])))

    return (
        cand.map_batches(tag_by_a, batch_format="pyarrow")
        .groupby("__pid")
        .map_groups(lambda g: distinct_kernel(g.drop_columns(["__pid"])), batch_format="pyarrow")
    )


EMB_LSH_PLANT_JITTER = 0.02
EMB_LSH_PLANT_EVERY = 5


def _planted_embeddings(sf_dir: str) -> pa.Table:
    """Fixture embeddings + deterministic near-duplicates: every 5th vector
    gets a jittered copy at vec_id + 100000 (cosine ~0.999). The raw fixture
    has no high-cosine pairs (max ~0.51), so near-dup detection needs planted
    ground truth — same precedent as the synthesized media fixtures."""
    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = t.column("vec_id").to_numpy().astype(np.int64)
    m = ann._emb_matrix(t)
    pick = ids % EMB_LSH_PLANT_EVERY == 0
    rng = np.random.default_rng(9127)
    dup = m[pick] + EMB_LSH_PLANT_JITTER * rng.standard_normal(m[pick].shape)
    all_ids = np.concatenate([ids, ids[pick] + 100_000])
    all_m = np.concatenate([m, dup]).astype(np.float32)
    return pa.table(
        {
            "vec_id": pa.array(all_ids, pa.int64()),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(all_m.ravel(), pa.float32()), m.shape[1]
            ),
        }
    )


def embedding_lsh_dups(sf_dir: str) -> ray.data.Dataset:
    """Driver-contract query (rows-only: the collision set depends on the
    banding, not SQL-expressible; pinned exactly vs a numpy replication and
    against planted ground truth in pytest)."""
    ds = ray.data.from_arrow(_planted_embeddings(sf_dir))
    return embedding_lsh_pairs(ds)


# ---------------------------------------------------------------------------
# triangle count over the near-dup candidate graph: measures how clique-like
# the duplicate neighborhoods are (triangles/wedges is the graph's clustering
# signal). Same edge set as dup_clusters; counting runs in stages/graph.py's
# degree-oriented distributed kernel (wedges bounded O(m^1.5) by
# orientation, every stage a bounded hash exchange).


def dup_triangles(sf_dir: str):
    import pyarrow.compute as pc

    from ..stages.graph import triangle_count

    ds = _docs(sf_dir).map_batches(
        lambda t: t.filter(pc.less(t.column("doc_id"), CLUSTER_N)),
        batch_format="pyarrow",
    )
    pairs = dedup.jaccard_pairs(ds, min_jaccard=CLUSTER_MIN_J)
    return triangle_count(pairs, a_col="a", b_col="b")


DUP_TRIANGLES_SQL = f"""
WITH d AS (
  SELECT doc_id, list_distinct(string_split(text, ' ')) AS toks
  FROM documents WHERE doc_id < {CLUSTER_N}
), e0 AS (
  SELECT a.doc_id AS a, b.doc_id AS b
  FROM d a JOIN d b ON a.doc_id < b.doc_id
  WHERE CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
        / (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks)))
        >= {CLUSTER_MIN_J}
)
SELECT CAST(count(*) AS BIGINT) AS n_triangles
FROM e0 e1
JOIN e0 e2 ON e2.a = e1.a AND e2.b > e1.b
JOIN e0 e3 ON e3.a = e1.b AND e3.b = e2.b
"""


# ---------------------------------------------------------------------------
# metadata-FILTERED vector search: exact cosine top-k restricted to corpus
# vectors sharing the query's label (the "filtered ANN" shape every vector
# store needs). Both sides stay distributed: ONE exchange routes corpus and
# queries by label, and because a label's vectors are then co-located, the
# per-partition GEMM top-k is globally exact for that label — no second
# merge stage. Label skew note: a hot label concentrates in one partition;
# the IVF cell-routing path (ann.ivf_knn_join) is the escape hatch when one
# label's slice exceeds a worker (route by (label, cell) instead).

ANN_FILTER_PARTS = 8


def ann_filtered(sf_dir: str) -> ray.data.Dataset:
    import pyarrow.compute as pc

    emb = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding", "label"]
    )

    def tag(side: int):
        def fn(tbl: pa.Table) -> pa.Table:
            if side == 1:
                tbl = tbl.filter(pc.less(tbl.column("vec_id"), N_QUERIES))
            lbl = tbl.column("label").to_numpy(zero_copy_only=False).astype(np.int64)
            n = tbl.num_rows
            return pa.table(
                {
                    "vec_id": tbl.column("vec_id"),
                    "embedding": tbl.column("embedding"),
                    "label": tbl.column("label"),
                    "__side": pa.array(np.full(n, side, np.int8)),
                    "__pid": pa.array((lbl % ANN_FILTER_PARTS).astype(np.int32)),
                }
            )

        return fn

    out_schema = pa.schema(
        [
            ("query_id", pa.int64()),
            ("rank", pa.int64()),
            ("neighbor_id", pa.int64()),
            ("cos_sim", pa.float64()),
        ]
    )

    def kernel(tbl: pa.Table) -> pa.Table:
        tbl = tbl.drop_columns(["__pid"])
        side = tbl.column("__side").to_numpy(zero_copy_only=False)
        lbl = tbl.column("label").to_numpy(zero_copy_only=False).astype(np.int64)
        q_rows, n_rows_, s_rows = [], [], []
        for lab in np.unique(lbl[side == 1]):
            sel_q = (side == 1) & (lbl == lab)
            sel_c = (side == 0) & (lbl == lab)
            qt = tbl.filter(pa.array(sel_q))
            ct = tbl.filter(pa.array(sel_c))
            if ct.num_rows == 0:
                continue
            qm = ann._norm_rows(ann._emb_matrix(qt))
            cm = ann._norm_rows(ann._emb_matrix(ct))
            qids = qt.column("vec_id").to_numpy().astype(np.int64)
            cids = ct.column("vec_id").to_numpy().astype(np.int64)
            sims = cm @ qm.T  # (n, Q)
            for qi, qid in enumerate(qids):
                col = sims[:, qi].copy()
                col[cids == qid] = -np.inf
                order = np.lexsort((cids, -col))[: min(TOP_K, col.size)]
                order = order[np.isfinite(col[order])]
                q_rows.extend([int(qid)] * len(order))
                n_rows_.extend(cids[order].tolist())
                s_rows.extend(col[order].tolist())
        if not q_rows:
            return out_schema.empty_table()
        sim = np.floor(np.array(s_rows) * 1e6 + 0.5) / 1e6
        # rows were appended query-by-query in rank order; rank = 1-based
        # position within each contiguous query run
        qarr = np.array(q_rows, dtype=np.int64)
        same = np.zeros(qarr.size, dtype=bool)
        same[1:] = qarr[1:] == qarr[:-1]
        rank = np.cumsum(same) + 1
        starts = np.flatnonzero(~same)
        rank = rank - np.repeat(rank[starts] - 1, np.diff(np.append(starts, qarr.size)))
        return pa.table(
            {
                "query_id": pa.array(qarr, pa.int64()),
                "rank": pa.array(rank, pa.int64()),
                "neighbor_id": pa.array(n_rows_, pa.int64()),
                "cos_sim": pa.array(sim, pa.float64()),
            }
        )

    tagged = emb.map_batches(tag(0), batch_format="pyarrow").union(
        emb.map_batches(tag(1), batch_format="pyarrow")
    )
    return tagged.groupby("__pid").map_groups(kernel, batch_format="pyarrow")


ANN_FILTERED_SQL = f"""
WITH q AS (
  SELECT vec_id AS qid, label, CAST(embedding AS DOUBLE[]) AS qe
  FROM embeddings WHERE vec_id < {N_QUERIES}
), c AS (
  SELECT vec_id AS nid, label, CAST(embedding AS DOUBLE[]) AS ne FROM embeddings
), s AS (
  SELECT qid, nid,
         list_dot_product(qe, ne)
           / (sqrt(list_dot_product(qe, qe)) * sqrt(list_dot_product(ne, ne))) AS sim
  FROM q JOIN c USING (label)
  WHERE qid != nid
), r AS (
  SELECT qid, nid, sim,
         row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rank
  FROM s
)
SELECT qid AS query_id, rank, nid AS neighbor_id,
       floor(sim * 1e6 + 0.5) / 1e6 AS cos_sim
FROM r WHERE rank <= {TOP_K}
"""


# ---------------------------------------------------------------------------
# exact set-similarity JOIN over the whole documents table (no sampling, no
# all-pairs Gram): PPJoin prefix filtering in stages/dedup.jaccard_join.
# The oracle is the naive quadratic form — the join must reproduce it
# exactly, which also guards the prefix-filter theory (a dropped true pair
# would hash-mismatch).


JJ_N = 600  # query cap: the ORACLE is the quadratic form (O(n^2) in DuckDB),
# and this fixture's 31-token shared vocabulary defeats prefix pruning (every
# prefix bucket is a near-full bucket), so the driver-facing query bounds the
# doc set; the STAGE itself is uncapped and scales with real vocabulary skew.


def jaccard_join_docs(sf_dir: str) -> ray.data.Dataset:
    import pyarrow.compute as pc

    ds = _docs(sf_dir).map_batches(
        lambda t: t.filter(pc.less(t.column("doc_id"), JJ_N)), batch_format="pyarrow"
    )
    return dedup.jaccard_join(ds)


JACCARD_JOIN_SQL = f"""
WITH d AS (
  SELECT doc_id, list_distinct(string_split(text, ' ')) AS toks FROM documents
  WHERE doc_id < {JJ_N}
), p AS (
  SELECT a.doc_id AS a, b.doc_id AS b,
         len(list_intersect(a.toks, b.toks)) AS i,
         len(a.toks) AS na, len(b.toks) AS nb
  FROM d a JOIN d b ON a.doc_id < b.doc_id
)
SELECT a, b,
       floor(CAST(i AS DOUBLE) / (na + nb - i) * 1e6 + 0.5) / 1e6 AS jaccard
FROM p
WHERE i * {dedup.JJ_T_DEN} >= (na + nb - i) * {dedup.JJ_T_NUM}
"""


# ---------------------------------------------------------------------------
# ASYMMETRIC containment join: directed near-dup pairs a -> b with
# |toks(a) & toks(b)| / |toks(a)| >= 9/10 (stages/dedup.containment_join:
# one-sided prefix filter + exact set verification). Finds snippet-inside-
# superset relations the symmetric Jaccard threshold misses. Same oracle
# contract as jaccard_join_docs: the quadratic SQL form must be reproduced
# exactly, which also guards the one-sided prefix-filter theory.

CT_N = 600  # query cap: the ORACLE is quadratic; the STAGE is uncapped


def containment_join_docs(sf_dir: str) -> ray.data.Dataset:
    import pyarrow.compute as pc

    ds = _docs(sf_dir).map_batches(
        lambda t: t.filter(pc.less(t.column("doc_id"), CT_N)), batch_format="pyarrow"
    )
    return dedup.containment_join(ds)


CONTAINMENT_JOIN_SQL = f"""
WITH d AS (
  SELECT doc_id, list_distinct(string_split(text, ' ')) AS toks FROM documents
  WHERE doc_id < {CT_N}
), p AS (
  SELECT a.doc_id AS a, b.doc_id AS b,
         len(list_intersect(a.toks, b.toks)) AS i,
         len(a.toks) AS na
  FROM d a JOIN d b ON a.doc_id <> b.doc_id
)
SELECT a, b, CAST(i AS BIGINT) AS inter, CAST(na AS BIGINT) AS n_a,
       floor(CAST(i AS DOUBLE) / na * 1e6 + 0.5) / 1e6 AS containment
FROM p
WHERE i * {dedup.CT_T_DEN} >= na * {dedup.CT_T_NUM}
"""


# ---------------------------------------------------------------------------
# end-to-end FUZZY dedup macro: exact set-similarity join (J >= 0.9, PPJoin
# prefix filtering) -> connected-components clustering -> keep the min-id
# representative per cluster, survivors emitted via the distributed
# anti-join. The whole near-dup curation pipeline in one oracle-checked
# query: three operator families composed, and the SQL twin states the same
# thing with a recursive CTE — a dropped candidate pair anywhere in the
# engine path would hash-mismatch.


def near_dedup_keep(sf_dir: str) -> ray.data.Dataset:
    import pyarrow.compute as pc

    from ..stages.graph import connected_components
    from ..stages.join import copartitioned_semi_anti

    docs = _docs(sf_dir).map_batches(
        lambda t: t.filter(pc.less(t.column("doc_id"), CLUSTER_N)), batch_format="pyarrow"
    )
    pairs = dedup.jaccard_join(docs)
    labels = connected_components(pairs, a_col="a", b_col="b")
    dups = labels.map_batches(
        lambda t: pa.table(
            {"doc_id": t.column("node")}
        ).filter(pa.array(t.column("label").to_numpy() < t.column("node").to_numpy())),
        batch_format="pyarrow",
    )
    ids = docs.map_batches(lambda t: t.select(["doc_id"]), batch_format="pyarrow")
    return copartitioned_semi_anti(ids, dups, left_key="doc_id", right_key="doc_id", anti=True)


NEAR_DEDUP_KEEP_SQL = f"""
WITH RECURSIVE d AS (
  SELECT doc_id, list_distinct(string_split(text, ' ')) AS toks
  FROM documents WHERE doc_id < {CLUSTER_N}
), p AS (
  SELECT a.doc_id AS a, b.doc_id AS b,
         len(list_intersect(a.toks, b.toks)) AS i,
         len(a.toks) AS na, len(b.toks) AS nb
  FROM d a JOIN d b ON a.doc_id < b.doc_id
), e0 AS (
  SELECT a, b FROM p
  WHERE i * {dedup.JJ_T_DEN} >= (na + nb - i) * {dedup.JJ_T_NUM}
), e AS (
  SELECT a, b FROM e0 UNION ALL SELECT b, a FROM e0
), reach(id, anc) AS (
  SELECT a, a FROM e
  UNION
  SELECT e.a, reach.anc FROM e JOIN reach ON reach.id = e.b
), lbl AS (
  SELECT id, min(anc) AS l FROM reach GROUP BY id
)
SELECT doc_id FROM d
WHERE doc_id NOT IN (SELECT id FROM lbl WHERE l < id)
"""


# ---------------------------------------------------------------------------
# per-label embedding centroids: the vector-valued groupby (class centroid
# per label, one row per (label, dim) so the result is flat-schema and
# SQL-comparable). Sums are integer-quantized per dimension (Q=1e6), so the
# distributed fold is order-free and the final division is sequenced
# identically to the SQL oracle's avg over the same quantized values.

CENTROID_Q = 1_000_000
CENTROID_PARTS = 16


def embedding_centroids(sf_dir: str):
    import pandas as pd

    from ..functions.hashing import avalanche64
    from ..stages.fold import exchange_fold

    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["label", "embedding"])

    def partial(tbl: pa.Table) -> pa.Table:
        m = ann._emb_matrix(tbl)
        xq = np.rint(m.astype(np.float64) * CENTROID_Q).astype(np.int64)
        lbl = tbl.column("label").to_numpy(zero_copy_only=False).astype(np.int64)
        uniq, inv = np.unique(lbl, return_inverse=True)
        k, d = uniq.size, xq.shape[1]
        sums = np.zeros((k, d), dtype=np.int64)
        np.add.at(sums, inv, xq)
        n = np.bincount(inv, minlength=k).astype(np.int64)
        lab_rep = np.repeat(uniq, d)
        dim = np.tile(np.arange(d, dtype=np.int64), k)
        return pa.table(
            {
                "label": pa.array(lab_rep, pa.int64()),
                "dim": pa.array(dim, pa.int64()),
                "s": pa.array(sums.reshape(-1), pa.int64()),
                "n": pa.array(np.repeat(n, d), pa.int64()),
            }
        )

    def fold(tbl: pa.Table) -> pa.Table:
        agg = (
            tbl.group_by(["label", "dim"])
            .aggregate([("s", "sum"), ("n", "sum")])
            .rename_columns(["label", "dim", "s", "n"])
        )
        return agg

    def pid_of(tbl: pa.Table) -> np.ndarray:
        lab = tbl.column("label").to_numpy().astype(np.uint64)
        return (avalanche64(lab) % np.uint64(CENTROID_PARTS)).astype(np.int32)

    # ONE label-hash exchange merges the per-block (label, dim) partials
    # distributed (round-4 VERDICT #1: the driver previously folded
    # k x d x num_batches rows — O(blocks)); the driver now sees <= k x d
    # final rows regardless of block count.
    folded = exchange_fold(
        emb.map_batches(partial, batch_format="pyarrow"),
        fold,
        parts=CENTROID_PARTS,
        pid_of=pid_of,
    )
    if folded is None:
        return pd.DataFrame(columns=["label", "dim", "n", "centroid"])
    rows = []
    for lab, dim, s, n in sorted(
        zip(
            folded.column("label").to_pylist(),
            folded.column("dim").to_pylist(),
            folded.column("s").to_pylist(),
            folded.column("n").to_pylist(),
        )
    ):
        mean = float(np.floor((np.float64(s) / CENTROID_Q) / n * 1e6 + 0.5) / 1e6)
        rows.append((lab, dim, n, mean))
    return pd.DataFrame(rows, columns=["label", "dim", "n", "centroid"])


EMBEDDING_CENTROIDS_SQL = f"""
WITH u AS (
  SELECT label, i - 1 AS dim,
         CAST(round(CAST(embedding[i] AS DOUBLE) * {CENTROID_Q}) AS BIGINT) AS q
  FROM embeddings, UNNEST(range(1, len(embedding) + 1)) AS r(i)
)
SELECT label, dim, CAST(count(*) AS BIGINT) AS n,
       floor((CAST(sum(q) AS DOUBLE) / {CENTROID_Q}) / count(*) * 1e6 + 0.5) / 1e6
         AS centroid
FROM u GROUP BY label, dim
"""


# ---------------------------------------------------------------------------
# per-label per-dimension embedding VARIANCE — the spread companion to
# embedding_centroids (cluster compactness / feature-scale audit before
# whitening or quantization). Same integer-quantized one-exchange design:
# per-block (label, dim) partials now carry (sum q, sum q^2, n); the
# population second moment n*ss - s^2 is computed in python ints on the
# <= labels x dims driver fold (s^2 can pass 2^63 — the SQL twin uses
# HUGEINT for the same product), and the only float is the final
# division, on the shared 1e-6 grid.


def embedding_label_variance(sf_dir: str):
    import pandas as pd

    from ..functions.hashing import avalanche64
    from ..stages.fold import exchange_fold

    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["label", "embedding"])

    def partial(tbl: pa.Table) -> pa.Table:
        m = ann._emb_matrix(tbl)
        xq = np.rint(m.astype(np.float64) * CENTROID_Q).astype(np.int64)
        lbl = tbl.column("label").to_numpy(zero_copy_only=False).astype(np.int64)
        uniq, inv = np.unique(lbl, return_inverse=True)
        k, d = uniq.size, xq.shape[1]
        sums = np.zeros((k, d), dtype=np.int64)
        sqs = np.zeros((k, d), dtype=np.int64)
        np.add.at(sums, inv, xq)
        np.add.at(sqs, inv, xq * xq)
        n = np.bincount(inv, minlength=k).astype(np.int64)
        lab_rep = np.repeat(uniq, d)
        dim = np.tile(np.arange(d, dtype=np.int64), k)
        return pa.table(
            {
                "label": pa.array(lab_rep, pa.int64()),
                "dim": pa.array(dim, pa.int64()),
                "s": pa.array(sums.reshape(-1), pa.int64()),
                "ss": pa.array(sqs.reshape(-1), pa.int64()),
                "n": pa.array(np.repeat(n, d), pa.int64()),
            }
        )

    def fold(tbl: pa.Table) -> pa.Table:
        return (
            tbl.group_by(["label", "dim"])
            .aggregate([("s", "sum"), ("ss", "sum"), ("n", "sum")])
            .rename_columns(["label", "dim", "s", "ss", "n"])
        )

    def pid_of(tbl: pa.Table) -> np.ndarray:
        lab = tbl.column("label").to_numpy().astype(np.uint64)
        return (avalanche64(lab) % np.uint64(CENTROID_PARTS)).astype(np.int32)

    folded = exchange_fold(
        emb.map_batches(partial, batch_format="pyarrow"),
        fold,
        parts=CENTROID_PARTS,
        pid_of=pid_of,
    )
    if folded is None:
        return pd.DataFrame(columns=["label", "dim", "n", "variance"])
    rows = []
    for lab, dim, s, ss, n in sorted(
        zip(
            folded.column("label").to_pylist(),
            folded.column("dim").to_pylist(),
            folded.column("s").to_pylist(),
            folded.column("ss").to_pylist(),
            folded.column("n").to_pylist(),
        )
    ):
        m2 = n * ss - s * s  # exact python int (beyond int64 range is fine)
        var = float(
            np.floor(
                float(m2) / (float(n) * float(n)) / 1e12 * 1e6 + 0.5
            )
            / 1e6
        )
        rows.append((lab, dim, n, var))
    return pd.DataFrame(rows, columns=["label", "dim", "n", "variance"])


EMBEDDING_LABEL_VARIANCE_SQL = f"""
WITH u AS (
  SELECT label, i - 1 AS dim,
         CAST(round(CAST(embedding[i] AS DOUBLE) * {CENTROID_Q}) AS BIGINT) AS q
  FROM embeddings, UNNEST(range(1, len(embedding) + 1)) AS r(i)
), g AS (
  SELECT label, dim, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(q) AS BIGINT) AS s,
         sum(CAST(q AS HUGEINT) * q) AS ss
  FROM u GROUP BY label, dim
)
SELECT label, dim, n,
       floor(CAST(ss * n - CAST(s AS HUGEINT) * s AS DOUBLE)
             / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) / 1e12 * 1e6 + 0.5) / 1e6
         AS variance
FROM g
"""


# ---------------------------------------------------------------------------
# embedding-space QA: squared-L2 distance histogram over the deterministic
# adjacent pairing (vec_id 2k vs 2k+1) — the quick "does this embedding
# space look sane" scan (collapsed spaces pile into the low bins, scale
# drift shifts the mass). Pairs co-locate via ONE exchange on vec_id // 2;
# the per-pair distance uses a sequential left-to-right sum of squares in
# float64 so it matches the SQL list_sum order bit-for-bit; bin counts fold
# bounded.

DIST_HIST_WIDTH = 8  # bins of width 1/8 in squared-L2 units
DIST_HIST_PARTS = 16


def embedding_dist_hist(sf_dir: str):
    from ..functions.hashing import avalanche64
    from ..stages.fold import exchange_fold

    ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )

    def route(tbl: pa.Table) -> pa.Table:
        vid = tbl.column("vec_id").to_numpy()
        pid = (
            avalanche64((vid // 2).astype(np.uint64)) % np.uint64(DIST_HIST_PARTS)
        ).astype(np.int32)
        return tbl.append_column("__pid", pa.array(pid))

    def pair_hist(tbl: pa.Table) -> pa.Table:
        vid = tbl.column("vec_id").to_numpy()
        order = np.argsort(vid, kind="stable")
        vid = vid[order]
        arr = tbl.column("embedding").combine_chunks()
        flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
        m = flat.reshape(tbl.num_rows, -1)[order]
        pid2 = vid // 2
        # adjacent rows with the same pid2 and consecutive ids form a pair
        is_pair = np.zeros(vid.size, dtype=bool)
        if vid.size > 1:
            is_pair[:-1] = (pid2[:-1] == pid2[1:]) & (vid[:-1] + 1 == vid[1:])
        a = m[np.flatnonzero(is_pair)]
        b = m[np.flatnonzero(is_pair) + 1]
        if a.shape[0] == 0:
            return pa.table({"bin": pa.array([], pa.int64()), "n": pa.array([], pa.int64())})
        diff = a - b
        d2 = np.cumsum(diff * diff, axis=1)[:, -1]  # sequential == SQL list_sum
        bins = np.floor(d2 * DIST_HIST_WIDTH).astype(np.int64)
        uniq, cnt = np.unique(bins, return_counts=True)
        return pa.table(
            {"bin": pa.array(uniq, pa.int64()), "n": pa.array(cnt.astype(np.int64), pa.int64())}
        )

    hist = (
        ds.map_batches(route, batch_format="pyarrow")
        .groupby("__pid")
        .map_groups(lambda g: pair_hist(g.drop_columns(["__pid"])), batch_format="pyarrow")
    )
    folded = exchange_fold(
        hist,
        lambda t: t.group_by("bin").aggregate([("n", "sum")]).rename_columns(["bin", "n"]),
        pid_of=lambda t: (t.column("bin").to_numpy().astype(np.uint64) % np.uint64(8)).astype(np.int32),
    )
    if folded is None:
        return pd.DataFrame(
            {"bin": pd.Series([], dtype=np.int64), "n": pd.Series([], dtype=np.int64)}
        )
    return (
        folded.to_pandas().groupby("bin", as_index=False)["n"].sum().sort_values("bin")
        .reset_index(drop=True)
    )


EMBEDDING_DIST_HIST_SQL = f"""
WITH p AS (
  SELECT a.embedding AS ea, b.embedding AS eb
  FROM embeddings a JOIN embeddings b ON b.vec_id = a.vec_id + 1
  WHERE a.vec_id % 2 = 0),
d AS (
  SELECT list_sum(list_transform(range(1, len(ea) + 1),
           i -> (CAST(ea[i] AS DOUBLE) - CAST(eb[i] AS DOUBLE))
              * (CAST(ea[i] AS DOUBLE) - CAST(eb[i] AS DOUBLE)))) AS d2
  FROM p)
SELECT CAST(floor(d2 * {DIST_HIST_WIDTH}) AS BIGINT) AS bin, count(*) AS n
FROM d GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# HARD-NEGATIVE / HARD-POSITIVE MINING — the metric-learning data-prep op:
# for each anchor vector, the most-similar DIFFERENT-label vector (hardest
# negative) and the least-similar SAME-label vector (hardest positive),
# excluding self. Shape: anchors are a bounded broadcast (ray.put once, the
# ann_bruteforce idiom); every corpus block computes one float64 GEMM
# against them and emits <= 1 candidate row per anchor per block (argmax /
# argmin with tie -> smaller id, sentinel +-inf when a block has no
# candidate of that class); candidates merge through ONE exchange_fold
# keyed by anchor, so driver traffic is O(anchors x parts). Sims round to
# the shared 1e-6 grid only at OUTPUT (ranking is on raw float64, same as
# the SQL twin's row_number over raw sim — the knn_join_exact contract).

HARDMINE_ANCHORS = 50


def embedding_hard_negatives(sf_dir: str):
    import pandas as pd

    from ..stages import ann
    from ..stages.fold import exchange_fold

    qt = pq.read_table(
        f"{sf_dir}/embeddings.parquet",
        columns=["vec_id", "embedding", "label"],
        filters=[("vec_id", "<", HARDMINE_ANCHORS)],
    )
    empty = pd.DataFrame(
        columns=["anchor_id", "label", "hard_neg_id", "hard_neg_sim",
                 "hard_pos_id", "hard_pos_sim"]
    )
    if qt.num_rows == 0:
        return empty
    a_ids = qt.column("vec_id").to_numpy().astype(np.int64)
    a_lab = qt.column("label").to_numpy(zero_copy_only=False).astype(np.int64)
    am = ann._emb_matrix(qt)
    an = am / np.linalg.norm(am, axis=1, keepdims=True)
    aref = ray.put((a_ids, a_lab, an))

    def cand(tbl: pa.Table) -> pa.Table:
        ids_a, lab_a, an_ = ray.get(aref)
        k = ids_a.size
        if tbl.num_rows == 0:
            return pa.table(
                {
                    "anchor_id": pa.array([], pa.int64()),
                    "label": pa.array([], pa.int64()),
                    "neg_id": pa.array([], pa.int64()),
                    "neg_sim": pa.array([], pa.float64()),
                    "pos_id": pa.array([], pa.int64()),
                    "pos_sim": pa.array([], pa.float64()),
                }
            )
        m = ann._emb_matrix(tbl)
        mn = m / np.linalg.norm(m, axis=1, keepdims=True)
        sims = mn @ an_.T  # (rows, anchors)
        nid = tbl.column("vec_id").to_numpy().astype(np.int64)
        nlab = tbl.column("label").to_numpy(zero_copy_only=False).astype(np.int64)
        neg_sim = np.full(k, -np.inf)
        neg_id = np.full(k, -1, dtype=np.int64)
        pos_sim = np.full(k, np.inf)
        pos_id = np.full(k, -1, dtype=np.int64)
        for j in range(k):  # anchors are a small constant, not data-sized
            s = sims[:, j]
            diff = (nlab != lab_a[j]) & (nid != ids_a[j])
            same = (nlab == lab_a[j]) & (nid != ids_a[j])
            if diff.any():
                di = np.nonzero(diff)[0]
                best = di[np.lexsort((nid[di], -s[di]))[0]]
                neg_sim[j], neg_id[j] = s[best], nid[best]
            if same.any():
                si = np.nonzero(same)[0]
                best = si[np.lexsort((nid[si], s[si]))[0]]
                pos_sim[j], pos_id[j] = s[best], nid[best]
        return pa.table(
            {
                "anchor_id": pa.array(ids_a, pa.int64()),
                "label": pa.array(lab_a, pa.int64()),
                "neg_id": pa.array(neg_id, pa.int64()),
                "neg_sim": pa.array(neg_sim, pa.float64()),
                "pos_id": pa.array(pos_id, pa.int64()),
                "pos_sim": pa.array(pos_sim, pa.float64()),
            }
        )

    def fold(tbl: pa.Table) -> pa.Table:
        df = tbl.to_pandas()
        rows = []
        for aid, g in df.groupby("anchor_id", sort=True):
            gn = g.sort_values(["neg_sim", "neg_id"], ascending=[False, True]).iloc[0]
            gp = g.sort_values(["pos_sim", "pos_id"], ascending=[True, True]).iloc[0]
            rows.append(
                (aid, int(g["label"].iloc[0]), int(gn["neg_id"]), float(gn["neg_sim"]),
                 int(gp["pos_id"]), float(gp["pos_sim"]))
            )
        out = pd.DataFrame(
            rows, columns=["anchor_id", "label", "neg_id", "neg_sim", "pos_id", "pos_sim"]
        )
        return pa.Table.from_pandas(out, preserve_index=False)

    ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding", "label"]
    )
    folded = exchange_fold(
        ds.map_batches(cand, batch_format="pyarrow"),
        fold,
        pid_of=lambda t: (
            t.column("anchor_id").to_numpy().astype(np.uint64) % np.uint64(16)
        ).astype(np.int32),
    )
    if folded is None:
        return pd.DataFrame(
            columns=["anchor_id", "label", "hard_neg_id", "hard_neg_sim",
                     "hard_pos_id", "hard_pos_sim"]
        )
    df = fold(folded).to_pandas()
    df = df[(df["neg_id"] >= 0) & (df["pos_id"] >= 0)].sort_values("anchor_id")
    return pd.DataFrame(
        {
            "anchor_id": df["anchor_id"].to_numpy(np.int64),
            "label": df["label"].to_numpy(np.int64),
            "hard_neg_id": df["neg_id"].to_numpy(np.int64),
            "hard_neg_sim": np.floor(df["neg_sim"].to_numpy() * 1e6 + 0.5) / 1e6,
            "hard_pos_id": df["pos_id"].to_numpy(np.int64),
            "hard_pos_sim": np.floor(df["pos_sim"].to_numpy() * 1e6 + 0.5) / 1e6,
        }
    ).reset_index(drop=True)


HARD_NEGATIVES_SQL = f"""
WITH a AS (
  SELECT vec_id AS aid, label AS alab, CAST(embedding AS DOUBLE[]) AS ae
  FROM embeddings WHERE vec_id < {HARDMINE_ANCHORS}
), c AS (
  SELECT vec_id AS nid, label AS nlab, CAST(embedding AS DOUBLE[]) AS ne
  FROM embeddings
), s AS (
  SELECT aid, alab, nid, nlab,
         list_dot_product(ae, ne)
           / (sqrt(list_dot_product(ae, ae)) * sqrt(list_dot_product(ne, ne))) AS sim
  FROM a CROSS JOIN c WHERE aid != nid
), neg AS (
  SELECT aid, nid, sim,
         row_number() OVER (PARTITION BY aid ORDER BY sim DESC, nid) AS rn
  FROM s WHERE nlab != alab
), pos AS (
  SELECT aid, nid, sim,
         row_number() OVER (PARTITION BY aid ORDER BY sim ASC, nid) AS rn
  FROM s WHERE nlab = alab
)
SELECT a.aid AS anchor_id, CAST(a.alab AS BIGINT) AS label,
       n.nid AS hard_neg_id, floor(n.sim * 1e6 + 0.5) / 1e6 AS hard_neg_sim,
       p.nid AS hard_pos_id, floor(p.sim * 1e6 + 0.5) / 1e6 AS hard_pos_sim
FROM a
JOIN neg n ON n.aid = a.aid AND n.rn = 1
JOIN pos p ON p.aid = a.aid AND p.rn = 1
ORDER BY anchor_id
"""


# ---------------------------------------------------------------------------
# COSINE BALL COUNT (range search) — for each anchor, how many corpus
# vectors lie within cosine >= tau: the neighborhood-DENSITY feature that
# tunes semdedup thresholds and flags embedding-space outliers (density 1 =
# only itself). Dual of top-k search: the radius is fixed, the count is the
# answer. Broadcast anchors (ray.put once), per-batch GEMM emits one
# partial-count row per anchor per block (counters only), ONE anchor-keyed
# exchange_fold sums them — O(anchors x parts) driver traffic. The tau
# comparison happens on the 1e-6-rounded similarity on BOTH sides, so the
# boundary is grid-exact against the SQL twin.

BALL_ANCHORS = 50
BALL_TAU = 0.2


def embedding_ball_count(sf_dir: str):
    import pandas as pd

    from ..stages import ann
    from ..stages.fold import exchange_fold

    qt = pq.read_table(
        f"{sf_dir}/embeddings.parquet",
        columns=["vec_id", "embedding"],
        filters=[("vec_id", "<", BALL_ANCHORS)],
    )
    if qt.num_rows == 0:
        return pd.DataFrame(columns=["anchor_id", "n_in_ball"])
    a_ids = qt.column("vec_id").to_numpy().astype(np.int64)
    am = ann._emb_matrix(qt)
    an = am / np.linalg.norm(am, axis=1, keepdims=True)
    aref = ray.put((a_ids, an))

    def partial(tbl: pa.Table) -> pa.Table:
        ids_a, an_ = ray.get(aref)
        if tbl.num_rows == 0:
            return pa.table(
                {"anchor_id": pa.array([], pa.int64()), "n": pa.array([], pa.int64())}
            )
        m = ann._emb_matrix(tbl)
        mn = m / np.linalg.norm(m, axis=1, keepdims=True)
        sims = np.floor(mn @ an_.T * 1e6 + 0.5) / 1e6  # shared grid
        cnt = (sims >= BALL_TAU).sum(axis=0).astype(np.int64)
        return pa.table(
            {"anchor_id": pa.array(ids_a, pa.int64()), "n": pa.array(cnt, pa.int64())}
        )

    def fold(tbl: pa.Table) -> pa.Table:
        return (
            tbl.group_by(["anchor_id"]).aggregate([("n", "sum")])
            .rename_columns(["anchor_id", "n"])
        )

    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    folded = exchange_fold(
        ds.map_batches(partial, batch_format="pyarrow"),
        fold,
        pid_of=lambda t: (
            t.column("anchor_id").to_numpy().astype(np.uint64) % np.uint64(16)
        ).astype(np.int32),
    )
    if folded is None:
        return pd.DataFrame(columns=["anchor_id", "n_in_ball"])
    df = fold(folded).to_pandas().sort_values("anchor_id").reset_index(drop=True)
    return pd.DataFrame(
        {
            "anchor_id": df["anchor_id"].to_numpy(np.int64),
            "n_in_ball": df["n"].to_numpy(np.int64),
        }
    )


BALL_COUNT_SQL = f"""
WITH a AS (
  SELECT vec_id AS aid, CAST(embedding AS DOUBLE[]) AS ae
  FROM embeddings WHERE vec_id < {BALL_ANCHORS}
), c AS (
  SELECT vec_id AS nid, CAST(embedding AS DOUBLE[]) AS ne FROM embeddings
), s AS (
  SELECT aid,
         floor(list_dot_product(ae, ne)
           / (sqrt(list_dot_product(ae, ae)) * sqrt(list_dot_product(ne, ne)))
           * 1e6 + 0.5) / 1e6 AS sim
  FROM a CROSS JOIN c
)
SELECT aid AS anchor_id, CAST(count(*) FILTER (WHERE sim >= {BALL_TAU}) AS BIGINT) AS n_in_ball
FROM s GROUP BY aid ORDER BY aid
"""


# ---------------------------------------------------------------------------
# K-CORE OF THE NEAR-DUP GRAPH — the dense heart: nodes whose every member
# has >= K near-duplicate neighbors after iterated peeling (stages/graph.py
# kcore). Where dup_clusters keeps loose chains, the k-core isolates the
# template farms / mirror nests worth aggressive dedup. Engine peels to the
# fixpoint and RAISES if that takes more than KCORE_UNROLL rounds — the SQL
# twin unrolls exactly KCORE_UNROLL peel rounds, so the runtime guard IS the
# exact-regime contract (the hll_langs_exact idiom). Doc cap = CLUSTER_N for
# oracle comparability only (the quadratic jaccard join); the stage itself
# is uncapped pair-scale.

KCORE_K = 3
KCORE_UNROLL = 8


def dup_kcore(sf_dir: str) -> ray.data.Dataset:
    import pyarrow.compute as pc

    from ..stages.graph import kcore

    ds = _docs(sf_dir).map_batches(
        lambda t: t.filter(pc.less(t.column("doc_id"), CLUSTER_N)),
        batch_format="pyarrow",
    )
    pairs = dedup.jaccard_pairs(ds, min_jaccard=CLUSTER_MIN_J)
    out = kcore(pairs, KCORE_K, max_rounds=KCORE_UNROLL)
    return out.map_batches(
        lambda t: pa.table({"doc_id": t.column("node"), "degree": t.column("degree")}),
        batch_format="pyarrow",
    )


def _kcore_sql() -> str:
    # every CTE is MATERIALIZED: the default inlining re-expands e{i-1}
    # three times per round, i.e. 3^UNROLL copies of the base parquet scan
    rounds = []
    for i in range(KCORE_UNROLL):
        rounds.append(
            f"n{i} AS MATERIALIZED (SELECT a AS node FROM e{i} GROUP BY a HAVING count(*) >= {KCORE_K}),\n"
            f"e{i+1} AS MATERIALIZED (SELECT e{i}.a, e{i}.b FROM e{i} "
            f"JOIN n{i} x ON e{i}.a = x.node JOIN n{i} y ON e{i}.b = y.node)"
        )
    body = ",\n".join(rounds)
    return f"""
WITH d AS MATERIALIZED (
  SELECT doc_id, list_distinct(string_split(text, ' ')) AS toks
  FROM documents WHERE doc_id < {CLUSTER_N}
), p AS MATERIALIZED (
  SELECT a.doc_id AS a, b.doc_id AS b
  FROM d a JOIN d b ON a.doc_id < b.doc_id
  WHERE CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
        / (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks)))
        >= {CLUSTER_MIN_J}
), e0 AS MATERIALIZED (
  SELECT a, b FROM p UNION ALL SELECT b, a FROM p
),
{body}
SELECT a AS doc_id, CAST(count(*) AS BIGINT) AS degree
FROM e{KCORE_UNROLL} GROUP BY a HAVING count(*) >= {KCORE_K}
"""


DUP_KCORE_SQL = _kcore_sql()


# ---------------------------------------------------------------------------
# TRUNCATION RECALL (Matryoshka audit) — before shipping half-width vectors
# (memory/bandwidth halved at serving time), measure what fraction of each
# query's exact full-dimension top-K survives when BOTH sides are truncated
# to the leading TRUNC_DIM coordinates and re-normalized. Two full-probe
# (= exact) distributed kNN joins share the ivf machinery; the overlap count
# folds over query_id — bounded by N_QUERIES x K rows, data-size-independent
# (the query side is the small side by construction, as in ann_bruteforce).

TRUNC_DIM = 32


def embedding_trunc_recall(sf_dir: str):
    import pandas as pd
    import pyarrow.compute as pc

    corpus = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    queries = _query_side(sf_dir, N_QUERIES)
    sample = _kmeans_sample(sf_dir)

    def trunc(tbl: pa.Table) -> pa.Table:
        emb = tbl.column("embedding").combine_chunks()
        n = len(emb)
        if n == 0:
            return tbl
        flat = emb.flatten().to_numpy(zero_copy_only=False)
        dim = flat.size // n
        m = flat.reshape(n, dim)[:, :TRUNC_DIM]
        offs = (np.arange(n + 1, dtype=np.int64) * TRUNC_DIM).astype(np.int32)
        arr = pa.ListArray.from_arrays(
            pa.array(offs, pa.int32()), pa.array(m.ravel(), pa.from_numpy_dtype(m.dtype))
        )
        return pa.table({"vec_id": tbl.column("vec_id"), "embedding": arr})

    full = ann.ivf_knn_join(
        corpus, queries, k=TOP_K, n_clusters=8, nprobe=8, sample=sample
    )
    truncated = ann.ivf_knn_join(
        corpus.map_batches(trunc, batch_format="pyarrow"),
        queries.map_batches(trunc, batch_format="pyarrow"),
        k=TOP_K,
        n_clusters=8,
        nprobe=8,
        sample=sample[:, :TRUNC_DIM],
    )
    # bounded folds: N_QUERIES x K rows each, independent of corpus size
    fdf = full.to_pandas()[["query_id", "neighbor_id"]]
    tdf = truncated.to_pandas()[["query_id", "neighbor_id"]]
    both = fdf.merge(tdf, on=["query_id", "neighbor_id"], how="inner")
    n_overlap = both.groupby("query_id").size()
    out = pd.DataFrame({"query_id": sorted(fdf["query_id"].unique())})
    out["n_overlap"] = out["query_id"].map(n_overlap).fillna(0).astype(np.int64)
    out["recall_1e6"] = (out["n_overlap"] * 10**6) // TOP_K
    return out


EMBEDDING_TRUNC_RECALL_SQL = f"""
WITH q AS (
  SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qe
  FROM embeddings WHERE vec_id < {N_QUERIES}
), c AS (
  SELECT vec_id AS nid, CAST(embedding AS DOUBLE[]) AS ne FROM embeddings
), rf AS (
  SELECT qid, nid,
         row_number() OVER (PARTITION BY qid ORDER BY
           list_dot_product(qe, ne)
             / (sqrt(list_dot_product(qe, qe)) * sqrt(list_dot_product(ne, ne))) DESC,
           nid) AS rank
  FROM q CROSS JOIN c WHERE qid != nid
), rt AS (
  SELECT qid, nid,
         row_number() OVER (PARTITION BY qid ORDER BY
           list_dot_product(list_slice(qe, 1, {TRUNC_DIM}), list_slice(ne, 1, {TRUNC_DIM}))
             / (sqrt(list_dot_product(list_slice(qe, 1, {TRUNC_DIM}), list_slice(qe, 1, {TRUNC_DIM})))
                * sqrt(list_dot_product(list_slice(ne, 1, {TRUNC_DIM}), list_slice(ne, 1, {TRUNC_DIM})))) DESC,
           nid) AS rank
  FROM q CROSS JOIN c WHERE qid != nid
)
SELECT f.qid AS query_id,
       CAST(count(t.nid) AS BIGINT) AS n_overlap,
       CAST(count(t.nid) AS BIGINT) * 1000000 // {TOP_K} AS recall_1e6
FROM (SELECT qid, nid FROM rf WHERE rank <= {TOP_K}) f
LEFT JOIN (SELECT qid, nid FROM rt WHERE rank <= {TOP_K}) t
  ON f.qid = t.qid AND f.nid = t.nid
GROUP BY f.qid
"""


# ---------------------------------------------------------------------------
# SOFT-DEDUP WEIGHTS — instead of dropping near-duplicates, DOWN-WEIGHT
# them: every doc in a near-dup cluster of size s gets training weight 1/s,
# so each duplicated content unit contributes one doc-equivalent of mass
# (the reweighting alternative to removal discussed alongside SemDeDup).
# Composes the existing machinery: jaccard candidate pairs -> pointer-
# jumping CC labels -> ONE label-keyed size exchange -> co-partitioned
# joins back to the (capped-for-oracle) doc set; singletons keep weight 1.
# weight_1e6 = 1e6 // s, integer-exact in SQL too.


def softdedup_weights(sf_dir: str) -> ray.data.Dataset:
    import pyarrow.compute as pc

    from ..stages.graph import connected_components
    from ..stages.join import copartitioned_equijoin

    docs = _docs(sf_dir).map_batches(
        lambda t: t.filter(pc.less(t.column("doc_id"), CLUSTER_N)),
        batch_format="pyarrow",
    )
    pairs = dedup.jaccard_pairs(docs, min_jaccard=CLUSTER_MIN_J)
    labels = connected_components(pairs, a_col="a", b_col="b").materialize()

    def size_partial(tbl: pa.Table) -> pa.Table:
        lbl = tbl.column("label").to_numpy()
        uniq, cnt = np.unique(lbl, return_counts=True)
        return pa.table(
            {
                "label": pa.array(uniq, pa.int64()),
                "sz": pa.array(cnt.astype(np.int64), pa.int64()),
                "__pid": pa.array((uniq % 16).astype(np.int32)),
            }
        )

    def size_finish(tbl: pa.Table) -> pa.Table:
        tbl = tbl.drop_columns(["__pid"])
        g = tbl.group_by("label").aggregate([("sz", "sum")]).rename_columns(["label", "sz"])
        return g

    sizes = (
        labels.map_batches(size_partial, batch_format="pyarrow")
        .groupby("__pid")
        .map_groups(size_finish, batch_format="pyarrow")
    )
    node_sz = copartitioned_equijoin(
        labels,
        sizes,
        "label",
        "label",
        ["node"],
        ["sz"],
        fact_col_types={"node": pa.int64()},
        dim_col_types={"sz": pa.int64()},
        key_type=pa.int64(),
    )
    joined = copartitioned_equijoin(
        docs.map_batches(lambda t: t.select(["doc_id"]), batch_format="pyarrow"),
        node_sz,
        "doc_id",
        "node",
        [],
        ["sz"],
        fact_col_types={},
        dim_col_types={"sz": pa.int64()},
        key_type=pa.int64(),
        how="left",
    )

    def finish(tbl: pa.Table) -> pa.Table:
        sz = tbl.column("sz").to_numpy(zero_copy_only=False)
        sz = np.where(np.isnan(sz.astype(np.float64)), 1, sz).astype(np.int64)
        return pa.table(
            {
                "doc_id": tbl.column("doc_id"),
                "cluster_size": pa.array(sz, pa.int64()),
                "weight_1e6": pa.array((10**6 // sz).astype(np.int64), pa.int64()),
            }
        )

    return joined.map_batches(finish, batch_format="pyarrow")


SOFTDEDUP_WEIGHTS_SQL = f"""
WITH RECURSIVE d AS (
  SELECT doc_id, list_distinct(string_split(text, ' ')) AS toks
  FROM documents WHERE doc_id < {CLUSTER_N}
), e0 AS (
  SELECT a.doc_id AS a, b.doc_id AS b
  FROM d a JOIN d b ON a.doc_id < b.doc_id
  WHERE CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
        / (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks)))
        >= {CLUSTER_MIN_J}
), e AS (
  SELECT a, b FROM e0 UNION ALL SELECT b, a FROM e0
), reach(id, anc) AS (
  SELECT a, a FROM e
  UNION
  SELECT e.a, reach.anc FROM e JOIN reach ON reach.id = e.b
), lbl AS (
  SELECT id, min(anc) AS label FROM reach GROUP BY id
), sz AS (
  SELECT label, CAST(count(*) AS BIGINT) AS s FROM lbl GROUP BY label
)
SELECT doc.doc_id,
       COALESCE(sz.s, CAST(1 AS BIGINT)) AS cluster_size,
       CAST(1000000 AS BIGINT) // COALESCE(sz.s, CAST(1 AS BIGINT)) AS weight_1e6
FROM (SELECT doc_id FROM documents WHERE doc_id < {CLUSTER_N}) doc
LEFT JOIN lbl ON lbl.id = doc.doc_id
LEFT JOIN sz USING (label)
"""


# ---------------------------------------------------------------------------
# EMBEDDING OUTLIERS — per-vector squared distance to its label centroid
# with an exact integer outlier gate (d2 * m > 4 * sum(d2), i.e. more than
# 4x the label's mean squared distance): the vector-space anomaly audit
# (mislabeled vectors, encoder glitches, distribution-drift tails) — the
# embedding analog of events_daily_anomalies. Pass 1 folds quantized
# centroid sums through the label exchange (bounded by labels x dim);
# pass 2 is stateless given the broadcast centroids, emitting each term on
# the 1e12 grid BEFORE the order-free integer sum over dims (dispersion
# idiom); the label totals fold counters-only and the final flag compares
# d2 > (4*tot) // m — python-int exact, SQL HUGEINT twin.


def embedding_outliers(sf_dir: str) -> ray.data.Dataset:
    from ..functions.hashing import avalanche64
    from ..stages.fold import exchange_fold

    emb = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "label", "embedding"]
    )

    def cpartial(tbl: pa.Table) -> pa.Table:
        m = ann._emb_matrix(tbl)
        xq = np.rint(m * CENTROID_Q).astype(np.int64)
        lbl = tbl.column("label").to_numpy(zero_copy_only=False).astype(np.int64)
        uniq, inv = np.unique(lbl, return_inverse=True)
        k, d = uniq.size, xq.shape[1]
        sums = np.zeros((k, d), dtype=np.int64)
        np.add.at(sums, inv, xq)
        n = np.bincount(inv, minlength=k).astype(np.int64)
        return pa.table(
            {
                "label": pa.array(np.repeat(uniq, d), pa.int64()),
                "dim": pa.array(np.tile(np.arange(d, dtype=np.int64), k), pa.int64()),
                "s": pa.array(sums.reshape(-1), pa.int64()),
                "n": pa.array(np.repeat(n, d), pa.int64()),
            }
        )

    def pid_of(tbl: pa.Table) -> np.ndarray:
        lab = tbl.column("label").to_numpy().astype(np.uint64)
        return (avalanche64(lab) % np.uint64(CENTROID_PARTS)).astype(np.int32)

    folded = exchange_fold(
        emb.map_batches(cpartial, batch_format="pyarrow"),
        lambda t: t.group_by(["label", "dim"])
        .aggregate([("s", "sum"), ("n", "sum")])
        .rename_columns(["label", "dim", "s", "n"]),
        parts=CENTROID_PARTS,
        pid_of=pid_of,
    )
    if folded is None:
        return ray.data.from_arrow(
            pa.table(
                {"vec_id": pa.array([], pa.int64()), "label": pa.array([], pa.int64()),
                 "d2_1e12": pa.array([], pa.int64()), "is_outlier": pa.array([], pa.int64())}
            )
        )
    fl = folded.to_pandas().groupby(["label", "dim"], as_index=False).sum()
    labels = np.sort(fl["label"].unique())
    dmax = int(fl["dim"].max()) + 1
    cmat = np.zeros((labels.size, dmax), dtype=np.float64)
    lab_index = {int(l): i for i, l in enumerate(labels)}
    for _, r in fl.iterrows():  # bounded: labels x dim rows
        # mirror the SQL op order: (s / n) / Q
        cmat[lab_index[int(r["label"])], int(r["dim"])] = (
            float(r["s"]) / float(r["n"])
        ) / CENTROID_Q

    def d2_pass(tbl: pa.Table) -> pa.Table:
        m = ann._emb_matrix(tbl)
        lbl = tbl.column("label").to_numpy(zero_copy_only=False).astype(np.int64)
        li = np.array([lab_index[int(x)] for x in np.unique(lbl)], dtype=np.int64)
        _, inv = np.unique(lbl, return_inverse=True)
        c = cmat[li[inv]]
        diff = m - c
        terms = np.floor(diff * diff * 1e12 + 0.5).astype(np.int64)
        d2 = terms.sum(axis=1)  # int64-safe: 64 dims x bounded grid terms
        return pa.table(
            {
                "vec_id": tbl.column("vec_id"),
                "label": pa.array(lbl, pa.int64()),
                "d2_1e12": pa.array(d2, pa.int64()),
            }
        )

    d2_ds = emb.map_batches(d2_pass, batch_format="pyarrow").materialize()

    def tpartial(tbl: pa.Table) -> pa.Table:
        lbl = tbl.column("label").to_numpy()
        d2 = tbl.column("d2_1e12").to_numpy()
        uniq, inv = np.unique(lbl, return_inverse=True)
        tot = np.zeros(uniq.size, dtype=np.int64)
        np.add.at(tot, inv, d2)
        cnt = np.bincount(inv, minlength=uniq.size).astype(np.int64)
        return pa.table(
            {
                "label": pa.array(uniq, pa.int64()),
                "tot": pa.array(tot, pa.int64()),
                "m": pa.array(cnt, pa.int64()),
            }
        )

    tf = exchange_fold(
        d2_ds.map_batches(tpartial, batch_format="pyarrow"),
        lambda t: t.group_by("label")
        .aggregate([("tot", "sum"), ("m", "sum")])
        .rename_columns(["label", "tot", "m"]),
        parts=CENTROID_PARTS,
        pid_of=pid_of,
    )
    td = tf.to_pandas().groupby("label", as_index=False).sum()
    thr = {
        int(r["label"]): (4 * int(r["tot"])) // int(r["m"]) for _, r in td.iterrows()
    }  # python-int exact (SQL: HUGEINT)

    def flag(tbl: pa.Table) -> pa.Table:
        lbl = tbl.column("label").to_numpy()
        d2 = tbl.column("d2_1e12").to_numpy()
        t = np.array([thr[int(x)] for x in np.unique(lbl)], dtype=np.int64)
        _, inv = np.unique(lbl, return_inverse=True)
        out = (d2 > t[inv]).astype(np.int64)
        return tbl.append_column("is_outlier", pa.array(out, pa.int64()))

    return d2_ds.map_batches(flag, batch_format="pyarrow")


EMBEDDING_OUTLIERS_SQL = f"""
WITH u AS (
  SELECT vec_id, label, i - 1 AS dim,
         CAST(embedding[i] AS DOUBLE) AS x,
         CAST(round(CAST(embedding[i] AS DOUBLE) * {CENTROID_Q}) AS BIGINT) AS q
  FROM embeddings, UNNEST(range(1, len(embedding) + 1)) AS r(i)
), c AS (
  SELECT label, dim, CAST(sum(q) AS BIGINT) AS s, CAST(count(*) AS BIGINT) AS n
  FROM u GROUP BY label, dim
), t AS (
  SELECT u.vec_id, u.label,
         CAST(floor((u.x - CAST(c.s AS DOUBLE) / CAST(c.n AS DOUBLE) / {CENTROID_Q})
                    * (u.x - CAST(c.s AS DOUBLE) / CAST(c.n AS DOUBLE) / {CENTROID_Q})
                    * 1e12 + 0.5) AS BIGINT) AS term
  FROM u JOIN c ON u.label = c.label AND u.dim = c.dim
), d AS (
  SELECT vec_id, label, CAST(sum(term) AS BIGINT) AS d2
  FROM t GROUP BY vec_id, label
), lt AS (
  SELECT label, sum(CAST(d2 AS HUGEINT)) AS tot, CAST(count(*) AS BIGINT) AS m
  FROM d GROUP BY label
)
SELECT d.vec_id, CAST(d.label AS BIGINT) AS label, d.d2 AS d2_1e12,
       CAST(CASE WHEN d.d2 > CAST(4 * lt.tot // lt.m AS BIGINT) THEN 1 ELSE 0 END
            AS BIGINT) AS is_outlier
FROM d JOIN lt USING (label)
"""


# ---------------------------------------------------------------------------
# TF-IDF COSINE PAIRS — the WEIGHTED similarity join: near-dup candidates
# ranked by what actually distinguishes documents (rare terms), where raw
# Jaccard treats 'the' and a rare entity alike. Weights are integer-exact:
# w = tf * floor(ln(N/df)*1e3 + 0.5), so dot products and norms are exact
# integers on BOTH engine and SQL sides (f64 GEMM of integers < 2^53 is
# exact regardless of summation order) and the final cosine is ONE mirrored
# IEEE expression floored to 1e6. Doc cap = oracle comparability only (the
# SQL twin is the quadratic token join), same regime as jaccard_pairs.

TFIDF_COS_N = 300
TFIDF_COS_TAU_1E6 = 900_000


def tfidf_cosine_pairs(sf_dir: str):
    import pandas as pd
    import pyarrow.compute as pc

    docs = _docs(sf_dir).map_batches(
        lambda t: t.filter(pc.less(t.column("doc_id"), TFIDF_COS_N)),
        batch_format="pyarrow",
    )

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("doc_id")
        ids = df["doc_id"].to_numpy()
        n = len(ids)
        empty = pd.DataFrame({"a": [], "b": [], "cos_1e6": []}).astype(
            {"a": "int64", "b": "int64", "cos_1e6": "int64"}
        )
        if n < 2:
            return empty
        texts = pa.array([t if isinstance(t, str) else "" for t in df["text"]], pa.string())
        tok_lists = pc.split_pattern(texts, " ")
        ntok = pc.list_value_length(tok_lists).to_numpy(zero_copy_only=False).astype(np.int64)
        flat = pc.list_flatten(tok_lists)
        row_of = np.repeat(np.arange(n, dtype=np.int64), ntok)
        toks = flat.to_numpy(zero_copy_only=False)
        _, codes = np.unique(toks, return_inverse=True)
        U = int(codes.max()) + 1 if codes.size else 0
        # per-(doc, token) tf and per-token df over the SAME capped set
        key = row_of * U + codes
        ukey, tf = np.unique(key, return_counts=True)
        urow, ucode = ukey // U, ukey % U
        dfreq = np.bincount(ucode, minlength=U).astype(np.int64)
        idf = np.floor(np.log(float(n) / dfreq.astype(np.float64)) * 1e3 + 0.5).astype(
            np.int64
        )
        w = tf.astype(np.int64) * idf[ucode]
        dot = np.zeros((n, n), dtype=np.float64)
        CHUNK = 1 << 15
        for c0 in range(0, U, CHUNK):
            sel = (ucode >= c0) & (ucode < c0 + CHUNK)
            a = np.zeros((n, min(CHUNK, U - c0)), dtype=np.float64)
            a[urow[sel], ucode[sel] - c0] = w[sel].astype(np.float64)
            dot += a @ a.T
        n2 = np.diag(dot)
        ii, jj = np.triu_indices(n, k=1)
        ok = (n2[ii] > 0) & (n2[jj] > 0)
        ii, jj = ii[ok], jj[ok]
        cos = dot[ii, jj] / (np.sqrt(n2[ii]) * np.sqrt(n2[jj]))
        c6 = np.floor(cos * 1e6 + 0.5).astype(np.int64)
        keep = c6 >= TFIDF_COS_TAU_1E6
        return pd.DataFrame(
            {
                "a": ids[ii[keep]].astype(np.int64),
                "b": ids[jj[keep]].astype(np.int64),
                "cos_1e6": c6[keep],
            }
        )

    ds = docs.map_batches(
        lambda t: t.append_column("_g", pa.array(np.zeros(t.num_rows, dtype=np.int32))),
        batch_format="pyarrow",
    )
    return ds.groupby("_g").map_groups(
        lambda g: fn(g.drop(columns=["_g"])), batch_format="pandas"
    )


TFIDF_COSINE_PAIRS_SQL = f"""
WITH d AS MATERIALIZED (
  SELECT doc_id, string_split(text, ' ') AS toks
  FROM documents WHERE doc_id < {TFIDF_COS_N}
), tf AS MATERIALIZED (
  SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
  FROM (SELECT doc_id, unnest(toks) AS token FROM d) GROUP BY 1, 2
), dfq AS (
  SELECT token, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY token
), nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM d),
w AS MATERIALIZED (
  SELECT tf.doc_id, tf.token,
         tf.tf * CAST(floor(ln(CAST(nn.n AS DOUBLE) / dfq.df) * 1000 + 0.5) AS BIGINT)
           AS w
  FROM tf JOIN dfq USING (token), nn
), nrm AS MATERIALIZED (
  SELECT doc_id, CAST(sum(w * w) AS BIGINT) AS n2 FROM w GROUP BY doc_id
), dot AS (
  SELECT a.doc_id AS a, b.doc_id AS b, CAST(sum(a.w * b.w) AS BIGINT) AS dp
  FROM w a JOIN w b ON a.token = b.token AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT dot.a, dot.b,
       CAST(floor(CAST(dp AS DOUBLE)
                  / (sqrt(CAST(x.n2 AS DOUBLE)) * sqrt(CAST(y.n2 AS DOUBLE)))
                  * 1e6 + 0.5) AS BIGINT) AS cos_1e6
FROM dot JOIN nrm x ON x.doc_id = dot.a JOIN nrm y ON y.doc_id = dot.b
WHERE x.n2 > 0 AND y.n2 > 0
  AND CAST(floor(CAST(dp AS DOUBLE)
                 / (sqrt(CAST(x.n2 AS DOUBLE)) * sqrt(CAST(y.n2 AS DOUBLE)))
                 * 1e6 + 0.5) AS BIGINT) >= {TFIDF_COS_TAU_1E6}
"""
