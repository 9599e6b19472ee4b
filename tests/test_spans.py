"""Sub-document n-gram span family: dup_spans, decontaminate, hopping window.

Each pipeline is checked against a naive single-process Python reference over
a handcrafted documents table (known shared spans / contamination), plus the
real sf0.001 fixture for the SQL-oracle parity the driver gate re-checks."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from audio_feature_extraction_ray.pipelines.spans import (
    EVAL_MOD,
    EVAL_REM,
    SPAN_K,
    decontaminate,
    dup_spans,
)


def _write_docs(tmp_path, texts, ids=None):
    ids = list(range(len(texts))) if ids is None else ids
    t = pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * len(texts)),
            "source": pa.array(["s"] * len(texts)),
            "n_chars": pa.array([len(x) for x in texts], pa.int64()),
        }
    )
    pq.write_table(t, tmp_path / "documents.parquet")
    return str(tmp_path)


def _naive_grams(text, k=SPAN_K):
    toks = text.split(" ")
    return [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]


def test_dup_spans_known_overlap(ray_session, tmp_path):
    shared = " ".join(f"s{i}" for i in range(SPAN_K))  # exactly one k-gram
    texts = [
        shared + " a b c",  # grams: shared..., plus shifted ones (unique)
        "x y z " + shared,  # shares the `shared` gram with doc 0
        "totally different words here with no overlap at all now",
        "tiny doc",  # < k tokens -> 0 grams
    ]
    sf = _write_docs(tmp_path, texts)
    out = dup_spans(sf).to_pandas().set_index("doc_id").sort_index()

    # naive reference
    from collections import Counter

    gram_docs = Counter()
    for i, t in enumerate(texts):
        for g in set(_naive_grams(t)):
            gram_docs[g] += 1
    for i, t in enumerate(texts):
        grams = _naive_grams(t)
        exp_dup = sum(gram_docs[g] >= 2 for g in grams)
        assert out.loc[i, "n_grams"] == len(grams)
        assert out.loc[i, "n_dup_grams"] == exp_dup
        exp_frac = exp_dup / len(grams) if grams else 0.0
        assert out.loc[i, "dup_frac"] == pytest.approx(exp_frac)
    assert out.loc[3, "n_grams"] == 0 and out.loc[3, "dup_frac"] == 0.0


def test_dup_spans_position_multiplicity(ray_session, tmp_path):
    # the duplicated gram occurs TWICE in doc 0 -> both positions count
    g = " ".join(f"w{i}" for i in range(SPAN_K))
    texts = [g + " mid " + g, g + " tail tokens here"]
    sf = _write_docs(tmp_path, texts)
    out = dup_spans(sf).to_pandas().set_index("doc_id")
    naive0 = _naive_grams(texts[0])
    assert out.loc[0, "n_grams"] == len(naive0)
    # positions in doc 0 whose gram == g: 2 (other grams straddle 'mid', unique)
    assert out.loc[0, "n_dup_grams"] == sum(x == g for x in naive0)


def test_decontaminate_flags_eval_overlap(ray_session, tmp_path):
    shared = " ".join(f"e{i}" for i in range(SPAN_K))
    # doc_id EVAL_REM is eval; doc 0 shares its gram, doc 1 doesn't
    ids = [0, 1, EVAL_REM]
    texts = [
        shared + " extra stuff",
        "clean training document with enough tokens to form grams x y",
        shared + " eval only tail",
    ]
    sf = _write_docs(tmp_path, texts, ids=ids)
    out = decontaminate(sf).to_pandas().set_index("doc_id").sort_index()
    assert set(out.index) == {0, 1}  # eval doc excluded from output
    assert out.loc[0, "n_eval_hits"] == sum(
        g in set(_naive_grams(texts[2])) for g in _naive_grams(texts[0])
    )
    assert out.loc[0, "n_eval_hits"] >= 1
    assert out.loc[1, "n_eval_hits"] == 0


def test_dup_spans_fixture_matches_naive(ray_session):
    """Full naive cross-check on the real sf0.001 corpus."""
    sf = "/root/testdata/sf0.001"
    docs = pq.read_table(f"{sf}/documents.parquet", columns=["doc_id", "text"]).to_pandas()
    from collections import Counter

    gram_docs = Counter()
    grams_by_doc = {}
    for _, r in docs.iterrows():
        gs = _naive_grams(r.text)
        grams_by_doc[r.doc_id] = gs
        for g in set(gs):
            gram_docs[g] += 1
    out = dup_spans(sf).to_pandas().set_index("doc_id")
    assert len(out) == len(docs)
    for did, gs in grams_by_doc.items():
        assert out.loc[did, "n_grams"] == len(gs)
        assert out.loc[did, "n_dup_grams"] == sum(gram_docs[g] >= 2 for g in gs)


def test_hopping_window_multiplicity(ray_session):
    """Every event contributes to exactly HOP_MULT windows; totals conserve."""
    from audio_feature_extraction_ray.pipelines.events import (
        HOP_MULT,
        HOP_US,
        hopping_window,
    )

    sf = "/root/testdata/sf0.001"
    ev = pq.read_table(f"{sf}/events.parquet", columns=["ts", "value"]).to_pandas()
    out = hopping_window(sf).to_pandas()
    assert out["n_events"].sum() == HOP_MULT * len(ev)
    cents = np.round(ev["value"].to_numpy() * 100).astype(np.int64)
    assert np.isclose(out["sum_value"].sum(), HOP_MULT * cents.sum() / 100.0)
    # window starts align to the hop grid (timestamp[us] -> int64 microseconds)
    w = out["win_start"].astype("int64").to_numpy()
    assert (w % HOP_US == 0).all()


def test_global_shuffle_is_deterministic_permutation(ray_session):
    from audio_feature_extraction_ray.pipelines.splits import (
        SHUF_A,
        SHUF_B,
        SHUF_M,
        docs_global_shuffle,
    )

    sf = "/root/testdata/sf0.001"
    out = docs_global_shuffle(sf).to_pandas().sort_values("doc_id").reset_index(drop=True)
    n = len(out)
    # exact permutation of 1..n
    assert sorted(out["shuffle_pos"]) == list(range(1, n + 1))
    # matches the naive single-process order
    ids = out["doc_id"].to_numpy()
    key = ((ids % SHUF_M) * SHUF_A + SHUF_B) % SHUF_M
    order = np.lexsort((ids, key))
    expected = np.empty(n, dtype=np.int64)
    expected[order] = np.arange(1, n + 1)
    assert (out["shuffle_pos"].to_numpy() == expected).all()
    # deterministic across runs
    out2 = docs_global_shuffle(sf).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert (out2["shuffle_pos"].to_numpy() == out["shuffle_pos"].to_numpy()).all()


def test_embedding_lsh_dups_matches_numpy_and_finds_planted(ray_session):
    """Random-hyperplane LSH near-dup: exact numpy replication of the
    collision set + 100% recall on the planted duplicates."""
    import collections
    import itertools

    from audio_feature_extraction_ray.pipelines.search_dedup import (
        EMB_LSH_BANDS,
        EMB_LSH_THRESHOLD,
        _hyperplanes,
        _planted_embeddings,
        embedding_lsh_dups,
    )

    sf = "/root/testdata/sf0.001"
    out = embedding_lsh_dups(sf).to_pandas().sort_values(["a", "b"]).reset_index(drop=True)
    t = _planted_embeddings(sf)
    ids = t.column("vec_id").to_numpy()
    flat = t.column("embedding").combine_chunks().flatten().to_numpy(zero_copy_only=False)
    m = flat.reshape(len(ids), -1).astype(np.float64)
    nrm = m / np.linalg.norm(m, axis=1, keepdims=True)
    sig = (
        ((nrm @ _hyperplanes(nrm.shape[1])) >= 0.0).astype(np.uint64)
        << np.arange(64, dtype=np.uint64)
    ).sum(axis=1)
    width = 64 // EMB_LSH_BANDS
    collide = set()
    for b in range(EMB_LSH_BANDS):
        buckets = collections.defaultdict(list)
        for i, s in enumerate(sig.tolist()):
            buckets[(s >> (width * b)) & ((1 << width) - 1)].append(i)
        for v in buckets.values():
            for i, j in itertools.combinations(v, 2):
                collide.add((i, j) if ids[i] < ids[j] else (j, i))
    n32 = nrm.astype(np.float32).astype(np.float64)  # engine ships float32 vectors
    exp = sorted(
        (min(int(ids[i]), int(ids[j])), max(int(ids[i]), int(ids[j])))
        for i, j in collide
        if (n32[i] * n32[j]).sum() >= EMB_LSH_THRESHOLD and ids[i] != ids[j]
    )
    got = [(int(a), int(b)) for a, b in zip(out["a"], out["b"])]
    assert got == exp
    planted = {(int(i), int(i) + 100_000) for i in ids if i < 100_000 and i % 5 == 0}
    assert planted <= set(got)  # every planted near-dup found


def test_embedding_kmeans_matches_naive_lloyd(ray_session):
    """Distributed Lloyd's (broadcast centroids + partial-sum fold) vs the
    naive single-process loop: identical sizes, inertia and centroid norms."""
    from audio_feature_extraction_ray.stages.ann import _emb_matrix, embedding_kmeans

    sf = "/root/testdata/sf0.001"
    out = embedding_kmeans(sf)
    t = pq.read_table(f"{sf}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = t.column("vec_id").to_numpy()
    m = _emb_matrix(t)
    cent = m[np.argsort(ids, kind="stable")[:8]].copy()
    for _ in range(5):
        d = ((m[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        inertia = d[np.arange(len(m)), assign].sum()
        for c in range(8):
            msk = assign == c
            if msk.any():
                cent[c] = m[msk].mean(axis=0)
    sizes = np.bincount(assign, minlength=8)
    assert (out["size"].to_numpy() == sizes).all()
    assert np.isclose(out["inertia_total"].iloc[0], inertia, rtol=1e-9)
    assert np.allclose(
        out["centroid_norm"], np.floor(np.linalg.norm(cent, axis=1) * 1e6 + 0.5) / 1e6
    )


def test_embedding_quantize_roundtrip_bounds(ray_session):
    """int8 scalar quantization: codes stay in [-127, 127], one code per
    vector hits ±127 (absmax scaling), and dequantized reconstruction
    error is bounded by half a quantization step per component."""
    import numpy as np

    from audio_feature_extraction_ray.pipelines.search_dedup import embedding_quantize

    got = embedding_quantize("/root/testdata/sf0.001").to_pandas()
    assert got.qval.abs().max() <= 127
    import pyarrow.parquet as pq

    emb = pq.read_table("/root/testdata/sf0.001/embeddings.parquet")
    m = np.asarray(emb.column("embedding").to_pylist(), dtype=np.float64)
    n, d = m.shape
    assert len(got) == n * d
    g = got.sort_values(["vec_id", "dim"]).reset_index(drop=True)
    q = g.qval.to_numpy().reshape(n, d)
    s = g.scale_e9.to_numpy().reshape(n, d)[:, 0] / 1e9
    # absmax scaling -> at least one ±127 code per non-zero vector
    assert (np.abs(q).max(axis=1)[s > 0] == 127).all()
    # reconstruction error <= s/2 + scale_e9 rounding slack per component
    err = np.abs(q * s[:, None] - m)
    assert (err <= s[:, None] / 2 + 1e-6).all()


def test_embedding_semdedup_matches_naive_and_prunes_planted(ray_session, tmp_path):
    """SemDeDup: (a) keep flags match a naive single-process reference
    (naive Lloyd + per-cluster pairwise cosine, keep-lowest-id) on the
    fixture; (b) planted exact duplicates are pruned, orthogonal vectors
    survive."""
    import pyarrow as pa

    from audio_feature_extraction_ray.stages.ann import (
        SEMDEDUP_TAU,
        _emb_matrix,
        embedding_semdedup,
    )

    sf = "/root/testdata/sf0.001"
    got = embedding_semdedup(sf).to_pandas().sort_values("vec_id").reset_index(drop=True)
    t = pq.read_table(f"{sf}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = t.column("vec_id").to_numpy()
    m = _emb_matrix(t)
    assert len(got) == len(ids) and got.vec_id.is_unique

    # naive reference: same deterministic Lloyd as the engine's contract
    cent = m[np.argsort(ids, kind="stable")[:8]].copy()
    for _ in range(5):
        d = ((m[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for c in range(8):
            msk = assign == c
            if msk.any():
                cent[c] = m[msk].mean(axis=0)
    nm = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-300)
    keep_ref = {}
    for c in range(8):
        cids = np.sort(ids[assign == c])
        idx = {v: np.flatnonzero(ids == v)[0] for v in cids}
        for i, v in enumerate(cids):
            earlier = [idx[w] for w in cids[:i]]
            mx = max((float(nm[idx[v]] @ nm[e]) for e in earlier), default=-1.0)
            keep_ref[v] = mx < SEMDEDUP_TAU
    g = got.set_index("vec_id")["keep"]
    assert all(bool(g.loc[v]) == keep_ref[v] for v in keep_ref)

    # planted duplicates: 3 copies of one vector + 3 orthogonal axes
    n, dim = 40, 8
    rng = np.random.default_rng(3)
    base = rng.normal(size=(n, dim))
    base[10] = base[11] = base[12]  # exact trio
    base[0], base[1], base[2] = np.eye(dim)[0] * 5, np.eye(dim)[1] * 5, np.eye(dim)[2] * 5
    d2 = tmp_path / "sf"
    d2.mkdir()
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(range(n), pa.int64()),
                "embedding": pa.array(
                    [r.astype("float32").tolist() for r in base], pa.list_(pa.float32())
                ),
                "label": pa.array([0] * n, pa.int32()),
            }
        ),
        d2 / "embeddings.parquet",
    )
    out = embedding_semdedup(str(d2)).to_pandas().set_index("vec_id")
    assert bool(out.loc[10, "keep"])  # first copy survives
    assert not bool(out.loc[11, "keep"]) and not bool(out.loc[12, "keep"])
    assert bool(out.loc[0, "keep"]) and bool(out.loc[1, "keep"]) and bool(out.loc[2, "keep"])


def test_embedding_semdedup_row_block_invariance(ray_session, monkeypatch):
    """The chunked-GEMM prune must be invariant to _SEMDEDUP_ROW_BLOCK:
    forcing 3-row blocks gives bit-identical keep flags and max_cos_e6 to
    the default (one-block) path on the fixture."""
    from audio_feature_extraction_ray.stages import ann

    sf = "/root/testdata/sf0.001"
    base = ann.embedding_semdedup(sf).to_pandas().sort_values("vec_id").reset_index(drop=True)
    monkeypatch.setattr(ann, "_SEMDEDUP_ROW_BLOCK", 3)
    small = ann.embedding_semdedup(sf).to_pandas().sort_values("vec_id").reset_index(drop=True)
    assert (base["keep"].to_numpy() == small["keep"].to_numpy()).all()
    assert (base["max_cos_e6"].to_numpy() == small["max_cos_e6"].to_numpy()).all()
    assert (base["cluster"].to_numpy() == small["cluster"].to_numpy()).all()
