"""Tests for dedup / ANN / multimodal / split-augment stages."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data


@pytest.fixture(scope="module")
def near_dup_docs():
    """Synthetic docs with planted exact dups and near-dups."""
    rng = np.random.default_rng(3)
    vocab = np.array([f"w{i}" for i in range(200)])
    texts = []
    for i in range(40):
        texts.append(" ".join(rng.choice(vocab, size=60).tolist()))
    # exact dup of doc 0
    texts.append(texts[0])
    # near-dup of doc 1: replace 5/60 tokens
    toks = texts[1].split()
    for j in rng.choice(60, size=5, replace=False):
        toks[j] = "zzz" + str(j)
    texts.append(" ".join(toks))
    return pa.table(
        {"doc_id": pa.array(range(len(texts)), pa.int64()), "text": pa.array(texts, pa.string())}
    )


def test_exact_dedup(ray_session, near_dup_docs):
    from audio_feature_extraction_ray.stages.dedup import exact_dedup

    ds = ray.data.from_arrow(near_dup_docs)
    out = exact_dedup(ds).to_pandas()
    assert len(out) == near_dup_docs.num_rows - 1  # one exact dup dropped
    assert 40 not in set(out["doc_id"])  # the later copy lost; doc 0 kept
    assert 0 in set(out["doc_id"])


def test_minhash_lsh_finds_near_dups(ray_session, near_dup_docs):
    from audio_feature_extraction_ray.stages.dedup import minhash_lsh_pairs

    ds = ray.data.from_arrow(near_dup_docs)
    pairs = minhash_lsh_pairs(ds, threshold=0.4).to_pandas()
    got = set(zip(pairs["a"], pairs["b"]))
    assert (0, 40) in got  # exact dup: est jaccard 1.0
    assert (1, 41) in got  # near dup
    # no wild false positives among random docs
    assert len(pairs) <= 6


def test_minhash_lsh_matches_naive_reference(ray_session, near_dup_docs):
    """The slim-exchange LSH plan (band rows carry only (band_hash, id); sigs
    re-joined co-partitioned) emits EXACTLY the pairs a single-process
    reference computes from the same signatures and band hashes."""
    from collections import defaultdict

    from audio_feature_extraction_ray.stages.dedup import (
        NUM_PERM,
        _band_rows,
        _signature_batch,
        minhash_lsh_pairs,
    )

    threshold = 0.4
    sig_tbl = _signature_batch(near_dup_docs, "text", "doc_id")
    sigs = np.asarray(
        sig_tbl.column("sig").combine_chunks().flatten().to_numpy(zero_copy_only=False)
    ).reshape(-1, NUM_PERM)
    ids = sig_tbl.column("doc_id").to_numpy()
    band_tbl = _band_rows(sig_tbl, "doc_id", 4)
    buckets = defaultdict(list)
    for did, bh in zip(band_tbl.column("doc_id").to_pylist(), band_tbl.column("band_hash").to_pylist()):
        buckets[bh].append(did)
    expect = {}
    idx_of = {int(d): i for i, d in enumerate(ids)}
    for members in buckets.values():
        members = sorted(members)
        for i in range(len(members)):
            for j in range(i + 1, len(members)):
                a, b = members[i], members[j]
                est = float((sigs[idx_of[a]] == sigs[idx_of[b]]).mean())
                if est >= threshold:
                    expect[(a, b)] = est
    # both exchange plans emit identical pairs: broadcast (default) and
    # co-partitioned (forced via broadcast_max_docs=0)
    for bmax in (10**6, 0):
        ds = ray.data.from_arrow(near_dup_docs).repartition(3)
        pairs = minhash_lsh_pairs(ds, threshold=threshold, broadcast_max_docs=bmax).to_pandas()
        got = {
            (int(a), int(b)): float(j)
            for a, b, j in zip(pairs["a"], pairs["b"], pairs["est_jaccard"])
        }
        assert got == expect and len(pairs) == len(got), bmax  # identical pairs, no dupes


def test_simhash_pairs_matches_naive_reference(ray_session, near_dup_docs):
    from audio_feature_extraction_ray.stages.dedup import simhash_pairs, simhash_signatures_batch

    max_h = 10
    sh = simhash_signatures_batch(near_dup_docs.column("text"))
    ids = near_dup_docs.column("doc_id").to_numpy()
    expect = {}
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            x = int(sh[i] ^ sh[j])
            hd = bin(x).count("1")
            # candidate iff >= 1 of the 4 16-bit bands collides
            collide = any(((x >> (16 * b)) & 0xFFFF) == 0 for b in range(4))
            if collide and hd <= max_h:
                expect[(int(ids[i]), int(ids[j]))] = hd
    ds = ray.data.from_arrow(near_dup_docs).repartition(3)
    pairs = simhash_pairs(ds, max_hamming=max_h).to_pandas()
    got = {(int(a), int(b)): int(h) for a, b, h in zip(pairs["a"], pairs["b"], pairs["hamming"])}
    assert got == expect and len(pairs) == len(got)


def test_lsh_mega_bucket_drop_is_logged(ray_session, caplog):
    """max_bucket truncation is observable: a warning carries the counts."""
    import logging

    from audio_feature_extraction_ray.stages.dedup import _segment_pairs

    with caplog.at_level(logging.WARNING, logger="audio_feature_extraction_ray.stages.dedup"):
        a, b = _segment_pairs(np.array([1, 1, 1, 1, 2, 2]), max_bucket=3, what="minhash_lsh")
    assert a.size == 1  # only the size-2 bucket pairs survive
    assert any("mega-bucket" in r.message for r in caplog.records)


def test_simhash_finds_near_dups(ray_session, near_dup_docs):
    from audio_feature_extraction_ray.stages.dedup import simhash_pairs

    ds = ray.data.from_arrow(near_dup_docs)
    pairs = simhash_pairs(ds, max_hamming=10).to_pandas()
    got = set(zip(pairs["a"], pairs["b"]))
    assert (0, 40) in got  # identical -> hamming 0


def test_jaccard_pairs_exact(ray_session, near_dup_docs):
    from audio_feature_extraction_ray.stages.dedup import jaccard_pairs

    ds = ray.data.from_arrow(near_dup_docs)
    pairs = jaccard_pairs(ds, min_jaccard=0.9).to_pandas()
    got = {(a, b): j for a, b, j in zip(pairs["a"], pairs["b"], pairs["jaccard"])}
    assert got[(0, 40)] == 1.0


def test_ann_bruteforce_exact(ray_session):
    from audio_feature_extraction_ray.stages.ann import brute_force_topk

    rng = np.random.default_rng(9)
    emb = rng.standard_normal((300, 32)).astype(np.float32)
    tbl = pa.table(
        {
            "vec_id": pa.array(range(300), pa.int64()),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(emb.ravel(), pa.float32()), 32
            ),
        }
    )
    ds = ray.data.from_arrow(tbl).repartition(4)
    q = emb[:3].astype(np.float64)
    out = brute_force_topk(ds, q, np.arange(3), k=5).to_pandas()
    assert len(out) == 15
    # single-process reference
    m = emb.astype(np.float64)
    mn = m / np.linalg.norm(m, axis=1, keepdims=True)
    for qid in range(3):
        sims = mn @ mn[qid]
        sims[qid] = -np.inf
        ref = np.argsort(-sims)[:5]
        got = out[out["query_id"] == qid].sort_values("rank")["neighbor_id"].to_numpy()
        np.testing.assert_array_equal(got, ref)


def test_ivf_knn_join_exact_and_recall(ray_session):
    """Dataset x Dataset k-NN join: full probe == exact single-process
    reference; partial probe keeps decent recall."""
    from audio_feature_extraction_ray.stages.ann import ivf_knn_join

    rng = np.random.default_rng(21)
    emb = rng.standard_normal((300, 16)).astype(np.float32)
    tbl = pa.table(
        {
            "vec_id": pa.array(range(300), pa.int64()),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(emb.ravel(), pa.float32()), 16
            ),
        }
    )
    corpus = ray.data.from_arrow(tbl).repartition(4)
    queries = ray.data.from_arrow(tbl.slice(0, 20))
    out = ivf_knn_join(corpus, queries, k=4, n_clusters=6, nprobe=6).to_pandas()
    assert len(out) == 80
    m = emb.astype(np.float64)
    mn = m / np.linalg.norm(m, axis=1, keepdims=True)
    for qid in range(20):
        sims = mn @ mn[qid]
        sims[qid] = -np.inf
        # tie-break on neighbor_id like the pipeline: sort by (-sim, nid)
        ref = np.lexsort((np.arange(300), -sims))[:4]
        got = out[out["query_id"] == qid].sort_values("rank")["neighbor_id"].to_numpy()
        np.testing.assert_array_equal(got, ref)
    # partial probe: approximate but high-recall
    approx = ivf_knn_join(corpus, queries, k=4, n_clusters=8, nprobe=4).to_pandas()
    recall = 0.0
    for qid in range(20):
        b = set(out[out["query_id"] == qid]["neighbor_id"])
        v = set(approx[approx["query_id"] == qid]["neighbor_id"])
        recall += len(b & v) / len(b)
    recall /= 20
    assert recall >= 0.6, recall


def test_ann_ivf_recall(ray_session):
    from audio_feature_extraction_ray.stages.ann import brute_force_topk, ivf_topk

    rng = np.random.default_rng(10)
    emb = rng.standard_normal((400, 16)).astype(np.float32)
    tbl = pa.table(
        {
            "vec_id": pa.array(range(400), pa.int64()),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(emb.ravel(), pa.float32()), 16
            ),
        }
    )
    ds = ray.data.from_arrow(tbl).repartition(4)
    q = emb[:5].astype(np.float64)
    bf = brute_force_topk(ds, q, np.arange(5), k=5).to_pandas()
    ivf = ivf_topk(ds, q, np.arange(5), k=5, n_clusters=8, nprobe=4, sample=emb).to_pandas()
    recall = 0.0
    for qid in range(5):
        b = set(bf[bf["query_id"] == qid]["neighbor_id"])
        v = set(ivf[ivf["query_id"] == qid]["neighbor_id"])
        recall += len(b & v) / len(b)
    recall /= 5
    assert recall >= 0.6, recall  # nprobe=4/8 clusters -> decent recall


def test_multimodal_plumbing(ray_session):
    from audio_feature_extraction_ray.stages.multimodal import (
        N_MEL_FAKE,
        RealDecoder,
        extract_media_features,
        synthetic_media_table,
    )

    tbl = synthetic_media_table(32)
    ds = ray.data.from_arrow(tbl)
    out = extract_media_features(ds, decoder="fake", concurrency=2, batch_size=8)
    pdf = out.to_pandas()
    assert len(pdf) == 32
    assert set(pdf["kind"]) == {"audio", "image", "video"}
    assert all(len(f) == N_MEL_FAKE for f in pdf["features"])
    assert (pdf["n_windows"] > 0).all()
    # determinism: same input -> identical features
    pdf2 = extract_media_features(ray.data.from_arrow(tbl), decoder="fake").to_pandas()
    a = np.stack(pdf.sort_values("media_id")["features"].to_numpy())
    b = np.stack(pdf2.sort_values("media_id")["features"].to_numpy())
    np.testing.assert_array_equal(a, b)
    # real decoder is stubbed with a clear error
    with pytest.raises(NotImplementedError, match="soundfile"):
        RealDecoder()(b"\x00")


def test_split_deterministic_and_entity_coherent(ray_session, small_fixture):
    from audio_feature_extraction_ray.stages.split_augment import split_dataset

    pages, _ = small_fixture
    ds = ray.data.from_arrow(pages.select(["url", "warc_ts"]))
    out = split_dataset(ds).to_pandas()
    # entity-coherent: one split per url
    per_url = out.groupby("url")["split"].nunique()
    assert (per_url == 1).all()
    # roughly the requested ratios
    frac = out.drop_duplicates("url")["split"].value_counts(normalize=True)
    assert 0.6 < frac.get("train", 0) < 0.95
    # deterministic
    out2 = split_dataset(ray.data.from_arrow(pages.select(["url", "warc_ts"]))).to_pandas()
    assert (out.sort_values(["url", "warc_ts"]).reset_index(drop=True)["split"]
            == out2.sort_values(["url", "warc_ts"]).reset_index(drop=True)["split"]).all()


def test_augment_deterministic(ray_session, small_fixture):
    from audio_feature_extraction_ray.stages.split_augment import augment_texts

    pages, _ = small_fixture
    ds = ray.data.from_arrow(pages.select(["url", "text"]).slice(0, 200))
    a = augment_texts(ds).to_pandas().sort_values("url").reset_index(drop=True)
    ds2 = ray.data.from_arrow(pages.select(["url", "text"]).slice(0, 200))
    b = augment_texts(ds2).to_pandas().sort_values("url").reset_index(drop=True)
    assert (a["text_aug"] == b["text_aug"]).all()
    # dropout actually drops something somewhere
    assert (a["text_aug"].str.len() < a["text"].str.len()).any()

def test_hash_augment_ops_edges():
    """Arithmetic-hash augmentation: deterministic, SQL-mirroring semantics,
    empty-text safe (SQL string_split('') -> [''] on both sides)."""
    from audio_feature_extraction_ray.stages.split_augment import (
        MASK_TOKEN,
        hashdrop_batch,
        mask_spans_batch,
    )

    tbl = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "text": pa.array(["a b c d e f g h", "", "x y"], pa.string()),
        }
    )
    out = hashdrop_batch(tbl)
    aug = out.column("text_aug").to_pylist()
    assert aug == hashdrop_batch(tbl).column("text_aug").to_pylist()  # deterministic
    assert aug[1] == ""  # empty stays empty
    kept = set(aug[0].split())
    assert kept <= set("abcdefgh")
    m = mask_spans_batch(tbl)
    masked = m.column("text_aug").to_pylist()
    assert MASK_TOKEN in masked[0].split()
    assert len(masked[0].split()) == 8  # span mask preserves token count
    assert masked[2].count(MASK_TOKEN) >= 1  # short rows still masked


def test_asof_copartitioned_edges(ray_session):
    """Generic co-partitioned as-of stage: '<=' ties, keys with no right rows,
    right-only keys, empty right side — vs pandas merge_asof."""
    import pandas as pd
    import ray as _ray

    from audio_feature_extraction_ray.stages.asof import asof_join_copartitioned

    left = pa.table(
        {
            "k": pa.array([1, 1, 1, 2, 3, 3], pa.int64()),
            "lts": pa.array([100, 200, 300, 150, 50, 400], pa.int64()).cast(pa.timestamp("us")),
            "lid": pa.array([10, 11, 12, 20, 30, 31], pa.int64()),
        }
    )
    right = pa.table(
        {
            "k": pa.array([1, 1, 4], pa.int64()),
            "rts": pa.array([200, 250, 999], pa.int64()).cast(pa.timestamp("us")),  # 200 ties left
            "v": pa.array([7.0, 8.0, 9.0], pa.float64()),
        }
    )
    out = asof_join_copartitioned(
        _ray.data.from_arrow(left),
        _ray.data.from_arrow(right),
        key="k",
        left_ts="lts",
        right_ts="rts",
        left_cols=["lid"],
        right_value_cols=["v"],
        num_partitions=4,
    ).to_pandas()
    out["k"] = out["k"].astype(int)
    out = out.sort_values("lid").reset_index(drop=True)

    expect = pd.merge_asof(
        left.to_pandas().sort_values("lts"),
        right.to_pandas().rename(columns={"rts": "lts"}).sort_values("lts"),
        on="lts",
        by="k",
        allow_exact_matches=True,
        direction="backward",
    ).sort_values("lid").reset_index(drop=True)

    assert len(out) == len(expect) == 6
    np.testing.assert_allclose(
        out["asof_v"].to_numpy(), expect["v"].to_numpy(dtype="float64"), equal_nan=True
    )
    # exact tie (lts=200) matched the rts=200 row
    assert out.loc[out["lid"] == 11, "asof_v"].iloc[0] == 7.0

    # empty right side -> all NaN
    out2 = asof_join_copartitioned(
        _ray.data.from_arrow(left),
        _ray.data.from_arrow(right.slice(0, 0)),
        key="k",
        left_ts="lts",
        right_ts="rts",
        left_cols=["lid"],
        right_value_cols=["v"],
        num_partitions=4,
    ).to_pandas()
    assert len(out2) == 6 and out2["asof_v"].isna().all()


def test_grouped_topk_string_key(ray_session):
    """grouped_topk matches a pandas row_number reference, incl. string keys
    and deterministic tiebreaks."""
    from audio_feature_extraction_ray.stages.window import grouped_topk

    rng = np.random.default_rng(31)
    n = 2000
    tbl = pa.table(
        {
            "k": pa.array(rng.choice(["a", "b", "c", "dd"], size=n).tolist(), pa.string()),
            "id": pa.array(range(n), pa.int64()),
            "v": pa.array(np.round(rng.uniform(0, 10, n), 2), pa.float64()),
        }
    )
    ds = ray.data.from_arrow(tbl).repartition(5)
    out = (
        grouped_topk(ds, key="k", order_col="v", tiebreak="id", k=3)
        .to_pandas()
        .sort_values(["k", "rank"])
        .reset_index(drop=True)
    )
    ref = tbl.to_pandas()
    ref["rank"] = (
        ref.sort_values(["v", "id"], ascending=[False, True])
        .groupby("k")
        .cumcount()
        .add(1)
    )
    ref = ref[ref["rank"] <= 3].sort_values(["k", "rank"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(out[["k", "id", "v", "rank"]], ref[["k", "id", "v", "rank"]])


def test_grouped_quantiles_exact(ray_session):
    """grouped_quantiles == numpy's linear-interpolation quantile per key."""
    from audio_feature_extraction_ray.stages.window import grouped_quantiles

    rng = np.random.default_rng(32)
    n = 3000
    keys = rng.integers(0, 7, n)
    vals = np.round(rng.uniform(0, 100, n), 2)
    tbl = pa.table({"k": pa.array(keys, pa.int64()), "v": pa.array(vals, pa.float64())})
    ds = ray.data.from_arrow(tbl).repartition(4)
    out = (
        grouped_quantiles(ds, key="k", value_col="v", quantiles={"p25": 0.25, "p50": 0.5, "p99": 0.99})
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    for _, row in out.iterrows():
        seg = vals[keys == row["k"]]
        assert row["n"] == seg.size
        for name, q in [("p25", 0.25), ("p50", 0.5), ("p99", 0.99)]:
            np.testing.assert_allclose(row[name], np.quantile(seg, q), rtol=1e-12)


def test_hll_error_bound(ray_session):
    """The HLL estimate lands within 5% of the exact distinct-token count
    (4096 registers; the fixture vocab sits in the linear-counting regime)."""
    from audio_feature_extraction_ray.pipelines.text_analysis import (
        distinct_tokens,
        hll_distinct_tokens,
    )

    sf = "/root/testdata/sf0.001"
    exact = int(distinct_tokens(sf)["n_distinct_tokens"].iloc[0])
    est = float(hll_distinct_tokens(sf)["hll_estimate"].iloc[0])
    assert exact > 0
    assert abs(est - exact) / exact < 0.05, (est, exact)


def test_quantile_sketch_error_bound(ray_session):
    """The histogram sketch returns the bin center holding the ceil(q*n)-th
    order statistic — within half a bin width of that order statistic."""
    import pyarrow.parquet as pq

    from audio_feature_extraction_ray.pipelines.events import value_quantile_sketch

    sf = "/root/testdata/sf0.001"
    sk = value_quantile_sketch(sf).to_pandas().set_index("event_type")
    df = pq.read_table(f"{sf}/events.parquet", columns=["event_type", "value"]).to_pandas()
    bin_w = 600.0 / 4096
    for t, seg in df.groupby("event_type"):
        vals = np.sort(seg["value"].to_numpy())
        assert sk.loc[t, "n"] == vals.size
        for name, q in (("p50", 0.5), ("p90", 0.9)):
            order_stat = vals[int(np.ceil(q * vals.size)) - 1]
            assert abs(sk.loc[t, name] - order_stat) <= bin_w / 2 + 1e-9, (t, name)


def test_semi_anti_join_edges(ray_session):
    """Semi/anti joins: empty probe side, all-match probe, and the general
    case all agree with a set-based reference."""
    from audio_feature_extraction_ray.stages.join import copartitioned_semi_anti

    left = pa.table(
        {"k": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
         "v": pa.array(list("abcdef"), pa.string())}
    )
    lds = ray.data.from_arrow(left).repartition(3)

    def probe(keys):
        return ray.data.from_arrow(pa.table({"k": pa.array(keys, pa.int64())}))

    # general case
    semi = copartitioned_semi_anti(lds, probe([2, 4, 4, 9]), "k", "k").to_pandas()
    assert sorted(semi["k"]) == [2, 4]
    anti = copartitioned_semi_anti(lds, probe([2, 4, 4, 9]), "k", "k", anti=True).to_pandas()
    assert sorted(anti["k"]) == [1, 3, 5, 6]
    # all-match probe
    allm = copartitioned_semi_anti(lds, probe([1, 2, 3, 4, 5, 6]), "k", "k").to_pandas()
    assert sorted(allm["k"]) == [1, 2, 3, 4, 5, 6]
    # empty probe: semi -> empty, anti -> everything
    anti_all = copartitioned_semi_anti(lds, probe([]), "k", "k", anti=True).to_pandas()
    assert sorted(anti_all["k"]) == [1, 2, 3, 4, 5, 6]
    semi_none = copartitioned_semi_anti(lds, probe([]), "k", "k").to_pandas()
    assert len(semi_none) == 0


def test_connected_components(ray_session):
    """Min-label propagation CC: multiple components, chains, isolated
    self-edges; matches a union-find reference."""
    from audio_feature_extraction_ray.stages.graph import connected_components

    edges = pa.table(
        {
            "a": pa.array([1, 2, 3, 10, 20, 21, 30], pa.int64()),
            "b": pa.array([2, 3, 4, 11, 21, 22, 30], pa.int64()),
        }
    )
    out = (
        connected_components(ray.data.from_arrow(edges).repartition(3))
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    expect = {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20, 30: 30}
    got = dict(zip(out["node"], out["label"]))
    assert got == expect


def test_connected_components_long_chain(ray_session):
    """A 200-node path (diameter 199 >> max_iter=25) converges thanks to the
    pointer-jumping shortcut — O(log n) rounds, not O(diameter)."""
    from audio_feature_extraction_ray.stages.graph import connected_components

    n = 200
    edges = pa.table(
        {
            "a": pa.array(np.arange(n - 1), pa.int64()),
            "b": pa.array(np.arange(1, n), pa.int64()),
        }
    )
    out = (
        connected_components(
            ray.data.from_arrow(edges).repartition(4), max_iter=25, auto_width=False
        )
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    assert len(out) == n
    assert (out["label"] == 0).all()


def test_pagerank_fixed_point(ray_session):
    """Fixed-point PageRank matches a single-process integer reference and
    ranks the hub above leaves."""
    from audio_feature_extraction_ray.stages.graph import RANK_SCALE, pagerank

    # star: node 0 center with 4 leaves, plus a disjoint pair
    edges = pa.table(
        {"a": pa.array([0, 0, 0, 0, 10], pa.int64()),
         "b": pa.array([1, 2, 3, 4, 11], pa.int64())}
    )
    out = (
        pagerank(ray.data.from_arrow(edges).repartition(2), iters=5)
        .to_pandas()
        .set_index("node")["rank_fp"]
    )
    # reference: same integer update
    sym = [(0, 1), (0, 2), (0, 3), (0, 4), (10, 11)]
    sym = sym + [(b, a) for a, b in sym]
    nodes = sorted({x for e in sym for x in e})
    deg = {n: sum(1 for s, _ in sym if s == n) for n in nodes}
    n = len(nodes)
    r = {x: RANK_SCALE // n for x in nodes}
    base = int(np.floor(0.15 * RANK_SCALE / n))
    for _ in range(5):
        acc = {x: 0 for x in nodes}
        for s, d in sym:
            acc[d] += r[s] // deg[s]
        r = {x: base + 85 * acc[x] // 100 for x in nodes}
    assert dict(out) == r
    assert out[0] > out[1]  # hub outranks leaf


def test_misra_gries_bound():
    """Lossy regime: every estimate undercounts its true count by at most
    the total subtracted mass <= n/(k+1); top item survives."""
    from audio_feature_extraction_ray.pipelines.text_analysis import _mg_compress

    rng = np.random.default_rng(44)
    # zipf-ish stream over 200 distinct items, compressed to k=16
    items = rng.zipf(1.5, 5000) % 200
    toks, true_counts = np.unique(items.astype(str), return_counts=True)
    k = 16
    est_t, est_c = _mg_compress(toks, true_counts.astype(np.int64), k)
    n = items.size
    est = dict(zip(est_t, est_c))
    for t, c in zip(toks, true_counts):
        e = est.get(t, 0)
        assert e <= c
        assert c - e <= n / (k + 1) + 1
    top = toks[np.argmax(true_counts)]
    assert top in est


def test_edit_distance_pairs(ray_session):
    """Vectorized batch Levenshtein == classic DP on planted cases."""
    from audio_feature_extraction_ray.stages.dedup import (
        _levenshtein_batch,
        edit_distance_pairs,
    )

    assert _levenshtein_batch(["kitten"], ["sitting"], 16)[0] == 3
    assert _levenshtein_batch(["", "abc"], ["abc", ""], 8).tolist() == [3, 3]
    tbl = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "text": pa.array(["hello world", "hello worlds", "xyz"], pa.string()),
        }
    )
    out = edit_distance_pairs(ray.data.from_arrow(tbl), max_dist=100).to_pandas()
    got = {(a, b): d for a, b, d in zip(out["a"], out["b"], out["edist"])}
    assert got[(0, 1)] == 1
    assert got[(0, 2)] == 11  # len("hello world") replacements/inserts


def test_incremental_dedup(ray_session):
    """New-batch rows survive iff content unseen in the corpus side; min-id
    per content within the batch."""
    from audio_feature_extraction_ray.stages.dedup import incremental_dedup

    tbl = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 10, 11, 12, 13, 14], pa.int64()),
            "text": pa.array(
                ["aa", "bb", "cc",  # corpus (ids < 10)
                 "aa",              # dup of corpus -> dropped
                 "dd", "dd",        # new content, within-batch dup -> keep 11
                 "bb",              # dup of corpus -> dropped
                 "ee"],             # new -> kept
                pa.string(),
            ),
        }
    )
    out = incremental_dedup(
        ray.data.from_arrow(tbl), split_id=10, num_partitions=4
    ).to_pandas()
    assert sorted(out["doc_id"]) == [11, 14]


def test_keep_best_dedup(ray_session):
    """Per identical text keep max score, ties -> min id."""
    from audio_feature_extraction_ray.stages.dedup import keep_best_dedup

    tbl = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3, 4], pa.int64()),
            "text": pa.array(["aa", "aa", "aa", "bb", "bb"], pa.string()),
            "score": pa.array([0.1, 0.9, 0.9, 0.5, 0.5], pa.float64()),
        }
    )
    out = keep_best_dedup(
        ray.data.from_arrow(tbl), score_col="score", num_partitions=4
    ).to_pandas()
    assert sorted(out["doc_id"]) == [1, 3]


def test_bloom_token_novelty(ray_session):
    """Bloom membership is one-sided: every truly-known token hits (no false
    negatives, so novelty is a lower bound), and false positives stay under
    the design FPR at fixture vocabulary load."""
    import pyarrow.parquet as pq

    from audio_feature_extraction_ray.pipelines.search_dedup import _split_id
    from audio_feature_extraction_ray.pipelines.text_analysis import bloom_token_novelty

    sf = "/root/testdata/sf0.001"
    out = bloom_token_novelty(sf).to_pandas().set_index("doc_id")
    docs = pq.read_table(f"{sf}/documents.parquet", columns=["doc_id", "text"]).to_pandas()
    split = _split_id(sf)
    vocab = set()
    for t in docs[docs.doc_id < split].text:
        vocab.update(t.split(" "))
    fp_budget = 0
    total_unknown = 0
    for _, r in docs[docs.doc_id >= split].iterrows():
        toks = r.text.split(" ")
        exact_known = sum(tok in vocab for tok in toks)
        got = out.loc[r.doc_id]
        assert got["token_count"] == len(toks)
        assert got["tokens_maybe_known"] >= exact_known  # no false negatives
        fp_budget += got["tokens_maybe_known"] - exact_known
        total_unknown += len(toks) - exact_known
    # k=6, m=2^20 bits: FPR is far below 1% at this vocabulary load
    assert fp_budget <= max(5, 0.01 * max(total_unknown, 1))


def test_copartitioned_equijoin_mn_and_outer(ray_session):
    """Duplicate keys on both sides expand to the cross-product of matches;
    left/full keep unmatched rows with nulls on the other side."""
    from audio_feature_extraction_ray.stages.join import copartitioned_equijoin

    fact = pa.table(
        {"k": pa.array([1, 1, 2, 3], pa.int64()),
         "f": pa.array([10, 11, 20, 30], pa.int64())}
    )
    dim = pa.table(
        {"k": pa.array([1, 1, 2, 2, 4], pa.int64()),
         "d": pa.array([100, 101, 200, 201, 400], pa.int64())}
    )

    def run(how):
        out = copartitioned_equijoin(
            ray.data.from_arrow(fact), ray.data.from_arrow(dim),
            "k", "k", ["f"], ["d"], num_partitions=4, how=how,
        ).to_pandas()
        return out.sort_values(["k", "f", "d"], na_position="last").reset_index(drop=True)

    inner = run("inner")
    assert len(inner) == 6  # 2x2 for k=1, 1x2 for k=2
    assert sorted(inner[inner.k == 1]["d"]) == [100, 100, 101, 101]

    left = run("left")
    assert len(left) == 7
    row3 = left[left.k == 3]
    assert len(row3) == 1 and row3["d"].isna().all()

    full = run("full")
    assert len(full) == 8
    row4 = full[full.k == 4]
    assert len(row4) == 1 and row4["f"].isna().all() and row4["d"].iloc[0] == 400


def test_hll_by_lang_error_bound(ray_session):
    """Per-lang HLL estimates stay within the standard error bound of the
    exact per-lang distinct-token counts."""
    import pyarrow.parquet as pq

    from audio_feature_extraction_ray.pipelines.text_analysis import (
        hll_distinct_tokens_by_lang,
    )

    sf = "/root/testdata/sf0.001"
    est = hll_distinct_tokens_by_lang(sf).set_index("lang")["hll_estimate"]
    docs = pq.read_table(f"{sf}/documents.parquet", columns=["text", "lang"]).to_pandas()
    exact = docs.groupby("lang")["text"].apply(
        lambda s: len(set(t for x in s for t in x.split(" ")))
    )
    assert sorted(est.index) == sorted(exact.index)
    for lang in exact.index:
        assert abs(est[lang] - exact[lang]) / exact[lang] < 0.05, (
            lang, est[lang], exact[lang])


def test_new_ops_empty_and_tiny_inputs(ray_session):
    """Round-3 operators survive empty/degenerate inputs (the driver gate
    only sees sf>=0.001; empty partitions appear at real scale)."""
    from audio_feature_extraction_ray.stages.dedup import incremental_dedup, keep_best_dedup
    from audio_feature_extraction_ray.stages.join import copartitioned_equijoin

    empty = pa.table(
        {"doc_id": pa.array([], pa.int64()), "text": pa.array([], pa.string())}
    )
    assert incremental_dedup(ray.data.from_arrow(empty), split_id=5, num_partitions=2).count() == 0
    escore = empty.append_column("score", pa.array([], pa.float64()))
    assert keep_best_dedup(ray.data.from_arrow(escore), score_col="score", num_partitions=2).count() == 0

    one = pa.table({"doc_id": pa.array([7], pa.int64()), "text": pa.array(["x"], pa.string())})
    out = incremental_dedup(ray.data.from_arrow(one), split_id=0, num_partitions=2).to_pandas()
    assert sorted(out["doc_id"]) == [7]  # new row, unseen content

    f = pa.table({"k": pa.array([1, 2], pa.int64()), "f": pa.array([1, 2], pa.int64())})
    d_empty = pa.table({"k": pa.array([], pa.int64()), "d": pa.array([], pa.int64())})
    # left join against an EMPTY dim keeps every fact row with null dim cols
    out = copartitioned_equijoin(
        ray.data.from_arrow(f), ray.data.from_arrow(d_empty),
        "k", "k", ["f"], ["d"], num_partitions=2, how="left",
    ).to_pandas()
    assert len(out) == 2 and out["d"].isna().all()
    # full join against an empty FACT emits the dim rows
    out = copartitioned_equijoin(
        ray.data.from_arrow(pa.table({"k": pa.array([], pa.int64()), "f": pa.array([], pa.int64())})),
        ray.data.from_arrow(pa.table({"k": pa.array([5], pa.int64()), "d": pa.array([50], pa.int64())})),
        "k", "k", ["f"], ["d"], num_partitions=2, how="full",
    ).to_pandas()
    assert len(out) == 1 and out["d"].iloc[0] == 50 and out["f"].isna().all()


def test_pack_greedy_nosplit_invariants(ray_session):
    """No-split packing: every doc placed once, no sequence exceeds the
    length budget (except single oversized docs), offsets are consistent."""
    import pandas as pd

    from audio_feature_extraction_ray.pipelines.text_analysis import (
        SEQ_LEN,
        pack_greedy_nosplit,
    )

    sf = "/root/testdata/sf0.001"
    out = pack_greedy_nosplit(sf).to_pandas()
    import pyarrow.parquet as pq

    n_docs = pq.read_metadata(f"{sf}/documents.parquet").num_rows
    assert len(out) == n_docs and out["doc_id"].is_unique
    span = out["n_tokens"].clip(lower=1)
    per_seq = span.groupby(out["seq_id"]).sum()
    sizes = out.groupby("seq_id").size()
    over = per_seq[per_seq > SEQ_LEN]
    assert (sizes[over.index] == 1).all()  # only singleton docs may overflow
    # offsets: within a seq, offset == cumsum of prior spans (doc_id order)
    df = out.sort_values(["seq_id", "doc_id"])
    expect = df.groupby("seq_id")["n_tokens"].transform(
        lambda s: s.clip(lower=1).cumsum().shift(fill_value=0)
    )
    assert (df["offset_in_seq"] == expect).all()
    # deterministic
    out2 = pack_greedy_nosplit(sf).to_pandas().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(out.sort_values("doc_id").reset_index(drop=True), out2)


def test_triangle_count_known_graphs(ray_session):
    import itertools

    import ray.data

    from audio_feature_extraction_ray.stages.graph import triangle_count

    # 5-clique (C(5,3)=10 triangles) + 4-chain (0) + star K1,4 (0), with
    # reversed duplicates and self-loops thrown in to exercise canonicalize.
    clique = list(itertools.combinations(range(5), 2))
    chain = [(10, 11), (11, 12), (12, 13)]
    star = [(20, 21), (20, 22), (20, 23), (20, 24)]
    edges = clique + chain + star
    edges += [(b, a) for a, b in clique]  # reversed dups
    edges += [(7, 7), (10, 10)]  # self-loops
    ds = ray.data.from_items([{"a": a, "b": b} for a, b in edges])
    out = triangle_count(ds, num_partitions=4)
    assert out["n_triangles"].tolist() == [10]

    # two triangles sharing an edge -> 2; plus one isolated triangle -> 3
    bowtie = [(0, 1), (1, 2), (0, 2), (1, 3), (2, 3), (30, 31), (31, 32), (30, 32)]
    ds2 = ray.data.from_items([{"a": a, "b": b} for a, b in bowtie])
    assert triangle_count(ds2, num_partitions=3)["n_triangles"].tolist() == [3]


def test_embedding_pca_matches_reference(ray_session):
    import pyarrow.parquet as pq

    from audio_feature_extraction_ray.stages.ann import PCA_Q, embedding_pca, pca_fit

    sf = "/root/testdata/sf0.001"
    out = (
        embedding_pca(sf).to_pandas().sort_values("vec_id").reset_index(drop=True)
    )
    tbl = pq.read_table(f"{sf}/embeddings.parquet", columns=["vec_id", "embedding"])
    m = np.stack(tbl.column("embedding").to_pylist()).astype(np.float64)
    ids = tbl.column("vec_id").to_numpy()
    # single-process reference with the IDENTICAL quantized-moment formula
    xq = np.rint(m * PCA_Q).astype(np.int64)
    n = xq.shape[0]
    mean_q = xq.sum(axis=0).astype(np.float64) / n
    cov = ((xq.T @ xq).astype(np.float64) - np.outer(mean_q, mean_q) * n) / n
    evals, evecs = np.linalg.eigh(cov)
    comp = evecs[:, ::-1][:, :2].T
    flip = np.sign(comp[np.arange(2), np.abs(comp).argmax(axis=1)])
    comp = comp * flip[:, None]
    proj = (m - mean_q / PCA_Q) @ comp.T
    proj = np.floor(proj * 1e6 + 0.5) / 1e6
    order = np.argsort(ids)
    assert np.array_equal(out["pc1"].to_numpy(), proj[order, 0])
    assert np.array_equal(out["pc2"].to_numpy(), proj[order, 1])
    # pc1 must capture at least as much variance as pc2
    assert out["pc1"].var() >= out["pc2"].var()
    # distributed moments must be invariant to block layout
    mean2, comp2 = pca_fit(
        __import__("ray").data.read_parquet(f"{sf}/embeddings.parquet").repartition(7)
    )
    assert np.array_equal(comp, comp2)


def test_session_ops_degenerate_inputs(ray_session):
    """This round's event/graph/search ops survive empty and single-row
    inputs (empty partitions are routine at real scale)."""
    from audio_feature_extraction_ray.stages.graph import triangle_count

    # triangle_count: no edges at all, and a single self-loop
    e0 = pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())})
    assert triangle_count(ray.data.from_arrow(e0), num_partitions=2)["n_triangles"].tolist() == [0]
    e1 = pa.table({"a": pa.array([3], pa.int64()), "b": pa.array([3], pa.int64())})
    assert triangle_count(ray.data.from_arrow(e1), num_partitions=2)["n_triangles"].tolist() == [0]


def test_cumulative_single_event_users(ray_session, tmp_path):
    """events_cumulative / interarrival on a fixture where every user has
    exactly ONE event: running stats collapse to the row itself and the
    inter-arrival table reports zero gaps."""
    import pyarrow.parquet as pq

    from audio_feature_extraction_ray.pipelines.events import cumulative, interarrival_stats

    n = 20
    tbl = pa.table(
        {
            "event_id": pa.array(range(n), pa.int64()),
            "ts": pa.array([1_000_000 * i for i in range(n)], pa.timestamp("us")),
            "user_id": pa.array(range(n), pa.int64()),  # all distinct
            "event_type": pa.array(["view"] * n, pa.string()),
            "value": pa.array([1.25] * n, pa.float64()),
            "props": pa.array(['{"k": 1}'] * n, pa.string()),
        }
    )
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(tbl, d / "events.parquet")
    out = cumulative(str(d)).to_pandas()
    assert (out["run_count"] == 1).all()
    assert (out["run_sum_cents"] == 125).all()
    assert (out["run_max_cents"] == 125).all()
    ia = interarrival_stats(str(d)).to_pandas()
    assert (ia["n_gaps"] == 0).all() and ia["mean_gap_us"].isna().all()


def test_scrub_spans_no_duplicates_is_identity(ray_session, tmp_path):
    """scrub_spans over a corpus with NO repeated k-grams returns every doc
    byte-identical with n_removed == 0."""
    import pyarrow.parquet as pq

    from audio_feature_extraction_ray.pipelines.spans import scrub_spans

    texts = [" ".join(f"w{i}_{j}" for j in range(12)) for i in range(6)]
    tbl = pa.table(
        {
            "doc_id": pa.array(range(6), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * 6, pa.string()),
            "source": pa.array(["s"] * 6, pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(tbl, d / "documents.parquet")
    out = scrub_spans(str(d)).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert (out["n_removed"] == 0).all()
    assert out["text_scrubbed"].tolist() == texts


def test_time_window_sum_dense_bursts_and_peers(ray_session, tmp_path):
    """RANGE-frame semantics pinned on a dense synthetic burst: windows up
    to 30 rows, duplicate timestamps (peers must be included even 'after'
    the current row), and exact window-edge hits at ts - 1h."""
    import duckdb
    import pyarrow.parquet as pq

    from audio_feature_extraction_ray.pipelines.events import (
        TIME_WINDOW_SUM_SQL,
        time_window_sum,
    )

    rng = np.random.default_rng(7)
    rows = []
    eid = 0
    base = 1_700_000_000_000_000
    for u in range(5):
        t = base
        for _ in range(60):
            step = int(rng.choice([0, 1, 60, 600, 3600, 3601])) * 1_000_000
            t += step
            rows.append((eid, t, u, float(rng.integers(1, 500)) / 100))
            eid += 1
    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array(["view"] * len(rows), pa.string()),
            "value": pa.array([r[3] for r in rows], pa.float64()),
            "props": pa.array(['{"k": 1}'] * len(rows), pa.string()),
        }
    )
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(tbl, d / "events.parquet")
    out = time_window_sum(str(d)).to_pandas().sort_values("event_id").reset_index(drop=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{d}/events.parquet'")
    want = con.sql(TIME_WINDOW_SUM_SQL).df().sort_values("event_id").reset_index(drop=True)
    assert out["w1h_count"].max() >= 10  # genuinely dense windows
    assert (tbl.column("ts").to_pandas().duplicated().sum()) > 0  # peers exist
    assert np.array_equal(out["w1h_sum_cents"].to_numpy(), want["w1h_sum_cents"].to_numpy())
    assert np.array_equal(out["w1h_count"].to_numpy(), want["w1h_count"].to_numpy())


def test_dq_violations_fire_on_dirty_fixture(ray_session, tmp_path):
    import duckdb
    import pyarrow.parquet as pq

    from audio_feature_extraction_ray.pipelines.text_analysis import (
        DQ_VIOLATIONS_SQL,
        dq_violations,
    )

    tbl = pa.table(
        {
            "doc_id": pa.array([1, 1, 2, 3, 4, 4, 4], pa.int64()),  # 3 dups
            "text": pa.array(["a b", "a b", "", "x", "y z", "w", "q"], pa.string()),
            "lang": pa.array(["en", "xx", "de", "yy", "en", "zh", "en"], pa.string()),
            "n_chars": pa.array([3, 3, 0, 1, 99, 1, 1], pa.int64()),  # one mismatch
            "source": pa.array(["s"] * 7, pa.string()),
        }
    )
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(tbl, d / "documents.parquet")
    out = dq_violations(str(d)).set_index("rule")["violations"]
    assert out["doc_id_unique"] == 3
    assert out["lang_in_set"] == 2
    assert out["n_chars_matches_text"] == 1
    assert out["text_nonempty"] == 1
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{d}/documents.parquet'")
    want = con.sql(DQ_VIOLATIONS_SQL).df().set_index("rule")["violations"]
    assert (out.sort_index() == want.sort_index()).all()
