"""Round-5 session-5 operators: asymmetric set-containment join (and any
later session-5 additions). Oracle parity is covered by the parametrized
test_queries_oracle harness; these tests pin what SQL equality can't see —
the one-sided prefix-filter theory against a brute-force reference on a
corpus built to stress it, directedness, and the 0-row flow."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from audio_feature_extraction_ray.stages import dedup


def _docs_fixture(tmp_path, texts, name="sfd5"):
    n = len(texts)
    tbl = pa.table(
        {
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * n, pa.string()),
            "source": pa.array(["s"] * n, pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    sf = tmp_path / name
    sf.mkdir(exist_ok=True)
    pq.write_table(tbl, sf / "documents.parquet", row_group_size=2)
    return str(sf)


def _read_docs(sf):
    import ray

    return ray.data.read_parquet(f"{sf}/documents.parquet")


def _naive_containment(texts, t_num, t_den):
    sets = [set(t.split(" ")) for t in texts]
    out = set()
    for a in range(len(sets)):
        for b in range(len(sets)):
            if a == b:
                continue
            i = len(sets[a] & sets[b])
            if i * t_den >= len(sets[a]) * t_num:
                out.add((a, b, i, len(sets[a])))
    return out


def test_containment_join_planted_subset_is_directed(ray_session, tmp_path):
    """A 3-token snippet fully inside a 40-token superset: a->b fires at
    containment 1.0; the reverse direction must NOT (3/40 < 0.9)."""
    big = " ".join(f"w{i}" for i in range(40))
    snippet = "w3 w17 w29"
    sf = _docs_fixture(tmp_path, [snippet, big, "zz qq unrelated"], name="sfsub")
    rows = dedup.containment_join(_read_docs(sf)).to_pandas()
    pairs = set(zip(rows["a"], rows["b"]))
    assert (0, 1) in pairs and (1, 0) not in pairs
    r = rows[(rows["a"] == 0) & (rows["b"] == 1)].iloc[0]
    assert r["inter"] == 3 and r["n_a"] == 3 and r["containment"] == 1.0


def test_containment_join_matches_bruteforce(ray_session, tmp_path):
    """Seeded corpus over a small vocabulary (dense overlap defeats lazy
    pruning shortcuts): the full directed pair set must equal brute force."""
    rng = np.random.default_rng(7)
    vocab = [f"t{i}" for i in range(18)]
    texts = [
        " ".join(rng.choice(vocab, size=rng.integers(2, 12), replace=True))
        for _ in range(60)
    ]
    sf = _docs_fixture(tmp_path, texts, name="sfbf")
    rows = dedup.containment_join(_read_docs(sf)).to_pandas()
    got = set(zip(rows["a"], rows["b"], rows["inter"], rows["n_a"]))
    want = _naive_containment(texts, dedup.CT_T_NUM, dedup.CT_T_DEN)
    assert got == want
    # scores are exact rationals rounded to 1e-6 — spot-check the float col
    for _, r in rows.iterrows():
        assert r["containment"] == np.floor(r["inter"] / r["n_a"] * 1e6 + 0.5) / 1e6


def test_containment_join_empty_and_single(ray_session, tmp_path):
    sf0 = _docs_fixture(tmp_path, [], name="sfc0")
    assert dedup.containment_join(_read_docs(sf0)).count() == 0
    sf1 = _docs_fixture(tmp_path, ["only one doc"], name="sfc1")
    assert dedup.containment_join(_read_docs(sf1)).count() == 0


def _docs_sources_fixture(tmp_path, vals_a, vals_b, name="sfmw"):
    n = len(vals_a) + len(vals_b)
    nc = list(vals_a) + list(vals_b)
    tbl = pa.table(
        {
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            "text": pa.array(["x"] * n, pa.string()),
            "lang": pa.array(["en"] * n, pa.string()),
            "source": pa.array(
                ["src0"] * len(vals_a) + ["src1"] * len(vals_b), pa.string()
            ),
            "n_chars": pa.array(nc, pa.int64()),
        }
    )
    sf = tmp_path / name
    sf.mkdir(exist_ok=True)
    pq.write_table(tbl, sf / "documents.parquet", row_group_size=3)
    return str(sf)


def test_mannwhitney_matches_naive_average_ranks(ray_session, tmp_path):
    """Count-based 2*R_A must equal direct average-rank assignment on a
    tie-heavy sample, and U_A + U_B = n1*n2 must hold exactly."""
    from audio_feature_extraction_ray.pipelines.text_analysis import mannwhitney_sources

    rng = np.random.default_rng(11)
    a = rng.integers(5, 15, size=37).tolist()   # heavy ties in [5,15)
    b = rng.integers(8, 18, size=23).tolist()
    df = mannwhitney_sources(_docs_sources_fixture(tmp_path, a, b))
    # naive: average ranks over the pooled sample
    pooled = np.array(a + b, dtype=np.float64)
    order = np.argsort(pooled, kind="mergesort")
    ranks = np.empty(pooled.size, dtype=np.float64)
    i = 0
    pos = 1
    srt = pooled[order]
    while i < srt.size:
        j = i
        while j < srt.size and srt[j] == srt[i]:
            j += 1
        ranks[order[i:j]] = (pos + (pos + (j - i) - 1)) / 2.0
        pos += j - i
        i = j
    r_a = ranks[: len(a)].sum()
    u_a = r_a - len(a) * (len(a) + 1) / 2.0
    assert df["n_a"][0] == len(a) and df["n_b"][0] == len(b)
    assert df["u2_a"][0] == round(2 * u_a)
    t = np.unique(pooled, return_counts=True)[1].astype(np.int64)
    assert df["tie_term"][0] == int((t**3 - t).sum())
    # symmetry: U_A + U_B = n1*n2  (2U_A + 2U_B = 2 n1 n2)
    u2_b = 2 * len(a) * len(b) - df["u2_a"][0]
    assert u2_b >= 0
    # z sign follows the location shift (b drawn higher -> U_A below mean)
    assert df["mw_z"][0] < 0


def test_mannwhitney_degenerate_all_ties(ray_session, tmp_path):
    """Every value identical: variance collapses to 0 -> z reported as 0."""
    from audio_feature_extraction_ray.pipelines.text_analysis import mannwhitney_sources

    df = mannwhitney_sources(_docs_sources_fixture(tmp_path, [7] * 5, [7] * 9, name="sfmwt"))
    assert df["mw_z"][0] == 0.0
    # 2*U_A at all-ties = n1*n2 exactly (every comparison is a half-win)
    assert df["u2_a"][0] == 5 * 9


def _docs_xy_fixture(tmp_path, texts, name="sfsp"):
    n = len(texts)
    tbl = pa.table(
        {
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * n, pa.string()),
            "source": pa.array(["s"] * n, pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    sf = tmp_path / name
    sf.mkdir(exist_ok=True)
    pq.write_table(tbl, sf / "documents.parquet", row_group_size=3)
    return str(sf)


def _avg_ranks(v):
    v = np.asarray(v, dtype=np.float64)
    order = np.argsort(v, kind="mergesort")
    ranks = np.empty(v.size, dtype=np.float64)
    srt = v[order]
    i, pos = 0, 1
    while i < srt.size:
        j = i
        while j < srt.size and srt[j] == srt[i]:
            j += 1
        ranks[order[i:j]] = (2 * pos + (j - i) - 1) / 2.0
        pos += j - i
        i = j
    return ranks


def test_spearman_matches_naive_rank_pearson(ray_session, tmp_path):
    """Cell-count Spearman must equal Pearson over directly-assigned
    average ranks on a tie-heavy corpus."""
    from audio_feature_extraction_ray.pipelines.text_analysis import spearman_docs

    rng = np.random.default_rng(23)
    # words of 1-3 chars, 1-9 tokens: dense ties in both n_chars and n_tokens
    texts = [
        " ".join("a" * rng.integers(1, 4) for _ in range(rng.integers(1, 10)))
        for _ in range(80)
    ]
    df = spearman_docs(_docs_xy_fixture(tmp_path, texts))
    x = np.array([len(t) for t in texts], dtype=np.float64)
    y = np.array([t.count(" ") + 1 if t else 0 for t in texts], dtype=np.float64)
    rx, ry = _avg_ranks(x), _avg_ranks(y)
    num = ((rx - rx.mean()) * (ry - ry.mean())).sum()
    den = np.sqrt(((rx - rx.mean()) ** 2).sum() * ((ry - ry.mean()) ** 2).sum())
    want = np.floor(num / den * 1e6 + 0.5) / 1e6
    assert df["n_rows"][0] == 80
    assert abs(df["spearman"][0] - want) <= 1e-6


def test_spearman_perfect_monotone_and_degenerate(ray_session, tmp_path):
    from audio_feature_extraction_ray.pipelines.text_analysis import spearman_docs

    # tokens of width 2 ("ab"): n_chars = 3*k - 1 strictly increases with
    # token count k -> perfect monotone association, rho = 1 exactly
    texts = [" ".join(["ab"] * k) for k in range(1, 21)]
    df = spearman_docs(_docs_xy_fixture(tmp_path, texts, name="sfsp1"))
    assert df["spearman"][0] == 1.0
    # constant x (all same length, same token count): zero variance -> 0.0
    texts2 = ["cd ef"] * 7
    df2 = spearman_docs(_docs_xy_fixture(tmp_path, texts2, name="sfsp0"))
    assert df2["spearman"][0] == 0.0 and df2["d_xx"][0] == 0


def test_embedding_label_variance_matches_numpy(ray_session, tmp_path):
    """Quantized population variance per (label, dim) equals numpy's on the
    1e-6-quantized values (the exactness contract is over q = rint(x*1e6))."""
    from audio_feature_extraction_ray.pipelines.search_dedup import (
        embedding_label_variance,
    )

    rng = np.random.default_rng(31)
    n, d = 50, 4
    labels = rng.integers(0, 3, size=n).astype(np.int32)
    vecs = rng.normal(size=(n, d)).astype(np.float32)
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(n, dtype=np.int64)),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(vecs.reshape(-1)), d
            ).cast(pa.list_(pa.float32())),
            "label": pa.array(labels, pa.int32()),
        }
    )
    sf = tmp_path / "sfvar"
    sf.mkdir(exist_ok=True)
    pq.write_table(tbl, sf / "embeddings.parquet", row_group_size=7)
    df = embedding_label_variance(str(sf))
    q = np.rint(vecs.astype(np.float64) * 1e6)
    for _, r in df.iterrows():
        sel = q[labels == r["label"], int(r["dim"])]
        want = np.floor(sel.var() / 1e12 * 1e6 + 0.5) / 1e6
        assert r["n"] == sel.size
        assert r["variance"] == want
