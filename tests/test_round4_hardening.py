"""Round-4 hardening tests (VERDICT r3 tasks 2, 4, 5, 7):

- distinct_users: exact on a skewed fixture AND the exchange spreads a hot
  event_type over all partitions (no single-task blowup).
- token_heavy_hitters: driver fold bounded by K x partitions, not K x batches.
- time_window_sum: segment-band overflow raises SchemaError (survives -O),
  never returns silently-wrong sums.
- string_hash_array: audit that every call site is partition-routing only
  (collisions may unbalance partitions but can never change answers).
"""

import numpy as np
import pyarrow as pa
import pytest

import ray


def _write_events(tmp_path, tbl):
    import pyarrow.parquet as pq

    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(tbl, d / "events.parquet")
    return str(d)


def _events_tbl(eids, ts_us, uids, types, values):
    n = len(eids)
    return pa.table(
        {
            "event_id": pa.array(eids, pa.int64()),
            "ts": pa.array(ts_us, pa.timestamp("us")),
            "user_id": pa.array(uids, pa.int64()),
            "event_type": pa.array(types, pa.string()),
            "value": pa.array(values, pa.float64()),
            "props": pa.array(['{"k": 1}'] * n, pa.string()),
        }
    )


def test_distinct_users_skewed_hot_type(ray_session, tmp_path):
    """One event_type owns 90% of a 12k-user population. The old plan put
    all of that type's distinct users into ONE pandas task; the fixed plan
    hash-routes (type, user) by user hash, so (a) the answer is still
    exact vs duckdb and (b) no __pid partition holds more than a ~2/P
    share of the hot type's pairs."""
    import duckdb

    from audio_feature_extraction_ray.functions.hashing import avalanche64
    from audio_feature_extraction_ray.pipelines.events import (
        DISTINCT_USERS_PARTS,
        DISTINCT_USERS_SQL,
        distinct_users,
    )

    rng = np.random.default_rng(11)
    n_users = 12_000
    hot_users = np.arange(int(n_users * 0.9), dtype=np.int64)
    cold_users = np.arange(int(n_users * 0.9), n_users, dtype=np.int64)
    # hot type: every hot user twice (dups must collapse); cold: few users
    uids = np.concatenate([hot_users, hot_users, cold_users])
    types = ["view"] * (2 * hot_users.size) + ["buy"] * cold_users.size
    n = uids.size
    tbl = _events_tbl(
        list(range(n)),
        [1_700_000_000_000_000 + 1_000_000 * i for i in range(n)],
        uids,
        types,
        list(rng.uniform(0, 5, n).round(2)),
    )
    d = _write_events(tmp_path, tbl)

    out = distinct_users(d).to_pandas().sort_values("event_type").reset_index(drop=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{d}/events.parquet'")
    want = con.sql(DISTINCT_USERS_SQL).df().sort_values("event_type").reset_index(drop=True)
    assert out["event_type"].tolist() == want["event_type"].tolist()
    assert out["n_users"].tolist() == want["n_users"].tolist()

    # exchange-shape evidence: the routing rule (hash(user_id) % P — the
    # same contract the closure applies) spreads the hot type's distinct
    # pairs over ALL partitions
    pids = (avalanche64(hot_users.astype(np.uint64)) % np.uint64(DISTINCT_USERS_PARTS)).astype(
        np.int32
    )
    pid_counts = np.bincount(pids, minlength=DISTINCT_USERS_PARTS)
    assert (pid_counts > 0).sum() == DISTINCT_USERS_PARTS  # every partition sees the hot type
    assert pid_counts.max() <= 2 * hot_users.size / DISTINCT_USERS_PARTS  # no hot task


def test_heavy_hitters_driver_fold_bounded(ray_session, tmp_path):
    """The pre-driver exchange merges batch partials per token partition:
    each __pid group emits <= MG_K rows, so the driver folds <= MG_K * P
    counters regardless of batch count. Also: exact regime (vocab <= MG_K)
    still matches exact counts after the exchange."""
    import pyarrow.parquet as pq

    from audio_feature_extraction_ray.pipelines.text_analysis import (
        MG_K,
        MG_PARTS,
        _mg_merge_partition,
        token_heavy_hitters,
    )

    rng = np.random.default_rng(5)
    vocab = [f"tok{i:03d}" for i in range(40)]  # <= MG_K -> exact everywhere
    weights = rng.dirichlet(np.ones(40))
    texts = [
        " ".join(rng.choice(vocab, size=30, p=weights)) for _ in range(400)
    ]
    tbl = pa.table(
        {
            "doc_id": pa.array(range(400), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * 400, pa.string()),
            "source": pa.array(["s"] * 400, pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(tbl, d / "documents.parquet")

    out = token_heavy_hitters(str(d))
    # exact regime: estimates equal true counts for the reported top
    from collections import Counter

    true = Counter(t for s in texts for t in s.split(" "))
    for tok, est in zip(out["token"], out["est"]):
        assert est == true[tok]

    # partition merge output is bounded by MG_K even when fed many partials
    many = pa.table(
        {
            "token": pa.array([f"t{i % 500}" for i in range(5000)], pa.string()),
            "est": pa.array(np.ones(5000, np.int64), pa.int64()),
        }
    )
    merged = _mg_merge_partition(many)
    assert merged.num_rows <= MG_K
    assert MG_K * MG_PARTS <= 4096  # the driver-fold bound itself stays tiny


def test_time_window_sum_overflow_raises_under_O(ray_session, tmp_path):
    """A per-task ts span too wide for the segment-band shift must raise
    SchemaError (events.py) — NOT an assert, which python -O strips and
    then the packed window sums silently overflow int64."""
    from audio_feature_extraction_ray.pipelines.events import time_window_sum

    span = 2**62 + 10  # one user, base.max() alone exceeds the band budget
    tbl = _events_tbl(
        [0, 1],
        [0, span],
        [7, 7],
        ["view", "view"],
        [1.0, 2.0],
    )
    d = _write_events(tmp_path, tbl)
    with pytest.raises(Exception, match="overflow"):
        time_window_sum(d).to_pandas()

    # the guard is a raise, not an assert: it survives python -O
    import subprocess
    import sys

    code = (
        "import sys; sys.argv=['x']\n"
        "import ray\n"
        "ray.init(address='local', num_cpus=2, include_dashboard=False,"
        " logging_level='ERROR')\n"
        "from audio_feature_extraction_ray.pipelines.events import time_window_sum\n"
        "try:\n"
        f"    time_window_sum({str(d)!r}).to_pandas()\n"
        "    print('NO_RAISE')\n"
        "except Exception as e:\n"
        "    print('RAISED' if 'overflow' in str(e) else 'WRONG_ERR')\n"
        "ray.shutdown()\n"
    )
    r = subprocess.run(
        [sys.executable, "-O", "-c", code], capture_output=True, text=True, timeout=300
    )
    assert "RAISED" in r.stdout, r.stdout + r.stderr


def test_string_hash_array_call_sites_routing_only():
    """Audit (VERDICT r3 task 7): the weak prefix hash may be used ONLY to
    compute __pid partition routing, never as an identity/join/dedup key.
    Every current call site groups by the REAL string within the partition,
    so a collision merely co-locates two tokens. This test inventories call
    sites so a new identity-bearing use fails loudly."""
    import re
    from pathlib import Path

    pkg = Path(__file__).resolve().parents[1] / "audio_feature_extraction_ray"
    sites = []
    for f in pkg.rglob("*.py"):
        for i, line in enumerate(f.read_text().splitlines(), 1):
            if "string_hash_array(" in line and "def string_hash_array" not in line:
                sites.append((f.relative_to(pkg).as_posix(), i, line.strip()))
    # every use must reduce mod a partition count IN THE SAME EXPRESSION
    # (pid assignments and pid_of closures alike) — an identity-bearing use
    # would keep the full 64-bit value and fail this
    for path, ln, line in sites:
        assert re.search(r"string_hash_array\(.*%\s*np\.uint64\(", line), (
            f"non-routing use of weak string_hash_array at {path}:{ln}: {line}\n"
            "Use string_hash_strong for anything identity-bearing."
        )
    # pin the audited inventory; update deliberately when adding a site
    got = {(p, "pid") for p, _, _ in sites}
    assert got == {
        ("pipelines/text_analysis.py", "pid"),
        ("pipelines/events.py", "pid"),
    }, sites


def test_chunk_batch_kernel_edges():
    """chunk kernel vs a plain-Python reference: empty text, sub-chunk doc,
    exact stride multiple, long doc with short tail, overlap layout."""
    import numpy as np
    import pyarrow as pa

    from audio_feature_extraction_ray.pipelines.text_analysis import (
        CHUNK_STRIDE,
        CHUNK_TOKENS,
        _chunk_batch,
    )

    texts = [
        "",  # split -> [''] -> one chunk of the empty token
        "a b c",  # shorter than one chunk
        " ".join(f"t{i}" for i in range(CHUNK_TOKENS)),  # exactly one chunk
        " ".join(f"u{i}" for i in range(CHUNK_TOKENS + CHUNK_STRIDE)),  # exact 2-chunk fit
        " ".join(f"v{i}" for i in range(300)),  # long with short tail
    ]
    tbl = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()), "text": texts})
    out = _chunk_batch(tbl)

    expect = []
    for did, text in enumerate(texts):
        toks = text.split(" ")
        n = len(toks)
        nch = max(0, -(-(n - CHUNK_TOKENS) // CHUNK_STRIDE)) + 1 if n > CHUNK_TOKENS else 1
        for k in range(nch):
            s = k * CHUNK_STRIDE
            seg = toks[s : s + CHUNK_TOKENS]
            expect.append((did, k, s, len(seg), " ".join(seg)))

    got = list(
        zip(
            out.column("doc_id").to_pylist(),
            out.column("chunk_id").to_pylist(),
            out.column("tok_start").to_pylist(),
            out.column("tok_len").to_pylist(),
            out.column("chunk_text").to_pylist(),
        )
    )
    assert got == expect
    # consecutive chunks of one doc overlap by CHUNK_TOKENS - CHUNK_STRIDE
    starts = np.array([r[2] for r in got if r[0] == 4])
    assert (np.diff(starts) == CHUNK_STRIDE).all()


def test_source_overlap_cross_batch_distinct(ray_session, tmp_path):
    """The same (gram, source) pair arriving in MANY batches must count once:
    3000 rows force multiple map_batches batches per block, every row of a
    source shares its grams, and the result must still equal the quadratic
    SQL reference."""
    import duckdb
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from audio_feature_extraction_ray.pipelines.spans import SPAN_K, source_overlap

    rng = np.random.default_rng(11)
    base = [f"w{i}" for i in range(SPAN_K + 4)]
    rows = []
    for i in range(3000):
        src = f"s{i % 3}"
        # each source has one shared long phrase (same grams in every row)
        # plus a small per-row twist so batches are not all identical
        toks = base + [f"x{src}", f"y{rng.integers(0, 4)}"]
        rows.append((i, " ".join(toks), src))
    tbl = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "source": pa.array([r[2] for r in rows], pa.string()),
        }
    )
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(tbl, d / "documents.parquet")

    got = source_overlap(str(d)).sort_values(["source_a", "source_b"]).reset_index(drop=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{d}/documents.parquet')")
    from audio_feature_extraction_ray.pipelines.spans import SOURCE_OVERLAP_SQL

    ref = (
        con.execute(SOURCE_OVERLAP_SQL)
        .fetchdf()
        .sort_values(["source_a", "source_b"])
        .reset_index(drop=True)
    )
    assert got.shape == ref.shape == (3, 3)
    assert (got["shared_grams"].to_numpy() == ref["shared_grams"].to_numpy()).all()
    assert list(got["source_a"]) == list(ref["source_a"])


def test_dsir_weights_rank_target_up(ray_session, tmp_path):
    """DSIR semantics: documents drawn from the target source's token
    distribution must receive HIGHER importance log-ratios than documents
    from a disjoint vocabulary — and the engine result must hash-match the
    SQL oracle on a fixture whose batches split doc/token ownership."""
    import duckdb
    import pyarrow.parquet as pq

    from audio_feature_extraction_ray.pipelines.text_analysis import (
        DSIR_WEIGHTS_SQL,
        dsir_weights,
    )

    rng = np.random.default_rng(7)
    tgt_vocab = [f"t{i}" for i in range(40)]
    bg_vocab = [f"b{i}" for i in range(40)]
    rows = []
    for i in range(300):
        if i % 3 == 0:
            src, vocab = "src0", tgt_vocab  # target domain
        elif i % 3 == 1:
            src, vocab = "srcA", tgt_vocab  # target-LIKE text, other source
        else:
            src, vocab = "srcB", bg_vocab  # disjoint background
        toks = rng.choice(vocab, size=30)
        rows.append((i, " ".join(toks), src))
    tbl = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "source": pa.array([r[2] for r in rows], pa.string()),
        }
    )
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(tbl, d / "documents.parquet")

    got = dsir_weights(str(d)).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert len(got) == 300 and got["doc_id"].is_unique

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{d}/documents.parquet')")
    ref = con.execute(DSIR_WEIGHTS_SQL).fetchdf().sort_values("doc_id").reset_index(drop=True)
    assert (got["dsir_logratio_e6"].to_numpy() == ref["dsir_logratio_e6"].to_numpy()).all()
    assert (got["token_count"].to_numpy() == ref["token_count"].to_numpy()).all()

    src = np.array([r[2] for r in rows])
    w = got.set_index("doc_id")["dsir_logratio"].to_numpy()
    # target-distribution docs (src0 AND the target-like srcA) rank above the
    # disjoint-vocabulary background; srcA proves the weight follows the
    # token distribution, not the source label.
    assert w[src == "src0"].mean() > w[src == "srcB"].mean() + 1.0
    assert w[src == "srcA"].mean() > w[src == "srcB"].mean() + 1.0


def test_ccnet_buckets_ties_and_ntile_sizing(ray_session, tmp_path):
    """CCNet terciles: a tie-heavy fixture (many docs with IDENTICAL unigram
    logprob) still bucketizes deterministically (rank key breaks ties by
    doc_id) and matches SQL NTILE's larger-buckets-first sizing on an
    n % 3 != 0 corpus."""
    import duckdb
    import pyarrow.parquet as pq

    from audio_feature_extraction_ray.pipelines.text_analysis import (
        CCNET_BUCKETS_SQL,
        ccnet_buckets,
    )

    # 200 docs over 4 templates -> huge tie groups; 200 % 3 = 2
    templates = ["a a a", "a b", "c c d", "e"]
    rows = [(i, templates[i % 4]) for i in range(200)]
    tbl = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
        }
    )
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(tbl, d / "documents.parquet")

    got = ccnet_buckets(str(d)).to_pandas().sort_values("doc_id").reset_index(drop=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{d}/documents.parquet')")
    ref = con.execute(CCNET_BUCKETS_SQL).fetchdf().sort_values("doc_id").reset_index(drop=True)
    assert len(got) == 200
    assert (got["ppl_bucket"].to_numpy() == ref["ppl_bucket"].to_numpy()).all()
    assert (got["avg_logprob_e6"].to_numpy() == ref["avg_logprob_e6"].to_numpy()).all()
    sizes = got["ppl_bucket"].value_counts().sort_index().to_list()
    assert sizes == [67, 67, 66]  # NTILE: first n % 3 buckets get the extra row


def test_gopher_rules_each_bit(ray_session, tmp_path):
    """Each Gopher gate flips independently on a crafted doc, empty text
    fails all gates, and the integer bitmask matches the SQL oracle."""
    import duckdb
    import pyarrow.parquet as pq

    from audio_feature_extraction_ray.pipelines.text_analysis import (
        GOPHER_RULES_SQL,
        gopher_rules,
    )

    docs = [
        (0, "the and for with this that from have " + "word " * 20),  # passes all
        (1, "the and one two"),  # < 10 tokens -> bit0 off
        (2, "the and " + "a " * 38),  # mean len < 3 -> bit1 off (stopwords ok)
        (3, "zebra " * 40),  # no stopwords -> bit2 off
        (4, "the and for with this that " + "!!!! .... ,,,, " * 12),  # punct -> bit3 off
        (5, ""),  # empty -> mask 0
    ]
    tbl = pa.table(
        {
            "doc_id": pa.array([d[0] for d in docs], pa.int64()),
            "text": pa.array([d[1].strip() for d in docs], pa.string()),
        }
    )
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(tbl, d / "documents.parquet")

    got = gopher_rules(str(d)).to_pandas().sort_values("doc_id").reset_index(drop=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{d}/documents.parquet')")
    ref = con.execute(GOPHER_RULES_SQL).fetchdf().sort_values("doc_id").reset_index(drop=True)
    assert (got["rule_mask"].to_numpy() == ref["rule_mask"].to_numpy()).all()
    masks = dict(zip(got.doc_id, got.rule_mask))
    assert masks[0] == 15 and got.keep[0]
    assert masks[1] & 1 == 0 and masks[1] & 4  # short but has stopwords
    assert masks[2] & 2 == 0 and masks[2] & 1  # mean-length fail, length ok
    assert masks[3] & 4 == 0 and masks[3] & 2  # stopword fail
    assert masks[4] & 8 == 0 and masks[4] & 4  # punct fail
    assert masks[5] == 0


def test_dsir_weights_matches_naive_reference(ray_session, tmp_path):
    """Property check vs an independent naive implementation (pure Python
    dict counting, no shared code): exact integer equality of
    dsir_logratio_e6 on a randomized multi-source corpus — pins the
    algebraic split sum(tf*s6) + ntok*C6 == the smoothed log-ratio, and the
    in-exchange derivation of Tt/Tr/V."""
    import math

    import pyarrow.parquet as pq

    from audio_feature_extraction_ray.pipelines.text_analysis import dsir_weights

    rng = np.random.default_rng(23)
    vocab = [f"w{i}" for i in range(150)]
    docs = []
    for i in range(120):
        src = f"src{i % 5}"
        toks = list(rng.choice(vocab, size=int(rng.integers(1, 60))))
        docs.append((i, " ".join(toks), src))
    tbl = pa.table(
        {
            "doc_id": pa.array([d[0] for d in docs], pa.int64()),
            "text": pa.array([d[1] for d in docs], pa.string()),
            "source": pa.array([d[2] for d in docs], pa.string()),
        }
    )
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(tbl, d / "documents.parquet")

    got = dsir_weights(str(d)).to_pandas().set_index("doc_id").sort_index()

    # naive reference
    ct, cr = {}, {}
    tt = tr = 0
    per_doc = {}
    for did, text, src in docs:
        toks = text.split(" ")
        tf = {}
        for t in toks:
            tf[t] = tf.get(t, 0) + 1
        per_doc[did] = tf
        for t, c in tf.items():
            cr[t] = cr.get(t, 0) + c
            if src == "src0":
                ct[t] = ct.get(t, 0) + c
        tr += len(toks)
        if src == "src0":
            tt += len(toks)
    v = len(cr)
    c6 = math.floor(math.log((tr + v) / (tt + v)) * 1e6 + 0.5)
    for did, text, src in docs:
        tf = per_doc[did]
        s = sum(
            c * math.floor((math.log(ct.get(t, 0) + 1) - math.log(cr[t] + 1)) * 1e6 + 0.5)
            for t, c in tf.items()
        )
        ntok = sum(tf.values())
        want = s + ntok * c6
        assert int(got.loc[did, "dsir_logratio_e6"]) == want, did
        assert int(got.loc[did, "token_count"]) == ntok


def test_bench_metric_line_fits_driver_tail_capture():
    """BENCH_r03 parsed=null because the final metric line outgrew the
    driver's 2000-char tail capture. Pin the contract: a worst-case final
    line (the 5 LONGEST query names actually in bench.py's suite, maximal
    realistic numeric widths, both scaling medians) stays well under the
    limit — so the suite can keep growing without re-breaking the parse."""
    import json
    import re
    from pathlib import Path

    src = (Path(__file__).resolve().parents[1] / "bench.py").read_text()
    names = re.findall(r'^\s+\("([a-z0-9_]+)", ', src, re.M)
    assert len(names) > 50  # the timed suite, parsed from source
    longest5 = sorted(names, key=len, reverse=True)[:5]
    line = json.dumps(
        {
            "metric": "end-to-end feature pipeline wall (pages: asof+LOCF+lag+"
            "rolling+sessionize) + operator suite",
            "value": 99999.999,
            "unit": "sec",
            "sf": "0.001",
            "num_cpus": 32,
            "headline_rows": 1_800_027_000,
            "docs_per_s": 99999999.9,
            "fault_probe_gbps": 10.25,
            "suite_sec": 99999.999,
            "suite_n": len(names) + 1,
            "slowest5": {n: 99999.999 for n in longest5},
            "queries_file": "/root/repo/BENCH_QUERIES.json",
            "scaling_4_16": 0.995,
            "scaling_8_32": 0.316,
        }
    )
    assert len(line) < 1500, len(line)


def test_round4_ops_empty_and_single_row_inputs(ray_session, tmp_path):
    """0-row and 1-row corpora flow through every round-4 operator without
    crashing (Dataset.sum returns None on a 0-block input — the dsir/ccnet
    smoothing scalars must guard it) and produce row-conserving output."""
    import pandas as pd
    import pyarrow.parquet as pq

    from audio_feature_extraction_ray.pipelines import bpe, search_dedup, text_analysis

    for label, rows in [("empty", []), ("one", [(0, "hello world the a", "src0")])]:
        d = tmp_path / label
        d.mkdir()
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                    "text": pa.array([r[1] for r in rows], pa.string()),
                    "lang": pa.array(["en"] * len(rows), pa.string()),
                    "source": pa.array([r[2] for r in rows], pa.string()),
                    "n_chars": pa.array([len(r[1]) for r in rows], pa.int64()),
                }
            ),
            d / "documents.parquet",
        )
        pq.write_table(
            pa.table(
                {
                    "vec_id": pa.array([r[0] for r in rows], pa.int64()),
                    "embedding": pa.array([[1.0, 2.0]] * len(rows), pa.list_(pa.float32())),
                    "label": pa.array([0] * len(rows), pa.int32()),
                }
            ),
            d / "embeddings.parquet",
        )
        for name, fn, want in [
            ("dsir", text_analysis.dsir_weights, len(rows)),
            ("ccnet", text_analysis.ccnet_buckets, len(rows)),
            ("gopher", text_analysis.gopher_rules, len(rows)),
            ("quantize", search_dedup.embedding_quantize, 2 * len(rows)),
            ("bpe_encode", bpe.bpe_encode, len(rows)),
        ]:
            r = fn(str(d))
            n = len(r) if isinstance(r, pd.DataFrame) else r.count()
            assert n == want, (label, name, n)
