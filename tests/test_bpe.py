"""Distributed BPE vocabulary learning vs a naive single-process reference."""

from collections import Counter

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from audio_feature_extraction_ray.pipelines.bpe import bpe_train


def _naive_bpe(texts, n_merges):
    wc = Counter()
    for t in texts:
        for w in t.split(" "):
            if w:
                wc[w] += 1
    words = {w: list(w) for w in wc}
    sym_idx = {c: i for i, c in enumerate(sorted(set("".join(wc))))}
    merges = []
    for rank in range(n_merges):
        pc_ = Counter()
        for w, syms in words.items():
            for i in range(len(syms) - 1):
                pc_[(syms[i], syms[i + 1])] += wc[w]
        if not pc_:
            break
        (a, b), c = min(
            pc_.items(), key=lambda kv: (-kv[1], sym_idx[kv[0][0]], sym_idx[kv[0][1]])
        )
        new = a + b
        sym_idx[new] = len(sym_idx)
        merges.append((rank, a, b, new, c))
        for w, syms in words.items():
            i, out = 0, []
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(new)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[w] = out
    return pd.DataFrame(merges, columns=["rank", "left", "right", "token", "pair_count"])


def test_bpe_matches_naive_on_fixture(ray_session):
    sf = "/root/testdata/sf0.001"
    texts = pq.read_table(f"{sf}/documents.parquet", columns=["text"]).to_pandas()["text"]
    out = bpe_train(sf, 8)
    ref = _naive_bpe(texts, 8)
    pd.testing.assert_frame_equal(out, ref)


def test_bpe_overlapping_pairs(ray_session, tmp_path):
    """The 'aaa' case: pair (a,a) merges left-to-right non-overlapping."""
    texts = ["aaa aaaa baa", "aaa aaa zz"]
    t = pa.table(
        {
            "doc_id": pa.array([0, 1], pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(["en", "en"]),
            "source": pa.array(["s", "s"]),
            "n_chars": pa.array([len(x) for x in texts], pa.int64()),
        }
    )
    pq.write_table(t, tmp_path / "documents.parquet")
    out = bpe_train(str(tmp_path), 3)
    ref = _naive_bpe(texts, 3)
    pd.testing.assert_frame_equal(out, ref)
    assert out.loc[0, "token"] == "aa"
    # "aaa" contributes exactly ONE (a,a) merge position pair-count-wise:
    # naive count of (a,a) in "aaa"=2 occurrences -> pair_count counts
    # adjacencies (overlap allowed) but application is non-overlapping
    assert out.loc[0, "pair_count"] == ref.loc[0, "pair_count"]


def _naive_bpe_words(texts, n_merges):
    """Same algorithm as _naive_bpe but returns the final word -> symbol
    list mapping (the encoder view)."""
    wc = Counter()
    for t in texts:
        for w in t.split(" "):
            if w:
                wc[w] += 1
    words = {w: list(w) for w in wc}
    sym_idx = {c: i for i, c in enumerate(sorted(set("".join(wc))))}
    for _rank in range(n_merges):
        pc_ = Counter()
        for w, syms in words.items():
            for i in range(len(syms) - 1):
                pc_[(syms[i], syms[i + 1])] += wc[w]
        if not pc_:
            break
        (a, b), _c = min(
            pc_.items(), key=lambda kv: (-kv[1], sym_idx[kv[0][0]], sym_idx[kv[0][1]])
        )
        new = a + b
        sym_idx[new] = len(sym_idx)
        for w, syms in words.items():
            i, out = 0, []
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(new)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[w] = out
    return words


def test_bpe_encode_matches_naive(ray_session):
    """Corpus-scale tokenizer APPLICATION: per-doc BPE token counts under
    the learned merges equal a naive single-process encoder's, for every
    document at sf0.001."""
    from audio_feature_extraction_ray.pipelines.bpe import bpe_encode

    sf = "/root/testdata/sf0.001"
    df = pq.read_table(f"{sf}/documents.parquet", columns=["doc_id", "text"]).to_pandas()
    got = bpe_encode(sf, 8).to_pandas().set_index("doc_id").sort_index()
    words = _naive_bpe_words(df["text"], 8)
    for did, text in zip(df["doc_id"], df["text"]):
        toks = text.split(" ")
        want = sum(len(words.get(w, [])) for w in toks)
        assert int(got.loc[did, "n_bpe_tokens"]) == want, did
        assert int(got.loc[did, "n_words"]) == len(toks)


def test_bpe_encode_overlapping_runs(ray_session, tmp_path):
    """The 'aaaa' parity case survives the encode path: with merge (a,a),
    'aaaa' encodes to 2 tokens, 'aaa' to 2 (merged pair + lone a)."""
    from audio_feature_extraction_ray.pipelines.bpe import bpe_encode

    t = pa.table(
        {
            "doc_id": pa.array([0, 1], pa.int64()),
            "text": pa.array(["aaaa aaa", "aa aa aa"], pa.string()),
        }
    )
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(t, d / "documents.parquet")
    got = bpe_encode(str(d), 1).to_pandas().set_index("doc_id")
    # merge (a,a): aaaa -> [aa,aa]=2, aaa -> [aa,a]=2; aa -> 1 each
    assert int(got.loc[0, "n_bpe_tokens"]) == 4
    assert int(got.loc[1, "n_bpe_tokens"]) == 3

def test_bpe_encode_empty_tokens(ray_session, tmp_path):
    """Zero-length dictionary words (empty docs, double/leading spaces) must
    not corrupt the flat-buffer merge kernel. With '' as the batch's FIRST
    dictionary word, the unfixed boundary mask wrapped (hit[offs[1]-1] ==
    hit[-1]) and blocked the last word's final merge — 'aab' under merge
    (a,b) came out as 3 symbols instead of 2."""
    from audio_feature_extraction_ray.pipelines.bpe import bpe_encode

    # word counts: ab=3, aab=2 -> pair (a,b)=5 beats (a,a)=2 -> merge 1=(a,b)
    texts = ["", " ab  aab", "ab ab aab"]
    t = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(t, d / "documents.parquet")
    got = bpe_encode(str(d), 1).to_pandas().set_index("doc_id")
    # '' -> 0 tokens; 'ab' -> [ab] = 1; 'aab' -> [a, ab] = 2
    assert int(got.loc[0, "n_words"]) == 1 and int(got.loc[0, "n_bpe_tokens"]) == 0
    assert int(got.loc[1, "n_words"]) == 4 and int(got.loc[1, "n_bpe_tokens"]) == 3
    assert int(got.loc[2, "n_words"]) == 3 and int(got.loc[2, "n_bpe_tokens"]) == 4
