"""Unit tests for the deterministic text leaf functions (engine/oracle contract).

Mirrors the reference's spec'd unit strategy (deterministic synthetic inputs,
shape/dtype pinning — design.md:2266-2294) recast to webtext.
"""

import numpy as np
import pyarrow as pa

from audio_feature_extraction_ray.functions.text import (
    char_count,
    extract_text,
    extract_text_arrow,
    fingerprint64,
    jaccard,
    langid,
    ngram_bucket_hist,
    quality_score,
    token_count,
    token_hashes,
)


def test_extract_text_basic():
    html = b"<html><head><title>T</title></head><body><p>hello   world</p></body></html>"
    assert extract_text(html) == "hello world"


def test_extract_text_entities_and_blocks():
    html = (
        b"<html><head><style>p { x: 1 }</style></head>"
        b"<body><script>if (1 &lt; 2) {}</script>"
        b"<p>a &amp;&amp; b &lt;tag&gt; &quot;q&quot; &#39;s&#39;</p></body></html>"
    )
    assert extract_text(html) == 'a && b <tag> "q" \'s\''


def test_extract_text_arrow_matches_scalar(small_fixture):
    pages, _ = small_fixture
    scalar = [extract_text(h) for h in pages["html"].to_pylist()]
    vector = extract_text_arrow(pages["html"]).to_pylist()
    assert scalar == vector


def test_extract_text_byte_identity_invariant(small_fixture):
    """north-rule per-row invariant: extract_text(html) == stored text, bytes."""
    pages, _ = small_fixture
    out = extract_text_arrow(pages["html"]).to_pylist()
    assert out == pages["text"].to_pylist()


def test_token_char_counts():
    assert token_count("") == 0
    assert token_count("a b c") == 3
    assert char_count("héllo") == 5


def test_ngram_hist_deterministic_and_normalized():
    h1 = ngram_bucket_hist("hello world this is text", 8)
    h2 = ngram_bucket_hist("hello world this is text", 8)
    np.testing.assert_array_equal(h1, h2)
    assert abs(h1.sum() - 1.0) < 1e-12
    assert (ngram_bucket_hist("ab", 8) == 0).all()  # < 3 bytes -> zeros


def test_token_hashes_and_jaccard():
    a = token_hashes("a b c d")
    b = token_hashes("c d e f")
    assert jaccard(a, a) == 1.0
    assert abs(jaccard(a, b) - 2 / 6) < 1e-12
    assert jaccard(np.empty(0, np.uint32), np.empty(0, np.uint32)) == 1.0


def test_fingerprint_stable():
    assert fingerprint64("hello") == fingerprint64("hello")
    assert fingerprint64("hello") != fingerprint64("hellp")
    assert fingerprint64("") == 0


def test_langid():
    assert langid("the cat sat on the mat and it was a hat") == "en"
    assert langid("der hund und die katze ist nicht ein") == "de"
    assert langid("这是一个中文句子而且很长") == "zh"
    assert langid("") == "und"


def test_quality_score_bounds(small_fixture):
    pages, _ = small_fixture
    for t in pages["text"].to_pylist()[:100]:
        q = quality_score(t)
        assert 0.0 <= q <= 1.0
    assert quality_score("") == 0.0


def test_ngram_hist_batch_matches_scalar(small_fixture):
    from audio_feature_extraction_ray.stages.text_stage import ngram_hist_batch

    pages, _ = small_fixture
    texts = pages["text"].to_pylist()[:500]
    col = pa.array(texts, pa.string())
    batch = ngram_hist_batch(col, 8)
    for i in (0, 1, 5, 100, 499):
        np.testing.assert_allclose(batch[i], ngram_bucket_hist(texts[i], 8))
    # sliced array (non-zero offset) must still be correct
    sl = col.slice(100, 50)
    batch_sl = ngram_hist_batch(sl, 8)
    np.testing.assert_allclose(batch_sl[0], ngram_bucket_hist(texts[100], 8))


def test_minhash_batch_matches_scalar():
    """Vectorized minhash signatures == scalar twin, bit-for-bit, incl. edge
    rows (empty, <3 tokens, duplicate tokens, multiple spaces)."""
    import pyarrow as pa

    from audio_feature_extraction_ray.functions.hashing import (
        minhash_signature_tokens,
        minhash_signatures_batch,
    )

    texts = ["", "a", "a b", "a b c d e", "dup dup dup", "x  y   z", "w " * 400]
    batch = minhash_signatures_batch(pa.array(texts, pa.string()), num_perm=32)
    for i, t in enumerate(texts):
        np.testing.assert_array_equal(batch[i], minhash_signature_tokens(t, num_perm=32))


def test_simhash_batch_matches_scalar():
    import pyarrow as pa

    from audio_feature_extraction_ray.stages.dedup import (
        simhash64_tokens,
        simhash_signatures_batch,
    )

    texts = ["", "a", "a b c", "dup dup dup x", "the quick brown fox", "z " * 300]
    batch = simhash_signatures_batch(pa.array(texts, pa.string()))
    for i, t in enumerate(texts):
        assert int(batch[i]) == simhash64_tokens(t)
    assert int(batch[0]) == 0  # empty -> 0
    # identical texts -> identical signatures; near-identical -> small hamming
    a = simhash_signatures_batch(pa.array(["w1 w2 w3 w4 w5 w6 w7 w8"] * 2, pa.string()))
    assert a[0] == a[1]
