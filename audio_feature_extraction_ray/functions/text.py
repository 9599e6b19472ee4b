"""Deterministic, pure text functions shared by the engine and the oracle.

These are the leaf kernels of the webtext recast of the reference's feature
extractors (reference spec: STFT/mel/chroma per-window extraction,
``/root/reference/.kiro/specs/audio-feature-extraction/design.md:525-628`` and
``tasks.md:713-735``). They must be byte-/bit-stable across workers, processes
and runs — the north rule's per-row invariant is *byte-identical extracted text
per url* and *allclose feature vectors* vs the single-process oracle.

Two implementations of ``extract_text`` exist: a scalar Python one (oracle,
tests) and a vectorized Arrow one (`extract_text_arrow`, used inside
``map_batches(batch_format="pyarrow")``). They are REQUIRED to agree
byte-for-byte; ``tests/test_text.py`` pins that.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# --------------------------------------------------------------------------
# extract_text: html -> text. Tag strip -> entity unescape -> ws normalize.
# Entities handled (in this order; && last so "&amp;lt;" -> "&lt;" literal):
_ENTITIES = [("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'), ("&#39;", "'"), ("&amp;", "&")]
# Non-text block strip: ONE alternation pass (deliberate simplification: the
# span ends at the FIRST closing head/script/style tag — nested cases resolve
# identically in the scalar and Arrow implementations, which is the contract;
# leftover close tags are removed by the tag pass).
_BLOCK_RE_STR = r"(?is)<(?:head|script|style)[^>]*>.*?</(?:head|script|style)\s*>"
_BLOCK_RE = re.compile(_BLOCK_RE_STR)
_TAG_RE = re.compile(r"<[^>]*>")
_WS_RE = re.compile(r"[ \t\r\n\f\v]+")


def extract_text(html: bytes | str) -> str:
    """Scalar reference implementation. Deterministic pure function."""
    s = html.decode("utf-8") if isinstance(html, (bytes, bytearray)) else html
    s = _BLOCK_RE.sub(" ", s)
    s = _TAG_RE.sub(" ", s)
    for ent, ch in _ENTITIES:
        s = s.replace(ent, ch)
    return _WS_RE.sub(" ", s).strip()


_WS_TABLE = np.zeros(256, dtype=bool)
for _c in b" \t\r\n\f\v":
    _WS_TABLE[_c] = True


def _ws_collapse_batch(arr: pa.Array) -> pa.Array:
    """Collapse runs of ASCII whitespace to one space — single numpy pass
    over the Arrow byte buffer (the RE2 equivalent runs ~140 MB/s here; this
    runs at memory speed). Leading/trailing spaces are left for utf8_trim.
    Byte-identical to re.sub('[ \\t\\r\\n\\f\\v]+', ' ', s) per row."""
    n = len(arr)
    if n == 0:
        return arr
    off_dtype = np.int64 if pa.types.is_large_string(arr.type) else np.int32
    off = np.frombuffer(arr.buffers()[1], dtype=off_dtype)[arr.offset : arr.offset + n + 1].astype(
        np.int64
    )
    g0, g1 = int(off[0]), int(off[-1])
    data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)[g0:g1]
    ws = _WS_TABLE[data]
    prev_ws = np.zeros_like(ws)
    prev_ws[1:] = ws[:-1]
    prev_ws[off[:-1] - g0] = False  # a run never continues across a row start
    keep = ~(ws & prev_ws)
    out_bytes = np.where(ws, np.uint8(32), data)[keep]
    kept_cum = np.concatenate([[0], np.cumsum(keep, dtype=np.int64)])
    new_off = kept_cum[off - g0]
    data_buf = pa.py_buffer(out_bytes)  # zero-copy view; buffer holds a ref
    if new_off[-1] < 2**31:
        return pa.StringArray.from_buffers(
            n, pa.py_buffer(new_off.astype(np.int32)), data_buf
        )
    return pa.LargeStringArray.from_buffers(n, pa.py_buffer(new_off), data_buf)


def extract_text_arrow(col: pa.ChunkedArray | pa.Array) -> pa.Array | pa.ChunkedArray:
    """Vectorized Arrow implementation (re2 kernels + a numpy whitespace
    collapse); byte-identical to :func:`extract_text` for valid UTF-8 input."""
    s = col
    if pa.types.is_binary(s.type) or pa.types.is_large_binary(s.type):
        s = pc.cast(s, pa.string())
    s = pc.replace_substring_regex(s, pattern=_BLOCK_RE_STR, replacement=" ")
    s = pc.replace_substring_regex(s, pattern="<[^>]*>", replacement=" ")
    for ent, ch in _ENTITIES:
        s = pc.replace_substring(s, pattern=ent, replacement=ch)
    if isinstance(s, pa.ChunkedArray):
        s = s.combine_chunks()
    s = _ws_collapse_batch(s)
    return pc.utf8_trim(s, " ")


# --------------------------------------------------------------------------
# tokenization: split on whitespace runs, drop empties. (The "BPE-ish" token
# counter for quality metrics lives in quality_score/_WORD_RE.)

def tokenize(text: str) -> list[str]:
    return text.split()


def token_count(text: str) -> int:
    return len(text.split())


def char_count(text: str) -> int:
    return len(text)


# --------------------------------------------------------------------------
# byte-trigram bucket histogram — the webtext analog of the reference's
# fixed-width per-window spectral vector (n_freq_bins invariant,
# design.md:173-204): a B-bucket normalized histogram of hashed byte 3-grams.

_P1 = np.uint64(0x100000001B3)  # FNV prime
_P2 = np.uint64(0x1000193)


def ngram_bucket_hist(text: str, buckets: int = 8) -> np.ndarray:
    """Normalized (sums to 1.0, or all zeros for <3 bytes) byte-trigram
    histogram over `buckets` buckets. float64, vectorized numpy."""
    b = np.frombuffer(text.encode("utf-8"), dtype=np.uint8).astype(np.uint64)
    out = np.zeros(buckets, dtype=np.float64)
    if b.size < 3:
        return out
    with np.errstate(over="ignore"):
        h = b[:-2] * _P1 + b[1:-1] * _P2 + b[2:]
    ids = (h % np.uint64(buckets)).astype(np.int64)
    counts = np.bincount(ids, minlength=buckets).astype(np.float64)
    return counts / counts.sum()


# --------------------------------------------------------------------------
# 64-bit token hash (for churn): polynomial hash of the first 16 utf-8 bytes
# plus full-byte-length mixing, mod 2^64. Chosen because it vectorizes over
# Arrow buffers with bounded scratch (see state/kernels._token_hashes64_batch,
# which MUST agree with this scalar definition bit-for-bit).

_TOK_K = 16
_TOK_BASE = np.uint64(1099511628211)
with np.errstate(over="ignore"):
    _TOK_W = np.empty(_TOK_K, dtype=np.uint64)
    _TOK_W[0] = _TOK_BASE
    for _j in range(1, _TOK_K):
        _TOK_W[_j] = _TOK_W[_j - 1] * _TOK_BASE
_TOK_LMIX = np.uint64(0x9E3779B97F4A7C15)


def token_hashes64(text: str) -> np.ndarray:
    """Unique sorted uint64 hashes of the whitespace tokens (scalar ref)."""
    toks = text.split()
    if not toks:
        return np.empty(0, dtype=np.uint64)
    out = np.empty(len(toks), dtype=np.uint64)
    with np.errstate(over="ignore"):
        for i, t in enumerate(toks):
            b = np.frombuffer(t.encode("utf-8"), dtype=np.uint8)
            L = b.size
            h = np.uint64(L) * _TOK_LMIX
            h = h + (b[:_TOK_K].astype(np.uint64) * _TOK_W[: min(L, _TOK_K)]).sum(dtype=np.uint64)
            out[i] = h
    return np.unique(out)


# --------------------------------------------------------------------------
# token hash sets (for shingles / simhash): crc32 of token bytes.

def token_hashes(text: str) -> np.ndarray:
    """Unique sorted uint32 crc32 hashes of the whitespace tokens."""
    from zlib import crc32

    toks = text.split()
    if not toks:
        return np.empty(0, dtype=np.uint32)
    return np.unique(np.fromiter((crc32(t.encode("utf-8")) for t in toks), dtype=np.uint32, count=len(toks)))


def jaccard(a: np.ndarray, b: np.ndarray) -> float:
    """Jaccard similarity of two unique-sorted hash arrays; 1.0 if both empty."""
    if a.size == 0 and b.size == 0:
        return 1.0
    inter = np.intersect1d(a, b, assume_unique=True).size
    union = a.size + b.size - inter
    return inter / union


# --------------------------------------------------------------------------
# document fingerprint: 64-bit polynomial rolling hash of the utf-8 bytes
# (Karp–Rabin, base 1099511628211, wraparound mod 2^64). Deterministic;
# vectorized via uint64 power series.

_BASE = np.uint64(1099511628211)


def fingerprint64(text: str) -> int:
    b = np.frombuffer(text.encode("utf-8"), dtype=np.uint8).astype(np.uint64)
    if b.size == 0:
        return 0
    with np.errstate(over="ignore"):
        pows = np.empty(b.size, dtype=np.uint64)
        pows[0] = np.uint64(1)
        if b.size > 1:
            np.multiply.accumulate(np.full(b.size - 1, _BASE, dtype=np.uint64), out=pows[1:])
        return int((b * pows[::-1]).sum(dtype=np.uint64))


# --------------------------------------------------------------------------
# language-ID heuristic: script detection (CJK) + stopword voting.
# Deliberately simple n-gram/stopword heuristic (no model, no network).

_STOPWORDS: dict[str, frozenset[str]] = {
    "en": frozenset("the a of and to in is that it for on with as was at by".split()),
    "de": frozenset("der die das und ist nicht ein eine zu mit von auf für den".split()),
    "fr": frozenset("le la les et de des un une est pour dans que qui sur au".split()),
    "es": frozenset("el la los las y de un una es en que por para con del".split()),
}
_LANG_ORDER = ["en", "de", "fr", "es"]  # deterministic tie-break: first wins


def langid(text: str) -> str:
    """Heuristic language id: 'zh' if >30% CJK chars, else stopword vote
    (ties broken by _LANG_ORDER), 'und' if no evidence."""
    if not text:
        return "und"
    cjk = sum(1 for c in text if "一" <= c <= "鿿" or "぀" <= c <= "ヿ")
    if cjk / len(text) > 0.30:
        return "zh"
    toks = text.lower().split()
    if not toks:
        return "und"
    best, best_score = "und", 0
    for lang in _LANG_ORDER:
        score = sum(1 for t in toks if t in _STOPWORDS[lang])
        if score > best_score:
            best, best_score = lang, score
    return best


# --------------------------------------------------------------------------
# quality score: deterministic arithmetic over simple ratios, mirrors the SQL
# oracle in __ray_entry__.oracle_sql()["doc_quality"]. Range [0, 1].

_PUNCT = set(".,;:!?'\"()-")


def quality_score(text: str) -> float:
    n = len(text)
    if n == 0:
        return 0.0
    toks = text.split()
    ntok = len(toks)
    if ntok == 0:
        return 0.0
    mean_tok_len = sum(len(t) for t in toks) / ntok
    punct_ratio = sum(1 for c in text if c in _PUNCT) / n
    stop_ratio = sum(1 for t in toks if t.lower() in _STOPWORDS["en"]) / ntok
    len_score = min(ntok, 256) / 256.0
    wl_score = max(0.0, 1.0 - abs(mean_tok_len - 5.0) / 5.0)
    return round(0.4 * len_score + 0.3 * wl_score + 0.2 * stop_ratio + 0.1 * (1.0 - min(punct_ratio * 4.0, 1.0)), 6)
