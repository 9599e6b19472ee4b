from .text import (
    extract_text,
    extract_text_arrow,
    tokenize,
    token_count,
    char_count,
    ngram_bucket_hist,
    token_hashes,
    jaccard,
    fingerprint64,
    langid,
    quality_score,
)
from .hashing import hash64_bytes, minhash_signature, simhash64

__all__ = [
    "extract_text",
    "extract_text_arrow",
    "tokenize",
    "token_count",
    "char_count",
    "ngram_bucket_hist",
    "token_hashes",
    "jaccard",
    "fingerprint64",
    "langid",
    "quality_score",
    "hash64_bytes",
    "minhash_signature",
    "simhash64",
]
