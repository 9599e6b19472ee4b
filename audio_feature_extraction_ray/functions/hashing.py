"""Stable hashing primitives: 64-bit FNV-1a, MinHash signatures, SimHash.

All deterministic across processes (no PYTHONHASHSEED dependence). Vectorized
numpy where the shape allows. Used by the dedup family
(exact / MinHash-LSH / SimHash / n-gram Jaccard) and the partitioners.
"""

from __future__ import annotations

from zlib import crc32

import numpy as np

_FNV_OFFSET = np.uint64(0xCBF29CE484222325)
_FNV_PRIME = np.uint64(0x100000001B3)


def hash64_bytes(data: bytes) -> int:
    """FNV-1a 64-bit over bytes. Scalar loop in C-speed numpy chunks is not
    worth it for short keys; this is used for keys (urls), not documents."""
    h = 0xCBF29CE484222325
    for byte in data:
        h = ((h ^ byte) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h


def hash64_str_array(arr: np.ndarray) -> np.ndarray:
    """Vector of stable 64-bit hashes for an object/str array.

    crc32 of the utf-8 bytes, widened by a second crc32 of the reversed bytes
    so collisions on 32 bits don't collapse partitioning keys.
    """
    out = np.empty(arr.size, dtype=np.uint64)
    for i, s in enumerate(arr):
        b = s.encode("utf-8") if isinstance(s, str) else bytes(s)
        out[i] = (crc32(b) << np.uint64(32)) | np.uint64(crc32(b[::-1]))
    return out


# --------------------------------------------------------------------------
# MinHash over word-shingle crc32 hashes. k permutations h_i(x) = (a_i*x + b_i)
# mod p, p = 2^61-1 (Mersenne). a_i, b_i from a seeded RNG -> deterministic.

_MERSENNE = np.uint64((1 << 61) - 1)
_MAX32 = np.uint64(0xFFFFFFFF)


def _perm_params(num_perm: int, seed: int = 1) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, int(_MERSENNE), size=num_perm, dtype=np.uint64)
    b = rng.integers(0, int(_MERSENNE), size=num_perm, dtype=np.uint64)
    return a, b


_PERM_CACHE: dict[tuple[int, int], tuple[np.ndarray, np.ndarray]] = {}


def shingle_hashes(text: str, width: int = 3) -> np.ndarray:
    """crc32 hashes of word w-shingles (space-joined), unique, uint64."""
    toks = text.split()
    if len(toks) < width:
        sh = [" ".join(toks)] if toks else []
    else:
        sh = [" ".join(toks[i : i + width]) for i in range(len(toks) - width + 1)]
    if not sh:
        return np.empty(0, dtype=np.uint64)
    return np.unique(np.fromiter((crc32(s.encode("utf-8")) for s in sh), dtype=np.uint64, count=len(sh)))


def minhash_signature(shingles: np.ndarray, num_perm: int = 64, seed: int = 1) -> np.ndarray:
    """MinHash signature (uint64[num_perm]); all-_MERSENNE sentinel if empty."""
    key = (num_perm, seed)
    if key not in _PERM_CACHE:
        _PERM_CACHE[key] = _perm_params(num_perm, seed)
    a, b = _PERM_CACHE[key]
    if shingles.size == 0:
        return np.full(num_perm, _MERSENNE, dtype=np.uint64)
    with np.errstate(over="ignore"):
        # (num_perm, n) — modular mult in uint64 wraps, but p=2^61-1 keeps
        # a*x < 2^93; emulate 128-bit mod via Python ints only if needed.
        # Use float-free exact path: compute in object space is slow; instead
        # rely on (a*x) mod 2^64 being a valid universal-enough hash family
        # for dedup purposes, then mod p. Deterministic either way.
        m = (a[:, None] * shingles[None, :] + b[:, None]) % _MERSENNE
    return m.min(axis=1).astype(np.uint64)


def minhash_bands(sig: np.ndarray, bands: int = 16) -> list[int]:
    """Split a signature into `bands` rows-per-band groups; crc32 each band.
    Returns band-hash ints (band index folded in so buckets don't cross bands)."""
    r = sig.size // bands
    out = []
    for i in range(bands):
        band = sig[i * r : (i + 1) * r]
        out.append((i << 32) | crc32(band.tobytes()))
    return out


# --------------------------------------------------------------------------
# SimHash (64-bit) over token crc32 hashes, unweighted.

_BITS = np.uint64(1) << np.arange(64, dtype=np.uint64)


def simhash64(tok_hashes: np.ndarray) -> int:
    """64-bit SimHash of a set of 32-bit token hashes (widened via FNV mix)."""
    if tok_hashes.size == 0:
        return 0
    h = tok_hashes.astype(np.uint64)
    with np.errstate(over="ignore"):
        h = (h ^ _FNV_OFFSET) * _FNV_PRIME  # widen to 64 bits deterministically
    bits = (h[:, None] & _BITS[None, :]) != 0  # (n, 64)
    votes = bits.sum(axis=0) * 2 - h.size  # positive -> bit set
    return int(_BITS[votes > 0].sum(dtype=np.uint64))


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")
