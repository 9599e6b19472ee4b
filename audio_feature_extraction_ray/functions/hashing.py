"""Stable hashing primitives: 64-bit FNV-1a, MinHash signatures, SimHash.

All deterministic across processes (no PYTHONHASHSEED dependence). Vectorized
numpy where the shape allows. Used by the dedup family
(exact / MinHash-LSH / SimHash / n-gram Jaccard) and the partitioners.
"""

from __future__ import annotations

from zlib import crc32

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .text import _TOK_K, _TOK_LMIX, _TOK_W

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
        out[i] = np.uint64((crc32(b) << 32) | crc32(b[::-1]))
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


# --------------------------------------------------------------------------
# Vectorized MinHash over token-hash shingles (the at-scale path).
#
# Shingle hash = t[i]*S1 + t[i+1]*S2 + t[i+2]  (uint64 wrap), where t[j] are
# the ORDERED 64-bit token hashes of functions.text.token_hashes64's scheme
# (same polynomial family, order preserved, duplicates kept — MinHash is
# min-stable under duplicates). Rows with <3 tokens use 0 for the missing
# positions; empty rows get the all-sentinel signature. The scalar twin
# `minhash_signature_tokens` must agree bit-for-bit (pinned in tests).

_SH1 = np.uint64(0x9E3779B97F4A7C15)
_SH2 = np.uint64(0xC2B2AE3D27D4EB4F)


def _ordered_token_hashes(text: str) -> np.ndarray:
    toks = text.split()
    out = np.empty(len(toks), dtype=np.uint64)
    with np.errstate(over="ignore"):
        for i, t in enumerate(toks):
            b = np.frombuffer(t.encode("utf-8"), dtype=np.uint8)
            L = b.size
            h = np.uint64(L) * _TOK_LMIX
            h = h + (b[:_TOK_K].astype(np.uint64) * _TOK_W[: min(L, _TOK_K)]).sum(dtype=np.uint64)
            out[i] = h
    return out


def shingle_hashes_tokens(text: str, width: int = 3) -> np.ndarray:
    """Scalar reference for the vectorized shingle hashing (uint64, ordered,
    duplicates kept)."""
    t = _ordered_token_hashes(text)
    if t.size == 0:
        return np.empty(0, dtype=np.uint64)
    n_sh = max(t.size - width + 1, 1)
    out = np.empty(n_sh, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for i in range(n_sh):
            a = t[i]
            b = t[i + 1] if i + 1 < t.size else np.uint64(0)
            c = t[i + 2] if i + 2 < t.size else np.uint64(0)
            out[i] = a * _SH1 + b * _SH2 + c
    return out


def minhash_signature_tokens(text: str, num_perm: int = 64, seed: int = 1) -> np.ndarray:
    """Scalar twin of minhash_signatures_batch for one text."""
    return minhash_signature(shingle_hashes_tokens(text), num_perm=num_perm, seed=seed)


_MINHASH_ROW_CHUNK = 512  # cache-resident permutation matrices


def minhash_signatures_batch(
    texts, num_perm: int = 64, seed: int = 1, width: int = 3
) -> np.ndarray:
    """(n, num_perm) uint64 MinHash signatures for a pyarrow string column.

    Fully vectorized: ordered token hashes from the Arrow buffers, shingles
    by uint64 combination (no string joins), permutations applied to the flat
    shingle array in row chunks, per-row min via minimum.reduceat."""
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    n = len(texts)
    key = (num_perm, seed)
    if key not in _PERM_CACHE:
        _PERM_CACHE[key] = _perm_params(num_perm, seed)
    a, b = _PERM_CACHE[key]
    out = np.full((n, num_perm), _MERSENNE, dtype=np.uint64)
    if n == 0:
        return out
    if n > _MINHASH_ROW_CHUNK:
        for i in range(0, n, _MINHASH_ROW_CHUNK):
            out[i : i + _MINHASH_ROW_CHUNK] = minhash_signatures_batch(
                texts.slice(i, _MINHASH_ROW_CHUNK), num_perm, seed, width
            )
        return out

    toks = pc.split_pattern(texts, " ")
    ntok = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
    flat = pc.list_flatten(toks)
    m = len(flat)
    if m == 0:
        return out
    off_dtype = np.int64 if pa.types.is_large_string(flat.type) else np.int32
    off = np.frombuffer(flat.buffers()[1], dtype=off_dtype)[
        flat.offset : flat.offset + m + 1
    ].astype(np.int64)
    data = np.frombuffer(flat.buffers()[2], dtype=np.uint8)
    lens = off[1:] - off[:-1]
    starts = off[:-1]
    th = lens.astype(np.uint64)
    with np.errstate(over="ignore"):
        th *= _TOK_LMIX
        hi = max(data.size - 1, 0)
        for j in range(_TOK_K if data.size else 0):
            idx = np.minimum(starts + j, hi)
            contrib = data[idx].astype(np.uint64)
            contrib *= lens > j
            contrib *= _TOK_W[j]
            th += contrib
    # drop empty tokens (str.split semantics)
    row_of = np.repeat(np.arange(n, dtype=np.int64), ntok)
    keep = lens > 0
    th, row_of = th[keep], row_of[keep]
    tok_counts = np.bincount(row_of, minlength=n)
    t_off = np.concatenate([[0], np.cumsum(tok_counts)]).astype(np.int64)
    # shingles within each row: sh[i] = t[i]*S1 + t[i+1]*S2 + t[i+2]
    total = th.size
    if total == 0:
        return out
    nsh = np.where(tok_counts > 0, np.maximum(tok_counts - width + 1, 1), 0)
    s_off = np.concatenate([[0], np.cumsum(nsh)]).astype(np.int64)
    # global shingle start positions: for row r, t_off[r] .. t_off[r]+nsh[r]-1
    pos = np.arange(int(s_off[-1]), dtype=np.int64)
    row_sh = np.repeat(np.arange(n, dtype=np.int64), nsh)
    rel = pos - s_off[row_sh]
    base = t_off[row_sh] + rel
    t1 = th[base]
    nxt1 = base + 1
    nxt2 = base + 2
    in1 = nxt1 < t_off[row_sh + 1]
    in2 = nxt2 < t_off[row_sh + 1]
    t2 = np.where(in1, th[np.minimum(nxt1, total - 1)], np.uint64(0))
    t3 = np.where(in2, th[np.minimum(nxt2, total - 1)], np.uint64(0))
    with np.errstate(over="ignore"):
        sh = t1 * _SH1 + t2 * _SH2 + t3
        # permutations over the flat shingle array
        perm = (a[:, None] * sh[None, :] + b[:, None]) % _MERSENNE  # (P, S)
    has = nsh > 0
    if has.any():
        # reduceat needs strictly valid starts; restrict to non-empty rows
        starts_nz = s_off[:-1][has]
        mins = np.minimum.reduceat(perm, starts_nz, axis=1)  # (P, n_nonzero)
        out[has] = mins.T.astype(np.uint64)
    return out


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


# --------------------------------------------------------------------------
# vectorized string hashing from Arrow buffers (no per-row Python). Same
# prefix-polynomial family as the minhash token hashes (length mix + first
# _TOK_K bytes), plus a splitmix64 finalizer when uniform bit distribution
# matters (partition routing, HLL registers).

_SM1 = np.uint64(0xBF58476D1CE4E5B9)
_SM2 = np.uint64(0x94D049BB133111EB)


def avalanche64(h: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer — full-width avalanche over a uint64 vector."""
    h = h.astype(np.uint64, copy=True)
    with np.errstate(over="ignore"):
        h ^= h >> np.uint64(30)
        h *= _SM1
        h ^= h >> np.uint64(27)
        h *= _SM2
        h ^= h >> np.uint64(31)
    return h


def _string_buffers(arr) -> tuple[int, np.ndarray, np.ndarray, np.ndarray]:
    """(n, starts, lens, data) int64/uint8 views of a pyarrow string array's
    value buffers. Accepts pa.Array / pa.ChunkedArray / list / numpy object."""
    if not isinstance(arr, (pa.Array, pa.ChunkedArray)):
        arr = pa.array(
            [s if isinstance(s, str) else str(s) for s in arr], pa.string()
        )
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    m = len(arr)
    if m == 0:
        return 0, np.empty(0, np.int64), np.empty(0, np.int64), np.empty(0, np.uint8)
    off_dtype = np.int64 if pa.types.is_large_string(arr.type) else np.int32
    off = np.frombuffer(arr.buffers()[1], dtype=off_dtype)[
        arr.offset : arr.offset + m + 1
    ].astype(np.int64)
    buf = arr.buffers()[2]
    data = np.frombuffer(buf, dtype=np.uint8) if buf is not None else np.empty(0, np.uint8)
    return m, off[:-1], off[1:] - off[:-1], data


# distinct odd-weight families for the suffix / stride byte samples so a byte
# contributing via the prefix never cancels the same byte via the suffix
_SUF_W = avalanche64(np.arange(101, 101 + _TOK_K, dtype=np.uint64)) | np.uint64(1)
_STRIDE_W = avalanche64(np.arange(211, 211 + 7, dtype=np.uint64)) | np.uint64(1)


def string_hash_strong(arr) -> np.ndarray:
    """uint64 hash per string, fully vectorized from the Arrow buffers,
    covering the WHOLE string: length + first 16 bytes + last 16 bytes + a
    7-point stride sample of the interior, splitmix64-avalanched.

    Use this wherever hash quality matters beyond equal-strings-hash-equal:
    partition routing of urls/hosts (long shared prefixes — "https://www."
    — would collapse a prefix-only hash into a handful of partitions) and
    sketch registers (HLL), per round-2 ADVICE on `string_hash_array`'s
    16-byte-prefix collisions. ~39 byte gathers per batch, no per-row Python."""
    n, starts, lens, data = _string_buffers(arr)
    h = lens.astype(np.uint64)
    if n == 0:
        return h
    with np.errstate(over="ignore"):
        h *= _TOK_LMIX
        if data.size:
            hi = data.size - 1
            ends = starts + lens
            for j in range(_TOK_K):
                mask = lens > j
                contrib = data[np.minimum(starts + j, hi)].astype(np.uint64)
                contrib *= mask
                contrib *= _TOK_W[j]
                h += contrib
                sidx = np.clip(ends - 1 - j, 0, hi)
                contrib = data[sidx].astype(np.uint64)
                contrib *= mask
                contrib *= _SUF_W[j]
                h += contrib
            nz = lens > 0
            for k in range(1, 8):
                pos = np.minimum(starts + (lens * k) // 8, hi)
                contrib = data[pos].astype(np.uint64)
                contrib *= nz
                contrib *= _STRIDE_W[k - 1]
                h += contrib
    return avalanche64(h)


def string_hash_array(arr) -> np.ndarray:
    """uint64 hash per element of a pyarrow string array, fully vectorized
    from the value buffers (length-mixed polynomial over the first _TOK_K
    bytes, splitmix64-avalanched). Equal strings always hash equal; strings
    sharing their first _TOK_K bytes AND length collide — fine for partition
    routing and sketches, not for exact identity."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    m = len(arr)
    if m == 0:
        return np.empty(0, dtype=np.uint64)
    off_dtype = np.int64 if pa.types.is_large_string(arr.type) else np.int32
    off = np.frombuffer(arr.buffers()[1], dtype=off_dtype)[
        arr.offset : arr.offset + m + 1
    ].astype(np.int64)
    data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)
    lens = off[1:] - off[:-1]
    starts = off[:-1]
    h = lens.astype(np.uint64)
    with np.errstate(over="ignore"):
        h *= _TOK_LMIX
        hi = max(data.size - 1, 0)
        for j in range(_TOK_K if data.size else 0):
            idx = np.minimum(starts + j, hi)
            contrib = data[idx].astype(np.uint64)
            contrib *= lens > j
            contrib *= _TOK_W[j]
            h += contrib
    return avalanche64(h)
