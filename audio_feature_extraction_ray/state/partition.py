"""Partitioners: url-hash (default) and sampled url-range with hot-range salting.

The ONE wide shuffle of the feature pipeline routes rows to `partition_id`
(SURVEY §7.3). Both partitioners guarantee the invariant every downstream
kernel relies on: ALL rows of a url land in exactly ONE partition (salting
splits hot *ranges* by url-hash, never a single url).

Skew story: hash partitioning spreads hot domains across partitions by
construction (key = url, not host). Range partitioning preserves url
locality/order across partitions (useful for sorted output layouts) and
handles hot domains by salting ranges whose sampled share exceeds
`hot_factor` x the median — each salted range becomes `hot_salt`
hash-sub-partitions.
"""

from __future__ import annotations

from dataclasses import dataclass
from zlib import crc32

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.hashing import string_hash_strong


def url_hash64(urls: list[str] | np.ndarray) -> np.ndarray:
    """crc32-pair hash, per-row Python. Kept ONLY for the output-affecting
    split/mask assignments (stages/split_augment) whose DuckDB oracles pin
    this exact arithmetic. All partition ROUTING goes through the vectorized
    `string_hash_strong` (round-2 verdict #1) — routing is key-local so the
    hash family is free to differ."""
    out = np.empty(len(urls), dtype=np.uint64)
    for i, u in enumerate(urls):
        b = u.encode("utf-8")
        out[i] = (np.uint64(crc32(b)) << np.uint64(32)) | np.uint64(crc32(b[::-1]))
    return out


@dataclass
class HashPartitioner:
    num_partitions: int

    def partition_ids(self, urls) -> np.ndarray:
        return (string_hash_strong(urls) % np.uint64(self.num_partitions)).astype(np.int32)


@dataclass
class HostSaltPartitioner:
    """Host-keyed partitioner for the CO-PARTITIONED as-of path (SURVEY §2.5
    J2 large-right-side): pages and signals are routed by the SAME host hash
    so each merge task sees a host's pages together with all of that host's
    signal observations — no broadcast.

    Skew: a hot host (e.g. one domain owning ~50% of rows) would otherwise
    own one giant partition. Hot hosts (detected from a driver-side sample)
    get a dedicated block of `hot_salt` sub-partitions, pages salted by
    url-hash (a url never splits), and the host's SIGNALS REPLICATED into
    every sub-partition — the standard replicated-skew-join trick: correct
    because LOCF only reads the right side, never aggregates it.

    Layout: normal hosts -> hash(host) % num_partitions; hot host i ->
    num_partitions + i*hot_salt + hash(url) % hot_salt. Ids stay dense.
    """

    num_partitions: int
    hot_salt: int
    hot_hosts: tuple[str, ...]  # sorted

    def __post_init__(self):
        self._hot_index = {h: i for i, h in enumerate(self.hot_hosts)}

    @property
    def total_partitions(self) -> int:
        return self.num_partitions + self.hot_salt * len(self.hot_hosts)

    def partition_ids(self, hosts, urls) -> np.ndarray:
        """Vectorized: hosts/urls may be pyarrow string arrays (zero-copy
        buffer hashing) or python lists. Hot-host detection is one Arrow
        `index_in` against the (small) hot set — no per-row dict lookups."""
        if not isinstance(hosts, (pa.Array, pa.ChunkedArray)):
            hosts = pa.array(list(hosts), pa.string())
        out = (string_hash_strong(hosts) % np.uint64(self.num_partitions)).astype(np.int32)
        if self._hot_index:
            hot_idx = (
                pc.index_in(hosts, value_set=pa.array(list(self.hot_hosts), pa.string()))
                .fill_null(-1)
                .to_numpy(zero_copy_only=False)
                .astype(np.int64)
            )
            hot = hot_idx >= 0
            if hot.any():
                if not isinstance(urls, (pa.Array, pa.ChunkedArray)):
                    urls = pa.array(list(urls), pa.string())
                elif isinstance(urls, pa.ChunkedArray):
                    urls = urls.combine_chunks()
                hot_urls = urls.take(pa.array(np.nonzero(hot)[0]))
                salts = string_hash_strong(hot_urls) % np.uint64(self.hot_salt)
                out[hot] = (
                    self.num_partitions + hot_idx[hot] * self.hot_salt + salts.astype(np.int64)
                ).astype(np.int32)
        return out

    def signal_partition_ids(self, host: str) -> list[int]:
        """All partition ids a signal row for `host` must be replicated to."""
        i = self._hot_index.get(host)
        if i is None:
            return [int(string_hash_strong(pa.array([host]))[0] % np.uint64(self.num_partitions))]
        base = self.num_partitions + i * self.hot_salt
        return list(range(base, base + self.hot_salt))

    @classmethod
    def from_sample(
        cls,
        sample_hosts: list[str],
        num_partitions: int,
        hot_salt: int = 4,
        hot_factor: float = 2.0,
    ) -> "HostSaltPartitioner":
        """Hosts whose sample share exceeds hot_factor / num_partitions of the
        sample are hot (they would overfill one partition)."""
        if not sample_hosts:
            return cls(num_partitions, hot_salt, ())
        vals, counts = np.unique(np.asarray(sample_hosts, dtype=object), return_counts=True)
        threshold = hot_factor * len(sample_hosts) / max(1, num_partitions)
        hot = tuple(sorted(str(v) for v, c in zip(vals, counts) if c > threshold))
        return cls(num_partitions, hot_salt, hot)


@dataclass
class RangePartitioner:
    """Range partitioner over url strings with salted hot ranges.

    bounds: sorted url cut points (len = num_ranges - 1); range r holds urls
    in [bounds[r-1], bounds[r]). salts[r] >= 1; partition id layout is the
    cumulative sum of salts so ids stay dense.
    """

    bounds: list[str]
    salts: list[int]

    def __post_init__(self):
        self._offsets = np.concatenate([[0], np.cumsum(self.salts)]).astype(np.int64)

    @property
    def num_partitions(self) -> int:
        return int(self._offsets[-1])

    def partition_ids(self, urls) -> np.ndarray:
        if isinstance(urls, pa.ChunkedArray):
            urls = urls.combine_chunks()
        arrow_in = isinstance(urls, pa.Array)
        u = (
            np.asarray(urls.to_numpy(zero_copy_only=False), dtype=object)
            if arrow_in
            else np.asarray(urls, dtype=object)
        )
        ranges = np.searchsorted(np.asarray(self.bounds, dtype=object), u, side="right")
        out = self._offsets[ranges].astype(np.int32)
        salts = np.asarray(self.salts)[ranges]
        hot = salts > 1
        if hot.any():
            hot_urls = (
                urls.take(pa.array(np.nonzero(hot)[0])) if arrow_in else list(u[hot])
            )
            h = string_hash_strong(hot_urls) % salts[hot].astype(np.uint64)
            out[hot] += h.astype(np.int32)
        return out

    @classmethod
    def from_sample(
        cls,
        sample_urls: list[str],
        num_ranges: int,
        hot_salt: int = 4,
        hot_factor: float = 2.0,
    ) -> "RangePartitioner":
        """Build bounds from a driver-side url sample; ranges holding more
        than hot_factor x the median sample mass get `hot_salt` salts."""
        s = np.sort(np.asarray(sample_urls, dtype=object))
        if s.size == 0 or num_ranges <= 1:
            return cls(bounds=[], salts=[1])
        qs = np.linspace(0, s.size, num_ranges + 1).astype(int)[1:-1]
        bounds: list[str] = []
        for q in qs:
            b = str(s[min(q, s.size - 1)])
            if not bounds or b > bounds[-1]:
                bounds.append(b)
        # measure sample mass per resulting range -> salt the hot ones
        ranges = np.searchsorted(np.asarray(bounds, dtype=object), s, side="right")
        counts = np.bincount(ranges, minlength=len(bounds) + 1)
        med = max(1.0, float(np.median(counts)))
        salts = [hot_salt if c > hot_factor * med else 1 for c in counts]
        return cls(bounds=bounds, salts=salts)
