"""Vectorized URL structure features over Arrow string columns.

Webtext pipelines key almost everything on URL structure (host routing in the
flagship pages pipeline, domain-level quality priors, TLD mixes, path-depth
boilerplate heuristics — reference analog: the spec's per-record metadata
extraction, design.md "feature metadata" sections). This module is the ONE
URL parser in the repo: pure `pyarrow.compute` regex kernels (RE2 — the same
engine DuckDB uses, so SQL oracle twins parse identically), zero Python
per-row work, and a single documented contract:

  * scheme    — `^([A-Za-z][A-Za-z0-9+.-]*)://`; row is null (unparseable)
                when this prefix is absent.
  * host      — authority with userinfo and `:port` stripped.
  * tld       — last dot-separated host label; null for single-label hosts
                (and therefore for IPv4 hosts it is the last octet — callers
                that care filter on `is_ip` upstream; the synthetic corpora
                contain no IP hosts).
  * has_www   — host starts with `www.`.
  * path_depth— number of `/` characters in the path component (text between
                authority and `?`/`#`); 0 when the URL has no path.
  * has_query — a `?` appears after the authority.
  * url_len   — total characters.

All outputs are exact (string/int64) — no floats anywhere, so oracle parity
is hash-exact by construction.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

_SCHEME_HOST_RE = r"^(?P<scheme>[A-Za-z][A-Za-z0-9+.\-]*)://(?:[^@/?#]*@)?(?P<host>[^:/?#]+)"
_PATH_RE = r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*(?P<path>/[^?#]*)"
_QUERY_RE = r"^[A-Za-z][A-Za-z0-9+.\-]*://[^?#]*\?"
_TLD_RE = r"\.(?P<tld>[^.]+)$"


def parse_urls(url: pa.Array | pa.ChunkedArray) -> pa.Table:
    """Parse a string column of URLs into the structure-feature table
    (scheme, host, tld, has_www, path_depth, has_query, url_len).

    Unparseable rows (no `scheme://` prefix) yield null scheme/host/tld,
    has_www false, path_depth 0, has_query false — they flow, never raise
    (the quarantine stage owns rejection policy, not the parser).
    """
    if isinstance(url, pa.ChunkedArray):
        url = url.combine_chunks()

    def _field(struct_arr: pa.StructArray, name: str) -> pa.Array:
        # StructArray.field() returns the raw child, which holds garbage
        # ('') where the regex did NOT match — mask by parent validity.
        child = struct_arr.field(name)
        return pc.if_else(pc.is_valid(struct_arr), child, pa.nulls(len(child), child.type))

    sh = pc.extract_regex(url, _SCHEME_HOST_RE)
    scheme = _field(sh, "scheme")
    host = _field(sh, "host")
    tld = _field(pc.extract_regex(host, _TLD_RE), "tld")
    has_www = pc.fill_null(pc.starts_with(host, "www."), False)
    path = _field(pc.extract_regex(url, _PATH_RE), "path")
    path_depth = pc.fill_null(pc.count_substring(path, "/"), 0).cast(pa.int64())
    has_query = pc.match_substring_regex(url, _QUERY_RE)
    return pa.table(
        {
            "scheme": scheme,
            "host": host,
            "tld": tld,
            "has_www": has_www,
            "path_depth": path_depth,
            "has_query": has_query,
            "url_len": pc.utf8_length(url).cast(pa.int64()),
        }
    )
