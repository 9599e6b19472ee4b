"""Deterministic synthetic `pages` + `signals` fixtures (FIXTURES.md).

The reference ships no test data; its spec'd tests synthesize deterministic
inputs (sine waves, design.md:2266-2294). We synthesize deterministic web
pages: seeded token text with controlled churn between revisits, strictly
increasing per-url timestamps with session-gap structure, a hot domain owning
~50% of rows (skew fixture), ~1% exact duplicate (url, warc_ts) re-fetches,
and html built so that functions.text.extract_text(html) == text BYTE-IDENTICALLY.

Everything derives from numpy.random.default_rng(seed); no external data.
"""

from __future__ import annotations

import os
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

PAGES_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]
)

SIGNALS_SCHEMA = pa.schema(
    [
        ("host", pa.string()),
        ("ts", pa.timestamp("us")),
        ("rank", pa.float64()),
        ("fetch_ok", pa.int32()),
    ]
)

_VOCAB = np.array(
    "the a of and to in is data web page crawl index search link site news article text "
    "feature engine ray arrow batch stream window join merge sort hash shuffle spill "
    "token lang model train eval score rank fetch html parse clean dedup shard".split()
)
_LANGS = np.array(["en", "de", "fr", "es", "ja"])
_EPOCH_2024_US = np.int64(1704067200) * 1_000_000  # 2024-01-01T00:00:00Z in µs

HOT_HOST = "hot.example.com"


def _escape(text: str) -> str:
    # inverse of functions.text entity unescape (amp first on escape side)
    return (
        text.replace("&", "&amp;")
        .replace("<", "&lt;")
        .replace(">", "&gt;")
        .replace('"', "&quot;")
        .replace("'", "&#39;")
    )


def _make_html(text: str, title: str) -> bytes:
    body = _escape(text)
    return (
        f"<html><head><title>{_escape(title)}</title>"
        f"<style>body {{ margin: 0; }}</style></head>\n"
        f'<body><div class="nav"></div>\n<p>{body}</p>\n'
        f"<script>var x = 1 &lt; 2;</script></body></html>"
    ).encode("utf-8")


def generate_pages(
    target_rows: int,
    seed: int = 42,
    session_gap_s: float = 7 * 86400.0,
    n_hosts: int = 20,
) -> tuple[pa.Table, pa.Table]:
    """Return (pages, signals) Arrow tables, ~target_rows rows in pages."""
    rng = np.random.default_rng(seed)
    hosts = [HOT_HOST] + [f"site{i}.example.org" for i in range(1, n_hosts)]

    urls: list[str] = []
    url_host: list[str] = []
    revisits: list[int] = []
    total = 0
    u = 0
    while total < target_rows:
        n_rev = 1 if u == 0 else int(min(50, rng.zipf(1.6)))  # long tail 1..50
        host = HOT_HOST if (u >= 3 and rng.random() < 0.5) else hosts[int(rng.integers(0, n_hosts))]
        urls.append(f"https://{host}/p/{u:06d}")
        url_host.append(host)
        revisits.append(n_rev)
        total += n_rev
        u += 1

    col_url: list[str] = []
    col_ts = np.empty(total, dtype=np.int64)
    col_text: list[str] = []
    col_lang: list[str] = []
    pos = 0
    gap_us = np.int64(session_gap_s * 1e6)
    for ui, (url, n_rev) in enumerate(zip(urls, revisits)):
        # timestamps: start anywhere in 2024; gaps mixture incl. exact-threshold
        start = _EPOCH_2024_US + np.int64(rng.integers(0, 365 * 86400)) * 1_000_000
        draws = rng.random(n_rev - 1) if n_rev > 1 else np.empty(0)
        gaps = np.empty(n_rev - 1, dtype=np.int64)
        for gi, d in enumerate(draws):
            if d < 0.60:  # short, same session
                gaps[gi] = np.int64(rng.integers(60, int(session_gap_s)) ) * 1_000_000
            elif d < 0.95:  # long, new session
                gaps[gi] = np.int64(rng.integers(int(session_gap_s) + 1, int(session_gap_s * 5))) * 1_000_000
            else:  # exactly the threshold -> same session ("strictly greater" rule)
                gaps[gi] = gap_us
        ts = start + np.concatenate([[np.int64(0)], np.cumsum(gaps)]) if n_rev > 1 else np.array([start])
        # language: mostly constant, occasional flip
        lang = str(_LANGS[int(rng.integers(0, len(_LANGS)))])
        # text chain with controlled churn
        if ui == 1:
            toks = np.empty(0, dtype=_VOCAB.dtype)  # edge: empty text url
        else:
            toks = rng.choice(_VOCAB, size=int(rng.integers(10, 80)))
        for r in range(n_rev):
            if r > 0:
                d = rng.random()
                if d < 0.30:
                    pass  # identical revisit
                elif d < 0.80 and toks.size > 0:  # ~20% token replacement
                    idx = rng.random(toks.size) < 0.2
                    repl = rng.choice(_VOCAB, size=int(idx.sum()))
                    toks = toks.copy()
                    toks[idx] = repl
                else:  # full rewrite
                    toks = rng.choice(_VOCAB, size=int(rng.integers(10, 80)))
                if rng.random() < 0.05:
                    lang = str(_LANGS[int(rng.integers(0, len(_LANGS)))])
            col_url.append(url)
            col_ts[pos] = ts[r]
            col_text.append(" ".join(toks.tolist()))
            col_lang.append(lang)
            pos += 1

    # ~1% exact duplicate (url, warc_ts) re-fetch rows (dedup-keep-first path)
    n_dup = max(1, total // 100)
    dup_idx = rng.integers(0, total, size=n_dup)
    col_url += [col_url[i] for i in dup_idx]
    col_text += [col_text[i] for i in dup_idx]
    col_lang += [col_lang[i] for i in dup_idx]
    col_ts = np.concatenate([col_ts, col_ts[dup_idx]])

    col_html = [_make_html(t, u.rsplit("/", 1)[-1]) for t, u in zip(col_text, col_url)]
    pages = pa.table(
        {
            "url": pa.array(col_url, pa.string()),
            "warc_ts": pa.array(col_ts, pa.timestamp("us")),
            "html": pa.array(col_html, pa.binary()),
            "text": pa.array(col_text, pa.string()),
            "lang": pa.array(col_lang, pa.string()),
        },
        schema=PAGES_SCHEMA,
    )

    # signals: sparse per-host observations; some exact ties with page ts
    s_host: list[str] = []
    s_ts: list[int] = []
    s_rank: list[float] = []
    s_ok: list[int] = []
    for h in hosts:
        n_obs = int(rng.integers(0, 11))
        for _ in range(n_obs):
            s_host.append(h)
            s_ts.append(int(_EPOCH_2024_US + np.int64(rng.integers(0, 500 * 86400)) * 1_000_000))
            s_rank.append(round(float(rng.random() * 10), 4))
            s_ok.append(int(rng.integers(0, 100)))
    # exact-tie cases: copy a few page timestamps
    for i in rng.integers(0, total, size=5):
        s_host.append(col_url[i].split("/")[2])
        s_ts.append(int(col_ts[i]))
        s_rank.append(round(float(rng.random() * 10), 4))
        s_ok.append(int(rng.integers(0, 100)))
    order = np.lexsort((np.array(s_ts), np.array(s_host)))
    signals = pa.table(
        {
            "host": pa.array([s_host[i] for i in order], pa.string()),
            "ts": pa.array([s_ts[i] for i in order], pa.timestamp("us")),
            "rank": pa.array([s_rank[i] for i in order], pa.float64()),
            "fetch_ok": pa.array([s_ok[i] for i in order], pa.int32()),
        },
        schema=SIGNALS_SCHEMA,
    )
    return pages, signals


def materialize_fixture(
    out_dir: str | Path,
    target_rows: int,
    seed: int = 42,
    n_files: int = 1,
    session_gap_s: float = 7 * 86400.0,
) -> tuple[str, str]:
    """Write pages (n_files parquet shards, row-shuffled so url order is not
    file order) + signals to out_dir if absent. Returns (pages_dir, signals_path).
    Cached: re-uses existing files (deterministic content)."""
    out = Path(out_dir)
    pages_dir = out / "pages"
    signals_path = out / "signals.parquet"
    done_marker = out / "_DONE"
    stamp = f"{target_rows}:{seed}:{n_files}:{session_gap_s}"
    if done_marker.exists() and done_marker.read_text() == stamp:
        return str(pages_dir), str(signals_path)
    import shutil

    shutil.rmtree(out, ignore_errors=True)
    pages, signals = generate_pages(target_rows, seed=seed, session_gap_s=session_gap_s)
    # shuffle rows so ordering never comes for free from the files
    rng = np.random.default_rng(seed + 1)
    perm = rng.permutation(pages.num_rows)
    pages = pages.take(perm)
    pages_dir.mkdir(parents=True, exist_ok=True)
    splits = np.array_split(np.arange(pages.num_rows), n_files)
    for i, idx in enumerate(splits):
        pq.write_table(pages.take(idx), pages_dir / f"part-{i:04d}.parquet")
    pq.write_table(signals, signals_path)
    done_marker.write_text(stamp)
    return str(pages_dir), str(signals_path)


def default_fixture_dir(scale: str) -> str:
    return os.path.join("/tmp/afe_fixtures", scale)


_SCALE_ROWS = {"small": 2_000, "medium": 60_000, "bench": 1_800_000}


def ensure_fixture(scale: str = "small", n_files: int | None = None) -> tuple[str, str]:
    rows = _SCALE_ROWS[scale]
    if n_files is None:
        n_files = {"small": 1, "medium": 4, "bench": 32}[scale]
    return materialize_fixture(default_fixture_dir(scale), rows, n_files=n_files)
