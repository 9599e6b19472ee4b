"""audio_feature_extraction_ray — a Ray-Data-native point-in-time feature-engineering engine.

From-scratch recast of the spec-only reference ``Cafelat/audio-feature-extraction``
(windowed-frame extraction / stateful streaming / invertibility / lineage ideas,
see ``/root/reference/.kiro/specs/audio-feature-extraction/design.md``) into webtext terms:

- input: Parquet ``pages`` tables ``(url, warc_ts, html, text, lang)``
- sorted-merge as-of join keyed ``(url, warc_ts)`` with leakage-free LOCF backfill
- lag/lead, rolling-window text statistics, gap-based sessionization
- executed as range/hash partition -> per-partition sort -> streaming merge over
  zero-copy Arrow batches, with per-partition lineage + metrics checkpointing.

The package additionally provides the large-scale training-data operators
(dedup families, ANN similarity search, text analysis, multimodal plumbing)
over generic document/event/embedding tables.

IMPORTANT: nothing in this package calls ``ray.init()`` — sessions are owned by
the caller (driver / bench.py / test fixture).
"""

__version__ = "0.1.0"
