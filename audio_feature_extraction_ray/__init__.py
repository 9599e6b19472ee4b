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

# The package is used from a plain checkout (no site-packages install), so Ray
# worker processes may not be able to import it by name when the driver's cwd
# is elsewhere. Registering the package for cloudpickle pickle-by-value makes
# every UDF/actor class defined here ship inside the task spec instead of being
# re-imported on the worker — the idiomatic way to run un-installed code on a
# cluster without runtime_env py_modules.
try:  # pragma: no cover - environment guard
    import sys as _sys

    from ray import cloudpickle as _cloudpickle

    _cloudpickle.register_pickle_by_value(_sys.modules[__name__])
except Exception:  # noqa: BLE001 - best-effort; cwd-importable envs still work
    pass
