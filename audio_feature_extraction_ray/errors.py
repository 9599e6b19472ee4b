"""Typed error hierarchy + bad-record policy (SURVEY §2 P8 / M4; reference
analog: the spec's error taxonomy and recovery rules, design.md:2352-2377 —
on bad input either fail fast with a typed error or skip-and-log and keep
processing, by configuration).

All errors subclass ValueError so pre-existing `except ValueError` /
pytest.raises(ValueError) call sites keep working.
"""

from __future__ import annotations


class PipelineError(ValueError):
    """Base class for all engine errors."""


class ConfigError(PipelineError):
    """Invalid pipeline configuration (caught at cfg.validate() time,
    before any task is scheduled)."""


class SchemaError(PipelineError):
    """Input violates the declared schema (reference analog: __post_init__
    validation errors, design.md:117-149). Raised under bad_rows='error';
    under bad_rows='quarantine' the offending rows are dropped and counted
    instead (design.md:2373-2376: skip, log, continue)."""
