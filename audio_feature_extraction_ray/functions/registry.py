"""Feature-extractor plugin registry (reference analog:
FeatureExtractorRegistry.register/get with Protocol conformance check,
tasks.md:741-760, FR-2.6, NFR-2.1).

Custom extractors are pure per-partition vectorized functions
    fn(tbl: pa.Table) -> dict[str, np.ndarray]
running inside the merge kernel AFTER the built-in history features (so they
can read any built-in column). They must be deterministic and leakage-free:
the table they see is the sorted, deduped partition with history columns —
row i of any output must depend only on rows j <= i of the same url. The
registry enforces the signature, not the physics; the leakage probe test
covers registered extractors too.
"""

from __future__ import annotations

import inspect
from collections.abc import Callable

import numpy as np
import pyarrow as pa

_REGISTRY: dict[str, Callable[[pa.Table], dict[str, np.ndarray]]] = {}


def register_feature(name: str):
    """Decorator: @register_feature("my_feat")."""

    def deco(fn):
        sig = inspect.signature(fn)
        if len(sig.parameters) != 1:
            raise TypeError(
                f"feature extractor {name!r} must take exactly one argument (pa.Table)"
            )
        if name in _REGISTRY:
            raise ValueError(f"feature {name!r} already registered")
        _REGISTRY[name] = fn
        return fn

    return deco


def get_feature(name: str):
    try:
        return _REGISTRY[name]
    except KeyError:
        raise KeyError(
            f"unknown feature extractor {name!r}; registered: {sorted(_REGISTRY)}"
        ) from None


def registered() -> list[str]:
    return sorted(_REGISTRY)


def apply_extra_features(tbl: pa.Table, names: list[str]) -> pa.Table:
    for name in names:
        cols = get_feature(name)(tbl)
        for cname, arr in cols.items():
            tbl = tbl.append_column(cname, pa.array(np.asarray(arr, dtype=np.float64), pa.float64()))
    return tbl


# --- built-in example plugins ----------------------------------------------


@register_feature("mel_proj")
def mel_proj(tbl: pa.Table) -> dict[str, np.ndarray]:
    """Fixed linear projection of the ngram-bucket histogram onto a smaller
    seeded basis — the webtext analog of the mel filterbank (a fixed linear
    projection of the spectral vector, tasks.md:611-633)."""
    cols = [c for c in tbl.column_names if c.startswith("ngram_b")]
    m = np.stack([tbl.column(c).to_numpy(zero_copy_only=False) for c in cols], axis=1)
    rng = np.random.default_rng(77)
    basis = rng.standard_normal((m.shape[1], 4))
    p = m @ basis
    return {f"mel_proj_{i}": p[:, i] for i in range(4)}


@register_feature("is_long_doc")
def is_long_doc(tbl: pa.Table) -> dict[str, np.ndarray]:
    tc = tbl.column("token_count").to_numpy(zero_copy_only=False)
    return {"is_long_doc": (tc > 40).astype(np.float64)}
