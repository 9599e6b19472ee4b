"""Vectorized proleptic-Gregorian calendar math over epoch-day int64 arrays.

Monthly partitioning / cohorting at corpus scale needs (year, month, day)
from microsecond timestamps WITHOUT a Python datetime per row. This is the
classic civil-from-days algorithm (Howard Hinnant, "chrono-Compatible
Low-Level Date Algorithms", public domain) transcribed to numpy int64
vector ops — exact for the full 10^12-row-friendly range, validated against
datetime.date across a multi-century sweep in tests.
"""

from __future__ import annotations

import numpy as np


def civil_from_days(days: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(year, month, day) int64 arrays for days since 1970-01-01 (may be
    negative)."""
    z = days.astype(np.int64) + 719_468
    era = np.where(z >= 0, z, z - 146_096) // 146_097
    doe = z - era * 146_097                                   # [0, 146096]
    yoe = (doe - doe // 1460 + doe // 36_524 - doe // 146_096) // 365
    y = yoe + era * 400
    doy = doe - (365 * yoe + yoe // 4 - yoe // 100)           # [0, 365]
    mp = (5 * doy + 2) // 153                                 # [0, 11]
    d = doy - (153 * mp + 2) // 5 + 1                         # [1, 31]
    m = np.where(mp < 10, mp + 3, mp - 9)                     # [1, 12]
    return (y + (m <= 2)).astype(np.int64), m.astype(np.int64), d.astype(np.int64)


def year_month_from_us(ts_us: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(year, month) from microsecond timestamps; floor division handles
    pre-epoch instants correctly."""
    days = np.floor_divide(ts_us.astype(np.int64), 86_400_000_000)
    y, m, _ = civil_from_days(days)
    return y, m
