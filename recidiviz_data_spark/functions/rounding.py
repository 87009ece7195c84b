"""Exact SQL-round() emulation for numpy (half away from zero).

``np.floor(v + 0.5)`` is NOT equivalent: for doubles just below a .5
boundary the addition itself rounds up (0.49999999999999994 + 0.5 == 1.0 in
IEEE), diverging from C/DuckDB ``round()``. The exact form splits v into
trunc + fractional part (exact for any double: the subtraction is
representable) and bumps only when |frac| >= 0.5 — bit-identical to
``std::round`` and therefore to the DuckDB oracle.
"""

from __future__ import annotations

import numpy as np


def round_half_away(v: np.ndarray) -> np.ndarray:
    """Element-wise round-half-away-from-zero, exact at midpoint-adjacent
    doubles (matches SQL round())."""
    t = np.trunc(v)
    frac = v - t  # exact: v and trunc(v) share representable bits
    return t + np.where(np.abs(frac) >= 0.5, np.sign(frac), 0.0)
