"""Shared time-slice bisect for the native-format scans.

One copy of the boundary semantics (duplicates, degenerate and
out-of-range slices, hi-side exclusivity) consumed by both
zarr.time_row_range and netcdf.h5_time_row_range through small
format-specific accessors — a change to the slice contract lands once.
"""

from __future__ import annotations

import numpy as np


def bisect_row_range(chunk, base, n_units: int, n_rows: int, lo, hi) -> tuple[int, int]:
    """[row_lo, row_hi) of rows with ``lo <= value < hi`` over a
    non-decreasing sequence exposed as ``n_units`` ordered units:
    ``chunk(i)`` returns unit i's values (ascending), ``base(i)`` its
    starting global row. Two binary searches over unit boundary values
    plus a searchsorted inside the two boundary units — O(log n_units)
    unit materializations total."""
    if n_rows == 0 or n_units == 0:
        return 0, 0

    def bsearch(pred) -> int:
        a, b = 0, n_units
        while a < b:
            mid = (a + b) // 2
            if pred(mid):
                b = mid
            else:
                a = mid + 1
        return a

    start = bsearch(lambda i: chunk(i)[-1] >= lo)
    if start == n_units:
        return n_rows, n_rows
    row_lo = base(start) + int(np.searchsorted(chunk(start), lo, side="left"))
    end = bsearch(lambda i: chunk(i)[-1] >= hi)
    if end == n_units:
        row_hi = n_rows
    else:
        row_hi = base(end) + int(np.searchsorted(chunk(end), hi, side="left"))
    return row_lo, max(row_lo, row_hi)
