"""DateTools — the document/DateTools.java role: timestamps as sortable,
resolution-truncated strings (``yyyyMMddHHmmssSSS`` prefixes, UTC) that
index/range-query as plain terms, plus the inverse parse.

Vectorized column variants run as ONE pyarrow strftime/floor kernel per
batch — the map_batches building block for date faceting and range
filters over string-indexed dates.
"""

from __future__ import annotations

from datetime import datetime, timezone

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# resolution -> (strftime pattern, string length)
_FORMATS = {
    "year": ("%Y", 4),
    "month": ("%Y%m", 6),
    "day": ("%Y%m%d", 8),
    "hour": ("%Y%m%d%H", 10),
    "minute": ("%Y%m%d%H%M", 12),
    "second": ("%Y%m%d%H%M%S", 14),
    "millisecond": ("%Y%m%d%H%M%S%f", 17),  # %f gives 6 digits; cut to 3
}

RESOLUTIONS = tuple(_FORMATS)


def date_to_string(dt: "datetime | int | float", resolution: str) -> str:
    """DateTools.dateToString: UTC, truncated to ``resolution``.
    Accepts a datetime (naive = UTC) or epoch milliseconds."""
    fmt, width = _FORMATS[resolution]
    if isinstance(dt, (int, float, np.integer, np.floating)):
        dt = datetime.fromtimestamp(float(dt) / 1000.0, tz=timezone.utc)
    elif dt.tzinfo is not None:
        dt = dt.astimezone(timezone.utc)
    return dt.strftime(fmt)[:width]


def string_to_date(s: str) -> datetime:
    """DateTools.stringToDate: parse any resolution's prefix back to a
    UTC datetime (missing fields = their minimum)."""
    for res in reversed(RESOLUTIONS):
        fmt, width = _FORMATS[res]
        if len(s) == width:
            if res == "millisecond":
                return datetime.strptime(s + "000", "%Y%m%d%H%M%S%f").replace(
                    tzinfo=timezone.utc
                )
            return datetime.strptime(s, fmt).replace(tzinfo=timezone.utc)
    raise ValueError(f"not a DateTools string: {s!r}")


def column_to_strings(col, resolution: str) -> pa.Array:
    """Vectorized dateToString over a timestamp column — one strftime
    kernel (naive timestamps are taken as UTC, matching the scalar API)."""
    fmt, width = _FORMATS[resolution]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    out = pc.strftime(col, format=fmt)
    if resolution == "millisecond":
        out = pc.utf8_slice_codeunits(out, 0, width)
    return out


def date_facet_counts(events, ts_col: str = "ts", resolution: str = "day"):
    """Facet counts per truncated date string (the classic date
    drill-down): vectorized truncate + one groupby."""

    def trunc(b: pa.Table) -> pa.Table:
        return pa.table({"date": column_to_strings(b[ts_col], resolution)})

    return (
        events.map_batches(trunc, batch_format="pyarrow")
        .groupby("date").count().sort("date")
    )
