"""Timestamp helpers tolerant of TIMESTAMP vs TIMESTAMP_NTZ inputs.

Parquet written with timezone-naive timestamps is read by Spark 4 as
TIMESTAMP_NTZ when ``spark.sql.parquet.inferTimestampNTZ.enabled`` is true
(the default), and epoch functions like ``F.unix_millis`` reject NTZ input
outright. The session factory disables that inference, but operators must
stay correct under a driver-built session that doesn't — so every epoch
conversion in the repo goes through :func:`epoch_ms`, which casts to
TIMESTAMP first (a no-op on an already-LTZ column).

With the session timezone pinned to UTC, the NTZ→LTZ cast interprets the
naive value as UTC, matching DuckDB's naive-UTC timestamps — so absolute
epoch values agree with the oracle, and differences cancel the timezone
term entirely.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def epoch_ms(col: Column | str) -> Column:
    """Milliseconds since the epoch, accepting TIMESTAMP or TIMESTAMP_NTZ."""
    c = F.col(col) if isinstance(col, str) else col
    return F.unix_millis(c.cast("timestamp"))
