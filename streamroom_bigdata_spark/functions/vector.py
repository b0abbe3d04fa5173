"""Vector column expressions (SURVEY.md §2.11 L3, D2).

Pure column algebra over ``array<float>`` embeddings — ``zip_with`` for the
elementwise product, ``aggregate`` for the reduction — all JVM-side; no
Python in the hot path. Arithmetic is done in float64 (cast once up front)
so results match the DuckDB oracle's DOUBLE[] math bit-for-bit at 6-decimal
rounding.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(vec: Column | str) -> Column:
    v = F.col(vec) if isinstance(vec, str) else vec
    return F.transform(v, lambda x: x.cast("double"))


def dot(a: Column | str, b: Column | str) -> Column:
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(vec: Column | str) -> Column:
    v = F.col(vec) if isinstance(vec, str) else vec
    return F.sqrt(dot(v, v))


def cosine(a: Column | str, b: Column | str) -> Column:
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    return dot(a, b) / (l2_norm(a) * l2_norm(b))
