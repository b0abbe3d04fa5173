"""Vector column expressions (SURVEY.md §2.11 L3, D2).

Two implementations of the same float64 math:

- **Column algebra** (``dot``/``l2_norm``/``cosine``): ``zip_with`` for the
  elementwise product, ``aggregate`` for the reduction. JVM-side, but the
  lambdas inside higher-order functions are evaluated INTERPRETED per
  element — fine for one-off scoring, a measurable tax in hot loops.
- **Arrow-batched numpy** (``cosine_pandas``/``dot_pandas``): a vectorized
  Pandas UDF doing one matmul-shaped einsum per Arrow batch (D2). Results
  agree with the DuckDB oracle at 6-decimal rounding.

Measured split (BASELINE.md "vector scorer", warm, sf0.1, dim=64):

- **pair-shaped** scoring — both vectors already sit in the row (bucket
  self-joins, broadcast-join candidates) — the HOF column form WINS
  (0.85 s vs 1.12 s on ann_lsh_cosine): Arrow would ship 2×dim doubles per
  candidate, which costs more than interpreted lambdas save.
- **scan-shaped** scoring against a small constant matrix (query set,
  centroids) — a mapInPandas matmul WINS (0.55 s vs 0.75 s on
  cosine_topk): each corpus vector crosses Arrow once and the compare
  itself is one BLAS call (see ``operators/similarity.cosine_topk``).

So: pair shapes keep ``cosine``/``dot``; scan shapes go through
mapInPandas; ``cosine_pandas``/``dot_pandas`` remain the D2 scalar surface
for callers whose rows already carry both vectors and who want numpy
semantics.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType


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


def _stack(s: pd.Series) -> np.ndarray:
    return np.vstack(s.to_numpy()).astype(np.float64, copy=False)


# DoubleType() (not the "double" DDL string) — the string form needs an
# active SparkSession to parse, which would break plain module import
@F.pandas_udf(DoubleType())
def _dot_batch(a: pd.Series, b: pd.Series) -> pd.Series:
    av, bv = _stack(a), _stack(b)
    return pd.Series(np.einsum("ij,ij->i", av, bv))


@F.pandas_udf(DoubleType())
def _cosine_batch(a: pd.Series, b: pd.Series) -> pd.Series:
    av, bv = _stack(a), _stack(b)
    num = np.einsum("ij,ij->i", av, bv)
    den = np.sqrt(np.einsum("ij,ij->i", av, av) * np.einsum("ij,ij->i", bv, bv))
    return pd.Series(num / den)


def dot_pandas(a: Column | str, b: Column | str) -> Column:
    """Row-wise dot product, one vectorized numpy pass per Arrow batch."""
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    return _dot_batch(a, b)


def cosine_pandas(a: Column | str, b: Column | str) -> Column:
    """Row-wise cosine, one vectorized numpy pass per Arrow batch — the
    hot-path replacement for :func:`cosine` (D2 showcase)."""
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    return _cosine_batch(a, b)
