"""Portable deterministic hashing.

Spark's ``hash()``/``xxhash64()`` and DuckDB's ``hash()`` are different
algorithms, so oracle-checkable hash-based operators (dedup, MinHash, LSH,
fingerprints) need a hash both engines compute identically. We use the first
15 hex digits of md5 (60 bits, always positive, fits BIGINT):

    Spark : conv(substring(md5(x), 1, 15), 16, 10)::bigint
    DuckDB: CAST(concat('0x', substr(md5(x), 1, 15)) AS BIGINT)

Spark 4 runs ANSI mode (arithmetic overflow raises), so every derived hash is
reduced mod 1e9 before being combined; combining stays < 2^63.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: modulus applied before combining hashes (keeps ANSI-mode arithmetic safe)
HASH_MOD = 1_000_000_000
#: prime modulus for rolling fingerprints
FP_MOD = 1_000_000_007


def portable_hash64(col: Column | str) -> Column:
    """60-bit md5-prefix hash — identical in Spark and DuckDB."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("bigint")


def portable_hash_mod(col: Column | str, mod: int = HASH_MOD) -> Column:
    """Bounded portable hash, safe to multiply/add under ANSI mode."""
    return F.pmod(portable_hash64(col), F.lit(mod))


def sql_hash64(expr: str) -> str:
    """DuckDB SQL equivalent of :func:`portable_hash64`."""
    return f"CAST(concat('0x', substr(md5({expr}), 1, 15)) AS BIGINT)"


def sql_hash_mod(expr: str, mod: int = HASH_MOD) -> str:
    """DuckDB SQL equivalent of :func:`portable_hash_mod`."""
    return f"({sql_hash64(expr)} % {mod})"
