"""Portable deterministic hashing — identical in Spark and DuckDB.

The reference shuffles tokens with djb2 (`Hash`, reference:
src/omp_count_words.cpp:291-303). We never replicate the exact hash for
the *shuffle* (Spark's partitioner is an implementation detail, SURVEY
§2.1/O6), but content hashing for dedup/MinHash/SimHash must be
reproducible across engines so the DuckDB oracle can check it.

Scheme: md5 of (value + unit-separator + seed), first 15 hex chars → a
60-bit non-negative integer. Both engines produce bit-identical values:

    Spark : conv(substr(md5(x), 1, 15), 16, 10)  cast to long
    DuckDB: ('0x' || substr(md5(x), 1, 15))::BIGINT

md5 here is a content fingerprint, not a security boundary; 60 bits keeps
the value positive in a signed 64-bit long in both engines.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# 0x1F (unit separator) cannot appear in whitespace-delimited tokens.
_SEP = "\x1f"


def hash64(col: Column, seed: int = 0) -> Column:
    """60-bit portable hash of a string column (Spark side)."""
    salted = F.concat(col, F.lit(_SEP), F.lit(str(seed)))
    return F.conv(F.substring(F.md5(salted), 1, 15), 16, 10).cast("long")


def hash64_sql(expr: str, seed: int = 0) -> str:
    """The DuckDB twin of :func:`hash64` for oracle SQL generation."""
    return (
        f"('0x' || substr(md5({expr} || chr(31) || '{seed}'), 1, 15))::BIGINT"
    )


def fingerprint_md5(col: Column) -> Column:
    """Full-content md5 fingerprint (hex string), exact-dedup key."""
    return F.md5(col)
