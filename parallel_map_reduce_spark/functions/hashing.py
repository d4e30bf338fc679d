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


# --- universal-hash family over one base hash ------------------------------
#
# MinHash needs k independent hash functions per shingle. k salted md5s
# would cost k digest computations per row; instead we md5 once and derive
# the family with (a_i * h32 + b_i) mod P — pure 64-bit integer ops that
# whole-stage codegen vectorizes, and that DuckDB reproduces exactly.
# Constraints: h32 < 2^32, a_i < 2^31  ⇒  a_i*h32 + b_i < 2^63 (no
# overflow in signed 64-bit in either engine).

MERSENNE_P = 4294967311  # smallest prime > 2^32
_H32_MASK = 4294967295  # 2^32 - 1


def universal_params(k: int) -> list[tuple[int, int]]:
    """Deterministic (a, b) pairs for the k-member hash family."""
    import hashlib

    params = []
    for s in range(k):
        h = hashlib.md5(f"universal:{s}".encode()).hexdigest()
        a = (int(h[:8], 16) % (2**31 - 1)) + 1
        b = int(h[8:16], 16) % (2**31 - 1)
        params.append((a, b))
    return params


def universal_hash(base: Column, a: int, b: int) -> Column:
    """(a * low32(base) + b) mod P — one member of the family (Spark)."""
    h32 = base.bitwiseAND(F.lit(_H32_MASK))
    return (F.lit(a) * h32 + F.lit(b)) % F.lit(MERSENNE_P)


def universal_hash_sql(base_expr: str, a: int, b: int) -> str:
    """DuckDB twin of :func:`universal_hash`."""
    return f"(({a} * (({base_expr}) & {_H32_MASK}) + {b}) % {MERSENNE_P})"
