"""Skew-mitigation operators: salted join and two-stage distinct count.

Token frequencies are Zipfian (the reference corpus's top word `and`
appears 70,922× — BASELINE.md), so any shuffle keyed by token sends the
hot keys to single tasks. AQE's skew-join splitting covers sort-merge
joins after the fact; these operators are the explicit, planner-proof
recipes for when AQE can't help (first-shuffle aggregation skew,
non-splittable stages) or when the skew is known up front.

- ``salted_join``: big side gets a rotating salt, small side is
  replicated once per salt value, join key becomes (key, salt). A hot key
  now lands on ``num_salts`` tasks instead of one. Use when the small
  side exceeds the broadcast threshold (below it, ``F.broadcast`` is
  strictly better — no shuffle at all).
- ``salted_count_distinct``: exact distinct via hash-bucketing the VALUE
  space: stage 1 counts distinct values within (key, hash(value) mod B)
  — B-way parallel per hot key — and stage 2 sums the bucket counts,
  which is correct because the buckets partition the value space.

Correctness of both is oracle-checked in the registry
(skew_salted_join_top_words, salted_count_distinct_users).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    num_salts: int = 16,
    force_shuffle: bool = True,
) -> DataFrame:
    """Inner-join ``big`` ⋈ ``small`` on ``key`` with an ``num_salts``-way
    salt so skewed keys spread across tasks.

    The salt on the big side only needs to VARY per row (any value joins
    correctly, since the small side carries every salt), so a cheap
    row-cycling counter is enough — no hashing. ``force_shuffle`` pins the
    sort-merge path (the scenario salting exists for); leave it on even in
    tests so the recipe is exercised, not silently broadcast away.
    """
    big_s = big.withColumn(
        "__salt", (F.monotonically_increasing_id() % num_salts).cast("int")
    )
    small_s = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(num_salts)]))
    )
    if force_shuffle:
        small_s = small_s.hint("merge")
    return big_s.join(small_s, [key, "__salt"], "inner").drop("__salt")


def salted_count_distinct(
    df: DataFrame,
    group_col: str,
    value_col: str,
    num_buckets: int = 64,
    out_col: str = "n_distinct",
) -> DataFrame:
    """Exact COUNT(DISTINCT value) per group, skew-proof.

    Plain ``countDistinct`` shuffles every (group, value) pair to the
    group's single reducer. Here stage 1 groups by (group, hash(value)
    mod B) so each hot group's distinct-dedup runs B-way parallel; stage
    2 sums the per-bucket counts. Exact because hash-of-value buckets
    partition the value space: no value appears in two buckets.
    """
    stage1 = (
        df.groupBy(
            F.col(group_col),
            F.pmod(F.xxhash64(F.col(value_col)), F.lit(num_buckets)).alias("__bucket"),
        )
        .agg(F.countDistinct(value_col).alias("__partial"))
    )
    return stage1.groupBy(group_col).agg(F.sum("__partial").alias(out_col))
