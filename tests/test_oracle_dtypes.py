"""Oracle fetch-path typing guard.

The driver fetches DuckDB oracle results via pandas (``res.df()``), not
``fetchall()``. DuckDB types that pandas can't hold natively silently
drift there — ``SUM(BIGINT)`` returns HUGEINT which pandas stores as
float64, and a list-typed cell becomes an unhashable Python list that
crashes the driver's ``sort_values`` canonicalizer. Both drifts are
invisible to a ``fetchall()``-based comparison, so round 1 shipped 4
hash-mismatch reds and 1 canonicalizer crash that were "locally green".

This test runs EVERY registered oracle through the driver's actual fetch
path and asserts, per column, against the Spark query's (lazy, analyzed)
schema:

* Spark integral column  -> pandas integer dtype (no float64/HUGEINT
  drift; fix with ``CAST(... AS BIGINT)`` in the oracle SQL).
* No column, on either engine, may be array-typed / contain list cells
  (fix by ``array_join``-ing to a deterministic string on BOTH sides).
"""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest
from pyspark.sql import types as T

import __spark_entry__ as entrymod

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

INTEGRAL_SPARK = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)


@pytest.fixture(scope="module")
def oracle_frames(sf_dir):
    """Every oracle executed once via the driver's pandas fetch path."""
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    frames = {}
    for name, sql in entrymod.oracle_sql().items():
        frames[name] = con.execute(sql).df()
    con.close()
    return frames


@pytest.fixture(scope="module")
def spark_schemas(spark, sf_dir):
    """Analyzed (not executed) Spark schema for every registered query."""
    return {
        name: fn(spark, sf_dir).schema
        for name, fn in entrymod.queries().items()
        if name in entrymod.oracle_sql()
    }


def test_no_integer_to_float_drift(oracle_frames, spark_schemas):
    """Spark-integral columns must come back integral from DuckDB.df()."""
    bad = []
    for name, schema in spark_schemas.items():
        pdf = oracle_frames[name]
        for field in schema.fields:
            if not isinstance(field.dataType, INTEGRAL_SPARK):
                continue
            if field.name not in pdf.columns:
                continue  # column-name mismatch is test_registry's job
            dtype = pdf[field.name].dtype
            if not (
                pd.api.types.is_integer_dtype(dtype)
                # all-NULL / empty-result columns come back object; fine
                or (dtype == object and pdf[field.name].isna().all())
            ):
                bad.append(f"{name}.{field.name}: spark=int, duckdb.df()={dtype}")
    assert not bad, (
        "oracle columns drift to non-integer via the driver's pandas fetch "
        "path (CAST the oracle expression AS BIGINT):\n" + "\n".join(bad)
    )


def test_no_array_outputs_either_side(oracle_frames, spark_schemas):
    """Array cells crash the driver canonicalizer — ban them on both sides."""
    bad = []
    for name, schema in spark_schemas.items():
        for field in schema.fields:
            if isinstance(field.dataType, (T.ArrayType, T.MapType)):
                bad.append(f"{name}.{field.name}: spark-side {field.dataType}")
        pdf = oracle_frames[name]
        for col in pdf.columns:
            cells = pdf[col].dropna()
            if len(cells) and isinstance(
                cells.iloc[0], (list, tuple, np.ndarray, dict)
            ):
                bad.append(f"{name}.{col}: duckdb-side list/array cells")
    assert not bad, (
        "array-typed oracle-checked outputs (array_join to string on both "
        "sides):\n" + "\n".join(bad)
    )
