"""parallel_map_reduce_spark — a PySpark-native analytics engine.

A brand-new engine with the query/data-processing capabilities of the
reference MapReduce word-count engine (jehanshah8/parallel_map_reduce,
see SURVEY.md), re-expressed Spark-first: declarative DataFrame plans,
Catalyst optimization, shuffle-based aggregation instead of locks
(reference: src/omp_count_words.cpp:323-354), plus the LLM-data-pipeline
surface (dedup, similarity search, text analysis, multimodal columns)
designed for 100 TB scale.
"""

from parallel_map_reduce_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
