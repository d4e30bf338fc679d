from parallel_map_reduce_spark.sources.tables import load_table, load_tables, read_text_corpus

__all__ = ["load_table", "load_tables", "read_text_corpus"]
