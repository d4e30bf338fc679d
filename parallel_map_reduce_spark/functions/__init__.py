from parallel_map_reduce_spark.functions.tokenize import TOKEN_SPLIT_REGEX, tokens

__all__ = ["TOKEN_SPLIT_REGEX", "tokens"]
