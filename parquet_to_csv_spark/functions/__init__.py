from parquet_to_csv_spark.functions.trace import (
    MAX_DURATION_MS,
    MIN_DURATION_MS,
    NUMBER_KEYS,
    duration_ms_col,
    trace_spans,
)
from parquet_to_csv_spark.functions.vectors import cosine_similarity, dot_product, l2_norm
from parquet_to_csv_spark.functions.textfn import (
    TOKEN_REGEX,
    tokens_col,
    regex_tokens_col,
    normalized_text_col,
    fingerprint_col,
)

__all__ = [
    "MAX_DURATION_MS",
    "MIN_DURATION_MS",
    "NUMBER_KEYS",
    "duration_ms_col",
    "trace_spans",
    "cosine_similarity",
    "dot_product",
    "l2_norm",
    "TOKEN_REGEX",
    "tokens_col",
    "regex_tokens_col",
    "normalized_text_col",
    "fingerprint_col",
]
