"""E12 — the sanctioned Pandas-UDF escape hatch (SURVEY.md §2.6).

Policy: native Column expressions first; when semantics genuinely need
Python (exotic tokenizers, model scoring), use Arrow-vectorized Pandas
UDFs — never row-at-a-time ``F.udf``. This module is the worked
example: a whitespace token counter as a ``pandas_udf``, semantically
identical to the native ``size(split(...))`` path in operators.text,
so the oracle checks it and the bench quantifies the escape-hatch tax.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from parquet_to_csv_spark.sources.tables import load_table


@F.pandas_udf(T.IntegerType())
def n_tokens_pandas(text: pd.Series) -> pd.Series:
    """Vectorized whitespace token count (empty tokens dropped), same
    semantics as ``size(filter(split(lower(text), '\\s+'), _ != ''))``."""
    return (
        text.str.lower()
        .str.split()
        .map(lambda toks: len(toks) if toks is not None else None)
        .astype("Int32")
    )


def token_counts_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The E12 demo query: per-doc token count via the Arrow UDF path."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", n_tokens_pandas(F.col("text")).alias("n_tokens_ws"))
