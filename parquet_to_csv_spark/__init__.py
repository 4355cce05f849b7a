"""parquet_to_csv_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the capabilities of the
reference repo ``AlexC-ux/parquet-to-csv`` (a Node.js Parquet→CSV/SQLite
batch pipeline, see SURVEY.md), extended with the LLM-data-pipeline
operators (dedup, similarity search, multimodal columns, text analysis)
that a 100 TB training-data pipeline needs.

Design principles (SURVEY.md §4):
- DataFrame/SQL declarative plans; Catalyst does pushdown/pruning/codegen.
- No row-at-a-time Python in the hot path; Pandas UDFs only where
  built-ins genuinely can't express the semantics (multimodal decode).
- Every operator sized for a 1000-executor cluster: broadcast small dims,
  shuffle only on keys that need it, AQE on, no driver-side collect loops.
"""

from parquet_to_csv_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
