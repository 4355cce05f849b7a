from parquet_to_csv_spark.sinks.csv_sink import write_csv, write_csv_splits
from parquet_to_csv_spark.sinks.sqlite_sink import write_sqlite

__all__ = ["write_csv", "write_csv_splits", "write_sqlite"]
