from parquet_to_csv_spark.sources.tables import TABLE_NAMES, load_table, load_tables, register_views
from parquet_to_csv_spark.sources.parquet import read_parquet_tree

__all__ = ["TABLE_NAMES", "load_table", "load_tables", "register_views", "read_parquet_tree"]
