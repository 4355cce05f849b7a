from parquet_to_csv_spark.plans.registry import QUERIES, ORACLES

__all__ = ["QUERIES", "ORACLES"]
