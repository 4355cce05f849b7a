"""CLI: the reference's ``npm run start`` equivalent.

Usage::

    WRITE_CSV=1 WRITE_SQLITE=1 python -m parquet_to_csv_spark \
        [--input input/] [--output output/]

Reads every Parquet file under the input tree (recursive, schema-
merged, corrupt files skipped), applies the reference transform
(duration_ms derivation, >= 2000 ms filter, distinct), and writes the
enabled sinks (``/root/reference/readme.md`` flow).
"""

from __future__ import annotations

import argparse
import sys

from parquet_to_csv_spark.pipeline import ConvertConfig, convert
from parquet_to_csv_spark.session import get_spark


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="parquet_to_csv_spark")
    ap.add_argument("--input", default="input")
    ap.add_argument("--output", default="output")
    args = ap.parse_args(argv)

    spark = get_spark("parquet_to_csv_spark.cli")
    result = convert(spark, args.input, args.output, ConvertConfig())
    print(result)
    return 0


if __name__ == "__main__":
    sys.exit(main())
