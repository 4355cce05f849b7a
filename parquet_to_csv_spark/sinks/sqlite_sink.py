"""SQLite sink — S6 of SURVEY.md §2.1.

The reference creates ``trace(UID TEXT PRIMARY KEY, <col> INTEGER|TEXT
...)`` from the unified schema and inserts row-by-row with a VACUUM
every 1000 rows (``/root/reference/main.js:257-377``) — the
anti-pattern list of SURVEY.md §4. Engine approach:

- Preferred (cluster): JDBC ``df.write.format("jdbc")`` with the
  sqlite-jdbc driver. This container ships no sqlite-jdbc jar, so that
  path is attempted and falls back cleanly.
- Fallback (local): ``toLocalIterator`` partition-at-a-time streaming →
  chunked ``executemany`` loads on the driver via Python's stdlib
  ``sqlite3``. SQLite is a single-file database — ANY writer is
  ultimately one node, so a driver-side batched load is not a scale
  compromise relative to the sink itself; the Spark plan upstream
  (scan/filter/dedup) still runs distributed, and driver memory is
  bounded by one partition at a time (a full ``toArrow()`` would
  materialize the entire result on the driver and OOM on large
  outputs).

Type discipline per the reference (``main.js:287-301``): NUMBER_KEYS →
INTEGER, everything else TEXT; synthetic ``UID`` primary key
(``main.js:296-297``). One transaction, no per-row prepare/finalize,
no VACUUM churn.
"""

from __future__ import annotations

import sqlite3
import uuid as _uuid

from pyspark.sql import DataFrame

from parquet_to_csv_spark.functions.trace import NUMBER_KEYS


def _sqlite_type(col: str) -> str:
    return "INTEGER" if col in NUMBER_KEYS else "TEXT"


def write_sqlite(
    df: DataFrame,
    db_path: str,
    table: str = "trace",
    *,
    jdbc_url: str | None = None,
    batch_size: int = 10_000,
) -> int:
    """Write ``df`` to a SQLite table with the reference's type map.

    Returns the row count written. Tries JDBC first when a URL is
    given; otherwise streams rows driver-side partition-at-a-time.
    """
    if jdbc_url:
        try:
            (
                df.write.format("jdbc")
                .option("url", jdbc_url)
                .option("dbtable", table)
                .option("driver", "org.sqlite.JDBC")
                .mode("overwrite")
                .save()
            )
            # count what was WRITTEN (one 1-row JDBC query) — never
            # recompute the upstream plan for a row count.
            cnt = (
                df.sparkSession.read.format("jdbc")
                .option("url", jdbc_url)
                .option("query", f'SELECT count(*) AS n FROM "{table}"')
                .option("driver", "org.sqlite.JDBC")
                .load()
                .collect()[0]["n"]
            )
            return int(cnt)
        except Exception:
            pass  # no sqlite-jdbc jar in this container → local fallback

    cols = df.columns
    ddl_cols = ", ".join(f'"{c}" {_sqlite_type(c)}' for c in cols)
    placeholders = ", ".join(["?"] * (len(cols) + 1))

    con = sqlite3.connect(db_path)
    try:
        con.execute(f'DROP TABLE IF EXISTS "{table}"')
        con.execute(f'CREATE TABLE "{table}" (UID TEXT PRIMARY KEY, {ddl_cols})')
        n = 0
        insert = f'INSERT INTO "{table}" VALUES ({placeholders})'
        # toLocalIterator streams one partition at a time to the driver
        # (bounded memory); chunk into executemany batches inside one
        # transaction — no per-row prepare, no VACUUM churn.
        chunk: list[tuple] = []
        for row in df.toLocalIterator(prefetchPartitions=True):
            chunk.append(tuple([str(_uuid.uuid4())] + [row[c] for c in cols]))
            if len(chunk) >= batch_size:
                con.executemany(insert, chunk)
                n += len(chunk)
                chunk = []
        if chunk:
            con.executemany(insert, chunk)
            n += len(chunk)
        con.commit()
        return n
    finally:
        con.close()
