"""SQLite source — round-trip counterpart of ``sinks/sqlite_sink``.

The reference only WRITES SQLite (``/root/reference/main.js:257-377``);
a user migrating off it still holds databases produced by years of
runs, so the engine needs the read side too. SQLite is a single-file
embedded database — ANY reader is ultimately one node (same argument
as the sink) — so this adapter reads driver-side through stdlib
``sqlite3`` in bounded batches and hands Spark an Arrow-backed
DataFrame; everything downstream (joins, dedup, re-export to parquet)
runs distributed. The intended scale path is exactly that: one
``read_sqlite`` → ``repartition`` → parquet migration per legacy file,
after which the lake never touches SQLite again.

Types follow the sink's reference type map (INTEGER → long, everything
else → string); SQLite ``NULL``s survive as nulls.
"""

from __future__ import annotations

import sqlite3

import pandas as pd

from pyspark.sql import DataFrame, SparkSession


def read_sqlite(
    spark: SparkSession,
    db_path: str,
    table: str = "trace",
    batch_size: int = 50_000,
) -> DataFrame:
    """Load a SQLite table as a DataFrame (see module docstring for the
    single-node-read rationale). ``batch_size`` bounds per-fetch driver
    memory; the full table is assembled before handoff — SQLite files
    are small by construction relative to cluster memory, and the
    adapter's job is one-shot migration, not steady-state serving."""
    con = sqlite3.connect(db_path)
    try:
        cols = [
            (r[1], r[2].upper())
            for r in con.execute(f'PRAGMA table_info("{table}")').fetchall()
        ]
        if not cols:
            raise ValueError(f"table {table!r} not found in {db_path}")
        names = [c for c, _ in cols]
        cur = con.execute(
            "SELECT " + ", ".join(f'"{c}"' for c in names) + f' FROM "{table}"'
        )
        frames = []
        while True:
            rows = cur.fetchmany(batch_size)
            if not rows:
                break
            frames.append(pd.DataFrame(rows, columns=names))
        pdf = (
            pd.concat(frames, ignore_index=True)
            if frames
            else pd.DataFrame(columns=names)
        )
    finally:
        con.close()
    fields = ", ".join(
        f"`{c}` " + ("long" if t == "INTEGER" else "string") for c, t in cols
    )
    for c, t in cols:
        if t == "INTEGER":
            pdf[c] = pdf[c].astype("Int64")
        else:
            pdf[c] = pdf[c].astype(object).where(pdf[c].notna(), None)
    return spark.createDataFrame(pdf, schema=fields)
