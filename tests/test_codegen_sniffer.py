"""Whole-stage-codegen fallback sniffer (round-5 verdict item 4).

Spark keeps a query green when Janino rejects the generated Java — it
logs an ERROR and silently runs interpreted.  ``markov_attribution``
shipped exactly this way in round 5 (12 CompileExceptions per run,
oracle still matching).  These tests pin both halves of the fix:

1. the sniffer plumbing (``session.read_codegen_failures`` fed by the
   log4j2 file route installed by ``get_spark`` at JVM launch) counts a
   DELIBERATE compile failure — driven through the real
   ``CodeGenerator.compile`` path in the JVM, the exact logger the
   production fallback goes through;

2. ``markov_attribution`` itself now executes with ZERO compile
   failures (the regression test for the round-6 fix: window-sum
   normalization + broadcast fixed-point join + non-foldable CONV
   literal + runtime-bloom-filter scope, ``operators/timeops.py``).
"""

from __future__ import annotations

from parquet_to_csv_spark.session import read_codegen_failures

SF_DIR = "/root/testdata/sf0.001"


def _drain(offset: int = 0) -> int:
    off, _ = read_codegen_failures(offset)
    return off


def test_sniffer_detects_deliberate_compile_failure(spark):
    # Feed CodeGenerator.compile invalid Java via the JVM — this logs
    # the same "Failed to compile" ERROR a production whole-stage
    # fallback emits, without depending on a Spark bug staying
    # reproducible.
    jvm = spark._jvm
    map_obj = (
        jvm.java.lang.Class.forName("scala.collection.immutable.Map$")
        .getField("MODULE$")
        .get(None)
    )
    cac = jvm.org.apache.spark.sql.catalyst.expressions.codegen.CodeAndComment(
        "public class Broken { this is not java }", map_obj.empty()
    )
    cg_obj = (
        jvm.java.lang.Class.forName(
            "org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator$"
        )
        .getField("MODULE$")
        .get(None)
    )
    off0 = _drain()
    try:
        cg_obj.compile(cac)
        raise AssertionError("broken source unexpectedly compiled")
    except Exception:  # noqa: BLE001 — Py4JJavaError expected
        pass
    _, n = read_codegen_failures(off0)
    assert n == 1, f"sniffer saw {n} failures, expected exactly 1"


def test_markov_attribution_codegen_clean(spark):
    from parquet_to_csv_spark.operators.timeops import markov_attribution

    off0 = _drain()
    out = markov_attribution(spark, SF_DIR).collect()
    assert len(out) == 4
    _, n = read_codegen_failures(off0)
    assert n == 0, f"markov_attribution triggered {n} codegen fallback(s)"
