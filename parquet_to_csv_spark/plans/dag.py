"""Declarative pipeline DAG materializer (dbt-style, Spark-native).

The reference IS a pipeline tool — one hard-coded DAG (scan →
transform → split → sinks) with a JSON cache between stages. The
engine's general form: a DAG of NAMED nodes, each a function
``(spark, inputs: dict[str, DataFrame]) -> DataFrame`` or a registry
query name, materialized to parquet in topological order with
freshness-aware skipping — a node recomputes only when it has no
materialization or a dependency was rewritten after it (mtime chain,
the same contract make/dbt give).

This is deliberately a THIN layer: every node body is still a single
declarative Spark plan, so Catalyst optimizes within nodes and the DAG
only decides what to persist — orchestration never replaces the
optimizer (SURVEY §4's anti-pattern list, applied to ourselves).
"""

from __future__ import annotations

import os
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass
class Node:
    name: str
    # either a registry query name (str) or a builder over input DFs
    build: str | Callable[[SparkSession, dict[str, DataFrame]], DataFrame]
    deps: list[str] = field(default_factory=list)


class Dag:
    def __init__(self, nodes: list[Node]):
        self.nodes = {n.name: n for n in nodes}
        if len(self.nodes) != len(nodes):
            raise ValueError("duplicate node names")
        for n in nodes:
            for d in n.deps:
                if d not in self.nodes:
                    raise ValueError(f"{n.name} depends on unknown node {d}")

    def topo_order(self) -> list[str]:
        order: list[str] = []
        state: dict[str, int] = {}

        def visit(name: str) -> None:
            st = state.get(name, 0)
            if st == 1:
                raise ValueError(f"cycle through {name}")
            if st == 2:
                return
            state[name] = 1
            for d in self.nodes[name].deps:
                visit(d)
            state[name] = 2
            order.append(name)

        for name in self.nodes:
            visit(name)
        return order

    def run(
        self,
        spark: SparkSession,
        out_dir: str,
        sf_dir: str | None = None,
        force: bool = False,
    ) -> dict[str, str]:
        """Materialize every node to ``out_dir/<name>`` in dependency
        order. A node is SKIPPED when its parquet exists and is newer
        than all of its dependencies' outputs (and not ``force``).
        Returns {node: 'built' | 'fresh'}."""
        from parquet_to_csv_spark.plans.registry import QUERIES

        status: dict[str, str] = {}
        mtimes: dict[str, float] = {}
        for name in self.topo_order():
            node = self.nodes[name]
            path = os.path.join(out_dir, name)
            marker = os.path.join(path, "_SUCCESS")
            dep_mtime = max((mtimes[d] for d in node.deps), default=0.0)
            if (
                not force
                and os.path.exists(marker)
                and os.path.getmtime(marker) >= dep_mtime
            ):
                status[name] = "fresh"
                mtimes[name] = os.path.getmtime(marker)
                continue
            if isinstance(node.build, str):
                if sf_dir is None:
                    raise ValueError("registry nodes need sf_dir")
                df = QUERIES[node.build](spark, sf_dir)
            else:
                inputs = {
                    d: spark.read.parquet(os.path.join(out_dir, d))
                    for d in node.deps
                }
                df = node.build(spark, inputs)
            df.write.mode("overwrite").parquet(path)
            status[name] = "built"
            mtimes[name] = os.path.getmtime(marker)
        return status
