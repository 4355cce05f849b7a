"""Vector math as native Column expressions (SURVEY.md E3).

All JVM-side — no Python boundary, so a 100 TB embedding scan stays
vectorized. Embeddings are ``array<float>``; we accumulate in double
for precision and cross-engine (DuckDB oracle) agreement.

Round 11 (optimization): the original formulation used the
``zip_with``/``aggregate`` higher-order functions. Those expressions
are ``CodegenFallback`` in Spark — every row pays an interpreted
lambda loop plus an intermediate 64-element array allocation
(``zip_with``), and the pair-join operators evaluate them O(pairs)
times. When the caller knows the (fixed) embedding dimension, the same
left-fold is emitted as an explicit codegen'd multiply-add chain:
``((0.0 + a[1]·b[1]) + a[2]·b[2]) + …`` — bit-identical double
arithmetic (same operation order, same casts), no allocation, fully
inside whole-stage codegen. Callers pass ``dim=`` (probed once per
corpus — see ``operators.similarity._emb_dim``); without it the
higher-order form is kept, and with it a size guard falls back to the
higher-order form for any row whose arrays are not exactly ``dim``
long, so results are identical for ragged inputs too.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def _dot_hof(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _sq_hof(a: Column) -> Column:
    return F.aggregate(
        a,
        F.lit(0.0),
        lambda acc, v: acc + v.cast("double") * v.cast("double"),
    )


def dot_product(a: Column, b: Column, dim: int | None = None) -> Column:
    """⟨a,b⟩ with double accumulation (left fold, index order).

    ``dim``: when the embedding dimension is known (probed from the
    corpus), emit the codegen'd unrolled chain; rows whose array sizes
    differ from ``dim`` take the original higher-order path, so the
    result is identical in all cases.
    """
    if dim is None:
        return _dot_hof(a, b)
    acc: Column = F.lit(0.0)
    for i in range(1, dim + 1):
        acc = acc + F.element_at(a, i).cast("double") * F.element_at(b, i).cast(
            "double"
        )
    return F.when(
        (F.size(a) == F.lit(dim)) & (F.size(b) == F.lit(dim)), acc
    ).otherwise(_dot_hof(a, b))


def l2_norm(a: Column, dim: int | None = None) -> Column:
    if dim is None:
        return F.sqrt(_sq_hof(a))
    acc: Column = F.lit(0.0)
    for i in range(1, dim + 1):
        v = F.element_at(a, i).cast("double")
        acc = acc + v * v
    return F.sqrt(
        F.when(F.size(a) == F.lit(dim), acc).otherwise(_sq_hof(a))
    )


def cosine_similarity(a: Column, b: Column, dim: int | None = None) -> Column:
    """Cosine similarity; null/zero-norm safe (returns NULL)."""
    denom = l2_norm(a, dim) * l2_norm(b, dim)
    return F.when(denom > F.lit(0.0), dot_product(a, b, dim) / denom)
