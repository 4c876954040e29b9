"""Vector math over ArrayType(Float/Double) columns, built on Spark's
higher-order array functions — JVM-side, codegen'd, no Python in the row
path.

Determinism: all folds are sequential left folds with a 0.0 init, which
DuckDB's ``list_reduce`` reproduces bit-for-bit (adding 0.0 first is a
no-op in IEEE), so cosine/dot/norm results hash-match the oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(vec: Column | str) -> Column:
    v = F.col(vec) if isinstance(vec, str) else vec
    return F.transform(v, lambda x: x.cast("double"))


def fold_sum(vec: Column) -> Column:
    return F.aggregate(vec, F.lit(0.0), lambda s, x: s + x)


def dot(a: Column, b: Column) -> Column:
    return fold_sum(F.zip_with(a, b, lambda x, y: x * y))


def norm(a: Column) -> Column:
    return F.sqrt(fold_sum(F.transform(a, lambda x: x * x)))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))
