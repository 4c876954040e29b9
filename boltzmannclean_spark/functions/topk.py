"""Scale-safe per-key top-k.

A single ``row_number() OVER (PARTITION BY key)`` is the textbook top-k,
but when the key has low cardinality (5 query vectors) the window's
Exchange lands the ENTIRE scored corpus for a key on one task — the
classic single-partition scale-killer. The fix is the salted two-stage
top-k: a deterministic salt splits each key into ``n_salt`` sub-groups,
a local window keeps k rows per (key, salt), and the final window ranks
only ``n_salt * k`` survivors per key. Shuffle volume is unchanged but
the first Exchange spreads over ``|keys| * n_salt`` tasks, and the
second moves a constant-size candidate set.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def topk_per_key(
    df: DataFrame,
    keys: Sequence[str],
    order: Sequence[Column],
    k: int,
    salt_col: str,
    rank_col: str = "rk",
    n_salt: int = 32,
) -> DataFrame:
    """Top-k rows per ``keys`` under ``order`` (must be a total order —
    include a unique tie-break column) without a single-partition-per-key
    window. ``salt_col`` must be non-null; the salt is a deterministic
    hash of it, so results are reproducible at any parallelism."""
    salted = df.withColumn(
        "__salt", F.pmod(F.xxhash64(F.col(salt_col)), F.lit(n_salt))
    )
    w_local = Window.partitionBy(*keys, "__salt").orderBy(*order)
    pruned = (
        salted.withColumn("__lrk", F.row_number().over(w_local))
        .where(F.col("__lrk") <= k)
        .drop("__lrk", "__salt")
    )
    w_final = Window.partitionBy(*keys).orderBy(*order)
    return pruned.withColumn(rank_col, F.row_number().over(w_final)).where(
        F.col(rank_col) <= k
    )
