"""Scale-safe global prefix sums over an unbounded key domain.

A ``SUM(x) OVER (ORDER BY ...)`` with no PARTITION BY moves the entire
input through ONE task — fine when the input is a compressed domain
table (this repo's rank-identity operators reduce the event stream to
the user domain first), fatal when that domain itself is unbounded.
The classic fix (the "count-bucket sharding" recipe the rank-identity
docstrings describe) is the two-level scan:

1. **Shard monotonically.** The caller supplies a ``shard`` column
   that is a coarse, NON-DECREASING function of the global sort order
   (e.g. ``-(n div B)`` for an ``ORDER BY n DESC`` prefix sum — every
   row of shard s sorts before every row of shard s+1). Shard count is
   chosen so each shard fits a task (#rows / target_rows_per_task).
2. **Local pass.** One windowed prefix sum PARTITIONED by shard —
   parallel across shards.
3. **Offsets.** Per-shard totals (one map-combined groupBy; the frame
   is shard-domain-sized), an exclusive prefix over the shard totals
   (the only global window — over #shards rows, not #rows), broadcast
   back, added to the local sums.

The result is bit-identical to the global window (integer adds
commute and the shard order refines into the global order), so the
DuckDB oracles of operators wired through this helper keep
hash-matching — that equality is also pinned directly by
``tests/test_pipeline_api.py::test_sharded_prefix_sum_equals_global``
and the partition-invariance gate.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def sharded_prefix_sum(
    df: DataFrame,
    *,
    shard_col: str,
    order: Sequence[Column],
    value: Column | str,
    cum_col: str = "cum",
    rank_col: str | None = None,
) -> DataFrame:
    """Global running sum of ``value`` under the total order
    (``shard_col`` ASC, then ``order``) — without a single-partition
    global window.

    - ``shard_col``: any ORDERABLE column (long, or a struct for
      composite keys), coarsely monotone ascending in the global sort
      order (all of shard s precedes all of shard s+1). The caller
      owns the monotonicity contract; convenient constructions:
      ``-(n div B)`` for ``ORDER BY n DESC``, or
      ``struct(-n, user_id div C)`` to also split a crowded count
      bucket across user sub-ranges.
    - ``order``: intra-shard ordering columns; together with
      ``shard_col`` they must be a TOTAL order (include a unique
      tie-break) or ranks are nondeterministic.
    - ``value``: the summand (exact integers under the house
      discipline).
    - ``cum_col``: output column, inclusive prefix sum.
    - ``rank_col``: optional output column with the global 1-based
      ``row_number`` under the same order (the rank identity the
      Pareto/Lorenz/Mann-Whitney operators need), computed the same
      two-level way (local rank + exclusive prefix of shard counts).

    Scale: one shuffle partitioned BY SHARD for the local window, one
    map-combined groupBy to shard totals, one broadcast join back.
    The only unsharded window runs over #shards rows.
    """
    v = F.col(value) if isinstance(value, str) else value
    w_local = Window.partitionBy(shard_col).orderBy(*order)
    local = df.withColumn(
        "__lcum",
        F.sum(v).over(w_local.rowsBetween(Window.unboundedPreceding, 0)),
    )
    if rank_col is not None:
        local = local.withColumn("__lrk", F.row_number().over(w_local))
    totals = df.groupBy(shard_col).agg(
        F.sum(v).alias("__t"), F.count(F.lit(1)).alias("__c")
    )
    # Exclusive prefix over shard totals: the one global window, sized
    # by the shard domain (#shards rows), never the input.
    w_shards = Window.orderBy(shard_col).rowsBetween(
        Window.unboundedPreceding, -1
    )
    offs = totals.select(
        shard_col,
        F.coalesce(F.sum("__t").over(w_shards), F.lit(0)).alias("__off"),
        F.coalesce(F.sum("__c").over(w_shards), F.lit(0)).alias("__coff"),
    )
    out = local.join(F.broadcast(offs), shard_col).withColumn(
        cum_col, (F.col("__off") + F.col("__lcum")).cast("long")
    )
    if rank_col is not None:
        out = out.withColumn(
            rank_col, (F.col("__coff") + F.col("__lrk")).cast("long")
        ).drop("__lrk")
    return out.drop("__lcum", "__off", "__coff")
