"""Distributed global row-numbering.

``row_number() OVER (ORDER BY ...)`` with no PARTITION BY collapses to
a SINGLE-partition window — the one Spark shape that cannot scale: at
100 TB every row funnels through one task.  ``global_rank`` computes
the identical total-order rank with no single-partition stage:

1. range-repartition on the order columns (Spark's sampled range
   exchange — the same machinery a distributed ``orderBy`` uses),
2. per-partition ``row_number`` windows keyed on the partition id
   (all partitions rank in parallel),
3. ONE control-plane aggregate of per-partition counts → broadcast
   cumulative offsets added to the local ranks.

Determinism: the sampled range boundaries vary run-to-run, but when
the order columns form a UNIQUE key the total order is unique, so the
final rank of every row is identical no matter where the boundaries
fall.  Callers must pass a unique (tie-broken) ordering — the classic
requirement for any deterministic ranking.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def global_rank(df: DataFrame, order_cols: list[str],
                rank_col: str = "rnk") -> DataFrame:
    """Add ``rank_col`` = 1-based position of each row in the total
    ascending order of ``order_cols`` (which must be a unique key),
    without a single-partition window."""
    from .barrier import materialize

    part = (df.repartitionByRange(*order_cols)
              .withColumn("_pid", F.spark_partition_id()))
    w = Window.partitionBy("_pid").orderBy(*[F.asc(c) for c in order_cols])
    # BARRIER before the two consumers (offset count + final ranks):
    # the range exchange SAMPLES its boundaries per execution, so
    # letting each job recompute it could count offsets against one
    # partitioning and add them to another — ranks would silently skew
    local = materialize(part.withColumn("_lrk", F.row_number().over(w)))
    sizes = sorted((r["_pid"], r["n"]) for r in
                   local.groupBy("_pid").agg(F.count("*").alias("n"))
                        .collect())
    offsets, acc = {}, 0
    for pid, n in sizes:
        offsets[pid] = acc
        acc += n
    if not offsets:
        return df.withColumn(rank_col, F.lit(None).cast("long"))
    mapping = F.create_map(
        *[F.lit(x) for kv in offsets.items() for x in kv])
    return (local.withColumn(
                rank_col,
                (F.col("_lrk").cast("long")
                 + mapping[F.col("_pid")].cast("long")))
                 .drop("_pid", "_lrk"))
