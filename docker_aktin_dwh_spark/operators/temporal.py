"""Temporal join operators — JN-08 interval join, JN-09 as-of join.

The provisioned workload needs these for "event within visit window"
and "latest observation before cutoff" panel constraints (SURVEY.md
§2.3; P21 date windows added by update02_add_missing_p21_dates.sql,
reference src/docker/database/Dockerfile:32).

Spark has no native interval/as-of join, so (SURVEY.md §4 custom
piece 3):

- ``range_join``   bucketizes time into window-sized buckets and turns
  the theta join into an equi join on bucket + residual predicate.
  Cost: |left| × 2 bucket rows instead of |left| × |right| nested-loop
  pairs — the difference between a shuffle join and a
  BroadcastNestedLoopJoin at 100 TB.
- ``asof_join``    is union + ordered window ("last non-null carried
  forward"), a single shuffle on the key — no range explosion at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _epoch_us(col):
    # NTZ → µs ticks; the session-TZ offset cancels out of bucket joins
    # because both sides shift identically.
    return F.unix_micros(F.col(col).cast("timestamp"))


def range_join(left: DataFrame, right: DataFrame, *,
               left_ts: str, right_ts: str,
               window_seconds: int) -> DataFrame:
    """All (l, r) pairs with r.ts in [l.ts, l.ts + window_seconds).

    Equi-join on a coarse bucket: r's bucket is either l's bucket or the
    next one, so explode the left side to those two bucket keys and
    apply the exact predicate as a post-join filter.

    If ``right_ts`` collides with a left-side column name (including
    the self-join case), the right timestamp is auto-renamed to
    ``{right_ts}_r`` in the output — the rename mints a fresh
    attribute, so Spark's ambiguous-self-join check never fires.
    """
    if right_ts in left.columns:
        renamed = right_ts + "_r"
        right = right.withColumnRenamed(right_ts, renamed)
        right_ts = renamed
    w_us = window_seconds * 1_000_000
    lb = (_epoch_us(left_ts) / w_us).cast("long")
    l2 = left.withColumn("__jb", F.explode(F.array(lb, lb + 1)))
    r2 = right.withColumn("__rb", (_epoch_us(right_ts) / w_us).cast("long"))
    out = (l2.join(r2, l2["__jb"] == r2["__rb"])
             .filter((F.col(right_ts) >= F.col(left_ts))
                     & (F.col(right_ts)
                        < F.col(left_ts) + F.expr(f"INTERVAL {window_seconds} SECONDS"))))
    return out.drop("__jb", "__rb")


def asof_join(left: DataFrame, right: DataFrame, *,
              left_key: str, right_key: str,
              left_ts: str, right_ts: str,
              value_col: str, out_col: str) -> DataFrame:
    """For each left row, the right row's value with the greatest
    right.ts <= left.ts within the same key (nearest-prior join).

    Union the streams, sort by (key, ts) with right rows ordered before
    left rows at equal timestamps (so `<=` semantics hold), then carry
    the last non-null right value forward.  One shuffle, no range blowup.
    """
    lcols = left.columns
    l2 = (left.withColumn("__k", F.col(left_key))
              .withColumn("__t", F.col(left_ts))
              .withColumn("__side", F.lit(1))
              .withColumn("__v", F.lit(None).cast(
                  dict(right.dtypes)[value_col])))
    r2 = right.select(
        F.col(right_key).alias("__k"),
        F.col(right_ts).alias("__t"),
        F.lit(0).alias("__side"),
        F.col(value_col).alias("__v"),
        *[F.lit(None).cast(t).alias(c) for c, t in left.dtypes],
    )
    combined = l2.select("__k", "__t", "__side", "__v", *lcols) \
                 .unionByName(r2.select("__k", "__t", "__side", "__v", *lcols))
    w = (Window.partitionBy("__k").orderBy("__t", "__side")
               .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    carried = combined.withColumn(
        "__asof", F.last("__v", ignorenulls=True).over(w))
    return (carried.filter(F.col("__side") == 1)
                   .select(*lcols, F.col("__asof").alias(out_col)))


def asof_join_forward(left: DataFrame, right: DataFrame, *,
                      left_key: str, right_key: str,
                      left_ts: str, right_ts: str,
                      value_col: str, out_col: str,
                      tolerance_seconds: int | None = None) -> DataFrame:
    """For each left row, the right row's value with the SMALLEST
    right.ts >= left.ts within the same key (nearest-subsequent join,
    pandas/polars ``merge_asof(direction="forward")``), optionally
    bounded by ``tolerance_seconds`` (match NULLed when the nearest
    subsequent right row is farther than the tolerance — polars'
    ``tolerance`` knob; the unbounded form is tolerance=None).

    Same single-shuffle design as :func:`asof_join`, mirrored: union
    the streams, sort DESCENDING by ts with right rows ordered before
    left rows at equal timestamps (so ``>=`` semantics hold), carry
    the last non-null (ts, value) struct forward — carrying the ts
    lets the tolerance apply as a post-window projection instead of a
    range join.  No range explosion, state per task is one series.

    Contract: ``right`` must be unique per (key, ts) — pre-aggregate
    ties (e.g. min(value)) before calling, or the carried value is
    partition-order nondeterministic.
    """
    lcols = left.columns
    vtype = dict(right.dtypes)[value_col]
    l2 = (left.withColumn("__k", F.col(left_key))
              .withColumn("__t", F.col(left_ts))
              .withColumn("__side", F.lit(1))
              .withColumn("__vt", F.lit(None).cast(
                  f"struct<t:{dict(left.dtypes)[left_ts]},v:{vtype}>")))
    r2 = right.select(
        F.col(right_key).alias("__k"),
        F.col(right_ts).alias("__t"),
        F.lit(0).alias("__side"),
        F.struct(F.col(right_ts).alias("t"),
                 F.col(value_col).alias("v")).alias("__vt"),
        *[F.lit(None).cast(t).alias(c) for c, t in left.dtypes],
    )
    combined = l2.select("__k", "__t", "__side", "__vt", *lcols) \
                 .unionByName(r2.select("__k", "__t", "__side", "__vt",
                                        *lcols))
    w = (Window.partitionBy("__k").orderBy(F.desc("__t"), "__side")
               .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    carried = combined.withColumn(
        "__nxt", F.last("__vt", ignorenulls=True).over(w))
    out = carried.filter(F.col("__side") == 1)
    v = F.col("__nxt.v")
    if tolerance_seconds is not None:
        v = F.when(
            F.col("__nxt.t").cast("timestamp")
            <= F.col("__t").cast("timestamp")
               + F.expr(f"INTERVAL {tolerance_seconds} SECONDS"),
            v)
    return out.select(*lcols, v.alias(out_col))
