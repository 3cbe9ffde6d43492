"""Skew mitigation: salted aggregation and salted broadcast-side join.

At 100 TB a handful of hot keys (one mega-encounter, a default concept
code, an empty-string zip) make one shuffle partition the straggler.
AQE skew-join splitting (on in session.py) handles the join case at
runtime; these helpers cover the two patterns AQE does not:

- ``salted_agg``: two-phase aggregation for algebraic aggregates over a
  skewed key — partial agg on (key, salt), final agg on key.  The first
  shuffle spreads a hot key over `n_salts` reducers.
- ``replicated_broadcast_join``: when the build side is small enough to
  broadcast, joining against a salted probe side needs the build rows
  replicated per salt.  Useful when the *stream* side must stay salted
  for a downstream salted aggregation (salting, then unsalting, then
  shuffling again would waste the shuffle).

Both are result-identical to their unsalted forms (property-tested in
tests/test_skew.py).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def with_salt(df: DataFrame, n_salts: int) -> DataFrame:
    """Uniform random salt in [0, n_salts).  rand() is seeded per-task —
    fine: the salt only routes rows, it never reaches results."""
    return df.withColumn(
        SALT_COL, (F.rand(seed=42) * n_salts).cast("int"))


#: algebraic aggregates: (partial fn, merge fn)
_ALGEBRAIC = {
    "count": (F.count, F.sum),
    "sum": (F.sum, F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def salted_agg(df: DataFrame, keys: Sequence[str],
               aggs: dict[str, tuple[str, str]],
               n_salts: int = 16) -> DataFrame:
    """Two-phase aggregation over skewed `keys`.

    `aggs` maps output name -> (fn, column) with fn one of
    count/sum/min/max — aggregates whose partials merge algebraically
    (count merges via sum).  avg is expressed as sum+count by the
    caller.
    """
    partials, finals = [], []
    for name, (fn, col) in aggs.items():
        partial_fn, merge_fn = _ALGEBRAIC[fn]
        partials.append(partial_fn(col).alias(f"__p_{name}"))
        finals.append(merge_fn(f"__p_{name}").alias(name))
    return (with_salt(df, n_salts)
            .groupBy(*keys, SALT_COL).agg(*partials)
            .groupBy(*keys).agg(*finals))


def replicated_broadcast_join(salted_probe: DataFrame, build: DataFrame,
                              on: Sequence[str], n_salts: int = 16,
                              how: str = "inner") -> DataFrame:
    """Join a salted probe side against a small build side by
    replicating each build row once per salt value, keeping the probe's
    salt column intact for downstream salted operations."""
    replicated = build.withColumn(
        SALT_COL, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))))
    return salted_probe.join(F.broadcast(replicated),
                             [*on, SALT_COL], how)
