"""Materialization barrier for subtrees consumed by racing consumers.

Several operators feed one computed frame into both sides of a
self-join (LSH band buckets, shingle sets) or into a sink that
overwrites its own input (partition-scoped upsert).  A lazy
``persist()`` is NOT a barrier there: when both consumers sit in one
job, the sides race and each computes the subtree before either
populates the cache (measured: the signature subtree ran twice).

``materialize`` is the single switch point for that barrier:

- local / tests: eager ``localCheckpoint()`` — truncates lineage and
  pins the partitions on the executors.
- real cluster: swap the body for ``persist(StorageLevel.DISK_ONLY)``
  + ``count()``, or a write to a Delta/parquet scratch table, so the
  barrier survives executor loss (localCheckpoint does not) and is not
  bounded by executor storage memory.  The call sites don't change.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def materialize(df: DataFrame) -> DataFrame:
    """Eagerly compute ``df`` once; return a frame reading the result."""
    return df.localCheckpoint()
