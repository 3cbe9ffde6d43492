"""Streaming SCD2 ingest: snapshot versions arrive as a stream and fold
into a valid_from/valid_to history via foreachBatch — the streaming
form of operators/maintenance.scd2_apply, and the Spark shape of the
reference's monthly re-import loop (each §21 delivery is a fresh
snapshot of the reporting period; reference
src/docker/database/Dockerfile:31,33).

Contract: each micro-batch IS one complete snapshot (the file-per-
delivery landing pattern, maxFilesPerTrigger=1).  The handler reads
the previous history version's open slice, applies the SCD2 fold
stamped with this batch id, and writes the resulting FULL history as a
new ``version=batch_id`` partition via dynamic partition overwrite.

Replay idempotence is the same primitive as dedup/clean ingest: a
replayed batch overwrites its own version partition, and the
previous-version read EXCLUDES the current batch id, so a
half-committed prior attempt can never feed its own output back.

Scale note: version-complete snapshots are the right layout for
DIMENSION history (the SCD use case — bounded by entity count, not
fact volume).  A fact-scale history would swap the full-version write
for a Delta/Iceberg MERGE without changing scd2_apply's join shape.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..operators.maintenance import scd2_apply


def _prev_version(spark, history_path: str, current: int):
    """Latest committed version STRICTLY BEFORE ``current``, or None
    before the first snapshot.

    Strictly-before (not merely != current) is what makes a MID-history
    replay safe: re-running batch 3 after batches 0..5 committed must
    fold snapshot 3 onto version 2's history, not version 5's — reading
    from the future would overwrite the version=3 partition with a
    nonsensical fold even though the max-version head stayed correct."""
    if not os.path.isdir(history_path):
        return None
    hist = spark.read.parquet(history_path)
    versions = [r.version for r in
                hist.select("version").distinct().collect()
                if r.version < current]
    if not versions:
        return None
    return hist.filter(F.col("version") == max(versions)).drop("version")


def process_snapshot(spark, batch: DataFrame, batch_id: int,
                     history_path: str, keys: list[str],
                     cols: list[str]) -> None:
    stamp = f"b{batch_id:04d}"
    prev = _prev_version(spark, history_path, batch_id)
    if prev is None:
        new_hist = (batch.select(*keys, *cols)
                    .withColumn("valid_from", F.lit(stamp))
                    .withColumn("valid_to",
                                F.lit(None).cast("string")))
    else:
        closed = prev.filter(F.col("valid_to").isNotNull())
        open_slice = (prev.filter(F.col("valid_to").isNull())
                      .drop("valid_to"))
        new_hist = closed.unionByName(
            scd2_apply(open_slice, batch.select(*keys, *cols),
                       keys, cols, stamp))
    (new_hist.withColumn("version", F.lit(batch_id))
     .write.mode("overwrite")
     .option("partitionOverwriteMode", "dynamic")
     .partitionBy("version")
     .parquet(history_path))


def current_history(spark, history_path: str) -> DataFrame:
    """The latest committed history version."""
    hist = spark.read.parquet(history_path)
    latest = hist.agg(F.max("version")).first()[0]
    return hist.filter(F.col("version") == latest).drop("version")


def scd_ingest(stream: DataFrame, history_path: str, checkpoint: str,
               keys: list[str], cols: list[str]) -> StreamingQuery:
    """writeStream.foreachBatch: fold each arriving snapshot into the
    history."""
    spark = stream.sparkSession

    def handle(batch: DataFrame, batch_id: int) -> None:
        process_snapshot(spark, batch, batch_id, history_path, keys, cols)

    return (stream.writeStream.foreachBatch(handle)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start())
