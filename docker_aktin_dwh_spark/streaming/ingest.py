"""Streaming ingest pipeline (STR-01 + STR-09): directory watch →
parse → idempotent MERGE per micro-batch.

This is the Structured Streaming upgrade of the reference's CDA/P21
import flow (SURVEY.md §3.2): files dropped under /var/lib/aktin
(volume at reference src/docker/template.yml:51) become micro-batches;
each batch merges by encounter key, so re-submitted documents replace
their own facts exactly like the reference's delete+insert re-import.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from ..sources.upsert import merge_upsert, write_initial


def stream_merge_to_table(stream: DataFrame, table_path: str,
                          checkpoint: str, *,
                          key: str = "encounter_num",
                          ts_col: str = "start_date") -> StreamingQuery:
    """writeStream.foreachBatch(MERGE) — upsert semantics of SNK-01 in
    streaming.  Exactly-once per batch via the checkpoint + the merge
    being idempotent by key.  The table is the txnlog ACID format by
    default (write_initial's r10 default): every micro-batch MERGE is
    an atomic log commit, so a batch retried after a crash re-merges
    idempotently and readers never observe a half-applied rewrite."""
    spark = stream.sparkSession
    state = {"initialized": False}

    def handle(batch: DataFrame, batch_id: int) -> None:
        import os
        if not state["initialized"] and not os.path.isdir(table_path):
            write_initial(batch, table_path, ts_col, key=key)
        else:
            merge_upsert(spark, table_path, batch, key=key, ts_col=ts_col)
        state["initialized"] = True

    return (stream.writeStream.foreachBatch(handle)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start())
