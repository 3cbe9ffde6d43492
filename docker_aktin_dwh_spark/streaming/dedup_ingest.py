"""Streaming corpus ingest with incremental near-dup rejection.

The reference's analogue is the import drop-folder loop (documents
arriving under /var/lib/aktin, reference src/docker/template.yml:51,
with duplicate submissions handled by delete+re-insert); here upgraded
to the 100 TB ingestion loop: documents arrive as micro-batches; each
batch is deduped against the ENTIRE corpus kept so far (plus itself)
via the incremental MinHash path — the stored corpus is only ever
probed by a broadcast of the new batch's band hashes, never re-paired
or shuffled — and only survivors are appended to the store.

Keep-first semantics: within the arriving stream, the earlier doc_id
wins (batches are assumed to arrive in doc_id order, which is what an
append-only ingest produces).  The batch-mode equivalent of the final
store is therefore exactly `minhash_dedup_pairs(all_docs)`'s
drop-the-larger-id rule — asserted in tests/test_streaming.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..functions.barrier import materialize
from ..operators.dedup import (_shingle_hash_rows, incremental_minhash_pairs,
                               minhash_dedup_pairs)

DOCS_DDL = "doc_id bigint, lang string, text string"


def dedup_ingest(stream: DataFrame, store_path: str, checkpoint: str, *,
                 threshold: float = 0.7) -> StreamingQuery:
    """writeStream.foreachBatch: reject near-dups, append survivors."""
    spark = stream.sparkSession

    def handle(batch: DataFrame, batch_id: int) -> None:
        import os
        batch = materialize(batch.select("doc_id", "lang", "text"))
        if os.path.isdir(store_path):
            corpus = spark.read.parquet(store_path)
            pairs = incremental_minhash_pairs(
                _shingle_hash_rows(corpus), batch, threshold)
        else:
            pairs = minhash_dedup_pairs(batch, threshold)
        drop = pairs.select(F.col("j").alias("doc_id")).distinct()
        surv = batch.join(drop, "doc_id", "left_anti")
        surv.write.mode("append").parquet(store_path)

    return (stream.writeStream.foreachBatch(handle)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start())
