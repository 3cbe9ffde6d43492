"""Streaming corpus ingest with incremental near-dup rejection.

The reference's analogue is the import drop-folder loop (documents
arriving under /var/lib/aktin, reference src/docker/template.yml:51,
with duplicate submissions handled by delete+re-insert); here upgraded
to the 100 TB ingestion loop: documents arrive as micro-batches; each
batch is deduped against everything SEEN so far (plus itself) via the
incremental MinHash path — the seen-corpus band table is only ever
probed by a broadcast of the new batch's band hashes, never re-paired
or shuffled — and only survivors are appended to the store.

Keep-first semantics match batch mode exactly: batch-mode
``minhash_dedup_pairs`` drops doc j when ANY smaller-id doc i is a
near-dup, even if i was itself dropped.  To reproduce that, the ingest
keeps a side store of EVERY seen doc's per-doc signature index row
(`store_path + "_minhash_index"`, schema MINHASH_INDEX_DDL: doc_id +
distinct shingle hashes + MinHash signature) and pairs each arriving
batch against it — dropped docs still participate in pairing, they
just never reach the survivor store.  At 100 TB this side store is
exactly the persisted signature index an incremental pipeline
maintains anyway, and storing signatures (not raw shingle rows) means
a batch's arrival costs one banding pass over the stored `mh` column
— the corpus is never re-shingled or re-hashed.  Streamed keep-set ==
batch keep-set is asserted in tests/test_streaming.py, including
chains where a dup's only smaller near-dup was itself dropped
(batches assumed to arrive in doc_id order, which is what an
append-only ingest produces).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..functions.barrier import materialize
from ..operators.dedup import (doc_minhash_frame, empty_minhash_index,
                               incremental_minhash_pairs_from)

DOCS_DDL = "doc_id bigint, lang string, text string"


def _overwrite_batch_partition(df: DataFrame, path: str,
                               batch_id: int) -> None:
    """Write df into path/batch_id=<id>/ replacing ONLY that partition
    (dynamic partition overwrite) — the replay-idempotence primitive.
    Readers see batch_id as a discovered partition column and project
    it away."""
    (df.withColumn("batch_id", F.lit(batch_id))
       .write.mode("overwrite")
       .option("partitionOverwriteMode", "dynamic")
       .partitionBy("batch_id")
       .parquet(path))


def process_batch(spark, batch: DataFrame, batch_id: int, store_path: str,
                  index_store: str, threshold: float) -> None:
    """One micro-batch of the ingest, IDEMPOTENT under foreachBatch
    replay: both outputs are batch_id-partitioned and written with
    dynamic partition overwrite, so a batch replayed after a failure
    between either write and the checkpoint commit OVERWRITES its own
    partition instead of appending duplicates.  The seen-index read
    excludes this batch_id: a half-committed prior attempt must not
    feed its own rows back into pairing (a batch-mate row entering via
    the order-insensitive corpus path would change the keep-set)."""
    import os
    batch = materialize(batch.select("doc_id", "lang", "text"))
    batch_index = materialize(doc_minhash_frame(batch))
    if os.path.isdir(index_store):
        seen = (spark.read.parquet(index_store)
                .filter(F.col("batch_id") != batch_id)
                .select("doc_id", "hs", "mh"))
    else:
        seen = empty_minhash_index(spark)
    pairs = incremental_minhash_pairs_from(seen, batch_index, threshold)
    drop = pairs.select(F.col("j").alias("doc_id")).distinct()
    surv = batch.join(drop, "doc_id", "left_anti")
    _overwrite_batch_partition(surv, store_path, batch_id)
    # ALL batch docs (survivors and dropped) join the pairing index
    _overwrite_batch_partition(batch_index, index_store, batch_id)


def dedup_ingest(stream: DataFrame, store_path: str, checkpoint: str, *,
                 threshold: float = 0.7) -> StreamingQuery:
    """writeStream.foreachBatch: reject near-dups, append survivors."""
    spark = stream.sparkSession
    index_store = store_path + "_minhash_index"

    def handle(batch: DataFrame, batch_id: int) -> None:
        process_batch(spark, batch, batch_id, store_path, index_store,
                      threshold)

    return (stream.writeStream.foreachBatch(handle)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start())
