"""Bucketed fact storage — the scale replacement for the reference's
B-tree indexes.

The provisioned i2b2 schema leans on PostgreSQL B-tree indexes over
(concept_cd, patient_num, dates) [SURVEY.md §4, anchored to the CRC
schema at reference src/docker/database/Dockerfile:25-34].  Spark has
no secondary indexes; the equivalents are:

- month partitioning on start_date  -> partition pruning for FLT-03
  date windows (the index-seek analogue for time),
- bucketBy(patient_num)             -> co-located, shuffle-free joins
  and aggregations on the patient key (the index analogue for the
  cohort semi-join chains, which all key on patient_num).

Writing bucketed requires the session catalog (saveAsTable); reading
back, joins between two tables bucketed the same way plan without an
Exchange on the bucketed key — asserted in tests/test_bucketing.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table: str, *, bucket_col: str,
                   n_buckets: int = 16,
                   sort_col: str | None = None) -> None:
    writer = (df.write.mode("overwrite")
                .bucketBy(n_buckets, bucket_col))
    if sort_col:
        writer = writer.sortBy(sort_col)
    writer.format("parquet").saveAsTable(table)


def bucketed_join(spark: SparkSession, left_table: str, right_table: str,
                  on: str, how: str = "inner") -> DataFrame:
    """Join two same-bucketed tables on the bucket key.  With matching
    bucket specs Spark plans a sort-merge join with NO shuffle exchange
    on either side — at 100 TB this is the difference between moving
    both tables and moving nothing."""
    return spark.table(left_table).join(spark.table(right_table), on, how)
