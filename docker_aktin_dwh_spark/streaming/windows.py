"""Structured Streaming window operators — STR-01..STR-06 (SURVEY.md §2.8).

The reference's continuous behaviors are cron-style (broker poll PT1M
at src/build.sh:256, file-drop imports into /var/lib/aktin at
src/docker/template.yml:51); these are their Structured Streaming
upgrades.  Every builder takes a *streaming* DataFrame of the events
shape (event_id, ts, user_id, event_type, value, props) and returns a
transformed streaming frame — the replay tests assert streamed results
equal the batch equivalents in operators/relational.py (str_02/03/04/06).

Watermarks bound state: at 100 TB/day of events, the 2-hour watermark
caps the window state store instead of letting it grow unboundedly
(the reference's analogue is re-import of late CDA corrections,
SNK-01).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENTS_DDL = ("event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")


def file_source(spark: SparkSession, path: str,
                fmt: str = "parquet") -> DataFrame:
    """STR-01: file-arrival streaming source (directory watch upgrade
    of the import-script drop folder)."""
    reader = spark.readStream.format(fmt).schema(EVENTS_DDL)
    if fmt == "csv":
        reader = reader.option("sep", ";").option("header", "true")
    return reader.load(path)


def tumbling_counts(events: DataFrame, size: str = "1 hour",
                    watermark: str = "2 hours") -> DataFrame:
    """STR-02 (+STR-05 watermark): hourly arrival counts."""
    return (events.withWatermark("ts", watermark)
            .groupBy(F.window("ts", size).alias("w"))
            .agg(F.count("*").alias("n"))
            .select(F.col("w.start").alias("ws"), "n"))


def sliding_counts(events: DataFrame, size: str = "1 hour",
                   slide: str = "15 minutes",
                   watermark: str = "2 hours") -> DataFrame:
    """STR-03: rolling census."""
    return (events.withWatermark("ts", watermark)
            .groupBy(F.window("ts", size, slide).alias("w"))
            .agg(F.count("*").alias("n"))
            .select(F.col("w.start").alias("ws"), "n"))


def session_counts(events: DataFrame, gap: str = "30 minutes",
                   watermark: str = "2 hours") -> DataFrame:
    """STR-04: visit sessionization per user."""
    return (events.withWatermark("ts", watermark)
            .groupBy("user_id", F.session_window("ts", gap).alias("w"))
            .agg(F.count("*").alias("n_events"))
            .select("user_id", F.col("w.start").alias("sess_start"),
                    "n_events"))


def dedup_stream(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """STR-06: drop duplicate document submissions within the watermark."""
    return (events.withWatermark("ts", watermark)
            .dropDuplicatesWithinWatermark(["event_id"]))


def enrich_with_dim(events: DataFrame, dim: DataFrame,
                    on: str = "event_type") -> DataFrame:
    """STR-08: stream–static broadcast join (arriving facts × concept
    dimension)."""
    return events.join(F.broadcast(dim), on, "left")
