"""Federated broker loop (SRC-05 / SNK-03) as a streaming source.

The reference polls a central AKTIN broker every PT1M
(broker.uris / broker.intervals injected at reference
src/build.sh:255-256) for query requests, executes them locally, and
uploads result files — a pull-based federated query layer.

Spark re-design: the request inbox is a streamed directory (requests
arrive as JSON files — replayable offsets for free via file-source
checkpointing); each micro-batch executes the requested registry query
and writes the result + a status row, mirroring the aktin schema's
request bookkeeping (aktin_init.sql, src/docker/database/Dockerfile:33).
`poll_once` is the PT1M tick (tests drive it directly; production wraps
it in a processingTime='60 seconds' trigger).
"""

from __future__ import annotations

import json
import time
from pathlib import Path

from pyspark.sql import SparkSession

from ..registry import build_registry

REQUEST_SCHEMA = "request_id string, query_key string, sf_dir string"


def submit_request(inbox: str, request_id: str, query_key: str,
                   sf_dir: str) -> None:
    """Test/client helper: drop a request file into the inbox."""
    Path(inbox).mkdir(parents=True, exist_ok=True)
    tmp = Path(inbox) / f".{request_id}.tmp"
    tmp.write_text(json.dumps({"request_id": request_id,
                               "query_key": query_key, "sf_dir": sf_dir}))
    tmp.rename(Path(inbox) / f"{request_id}.json")


def poll_once(spark: SparkSession, inbox: str, outbox: str) -> list[dict]:
    """One poll tick: stream all newly-arrived requests (availableNow),
    execute each against the registry, export results (SNK-03 JSON).

    Returns the status rows written (request bookkeeping)."""
    registry = build_registry()
    statuses: list[dict] = []

    def handle(batch, batch_id):
        for row in batch.collect():   # requests are tiny control rows
            status = {"request_id": row.request_id,
                      "query_key": row.query_key, "state": "completed"}
            try:
                df = registry[row.query_key].fn(spark, row.sf_dir)
                out = Path(outbox) / row.request_id
                df.toPandas().to_json(out.with_suffix(".json"),
                                      orient="records")
                status["rows"] = int(df.count())
            except Exception as exc:  # failed requests are recorded, not fatal
                status.update(state="failed", error=str(exc)[:200])
            statuses.append(status)

    q = (spark.readStream.schema(REQUEST_SCHEMA).json(inbox)
         .writeStream.foreachBatch(handle)
         .trigger(availableNow=True)
         .option("checkpointLocation", str(Path(outbox) / "_checkpoint"))
         .start())
    q.awaitTermination()
    Path(outbox).mkdir(parents=True, exist_ok=True)
    log = Path(outbox) / "request_log.jsonl"
    with log.open("a") as fh:
        for s in statuses:
            fh.write(json.dumps(s) + "\n")
    return statuses


def poll_loop(spark: SparkSession, inbox: str, outbox: str,
              interval_seconds: int = 60, max_ticks: int | None = None) -> None:
    """PT1M polling loop (reference parity: broker.intervals=PT1M)."""
    tick = 0
    while max_ticks is None or tick < max_ticks:
        poll_once(spark, inbox, outbox)
        tick += 1
        if max_ticks is not None and tick >= max_ticks:
            break
        time.sleep(interval_seconds)
