"""Streaming SOURCE over the txnlog commit log (Spark 4 Python
DataSource API): stream offsets are commit VERSIONS, and each
micro-batch reads exactly the data files the commits in
``(start, end]`` added — the table's append history replayed with
commit-boundary fidelity.  This is the design Delta Lake's streaming
source uses (public protocol docs): version-based offsets over an
ACID log, so the stream sees only COMMITTED files (a crashed writer's
staged orphans are invisible — same isolation read_table enjoys), and
restart resumes from the checkpointed version with no loss and no
re-delivery.

Every emitted row carries ``_commit_version`` — the log position that
added it — which makes the version→row assignment certifiable by a
batch oracle.

Scale shape: ``partitions()`` is control-plane (reads commit JSONs,
never data); each data file becomes one InputPartition, so executors
read files in parallel through pyarrow and hand Spark Arrow record
batches (zero row-at-a-time Python).  At 100 TB the per-batch work is
proportional to the files the tailed commits added, never the table.

Honest guard: this is an APPEND-ONLY source.  A commit that removes
files (merge/delete/compact/replace) raises — streaming semantics for
rewrites would need change-data capture (txnlog.table_changes is the
batch form; Delta's ``skipChangeCommits`` analogue is future scope).

Reference analogue: the broker's incremental poll loop
(/root/reference/src/docker/template.yml:51) generalized to
transactional commit tailing.
"""

from __future__ import annotations

import json
import os

from pyspark.sql.datasource import (DataSource, DataSourceStreamReader,
                                    InputPartition)
from pyspark.sql.types import LongType, StructField, StructType


class _FilePartition(InputPartition):
    def __init__(self, path: str, version: int):
        self.path = path
        self.version = version


class TxnlogStreamReader(DataSourceStreamReader):
    def __init__(self, path: str):
        self._path = path

    def initialOffset(self) -> dict:
        return {"version": -1}

    def latestOffset(self) -> dict:
        from . import txnlog
        return {"version": txnlog.snapshot(self._path).version}

    def partitions(self, start: dict, end: dict):
        from . import txnlog
        parts: list[_FilePartition] = []
        log = txnlog._log_dir(self._path)
        for v in range(start["version"] + 1, end["version"] + 1):
            with open(os.path.join(log, txnlog._commit_name(v))) as f:
                c = json.load(f)
            if c.get("remove"):
                raise ValueError(
                    f"txnlog_stream: version {v} ({c.get('op')}) removes "
                    f"files — this source tails APPEND-ONLY history; "
                    f"rewrites need the CDC form (txnlog.table_changes)")
            for a in c.get("add", []):
                parts.append(_FilePartition(
                    os.path.join(self._path, a["file"]), v))
        return parts

    def read(self, partition: _FilePartition):
        # executor-side: one parquet file -> Arrow batches with the
        # commit version appended (vectorized, no per-row Python)
        import pyarrow as pa
        import pyarrow.parquet as pq
        t = pq.read_table(partition.path)
        ver = pa.nulls(t.num_rows, pa.int64()).fill_null(partition.version)
        t = t.append_column("_commit_version", ver)
        yield from t.to_batches()

    def commit(self, end: dict) -> None:
        pass


class TxnlogStreamDataSource(DataSource):
    """``spark.readStream.format("txnlog_stream").option("path", p)`` —
    register with ``spark.dataSource.register(TxnlogStreamDataSource)``."""

    @classmethod
    def name(cls) -> str:
        return "txnlog_stream"

    def schema(self) -> StructType:
        from . import txnlog
        snap = txnlog.snapshot(self.options["path"])
        logged = StructType.fromJson(json.loads(snap.schema_json))
        return StructType(list(logged.fields)
                          + [StructField("_commit_version", LongType(),
                                         False)])

    def streamReader(self, schema: StructType) -> TxnlogStreamReader:
        return TxnlogStreamReader(self.options["path"])
