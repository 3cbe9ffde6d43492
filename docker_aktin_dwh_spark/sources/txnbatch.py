"""Batch DataSource over the txnlog table format (Spark 4 Python
DataSource API): ``spark.read.format("txnlog").option("path", p)``
with optional ``option("versionAsOf", n)`` time travel — the SQL
composability surface VERDICT r10 item 3 asked for.  Registering the
source and ``CREATE TEMP VIEW``-ing a load makes snapshot reads and
time travel compose with plain SQL exactly the way ``txnlog_stream``
(sources/txnstream.py) does for streams.

Semantics are pinned to :func:`txnlog.read_table` (equality tested,
including after schema evolution and deletion-vector commits):

- the snapshot's LIVE files only (log-replayed through the newest
  usable checkpoint; crashed writers' staged orphans invisible),
- the LOGGED schema of that version (pre-evolution files NULL-fill
  the added columns; time travel below the evolution reads narrow),
- deletion vectors MASKED executor-side (each file partition carries
  its run-length ranges; the mask is one vectorized boolean filter on
  the Arrow table — no Python row loop).

Scale shape: planning is control-plane (commit JSONs only); each live
data file is one InputPartition, read in parallel through pyarrow.
The Python DataSource moves Arrow batches through the Python worker —
fine for SQL composability and moderate tables; the JVM-native path
(``txnlog.read_table``) remains the hot path for the 100 TB scan and
is what every engine operator uses internally.

Self-contained + pickle-by-value for the same deployment reason as
txnstream.py: the planner/worker processes cannot import
``docker_aktin_dwh_spark`` when the driver found the repo via its own
sys.path; byte-compatibility of the duplicated replay is pinned in
tests/test_txnlog.py.

Reference analogue: the read side of the reference's import schema —
any SQL client can SELECT the warehouse state Postgres arbitrates
(docker-aktin-dwh src/docker/database); here any Spark SQL session
composes over the snapshot the commit log arbitrates.
"""

from __future__ import annotations

import json
import os

from pyspark.sql.datasource import (DataSource, DataSourceReader,
                                    InputPartition)
from pyspark.sql.types import StructType

_LOG = "_txnlog"
_W = 20


def _log_dir(table: str) -> str:
    return os.path.join(table, _LOG)


def _versions(table: str) -> list[int]:
    try:
        names = os.listdir(_log_dir(table))
    except FileNotFoundError:
        return []
    return sorted(int(n[:_W]) for n in names
                  if n.endswith(".json") and not n.endswith(".ckpt.json")
                  and not n.startswith("."))


def _replay(table: str, version: int | None):
    """Self-contained snapshot replay (files + dv + schema) — the same
    checkpoint-bounded walk txnlog.snapshot does, duplicated because
    the DataSource planner process cannot import the package (see
    module docstring; equality pinned in tests)."""
    versions = _versions(table)
    if not versions:
        raise FileNotFoundError(f"no txnlog table at {table}")
    target = versions[-1] if version is None else int(version)
    if target not in versions:
        raise ValueError(
            f"versionAsOf {target} not in log (have "
            f"{versions[0]}..{versions[-1]})")
    files: dict[str, dict] = {}
    schema_json = None
    start = 0
    log = _log_dir(table)
    for v in sorted((int(n[:_W]) for n in os.listdir(log)
                     if n.endswith(".ckpt.json")), reverse=True):
        if v <= target:
            with open(os.path.join(log, f"{v:0{_W}d}.ckpt.json")) as f:
                ck = json.load(f)
            files = {n: dict(s) for n, s in ck["files"].items()}
            schema_json = ck.get("schema")
            start = v + 1
            break
    for v in versions:
        if v < start or v > target:
            continue
        with open(os.path.join(log, f"{v:0{_W}d}.json")) as f:
            c = json.load(f)
        for name in c.get("remove", []):
            files.pop(name, None)
        for a in c.get("add", []):
            files[a["file"]] = {"rows": a["rows"]}
        for d in c.get("dv", []):
            files[d["file"]]["dv"] = d["ranges"]
        schema_json = c.get("schema", schema_json)
    if schema_json is None:
        raise FileNotFoundError(
            f"txnlog: no schema recorded in any retained commit or "
            f"checkpoint of {table}")
    return files, _nullable_schema_json(schema_json)


def _nullable_schema_json(schema_json: str) -> str:
    """The logged schema with every field forced NULLABLE: a
    schema-evolving append logs the new column with the frame's own
    nullability, but pre-evolution files NULL-fill it on read — the
    read schema must admit those nulls (Spark's native parquet reader
    relaxes nullability the same way; an Arrow batch with nulls in a
    declared-non-nullable int column crashes the vectorized reader)."""
    d = json.loads(schema_json)
    for f in d.get("fields", []):
        f["nullable"] = True
    return json.dumps(d)


class _SnapshotFilePartition(InputPartition):
    def __init__(self, path: str, dv_ranges: list | None):
        self.path = path
        self.dv_ranges = dv_ranges


class TxnlogBatchReader(DataSourceReader):
    def __init__(self, table: str, version: int | None,
                 schema_json: str):
        self._table = table
        self._version = version
        self._schema_json = schema_json

    def partitions(self):
        files, _ = _replay(self._table, self._version)
        return [_SnapshotFilePartition(os.path.join(self._table, n),
                                       files[n].get("dv"))
                for n in sorted(files)]

    def read(self, partition: _SnapshotFilePartition):
        # executor-side: one parquet file -> Arrow batches aligned to
        # the LOGGED schema (pre-evolution files NULL-fill the added
        # columns) with the deletion vector masked — all vectorized.
        import pyarrow as pa
        from pyspark.sql.pandas.types import to_arrow_schema
        from pyspark.sql.types import StructType as _ST
        import pyarrow.parquet as pq

        target = to_arrow_schema(_ST.fromJson(
            json.loads(self._schema_json)))
        t = pq.read_table(partition.path)
        cols = []
        for field in target:
            if field.name in t.column_names:
                cols.append(t.column(field.name).cast(field.type))
            else:
                cols.append(pa.nulls(t.num_rows, field.type))
        t = pa.table(dict(zip(target.names, cols)), schema=target)
        if partition.dv_ranges:
            import numpy as np
            keep = np.ones(t.num_rows, dtype=bool)
            for s, e in partition.dv_ranges:
                keep[s:e + 1] = False
            t = t.filter(pa.array(keep))
        yield from t.to_batches()


class TxnlogBatchDataSource(DataSource):
    """``spark.read.format("txnlog").option("path", p)
    [.option("versionAsOf", n)]`` — register with
    ``spark.dataSource.register(TxnlogBatchDataSource)``."""

    @classmethod
    def name(cls) -> str:
        return "txnlog"

    def _version(self) -> int | None:
        v = self.options.get("versionAsOf")
        return None if v is None else int(v)

    def schema(self) -> StructType:
        _, schema_json = _replay(self.options["path"], self._version())
        return StructType.fromJson(json.loads(schema_json))

    def reader(self, schema: StructType) -> TxnlogBatchReader:
        # Pin a CONCRETE version for latest reads (ADVICE r11): with
        # version=None, partitions() would replay the log AGAIN at
        # execution time, so a commit landing between plan and execute
        # reads a newer file set under the older snapshot's schema — a
        # non-repeatable read within one query.  Resolving latest →
        # integer here makes partitions() replay the exact snapshot
        # the schema came from.
        version = self._version()
        if version is None:
            version = _versions(self.options["path"])[-1]
        _, schema_json = _replay(self.options["path"], version)
        return TxnlogBatchReader(self.options["path"], version,
                                 schema_json)


def register(spark) -> None:
    """Idempotently register the batch source on a session."""
    spark.dataSource.register(TxnlogBatchDataSource)


def _register_by_value() -> None:
    import sys
    try:
        from pyspark import cloudpickle
        cloudpickle.register_pickle_by_value(sys.modules[__name__])
    except Exception:                       # pragma: no cover - old API
        pass


_register_by_value()
