"""Streaming SOURCE over the txnlog commit log (Spark 4 Python
DataSource API): stream offsets are commit VERSIONS, and each
micro-batch reads exactly the data files the commits in
``(start, end]`` added — the table's append history replayed with
commit-boundary fidelity.  This is the design Delta Lake's streaming
source uses (public protocol spec): version-based offsets over an
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
batch form).  ``option("skipChangeCommits", "true")`` is Delta's
escape hatch, implemented here with the same semantics: commits that
remove files are SKIPPED ENTIRELY (their adds are NOT emitted — a
merge's rewritten files carry mostly old rows, so emitting them would
re-deliver history; skipping the whole commit under-delivers instead,
which is the documented Delta trade-off), while pure appends keep
flowing.

DEPLOYMENT CONSTRAINT (the reason this module is self-contained and
registered for pickle-BY-VALUE below): Spark plans a Python data
source in a dedicated ``python_streaming_source_runner`` process that
unpickles the DataSource/reader WITHOUT applying ``addPyFile``
includes — unlike regular UDF workers, it cannot import
``docker_aktin_dwh_spark`` when the driver found the repo only via
its own sys.path (the correctness driver's situation; reproduced:
ModuleNotFoundError from ``worker_util.read_command``).  So (a) this
module duplicates the ~20 lines of commit-log reading it needs
instead of importing ``txnlog`` (kept byte-compatible by
tests/test_txnlog.py, which drives both against the same tables), and
(b) ``cloudpickle.register_pickle_by_value`` makes the classes travel
as definitions, not references.  read() on executors needs only
stdlib + pyarrow.

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

#: mirrors txnlog's layout constants — self-contained on purpose (see
#: module docstring); byte-compatibility pinned in tests.
_LOG = "_txnlog"
_W = 20


def _commit_path(table: str, version: int) -> str:
    return os.path.join(table, _LOG, f"{version:0{_W}d}.json")


def _versions(table: str) -> list[int]:
    try:
        names = os.listdir(os.path.join(table, _LOG))
    except FileNotFoundError:
        return []
    return sorted(int(n[:_W]) for n in names
                  if n.endswith(".json") and not n.endswith(".ckpt.json")
                  and not n.startswith("."))


class _FilePartition(InputPartition):
    def __init__(self, path: str, version: int,
                 pv: dict | None = None):
        self.path = path
        self.version = version
        #: raw hive partition-value fragments from the add action
        #: (r14 partitioned tables) — decoded executor-side
        self.pv = pv


_HIVE_NULL = "__HIVE_DEFAULT_PARTITION__"


def _pv_constant(raw, n, arrow_type):
    """Partition column as a typed constant Arrow column (r14): the
    raw hive fragment unescapes and casts through Arrow's string
    parser; the null marker yields nulls."""
    import pyarrow as pa
    from urllib.parse import unquote
    if raw is None or raw == _HIVE_NULL:
        return pa.nulls(n, arrow_type)
    return pa.array([unquote(raw)] * n).cast(arrow_type)


def _latest_colmap(table: str) -> dict | None:
    """The newest logical → physical column map (r13 column mapping),
    replayed the same way schema() replays the schema — None for
    identity tables.  Physical names are rename-stable, so the latest
    map correctly projects files of EVERY commit."""
    colmap = None
    seeded = False
    for v in _versions(table):
        with open(_commit_path(table, v)) as f:
            c = json.load(f)
        if "colmap" in c:
            colmap = c["colmap"]
            seeded = True
    if not seeded:
        log = os.path.join(table, _LOG)
        for n in sorted(os.listdir(log)):
            if n.endswith(".ckpt.json"):
                with open(os.path.join(log, n)) as f:
                    colmap = json.load(f).get("colmap", colmap)
    return colmap


class TxnlogStreamReader(DataSourceStreamReader):
    def __init__(self, path: str, skip_change_commits: bool = False,
                 schema_json: str | None = None,
                 colmap: dict | None = None):
        self._path = path
        self._skip_change = skip_change_commits
        self._schema_json = schema_json
        self._colmap = colmap

    def initialOffset(self) -> dict:
        return {"version": -1}

    def latestOffset(self) -> dict:
        vs = _versions(self._path)
        if not vs:
            raise FileNotFoundError(f"no txnlog table at {self._path}")
        return {"version": vs[-1]}

    def partitions(self, start: dict, end: dict):
        parts: list[_FilePartition] = []
        for v in range(start["version"] + 1, end["version"] + 1):
            with open(_commit_path(self._path, v)) as f:
                c = json.load(f)
            if c.get("data_change") is False:
                # the commit declares its rows IDENTICAL to the prior
                # version (compact/OPTIMIZE, or a synced foreign
                # commit whose actions all carry dataChange=false):
                # Delta's streaming source skips such commits without
                # any option, and so does this one — emitting the
                # rewritten files would re-deliver history
                continue
            if c.get("remove") or c.get("dv") or c.get("op") == "restore":
                # a deletion-vector commit changes rows without
                # changing file membership, and a RESTORE re-adds OLD
                # files (emitting them would re-deliver history) —
                # both are CHANGE commits exactly like a rewrite and
                # trip the same guard
                if self._skip_change:
                    continue        # Delta's skipChangeCommits: the
                    # WHOLE commit is skipped (its adds are rewritten
                    # files carrying old rows — emitting them would
                    # re-deliver history)
                raise ValueError(
                    f"txnlog_stream: version {v} ({c.get('op')}) removes "
                    f"or deletion-vectors rows — this source tails "
                    f"APPEND-ONLY history; rewrites need the CDC form "
                    f"(txnlog.table_changes) "
                    f"or option('skipChangeCommits', 'true')")
            for a in c.get("add", []):
                parts.append(_FilePartition(
                    os.path.join(self._path, a["file"]), v,
                    a.get("pv")))
        return parts

    def read(self, partition: _FilePartition):
        # executor-side: one parquet file -> Arrow batches with the
        # commit version appended (vectorized, no per-row Python).
        # Files store PHYSICAL column names under column mapping and
        # pre-evolution files lack later columns — align each file to
        # the declared logical schema (cast + NULL-fill), exactly like
        # the batch DataSource's read.
        import pyarrow as pa
        import pyarrow.parquet as pq
        t = pq.read_table(partition.path)
        if self._schema_json is not None:
            from pyspark.sql.pandas.types import to_arrow_schema
            from pyspark.sql.types import StructType as _ST
            target = to_arrow_schema(_ST.fromJson(
                json.loads(self._schema_json)))
            cm = self._colmap or {}
            pv = partition.pv or {}
            cols = []
            for field in target:
                phys = cm.get(field.name, field.name)
                if phys in t.column_names:
                    cols.append(t.column(phys).cast(field.type))
                elif phys in pv:
                    # r14 partitioned tables: the column lives in the
                    # directory name, not the file
                    cols.append(_pv_constant(pv[phys], t.num_rows,
                                             field.type))
                else:
                    cols.append(pa.nulls(t.num_rows, field.type))
            t = pa.table(dict(zip(target.names, cols)), schema=target)
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
        # replay the schema from the newest commit that recorded one
        # (create/replace record it; the planner process cannot import
        # txnlog.snapshot — see module docstring)
        schema_json = None
        table = self.options["path"]
        for v in _versions(table):
            with open(_commit_path(table, v)) as f:
                schema_json = json.load(f).get("schema", schema_json)
        if schema_json is None:
            # fall back to any checkpoint (history may be truncated)
            log = os.path.join(table, _LOG)
            for n in sorted(os.listdir(log)):
                if n.endswith(".ckpt.json"):
                    with open(os.path.join(log, n)) as f:
                        schema_json = json.load(f).get("schema")
        if schema_json is None:
            # no retained commit or checkpoint records a schema —
            # name the table instead of json.loads(None)'s opaque
            # TypeError (ADVICE r9)
            raise FileNotFoundError(
                f"txnlog_stream: no schema recorded in any retained "
                f"commit or checkpoint of {table} — is this a txnlog "
                f"table (created via txnlog.create_table)?")
        logged = StructType.fromJson(json.loads(schema_json))
        return StructType(list(logged.fields)
                          + [StructField("_commit_version", LongType(),
                                         False)])

    def streamReader(self, schema: StructType) -> TxnlogStreamReader:
        skip = str(self.options.get("skipChangeCommits", "false"))
        # the declared schema minus the appended _commit_version is the
        # logical table schema read() aligns every file to
        logical = StructType([f for f in schema.fields
                              if f.name != "_commit_version"])
        return TxnlogStreamReader(self.options["path"],
                                  skip_change_commits=skip.lower()
                                  == "true",
                                  schema_json=logical.json(),
                                  colmap=_latest_colmap(
                                      self.options["path"]))


def register(spark) -> None:
    """Idempotently register the stream source — once per session
    under a lock: DataSourceManager.register REPLACES an existing
    entry, so re-registering from a pooled worker thread opens a
    lookup-miss window for queries mid-plan on other threads (see
    txnbatch.register)."""
    with _REGISTER_LOCK:
        if spark not in _REGISTERED:
            spark.dataSource.register(TxnlogStreamDataSource)
            _REGISTERED.add(spark)


_REGISTER_LOCK = __import__("threading").Lock()
_REGISTERED = __import__("weakref").WeakSet()


def _register_by_value() -> None:
    """Make this module's classes cloudpickle BY VALUE so the data
    source survives processes that never see our package on sys.path
    (the streaming-source runner; any executor without the pyFiles
    zip applied)."""
    import sys
    try:
        from pyspark import cloudpickle
        cloudpickle.register_pickle_by_value(sys.modules[__name__])
    except Exception:                       # pragma: no cover - old API
        pass


_register_by_value()
