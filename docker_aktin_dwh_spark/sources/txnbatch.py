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

SQL surface boundary (verified, r12): ``CREATE TABLE ... USING
txnlog OPTIONS (path ...)`` resolves the table's SCHEMA (the options
reach schema() as a ``file:`` URI — normalized by _norm_path), but
Spark 4.1 constructs a FRESH DataSource with EMPTY options for the
actual scan and for ``INSERT INTO`` writes (verified with an options
spy on reader()/writer()), so catalog-table reads/writes cannot work
for ANY Python data source yet — an upstream plumbing gap, not a
format one.  The supported SQL composition path is ds_01's: ``load()``
+ ``createOrReplaceTempView`` for reads, ``df.write.format`` /
``writeStream.format`` for writes.
"""

from __future__ import annotations

import json
import os

from pyspark.sql.datasource import (DataSource, DataSourceArrowWriter,
                                    DataSourceReader,
                                    DataSourceStreamArrowWriter,
                                    InputPartition, WriterCommitMessage)
from pyspark.sql.types import StructType

_LOG = "_txnlog"
_W = 20


def _norm_path(p: str) -> str:
    """Spark's catalog layer normalizes a table's ``path`` option to a
    ``file:`` URI (``CREATE TABLE ... USING txnlog OPTIONS (path ...)``
    then SELECT hands the reader ``file:/abs/path``); local filesystem
    calls need the plain path back."""
    if p.startswith("file://"):
        return p[len("file://"):] or "/"
    if p.startswith("file:"):
        return p[len("file:"):]
    return p


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


_UNSET = object()


def _resolve_timestamp(table: str, ts) -> int:
    """Epoch seconds or ISO 'YYYY-MM-DD[ HH:MM:SS]' → newest version
    whose commit-file mtime (monotonized — Delta's rule) is <= target.
    Verbatim mirror of txnlog.resolve_timestamp, self-contained for
    the same reason as _replay_meta."""
    import datetime
    try:
        target = float(ts)
    except ValueError:
        target = datetime.datetime.fromisoformat(str(ts)).timestamp()
    versions = _versions(table)
    if not versions:
        raise FileNotFoundError(f"no txnlog table at {table}")
    eff, run = [], float("-inf")
    for vv in versions:
        m = os.stat(os.path.join(
            _log_dir(table), f"{vv:0{_W}d}.json")).st_mtime
        run = max(run, m)
        eff.append((vv, run))
    if target < eff[0][1]:
        raise ValueError(
            f"timestampAsOf {ts} predates the first retained commit")
    return max(vv for vv, m in eff if m <= target)


def _replay_meta(table: str, version: int | None):
    """Self-contained snapshot replay — the same checkpoint-bounded
    walk txnlog.snapshot does, duplicated because the DataSource
    planner/committer processes cannot import the package (see module
    docstring; equality pinned in tests).  Returns (files,
    raw_schema_json, txns, constraints, key, colmap,
    resolved_version, partition_by)."""
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
    txns: dict[str, int] = {}
    constraints: dict[str, str] = {}
    key = None
    colmap: dict[str, str] | None = None
    partition_by = None
    start = 0
    log = _log_dir(table)
    for v in sorted((int(n[:_W]) for n in os.listdir(log)
                     if n.endswith(".ckpt.json")), reverse=True):
        if v <= target:
            with open(os.path.join(log, f"{v:0{_W}d}.ckpt.json")) as f:
                ck = json.load(f)
            files = {n: dict(s) for n, s in ck["files"].items()}
            schema_json = ck.get("schema")
            txns = dict(ck.get("txns", {}))
            constraints = dict(ck.get("constraints", {}))
            colmap = ck.get("colmap")
            key = ck.get("key")
            partition_by = ck.get("partition_by")
            start = v + 1
            if "key" not in ck or "colmap" not in ck:
                # pre-r13 checkpoint without the column-mapping
                # fields: recover key/colmap from retained commits
                # BELOW the checkpoint, exactly as txnlog.snapshot
                # does (ADVICE r14 — the two replays must agree, and
                # the writer must never stage logical-named files
                # into a physically-mapped layout).
                for pv in versions:
                    if pv >= start:
                        break
                    with open(os.path.join(
                            log, f"{pv:0{_W}d}.json")) as pf:
                        pc = json.load(pf)
                    if "key" not in ck and "key" in pc:
                        key = pc["key"]
                    if "colmap" not in ck and "colmap" in pc:
                        colmap = pc["colmap"]
            break
    for v in versions:
        if v < start or v > target:
            continue
        with open(os.path.join(log, f"{v:0{_W}d}.json")) as f:
            c = json.load(f)
        for name in c.get("remove", []):
            files.pop(name, None)
        for a in c.get("add", []):
            files[a["file"]] = {"rows": a["rows"],
                                "cols": a.get("cols") or {},
                                "pv": a.get("pv")}
        for d in c.get("dv", []):
            files[d["file"]]["dv"] = d["ranges"]
        schema_json = c.get("schema", schema_json)
        if "constraints" in c:
            constraints = dict(c["constraints"])
        if "colmap" in c:
            colmap = c["colmap"]
        if "key" in c:
            key = c["key"]
        if "partition_by" in c:
            partition_by = c["partition_by"]
        t = c.get("txn")
        if t:
            txns[t["app"]] = max(t["version"],
                                 txns.get(t["app"], t["version"]))
    if schema_json is None:
        raise FileNotFoundError(
            f"txnlog: no schema recorded in any retained commit or "
            f"checkpoint of {table}")
    return (files, schema_json, txns, constraints, key, colmap,
            target, partition_by)


def _replay(table: str, version: int | None):
    """(files, nullable schema, colmap) — the read-path view of
    _replay_meta (kept as the reader's seam; byte-compat pinned in
    tests)."""
    (files, schema_json, _t, _c, _k, colmap, _v,
     _p) = _replay_meta(table, version)
    return files, _nullable_schema_json(schema_json), colmap


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
    def __init__(self, path: str, dv_ranges: list | None,
                 pv: dict | None = None):
        self.path = path
        self.dv_ranges = dv_ranges
        #: raw hive partition-value fragments from the add action
        #: (r14 partitioned tables) — decoded executor-side
        self.pv = pv


_HIVE_NULL = "__HIVE_DEFAULT_PARTITION__"


def _pv_constant(raw: str | None, n: int, arrow_type):
    """One partition column as a constant Arrow column: the raw hive
    dir fragment unescapes and casts through Arrow's string parser
    (ISO dates/timestamps, decimals, ints — the same value space
    txnlog._pv_decode covers); the null marker yields nulls."""
    import pyarrow as pa
    from urllib.parse import unquote
    if raw is None or raw == _HIVE_NULL:
        return pa.nulls(n, arrow_type)
    return pa.array([unquote(raw)] * n).cast(arrow_type)


def _stats_decode(v):
    """Inverse of txnlog._stats_encode (duplicated — self-contained
    module; byte-compat pinned in tests/test_txnlog.py)."""
    import datetime
    if isinstance(v, dict):
        if v.get("t") == "ts":
            return datetime.datetime.fromisoformat(v["v"])
        if v.get("t") == "d":
            return datetime.date.fromisoformat(v["v"])
    return v


def _interval_hit(stats: dict, col: str, op: str, val) -> bool:
    """Same contract as txnlog._interval_hit: False only when the
    file's recorded [min, max] PROVES no row can match."""
    iv = (stats.get("cols") or {}).get(col)
    if iv is None:
        return True
    lo, hi = _stats_decode(iv[0]), _stats_decode(iv[1])
    try:
        if op == "=":
            return lo <= val <= hi
        if op == "<":
            return lo < val
        if op == "<=":
            return lo <= val
        if op == ">":
            return hi > val
        if op == ">=":
            return hi >= val
        if op == "in":
            return any(lo <= v <= hi for v in val)
    except TypeError:
        return True
    return True


class TxnlogBatchReader(DataSourceReader):
    def __init__(self, table: str, version: int | None,
                 schema_json: str, skipping: bool = False,
                 pruning: list | None = None,
                 colmap: dict[str, str] | None = None):
        self._table = table
        self._version = version
        self._schema_json = schema_json
        self._skipping = skipping
        self._pruning: list[tuple[str, str, object]] = pruning or []
        # logical → physical column map (r13 column mapping; None =
        # identity).  Pruning conjuncts arrive logical; footer stats
        # are keyed physical (rename-stable).
        self._colmap = colmap

    def pushFilters(self, filters):
        """File-skipping pushdown (Spark 4.1 DataSource filter API):
        translate the simple comparison filters into (col, op,
        literal) conjuncts evaluated against the per-column [min, max]
        intervals each commit records (txnlog._file_stats), so
        partitions() emits only interval-hit files.  EVERY filter is
        returned as residual — the skip is file-granular, Spark still
        applies the row-level predicate (Delta's data-skipping
        contract).

        OPT-IN via ``.option("dataSkipping", "true")``, because Spark
        4.1's PythonDataSourceV2 caches ONE read plan per relation
        and `PythonScanBuilder.pushFilters` OVERWRITES it
        (setReadInfo): a filter-dependent partition list makes a
        later, differently-filtered query on the SAME loaded
        DataFrame silently reuse the pruned file set — e.g.
        ``r.filter(...).count(); r.count()`` returns the pruned
        count (verified against a minimal pure datasource; upstream
        bug, not protocol-specific).  Default off = the partition
        list never depends on pushed filters = plan reuse is always
        correct.  Turn it on for one-shot relations (load → one
        query), or use the always-safe explicit routes:
        ``option("filters", json)`` (pruning pinned at load, every
        query on the relation sees the same declared subset) or
        ``txnlog.read_table(filters=...)``."""
        if not self._skipping:
            return filters
        from pyspark.sql.datasource import (EqualTo, GreaterThan,
                                            GreaterThanOrEqual, In,
                                            LessThan, LessThanOrEqual)
        ops = {EqualTo: "=", GreaterThan: ">", GreaterThanOrEqual: ">=",
               LessThan: "<", LessThanOrEqual: "<="}
        for f in filters:
            if isinstance(f, In) and len(f.attribute) == 1:
                self._pruning.append((f.attribute[0], "in",
                                      tuple(f.value)))
                continue
            op = ops.get(type(f))
            if op is not None and len(f.attribute) == 1:
                self._pruning.append((f.attribute[0], op, f.value))
        return filters              # all residual: row filtering is Spark's

    def partitions(self):
        files, schema_json, colmap = _replay(self._table, self._version)
        cm = colmap or {}
        # r14 partitioned tables: a recorded partition value is an
        # EXACT [v, v] interval — inject it into the per-file stats so
        # the same conjunct machinery prunes whole partitions before
        # footer intervals ever matter
        import pyarrow as pa
        from pyspark.sql.pandas.types import to_arrow_schema
        from pyspark.sql.types import StructType as _ST
        arrow = to_arrow_schema(_ST.fromJson(json.loads(schema_json)))
        types = {f.name: f.type for f in arrow}
        for n, st in files.items():
            for c, raw in (st.get("pv") or {}).items():
                t = types.get(c)
                if t is None:
                    continue
                try:
                    v = _pv_constant(raw, 1, t)[0].as_py()
                except Exception:
                    continue            # undecodable: unprunable
                enc = _stats_encode(v)
                if enc is not None:
                    st["cols"] = {**(st.get("cols") or {}),
                                  c: [enc, enc]}
        pruning = [(cm.get(c, c), o, v) for c, o, v in self._pruning]
        keep = [n for n in sorted(files)
                if all(_interval_hit(files[n], c, o, v)
                       for c, o, v in pruning)]
        return [_SnapshotFilePartition(os.path.join(self._table, n),
                                       files[n].get("dv"),
                                       files[n].get("pv"))
                for n in keep]

    def read(self, partition: _SnapshotFilePartition):
        # executor-side: one parquet file -> Arrow batches aligned to
        # the LOGGED schema (pre-evolution files NULL-fill the added
        # columns) with the deletion vector masked — all vectorized.
        if partition is None:
            # pruning (or an empty table) eliminated every file:
            # pyspark substitutes [None] for an empty partition list
            # (plan_data_source_read.py) — zero rows, not a crash
            return
        import pyarrow as pa
        from pyspark.sql.pandas.types import to_arrow_schema
        from pyspark.sql.types import StructType as _ST
        import pyarrow.parquet as pq

        target = to_arrow_schema(_ST.fromJson(
            json.loads(self._schema_json)))
        cm = self._colmap or {}
        pv = partition.pv or {}
        t = pq.read_table(partition.path)
        cols = []
        for field in target:
            phys = cm.get(field.name, field.name)
            if phys in t.column_names:
                cols.append(t.column(phys).cast(field.type))
            elif phys in pv:
                # r14 partitioned tables: the column lives in the
                # directory name, not the file — a typed constant
                cols.append(_pv_constant(pv[phys], t.num_rows,
                                         field.type))
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


# ---------------------------------------------------------------- write
#: mirror of txnlog.CHECKPOINT_EVERY / STATS_STR_MAX (byte-compat
#: pinned in tests/test_txnlog.py) — self-contained, same reason as
#: the replay duplicate
_CHECKPOINT_EVERY = 10
_STATS_STR_MAX = 64


def _stats_encode(v):
    """Mirror of txnlog._stats_encode (pinned in tests)."""
    import datetime
    if isinstance(v, bool) or v is None:
        return None
    if isinstance(v, (int, float)):
        return v
    if isinstance(v, str):
        return v if len(v) <= _STATS_STR_MAX else None
    if isinstance(v, datetime.datetime):
        return {"t": "ts", "v": v.isoformat()}
    if isinstance(v, datetime.date):
        return {"t": "d", "v": v.isoformat()}
    return None


def _file_stats(fpath: str, key: str | None) -> dict:
    """Mirror of txnlog._file_stats: rows + key interval + per-column
    [min, max] from the parquet footer (no data scan).  Accumulates by
    LEAF path — row-group chunks enumerate parquet leaves, so nested
    columns shift positional indexing (see txnlog._file_stats); only
    top-level primitives (no dot in the path) record an interval."""
    import pyarrow.parquet as pq
    md = pq.ParquetFile(fpath).metadata
    acc: dict[str, list] = {}
    dead: set[str] = set()
    for rg in range(md.num_row_groups):
        grp = md.row_group(rg)
        for ci in range(grp.num_columns):
            col = grp.column(ci)
            name = col.path_in_schema
            if "." in name or name in dead:
                continue
            st = col.statistics
            try:
                ok = st is not None and st.has_min_max
                lo_hi = (st.min, st.max) if ok else None
            except Exception:
                # ArrowNotImplementedError for some physical types
                # (e.g. INT96) — unprunable, never fatal
                lo_hi = None
            if lo_hi is None:
                dead.add(name)
                acc.pop(name, None)
                continue
            cur = acc.get(name)
            if cur is None:
                acc[name] = list(lo_hi)
            else:
                cur[0] = min(cur[0], lo_hi[0])
                cur[1] = max(cur[1], lo_hi[1])
    per: dict[str, list] = {}
    for name, (cmin, cmax) in acc.items():
        lo, hi = _stats_encode(cmin), _stats_encode(cmax)
        if lo is not None and hi is not None:
            per[name] = [lo, hi]
    kiv = per.get(key) if key else None
    return {"rows": md.num_rows,
            "kmin": kiv[0] if kiv else None,
            "kmax": kiv[1] if kiv else None,
            "cols": per}


def _link_claim_commit(table: str, version: int, payload: dict) -> bool:
    """Mirror of txnlog._try_commit with the POSIX link(2) claim.
    The DataSource committer runs in its own Python worker process, so
    txnlog.set_claim_backend's module-global seam cannot reach it —
    deployments on stores without atomic create use the Python verbs
    (which honor the seam) for writes; this is documented on the
    format."""
    import uuid
    log = _log_dir(table)
    os.makedirs(log, exist_ok=True)
    payload = {"version": version, **payload}
    target = os.path.join(log, f"{version:0{_W}d}.json")
    tmp = os.path.join(log, f".commit-{uuid.uuid4().hex}")
    with open(tmp, "w") as f:
        json.dump(payload, f)
        f.flush()
        os.fsync(f.fileno())
    try:
        os.link(tmp, target)
        won = True
    except FileExistsError:
        won = False
    finally:
        try:
            os.remove(tmp)
        except OSError:
            pass
    if won and version % _CHECKPOINT_EVERY == 0 and version > 0:
        (files, schema_json, txns, constraints, key, colmap,
         _, partition_by) = _replay_meta(table, version)
        ck = os.path.join(log, f".ckpt-{uuid.uuid4().hex}")
        with open(ck, "w") as f:
            json.dump({"version": version, "files": files,
                       "schema": schema_json, "txns": txns,
                       "constraints": constraints,
                       "colmap": colmap, "key": key,
                       "partition_by": partition_by}, f)
        os.replace(ck, os.path.join(log,
                                    f"{version:0{_W}d}.ckpt.json"))
    return won


def _validate_staged(table: str, adds: list[dict],
                     constraints: dict[str, str],
                     logged_fields: list[str],
                     colmap: dict[str, str] | None = None) -> None:
    """CHECK-constraint validation of staged files via duckdb (the
    committer process has no SparkSession; duckdb reads the staged
    parquet directly — batch-sized work, not table-sized).  Columns
    the batch omits relative to the logged schema are NULL-filled
    first, because that is how readers will surface them (`v IS NOT
    NULL` on an omitted v must fail, not pass).  Constraint exprs are
    the ANSI-comparison subset shared by Spark SQL and duckdb; an
    unparseable expr fails the WRITE loudly — never skips
    enforcement (use txnlog.append for engine-specific exprs)."""
    if not constraints or not adds:
        return
    import duckdb
    import pyarrow.parquet as pq
    con = duckdb.connect()
    cm = colmap or {}
    paths = [os.path.join(table, a["file"]) for a in adds]
    have = set(pq.ParquetFile(paths[0]).schema_arrow.names)
    # staged files store PHYSICAL names under column mapping; the
    # constraint exprs reference LOGICAL names — alias per field
    sel = []
    for c in logged_fields:
        phys = cm.get(c, c)
        sel.append(f'"{phys}" AS "{c}"' if phys in have
                   else f'NULL AS "{c}"')
    # columns the batch carries beyond the logged schema (evolution)
    sel += [f'"{p}"' for p in have
            if p not in {cm.get(c, c) for c in logged_fields}]
    files_sql = ", ".join(f"'{p}'" for p in paths)
    base = f"SELECT {', '.join(sel)} FROM read_parquet([{files_sql}])"
    for name, expr in sorted(constraints.items()):
        try:
            n_bad = con.execute(
                f"SELECT count(*) FROM ({base}) WHERE NOT ({expr})"
            ).fetchone()[0]
        except Exception as e:
            raise ValueError(
                f"txnlog writer: cannot validate CHECK constraint "
                f"{name!r} ({expr}) in the DataSource commit path "
                f"({e}); write through txnlog.append/merge for "
                f"non-portable constraint expressions") from e
        if n_bad:
            raise ValueError(
                f"txnlog writer: {n_bad} row(s) violate CHECK "
                f"constraint {name!r} ({expr}) — nothing was "
                f"committed")


def _check_write_schema(plan_schema_json: str, logged_schema_json: str,
                        evolve: bool) -> tuple[list[str], str | None]:
    """Type-conflict + evolution gate (mirror of txnlog._check_types /
    _widened_schema).  Returns (new_cols, widened_schema_json or
    None)."""
    plan = json.loads(plan_schema_json)
    logged = json.loads(logged_schema_json)
    ltypes = {f["name"]: f["type"] for f in logged["fields"]}
    bad = [(f["name"], ltypes[f["name"]], f["type"])
           for f in plan["fields"]
           if f["name"] in ltypes and f["type"] != ltypes[f["name"]]]
    if bad:
        raise ValueError(
            "txnlog writer: frame retypes logged column(s) "
            + ", ".join(f"{n} (logged {lt}, frame {ft})"
                        for n, lt, ft in bad)
            + " — txnlog rejects type conflicts at commit time; cast "
            "the frame to the logged types first")
    new_cols = [f["name"] for f in plan["fields"]
                if f["name"] not in ltypes]
    if not new_cols:
        return [], None
    if not evolve:
        raise ValueError(
            f"txnlog writer: frame adds columns {new_cols} not in the "
            f"table schema; set .option('evolveSchema', 'true') to "
            f"widen the table")
    widened = dict(logged)
    widened["fields"] = list(logged["fields"]) + [
        f for f in plan["fields"] if f["name"] in set(new_cols)]
    return new_cols, json.dumps(widened)


class _TxnWriteMessage(WriterCommitMessage):
    def __init__(self, adds: list[dict]):
        self.adds = adds


def _pv_frag(v) -> str:
    """One partition value → the raw hive dir fragment txnlog's
    reader decodes (``_pv_decode`` unquotes, parses by the logged
    type; booleans compare against 'true'; timestamps tolerate the
    space form).  Percent-escaping EVERY special character makes any
    string round-trip."""
    from urllib.parse import quote
    if v is None:
        return "__HIVE_DEFAULT_PARTITION__"
    if isinstance(v, bool):
        return "true" if v else "false"
    return quote(str(v), safe="")


class _TxnlogWriterBase:
    """Shared task-side write for the batch writer and the streaming
    sink: each task streams its Arrow batches into ONE immutable
    parquet file in the table dir (same physics as
    txnlog._stage_data_files — data lands BEFORE any commit names it;
    a failed/aborted write leaves only unreferenced files that vacuum
    reclaims after the retention window)."""

    def __init__(self, table: str, key: str | None,
                 colmap: dict[str, str] | None = None,
                 partition_by: list[str] | None = None):
        self._table = table
        self._key = key
        #: complete logical → physical map for the PLAN schema under
        #: column mapping (fresh physical names for evolving columns
        #: assigned at plan time), or None for identity tables
        self._colmap = colmap
        #: the table's logged partition spec (r15): tasks stage hive
        #: ``col=value`` layouts, partition columns dropped from the
        #: files and recorded as pv — same physics as
        #: txnlog._stage_data_files, derived per Arrow batch slice
        self._partition_by = partition_by

    def write(self, iterator):
        import uuid
        import pyarrow as pa
        import pyarrow.parquet as pq
        os.makedirs(self._table, exist_ok=True)   # create-by-write
        cm = self._colmap or {}
        key_phys = (cm.get(self._key, self._key) if self._key
                    else self._key)
        if self._partition_by:
            return self._write_partitioned(iterator, cm, key_phys)
        name = f"p-w-{uuid.uuid4().hex}.parquet"
        fpath = os.path.join(self._table, name)
        writer = None
        try:
            for batch in iterator:
                if cm:
                    batch = pa.RecordBatch.from_arrays(
                        list(batch.columns),
                        names=[cm.get(n, n)
                               for n in batch.schema.names])
                if writer is None:
                    writer = pq.ParquetWriter(fpath, batch.schema)
                writer.write_batch(batch)
        finally:
            if writer is not None:
                writer.close()
        if writer is None:
            return _TxnWriteMessage([])         # empty partition
        stats = _file_stats(fpath, key_phys)
        if stats["rows"] == 0:
            os.remove(fpath)
            return _TxnWriteMessage([])
        return _TxnWriteMessage([{"file": name, **stats}])

    def _write_partitioned(self, iterator, cm: dict, key_phys):
        """r15 (VERDICT r14 item 4): split each Arrow batch by the
        table's partition values, stream every slice into ONE file per
        partition under its ``col=value`` dir (partition columns are
        directory-borne, never stored), and record pv + the key's
        partition-borne bounds on each add — lifting the r14 refusal
        so ``df.write.format("txnlog")`` covers partitioned tables."""
        import uuid
        import pyarrow as pa
        import pyarrow.parquet as pq
        pby = self._partition_by
        sinks: dict[str, list] = {}     # frag -> [writer, name, pv]
        try:
            for batch in iterator:
                tbl = pa.Table.from_batches([batch])
                missing = [c for c in pby
                           if c not in tbl.schema.names]
                if missing:
                    raise ValueError(
                        f"txnlog writer: frame omits partition "
                        f"column(s) {missing}")
                by_combo: dict[tuple, list[int]] = {}
                for i, combo in enumerate(zip(
                        *[tbl.column(c).to_pylist() for c in pby])):
                    by_combo.setdefault(combo, []).append(i)
                data = tbl.drop_columns(list(pby))
                if cm:
                    data = data.rename_columns(
                        [cm.get(n, n) for n in data.schema.names])
                for combo, idxs in by_combo.items():
                    frag = "/".join(f"{c}={_pv_frag(v)}"
                                    for c, v in zip(pby, combo))
                    sub = data.take(idxs)
                    sink = sinks.get(frag)
                    if sink is None:
                        os.makedirs(os.path.join(self._table, frag),
                                    exist_ok=True)
                        name = (f"{frag}/p-w-{uuid.uuid4().hex}"
                                f".parquet")
                        w = pq.ParquetWriter(
                            os.path.join(self._table, name),
                            sub.schema)
                        pv = {c: _pv_frag(v)
                              for c, v in zip(pby, combo)}
                        # the ONE _stats_encode (with the string cap)
                        # — a >64-char string partition key drops its
                        # bounds here exactly as txnlog.append would
                        kb = (_stats_encode(dict(zip(pby, combo))
                                            .get(self._key))
                              if self._key in pby else None)
                        sinks[frag] = sink = [w, name, pv, kb]
                    sink[0].write_table(sub)
        finally:
            for sink in sinks.values():
                sink[0].close()
        adds = []
        for w, name, pv, kb in sinks.values():
            fpath = os.path.join(self._table, name)
            stats = _file_stats(fpath, key_phys)
            if stats["rows"] == 0:
                os.remove(fpath)
                continue
            stats["pv"] = pv
            if kb is not None and stats.get("kmin") is None:
                # merge key IS a partition column: bounds come from
                # the partition value (file stores no key column)
                stats["kmin"] = stats["kmax"] = kb
            adds.append({"file": name, **stats})
        return _TxnWriteMessage(adds)


def _collect_adds(messages) -> list[dict]:
    return [a for m in messages if m is not None for a in m.adds]


def _drop_staged(table: str, adds: list[dict]) -> None:
    for a in adds:
        try:
            os.remove(os.path.join(table, a["file"]))
        except OSError:
            pass


class TxnlogBatchWriter(_TxnlogWriterBase, DataSourceArrowWriter):
    """``df.write.format("txnlog")`` — the SQL-surface write twin of
    the r11 read DataSource (VERDICT r11 item 1): mode("append") is
    txnlog.append, mode("overwrite") is replace_contents, and a write
    to a path with no log CREATES the table (option("key", ...)
    names the merge key, like txnlog.create_table).  The commit is
    the same atomic claim-the-next-version protocol: files land
    first, one JSON names them, losers of a version race re-derive
    and retry, and CHECK constraints + the retype guard gate every
    attempt (constraints via duckdb over the staged parquet — the
    committer process has no SparkSession).

    Reference analogue: any SQL client WRITES through Postgres
    (docker-aktin-dwh src/docker/database/Dockerfile:8) — r11 gave
    the read surface its SQL twin, this is the write surface."""

    MAX_ATTEMPTS = 20

    def __init__(self, table: str, key: str | None, overwrite: bool,
                 evolve: bool, plan_schema_json: str,
                 txn: tuple[str, int] | None = None,
                 colmap: dict[str, str] | None = None,
                 plan_colmap: dict[str, str] | None = None,
                 partition_by: list[str] | None = None):
        super().__init__(table, key, colmap, partition_by)
        self._overwrite = overwrite
        self._evolve = evolve
        self._plan_schema_json = plan_schema_json
        self._txn = txn
        #: the table's colmap AS REPLAYED AT PLAN TIME (no fresh
        #: names) — the committer compares it against the fresh replay
        #: to detect a concurrent rename/drop (staged files would
        #: carry stale physical names; Delta fails concurrent metadata
        #: transactions the same way)
        self._plan_colmap = plan_colmap

    # -- driver side ---------------------------------------------------
    def commit(self, messages) -> None:
        adds = _collect_adds(messages)
        try:
            self._commit_adds(adds)
        except BaseException:
            _drop_staged(self._table, adds)
            raise

    def _commit_adds(self, adds: list[dict]) -> None:
        for _ in range(self.MAX_ATTEMPTS):
            if not _versions(self._table):
                # no log: CREATE the table at v0 (requires a key for
                # merge-skipping stats; readable without one)
                payload = {"op": "create", "key": self._key,
                           "add": adds, "remove": [],
                           "schema": self._plan_schema_json}
                if self._txn is not None:
                    payload["txn"] = {"app": self._txn[0],
                                      "version": self._txn[1]}
                if _link_claim_commit(self._table, 0, payload):
                    return
                continue            # lost the create race: re-derive
            (files, schema_json, txns, constraints, logged_key,
             colmap, version, partition_by) = _replay_meta(
                self._table, None)
            if partition_by:
                # r15: tasks stage hive layouts when the PLAN saw the
                # partition spec.  An add without matching pv means the
                # spec appeared between plan and commit (create race,
                # or a plan against the pre-create path) — staged flat
                # files would break the layout contract; refuse rather
                # than corrupt (the caller re-runs the write).
                bad = [a["file"] for a in adds
                       if set((a.get("pv") or {}))
                       != set(partition_by)]
                if bad:
                    _drop_staged(self._table, adds)
                    raise RuntimeError(
                        f"txnlog writer: {self._table} is partitioned "
                        f"by {partition_by} but staged file(s) "
                        f"{bad[:3]} carry no matching partition "
                        f"values (concurrent create/spec change) — "
                        f"retry the write")
            if self._txn is not None and \
                    txns.get(self._txn[0], -1) >= self._txn[1]:
                _drop_staged(self._table, adds)
                return              # idempotent replay: already applied
            if colmap != self._plan_colmap:
                # a rename/drop landed between plan and commit: the
                # staged files carry physical names derived from the
                # OLD map — committing them would mis-wire columns.
                # Fail the write (Delta's concurrent-metadata conflict)
                # rather than guess; the caller re-runs the write.
                _drop_staged(self._table, adds)
                raise RuntimeError(
                    f"txnlog writer: concurrent column-mapping change "
                    f"on {self._table} (plan {self._plan_colmap!r} vs "
                    f"commit {colmap!r}) — retry the write")
            new_cols, widened = _check_write_schema(
                self._plan_schema_json, schema_json, self._evolve)
            logged_fields = [f["name"] for f in
                             json.loads(schema_json)["fields"]]
            _validate_staged(self._table, adds, constraints,
                             logged_fields, self._colmap)
            op = "replace" if self._overwrite else "append"
            payload = {"op": op, "add": adds,
                       "remove": sorted(files) if self._overwrite
                       else []}
            if widened is not None:
                payload["schema"] = widened
                if colmap is not None:
                    # evolving under an active mapping: record the
                    # fresh physical names assigned at plan time
                    payload["colmap"] = {
                        **colmap,
                        **{c: self._colmap[c] for c in new_cols}}
            if self._txn is not None:
                payload["txn"] = {"app": self._txn[0],
                                  "version": self._txn[1]}
            if _link_claim_commit(self._table, version + 1, payload):
                return
        raise RuntimeError(
            f"txnlog writer lost {self.MAX_ATTEMPTS} version races "
            f"at {self._table}")

    def abort(self, messages) -> None:
        _drop_staged(self._table, _collect_adds(messages))


class TxnlogStreamWriter(_TxnlogWriterBase, DataSourceStreamArrowWriter):
    """``df.writeStream.format("txnlog")`` — exactly-once streaming
    sink on the commit-log format: every micro-batch commits its
    files AND the (txnAppId, batchId) txn action in ONE atomic log
    entry, so a restarted query that replays a batch is a no-op (the
    clean_ingest idempotence, exposed as a format instead of a
    foreachBatch recipe).  outputMode("append") appends;
    outputMode("complete") replaces the table content per batch
    (the materialized-view shape, replace_contents' semantics)."""

    def __init__(self, table: str, key: str | None, overwrite: bool,
                 evolve: bool, plan_schema_json: str, app_id: str,
                 colmap: dict[str, str] | None = None,
                 plan_colmap: dict[str, str] | None = None,
                 partition_by: list[str] | None = None):
        super().__init__(table, key, colmap, partition_by)
        self._overwrite = overwrite
        self._evolve = evolve
        self._plan_schema_json = plan_schema_json
        self._app_id = app_id
        self._plan_colmap = plan_colmap

    def commit(self, messages, batchId: int) -> None:
        delegate = TxnlogBatchWriter(
            self._table, self._key, self._overwrite, self._evolve,
            self._plan_schema_json, txn=(self._app_id, batchId),
            colmap=self._colmap, plan_colmap=self._plan_colmap,
            partition_by=self._partition_by)
        delegate.commit(messages)

    def abort(self, messages, batchId: int) -> None:
        _drop_staged(self._table, _collect_adds(messages))


class TxnlogBatchDataSource(DataSource):
    """The txnlog format's SQL-composability surface — register with
    :func:`register` (or ``spark.dataSource.register``):

    - read:  ``spark.read.format("txnlog").option("path", p)
      [.option("versionAsOf", n)]``; footer-stats file skipping via
      ``option("filters", '[["col", ">=", lit], ...]')`` (pinned at
      load — always safe) or ``option("dataSkipping", "true")``
      (pushed-filter pruning for one-shot relations; see
      TxnlogBatchReader.pushFilters for why it is opt-in),
    - write: ``df.write.format("txnlog").option("path", p)
      .mode("append"|"overwrite")`` (creates the table when no log
      exists; ``option("key", k)`` names the merge key,
      ``option("evolveSchema", "true")`` permits new columns),
    - sink:  ``df.writeStream.format("txnlog").option("path", p)
      [.option("txnAppId", id)]`` — exactly-once micro-batch commits
      (batch id in the same atomic log entry).
    """

    @classmethod
    def name(cls) -> str:
        return "txnlog"

    def _version(self) -> int | None:
        # memoized: schema()/reader() on the same load resolve the
        # version once (the timestamp arm stats every commit file)
        cached = getattr(self, "_resolved_version", _UNSET)
        if cached is not _UNSET:
            return cached
        v = self.options.get("versionAsOf")
        ts = self.options.get("timestampAsOf")
        if v is not None and ts is not None:
            raise ValueError(
                "txnlog: pass versionAsOf OR timestampAsOf, not both")
        if ts is not None:
            out = _resolve_timestamp(
                _norm_path(self.options["path"]), ts)
        else:
            out = None if v is None else int(v)
        self._resolved_version = out
        return out

    def _write_opts(self) -> tuple[str, str | None, bool]:
        table = _norm_path(self.options["path"])
        key = self.options.get("key")
        evolve = str(self.options.get("evolveSchema",
                                      "false")).lower() == "true"
        return table, key, evolve

    def _plan_checks(self, table: str, schema: StructType,
                     evolve: bool):
        """Fail-fast plan-time validation (commit re-derives under the
        fresh snapshot anyway); returns (logged_key, plan_colmap,
        stage_colmap) — stage_colmap extends the table's colmap with
        FRESH physical names for evolving columns (tasks stage under
        it; the commit records it)."""
        if not _versions(table):
            return None, None, None, None
        (_, schema_json, _, _, logged_key, colmap,
         _, partition_by) = _replay_meta(table, None)
        new_cols, _w = _check_write_schema(schema.json(), schema_json,
                                           evolve)
        stage = None
        if colmap is not None:
            import uuid
            stage = {**colmap,
                     **{c: f"c-{uuid.uuid4().hex[:12]}"
                        for c in new_cols}}
        return logged_key, colmap, stage, partition_by

    def writer(self, schema: StructType,
               overwrite: bool) -> TxnlogBatchWriter:
        table, key, evolve = self._write_opts()
        logged_key, plan_colmap, stage, pby = self._plan_checks(
            table, schema, evolve)
        return TxnlogBatchWriter(table, key or logged_key, overwrite,
                                 evolve, schema.json(),
                                 colmap=stage, plan_colmap=plan_colmap,
                                 partition_by=pby)

    def streamWriter(self, schema: StructType,
                     overwrite: bool) -> TxnlogStreamWriter:
        import hashlib
        table, key, evolve = self._write_opts()
        logged_key, plan_colmap, stage, pby = self._plan_checks(
            table, schema, evolve)
        app_id = self.options.get("txnAppId")
        if app_id is None:
            # stable across restarts iff the checkpoint is: derive
            # from checkpointLocation; distinct queries writing one
            # table should set distinct explicit txnAppIds
            ckpt = self.options.get("checkpointLocation", "")
            app_id = "txnlog-sink-" + hashlib.sha256(
                ckpt.encode()).hexdigest()[:16]
        return TxnlogStreamWriter(table, key or logged_key, overwrite,
                                  evolve, schema.json(), app_id,
                                  colmap=stage, plan_colmap=plan_colmap,
                                  partition_by=pby)

    def schema(self) -> StructType:
        _, schema_json, _ = _replay(_norm_path(self.options["path"]),
                                    self._version())
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
            version = _versions(_norm_path(self.options["path"]))[-1]
        _, schema_json, colmap = _replay(
            _norm_path(self.options["path"]), version)
        skipping = str(self.options.get("dataSkipping",
                                        "false")).lower() == "true"
        pruning = None
        declared = self.options.get("filters")
        if declared is not None:
            # load-time declared pruning: [(col, op, literal), ...] as
            # JSON — pinned at load, so EVERY query on this relation
            # sees the same subset (safe under Spark's one-plan-per-
            # relation caching, unlike pushFilters; see pushFilters)
            pruning = [tuple(f) for f in json.loads(declared)]
        return TxnlogBatchReader(_norm_path(self.options["path"]), version,
                                 schema_json, skipping=skipping,
                                 pruning=pruning, colmap=colmap)


def register(spark) -> None:
    """Idempotently register the batch source on a session.  Also
    enables the Python DataSource filter-pushdown conf (runtime-
    settable): with it off, Spark REFUSES any reader that overrides
    pushFilters rather than silently skipping the pushdown.

    Pins the JVM active session for the CALLING thread too: the
    WRITE-path lookup of Python data sources goes through the JVM's
    thread-local active session, so ``df.write.format("txnlog")``
    from a Python worker thread (py4j pins each Python thread to its
    own JVM thread) raises DATA_SOURCE_NOT_FOUND unless that thread's
    active session is set — the read path resolves through the
    default session and never trips this.  Callers that register on
    one thread and write on another should call register() (cheap,
    idempotent) on the writing thread."""
    try:
        spark._jvm.org.apache.spark.sql.SparkSession.setActiveSession(
            spark._jsparkSession)
    except Exception:       # pragma: no cover - connect-mode sessions
        pass
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    # register once per session: DataSourceManager.register REPLACES
    # an existing entry (remove+put), so re-registering from a worker
    # thread opens a lookup-miss window for queries mid-plan on other
    # threads — observed as flaky DATA_SOURCE_NOT_FOUND under pooled
    # tests
    with _REGISTER_LOCK:
        if spark not in _REGISTERED:
            spark.dataSource.register(TxnlogBatchDataSource)
            _REGISTERED.add(spark)


_REGISTER_LOCK = __import__("threading").Lock()
_REGISTERED = __import__("weakref").WeakSet()


def _register_by_value() -> None:
    import sys
    try:
        from pyspark import cloudpickle
        cloudpickle.register_pickle_by_value(sys.modules[__name__])
    except Exception:                       # pragma: no cover - old API
        pass


_register_by_value()
