"""Minimal INDEPENDENT Delta Lake log reader for differential tests.

VERDICT r12 item 2 (+ r13 items 3-5): the conformance test validates
the exporter's action shapes, but agreement needs a second
implementation that READS exported tables.  This module is that second
implementation — written against the PUBLIC Delta transaction-log
protocol (delta-io/delta PROTOCOL.md) only, sharing **zero code** with
``sources/delta_export.py`` (it imports nothing from the package): it
replays the JSON commits (or seeds from ``N.checkpoint.parquet`` via
``_last_checkpoint`` and replays only the newer commits), applies the
metaData's schema (columnMapping mode "name" physical-name
indirection, ``delta.typeChanges`` type widening via a scan-time
cast), decodes inline DELETION VECTORS (Z85 → RoaringBitmapArray
portable format → per-file dead row indexes, masked through DuckDB's
``file_row_number``), injects PARTITION VALUES from the add actions'
maps, and materializes rows through DuckDB's parquet reader — a third
engine, so agreement is evidence about the FORMAT, not about shared
helpers.

Supported: protocol/metaData/add/remove/txn actions across any number
of commit files — reconciled by the spec's (path, dv uniqueId) file
key, so a remove lacking the superseded add's DV descriptor leaves
that add LIVE and surfaces as duplicate rows (the spec behavior the
r14 exporter bug would have hidden under path-only keying) —
checkpoint parquet seeding, schemaString field order, columnMapping
mode "name", inline ("i") AND on-disk ("u") deletion vectors
(version-byte/size/CRC-framed files, r15), run-container roaring
bitmaps (cookie 12347, conditional offset header), hive partition
columns, primitive type widening.
Unsupported (raises — honest guards, never a wrong decode): absolute-
path ("p") DV storage, reader features beyond
{deletionVectors, columnMapping, typeWidening}.
"""

from __future__ import annotations

import json
import os
import struct
import uuid as _uuid
import zlib

# Z85 alphabet per the ZeroMQ spec (the encoding PROTOCOL.md names)
_Z85 = ("0123456789abcdefghijklmnopqrstuvwxyz"
        "ABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#")
_Z85_REV = {c: i for i, c in enumerate(_Z85)}


def _z85_decode(s: str, true_len: int) -> bytes:
    if len(s) % 5:
        raise ValueError(f"Z85 length {len(s)} not a multiple of 5")
    out = bytearray()
    for i in range(0, len(s), 5):
        v = 0
        for c in s[i:i + 5]:
            v = v * 85 + _Z85_REV[c]
        out += v.to_bytes(4, "big")
    return bytes(out[:true_len])


def _parse_roaring32(buf: bytes, pos: int) -> tuple[set[int], int]:
    """One 32-bit roaring bitmap starting at ``pos`` → (values, end).
    Handles both RoaringFormatSpec cookies: 12346 (no runs, 4-byte
    count, offset header always present) and 12347 (run containers,
    count-1 in the cookie's high 16 bits, a run-flag bitset, and an
    offset header only at >= 4 containers)."""
    (cookie16,) = struct.unpack_from("<H", buf, pos)
    if cookie16 == 12347:
        (nm1,) = struct.unpack_from("<H", buf, pos + 2)
        n_containers = nm1 + 1
        flag_at = pos + 4
        n_flag = (n_containers + 7) // 8
        run_flags = [bool(buf[flag_at + (i >> 3)] >> (i & 7) & 1)
                     for i in range(n_containers)]
        desc_at = flag_at + n_flag
        has_offsets = n_containers >= 4
    else:
        (cookie,) = struct.unpack_from("<i", buf, pos)
        if cookie != 12346:
            raise ValueError(f"bad roaring cookie {cookie}")
        (n_containers,) = struct.unpack_from("<i", buf, pos + 4)
        run_flags = [False] * n_containers
        desc_at = pos + 8
        has_offsets = True
    cards = []
    keys = []
    for i in range(n_containers):
        k, cm1 = struct.unpack_from("<HH", buf, desc_at + 4 * i)
        keys.append(k)
        cards.append(cm1 + 1)
    off_at = desc_at + 4 * n_containers
    if has_offsets:
        # offset header: absolute-from-bitmap-start container offsets
        offsets = [pos + struct.unpack_from("<i", buf,
                                            off_at + 4 * i)[0]
                   for i in range(n_containers)]
        end = off_at + 4 * n_containers
    else:
        offsets = None
        end = off_at
    values: set[int] = set()
    at = end
    for i, (k, card, is_run) in enumerate(zip(keys, cards, run_flags)):
        if offsets is not None:
            at = offsets[i]
        if is_run:
            (n_runs,) = struct.unpack_from("<H", buf, at)
            vals = []
            for r in range(n_runs):
                lo, length = struct.unpack_from(
                    "<HH", buf, at + 2 + 4 * r)
                vals.extend(range(lo, lo + length + 1))
            at += 2 + 4 * n_runs
        elif card <= 4096:
            vals = struct.unpack_from(f"<{card}H", buf, at)
            at += 2 * card
        else:
            vals = []
            for byte_i in range(8192):
                b = buf[at + byte_i]
                while b:
                    low = b & -b
                    vals.append(byte_i * 8 + low.bit_length() - 1)
                    b ^= low
            at += 8192
        end = max(end, at)
        base = k << 16
        values.update(base | v for v in vals)
    return values, end


def _decode_dv(desc: dict, table_path: str | None = None) -> set[int]:
    """Deletion-vector descriptor → dead row indexes.  storageType
    "i" decodes the Z85 payload inline; "u" (r15) derives the DV file
    name from the Z85-encoded UUID (optionally behind a random
    prefix), checks the 1-byte format version, reads the 4-byte
    big-endian size at ``offset``, and verifies the trailing CRC-32
    before parsing the bitmap."""
    st = desc.get("storageType")
    if st == "u":
        if table_path is None:
            raise ValueError("on-disk DV needs the table path")
        enc = desc["pathOrInlineDv"]
        prefix, tail = enc[:-20], enc[-20:]
        u = _uuid.UUID(bytes=_z85_decode(tail, 16))
        fp = os.path.join(table_path, prefix,
                          f"deletion_vector_{u}.bin")
        with open(fp, "rb") as f:
            blob = f.read()
        if blob[0] != 1:
            raise NotImplementedError(
                f"DV file format version {blob[0]}")
        off = desc.get("offset") or 1
        (size,) = struct.unpack_from(">i", blob, off)
        if size != desc["sizeInBytes"]:
            raise ValueError(
                f"DV size {size} != descriptor {desc['sizeInBytes']}")
        data = blob[off + 4:off + 4 + size]
        (crc,) = struct.unpack_from(">I", blob, off + 4 + size)
        if crc != zlib.crc32(data):
            raise ValueError("DV file checksum mismatch")
    elif st == "i":
        data = _z85_decode(desc["pathOrInlineDv"], desc["sizeInBytes"])
    else:
        raise NotImplementedError(
            f"DV storageType {st!r} (inline and on-disk uuid only)")
    (magic,) = struct.unpack_from("<i", data, 0)
    if magic != 1681511377:
        raise ValueError(f"bad RoaringBitmapArray magic {magic}")
    (n_bitmaps,) = struct.unpack_from("<q", data, 4)
    pos = 12
    dead: set[int] = set()
    for _ in range(n_bitmaps):
        (high,) = struct.unpack_from("<i", data, pos)
        vals, pos = _parse_roaring32(data, pos + 4)
        dead.update((high << 32) | v for v in vals)
    if len(dead) != desc["cardinality"]:
        raise ValueError(
            f"DV cardinality {desc['cardinality']} != decoded "
            f"{len(dead)}")
    return dead


_DUCK_TYPES = {
    "byte": "TINYINT", "short": "SMALLINT", "integer": "INTEGER",
    "long": "BIGINT", "float": "FLOAT", "double": "DOUBLE",
    "string": "VARCHAR", "boolean": "BOOLEAN", "date": "DATE",
    "timestamp": "TIMESTAMP", "timestamp_ntz": "TIMESTAMP",
    "binary": "BLOB",
}


def _duck_type(t) -> str | None:
    if isinstance(t, str):
        if t in _DUCK_TYPES:
            return _DUCK_TYPES[t]
        if t.startswith("decimal("):
            return "DECIMAL" + t[len("decimal"):]
    return None


def _norm_map(m) -> dict:
    """pyarrow returns map columns as [(k, v), ...]; duckdb as dict."""
    if m is None:
        return {}
    if isinstance(m, dict):
        return m
    return dict(m)


def _dv_uid(dv: dict | None) -> str | None:
    """PROTOCOL.md deletion-vector uniqueId: storageType +
    pathOrInlineDv (+ '@offset' when an offset is present).  File
    actions reconcile on (path, uniqueId) — a remove only cancels the
    add carrying the SAME descriptor."""
    if not dv or not dv.get("storageType"):
        return None
    uid = dv["storageType"] + dv["pathOrInlineDv"]
    if dv.get("offset"):
        uid += f"@{dv['offset']}"
    return uid


def _load_checkpoint(log_dir: str) -> tuple[dict, dict, dict, dict, int] | None:
    """Seed state from _last_checkpoint, if present: returns
    (live adds by path, metaData, protocol, txns, checkpoint version)."""
    lc = os.path.join(log_dir, "_last_checkpoint")
    if not os.path.exists(lc):
        return None
    with open(lc) as f:
        head = json.load(f)
    v = head["version"]
    import pyarrow.parquet as pq
    rows = pq.read_table(os.path.join(
        log_dir, f"{v:020d}.checkpoint.parquet")).to_pylist()
    live: dict[str, dict] = {}
    meta = protocol = None
    txns: dict[str, int] = {}
    for row in rows:
        if row.get("add"):
            a = dict(row["add"])
            a["partitionValues"] = _norm_map(a.get("partitionValues"))
            dv = a.get("deletionVector")
            if dv is not None and not dv.get("storageType"):
                a["deletionVector"] = dv = None    # null struct row
            live[(a["path"], _dv_uid(dv))] = a
        elif row.get("remove"):
            r = row["remove"]
            live.pop((r["path"], _dv_uid(r.get("deletionVector"))),
                     None)
        elif row.get("metaData"):
            m = dict(row["metaData"])
            m["configuration"] = _norm_map(m.get("configuration"))
            meta = m
        elif row.get("protocol"):
            protocol = {k: v2 for k, v2 in row["protocol"].items()
                        if v2 is not None}
        elif row.get("txn"):
            t = row["txn"]
            txns[t["appId"]] = t["version"]
    if meta is None or protocol is None:
        raise ValueError("checkpoint lacks metaData/protocol")
    return live, meta, protocol, txns, v


def read_delta_table(path: str, *, from_checkpoint: bool = True,
                     version: int | None = None):
    """Replay ``path``'s _delta_log and return (column names, rows,
    txns) with rows as a sorted list of tuples in logical column
    order, materialized by DuckDB over exactly the live parquet files
    with deletion vectors masked and partition values injected.
    ``from_checkpoint=False`` forces a full JSON replay even when a
    checkpoint exists (the differential the conformance test runs);
    ``version`` pins the replay to commits ≤ version — Delta's
    versionAsOf time travel (checkpoints above the pin are ignored)."""
    log_dir = os.path.join(path, "_delta_log")
    live: dict[str, dict] = {}
    meta = None
    protocol = None
    txns: dict[str, int] = {}
    start = 0
    if from_checkpoint:
        seeded = _load_checkpoint(log_dir)
        if seeded is not None and (version is None
                                   or seeded[4] <= version):
            live, meta, protocol, txns, v = seeded
            start = v + 1
    import re as _re
    commits = sorted(n for n in os.listdir(log_dir)
                     if _re.fullmatch(r"\d{20}\.json", n)
                     and int(n[:20]) >= start
                     and (version is None or int(n[:20]) <= version))
    if not commits and not live:
        raise FileNotFoundError(f"no Delta commits under {log_dir}")

    for name in commits:
        with open(os.path.join(log_dir, name)) as f:
            for line in f:
                if not line.strip():
                    continue
                action = json.loads(line)
                if "add" in action:
                    a = action["add"]
                    a["partitionValues"] = _norm_map(
                        a.get("partitionValues"))
                    live[(a["path"],
                          _dv_uid(a.get("deletionVector")))] = a
                elif "remove" in action:
                    r = action["remove"]
                    live.pop((r["path"],
                              _dv_uid(r.get("deletionVector"))), None)
                elif "metaData" in action:
                    meta = action["metaData"]
                elif "protocol" in action:
                    protocol = action["protocol"]
                elif "txn" in action:
                    t = action["txn"]
                    txns[t["appId"]] = max(t["version"],
                                           txns.get(t["appId"],
                                                    t["version"]))
    if meta is None or protocol is None:
        raise ValueError("log replay found no metaData/protocol action")
    if protocol["minReaderVersion"] > 3:
        raise NotImplementedError(
            f"minReaderVersion {protocol['minReaderVersion']}")
    unknown = set(protocol.get("readerFeatures") or ()) - {
        "deletionVectors", "columnMapping", "typeWidening"}
    if unknown:
        raise NotImplementedError(f"reader features {sorted(unknown)}")

    schema = json.loads(meta["schemaString"])
    mode = (meta.get("configuration") or {}).get(
        "delta.columnMapping.mode", "none")
    pcols = list(meta.get("partitionColumns") or [])
    logical: list[str] = []
    physical: list[str] = []
    types: dict[str, object] = {}
    for fld in schema["fields"]:
        logical.append(fld["name"])
        types[fld["name"]] = fld.get("type")
        if mode == "name":
            physical.append(
                (fld.get("metadata") or {})["delta.columnMapping."
                                            "physicalName"])
        else:
            physical.append(fld["name"])

    import duckdb
    con = duckdb.connect()
    if not live:
        return logical, [], txns

    def q(ident: str) -> str:
        return '"' + ident.replace('"', '""') + '"'

    def lit(s: str) -> str:
        return "'" + s.replace("'", "''") + "'"

    # one SELECT per live file: per-file presence probe (schema
    # evolution NULL-fills), partition constants from the add action,
    # DV mask via DuckDB's file_row_number, and a cast of every
    # primitive column to the SCHEMA type (which is what widens
    # physically-narrow files — delta.typeChanges tables)
    selects = []
    for lk in sorted(live, key=lambda t: (t[0], t[1] or "")):
        a = live[lk]
        from urllib.parse import unquote as _uq
        rel = _uq(a["path"])          # RFC 2396 per PROTOCOL.md
        fp = os.path.join(path, rel)
        present = {r[0] for r in con.execute(
            f"SELECT name FROM parquet_schema([{lit(fp)}])").fetchall()}
        pv = a.get("partitionValues") or {}
        cols = []
        for lg, ph in zip(logical, physical):
            dt = _duck_type(types[lg])
            if lg in pcols:
                raw = pv.get(lg)
                cast_t = dt or "VARCHAR"
                cols.append(
                    (f"CAST(NULL AS {cast_t})" if raw is None
                     else f"CAST({lit(raw)} AS {cast_t})")
                    + f" AS {q(lg)}")
            elif ph in present:
                expr = q(ph)
                if dt is not None:
                    expr = f"CAST({expr} AS {dt})"
                cols.append(f"{expr} AS {q(lg)}")
            else:
                cols.append(f"NULL AS {q(lg)}")
        sql = (f"SELECT {', '.join(cols)} FROM read_parquet("
               f"[{lit(fp)}], file_row_number=true)")
        if a.get("deletionVector"):
            dead = _decode_dv(a["deletionVector"], path)
            idx = ", ".join(str(i) for i in sorted(dead))
            sql += f" WHERE file_row_number NOT IN ({idx})"
        selects.append(sql)
    rows = con.execute(" UNION ALL ".join(selects)).fetchall()
    return logical, sorted(rows, key=lambda r: tuple(
        (v is None, str(type(v)), v) for v in r)), txns
