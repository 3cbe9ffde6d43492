"""Minimal INDEPENDENT Delta Lake log reader for differential tests.

VERDICT r12 item 2: the conformance test validates the exporter's
action shapes, but no second implementation had ever READ an exported
table.  This module is that second implementation — written against
the PUBLIC Delta transaction-log protocol (delta-io/delta PROTOCOL.md)
only, sharing **zero code** with ``sources/delta_export.py`` (it
imports nothing from the package): it replays the JSON commits to the
live file list, applies the metaData's schema (including columnMapping
mode "name" physical-name indirection), and materializes the table
through DuckDB's parquet reader — a third engine, so agreement is
evidence about the FORMAT, not about shared helpers.

Supported (all the exporter can emit): protocol / metaData / add /
remove / txn actions across any number of commit files, schemaString
field order, columnMapping mode "name" via
``delta.columnMapping.physicalName`` field metadata.  Unsupported
(raises): checkpoint parquet files (the exporter never writes them),
deletion vectors (the exporter refuses DV snapshots), partitioned
tables.
"""

from __future__ import annotations

import json
import os


def read_delta_table(path: str):
    """Replay ``path``'s _delta_log and return (column names, rows)
    with rows as a sorted list of tuples in logical column order,
    materialized by DuckDB over exactly the live parquet files."""
    log_dir = os.path.join(path, "_delta_log")
    commits = sorted(n for n in os.listdir(log_dir)
                     if n.endswith(".json") and n[:20].isdigit())
    if not commits:
        raise FileNotFoundError(f"no Delta commits under {log_dir}")
    if any(n.endswith(".checkpoint.parquet")
           for n in os.listdir(log_dir)):
        raise NotImplementedError("checkpoint replay not implemented")

    live: dict[str, dict] = {}
    meta = None
    protocol = None
    txns: dict[str, int] = {}
    for name in commits:
        with open(os.path.join(log_dir, name)) as f:
            for line in f:
                if not line.strip():
                    continue
                action = json.loads(line)
                if "add" in action:
                    a = action["add"]
                    if a.get("deletionVector"):
                        raise NotImplementedError("deletion vectors")
                    if a.get("partitionValues"):
                        raise NotImplementedError("partitioned table")
                    live[a["path"]] = a
                elif "remove" in action:
                    live.pop(action["remove"]["path"], None)
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
    if protocol["minReaderVersion"] > 2:
        raise NotImplementedError(
            f"minReaderVersion {protocol['minReaderVersion']}")

    schema = json.loads(meta["schemaString"])
    mode = (meta.get("configuration") or {}).get(
        "delta.columnMapping.mode", "none")
    logical: list[str] = []
    physical: list[str] = []
    for fld in schema["fields"]:
        logical.append(fld["name"])
        if mode == "name":
            physical.append(
                (fld.get("metadata") or {})["delta.columnMapping."
                                            "physicalName"])
        else:
            physical.append(fld["name"])

    import duckdb
    con = duckdb.connect()
    files = sorted(os.path.join(path, p) for p in live)
    if not files:
        return logical, [], txns
    files_sql = ", ".join(f"'{f}'" for f in files)

    def q(ident: str) -> str:
        return '"' + ident.replace('"', '""') + '"'

    # union_by_name: pre-evolution files lack later physical columns
    # (NULL-filled, exactly the logged-schema read contract); select
    # physical AS logical in logical order
    cols = []
    probe = con.execute(
        f"SELECT name FROM parquet_schema([{files_sql}])").fetchall()
    present = {r[0] for r in probe}
    for lg, ph in zip(logical, physical):
        cols.append(f"{q(ph)} AS {q(lg)}" if ph in present
                    else f"NULL AS {q(lg)}")
    rows = con.execute(
        f"SELECT {', '.join(cols)} FROM read_parquet([{files_sql}], "
        f"union_by_name=true)").fetchall()
    return logical, sorted(rows, key=lambda r: tuple(
        (v is None, str(type(v)), v) for v in r)), txns
