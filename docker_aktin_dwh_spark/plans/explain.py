"""Physical-plan introspection — the 100 TB feedback loop.

The reference delegates plan quality to the PostgreSQL planner
(reference src/docker/database/Dockerfile:8; SURVEY.md §4).  On Spark,
plan quality is observable: these helpers parse `explain("formatted")`
output so tests can assert the properties that matter at cluster scale —
dimension joins broadcast (no fact-side shuffle), predicates pushed into
the parquet scan, projections pruned to the read schema, and operator
chains fused into whole-stage codegen.

These are *assertions*, not tuning: if a refactor silently turns a
broadcast join into a sort-merge join or un-pushes a filter, the plan
tests fail even though the sf0.01 results still hash-match.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted")


def has_broadcast_hash_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in formatted_plan(df)


def has_shuffle(df: DataFrame) -> bool:
    """Any Exchange (shuffle or broadcast-build) in the plan."""
    return bool(re.search(r"Exchange hashpartitioning|Exchange rangepartitioning",
                          formatted_plan(df)))


def pushed_filters(df: DataFrame) -> list[str]:
    """Filters that reached the parquet scan (PushedFilters: [...])."""
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", formatted_plan(df)):
        body = m.group(1).strip()
        if body:
            out.extend(s.strip() for s in body.split(","))
    return out


def read_schema_columns(df: DataFrame) -> list[list[str]]:
    """Column lists actually read from each parquet scan (ReadSchema)."""
    scans: list[list[str]] = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", formatted_plan(df)):
        body = m.group(1)
        cols = [c.split(":")[0].strip() for c in body.split(",") if c.strip()]
        scans.append(cols)
    return scans


def whole_stage_codegen_spans(df: DataFrame) -> int:
    """Number of WholeStageCodegen subtrees in the *executed* plan
    (wider spans = fewer = better).  Under AQE the codegen decision only
    exists in the final adaptive plan, so this triggers execution."""
    df.collect()   # count() would execute a different (re-planned) query
    executed = df._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001
    return len(set(re.findall(r"\*\((\d+)\)", executed)))
