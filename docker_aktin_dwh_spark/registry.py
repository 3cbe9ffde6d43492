"""Declared-query registry.

Every operator in SURVEY.md §2 is represented by a :class:`QuerySpec`:
a Spark DataFrame builder plus (where SQL-expressible) the equivalent
ANSI SQL the DuckDB oracle runs on the same parquet fixtures.  Column
names are aliased identically on both sides — the correctness harness
sorts columns by name before value-hashing.

Determinism contract (SURVEY.md §2.10): results fully ordered on a
unique key, float aggregates rounded (money sums through DECIMAL(18,4)
so partial-aggregation order cannot perturb the hash), collect_list
always sorted, timestamps kept as naive (NTZ) microsecond values.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    key: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None          # None => non-SQL-expressible, rows-only check
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


def build_registry() -> dict[str, QuerySpec]:
    from .operators import (cohort, dedup, multimodal, prep, relational,
                            similarity, textops, udfs)

    registry: dict[str, QuerySpec] = {}
    for mod in (relational, cohort, udfs, dedup, similarity, textops,
                multimodal, prep):
        for spec in mod.specs():
            if spec.key in registry:
                raise ValueError(f"duplicate query key {spec.key}")
            registry[spec.key] = spec
    return registry


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {k: s.fn for k, s in build_registry().items()}


def oracle_sql() -> dict[str, str]:
    return {k: s.oracle for k, s in build_registry().items()
            if s.oracle is not None}
