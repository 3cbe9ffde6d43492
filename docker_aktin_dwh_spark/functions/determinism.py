"""Deterministic-aggregation policy (SURVEY.md §2.10 / §4 custom piece 4).

Money/measurement sums go through DECIMAL(18,4): decimal addition is
exact and associative, so the hash of a rounded sum cannot depend on
Spark's partial-aggregation order — the property the DuckDB oracle
comparison needs.  The final cast back to DOUBLE keeps result schemas
engine-neutral (DuckDB sums decimals into DECIMAL(38,4), Spark into
DECIMAL(28,4); both render the same double).

The reference stores measurement values as PostgreSQL ``numeric``
(observation_fact.nval_num — i2b2 CRC DDL provisioned at
src/docker/database/Dockerfile:25-34), so decimal semantics are also
the faithful re-expression, not just a hashing trick.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(18,4)"


def dsum(col: Column | str, scale: int = 2) -> Column:
    """Order-independent rounded sum: SUM(CAST(x AS DECIMAL)) → DOUBLE."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(F.sum(c.cast(DEC)), scale).cast("double")


def davg(col: Column | str, scale: int = 2) -> Column:
    """Deterministic mean: exact decimal sum cast to double, divided by
    count, then rounded.  Both engines divide the *same* two doubles, so
    IEEE-754 makes the quotient — and its rounding — identical."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(F.sum(c.cast(DEC)).cast("double") / F.count(c), scale)


def round2(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c, 2)


# Oracle-side (DuckDB) fragments of the same policy — keep in sync.
def sql_dsum(expr: str, scale: int = 2) -> str:
    return f"CAST(ROUND(SUM(CAST({expr} AS DECIMAL(18,4))), {scale}) AS DOUBLE)"


def sql_davg(expr: str, scale: int = 2) -> str:
    return (f"ROUND(CAST(SUM(CAST({expr} AS DECIMAL(18,4))) AS DOUBLE)"
            f" / COUNT({expr}), {scale})")
