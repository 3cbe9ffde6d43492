"""Text primitives shared by dedup / text-analysis operators.

All JVM-side (built-in higher-order functions) — no Python UDFs in the
hot path.  At 100 TB these run inside whole-stage codegen over the
`documents` scan with only the needed columns read.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def tokens(text: Column | str) -> Column:
    """Whitespace tokens of trimmed text (parity: DuckDB
    regexp_split_to_array(trim(x), '\\s+'))."""
    c = F.col(text) if isinstance(text, str) else text
    return F.split(F.trim(c), r"\s+")


def shingles(tok: Column, n: int = 3) -> Column:
    """Distinct n-gram shingles (space-joined) of a token array.

    transform(sequence(1, size-n+1)) keeps this a codegen'd expression;
    documents shorter than n tokens yield an empty array.
    """
    return F.array_distinct(
        F.transform(
            F.when(F.size(tok) >= n,
                   F.sequence(F.lit(1), F.size(tok) - (n - 1)))
             .otherwise(F.expr("array()")),
            lambda i: F.concat_ws(
                " ", *[F.element_at(tok, i + j) for j in range(n)]),
        )
    )


# DuckDB-side mirrors (list comprehension syntax), kept adjacent for parity.
SQL_TOKENS = "regexp_split_to_array(trim({col}), '\\s+')"
SQL_SHINGLES3 = ("list_distinct([t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] "
                 "for i in range(len(t) - 2)])")
