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

    zip_with over n shifted slices, not transform+element_at: inside a
    higher-order-function lambda Catalyst re-inlines the token
    expression per element, so an element_at formulation re-runs the
    regex split ~3×|tokens| times per document.  The slice form
    references the token array a constant number of times per row
    (4× faster on the documents fixture).  Documents shorter than n
    tokens yield an empty array.
    """
    ln = F.greatest(F.size(tok) - (n - 1), F.lit(0))
    parts = [F.slice(tok, i + 1, ln) for i in range(n)]
    zipped = parts[0]
    for p in parts[1:]:
        zipped = F.zip_with(zipped, p, lambda a, b: F.concat(a, F.lit(" "), b))
    return F.array_distinct(zipped)


# DuckDB-side mirrors (list comprehension syntax), kept adjacent for parity.
SQL_TOKENS = "regexp_split_to_array(trim({col}), '\\s+')"
SQL_SHINGLES3 = ("list_distinct([t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] "
                 "for i in range(len(t) - 2)])")
