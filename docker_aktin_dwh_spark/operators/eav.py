"""EAV pivot strategy (SURVEY.md §4 custom piece 1).

The i2b2 fact table is entity–attribute–value: a logical patient record
is N rows keyed by concept_cd (reference: CRC schema provisioned at
src/docker/database/Dockerfile:25-34).  Reports need it wide.  Two
physical strategies, chosen by concept-list size:

- small, known list  → conditional aggregation (`max(when(...))`) —
  one pass, no pivot metadata exchange, stays in whole-stage codegen;
- large / open list  → `groupBy().pivot(values=...)` with the value
  list resolved first (never the two-pass pivot that scans the 100 TB
  fact table just to enumerate columns).

Keep the fact long on disk; pivot late, after filters have pruned.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: below this many concepts, conditional aggregation beats pivot
PIVOT_THRESHOLD = 64


def widen(fact: DataFrame, concepts: Sequence[str], *,
          entity_col: str = "encounter_num",
          concept_col: str = "concept_cd",
          value_col: str = "nval_num",
          agg: str = "max",
          out_names: Sequence[str] | None = None) -> DataFrame:
    """Wide frame: one row per entity, one column per requested concept."""
    names = list(out_names) if out_names else [c.replace(":", "_") for c in concepts]
    aggfn = getattr(F, agg)
    if len(concepts) <= PIVOT_THRESHOLD:
        exprs = [
            aggfn(F.when(F.col(concept_col) == c, F.col(value_col))).alias(n)
            for c, n in zip(concepts, names)
        ]
        return fact.groupBy(entity_col).agg(*exprs)
    wide = (fact.filter(F.col(concept_col).isin(list(concepts)))
                .groupBy(entity_col)
                .pivot(concept_col, list(concepts))
                .agg(aggfn(F.col(value_col))))
    mapping = dict(zip(concepts, names))
    return wide.select(entity_col,
                       *[F.col(f"`{c}`").alias(mapping[c]) for c in concepts])
