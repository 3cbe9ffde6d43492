"""Ontology-subtree expansion (SURVEY.md §4 custom piece 2).

i2b2 queries select concepts by materialized-path prefix
(`c_fullname LIKE '\\AKTIN\\...%'`) against the metadata tree seeded by
addon_i2b2metadata.sql (reference: src/docker/database/Dockerfile:30).
Resolving the subtree against the (small, broadcastable) ontology
*before* planning the fact scan closes the predicate into a
`concept_cd IN (...)` list / broadcast semi join — which pushes down to
the parquet scan instead of dragging a LIKE over 100 TB of fact rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def expand_subtree(ontology: DataFrame, path_prefix: str) -> DataFrame:
    """Basecodes of all leaves under a materialized-path prefix."""
    return (ontology
            .filter(F.col("c_fullname").startswith(path_prefix))
            .filter(F.col("c_basecode").isNotNull())
            .select(F.col("c_basecode").alias("concept_cd"))
            .distinct())


def facts_in_subtree(fact: DataFrame, ontology: DataFrame,
                     path_prefix: str) -> DataFrame:
    """Fact rows whose concept lies in the subtree — broadcast semi join,
    so the big side never shuffles."""
    codes = expand_subtree(ontology, path_prefix)
    return fact.join(F.broadcast(codes), "concept_cd", "left_semi")
