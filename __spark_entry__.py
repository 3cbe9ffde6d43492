"""Driver contract for the spark-graft builder (PySpark target).

entry()      — flagship star query (JN-03) on sf0.001.
queries()    — every declared operator from SURVEY.md §2 (+ LLM-pipeline
               extensions), one callable per key; 265 keys as of
               round 14.  The first 50 keys (registry.CORE50) cover
               every §2 row + the LLM extension inside the driver's
               verification window (SURVEY.md §2.0); fine-grained
               per-operator keys follow and are oracle-tested locally —
               every registry key is either covered by a CORE50 key
               (directly or via a tagged union reusing its builder
               verbatim) or rows-only by declared design; new round-11
               operators certify same-round via the r11_all union and
               the ds_01/str_rep slots; round-12 operators via ds_02
               and the r12_all union; round-13 operators (colmap_01
               column mapping, var_02 variant shredding) via the
               r13_all union (slot from the cdc_04 fold); round-14
               operators (part_01 partitioned tables, upd_01 atomic
               UPDATE) via the r14_all union (slot from the ups_01
               fold).
oracle_sql() — DuckDB-equivalent SQL per key, 259 keys (omitted only
               for the genuinely non-SQL-expressible operators: smp_02
               seeded sample, the raw-pair/raw-top-k ANN and SimHash
               variants (ded_simhash_raw / ann_lsh_raw / ann_ivf_raw —
               the declared keys are hash-oracled certifications), and
               the iterative BPE trainer/encoder bpe_01 / bpe_02).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from docker_aktin_dwh_spark import registry
from docker_aktin_dwh_spark.session import apply_runtime_policy


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    apply_runtime_policy(spark)
    from docker_aktin_dwh_spark.operators.relational import jn_03
    return jn_03(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    base = registry.queries()

    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            apply_runtime_policy(spark)
            return fn(spark, sf_dir)
        return run

    return {k: wrap(fn) for k, fn in base.items()}


def oracle_sql() -> dict[str, str]:
    return registry.oracle_sql()
