"""Bloom-filter-pruned semi-join — Spark's runtime row-level filtering
pattern as a first-class, certifiable operator.

At 100 TB the expensive part of ``probe SEMI JOIN build`` is shuffling
the probe side: every probe row travels to its hash partition even
though most match nothing.  The Bloom prune cuts that volume BEFORE the
exchange: a bitset built from the build keys is broadcast-attached to
the probe scan as ONE projection expression, and only rows the filter
admits (all true matches + a bounded false-positive residue) reach the
exact join.  This is exactly what Spark's adaptive runtime filters
(`spark.sql.optimizer.runtime.bloomFilter.enabled`) inject for you when
statistics justify it — here it is explicit, testable, and usable from
queries the optimizer won't rewrite.

Scale shape:
- The bitset is built DISTRIBUTED: per build key, K positions (JVM
  ``xxhash64(key, seed)``), groupBy(word) ``bit_or`` into ≤ BITS/64
  64-bit words — map-side combinable, the only shuffle is on word
  index (≤ 2048 groups).
- The words fold into ONE map<int,long> row and attach to the probe by
  broadcast ``crossJoin`` (the vq_01 scalar-attach discipline); the
  probe-side test is a pure-JVM conjunction of K bit probes — no
  explode, no join, no Python, row amplification 1.
- No false negatives by construction, so the pruned exact join returns
  EXACTLY the plain semi-join result — the DuckDB oracle is the plain
  semi-join aggregate, and the hash certifies the prune lost nothing.
- False positives only cost work (they are removed by the exact join);
  the rate is sized by BLM_BITS/BLM_HASHES (~0.1% at 10k keys).

Reference analogue: the reference fronts stock PostgreSQL 14, whose
planner uses hash-join Bloom pruning internally
(/root/reference/src/docker/database/Dockerfile:8); this operator is
the explicit distributed form.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .. import catalog
from ..functions.determinism import dsum, sql_dsum
from ..registry import QuerySpec

T = catalog.load

#: bitset size (bits) and probe count: 2^17 bits / 5 hashes keeps the
#: false-positive rate under ~0.1% for ~10k build keys while the words
#: map stays ≤ 2048 entries (16 KB broadcast).  At a real 100 TB build
#: side, size BITS from the build-count estimate (n·10 bits for ~1%).
BLM_BITS = 1 << 17
BLM_HASHES = 5


def _positions(key_col: str, seed: int, bits: int):
    """Bloom position for (key, seed): pmod(xxhash64(key, seed), bits).
    xxhash64 is JVM-side and identical across executors/runs."""
    return F.pmod(F.xxhash64(F.col(key_col).cast("long"), F.lit(seed)),
                  F.lit(bits))


def bloom_words(keys: DataFrame, key_col: str,
                bits: int = BLM_BITS) -> DataFrame:
    """Distributed bitset build: K positions per key → groupBy(word
    index) bit_or of the single-bit masks → ONE row holding the
    map<word_idx, word>.  ≤ bits/64 groups, map-side combinable."""
    pos = keys.select(
        F.explode(F.array(*[_positions(key_col, s, bits)
                            for s in range(BLM_HASHES)])).alias("pos"))
    words = (pos.select(F.shiftright("pos", 6).cast("int").alias("widx"),
                        F.expr("shiftleft(CAST(1 AS BIGINT), "
                               "CAST(pos % 64 AS INT))").alias("m"))
                .groupBy("widx").agg(F.bit_or("m").alias("w")))
    return words.agg(F.map_from_entries(
        F.array_sort(F.collect_list(F.struct("widx", "w"))))
        .alias("bloom"))


def bloom_prune(probe: DataFrame, probe_col: str,
                words_row: DataFrame, bits: int = BLM_BITS) -> DataFrame:
    """Attach the bitset (broadcast 1-row crossJoin) and keep rows whose
    K probe bits are ALL set — one JVM projection, no row amplification.
    Guarantees: every true match survives (no false negatives)."""
    tests = []
    for s in range(BLM_HASHES):
        pos = _positions(probe_col, s, bits)
        # element_at on a MAP is key lookup (missing word => no bits)
        word = F.coalesce(
            F.element_at("bloom", F.shiftright(pos, 6).cast("int")),
            F.lit(0).cast("long"))
        # shiftleft-by-column has no PySpark wrapper (numBits must be a
        # Python int there); the SQL form accepts an expression
        mask = F.expr(f"shiftleft(CAST(1 AS BIGINT), "
                      f"CAST(pmod(xxhash64(CAST({probe_col} AS BIGINT),"
                      f" {s}), {bits}) % 64 AS INT))")
        tests.append(word.bitwiseAND(mask) != 0)
    keep = tests[0]
    for t in tests[1:]:
        keep = keep & t
    return (probe.crossJoin(F.broadcast(words_row))
                 .filter(keep).drop("bloom"))


def blm_01(spark, sf):
    """Bloom-pruned semi-join: revenue by order priority for orders
    whose customer sits in the BUILDING market segment.  The filtered
    customer keys build the bitset; the orders scan is pruned by the
    broadcast bit test BEFORE the exact semi-join, so only admitted
    rows reach the join exchange.  Result ≡ the plain semi-join
    aggregate (no false negatives; false positives die in the exact
    join) — the oracle certifies zero loss."""
    cust = (T(spark, sf, "customer")
            .filter(F.col("c_mktsegment") == "BUILDING")
            .select("c_custkey"))
    orders = T(spark, sf, "orders")
    cand = bloom_prune(orders, "o_custkey", bloom_words(cust, "c_custkey"))
    kept = cand.join(cust, cand.o_custkey == cust.c_custkey, "semi")
    return (kept.groupBy("o_orderpriority")
                .agg(F.count("*").alias("n_orders"),
                     dsum("o_totalprice").alias("revenue"))
                .orderBy("o_orderpriority"))


_BLM_ORACLE = f"""
SELECT o_orderpriority,
       count(*) AS n_orders,
       {sql_dsum('o_totalprice')} AS revenue
FROM orders
WHERE o_custkey IN (SELECT c_custkey FROM customer
                    WHERE c_mktsegment = 'BUILDING')
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def specs() -> list[QuerySpec]:
    return [
        QuerySpec(
            key="blm_01", fn=blm_01, oracle=_BLM_ORACLE,
            doc="Bloom-filter-pruned semi-join: distributed bitset "
                "build (groupBy(word) bit_or), broadcast map attach, "
                "pure-JVM K-bit probe conjunction on the scan, exact "
                "semi-join on the survivors — result ≡ plain semi-join "
                "(hash-certified zero loss)",
            tags=("relational", "join", "bloom")),
    ]
