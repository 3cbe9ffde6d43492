"""Entity resolution (record linkage): blocked fuzzy matching — the
dedup verb for STRUCTURED records, complementing the document-level
near-dup family (dedup.py).  A master-data load (the reference's
patient/encounter import surface, src/docker/database/Dockerfile:31)
needs exactly this step before keys can merge.

Scale shape (100 TB posture): candidate pairs are generated ONLY
within blocking buckets — (attribute, key-prefix) groups with a
bounded size — so the quadratic is per-block, never corpus-wide; the
shuffle key is the block id.  Blocking trades recall for boundedness
(a true match whose block keys differ is missed); production systems
run multiple blocking passes with different keys and union the pairs —
the second pass is the same operator with another key expression.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .. import catalog
from ..registry import QuerySpec

T = catalog.load

#: max edit distance for a candidate match
ER_MAX_DIST = 2
#: largest block the pair join may expand (the guarded-quadratic
#: discipline of dedup.NGRAM_MAX_DF): a degenerate blocking attribute
#: (all-identical names, an empty-string default) would make one block
#: corpus-sized and the "bounded" quadratic corpus-wide.  10k rows →
#: ≤ 5·10⁷ pairs per block, a bounded task; past that the guard raises
#: and names the fix (longer prefix / second blocking pass) instead of
#: silently running the blow-up.
ER_MAX_BLOCK = 10_000
#: planted-variant strides (the fixture has no natural dirty records —
#: an ER run with zero matches certifies nothing, the planted-defect
#: pattern of dq_01/pii_01)
ER_VARIANT_STRIDE = 16
ER_VARIANT2_STRIDE = 48
#: er_02's pass-2-only variant: the edit lands INSIDE pass 1's
#: blocking prefix, so single-pass blocking cannot recover it
ER_VARIANT3_STRIDE = 80


def _master_offset(c):
    """ONE control-plane aggregate for the dirty-master builders:
    max-key offset + the fixed-width name check (previously three
    separate scalar jobs across er_01/er_02 — merged r8)."""
    mx, wmin, wmax = c.agg(F.max("c_custkey"),
                           F.min(F.length("c_name")),
                           F.max(F.length("c_name"))).first()
    # the substring surgery depends on the fixture's fixed-width
    # Customer#%09d names (18 chars); verify on the data, not a Column
    if not (wmin == wmax == 18):
        raise ValueError(f"c_name not fixed-width 18: [{wmin}, {wmax}]")
    return mx + 1


def _dirty_customers(spark, sf, offset: int | None = None):
    """Customer master with planted near-duplicate records: every
    ER_VARIANT_STRIDE-th customer re-enters under a fresh id (data-
    derived max+1 offset) with the last name char replaced ('X'), and
    every ER_VARIANT2_STRIDE-th additionally with the last TWO chars
    replaced ('YY') — edit distances 1 and 2, same nation, same name
    prefix, so the variants land in the original's block."""
    c = T(spark, sf, "customer").select("c_custkey", "c_name",
                                        "c_nationkey")
    if offset is None:
        offset = _master_offset(c)
    v1 = (c.filter(F.col("c_custkey") % ER_VARIANT_STRIDE == 0)
          .select((F.col("c_custkey") + offset).alias("c_custkey"),
                  F.concat(F.substring("c_name", 1, 17), F.lit("X"))
                   .alias("c_name"),
                  "c_nationkey"))
    v2 = (c.filter(F.col("c_custkey") % ER_VARIANT2_STRIDE == 0)
          .select((F.col("c_custkey") + 2 * offset).alias("c_custkey"),
                  F.concat(F.substring("c_name", 1, 16), F.lit("YY"))
                   .alias("c_name"),
                  "c_nationkey"))
    return c.unionByName(v1).unionByName(v2)


def blocked_pairs(records, max_block: int = ER_MAX_BLOCK):
    """Candidate pairs within blocks of a (id, name, blk) frame, with
    the guarded-quadratic contract: if any block exceeds ``max_block``
    rows the guard RAISES and names the refinement, instead of
    silently running a corpus-sized join (a degenerate blocking
    attribute — identical defaults, empty strings — is the classic
    100 TB ER failure).  One aggregate checks the max block size; the
    scalar is control-plane."""
    biggest = (records.groupBy("blk").count()
               .agg(F.max("count")).first()[0]) or 0
    if biggest > max_block:
        raise ValueError(
            f"largest ER block has {biggest} rows (> {max_block}): the "
            "blocking key is degenerate for this data — lengthen the "
            "name prefix or add a second blocking pass, don't run the "
            "quadratic")
    a, bb = records.alias("a"), records.alias("b")
    return (a.join(bb, (F.col("a.blk") == F.col("b.blk"))
                   & (F.col("a.id") < F.col("b.id")))
            .select(F.col("a.id").alias("i"), F.col("b.id").alias("j"),
                    F.levenshtein(F.col("a.name"), F.col("b.name"))
                     .alias("dist")))


def er_01(spark, sf):
    """Blocked entity resolution over the dirty customer master:
    block on (c_nationkey, first 7 name digits) — ≤ 100 ids share a
    digit-prefix, so block size is bounded and the per-block pair join
    is a bounded quadratic on the BLOCK key (the only shuffle),
    enforced by blocked_pairs' raising guard.  Candidates with
    levenshtein ≤ ER_MAX_DIST emit as (i, j, dist); i < j orders the
    pair canonically."""
    d = _dirty_customers(spark, sf)
    block = F.concat_ws("|", F.col("c_nationkey").cast("string"),
                        F.substring("c_name", 10, 7))
    b = d.select(F.col("c_custkey").alias("id"),
                 F.col("c_name").alias("name"),
                 block.alias("blk"))
    return (blocked_pairs(b)
            .filter(F.col("dist") <= ER_MAX_DIST)
            .orderBy("i", "j"))


def _dirty_customers_v3(spark, sf):
    """er_02's master: er_01's dirty frame plus a pass-2-only planted
    variant — every ER_VARIANT3_STRIDE-th customer re-enters with name
    char 11 replaced ('Z'), an edit INSIDE pass 1's blocking prefix
    (chars 10-16), so pass-1 blocking puts original and variant in
    DIFFERENT blocks and the match is unrecoverable single-pass."""
    c = T(spark, sf, "customer").select("c_custkey", "c_name",
                                        "c_nationkey")
    offset = _master_offset(c)
    base = _dirty_customers(spark, sf, offset)
    v3 = (c.filter(F.col("c_custkey") % ER_VARIANT3_STRIDE == 0)
          .select((F.col("c_custkey") + 3 * offset).alias("c_custkey"),
                  F.concat(F.substring("c_name", 1, 10), F.lit("Z"),
                           F.substring("c_name", 12, 7)).alias("c_name"),
                  "c_nationkey"))
    return base.unionByName(v3)


#: the two blocking key expressions of er_02: pass 1 = er_01's
#: (nation, name chars 10-16); pass 2 = (nation, name chars 13-18) —
#: chosen so any single-char edit breaks at most one of the two keys
ER_PASS_SUBSTRINGS = ((10, 7), (13, 6))


def er_02(spark, sf):
    """Two-pass blocked entity resolution (VERDICT r7 item 5 — the
    multi-pass recall lever er_01's docstring names): candidate pairs
    from TWO independent blocking keys, unioned and deduped on (i, j).
    A true match whose edit falls inside one key's window still shares
    the other key's block, so every planted variant (distance 1 at
    char 18, distance 2 at chars 17-18, distance 1 at char 11) is
    recovered — pass 1 alone provably misses the char-11 variant
    (pinned in tests/test_llmops.py).  Both passes run as ONE STACKED
    frame: the pass index is baked into the block key, so pass-1 and
    pass-2 blocks can never mix, and the union of candidate pairs
    comes from a SINGLE guard aggregate + a SINGLE block-keyed
    shuffle instead of two of each (measured r8: 2.36 → 2.06 s
    best-of-3 at sf0.1, back-to-back) — adding a third blocking pass costs rows in
    the stacked frame, not stages in the plan."""
    d = _dirty_customers_v3(spark, sf)
    recs = None
    for p, (start, length) in enumerate(ER_PASS_SUBSTRINGS):
        block = F.concat_ws(
            "|", F.lit(str(p)), F.col("c_nationkey").cast("string"),
            F.substring("c_name", start, length))
        b = d.select(F.col("c_custkey").alias("id"),
                     F.col("c_name").alias("name"),
                     block.alias("blk"))
        recs = b if recs is None else recs.unionByName(b)
    return (blocked_pairs(recs)
            .filter(F.col("dist") <= ER_MAX_DIST)
            .distinct().orderBy("i", "j"))


#: sorted-neighborhood window: each record pairs with its W successors
#: in the sort order.  10 covers the planted suffix-edit variants: the
#: largest orig→variant gap is an id ending in 0, whose 'X' variant
#: sorts after the nine following ids (…080, 081…089, 08X).
ER_SNM_WINDOW = 10


def er_03(spark, sf):
    """Sorted-neighborhood entity resolution (Hernández–Stolfo SNM)
    over the same dirty master as er_02: sort every record by
    (name, id), slide a window of ER_SNM_WINDOW successors, emit
    candidate pairs with levenshtein ≤ ER_MAX_DIST.

    The THIRD blocking paradigm next to er_01 (prefix blocks) and
    er_02 (multi-pass blocks): SNM needs no block-size guard — the
    candidate count is EXACTLY W·n regardless of key skew (a
    degenerate attribute that blows up a block just slides past), at
    the price of recall tied to sort-key locality.  On the planted
    fixture that trade is visible and pinned in tests: suffix edits
    ('X' at char 18) stay sort-adjacent and ARE recovered; the 'YY'
    variant diverges in the sort and is recovered only incidentally
    (when its original ends a hundred-block, 4/31 at sf0.01), the
    char-11 variant never — production unions SNM passes over
    several sort keys exactly like er_02 unions blocking passes.

    Scale shape: the global sort rank comes from functions/ranking.py
    global_rank — a range exchange + parallel per-partition windows +
    broadcast offsets, NO single-partition window; pairing is an
    EQUI-join on (rank + offset) after a W-way offset explode (W·n
    rows, the SNM cost model), never a range join / NLJ."""
    from ..functions.ranking import global_rank

    d = _dirty_customers_v3(spark, sf)
    recs = d.select(F.col("c_custkey").alias("id"),
                    F.col("c_name").alias("name"))
    ranked = global_rank(recs, ["name", "id"])
    a = ranked.select(F.col("id").alias("id_a"),
                      F.col("name").alias("name_a"),
                      F.explode(F.sequence(
                          F.col("rnk") + 1,
                          F.col("rnk") + ER_SNM_WINDOW)).alias("rnk"))
    cand = a.join(ranked, "rnk")
    return (cand.select(
                F.least("id_a", "id").alias("i"),
                F.greatest("id_a", "id").alias("j"),
                F.levenshtein("name_a", "name").cast("int").alias("dist"))
                .filter(F.col("dist") <= ER_MAX_DIST)
                .orderBy("i", "j"))


def _er3_oracle() -> str:
    return f"""
WITH c AS (SELECT c_custkey, c_name, c_nationkey FROM customer),
off AS (SELECT max(c_custkey) + 1 AS o FROM c),
dirty AS (
  SELECT c_custkey, c_name FROM c
  UNION ALL
  SELECT c_custkey + off.o, substr(c_name, 1, 17) || 'X'
  FROM c, off WHERE c_custkey % {ER_VARIANT_STRIDE} = 0
  UNION ALL
  SELECT c_custkey + 2 * off.o, substr(c_name, 1, 16) || 'YY'
  FROM c, off WHERE c_custkey % {ER_VARIANT2_STRIDE} = 0
  UNION ALL
  SELECT c_custkey + 3 * off.o,
         substr(c_name, 1, 10) || 'Z' || substr(c_name, 12, 7)
  FROM c, off WHERE c_custkey % {ER_VARIANT3_STRIDE} = 0),
ranked AS (
  SELECT c_custkey AS id, c_name AS name,
         row_number() OVER (ORDER BY c_name, c_custkey) AS rnk
  FROM dirty)
SELECT least(a.id, b.id) AS i, greatest(a.id, b.id) AS j,
       CAST(levenshtein(a.name, b.name) AS INT) AS dist
FROM ranked a JOIN ranked b
  ON b.rnk BETWEEN a.rnk + 1 AND a.rnk + {ER_SNM_WINDOW}
WHERE levenshtein(a.name, b.name) <= {ER_MAX_DIST}
ORDER BY i, j
"""


def _er2_oracle() -> str:
    passes = "\nUNION\n".join(
        f"SELECT a.id AS i, b.id AS j, "
        f"CAST(levenshtein(a.name, b.name) AS INT) AS dist "
        f"FROM (SELECT c_custkey AS id, c_name AS name, "
        f"      CAST(c_nationkey AS STRING) || '|' "
        f"      || substr(c_name, {s}, {ln}) AS blk FROM dirty) a "
        f"JOIN (SELECT c_custkey AS id, c_name AS name, "
        f"      CAST(c_nationkey AS STRING) || '|' "
        f"      || substr(c_name, {s}, {ln}) AS blk FROM dirty) b "
        f"ON a.blk = b.blk AND a.id < b.id "
        f"WHERE levenshtein(a.name, b.name) <= {ER_MAX_DIST}"
        for s, ln in ER_PASS_SUBSTRINGS)
    return f"""
WITH c AS (SELECT c_custkey, c_name, c_nationkey FROM customer),
off AS (SELECT max(c_custkey) + 1 AS o FROM c),
dirty AS (
  SELECT c_custkey, c_name, c_nationkey FROM c
  UNION ALL
  SELECT c_custkey + off.o, substr(c_name, 1, 17) || 'X', c_nationkey
  FROM c, off WHERE c_custkey % {ER_VARIANT_STRIDE} = 0
  UNION ALL
  SELECT c_custkey + 2 * off.o, substr(c_name, 1, 16) || 'YY', c_nationkey
  FROM c, off WHERE c_custkey % {ER_VARIANT2_STRIDE} = 0
  UNION ALL
  SELECT c_custkey + 3 * off.o,
         substr(c_name, 1, 10) || 'Z' || substr(c_name, 12, 7),
         c_nationkey
  FROM c, off WHERE c_custkey % {ER_VARIANT3_STRIDE} = 0)
{passes}
ORDER BY i, j
"""


_ER_ORACLE = f"""
WITH c AS (SELECT c_custkey, c_name, c_nationkey FROM customer),
off AS (SELECT max(c_custkey) + 1 AS o FROM c),
dirty AS (
  SELECT c_custkey, c_name, c_nationkey FROM c
  UNION ALL
  SELECT c_custkey + off.o, substr(c_name, 1, 17) || 'X', c_nationkey
  FROM c, off WHERE c_custkey % {ER_VARIANT_STRIDE} = 0
  UNION ALL
  SELECT c_custkey + 2 * off.o, substr(c_name, 1, 16) || 'YY', c_nationkey
  FROM c, off WHERE c_custkey % {ER_VARIANT2_STRIDE} = 0),
blocked AS (
  SELECT c_custkey AS id, c_name AS name,
         CAST(c_nationkey AS STRING) || '|' || substr(c_name, 10, 7)
           AS blk
  FROM dirty)
SELECT a.id AS i, b.id AS j,
       CAST(levenshtein(a.name, b.name) AS INT) AS dist
FROM blocked a JOIN blocked b ON a.blk = b.blk AND a.id < b.id
WHERE levenshtein(a.name, b.name) <= {ER_MAX_DIST}
ORDER BY i, j
"""


_DOCS = {
    "er_01": "Blocked entity resolution: bounded per-block fuzzy pair "
             "join (levenshtein <= 2) over a planted-variant customer "
             "master",
    "er_02": "Two-pass blocked entity resolution: pairs unioned from "
             "two independent blocking keys recover a variant whose "
             "edit breaks pass 1's block (the multi-pass recall lever)",
    "er_03": "Sorted-neighborhood entity resolution: distributed "
             "global rank (range exchange + parallel windows + "
             "broadcast offsets, no single-partition stage), W-offset "
             "equi-join pairing — candidate count exactly W*n "
             "regardless of key skew",
}


def specs() -> list[QuerySpec]:
    return [
        QuerySpec(key="er_01", fn=er_01, oracle=_ER_ORACLE,
                  doc=_DOCS["er_01"], tags=("llm", "entity")),
        QuerySpec(key="er_02", fn=er_02, oracle=_er2_oracle(),
                  doc=_DOCS["er_02"], tags=("llm", "entity")),
        QuerySpec(key="er_03", fn=er_03, oracle=_er3_oracle(),
                  doc=_DOCS["er_03"], tags=("llm", "entity")),
    ]
