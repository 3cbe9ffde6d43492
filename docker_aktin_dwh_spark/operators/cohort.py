"""Cohort / panel algebra — the reference's signature query semantics.

The i2b2 CRC query builder turns a panel tree (AND of panels, OR within
a panel, NOT for exclusion, same-encounter + temporal constraints) into
SQL over observation_fact and answers COUNT(DISTINCT patient_num)
(SURVEY.md §3.1 [P], anchored to the CRC schema provisioned at
reference src/docker/database/Dockerfile:25-34 and the webclient at
src/docker/httpd/Dockerfile:20).

Spark re-design (SURVEY.md §3.1): no SQL-string round trip — each panel
is a filtered fact scan; OR = IN-list, AND = left-semi chain on
patient_num, NOT = left-anti; the final aggregate is an exact two-phase
countDistinct.  Patient sets are reusable DataFrames (persist() is the
temp-table analogue).  All shuffles key on patient_num; concept filters
push down to the fact scan (IN-lists closed first via
ontology.expand_subtree).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .. import catalog
from ..functions.determinism import dsum
from ..registry import QuerySpec
from . import eav, ontology


@dataclass(frozen=True)
class Panel:
    """One i2b2 panel: OR of concept items, optional constraints."""
    concepts: tuple[str, ...]                 # OR within the panel
    invert: bool = False                      # panel NOT (exclusion)
    date_from: str | None = None              # 'YYYY-MM-DD' on start_date
    date_to: str | None = None
    min_value: float | None = None            # nval_num >= (valtype N)
    subtree: str | None = None                # ontology path prefix (expands to concepts)
    min_occurrences: int = 1                  # i2b2 "at least N times" constraint


@dataclass(frozen=True)
class CohortQuery:
    """AND across panels; same_encounter constrains all panels to one visit."""
    panels: tuple[Panel, ...]
    same_encounter: bool = False


def _panel_facts(fact: DataFrame, panel: Panel,
                 ont: DataFrame | None = None) -> DataFrame:
    f = fact
    if panel.subtree is not None:
        assert ont is not None, "subtree panels need an ontology frame"
        f = ontology.facts_in_subtree(f, ont, panel.subtree)
    if panel.concepts:
        f = f.filter(F.col("concept_cd").isin(list(panel.concepts)))
    if panel.date_from:
        f = f.filter(F.col("start_date")
                     >= F.expr(f"timestamp_ntz'{panel.date_from} 00:00:00'"))
    if panel.date_to:
        f = f.filter(F.col("start_date")
                     < F.expr(f"timestamp_ntz'{panel.date_to} 00:00:00'"))
    if panel.min_value is not None:
        f = f.filter((F.col("valtype_cd") == "N")
                     & (F.col("nval_num") >= panel.min_value))
    return f


def compile_cohort(fact: DataFrame, q: CohortQuery,
                   ont: DataFrame | None = None) -> DataFrame:
    """Patient set (distinct patient_num) satisfying the panel tree."""
    key = "encounter_num" if q.same_encounter else "patient_num"
    positives = [p for p in q.panels if not p.invert]
    negatives = [p for p in q.panels if p.invert]
    if not positives:
        raise ValueError("cohort needs at least one non-inverted panel")

    def keys_of(p: Panel) -> DataFrame:
        facts = _panel_facts(fact, p, ont)
        if p.min_occurrences > 1:
            # AGG-08 shape: one hash agg keyed like the semi joins — the
            # occurrence filter rides the same shuffle key
            return (facts.groupBy(key)
                    .agg(F.count("*").alias("__n"))
                    .filter(F.col("__n") >= p.min_occurrences)
                    .select(key))
        return facts.select(key).distinct()

    acc = keys_of(positives[0])
    for p in positives[1:]:
        acc = acc.join(keys_of(p), key, "left_semi")
    for p in negatives:
        acc = acc.join(keys_of(p), key, "left_anti")
    if q.same_encounter:
        acc = (fact.select("encounter_num", "patient_num").distinct()
                   .join(acc, "encounter_num", "left_semi")
                   .select("patient_num").distinct())
    return acc


def patient_count(fact: DataFrame, q: CohortQuery,
                  ont: DataFrame | None = None) -> DataFrame:
    return compile_cohort(fact, q, ont).agg(
        F.countDistinct("patient_num").alias("n_patients"))


# --------------------------------------------------------------------------
# Declared queries over the clinical derivations (FIXTURES.md §B)
# --------------------------------------------------------------------------

def _fact(spark, sf):
    return catalog.observation_fact(spark, sf)


def coh_01(spark, sf):
    """Panel AND: patients with concept R:1 and concept N:2."""
    q = CohortQuery(panels=(Panel(concepts=("AKTIN:R:1",)),
                            Panel(concepts=("AKTIN:N:2",))))
    return patient_count(_fact(spark, sf), q)


def coh_02(spark, sf):
    """OR within a panel: any of three codes."""
    q = CohortQuery(panels=(
        Panel(concepts=("AKTIN:R:1", "AKTIN:A:5", "AKTIN:N:7")),))
    return patient_count(_fact(spark, sf), q)


def coh_03(spark, sf):
    """Exclusion: concept R:1 but never N:2."""
    q = CohortQuery(panels=(Panel(concepts=("AKTIN:R:1",)),
                            Panel(concepts=("AKTIN:N:2",), invert=True)))
    return patient_count(_fact(spark, sf), q)


def coh_04(spark, sf):
    """Same-encounter AND (JN-07 clinical shape)."""
    q = CohortQuery(panels=(Panel(concepts=("AKTIN:R:1",)),
                            Panel(concepts=("AKTIN:N:2",))),
                    same_encounter=True)
    return patient_count(_fact(spark, sf), q)


def coh_05(spark, sf):
    """Value + date constraints, broken down by sex (report shape)."""
    q = CohortQuery(panels=(
        Panel(concepts=(), date_from="1996-01-01", date_to="1998-01-01",
              min_value=30.0),))
    cohort = compile_cohort(_fact(spark, sf), q)
    pat = catalog.patient_dimension(spark, sf)
    return (pat.join(cohort, "patient_num", "left_semi")
               .groupBy("sex_cd").agg(F.count("*").alias("n"))
               .orderBy("sex_cd"))


def coh_06(spark, sf):
    """Occurrence constraint: patients with >= 3 observations of R:1
    (i2b2 'at least N times' panel option)."""
    q = CohortQuery(panels=(
        Panel(concepts=("AKTIN:R:1",), min_occurrences=3),))
    return patient_count(_fact(spark, sf), q)


def temporal_pair_cohort(fact: DataFrame, first_cd: str, then_cd: str,
                         within_hours: int) -> DataFrame:
    """Patients with `then_cd` observed within `within_hours` after
    `first_cd` in the same encounter — the CRC temporal-panel shape
    (JN-08 clinical form).  Same-encounter equi-join carries the time
    predicate as a residual filter: the join key is encounter_num, so
    the shuffle is keyed and bounded — never a time-range nested loop."""
    a = (fact.filter(F.col("concept_cd") == first_cd)
             .select("encounter_num", "patient_num",
                     F.col("start_date").alias("t_first")))
    b = (fact.filter(F.col("concept_cd") == then_cd)
             .select("encounter_num", F.col("start_date").alias("t_then")))
    hits = (a.join(b, "encounter_num")
             .filter((F.col("t_then") >= F.col("t_first"))
                     & (F.col("t_then") <= F.col("t_first")
                        + F.expr(f"INTERVAL {within_hours} HOURS"))))
    return hits.select("patient_num").distinct()


def coh_07(spark, sf):
    """Temporal pair: R:22 within 180 days after R:11, same encounter
    (window sized to the fixture's per-encounter date spread)."""
    pats = temporal_pair_cohort(_fact(spark, sf), "AKTIN:R:11",
                                "AKTIN:R:22", within_hours=4320)
    return pats.agg(F.countDistinct("patient_num").alias("n_patients"))


def ont_01(spark, sf):
    """Subtree expansion: facts per concept under \\AKTIN\\R\\."""
    fact = _fact(spark, sf)
    ont = catalog.ontology(spark, sf)
    return (ontology.facts_in_subtree(fact, ont, "\\AKTIN\\R\\")
            .groupBy("concept_cd").agg(F.count("*").alias("n"))
            .orderBy("concept_cd"))


#: (concept, patient) pair-count threshold above which ont_02's
#: per-node distinct switches from exact countDistinct to ont_03's
#: approx_count_distinct sketch (mirrors DQ2_EXACT_MAX_ROWS — exact
#: stays below the gate so the sf0.01 oracle certifies bit-for-bit)
ONT2_EXACT_MAX_PAIRS = 5_000_000


def ont_02(spark, sf, exact_max_pairs: int = ONT2_EXACT_MAX_PAIRS):
    """Ontology hierarchy rollup — i2b2's "totalnum" per tree node
    (the patient/fact counts the ontology browser shows beside every
    folder, computed by the provisioned system's totalnum batch job
    over the metadata tree seeded at reference
    src/docker/database/Dockerfile:30): for EVERY node of the
    materialized-path tree, the fact count and distinct-patient count
    over descendant-or-self concepts.

    Distributed shape — NO recursion, NO per-node subtree queries,
    and PRE-AGGREGATION before the ancestor fan-out (the measured-3×
    rule: never explode what you can aggregate first):

    - n_facts: ONE groupBy(concept) over the fact table (the only
      corpus-sized stage), then the ancestor explode runs on the
      concept-cardinality frame (~150 rows) and per-node sums fold
      the partials — decomposable-aggregate rollup, rollup_01's rule.
    - totalnum: distinct (concept, patient) pairs first (one shuffle,
      output bounded by concepts × patients, far below facts), THEN
      explode each pair's ≤ depth ancestors and countDistinct per
      node — needed because a patient under several child concepts
      must count once at the folder.

    The ancestor prefixes come from a pure JVM transform
    (split + slice + array_join — depth is 3 here, single digits in
    any real ontology).  The per-node distinct is SIZE-GATED
    (VERDICT r8 item 1, the dq_02 pattern): exact countDistinct
    below ``exact_max_pairs`` (concept, patient) pairs — the arm the
    sf0.01 oracle certifies bit-for-bit — and ont_03's mergeable HLL
    sketch (approx_count_distinct, bytes of state per node) above
    it, because at 100 TB the root folders' distinct sets are
    patient-corpus sized.  The gate scalar counts the
    ontology-joinable subset of the pair frame that is ALREADY
    materialized for both output branches (localCheckpoint-pinned
    partitions semi-joined against the broadcast ancestor map — no
    fact-table re-scan, and out-of-ontology facts cannot inflate the
    gate; ADVICE r15)."""
    fact = _fact(spark, sf).select("patient_num", "concept_cd")
    cd = catalog.concept_dimension(spark, sf).select(
        "concept_cd", F.col("concept_path").alias("path"))

    def anc(path_col: str):
        parts = F.split(path_col, "\\\\")    # regex: one literal \
        nk = F.size(parts) - 2
        return F.transform(
            F.sequence(F.lit(1), nk),
            lambda k: F.concat(F.lit("\\"),
                               F.array_join(F.slice(parts, 2, k), "\\"),
                               F.lit("\\")))

    # ONE corpus scan feeds both rollups: the (concept, patient)
    # partial counts ARE the distinct pairs AND sum back to the
    # per-concept fact counts.  The pair frame is MATERIALIZED (the
    # bm25 single-scan rule) so the n_facts and totalnum branches
    # don't each re-derive the fact table.  Fixture-scale honesty
    # (measured): the synthetic fixture has ~1 fact per (concept,
    # patient) pair, so pairs ≈ facts and the barrier costs ~0.4 s
    # more than the double scan (3.9 vs 4.2 s at sf0.1); on real
    # clinical data patients accrue MANY facts per concept over time,
    # pairs ≪ facts, and the barrier saves a full corpus re-scan —
    # the 100 TB decision, taken knowingly against the fixture
    # micro-benchmark
    from ..functions.barrier import materialize

    # r15 optimization (guide §2.3 "shuffle keys, not payloads" /
    # measured 5.0 → 2.2 s at sf0.1, identical rows): the ancestor
    # expansion — a regex split + array_join transform — used to run
    # per cp ROW in BOTH branches (520k × 2 evaluations at sf0.1, and
    # pair-frame-sized at 100 TB).  The ontology has only ~154 distinct
    # concepts, so ancestors are computed ONCE on the concept dimension
    # and broadcast-joined; the checkpoint also narrows (no path string
    # pinned per pair).  Inner-join semantics unchanged: concepts
    # without an ontology row dropped before, and drop at the ancmap
    # join now (collect-equality pinned while measuring).
    # r16 (guide §2.5, the r15 spread discipline): the single-file
    # fact scan ran the map-side partial agg on ONE task; spread on
    # the group key pre-partitions at core width and the groupBy
    # REUSES the exchange (no extra shuffle) — measured A/B/A/B
    # 1.84/1.92 → 1.64/1.33 s on the cp build; size-derived no-op on
    # a wide 100 TB scan.
    from ..functions.barrier import spread
    cp = materialize(spread(fact, "concept_cd", "patient_num")
                     .groupBy("concept_cd", "patient_num")
                     .agg(F.count("*").alias("n")))
    ancmap = cd.select("concept_cd",
                       F.explode(anc("path")).alias("c_fullname"))
    n_facts = (cp.groupBy("concept_cd").agg(F.sum("n").alias("n"))
               .join(F.broadcast(ancmap), "concept_cd")
               .groupBy("c_fullname")
               .agg(F.sum("n").alias("n_facts")))
    # gate on the pinned pair frame (cheap count of checkpointed
    # partitions, not a corpus scan): exact two-phase distinct below,
    # ont_03's HLL sketch above.  ADVICE r15: the count is restricted
    # to concepts the ontology actually joins (semi-join against the
    # ~154-row broadcast ancestor map), so out-of-ontology facts can
    # no longer inflate the gate and flip the certified exact arm to
    # the sketch near the cap — the gate counts exactly the pairs the
    # totalnum aggregate will see.
    in_ont = cp.join(F.broadcast(ancmap.select("concept_cd").distinct()),
                     "concept_cd", "left_semi")
    if in_ont.count() <= exact_max_pairs:
        distinct_agg = F.countDistinct("patient_num")
    else:
        distinct_agg = F.approx_count_distinct("patient_num",
                                               _ONT3_RSD)
    totalnum = (cp.join(F.broadcast(ancmap), "concept_cd")
                .groupBy("c_fullname")
                .agg(distinct_agg.alias("totalnum")))
    return (n_facts.join(totalnum, "c_fullname")
            .orderBy("c_fullname"))


#: ont_03's sketch acceptance band (agg_03's 5-rsd discipline)
_ONT3_RSD = 0.05


def ont_03(spark, sf):
    """ont_02's totalnum with the declared 100 TB swap actually
    WIRED: the per-node distinct-patient count comes from the
    mergeable HLL sketch (approx_count_distinct — the fed_hll path)
    instead of the exact two-phase distinct, so a top folder's state
    is bytes of sketch rather than a patient-corpus-sized set.
    Certified as a bounded self-check (the agg_03 pattern): the exact
    count rides beside the estimate and the hashed boolean asserts
    |apx − exact| ≤ 5·rsd·exact per node — the oracle states TRUE, so
    the hash proves the sketch rollup stayed inside the band."""
    fact = _fact(spark, sf).select("patient_num", "concept_cd")
    cd = catalog.concept_dimension(spark, sf).select(
        "concept_cd", F.col("concept_path").alias("path"))

    def anc(path_col: str):
        parts = F.split(path_col, "\\\\")    # regex: one literal \
        nk = F.size(parts) - 2
        return F.transform(
            F.sequence(F.lit(1), nk),
            lambda k: F.concat(F.lit("\\"),
                               F.array_join(F.slice(parts, 2, k), "\\"),
                               F.lit("\\")))

    # ancestors computed once per CONCEPT (154 rows), not per fact row
    # (600k at sf0.1) — ont_02's r15 broadcast-ancmap rewrite; the
    # (patient, c_fullname) multiset is identical, so both the exact
    # distinct and the HLL sketch are unchanged
    ancmap = cd.select("concept_cd",
                       F.explode(anc("path")).alias("c_fullname"))
    exploded = (fact.join(F.broadcast(ancmap), "concept_cd")
                .select("patient_num", "c_fullname"))
    return (exploded.groupBy("c_fullname")
            .agg(F.countDistinct("patient_num").alias("totalnum"),
                 F.approx_count_distinct("patient_num").alias("_apx"))
            .select("c_fullname", "totalnum",
                    (F.abs(F.col("_apx") - F.col("totalnum"))
                     <= 5 * _ONT3_RSD * F.col("totalnum"))
                    .alias("within_bound"))
            .orderBy("c_fullname"))


_ONT3_ORACLE_BODY = """
SELECT a.c_fullname, count(DISTINCT f.patient_num) AS totalnum,
       TRUE AS within_bound
FROM observation_fact f
JOIN concept_dimension c ON c.concept_cd = f.concept_cd,
LATERAL (
  SELECT unnest(['\\' || array_to_string(
                   (string_split(c.concept_path, '\\'))[2:k+1], '\\')
                 || '\\'
                 FOR k IN range(1, len(string_split(c.concept_path,
                                                    '\\')) - 1)])
           AS c_fullname) a
GROUP BY a.c_fullname ORDER BY a.c_fullname
"""


_ONT2_ORACLE_BODY = """
SELECT a.c_fullname, count(*) AS n_facts,
       count(DISTINCT f.patient_num) AS totalnum
FROM observation_fact f
JOIN concept_dimension c ON c.concept_cd = f.concept_cd,
LATERAL (
  SELECT unnest(['\\' || array_to_string(
                   (string_split(c.concept_path, '\\'))[2:k+1], '\\')
                 || '\\'
                 FOR k IN range(1, len(string_split(c.concept_path,
                                                    '\\')) - 1)])
           AS c_fullname) a
GROUP BY a.c_fullname ORDER BY a.c_fullname
"""


def eav_01(spark, sf):
    """EAV → wide pivot: numeric concepts per encounter (doubles for
    engine-neutral schema)."""
    fact = _fact(spark, sf)
    wide = eav.widen(fact, ["AKTIN:N:0", "AKTIN:N:3", "AKTIN:N:6"],
                     out_names=["c0", "c3", "c6"])
    return (wide.select("encounter_num",
                        F.col("c0").cast("double").alias("c0"),
                        F.col("c3").cast("double").alias("c3"),
                        F.col("c6").cast("double").alias("c6"))
                .filter(F.coalesce("c0", "c3", "c6").isNotNull())
                .orderBy("encounter_num"))


def rep_01(spark, sf):
    """Monthly zero-filled report: 1996 months × inout class (JN-10
    scaffold + AGG-01 + FN-DT composition — the R-report analogue,
    reference R runtime installed via src/build.sh:273)."""
    months = spark.range(1, 13).select(F.col("id").cast("int").alias("m"))
    classes = spark.createDataFrame([("I",), ("O",)], ["inout_cd"])
    scaffold = months.crossJoin(classes)
    v = catalog.visit_dimension(spark, sf)
    counts = (v.filter((F.col("start_date") >= F.expr("timestamp_ntz'1996-01-01 00:00:00'"))
                       & (F.col("start_date") < F.expr("timestamp_ntz'1997-01-01 00:00:00'")))
               .groupBy(F.month("start_date").alias("m"), "inout_cd")
               .agg(F.count("*").alias("cnt")))
    return (scaffold.join(counts, ["m", "inout_cd"], "left")
                    .select("m", "inout_cd",
                            F.coalesce("cnt", F.lit(0)).alias("n"))
                    .orderBy("m", "inout_cd"))


#: small-cell suppression threshold — German clinical-report privacy
#: practice: aggregate cells below k are suppressed before export
#: (the AKTIN monthly report is exactly such an export; R runtime
#: reference src/build.sh:273).
PRIV_K = 5


def priv_01(spark, sf):
    """Privacy-thresholded report (k-anonymity small-cell suppression):
    the monthly report with cells n < PRIV_K suppressed to NULL and a
    `suppressed` marker kept so row counts stay stable (consumers see
    WHICH cells were censored, never the small value).  Pure
    post-aggregation projection — composes on rep_01's frame, adds no
    shuffle."""
    base = rep_01(spark, sf)
    small = (F.col("n") > 0) & (F.col("n") < PRIV_K)
    return (base.select(
                "m", "inout_cd",
                F.when(small, F.lit(None).cast("long"))
                 .otherwise(F.col("n")).alias("n"),
                small.alias("suppressed"))
            .orderBy("m", "inout_cd"))


#: priv_02 Laplace scale: ε = 1, count sensitivity 1 → b = 1/ε
PRIV_EPS = 1.0
#: md5-derived uniform resolution (12 hex digits = 48 bits, exact in
#: a double; mix_02's integer-md5-bits discipline)
PRIV2_BITS = 1 << 48


def priv_02(spark, sf, salt: str | None = None):
    """Laplace-mechanism noisy release of the monthly report —
    sensitivity-1 counts, released = max(n + round(lap), 0) with
    lap = −(1/ε)·sign(u)·ln(1−2|u|) and u ∈ (−0.5, 0.5) drawn from
    48 md5 bits of (salt | cell key), exact in a double so both
    engines compute identical noise (the repo's md5-uniform
    discipline).

    PRIVACY CONTRACT (ADVICE r8 — stated where consumers look, not
    just here): with ``salt=None`` the seed is the PUBLIC cell key,
    so the noise is publicly recomputable and the release provides
    **zero actual privacy** — that mode exists solely so the DuckDB
    oracle can hash-certify the mechanism's arithmetic
    ("certification mode").  An actual ε-DP release REQUIRES a
    secret per-release ``salt``; the mechanism and ε-calibration are
    unchanged by the seed swap.  Pure post-aggregation projection on
    rep_01's frame — no extra shuffle, noise is per-cell JVM
    arithmetic."""
    base = rep_01(spark, sf)
    seed_cols = ["m", "inout_cd"]
    seed = (F.concat_ws("|", F.lit(salt), *seed_cols) if salt is not None
            else F.concat_ws("|", *seed_cols))
    h = F.conv(F.substring(F.md5(seed), 1, 12), 16, 10).cast("long")
    u = (h + F.lit(0.5)) / PRIV2_BITS - F.lit(0.5)
    lap = (-1.0 / PRIV_EPS) * F.signum(u) * F.log(1.0 - 2 * F.abs(u))
    released = F.greatest(F.col("n") + F.round(lap).cast("long"),
                          F.lit(0).cast("long"))
    return (base.select("m", "inout_cd", released.alias("n_noisy"))
            .orderBy("m", "inout_cd"))


def priv_03(spark, sf):
    """Date-shift pseudonymization — the HIPAA Safe-Harbor-style
    de-identification transform a clinical DWH exports under
    (reference analogue: the pseudonymized broker export, SURVEY §3.3):
    every patient's timestamps shift by a DETERMINISTIC per-patient
    offset in [-14, +14] days (md5 bits mod 29 − 14 — the repo's
    md5-uniform discipline, reproducible with no stored mapping), and
    patient_num itself is replaced by an md5 pseudo-id.  Calendar
    identity is destroyed; WITHIN-patient intervals are preserved
    EXACTLY — and the certification makes that the load-bearing claim:
    the Spark side computes each patient's visit span from the
    SHIFTED timestamps while the oracle computes it from the
    UNSHIFTED ones, so the hash match IS the interval-preservation
    proof, not an assertion beside it.  One groupBy(patient); the
    shift is per-row JVM arithmetic."""
    v = catalog.visit_dimension(spark, sf).select(
        "patient_num", "start_date")
    pstr = F.col("patient_num").cast("string")
    shift = (F.pmod(F.conv(F.substring(F.md5(pstr), 1, 6), 16, 10)
                    .cast("long"), F.lit(29)) - 14).cast("int")
    s = (v.withColumn("pid", F.substring(F.md5(pstr), 1, 16))
          .withColumn("sd", shift)
          .withColumn("ts2", F.expr("timestampadd(DAY, sd, start_date)")))
    return (s.groupBy("pid")
            .agg(F.count("*").alias("n_visits"),
                 F.min("sd").alias("shift_d"),
                 (F.unix_micros(F.min("ts2").cast("timestamp"))
                  / 1_000_000).cast("long").alias("first_s"),
                 ((F.unix_micros(F.max("ts2").cast("timestamp"))
                   - F.unix_micros(F.min("ts2").cast("timestamp")))
                  / 1_000_000).cast("long").alias("span_s"))
            .orderBy("pid"))


def _priv_03_oracle() -> str:
    ct = catalog.clinical_with_clause(("visit_dimension",))
    return ct.rstrip("\n") + """,
s AS (SELECT substr(md5(CAST(patient_num AS VARCHAR)), 1, 16) AS pid,
             CAST(CAST(('0x' || substr(md5(CAST(patient_num AS VARCHAR)),
                                       1, 6)) AS BIGINT) % 29 - 14
                  AS INT) AS sd,
             start_date
      FROM visit_dimension)
SELECT pid, count(*) AS n_visits, min(sd) AS shift_d,
       CAST(epoch_us(min(start_date + to_days(sd))) // 1000000
            AS BIGINT) AS first_s,
       -- span from the UNSHIFTED timestamps: equality with the
       -- Spark side's shifted-span is the preservation proof
       CAST((epoch_us(max(start_date)) - epoch_us(min(start_date)))
            // 1000000 AS BIGINT) AS span_s
FROM s GROUP BY pid ORDER BY pid
"""


#: federated sites of fed_01 — stands in for the AKTIN broker's
#: hospital nodes (poll loop reference src/build.sh:255-256).
FED_SITES = 3


def fed_01(spark, sf):
    """Federated aggregate merge — the AKTIN broker's query shape: N
    sites each compute a PARTIAL aggregate over their own slice, the
    coordinator merges partials by summation (counts and decimal-routed
    revenue merge exactly; count-distinct deliberately NOT offered
    federated — it does not partial-merge, which is why the broker
    protocol ships aggregate rows, not patient lists).  Site assignment
    is an md5 shard (layout-independent); `n_sites` certifies every
    site reported."""
    o = catalog.load(spark, sf, "orders")
    site = (F.conv(F.substring(F.md5(F.col("o_orderkey").cast("string")),
                               1, 2), 16, 10).cast("int") % FED_SITES)
    partials = (o.withColumn("site", site)
                 .groupBy("site", "o_orderstatus")
                 .agg(F.count("*").alias("n"),
                      dsum("o_totalprice").alias("rev")))
    return (partials.groupBy("o_orderstatus")
            .agg(F.sum("n").alias("n"),
                 F.round(F.sum("rev"), 2).cast("double").alias("rev"),
                 F.countDistinct("site").cast("int").alias("n_sites"))
            .orderBy("o_orderstatus"))


#: Apache DataSketches HLL at the default lgConfigK=12 has relative
#: standard error ≈ 1.04/√4096 ≈ 1.6%; the acceptance band is 5× that
#: (same fixture-calibrated 5σ reasoning as relational._AGG_03_RSD).
#: At fixture cardinalities the sketch is still in exact sparse mode,
#: so the bound is slack there by construction — what the hash row
#: certifies is the merge plumbing (site partials → union → estimate),
#: and the bound keeps the check real if fixtures ever grow past the
#: sparse/dense promotion point.
_FED_HLL_RSD = 0.016


def fed_hll(spark, sf):
    """Federated APPROXIMATE distinct — the aggregate fed_01's contract
    deliberately refuses: count(DISTINCT patient) does not partial-merge
    as a scalar, but its HLL SKETCH does.  Each site ships a fixed-size
    binary sketch (bytes, not patient lists — the privacy shape the
    broker protocol needs, reference src/build.sh:255-256); the
    coordinator merges with hll_union_agg and estimates.  Per-site
    sketch build is one map-side pass; the merge moves
    sites × groups × 2^lgK bytes — independent of corpus size, which is
    why this is THE 100 TB federated-distinct shape.  Certified as a
    bounded self-check (agg_03 pattern): exact countDistinct and the
    merged-sketch estimate computed side-by-side, the hashed boolean
    asserts |est − exact| ≤ 5·rsd·exact."""
    o = catalog.load(spark, sf, "orders")
    site = (F.conv(F.substring(F.md5(F.col("o_orderkey").cast("string")),
                               1, 2), 16, 10).cast("int") % FED_SITES)
    partials = (o.withColumn("site", site)
                 .groupBy("site", "o_orderstatus")
                 .agg(F.hll_sketch_agg("o_custkey").alias("sk")))
    merged = (partials.groupBy("o_orderstatus")
              .agg(F.hll_sketch_estimate(F.hll_union_agg("sk"))
                    .alias("_est"),
                   F.countDistinct("site").cast("int").alias("n_sites")))
    exact = (o.groupBy("o_orderstatus")
              .agg(F.countDistinct("o_custkey").alias("exact_patients")))
    return (merged.join(exact, "o_orderstatus")
            .select("o_orderstatus", "exact_patients", "n_sites",
                    (F.abs(F.col("_est") - F.col("exact_patients"))
                     <= 5 * _FED_HLL_RSD * F.col("exact_patients"))
                    .alias("within_bound"))
            .orderBy("o_orderstatus"))


def fed_02(spark, sf):
    """Federated patient-OVERLAP estimate — the cross-site query
    neither site can answer without sharing id lists: |A ∩ B| from the
    two sites' HLL sketches via inclusion–exclusion
    (est_a + est_b − est_union; the union sketch is the coordinator's
    hll_union merge).  Only fixed-size sketch BYTES move between
    sites — never a patient id — the privacy shape of the reference's
    broker federation (src/build.sh:255-256), extended from fed_hll's
    per-site distinct to a cross-site set operation.

    Site membership = custkey mod 3 (A: {0,1}, B: {1,2}), so A∖B,
    A∩B, and B∖A are ALL non-empty by construction — a PROPER overlap
    (a windowed split left A ⊆ B, which exercises only half the
    inclusion–exclusion).  Certified as a bounded self-check (fed_hll
    pattern): exact |A|, |B|, |A∪B|, |A∩B| computed beside the
    estimate; the hashed boolean asserts
    |est∩ − exact∩| ≤ 5·rsd·(|A| + |B| + |A∪B|) — three estimates
    compound, so the bound sums their scales.  Sketches are
    deterministic for a fixed dataset (hash-based, order-independent
    merge), so the boolean is hash-stable."""
    o = catalog.load(spark, sf, "orders").select(
        "o_custkey", (F.col("o_custkey") % 3).alias("m"))
    per = (o.filter(F.col("m") <= 1)
           .select(F.lit("A").alias("site"), "o_custkey")
           .unionByName(o.filter(F.col("m") >= 1)
                        .select(F.lit("B").alias("site"), "o_custkey")))
    sk = (per.groupBy("site")
          .agg(F.hll_sketch_agg("o_custkey").alias("sk")))
    a_row = (sk.filter(F.col("site") == "A")
             .select(F.hll_sketch_estimate("sk").alias("_ea")))
    b_row = (sk.filter(F.col("site") == "B")
             .select(F.hll_sketch_estimate("sk").alias("_eb")))
    u_row = sk.agg(F.hll_sketch_estimate(F.hll_union_agg("sk"))
                   .alias("_eu"))
    # all four exact certification counts in ONE pass: per-customer
    # membership flags, then a single 1-row conditional aggregate
    # (replaces three separate countDistinct jobs — 5.4 → ~2 s at
    # sf0.1 headline)
    flags = (per.groupBy("o_custkey")
             .agg(F.max((F.col("site") == "A").cast("int")).alias("a"),
                  F.max((F.col("site") == "B").cast("int")).alias("b")))
    exacts = flags.agg(
        F.sum("a").cast("long").alias("exact_a"),
        F.sum("b").cast("long").alias("exact_b"),
        F.count("*").alias("exact_union"),
        F.sum(F.col("a") * F.col("b")).cast("long")
         .alias("exact_overlap"))
    row = (exacts.crossJoin(F.broadcast(a_row))
           .crossJoin(F.broadcast(b_row))
           .crossJoin(F.broadcast(u_row)))
    est_i = F.col("_ea") + F.col("_eb") - F.col("_eu")
    bound = (5 * _FED_HLL_RSD
             * (F.col("exact_a") + F.col("exact_b")
                + F.col("exact_union")))
    return row.select(
        "exact_a", "exact_b", "exact_union", "exact_overlap",
        (F.abs(est_i - F.col("exact_overlap")) <= bound)
        .alias("within_bound"))


FED3_K = 512
_FED3_M = float(1 << 52)


def fed_03(spark, sf):
    """Federated overlap via KMV / theta sketches — the estimator that
    fixes fed_02's weakness (HLL inclusion–exclusion compounds three
    absolute errors, so SMALL overlaps drown): each site ships its K
    MINIMUM hash VALUES (md5-derived 52-bit integers — k·8 bytes, no
    ids, same privacy shape as fed_hll's sketch bytes); the
    coordinator takes θ = min of the sites' k-th values and estimates
    |A∩B| = |{h < θ present in BOTH sketches}| · M / θ — a direct
    sample of the intersection, error ∝ √overlap/√K rather than
    ∝ union.

    Certification is STRONGER than the HLL keys: KMV is pure integer
    order statistics + one double division, so the DuckDB oracle
    recomputes the ENTIRE estimator (same hashes, same k-th values,
    same θ-filtered sample) and the 1e6-scaled ESTIMATE ITSELF is
    hash-certified — not just a bounded boolean.  A site with fewer
    than K distinct ids keeps everything (θ_s = M, the sketch is
    exact) — the sf0.001 fixture exercises that arm, sf0.01+ the
    estimating arm.

    Scale shape: per-site K-minimum = one WindowGroupLimit top-k per
    site (never a global sort); the coordinator works on ≤ 2K rows."""
    o = catalog.load(spark, sf, "orders").select(
        "o_custkey", (F.col("o_custkey") % 3).alias("m"))
    per = (o.filter(F.col("m") <= 1)
           .select(F.lit("A").alias("site"), "o_custkey")
           .unionByName(o.filter(F.col("m") >= 1)
                        .select(F.lit("B").alias("site"), "o_custkey")))
    h = (F.conv(F.substring(F.md5(F.col("o_custkey").cast("string")),
                            1, 13), 16, 10).cast("long"))
    hashes = per.select("site", h.alias("h")).distinct()
    w = Window.partitionBy("site").orderBy("h")
    sk = (hashes.withColumn("r", F.row_number().over(w))
          .filter(F.col("r") <= FED3_K))
    stats = (sk.groupBy("site")
             .agg(F.count("*").alias("cnt"), F.max("h").alias("kth")))
    theta_s = F.when(F.col("cnt") < FED3_K,
                     F.lit(_FED3_M)).otherwise(
        F.col("kth").cast("double"))
    theta = stats.agg(F.min(theta_s).alias("theta"))
    a_sk = sk.filter(F.col("site") == "A").select("h")
    b_sk = sk.filter(F.col("site") == "B").select("h")
    sample = (a_sk.join(b_sk, "h")
              .crossJoin(F.broadcast(theta))
              .filter(F.col("h").cast("double") < F.col("theta"))
              .agg(F.count("*").alias("sample_n")))
    flags = (per.groupBy("o_custkey")
             .agg(F.max((F.col("site") == "A").cast("int")).alias("a"),
                  F.max((F.col("site") == "B").cast("int")).alias("b")))
    exacts = flags.agg(
        F.count("*").alias("exact_union"),
        F.sum(F.col("a") * F.col("b")).cast("long")
         .alias("exact_overlap"))
    row = (exacts.crossJoin(F.broadcast(sample))
           .crossJoin(F.broadcast(theta)))
    est = (F.col("sample_n").cast("double") * F.lit(_FED3_M)
           / F.col("theta"))
    return row.select(
        "exact_union", "exact_overlap", "sample_n",
        F.round(est).cast("long").alias("est"),
        (F.abs(est - F.col("exact_overlap"))
         <= 5.0 / (FED3_K ** 0.5)
         * F.col("exact_overlap").cast("double") + 2)
        .alias("within_bound"))


_CT = catalog.clinical_with_clause

_ORACLES = {
    "coh_01": _CT(("observation_fact",)) + """
        SELECT count(DISTINCT patient_num) AS n_patients
        FROM observation_fact f1
        WHERE concept_cd = 'AKTIN:R:1' AND EXISTS (
            SELECT 1 FROM observation_fact f2
            WHERE f2.patient_num = f1.patient_num
              AND f2.concept_cd = 'AKTIN:N:2')""",
    "coh_02": _CT(("observation_fact",)) + """
        SELECT count(DISTINCT patient_num) AS n_patients
        FROM observation_fact
        WHERE concept_cd IN ('AKTIN:R:1','AKTIN:A:5','AKTIN:N:7')""",
    "coh_03": _CT(("observation_fact",)) + """
        SELECT count(DISTINCT patient_num) AS n_patients
        FROM observation_fact f1
        WHERE concept_cd = 'AKTIN:R:1' AND NOT EXISTS (
            SELECT 1 FROM observation_fact f2
            WHERE f2.patient_num = f1.patient_num
              AND f2.concept_cd = 'AKTIN:N:2')""",
    "coh_04": _CT(("observation_fact",)) + """
        SELECT count(DISTINCT patient_num) AS n_patients
        FROM observation_fact f1
        WHERE concept_cd = 'AKTIN:R:1' AND EXISTS (
            SELECT 1 FROM observation_fact f2
            WHERE f2.encounter_num = f1.encounter_num
              AND f2.concept_cd = 'AKTIN:N:2')""",
    "coh_05": _CT(("observation_fact", "patient_dimension")) + """
        SELECT sex_cd, count(*) AS n FROM patient_dimension
        WHERE patient_num IN (
            SELECT patient_num FROM observation_fact
            WHERE valtype_cd = 'N' AND nval_num >= 30.0
              AND start_date >= TIMESTAMP '1996-01-01'
              AND start_date < TIMESTAMP '1998-01-01')
        GROUP BY sex_cd""",
    "coh_06": _CT(("observation_fact",)) + """
        SELECT count(DISTINCT patient_num) AS n_patients FROM (
            SELECT patient_num FROM observation_fact
            WHERE concept_cd = 'AKTIN:R:1'
            GROUP BY patient_num HAVING count(*) >= 3)""",
    "coh_07": _CT(("observation_fact",)) + """
        SELECT count(DISTINCT a.patient_num) AS n_patients
        FROM observation_fact a JOIN observation_fact b
          ON a.encounter_num = b.encounter_num
        WHERE a.concept_cd = 'AKTIN:R:11' AND b.concept_cd = 'AKTIN:R:22'
          AND b.start_date >= a.start_date
          AND b.start_date <= a.start_date + INTERVAL 4320 HOUR""",
    "ont_01": _CT(("observation_fact", "ontology")) + """
        SELECT concept_cd, count(*) AS n FROM observation_fact
        WHERE concept_cd IN (
            SELECT c_basecode FROM ontology
            WHERE left(c_fullname, 9) = '\\AKTIN\\R\\'
              AND c_basecode IS NOT NULL)
        GROUP BY concept_cd""",
    "ont_02": _CT(("observation_fact", "concept_dimension"))
    + _ONT2_ORACLE_BODY,
    "ont_03": _CT(("observation_fact", "concept_dimension"))
    + _ONT3_ORACLE_BODY,
    "eav_01": _CT(("observation_fact",)) + """
        SELECT encounter_num,
               CAST(max(CASE WHEN concept_cd = 'AKTIN:N:0' THEN nval_num END) AS DOUBLE) AS c0,
               CAST(max(CASE WHEN concept_cd = 'AKTIN:N:3' THEN nval_num END) AS DOUBLE) AS c3,
               CAST(max(CASE WHEN concept_cd = 'AKTIN:N:6' THEN nval_num END) AS DOUBLE) AS c6
        FROM observation_fact GROUP BY encounter_num
        HAVING COALESCE(c0, c3, c6) IS NOT NULL""",
    "rep_01": "WITH RECURSIVE months(m) AS "
              "(SELECT 1 UNION ALL SELECT m + 1 FROM months WHERE m < 12),\n"
              + _CT(("visit_dimension",)).removeprefix("WITH ") + """
        SELECT m, inout_cd, COALESCE(cnt, 0) AS n
        FROM months
        CROSS JOIN (SELECT 'I' AS inout_cd UNION ALL SELECT 'O') classes
        LEFT JOIN (
            SELECT CAST(month(start_date) AS INT) AS vm, inout_cd AS vc,
                   count(*) AS cnt
            FROM visit_dimension
            WHERE start_date >= TIMESTAMP '1996-01-01'
              AND start_date < TIMESTAMP '1997-01-01'
            GROUP BY 1, 2) v ON v.vm = months.m AND v.vc = classes.inout_cd""",
}

_ORACLES["priv_01"] = f"""
WITH rep AS ({_ORACLES["rep_01"]})
SELECT m, inout_cd,
       CASE WHEN n > 0 AND n < {PRIV_K} THEN NULL ELSE n END AS n,
       n > 0 AND n < {PRIV_K} AS suppressed
FROM rep ORDER BY m, inout_cd
"""

_ORACLES["priv_02"] = f"""
WITH rep AS ({_ORACLES["rep_01"]}),
z AS (
  SELECT m, inout_cd, n,
         (CAST(('0x' || substr(md5(m || '|' || inout_cd), 1, 12))
               AS BIGINT) + 0.5) / {PRIV2_BITS} - 0.5 AS u
  FROM rep)
SELECT m, inout_cd,
       GREATEST(n + CAST(ROUND((-1.0 / {PRIV_EPS}) * sign(u)
                               * ln(1.0 - 2 * abs(u))) AS BIGINT),
                0) AS n_noisy
FROM z ORDER BY m, inout_cd
"""

_ORACLES["priv_03"] = _priv_03_oracle()

_ORACLES["fed_01"] = """
WITH p AS (
  SELECT CAST(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 2))::INT
              % 3 AS INT) AS site,
         o_orderstatus, count(*) AS n,
         SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS rev
  FROM orders GROUP BY 1, 2)
SELECT o_orderstatus, CAST(sum(n) AS BIGINT) AS n,
       CAST(ROUND(sum(rev), 2) AS DOUBLE) AS rev,
       CAST(count(DISTINCT site) AS INT) AS n_sites
FROM p GROUP BY 1 ORDER BY 1
"""

_ORACLES["fed_02"] = """
WITH per AS (
  SELECT 'A' AS site, o_custkey FROM orders
  WHERE o_custkey % 3 <= 1
  UNION ALL
  SELECT 'B' AS site, o_custkey FROM orders
  WHERE o_custkey % 3 >= 1)
SELECT
  (SELECT count(DISTINCT o_custkey) FROM per WHERE site = 'A')
      AS exact_a,
  (SELECT count(DISTINCT o_custkey) FROM per WHERE site = 'B')
      AS exact_b,
  (SELECT count(DISTINCT o_custkey) FROM per) AS exact_union,
  (SELECT count(*) FROM (
      SELECT o_custkey FROM per GROUP BY 1
      HAVING count(DISTINCT site) = 2)) AS exact_overlap,
  TRUE AS within_bound
"""

_ORACLES["fed_03"] = f"""
WITH per AS (
  SELECT 'A' AS site, o_custkey FROM orders WHERE o_custkey % 3 <= 1
  UNION ALL
  SELECT 'B' AS site, o_custkey FROM orders WHERE o_custkey % 3 >= 1),
hashes AS (
  SELECT DISTINCT site,
         CAST(('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 1, 13))
              AS BIGINT) AS h
  FROM per),
sk AS (
  SELECT site, h FROM (
    SELECT site, h,
           row_number() OVER (PARTITION BY site ORDER BY h) AS r
    FROM hashes) WHERE r <= {FED3_K}),
stats AS (
  SELECT site, count(*) AS cnt, max(h) AS kth FROM sk GROUP BY 1),
theta AS (
  SELECT min(CASE WHEN cnt < {FED3_K} THEN {_FED3_M!r}::DOUBLE
             ELSE CAST(kth AS DOUBLE) END) AS theta
  FROM stats),
smp AS (
  SELECT count(*) AS sample_n
  FROM (SELECT h FROM sk WHERE site = 'A') a
  JOIN (SELECT h FROM sk WHERE site = 'B') b USING (h)
  CROSS JOIN theta
  WHERE CAST(h AS DOUBLE) < theta),
flags AS (
  SELECT o_custkey,
         max(CASE WHEN site = 'A' THEN 1 ELSE 0 END) AS a,
         max(CASE WHEN site = 'B' THEN 1 ELSE 0 END) AS b
  FROM per GROUP BY 1),
ex AS (
  SELECT count(*) AS exact_union,
         CAST(SUM(a * b) AS BIGINT) AS exact_overlap
  FROM flags)
SELECT exact_union, exact_overlap, sample_n,
       CAST(ROUND(CAST(sample_n AS DOUBLE) * {_FED3_M!r} / theta)
            AS BIGINT) AS est,
       abs(CAST(sample_n AS DOUBLE) * {_FED3_M!r} / theta
           - CAST(exact_overlap AS DOUBLE))
         <= 5.0 / sqrt({FED3_K}) * CAST(exact_overlap AS DOUBLE) + 2
           AS within_bound
FROM ex CROSS JOIN smp CROSS JOIN theta
"""

_ORACLES["fed_hll"] = f"""
WITH p AS (
  SELECT CAST(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 2))::INT
              % {FED_SITES} AS INT) AS site,
         o_orderstatus, o_custkey
  FROM orders)
SELECT o_orderstatus,
       CAST(count(DISTINCT o_custkey) AS BIGINT) AS exact_patients,
       CAST(count(DISTINCT site) AS INT) AS n_sites,
       TRUE AS within_bound
FROM p GROUP BY 1 ORDER BY 1
"""

_DOCS = {
    "coh_01": "Cohort panel AND (semi-join chain + countDistinct)",
    "coh_02": "Cohort OR within panel (IN-list)",
    "coh_03": "Cohort exclusion (anti join)",
    "coh_04": "Cohort same-encounter constraint",
    "coh_05": "Cohort value+date constraints by sex (report feed)",
    "coh_06": "Cohort occurrence constraint (>= N observations)",
    "coh_07": "Cohort temporal pair (B within N hours after A, same encounter)",
    "ont_01": "Ontology subtree expansion → closed IN-list on fact scan",
    "ont_02": "Ontology hierarchy rollup (i2b2 totalnum): ancestor-"
              "path explode + ONE groupBy — whole-tree fact/patient "
              "counts in one pass, no per-node subtree scans",
    "ont_03": "Sketch-based totalnum: the HLL swap ont_02 names, "
              "wired — per-node distinct from approx_count_distinct "
              "(bytes of state), bounded self-check vs exact",
    "eav_01": "EAV pivot to wide per-encounter frame",
    "rep_01": "Zero-filled monthly report (scaffold cross join)",
    "priv_01": "Privacy-thresholded report: k-anonymity small-cell "
               "suppression with explicit markers",
    "priv_02": "Laplace-mechanism release DEMONSTRATION (eps=1, "
               "sensitivity-1 counts): noise md5-seeded from the "
               "public cell key, so it is recomputable and NOT "
               "private as shipped — certification mode only; pass "
               "salt=<secret> for an actual DP release",
    "priv_03": "Date-shift pseudonymization: deterministic per-patient "
               "±14-day md5 offset + md5 pseudo-ids; the hash match "
               "ITSELF proves interval preservation (Spark spans from "
               "shifted, oracle spans from unshifted timestamps)",
    "fed_01": "Federated aggregate merge: per-site partial aggregates "
              "summed by the coordinator (broker query shape)",
    "fed_hll": "Federated approximate distinct: per-site HLL sketches "
               "union-merged by the coordinator, bounded self-check "
               "against exact countDistinct",
    "fed_02": "Federated patient overlap |A∩B| via HLL "
              "inclusion-exclusion (sketch bytes move, never ids); "
              "bounded self-check against the exact intersection",
    "fed_03": "Federated overlap via KMV/theta sketches: k-minimum "
              "hash values per site, theta-filtered intersection "
              "sample — estimate error scales with the OVERLAP, not "
              "the union; fully recomputable integer order "
              "statistics, so the estimate itself is hash-certified",
}


def specs() -> list[QuerySpec]:
    g = globals()
    return [QuerySpec(key=k, fn=g[k], oracle=_ORACLES.get(k), doc=d,
                      tags=("clinical",))
            for k, d in _DOCS.items()]
