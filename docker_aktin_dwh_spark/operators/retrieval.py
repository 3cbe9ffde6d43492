"""Lexical retrieval over the documents corpus: distributed BM25
top-k — the classic quality-scoring / search verb of a training-data
pipeline (rank corpus docs against benchmark queries, mine hard
positives, dedup against eval sets by lexical overlap).

Reference anchor: the reference's query surface is SQL aggregation over
imported facts (src/docker/database/Dockerfile:8); retrieval extends
the same declared-query model to ranked text search, SURVEY.md §2's
extension family.

Scale shape (100 TB posture):
- ONE corpus tokenization pass: per-term tf computed as JVM
  ``size(filter(tokens))`` column expressions (the query-term set is a
  small constant — no explode, no shuffle for term counting), and the
  tokenized tf frame is MATERIALIZED once so the per-doc branch and
  the stats aggregate read the same computed partitions instead of
  re-tokenizing (measured 1.4-1.8×, growing with scale — A/B in the
  bm25_01 body).
- Corpus stats (N, avgdl, per-term df) partial-aggregate to ONE row,
  attached back via a 1-row crossJoin (the scalar-attach pattern used
  across this repo) — bytes moved, not rows.
- Top-k is TWO-PHASE: per (query, doc-shard) top-k first (parallelism
  = queries × BM25_SHARDS), then the global top-k over the
  queries × shards × k survivors — no single ordered task ever sees
  the corpus (same discipline as hh_01 / pack_02).  The result is
  identical to a global top-k because the ordering key
  (rounded score DESC, doc_id ASC) is a total order.
- Ranking uses the ROUNDED score on both engines so rank assignment
  never depends on sub-ulp float differences between libm
  implementations (the determinism contract's float rule).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .. import catalog
from ..functions.barrier import materialize
from ..functions.textfns import SQL_TOKENS, tokens
from ..registry import QuerySpec

T = catalog.load

#: fixed benchmark queries over the fixture vocabulary (constants so
#: both engines see identical terms; multi-term to exercise the sum)
BM25_QUERIES = (
    ("q_scan", ("table", "scan")),
    ("q_join", ("hash", "merge")),
    ("q_sort", ("window", "sort")),
)
BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOPK = 10
#: doc shards of the two-phase top-k; at 100 TB this is the per-query
#: parallelism of the first phase
BM25_SHARDS = 32

_ALL_TERMS = tuple(sorted({t for _, ts in BM25_QUERIES for t in ts}))


def bm25_01(spark, sf):
    """BM25 top-k per benchmark query.  Emits (query, rank, doc_id,
    score) with score = ROUND(Σ_t idf·tf·(k1+1)/(tf + k1·(1−b+b·dl/avgdl)), 4)
    and idf = ln(1 + (N − df + 0.5)/(df + 0.5)) — the Robertson/
    Spärck Jones form Lucene uses."""
    d = T(spark, sf, "documents")
    # tokens bound to a column first (r12): each tf term filter would
    # otherwise inline the regex tokenizer — |terms|+1 tokenizes per
    # row instead of one (the col_01 finding)
    tok = F.col("_tk")

    def tf_col(term):
        # closure (not a default-arg lambda): a 2-arg HOF lambda would
        # be the (element, index) form and Spark would pass the INDEX
        return F.size(F.filter(tok, lambda x: x == F.lit(term)))

    base = d.select("doc_id", tokens("text").alias("_tk")).select(
        "doc_id",
        F.size(tok).cast("double").alias("dl"),
        *[tf_col(t).cast("double").alias(f"tf_{t}") for t in _ALL_TERMS])
    # materialize the tokenized tf frame once: without the barrier the
    # tokenize+tf projection runs TWICE (per-doc frame + stats agg are
    # separate plan subtrees under the crossJoin).  Measured A/B
    # (best-of-3, r8): sf0.1 1.67→1.18 s (1.42×), 10× fixture
    # 6.38→3.56 s (1.79×) — the win GROWS with scale because the
    # duplicated work is the corpus tokenization itself; at 100 TB the
    # barrier is a scratch-table write (functions/barrier.py switch).
    base = materialize(base)

    stats = base.agg(
        F.count("*").cast("double").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
        *[F.sum((F.col(f"tf_{t}") > 0).cast("double"))
           .alias(f"df_{t}") for t in _ALL_TERMS])
    scored = base.crossJoin(F.broadcast(stats))   # 1-row scalar attach

    def idf(t):
        df = F.col(f"df_{t}")
        return F.log(1.0 + (F.col("n_docs") - df + 0.5) / (df + 0.5))

    def term_score(t):
        tf = F.col(f"tf_{t}")
        denom = tf + BM25_K1 * (1.0 - BM25_B
                                + BM25_B * F.col("dl") / F.col("avgdl"))
        return idf(t) * tf * (BM25_K1 + 1.0) / denom

    per_q = [
        F.struct(F.lit(qname).alias("query"),
                 F.round(sum(term_score(t) for t in terms), 4)
                  .alias("score"))
        for qname, terms in BM25_QUERIES]
    stacked = (scored.select("doc_id",
                             F.explode(F.array(*per_q)).alias("qs"))
               .select("qs.query", "doc_id", "qs.score")
               .filter(F.col("score") > 0))

    shard = F.pmod(F.xxhash64("doc_id"), F.lit(BM25_SHARDS))
    w1 = (Window.partitionBy("query", shard)
          .orderBy(F.desc("score"), F.asc("doc_id")))
    survivors = (stacked.withColumn("_rn", F.row_number().over(w1))
                 .filter(F.col("_rn") <= BM25_TOPK).drop("_rn"))
    w2 = Window.partitionBy("query").orderBy(F.desc("score"),
                                             F.asc("doc_id"))
    return (survivors.withColumn("rank", F.row_number().over(w2))
            .filter(F.col("rank") <= BM25_TOPK)
            .select("query", "rank", "doc_id", "score")
            .orderBy("query", "rank"))


def _bm25_oracle() -> str:
    t = SQL_TOKENS.format(col="text")
    tf_cols = ", ".join(
        f"CAST(len(list_filter(t, x -> x = '{term}')) AS DOUBLE) AS tf_{term}"
        for term in _ALL_TERMS)
    df_cols = ", ".join(
        f"SUM(CASE WHEN tf_{term} > 0 THEN 1.0 ELSE 0.0 END) AS df_{term}"
        for term in _ALL_TERMS)

    def idf(term):
        return (f"ln(1.0 + (n_docs - df_{term} + 0.5) / (df_{term} + 0.5))")

    def term_score(term):
        return (f"{idf(term)} * tf_{term} * {BM25_K1 + 1.0} / "
                f"(tf_{term} + {BM25_K1} * (1.0 - {BM25_B} + {BM25_B} "
                f"* dl / avgdl))")

    q_rows = "\nUNION ALL\n".join(
        f"SELECT '{qname}' AS query, doc_id, "
        f"ROUND({' + '.join(term_score(t) for t in terms)}, 4) AS score "
        f"FROM scored"
        for qname, terms in BM25_QUERIES)
    return f"""
WITH base AS (
  SELECT doc_id, CAST(len(t) AS DOUBLE) AS dl, {tf_cols}
  FROM (SELECT doc_id, {t} AS t FROM documents)),
stats AS (
  SELECT CAST(count(*) AS DOUBLE) AS n_docs, AVG(dl) AS avgdl, {df_cols}
  FROM base),
scored AS (SELECT * FROM base, stats),
q AS ({q_rows}),
ranked AS (
  SELECT query, doc_id, score,
         CAST(row_number() OVER (PARTITION BY query
                                 ORDER BY score DESC, doc_id) AS INT)
           AS rank
  FROM q WHERE score > 0)
SELECT query, rank, doc_id, score FROM ranked
WHERE rank <= {BM25_TOPK} ORDER BY query, rank
"""


_DOCS = {
    "bm25_01": "Distributed BM25 top-k retrieval: constant query-term "
               "tf as JVM filter columns (no explode), 1-row stats "
               "attach, two-phase sharded top-k",
}


def specs() -> list[QuerySpec]:
    return [
        QuerySpec(key="bm25_01", fn=bm25_01, oracle=_bm25_oracle(),
                  doc=_DOCS["bm25_01"], tags=("llm", "retrieval")),
    ]
