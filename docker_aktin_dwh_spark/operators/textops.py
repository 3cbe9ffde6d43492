"""Text analysis operators for training-data pipelines.

All JVM-side expressions over the `documents` table: token statistics,
quality scoring, n-gram-heuristic language ID, and content
fingerprinting.  The Spark and DuckDB formulas are kept structurally
identical (same integer counts, same single double division) so the
oracle hash-matches bit-for-bit.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import functions as F

from .. import catalog
from ..functions.textfns import SQL_TOKENS, tokens
from ..registry import QuerySpec

T = catalog.load

#: tiny per-language stopword profiles for the n-gram/stopword vote.
#: (The fixture vocabulary is synthetic; the *operator contract* is a
#: deterministic argmax with a fixed tie order, which is what both
#: engines implement.)
STOPWORDS = {
    "en": ("the", "a", "of", "and", "to"),
    "de": ("der", "die", "das", "und", "ist"),
    "es": ("el", "los", "que", "y", "en"),
    "fr": ("le", "les", "et", "des", "une"),
}
LANG_ORDER = ("en", "de", "es", "fr")


#: BPE-ish pre-tokenizer: letter runs, single digits, lone punctuation —
#: the GPT-2-style split shape, shared verbatim with the DuckDB oracle.
BPEISH = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"


def text_tokens(spark, sf):
    """Token counting: whitespace tokens, BPE-ish subword pieces, chars
    (the unit of 100 TB corpus budgeting)."""
    d = T(spark, sf, "documents")
    return (d.select("doc_id",
                     F.size(tokens("text")).alias("n_tokens"),
                     F.size(F.regexp_extract_all("text", F.lit(BPEISH), 0))
                      .alias("n_subtokens"),
                     F.length("text").alias("len_chars"))
             .orderBy("doc_id"))


def text_quality(spark, sf):
    """Quality scoring: token count, stopword ratio, mean token length.

    Tokens BOUND to a column first (r12): used four times in the
    projection, the raw expression would re-run the regex tokenizer
    per use (the col_01 finding)."""
    d = T(spark, sf, "documents")
    tok = F.col("_tk")
    all_stops = tuple(sorted({w for ws in STOPWORDS.values() for w in ws}))
    stop_cnt = F.size(F.filter(tok, lambda t: t.isin(*all_stops)))
    n_tok = F.size(tok)
    mean_len = F.round((F.length(F.trim("text")) - (n_tok - 1))
                       / n_tok.cast("double"), 4)
    return (d.select("doc_id", "text", tokens("text").alias("_tk"))
             .select("doc_id",
                     n_tok.alias("n_tokens"),
                     stop_cnt.alias("stop_cnt"),
                     F.round(stop_cnt / n_tok.cast("double"), 4).alias("stop_ratio"),
                     mean_len.alias("mean_tok_len"))
             .orderBy("doc_id"))


def text_langid(spark, sf):
    """Language ID: stopword-profile vote, fixed-order argmax.  Tokens
    bound to a column (one tokenize per row, not one per language)."""
    d = T(spark, sf, "documents")
    d = d.select("doc_id", "lang", tokens("text").alias("_tk"))
    tok = F.col("_tk")
    votes = {lang: F.size(F.filter(tok, lambda t: t.isin(*ws)))
             for lang, ws in STOPWORDS.items()}
    # strict-majority cascade in fixed LANG_ORDER: first language whose
    # vote is >= all later ones and > all earlier-checked maxima
    best = F.lit("und")
    best_cnt = F.lit(0)
    for lang in LANG_ORDER:
        v = votes[lang]
        take = v > best_cnt
        best = F.when(take, F.lit(lang)).otherwise(best)
        best_cnt = F.when(take, v).otherwise(best_cnt)
    return (d.select("doc_id", best.alias("pred_lang"), "lang")
             .orderBy("doc_id"))


def text_fp(spark, sf):
    """Document fingerprint: md5 over whitespace-normalized text."""
    d = T(spark, sf, "documents")
    norm = F.lower(F.regexp_replace(F.trim("text"), r"\s+", " "))
    return (d.select("doc_id", F.md5(norm).alias("fp"))
             .orderBy("doc_id"))


VOCAB_TOP_K = 10


def vocab_01(spark, sf):
    """Corpus vocabulary stats: top-K tokens per language by frequency
    (ties broken on token text for determinism).

    Scale shape: explode → groupBy(lang, token) aggregates with
    map-side combine (the corpus-sized stage), then a per-lang window
    over the aggregated frequency table — whose cardinality is the
    vocabulary, orders of magnitude below the corpus, so the single
    ordered task per language holds at 100 TB.  (A two-phase
    per-partition top-k would drop even that if vocabularies ever
    rivaled corpus size.)"""
    from pyspark.sql import Window

    d = T(spark, sf, "documents")
    freq = (d.select("lang", F.explode(tokens("text")).alias("t"))
             .groupBy("lang", "t").agg(F.count("*").alias("n")))
    w = Window.partitionBy("lang").orderBy(F.desc("n"), F.asc("t"))
    return (freq.withColumn("rank", F.row_number().over(w))
                .filter(F.col("rank") <= VOCAB_TOP_K)
                .select("lang", "rank", "t", "n")
                .orderBy("lang", "rank"))


_VOCAB_ORACLE = f"""
WITH x AS (
  SELECT lang, unnest({SQL_TOKENS.format(col="text")}) AS t FROM documents
),
f AS (SELECT lang, t, count(*) AS n FROM x GROUP BY 1, 2),
r AS (SELECT lang, t, n, CAST(row_number() OVER (
        PARTITION BY lang ORDER BY n DESC, t) AS INT) AS rank FROM f)
SELECT lang, rank, t, n FROM r WHERE rank <= {VOCAB_TOP_K}
ORDER BY lang, rank
"""


# ----------------------------------------------------------- PII redaction

#: cross-engine-safe patterns (same semantics under Java regex and
#: DuckDB's RE2): email, international-format phone, dotted IPv4.
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE = r"\+\d{2} \d{3} \d{5,9}"
PII_IPV4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"

#: deterministic PII injection (planted-content pattern, like the
#: dedup/ANN certifications): the fixture corpus contains no natural
#: PII, so matching on it alone would certify nothing.  Docs get
#: synthetic PII appended as a closed-form function of doc_id on BOTH
#: engine sides; the redaction counts are then provably nonzero and
#: the scrubbed-text md5 certifies the replacements byte-for-byte.
def _pii_augmented_spark():
    did = F.col("doc_id")
    parts = [F.col("text")]
    parts.append(F.when(did % 7 == 0,
                        F.concat(F.lit(" contact user"), did.cast("string"),
                                 F.lit("@example.com")))
                  .otherwise(F.lit("")))
    parts.append(F.when(did % 11 == 0,
                        F.concat(F.lit(" call +49 030 55512"),
                                 F.format_string("%03d", (did % 1000))))
                  .otherwise(F.lit("")))
    parts.append(F.when(did % 13 == 0,
                        F.concat(F.lit(" host 10.0."), (did % 256).cast("string"),
                                 F.lit("."), ((did * 3) % 256).cast("string")))
                  .otherwise(F.lit("")))
    return F.concat(*parts)


_PII_AUG_SQL = (
    "text"
    " || CASE WHEN doc_id % 7 = 0 THEN ' contact user' || CAST(doc_id AS VARCHAR)"
    " || '@example.com' ELSE '' END"
    " || CASE WHEN doc_id % 11 = 0 THEN ' call +49 030 55512'"
    " || printf('%03d', doc_id % 1000) ELSE '' END"
    " || CASE WHEN doc_id % 13 = 0 THEN ' host 10.0.' || CAST(doc_id % 256 AS VARCHAR)"
    " || '.' || CAST((doc_id * 3) % 256 AS VARCHAR) ELSE '' END")


def pii_01(spark, sf):
    """PII scrubbing (corpus-cleaning verb): redact emails, phones and
    IPv4 addresses, returning per-category match counts and the md5 of
    the scrubbed text.  One scan, pure JVM regex expressions — the
    shape that runs ahead of every corpus release at 100 TB.  Matches
    are guaranteed by deterministic injection (see _pii_augmented_spark
    note); the oracle reproduces injection + redaction exactly."""
    d = T(spark, sf, "documents")
    aug = _pii_augmented_spark()
    scrub = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(aug, PII_EMAIL, "[EMAIL]"),
            PII_PHONE, "[PHONE]"),
        PII_IPV4, "[IP]")
    return (d.select(
                "doc_id",
                F.regexp_count(aug, F.lit(PII_EMAIL)).cast("int")
                 .alias("n_email"),
                F.regexp_count(aug, F.lit(PII_PHONE)).cast("int")
                 .alias("n_phone"),
                F.regexp_count(aug, F.lit(PII_IPV4)).cast("int")
                 .alias("n_ip"),
                F.md5(scrub).alias("scrubbed_md5"))
             .orderBy("doc_id"))


_PII_ORACLE = f"""
WITH a AS (SELECT doc_id, {_PII_AUG_SQL} AS aug FROM documents)
SELECT doc_id,
       CAST(len(regexp_extract_all(aug, '{PII_EMAIL}')) AS INT) AS n_email,
       CAST(len(regexp_extract_all(aug, '{PII_PHONE}')) AS INT) AS n_phone,
       CAST(len(regexp_extract_all(aug, '{PII_IPV4}')) AS INT) AS n_ip,
       md5(regexp_replace(regexp_replace(regexp_replace(aug,
           '{PII_EMAIL}', '[EMAIL]', 'g'),
           '{PII_PHONE}', '[PHONE]', 'g'),
           '{PII_IPV4}', '[IP]', 'g')) AS scrubbed_md5
FROM a ORDER BY doc_id
"""


# ------------------------------------------------------ repetition metrics

def qrep_01(spark, sf):
    """Gopher/MassiveText-style repetition metrics per doc: duplicate-
    token ratio (1 − distinct/total, computed in-row with
    array_distinct — no shuffle) and top-bigram fraction (most frequent
    token bigram / total bigrams — explode + two-level agg keyed on
    doc_id, map-side combine; the per-doc bigram table is tiny next to
    the corpus).  The standard repetition-quality gate ahead of
    training-corpus assembly."""
    d = T(spark, sf, "documents")
    # tokens bound first (r12): the projection reads the array four
    # times — one tokenize per row, not four
    t = F.col("_tk")
    n = F.size(t)
    base = d.select("doc_id", tokens("text").alias("_tk")).select(
        "doc_id", t.alias("t"), n.alias("n_tokens"),
        F.round((n - F.size(F.array_distinct(t))) / n.cast("double"), 4)
         .alias("dup_tok_ratio"))
    bg = (base.filter(F.col("n_tokens") >= 2)
              .select("doc_id",
                      F.explode(F.zip_with(
                          F.slice("t", 1, F.col("n_tokens") - 1),
                          F.slice("t", 2, F.col("n_tokens") - 1),
                          lambda x, y: F.concat_ws(" ", x, y))).alias("bg")))
    per_bg = bg.groupBy("doc_id", "bg").agg(F.count("*").alias("c"))
    per_doc = (per_bg.groupBy("doc_id")
                     .agg(F.max("c").alias("mx"), F.sum("c").alias("tot")))
    return (base.join(per_doc, "doc_id", "left")
                .select("doc_id", "n_tokens", "dup_tok_ratio",
                        F.coalesce(F.round(F.col("mx") / F.col("tot"), 4),
                                   F.lit(0.0)).alias("top_bigram_frac"))
                .orderBy("doc_id"))


_QREP_ORACLE = f"""
WITH t AS (SELECT doc_id, {SQL_TOKENS.format(col="text")} AS t
           FROM documents),
base AS (SELECT doc_id, t, len(t) AS n,
                ROUND((len(t) - len(list_distinct(t)))
                      / CAST(len(t) AS DOUBLE), 4) AS dup_tok_ratio
         FROM t),
b AS (SELECT doc_id, t[i] || ' ' || t[i + 1] AS bg
      FROM base, LATERAL (SELECT unnest(range(1, len(t))) AS i) x
      WHERE n >= 2),
c AS (SELECT doc_id, bg, count(*) AS c FROM b GROUP BY 1, 2),
m AS (SELECT doc_id, max(c) AS mx, sum(c) AS tot FROM c GROUP BY 1)
SELECT base.doc_id, CAST(n AS INT) AS n_tokens, dup_tok_ratio,
       COALESCE(ROUND(mx / CAST(tot AS DOUBLE), 4), 0.0)
         AS top_bigram_frac
FROM base LEFT JOIN m ON base.doc_id = m.doc_id
ORDER BY base.doc_id
"""


# ------------------------------------------------ bigram LM quality gate

#: a bigram is "rare" if it occurs fewer than this many times corpus-wide
LM_RARE_MAX = 3


def lm_01(spark, sf):
    """Language-model-style quality scoring without float-sum hazards:
    per-doc statistics of CORPUS-WIDE bigram frequencies — n_bigrams,
    n_rare (bigrams seen < LM_RARE_MAX times in the whole corpus) and
    min_bg_count (the doc's rarest bigram).  A high rare fraction or a
    1-count minimum is the gibberish/ocr-noise signal a KenLM-perplexity
    gate would flag; keeping the features integer-valued makes the
    cross-engine hash exact by construction (no log-prob accumulation
    order to reconcile).

    Scale shape: one explode pass builds the corpus bigram table
    (map-side combine to vocab² cardinality, in practice ≪ corpus);
    per-doc bigrams then equi-join it on the bigram text — at 100 TB
    the frequency table is the broadcast/bucketed side, the corpus is
    probed in place."""
    d = T(spark, sf, "documents")
    # tokens bound first (r12): filter + two slices would inline the
    # tokenizer three times per row
    t = F.col("_tk")
    n = F.size(t)
    bg_expr = F.zip_with(F.slice(t, 1, n - 1), F.slice(t, 2, n - 1),
                         lambda x, y: F.concat_ws(" ", x, y))
    per_doc = (d.select("doc_id", tokens("text").alias("_tk"))
                .filter(n >= 2)
                .select("doc_id", F.explode(bg_expr).alias("bg")))
    freq = per_doc.groupBy("bg").agg(F.count("*").alias("c"))
    return (per_doc.join(freq, "bg")
            .groupBy("doc_id")
            .agg(F.count("*").alias("n_bigrams"),
                 F.sum(F.when(F.col("c") < LM_RARE_MAX, 1).otherwise(0))
                  .alias("n_rare"),
                 F.min("c").alias("min_bg_count"))
            .orderBy("doc_id"))


_LM_ORACLE = f"""
WITH t AS (SELECT doc_id, {SQL_TOKENS.format(col="text")} AS t
           FROM documents),
b AS (SELECT doc_id, t[i] || ' ' || t[i + 1] AS bg
      FROM t, LATERAL (SELECT unnest(range(1, len(t))) AS i) x
      WHERE len(t) >= 2),
f AS (SELECT bg, count(*) AS c FROM b GROUP BY 1)
SELECT doc_id, count(*) AS n_bigrams,
       CAST(sum(CASE WHEN c < {LM_RARE_MAX} THEN 1 ELSE 0 END) AS BIGINT)
         AS n_rare,
       min(c) AS min_bg_count
FROM b JOIN f USING (bg)
GROUP BY doc_id ORDER BY doc_id
"""


# ----------------------------------------------------- BPE merge training

#: merge rounds for the declared key — enough to take multi-char
#: subwords off the fixture corpus while keeping the round count a
#: constant, not a scale factor.
BPE_MERGES = 24

#: materialization window for the merge fold (VERDICT r9 item 5): up
#: to this many per-round ``aggregate`` folds stack lazily before a
#: localCheckpoint flattens the lineage.  Bounds expression/codegen
#: depth at a CONSTANT regardless of merge count (a 50k-merge
#: vocabulary-scale run stays ≤ 8 folds deep) while paying the
#: checkpoint job once per window instead of once per round.
BPE_MATERIALIZE_EVERY = 8


def bpe_train(word_freq: "DataFrame", n_merges: int) -> list[tuple[str, str]]:
    """Byte-pair-encoding merge training (the tokenizer-training verb
    of an LLM data pipeline), distributed the only way that survives
    100 TB: the CORPUS is touched exactly once (the word-frequency
    aggregation the caller provides); every merge round then runs on
    the VOCABULARY table — orders of magnitude smaller and shrinking —
    so the iterative part never rescans or reshuffles corpus data.

    Per round: adjacent-pair frequencies via one vocab-sized groupBy
    (zip_with over shifted slices, JVM-side), the argmax collected as a
    one-row control-plane scalar (ties broken on (pair) text for
    determinism), and the merge applied to every symbol sequence with
    an ``aggregate`` fold that replicates reference BPE's greedy
    left-to-right non-overlapping replacement (a freshly merged symbol
    never re-merges with the next element in the same round, because
    the accumulator tail is compared as the MERGED string).  Lineage
    is flattened every BPE_MATERIALIZE_EVERY rounds — expression depth
    stays bounded by the window (constant, merge-count-independent)
    and the checkpoint job amortizes over the window; same driver-loop
    discipline as connected_components.

    Returns the ordered merge list [(left, right), ...].
    """
    from ..functions.barrier import materialize

    vf = materialize(word_freq.select(
        F.regexp_extract_all("token", F.lit("(?s)."), 0).alias("syms"),
        F.col("freq")))
    merges: list[tuple[str, str]] = []
    pending = 0
    for _ in range(n_merges):
        top = (vf.filter(F.size("syms") >= 2)
                 .select(F.explode(F.zip_with(
                     F.slice("syms", 1, F.size("syms") - 1),
                     F.slice("syms", 2, F.size("syms") - 1),
                     lambda x, y: F.struct(x.alias("l"), y.alias("r"))))
                     .alias("p"), "freq")
                 .groupBy("p.l", "p.r").agg(F.sum("freq").alias("c"))
                 .orderBy(F.desc("c"), "l", "r")
                 .limit(1).collect())
        if not top or top[0]["c"] < 2:
            break
        left, right = top[0]["l"], top[0]["r"]
        merges.append((left, right))
        merged = left + right
        step = (lambda left=left, right=right, merged=merged: (
            lambda acc, s: F.when(
                (F.try_element_at(acc, F.lit(-1)) == F.lit(left))
                & (s == F.lit(right)),
                F.concat(F.slice(acc, 1, F.size(acc) - 1),
                         F.array(F.lit(merged))))
             .otherwise(F.concat(acc, F.array(s)))))()
        vf = vf.select(
            F.aggregate("syms",
                        F.array().cast("array<string>"), step)
             .alias("syms"), "freq")
        pending += 1
        if pending >= BPE_MATERIALIZE_EVERY:
            vf = materialize(vf)
            pending = 0
    return merges


def bpe_01(spark, sf):
    """Learned BPE merge table over the corpus vocabulary: (rank, left,
    right, merged).  The merge list is inherently control-plane (it IS
    the tokenizer artifact, kilobytes by construction — the analogue of
    IVF's k×64 centroids), so materializing it through
    spark.createDataFrame is not a data-plane collect.  Iterative
    argmax training is not SQL-expressible — declared rows-only;
    tests/test_llmops.py certifies the merges against an independent
    in-Python reference implementation."""
    d = T(spark, sf, "documents")
    wf = (d.select(F.explode(tokens("text")).alias("token"))
            .groupBy("token").agg(F.count("*").alias("freq")))
    merges = bpe_train(wf, BPE_MERGES)
    return spark.createDataFrame(
        [(i, l, r, l + r) for i, (l, r) in enumerate(merges)],
        "rank int, left string, right string, merged string"
    ).orderBy("rank")


def bpe_encode_counts(docs: "DataFrame",
                      merges: list[tuple[str, str]]) -> "DataFrame":
    """Apply a learned merge list to every document: per doc, each
    whitespace token is encoded by replaying the merges in rank order
    (the standard BPE encode — rank-greedy, left-to-right
    non-overlapping per merge), and the doc's subword count is
    returned.  The merge list is the broadcast tokenizer artifact
    (kilobytes); encoding is per-row Python over Arrow batches — the
    pandas_udf lane, because rank-loop string merging is genuinely
    imperative.  One corpus pass, embarrassingly parallel."""
    ranks = {pair: i for i, pair in enumerate(merges)}

    @F.pandas_udf("int")
    def n_subwords(texts: pd.Series) -> pd.Series:
        def encode_word(w: str) -> int:
            syms = list(w)
            while len(syms) > 1:
                best, best_rank = None, None
                for a, b in zip(syms, syms[1:]):
                    r = ranks.get((a, b))
                    if r is not None and (best_rank is None
                                          or r < best_rank):
                        best, best_rank = (a, b), r
                if best is None:
                    break
                l, r_ = best
                out, i = [], 0
                while i < len(syms):
                    if (i + 1 < len(syms) and syms[i] == l
                            and syms[i + 1] == r_):
                        out.append(l + r_)
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                syms = out
            return len(syms)

        return texts.map(
            lambda t: sum(encode_word(w) for w in (t or "").split()))

    return docs.select("doc_id", n_subwords("text").alias("n_subwords"))


def bpe_02(spark, sf):
    """Tokenizer train→apply loop closed: train BPE_MERGES merges on
    the corpus vocabulary (bpe_01's trainer), then encode every doc and
    report subword counts next to whitespace token counts.  Rows-only
    like bpe_01 (the learned merges are not SQL-derivable); the encode
    itself is certified against an independent Python reference in
    tests, and compression is structurally guaranteed
    (n_subwords ≤ total chars, ≥ n_tokens' lower bound of 1/word)."""
    d = T(spark, sf, "documents")
    wf = (d.select(F.explode(tokens("text")).alias("token"))
            .groupBy("token").agg(F.count("*").alias("freq")))
    merges = bpe_train(wf, BPE_MERGES)
    counts = bpe_encode_counts(d.select("doc_id", "text"), merges)
    base = d.select("doc_id", F.size(tokens("text")).alias("n_tokens"),
                    F.length("text").alias("n_chars"))
    return (base.join(counts, "doc_id")
                .select("doc_id", "n_tokens", "n_subwords", "n_chars")
                .orderBy("doc_id"))


# ------------------------------------------------------- heavy hitters

#: report tokens with global count ≥ total_tokens / HH_DEN.
HH_DEN = 500


def heavy_hitters(tok: "DataFrame", den: int = HH_DEN) -> "DataFrame":
    """Exact corpus heavy hitters (tokens with relative frequency
    ≥ 1/den) via the two-phase candidate/verify pattern — the shape
    that works when the vocabulary itself no longer fits one node.

    Phase 1 (candidates): per-PHYSICAL-partition relative frequencies —
    groupBy(spark_partition_id, token) map-side-combines entirely
    within each input partition, so the shuffle moves per-partition
    vocabularies, never token instances.  Superset guarantee for ANY
    partitioning: if count(t)/N ≥ 1/den then some partition p has
    count_p(t)/N_p ≥ count(t)/N (else summing the strict inequalities
    count_p < N_p·count/N over p gives count < count — contradiction),
    so t passes p's local filter.  Candidate volume is bounded by
    partitions × den rows (den per partition can pass), a frame AQE
    sizes for broadcast when small and shuffles when not — no driver
    collect either way.

    Phase 2 (verify): one exact count of the candidate tokens over the
    corpus.  The final ≥ N/den filter uses exact global counts, so the
    RESULT is partitioning-independent even though the candidate set
    is not — which is what makes this oracle-matchable.
    """
    pid = tok.withColumn("pid", F.spark_partition_id())
    local = pid.groupBy("pid", "t").agg(F.count("*").alias("c"))
    ptot = pid.groupBy("pid").agg(F.count("*").alias("np"))
    cand = (local.join(ptot, "pid")
                 .filter(F.col("c") * den >= F.col("np"))
                 .select("t").distinct())
    counts = (tok.join(cand, "t", "left_semi")
                 .groupBy("t").agg(F.count("*").alias("c")))
    total = tok.agg(F.count("*").alias("n_total"))
    return (counts.crossJoin(total)
                  .filter(F.col("c") * den >= F.col("n_total"))
                  .select("t", "c",
                          F.round(F.col("c") / F.col("n_total"), 6)
                           .alias("rel_freq"))
                  .orderBy(F.desc("c"), "t"))


def hh_01(spark, sf):
    """Corpus token heavy hitters: exact tokens above 1/HH_DEN relative
    frequency, found without ever shuffling the full token stream by
    value (see heavy_hitters)."""
    d = T(spark, sf, "documents")
    return heavy_hitters(
        d.select(F.explode(tokens("text")).alias("t")), HH_DEN)


_HH_ORACLE = f"""
WITH x AS (
  SELECT unnest({SQL_TOKENS.format(col="text")}) AS t FROM documents
),
tot AS (SELECT count(*) AS n_total FROM x)
SELECT t, count(*) AS c,
       ROUND(count(*) / CAST(n_total AS DOUBLE), 6) AS rel_freq
FROM x, tot
GROUP BY t, n_total
HAVING count(*) * {HH_DEN} >= n_total
ORDER BY c DESC, t
"""


# --------------------------------------------- Count-Min sketch (cms_01)

#: CMS geometry: D independent hash rows × W counters.  Error bound
#: est ≤ exact + (e/W)·N with prob 1 − e^−D per query — but on a FIXED
#: corpus with FIXED hashes the sketch is deterministic, so the bound
#: either holds or not once; the declared key certifies it holds on
#: the fixtures (verified at all SFs) with the 4× slack below.
CMS_D = 4
CMS_W = 1024
#: certification slack multiplier on the e/W·N bound
CMS_SLACK = 4.0
#: fixed query tokens (the bm25 vocabulary + a high-frequency word) —
#: constants so both engines probe identical cells
CMS_QUERIES = ("table", "scan", "hash", "merge", "window", "sort",
               "data")


def cms_frame(spark, sf, w: int = CMS_W, dd: int = CMS_D):
    """The CMS build + probe + certification frame at geometry
    (dd × w) — cms_01 uses the declared constants; tests shrink w to
    force real collisions (est > exact while never undercounting)."""
    import math

    d = T(spark, sf, "documents")
    tok = d.select(F.explode(tokens("text")).alias("t"))
    rows = tok.select(
        "t", F.explode(F.array(*[F.lit(i) for i in range(dd)]))
              .alias("d"))
    cell = F.conv(F.substring(
        F.md5(F.concat_ws("|", "t", "d")), 1, 6), 16, 10) \
        .cast("long") % w
    sketch = (rows.groupBy("d", cell.alias("w"))
              .agg(F.count("*").alias("c")))

    q = spark.createDataFrame([(t,) for t in CMS_QUERIES], "t string")
    probes = q.select(
        "t", F.explode(F.array(*[F.lit(i) for i in range(dd)]))
              .alias("d"))
    probes = probes.select(
        "t", "d",
        (F.conv(F.substring(F.md5(F.concat_ws("|", "t", "d")), 1, 6),
                16, 10).cast("long") % w).alias("w"))
    est = (probes.join(sketch, ["d", "w"], "left")
           .groupBy("t")
           .agg(F.min(F.coalesce("c", F.lit(0))).alias("est")))
    exact = (tok.groupBy("t").agg(F.count("*").alias("exact"))
             .join(q, "t", "right")
             .select("t", F.coalesce("exact", F.lit(0)).alias("exact")))
    n_total = tok.agg(F.count("*").alias("n_total"))
    eps = CMS_SLACK * math.e / w
    return (est.join(exact, "t").crossJoin(F.broadcast(n_total))
            .select("t", "exact", "est",
                    (F.col("est") >= F.col("exact")).alias("ge_exact"),
                    (F.col("est") <= F.col("exact")
                     + F.lit(eps) * F.col("n_total"))
                    .alias("within_bound"))
            .orderBy("t"))


def cms_01(spark, sf):
    """Count-Min sketch over the corpus token stream — the MERGEABLE
    frequency sketch, completing the sketch trio beside fed_hll's HLL
    (distinct) and agg_12's KLL (percentile): D×W integer counters,
    each token occurrence incrementing one cell per hash row.  The
    sketch builds in ONE pass with map-side combine into ≤ D·W groups
    (bytes of state per partition — the same partial-merge shape a
    federated site or a streaming window would ship), and point
    queries read back est = min over rows of the probed cell.

    Certification: for each fixed query token, est ≥ exact (CMS never
    undercounts — deterministic) and est ≤ exact + slack·(e/W)·N
    (the ε-bound with 4× slack; deterministic on a fixed corpus —
    verified TRUE at sf0.001/0.01/0.1 and the 10× replica).  At the
    declared W=1024 the fixture vocabulary collides with no query
    cell, so est == exact; the collision (overcount) side of the
    contract is exercised for real at W=32 in tests/test_llmops.
    Hashes are md5-derived (the mix_02 integer-bits discipline) so
    DuckDB probes the identical cells."""
    return cms_frame(spark, sf)


def _cms_oracle() -> str:
    import math

    eps = CMS_SLACK * math.e / CMS_W
    qlist = ", ".join(f"('{t}')" for t in CMS_QUERIES)
    h = ("CAST(('0x' || substr(md5(t || '|' || d), 1, 6)) AS BIGINT) "
         f"% {CMS_W}")
    return f"""
WITH tok AS (
  SELECT unnest({SQL_TOKENS.format(col="text")}) AS t FROM documents),
rows_ AS (
  SELECT t, d FROM tok CROSS JOIN (SELECT unnest(range({CMS_D})) AS d) x),
sketch AS (
  SELECT d, {h} AS w, count(*) AS c FROM rows_ GROUP BY 1, 2),
q(t) AS (VALUES {qlist}),
probes AS (
  SELECT q.t, x.d, {h.replace('md5(t', 'md5(q.t')} AS w
  FROM q CROSS JOIN (SELECT unnest(range({CMS_D})) AS d) x),
est AS (
  SELECT p.t, min(COALESCE(s.c, 0)) AS est
  FROM probes p LEFT JOIN sketch s ON s.d = p.d AND s.w = p.w
  GROUP BY 1),
exact AS (
  SELECT q.t, COALESCE(e.c, 0) AS exact
  FROM q LEFT JOIN (SELECT t, count(*) AS c FROM tok GROUP BY 1) e
       ON e.t = q.t),
tot AS (SELECT count(*) AS n_total FROM tok)
SELECT est.t, exact, est,
       est >= exact AS ge_exact,
       est <= exact + {eps} * n_total AS within_bound
FROM est JOIN exact ON est.t = exact.t CROSS JOIN tot
ORDER BY est.t
"""


# --------------------------------------- TF-IDF keyword extraction

KW_TOPK = 3
#: idf is rounded ONCE per distinct document frequency to a BIGINT
#: (ROUND((ln((N+1)/(df+1))+1)·1e6)); scores are then tf·idf_s — exact
#: integer products, so ranking and the hash cannot move with
#: partial-agg order, and the only cross-engine float exposure is the
#: single ln() rounding per distinct df value (the qc_01 log-space
#: discipline, narrowed from per-token to per-df)
KW_IDF_SCALE = 1_000_000


def kw_01(spark, sf):
    """TF-IDF keyword extraction: top-3 terms per document by smoothed
    tf·idf, deterministic (score desc, term asc).

    Scale shape: ONE explode+groupBy builds the (doc, term, tf) frame;
    document frequency is a groupBy(term) of that frame (map-side
    combinable, never re-scans the corpus); N attaches as a broadcast
    1-row scalar; per-doc top-k is a rank-limit window Spark executes
    as WindowGroupLimit (per-partition heap, no full sort of the
    scored frame).  Two key shuffles total (term, then doc) — the
    inherent cost of a corpus statistic joined back to its rows."""
    d = T(spark, sf, "documents")
    occ = (d.select("doc_id", F.explode(tokens("text")).alias("term"))
            .groupBy("doc_id", "term").agg(F.count("*").alias("tf")))
    from pyspark.sql import Window

    dfreq = occ.groupBy("term").agg(F.count("*").alias("df"))
    nd = d.agg(F.count("*").alias("nd"))
    idf_s = F.round((F.log((F.col("nd") + 1.0) / (F.col("df") + 1.0))
                     + 1.0) * F.lit(float(KW_IDF_SCALE))).cast("long")
    scored = (occ.join(dfreq, "term").crossJoin(F.broadcast(nd))
                 .select("doc_id", "term",
                         (F.col("tf") * idf_s).alias("score_s")))
    w = Window.partitionBy("doc_id").orderBy(F.desc("score_s"), "term")
    return (scored.withColumn("rnk", F.row_number().over(w))
                  .filter(F.col("rnk") <= KW_TOPK)
                  .select("doc_id", "rnk", "term", "score_s")
                  .orderBy("doc_id", "rnk"))


def _kw_oracle() -> str:
    t = SQL_TOKENS.format(col="text")
    return f"""
WITH t0 AS (SELECT doc_id, unnest({t}) AS term FROM documents),
occ AS (SELECT doc_id, term, count(*) AS tf FROM t0 GROUP BY 1, 2),
dfq AS (SELECT term, count(*) AS df FROM occ GROUP BY 1),
nd AS (SELECT count(*) AS nd FROM documents),
sc AS (SELECT doc_id, occ.term,
              tf * CAST(ROUND((ln((nd + 1.0) / (df + 1.0)) + 1.0)
                              * {KW_IDF_SCALE}) AS BIGINT) AS score_s
       FROM occ JOIN dfq USING (term) CROSS JOIN nd),
rk AS (SELECT doc_id, term, score_s,
              row_number() OVER (PARTITION BY doc_id
                                 ORDER BY score_s DESC, term) AS rnk
       FROM sc)
SELECT doc_id, CAST(rnk AS INT) AS rnk, term, score_s
FROM rk WHERE rnk <= {KW_TOPK} ORDER BY doc_id, rnk
"""


# --------------------------------- Naive-Bayes quality/source classifier

#: model size cap: top-V tokens by document frequency (deterministic
#: df-desc, token-asc tie-break) — the model stays a broadcastable
#: V×2 table no matter the corpus size
QC_VOCAB = 64
QC_SCALE = 1e9


def nb_margin_frame(base: DataFrame, v_top: int = QC_VOCAB) -> DataFrame:
    """Multinomial Naive Bayes, train → score as ONE Catalyst plan —
    the fasttext-style quality-classifier shape of a training-data
    pipeline (train on a labeled seed split, score the WHOLE corpus,
    keep by threshold).  ``base`` carries (doc_id, y boolean,
    is_train boolean, tk array<string>); returns (doc_id, margin_i)
    where margin_i is the 1e9-scaled integer log-odds margin
    (positive ⇒ predicted y=true), Laplace-smoothed, priors included.

    Scale shape: ONE explode+groupBy pass builds per-doc token
    occurrence counts, MATERIALIZED once for its five consumers
    (vocabulary df, class totals, token counts, scoring — the bm25
    tf-frame barrier discipline: without it every consumer re-scans
    and re-explodes the corpus); vocabulary (top-V by df) and the
    V×2 log-prob model are tiny frames BROADCAST onto the corpus;
    scoring is one more groupBy(doc_id) — the corpus is touched
    twice total, the model never shuffles.  Determinism: per-token
    log-probs are ROUND(ln(p)·1e9) BIGINTs, so per-doc sums are
    exact integer addition — partial-agg order cannot move the hash
    (the km_01 integer-scale discipline applied to log-space)."""
    from ..functions.barrier import materialize

    occ = materialize(
        base.select("doc_id", F.explode("tk").alias("t"))
            .groupBy("doc_id", "t").agg(F.count("*").alias("k")))
    vocab = (occ.groupBy("t").agg(F.count("*").alias("df"))
                .orderBy(F.desc("df"), "t").limit(v_top).select("t"))
    v_n = vocab.count()                 # control-plane scalar (≤ v_top)

    lbl = materialize(base.select("doc_id", "y", "is_train"))
    tr = (occ.join(F.broadcast(vocab), "t")
             .join(lbl, "doc_id").filter("is_train"))
    cls = tr.groupBy("y").agg(F.sum("k").alias("tot"))
    counts = tr.groupBy("t", "y").agg(F.sum("k").alias("cnt"))
    classes = base.sparkSession.createDataFrame(
        [(True,), (False,)], "y boolean")
    model = (vocab.crossJoin(classes)
             .join(counts, ["t", "y"], "left")
             .join(cls, "y")
             .select("t", "y",
                     F.round(F.log((F.coalesce("cnt", F.lit(0)) + 1)
                                   / (F.col("tot") + F.lit(v_n))
                                      .cast("double"))
                             * F.lit(QC_SCALE)).cast("long").alias("lp")))

    pr = (lbl.filter("is_train").groupBy("y")
             .agg(F.count("*").alias("n"))
             .agg(F.sum(F.when(F.col("y"), F.col("n"))).alias("np"),
                  F.sum("n").alias("nt"))
             .select(
                 F.round(F.log(F.col("np").cast("double") / F.col("nt"))
                         * F.lit(QC_SCALE)).cast("long").alias("lpr_pos"),
                 F.round(F.log((F.col("nt") - F.col("np")).cast("double")
                               / F.col("nt"))
                         * F.lit(QC_SCALE)).cast("long").alias("lpr_neg")))

    sums = (occ.join(F.broadcast(model), "t")
               .groupBy("doc_id")
               .agg(F.sum(F.when(F.col("y"), F.col("k") * F.col("lp")))
                     .alias("sp"),
                    F.sum(F.when(~F.col("y"), F.col("k") * F.col("lp")))
                     .alias("sn")))
    zero = F.lit(0).cast("long")
    return (base.select("doc_id")
            .join(sums, "doc_id", "left")
            .crossJoin(F.broadcast(pr))
            .select("doc_id",
                    (F.coalesce("sp", zero) + F.col("lpr_pos")
                     - F.coalesce("sn", zero) - F.col("lpr_neg"))
                    .alias("margin_i")))


def qc_01(spark, sf):
    """Model-based quality/domain classifier over the corpus: train a
    multinomial NB on the md5-free deterministic split (doc_id % 4 ≠ 0)
    with y = (lang = 'en'), score EVERY doc, report per-true-lang doc
    counts, predicted-positive counts, and the mean log-odds margin.
    On the fixture the per-doc signal is weak BY CONSTRUCTION (the
    generator draws all languages from one shared 31-token vocabulary
    with mild frequency tilts — same situation as text_langid's
    profile vote), so the certified claim here is the train→score
    algebra, bit-exact on both engines; the ACCURACY claim is pinned
    in tests on a planted two-class corpus with real signal
    (tests/test_llmops.py)."""
    base = (T(spark, sf, "documents")
            .select("doc_id", "lang",
                    (F.col("lang") == "en").alias("y"),
                    (F.col("doc_id") % 4 != 0).alias("is_train"),
                    tokens("text").alias("tk")))
    m = nb_margin_frame(base)
    return (base.join(m, "doc_id")
            .groupBy("lang")
            .agg(F.count("*").alias("n_docs"),
                 F.sum((F.col("margin_i") > 0).cast("int"))
                  .cast("long").alias("n_pred_en"),
                 F.round(F.sum("margin_i").cast("double")
                         / F.count(F.lit(1)) / F.lit(QC_SCALE), 6)
                  .alias("mean_margin"))
            .orderBy("lang"))


def _qc_oracle() -> str:
    t = SQL_TOKENS.format(col="text")
    return f"""
WITH d AS (SELECT doc_id, lang, lang = 'en' AS y,
                  doc_id % 4 <> 0 AS is_train, {t} AS tk
           FROM documents),
tr0 AS (SELECT doc_id, unnest(tk) AS t FROM d),
occ AS (SELECT doc_id, t, count(*) AS k FROM tr0 GROUP BY 1, 2),
vocab AS (SELECT t FROM (SELECT t, count(*) AS df FROM occ GROUP BY 1)
          ORDER BY df DESC, t LIMIT {QC_VOCAB}),
nv AS (SELECT count(*) AS v FROM vocab),
cls AS (SELECT dd.y, SUM(o.k) AS tot
        FROM occ o JOIN vocab USING (t) JOIN d dd USING (doc_id)
        WHERE dd.is_train GROUP BY 1),
counts AS (SELECT o.t, dd.y, SUM(o.k) AS cnt
           FROM occ o JOIN vocab USING (t) JOIN d dd USING (doc_id)
           WHERE dd.is_train GROUP BY 1, 2),
classes AS (SELECT unnest([TRUE, FALSE]) AS y),
model AS (SELECT vb.t, c.y,
                 CAST(ROUND(LN((COALESCE(cnt, 0) + 1)
                               / CAST(cls.tot + nv.v AS DOUBLE))
                            * {QC_SCALE:.0f}) AS BIGINT) AS lp
          FROM vocab vb CROSS JOIN classes c
          LEFT JOIN counts ON counts.t = vb.t AND counts.y = c.y
          JOIN cls ON cls.y = c.y CROSS JOIN nv),
ntr AS (SELECT SUM(CASE WHEN y THEN n END) AS np, SUM(n) AS nt
        FROM (SELECT y, count(*) AS n FROM d WHERE is_train GROUP BY 1)),
prior AS (SELECT CAST(ROUND(LN(CAST(np AS DOUBLE) / nt)
                            * {QC_SCALE:.0f}) AS BIGINT) AS lpr_pos,
                 CAST(ROUND(LN(CAST(nt - np AS DOUBLE) / nt)
                            * {QC_SCALE:.0f}) AS BIGINT) AS lpr_neg
          FROM ntr),
sums AS (SELECT o.doc_id,
                SUM(CASE WHEN m.y THEN o.k * m.lp END) AS sp,
                SUM(CASE WHEN NOT m.y THEN o.k * m.lp END) AS sn
         FROM occ o JOIN model m USING (t) GROUP BY 1),
scored AS (SELECT d.doc_id, d.lang,
                  COALESCE(sp, 0) + lpr_pos
                  - COALESCE(sn, 0) - lpr_neg AS margin_i
           FROM d LEFT JOIN sums USING (doc_id) CROSS JOIN prior)
SELECT lang, count(*) AS n_docs,
       CAST(SUM(CASE WHEN margin_i > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_pred_en,
       ROUND(CAST(SUM(margin_i) AS DOUBLE) / count(*) / {QC_SCALE:.0f},
             6) AS mean_margin
FROM scored GROUP BY lang ORDER BY lang
"""


def _sql_vote(ws: tuple[str, ...]) -> str:
    lst = ", ".join(f"'{w}'" for w in ws)
    return f"len(list_filter(t, x -> x IN ({lst})))"


def _langid_oracle() -> str:
    sel = "SELECT doc_id, lang, {} AS t FROM documents".format(
        SQL_TOKENS.format(col="text"))
    expr = "'und'"
    cnt = "0"
    for lang in LANG_ORDER:
        v = _sql_vote(STOPWORDS[lang])
        expr = f"CASE WHEN {v} > {cnt} THEN '{lang}' ELSE {expr} END"
        cnt = f"CASE WHEN {v} > {cnt} THEN {v} ELSE {cnt} END"
    return (f"SELECT doc_id, {expr} AS pred_lang, lang "
            f"FROM ({sel})")


# ------------------------------------ PMI collocation extraction

COL_MIN_COUNT = 5
COL_TOPK = 20
COL_SCALE = 1_000_000


def col_01(spark, sf):
    """Collocation extraction: the corpus's top bigrams by pointwise
    lift — observed bigram count over the count expected if first and
    second positions were independent.  Lift is monotone in PMI
    (PMI = log lift), so ranking by it IS ranking by PMI, and the
    log disappears: ``lift_s = (c_xy · N · 10⁶) DIV (c_x⁺ · c⁺_y)``
    is computed by INTEGER division — bit-identical on both engines,
    no libm, no rounding-mode exposure (the km_01/kw_01 discipline).

    Margins c_x⁺ / c⁺_y (bigrams starting/ending with the word) come
    from the already-aggregated bigram-count frame, so after the one
    explode+groupBy the whole query operates on vocabulary-sized
    frames; the global top-K is a TakeOrdered over the min-count
    survivors, never a full sort.  The c·N·10⁶ product routes
    through DECIMAL(38,0) (VERDICT r9 item 2): in BIGINT it would
    overflow once corpus bigram count times max pair count nears
    ~9·10¹⁸/10⁶ — at 100 TB nb alone exceeds 10¹²; DECIMAL(38,0)
    keeps the product exact to 10³⁸ (DuckDB oracle widens through
    HUGEINT — 128-bit, same range), Spark's DIV on decimals returns
    the exact BIGINT quotient, all values positive so trunc ≡
    floor ≡ DuckDB's ``//``."""
    d = T(spark, sf, "documents")
    # BIND the token array to a column before the pair transform (r12,
    # VERDICT r11 item 3 — measured 5.4 s → 0.7 s at sf0.1): a lambda
    # over the raw ``tokens("text")`` EXPRESSION inlines the regex
    # tokenizer into every element_at call, re-tokenizing the document
    # once per bigram element; a bound column evaluates it once per
    # row.  (Dictionary/xxhash64-encoding the shuffle was A/B'd and
    # LOST — 6.1 s vs 0.7 s — because the tokenize-inlining was the
    # real cost, not shuffle width; map-side combine already reduces
    # the shuffle to per-task-distinct pairs.)
    tk = F.col("tk")
    n = F.size(tk)
    pairs = F.when(n >= 2, F.transform(
        F.sequence(F.lit(1), n - 1),
        lambda i: F.struct(F.element_at(tk, i).alias("w1"),
                           F.element_at(tk, i + 1).alias("w2")))
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
    bg = (d.select(tokens("text").alias("tk"))
           .select(F.explode(pairs).alias("p")).select("p.w1", "p.w2"))
    # cnt feeds four consumers, but they share one subplan and Spark
    # serves them through a ReusedExchange — measured: a materialize
    # barrier here does NOT change the cost.  The cost IS the one
    # corpus bigram explode+groupBy.
    cnt = bg.groupBy("w1", "w2").agg(F.count("*").alias("n"))
    m1 = cnt.groupBy("w1").agg(F.sum("n").alias("cx"))
    m2 = cnt.groupBy("w2").agg(F.sum("n").alias("cy"))
    nb = cnt.agg(F.sum("n").alias("nb"))
    return (cnt.filter(F.col("n") >= COL_MIN_COUNT)
               .join(m1, "w1").join(m2, "w2").crossJoin(F.broadcast(nb))
               .select("w1", "w2", "n",
                       F.expr(f"(CAST(n AS DECIMAL(38,0)) * nb * "
                              f"{COL_SCALE}) DIV "
                              f"(CAST(cx AS DECIMAL(38,0)) * cy)")
                        .alias("lift_s"))
               .orderBy(F.desc("lift_s"), "w1", "w2")
               .limit(COL_TOPK))


def _col_oracle() -> str:
    t = SQL_TOKENS.format(col="text")
    return f"""
WITH tk AS (SELECT doc_id, {t} AS tk FROM documents),
bg AS (SELECT tk[i] AS w1, tk[i + 1] AS w2
       FROM tk, UNNEST(range(1, len(tk))) AS u(i)
       WHERE len(tk) >= 2),
c AS (SELECT w1, w2, count(*) AS n FROM bg GROUP BY 1, 2),
m1 AS (SELECT w1, sum(n) AS cx FROM c GROUP BY 1),
m2 AS (SELECT w2, sum(n) AS cy FROM c GROUP BY 1),
nb AS (SELECT sum(n) AS nb FROM c)
SELECT w1, w2, n,
       CAST((CAST(n AS HUGEINT) * nb * {COL_SCALE})
            // (CAST(cx AS HUGEINT) * cy) AS BIGINT) AS lift_s
FROM c JOIN m1 USING (w1) JOIN m2 USING (w2) CROSS JOIN nb
WHERE n >= {COL_MIN_COUNT}
ORDER BY lift_s DESC, w1, w2 LIMIT {COL_TOPK}
"""


_ALL_STOPS = ", ".join(
    f"'{w}'" for w in sorted({w for ws in STOPWORDS.values() for w in ws}))

_ORACLES = {
    "text_tokens": (
        "SELECT doc_id, CAST(len({t}) AS INT) AS n_tokens, "
        "CAST(len(regexp_extract_all(text, '{b}')) AS INT) AS n_subtokens, "
        "CAST(length(text) AS INT) AS len_chars FROM documents"
        .format(t=SQL_TOKENS.format(col="text"),
                b=r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]")),
    "text_quality": (
        "WITH b AS (SELECT doc_id, text, {t} AS t FROM documents) "
        "SELECT doc_id, CAST(len(t) AS INT) AS n_tokens, "
        "CAST(len(list_filter(t, x -> x IN ({stops}))) AS INT) AS stop_cnt, "
        "ROUND(len(list_filter(t, x -> x IN ({stops}))) / CAST(len(t) AS DOUBLE), 4) AS stop_ratio, "
        "ROUND((length(trim(text)) - (len(t) - 1)) / CAST(len(t) AS DOUBLE), 4) AS mean_tok_len "
        "FROM b".format(t=SQL_TOKENS.format(col="text"), stops=_ALL_STOPS)),
    "text_langid": _langid_oracle(),
    "text_fp": ("SELECT doc_id, md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))) "
                "AS fp FROM documents"),
    "vocab_01": _VOCAB_ORACLE,
    "pii_01": _PII_ORACLE,
    "qrep_01": _QREP_ORACLE,
    "hh_01": _HH_ORACLE,
    "cms_01": _cms_oracle(),
    "lm_01": _LM_ORACLE,
    "qc_01": _qc_oracle(),
    "kw_01": _kw_oracle(),
    "col_01": _col_oracle(),
}

_DOCS = {
    "text_tokens": "Token counting (whitespace tokenizer)",
    "text_quality": "Quality scoring (stopword ratio, token stats)",
    "text_langid": "Language ID (stopword-profile vote)",
    "text_fp": "Document fingerprint (normalized md5)",
    "vocab_01": "Vocabulary stats: top-K tokens per language "
                "(deterministic tie-break)",
    "pii_01": "PII scrubbing: email/phone/IPv4 redaction with counts "
              "(planted-PII certification)",
    "qrep_01": "Repetition quality metrics: duplicate-token ratio + "
               "top-bigram fraction",
    "cms_01": "Count-Min sketch frequency estimation: D x W mergeable "
              "counter sketch built in one partial-agg pass; point "
              "queries certified est >= exact and within the eps-N "
              "bound (deterministic md5 hashes, both engines probe "
              "identical cells)",
    "hh_01": "Corpus heavy hitters: exact high-frequency tokens via "
             "per-partition candidates + one exact verify pass",
    "bpe_01": "BPE tokenizer training: iterative merge learning on the "
              "vocabulary table (one corpus pass; rows-only — argmax "
              "loop not SQL-expressible, certified vs in-Python "
              "reference in tests)",
    "lm_01": "Bigram-LM quality gate: per-doc corpus-wide bigram "
             "frequency stats (rare-bigram gibberish signal), "
             "integer-exact",
    "bpe_02": "BPE encode: apply learned merges to every doc, subword "
              "counts (rows-only; encode certified vs independent "
              "sequential-replay reference in tests)",
    "qc_01": "Model-based quality classifier: multinomial Naive Bayes "
             "train -> whole-corpus score in ONE plan (broadcast V x 2 "
             "model, integer-exact log-space sums); accuracy pinned on "
             "a planted-signal corpus in tests",
    "kw_01": "TF-IDF keyword extraction: top-3 terms per doc by "
             "integer-scaled smoothed tf-idf (idf rounded once per "
             "distinct df), WindowGroupLimit per-doc top-k",
    "col_01": "PMI collocation extraction: top bigrams by pointwise "
              "lift (monotone in PMI, so the log disappears), "
              "INTEGER-division scoring — one explode+groupBy, then "
              "vocabulary-sized margin frames and a TakeOrdered top-K",
}


# ------------------------------------ curriculum difficulty ordering

#: token corpus-frequency below which a token counts as rare
CURR_RARE_MAX = 5
CURR_BUCKETS = 10


def curr_01(spark, sf):
    """Curriculum ordering — the training-schedule verb of an LLM data
    pipeline: score every document's difficulty as its rare-token
    ratio (tokens whose CORPUS frequency < CURR_RARE_MAX — harder
    text uses rarer vocabulary), integer-scaled so the score is
    cross-engine exact (``n_rare·10⁶ div n_tokens``, col_01's
    discipline), then assign easy→hard decile buckets with the
    closed-form NTILE over the DISTRIBUTED global rank (rfm_01's
    primitive — no single-partition window; ties broken on doc_id so
    the order is total and deterministic).

    Scale shape: one corpus explode, one vocabulary groupBy, one
    doc-level groupBy — the rank runs on the doc-level frame (one row
    per doc) through the range exchange + broadcast offsets; nothing
    is corpus²."""
    from ..functions.ranking import global_rank
    from .relational import _ntile_from_rank

    d = T(spark, sf, "documents")
    tok = d.select("doc_id", F.explode(tokens("text")).alias("t"))
    vocab = tok.groupBy("t").agg(F.count("*").alias("tf"))
    per = (tok.join(vocab, "t")
           .groupBy("doc_id")
           .agg(F.count("*").alias("n_tokens"),
                F.sum(F.when(F.col("tf") < CURR_RARE_MAX, 1)
                       .otherwise(0)).alias("n_rare")))
    diff = per.select(
        "doc_id", "n_tokens", F.col("n_rare").cast("long").alias("n_rare"),
        F.expr("n_rare * 1000000 div n_tokens").alias("diff_s"))
    n1 = diff.agg(F.count("*").alias("n_docs"))
    ranked = global_rank(diff.withColumn("neg_d", -F.col("diff_s")),
                         ["neg_d", "doc_id"], "rnk")
    return (ranked.crossJoin(F.broadcast(n1))
            .select("doc_id", "n_tokens", "n_rare", "diff_s",
                    _ntile_from_rank("rnk", "n_docs", CURR_BUCKETS)
                    .alias("bucket"))
            .orderBy("doc_id"))


def _curr_oracle() -> str:
    t = SQL_TOKENS.format(col="text")
    return f"""
WITH tk AS (SELECT doc_id, unnest({t}) AS t FROM documents),
v AS (SELECT t, count(*) AS tf FROM tk GROUP BY 1),
per AS (SELECT doc_id, count(*) AS n_tokens,
               CAST(sum(CASE WHEN tf < {CURR_RARE_MAX} THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_rare
        FROM tk JOIN v USING (t) GROUP BY 1),
d AS (SELECT doc_id, n_tokens, n_rare,
             n_rare * 1000000 // n_tokens AS diff_s FROM per)
SELECT doc_id, n_tokens, n_rare, diff_s,
       CAST(NTILE({CURR_BUCKETS})
            OVER (ORDER BY diff_s DESC, doc_id) AS INT) AS bucket
FROM d ORDER BY doc_id
"""


_ORACLES["curr_01"] = _curr_oracle()
_DOCS["curr_01"] = ("Curriculum difficulty ordering: integer-scaled "
                    "rare-token ratio, easy->hard deciles via "
                    "closed-form NTILE on the distributed global rank "
                    "(no single-partition window)")


def specs() -> list[QuerySpec]:
    g = globals()
    return [QuerySpec(key=k, fn=g[k], oracle=_ORACLES.get(k), doc=d,
                      tags=("text", "llm"))
            for k, d in _DOCS.items()]
