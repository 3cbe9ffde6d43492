"""Deduplication operators for large-scale training-data pipelines.

Five strategies over the `documents` table, all expressed as DataFrame
ops with JVM-side hashing (xxhash64) — no Python in the per-row path:

- exact        hash-groupBy on raw text (ded_exact)
- n-gram Jaccard  exact pairwise via shingle-explode equi-join (ded_ngram)
- MinHash+LSH  shingle → 128 minhashes → 32 bands × 4 rows → bucket
               join → exact-Jaccard verification (ded_minhash)
- SimHash      64-bit signature, 8×8-bit band blocking, Hamming ≤ k
               verification (ded_simhash)
- embedding    cosine ≥ τ pair join over ArrayType(FloatType) (ded_embed)

Scale notes (100 TB): every strategy is shuffle-on-key (shingle, band
hash, block byte) — never an all-pairs product.  The exact-verification
joins touch only candidate pairs.  Band/row counts are chosen so a
0.9-Jaccard pair is missed with probability < 1e-14 (32 bands of 4:
(1 - 0.9^4)^32), which is what lets the MinHash path share the exact
brute-force oracle.
"""

from __future__ import annotations

import random

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import catalog
from ..functions.barrier import materialize
from ..functions.textfns import SQL_SHINGLES3, SQL_TOKENS, shingles, tokens
from ..registry import QuerySpec

T = catalog.load

MERSENNE31 = 2_147_483_647  # 2^31 - 1, modulus for the hash family
N_PERM = 128
N_BANDS = 32
ROWS_PER_BAND = N_PERM // N_BANDS
JACCARD_THRESHOLD = 0.7
SIMHASH_BITS = 64
SIMHASH_BANDS = 8
HAMMING_MAX = 6

_rng = random.Random(42)
_PERM_A = [_rng.randrange(1, MERSENNE31) for _ in range(N_PERM)]
_PERM_B = [_rng.randrange(0, MERSENNE31) for _ in range(N_PERM)]


def _shingle_rows(docs: DataFrame) -> DataFrame:
    """(doc_id, shingle) rows, distinct per doc."""
    return (docs.select("doc_id", F.explode(shingles(tokens("text"))).alias("s")))


def _shingle_hash_rows(docs: DataFrame) -> DataFrame:
    """(doc_id, h) rows: 64-bit xxhash of each distinct shingle.

    Every downstream consumer (signature permutation, intersection
    join, size count) only needs shingle *identity*, so the string is
    hashed at the scan and never shuffled: at 100 TB the intersection
    self-join moves 8-byte longs instead of ~20-byte strings, and the
    checkpoint that feeds three subtrees shrinks the same way.  A
    cross-doc 64-bit collision perturbs a Jaccard count with
    probability ~n²/2⁶⁴ — far below the declared query's rounding."""
    return _shingle_rows(docs).select("doc_id", F.xxhash64("s").alias("h"))


# ------------------------------------------------------------------- exact

def ded_exact(spark, sf):
    """Exact dedup by content hash.  The fixture has no duplicate texts,
    so dup groups are constructed by unioning a slice of the corpus with
    itself — the operator's semantics stay the interesting part."""
    d = T(spark, sf, "documents").select("doc_id", "text")
    dupes = d.filter(F.col("doc_id") < 50)
    corpus = d.unionByName(dupes)
    return (corpus.groupBy(F.md5("text").alias("h"))
                  .agg(F.count("*").alias("n"), F.min("doc_id").alias("keep_id"))
                  .filter(F.col("n") > 1)
                  .orderBy("h"))


# ------------------------------------------------------- exact n-gram jaccard

def ngram_jaccard_pairs(docs: DataFrame, threshold: float) -> DataFrame:
    """All-pairs 3-gram Jaccard ≥ threshold via shingle equi-join.

    Shuffles on shingle hash (never doc×doc): pair candidates are
    generated only where a shingle co-occurs, then intersection counts
    aggregate per pair.  Returns (i, j, jac).  Eager checkpoint: `sh`
    feeds three subtrees that race within one job (see
    minhash_dedup_pairs)."""
    sh = materialize(_shingle_hash_rows(docs))
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("sz"))
    a = sh.select(F.col("doc_id").alias("i"), "h")
    b = sh.select(F.col("doc_id").alias("j"), "h")
    inter = (a.join(b, "h")
              .filter(F.col("i") < F.col("j"))
              .groupBy("i", "j").agg(F.count("*").alias("inter")))
    sa = sizes.select(F.col("doc_id").alias("i"), F.col("sz").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("j"), F.col("sz").alias("nb"))
    jac = (F.col("inter").cast("double")
           / (F.col("na") + F.col("nb") - F.col("inter")))
    return (inter.join(sa, "i").join(sb, "j")
                 .select("i", "j", jac.alias("jac"))
                 .filter(F.col("jac") >= threshold))


def ded_ngram(spark, sf):
    docs = T(spark, sf, "documents").filter(F.col("doc_id") < 2000)
    return (ngram_jaccard_pairs(docs, 0.8)
            .select("i", "j", F.round("jac", 3).alias("jac"))
            .orderBy("i", "j"))


# ------------------------------------------------------------- MinHash + LSH

def minhash_signatures(docs: DataFrame) -> DataFrame:
    """(doc_id, mh: array<long> of N_PERM) — min over shingles of the
    permuted 31-bit shingle hash."""
    return minhash_signatures_from(_shingle_hash_rows(docs))


def minhash_signatures_from(sh: DataFrame) -> DataFrame:
    """Signatures from (doc_id, h) shingle-hash rows.

    Hashes reduce JVM-side to one array per doc (collect_list in a
    single hash agg), then all 128 permutations evaluate in one
    Arrow-batched numpy broadcast per doc batch — 128 separate min()
    aggregate buffers cost ~3× more in codegen'd evaluation."""
    x = F.pmod("h", F.lit(MERSENNE31))
    per_doc = (sh.select("doc_id", x.alias("x"))
                 .groupBy("doc_id").agg(F.collect_list("x").alias("xs")))

    a = np.array(_PERM_A, dtype=np.int64)
    b = np.array(_PERM_B, dtype=np.int64)

    @F.pandas_udf("array<long>")
    def mh(xs: pd.Series) -> pd.Series:
        # per-doc numpy broadcast; a segmented-min (minimum.reduceat)
        # formulation measured 15× slower — reduceat is a generic
        # non-SIMD loop, while this per-doc min(axis=0) is vectorized
        out = []
        for v in xs:
            x = np.asarray(v, dtype=np.int64)[:, None]        # n × 1
            # int64 overflow-safe: a < 2^31, x < 2^31 → a*x < 2^62
            out.append((a * x + b) % MERSENNE31)              # n × 128
        return pd.Series([m.min(axis=0) for m in out])

    return per_doc.select("doc_id", mh("xs").alias("mh"))


def _band_rows(sig: DataFrame) -> DataFrame:
    """(doc_id, band, bh) rows: one 64-bit hash per signature band."""
    bands = []
    for band in range(N_BANDS):
        # direct multi-arg hash of the band's longs: stays in codegen,
        # no interpreted HOF lambda, no string materialization
        cells = [F.element_at("mh", band * ROWS_PER_BAND + r + 1)
                 for r in range(ROWS_PER_BAND)]
        bands.append(F.struct(
            F.lit(band).alias("band"),
            F.xxhash64(*cells).alias("bh")))
    return (sig.select("doc_id", F.explode(F.array(*bands)).alias("b"))
               .select("doc_id", "b.band", "b.bh"))


def lsh_candidates(sig: DataFrame) -> DataFrame:
    """Band the (doc_id, mh array) signature and bucket-join: candidate
    pairs (i, j)."""
    # eager barrier AFTER banding: A/B-measured ~15% faster than
    # checkpointing the compact signature frame and re-deriving the
    # banding on both self-join sides — the 32-struct build + explode
    # per row costs more than materializing the 32×-larger band frame
    banded = materialize(_band_rows(sig))
    a = banded.select(F.col("doc_id").alias("i"), "band", "bh")
    b = banded.select(F.col("doc_id").alias("j"), "band", "bh")
    return (a.join(b, ["band", "bh"])
             .filter(F.col("i") < F.col("j"))
             .select("i", "j").distinct())


def minhash_dedup_pairs(docs: DataFrame, threshold: float) -> DataFrame:
    """LSH candidates, verified with exact Jaccard ≥ threshold.

    The shingle frame feeds three subtrees (signatures, both sides of
    the verification join) and the banded frame feeds both sides of the
    bucket self-join.  materialize() (eager barrier, see
    functions/barrier.py) rather than persist(): within a single job
    the join sides race, so a lazy cache would be populated twice
    concurrently and reuse nothing."""
    sh = materialize(_shingle_hash_rows(docs))
    cand = lsh_candidates(minhash_signatures_from(sh))
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("sz"))
    a = sh.select(F.col("doc_id").alias("i"), "h")
    b = sh.select(F.col("doc_id").alias("j"), "h")
    inter = (cand.join(a, "i").join(b, ["j", "h"])
                 .groupBy("i", "j").agg(F.count("*").alias("inter")))
    sa = sizes.select(F.col("doc_id").alias("i"), F.col("sz").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("j"), F.col("sz").alias("nb"))
    jac = (F.col("inter").cast("double")
           / (F.col("na") + F.col("nb") - F.col("inter")))
    return (inter.join(sa, "i").join(sb, "j")
                 .select("i", "j", jac.alias("jac"))
                 .filter(F.col("jac") >= threshold))


def ded_minhash(spark, sf):
    docs = T(spark, sf, "documents")
    return (minhash_dedup_pairs(docs, JACCARD_THRESHOLD)
            .select("i", "j", F.round("jac", 3).alias("jac"))
            .orderBy("i", "j"))


# ------------------------------------------------------ incremental MinHash

def incremental_minhash_pairs(corpus_sh: DataFrame, new_docs: DataFrame,
                              threshold: float) -> DataFrame:
    """Near-dup pairs of a NEW batch against a stored corpus (plus
    within-batch pairs) — the ingestion shape: each arriving batch is
    deduped against everything already kept WITHOUT re-pairing the
    corpus against itself.

    ``corpus_sh`` is the stored corpus's (doc_id, h) shingle-hash rows
    (at 100 TB a persisted table, alongside persisted signatures —
    derived here because the fixtures have no signature store).  The
    scale asymmetry: the corpus band table is only ever probed by a
    *broadcast* of the small new batch's band hashes, so the corpus
    never shuffles; the exact-Jaccard verification joins candidates
    (all keyed by a new-batch doc) against the shingle frames.

    Returns (i, j, jac) with j always in the new batch.  Candidate
    membership, not raw id order, decides pairing: a corpus doc pairs
    with a new doc regardless of their doc_id order (out-of-order
    ingestion must not silently admit duplicates), while within the
    batch the usual i < j rule applies.
    """
    new_sh = materialize(_shingle_hash_rows(new_docs))
    corpus_sh = materialize(corpus_sh)  # feeds the union AND the band probe
    all_sh = materialize(corpus_sh.unionByName(new_sh))
    corpus_bands = _band_rows(minhash_signatures_from(corpus_sh))
    new_bands = materialize(_band_rows(minhash_signatures_from(new_sh)))
    new_b = F.broadcast(new_bands.select(F.col("doc_id").alias("j"),
                                         "band", "bh"))
    cand_corpus = (corpus_bands.select(F.col("doc_id").alias("i"), "band", "bh")
                   .join(new_b, ["band", "bh"])
                   .filter(F.col("i") != F.col("j")))
    cand_within = (new_bands.select(F.col("doc_id").alias("i"), "band", "bh")
                   .join(new_b, ["band", "bh"])
                   .filter(F.col("i") < F.col("j")))
    cand = (cand_corpus.select("i", "j")
            .unionByName(cand_within.select("i", "j")).distinct())
    sizes_all = all_sh.groupBy("doc_id").agg(F.count("*").alias("sz"))
    sizes_new = new_sh.groupBy("doc_id").agg(F.count("*").alias("sz"))
    a = all_sh.select(F.col("doc_id").alias("i"), "h")
    b = new_sh.select(F.col("doc_id").alias("j"), "h")
    inter = (cand.join(a, "i").join(b, ["j", "h"])
                 .groupBy("i", "j").agg(F.count("*").alias("inter")))
    sa = sizes_all.select(F.col("doc_id").alias("i"), F.col("sz").alias("na"))
    sb = sizes_new.select(F.col("doc_id").alias("j"), F.col("sz").alias("nb"))
    jac = (F.col("inter").cast("double")
           / (F.col("na") + F.col("nb") - F.col("inter")))
    return (inter.join(sa, "i").join(sb, "j")
                 .select("i", "j", jac.alias("jac"))
                 .filter(F.col("jac") >= threshold))


NEW_BATCH_START = 400  # declared-query split: doc_id >= 400 is "new"


def ded_incr(spark, sf):
    d = T(spark, sf, "documents")
    corpus = d.filter(F.col("doc_id") < NEW_BATCH_START)
    new = d.filter(F.col("doc_id") >= NEW_BATCH_START)
    return (incremental_minhash_pairs(_shingle_hash_rows(corpus), new,
                                      JACCARD_THRESHOLD)
            .select("i", "j", F.round("jac", 3).alias("jac"))
            .orderBy("i", "j"))


# ------------------------------------------------------------------ SimHash

def simhash_signatures(docs: DataFrame) -> DataFrame:
    """(doc_id, simhash BIGINT): per-bit weighted vote over shingle
    hashes.  64 conditional-sum aggregates in one hash agg pass."""
    sh = _shingle_hash_rows(docs)
    votes = [
        F.sum(F.when(F.shiftright("h", k).bitwiseAND(F.lit(1)) == 1, 1)
               .otherwise(-1)).alias(f"v{k}")
        for k in range(SIMHASH_BITS)
    ]
    voted = sh.groupBy("doc_id").agg(*votes)
    bits = [
        F.when(F.col(f"v{k}") > 0,
               F.shiftleft(F.lit(1).cast("long"), k)).otherwise(F.lit(0).cast("long"))
        for k in range(SIMHASH_BITS)
    ]
    acc = bits[0]
    for c in bits[1:]:
        acc = acc.bitwiseOR(c)
    return voted.select("doc_id", acc.alias("simhash"))


def simhash_dedup_pairs(docs: DataFrame, max_hamming: int = HAMMING_MAX) -> DataFrame:
    """Near-dup pairs by SimHash: 8-bit band blocking (a pair within
    Hamming ≤ 7 shares at least one of 8 bands by pigeonhole), then
    exact Hamming ≤ max_hamming via bit_count(xor)."""
    sig = simhash_signatures(docs)
    width = SIMHASH_BITS // SIMHASH_BANDS
    bands = [
        F.struct(F.lit(i).alias("band"),
                 F.shiftrightunsigned("simhash", i * width)
                  .bitwiseAND(F.lit((1 << width) - 1)).alias("bv"))
        for i in range(SIMHASH_BANDS)
    ]
    banded = (sig.select("doc_id", "simhash",
                         F.explode(F.array(*bands)).alias("b"))
                 .select("doc_id", "simhash", "b.band", "b.bv"))
    banded = materialize(banded)  # both self-join sides reuse this
    a = banded.select(F.col("doc_id").alias("i"), F.col("simhash").alias("sh_i"),
                      "band", "bv")
    b = banded.select(F.col("doc_id").alias("j"), F.col("simhash").alias("sh_j"),
                      "band", "bv")
    ham = F.bit_count(F.col("sh_i").bitwiseXOR(F.col("sh_j")))
    return (a.join(b, ["band", "bv"])
             .filter(F.col("i") < F.col("j"))
             .select("i", "j", ham.alias("hamming")).distinct()
             .filter(F.col("hamming") <= max_hamming))


def ded_simhash(spark, sf):
    docs = T(spark, sf, "documents")
    return simhash_dedup_pairs(docs).orderBy("i", "j")


# ------------------------------------------------------- embedding cosine

def _cosine_udf():
    # created lazily: pandas_udf parses its DDL return type against the
    # active session, so a module-level definition breaks plain imports
    @F.pandas_udf("double")
    def cos(va: pd.Series, vb: pd.Series) -> pd.Series:
        a = np.asarray(va.tolist(), dtype=np.float64)
        b = np.asarray(vb.tolist(), dtype=np.float64)
        dot = np.einsum("ij,ij->i", a, b)
        na = np.sqrt(np.einsum("ij,ij->i", a, a))
        nb = np.sqrt(np.einsum("ij,ij->i", b, b))
        return pd.Series(dot / (na * nb))
    return cos


def cosine_pairs(emb: DataFrame, threshold: float) -> DataFrame:
    """Pairwise cosine ≥ threshold over ArrayType(FloatType).

    The per-pair dot product is an Arrow-batched numpy einsum — a
    higher-order-function fold is interpreted per element and was ~20×
    slower over the pair blow-up.  float64 accumulation-order
    differences vs a sequential fold sit ~1e-16, far below the 1e-4
    rounding the declared query applies.  The pair join is the
    brute-force baseline; the LSH-bucketed scale path lives in
    similarity.py."""
    e = emb.select("vec_id", F.transform("embedding",
                                         lambda x: x.cast("double")).alias("v"))
    a = e.select(F.col("vec_id").alias("i"), F.col("v").alias("va"))
    b = e.select(F.col("vec_id").alias("j"), F.col("v").alias("vb"))
    return (a.join(b, F.col("i") < F.col("j"))
             .select("i", "j", _cosine_udf()("va", "vb").alias("cos"))
             .filter(F.col("cos") >= threshold))


def ded_embed(spark, sf):
    emb = T(spark, sf, "embeddings").filter(F.col("vec_id") < 2000)
    return (cosine_pairs(emb, 0.4)
            .select("i", "j", F.round("cos", 4).alias("cos"))
            .orderBy("i", "j"))


# ----------------------------------------------------------------- oracles

_NGRAM_ORACLE = f"""
WITH t0 AS (SELECT doc_id, {SQL_TOKENS.format(col='text')} AS t
            FROM documents WHERE doc_id < 2000),
sh AS (SELECT doc_id, {SQL_SHINGLES3} AS s FROM t0),
p AS (SELECT a.doc_id AS i, b.doc_id AS j,
             len(list_intersect(a.s, b.s))::DOUBLE
               / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) AS jac
      FROM sh a JOIN sh b ON a.doc_id < b.doc_id)
SELECT i, j, ROUND(jac, 3) AS jac FROM p WHERE jac >= 0.8
"""

# MinHash shares the brute-force oracle: with 32 bands × 4 rows the miss
# probability at Jaccard 0.9 is (1 - 0.9^4)^32 ≈ 1e-15 — the LSH result
# equals exact ≥ 0.7 on this corpus (verified in tests against the
# planted near-dup pairs, all of Jaccard ≥ 0.9).
_MINHASH_ORACLE = f"""
WITH t0 AS (SELECT doc_id, {SQL_TOKENS.format(col='text')} AS t FROM documents),
sh AS (SELECT doc_id, {SQL_SHINGLES3} AS s FROM t0),
p AS (SELECT a.doc_id AS i, b.doc_id AS j,
             len(list_intersect(a.s, b.s))::DOUBLE
               / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) AS jac
      FROM sh a JOIN sh b ON a.doc_id < b.doc_id)
SELECT i, j, ROUND(jac, 3) AS jac FROM p WHERE jac >= {JACCARD_THRESHOLD}
"""

_EMBED_ORACLE = """
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
           FROM embeddings WHERE vec_id < 2000)
SELECT a.vec_id AS i, b.vec_id AS j,
       ROUND(list_dot_product(a.v, b.v)
             / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))),
             4) AS cos
FROM e a JOIN e b ON a.vec_id < b.vec_id
WHERE list_dot_product(a.v, b.v)
      / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) >= 0.4
"""

_EXACT_ORACLE = """
WITH corpus AS (
    SELECT doc_id, text FROM documents
    UNION ALL SELECT doc_id, text FROM documents WHERE doc_id < 50)
SELECT md5(text) AS h, count(*) AS n, min(doc_id) AS keep_id
FROM corpus GROUP BY 1 HAVING count(*) > 1
"""

_INCR_ORACLE = f"""
WITH t0 AS (SELECT doc_id, {{t}} AS t FROM documents),
sh AS (SELECT doc_id, {{s}} AS s FROM t0),
p AS (SELECT a.doc_id AS i, b.doc_id AS j,
             len(list_intersect(a.s, b.s))::DOUBLE
               / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) AS jac
      FROM sh a JOIN sh b ON a.doc_id < b.doc_id
      WHERE b.doc_id >= {NEW_BATCH_START})
SELECT i, j, ROUND(jac, 3) AS jac FROM p WHERE jac >= {JACCARD_THRESHOLD}
""".format(t=SQL_TOKENS.format(col="text"), s=SQL_SHINGLES3)

_DOCS = {
    "ded_exact": "Exact dedup: content-hash groupBy",
    "ded_ngram": "Exact 3-gram Jaccard pair dedup (shingle equi-join)",
    "ded_minhash": "MinHash + LSH near-dup (128 perms, 32×4 bands, verified)",
    "ded_incr": "Incremental near-dup: new batch vs stored corpus "
                "(broadcast band probe, corpus never shuffles)",
    "ded_simhash": "SimHash near-dup (64-bit, band blocking, Hamming ≤ 6)",
    "ded_embed": "Embedding cosine near-dup pairs (double-fold dot product)",
}

_ORACLES = {
    "ded_exact": _EXACT_ORACLE,
    "ded_ngram": _NGRAM_ORACLE,
    "ded_minhash": _MINHASH_ORACLE,
    "ded_incr": _INCR_ORACLE,
    # ded_simhash: signature algebra is engine-specific → rows-only check;
    # property-tested against brute force in tests/test_llmops.py.
    "ded_embed": _EMBED_ORACLE,
}


def specs() -> list[QuerySpec]:
    g = globals()
    return [QuerySpec(key=k, fn=g[k], oracle=_ORACLES.get(k), doc=d,
                      tags=("dedup", "llm"))
            for k, d in _DOCS.items()]
