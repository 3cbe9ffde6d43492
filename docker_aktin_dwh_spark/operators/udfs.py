"""UDF / UDAF / UDTF surface — SURVEY.md §2.9.

The reference's extensibility story is "hand a DB connection to Python
or R" (import scripts installed at reference
src/docker/wildfly/Dockerfile:48; R runtime via the dependency filter
at src/build.sh:273).  The Spark-native equivalents, in preference
order: Arrow-vectorized pandas_udf → applyInPandas (grouped) →
mapInPandas (partition stream).  Row-at-a-time Python UDFs are
deliberately absent from the hot path.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from .. import catalog
from ..registry import QuerySpec

T = catalog.load


def udf_01(spark, sf):
    # UDF-01: vectorized scalar transform (field normalization — the
    # import-script analogue), Arrow-batched.  Defined lazily: pandas_udf
    # needs an active session to parse its return type.
    @pandas_udf("string")
    def norm_name(s: pd.Series) -> pd.Series:
        return s.str.strip().str.lower()

    c = T(spark, sf, "customer")
    return (c.select("c_custkey", norm_name("c_name").alias("norm_name"))
             .orderBy("c_custkey"))


def udf_02(spark, sf):
    """UDF-02: grouped custom stat via applyInPandas (R-report analogue).

    Exact min/max/count only — float summation inside pandas would use
    pairwise order and break decimal-grade hash parity.
    """
    l = T(spark, sf, "lineitem")

    def stats(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "l_returnflag": [pdf["l_returnflag"].iloc[0]],
            "n": [len(pdf)],
            "min_price": [pdf["l_extendedprice"].min()],
            "max_price": [pdf["l_extendedprice"].max()],
        })

    out = l.select("l_returnflag", "l_extendedprice").groupBy("l_returnflag") \
           .applyInPandas(stats, "l_returnflag string, n long, "
                                 "min_price double, max_price double")
    return out.orderBy("l_returnflag")


def udf_03(spark, sf):
    """UDF-03: table function (doc → many rows), the CDA-shred shape:
    explode of a parse result."""
    d = T(spark, sf, "documents").filter(F.col("doc_id") < 100)
    tok = F.explode(F.split(F.trim("text"), r"\s+")).alias("token")
    return (d.select(tok)
             .filter(F.col("token") != "")
             .groupBy("token").agg(F.count("*").alias("n"))
             .orderBy("token"))


def udf_04(spark, sf):
    """UDF-04: whole-partition transform via mapInPandas (streamed Arrow
    batches — never a driver-side collect)."""
    c = T(spark, sf, "customer")

    def bucketize(batches):
        import numpy as np
        for pdf in batches:
            yield pd.DataFrame({
                "c_custkey": pdf["c_custkey"],
                "bal_bucket": np.floor(pdf["c_acctbal"] / 1000).astype("int32"),
            })

    return (c.select("c_custkey", "c_acctbal")
             .mapInPandas(bucketize, "c_custkey long, bal_bucket int")
             .orderBy("c_custkey"))


def udf_05(spark, sf):
    """UDF-05: genuine Python UDTF (Spark ≥3.5) applied laterally —
    one document row expands to (doc_id, idx, tok) fact rows, the
    CDA-shred shape (reference installs the import scripts that do this
    imperatively, src/docker/wildfly/Dockerfile:48).  Unlike udf_03's
    explode-of-expression, the UDTF owns its row-generation loop, which
    is the extension point for parsers that aren't expressible as a
    single split/explode."""
    from pyspark.sql.functions import udtf

    class Tokenize:
        def eval(self, doc_id, text):
            for i, tok in enumerate((text or "").strip().split()):
                yield doc_id, i + 1, tok

    spark.udtf.register(
        "tokenize_udtf",
        udtf(Tokenize, returnType="doc_id bigint, idx bigint, tok string"))
    d = T(spark, sf, "documents").filter(F.col("doc_id") < 50)
    d.createOrReplaceTempView("_udtf_docs")
    return spark.sql(
        "SELECT t.doc_id, t.idx, t.tok "
        "FROM _udtf_docs, LATERAL tokenize_udtf(doc_id, text) t "
        "ORDER BY t.doc_id, t.idx")


def _l2_arrow_batches(batches):
    """mapInArrow kernel for udf_06 (module-level so tests can feed it
    sliced / empty-list RecordBatches directly)."""
    import numpy as np
    import pyarrow as pa

    for batch in batches:
        ids = batch.column("vec_id")
        emb = batch.column("embedding")
        # float64 BEFORE the multiply: the column is float32 and a
        # single-precision accumulation would drift from the
        # oracle's CAST(x AS DOUBLE) sum
        flat = (emb.flatten().to_numpy(zero_copy_only=False)
                .astype(np.float64))
        # flatten() re-bases values to the slice, but offsets stay
        # raw — on a sliced RecordBatch (offset != 0) they'd
        # misalign; re-base them too.  reduceat also returns the
        # NEIGHBOR's element for an empty segment — mask those to 0.
        offs = emb.offsets.to_numpy(zero_copy_only=False)
        offs = offs - offs[0]
        # reduceat over the starts of NON-empty segments only: an
        # empty trailing segment would put len(flat) in the index list
        # (IndexError), and empty segments elsewhere would inherit the
        # neighbor's sum — consecutive non-empty starts bound exactly
        # one segment's elements because empties contribute none.
        counts = np.diff(offs)
        sq = np.zeros(counts.shape[0], dtype=np.float64)
        nz = np.flatnonzero(counts)
        if nz.size:
            sq[nz] = np.add.reduceat(flat * flat, offs[:-1][nz])
        yield pa.RecordBatch.from_arrays(
            [ids, pa.array(np.round(np.sqrt(sq), 6),
                           type=pa.float64())],
            ["vec_id", "l2_norm"])


def udf_06(spark, sf):
    """UDF-06: mapInArrow — the Arrow-NATIVE partition transform (no
    pandas materialization at all; pyarrow RecordBatches in and out).
    The right lane when the per-batch work is itself Arrow/numpy
    kernels: here the embedding L2 norm via zero-copy list-array math.
    Completes the Python ladder: pandas_udf (scalar) → applyInPandas
    (grouped) → mapInPandas (stream of DataFrames) → mapInArrow
    (stream of RecordBatches, no conversion overhead)."""
    e = T(spark, sf, "embeddings").select("vec_id", "embedding")
    return (e.mapInArrow(_l2_arrow_batches, "vec_id long, l2_norm double")
             .orderBy("vec_id"))


_ORACLES = {
    "udf_01": ("SELECT c_custkey, lower(trim(c_name)) AS norm_name "
               "FROM customer"),
    "udf_06": ("SELECT vec_id, ROUND(sqrt(list_sum("
               "list_transform(embedding, x -> CAST(x AS DOUBLE) * x))), 6)"
               " AS l2_norm FROM embeddings ORDER BY vec_id"),
    "udf_02": ("SELECT l_returnflag, count(*) AS n, "
               "min(l_extendedprice) AS min_price, "
               "max(l_extendedprice) AS max_price "
               "FROM lineitem GROUP BY l_returnflag"),
    "udf_03": ("SELECT token, count(*) AS n FROM ("
               "SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS token "
               "FROM documents WHERE doc_id < 100) WHERE token <> '' "
               "GROUP BY token"),
    "udf_04": ("SELECT c_custkey, CAST(FLOOR(c_acctbal / 1000) AS INT) "
               "AS bal_bucket FROM customer"),
    "udf_05": ("SELECT * FROM ("
               "SELECT doc_id, unnest([{'idx': i, 'tok': t[i]} "
               "for i in range(1, len(t)+1)], recursive := true) "
               "FROM (SELECT doc_id, "
               "regexp_split_to_array(trim(text), '\\s+') AS t "
               "FROM documents WHERE doc_id < 50))"),
}

_DOCS = {
    "udf_01": "UDF-01 vectorized pandas_udf scalar transform",
    "udf_02": "UDF-02 grouped applyInPandas aggregate",
    "udf_03": "UDF-03 table function (explode of parse result)",
    "udf_04": "UDF-04 mapInPandas partition transform",
    "udf_05": "UDF-03 Python UDTF (lateral doc shred)",
    "udf_06": "UDF-06 mapInArrow Arrow-native partition transform "
              "(zero-copy RecordBatch math)",
}


def specs() -> list[QuerySpec]:
    g = globals()
    return [QuerySpec(key=k, fn=g[k], oracle=_ORACLES.get(k), doc=d,
                      tags=("udf",))
            for k, d in _DOCS.items()]
