"""Lexical retrieval operators (round 4): TF-IDF term weighting and a
BM25-shaped ranked search — the keyword-side complement of the embedding
ANN pane (similarity.py), since a 100-TB corpus pipeline needs BOTH lexical
and dense retrieval for curation (contamination lookups, dedup triage,
targeted corpus slicing).

Exact-arithmetic contract (the repo rule that makes the oracle hashes
possible): every score is built from BIGINT multiplications and integer
divisions (``DIV`` in Spark == ``//`` in DuckDB on non-negative operands:
floor == truncate), so results are order-independent and value-exact in
both engines. The classical ``ln``-based IDF is replaced by its RATIONAL
argument (the same monotone ordering per term; documented, not hidden —
cross-engine ``ln`` would differ in the last ulp and break the hash).

Scale notes:
- the (doc, term) TF aggregate is the explode-shuffle every inverted-index
  build pays; partial aggregation (map-side combine) applies since the key
  includes doc_id.
- the DF table is vocabulary-sized; the per-term join back to TF is an
  equi-join on term — broadcastable when the vocabulary fits (the synthetic
  corpus' does; a web-scale vocabulary shuffles, which is still one
  edge-sized exchange).
- BM25 probes only the QUERY_K query terms: the candidate set is the
  postings of those terms (a semi-join on term), never the full TF table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kgforge import corpus
from kgforge.registry import register
from kgforge.tables import load

TFIDF_MIN_LEN = corpus.MIN_TOKEN_LEN  # qualifying-token rule shared corpus-wide
TFIDF_TOP_K = 3  # terms kept per document
IDF_SCALE = 1000

_TF_CTE = f"""
    tf AS (
      SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
      FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term
            FROM documents)
      WHERE length(term) >= {TFIDF_MIN_LEN}
      GROUP BY doc_id, term
    ),
    dfreq AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term),
    nd AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents)
"""


@register(
    "text_tfidf",
    sql=f"""
    WITH {_TF_CTE.strip()},
    scored AS (
      SELECT tf.doc_id, tf.term, tf.tf,
             CAST(tf.tf * ((nd.n * {IDF_SCALE}) // dfreq.df) AS BIGINT)
               AS score
      FROM tf JOIN dfreq USING (term), nd
    )
    SELECT doc_id, term, tf, score, rnk FROM (
      SELECT *, CAST(row_number() OVER (
                 PARTITION BY doc_id ORDER BY score DESC, term) AS INT) AS rnk
      FROM scored)
    WHERE rnk <= {TFIDF_TOP_K}
    """,
    doc=(
        f"TF-IDF keyword extraction: top-{TFIDF_TOP_K} terms per document "
        f"by tf × rational-idf (idf_scaled = (N × {IDF_SCALE}) DIV df — "
        "exact integers, same per-term ordering as ln(N/df) since x ↦ ln x "
        "is monotone). One explode-aggregate for TF (map-side combinable), "
        "one vocabulary-sized aggregate for DF, one equi-join back on term "
        "(broadcastable when the vocabulary fits an executor), one "
        "per-document window for the top-k."
    ),
)
def text_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    tf = _term_freq(spark, sf_dir)
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).cast("bigint").alias("df"))
    n = corpus.n_docs(spark, sf_dir)
    scored = tf.join(dfreq, "term").select(
        "doc_id",
        "term",
        "tf",
        (F.col("tf") * F.expr(f"({n} * {IDF_SCALE}) DIV df"))
        .cast("bigint")
        .alias("score"),
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("term")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("int"))
        .where(F.col("rnk") <= TFIDF_TOP_K)
        .select("doc_id", "term", "tf", "score", "rnk")
    )


def _term_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, term, tf) over qualifying tokens — the inverted-index cut
    shared by text_tfidf and sim_bm25. array-filter BEFORE the explode so
    the shuffle carries only qualifying tokens."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    return (
        docs.select(
            "doc_id",
            F.explode(
                F.filter(
                    F.split("text", " "),
                    lambda t: F.length(t) >= TFIDF_MIN_LEN,
                )
            ).alias("term"),
        )
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("tf"))
    )


# ----------------------------------------------------------------- BM25
QUERY_K = 4  # query = the QUERY_K highest-df terms (deterministic from data)
BM25_TOP_K = 5  # documents returned per query term
K1_X10 = 12  # k1 = 1.2
B_X100 = 75  # b = 0.75

# Integer BM25 pieces, mirrored VERBATIM between engines (any drift breaks
# the value hash — keep the parenthesization identical):
#   avgdl_x1000   = (Σ dl × 1000) DIV N
#   ratio_x1000   = (dl × 1000000) DIV avgdl_x1000          (= dl/avgdl ×1000)
#   denom_x1000   = tf×1000 + (K1_X10 × (1000 − B_X100×10
#                     + (B_X100×10 × ratio_x1000) DIV 1000)) DIV 10
#   tfnorm_x1000  = (tf × (10 + K1_X10) × 100 × 1000) DIV denom_x1000
#   idf_x1000     = ((2N − 2df + 1) × 1000) DIV (2df + 1)
#                   (the rational argument of the classical ln-idf)
#   score_x1e6    = Σ_queryterms idf_x1000 × tfnorm_x1000


@register(
    "sim_bm25",
    sql=f"""
    WITH {_TF_CTE.strip()},
    qterms AS (
      SELECT term, df FROM dfreq ORDER BY df DESC, term LIMIT {QUERY_K}
    ),
    dl AS (
      SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl FROM tf GROUP BY doc_id
    ),
    avgdl AS (
      SELECT CAST((sum(dl) * 1000) // count(*) AS BIGINT) AS avgdl_x1000
      FROM dl
    ),
    contrib AS (
      SELECT q.term, t.doc_id,
             t.tf,
             (((2 * nd.n - 2 * q.df + 1) * 1000) // (2 * q.df + 1))
               AS idf_x1000,
             ((t.tf * (10 + {K1_X10}) * 100 * 1000) //
              (t.tf * 1000 + ({K1_X10} * (1000 - {B_X100} * 10 +
                ({B_X100} * 10 * ((d.dl * 1000000) // a.avgdl_x1000)) // 1000
              )) // 10)) AS tfnorm_x1000
      FROM qterms q
      JOIN tf t USING (term)
      JOIN dl d ON t.doc_id = d.doc_id, avgdl a, nd
    )
    SELECT term, doc_id, tf, CAST(idf_x1000 * tfnorm_x1000 AS BIGINT)
             AS score_x1e6, rnk
    FROM (SELECT *, CAST(row_number() OVER (
              PARTITION BY term
              ORDER BY idf_x1000 * tfnorm_x1000 DESC, doc_id) AS INT) AS rnk
          FROM contrib)
    WHERE rnk <= {BM25_TOP_K}
    """,
    doc=(
        f"BM25-shaped ranked retrieval: the {QUERY_K} highest-df terms act "
        f"as the query (deterministic from the data), top-{BM25_TOP_K} "
        "documents per term by exact-integer BM25 (k1=1.2, b=0.75; the "
        "ln-idf replaced by its rational argument — same per-term doc "
        "ordering, engine-exact). The probe is a semi-join of the postings "
        "list on the broadcast query terms — the TF table is never scanned "
        "beyond the query terms' postings, which is the inverted-index "
        "access path at any scale; doc length and avgdl are one aggregate "
        "each."
    ),
)
def sim_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    tf = _term_freq(spark, sf_dir).persist()  # feeds qterms, dl, and probes
    n = corpus.n_docs(spark, sf_dir)
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).cast("bigint").alias("df"))
    qterms = dfreq.orderBy(F.col("df").desc(), F.col("term")).limit(QUERY_K)
    dl = tf.groupBy("doc_id").agg(F.sum("tf").cast("bigint").alias("dl"))
    avgdl_x1000 = int(
        dl.select(
            F.expr("CAST((sum(dl) * 1000) DIV count(*) AS BIGINT)").alias("a")
        ).collect()[0]["a"]
        # 1-row driver pull: a global scalar, same discipline as the k-core
        # K derivation (bounded by construction)
    )
    contrib = (
        F.broadcast(qterms)
        .join(tf, "term")
        .join(dl, "doc_id")
        .select(
            "term",
            "doc_id",
            "tf",
            F.expr(f"((2 * {n} - 2 * df + 1) * 1000) DIV (2 * df + 1)").alias(
                "idf_x1000"
            ),
            F.expr(
                f"(tf * (10 + {K1_X10}) * 100 * 1000) DIV "
                f"(tf * 1000 + ({K1_X10} * (1000 - {B_X100} * 10 + "
                f"({B_X100} * 10 * ((dl * 1000000) DIV {avgdl_x1000})) DIV 1000"
                f")) DIV 10)"
            ).alias("tfnorm_x1000"),
        )
    )
    w = Window.partitionBy("term").orderBy(
        (F.col("idf_x1000") * F.col("tfnorm_x1000")).desc(), F.col("doc_id")
    )
    return (
        contrib.withColumn("rnk", F.row_number().over(w).cast("int"))
        .where(F.col("rnk") <= BM25_TOP_K)
        .select(
            "term",
            "doc_id",
            "tf",
            (F.col("idf_x1000") * F.col("tfnorm_x1000"))
            .cast("bigint")
            .alias("score_x1e6"),
            "rnk",
        )
    )
