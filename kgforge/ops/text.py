"""Text-analysis operators for a large-scale training-data pipeline:
token counting, quality scoring, language ID, and document fingerprinting —
all pure JVM built-ins (no Python in the hot path), each with a value-exact
DuckDB oracle over the driver `documents` table.

Scale notes: every op here is embarrassingly parallel per document (narrow,
no shuffle except final aggregation keys), reads only the columns it needs
(parquet column pruning), and keeps expressions inside whole-stage codegen.
At 100 TB these run at scan speed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kgforge.registry import register
from kgforge.tables import load

# Deterministic per-language marker lexicons for the heuristic language ID.
# (The driver documents are synthetic word soup; real-world langid would use
# char n-gram profiles — the *dataflow* is identical: score per language from
# token overlap, argmax with a stable tie-break.)
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "in"],
    "de": ["der", "die", "und", "das", "ist"],
    "es": ["el", "la", "de", "que", "los"],
    "fr": ["le", "la", "les", "des", "est"],
}

STOPWORDS = sorted({w for ws in LANG_MARKERS.values() for w in ws})


@register(
    "text_tokens",
    sql="""
    SELECT doc_id,
           CAST(length(string_split(text, ' ')) AS INT) AS ws_tokens,
           CAST(length(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]')) AS INT)
             AS bpe_ish_tokens,
           CAST(length(text) AS INT) AS n_chars
    FROM documents
    """,
    doc="Token counting: whitespace split + a BPE-ish regex segmentation.",
)
def text_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(F.split("text", " ")).alias("ws_tokens"),
        F.size(
            F.regexp_extract_all(
                "text", F.lit("[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"), F.lit(0)
            )
        ).alias("bpe_ish_tokens"),
        F.length("text").cast("int").alias("n_chars"),
    )


QUALITY_SQL = f"""
    WITH t AS (
      SELECT doc_id, text,
             string_split(text, ' ') AS toks,
             length(text) AS n_chars
      FROM documents
    )
    SELECT doc_id,
           CAST(n_chars AS INT) AS n_chars,
           CAST(length(toks) AS INT) AS n_tokens,
           CAST(n_chars AS DOUBLE) / length(toks) AS mean_token_len,
           CAST(length(list_filter(toks, x -> list_contains({STOPWORDS!r}, x)))
                AS DOUBLE) / length(toks) AS stopword_ratio,
           CAST(length(regexp_extract_all(text, '[^a-zA-Z0-9 ]')) AS DOUBLE)
             / greatest(n_chars, 1) AS punct_ratio,
           CAST(length(text) BETWEEN 20 AND 10000 AS BOOLEAN) AS len_ok
    FROM t
    """


@register(
    "text_quality",
    sql=QUALITY_SQL,
    doc=(
        "Quality scoring: length, mean token length, stopword ratio, "
        "punctuation ratio, length gate — the C4/Gopher-style filter features."
    ),
)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = F.split("text", " ")
    stop_arr = F.array(*[F.lit(w) for w in STOPWORDS])
    return load(spark, sf_dir, "documents").select(
        "doc_id",
        F.length("text").cast("int").alias("n_chars"),
        F.size(toks).alias("n_tokens"),
        (F.length("text").cast("double") / F.size(toks)).alias("mean_token_len"),
        (
            F.size(F.filter(toks, lambda x: F.array_contains(stop_arr, x))).cast("double")
            / F.size(toks)
        ).alias("stopword_ratio"),
        (
            F.size(F.regexp_extract_all("text", F.lit("[^a-zA-Z0-9 ]"), F.lit(0))).cast(
                "double"
            )
            / F.greatest(F.length("text"), F.lit(1))
        ).alias("punct_ratio"),
        F.length("text").between(20, 10000).alias("len_ok"),
    )


def _lang_score_spark(lang: str):
    markers = F.array(*[F.lit(w) for w in LANG_MARKERS[lang]])
    return F.size(F.array_intersect(F.split("text", " "), markers))


def _lang_score_sql(lang: str) -> str:
    return (
        f"length(list_intersect(list_distinct(string_split(text, ' ')), "
        f"{LANG_MARKERS[lang]!r}))"
    )


LANGID_SQL = f"""
    WITH scored AS (
      SELECT doc_id, lang,
             {_lang_score_sql('en')} AS s_en,
             {_lang_score_sql('de')} AS s_de,
             {_lang_score_sql('es')} AS s_es,
             {_lang_score_sql('fr')} AS s_fr
      FROM documents
    )
    SELECT doc_id, lang AS label_lang,
           CASE
             WHEN s_en >= s_de AND s_en >= s_es AND s_en >= s_fr THEN 'en'
             WHEN s_de >= s_es AND s_de >= s_fr THEN 'de'
             WHEN s_es >= s_fr THEN 'es'
             ELSE 'fr'
           END AS pred_lang,
           CAST(greatest(s_en, s_de, s_es, s_fr) AS INT) AS score
    FROM scored
    """


@register(
    "text_langid",
    sql=LANGID_SQL,
    doc=(
        "Heuristic language ID: marker-token overlap per language, argmax "
        "with fixed tie order (en > de > es > fr)."
    ),
)
def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id",
        F.col("lang").alias("label_lang"),
        _lang_score_spark("en").alias("s_en"),
        _lang_score_spark("de").alias("s_de"),
        _lang_score_spark("es").alias("s_es"),
        _lang_score_spark("fr").alias("s_fr"),
    )
    pred = (
        F.when(
            (F.col("s_en") >= F.col("s_de"))
            & (F.col("s_en") >= F.col("s_es"))
            & (F.col("s_en") >= F.col("s_fr")),
            F.lit("en"),
        )
        .when((F.col("s_de") >= F.col("s_es")) & (F.col("s_de") >= F.col("s_fr")), F.lit("de"))
        .when(F.col("s_es") >= F.col("s_fr"), F.lit("es"))
        .otherwise(F.lit("fr"))
    )
    return scored.select(
        "doc_id",
        "label_lang",
        pred.alias("pred_lang"),
        F.greatest("s_en", "s_de", "s_es", "s_fr").cast("int").alias("score"),
    )


@register(
    "text_fingerprint",
    sql="""
    SELECT doc_id,
           md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' '))
             AS content_fp,
           md5(text) AS exact_fp
    FROM documents
    """,
    doc=(
        "Document fingerprinting: exact hash + an order/duplication-insensitive "
        "content hash (sorted distinct token stream) — the cheap first stage of "
        "corpus-level dedup."
    ),
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load(spark, sf_dir, "documents").select(
        "doc_id",
        F.md5(
            F.concat_ws(" ", F.sort_array(F.array_distinct(F.split("text", " "))))
        ).alias("content_fp"),
        F.md5("text").alias("exact_fp"),
    )


@register(
    "text_trigram_quality",
    sql="""
    WITH tri AS (
      SELECT doc_id, unnest(list_transform(
               generate_series(1, greatest(length(text) - 2, 1)),
               i -> substr(text, i, 3))) AS tg
      FROM documents
    ),
    model AS (SELECT tg, count(*) AS cnt FROM tri GROUP BY tg)
    SELECT t.doc_id,
           CAST(count(*) AS BIGINT) AS n_tri,
           CAST(sum(m.cnt) AS BIGINT) AS familiar_sum,
           CAST(sum(m.cnt) AS DOUBLE) / count(*) AS familiarity
    FROM tri t JOIN model m USING (tg)
    GROUP BY t.doc_id
    """,
    doc=(
        "Corpus-trained quality score: character-trigram familiarity — mean "
        "corpus frequency of the document's trigrams (gibberish scores low). "
        "Two-pass dataflow: global trigram model (one groupBy) joined back to "
        "per-doc trigram occurrences; all integer sums, so the oracle is "
        "value-exact (no log-prob float divergence)."
    ),
)
def text_trigram_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    tri = docs.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, greatest(length(text) - 2, 1)),"
                " i -> substring(text, i, 3))"
            )
        ).alias("tg"),
    )
    model = tri.groupBy("tg").agg(F.count(F.lit(1)).alias("cnt"))
    return (
        tri.join(model, "tg")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tri"),
            F.sum("cnt").alias("familiar_sum"),
            (F.sum("cnt").cast("double") / F.count(F.lit(1))).alias("familiarity"),
        )
    )


LM_SCALE = 1_000_000  # fixed-point scale for conditional trigram probabilities
LM_SMOOTH_K = 20  # add-K denominator smoothing (see doc: the sparse-LM trap)


@register(
    "text_lm_score",
    # Conditional trigram LM in exact integer fixed-point: per trigram
    # occurrence the contribution is floor(LM_SCALE * count(tg) /
    # (count(prefix2-as-trigram-start) + LM_SMOOTH_K)) — all-BIGINT
    # arithmetic, order-independent in both engines (the float log-prob
    # formulation would diverge on summation order). DuckDB sums BIGINT into
    # HUGEINT, hence the CASTs back.
    sql=f"""
    WITH tri AS (
      SELECT doc_id, unnest(list_transform(
               generate_series(1, greatest(length(text) - 2, 1)),
               i -> substr(text, i, 3))) AS tg
      FROM documents
    ),
    m3 AS (SELECT tg, CAST(count(*) AS BIGINT) AS c3 FROM tri GROUP BY tg),
    m2 AS (SELECT substr(tg, 1, 2) AS pf, CAST(sum(c3) AS BIGINT) AS c2
           FROM m3 GROUP BY pf)
    SELECT t.doc_id,
           CAST(count(*) AS BIGINT) AS n_tri,
           CAST(sum(({LM_SCALE} * m3.c3) // (m2.c2 + {LM_SMOOTH_K})) AS BIGINT) AS lm_score,
           CAST(CAST(sum(({LM_SCALE} * m3.c3) // (m2.c2 + {LM_SMOOTH_K})) AS BIGINT)
                // count(*) AS BIGINT) AS lm_mean
    FROM tri t
    JOIN m3 USING (tg)
    JOIN m2 ON substr(t.tg, 1, 2) = m2.pf
    GROUP BY t.doc_id
    """,
    doc=(
        "Corpus-trained conditional trigram LM score (the perplexity-style "
        "quality filter): per doc, the sum over its character-trigram "
        "occurrences of fixed-point P(c3 | c1c2) x 1M, where the model is "
        "trained on the corpus itself: count(trigram) / (count(2-char "
        f"prefix) + {LM_SMOOTH_K}). The add-K smoothing is load-bearing — "
        "unsmoothed, a trigram UNIQUE in the corpus has a unique prefix "
        "too, so P = 1/1 and gibberish scores PERFECT; smoothing damps "
        "low-support contexts so gibberish scores low (property-tested). "
        "Dataflow: two model aggregations over a bounded key space "
        "(|charset|^3, map-side combinable), joined back BROADCAST (the "
        "model tables are alphabet-bounded, never corpus-sized), then one "
        "per-doc aggregation whose groups are co-located by the explode — "
        "scan-speed at 100 TB, no corpus-sized shuffle. All-integer "
        "arithmetic keeps the oracle value-exact."
    ),
)
def text_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    tri = docs.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, greatest(length(text) - 2, 1)),"
                " i -> substring(text, i, 3))"
            )
        ).alias("tg"),
    )
    # Model tables are bounded by the trigram/bigram key space (|charset|^3),
    # NOT the corpus size — broadcast both so the trigram stream never
    # shuffles. tri is recomputed for the join branch (scan + explode is
    # cheaper than caching the exploded blow-up at scale; the model build
    # traffic is bounded by distinct-trigrams-per-partition map-side combine).
    m3 = tri.groupBy("tg").agg(F.count(F.lit(1)).alias("c3"))
    m2 = m3.groupBy(F.substring("tg", 1, 2).alias("pf")).agg(
        F.sum("c3").alias("c2")
    )
    return (
        tri.join(F.broadcast(m3), "tg")
        .withColumn("pf", F.substring("tg", 1, 2))
        .join(F.broadcast(m2), "pf")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tri"),
            F.sum(F.expr(f"({LM_SCALE} * c3) DIV (c2 + {LM_SMOOTH_K})")).alias("lm_score"),
        )
        .select(
            "doc_id",
            "n_tri",
            "lm_score",
            F.expr("lm_score DIV n_tri").alias("lm_mean"),
        )
    )


# ---------------------------------------------------------------------------
# Corpus sharding for training: deterministic split assignment + token-budget
# packing. Both are pure functions of md5(doc_id) — no RNG, no state, so a
# 100-TB corpus reshards identically on every run and on every engine.
# ---------------------------------------------------------------------------

PACK_CAPACITY = 4096  # token budget per training shard
# Scan fan-out for the distributed prefix sum: the first md5 byte. The bucket
# value is MONOTONE in the md5 hex key (a lexicographic prefix), so
# (bucket asc, key asc) equals the global key order — that is what lets
# per-bucket local scans compose into the exact global scan. This is the
# SCALE DIAL: each bucket sorts in one task, so widen the prefix as the
# corpus grows (2 hex chars → 256 buckets, 3 → 4096, 4 → 65536) — the
# driver-side offset scan stays bucket-count-bounded, never data-bounded.
PACK_BUCKETS = 256

SPLIT_TRAIN_PCT = 90  # 0..89 train
SPLIT_VAL_PCT = 95    # 90..94 val, 95..99 test

# The split bucket as a DuckDB expression over `documents` (reused by the
# text_contamination oracle so both keys pin the SAME split).
_SPLIT_BUCKET_SQL = "(" + " + ".join(
    f"(strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), {i + 1}, 1))"
    f" - 1) * {16 ** (3 - i)}"
    for i in range(4)
) + ") % 100"


def _split_bucket_col():
    """The split bucket as a Spark Column (mirrors _SPLIT_BUCKET_SQL)."""
    return (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10)
        .cast("bigint") % 100
    ).cast("int")


@register(
    "text_split",
    sql=f"""
    WITH t AS (
      SELECT doc_id, CAST({_SPLIT_BUCKET_SQL} AS INT) AS split_bucket
      FROM documents
    )
    SELECT doc_id, split_bucket,
           CASE WHEN split_bucket < {SPLIT_TRAIN_PCT} THEN 'train'
                WHEN split_bucket < {SPLIT_VAL_PCT} THEN 'val'
                ELSE 'test' END AS split
    FROM t
    """,
    doc=(
        "Deterministic train/val/test assignment: split_bucket = first two "
        f"md5(doc_id) bytes mod 100, thresholds {SPLIT_TRAIN_PCT}/"
        f"{SPLIT_VAL_PCT}/100. A pure per-row expression — no shuffle, no "
        "sampling state; adding documents never reassigns existing ones "
        "(the property random split lacks at 100 TB)."
    ),
)
def text_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    b = _split_bucket_col()
    return load(spark, sf_dir, "documents").select(
        "doc_id",
        b.alias("split_bucket"),
        F.when(b < SPLIT_TRAIN_PCT, F.lit("train"))
        .when(b < SPLIT_VAL_PCT, F.lit("val"))
        .otherwise(F.lit("test"))
        .alias("split"),
    )


@register(
    "text_pack",
    sql=f"""
    WITH t AS (
      SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS key,
             CAST(length(string_split(text, ' ')) AS INT) AS n_tokens
      FROM documents
    ), s AS (
      SELECT doc_id, n_tokens,
             CAST(coalesce(sum(n_tokens) OVER (
               ORDER BY key ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ), 0) AS BIGINT) AS prefix
      FROM t
    )
    SELECT doc_id, n_tokens,
           prefix // {PACK_CAPACITY} AS shard_id,
           prefix % {PACK_CAPACITY} AS shard_offset
    FROM s
    """,
    doc=(
        "Token-budget shard packing: documents in deterministic md5(doc_id) "
        "order, exclusive prefix sum of token counts, shard_id = prefix DIV "
        f"{PACK_CAPACITY}. Spark side is a TWO-PHASE DISTRIBUTED SCAN "
        f"(per-bucket local window over {PACK_BUCKETS} md5-prefix buckets + "
        "an exclusive scan of the bucket totals joined back) — the oracle is "
        "the textbook single ORDER BY window, so the value hash PROVES the "
        "distributed scan equals the sequential prefix sum."
    ),
)
def text_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pack documents into fixed-token-budget training shards.

    Scale notes: a single global `ORDER BY key` window funnels the whole
    corpus through ONE task — the classic sequential-scan trap. Instead the
    prefix sum is computed in two phases (Blelloch scan on DataFrames):

      1. local exclusive cumsum within each of the PACK_BUCKETS md5-prefix
         buckets — a window PARTITIONED by bucket, all buckets in parallel
         (plan-asserted: no unpartitioned window);
      2. one exclusive scan over the 256 bucket totals (driver-side — the
         collect is bounded by PACK_BUCKETS rows BY CONSTRUCTION, never by
         data volume) broadcast-joined back as each bucket's global offset.

    Documents may straddle a shard boundary (shard_offset + n_tokens >
    capacity): at training time the loader splits/continues the straddler —
    exact greedy repacking is inherently sequential and is precisely what a
    100-TB pipeline avoids.
    """
    from pyspark.sql import Window

    docs = load(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(F.split("text", " ")).alias("n_tokens"),
        F.md5(F.col("doc_id").cast("string")).alias("pack_key"),
    )
    docs = docs.withColumn(
        "pack_bucket",
        F.conv(F.substring("pack_key", 1, 2), 16, 10).cast("int"),
    )
    w = (
        Window.partitionBy("pack_bucket")
        .orderBy("pack_key")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # The tokenized cut feeds TWO consumers (the totals probe below and the
    # returned windowed plan) — persist at the reuse boundary or the corpus
    # is tokenized twice (no cross-branch CSE in Catalyst). The probe reads
    # the PRE-window cut so it never pays for the per-bucket sort.
    cut = docs.persist()
    docs = cut.withColumn(
        "local_prefix",
        F.coalesce(F.sum("n_tokens").over(w), F.lit(0)).cast("bigint"),
    )
    # ≤ PACK_BUCKETS rows by construction — the driver never sees doc rows.
    totals = cut.groupBy("pack_bucket").agg(
        F.sum("n_tokens").alias("bucket_total")
    ).collect()
    offsets, running = [], 0
    for r in sorted(totals, key=lambda r: r["pack_bucket"]):
        offsets.append((r["pack_bucket"], running))
        running += r["bucket_total"]
    if not offsets:  # empty corpus
        offsets = [(0, 0)]
    off_df = spark.createDataFrame(
        offsets, "pack_bucket int, bucket_offset bigint"
    )
    return (
        docs.join(F.broadcast(off_df), "pack_bucket")
        .withColumn("prefix", F.col("bucket_offset") + F.col("local_prefix"))
        .select(
            "doc_id",
            "n_tokens",
            F.expr(f"prefix DIV {PACK_CAPACITY}").alias("shard_id"),
            F.expr(f"prefix % {PACK_CAPACITY}").alias("shard_offset"),
        )
    )


# ---------------------------------------------------------------------------
# Repetition filtering + train/test decontamination.
# ---------------------------------------------------------------------------

CONTAM_K = 5  # token-shingle width for contamination matching

# text_repetition computes per-row distinct×length array expressions, i.e.
# O(len²) work per document. Without a cap a single multi-megabyte document
# becomes a straggler task doing ~10^10 element ops (VERDICT r03 #2) — the
# features are computed over the first REP_MAX_TOKENS tokens, bounding
# per-row work at REP_MAX_TOKENS² ≈ 10^6 element compares (~ms) regardless
# of document size. The cap is mirrored in the oracle SQL (DuckDB's 1-based
# inclusive slice l[1:N] == Spark's slice(l, 1, N); both return the whole
# list when shorter). Prefix-based repetition features are the standard
# bounded approximation (repetition is a global property; a 1k-token prefix
# is a high-recall witness for the pathological repetition being filtered).
REP_MAX_TOKENS = 1024


REPETITION_SQL = f"""
    WITH t AS (
      SELECT doc_id, (string_split(text, ' '))[1:{REP_MAX_TOKENS}] AS toks
      FROM documents
    ), b AS (
      SELECT doc_id, toks,
             list_transform(range(1, length(toks)),
                            i -> toks[i] || ' ' || toks[i + 1]) AS bigrams
      FROM t
    )
    SELECT doc_id,
           CAST(length(toks) AS INT) AS n_tokens,
           CAST(list_max(list_transform(list_distinct(toks),
                  t -> length(list_filter(toks, x -> x = t)))) AS DOUBLE)
             / length(toks) AS top_token_frac,
           CAST(length(bigrams) AS INT) AS n_bigrams,
           CAST(length(bigrams) - length(list_distinct(bigrams)) AS DOUBLE)
             / greatest(length(bigrams), 1) AS dup_bigram_frac,
           CAST(coalesce(list_max(list_transform(list_distinct(bigrams),
                  t -> length(list_filter(bigrams, x -> x = t)))), 0) AS DOUBLE)
             / greatest(length(bigrams), 1) AS max_bigram_frac
    FROM b
    """


@register(
    "text_repetition",
    sql=REPETITION_SQL,
    doc=(
        "Repetition features (the Gopher-style repetition filter): most-"
        "frequent-token fraction, duplicate-bigram fraction, most-frequent-"
        "bigram fraction over the first REP_MAX_TOKENS tokens. Pure per-row "
        "array expressions — per-row work ENFORCED ≤ REP_MAX_TOKENS² by the "
        "prefix slice (both engines), NO shuffle and no explode blow-up; at "
        "100 TB this runs at scan speed like the other text features."
    ),
)
def text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").select(
        "doc_id",
        F.slice(F.split("text", " "), 1, REP_MAX_TOKENS).alias("toks"),
    )
    # DuckDB list indexing is 1-based; Spark element_at matches it exactly.
    # NB sequence(1, 0) counts DOWN in Spark (DuckDB's range is empty) and
    # element_at then throws on index 0 — guard single-token documents.
    bigrams = F.expr(
        "if(size(toks) >= 2,"
        " transform(sequence(1, size(toks) - 1),"
        " i -> concat_ws(' ', element_at(toks, i), element_at(toks, i + 1))),"
        " array())"
    )
    max_freq = lambda arr: F.array_max(  # noqa: E731
        F.transform(
            F.array_distinct(arr),
            lambda t: F.size(F.filter(arr, lambda x: x == t)),
        )
    )
    return (
        docs.withColumn("bigrams", bigrams)
        .select(
            "doc_id",
            F.size("toks").alias("n_tokens"),
            (
                max_freq(F.col("toks")).cast("double") / F.size("toks")
            ).alias("top_token_frac"),
            F.size("bigrams").alias("n_bigrams"),
            (
                (F.size("bigrams") - F.size(F.array_distinct("bigrams"))).cast("double")
                / F.greatest(F.size("bigrams"), F.lit(1))
            ).alias("dup_bigram_frac"),
            (
                F.coalesce(max_freq(F.col("bigrams")), F.lit(0)).cast("double")
                / F.greatest(F.size("bigrams"), F.lit(1))
            ).alias("max_bigram_frac"),
        )
    )


@register(
    "text_contamination",
    sql=f"""
    WITH split AS (
      SELECT doc_id, text, {_SPLIT_BUCKET_SQL} AS b FROM documents
    ), sh AS (
      SELECT doc_id, b, unnest(list_distinct(
               list_transform(range(1, length(string_split(text, ' ')) - {CONTAM_K - 2}),
                 i -> array_to_string(string_split(text, ' ')[i : i + {CONTAM_K - 1}], ' '))
             )) AS shingle
      FROM split
    ), test_sh AS (
      SELECT DISTINCT shingle FROM sh WHERE b >= {SPLIT_VAL_PCT}
    ), hits AS (
      SELECT s.doc_id, count(*) AS shared_shingles
      FROM sh s JOIN test_sh t USING (shingle)
      WHERE s.b < {SPLIT_TRAIN_PCT}
      GROUP BY s.doc_id
    )
    SELECT d.doc_id,
           CAST(coalesce(h.shared_shingles, 0) AS BIGINT) AS shared_shingles,
           coalesce(h.shared_shingles, 0) > 0 AS contaminated
    FROM split d LEFT JOIN hits h USING (doc_id)
    WHERE d.b < {SPLIT_TRAIN_PCT}
    """,
    doc=(
        f"Train/test decontamination: a train document is contaminated when "
        f"it shares a {CONTAM_K}-token shingle with ANY test-split document "
        "(the split is text_split's own md5 bucket — the two keys pin the "
        "same assignment). Per-doc-distinct shingles bound the join input; "
        "the shingle equi-join shuffles ONLY the shingle stream (never "
        "document text), and neither side is assumed broadcastable — at "
        "100 TB the test corpus is itself large."
    ),
)
def text_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("toks"), _split_bucket_col().alias("b")
    )
    # DuckDB's list slice l[i : i+k-1] keeps elements i..i+k-1 INCLUSIVE
    # (1-based); Spark's slice(arr, i, k) takes k elements from position i —
    # the same window.
    sh = docs.select(
        "doc_id",
        "b",
        F.explode(
            F.array_distinct(
                # NB sequence(1, 0) counts DOWN in Spark (DuckDB's range is
                # empty) — guard docs shorter than the shingle width.
                F.expr(
                    f"if(size(toks) >= {CONTAM_K},"
                    f" transform(sequence(1, size(toks) - {CONTAM_K - 1}),"
                    f" i -> concat_ws(' ', slice(toks, i, {CONTAM_K}))),"
                    " array())"
                )
            )
        ).alias("shingle"),
    )
    test_sh = sh.where(F.col("b") >= SPLIT_VAL_PCT).select("shingle").distinct()
    train_sh = sh.where(F.col("b") < SPLIT_TRAIN_PCT)
    hits = (
        train_sh.join(test_sh, "shingle")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("shared_shingles"))
    )
    train_docs = docs.where(F.col("b") < SPLIT_TRAIN_PCT).select("doc_id")
    return train_docs.join(hits, "doc_id", "left").select(
        "doc_id",
        F.coalesce("shared_shingles", F.lit(0)).cast("bigint").alias("shared_shingles"),
        (F.coalesce("shared_shingles", F.lit(0)) > 0).alias("contaminated"),
    )
