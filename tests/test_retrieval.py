"""Semantics fixtures for the round-4 lexical-retrieval pane (TF-IDF,
integer BM25, format-preserving masking). The driver oracle hashes the same
operators value-exactly vs DuckDB; these pin the ORDERING properties the
hash can't explain (rare-term dominance, length normalization) and the
masking rule by eye."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kgforge.ops import curation, retrieval


@pytest.fixture(scope="module")
def lexical(spark, tmp_path_factory):
    """24 docs: 'aaaa' appears in every doc (max df, the BM25 query term);
    'rare' only in doc 0; doc 1 repeats 'aaaa' in a LONG doc, doc 2
    repeats it the same number of times in a SHORT doc."""
    root = tmp_path_factory.mktemp("lexical")
    docs = []
    for i in range(24):
        toks = ["aaaa", "common", "words", "here"]
        if i == 0:
            toks = ["rare", "aaaa", "common", "words", "here"]
        if i == 1:  # long doc, tf(aaaa)=3
            toks = ["aaaa"] * 3 + ["pad%03d" % j for j in range(40)]
        if i == 2:  # short doc, tf(aaaa)=3
            toks = ["aaaa"] * 3 + ["tail"]
        text = " ".join(toks)
        docs.append((i, text, "en", "src0", len(text)))
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(str(root / "documents.parquet"))
    return str(root)


def test_tfidf_rare_term_outranks_ubiquitous(spark, lexical):
    # In doc 0, 'rare' (df=1) must beat 'aaaa'/'common' (df≈all docs) even
    # at equal tf — the whole point of the idf factor.
    rows = (
        retrieval.text_tfidf(spark, lexical)
        .where(F.col("doc_id") == 0)
        .orderBy("rnk")
        .collect()
    )
    assert rows[0]["term"] == "rare"
    assert rows[0]["rnk"] == 1


def test_tfidf_topk_bound(spark, lexical):
    counts = (
        retrieval.text_tfidf(spark, lexical)
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n"), F.max("rnk").alias("mx"))
        .collect()
    )
    assert all(r["n"] <= retrieval.TFIDF_TOP_K for r in counts)
    assert all(r["mx"] <= retrieval.TFIDF_TOP_K for r in counts)


def test_bm25_length_normalization(spark, lexical):
    # Same tf(aaaa)=3 in docs 1 (43 tokens) and 2 (4 tokens): the short doc
    # must score strictly higher for the query term — the b-normalization.
    out = retrieval.sim_bm25(spark, lexical).where(F.col("term") == "aaaa")
    scores = {r["doc_id"]: r["score_x1e6"] for r in out.collect()}
    assert 2 in scores, "short doc missing from top-k"
    if 1 in scores:
        assert scores[2] > scores[1]
    rnk2 = out.where(F.col("doc_id") == 2).collect()[0]["rnk"]
    # tf=3 in a 4-token doc beats every tf=1 doc of the same length class
    assert rnk2 == 1


def test_bm25_query_is_top_df_terms(spark, lexical):
    got = {
        r["term"]
        for r in retrieval.sim_bm25(spark, lexical)
        .select("term")
        .distinct()
        .collect()
    }
    # 'aaaa' is in all 24 docs — it must be one of the QUERY_K query terms.
    assert "aaaa" in got
    assert len(got) <= retrieval.QUERY_K


def test_anonymize_masks_only_long_tokens(spark, tmp_path):
    # 'short' (5 chars) untouched; 8+-char tokens keep 2+2 and mask the
    # middle, whatever their length.
    df = spark.createDataFrame(
        [(0, "customer short a verylongword", "en", "s", 30)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    row = curation.text_anonymize(spark, str(tmp_path)).collect()[0]
    assert row["anon_text"] == "cu***er short a ve***rd"
    assert row["n_masked"] == 2
