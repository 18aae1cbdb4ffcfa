"""Salted repartition + hot-conversation splitting (BASELINE.json:
"salted repartition by conv_id with explicit skew splitting of hot
conversations"): results must be IDENTICAL to the unsalted path, and hot
conversations must actually spread across partitions."""

from __future__ import annotations

from pyspark.sql import functions as F

from kgforge import extract, link
from kgforge.skew import salted_repartition


def test_salting_preserves_rows_exactly(spark, spark_corpus):
    tr, _, _ = spark_corpus
    salted = salted_repartition(tr, 8, hot_threshold=200, target_rows=100)
    key = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    assert sorted(map(tuple, tr.select(*key).collect())) == sorted(
        map(tuple, salted.select(*key).collect())
    )


def test_hot_conversation_spreads_over_partitions(spark, spark_corpus):
    tr, _, _ = spark_corpus
    hot_id = (
        tr.groupBy("conv_id").count().orderBy(F.desc("count")).first()["conv_id"]
    )
    salted = salted_repartition(tr, 8, hot_threshold=200, target_rows=100)
    n_parts = (
        salted.where(F.col("conv_id") == hot_id)
        .select(F.spark_partition_id().alias("p"))
        .distinct()
        .count()
    )
    assert n_parts > 1, "hot conversation landed on a single partition"


def test_cold_conversations_stay_together(spark, spark_corpus):
    """salt=0 for non-hot convs → one partition per conversation (co-location
    preserved for downstream per-conversation work)."""
    tr, _, _ = spark_corpus
    cold = (
        tr.groupBy("conv_id").count().where(F.col("count") <= 50).limit(5).collect()
    )
    salted = salted_repartition(tr, 8, hot_threshold=200, target_rows=100)
    for r in cold:
        n = (
            salted.where(F.col("conv_id") == r["conv_id"])
            .select(F.spark_partition_id())
            .distinct()
            .count()
        )
        assert n == 1


def test_salted_pipeline_equals_unsalted(spark, spark_corpus):
    """End-to-end: extraction+linking over the salted layout must produce the
    same relation as over the raw layout (salting is physical, not logical)."""
    tr, d, _ = spark_corpus
    cols = ["conv_id", "turn_idx", "m_idx", "entity_id"]

    plain = link.link_mentions(extract.extract_mentions(tr, d), d)
    salted_in = salted_repartition(tr, 8, hot_threshold=200, target_rows=100)
    salted = link.link_mentions(extract.extract_mentions(salted_in, d), d)

    assert sorted(map(tuple, plain.select(*cols).collect())) == sorted(
        map(tuple, salted.select(*cols).collect())
    )


def test_freq_split_linking_equals_hash_split(spark, spark_corpus):
    """Frequency-based head/tail dictionary split (production path for
    skewed surface usage) must produce the identical linked relation as the
    hash split — both are disjoint ∪ exhaustive partitions on the key."""
    tr, d, _ = spark_corpus
    mentions = extract.extract_mentions(tr, d)
    cols = ["conv_id", "turn_idx", "m_idx", "surface", "entity_id", "curie", "prior"]
    a = sorted(map(tuple, link.link_mentions(mentions, d).select(*cols).collect()))
    b = sorted(map(tuple,
                   link.link_mentions(mentions, d, split="freq").select(*cols).collect()))
    assert a == b and len(a) > 0


def test_freq_split_head_covers_hot_surfaces(spark, spark_corpus):
    """With a Zipf-skewed corpus, the freq head must contain every hot
    surface (the ones carrying most mention mass)."""
    tr, d, _ = spark_corpus
    mentions = extract.extract_mentions(tr, d)
    head, tail = link.split_dictionary_freq(mentions, d, top_k=50)
    top = {r["surface"] for r in
           mentions.groupBy("surface").count().orderBy(F.desc("count"), "surface")
           .limit(10).collect()}
    head_surfaces = {r["surface"] for r in head.select("surface").collect()}
    assert top <= head_surfaces
    # disjoint + exhaustive
    n_head, n_tail, n_all = head.count(), tail.count(), d.count()
    assert n_head + n_tail == n_all
