"""Functional gates for the dedup / similarity family: plant known
duplicates and near-duplicates in a synthetic documents/embeddings pair and
assert each operator finds exactly them (the DuckDB oracle checks
cross-engine agreement; these check the operators catch what they claim)."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from kgforge.ops import similarity, text


@pytest.fixture(scope="module")
def planted(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("planted")
    rng = random.Random(5)
    words = [f"w{i:03d}" for i in range(400)]
    docs = []
    for i in range(60):
        toks = [words[rng.randrange(400)] for _ in range(30)]
        docs.append((i, " ".join(toks), "en", f"src{i % 3}", len(" ".join(toks))))
    base = docs[0][1]
    near = base.rsplit(" ", 1)[0] + " zzz"  # one-token edit of doc 0
    docs.append((9000, base, "en", "src0", len(base)))      # exact dup of 0
    docs.append((9001, near, "en", "src0", len(near)))      # near dup of 0
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(str(root / "documents.parquet"))

    embs = []
    for i in range(40):
        v = [rng.uniform(-1, 1) for _ in range(16)]
        embs.append((i, v, i % 4))
    embs.append((9000, [x * 1.5 for x in embs[0][1]], 0))  # cosine ≈ 1 with vec 0
    spark.createDataFrame(
        embs, "vec_id long, embedding array<float>, label int"
    ).write.mode("overwrite").parquet(str(root / "embeddings.parquet"))
    return str(root)


def test_dedup_exact_finds_planted_dup(spark, planted):
    rows = similarity.dedup_exact(spark, planted).collect()
    assert {(r["doc_id"], r["canonical_id"]) for r in rows} == {(9000, 0)}


def test_dedup_minhash_finds_near_dup(spark, planted):
    pairs = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in similarity.dedup_minhash(spark, planted).collect()
    }
    assert (0, 9000) in pairs and pairs[(0, 9000)] == 1.0  # exact dup
    assert (0, 9001) in pairs and pairs[(0, 9001)] > 0.8  # one-token edit
    assert (9000, 9001) in pairs


def test_dedup_simhash_near_dup_has_small_hamming(spark, planted):
    pairs = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in similarity.dedup_simhash(spark, planted).collect()
    }
    assert pairs[(0, 9000)] == 0  # identical token set → identical signature


def test_dedup_embed_cosine_nearest_is_scaled_copy(spark, planted):
    rows = {r["vec_id"]: (r["nn_id"], r["cos"]) for r in
            similarity.dedup_embed_cosine(spark, planted).collect()}
    nn, cos = rows[0]
    assert nn == 9000 and cos > 0.999
    nn, cos = rows[9000]
    assert nn == 0 and cos > 0.999


def test_sim_topk_rank1_is_scaled_copy(spark, planted):
    rows = similarity.sim_topk_cosine(spark, planted).collect()
    rank1 = {r["vec_id"]: r["nn_id"] for r in rows if r["rank"] == 1}
    assert rank1[0] == 9000


def test_sim_lsh_finds_planted_copy(spark, planted):
    # positive scaling preserves all plane signs → same band buckets →
    # candidate pair → rank-1 by exact cosine
    rows = similarity.sim_lsh_cosine(spark, planted).collect()
    rank1 = {r["vec_id"]: r["nn_id"] for r in rows if r["rank"] == 1}
    assert rank1[0] == 9000 and rank1[9000] == 0


def test_sim_lsh_plan_has_no_bucket_window(spark, planted):
    """Round-1 scale-killer: bucket_size via count() OVER (PARTITION BY
    bucket) put every fixed-cardinality bucket on one task. The op must not
    contain any Window partitioned by a bucket/band column — candidates come
    from a band-key join; the only window partitions by vec_id."""
    df = similarity.sim_lsh_cosine(spark, planted)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    for line in plan.splitlines():
        if "windowspecdefinition" in line.lower():
            assert "bucket" not in line.lower() and "nib" not in line.lower()


def test_jaccard_prefix_candidates_linear_on_giant_block(spark):
    """One giant coarse block (round-1 blocking key would emit C(n,2) pairs):
    n docs, identical source and token count, mostly-unique vocab. Prefix
    filtering must keep candidates ~linear in n."""
    rng = random.Random(99)
    n = 200
    docs = []
    for i in range(n):
        toks = [f"u{i:04d}_{j:02d}" if rng.random() < 0.9 else f"shared{j:02d}"
                for j in range(30)]
        docs.append((i, " ".join(toks)))
    d = spark.createDataFrame(docs, "doc_id long, text string").select(
        "doc_id", similarity._shingles(F.col("text")).alias("sh")
    )
    n_cand = similarity.jaccard_prefix_candidates(d).count()
    quadratic = n * (n - 1) / 2
    assert n_cand <= 5 * n, f"{n_cand} candidates vs quadratic {quadratic}"


def test_embed_banded_candidates_bounded_on_giant_label(spark):
    """One giant label block (round-2 blocking emitted all C(n,2) same-label
    pairs — linear-growth blocks, quadratic work at 100×). Banded candidates
    must (a) cut far below all-pairs at fixed band bits and (b) hold
    candidates/vector roughly constant when the corpus doubles and band_bits
    grows by 1 — the documented occupancy-scaling rule."""
    import numpy as np

    rng = np.random.default_rng(7)

    def sig_df(n):
        emb = [(int(i), [float(x) for x in rng.uniform(-1, 1, 16)], 0)
               for i in range(n)]
        df = spark.createDataFrame(
            emb, "vec_id long, embedding array<float>, label int"
        ).select("vec_id", "label", similarity._quant(F.col("embedding")).alias("qv"))
        return df.select(
            "vec_id", "label", similarity._bucket_udf()("qv").alias("bucket")
        )

    n = 400
    small = similarity.banded_candidates(
        sig_df(n), bands=4, band_bits=6, block_cols=("label",)
    ).count()
    big = similarity.banded_candidates(
        sig_df(2 * n), bands=4, band_bits=7, block_cols=("label",)
    ).count()
    assert small < 0.2 * n * (n - 1), (small, n * (n - 1))  # far below all-pairs
    # doubling n with +1 band bit keeps candidate volume ~2×, not 4×
    assert big <= 3.0 * small, (small, big)


def test_dedup_embed_cosine_matches_symbolic_oracle_semantics(spark, planted):
    """The banded near-dup must emit rank-1 per vector among (label, band)
    candidates — spot-check candidate symmetry: if (a→b) is emitted with
    cos c, then b had a as a candidate too (band sharing is symmetric)."""
    rows = similarity.dedup_embed_cosine(spark, planted).collect()
    emitted = {(r["vec_id"], r["nn_id"]) for r in rows}
    assert all(v != n for v, n in emitted)
    assert len({r["vec_id"] for r in rows}) == len(rows)  # rank-1: one row per vec


def test_text_fingerprint_exact_vs_content(spark, planted):
    rows = {r["doc_id"]: (r["exact_fp"], r["content_fp"]) for r in
            text.text_fingerprint(spark, planted).collect()}
    assert rows[0][0] == rows[9000][0]  # exact dup → same exact fp
    assert rows[0][1] != rows[9001][1]  # edit changes content fp
    assert rows[0][0] != rows[9001][0]


def test_text_quality_features_sane(spark, planted):
    rows = text.text_quality(spark, planted).collect()
    for r in rows:
        assert r["n_tokens"] > 0
        assert 0.0 <= r["stopword_ratio"] <= 1.0
        assert 0.0 <= r["punct_ratio"] <= 1.0


def test_sim_ivf_recall_vs_brute_force(spark):
    """IVF probe-then-verify must recover a solid fraction of the true
    top-5 neighbors (brute force = ground truth) on the driver embeddings."""
    sf = "/root/testdata/sf0.001"
    truth = {
        (r["vec_id"], r["nn_id"])
        for r in similarity.sim_topk_cosine(spark, sf).collect()
    }
    approx = {
        (r["vec_id"], r["nn_id"])
        for r in similarity.sim_ivf_cosine(spark, sf).collect()
    }
    recall = len(truth & approx) / len(truth)
    assert recall >= 0.3, recall  # random uniform vectors: cells split hard


def test_sim_ivf_finds_planted_copy(spark, planted):
    rows = similarity.sim_ivf_cosine(spark, planted).collect()
    rank1 = {r["vec_id"]: r["nn_id"] for r in rows if r["rank"] == 1}
    # the scaled copy points the same direction → same cell → found exactly
    assert rank1.get(0) == 9000


def test_agg_approx_within_tolerance(spark):
    """approx_count_distinct (HLL) must land within 5% of the exact count —
    the metric-path cardinality estimator (SURVEY §2.B agg pane)."""
    from pyspark.sql import functions as F

    from kgforge.tables import load

    ev = load(spark, "/root/testdata/sf0.001", "events")
    exact = ev.select(F.countDistinct("user_id")).first()[0]
    approx = ev.select(F.approx_count_distinct("user_id")).first()[0]
    assert abs(approx - exact) / exact < 0.05, (approx, exact)
