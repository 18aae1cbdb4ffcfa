"""Late-round-3 operators (the round-4 roadmap items delivered early):
multi-probe LSH (`sim_lsh_multiprobe`) and the conditional trigram LM score
(`text_lm_score`). Each test pins a property the driver's value-hash compare
cannot see on its own (probe-superset recall, hand-computed LM arithmetic,
broadcast plan shape).
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from kgforge.ops import similarity, text


@pytest.fixture(scope="module")
def planted(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("planted_r4")
    rng = random.Random(5)
    words = [f"w{i:03d}" for i in range(400)]
    docs = []
    for i in range(60):
        toks = [words[rng.randrange(400)] for _ in range(30)]
        docs.append((i, " ".join(toks), "en", f"src{i % 3}", len(" ".join(toks))))
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


def test_multiprobe_finds_planted_copy(spark, planted):
    out = similarity.sim_lsh_multiprobe(spark, planted)
    top1 = {
        r["vec_id"]: r["nn_id"] for r in out.where(F.col("rank") == 1).collect()
    }
    # cos(v0, 1.5*v0) = 1 ⇒ every plane sign agrees ⇒ all bands (and hence
    # the zero-flip probe) collide — the copy MUST be query 0's rank-1.
    assert top1.get(0) == 9000


def test_multiprobe_rank1_never_below_plain_lsh(spark, planted):
    """Multi-probe candidates are a strict superset of the plain banded
    candidates for the query set, so the verified rank-1 cosine can only be
    >= plain LSH's for every query both return."""
    mp = {
        r["vec_id"]: r["cos"]
        for r in similarity.sim_lsh_multiprobe(spark, planted)
        .where(F.col("rank") == 1)
        .collect()
    }
    plain = {
        r["vec_id"]: r["cos"]
        for r in similarity.sim_lsh_cosine(spark, planted)
        .where((F.col("rank") == 1) & (F.col("vec_id") < similarity.N_QUERIES))
        .collect()
    }
    assert plain, "plain LSH returned no in-query-set rank-1 rows"
    for q, c in plain.items():
        assert q in mp, f"query {q} lost by multiprobe"
        assert mp[q] >= c - 1e-12, f"query {q}: multiprobe rank-1 below plain LSH"


def test_multiprobe_candidate_join_is_broadcast(spark, planted):
    """The probe side (bounded query set) must be broadcast; the corpus band
    keys must stream through a broadcast-hash equi-join — never a sort-merge
    (shuffle of the big side) and never a corpus-side broadcast."""
    plan = similarity.sim_lsh_multiprobe(spark, planted)._sc._jvm.PythonSQLUtils.explainString(
        similarity.sim_lsh_multiprobe(spark, planted)._jdf.queryExecution(), "formatted"
    )
    assert "BroadcastHashJoin" in plan


def test_lm_score_matches_hand_computation(spark, tmp_path):
    """Independent reimplementation of the conditional trigram LM in plain
    Python, compared value-for-value (the same role tests/oracle_ref.py plays
    for the pipeline P/R gate)."""
    docs = [(1, "abcab"), (2, "abab"), (3, "zzzz")]
    spark.createDataFrame(docs, "doc_id long, text string").write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "documents.parquet"))

    # hand model: trigram occurrences over all docs
    tris: dict[int, list[str]] = {}
    c3: dict[str, int] = {}
    for doc_id, t in docs:
        ts = [t[i : i + 3] for i in range(max(len(t) - 2, 1))]
        tris[doc_id] = ts
        for tg in ts:
            c3[tg] = c3.get(tg, 0) + 1
    c2: dict[str, int] = {}
    for tg, n in c3.items():
        c2[tg[:2]] = c2.get(tg[:2], 0) + n
    expect = {}
    for doc_id, ts in tris.items():
        score = sum(
            (text.LM_SCALE * c3[tg]) // (c2[tg[:2]] + text.LM_SMOOTH_K)
            for tg in ts
        )
        expect[doc_id] = (len(ts), score, score // len(ts))

    got = {
        r["doc_id"]: (r["n_tri"], r["lm_score"], r["lm_mean"])
        for r in text.text_lm_score(spark, str(tmp_path)).collect()
    }
    assert got == expect


def test_lm_score_gibberish_scores_below_repetitive(spark, tmp_path):
    """A doc of corpus-typical repeated trigrams must out-score a doc of
    unique gibberish trigrams — the property that makes this a quality
    filter."""
    docs = [(1, "the cat sat on the mat the cat sat"),
            (2, "the cat sat on the mat the dog sat"),
            (3, "qxv jzk wpf bqm lrt")]
    spark.createDataFrame(docs, "doc_id long, text string").write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "documents.parquet"))
    rows = {
        r["doc_id"]: r["lm_mean"]
        for r in text.text_lm_score(spark, str(tmp_path)).collect()
    }
    assert rows[1] > rows[3]
    assert rows[2] > rows[3]


# ---------------------------------------------------------------------------
# Corpus sharding: text_pack (distributed prefix sum) + text_split
# ---------------------------------------------------------------------------

SF_TINY = "/root/testdata/sf0.001"


def test_text_pack_equals_sequential_prefix_sum(spark):
    """Reconstructed prefix (shard_id * CAP + shard_offset) must be the exact
    exclusive running sum of token counts in global md5(doc_id) order — the
    property the two-phase scan exists to preserve."""
    import hashlib

    rows = text.text_pack(spark, SF_TINY).collect()  # 500 docs at sf0.001
    cap = text.PACK_CAPACITY
    by_key = sorted(rows, key=lambda r: hashlib.md5(str(r.doc_id).encode()).hexdigest())
    running = 0
    for r in by_key:
        prefix = r.shard_id * cap + r.shard_offset
        assert prefix == running, (r.doc_id, prefix, running)
        assert 0 <= r.shard_offset < cap
        running += r.n_tokens


def test_text_pack_has_no_unpartitioned_window(spark):
    """The scan must parallelize: every Window in the plan is partitioned by
    pack_bucket (a global ORDER BY window would funnel the corpus through one
    task)."""
    from tests.test_plans import _plan

    plan = _plan(text.text_pack(spark, SF_TINY))
    specs = [
        seg.split(")")[0]
        for seg in plan.split("windowspecdefinition(")[1:]
    ]
    assert specs, "expected a window in the text_pack plan"
    assert all("pack_bucket" in s for s in specs), specs


def test_text_split_fractions_stable(spark):
    df = text.text_split(spark, SF_TINY)
    counts = {r["split"]: r["n"] for r in df.groupBy("split").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    total = sum(counts.values())
    assert total == 500
    # md5 is uniform; 500 docs → binomial noise, keep loose bounds
    assert 0.80 <= counts.get("train", 0) / total <= 0.97
    assert counts.get("val", 0) > 0 and counts.get("test", 0) > 0
    # deterministic: a second run assigns identically
    again = {r["doc_id"]: r["split"] for r in text.text_split(spark, SF_TINY).collect()}
    first = {r["doc_id"]: r["split"] for r in df.collect()}
    assert first == again


def test_text_repetition_hand_fixture(spark, tmp_path):
    root = tmp_path / "rep"
    root.mkdir()
    spark.createDataFrame(
        [(1, "a a a b", "en", "s", 7), (2, "hello", "en", "s", 5)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(str(root / "documents.parquet"))
    by_id = {r.doc_id: r for r in text.text_repetition(spark, str(root)).collect()}
    r = by_id[1]
    assert r.n_tokens == 4
    assert r.top_token_frac == pytest.approx(3 / 4)
    # bigrams: "a a", "a a", "a b"
    assert r.n_bigrams == 3
    assert r.dup_bigram_frac == pytest.approx(1 / 3)
    assert r.max_bigram_frac == pytest.approx(2 / 3)
    # single-token doc: Spark sequence(1, 0) counts DOWN — must not throw,
    # must agree with DuckDB's empty range
    s = by_id[2]
    assert s.n_tokens == 1 and s.n_bigrams == 0
    assert s.top_token_frac == pytest.approx(1.0)
    assert s.dup_bigram_frac == 0.0 and s.max_bigram_frac == 0.0


def test_text_contamination_matches_pure_python(spark):
    """Independent reimplementation: recompute buckets, shingles, and shared
    counts in pure Python over the same parquet and compare exactly."""
    import hashlib

    import pyarrow.parquet as pq

    tbl = pq.read_table(SF_TINY + "/documents.parquet", columns=["doc_id", "text"])
    docs = list(zip(tbl.column("doc_id").to_pylist(), tbl.column("text").to_pylist()))
    K = text.CONTAM_K

    def bucket(doc_id):
        return int(hashlib.md5(str(doc_id).encode()).hexdigest()[:4], 16) % 100

    def shingles(t):
        toks = t.split(" ")
        return {" ".join(toks[i:i + K]) for i in range(len(toks) - K + 1)}

    test_sh = set()
    for d, t in docs:
        if bucket(d) >= text.SPLIT_VAL_PCT:
            test_sh |= shingles(t)
    expected = {
        d: len(shingles(t) & test_sh)
        for d, t in docs
        if bucket(d) < text.SPLIT_TRAIN_PCT
    }
    got = {
        r.doc_id: r.shared_shingles
        for r in text.text_contamination(spark, SF_TINY).collect()
    }
    assert got == expected
    assert any(v > 0 for v in expected.values())  # fixture actually exercises hits


def test_sharding_ops_on_empty_and_single_doc_corpus(spark, tmp_path):
    """Degenerate corpora must not throw: empty table, and one document
    (whose test split is empty, so contamination sees no test shingles).
    graph_kcore joins the loop per ADVICE r03: its K derivation used to
    raise TypeError on the NULL percentile of an empty edge set — now the
    empty histogram yields K=0 and an empty result, like the oracle.
    The round-4 conversation/temporal and embedding panes join too: they
    route the EMPTY corpus through the whole extract→link→canonicalize
    dataflow (driver union-find, walk indexing, as-of cutoff arithmetic),
    a path the text-op loop never reached. The kgfuse pane + kg_relprops
    join per ADVICE r04 — kg_negsample's empty-vocabulary path (entity
    count n=0 used as a modulus; Spark yields NULL, the index joins drop
    the row, result is empty rather than a throw) is exactly the class of
    edge this loop exists to catch. The round-5 pane joins at
    registration time (the lesson applied proactively): graph_khop sees
    an edge-free adjacency, pair_preference an empty response pool,
    kg_temporal_diff two empty snapshots, kg_typing an empty relation
    set, sample_stratified zero strata."""
    from kgforge.ops import convo, graph, kgembed, kgfuse, kginfer

    schema = "doc_id long, text string, lang string, source string, n_chars long"
    for rows in ([], [(1, "solo doc here", "en", "s", 13)]):
        root = tmp_path / f"c{len(rows)}"
        root.mkdir()
        spark.createDataFrame(rows, schema).write.parquet(
            str(root / "documents.parquet")
        )
        # graph_kcore reads the lineitem co-order graph — give it an edge-free
        # table so the K derivation sees an EMPTY degree histogram
        spark.createDataFrame(
            [], "l_orderkey long, l_partkey long"
        ).write.parquet(str(root / "lineitem.parquet"))
        for fn in (
            text.text_split,
            text.text_pack,
            text.text_repetition,
            text.text_contamination,
            graph.graph_kcore,
            convo.pair_sft,
            convo.conv_toolchain,
            convo.kg_asof,
            convo.dedup_spans,
            kgembed.graph_randwalk,
            kgembed.kg_predstats,
            kgembed.kg_mergestats,
            kgembed.kg_relprops,
            kgfuse.kg_fusion,
            kgfuse.kg_negsample,
            kgfuse.graph_clustercoef,
            kginfer.graph_khop,
            kginfer.kg_typing,
            kginfer.kg_temporal_diff,
            kginfer.sample_stratified,
            kginfer.pair_preference,
        ):
            fn(spark, str(root)).collect()


def test_repetition_cap_bounds_pathological_doc(spark, tmp_path):
    """VERDICT r03 #2: a multi-megabyte document must not make
    text_repetition quadratic in the FULL document length. The fixture
    plants one 50k-token doc next to normal ones; the cap must be active
    (features computed over exactly REP_MAX_TOKENS tokens) and the Spark
    output must still hash-match the DuckDB oracle — i.e. the cap is
    mirrored, not Spark-only."""
    import duckdb

    root = tmp_path / "longdoc"
    root.mkdir()
    # pathological: 50k tokens of a 7-token cycle (worst-case repetition)
    long_text = " ".join(f"t{i % 7}" for i in range(50_000))
    rows = [
        (1, "a normal short document with plain words", "en", "s", 41),
        (2, long_text, "en", "s", len(long_text)),
        (3, "x x x y", "en", "s", 7),
    ]
    schema = "doc_id long, text string, lang string, source string, n_chars long"
    spark.createDataFrame(rows, schema).write.parquet(
        str(root / "documents.parquet")
    )

    got = {r.doc_id: r.asDict() for r in text.text_repetition(spark, str(root)).collect()}
    # cap active: the long doc's features were computed over the prefix
    assert got[2]["n_tokens"] == text.REP_MAX_TOKENS
    assert got[2]["top_token_frac"] == pytest.approx(147 / 1024)  # ceil cycle share
    assert got[1]["n_tokens"] == 7

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM read_parquet("
        f"'{root}/documents.parquet/*.parquet')"  # Spark writes a directory
    )
    from kgforge.registry import all_ops

    want = con.execute(all_ops()["text_repetition"].sql).fetchdf()
    for _, w in want.iterrows():
        g = got[w["doc_id"]]
        for col in ("n_tokens", "n_bigrams"):
            assert g[col] == w[col], (w["doc_id"], col)
        for col in ("top_token_frac", "dup_bigram_frac", "max_bigram_frac"):
            assert g[col] == pytest.approx(w[col], abs=0), (w["doc_id"], col)


def test_est_links_per_doc_tracks_density_and_gates_two_level(
    spark, tmp_path, monkeypatch
):
    """VERDICT r03 #5: dedup-strategy sizing must follow the MEASURED link
    density, not the sf0.01-calibrated constant 44/doc. A corpus with ~10×
    the qualifying-token density must (a) estimate ~10× links/doc, (b) flip
    the two-level gate where the old constant would not, and (c) produce
    identical triples either way (the gate is perf-only)."""
    import random

    from kgforge import corpus, triples
    from kgforge.ops import pipeline_ops

    rng = random.Random(11)
    schema = "doc_id long, text string, lang string, source string, n_chars long"

    def mk(root, toks_per_doc):
        root.mkdir()
        rows = []
        for i in range(40):
            toks = [f"word{rng.randrange(300):04d}" for _ in range(toks_per_doc)]
            t = " ".join(toks)
            rows.append((i, t, "en", "s", len(t)))
        spark.createDataFrame(rows, schema).write.parquet(
            str(root / "documents.parquet")
        )

    sparse, dense = tmp_path / "sparse", tmp_path / "dense"
    mk(sparse, 44)
    mk(dense, 440)

    e_sparse = corpus.est_links_per_doc(str(sparse))
    e_dense = corpus.est_links_per_doc(str(dense))
    assert 35 <= e_sparse <= 50
    assert 8 * e_sparse <= e_dense <= 12 * e_sparse

    # gate: threshold between old-constant estimate (40*44=1760) and the
    # measured one (40*440=17600) — the constant would pick single-level,
    # the measurement must pick two-level
    monkeypatch.setattr(triples, "TWO_LEVEL_MIN_ROWS", 5000)
    captured = {}
    real_dedup = triples.dedup_triples

    def spy(df, two_level=True):
        captured["two_level"] = two_level
        return real_dedup(df, two_level=two_level)

    monkeypatch.setattr(triples, "dedup_triples", spy)
    got = pipeline_ops.pipe_triples(spark, str(dense)).collect()
    assert captured["two_level"] is True
    # perf-only: the single-level path yields the same triples
    want = real_dedup(
        __import__("kgforge.canon", fromlist=["remap_triples"]).remap_triples(
            triples.build_raw_triples(
                __import__("kgforge.link", fromlist=["link_mentions"]).link_mentions(
                    __import__(
                        "kgforge.extract", fromlist=["extract_mentions"]
                    ).extract_mentions(
                        corpus.derive_transcripts(spark, str(dense)),
                        corpus.derive_dictionary(spark, str(dense)),
                    ),
                    corpus.derive_dictionary(spark, str(dense)),
                )
            ),
            corpus.derive_canonical_map(spark, str(dense)),
        ),
        two_level=False,
    ).collect()
    key = lambda r: (r.subj, r.pred, r.obj, r.conv_id, r.turn_idx)  # noqa: E731
    assert sorted(got, key=key) == sorted(want, key=key)


def test_histogram_percentile_matches_engine_percentile(spark):
    """The driver-side quantile_cont interpolation over a histogram must be
    bit-identical to Spark's exact percentile() (and therefore to DuckDB's
    quantile_cont — the agg_quantile precedent) for every n and several
    skewed shapes, including n where (n-1)*pct is integral/fractional."""
    import math
    import random

    from kgforge.ops.graph import _histogram_percentile_floor

    rng = random.Random(7)
    for pct in (0.10, 0.25, 0.5, 0.9):
        for trial in range(12):
            n = rng.randrange(1, 40)
            vals = [rng.randrange(1, 8) for _ in range(n)]  # heavy ties
            hist: dict[int, int] = {}
            for v in vals:
                hist[v] = hist.get(v, 0) + 1
            got = _histogram_percentile_floor(list(hist.items()), pct)
            want = spark.createDataFrame(
                [(v,) for v in vals], "deg bigint"
            ).selectExpr(f"floor(percentile(deg, {pct})) AS k").collect()[0][0]
            assert got == int(want), (pct, vals, got, want)
    assert _histogram_percentile_floor([], 0.10) == 0


# ---------------------------------------------------------- curation ops
def test_text_normalize_hand_cases(spark, tmp_path):
    from kgforge.ops import curation

    rows = [
        (1, "Visit https://x.io/a?b=1 NOW!!  Really,   now.", "en", "s", 46),
        (2, "...", "en", "s", 3),                    # empty after normalize
        (3, "already clean lower text", "en", "s", 24),
    ]
    root = tmp_path / "norm"
    root.mkdir()
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(str(root / "documents.parquet"))
    got = {r.doc_id: r.asDict() for r in curation.text_normalize(spark, str(root)).collect()}
    assert got[1]["norm_text"] == "visit now really now"
    assert got[1]["norm_tokens"] == 4
    assert got[2]["norm_text"] == "" and got[2]["norm_tokens"] == 0
    assert got[3]["norm_text"] == "already clean lower text"
    assert got[3]["norm_chars"] == 24 and got[3]["raw_chars"] == 24


def test_sample_mixture_deterministic_and_stable_under_growth(spark, tmp_path):
    """Same selection on re-run; extending the corpus never reselects or
    drops previously-kept documents (the mixture-reproducibility property
    rand() sampling lacks); realized per-source rate tracks rate_pct."""
    from kgforge.ops import curation

    schema = "doc_id long, text string, lang string, source string, n_chars long"
    rows = [(i, f"doc {i}", "en", f"s{i % 3}", 5) for i in range(300)]
    small, big = tmp_path / "small", tmp_path / "big"
    for root, data in ((small, rows), (big, rows + [
        (i, f"doc {i}", "en", f"s{i % 3}", 5) for i in range(300, 600)
    ])):
        root.mkdir()
        spark.createDataFrame(data, schema).write.parquet(
            str(root / "documents.parquet")
        )
    kept_small = {r.doc_id for r in curation.sample_mixture(spark, str(small)).collect()}
    kept_small2 = {r.doc_id for r in curation.sample_mixture(spark, str(small)).collect()}
    kept_big = {r.doc_id for r in curation.sample_mixture(spark, str(big)).collect()}
    assert kept_small == kept_small2
    assert {d for d in kept_big if d < 300} == kept_small  # growth-stable
    out = curation.sample_mixture(spark, str(small)).collect()
    assert all(30 <= r.rate_pct <= 90 for r in out)
    by_src: dict[str, list] = {}
    for r in out:
        by_src.setdefault(r.source, []).append(r)
    for src, kept in by_src.items():
        rate = kept[0].rate_pct / 100
        assert abs(len(kept) / 100 - rate) < 0.15, (src, len(kept), rate)


def test_filter_gate_reason_priority_and_consistency(spark):
    """On the sf0.001 corpus: kept == (reason == 'kept'); every reason is
    one of the four codes; the gate agrees with the individually-computed
    feature ops (the composition is value-consistent with its inputs)."""
    from kgforge.ops import curation, text

    sf = "/root/testdata/sf0.001"
    got = {r.doc_id: r for r in curation.filter_gate(spark, sf).collect()}
    assert got and all(
        (r.reason == "kept") == r.kept for r in got.values()
    )
    assert {r.reason for r in got.values()} <= {
        "langid", "quality", "repetition", "kept"
    }
    assert any(r.reason == "repetition" for r in got.values())
    assert any(r.kept for r in got.values())
    rep = {r.doc_id: r.top_token_frac for r in text.text_repetition(spark, sf).collect()}
    lang = {r.doc_id: r.pred_lang for r in text.text_langid(spark, sf).collect()}
    for d, r in got.items():
        if lang[d] == "en" and r.reason == "repetition":
            assert rep[d] > curation.REP_MAX_TOP_TOKEN
        if lang[d] != "en":
            assert r.reason == "langid"


def test_win_funnel_matches_hand_computation(spark, tmp_path):
    """win_funnel over the derived transcripts must equal a pure-Python
    mirror of the corpus derivation arithmetic (conv = doc_id % n_convs,
    turn = doc_id // n_convs, role = [user, assistant, tool][doc_id % 3])."""
    from kgforge.ops import curation

    n = 100
    schema = "doc_id long, text string, lang string, source string, n_chars long"
    rows = [(i, f"tok{i:04d} word", "en", "s", 12) for i in range(n)]
    root = tmp_path / "funnel"
    root.mkdir()
    spark.createDataFrame(rows, schema).write.parquet(
        str(root / "documents.parquet")
    )
    n_convs = max(20, n // 8)
    roles = ["user", "assistant", "tool"]
    convs: dict[str, list[str]] = {}
    for i in range(n):
        cid = f"c{i % n_convs:06d}"
        convs.setdefault(cid, []).append((i // n_convs, roles[i % 3]))
    expected = {}
    for cid, turns in convs.items():
        seq = [r for _, r in sorted(turns)]
        user = sum(1 for r in seq if r == "user")
        hits = sum(
            1
            for i, r in enumerate(seq)
            if r == "user" and "tool" in seq[i + 1 : i + 3]
        )
        expected[cid] = (user, hits)
    got = {
        r.conv_id: (r.user_turns, r.funnel_hits)
        for r in curation.win_funnel(spark, str(root)).collect()
    }
    assert got == expected
    assert any(h > 0 for _, h in expected.values())
