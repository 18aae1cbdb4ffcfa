"""Hand-verified fixtures for the round-4 KG read-side operators
(integrity audit, 2-hop BGP path counts, weighted Bellman-Ford SSSP,
ER cluster-size histogram). The driver oracle checks the same operators
value-exactly against DuckDB on the sf corpora; these pin the SEMANTICS on
inputs small enough to verify by eye."""

from __future__ import annotations

from pyspark.sql import functions as F

from kgforge.ops import kgquery

SF_TINY = "/root/testdata/sf0.001"


def test_validate_triples_all_checks(spark):
    # resolved_as: e1 carries TWO curies (functional violation, n=2);
    # e2 carries one (clean). Relations: e1->e1 self-loop twice under two
    # preds (two self_loop rows, n=1 each); e3 is an object that never
    # appears as a relation subject (sink), e1/e2 do (not sinks).
    tri = spark.createDataFrame(
        [
            ("e1", "resolved_as", "TOK:a"),
            ("e1", "resolved_as", "TOK:b"),
            ("e2", "resolved_as", "TOK:c"),
            ("e1", "co_occurs", "e1"),
            ("e1", "mentions_with", "e1"),
            ("e1", "co_occurs", "e2"),
            ("e2", "co_occurs", "e3"),
        ],
        "subj string, pred string, obj string",
    )
    rows = kgquery.validate_triples(tri).collect()
    got = {(r["check_name"], r["node_id"], r["pred"]): r["n"] for r in rows}
    assert got == {
        ("functional_violation", "e1", "resolved_as"): 2,
        ("self_loop", "e1", "co_occurs"): 1,
        ("self_loop", "e1", "mentions_with"): 1,
        ("sink_entity", "e3", ""): 1,
    }


def test_path2_counts_square_with_return_edge(spark):
    # a->b, b->c, c->d, a->c, c->a: 2-hop paths are a-b-c, b-c-d, a-c-d,
    # b-c-a; c-a-b; c-a-c and a-c-a are excluded (src == dst).
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("a", "c"), ("c", "a")],
        "src string, dst string",
    )
    got = {
        (r["src"], r["dst"]): r["n_paths"]
        for r in kgquery.path2_counts(edges).collect()
    }
    assert got == {
        ("a", "c"): 1,  # a-b-c
        ("b", "d"): 1,  # b-c-d
        ("a", "d"): 1,  # a-c-d
        ("b", "a"): 1,  # b-c-a
        ("c", "b"): 1,  # c-a-b
    }


def test_sssp_prefers_cheap_long_path(spark):
    # n0 -10-> n2 direct, but n0 -1-> n1 -1-> n2 is cheaper in two hops:
    # Bellman-Ford must return 2, and BFS hop count would say 1 — this is
    # exactly what distinguishes graph_sssp from graph_bfs.
    adj = spark.createDataFrame(
        [
            ("n0", "n2", 10), ("n2", "n0", 10),
            ("n0", "n1", 1), ("n1", "n0", 1),
            ("n1", "n2", 1), ("n2", "n1", 1),
        ],
        "u string, v string, w long",
    )
    seeds = spark.createDataFrame([("n0",)], "node string")
    got = {
        r["node_id"]: r["dist"]
        for r in kgquery.sssp_distances(adj, seeds).collect()
    }
    assert got == {"n0": 0, "n1": 1, "n2": 2}


def test_sssp_iteration_bound(spark):
    # Weighted path n0-..-n5 (w=1 each): iters=4 reaches n4 but not n5,
    # and multi-seed min works (seed at n5 covers the far end).
    adj = spark.createDataFrame(
        [(f"n{i}", f"n{i + 1}", 1) for i in range(5)]
        + [(f"n{i + 1}", f"n{i}", 1) for i in range(5)],
        "u string, v string, w long",
    )
    one = spark.createDataFrame([("n0",)], "node string")
    got = {
        r["node_id"]: r["dist"]
        for r in kgquery.sssp_distances(adj, one, iters=4).collect()
    }
    assert got == {"n0": 0, "n1": 1, "n2": 2, "n3": 3, "n4": 4}
    both = spark.createDataFrame([("n0",), ("n5",)], "node string")
    got2 = {
        r["node_id"]: r["dist"]
        for r in kgquery.sssp_distances(adj, both, iters=4).collect()
    }
    assert got2 == {"n0": 0, "n1": 1, "n2": 2, "n3": 2, "n4": 1, "n5": 0}


def test_comp_sizes_accounts_every_entity(spark):
    """Histogram mass check at sf0.001: sum(comp_size * n_components) must
    equal the dictionary's entity count — every entity is in exactly one
    component (the value-exactness itself is the driver/DuckDB hash)."""
    from kgforge import corpus

    sizes = kgquery.graph_comp_sizes(spark, SF_TINY)
    total = sizes.select(
        F.sum(F.col("comp_size") * F.col("n_components")).alias("s")
    ).collect()[0]["s"]
    n_entities = corpus.derive_dictionary(spark, SF_TINY).count()
    assert total == n_entities


def test_kg_validate_fires_on_corpus(spark):
    """An audit that can't fire on real data tests nothing: at sf0.001 the
    corpus has repeated adjacent tokens, so self_loop MUST fire (the tiny
    vocabulary happens to have no 4-char-prefix collisions, so the
    canonical map is the identity there and functional_violation stays
    empty — its semantics are pinned by the hand fixture above)."""
    checks = {
        r["check_name"]
        for r in kgquery.kg_validate(spark, SF_TINY).collect()
    }
    assert "self_loop" in checks
    assert checks <= {"functional_violation", "self_loop", "sink_entity"}
