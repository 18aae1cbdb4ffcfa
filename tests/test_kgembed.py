"""Hand-verified fixtures for the round-4 KG-embedding prep + schema
diagnostics pane (deterministic random walks, predicate co-occurrence,
ER merge rates). The driver oracle checks the same operators value-exactly
against DuckDB on the sf corpora; these pin the SEMANTICS on inputs small
enough to verify by hand."""

from __future__ import annotations

import hashlib

from pyspark.sql import Window
from pyspark.sql import functions as F

from kgforge.ops import kgembed


def _step(cur: str, t: int, neighbors: list[str]) -> str:
    """Python mirror of the walk step: md5(cur|t) first 8 nibbles mod deg."""
    h = int(hashlib.md5(f"{cur}|{t}".encode()).hexdigest()[:8], 16)
    return sorted(neighbors)[h % len(neighbors)]


def test_walk_paths_match_python_mirror(spark):
    # Triangle a-b-c plus pendant d-a: every node walks 3 steps.
    und = [("a", "b"), ("a", "c"), ("b", "c"), ("a", "d")]
    nbrs: dict[str, list[str]] = {}
    for x, y in und:
        nbrs.setdefault(x, []).append(y)
        nbrs.setdefault(y, []).append(x)
    adj = spark.createDataFrame(
        [(x, y) for x, y in und] + [(y, x) for x, y in und],
        "u string, v string",
    )
    got = {r["start"]: (r["path"], r["end_node"])
           for r in kgembed.walk_paths(adj).collect()}
    assert set(got) == {"a", "b", "c", "d"}
    for start in got:
        cur, path = start, start
        for t in (1, 2, 3):
            cur = _step(cur, t, nbrs[cur])
            path += ">" + cur
        assert got[start] == (path, cur), f"walk from {start} diverged"


def test_walk_is_deterministic_across_partitionings(spark):
    und = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a")]
    rows = [(x, y) for x, y in und] + [(y, x) for x, y in und]
    one = kgembed.walk_paths(
        spark.createDataFrame(rows, "u string, v string").coalesce(1)
    ).collect()
    many = kgembed.walk_paths(
        spark.createDataFrame(rows, "u string, v string").repartition(7)
    ).collect()
    assert sorted(map(tuple, one)) == sorted(map(tuple, many))


def test_pred_cooccurrence_counts_subjects_once(spark):
    tri = spark.createDataFrame(
        [
            # s1 asserts p and q (twice each — distinct collapses)
            ("s1", "p", "x"), ("s1", "p", "y"),
            ("s1", "q", "x"), ("s1", "q", "z"),
            # s2 asserts p only
            ("s2", "p", "x"),
            # s3 asserts p, q, r -> pairs (p,q), (p,r), (q,r)
            ("s3", "p", "x"), ("s3", "q", "x"), ("s3", "r", "x"),
        ],
        "subj string, pred string, obj string",
    )
    got = {
        (r["pred_a"], r["pred_b"]): r["n_subjects"]
        for r in kgembed.pred_cooccurrence(tri).collect()
    }
    assert got == {("p", "q"): 2, ("p", "r"): 1, ("q", "r"): 1}


def test_merge_stats_rates_per_prefix(spark):
    d = spark.createDataFrame(
        [
            ("wind", "E_wind"), ("windy", "E_windy"), ("window", "E_window"),
            ("sort", "E_sort"),
        ],
        "surface string, entity_id string",
    )
    cmap = spark.createDataFrame(
        [
            ("E_wind", "E_wind"), ("E_windy", "E_wind"),
            ("E_window", "E_wind"), ("E_sort", "E_sort"),
        ],
        "entity_id string, canonical_id string",
    )
    got = {
        r["prefix"]: (r["n_entities"], r["n_merged"])
        for r in kgembed.merge_stats(d, cmap).collect()
    }
    assert got == {"wind": (3, 2), "sort": (1, 0)}


def _tree(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    ).split("\n\n")[0]


def test_walk_plan_has_no_window_or_global_sort_after_index(spark):
    """The neighbor index is cut with localCheckpoint (lineage rule — six
    join branches re-embed the upstream subtree otherwise), so the WALK
    plan itself must be pure joins over checkpointed leaves: no Window, no
    global Sort, no cartesian."""
    adj = spark.createDataFrame(
        [("a", "b"), ("b", "a")], "u string, v string"
    )
    tree = _tree(kgembed.walk_paths(adj))
    assert "Window" not in tree
    assert "Cartesian" not in tree and "BroadcastNestedLoop" not in tree
    # the index itself IS windowed, partitioned by u (never global)
    idx = adj.select(
        "u",
        "v",
        (F.row_number().over(Window.partitionBy("u").orderBy("v")) - 1).alias(
            "rnk"
        ),
    )
    full = idx._sc._jvm.PythonSQLUtils.explainString(
        idx._jdf.queryExecution(), "formatted"
    )
    assert "windowspecdefinition(u#" in full  # partition spec present
    assert "SinglePartition" not in full  # never a global window


def test_relation_properties_symmetry_and_inverse(spark):
    tri = spark.createDataFrame(
        [
            # p is symmetric on (a,b): both directions present
            ("a", "p", "b"), ("b", "p", "a"),
            # q(c,d) has inverse r(d,c)
            ("c", "q", "d"), ("d", "r", "c"),
            # unreciprocated edge contributes nothing
            ("e", "p", "f"),
            # resolved_as is excluded even when reversed
            ("x", "resolved_as", "y"), ("y", "resolved_as", "x"),
            # duplicate assertions collapse before counting
            ("a", "p", "b"),
        ],
        "subj string, pred string, obj string",
    )
    got = {
        (r["pred_a"], r["pred_b"]): r["n_reversed"]
        for r in kgembed.relation_properties(tri).collect()
    }
    # diagonal (p,p) counts both directions; (q,r) and (r,q) mirror
    assert got == {("p", "p"): 2, ("q", "r"): 1, ("r", "q"): 1}
