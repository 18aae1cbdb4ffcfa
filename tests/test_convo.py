"""Hand-verified fixtures for the round-4 conversation training-data +
temporal-KG pane (SFT pair mining, tool-chain assembly, as-of snapshots,
span-level dedup). The driver oracle checks the same operators value-exactly
against DuckDB on the sf corpora; these pin the SEMANTICS on inputs small
enough to verify by eye, plus the plan shapes the 100-TB design depends on."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from kgforge.ops import convo


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


_TR_SCHEMA = "conv_id string, turn_idx int, role string, tool string, text string"


def test_sft_pairs_direct_and_tool_mediated(spark):
    tr = spark.createDataFrame(
        [
            # c1: user->assistant (direct pair); then user->user (no pair:
            # an intervening user turn is a new prompt)
            ("c1", 0, "user", "none", "hello there"),
            ("c1", 1, "assistant", "none", "hi how can I help"),
            ("c1", 2, "user", "none", "thanks"),
            ("c1", 3, "user", "none", "bye"),
            # c2: user->tool->assistant (tool-mediated pair)
            ("c2", 0, "user", "none", "run it"),
            ("c2", 1, "tool", "code", "exit 0"),
            ("c2", 2, "assistant", "none", "done it ran clean"),
            # c3: user->tool->tool (no assistant within lookahead)
            ("c3", 0, "user", "none", "q"),
            ("c3", 1, "tool", "search", "r"),
            ("c3", 2, "tool", "sql", "r2"),
            # c4: the user turn at the conversation END has no successor
            ("c4", 0, "user", "none", "alone"),
        ],
        _TR_SCHEMA,
    )
    rows = {r["conv_id"]: r for r in convo.sft_pairs(tr).collect()}
    assert set(rows) == {"c1", "c2"}
    r = rows["c1"]
    assert r["turn_idx"] == 0
    assert r["prompt_hash"] == _md5("hello there")
    assert r["response_hash"] == _md5("hi how can I help")
    assert (r["prompt_tokens"], r["response_tokens"]) == (2, 5)
    r2 = rows["c2"]
    assert r2["response_hash"] == _md5("done it ran clean")
    assert (r2["prompt_tokens"], r2["response_tokens"]) == (2, 4)


def test_sft_pairs_cross_conversation_boundary_never_pairs(spark):
    # last turn of c1 is user, first of c2 is assistant — NOT a pair
    tr = spark.createDataFrame(
        [
            ("c1", 0, "user", "none", "a"),
            ("c2", 0, "assistant", "none", "b"),
        ],
        _TR_SCHEMA,
    )
    assert convo.sft_pairs(tr).count() == 0


def test_toolchain_order_is_turn_order_not_arrival_order(spark):
    # feed turns deliberately out of order; chain must follow turn_idx
    tr = spark.createDataFrame(
        [
            ("c1", 8, "tool", "sql", "x"),
            ("c1", 2, "tool", "search", "x"),
            ("c1", 5, "tool", "code", "x"),
            ("c1", 3, "user", "none", "x"),
            ("c2", 1, "tool", "browser", "x"),
        ],
        _TR_SCHEMA,
    ).repartition(7)
    got = {r["conv_id"]: (r["n_calls"], r["chain"]) for r in
           convo.toolchains(tr).collect()}
    assert got == {"c1": (3, "search>code>sql"), "c2": (1, "browser")}


_REM_SCHEMA = (
    "subj string, pred string, obj string, conv_id string, turn_idx int,"
    " m_idx int"
)


def test_asof_latest_wins_and_cutoff_excludes(spark):
    # n_convs=20: doc_seq = turn_idx*20 + int(conv_id[1:])
    rem = spark.createDataFrame(
        [
            ("s", "p", "old", "c000001", 0, 0),   # seq 1
            ("s", "p", "new", "c000003", 1, 0),   # seq 23  <- latest in cut
            ("s", "p", "late", "c000005", 3, 0),  # seq 65: past cutoff 50
            ("t", "p", "only", "c000002", 2, 4),  # seq 42
        ],
        _REM_SCHEMA,
    )
    got = {
        (r["subj"], r["pred"]): (r["obj"], r["asof_seq"])
        for r in convo.asof_triples(rem, n_convs=20, cutoff=50).collect()
    }
    assert got == {("s", "p"): ("new", 23), ("t", "p"): ("only", 42)}


def test_asof_tie_breaks_match_oracle_order(spark):
    # same doc_seq: higher m_idx wins; same m_idx: max(obj) wins (the
    # oracle's ORDER BY doc_seq DESC, m_idx DESC, obj DESC)
    rem = spark.createDataFrame(
        [
            ("s", "p", "a", "c000001", 0, 1),
            ("s", "p", "z", "c000001", 0, 0),
            ("t", "p", "a", "c000001", 0, 0),
            ("t", "p", "b", "c000001", 0, 0),
        ],
        _REM_SCHEMA,
    )
    got = {
        (r["subj"], r["pred"]): r["obj"]
        for r in convo.asof_triples(rem, n_convs=20, cutoff=10).collect()
    }
    assert got == {("s", "p"): "a", ("t", "p"): "b"}


def test_span_dedup_first_occurrence_wins(spark):
    # SPAN_TOKENS=8. doc 0: spans A,B. doc 1: spans A (dup), C.
    # doc 2: one ragged 3-token span, unique.
    a = "a1 a2 a3 a4 a5 a6 a7 a8"
    b = "b1 b2 b3 b4 b5 b6 b7 b8"
    c = "c1 c2 c3 c4 c5 c6 c7 c8"
    docs = spark.createDataFrame(
        [
            (0, a + " " + b),
            (1, a + " " + c),
            (2, "r1 r2 r3"),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_spans"], r["dup_spans"], r["dup_pct"])
        for r in convo.span_dedup(docs).collect()
    }
    assert got == {0: (2, 0, 0), 1: (2, 1, 50), 2: (1, 0, 0)}


def test_span_dedup_within_doc_repeat_counts_as_dup(spark):
    a = "a1 a2 a3 a4 a5 a6 a7 a8"
    docs = spark.createDataFrame(
        [(0, a + " " + a + " " + a)], "doc_id long, text string"
    )
    [r] = convo.span_dedup(docs).collect()
    assert (r["n_spans"], r["dup_spans"], r["dup_pct"]) == (3, 2, 66)


def _tree(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    ).split("\n\n")[0]


def test_asof_is_aggregate_pair_no_window(spark):
    """Latest-wins must be the string-encoded MAX aggregate (map-side
    combining) — a window sort over whole partitions would melt at 1e12
    turns."""
    rem = spark.createDataFrame(
        [("s", "p", "o", "c000001", 0, 0)], _REM_SCHEMA
    )
    tree = _tree(convo.asof_triples(rem, n_convs=20, cutoff=10))
    assert "Window" not in tree
    # partial+final SortAggregate around one Exchange (min/max over a
    # var-length string buffer claims SortAggregate — CLAUDE.md rule)
    assert tree.count("SortAggregate") >= 2


def test_sft_pairs_single_exchange(spark):
    tr = spark.createDataFrame(
        [("c1", 0, "user", "none", "a"), ("c1", 1, "assistant", "none", "b")],
        _TR_SCHEMA,
    )
    tree = _tree(convo.sft_pairs(tr))
    assert tree.count("Exchange") == 1


def test_span_dedup_no_window_no_cartesian(spark):
    docs = spark.createDataFrame(
        [(0, "a1 a2 a3 a4 a5 a6 a7 a8")], "doc_id long, text string"
    )
    tree = _tree(convo.span_dedup(docs))
    assert "Window" not in tree
    assert "Cartesian" not in tree and "BroadcastNestedLoop" not in tree
