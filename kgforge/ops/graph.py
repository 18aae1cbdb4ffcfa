"""Graph-side operators beyond the CC fixpoint (which lives in
pipeline_ops.graph_cc): canonical remapping of an edge set through the
component map — two broadcast joins, no shuffle of the big side beyond the
scan (SURVEY.md §2.B graph pane).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from kgforge import canon, corpus, extract, link, triples
from kgforge.ops import pipeline_ops
from kgforge.registry import register


@register(
    "graph_remap",
    sql=pipeline_ops._PRELUDE
    + ",\n"
    + pipeline_ops._MENTIONS_CTE
    + ",\n"
    + pipeline_ops._LINKED_CTE
    + """,
    raw_triples AS (
      SELECT entity_id AS subj, 'resolved_as' AS pred, curie AS obj,
             conv_id, turn_idx, m_idx, prior AS confidence
      FROM linked
    )
    SELECT coalesce(cs.canonical_id, t.subj) AS subj, t.pred,
           coalesce(co.canonical_id, t.obj) AS obj,
           t.conv_id, t.turn_idx, t.confidence
    FROM raw_triples t
    LEFT JOIN canonical cs ON t.subj = cs.entity_id
    LEFT JOIN canonical co ON t.obj = co.entity_id
    """,
    doc=(
        "Canonical remap: rewrite subj/obj of an edge set through the "
        "(entity → canonical) map via two broadcast left joins; literal "
        "objects (CURIEs) pass through untouched."
    ),
)
def graph_remap(spark: SparkSession, sf_dir: str) -> DataFrame:
    tr = corpus.derive_transcripts(spark, sf_dir)
    d = corpus.derive_dictionary(spark, sf_dir)
    m = extract.extract_mentions(tr, d)
    linked = link.link_mentions(m, d)
    resolved = linked.selectExpr(
        "entity_id AS subj",
        "'resolved_as' AS pred",
        "curie AS obj",
        "conv_id",
        "turn_idx",
        "m_idx",
        "prior AS confidence",
    )
    cmap = corpus.derive_canonical_map(spark, sf_dir)
    return canon.remap_triples(resolved, cmap).select(
        "subj", "pred", "obj", "conv_id", "turn_idx", "confidence"
    )


@register(
    "graph_nodes",
    sql=pipeline_ops._PRELUDE
    + ",\n"
    + pipeline_ops._MENTIONS_CTE
    + ",\n"
    + pipeline_ops._LINKED_CTE
    + """,
    resolved AS (
      SELECT coalesce(c.canonical_id, l.entity_id) AS node_id, l.curie
      FROM linked l LEFT JOIN canonical c ON l.entity_id = c.entity_id
    )
    SELECT node_id,
           min(curie) AS label,
           CAST(count(*) AS BIGINT) AS n_mentions,
           array_to_string(list_sort(list(DISTINCT curie)), '|') AS xrefs
    FROM resolved GROUP BY node_id
    """,
    doc=(
        "Node table with merged identities (SURVEY.md §1.2): canonical id, "
        "deterministic label, mention count, and the per-component xref SET "
        "string-encoded as '|'-joined sorted distinct CURIEs — the batch "
        "mirror of the bot's item (labels + claims + external ids). The set "
        "is string-encoded because registered queries must never emit "
        "array/map-typed columns: the driver harness canonicalizes results "
        "via pandas sort_values, which cannot hash numpy arrays."
    ),
)
def graph_nodes(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    tr = corpus.derive_transcripts(spark, sf_dir)
    d = corpus.derive_dictionary(spark, sf_dir)
    linked = link.link_mentions(extract.extract_mentions(tr, d), d)
    cmap = corpus.derive_canonical_map(spark, sf_dir)
    resolved = (
        linked.join(
            F.broadcast(cmap), linked.entity_id == cmap.entity_id, "left"
        )
        .select(
            F.coalesce("canonical_id", linked.entity_id).alias("node_id"), "curie"
        )
    )
    return resolved.groupBy("node_id").agg(
        F.min("curie").alias("label"),
        F.count(F.lit(1)).alias("n_mentions"),
        F.concat_ws("|", F.sort_array(F.collect_set("curie"))).alias("xrefs"),
    )


PR_ITERS = 3
PR_SCALE = 1_000_000  # initial integer rank per node
PR_BASE = 150_000  # (1 - d) * SCALE with damping d = 0.85


def _pr_iter_sql(prev: str, nxt: str) -> str:
    """One unrolled integer-PageRank iteration as a DuckDB CTE."""
    return f"""
    {nxt} AS (
      SELECT n.node, CAST({PR_BASE} + coalesce(s.m, 0) AS BIGINT) AS rank
      FROM pr_nodes n LEFT JOIN (
        SELECT e.dst AS node, sum((r.rank * 85) // (100 * d.outdeg)) AS m
        FROM pr_edges e
        JOIN {prev} r ON e.src = r.node
        JOIN pr_deg d ON e.src = d.src
        GROUP BY e.dst) s ON n.node = s.node
    )"""


@register(
    "graph_pagerank",
    # Integer-arithmetic PageRank: every quantity is a BIGINT (per-edge
    # contribution = floor(rank*85 / (100*outdeg)), ranks = 150000 + integer
    # sum), so the result is EXACT and order-independent in both engines —
    # no float summation-order ulp can break the value hash. DuckDB sums
    # BIGINT into HUGEINT, hence the CAST back.
    sql=pipeline_ops._PRELUDE + ",\n" + pipeline_ops._MENTIONS_CTE + ",\n"
    + pipeline_ops._LINKED_CTE + ",\n" + pipeline_ops._TRIPLES_CTE + f""",
    pr_edges AS (
      SELECT DISTINCT subj AS src, obj AS dst
      FROM final_triples WHERE pred <> 'resolved_as'
    ),
    pr_nodes AS (
      SELECT src AS node FROM pr_edges UNION SELECT dst FROM pr_edges
    ),
    pr_deg AS (SELECT src, count(*) AS outdeg FROM pr_edges GROUP BY src),
    pr_r0 AS (SELECT node, CAST({PR_SCALE} AS BIGINT) AS rank FROM pr_nodes),
    {",".join(_pr_iter_sql(f"pr_r{i}", f"pr_r{i + 1}") for i in range(PR_ITERS))}
    SELECT node AS node_id, rank FROM pr_r{PR_ITERS}
    """,
    doc=(
        f"PageRank over the canonical entity graph ({PR_ITERS} fixed "
        "iterations, damping 0.85 in exact integer fixed-point): edges are "
        "the distinct entity→entity triples (co_occurs / mentions_with); "
        "each iteration is one join + hash aggregation over the edge set — "
        "the iterative-dataflow pattern that scales as O(iters) shuffles of "
        "the edge table, never materializing anything super-linear."
    ),
)
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    tri = pipeline_ops.pipe_triples(spark, sf_dir)
    edges = (
        tri.where(F.col("pred") != "resolved_as")
        .select("subj", "obj")
        .distinct()
        .withColumnRenamed("subj", "src")
        .withColumnRenamed("obj", "dst")
    )
    return pagerank(edges)


def pagerank(edges: DataFrame, iters: int = PR_ITERS) -> DataFrame:
    """Integer fixed-point PageRank over ``edges(src, dst)`` → (node_id, rank).

    Exact-arithmetic contract: per-edge contribution is
    ``(rank * 85) DIV (100 * outdeg)`` and ranks are BIGINT sums, so results
    are order-independent and engine-exact (hand-verified on a 3-node
    fixture in tests/test_round3_ops.py; value-hashed vs the unrolled DuckDB
    mirror by the driver).
    """
    from pyspark.sql import functions as F

    # Edge list + out-degree are reused by every iteration: persist ONE
    # pre-joined (src, dst, outdeg) cut so each iteration is a single
    # shuffle-join against the current ranks, not a re-derivation of the
    # upstream plan (Catalyst has no cross-branch CSE — without this the
    # whole edge derivation would re-run once per iteration).
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    ew = edges.join(deg, "src").persist()
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    ranks = nodes.select("node", F.lit(PR_SCALE).cast("bigint").alias("rank"))
    for _ in range(iters):
        contrib = (
            ew.join(ranks, ew.src == ranks.node)
            .select(
                F.col("dst").alias("node"),
                F.expr("(rank * 85) DIV (100 * outdeg)").alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("m"))
        )
        ranks = nodes.join(contrib, "node", "left").select(
            "node",
            (F.lit(PR_BASE) + F.coalesce("m", F.lit(0))).cast("bigint").alias("rank"),
        )
    # ew/nodes stay persisted: the returned plan references them once per
    # iteration, and they only materialize at the caller's action — an
    # unpersist here would silently re-derive the whole pipeline per use.
    return ranks.select(F.col("node").alias("node_id"), "rank")
