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
