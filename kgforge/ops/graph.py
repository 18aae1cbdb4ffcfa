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
    edges = corpus.derive_xref_edges(spark, sf_dir)
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
    cmap = canon.canonical_map_auto(d.select("entity_id"), edges)
    return canon.remap_triples(resolved, cmap).select(
        "subj", "pred", "obj", "conv_id", "turn_idx", "confidence"
    )
