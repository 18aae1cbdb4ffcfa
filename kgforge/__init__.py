"""kgforge — a from-scratch PySpark-native knowledge-graph construction engine.

Capabilities modeled on the `stuppie/biothings-wikidata` bot family
(record fetch → xref-based ID resolution → idempotent item write), re-expressed
as an idiomatic Spark batch dataflow over multi-turn transcript tables:

    extract (Arrow-batched mention detection + triple minting)
    → link (broadcast-dictionary + sort-merge tail, rank-1 disambiguation)
    → canonicalize (connected components over same-as xref edges)
    → materialize (idempotent MERGE into a snapshot warehouse)

See SURVEY.md for the blueprint and provenance notes (the reference checkout
is empty; behavior is pinned by BASELINE.json and public knowledge of the
bot ecosystem).
"""

__version__ = "0.1.0"
