"""Flagship end-to-end run for the driver's ``entry(spark)`` smoke check.

Derives the transcript corpus + entity dictionary + same-as edges
deterministically from the sf dir's ``documents`` table (kgforge.corpus),
runs the full pipeline through the snapshot warehouse (extract → link →
canonicalize → MERGE materialize), and returns the triples DataFrame.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession

from kgforge import corpus
from kgforge.pipeline import PipelineConfig, run_pipeline


def run_flagship(spark: SparkSession, sf_dir: str, warehouse: str | None = None) -> DataFrame:
    transcripts = corpus.derive_transcripts(spark, sf_dir)
    dictionary = corpus.derive_dictionary(spark, sf_dir)
    edges = corpus.derive_xref_edges(spark, sf_dir)
    wh = warehouse or tempfile.mkdtemp(prefix="kgforge_wh_")
    cfg = PipelineConfig(warehouse_root=wh, run_id="flagship")
    out = run_pipeline(spark, transcripts, dictionary, edges, cfg)
    return out["triples"]
