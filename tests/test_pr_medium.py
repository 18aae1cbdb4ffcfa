"""P/R gate at medium scale through the FULL pipeline — warehouse snapshots,
salted repartition, checkpoint metrics, MERGE materialization — against the
pure-Python reference oracle. Complements test_pipeline_pr (which gates the
operator chain without the warehouse) with genuinely hot conversations."""

from __future__ import annotations

import pytest

from kgforge import synth
from kgforge.pipeline import PipelineConfig, run_pipeline
from tests import oracle_ref


@pytest.fixture(scope="module")
def medium():
    return synth.make_corpus(
        seed=7, n_convs=300, n_entities=500, n_hot=2,
        hot_turns=(1000, 2500), max_turns=80,
    )


def test_full_pipeline_pr_with_hot_conversations(spark, medium, tmp_path_factory):
    tr, d, e = synth.to_spark(spark, medium)
    cfg = PipelineConfig(
        warehouse_root=str(tmp_path_factory.mktemp("wh_medium")),
        run_id="medium",
        num_partitions=8,
        hot_threshold=500,
        target_rows=250,
    )
    out = run_pipeline(spark, tr, d, e, cfg)
    ours = {(r["subj"], r["pred"], r["obj"]) for r in out["triples"].collect()}

    ref = oracle_ref.run_reference(
        medium.transcripts, medium.dictionary, medium.xref_edges
    )
    golden = {(s, p, o) for s, p, o, *_ in ref["triples"]}

    tp = len(ours & golden)
    precision = tp / len(ours)
    recall = tp / len(golden)
    assert precision >= 0.95 and recall >= 0.95, (precision, recall)
    assert ours == golden  # deterministic both sides — engineered for 1.0
    assert len(golden) > 1000  # non-trivial corpus
