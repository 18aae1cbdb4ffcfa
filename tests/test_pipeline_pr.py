"""The P/R gate: full Spark pipeline vs the pure-Python reference oracle on
the deterministic synthetic corpus (BASELINE.json: P/R ≥ 0.95 of emitted
(subj, pred, obj) triples vs reference). Both sides are deterministic, so we
engineer for — and assert — exact agreement, with the 0.95 gate as the
contract floor."""

from __future__ import annotations

import pytest

from kgforge import canon, extract, link, triples


@pytest.fixture(scope="module")
def spark_triples(spark, spark_corpus):
    tr, d, e = spark_corpus
    m = extract.extract_mentions(tr, d)
    linked = link.link_mentions(m, d)
    raw = triples.build_raw_triples(linked)
    cmap = canon.canonical_map(d.select("entity_id"), e)
    final = triples.dedup_triples(canon.remap_triples(raw, cmap))
    return final.collect()


def _pr(ours: set, golden: set) -> tuple[float, float]:
    tp = len(ours & golden)
    precision = tp / len(ours) if ours else 0.0
    recall = tp / len(golden) if golden else 0.0
    return precision, recall


def test_triple_pr_gate(spark_triples, ref):
    ours = {(r["subj"], r["pred"], r["obj"]) for r in spark_triples}
    golden = {(s, p, o) for s, p, o, *_ in ref["triples"]}
    precision, recall = _pr(ours, golden)
    assert precision >= 0.95 and recall >= 0.95, (precision, recall)
    # deterministic corpus + deterministic semantics → exact agreement
    assert ours == golden


def test_triple_provenance_exact(spark_triples, ref):
    """First-emission provenance (conv_id, turn_idx) and confidence match the
    reference row-for-row, not just the (s, p, o) set."""
    ours = {
        (r["subj"], r["pred"], r["obj"], r["conv_id"], r["turn_idx"], round(r["confidence"], 6))
        for r in spark_triples
    }
    golden = {(s, p, o, c, t, round(conf, 6)) for s, p, o, c, t, conf in ref["triples"]}
    assert ours == golden


def test_mentions_match_reference(spark, spark_corpus, ref):
    tr, d, _ = spark_corpus
    got = {
        (r["conv_id"], r["turn_idx"], r["m_idx"], r["surface"], r["begin"], r["end"])
        for r in extract.extract_mentions(tr, d).collect()
    }
    assert got == set(ref["mentions"])


def test_linking_rank1_matches_reference(spark, spark_corpus, ref):
    tr, d, _ = spark_corpus
    m = extract.extract_mentions(tr, d)
    got = {
        (r["conv_id"], r["turn_idx"], r["m_idx"], r["entity_id"])
        for r in link.link_mentions(m, d).collect()
    }
    want = {(c, t, i, eid) for c, t, i, _s, eid, _cu, _p in ref["linked"]}
    assert got == want
