"""Hand-verified fixtures for the round-4 KG fusion + training-data pane
(majority-vote truth discovery, deterministic negative sampling, local
clustering coefficient, overlapping token chunking). The driver oracle
checks the same operators value-exactly against DuckDB on the sf corpora;
these pin the SEMANTICS on inputs small enough to verify by eye."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from kgforge.ops import kgfuse
from kgforge.ops.curation import CHUNK_STRIDE, CHUNK_TOKENS


def test_fuse_triples_majority_and_tie_break(spark):
    # (e1, p): obj "x" 3 votes beats "y" 2 -> x, support 3.
    # (e2, p): "a" and "b" tie at 1 -> min(obj) = "a".
    rem = spark.createDataFrame(
        [("e1", "p", "x")] * 3 + [("e1", "p", "y")] * 2
        + [("e2", "p", "b"), ("e2", "p", "a")],
        "subj string, pred string, obj string",
    )
    got = {
        (r["subj"], r["pred"]): (r["obj"], r["support"])
        for r in kgfuse.fuse_triples(rem).collect()
    }
    assert got == {("e1", "p"): ("x", 3), ("e2", "p"): ("a", 1)}


def test_fuse_triples_encoding_round_trip_large_support(spark):
    # Supports near the pad boundary still decode exactly (BIGINT, no
    # string truncation): 1 row with 1_000_000 synthetic votes via agg.
    rem = spark.range(1_000_000).select(
        F.lit("s").alias("subj"), F.lit("p").alias("pred"),
        F.lit("o").alias("obj"),
    )
    [row] = kgfuse.fuse_triples(rem).collect()
    assert (row["obj"], row["support"]) == ("o", 1_000_000)


def _probe_raw(subj: str, pred: str, obj: str, n: int) -> int:
    return int(hashlib.md5(f"{subj}|{pred}|{obj}".encode()).hexdigest()[:8], 16) % n


def test_negative_samples_deterministic_draw_and_step(spark):
    rel = spark.createDataFrame(
        [("a", "p", "b"), ("b", "p", "c"), ("c", "p", "a")],
        "subj string, pred string, obj string",
    )
    ents = sorted({"a", "b", "c"})
    got = {
        (r["subj"], r["pred"], r["obj"]): r["neg_obj"]
        for r in kgfuse.negative_samples(rel).collect()
    }
    assert len(got) == 3
    for (s, p, o), neg in got.items():
        raw = _probe_raw(s, p, o, len(ents))
        want = ents[raw] if ents[raw] != o else ents[(raw + 1) % len(ents)]
        assert neg == want, (s, p, o)
        assert neg != o  # with >1 entity the draw never returns the truth


def test_negative_samples_single_entity_degenerate(spark):
    # Vocabulary of one entity: the corrupted tail can only be the truth
    # itself — the op must not crash or drop the row (matches the oracle).
    rel = spark.createDataFrame(
        [("a", "p", "a")], "subj string, pred string, obj string"
    )
    [row] = kgfuse.negative_samples(rel).collect()
    assert row["neg_obj"] == "a"


def test_clustercoef_triangle_plus_pendant(spark):
    # Triangle a-b-c plus pendant d-a:
    #   a: deg 3, 1 triangle -> 2000*1 / (3*2) = 333
    #   b, c: deg 2, 1 triangle -> 2000 / 2 = 1000
    #   d: deg 1 -> 0 (deg < 2 guard)
    und = spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("b", "c"), ("a", "d")],
        "a string, b string",
    )
    got = {
        r["node_id"]: (r["deg"], r["triangles"], r["lcc_x1000"])
        for r in kgfuse.clustering_coefficients(und).collect()
    }
    assert got == {
        "a": (3, 1, 333),
        "b": (2, 1, 1000),
        "c": (2, 1, 1000),
        "d": (1, 0, 0),
    }


def test_text_chunk_boundaries(spark):
    # 100-token doc with CHUNK=64/STRIDE=48: chunks at 0 (64 toks) and 48
    # (52 toks). 64-token doc: exactly one chunk. 1-token doc: one chunk.
    from kgforge.ops import curation  # registered fn needs a docs table;

    # drive the same expressions through a local frame instead
    docs = spark.createDataFrame(
        [
            (1, " ".join(f"t{i}" for i in range(100))),
            (2, " ".join(f"t{i}" for i in range(CHUNK_TOKENS))),
            (3, "solo"),
        ],
        "doc_id long, text string",
    )
    toks = F.split("text", " ")
    d = docs.select("doc_id", toks.alias("toks"), F.size(toks).alias("n_tokens"))
    extra = F.expr(
        f"CASE WHEN n_tokens > {CHUNK_TOKENS} THEN (n_tokens - {CHUNK_TOKENS}"
        f" + {CHUNK_STRIDE - 1}) DIV {CHUNK_STRIDE} ELSE 0 END"
    )
    c = d.select(
        "doc_id", "toks", F.explode(F.sequence(F.lit(0), extra)).alias("chunk_idx")
    )
    chunk = F.expr(f"slice(toks, chunk_idx * {CHUNK_STRIDE} + 1, {CHUNK_TOKENS})")
    rows = c.select(
        "doc_id", "chunk_idx", F.size(chunk).alias("chunk_tokens")
    ).collect()
    got = {(r["doc_id"], r["chunk_idx"]): r["chunk_tokens"] for r in rows}
    assert got == {
        (1, 0): 64,
        (1, 1): 52,  # tokens 48..99
        (2, 0): 64,
        (3, 0): 1,
    }
    assert curation.CHUNK_TOKENS > curation.CHUNK_STRIDE  # overlap invariant
