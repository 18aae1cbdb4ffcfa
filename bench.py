#!/usr/bin/env python
"""Headline benchmark — the driver's per-round feedback loop.

Runs the flagship KG pipeline plus a representative slice of the operator
surface at ``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {"q1": sec, ...}, "sf": 0.1, ...extras}

Each query is timed to full materialization via the `noop` datasource
(executes the whole plan, writes nothing — isolates engine time from
driver-side collect/parquet-write overhead). Extras carried in the same
line: end-to-end triples/sec for the flagship stage and input row counts,
so rounds are comparable against BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from kgforge.registry import all_ops  # noqa: E402
from kgforge.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

# Headline keys: the end-to-end pipeline (flagship) + the heaviest operator
# families — joins (broadcast/SMJ/salted), shuffles (agg/window), the CC
# fixpoint, UDF extraction, and the training-data ops (dedup / similarity /
# text analysis). Keys missing from the registry are skipped so bench.py
# never breaks mid-build.
HEADLINE = [
    "pipe_triples",       # flagship: extract → link → canonicalize → dedup
    "udf_mentions",       # Arrow-batch UDF extraction stage alone
    "graph_cc",           # iterative connected components
    "join_smj",           # big-big sort-merge join
    "join_salted",        # skew-salted join
    "join_broadcast",     # dictionary-style broadcast join
    "agg_group",          # shuffle hash aggregate
    "win_rank",           # window rank over (conv, turn)
    "win_sessionize",     # lag-gap batch sessionization over events
    "dedup_minhash",      # MinHash-LSH near-dup over documents
    "dedup_clusters",     # near-dup transitive closure (minhash + CC)
    "graph_pagerank",     # iterative integer PageRank over the entity graph
    "graph_sssp",         # weighted Bellman-Ford over the entity graph
    "kg_path2hop",        # SPARQL-style 2-hop BGP self-join
    "kg_validate",        # KG integrity audit (3 checks, one pass)
    "kg_fusion",          # majority-vote truth discovery (encode-min agg)
    "kg_negsample",       # deterministic tail corruption (broadcast index)
    "graph_clustercoef",  # triangles / (deg choose 2), degree-oriented
    "graph_randwalk",     # deterministic DeepWalk corpus (indexed steps)
    "text_chunk",         # overlapping token-window chunking (scan speed)
    "dedup_exact",        # exact hash dedup
    "dedup_ngram_jaccard",  # blocked n-gram Jaccard
    "sim_topk_cosine",    # brute-force cosine top-k over embeddings
    "sim_lsh_cosine",     # hyperplane-LSH bucketing (ANN scale path)
    "sim_lsh_multiprobe",  # multi-probe LSH (recall at fixed plane count)
    "text_quality",       # text quality scoring
    "text_tfidf",         # inverted-index TF-IDF top-k terms
    "sim_bm25",           # integer BM25 ranked retrieval
    "text_lm_score",      # conditional trigram LM quality score
    "text_langid",        # marker-overlap language ID
    "text_pack",          # token-budget shard packing (distributed scan)
    "text_contamination",  # train/test shingle decontamination
    "dedup_spans",        # sequence-level span dedup (first occurrence wins)
    "pair_sft",           # SFT prompt/response pair mining
    "pair_preference",    # deterministic preference pairs (broadcast pool)
    "kg_asof",            # temporal as-of KG snapshot (encoded-MAX agg)
    "kg_temporal_diff",   # snapshot diff between two as-of cutoffs
    "graph_khop",         # seed-bounded k-hop neighborhoods (semi-naive)
    "kg_typing",          # per-entity predicate-role typing profile
    "sample_stratified",  # exact-quota stratified sampling
    "mm_features",        # Arrow-batched binary decode plumbing
    "udf_extract_conv",   # grouped-map conversation fingerprint
    "stream_tumble_batch",  # windowed agg (batch mirror of streaming)
    "stream_session_batch",  # session windows per user
]


def _sf_from_dir(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


def time_query(fn, spark, sf_dir: str) -> tuple[float, int]:
    t0 = time.time()
    df = fn(spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()
    wall = time.time() - t0
    return wall, -1


def main() -> int:
    spark = get_spark(master=f"local[{CPUS}]", app_name="kgforge-bench")
    ops = all_ops()

    # Warm the JVM + parquet footers once so q1 isn't charged JIT cost.
    spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet")).count()

    queries: dict[str, float] = {}
    extras: dict[str, float] = {}
    for key in HEADLINE:
        spec = ops.get(key)
        if spec is None:
            continue
        wall, _ = time_query(spec.fn, spark, SF_DIR)
        queries[key] = round(wall, 3)

    # End-to-end throughput: triples/sec for the flagship run (turns in /
    # triples out per wall second of the full pipeline stage).
    if "pipe_triples" in queries:
        tri = ops["pipe_triples"].fn(spark, SF_DIR)
        n_triples = tri.count()
        extras["triples"] = n_triples
        extras["triples_per_sec"] = round(n_triples / queries["pipe_triples"], 1)

    total = round(sum(queries.values()), 3)
    out = {
        "metric": "kgforge headline suite (end-to-end KG pipeline + operator surface)",
        "value": total,
        "unit": "sec",
        "queries": queries,
        "sf": _sf_from_dir(SF_DIR),
        "cpus": CPUS,
        **extras,
    }
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
