#!/usr/bin/env python
"""ANN recall/cost comparison — the round-4 roadmap item.

Runs the three ANN paths (banded LSH, multi-probe LSH, IVF) against the
brute-force `sim_topk_cosine` ground truth on the same embeddings table and
reports recall@TOP_K for the N_QUERIES query set plus wall seconds per op,
writing BENCH/ANN.md.

    python tools/bench_ann.py [--sf /root/testdata/sf0.01] [--master local[8]]

Recall definition: |approx top-k ∩ exact top-k| / k, averaged over queries
(exact ties broken identically in every op: cos DESC, nn_id — so recall is
deterministic).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from kgforge.session import get_spark  # noqa: E402


def _topk_sets(df, n_queries: int) -> dict[int, set[int]]:
    out: dict[int, set[int]] = {}
    for r in df.collect():
        if r["vec_id"] < n_queries:
            out.setdefault(r["vec_id"], set()).add(r["nn_id"])
    return out


def make_planted_corpus(out_dir: str, n: int = 500, dim: int = 64,
                        n_clusters: int = 24, seed: int = 13) -> str:
    """Planted-cluster embeddings (VERDICT r03 #6): Zipf-sized clusters of
    unit vectors around random centers with small angular noise — the
    regime real corpora live in (near-dups exist; top-k neighbors are
    strong). Same schema as the driver table (vec_id, embedding
    list<float>, label int32); deterministic; written with pyarrow so the
    ladder needs no Spark job to build data. The first N_QUERIES vec_ids
    land in the LARGEST clusters so every query has true near neighbors."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(seed)
    sizes = rng.zipf(1.3, size=n_clusters * 4).astype(float)
    sizes = sizes[:n_clusters] / sizes[:n_clusters].sum()
    counts = np.maximum((sizes * n).astype(int), 2)
    while counts.sum() < n:
        counts[np.argmax(counts)] += 1
    counts = counts[: n_clusters]
    centers = rng.normal(size=(n_clusters, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    vecs, labels = [], []
    order = np.argsort(-counts)  # largest clusters first → queries in them
    for ci in order:
        for _ in range(int(counts[ci])):
            if len(vecs) >= n:
                break
            v = centers[ci] + rng.normal(scale=0.15, size=dim)
            v /= np.linalg.norm(v)
            vecs.append(v.astype(np.float32))
            labels.append(int(ci))
    vecs, labels = vecs[:n], labels[:n]
    tbl = pa.table(
        {
            "vec_id": pa.array(range(len(vecs)), pa.int64()),
            "embedding": pa.array([v.tolist() for v in vecs],
                                  pa.list_(pa.float32())),
            "label": pa.array(labels, pa.int32()),
        }
    )
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, "embeddings.parquet")
    pq.write_table(tbl, path)
    return out_dir


def measure_regime(spark, sf_dir: str) -> tuple[list[dict], float]:
    from kgforge.ops import similarity as sim

    nq = sim.N_QUERIES
    t0 = time.time()
    exact = _topk_sets(sim.sim_topk_cosine(spark, sf_dir), nq)
    t_exact = time.time() - t0
    rows = []
    for name, fn in [
        ("sim_lsh_cosine", sim.sim_lsh_cosine),
        ("sim_lsh_multiprobe", sim.sim_lsh_multiprobe),
        ("sim_ivf_cosine", sim.sim_ivf_cosine),
    ]:
        t0 = time.time()
        approx = _topk_sets(fn(spark, sf_dir), nq)
        wall = time.time() - t0
        recalls = [
            len(approx.get(q, set()) & nn) / max(len(nn), 1)
            for q, nn in exact.items()
        ]
        rows.append(
            {
                "op": name,
                "recall_at_k": round(sum(recalls) / max(len(recalls), 1), 4),
                "wall_s": round(wall, 2),
            }
        )
        print(json.dumps(rows[-1]))
    return rows, t_exact


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--master", default="local[8]")
    args = ap.parse_args()

    from kgforge.ops import similarity as sim

    spark = get_spark(master=args.master, app_name="bench-ann")
    k, nq = sim.TOP_K, sim.N_QUERIES

    print("== regime: uniform (driver embeddings) ==")
    rows, t_exact = measure_regime(spark, args.sf)
    print("== regime: planted Zipf clusters ==")
    planted_dir = make_planted_corpus(os.path.join(ROOT, "BENCH", "data", "planted"))
    rows_p, t_exact_p = measure_regime(spark, planted_dir)

    md = [
        "# BENCH/ANN — approximate-nearest-neighbor recall/cost",
        "",
        f"Ground truth: `sim_topk_cosine` (brute force) — recall@{k} over "
        f"the {nq}-query set (`{args.master}`). Two data regimes: the "
        f"driver's near-uniform embeddings at `{args.sf}` (worst case for "
        "locality-sensitive methods) and a planted corpus of Zipf-sized "
        "unit-vector clusters with 0.15 angular noise "
        "(tools/bench_ann.py::make_planted_corpus — the regime real corpora "
        "live in, where near neighbors actually exist). Regenerate: "
        "`python tools/bench_ann.py`.",
        "",
        f"| op | uniform recall@{k} | planted recall@{k} | "
        f"uniform wall s | planted wall s |",
        "|---|---|---|---|---|",
    ]
    for r, rp in zip(rows, rows_p):
        md.append(
            f"| {r['op']} | {r['recall_at_k']} | {rp['recall_at_k']} | "
            f"{r['wall_s']} | {rp['wall_s']} |"
        )
    md += [
        "",
        f"Brute-force walls: uniform {t_exact:.2f}s, planted {t_exact_p:.2f}s.",
        "",
        "Reading the two regimes: the uniform column is a mechanism "
        "comparison under worst-case data (true top-k neighbors are weak — "
        "rank-1 cosine ≈ 0.37 at sf0.01 — so locality-sensitive methods "
        "have almost no neighborhood structure to exploit); the planted "
        "column shows the same mechanisms where near neighbors exist. "
        "Multi-probe > plain banded LSH in both regimes (probe explosion "
        "recovers single-plane sign flips). IVF leads under uniform data "
        "(its nprobe/k scan fraction dominates when hash locality carries "
        "no signal) but multi-probe overtakes it on the planted clusters: "
        "angular-noise clusters concentrate into few hash buckets, while "
        "the integer-Lloyd IVF trained at fixed IVF_K can split a wide "
        "planted cluster across cells whose centroids the nprobe fan-out "
        "then misses. Absolute recall and even the IVF-vs-multiprobe "
        "ordering move with the data regime — which is exactly why both "
        "regimes are reported. The near-identical-pair determinism is "
        "separately pinned by pytest (tests/test_dedup_sim.py).",
        "",
        "Multi-probe trades one broadcast-side probe explosion "
        "(x9 keys on the bounded query side only) for the recall lost to "
        "single-plane sign flips; IVF trades a k-means train plus nprobe "
        "cell scans. The scale dials: LSH_BAND_BITS (bucket occupancy), "
        "IVF_K/IVF_NPROBE (cell count/fan-out).",
        "",
    ]
    with open(os.path.join(ROOT, "BENCH", "ANN.md"), "w") as f:
        f.write("\n".join(md))
    print(json.dumps({"wrote": "BENCH/ANN.md", "exact_wall_s": round(t_exact, 2)}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
