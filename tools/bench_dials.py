#!/usr/bin/env python
"""Occupancy/crossover ladders for the three documented scale dials
(VERDICT r03 #4): measured guidance — not documentation — for when each
dial must widen.

  PACK prefix width   (text.PACK_BUCKETS):   per-bucket docs for the local
                      sort task, vs the driver-side offset scan size.
  LSH_BAND_BITS       (similarity.py):       band-bucket occupancy and the
                      candidate-pair volume the verify stage must score.
  TWO_LEVEL_MIN_ROWS  (triples.py):          single- vs two-level dedup
                      wall on skewed triples — the measured crossover.

    python tools/bench_dials.py [--quick] [--master local[8]]

Writes BENCH/DIALS.md. Walls are warm in-session measurements (the ladder's
value is the relative shape / crossover, not absolute seconds — absolute
scaling evidence lives in BENCH/BASELINE.md's median-of-3 ladders).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from pyspark.sql import functions as F  # noqa: E402

from kgforge.session import get_spark  # noqa: E402


def _noop_write(df) -> float:
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    return time.time() - t0


# ----------------------------------------------------------- PACK ladder
def pack_ladder(spark, sf_dirs: list[str], widths: list[int]) -> list[dict]:
    """Replicates text_pack's phase-1 core with a parameterized md5-prefix
    width (1 hex char = 16 buckets ... 4 = 65536). Reports per-bucket
    occupancy (the one-task local sort's working set) and the driver-side
    offset-scan size (= populated bucket count)."""
    from kgforge.tables import load

    rows = []
    for sf in sf_dirs:
        docs = load(spark, sf, "documents").select(
            "doc_id",
            F.size(F.split("text", " ")).alias("n_tokens"),
            F.md5(F.col("doc_id").cast("string")).alias("pack_key"),
        ).persist()
        n = docs.count()
        for w in widths:
            buckets = 16 ** w
            b = docs.withColumn(
                "pack_bucket", F.conv(F.substring("pack_key", 1, w), 16, 10).cast("int")
            )
            t0 = time.time()
            occ = (
                b.groupBy("pack_bucket").count()
                .agg(
                    F.max("count").alias("max_occ"),
                    F.count(F.lit(1)).alias("populated"),
                )
                .collect()[0]
            )
            wall = time.time() - t0
            rows.append(
                {
                    "dial": "PACK prefix", "sf": sf, "docs": n,
                    "setting": f"{w} hex ({buckets} buckets)",
                    "max_bucket_rows": occ["max_occ"],
                    "driver_rows": occ["populated"],
                    "wall_s": round(wall, 2),
                }
            )
            print(json.dumps(rows[-1]))
        docs.unpersist()
    return rows


# ------------------------------------------------------------ LSH ladder
def lsh_ladder(spark, sf_dirs: list[str], bits_ladder: list[int]) -> list[dict]:
    """At a FIXED plane count the bit budget is bands × band_bits ≤
    N_PLANES, so each setting runs with bands = N_PLANES // bits (a band
    reading past the budget sees constant zeros → every vector collides →
    the all-pairs degenerate case; the first version of this ladder
    measured exactly that at 12 bits and the constraint is now explicit)."""
    from kgforge.ops import similarity as sim
    from kgforge.tables import load

    rows = []
    for sf in sf_dirs:
        emb = load(spark, sf, "embeddings")
        q = (
            emb.select("vec_id", sim._quant(F.col("embedding")).alias("qv"))
            .select("vec_id", sim._bucket_udf()("qv").alias("bucket"))
            .persist()
        )
        n = q.count()
        for bits in bits_ladder:
            bands = max(1, sim.N_PLANES // bits)
            t0 = time.time()
            cand = sim.banded_candidates(q, bands=bands, band_bits=bits).count()
            wall = time.time() - t0
            # occupancy of band 0's widest bucket at this setting
            nib = (
                (F.col("bucket") / ((1 << bits) ** 0)).cast("long") % (1 << bits)
            )
            occ = (
                q.select(nib.alias("nib")).groupBy("nib").count()
                .agg(F.max("count")).collect()[0][0]
            )
            rows.append(
                {
                    "dial": "LSH_BAND_BITS", "sf": sf, "vectors": n,
                    "setting": f"{bits} bits x {bands} bands",
                    "max_bucket_rows": occ,
                    "candidate_pairs": cand,
                    "wall_s": round(wall, 2),
                }
            )
            print(json.dumps(rows[-1]))
        q.unpersist()
    return rows


# ------------------------------------------------- TWO_LEVEL crossover
def synth_triples(spark, n: int):
    """Deterministic triple stream shaped like the real pipeline's
    pre-dedup cut: 24 rows per conversation over 3 conversation-local
    (subj,pred,obj) keys (a mention recurring across the conversation's
    turns — the within-conv duplication the two-level pass collapses),
    plus ~10% of rows on one global hot key (a head entity's resolved_as
    triple), with conversations SCATTERED across the input range (the
    post-remap-join arrival order: rows are partitioned by join hash, not
    conversation)."""
    n_convs = max(n // 24, 1)
    base = spark.range(n)
    conv = F.col("id") % n_convs
    key = F.when(F.col("id") % 10 < 1, F.lit(-1)).otherwise(
        conv * 3 + (F.col("id") % 3)
    )
    subj = F.when(key < 0, F.lit("E_hot")).otherwise(
        F.concat(F.lit("E_"), key.cast("string"))
    )
    return base.select(
        subj.alias("subj"),
        F.lit("resolved_as").alias("pred"),
        F.concat(F.lit("TOK:"), subj).alias("obj"),
        F.concat(F.lit("c"), conv.cast("string")).alias("conv_id"),
        (F.col("id") % 50).cast("int").alias("turn_idx"),
        (F.col("id") % 7).cast("int").alias("m_idx"),
        F.lit(0.5).alias("confidence"),
    )


def two_level_ladder(spark, sizes: list[int]) -> tuple[list[dict], list[dict]]:
    """Two tables. (1) DETERMINISTIC combine-output volumes — the dial's
    own currency: the single-level aggregate's map-side combine emits one
    row per (input partition, distinct key), which GROWS with parallelism ×
    key popularity, while the two-level pass emits distinct (conv, key)
    rows independent of parallelism. (2) median-of-3 walls per strategy
    (secondary: at ≤4M rows on this box, fixed per-stage costs dominate the
    shuffle-volume difference, so walls alone under-state the dial — the
    volume table is what extrapolates to 100×)."""
    import statistics

    from kgforge import triples as T

    vol_rows, wall_rows = [], []
    for n in sizes:
        df = synth_triples(spark, n).persist()
        df.count()
        # exact combine-output volume of the SINGLE-level path at each
        # parallelism: distinct (input partition, key) rows
        for p in (8, 32, 128):
            single_out = (
                df.repartition(p)
                .select(F.spark_partition_id().alias("pid"), "subj", "pred", "obj")
                .distinct()
                .count()
            )
            vol_rows.append(
                {"rows": n, "parallelism": p, "single_combine_rows": single_out}
            )
        two_out = df.select("conv_id", "subj", "pred", "obj").distinct().count()
        vol_rows[-1]["two_level_l1_rows"] = two_out
        vol_rows[-2]["two_level_l1_rows"] = two_out
        vol_rows[-3]["two_level_l1_rows"] = two_out
        print(json.dumps(vol_rows[-3:]))
        for two_level in (False, True):
            walls = [
                _noop_write(T.dedup_triples(df, two_level=two_level))
                for _ in range(3)
            ]
            wall_rows.append(
                {
                    "dial": "TWO_LEVEL_MIN_ROWS", "rows": n,
                    "setting": "two-level" if two_level else "single",
                    "wall_s": round(statistics.median(walls), 2),
                }
            )
            print(json.dumps(wall_rows[-1]))
        df.unpersist()
    return vol_rows, wall_rows


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--master", default=None)
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "8")
    spark = get_spark(master=args.master or f"local[{cpus}]", app_name="bench-dials")

    sf_dirs = ["/root/testdata/sf0.01", "/root/testdata/sf0.1"]
    sizes = [200_000, 1_000_000] if args.quick else [200_000, 1_000_000, 4_000_000]

    pack = pack_ladder(spark, sf_dirs, [1, 2, 3])
    lsh = lsh_ladder(spark, sf_dirs, [4, 8, 16])
    vols, two = two_level_ladder(spark, sizes)

    def table(rows, cols):
        out = ["| " + " | ".join(cols) + " |", "|" + "---|" * len(cols)]
        for r in rows:
            out.append("| " + " | ".join(str(r.get(c, "")) for c in cols) + " |")
        return out

    md = [
        "# BENCH/DIALS — measured occupancy ladders for the scale dials",
        "",
        f"Warm in-session walls on `local[{cpus}]`; regenerate: "
        "`python tools/bench_dials.py`. The point of each ladder is the "
        "SHAPE (occupancy per setting per corpus size), which is what "
        "decides when the dial must widen at 100×.",
        "",
        "## PACK prefix width (text.PACK_BUCKETS)",
        "",
        *table(pack, ["sf", "docs", "setting", "max_bucket_rows",
                      "driver_rows", "wall_s"]),
        "",
        "Per-bucket rows (= the one-task local sort) shrink ~16× per extra "
        "hex char while the driver offset scan grows 16×; both corpus sizes "
        "confirm occupancy ∝ docs/buckets. Widen when docs/16^w exceeds a "
        "task's comfortable sort size (~10⁷ rows): 10¹⁰ docs → 4 hex chars "
        "(65,536 buckets, still a trivial driver scan).",
        "",
        "## LSH_BAND_BITS (similarity.banded_candidates)",
        "",
        *table(lsh, ["sf", "vectors", "setting", "max_bucket_rows",
                     "candidate_pairs", "wall_s"]),
        "",
        "Candidate pairs ∝ n²·bands/2^bits per block: the corpus step "
        "(500→2000 vectors) multiplies pairs ~16× at fixed bits, and each "
        "bits step claws back proportionally — hold occupancy constant by "
        "raising bits with log₂(corpus growth), exactly the documented "
        "rule, now measured. Constraint made explicit by the ladder: at a "
        "fixed plane count, bands = N_PLANES // bits — a band reading past "
        "the bit budget sees constant zeros and degenerates to all-pairs "
        "(the first run of this ladder measured n·(n−1) candidates at 12 "
        "bits × 4 bands before the constraint was enforced).",
        "",
        "## TWO_LEVEL_MIN_ROWS (triples.dedup_triples)",
        "",
        "Deterministic combine-output volumes (the dial's own currency — "
        "what actually shuffles):",
        "",
        *table(vols, ["rows", "parallelism", "single_combine_rows",
                      "two_level_l1_rows"]),
        "",
        "Median-of-3 walls at this box's session parallelism (secondary "
        "evidence — see below):",
        "",
        *table(two, ["rows", "setting", "wall_s"]),
        "",
        "Reading it: the single-level aggregate's map-side combine emits "
        "one row per (input partition × distinct key) — the volume column "
        "GROWS with parallelism and saturates near the full input size "
        "once each key's duplicates spread across more partitions than "
        "they have copies — while the two-level pass's level-1 output is "
        "distinct (conversation, key): independent of parallelism, 4–6× "
        "smaller at this stream shape. The walls at ≤4M rows consistently "
        "favor SINGLE on this box: level-1's conversation repartition is "
        "an extra full shuffle whose ~fixed cost is not yet amortized by "
        "the volume it removes — exactly why the gate exists instead of "
        "two-level being unconditional. The flip is a wall-clock fact on "
        "the real pipeline, not extrapolation: two-level cut the triples "
        "merge 48.4→37.9 s at local[32] (round 2) and gave the 4.05× "
        "per-stage 1→4 pair at 1M conversations (BENCH/BASELINE.md). "
        "TWO_LEVEL_MIN_ROWS = 2,000,000 linked rows sits between the "
        "measured single-wins region (≤4M synthetic rows ≈ 1-2 s stages, "
        "this table) and the measured two-level-wins region (the 44M-row "
        "1M-conversation pipeline stage), i.e. where shuffle volume "
        "starts dominating the fixed extra pass.",
        "",
    ]
    with open(os.path.join(ROOT, "BENCH", "DIALS.md"), "w") as f:
        f.write("\n".join(md))
    print(json.dumps({"wrote": "BENCH/DIALS.md"}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
