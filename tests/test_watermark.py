"""Watermark semantics: data arriving later than the watermark bound is
dropped from windowed aggregation state (SURVEY.md §2.B streaming pane,
'watermark + late data drop').

Empirical Spark detail baked into the fixture: the watermark used to filter
a batch is the one established BEFORE that batch was planned, so the late
event must arrive two batches after the event-time high-water mark advanced
past its window (a late event in the very next batch still lands — measured:
it merged into state with numRowsDroppedByWatermark=0)."""

from __future__ import annotations

import os
import tempfile
from datetime import datetime, timedelta

from pyspark.sql import functions as F


def _write_file(spark, rows, out_dir: str, name: str, mtime: int) -> None:
    tmp = tempfile.mkdtemp()
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, value double")
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    src = next(f for f in os.listdir(tmp) if f.endswith(".parquet"))
    dst = os.path.join(out_dir, name)
    os.rename(os.path.join(tmp, src), dst)
    os.utime(dst, (mtime, mtime))


def test_late_event_dropped_by_watermark(spark):
    t0 = datetime(2024, 6, 1, 12, 0, 0)
    replay = tempfile.mkdtemp(prefix="kgforge_late_")

    # batch 0: on-time events; high-water mark reaches t0+30
    _write_file(
        spark,
        [
            (1, t0 + timedelta(minutes=1), 1.0),
            (2, t0 + timedelta(minutes=2), 1.0),
            (3, t0 + timedelta(minutes=30), 1.0),
        ],
        replay,
        "part-0001.parquet",
        1_700_000_000,
    )
    # batch 1: advances the watermark well past the [t0, t0+10) window
    _write_file(
        spark, [(4, t0 + timedelta(minutes=80), 1.0)], replay,
        "part-0002.parquet", 1_700_000_001,
    )
    # batch 2: the LATE event (value=100) — must be dropped — plus a fresh one
    _write_file(
        spark,
        [
            (5, t0 + timedelta(minutes=5), 100.0),
            (6, t0 + timedelta(minutes=150), 1.0),
        ],
        replay,
        "part-0003.parquet",
        1_700_000_002,
    )

    stream = (
        spark.readStream.schema("event_id long, ts timestamp, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(replay)
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "10 minutes"))
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total"))
        .select(F.col("window.start").alias("wstart"), "n", "total")
    )
    ckpt = tempfile.mkdtemp(prefix="kgforge_ckpt_")
    q = (
        agg.writeStream.format("memory")
        .queryName("late_test")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    dropped = sum(
        p["stateOperators"][0].get("numRowsDroppedByWatermark", 0)
        for p in q.recentProgress
        if p["stateOperators"]
    )
    got = {r["wstart"]: (r["n"], r["total"]) for r in spark.table("late_test").collect()}

    assert dropped == 1  # exactly the late event
    # the [t0, t0+10) window closed with ONLY the two on-time events
    assert got[t0] == (2, 2.0)
    assert all(total < 100 for _, total in got.values())
