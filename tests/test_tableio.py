"""Snapshot warehouse semantics: atomic commits, time travel, MERGE
idempotence (the Iceberg-emulation layer, SURVEY.md §0.2)."""

from __future__ import annotations

from kgforge.io.tableio import Warehouse


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_snapshot_write_read_roundtrip(spark, tmp_path):
    wh = Warehouse(str(tmp_path))
    df = spark.range(10).withColumnRenamed("id", "k")
    snap = wh.write_snapshot("t", df)
    assert snap == "snap-000001"
    assert _rows(wh.read(spark, "t")) == [(i,) for i in range(10)]


def test_time_travel(spark, tmp_path):
    wh = Warehouse(str(tmp_path))
    wh.write_snapshot("t", spark.range(3).withColumnRenamed("id", "k"))
    wh.write_snapshot("t", spark.range(5).withColumnRenamed("id", "k"))
    assert len(_rows(wh.read(spark, "t"))) == 5
    assert len(_rows(wh.read(spark, "t", snapshot="snap-000001"))) == 3
    manifests = wh.snapshots("t")
    assert [m["snapshot_id"] for m in manifests] == ["snap-000001", "snap-000002"]
    assert manifests[1]["parent"] == "snap-000001"


def test_merge_inserts_only_new_keys(spark, tmp_path):
    wh = Warehouse(str(tmp_path))
    a = spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string")
    b = spark.createDataFrame([(2, "B"), (3, "c")], "k int, v string")
    wh.merge(spark, "t", a, keys=["k"])
    wh.merge(spark, "t", b, keys=["k"])
    got = dict(_rows(wh.read(spark, "t")))
    # insert-if-absent: existing key 2 keeps its original value
    assert got == {1: "a", 2: "b", 3: "c"}


def test_merge_idempotent(spark, tmp_path):
    """Re-merging identical rows is a content no-op — the property that makes
    pipeline restarts safe (reference bot's create-or-update, §2.A A8)."""
    wh = Warehouse(str(tmp_path))
    df = spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string")
    wh.merge(spark, "t", df, keys=["k"])
    before = _rows(wh.read(spark, "t"))
    wh.merge(spark, "t", df, keys=["k"])
    wh.merge(spark, "t", df, keys=["k"])
    assert _rows(wh.read(spark, "t")) == before


def test_merge_dedups_source(spark, tmp_path):
    wh = Warehouse(str(tmp_path))
    df = spark.createDataFrame([(1, "a"), (1, "a2")], "k int, v string")
    wh.merge(spark, "t", df, keys=["k"])
    assert len(_rows(wh.read(spark, "t"))) == 1


def test_latest_pointer_survives_partial_table_state(spark, tmp_path):
    """Readers always see the last committed snapshot; an uncommitted data dir
    (crash before pointer swap) is invisible."""
    wh = Warehouse(str(tmp_path))
    wh.write_snapshot("t", spark.range(4).withColumnRenamed("id", "k"))
    # simulate a crashed writer: data dir exists, manifest+pointer never swapped
    (tmp_path / "t" / "snap-000099").mkdir()
    assert wh.latest_snapshot("t") == "snap-000001"
    assert len(_rows(wh.read(spark, "t"))) == 4
