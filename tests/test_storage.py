"""Catalog merge regimes: atomic partition swap + dirty-partition row merge."""

from __future__ import annotations

import os

from grepai_spark.storage import Catalog


def test_merge_subset_branch_rewrites_only_dirty_partitions(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path / "cat"))
    df = spark.createDataFrame(
        [(0, "a", 1), (0, "b", 2), (1, "c", 3), (2, "d", 4)],
        "bucket int, k string, v int",
    )
    cat.merge_by_key("t", df, ["bucket", "k"], partition_by=["bucket"])
    tdir = cat.path("t")
    assert sorted(
        e for e in os.listdir(tdir) if e.startswith("bucket=")
    ) == ["bucket=0", "bucket=1", "bucket=2"]

    def mtimes(bucket: str) -> dict[str, float]:
        d = os.path.join(tdir, bucket)
        return {
            f: os.path.getmtime(os.path.join(d, f))
            for f in os.listdir(d)
            if f.endswith(".parquet")
        }

    b2_before = mtimes("bucket=2")
    # update touches buckets 0 (upsert existing key) and 1 (new key)
    upd = spark.createDataFrame(
        [(0, "a", 10), (1, "e", 5)], "bucket int, k string, v int"
    )
    cat.merge_by_key("t", upd, ["bucket", "k"], partition_by=["bucket"])

    assert mtimes("bucket=2") == b2_before  # clean partition untouched
    got = {(r["bucket"], r["k"]): r["v"] for r in cat.read("t").collect()}
    assert got == {
        (0, "a"): 10,
        (0, "b"): 2,
        (1, "c"): 3,
        (1, "e"): 5,
        (2, "d"): 4,
    }


def test_merge_partition_key_branch_is_atomic_swap(spark, tmp_path):
    """partition_by == keys: whole-partition replace, other partitions kept."""
    cat = Catalog(spark, str(tmp_path / "cat2"))
    df = spark.createDataFrame(
        [(0, 1), (1, 2)], "bucket int, v int"
    )
    cat.merge_by_key("t", df, ["bucket"], partition_by=["bucket"])
    upd = spark.createDataFrame([(1, 99), (1, 98)], "bucket int, v int")
    cat.merge_by_key("t", upd, ["bucket"], partition_by=["bucket"])
    got = sorted((r["bucket"], r["v"]) for r in cat.read("t").collect())
    assert got == [(0, 1), (1, 98), (1, 99)]
    # no tmp/old debris left beside or inside the table
    debris = [
        e
        for e in os.listdir(str(tmp_path / "cat2"))
        if "__tmp__" in e or "__old__" in e
    ] + [
        e for e in os.listdir(cat.path("t")) if "__tmp__" in e or "__old__" in e
    ]
    assert debris == []


def test_merge_row_level_fallback_unpartitioned(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path / "cat3"))
    df = spark.createDataFrame([("a", 1), ("b", 2)], "k string, v int")
    cat.merge_by_key("t", df, ["k"])
    cat.merge_by_key(
        "t", spark.createDataFrame([("a", 7)], "k string, v int"), ["k"]
    )
    got = {r["k"]: r["v"] for r in cat.read("t").collect()}
    assert got == {"a": 7, "b": 2}


def test_crash_recovery_promotes_staged_new(spark, tmp_path):
    """Crash between displacing the live partition and committing the staged
    one (the window ADVICE r3 flagged): recovery must promote the COMPLETE
    __new__ dir forward, never leave the partition missing."""
    cat = Catalog(spark, str(tmp_path / "cat4"))
    df = spark.createDataFrame([(0, 1), (1, 2)], "bucket int, v int")
    cat.merge_by_key("t", df, ["bucket"], partition_by=["bucket"])
    tdir = cat.path("t")
    # simulate the crash state: bucket=1 displaced to __old__, its staged
    # replacement still under __new__
    os.rename(
        os.path.join(tdir, "bucket=1"), os.path.join(tdir, "bucket=1.__old__aa")
    )
    os.makedirs(os.path.join(tdir, "bucket=1.__new__aa"))
    for f in os.listdir(os.path.join(tdir, "bucket=1.__old__aa")):
        os.link(
            os.path.join(tdir, "bucket=1.__old__aa", f),
            os.path.join(tdir, "bucket=1.__new__aa", f),
        )
    # next Catalog init runs recovery
    cat2 = Catalog(spark, str(tmp_path / "cat4"))
    entries = sorted(e for e in os.listdir(tdir) if e.startswith("bucket="))
    assert entries == ["bucket=0", "bucket=1"]
    got = sorted((r["bucket"], r["v"]) for r in cat2.read("t").collect())
    assert got == [(0, 1), (1, 2)]


def test_crash_recovery_restores_old_and_drops_debris(spark, tmp_path):
    """Remaining crash states: a lone __old__ (live missing, nothing staged)
    is restored; __tmp__ and stale __new__/__old__ beside a live dir are
    deleted — reads after recovery never silently drop a partition."""
    cat = Catalog(spark, str(tmp_path / "cat5"))
    df = spark.createDataFrame([(0, 1), (1, 2), (2, 3)], "bucket int, v int")
    cat.merge_by_key("t", df, ["bucket"], partition_by=["bucket"])
    tdir = cat.path("t")
    os.rename(
        os.path.join(tdir, "bucket=2"), os.path.join(tdir, "bucket=2.__old__bb")
    )
    os.makedirs(os.path.join(tdir, "bucket=0.__new__cc"))  # stale vs live
    os.makedirs(os.path.join(tdir, "bucket=1.__old__dd"))  # stale vs live
    os.makedirs(cat.path("t") + ".__tmp__ee")  # interrupted write
    cat2 = Catalog(spark, str(tmp_path / "cat5"))
    root = str(tmp_path / "cat5")
    debris = [
        e
        for d in (root, tdir)
        for e in os.listdir(d)
        if "__tmp__" in e or "__old__" in e or "__new__" in e
    ]
    assert debris == []
    got = sorted((r["bucket"], r["v"]) for r in cat2.read("t").collect())
    assert got == [(0, 1), (1, 2), (2, 3)]
