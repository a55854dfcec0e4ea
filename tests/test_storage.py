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


def test_replace_by_scope_clears_rows_the_update_no_longer_produces(
    spark, tmp_path
):
    """The semantic difference from merge_by_key: a redelivered scope unit's
    STALE derived rows (keys the new extraction does not emit — including
    the all-of-them case) must vanish, while untouched partitions keep
    their files byte-identical on disk."""
    cat = Catalog(spark, str(tmp_path / "cat"))
    rows = [(0, "a", 1, "x"), (0, "a", 2, "y"), (0, "b", 1, "z"),
            (1, "c", 1, "w"), (1, "c", 2, "v")]
    df = spark.createDataFrame(rows, "bucket int, unit string, k int, v string")
    cat.overwrite("t", df, partition_by=["bucket"])

    table_dir = cat.path("t")
    before = {
        f"{e}/{f}": os.path.getmtime(os.path.join(table_dir, e, f))
        for e in os.listdir(table_dir) if e.startswith("bucket=")
        for f in os.listdir(os.path.join(table_dir, e)) if f.endswith(".parquet")
    }

    # unit 'a' redelivered: now yields ONE row with a new key; unit 'b'
    # redelivered with ZERO rows
    scope = spark.createDataFrame(
        [(0, "a"), (0, "b")], "bucket int, unit string"
    )
    upd = spark.createDataFrame(
        [(0, "a", 9, "new")], "bucket int, unit string, k int, v string"
    )
    cat.replace_by_scope("t", upd, scope, ["bucket", "unit"],
                         partition_by=["bucket"])

    got = sorted(
        tuple(r)
        for r in cat.read("t").select("bucket", "unit", "k", "v").collect()
    )
    assert got == sorted(
        [(0, "a", 9, "new"), (1, "c", 1, "w"), (1, "c", 2, "v")]
    )
    # bucket=1 untouched on disk
    after = {
        f"{e}/{f}": os.path.getmtime(os.path.join(table_dir, e, f))
        for e in os.listdir(table_dir) if e.startswith("bucket=")
        for f in os.listdir(os.path.join(table_dir, e)) if f.endswith(".parquet")
    }
    for k, m in before.items():
        if k.startswith("bucket=1/"):
            assert after.get(k) == m, f"clean partition rewritten: {k}"


def test_replace_by_scope_creates_and_falls_back(spark, tmp_path):
    """Missing table -> plain overwrite; unpartitioned table -> row-level
    anti-join fallback."""
    cat = Catalog(spark, str(tmp_path / "cat2"))
    scope = spark.createDataFrame([("a",)], "unit string")
    upd = spark.createDataFrame([("a", 1)], "unit string, k int")
    cat.replace_by_scope("t", upd, scope, ["unit"])
    assert [tuple(r) for r in cat.read("t").collect()] == [("a", 1)]

    # unpartitioned fallback: replace unit 'a' wholesale
    upd2 = spark.createDataFrame([("a", 7)], "unit string, k int")
    cat.replace_by_scope("t", upd2, scope, ["unit"])
    assert [tuple(r) for r in cat.read("t").collect()] == [("a", 7)]


def test_replace_by_scope_empties_a_partition_whose_rows_all_left(
    spark, tmp_path
):
    """Round-6 regression: when EVERY row of a dirty partition belongs to
    the replaced scope and the new extraction yields nothing there, the
    partition must be swapped to EMPTY — Spark writes no subdir for an
    empty partition, so without the ensure= backstop the stale files
    would silently stay live."""
    cat = Catalog(spark, str(tmp_path / "cat3"))
    rows = [(0, "solo", 1, "stale"), (1, "other", 1, "keep")]
    df = spark.createDataFrame(rows, "bucket int, unit string, k int, v string")
    cat.overwrite("t", df, partition_by=["bucket"])

    # unit 'solo' (the ONLY occupant of bucket 0) redelivered with nothing
    scope = spark.createDataFrame([(0, "solo")], "bucket int, unit string")
    upd = spark.createDataFrame(
        [], "bucket int, unit string, k int, v string"
    )
    cat.replace_by_scope("t", upd, scope, ["bucket", "unit"],
                         partition_by=["bucket"])
    got = sorted(
        tuple(r)
        for r in cat.read("t").select("bucket", "unit", "k", "v").collect()
    )
    assert got == [(1, "other", 1, "keep")]


def test_replace_by_scope_sequential_model(spark, tmp_path):
    """Model check: 8 seeded random scope-replacements applied to one
    catalog must track a plain dict model exactly — covers re-emptied and
    re-populated partitions, repeated scope units, and updates whose rows
    land in multiple buckets."""
    import random

    rng = random.Random(42)
    cat = Catalog(spark, str(tmp_path / "model"))
    units = [("u%d" % i, i % 3) for i in range(7)]  # unit -> bucket
    model: dict[tuple, str] = {}

    for step in range(8):
        scoped = rng.sample(units, rng.randrange(1, len(units) + 1))
        scope_rows = [(b, u) for u, b in scoped]
        upd_rows = []
        for u, b in scoped:
            for k in range(rng.randrange(0, 3)):
                upd_rows.append((b, u, k, f"v{step}"))
        # apply to the model: drop every scoped unit's rows, insert news
        for key in [k for k in model if (k[1], k[0]) in [(u, b) for u, b in scoped]]:
            del model[key]
        for b, u, k, v in upd_rows:
            model[(b, u, k)] = v

        scope = spark.createDataFrame(scope_rows, "bucket int, unit string")
        upd = spark.createDataFrame(
            upd_rows, "bucket int, unit string, k int, v string"
        )
        cat.replace_by_scope(
            "t", upd, scope, ["bucket", "unit"], partition_by=["bucket"]
        )
        if not model:
            continue  # fully-empty table: parquet scan has no schema source
        got = {
            (r["bucket"], r["unit"], r["k"]): r["v"]
            for r in cat.read("t").collect()
        }
        assert got == model, f"diverged at step {step}"
