"""W3 drift-gated re-placement (ref rpg/evolver.go:179-231,325-345)."""

from __future__ import annotations

from grepai_spark.drift import (
    DRIFT_THRESHOLD,
    drift_gated_placements,
    feature_drift,
)


def _mentions(spark, rows):
    return spark.createDataFrame(rows, "conv_id string, mention string")


def test_drift_zero_and_one(spark):
    old = _mentions(spark, [("c1", "FetchData"), ("c2", "MergeSort")])
    new = _mentions(spark, [("c1", "FetchData"), ("c3", "HashJoin")])
    d = {r["conv_id"]: r["drift"] for r in feature_drift(old, new).collect()}
    assert d["c1"] == 0.0      # identical word set
    assert d["c2"] == 1.0      # disappeared entirely
    assert d["c3"] == 1.0      # brand new


def test_below_threshold_keeps_old_placement(spark):
    # old: modal cluster 'fetch' (2 fetch vs 1 merge); new flips the counts,
    # but the WORD SET is identical -> drift 0 < 0.3 -> placement stays
    old = _mentions(
        spark,
        [("c1", "FetchData"), ("c1", "fetch_data"), ("c1", "MergeSort")],
    )
    new = _mentions(
        spark,
        [("c1", "FetchData"), ("c1", "MergeSort"), ("c1", "merge_sort")],
    )
    out = drift_gated_placements(old, new).collect()[0]
    assert out["drift"] < DRIFT_THRESHOLD
    assert out["replaced"] is False
    assert out["cluster"] == "fetch"  # old modal cluster retained


def test_above_threshold_replaces(spark):
    old = _mentions(spark, [("c1", "FetchData"), ("c1", "fetch_data")])
    new = _mentions(spark, [("c1", "HashJoin"), ("c1", "hash_join")])
    out = drift_gated_placements(old, new).collect()[0]
    assert out["drift"] >= DRIFT_THRESHOLD
    assert out["replaced"] is True
    assert out["cluster"] == "hash"  # re-placed at the new modal cluster


def test_new_conversation_always_placed(spark):
    old = _mentions(spark, [("c1", "FetchData")])
    new = _mentions(spark, [("c1", "FetchData"), ("c9", "MergeSort")])
    got = {
        r["conv_id"]: (r["cluster"], r["replaced"])
        for r in drift_gated_placements(old, new).collect()
    }
    assert got["c9"] == ("merge", True)
    assert got["c1"] == ("fetch", False)
