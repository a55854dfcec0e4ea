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


def test_parity_path_matches_general_path(spark):
    """The r7 fused parity path (old = even-turn slice of new, one
    conditional aggregate per side-pair) must emit exactly the rows of the
    general two-sided operator on the sf0.001 corpus."""
    from pyspark.sql import functions as F

    from grepai_spark.drift import (
        annotate_mentions,
        drift_gated_placements_parity,
    )
    from grepai_spark.extract import detect_mentions
    from grepai_spark.synth import alias_dict_df, load_transcripts

    t = load_transcripts(spark, "/root/testdata/sf0.001")
    m = annotate_mentions(
        detect_mentions(t, alias_dict_df(spark))
    ).localCheckpoint(eager=True)
    old = m.where(F.col("turn_idx") % 2 == 0)
    general = {
        tuple(r)
        for r in drift_gated_placements(
            old, m, materialize_inputs=False
        ).collect()
    }
    fused = {
        tuple(r) for r in drift_gated_placements_parity(m).collect()
    }
    assert fused == general and len(fused) > 0
