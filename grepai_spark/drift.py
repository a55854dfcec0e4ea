"""W3 — drift-gated hierarchy re-placement.

The reference re-places a file in the hierarchy ONLY when its feature set
drifted enough: drift = 1 - Jaccard(old feature word set, new feature word
set), re-place iff drift >= threshold (default 0.35)
(/root/reference/rpg/evolver.go:179-231; calculateDrift
rpg/evolver.go:325-345; DefaultRPGDriftThreshold config/config.go:48,440).

Graft: a conversation's "hierarchy placement" is its modal feature cluster
(aggs.modal_cluster_per_conv = the subcategory assignment). On an
incremental update the placement only moves if the conversation's
verb-object feature words drifted >= threshold — churn damping so tiny
wording edits don't reshuffle the hierarchy. Pure groupBy + one full-outer
join on conv_id: both sides shuffle once on a uniform key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from grepai_spark.naming import first_token_sql, verb_object_col_staged

DRIFT_THRESHOLD = 0.35  # ref: DefaultRPGDriftThreshold, config/config.go:48,440


def annotate_mentions(mentions: DataFrame) -> DataFrame:
    """Stage the two per-mention derivations drift needs — the verb-object
    `feature` label and the `cluster` (first normalized token) — as columns
    in ONE projection, so a caller can materialize the annotated frame once
    and every downstream aggregation (feature words x modal cluster x both
    sides) reads stored columns instead of re-running the labeling."""
    return verb_object_col_staged(mentions, "mention").withColumn(
        "cluster", F.expr(first_token_sql("mention"))
    )


def conv_feature_words(mentions: DataFrame) -> DataFrame:
    """(conv_id, words): the atomicWordSet analog (ref rpg/features.go:148-160)
    — distinct words of all verb-object feature labels per conversation."""
    feats = (
        mentions
        if "feature" in mentions.columns  # pre-annotated (annotate_mentions)
        else verb_object_col_staged(mentions, "mention")
    )
    return feats.groupBy("conv_id").agg(
        F.array_sort(
            F.array_distinct(
                F.flatten(F.collect_set(F.split(F.col("feature"), "-")))
            )
        ).alias("words")
    )


def feature_drift(
    old_mentions: DataFrame, new_mentions: DataFrame
) -> DataFrame:
    """(conv_id, drift): calculateDrift per conversation over a full-outer
    join — 0.0 if both word sets empty/absent, 1.0 if exactly one is,
    else 1 - Jaccard."""
    ow = conv_feature_words(old_mentions).withColumnRenamed("words", "ow")
    nw = conv_feature_words(new_mentions).withColumnRenamed("words", "nw")
    j = ow.join(nw, "conv_id", "full_outer")
    o = F.coalesce(F.col("ow"), F.expr("array()"))
    n = F.coalesce(F.col("nw"), F.expr("array()"))
    drift = (
        F.when((F.size(o) == 0) & (F.size(n) == 0), F.lit(0.0))
        .when((F.size(o) == 0) | (F.size(n) == 0), F.lit(1.0))
        .otherwise(
            1.0
            - F.size(F.array_intersect(o, n))
            / F.size(F.array_union(o, n)).cast("double")
        )
    )
    return j.select("conv_id", F.round(drift, 6).alias("drift"))


def drift_gated_placements_parity(
    mentions_annotated: DataFrame, threshold: float = DRIFT_THRESHOLD
) -> DataFrame:
    """Specialized :func:`drift_gated_placements` for the incremental
    stand-in evaluation where old = the even-turn filter of new (the
    driver's drift query): because both sides are parity slices of ONE
    table, every per-side aggregation fuses into a conditional aggregate —
    one exchange computes both sides' cluster counts, one computes both
    word sets — instead of four independent aggregation subtrees over the
    same input (measured ~1.9 s -> ~0.8 s of stage overhead at sf0.1).

    Input must be annotated (:func:`annotate_mentions`) and SHOULD be
    materialized by the caller. Row-for-row equal to
    ``drift_gated_placements(m.where(turn_idx % 2 == 0), m)`` — locked by
    tests/test_drift.py::test_parity_path_matches_general_path:

    * cluster counts: per (conv, cluster), the even-row count and the
      all-row count come from one conditional aggregate; clusters with no
      even rows are filtered (they would not exist in the old side's
      aggregate), and the same (cnt desc, cluster asc) top-1 window runs
      over each projection.
    * word sets: collect_set(CASE WHEN even THEN split(feature)) collects
      exactly the old side's distinct arrays (collect_set skips NULLs);
      the all-row set is the new side's. Flatten+distinct+sort as before.
    * old is a subset of new, so the general full_outer join degenerates to
      per-conv columns of one aggregate; a conv with no even mentions gets
      an empty old word set -> drift 1.0, exactly the general path's
      missing-row coalesce.
    """
    from pyspark.sql import Window

    m = mentions_annotated
    is_even = F.col("turn_idx") % 2 == 0
    split_f = F.split(F.col("feature"), "-")

    # ONE exchange over the mention table computes every per-side input:
    # cluster counts (all / even) and per-cluster word-array sets; the
    # conv-level word merge below aggregates this already-tiny table.
    per_cluster = m.groupBy("conv_id", "cluster").agg(
        F.count("*").alias("cnt_all"),
        F.sum(F.when(is_even, 1).otherwise(0)).alias("cnt_even"),
        F.collect_set(split_f).alias("sets_all"),
        F.collect_set(F.when(is_even, split_f)).alias("sets_even"),
    )
    counts = per_cluster.localCheckpoint(eager=True)
    w = Window.partitionBy("conv_id").orderBy(
        F.desc("cnt"), F.asc("cluster")
    )
    nc = (
        counts.select("conv_id", "cluster", F.col("cnt_all").alias("cnt"))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("conv_id", F.col("cluster").alias("new_cluster"))
    )
    oc = (
        counts.where(F.col("cnt_even") > 0)
        .select("conv_id", "cluster", F.col("cnt_even").alias("cnt"))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("conv_id", F.col("cluster").alias("old_cluster"))
    )
    # distinct word arrays per conv == distinct over the union of the
    # per-cluster distinct sets (array_distinct runs after the flatten)
    words = counts.groupBy("conv_id").agg(
        F.flatten(F.collect_list("sets_even")).alias("sets_even"),
        F.flatten(F.collect_list("sets_all")).alias("sets_all"),
    )
    o = F.array_sort(F.array_distinct(F.flatten(F.col("sets_even"))))
    n = F.array_sort(F.array_distinct(F.flatten(F.col("sets_all"))))
    drift = (
        F.when((F.size(o) == 0) & (F.size(n) == 0), F.lit(0.0))
        .when((F.size(o) == 0) | (F.size(n) == 0), F.lit(1.0))
        .otherwise(
            1.0
            - F.size(F.array_intersect(o, n))
            / F.size(F.array_union(o, n)).cast("double")
        )
    )
    d = words.select("conv_id", F.round(drift, 6).alias("drift"))
    j = nc.join(oc, "conv_id", "left").join(d, "conv_id", "left")
    replace = F.col("old_cluster").isNull() | (
        F.col("drift") >= F.lit(threshold)
    )
    return j.select(
        "conv_id",
        F.when(replace, F.col("new_cluster"))
        .otherwise(F.col("old_cluster"))
        .alias("cluster"),
        F.coalesce("drift", F.lit(1.0)).alias("drift"),
        replace.alias("replaced"),
    )


def drift_gated_placements(
    old_mentions: DataFrame,
    new_mentions: DataFrame,
    threshold: float = DRIFT_THRESHOLD,
    materialize_inputs: bool = True,
) -> DataFrame:
    """Per-conversation placement after an incremental update
    (ref ensureFileHierarchyPlacement, rpg/evolver.go:179-231):

    * new conversation (no old placement)  -> place at the new cluster
    * drift >= threshold                   -> re-place at the new cluster
    * drift <  threshold                   -> KEEP the old placement

    Output: (conv_id, cluster, drift, replaced boolean).

    Each side feeds TWO aggregations (feature words + modal cluster); Spark
    re-executes a shared subplan per consumer, so mention inputs that are
    themselves UDF-derived would run the detector twice per side. The
    default path annotates each side (:func:`annotate_mentions`) and
    localCheckpoints the ANNOTATED frame, so the detector AND the
    verb-object labeling each run once per side and the four aggregations
    read stored columns. In production the old side is a STORED table, so
    this only matters when both sides are derived in one query; a caller
    that derives old from new by a filter should annotate + checkpoint
    once itself and pass ``materialize_inputs=False`` (one labeling pass
    total — see the driver's drift query).
    """
    from grepai_spark.aggs import modal_cluster_per_conv

    if materialize_inputs:
        old_mentions = annotate_mentions(old_mentions).localCheckpoint(
            eager=True
        )
        new_mentions = annotate_mentions(new_mentions).localCheckpoint(
            eager=True
        )

    oc = modal_cluster_per_conv(old_mentions).select(
        "conv_id", F.col("cluster").alias("old_cluster")
    )
    nc = modal_cluster_per_conv(new_mentions).select(
        "conv_id", F.col("cluster").alias("new_cluster")
    )
    d = feature_drift(old_mentions, new_mentions)
    j = (
        nc.join(oc, "conv_id", "left")
        .join(d, "conv_id", "left")
    )
    replace = F.col("old_cluster").isNull() | (
        F.col("drift") >= F.lit(threshold)
    )
    return j.select(
        "conv_id",
        F.when(replace, F.col("new_cluster"))
        .otherwise(F.col("old_cluster"))
        .alias("cluster"),
        F.coalesce("drift", F.lit(1.0)).alias("drift"),
        replace.alias("replaced"),
    )
