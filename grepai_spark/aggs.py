"""Aggregation + hierarchy operators (SURVEY.md §2.8/§2.10/§2.11).

A1 feature frequency top-N   (ref: /root/reference/rpg/features.go:64-104,
                              topN rpg/hierarchy.go:494-514)
A2 modal cluster per conv    (ref: rpg/hierarchy.go:207-244)
A3 level rollups             (ref: rpg/hierarchy.go:450-491)
A4 index stats               (ref: store/gob.go:247-270, trace/store.go:515-541)
H1-H3 hierarchy build        (ref: rpg/hierarchy.go:41-152,346-376)

All plain groupBy/window aggregations with deterministic tie-breaks
(count desc, name asc — mirroring the reference's sorted iteration).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from grepai_spark.naming import first_token_sql, norm_key_sql


def feature_freq_topn(mentions: DataFrame, n: int = 10) -> DataFrame:
    """Top-N mention surfaces by frequency, ties broken by name (A1)."""
    counts = mentions.groupBy("mention").agg(F.count("*").alias("cnt"))
    w = Window.orderBy(F.desc("cnt"), F.asc("mention"))
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= n)
        .select("mention", "cnt", "rank")
    )


def modal_cluster_per_conv(mentions: DataFrame) -> DataFrame:
    """Most frequent mention cluster (first normalized token) per conversation
    (A2) — rank-1 window with deterministic ties."""
    clustered = (
        mentions
        if "cluster" in mentions.columns  # pre-annotated (drift hot path)
        else mentions.withColumn("cluster", F.expr(first_token_sql("mention")))
    )
    counts = clustered.groupBy("conv_id", "cluster").agg(
        F.count("*").alias("cnt")
    )
    w = Window.partitionBy("conv_id").orderBy(
        F.desc("cnt"), F.asc("cluster")
    )
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("conv_id", "cluster", "cnt")
    )


def index_stats(transcripts: DataFrame, edges: DataFrame) -> DataFrame:
    """Corpus + graph totals (A4)."""
    t = transcripts.agg(
        F.countDistinct("conv_id").alias("n_convs"),
        F.count("*").alias("n_turns"),
        F.sum(F.when(F.col("tool") != "", 1).otherwise(0)).alias(
            "n_tool_turns"
        ),
        F.max("ts").alias("last_ts"),
    )
    e = edges.agg(
        F.count("*").alias("n_edges"),
        F.countDistinct("pred").alias("n_preds"),
    )
    return t.crossJoin(e)


def tool_hierarchy(transcripts: DataFrame) -> DataFrame:
    """3-level hierarchy over tools: area (namespace before '.') -> tool ->
    usage counts (H1/H3 analog: ClassifyFile's first-two-dirs rule,
    rpg/hierarchy.go:346-376). One groupBy per level — no recursion, the
    hierarchy has fixed depth like the reference's area/category/subcategory.
    """
    t = transcripts.where(F.col("tool") != "").select(
        F.split(F.col("tool"), r"\.")[0].alias("area"), "tool", "conv_id"
    )
    return (
        t.groupBy("area", "tool")
        .agg(
            F.count("*").alias("n_calls"),
            F.countDistinct("conv_id").alias("n_convs"),
        )
        .orderBy("area", "tool")
    )


def enrich_area_labels(transcripts: DataFrame, top_n: int = 3) -> DataFrame:
    """H4 EnrichLabels analog (/root/reference/rpg/hierarchy.go:425-447):
    each tool area's label gets its top-N tools by call count appended —
    'payments: charge, refund, ...'. Deterministic ordering (count desc,
    name asc) like every reference top-N."""
    # dot-less tools have no (area, short) split; Spark sorts their NULL
    # short first while DuckDB's ORDER BY sorts it last — filter them out
    # identically in operator and oracle so ordering can't diverge
    t = transcripts.where(
        (F.col("tool") != "") & F.col("tool").contains(".")
    ).select(
        F.split(F.col("tool"), r"\.")[0].alias("area"),
        F.split(F.col("tool"), r"\.")[1].alias("short"),
    )
    counts = t.groupBy("area", "short").agg(F.count("*").alias("n_calls"))
    w = Window.partitionBy("area").orderBy(F.desc("n_calls"), F.asc("short"))
    top = counts.withColumn("rn", F.row_number().over(w)).where(
        F.col("rn") <= top_n
    )
    return (
        top.groupBy("area")
        .agg(
            # collect (rn, short) structs and sort: collect_list order is
            # shuffle-dependent, the struct sort restores determinism
            F.array_join(
                F.expr("transform(array_sort(collect_list(struct(rn, short))), s -> s.short)"),
                ", ",
            ).alias("top_tools"),
            F.sum("n_calls").cast("long").alias("n_calls_top"),
        )
        .select(
            "area",
            F.concat_ws(": ", "area", "top_tools").alias("label"),
            "n_calls_top",
        )
    )


def area_summaries(transcripts: DataFrame, top_n: int = 3) -> DataFrame:
    """H5 local-mode summaries (ref GenerateSummary,
    rpg/extractor_local.go:137-166): the deterministic template
    'Provides <name> responsibilities for <top features>.' per tool area,
    built from the same top-N rollup as enrich_area_labels."""
    top = enrich_area_labels(transcripts, top_n)
    feats = F.regexp_replace(
        F.col("label"), r"^[^:]*: ", ""
    )  # strip the 'area: ' prefix to get the joined feature list
    return top.select(
        "area",
        F.concat(
            F.lit("Provides "),
            F.col("area"),
            F.lit(" responsibilities for "),
            feats,
            F.lit("."),
        ).alias("summary"),
    )


def cluster_mentions(mentions: DataFrame) -> DataFrame:
    """H2 ClusterSymbols analog: group mention surfaces by cluster key =
    first normalized token; subcategory label = normalized key."""
    return (
        mentions.withColumn("cluster", F.expr(first_token_sql("mention")))
        .withColumn("norm_key", F.expr(norm_key_sql("mention")))
        .groupBy("cluster", "norm_key")
        .agg(F.count("*").alias("cnt"))
        .orderBy("cluster", "norm_key")
    )
