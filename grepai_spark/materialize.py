"""Stage 4 — MATERIALIZE: canonical vertices + (subj, pred, obj) edges.

Analog of the reference's save-time CallEdge construction
(/root/reference/trace/store.go:194-204) and RPG node/edge persist
(/root/reference/rpg/indexer.go:78-240), re-expressed as two DataFrames
written to partitioned tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def mention_triples(
    linked_mentions: DataFrame, canonical_map: DataFrame
) -> DataFrame:
    """(role)-[:mentions]->(entity) per linked in-text entity mention;
    (role)-[:does]->(action) for action-kind mentions (agent actions).

    canonical_map is tiny (dictionary-sized) -> broadcast join; the big
    mentions side never shuffles.
    """
    cmap = F.broadcast(canonical_map)
    return (
        linked_mentions.where(F.col("canonical_id").isNotNull())
        .join(cmap, "canonical_id")
        .select(
            F.col("role").alias("subj"),
            F.when(F.col("kind") == "action", "does")
            .otherwise("mentions")
            .alias("pred"),
            F.col("entity_id").alias("obj"),
            "conv_id",
            "turn_idx",
            F.lit(1.0).cast("float").alias("weight"),
        )
        .dropDuplicates(["subj", "pred", "obj", "conv_id", "turn_idx"])
    )


def build_edges(
    call_triples: DataFrame, mention_triples: DataFrame
) -> DataFrame:
    """Union of the two branches WITHOUT a final dropDuplicates: the key set
    (subj, pred, obj, conv_id, turn_idx) is already unique — call triples are
    one-per-turn by construction (transcripts are keyed by (conv_id,
    turn_idx)), mention triples dedup internally, and the branches cannot
    collide because their pred domains are disjoint (calls vs mentions/does).
    A final dedup would shuffle the ENTIRE edge set again for nothing — at
    10^12 turns that is the single largest avoidable shuffle in the pipeline.
    """
    return call_triples.unionByName(mention_triples)


def build_vertices(
    alias_dict: DataFrame, canonical_map: DataFrame
) -> DataFrame:
    """One row per canonical entity (post-CC component).

    canonical_name = lexicographic min alias in the component (deterministic
    tie-break, mirroring the reference's sorted-iteration reproducibility,
    /root/reference/rpg/hierarchy.go:46-96).
    """
    joined = alias_dict.join(F.broadcast(canonical_map), "canonical_id")
    return joined.groupBy("entity_id").agg(
        F.min("alias").alias("canonical_name"),
        F.min("kind").alias("kind"),
        F.array_sort(F.collect_set("alias")).alias("aliases"),
    )


CONV_COMENTION_CAP_MIN = 50  # reference's absolute hub guard floor
CONV_COMENTION_CAP_FACTOR = 2.0  # hub = fan-out above 2x the median fan-out


def conv_comention_edges(
    mention_triples: DataFrame,
    hub_cap_min: int = CONV_COMENTION_CAP_MIN,
    hub_cap_factor: float = CONV_COMENTION_CAP_FACTOR,
) -> DataFrame:
    """Conversation-level (conv_a)-[:mentions_with]->(conv_b) edges weighted
    by the number of canonical entities both conversations mention — the
    import-edge derivation analog (distinct cross-file pairs from invoke
    edges, /root/reference/rpg/indexer.go:600-644).

    Hub entities are skipped before pair expansion (the reference's hub
    guard, rpg/indexer.go:23-27): a ubiquitous entity links every
    conversation to every other and carries no signal — and would go
    quadratic at corpus scale. The reference's cap is an absolute constant
    (bounded repo, bounded imports); a corpus-relative cap is needed here
    because "ubiquitous" depends on the corpus — the cap is
    max(hub_cap_min, hub_cap_factor x median entity fan-out), so a
    power-law tail is cut on any corpus while a dense small corpus keeps
    its edges. The median is over the entity fan-out table
    (dictionary-scale — one tiny exact-percentile aggregate, broadcast
    back as a scalar).
    """
    per_conv = (
        mention_triples.where(F.col("pred") == "mentions")
        .select(F.col("obj").alias("entity"), "conv_id")
        .distinct()
    )
    fanout = per_conv.groupBy("entity").agg(
        F.count("*").alias("n_convs")
    )
    med = fanout.agg(F.expr("percentile(n_convs, 0.5)").alias("med"))
    keep = (
        fanout.crossJoin(F.broadcast(med))
        .where(
            F.col("n_convs")
            <= F.greatest(
                F.lit(float(hub_cap_min)),
                F.lit(hub_cap_factor) * F.col("med"),
            )
        )
        .select("entity")
    )
    small = per_conv.join(keep, "entity")
    a = small.alias("a")
    b = small.alias("b")
    return (
        a.join(
            b,
            (F.col("a.entity") == F.col("b.entity"))
            & (F.col("a.conv_id") < F.col("b.conv_id")),
        )
        .groupBy(
            F.col("a.conv_id").alias("subj"),
            F.col("b.conv_id").alias("obj"),
        )
        .agg(F.count("*").alias("n_shared"))
        .select(
            "subj",
            F.lit("mentions_with").alias("pred"),
            "obj",
            F.col("n_shared").cast("float").alias("weight"),
        )
    )


def co_invocation_edges(
    call_triples: DataFrame,
    min_cooccur: int = 2,
    hub_cap: int = 50,
) -> DataFrame:
    """Tools co-invoked within the same conversation — the co-caller affinity
    analog (/root/reference/rpg/indexer.go:820-885): pairs co-occurring >= 2
    times across conversations become weighted edges; conversations invoking
    > hub_cap distinct tools are skipped (the reference's explicit hub guard
    against O(k^2) pair explosion on mega-threads).
    """
    per_conv = (
        call_triples.select("conv_id", F.col("obj").alias("tool"))
        .distinct()
    )
    # hub cap BEFORE the pair self-join — the skew guard must precede the blowup
    fanout = per_conv.groupBy("conv_id").agg(
        F.count("*").alias("n_tools")
    )
    small = per_conv.join(
        fanout.where(F.col("n_tools") <= hub_cap), ["conv_id"]
    )
    a = small.alias("a")
    b = small.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.conv_id") == F.col("b.conv_id"))
            & (F.col("a.tool") < F.col("b.tool")),
        )
        .groupBy(
            F.col("a.tool").alias("subj"), F.col("b.tool").alias("obj")
        )
        .agg(F.count("*").alias("cnt"))
        .where(F.col("cnt") >= min_cooccur)
    )
    return pairs.select(
        "subj",
        F.lit("co_invoked").alias("pred"),
        "obj",
        F.lit("*").alias("conv_id"),
        F.lit(-1).cast("int").alias("turn_idx"),
        F.col("cnt").cast("float").alias("weight"),
    )
