"""End-to-end KG-construction pipeline: EXTRACT -> LINK -> CANON -> MATERIALIZE.

Orchestrates the stage modules over a transcripts DataFrame, with per-bucket
lineage checkpoints so a killed run resumes idempotently (north_rule). The
analog of the reference's full index build
(Indexer.IndexAll -> trace extract -> RPG BuildFull,
/root/reference/cli/watch.go:750-860, indexer/indexer.go:94).

Stage boundaries = shuffle boundaries; every stage's output merges into a
bucket-partitioned table so re-running overwrites exactly the recomputed
buckets (Iceberg: overwritePartitions).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from grepai_spark import cc, extract, link, lineage, materialize
from grepai_spark.storage import Catalog


class InjectedFailure(RuntimeError):
    """Raised by tests to simulate a mid-run kill."""


def kg_edges_df(
    spark: SparkSession,
    transcripts: DataFrame,
    alias_dict: DataFrame,
    use_lsh: bool = False,
) -> DataFrame:
    """Pure-DataFrame end-to-end edge derivation (no table writes) — the
    flagship query: EXTRACT -> LINK -> CANON -> triples, FUSED.

    The linking + canonicalization product is dictionary-scale, so it
    collapses to an alias -> (pred, entity_id) map computed once on the
    driver (two tiny jobs) and broadcast to the edge-detector UDF. The
    corpus-scale plan is then ONE narrow map over transcripts: call edges
    come from an inline array filter on the `tool` column, mention/does
    edges from the UDF (per-turn distinct inside the batch), one explode —
    no shuffle anywhere and a single scan. The only exchange the previous
    shape had (dropDuplicates over all mention triples) was a within-turn
    dedup in disguise; fusing it into the UDF removes it entirely. The
    bucketed, lineage-checkpointed variant of the same stages lives in
    :func:`run` (the resumable path).
    """
    return kg_edges_from_map(
        transcripts, alias_entity_map(alias_dict, use_lsh)
    )


# alias_entity_map results keyed by dictionary content signature: the map
# is a pure function of the dictionary, and its contract is "computed once
# per dictionary version" — without the memo every derivation in a serving
# process (each query of a session, each bench pass) re-runs linking + CC,
# a fixed multi-job driver-side cost that at corpus scale is pure serial
# fraction. The reference equivalently LOADS its persisted symbol maps
# instead of re-indexing (rpg/persistence.go). Values are plain dicts (no
# Spark handles), so entries stay valid across sessions in one process.
_AMAP_MEMO: dict[tuple[int, int, bool], dict[str, tuple[str, str]]] = {}


# dictionaries up to this size resolve the map fully on the driver (the
# dictionary is a collectable broadcast-side dimension by design; the old
# path collected it wholesale anyway for the detector broadcast)
_SMALL_DICT_ROWS = 100_000


def alias_entity_map(
    alias_dict: DataFrame, use_lsh: bool = False
) -> dict[str, tuple[str, str]]:
    """alias -> (pred, entity_id): the dictionary-scale product of linking +
    canonicalization, computed ONCE per run/dictionary version (memoized on
    a content signature across calls) and shipped to executors via
    SparkContext.broadcast (inside make_edge_detector) — the reference's
    in-memory symbol maps (rpg/indexer.go:527).

    r7: for collectable dictionaries the signature is hashed on the driver
    from ONE limit-collect (the previous per-call signature was its own
    aggregate job — pure serial overhead on every kg_edges derivation), and
    on a memo miss the final alias->entity join happens driver-side too.
    """
    import hashlib

    from grepai_spark.dimcache import cached_rows

    rows = cached_rows(alias_dict)
    if len(rows) <= _SMALL_DICT_ROWS:
        h = hashlib.sha256()
        for r in sorted(
            (r["alias"], r["canonical_id"], r["kind"]) for r in rows
        ):
            h.update("\x01".join(r).encode())
            h.update(b"\x00")
        key = (len(rows), h.hexdigest(), use_lsh)
        cached = _AMAP_MEMO.get(key)
        if cached is not None:
            return cached
        sim = (
            link.alias_similarity_edges_lsh(alias_dict)
            if use_lsh
            else link.alias_similarity_edges(alias_dict)
        )
        cdict = {
            r[0]: r[1]
            for r in cached_rows(cc.canonical_map(alias_dict, sim))
        }
        amap = {
            r["alias"]: (
                "does" if r["kind"] == "action" else "mentions",
                cdict[r["canonical_id"]],
            )
            for r in rows
            if r["kind"] in ("entity", "action")
        }
        _AMAP_MEMO[key] = amap
        return amap

    # large-dictionary regime: order-insensitive content signature; mod a
    # prime keeps the ANSI-mode sum overflow-free (same discipline as
    # lineage.bucket_content_hashes)
    sig = alias_dict.agg(
        F.count("*").alias("n"),
        F.sum(
            F.xxhash64("alias", "canonical_id", "kind") % F.lit(1_000_000_007)
        ).alias("h"),
    ).first()
    key = (sig["n"], sig["h"], use_lsh)
    cached = _AMAP_MEMO.get(key)
    if cached is not None:
        return cached
    sim = (
        link.alias_similarity_edges_lsh(alias_dict)
        if use_lsh
        else link.alias_similarity_edges(alias_dict)
    )
    cmap = cc.canonical_map(alias_dict, sim)
    rows = (
        alias_dict.where(F.col("kind").isin("entity", "action"))
        .join(cmap, "canonical_id")
        .select("alias", "kind", "entity_id")
        .collect()
    )
    amap = {
        r["alias"]: (
            "does" if r["kind"] == "action" else "mentions",
            r["entity_id"],
        )
        for r in rows
    }
    _AMAP_MEMO[key] = amap
    return amap


def kg_edges_from_map(
    transcripts: DataFrame, amap: dict[str, tuple[str, str]]
) -> DataFrame:
    """The corpus-scale half of the fused plan — usable on batch AND
    streaming DataFrames (it is a pure narrow map, so it is trivially
    streamable)."""
    detect_edges = extract.make_edge_detector(amap)
    # call edge as a 0/1-element array: filter() keeps the struct type
    # without CASE branches whose empty array() would type-clash
    call_arr = F.expr(
        "filter(array(named_struct('pred', 'calls', 'obj', tool)),"
        " x -> x.obj IS NOT NULL AND x.obj <> '')"
    )
    combined = F.concat(call_arr, detect_edges(F.col("text")))
    return transcripts.select(
        "conv_id", "turn_idx", "role", F.explode(combined).alias("e")
    ).select(
        F.col("role").alias("subj"),
        F.col("e.pred").alias("pred"),
        F.col("e.obj").alias("obj"),
        "conv_id",
        "turn_idx",
        F.lit(1.0).cast("float").alias("weight"),
    )


def kg_vertices_df(
    spark: SparkSession, alias_dict: DataFrame
) -> DataFrame:
    sim = link.alias_similarity_edges(alias_dict)
    cmap = cc.canonical_map(alias_dict, sim)
    return materialize.build_vertices(alias_dict, cmap)


@dataclass
class PipelineResult:
    edges: DataFrame
    vertices: DataFrame
    counters: dict[str, int] = field(default_factory=dict)


def run(
    spark: SparkSession,
    transcripts: DataFrame,
    alias_dict: DataFrame,
    out_dir: str,
    n_buckets: int = 16,
    fail_after: str | None = None,
    use_lsh: bool = False,
    embed: bool = False,
) -> PipelineResult:
    catalog = Catalog(spark, out_dir)
    counters: dict[str, int] = {}

    tb = lineage.with_bucket(transcripts, n_buckets)
    hashes = lineage.bucket_content_hashes(tb).localCheckpoint(eager=True)

    # ---- stage: mentions (extract + exact link), per-bucket resumable ------
    pending = lineage.pending_buckets(catalog, "mentions", hashes)
    pending_ids = [r["bucket"] for r in pending.select("bucket").collect()]
    counters["mentions_buckets_pending"] = len(pending_ids)
    if pending_ids:
        sub = tb.where(F.col("bucket").isin(pending_ids))
        mentions = extract.detect_mentions(sub, alias_dict)
        linked = link.link_mentions_exact(mentions, alias_dict)
        linked = lineage.with_bucket(linked, n_buckets)
        catalog.merge_by_key(
            "mentions_linked",
            linked.select(
                "bucket",
                "conv_id",
                "turn_idx",
                "role",
                "mention",
                "pos",
                "kind",
                "canonical_id",
            ),
            ["bucket"],
            partition_by=["bucket"],
        )
        out_counts = linked.groupBy("bucket").agg(
            F.count("*").alias("rows_out")
        )
        lineage.mark_done(catalog, "mentions", pending, out_counts)
    if fail_after == "mentions":
        raise InjectedFailure("killed after mentions stage")

    # ---- stage 1b: embeddings (content-hash cached), per-bucket resumable --
    if embed:
        from grepai_spark import embed as embed_mod

        pending_v = lineage.pending_buckets(catalog, "vectors", hashes)
        pending_v_ids = [
            r["bucket"] for r in pending_v.select("bucket").collect()
        ]
        counters["vectors_buckets_pending"] = len(pending_v_ids)
        if pending_v_ids:
            sub = tb.where(F.col("bucket").isin(pending_v_ids))
            vec, embed_counters = embed_mod.embed_with_cache(catalog, sub)
            counters.update(
                {f"embed_{k}": v for k, v in embed_counters.items()}
            )
            if fail_after == "embed_cache":
                # crash point BETWEEN the cache merge (already committed
                # inside embed_with_cache) and the vectors merge below: the
                # re-run must converge to the same turn_vectors table with
                # zero re-encoding (test_pipeline locks this)
                raise InjectedFailure(
                    "killed between cache merge and vectors merge"
                )
            catalog.merge_by_key(
                "turn_vectors",
                vec.select(
                    "bucket", "conv_id", "turn_idx", "content_hash", "vector"
                ),
                ["bucket"],
                partition_by=["bucket"],
            )
            out_counts = vec.groupBy("bucket").agg(
                F.count("*").alias("rows_out")
            )
            lineage.mark_done(catalog, "vectors", pending_v, out_counts)
    if fail_after == "embed":
        raise InjectedFailure("killed after embed stage")

    # ---- stage: canonicalization (dictionary-level, cheap, global) ---------
    sim = (
        link.alias_similarity_edges_lsh(alias_dict)
        if use_lsh
        else link.alias_similarity_edges(alias_dict)
    )
    cmap = cc.canonical_map(alias_dict, sim).localCheckpoint(eager=True)
    counters["canonical_entities"] = cmap.select("entity_id").distinct().count()
    if fail_after == "canonicalize":
        raise InjectedFailure("killed after canonicalize stage")

    # ---- stage: edges (materialize), per-bucket resumable ------------------
    pending_e = lineage.pending_buckets(catalog, "edges", hashes)
    pending_e_ids = [r["bucket"] for r in pending_e.select("bucket").collect()]
    counters["edges_buckets_pending"] = len(pending_e_ids)
    if pending_e_ids:
        sub = tb.where(F.col("bucket").isin(pending_e_ids))
        calls = extract.call_triples(sub)
        ml = catalog.read("mentions_linked").where(
            F.col("bucket").isin(pending_e_ids)
        )
        ment = materialize.mention_triples(ml, cmap)
        edges = materialize.build_edges(calls, ment)
        edges_b = lineage.with_bucket(edges, n_buckets)
        catalog.merge_by_key(
            "edges",
            edges_b.select(
                "bucket", "subj", "pred", "obj", "conv_id", "turn_idx", "weight"
            ),
            ["bucket"],
            partition_by=["bucket"],
        )
        out_counts = edges_b.groupBy("bucket").agg(
            F.count("*").alias("rows_out")
        )
        lineage.mark_done(catalog, "edges", pending_e, out_counts)
        # maintain the graph-query plane's stored adjacency + degree census
        # whenever the edge table changed (stores.py) — the indexer writes
        # the artifacts the query plane reads; rebuilding them per query
        # was the round-4 scale anti-pattern
        from grepai_spark import stores

        stores.build_graph_artifacts(
            catalog, catalog.read("edges").drop("bucket")
        )

    # ---- stage: vertices (global, dictionary-scale) -------------------------
    vertices = materialize.build_vertices(alias_dict, cmap)
    catalog.overwrite("vertices", vertices)

    edges_out = catalog.read("edges").drop("bucket")
    vertices_out = catalog.read("vertices")
    counters["edges"] = edges_out.count()
    counters["vertices"] = vertices_out.count()

    # ---- metrics sink (S8 analog: stats NDJSON -> a small metrics table) ---
    # append-only run log (the reference's stats recorder appends NDJSON,
    # stats/recorder.go): each run adds its counter snapshot — O(new rows),
    # never a table rewrite; readers take the latest run_ts per metric
    metrics = spark.createDataFrame(
        [(k, int(v)) for k, v in sorted(counters.items())],
        "metric string, value long",
    ).withColumn("run_ts", F.current_timestamp())
    catalog.append("metrics", metrics)

    return PipelineResult(edges=edges_out, vertices=vertices_out, counters=counters)


def latest_metrics(catalog: Catalog) -> DataFrame:
    """Latest-run view over the append-only metrics log — the documented
    dedup rule for the S8 table contract (ADVICE r3): the metrics table is
    one row PER RUN per metric (append-only history, like the reference's
    NDJSON stats log, stats/recorder.go); consumers wanting current values
    take the max run_ts per metric, which is exactly this view."""
    from pyspark.sql import Window

    m = catalog.read("metrics")
    w = Window.partitionBy("metric").orderBy(F.desc("run_ts"))
    return (
        m.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )
