"""Per-partition lineage checkpoints — the resume protocol.

Replaces the reference's incremental gates — mod-time gate
(/root/reference/indexer/indexer.go:138-145), content-hash skip
(indexer/indexer.go:161-164, NeedsReindex indexer/indexer.go:726-742) and
"doc without chunks is retried" lost-data rule (indexer/indexer.go:136-141) —
with a lineage table keyed by (stage, bucket):

    lineage(stage, bucket, content_hash, status, rows_in, rows_out, updated_ts)

A bucket is skipped iff a row exists with status='done' AND the same
content_hash (order-insensitive hash of the bucket's input rows). Anything
else — missing, failed, or hash-changed — is recomputed and its output
partition overwritten idempotently. This makes the whole pipeline resumable
mid-run: killing between stages loses at most uncommitted buckets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from grepai_spark.schemas import LINEAGE
from grepai_spark.storage import Catalog

LINEAGE_TABLE = "lineage"


def with_bucket(df: DataFrame, n_buckets: int, key: str = "conv_id") -> DataFrame:
    """Deterministic bucket assignment. xxhash64 is seed-stable across runs and
    cluster sizes, so lineage survives re-runs at different parallelism.

    This doubles as the skew treatment: a mega-conversation lands in one
    bucket, but buckets only gate lineage — within a run, Spark's own
    partitioning plus AQE skew-split spread the heavy bucket across tasks.
    """
    return df.withColumn(
        "bucket", F.pmod(F.xxhash64(F.col(key)), F.lit(n_buckets)).cast("int")
    )


def bucket_content_hashes(transcripts_b: DataFrame) -> DataFrame:
    """(bucket, content_hash, rows_in): order-insensitive per-bucket input hash.

    sum(xxhash64(row)) is commutative -> identical regardless of partitioning
    or shuffle order; 64-bit wraparound is fine for a change detector.
    """
    h = F.xxhash64("conv_id", "turn_idx", "role", "text", "tool")
    # mod keeps the ANSI-mode sum overflow-free up to ~2^33 rows per bucket;
    # combine two residues so the change-detector keeps ~60 bits of entropy.
    return transcripts_b.groupBy("bucket").agg(
        F.concat_ws(
            ":",
            F.sum(h % F.lit(1_000_000_007)),
            F.sum(h % F.lit(998_244_353)),
        ).alias("content_hash"),
        F.count("*").alias("rows_in"),
    )


def done_buckets(catalog: Catalog, stage: str) -> DataFrame:
    lin = catalog.read(LINEAGE_TABLE, schema=LINEAGE)
    return (
        lin.where((F.col("stage") == stage) & (F.col("status") == "done"))
        .select("bucket", "content_hash")
        .distinct()
    )


def pending_buckets(
    catalog: Catalog, stage: str, hashes: DataFrame
) -> DataFrame:
    """Buckets whose (bucket, content_hash) has no done lineage row."""
    return hashes.join(
        done_buckets(catalog, stage), ["bucket", "content_hash"], "left_anti"
    )


def mark_done(
    catalog: Catalog,
    stage: str,
    hashes: DataFrame,
    rows_out: DataFrame,
) -> None:
    """Upsert done rows for the given (bucket, content_hash) set.

    rows_out: (bucket, rows_out) counts for the stage's output.
    """
    rows = (
        hashes.join(rows_out, "bucket", "left")
        .select(
            F.lit(stage).alias("stage"),
            F.col("bucket").cast("int"),
            "content_hash",
            F.lit("done").alias("status"),
            F.col("rows_in").cast("long"),
            F.coalesce(F.col("rows_out"), F.lit(0)).cast("long").alias("rows_out"),
            F.current_timestamp().alias("updated_ts"),
        )
    )
    # partitioned by stage: marking one stage's buckets done reads back and
    # rewrites only that stage's partition (O(stage), not O(table)) — the
    # contract's O(dirty) promise applies to the lineage table itself too
    catalog.merge_by_key(
        LINEAGE_TABLE, rows, ["stage", "bucket"], partition_by=["stage"]
    )
