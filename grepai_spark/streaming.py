"""Structured Streaming incremental plane — the `watch` daemon analog.

The reference watches the filesystem and incrementally re-indexes changed
files (fsnotify + debounce, /root/reference/watcher/watcher.go:16-77;
event handling cli/watch.go:2007-2133; dirty-set batching
cli/watch.go:476-688). Here the arrival stream is new transcript files in a
directory (at production scale: Iceberg table commits / Kafka), and the
incremental unit is the micro-batch:

    readStream(transcripts dir)
      -> foreachBatch: extract call triples + merge idempotently by
         (conv_id, turn_idx, obj) into the edges store

foreachBatch + key-based MERGE gives exactly-once *effective* semantics on
top of at-least-once delivery — re-delivered turns upsert the same keys, the
analog of the reference's content-hash re-index gate
(/root/reference/indexer/indexer.go:161-164). No watermark is needed: the
pipeline has no event-time aggregation, only stable (conv_id, turn_idx) keys
(SURVEY.md §2.13).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from grepai_spark import extract
from grepai_spark.schemas import TRANSCRIPTS
from grepai_spark.storage import Catalog

EDGES_TABLE = "edges_stream"


def incremental_call_edges(
    spark: SparkSession,
    source_dir: str,
    out_dir: str,
    checkpoint_dir: str,
) -> None:
    """Drain all available transcript files from `source_dir` into the edges
    store, one idempotent MERGE per micro-batch, then stop (availableNow —
    the batch-drain trigger; a daemon would use a processingTime trigger).

    The streaming source tracks processed files in the checkpoint, so a
    second invocation only reads NEW files — the resume gate the reference
    implements with mod-time + content-hash checks.
    """
    catalog = Catalog(spark, out_dir)

    def merge_batch(batch: DataFrame, batch_id: int) -> None:
        calls = extract.call_triples(batch)
        catalog.merge_by_key(
            EDGES_TABLE,
            calls,
            ["conv_id", "turn_idx", "obj"],
        )

    stream = (
        spark.readStream.schema(TRANSCRIPTS)
        .option("maxFilesPerTrigger", "4")  # debounce/batch-size analog
        .parquet(source_dir)
    )
    q = (
        stream.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
