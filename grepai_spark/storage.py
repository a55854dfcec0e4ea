"""Table storage layer — the Iceberg seam.

In production every table here is an Iceberg table: atomic snapshot commits
replace the reference's flock + tmp-file + rename protocol
(/root/reference/store/gob.go:189-235, trace/store.go:129-167), MERGE INTO
replaces its in-place map updates, and partition specs (bucket(conv_id)) drive
pruning. This sandbox has no Iceberg runtime jar, so `Catalog` provides the
same contract over parquet directories with atomic directory-swap commits —
write to `<table>.__tmp__`, fsync, rename over the live dir. The pipeline code
only talks to this interface, so swapping in Iceberg is a config change
(`writeTo(...).createOrReplace()` / `.append()`), not a rewrite.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


class Catalog:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)

    def path(self, table: str) -> str:
        return os.path.join(self.root, table)

    def exists(self, table: str) -> bool:
        return os.path.isdir(self.path(table))

    def read(self, table: str, schema: StructType | None = None) -> DataFrame:
        p = self.path(table)
        if not os.path.isdir(p):
            if schema is None:
                raise FileNotFoundError(p)
            return self.spark.createDataFrame([], schema=schema)
        return self.spark.read.parquet(p)

    def overwrite(
        self,
        table: str,
        df: DataFrame,
        partition_by: list[str] | None = None,
    ) -> None:
        """Atomic replace: write beside, then swap (Iceberg: REPLACE TABLE /
        overwritePartitions)."""
        final = self.path(table)
        tmp = f"{final}.__tmp__{uuid.uuid4().hex[:8]}"
        w = df.write.mode("overwrite")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(tmp)
        old = f"{final}.__old__{uuid.uuid4().hex[:8]}"
        if os.path.isdir(final):
            os.rename(final, old)
        os.rename(tmp, final)
        if os.path.isdir(old):
            shutil.rmtree(old, ignore_errors=True)

    def append(self, table: str, df: DataFrame) -> None:
        """Append snapshot (Iceberg: .append())."""
        df.write.mode("append").parquet(self.path(table))

    def merge_by_key(
        self,
        table: str,
        updates: DataFrame,
        keys: list[str],
        partition_by: list[str] | None = None,
    ) -> None:
        """Idempotent upsert (Iceberg: MERGE INTO ... WHEN MATCHED UPDATE).

        When the merge key IS the partition key (`partition_by == keys`, the
        pipeline's per-bucket stage merges), this is a dynamic partition
        overwrite: ONLY the dirty partitions are rewritten — Iceberg's
        overwritePartitions / replaceWhere — so a resume that recomputes 2 of
        16 buckets pays O(2 buckets), not O(table), and untouched bucket
        files are not rewritten at all.

        Otherwise (row-level keys): anti-join existing rows against update
        keys, union, atomic swap. Last-write-wins per key is safe for our
        tables: vectors are deterministic functions of the key and lineage
        is append-ish.
        """
        if not self.exists(table):
            self.overwrite(table, updates, partition_by=partition_by)
            return
        if partition_by and set(partition_by) == set(keys):
            (
                updates.write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy(*partition_by)
                .parquet(self.path(table))
            )
            return
        existing = self.read(table)
        kept = existing.join(
            updates.select(*keys).distinct(), on=keys, how="left_anti"
        )
        self.overwrite(table, kept.unionByName(updates))
