"""Table storage layer — the Iceberg seam.

In production every table here is an Iceberg table: atomic snapshot commits
replace the reference's flock + tmp-file + rename protocol
(/root/reference/store/gob.go:189-235, trace/store.go:129-167), MERGE INTO
replaces its in-place map updates, and partition specs (bucket(conv_id)) drive
pruning. This sandbox has no Iceberg runtime jar, so `Catalog` provides the
same contract over parquet directories with atomic directory-swap commits:
full-table replace writes beside and renames over the live dir; partition
merges write the dirty partitions beside and swap ONLY those partition
subdirectories — a crash mid-job leaves every live partition either fully old
or fully new, never half-written (the overwritePartitions commit contract).
The pipeline code only talks to this interface, so swapping in Iceberg is a
config change (`writeTo(...).createOrReplace()` / `.append()`), not a
rewrite.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


_TMP_MARK = ".__tmp__"
_NEW_MARK = ".__new__"
_OLD_MARK = ".__old__"


def _marker_base(name: str) -> tuple[str, str] | None:
    """(base, marker) if `name` is a swap-protocol artifact, else None."""
    for mark in (_NEW_MARK, _OLD_MARK, _TMP_MARK):
        i = name.find(mark)
        if i > 0:
            return name[:i], mark
    return None


def _swap_dir(src: str, dst: str) -> None:
    """Commit `src` over `dst` with a forward-recoverable three-rename
    protocol: stage the COMPLETE new data beside dst first (rename is
    metadata-only), so the unavoidable instant where dst does not exist
    always has a fully-written `dst.__new__*` sibling recovery can promote —
    a crash can never leave the partition missing with only stale data to
    fall back to (ADVICE r3)."""
    token = uuid.uuid4().hex[:8]
    new = f"{dst}{_NEW_MARK}{token}"
    os.rename(src, new)  # stage: new data complete, live dir untouched
    old = f"{dst}{_OLD_MARK}{token}"
    if os.path.isdir(dst):
        os.rename(dst, old)
    os.rename(new, dst)  # commit
    if os.path.isdir(old):
        shutil.rmtree(old, ignore_errors=True)


def _recover_dir(parent: str) -> None:
    """Repair swap-protocol leftovers in `parent` from an interrupted run.

    __tmp__ dirs are in-progress writes — always deleted. __new__ dirs are
    COMPLETE staged data: promoted if the live dir is missing (finish the
    crashed commit forward), deleted otherwise. __old__ dirs are the
    displaced previous version: restored only if neither the live dir nor a
    staged __new__ exists, deleted otherwise. Processing __new__ before
    __old__ makes forward completion win — the staged data was fully
    written before the swap began.
    """
    if not os.path.isdir(parent):
        return
    entries = sorted(os.listdir(parent))
    marked = [(e, _marker_base(e)) for e in entries]
    for mark_pass in (_TMP_MARK, _NEW_MARK, _OLD_MARK):
        for entry, bm in marked:
            if bm is None or bm[1] != mark_pass:
                continue
            full = os.path.join(parent, entry)
            if not os.path.isdir(full):
                continue
            base = os.path.join(parent, bm[0])
            if mark_pass == _TMP_MARK:
                shutil.rmtree(full, ignore_errors=True)
            elif os.path.isdir(base):
                shutil.rmtree(full, ignore_errors=True)
            else:
                os.rename(full, base)


class Catalog:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)
        # startup recovery: finish or roll back any swap a crash interrupted
        # (table-level artifacts at the root, partition-level inside tables)
        _recover_dir(root)
        for entry in sorted(os.listdir(root)):
            _recover_dir(os.path.join(root, entry))

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
        tmp = f"{final}{_TMP_MARK}{uuid.uuid4().hex[:8]}"
        w = df.write.mode("overwrite")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(tmp)
        _swap_dir(tmp, final)

    def append(self, table: str, df: DataFrame) -> None:
        """Append snapshot (Iceberg: .append())."""
        df.write.mode("append").parquet(self.path(table))

    def _is_partitioned_by(self, table: str, col: str) -> bool:
        """True iff the live table's layout has `col=` partition subdirs."""
        p = self.path(table)
        return any(e.startswith(f"{col}=") for e in os.listdir(p))

    def _overwrite_partitions(
        self,
        table: str,
        df: DataFrame,
        partition_by: list[str],
        ensure: list[tuple] | None = None,
    ) -> None:
        """Swap exactly the partitions present in `df` into the live table.

        df is written partitioned to a tmp dir beside the table; each
        produced `col=value` subdirectory is then committed over its live
        counterpart via the staged three-rename swap (_swap_dir) — cheap
        metadata renames per dirty partition, and a crash at ANY instant
        leaves the partition recoverable as either fully old or fully new
        (never missing, never a half-written mix the way writing
        mode('overwrite') into the live dir would): Catalog startup
        recovery promotes a staged __new__ or restores the __old__.
        Iceberg: overwritePartitions / replaceWhere.

        `ensure` lists partition values that must be swapped EVEN IF `df`
        holds no rows for them: a scope-replacing merge (replace_by_scope)
        can legitimately empty a partition — every existing row belonged
        to the replaced scope and the new extraction yields nothing — and
        Spark writes no subdirectory for an empty partition, which would
        silently leave the stale files live. Such partitions get an empty
        staged dir and go through the SAME crash-safe swap (an empty
        partition dir reads as zero rows). Single-column partition specs
        only — all callers partition by the bucket.
        """
        final = self.path(table)
        tmp = f"{final}{_TMP_MARK}{uuid.uuid4().hex[:8]}"
        df.write.mode("overwrite").partitionBy(*partition_by).parquet(tmp)
        if ensure:
            assert len(partition_by) == 1, "ensure needs a 1-col spec"
            for vals in ensure:
                sub = os.path.join(tmp, f"{partition_by[0]}={vals[0]}")
                os.makedirs(sub, exist_ok=True)
        os.makedirs(final, exist_ok=True)
        prefix = f"{partition_by[0]}="
        for entry in sorted(os.listdir(tmp)):
            if not entry.startswith(prefix):
                continue
            _swap_dir(os.path.join(tmp, entry), os.path.join(final, entry))
        shutil.rmtree(tmp, ignore_errors=True)

    def merge_by_key(
        self,
        table: str,
        updates: DataFrame,
        keys: list[str],
        partition_by: list[str] | None = None,
    ) -> None:
        """Idempotent upsert (Iceberg: MERGE INTO ... WHEN MATCHED UPDATE).

        Three regimes, cheapest applicable first:

        * `partition_by == keys` (the pipeline's per-bucket stage merges):
          dynamic partition overwrite — ONLY the dirty partitions are
          swapped in, O(dirty buckets) not O(table), and untouched bucket
          files are never rewritten.
        * `partition_by` a strict subset of `keys` (streaming row-level
          merges into a bucketed table): the dirty partitions are READ back,
          anti-joined against the update keys, unioned with the updates and
          swapped in — still O(dirty buckets); a micro-batch touching 2 of
          16 buckets rewrites 2.
        * otherwise (row-level keys, unpartitioned table): anti-join the
          whole table, union, atomic swap — O(table), kept only for small
          tables.

        Last-write-wins per key is safe for our tables: vectors are
        deterministic functions of the key and lineage is append-ish.
        """
        if not self.exists(table):
            self.overwrite(table, updates, partition_by=partition_by)
            return
        if partition_by and set(partition_by) == set(keys):
            self._overwrite_partitions(table, updates, partition_by)
            return
        if (
            partition_by
            and set(partition_by) < set(keys)
            and self._is_partitioned_by(table, partition_by[0])
        ):
            dirty = [
                tuple(r)
                for r in updates.select(*partition_by).distinct().collect()
            ]
            existing = self.read(table)
            cond = None
            for vals in dirty:
                c = F.lit(True)
                for col, v in zip(partition_by, vals):
                    c = c & (F.col(col) == F.lit(v))
                cond = c if cond is None else (cond | c)
            if cond is None:  # empty update batch
                return
            # partition-column filter -> directory pruning on the scan
            existing_dirty = existing.where(cond)
            kept = existing_dirty.join(
                updates.select(*keys).distinct(), on=keys, how="left_anti"
            )
            merged = kept.unionByName(updates.select(*kept.columns))
            self._overwrite_partitions(table, merged, partition_by)
            return
        existing = self.read(table)
        kept = existing.join(
            updates.select(*keys).distinct(), on=keys, how="left_anti"
        )
        self.overwrite(
            table,
            kept.unionByName(updates.select(*kept.columns)),
            partition_by=partition_by,
        )

    def replace_by_scope(
        self,
        table: str,
        updates: DataFrame,
        scope: DataFrame,
        scope_keys: list[str],
        partition_by: list[str] | None = None,
    ) -> None:
        """Re-index merge (Iceberg: MERGE INTO ... WHEN MATCHED THEN DELETE
        followed by an insert): every existing row whose `scope_keys` match a
        row of `scope` is deleted, then ALL of `updates` is inserted.

        The difference from merge_by_key matters exactly when a scope unit is
        REDELIVERED WITH DIFFERENT CONTENT: merge_by_key only overwrites keys
        the new batch still produces, so derived rows the new content no
        longer yields (an edge whose tool call was edited away) would survive
        as stale truth. Scope replacement is the reference's re-index-on-
        modify semantics (cli/watch.go:2007-2133 drops a changed file's old
        records and re-extracts): `scope` is the set of source units the
        batch delivered (e.g. distinct (bucket, conv_id, turn_idx) of the
        arriving turns), independent of how many derived rows each produced —
        including zero.

        Cost shape matches merge_by_key's middle regime: only the partitions
        named by `scope` are read back and swapped — O(dirty buckets), never
        O(table).
        """
        if not self.exists(table):
            self.overwrite(table, updates, partition_by=partition_by)
            return
        scope = scope.select(*scope_keys).distinct()
        if (
            partition_by
            and set(partition_by) < set(scope_keys)
            and self._is_partitioned_by(table, partition_by[0])
        ):
            dirty = [
                tuple(r) for r in scope.select(*partition_by).distinct().collect()
            ]
            if not dirty:
                return
            cond = None
            for vals in dirty:
                c = F.lit(True)
                for col, v in zip(partition_by, vals):
                    c = c & (F.col(col) == F.lit(v))
                cond = c if cond is None else (cond | c)
            existing_dirty = self.read(table).where(cond)
            kept = existing_dirty.join(scope, on=scope_keys, how="left_anti")
            merged = kept.unionByName(updates.select(*kept.columns))
            # ensure=dirty: a partition whose rows ALL belonged to the
            # replaced scope (and whose new extraction is empty) must still
            # be swapped — to empty — or its stale files stay live
            self._overwrite_partitions(
                table, merged, partition_by, ensure=dirty
            )
            return
        existing = self.read(table)
        kept = existing.join(scope, on=scope_keys, how="left_anti")
        self.overwrite(
            table,
            kept.unionByName(updates.select(*kept.columns)),
            partition_by=partition_by,
        )
