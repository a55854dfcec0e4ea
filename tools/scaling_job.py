"""The scaling-criterion job — run via spark-submit --py-files.

Runs the full KG pipeline (extract -> link -> canonicalize -> materialize)
over the sf corpus replicated `replicate`-fold, twice (min wall), and prints
one JSON line. Invoked by tools/scaling_run.py at two local parallelism
levels as the sandbox proxy for N vs 4N executors.

Usage:
  spark-submit --master local[N] --py-files grepai_spark.zip \
      tools/scaling_job.py <cpus> <sf_dir> <replicate>
"""

from __future__ import annotations

import json
import sys
import time


def main() -> None:
    cpus = int(sys.argv[1])
    sf_dir = sys.argv[2]
    replicate = int(sys.argv[3]) if len(sys.argv) > 3 else 8

    from grepai_spark.pipeline import kg_edges_df
    from grepai_spark.session import get_spark
    from grepai_spark.synth import (
        alias_dict_df,
        load_transcripts,
        replicate_transcripts,
    )

    # 8 shuffle partitions per core (not the session default 2x): the
    # dedup reduce otherwise runs as ~2 waves whose straggler tail idles
    # cores at the high level; AQE coalesces what's genuinely small.
    spark = get_spark(
        app_name=f"grepai-scaling-{cpus}",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus * 8,
    )
    spark.sparkContext.setLogLevel("ERROR")

    # Materialize the synthesized corpus as a PARQUET TABLE before timing:
    # the north-rule job reads a stored Iceberg transcripts table, so the
    # sandbox-only synthesis (single-file events scan + ordering window +
    # replication) must not be inside the measured wall. Parquet, not
    # localCheckpoint: the checkpoint's uncompressed row blocks made the
    # input read memory-bandwidth-bound (shared-host bus), masking compute
    # scaling; the columnar compressed table is ~50x smaller and is what
    # production reads anyway (PERF.md).
    # cache keyed by (sf_dir, replicate): a rerun against a different corpus
    # must not silently reuse stale input
    import hashlib as _hashlib
    import os as _os

    sf_tag = _hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    store = f"/tmp/grepai_scale_input_{sf_tag}_{replicate}.parquet"

    if not _os.path.isdir(store):
        # fixed fine-grained layout (128 files), independent of which
        # parallelism level builds the store: the SCAN is what must split
        # well at both levels
        replicate_transcripts(
            load_transcripts(spark, sf_dir), replicate, n_parts=128
        ).write.mode("overwrite").parquet(store)
    # scan granularity: several task waves per core, so stragglers (mega
    # threads make UDF cost uneven) amortize instead of idling whole cores.
    # Default bin-packing targets minPartitionNum = defaultParallelism,
    # i.e. ONE task per core — the slowest task then sets the stage wall.
    spark.conf.set("spark.sql.files.minPartitionNum", str(cpus * 8))
    t = spark.read.parquet(store)
    n_turns = t.count()
    d = alias_dict_df(spark)

    # warm codegen + python workers + broadcast machinery on a small slice,
    # then ONE measured rep: a second in-JVM rep would stretch the 8-core
    # burst past the host's throttle window (PERF.md) and only measure that.
    # Cross-run repetition comes from the harness's interleaved submits.
    kg_edges_df(spark, t.limit(50_000), d).write.format("noop").mode(
        "overwrite"
    ).save()
    time.sleep(3)
    t0 = time.perf_counter()
    # phase split: plan construction includes the dictionary-scale eager jobs
    # (alias-sim + CC collect) — the serial fraction candidate; the action is
    # the corpus-scale extract/link/materialize work that should scale.
    plan = kg_edges_df(spark, t, d)
    t1 = time.perf_counter()
    plan.write.format("noop").mode("overwrite").save()
    t2 = time.perf_counter()
    wall = t2 - t0
    print(
        json.dumps(
            {
                "cpus": cpus,
                "n_turns": n_turns,
                "replicate": replicate,
                "wall_sec": round(wall, 3),
                "plan_sec": round(t1 - t0, 3),
                "action_sec": round(t2 - t1, 3),
                "turns_per_sec": round(n_turns / wall, 1),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
