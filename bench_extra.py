"""Round-7 optimization harness (guide §1): per-query noop-isolated timing
plus .explain("formatted") capture. NOT the driver bench — bench.py is frozen
for measurement; this exists so optimization work can time individual queries
cheaply (one warm pass, k timed passes, min reported) and diff plan shapes.

Usage:
    python bench_extra.py time  [query ...]     # min-of-3 noop walls
    python bench_extra.py plans [query ...]     # write plans/<tag>/<q>_<suffix>.txt
Env:
    SPARK_GRAFT_SF_DIR   (default /root/testdata/sf0.1)
    SPARK_GRAFT_CPUS     (default 32)
    BENCH_EXTRA_REPEATS  (default 3)
    BENCH_EXTRA_TAG      (default r07)  plans dir: plans/$TAG/
    BENCH_EXTRA_SUFFIX   (default before)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "kg_edges",
    "mentions",
    "link_exact",
    "canonical_map",
    "cosine_topk",
    "hybrid_search",
    "bfs_depth2",
    "tool_hierarchy",
    "dedup_exact",
    "dedup_ngram_pairs",
    "dedup_minhash_pairs",
    "dedup_simhash_pairs",
    "ann_lsh_topk",
    "ivf_topk",
    "conv_tool_profile",
    "text_stats",
    "verb_object_features",
    "near_dup_lsh",
    "drift_placements",
    "corpus_clean",
]


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "time"
    names = sys.argv[2:] or HEADLINE
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    repeats = int(os.environ.get("BENCH_EXTRA_REPEATS", "3"))

    import __spark_entry__ as entrymod
    from grepai_spark.session import get_spark

    spark = get_spark(
        app_name=f"grepai-bench-extra-{cpus}", master=f"local[{cpus}]"
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    names = [n for n in names if n in qs]

    if mode == "plans":
        tag = os.environ.get("BENCH_EXTRA_TAG", "r07")
        suffix = os.environ.get("BENCH_EXTRA_SUFFIX", "before")
        out_dir = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "plans", tag
        )
        os.makedirs(out_dir, exist_ok=True)
        for name in names:
            spark.sparkContext.setJobDescription(f"plan:{name}")
            df = qs[name](spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            path = os.path.join(out_dir, f"{name}_{suffix}.txt")
            with open(path, "w") as f:
                f.write(plan)
            print(f"wrote {path}")
        spark.stop()
        return

    # warm pass (stores built, JVM/Arrow warm), then timed passes
    walls: dict[str, list[float]] = {n: [] for n in names}
    for name in names:
        spark.sparkContext.setJobDescription(f"warm:{name}")
        _force(qs[name](spark, sf_dir))
    for _ in range(repeats):
        for name in names:
            spark.sparkContext.setJobDescription(f"time:{name}")
            t0 = time.perf_counter()
            _force(qs[name](spark, sf_dir))
            walls[name].append(round(time.perf_counter() - t0, 3))
    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "cpus": cpus,
                "min": {n: min(w) for n, w in walls.items()},
                "samples": walls,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
