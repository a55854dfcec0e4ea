"""Benchmark harness — driver contract.

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

    {"metric": "turns_per_sec", "value": N, "unit": "turns/sec",
     "queries": {"kg_edges": sec, ...}, "sf": 0.1, ...}

The headline metric is end-to-end KG-pipeline throughput in turns/sec
(BASELINE.json metric). Per-query wall seconds cover the other operator
families. Each query is forced with a noop-format write so Catalyst cannot
prune expensive projections the way a bare count() would.

Scaling-efficiency mode (BASELINE.md criterion): run this script twice with
SPARK_GRAFT_CPUS=8 and =32 on the same sf dir; efficiency =
(throughput_32 / throughput_8) / 4. `tools/scaling_run.py` automates it.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _scaling_record() -> dict | None:
    """The recorded two-parallelism scaling verdict for the EXACT package
    content being benched, so BENCH_r*.json carries the scaling-efficiency
    evidence (BASELINE.json north_rule: throughput at N and 4N cores +
    efficiency) next to the single-level throughput numbers. NOT measured
    in this process — sourced from the spark-submit campaign history
    (tools/scaling_run.py writes tools/scaling_history.jsonl; narrative in
    BASELINE.md). Keyed by grepai_spark CONTENT hash: if the package
    changed since the last campaign, the verdict describes different code
    and this returns the mismatch instead of stale numbers."""
    import statistics
    import tempfile

    try:
        sys.path.insert(
            0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tools")
        )
        import scaling_run as sr

        pkg = sr.build_zip(tempfile.mktemp(suffix=".zip"))[:12]
        key = {
            "pkg_hash": pkg,
            "sf_dir": "/root/testdata/sf0.1",
            "lo": 2,
            "hi": 8,
        }
        v = sr.verdict(sr.load_history(), key)
        if not v["clean"]:
            return {
                "source": "tools/scaling_history.jsonl (spark-submit campaign)",
                "pkg_hash": pkg,
                "n_clean": 0,
                "note": "no clean campaign invocations recorded for this "
                "package content; see BASELINE.md",
            }
        clean = v["clean"]
        effs = [sr.entry_eff(h) for h in clean]
        return {
            "source": "tools/scaling_history.jsonl (spark-submit campaign)",
            "pkg_hash": pkg,
            "cores": {"lo": key["lo"], "hi": key["hi"]},
            "n_turns": clean[-1].get("n_turns"),
            "median_tps_lo": round(
                statistics.median(
                    h["n_turns"] / h["wall_lo"] for h in clean
                ),
                1,
            ),
            "median_tps_hi": round(
                statistics.median(
                    h["n_turns"] / h["wall_hi"] for h in clean
                ),
                1,
            ),
            "clean_effs": effs,
            "median_eff": v["median_eff"],
            "n_clean": v["n_clean"],
            "pass": v["pass"],
        }
    except Exception as exc:  # never fail the bench over the annex block
        return {"error": str(exc)[:200]}


def _force(df) -> int:
    """Execute the full plan. noop write evaluates every output column
    (count() would let Catalyst prune deterministic projections)."""
    df.write.format("noop").mode("overwrite").save()
    return 0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    bench_queries = os.environ.get("SPARK_GRAFT_BENCH_QUERIES", "").split(",")
    bench_queries = [q for q in bench_queries if q]

    import __spark_entry__ as entrymod
    from grepai_spark.session import get_spark

    spark = get_spark(app_name=f"grepai-bench-{cpus}", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")

    from grepai_spark.synth import load_transcripts

    n_turns = load_transcripts(spark, sf_dir).count()

    qs = entrymod.queries()
    # Headline set: one per operator family (pipeline, extract, link, canon,
    # search, graph, aggs, dedup, text-analysis). Full set via env override.
    headline = bench_queries or [
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
        # r5: the four per-doc text-analysis projections are registered as
        # one fused query (text_stats); its wall ~= the sum of the former
        # text_quality + doc_fingerprint + lang_id + token_counts columns
        # computed in a single scan, so r4/r5 per-name walls don't compare.
        "text_stats",
        "verb_object_features",
        "near_dup_lsh",
        "drift_placements",
        "corpus_clean",
    ]
    headline = [q for q in headline if q in qs]

    # three spread-out passes: the host's throttle windows span several
    # minutes, so both passes of a min-of-2 can land inside one window
    # (measured 45 s vs ~7 s steady for near_dup_lsh on a bad day) — a
    # third pass gives each query one more chance at a clean window
    repeats = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3"))
    timings: dict[str, float] = {}
    # Warm-up: JVM + Arrow + Python worker pool, not measured.
    _force(qs["call_triples"](spark, sf_dir).limit(1000))

    def probe() -> float:
        """Pure-JVM throttle sentinel: a fixed xxhash64 fold whose cost is
        plan-independent. Recorded at start/end so a slow bench can be
        attributed to the shared host's burst throttling (PERF.md §10)
        rather than a plan regression."""
        t0 = time.perf_counter()
        # mod a prime first: ANSI mode makes sum() over raw 64-bit hashes
        # overflow (same discipline as lineage.bucket_content_hashes)
        spark.range(1 << 25).selectExpr(
            "sum(xxhash64(id) % 1000000007) s"
        ).collect()
        return round(time.perf_counter() - t0, 3)

    probe_start = probe()
    # Repeats run as full PASSES over the query list (not back-to-back per
    # query): the host throttles in multi-minute windows, and consecutive
    # repeats of one query land in the same window — min over spread-out
    # passes is the steady-state estimate min-of-2-adjacent is not.
    # Budget gate: a pass beyond the first only starts while total measured
    # wall is under SPARK_GRAFT_BENCH_BUDGET seconds, so a throttled day
    # costs at most ~one extra pass instead of tripling the bench wall.
    budget = float(os.environ.get("SPARK_GRAFT_BENCH_BUDGET", "420"))
    passes_run = 0
    bench_t0 = time.perf_counter()
    for i in range(repeats):
        if i > 0 and time.perf_counter() - bench_t0 > budget:
            break
        for name in headline:
            t0 = time.perf_counter()
            _force(qs[name](spark, sf_dir))
            wall = time.perf_counter() - t0
            if wall < timings.get(name, float("inf")):
                timings[name] = wall
        passes_run += 1
    timings = {k: round(v, 3) for k, v in timings.items()}
    probe_end = probe()

    pipeline_sec = timings.get("kg_edges", sum(timings.values()) or 1.0)
    turns_per_sec = round(n_turns / pipeline_sec, 1)

    sf = 0.1
    for tok in sf_dir.replace("/", " ").split():
        if tok.startswith("sf"):
            try:
                sf = float(tok[2:])
            except ValueError:
                pass

    print(
        json.dumps(
            {
                "metric": "turns_per_sec",
                "value": turns_per_sec,
                "unit": "turns/sec",
                "queries": timings,
                "sf": sf,
                "n_turns": n_turns,
                "cpus": cpus,
                "pipeline_sec": pipeline_sec,
                "probe_sec_start": probe_start,
                "probe_sec_end": probe_end,
                "passes": passes_run,
                "scaling": _scaling_record(),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
