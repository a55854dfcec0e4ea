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

    # Bracket-probe gating (VERDICT r5 #1: BENCH_r05 shipped a throttle-
    # poisoned headline because min-of-passes had no way to DISCARD a
    # poisoned window). Every pass is bracketed by the SAME pre-registered
    # CPU-parallel-efficiency probe the scaling campaign certifies reps
    # with (tools/scaling_run.probe_eff, gate fixed at PROBE_CLEAN=0.85):
    # a pass is CERTIFIED iff both its bracketing probes read clean, the
    # reported walls are min over certified passes only, and a dirty
    # bracket earns one retry pass (budget-gated). If NO pass certifies,
    # the all-pass minima ship with "clean": false — disclosed, never
    # silently blended.
    sys.path.insert(
        0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tools")
    )
    from scaling_run import PROBE_CLEAN, probe_eff

    probe_start = probe()
    budget = float(os.environ.get("SPARK_GRAFT_BENCH_BUDGET", "420"))
    max_passes = repeats + int(os.environ.get("SPARK_GRAFT_BENCH_RETRIES", "2"))
    # a bench launched right after heavy foreground compute starts inside a
    # known throttle window — wait it out briefly instead of burning passes
    quiet_deadline = time.monotonic() + float(
        os.environ.get("SPARK_GRAFT_BENCH_QUIET_TIMEOUT", "300")
    )
    eff = probe_eff(cpus if cpus <= 8 else 8)
    while eff < PROBE_CLEAN and time.monotonic() < quiet_deadline:
        time.sleep(30)
        eff = probe_eff(cpus if cpus <= 8 else 8)
    pass_probes = [eff]
    pass_walls: list[dict[str, float]] = []
    certified: list[int] = []
    bench_t0 = time.perf_counter()
    for i in range(max_passes):
        if len(certified) >= repeats:
            break
        if i > 0 and time.perf_counter() - bench_t0 > budget:
            break
        walls: dict[str, float] = {}
        for name in headline:
            t0 = time.perf_counter()
            _force(qs[name](spark, sf_dir))
            walls[name] = round(time.perf_counter() - t0, 3)
        pass_walls.append(walls)
        pass_probes.append(probe_eff(cpus if cpus <= 8 else 8))
        if (
            pass_probes[-2] >= PROBE_CLEAN
            and pass_probes[-1] >= PROBE_CLEAN
        ):
            certified.append(i)
    passes_run = len(pass_walls)
    use = [pass_walls[i] for i in certified] or pass_walls
    timings = {
        name: round(min(w[name] for w in use), 3) for name in headline
    }
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
                # bracket gate (same estimator + pre-registered 0.85 value
                # as the scaling campaign): walls above are min over
                # CERTIFIED passes; clean=false means no pass certified and
                # the all-pass minima shipped as disclosed fallback
                "pass_probes": pass_probes,
                "certified_passes": len(certified),
                "clean": bool(certified),
                "scaling": _scaling_record(),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
