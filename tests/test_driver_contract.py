"""Driver-contract invariants: the registration surface the grading driver
consumes must not drift.

The driver's correctness window covers 50 entries and records a full
rows+schema+hash comparison only for queries with an oracle_sql() entry —
so every registered query must carry an oracle (round 4 closed the last
rows-only gap, frame_sample), and the count must stay exactly at the
window size. Round 5 freed three slots for the streaming/resume-plane
queries (kg_edges_streamed, kg_edges_resumed, conv_stats_stateful) by
fusing the four per-doc text-analysis projections into one `text_stats`
query; the fused projection is locked column-for-column to the four
package operators below.
"""

from __future__ import annotations

import __spark_entry__ as entry


def test_every_query_is_oracle_backed_and_window_sized():
    qs = entry.queries()
    oracles = entry.oracle_sql()
    assert set(qs) == set(oracles), (
        "queries() and oracle_sql() must register the same keys; "
        f"only-in-queries={sorted(set(qs) - set(oracles))}, "
        f"only-in-oracles={sorted(set(oracles) - set(qs))}"
    )
    assert len(qs) == 50  # the driver's correctness window
    for name, sql in oracles.items():
        assert isinstance(sql, str) and sql.strip(), name
        assert callable(qs[name]), name


def test_text_stats_fusion_matches_individual_operators(spark):
    """The fused text_stats driver query must equal the four package
    operators joined on doc_id, column for column — the fusion is a plan
    optimization (one scan instead of four), never a semantic variant."""
    from grepai_spark import textstats
    from grepai_spark.synth import read_parallel

    sf_dir = "/root/testdata/sf0.001"
    docs = read_parallel(spark, f"{sf_dir}/documents.parquet")
    fused = entry._q_text_stats(spark, sf_dir)
    joined = (
        textstats.lang_id(docs)
        .join(textstats.text_quality(docs), "doc_id")
        .join(textstats.token_counts(docs), "doc_id")
        .join(textstats.doc_fingerprint(docs), "doc_id")
        .select(*fused.columns)
    )
    assert fused.columns == joined.columns
    a = sorted(tuple(r) for r in fused.collect())
    b = sorted(tuple(r) for r in joined.collect())
    assert a == b


def test_text_stats_single_scan_zero_shuffle(spark):
    """The fusion's point at 100 TB: one parquet scan, no exchange."""
    plan = (
        entry._q_text_stats(spark, "/root/testdata/sf0.001")
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert plan.count("Relation") == 1, plan
    assert "Exchange" not in plan and "Join" not in plan, plan


def test_stored_input_table_matches_synthesis(spark):
    """The driver's stored input table (_t) must hold EXACTLY the rows the
    oracle-checked synthesis derives — the store is a materialization, not
    a variant. Order-insensitive full-row comparison at sf0.001."""
    from grepai_spark.synth import load_transcripts

    sf_dir = "/root/testdata/sf0.001"
    stored = entry._t(spark, sf_dir)
    derived = load_transcripts(spark, sf_dir)
    assert stored.columns == derived.columns
    a = {tuple(r) for r in stored.collect()}
    b = {tuple(r) for r in derived.collect()}
    assert a == b


def test_stored_input_table_scan_parallelism(spark):
    """The store must not collapse to a single scan partition (the
    serialized-narrow-stage trap, PERF.md §11): at least min(cores, files)
    partitions."""
    sf_dir = "/root/testdata/sf0.001"
    stored = entry._t(spark, sf_dir)
    cores = spark.sparkContext.defaultParallelism
    assert stored.rdd.getNumPartitions() >= min(cores, 4)
