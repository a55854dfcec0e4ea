"""Full pipeline: P/R vs golden triples, idempotent resume, determinism."""

from __future__ import annotations

import pytest

from grepai_spark import pipeline
from grepai_spark.oracle import Triple, golden_triples, precision_recall
from grepai_spark.synth import ALIAS_ROWS, alias_dict_df


def _triple_set(edges_df):
    return {
        Triple(r.subj, r.pred, r.obj, r.conv_id, r.turn_idx)
        for r in edges_df.collect()
    }


def _golden(transcripts_df):
    rows = [r.asDict() for r in transcripts_df.collect()]
    return golden_triples(rows, ALIAS_ROWS)


def test_pipeline_pr_on_sf0001(spark, sf_transcripts, tmp_path):
    res = pipeline.run(
        spark,
        sf_transcripts,
        alias_dict_df(spark),
        str(tmp_path / "out"),
    )
    got = _triple_set(res.edges)
    want = _golden(sf_transcripts)
    p, r = precision_recall(got, want)
    assert p >= 0.95 and r >= 0.95, (p, r)
    assert p == 1.0 and r == 1.0  # clean fixture: must be exact
    # vertices: QueryParserFast merged away by CC
    v = {row.entity_id for row in res.vertices.collect()}
    assert "e_parse_query" in v and "e_query_parser_fast" not in v


def test_pipeline_resume_after_kill(spark, tiny_transcripts, tmp_path):
    out = str(tmp_path / "out")
    d = alias_dict_df(spark)
    # clean run for the expected output
    clean = pipeline.run(spark, tiny_transcripts, d, str(tmp_path / "clean"))
    want = _triple_set(clean.edges)

    with pytest.raises(pipeline.InjectedFailure):
        pipeline.run(spark, tiny_transcripts, d, out, fail_after="mentions")
    res = pipeline.run(spark, tiny_transcripts, d, out)
    # resume skipped the already-done mentions buckets
    assert res.counters["mentions_buckets_pending"] == 0
    assert _triple_set(res.edges) == want


def test_pipeline_rerun_noop(spark, tiny_transcripts, tmp_path):
    out = str(tmp_path / "out")
    d = alias_dict_df(spark)
    r1 = pipeline.run(spark, tiny_transcripts, d, out)
    r2 = pipeline.run(spark, tiny_transcripts, d, out)
    assert r2.counters["mentions_buckets_pending"] == 0
    assert r2.counters["edges_buckets_pending"] == 0
    assert _triple_set(r1.edges) == _triple_set(r2.edges)


def test_pipeline_lsh_variant_same_output(spark, tiny_transcripts, tmp_path):
    d = alias_dict_df(spark)
    a = pipeline.run(spark, tiny_transcripts, d, str(tmp_path / "a"))
    b = pipeline.run(
        spark, tiny_transcripts, d, str(tmp_path / "b"), use_lsh=True
    )
    assert _triple_set(a.edges) == _triple_set(b.edges)


def test_pipeline_parallelism_invariance(spark, sf_transcripts, tmp_path):
    """Same triples regardless of partitioning (determinism criterion #7)."""
    d = alias_dict_df(spark)
    a = pipeline.run(
        spark,
        sf_transcripts.repartition(2),
        d,
        str(tmp_path / "p2"),
        n_buckets=4,
    )
    b = pipeline.run(
        spark,
        sf_transcripts.repartition(16),
        d,
        str(tmp_path / "p16"),
        n_buckets=32,
    )
    assert _triple_set(a.edges) == _triple_set(b.edges)


def test_pipeline_embed_stage_resumes_and_caches(spark, tiny_transcripts, tmp_path):
    from grepai_spark.storage import Catalog

    out = str(tmp_path / "out_embed")
    d = alias_dict_df(spark)
    r1 = pipeline.run(spark, tiny_transcripts, d, out, embed=True)
    assert r1.counters["vectors_buckets_pending"] > 0
    # duplicate text across conv-a/0 and conv-c/1 -> encoded once
    assert r1.counters["embed_cache_misses"] < r1.counters["embed_distinct_texts"] + 1
    cat = Catalog(spark, out)
    vecs = cat.read("turn_vectors")
    assert vecs.count() == tiny_transcripts.count()
    dup = {
        (r["conv_id"], r["turn_idx"]): tuple(r["vector"])
        for r in vecs.collect()
    }
    # content-hash cache: identical text => identical vector
    assert dup[("conv-a", 0)] == dup[("conv-c", 1)]

    # rerun: nothing pending, cache fully warm
    r2 = pipeline.run(spark, tiny_transcripts, d, out, embed=True)
    assert r2.counters["vectors_buckets_pending"] == 0


def test_pipeline_resume_after_embed_kill(spark, tiny_transcripts, tmp_path):
    out = str(tmp_path / "out_embed_kill")
    d = alias_dict_df(spark)
    with pytest.raises(pipeline.InjectedFailure):
        pipeline.run(
            spark, tiny_transcripts, d, out, embed=True, fail_after="embed"
        )
    res = pipeline.run(spark, tiny_transcripts, d, out, embed=True)
    assert res.counters["mentions_buckets_pending"] == 0
    assert res.counters["vectors_buckets_pending"] == 0
    clean = pipeline.run(
        spark, tiny_transcripts, d, str(tmp_path / "clean2"), embed=True
    )
    assert _triple_set(res.edges) == _triple_set(clean.edges)


def test_embed_cache_consistent_after_kill_between_merges(
    spark, tiny_transcripts, tmp_path
):
    """Crash point BETWEEN the cache merge and the turn_vectors merge
    (VERDICT r4 #8): the first run commits the embedding cache but dies
    before writing turn_vectors; the re-run must (a) converge to exactly
    the turn_vectors a clean run produces and (b) encode NOTHING — every
    distinct text is already a cache hit."""
    from grepai_spark.storage import Catalog

    out = str(tmp_path / "out_cache_kill")
    d = alias_dict_df(spark)
    with pytest.raises(pipeline.InjectedFailure):
        pipeline.run(
            spark, tiny_transcripts, d, out, embed=True,
            fail_after="embed_cache",
        )
    cat = Catalog(spark, out)
    assert cat.exists("embedding_cache")  # cache merge committed pre-kill
    assert not cat.exists("turn_vectors")  # vectors merge never ran
    res = pipeline.run(spark, tiny_transcripts, d, out, embed=True)
    assert res.counters["embed_cache_misses"] == 0
    assert res.counters["embed_encoded_rows"] == 0  # zero re-encoding
    clean = pipeline.run(
        spark, tiny_transcripts, d, str(tmp_path / "clean3"), embed=True
    )
    got = {
        (r["conv_id"], r["turn_idx"]): tuple(r["vector"])
        for r in cat.read("turn_vectors").collect()
    }
    want = {
        (r["conv_id"], r["turn_idx"]): tuple(r["vector"])
        for r in Catalog(spark, str(tmp_path / "clean3"))
        .read("turn_vectors")
        .collect()
    }
    assert got == want


def test_run_maintains_graph_artifacts(spark, tiny_transcripts, tmp_path):
    """pipeline.run writes the graph-query plane's stored adjacency +
    degree census alongside the edge table (stores.build_graph_artifacts);
    a BFS over the artifacts equals a BFS that derives adjacency from the
    edges per query (the ad-hoc fallback path)."""
    from grepai_spark import graphq
    from grepai_spark.storage import Catalog
    from pyspark.sql import functions as F

    out = str(tmp_path / "out_graph")
    d = alias_dict_df(spark)
    res = pipeline.run(spark, tiny_transcripts, d, out)
    cat = Catalog(spark, out)
    for t in ("graph_adj", "graph_deg", "graph_adj_pred", "graph_deg_pred"):
        assert cat.exists(t), t
    adj = (
        cat.read("graph_adj").where(F.col("dir") == "both").select("a", "b")
    )
    deg = (
        cat.read("graph_deg")
        .where(F.col("dir") == "both")
        .select("a", "deg")
    )
    seed = "payments.charge"
    via_store = graphq.bfs(res.edges, seed, depth=2, adj=adj, deg=deg)
    via_derive = graphq.bfs(res.edges, seed, depth=2)
    assert sorted(map(tuple, via_store.collect())) == sorted(
        map(tuple, via_derive.collect())
    )


def test_merge_rewrites_only_dirty_buckets(spark, tmp_path):
    """Partition-scoped merge (Iceberg overwritePartitions stand-in): merging
    updates for one bucket must leave every other bucket's files untouched
    on disk — not rewrite the whole table."""
    import glob
    import os
    import time

    from grepai_spark.storage import Catalog

    cat = Catalog(spark, str(tmp_path / "cat_merge"))
    df = spark.createDataFrame(
        [(b, i) for b in range(4) for i in range(10)], "bucket int, v int"
    )
    cat.merge_by_key("t", df, ["bucket"], partition_by=["bucket"])

    def mtimes():
        return {
            p: os.path.getmtime(p)
            for p in glob.glob(str(tmp_path / "cat_merge/t/bucket=*/*.parquet"))
        }

    before = mtimes()
    assert before
    time.sleep(1.1)
    upd = spark.createDataFrame(
        [(2, i + 100) for i in range(5)], "bucket int, v int"
    )
    cat.merge_by_key("t", upd, ["bucket"], partition_by=["bucket"])
    after = mtimes()
    for p, m in before.items():
        if "bucket=2" not in p:
            assert after.get(p) == m, f"clean bucket file rewritten: {p}"
    got = {(r["bucket"], r["v"]) for r in cat.read("t").collect()}
    want = {(b, i) for b in (0, 1, 3) for i in range(10)} | {
        (2, i + 100) for i in range(5)
    }
    assert got == want


def test_fused_kg_edges_plan_has_no_exchange(spark, tmp_path):
    """Regression guard for the headline plan property: on a stored table
    the fused kg_edges derivation is ONE narrow map — no Exchange node may
    appear (a reintroduced shuffle is the single biggest scale regression
    this pipeline could take)."""
    from grepai_spark.synth import alias_dict_df, load_transcripts

    store = str(tmp_path / "store.parquet")
    load_transcripts(spark, "/root/testdata/sf0.001").write.parquet(store)
    t = spark.read.parquet(store)
    df = pipeline.kg_edges_df(spark, t, alias_dict_df(spark))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert "ArrowEvalPython" in plan or "BatchEvalPython" in plan


def test_latest_metrics_view_dedups_append_only_log(spark, tmp_path):
    """S8 contract (ADVICE r3): the metrics table is an append-only run log;
    latest_metrics is the documented reader — one row per metric, max run_ts
    wins."""
    import datetime

    from grepai_spark.pipeline import latest_metrics
    from grepai_spark.storage import Catalog

    cat = Catalog(spark, str(tmp_path / "mcat"))
    t0 = datetime.datetime(2024, 1, 1, 12, 0, 0)
    t1 = datetime.datetime(2024, 1, 2, 12, 0, 0)
    rows = [
        ("edges", 10, t0),
        ("edges", 25, t1),
        ("vertices", 5, t0),
    ]
    cat.append(
        "metrics",
        spark.createDataFrame(
            rows, "metric string, value long, run_ts timestamp"
        ),
    )
    got = {
        r["metric"]: r["value"] for r in latest_metrics(cat).collect()
    }
    assert got == {"edges": 25, "vertices": 5}
