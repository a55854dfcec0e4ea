"""Salted aggregation: exactness vs unsalted, determinism, mega-thread."""

from __future__ import annotations

import duckdb

from tests.conftest import SF_DIR
from grepai_spark import skew
from grepai_spark.synth import transcripts_duckdb_sql


def test_salted_collect_set_exact(spark, sf_transcripts):
    from pyspark.sql import functions as F

    got = {
        r["conv_id"]: (list(r["tools"]), r["n_tools"])
        for r in skew.conv_tool_profile(sf_transcripts).collect()
    }
    plain = (
        sf_transcripts.where(F.col("tool") != "")
        .groupBy("conv_id")
        .agg(F.array_sort(F.collect_set("tool")).alias("tools"))
        .collect()
    )
    want = {r["conv_id"]: (list(r["tools"]), len(r["tools"])) for r in plain}
    assert got == want
    # the mega-thread is present and went through the salted path like any key
    assert "conv-mega" in got


def test_salted_profile_vs_duckdb(spark, sf_transcripts):
    got = {
        r["conv_id"]: (list(r["tools"]), r["n_tools"])
        for r in skew.conv_tool_profile(sf_transcripts).collect()
    }
    rows = duckdb.sql(
        skew.conv_tool_profile_oracle(transcripts_duckdb_sql(SF_DIR))
    ).fetchall()
    # the oracle serializes tools (driver canonicalizer needs hashable cells)
    want = {c: (t.split(",") if t else [], n) for c, t, n in rows}
    assert got == want


def test_salt_is_deterministic(spark, sf_transcripts):
    a = skew.with_salt(sf_transcripts.select("conv_id", "tool")).collect()
    b = skew.with_salt(sf_transcripts.select("conv_id", "tool")).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_salt_spreads_wide_hot_key(spark):
    # one hot key with 1000 DISTINCT values — the state-size killer salting
    # exists for — must spread over (almost) all salt buckets
    df = spark.createDataFrame(
        [("hot", f"v{i:04d}") for i in range(1000)], ["k", "v"]
    )
    salted = skew.with_salt(df)
    buckets = {r["_salt"] for r in salted.collect()}
    assert len(buckets) == skew.N_SALT
    out = skew.salted_collect_set(df, "k", "v").collect()[0]
    assert out["n_values"] == 1000
    assert out["values"] == sorted(f"v{i:04d}" for i in range(1000))
