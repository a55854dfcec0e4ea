"""Search operators vs DuckDB oracles on the driver's documents/embeddings."""

from __future__ import annotations

import duckdb
import pytest

from tests.conftest import SF_DIR
from grepai_spark import oracles, search
from grepai_spark.embed import py_encode

QUERY = "spark merge join window"
BOOSTS = [("src0", 1.5), ("src1", 0.6)]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ("documents", "embeddings"):
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return c


@pytest.fixture(scope="module")
def docs_vec(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    return docs.join(
        emb.withColumnRenamed("vec_id", "doc_id"), "doc_id"
    )


def test_cosine_topk_vs_duckdb(spark, con):
    qv = py_encode(QUERY)
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    got = [
        (r["vec_id"], r["score"])
        for r in search.cosine_topk(emb, qv, 20).collect()
    ]
    want = con.execute(oracles.cosine_topk_oracle(qv, 20)).fetchall()
    assert [g[0] for g in got] == [w[0] for w in want]
    for g, w in zip(got, want):
        assert g[1] == pytest.approx(w[1], abs=2e-6)


def test_text_search_vs_duckdb(spark, con):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    qt = search.tokenize_query(QUERY)
    got = [
        (r["doc_id"], r["score"])
        for r in search.text_search(docs, QUERY, 15).collect()
    ]
    want = con.execute(oracles.text_search_oracle(qt, 15)).fetchall()
    assert [g[0] for g in got] == [w[0] for w in want]


def test_hybrid_search_vs_duckdb(spark, con, docs_vec):
    qv = py_encode(QUERY)
    qt = search.tokenize_query(QUERY)
    got = [
        (r["doc_id"], r["source"], r["score"])
        for r in search.hybrid_search(
            docs_vec, QUERY, qv, limit=10, boost_patterns=BOOSTS
        ).collect()
    ]
    want = con.execute(
        oracles.hybrid_search_oracle(qv, qt, 10, boost_patterns=BOOSTS)
    ).fetchall()
    assert [(g[0], g[1]) for g in got] == [(w[0], w[1]) for w in want]
    for g, w in zip(got, want):
        assert g[2] == pytest.approx(w[2], abs=2e-6)


def test_dedup_top1_semantics(spark):
    rows = [(1, "a", 0.9), (2, "a", 0.8), (3, "b", 0.5), (4, "b", 0.5)]
    df = spark.createDataFrame(rows, ["doc_id", "source", "score"])
    got = {
        (r["doc_id"], r["source"])
        for r in search.dedup_top1(df, "source").collect()
    }
    assert got == {(1, "a"), (3, "b")}  # tie broken by lowest id
