"""The three normalization twins (python / spark / duckdb) must agree."""

from __future__ import annotations

import duckdb
import pytest

from grepai_spark.naming import (
    norm_key_sql,
    norm_tokens_sql,
    py_jaccard,
    py_norm_key,
    py_norm_tokens,
)

NAMES = [
    "FetchData",
    "fetch_data",
    "DataFetcher",
    "QueryParserFast",
    "HTTPServer",
    "payments.charge",
    "stream_reader",
    "snake_case_name",
    "ALLCAPS",
    "mixedUPPERCase",
    "x",
    "",
    "123abc",
    "a_b_c",
]


def test_python_vs_duckdb():
    for n in NAMES:
        lit = "'" + n + "'"
        got = duckdb.sql(
            "select " + norm_tokens_sql(lit, "duckdb") + ", " + norm_key_sql(lit, "duckdb")
        ).fetchone()
        assert list(got[0]) == py_norm_tokens(n), n
        assert (got[1] or "") == py_norm_key(n), n


def test_python_vs_spark(spark):
    for n in NAMES:
        lit = "'" + n + "'"
        got = spark.sql(
            "select " + norm_tokens_sql(lit, "spark") + " a, " + norm_key_sql(lit, "spark") + " b"
        ).first()
        assert list(got["a"]) == py_norm_tokens(n), n
        assert got["b"] == py_norm_key(n), n


def test_jaccard():
    assert py_jaccard(["query", "parser"], ["fast", "parser", "query"]) == pytest.approx(2 / 3)
    assert py_jaccard([], []) == 0.0
    assert py_jaccard(["a"], ["a"]) == 1.0
