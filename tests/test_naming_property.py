"""Property-based lockstep: python twins vs DuckDB dialects on arbitrary
identifier-ish strings (hypothesis)."""

from __future__ import annotations

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st

from grepai_spark.naming import (
    norm_tokens_sql,
    py_norm_tokens,
    py_verb_object,
    verb_object_sql,
)

# identifier-ish alphabet incl. separators, digits, case transitions
NAME = st.text(
    alphabet="abcdefghijXYZPQ0189_.-$ ",
    min_size=0,
    max_size=24,
)

_con = duckdb.connect()


def _duck(expr_builder, name: str):
    # parameter binding avoids quote-escaping pitfalls
    return _con.execute(
        f"SELECT {expr_builder('n', 'duckdb')} FROM (SELECT ? AS n) t",
        [name],
    ).fetchone()[0]


@settings(max_examples=300, deadline=None)
@given(NAME)
def test_norm_tokens_lockstep(name):
    got = _duck(norm_tokens_sql, name)
    assert (got or []) == py_norm_tokens(name)


@settings(max_examples=300, deadline=None)
@given(NAME)
def test_verb_object_lockstep(name):
    assert _duck(verb_object_sql, name) == py_verb_object(name)
