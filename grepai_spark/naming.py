"""Name normalization — the alias/feature tokenizer.

Reinterprets the reference's splitName (camelCase/PascalCase/snake_case/acronym
splitting, /root/reference/rpg/extractor_local.go:180-256) and
normalizeAtomicFeature (/root/reference/rpg/features.go:11-25) as a single
normalization: surface form -> sorted distinct lowercase token array.

Three twins of the SAME function, kept in lockstep (tested against each other):

* :func:`py_norm_tokens` — pure Python; used by the golden-triple oracle and
  inside pandas UDFs.
* :func:`norm_tokens_sql` — SQL expression string, emitted for either the
  ``spark`` or ``duckdb`` dialect; used by queries and their DuckDB oracles.
* :func:`norm_tokens_col` — the Spark Column (just ``F.expr`` of the former).

Being expressible as built-in SQL keeps this JVM-side (whole-stage codegen) in
the hot path — no Python needed for normalization at scale.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

# camel boundary: lower/digit followed by upper; acronym boundary: run of uppers
# followed by Upper+lower (HTTPServer -> HTTP Server).
_CAMEL = r"([a-z0-9])([A-Z])"
_ACRO = r"([A-Z]+)([A-Z][a-z])"
_SEP = r"[^a-z0-9]+"

_PY_CAMEL = re.compile(_CAMEL)
_PY_ACRO = re.compile(_ACRO)
_PY_SEP = re.compile(_SEP)


def py_norm_tokens(name: str) -> list[str]:
    """Pure-Python twin of :func:`norm_tokens_sql`."""
    s = _PY_ACRO.sub(r"\1 \2", name)
    s = _PY_CAMEL.sub(r"\1 \2", s)
    toks = [t for t in _PY_SEP.split(s.lower()) if t]
    return sorted(set(toks))


def norm_tokens_sql(col: str, dialect: str = "spark") -> str:
    """SQL expression producing the sorted distinct token array for `col`."""
    if dialect == "spark":
        g1, g2 = "$1", "$2"
        split = f"split(lower(regexp_replace(regexp_replace({col}, '{_ACRO}', '{g1} {g2}'), '{_CAMEL}', '{g1} {g2}')), '{_SEP}')"
        return f"array_sort(array_distinct(filter({split}, x -> x != '')))"
    elif dialect == "duckdb":
        # DuckDB's regexp_replace replaces only the first match unless 'g'.
        g1, g2 = "\\1", "\\2"
        split = f"regexp_split_to_array(lower(regexp_replace(regexp_replace({col}, '{_ACRO}', '{g1} {g2}', 'g'), '{_CAMEL}', '{g1} {g2}', 'g')), '{_SEP}')"
        return f"list_sort(list_distinct(list_filter({split}, x -> x != '')))"
    raise ValueError(f"unknown dialect {dialect!r}")


def norm_tokens_col(col: str) -> Column:
    return F.expr(norm_tokens_sql(col, "spark"))


def norm_key_sql(col: str, dialect: str = "spark") -> str:
    """Canonical join key: tokens joined by '_' (e.g. FetchData == fetch_data)."""
    arr = norm_tokens_sql(col, dialect)
    if dialect == "spark":
        return f"array_join({arr}, '_')"
    return f"list_aggregate({arr}, 'string_agg', '_')"


def py_norm_key(name: str) -> str:
    return "_".join(py_norm_tokens(name))


def py_first_token(name: str) -> str:
    """First token in SURFACE order (not sorted) — the blocking key, mirroring
    the reference's verb blocking by the feature's first word
    (/root/reference/rpg/indexer.go:661-695)."""
    s = _PY_ACRO.sub(r"\1 \2", name)
    s = _PY_CAMEL.sub(r"\1 \2", s)
    toks = [t for t in _PY_SEP.split(s.lower()) if t]
    return toks[0] if toks else ""


def first_token_sql(col: str, dialect: str = "spark") -> str:
    """SQL twin of :func:`py_first_token`."""
    if dialect == "spark":
        g1, g2 = "$1", "$2"
        split = f"split(lower(regexp_replace(regexp_replace({col}, '{_ACRO}', '{g1} {g2}'), '{_CAMEL}', '{g1} {g2}')), '{_SEP}')"
        return f"element_at(filter({split}, x -> x != ''), 1)"
    g1, g2 = "\\1", "\\2"
    split = f"regexp_split_to_array(lower(regexp_replace(regexp_replace({col}, '{_ACRO}', '{g1} {g2}', 'g'), '{_CAMEL}', '{g1} {g2}', 'g')), '{_SEP}')"
    return f"list_filter({split}, x -> x != '')[1]"


def jaccard_sql(a: str, b: str, dialect: str = "spark") -> str:
    """Jaccard over two token arrays; threshold 0.5 mirrors the reference
    (/root/reference/rpg/indexer.go:19, calculateJaccardSimilarity
    rpg/indexer.go:496-518)."""
    if dialect == "spark":
        return (
            f"CAST(size(array_intersect({a}, {b})) AS DOUBLE)"
            f" / CAST(size(array_union({a}, {b})) AS DOUBLE)"
        )
    return (
        f"CAST(len(list_intersect({a}, {b})) AS DOUBLE)"
        f" / CAST(len(list_distinct(list_concat({a}, {b}))) AS DOUBLE)"
    )


def py_jaccard(a: list[str], b: list[str]) -> float:
    sa, sb = set(a), set(b)
    u = sa | sb
    return (len(sa & sb) / len(u)) if u else 0.0
