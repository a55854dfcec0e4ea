"""DuckDB oracle SQL builders for the KG pipeline queries.

Each function returns ANSI SQL that DuckDB runs over the driver's parquet
views (region/nation/.../events/documents/embeddings). They re-derive the same
results as the Spark operators through an INDEPENDENT declarative path — e.g.
connected components via a recursive CTE instead of large-star/small-star.
"""

from __future__ import annotations

from grepai_spark.naming import first_token_sql, jaccard_sql, norm_tokens_sql
from grepai_spark.synth import alias_dict_values_sql, transcripts_sql

# The driver registers `events` as a view; transcripts derive from it.
TRANSCRIPTS_REL = transcripts_sql("events", "duckdb")


def transcripts_oracle() -> str:
    return TRANSCRIPTS_REL


def call_triples_oracle() -> str:
    return f"""
SELECT role AS subj, 'calls' AS pred, tool AS obj, conv_id, turn_idx,
       CAST(1.0 AS FLOAT) AS weight
FROM ({TRANSCRIPTS_REL}) t
WHERE tool <> ''
""".strip()


def mentions_oracle() -> str:
    from grepai_spark.extract import mentions_oracle_sql

    return mentions_oracle_sql(TRANSCRIPTS_REL, "duckdb")


def link_exact_oracle() -> str:
    return f"""
SELECT m.conv_id, m.turn_idx, m.role, m.mention, m.pos, m.kind, d2.canonical_id
FROM ({mentions_oracle()}) m
LEFT JOIN {alias_dict_values_sql().replace(' AS d(', ' AS d2(')} ON m.mention = d2.alias
""".strip()


def _norm_dict_cte() -> str:
    toks = norm_tokens_sql("alias", "duckdb")
    blk = first_token_sql("alias", "duckdb")
    return f"""
nd AS (
  SELECT alias, canonical_id, kind, {toks} AS norm_tokens, {blk} AS block
  FROM {alias_dict_values_sql()}
),
capped AS (
  SELECT *, row_number() OVER (PARTITION BY block ORDER BY alias) AS rn FROM nd
),
sim AS (
  SELECT DISTINCT a.canonical_id AS src, b.canonical_id AS dst
  FROM capped a JOIN capped b ON a.block = b.block
  WHERE a.alias < b.alias AND a.canonical_id <> b.canonical_id
    AND a.rn <= 100 AND b.rn <= 100
    AND {jaccard_sql('a.norm_tokens', 'b.norm_tokens', 'duckdb')} >= 0.5
)
""".strip()


def alias_sim_edges_oracle() -> str:
    return f"WITH {_norm_dict_cte()} SELECT src, dst FROM sim"


def _canonical_map_ctes() -> str:
    """Recursive-CTE connected components over the sim graph:
    entity_id(c) = min id reachable from c."""
    return f"""
{_norm_dict_cte()},
bidir AS (
  SELECT src AS a, dst AS b FROM sim
  UNION SELECT dst AS a, src AS b FROM sim
),
canon AS (SELECT DISTINCT canonical_id FROM nd),
reach AS (
  SELECT canonical_id AS a, canonical_id AS b FROM canon
  UNION
  SELECT r.a, e.b FROM reach r JOIN bidir e ON r.b = e.a
),
comp AS (
  SELECT a AS canonical_id, min(b) AS entity_id FROM reach GROUP BY a
)
""".strip()


def canonical_map_oracle() -> str:
    return f"WITH RECURSIVE {_canonical_map_ctes()} SELECT canonical_id, entity_id FROM comp"


def kg_edges_oracle() -> str:
    """Full-pipeline oracle: calls ∪ canonicalized mention triples."""
    return f"""
WITH RECURSIVE {_canonical_map_ctes()}
SELECT DISTINCT * FROM (
  SELECT role AS subj, 'calls' AS pred, tool AS obj, conv_id, turn_idx,
         CAST(1.0 AS FLOAT) AS weight
  FROM ({TRANSCRIPTS_REL}) t WHERE tool <> ''
  UNION ALL
  SELECT m.role AS subj, 'mentions' AS pred, comp.entity_id AS obj,
         m.conv_id, m.turn_idx, CAST(1.0 AS FLOAT) AS weight
  FROM ({mentions_oracle()}) m
  JOIN nd ON m.mention = nd.alias
  JOIN comp ON nd.canonical_id = comp.canonical_id
) u
""".strip()


def kg_vertices_oracle() -> str:
    return f"""
WITH RECURSIVE {_canonical_map_ctes()}
SELECT comp.entity_id,
       min(nd.alias) AS canonical_name,
       min(nd.kind) AS kind,
       list_sort(list_distinct(list(nd.alias))) AS aliases
FROM nd JOIN comp ON nd.canonical_id = comp.canonical_id
GROUP BY comp.entity_id
""".strip()


def co_invocation_oracle(min_cooccur: int = 2, hub_cap: int = 50) -> str:
    return f"""
WITH calls AS (
  SELECT DISTINCT conv_id, tool
  FROM ({TRANSCRIPTS_REL}) t WHERE tool <> ''
),
fanout AS (
  SELECT conv_id, count(*) AS n_tools FROM calls GROUP BY conv_id
),
small AS (
  SELECT c.* FROM calls c JOIN fanout f
  ON c.conv_id = f.conv_id AND f.n_tools <= {hub_cap}
)
SELECT a.tool AS subj, 'co_invoked' AS pred, b.tool AS obj,
       '*' AS conv_id, CAST(-1 AS INT) AS turn_idx,
       CAST(count(*) AS FLOAT) AS weight
FROM small a JOIN small b
  ON a.conv_id = b.conv_id AND a.tool < b.tool
GROUP BY a.tool, b.tool
HAVING count(*) >= {min_cooccur}
""".strip()
