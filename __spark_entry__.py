"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship KG-construction query on sf0.001;
``queries()`` exposes one callable per implemented operator from SURVEY.md §2;
``oracle_sql()`` gives the DuckDB-equivalent SQL the driver compares against
at sf0.01 (row-count + schema + order-insensitive value-hash).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from grepai_spark import extract, link, oracles, pipeline, search
from grepai_spark.cc import canonical_map
from grepai_spark.embed import py_encode, with_content_hash
from grepai_spark.link import alias_similarity_edges
from grepai_spark.materialize import co_invocation_edges
from grepai_spark.synth import alias_dict_df, load_transcripts

SEARCH_QUERY = "spark merge join window"
BOOST_PATTERNS = [("src0", 1.5), ("src1", 0.6)]


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: full KG pipeline (extract -> link -> canonicalize ->
    materialize) over transcripts synthesized from sf0.001."""
    t = load_transcripts(spark, "/root/testdata/sf0.001")
    return pipeline.kg_edges_df(spark, t, alias_dict_df(spark))


# --------------------------------------------------------------------------
# queries: each callable (spark, sf_dir) -> DataFrame
# --------------------------------------------------------------------------

def _q_transcripts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_transcripts(spark, sf_dir)


def _q_call_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    return extract.call_triples(load_transcripts(spark, sf_dir))


def _q_mentions(spark: SparkSession, sf_dir: str) -> DataFrame:
    return extract.detect_mentions(
        load_transcripts(spark, sf_dir), alias_dict_df(spark)
    )


def _q_link_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    m = extract.detect_mentions(
        load_transcripts(spark, sf_dir), alias_dict_df(spark)
    )
    return link.link_mentions_exact(m, alias_dict_df(spark))


def _q_alias_sim_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    return alias_similarity_edges(alias_dict_df(spark))


def _q_canonical_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = alias_dict_df(spark)
    return canonical_map(d, alias_similarity_edges(d))


def _q_kg_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_transcripts(spark, sf_dir)
    return pipeline.kg_edges_df(spark, t, alias_dict_df(spark))


def _q_kg_vertices(spark: SparkSession, sf_dir: str) -> DataFrame:
    return pipeline.kg_vertices_df(spark, alias_dict_df(spark))


def _q_co_invocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    calls = extract.call_triples(load_transcripts(spark, sf_dir))
    return co_invocation_edges(calls)


def _docs_with_vec(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return docs.join(emb.withColumnRenamed("vec_id", "doc_id"), "doc_id")


def _q_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return search.cosine_topk(emb, py_encode(SEARCH_QUERY), 20)


def _q_text_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return search.text_search(docs, SEARCH_QUERY, 15)


def _q_hybrid_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    return search.hybrid_search(
        _docs_with_vec(spark, sf_dir),
        SEARCH_QUERY,
        py_encode(SEARCH_QUERY),
        limit=10,
        boost_patterns=BOOST_PATTERNS,
    )


def _q_embed_cache_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = with_content_hash(load_transcripts(spark, sf_dir))
    return t.agg(
        F.count("*").alias("n_turns"),
        F.countDistinct("content_hash").alias("n_distinct_texts"),
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "transcripts_synth": _q_transcripts,
        "call_triples": _q_call_triples,
        "mentions": _q_mentions,
        "link_exact": _q_link_exact,
        "alias_sim_edges": _q_alias_sim_edges,
        "canonical_map": _q_canonical_map,
        "kg_edges": _q_kg_edges,
        "kg_vertices": _q_kg_vertices,
        "co_invocation": _q_co_invocation,
        "cosine_topk": _q_cosine_topk,
        "text_search": _q_text_search,
        "hybrid_search": _q_hybrid_search,
        "embed_cache_stats": _q_embed_cache_stats,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "transcripts_synth": oracles.transcripts_oracle(),
        "call_triples": oracles.call_triples_oracle(),
        "mentions": oracles.mentions_oracle(),
        "link_exact": oracles.link_exact_oracle(),
        "alias_sim_edges": oracles.alias_sim_edges_oracle(),
        "canonical_map": oracles.canonical_map_oracle(),
        "kg_edges": oracles.kg_edges_oracle(),
        "kg_vertices": oracles.kg_vertices_oracle(),
        "co_invocation": oracles.co_invocation_oracle(),
        "cosine_topk": oracles.cosine_topk_oracle(
            py_encode(SEARCH_QUERY), 20
        ),
        "text_search": oracles.text_search_oracle(
            search.tokenize_query(SEARCH_QUERY), 15
        ),
        "hybrid_search": oracles.hybrid_search_oracle(
            py_encode(SEARCH_QUERY),
            search.tokenize_query(SEARCH_QUERY),
            10,
            boost_patterns=BOOST_PATTERNS,
        ),
        "embed_cache_stats": oracles.embed_cache_stats_oracle(),
    }
