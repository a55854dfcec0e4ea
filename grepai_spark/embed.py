"""Stage 1b — EMBED: batched deterministic encoder + content-hash cache.

The reference embeds chunks through pluggable HTTP providers with batching,
retries and a content-hash cache (Embedder interface
/root/reference/embedder/embedder.go:6-36, batching embedder/batch.go:115-135,
cache store/store.go:105-109 used at indexer/indexer.go:352-417). Here:

* the encoder is a deterministic hash-projection embedder (the analog of the
  reference's synthetic provider, /root/reference/embedder/synthetic.go:18) —
  a pandas UDF over Arrow batches, so one Python invocation handles up to
  `spark.sql.execution.arrow.maxRecordsPerBatch` texts (the batch-cap analog);
  no per-row Python.
* the cache is a content_hash-keyed table. The flow is the biggest cost saver
  at 10^12 turns: dropDuplicates(content_hash) BEFORE encoding collapses all
  duplicate texts to one encoder call, then cache hits skip even that.

At cluster scale the encode stage is embarrassingly parallel; the only
shuffle is the dropDuplicates on content_hash (hash partitioning on a
uniformly distributed key — no skew by construction).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, FloatType

from grepai_spark.schemas import EMBED_DIM, EMBEDDING_CACHE
from grepai_spark.storage import Catalog

_TOKEN_SPLIT = r"[^0-9a-z]+"

# C3 — deterministic input truncation inside the encoder (the reference
# re-chunks on context overflow, indexer/chunker.go:175-277; with a local
# deterministic encoder the equivalent is a hard cap): 512 tokens x ~4
# chars/token, the reference chunk size (indexer/chunker.go:11-15).
MAX_EMBED_CHARS = 2048


def _token_slot(tok: str, dim: int) -> tuple[int, float]:
    """Slot assignment for one token: a 32-bit integer from the first 8 hex
    chars of md5(token) picks the slot (mod dim) and the sign (bit 16).

    md5-keyed ON PURPOSE (round 6; previously crc32): md5 hex is identical
    in Python, Spark and DuckDB, so the whole encoder has an exact SQL twin
    (:func:`slot_hash_sql`) and the embed plane joins the driver's
    cross-engine correctness gate — the same lockstep-twin discipline the
    dedup signatures follow (dedup.minhash_sql). crc32 exists in none of the
    SQL engines here.
    """
    h = int(hashlib.md5(tok.encode("utf-8")).hexdigest()[:8], 16)
    idx = h % dim
    sign = 1.0 if (h >> 16) & 1 else -1.0
    return idx, sign


def slot_hash_sql(tok_expr: str, dialect: str = "spark") -> str:
    """SQL twin of the 32-bit slot hash: int(md5(tok)[:8], 16).

    Slot index = hash % dim; sign = +1 iff (hash // 65536) % 2 == 1 — both
    pure integer arithmetic downstream of this expression, so any aggregate
    built on slots compares EXACTLY across engines (no float in sight).
    """
    if dialect == "spark":
        # conv() returns a decimal string; the cast is ANSI-safe (digits only)
        return f"CAST(conv(substring(md5({tok_expr}), 1, 8), 16, 10) AS BIGINT)"
    return f"CAST('0x' || substr(md5({tok_expr}), 1, 8) AS BIGINT)"


def py_encode(text: str, dim: int = EMBED_DIM) -> list[float]:
    """Pure-Python twin — used for query vectors on the driver and in tests.

    Deterministic hashed bag-of-words projection, L2-normalized. Empty text
    -> zero vector. Input truncated at MAX_EMBED_CHARS (C3).
    """
    import re

    v = np.zeros(dim, dtype=np.float64)
    for tok in re.split(_TOKEN_SPLIT, (text or "")[:MAX_EMBED_CHARS].lower()):
        if tok:
            idx, sign = _token_slot(tok, dim)
            v[idx] += sign
    n = float(np.linalg.norm(v))
    if n > 0:
        v /= n
    return [float(x) for x in v]


def make_encoder_udf(dim: int = EMBED_DIM, row_counter=None):
    """Arrow-batched encoder: Series[str] -> Series[list[float]].

    Token -> slot lookups are memoized across the batch (texts repeat tokens
    heavily), so per-batch cost is ~O(total tokens) with small constants.

    `row_counter` (an optional Spark accumulator) counts rows actually
    encoded — the guard that the expensive Python stage executes exactly
    once per miss (re-executed plans double-count and fail the pipeline's
    own assertion / test_embed).
    """
    import re

    splitter = re.compile(_TOKEN_SPLIT)

    @F.pandas_udf(ArrayType(FloatType()))
    def encode(texts: pd.Series) -> pd.Series:
        if row_counter is not None:
            row_counter.add(len(texts))
        slot_cache: dict[str, tuple[int, float]] = {}
        out = []
        for text in texts.fillna(""):
            v = np.zeros(dim, dtype=np.float64)
            # C3: hard input cap — the re-chunk-on-overflow analog
            for tok in splitter.split(text[:MAX_EMBED_CHARS].lower()):
                if not tok:
                    continue
                s = slot_cache.get(tok)
                if s is None:
                    s = _token_slot(tok, dim)
                    slot_cache[tok] = s
                v[s[0]] += s[1]
            n = float(np.linalg.norm(v))
            if n > 0:
                v /= n
            out.append([float(x) for x in v])
        return pd.Series(out)

    return encode


def vector_slot_stats(cache: DataFrame, dim: int = EMBED_DIM) -> DataFrame:
    """Per-bucket integer checksums over STORED vectors — the embed plane's
    driver-checkable surface (E1/E6).

    Normalization divides the integer slot counts by a positive norm, so a
    stored float vector still carries three exactly-recomputable integer
    facts per hash: which slots are nonzero, and the index sums of the
    positive and negative slots. Summed per content-hash bucket they form a
    checksum an independent engine recomputes EXACTLY from the raw text
    (:func:`turn_vector_stats_oracle`) — any slot misplacement, sign flip,
    truncation drift or stale cache row changes some bucket's integers. All
    arithmetic is integer; no float ever crosses the engine comparison.

    Plan: one scan of the cache, per-row higher-order functions (zero
    Python), a 16-group aggregate — nothing here grows with corpus size
    except the scan.
    """
    nnz = F.expr("size(filter(vector, x -> x != 0))").cast("long")
    pos = F.expr(
        "aggregate(zip_with(vector, sequence(0, {n}), (v, i) ->"
        " IF(v > 0, i, 0)), 0L, (a, x) -> a + x)".format(n=dim - 1)
    )
    neg = F.expr(
        "aggregate(zip_with(vector, sequence(0, {n}), (v, i) ->"
        " IF(v < 0, i, 0)), 0L, (a, x) -> a + x)".format(n=dim - 1)
    )
    return (
        cache.select(
            F.substring("content_hash", 1, 1).alias("bucket"),
            nnz.alias("nnz"),
            pos.alias("pos_idx"),
            neg.alias("neg_idx"),
        )
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n_hashes"),
            F.sum("nnz").alias("nnz_sum"),
            F.sum("pos_idx").alias("pos_idx_sum"),
            F.sum("neg_idx").alias("neg_idx_sum"),
        )
    )


def turn_vector_stats_oracle(
    transcripts_rel: str, dim: int = EMBED_DIM
) -> str:
    """DuckDB replay of the ENTIRE embed plane: content hash, first-occurrence
    context prefix (C2), truncation (C3), tokenization, md5 slot/sign (E1)
    and the per-bucket integer checksums of :func:`vector_slot_stats` —
    recomputed from the raw transcripts with no Spark involved."""
    h = slot_hash_sql("tok", "duckdb")
    return f"""
WITH t AS ({transcripts_rel}),
hashed AS (
  SELECT sha256(text) AS content_hash, conv_id, turn_idx, role, text FROM t
),
firsts AS (
  SELECT content_hash,
         'conv: ' || conv_id || ' / ' || role || chr(10) || chr(10) || text
           AS embed_text,
         row_number() OVER (PARTITION BY content_hash
                            ORDER BY conv_id, turn_idx, role, text) AS rn
  FROM hashed
),
toks AS (
  SELECT content_hash,
         unnest(list_filter(regexp_split_to_array(
           lower(substr(embed_text, 1, {MAX_EMBED_CHARS})), '[^0-9a-z]+'),
           x -> x <> '')) AS tok
  FROM firsts WHERE rn = 1
),
slots AS (
  SELECT content_hash, h % {dim} AS idx,
         CASE WHEN (h // 65536) % 2 = 1 THEN 1 ELSE -1 END AS sgn
  FROM (SELECT content_hash, {h} AS h FROM toks) s
),
cnts AS (
  SELECT content_hash, idx, SUM(sgn) AS cnt
  FROM slots GROUP BY content_hash, idx
),
per_hash AS (
  SELECT content_hash,
         COUNT(*) FILTER (WHERE cnt <> 0) AS nnz,
         COALESCE(SUM(idx) FILTER (WHERE cnt > 0), 0) AS pos_idx,
         COALESCE(SUM(idx) FILTER (WHERE cnt < 0), 0) AS neg_idx
  FROM cnts GROUP BY content_hash
),
all_hashes AS (SELECT DISTINCT content_hash FROM hashed)
SELECT substr(a.content_hash, 1, 1) AS bucket,
       COUNT(*) AS n_hashes,
       CAST(SUM(COALESCE(p.nnz, 0)) AS BIGINT) AS nnz_sum,
       CAST(SUM(COALESCE(p.pos_idx, 0)) AS BIGINT) AS pos_idx_sum,
       CAST(SUM(COALESCE(p.neg_idx, 0)) AS BIGINT) AS neg_idx_sum
FROM all_hashes a LEFT JOIN per_hash p USING (content_hash)
GROUP BY 1
""".strip()


def with_content_hash(df: DataFrame, text_col: str = "text") -> DataFrame:
    """sha2-256 of the text — the reference's chunk ContentHash
    (/root/reference/indexer/chunker.go:104-105)."""
    return df.withColumn("content_hash", F.sha2(F.col(text_col), 256))


def embed_with_cache(
    catalog: Catalog,
    turns: DataFrame,
    dim: int = EMBED_DIM,
    cache_table: str = "embedding_cache",
) -> tuple[DataFrame, dict[str, int]]:
    """Attach a `vector` column to turns, encoding only cache misses.

    Returns (turns + content_hash + vector, counters). Flow:
      distinct content_hash  ->  anti-join cache  ->  encode misses
      ->  MERGE into cache   ->  join turns back to the cache.
    Idempotent: vectors are deterministic functions of content_hash, so
    last-write-wins merges are safe under resume (SURVEY.md §7.4).

    Cross-run determinism caveat (the reference's cache-by-content semantics,
    indexer/indexer.go:161-164): with C2 context prefixing the cached vector
    for a content_hash depends on which (conv_id, turn_idx) FIRST carried
    that text in the run that missed the cache — the min-struct tie-break is
    deterministic within one batch, but ingesting the same corpus in a
    different batch order can persist a different (equally valid) vector for
    identical text. Downstream ANN results should not be assumed bit-stable
    across ingestion orders; include the prefix in the cache key if that
    stability is required.
    """
    hashed = with_content_hash(turns)
    cache = catalog.read(cache_table, schema=EMBEDDING_CACHE)

    # C2 — context prefixing (ref chunker.go:160-170 prepends "File: <path>"
    # to EmbedContent while caching by raw-content hash): the encoder sees
    # "conv: <id> / <role>\n\n<text>"; the CACHE KEY stays the raw-text hash,
    # so — exactly like the reference — duplicate texts share one vector and
    # the context of the deterministically-first occurrence (min conv_id,
    # turn_idx) wins.
    distinct_texts = (
        hashed.groupBy("content_hash")
        .agg(F.min(F.struct("conv_id", "turn_idx", "role", "text")).alias("m"))
        .select(
            "content_hash",
            F.concat(
                F.lit("conv: "),
                F.col("m.conv_id"),
                F.lit(" / "),
                F.col("m.role"),
                F.lit("\n\n"),
                F.col("m.text"),
            ).alias("embed_text"),
        )
    )
    misses = distinct_texts.join(
        cache.select("content_hash"), "content_hash", "left_anti"
    )
    encode_acc = catalog.spark.sparkContext.accumulator(0)
    encoder = make_encoder_udf(dim, row_counter=encode_acc)
    # localCheckpoint materializes the encoded misses ONCE; the count and the
    # cache merge below both read the materialized blocks instead of each
    # re-executing the encoder UDF (the single most expensive Python stage —
    # running it twice doubles the pipeline's dominant cost at corpus scale).
    encoded = misses.select(
        "content_hash", encoder(F.col("embed_text")).alias("vector")
    ).localCheckpoint(eager=True)
    n_total = distinct_texts.count()
    n_miss = encoded.count()
    # misses are by construction NEW cache keys (anti-joined above), so the
    # merge degenerates to an append — Iceberg's fast-append snapshot, O(new)
    # instead of an O(table) rewrite.
    if n_miss:
        catalog.append(cache_table, encoded)

    cache_now = catalog.read(cache_table, schema=EMBEDDING_CACHE)
    out = hashed.join(cache_now, "content_hash", "left")
    counters = {
        "distinct_texts": n_total,
        "cache_misses": n_miss,
        "cache_hits": n_total - n_miss,
        # rows the encoder ACTUALLY processed — equals cache_misses iff the
        # UDF ran exactly once (plan re-execution would double it)
        "encoded_rows": encode_acc.value,
    }
    return out, counters
