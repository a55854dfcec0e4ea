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

import zlib

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
    h = zlib.crc32(tok.encode("utf-8"))
    idx = h % dim
    sign = 1.0 if (h >> 16) & 1 else -1.0
    return idx, sign


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
