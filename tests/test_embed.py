"""Encoder determinism + content-hash cache behavior."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from grepai_spark.embed import (
    embed_with_cache,
    make_encoder_udf,
    py_encode,
    with_content_hash,
)
from grepai_spark.storage import Catalog


def test_py_encode_deterministic_and_normalized():
    a = py_encode("spark merge join window")
    b = py_encode("spark merge join window")
    assert a == b
    assert math.isclose(sum(x * x for x in a), 1.0, rel_tol=1e-9)
    assert py_encode("") == [0.0] * 64


def test_udf_matches_py_twin(spark):
    texts = [
        "spark merge join window",
        "the fast key order sort",
        "",
        "unicode héllo—世界",
        "spark merge join window",  # duplicate
    ]
    df = spark.createDataFrame([(t,) for t in texts], ["text"])
    enc = make_encoder_udf()
    got = [
        list(r["v"])
        for r in df.select(enc(F.col("text")).alias("v")).collect()
    ]
    for t, v in zip(texts, got):
        want = py_encode(t)
        assert all(
            math.isclose(a, b, rel_tol=1e-5, abs_tol=1e-7)
            for a, b in zip(v, want)
        ), t


def test_cache_hits_on_duplicates(spark, sf_transcripts, tmp_path):
    cat = Catalog(spark, str(tmp_path / "cat"))
    _, c1 = embed_with_cache(cat, sf_transcripts)
    # dup-heavy corpus: substantially fewer distinct texts than turns, so
    # dropDuplicates(content_hash) saves real encoder work
    n = sf_transcripts.count()
    assert c1["distinct_texts"] < 0.9 * n
    assert n - c1["distinct_texts"] > 100  # absolute dedup savings
    assert c1["cache_misses"] == c1["distinct_texts"]
    # second run: all hits, no re-encode
    _, c2 = embed_with_cache(cat, sf_transcripts)
    assert c2["cache_misses"] == 0
    assert c2["cache_hits"] == c2["distinct_texts"]


def test_embedded_vectors_join_back(spark, tiny_transcripts, tmp_path):
    cat = Catalog(spark, str(tmp_path / "cat"))
    out, _ = embed_with_cache(cat, tiny_transcripts)
    rows = out.select("conv_id", "turn_idx", "role", "text", "vector").collect()
    assert len(rows) == tiny_transcripts.count()
    # C2: the encoder input is the context-prefixed text of the
    # deterministically-first occurrence of each distinct text
    first = {}
    for r in sorted(rows, key=lambda r: (r["conv_id"], r["turn_idx"])):
        first.setdefault(r["text"], r)
    for r in rows:
        f = first[r["text"]]
        want = py_encode(f"conv: {f['conv_id']} / {f['role']}\n\n{f['text']}")
        assert all(
            math.isclose(a, b, rel_tol=1e-5, abs_tol=1e-7)
            for a, b in zip(r["vector"], want)
        )


def test_content_hash_is_sha256(spark):
    import hashlib

    df = spark.createDataFrame([("abc",)], ["text"])
    got = with_content_hash(df).first()["content_hash"]
    assert got == hashlib.sha256(b"abc").hexdigest()


def test_encoder_runs_exactly_once_per_miss(spark, sf_transcripts, tmp_path):
    """The encoder UDF is the dominant Python cost; the checkpoint in
    embed_with_cache must prevent the count+merge pair from executing it
    twice. encoded_rows is an executor-side accumulator — re-executed plans
    double it."""
    cat = Catalog(spark, str(tmp_path / "cat_once"))
    _, c1 = embed_with_cache(cat, sf_transcripts)
    assert c1["encoded_rows"] == c1["cache_misses"]
    # warm rerun: no misses, encoder never invoked
    _, c2 = embed_with_cache(cat, sf_transcripts)
    assert c2["cache_misses"] == 0
    assert c2["encoded_rows"] == 0


def test_encoder_truncates_long_input():
    # C3: the encoder caps input deterministically (the reference re-chunks
    # on context overflow; a local encoder truncates instead)
    from grepai_spark.embed import MAX_EMBED_CHARS

    long = ("alpha beta " * 1000).strip()
    assert len(long) > MAX_EMBED_CHARS
    assert py_encode(long) == py_encode(long[:MAX_EMBED_CHARS])
    # and the tail genuinely can't influence the vector
    assert py_encode(long[:MAX_EMBED_CHARS] + " zebra") == py_encode(
        long[:MAX_EMBED_CHARS] + " yak"
    )


def test_context_prefix_in_embed_input(spark, tmp_path):
    # C2: duplicate texts across conversations share ONE cached vector whose
    # context prefix comes from the deterministically-first occurrence —
    # the reference's cache-by-content-hash semantics (EmbedContent carries
    # "File: <path>" but the cache key is the raw content hash).
    from grepai_spark.schemas import TRANSCRIPTS
    import datetime

    ts = datetime.datetime(2024, 1, 1)
    rows = [
        ("cB", 0, "user", "same text here", "", ts),
        ("cA", 3, "assistant", "same text here", "", ts),
    ]
    t = spark.createDataFrame(rows, schema=TRANSCRIPTS)
    cat = Catalog(spark, str(tmp_path / "cat_ctx"))
    out, counters = embed_with_cache(cat, t)
    assert counters["cache_misses"] == 1  # one distinct text
    vecs = {
        (r["conv_id"], r["turn_idx"]): tuple(r["vector"])
        for r in out.collect()
    }
    # both turns share the cached vector
    assert vecs[("cB", 0)] == vecs[("cA", 3)]
    # and the vector encodes the FIRST (min conv_id, turn_idx) context
    want = tuple(py_encode("conv: cA / assistant\n\nsame text here"))
    import math
    assert all(
        math.isclose(a, b, rel_tol=1e-5, abs_tol=1e-7)
        for a, b in zip(vecs[("cB", 0)], want)
    )
