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
    rows = out.select("text", "vector").collect()
    assert len(rows) == tiny_transcripts.count()
    for r in rows:
        want = py_encode(r["text"])
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
