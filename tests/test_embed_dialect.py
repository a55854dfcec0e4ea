"""Three-way lockstep for the round-6 md5-keyed twins on ADVERSARIAL input:

* the encoder slot hash (embed.slot_hash_sql vs embed._token_slot) — the
  function every stored vector's geometry depends on;
* the full embed plane (vector_slot_stats over embed_with_cache output vs
  turn_vector_stats_oracle recomputing from raw text in DuckDB) — hashing,
  first-occurrence context prefix, 2048-char truncation, tokenization,
  slot/sign placement, all exercised past the fixture's ASCII blandness;
* the MinHash-LSH linking path (alias_similarity_edges_lsh vs the DuckDB
  banding replay) on a hostile dictionary that actually exercises the
  per-bucket cap.

Same discipline as test_naming_dialect / test_mentions_dialect (round 5
found two real dialect bugs this way): the driver's oracle gate only ever
sees fixture data, so twin divergence on hostile input must be hunted
separately.
"""

from __future__ import annotations

import random
import sys

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from grepai_spark import embed, link, oracles  # noqa: E402


def test_slot_hash_three_way_lockstep():
    """Tokens reaching the slot hash are always [0-9a-z]+ (the tokenizer's
    alphabet), so the hostile dimension is length and distribution, not
    unicode."""
    rng = random.Random(13)
    toks = ["a", "0", "z9", "x" * 500, "0" * 64, "deadbeef"] + [
        "".join(rng.choice("abcdefghijklmnopqrstuvwxyz0123456789") for _ in range(rng.randrange(1, 40)))
        for _ in range(300)
    ]
    py = [
        int.from_bytes(__import__("hashlib").md5(t.encode()).digest()[:4], "big")
        for t in toks
    ]
    con = duckdb.connect()
    con.register("t", pd.DataFrame({"i": range(len(toks)), "tok": toks}))
    duck = [
        r[0]
        for r in con.execute(
            f"SELECT {embed.slot_hash_sql('tok', 'duckdb')} FROM t ORDER BY i"
        ).fetchall()
    ]
    assert duck == py


def test_slot_hash_spark_dialect_matches_python(spark):
    toks = ["a", "x" * 500, "deadbeef", "q7", "00", "zz9"]
    sdf = spark.createDataFrame(pd.DataFrame({"i": range(len(toks)), "tok": toks}))
    got = [
        r[0]
        for r in sdf.orderBy("i")
        .select(F.expr(embed.slot_hash_sql("tok", "spark")))
        .collect()
    ]
    import hashlib

    want = [int(hashlib.md5(t.encode()).hexdigest()[:8], 16) for t in toks]
    assert got == want
    # and the derived (idx, sign) matches the python twin used by py_encode
    for t, h in zip(toks, want):
        idx, sign = embed._token_slot(t, 768)
        assert idx == h % 768
        assert sign == (1.0 if (h >> 16) & 1 else -1.0)


_HOSTILE_TEXTS = [
    "",
    " ",
    "please run FetchData on the table",  # fixture-ish
    "unicode héllo—世界 and MergeSort",
    "UPPER lower MiXeD 0123 ___ --- ...",
    "a" * 5000,  # truncation: token split by the 2048 boundary
    ("word " * 600),  # truncation mid-corpus of short tokens
    "émile çava über niño 日本語テキスト",
    "tabs\tand\nnewlines\r\nand  double  spaces",
    "punct!@#$%^&*()only<>?:{}|",
    "digits 000 111 999 00a a00",
    "quote'inside \"double\" back\\slash",
    "x" * 2047 + "Y" + "z" * 100,  # boundary straddles a case change
]


def test_embed_plane_matches_duckdb_on_hostile_corpus(spark, tmp_path):
    """embed_with_cache -> stored vectors -> vector_slot_stats must equal
    the DuckDB raw-text replay on a corpus with unicode, empties, 2048+
    texts and cross-conversation duplicate texts (first-occurrence prefix
    rule)."""
    from grepai_spark.schemas import TRANSCRIPTS
    from grepai_spark.storage import Catalog

    import datetime

    rows = []
    for i, txt in enumerate(_HOSTILE_TEXTS):
        rows.append(
            (f"conv-{i % 3}", i, "user" if i % 2 else "assistant", txt, "",
             datetime.datetime(2024, 1, 1, 0, i))
        )
    # duplicate text in a DIFFERENT conversation: cache key collapses them,
    # and the prefix of the (min conv_id, turn_idx) occurrence wins
    rows.append(("conv-9", 0, "user", _HOSTILE_TEXTS[2],
                 "", datetime.datetime(2024, 1, 2)))
    t = spark.createDataFrame(rows, schema=TRANSCRIPTS)

    cat = Catalog(spark, str(tmp_path / "cat"))
    _, counters = embed.embed_with_cache(cat, t)
    assert counters["encoded_rows"] == counters["cache_misses"]
    got = sorted(
        tuple(r)
        for r in embed.vector_slot_stats(cat.read("embedding_cache")).collect()
    )

    con = duckdb.connect()
    con.register(
        "ht",
        pd.DataFrame(
            rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"]
        ),
    )
    want = sorted(
        tuple(r)
        for r in con.execute(
            embed.turn_vector_stats_oracle("SELECT * FROM ht")
        ).fetchall()
    )
    assert got == want


def test_lsh_linking_matches_duckdb_on_hostile_dict(spark):
    """alias_similarity_edges_lsh vs the DuckDB banding replay on a dict
    with near-dup token sets, zero-token names, unicode, and one shared
    token set wide enough (> LSH_BUCKET_CAP aliases) that the per-bucket
    cap decides the candidate set."""
    from grepai_spark.schemas import ALIAS_DICT

    rows = [
        ("FetchData", "c1", "entity"),
        ("fetch_data", "c2", "entity"),
        ("DataFetcher", "c3", "entity"),
        ("fetchDataNow", "c4", "entity"),
        ("__", "c5", "entity"),  # zero tokens -> filtered both sides
        ("ParseQuery", "c6", "entity"),
        ("query_parse", "c7", "entity"),
        ("naïveRôle", "c8", "entity"),
        ("role_naive", "c9", "entity"),
    ]
    # one hub: > cap aliases all sharing the identical token set, so every
    # band bucket for that set overflows and the rn cap must agree exactly
    for i in range(link.LSH_BUCKET_CAP + 30):
        rows.append((f"hub_alias_{i:04d}", f"h{i:04d}", "entity"))
    # 'hub_alias_NNNN' tokens differ per alias; to make a REAL shared set,
    # add aliases that normalize identically (case variants)
    for i in range(25):
        rows.append((f"sharedTokenSet{i}", f"s{i}", "entity"))

    d = spark.createDataFrame(rows, schema=ALIAS_DICT)
    got = sorted(
        (r["src"], r["dst"])
        for r in link.alias_similarity_edges_lsh(d).collect()
    )

    con = duckdb.connect()
    con.register(
        "hd", pd.DataFrame(rows, columns=["alias", "canonical_id", "kind"])
    )
    want = sorted(
        tuple(r)
        for r in con.execute(
            oracles.alias_sim_edges_oracle(lsh=True, dict_rel="hd")
        ).fetchall()
    )
    assert got == want
    assert got, "hostile dict must actually produce similarity edges"
