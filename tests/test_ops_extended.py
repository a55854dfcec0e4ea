"""Range join, conversation co-mention, label enrichment, chunker."""

from __future__ import annotations

from grepai_spark import aggs, extract, link
from grepai_spark.materialize import conv_comention_edges
from grepai_spark.synth import alias_dict_df


def test_mention_tool_overlap_window(spark, tiny_transcripts):
    m = extract.detect_mentions(tiny_transcripts, alias_dict_df(spark))
    c = extract.call_triples(tiny_transcripts)
    got = {
        (r["conv_id"], r["m_turn"], r["mention"], r["t_turn"], r["tool"], r["dist"])
        for r in link.mention_tool_overlap(m, c, window=2).collect()
    }
    # conv-a: FetchData at turn 0; tools at turns 1 (payments.charge) and
    # 2 (diagnostics.trace) — both within the +/-2 window
    assert ("conv-a", 0, "FetchData", 1, "payments.charge", 1) in got
    assert ("conv-a", 0, "FetchData", 2, "diagnostics.trace", 2) in got
    # distances beyond the window are excluded
    assert all(r[5] <= 2 for r in got)


def test_conv_comention_shared_entities(spark, tiny_transcripts):
    from grepai_spark import pipeline

    edges = pipeline.kg_edges_df(
        spark, tiny_transcripts, alias_dict_df(spark)
    )
    got = {
        (r["subj"], r["obj"]): r["weight"]
        for r in conv_comention_edges(edges).collect()
    }
    # conv-a and conv-c both mention the e_fetch_data component
    assert got.get(("conv-a", "conv-c")) == 1.0
    # ordering invariant: subj < obj always
    assert all(a < b for a, b in got)


def test_conv_comention_hub_cap(spark, tiny_transcripts):
    from grepai_spark import pipeline

    edges = pipeline.kg_edges_df(
        spark, tiny_transcripts, alias_dict_df(spark)
    )
    # floor 0 + factor 0 => cap 0: every entity is a hub and is skipped ->
    # no pairs at all
    assert (
        conv_comention_edges(edges, hub_cap_min=0, hub_cap_factor=0.0).count()
        == 0
    )


def test_enrich_area_labels(spark, tiny_transcripts):
    got = {
        r["area"]: r["label"]
        for r in aggs.enrich_area_labels(tiny_transcripts).collect()
    }
    assert got["payments"] == "payments: charge"
    assert got["auth"] == "auth: register"


def test_chunk_turns_windows(spark):
    long_text = "x" * 5000
    df = spark.createDataFrame(
        [
            ("c1", 0, "user", long_text, "", None),
            ("c1", 1, "user", "short", "", None),
            ("c1", 2, "user", "", "", None),
        ],
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )
    rows = extract.chunk_turns(df).collect()
    by_turn = {}
    for r in rows:
        by_turn.setdefault(r["turn_idx"], []).append(r)
    # 5000 chars, win 2048, step 1848 -> ceil((5000-2048)/1848)+1 = 3 chunks
    assert len(by_turn[0]) == 3
    chunks = sorted(by_turn[0], key=lambda r: r["chunk_idx"])
    assert len(chunks[0]["chunk_text"]) == 2048
    # overlap: each successive window starts step chars later
    assert chunks[1]["chunk_idx"] == 1
    assert len(chunks[2]["chunk_text"]) == 5000 - 2 * 1848
    # short and empty turns produce exactly one chunk, byte-identical text
    assert len(by_turn[1]) == 1 and by_turn[1][0]["chunk_text"] == "short"
    assert len(by_turn[2]) == 1 and by_turn[2][0]["chunk_text"] == ""


def test_chunk_turns_reconstruction_property(spark):
    """Property: dropping the overlap from every chunk after the first and
    concatenating reconstructs the original text exactly (hypothesis-driven
    lengths around the window boundaries)."""
    from hypothesis import given, settings, strategies as st

    from grepai_spark.extract import CHUNK_CHARS, CHUNK_OVERLAP

    step = CHUNK_CHARS - CHUNK_OVERLAP

    @settings(max_examples=20, deadline=None)
    @given(
        st.integers(min_value=0, max_value=3 * CHUNK_CHARS).filter(
            lambda n: True
        )
    )
    def check(n):
        import math

        text = "".join(chr(97 + (i % 26)) for i in range(n))
        if n <= CHUNK_CHARS:
            n_chunks = 1
        else:
            n_chunks = math.ceil((n - CHUNK_CHARS) / step) + 1
        chunks = [text[i * step : i * step + CHUNK_CHARS] for i in range(n_chunks)]
        rebuilt = chunks[0] + "".join(c[CHUNK_OVERLAP:] for c in chunks[1:])
        assert rebuilt == text

    check()

    # and the Spark operator agrees with the local model on boundary sizes
    sizes = [0, 1, CHUNK_CHARS - 1, CHUNK_CHARS, CHUNK_CHARS + 1,
             2 * CHUNK_CHARS, 2 * CHUNK_CHARS + step]
    rows = [
        (f"c{j}", 0, "user", "".join(chr(97 + (i % 26)) for i in range(n)), "", None)
        for j, n in enumerate(sizes)
    ]
    df = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )
    got = extract.chunk_turns(df).collect()
    by_conv = {}
    for r in got:
        by_conv.setdefault(r["conv_id"], []).append(r)
    import math
    for j, n in enumerate(sizes):
        expect = 1 if n <= CHUNK_CHARS else math.ceil((n - CHUNK_CHARS) / step) + 1
        chunks = sorted(by_conv[f"c{j}"], key=lambda r: r["chunk_idx"])
        assert len(chunks) == expect, (n, len(chunks))
        text = rows[j][3]
        rebuilt = chunks[0]["chunk_text"] + "".join(
            c["chunk_text"][CHUNK_OVERLAP:] for c in chunks[1:]
        )
        assert rebuilt == text


def test_mention_tool_overlap_is_equi_join(spark, tiny_transcripts):
    """The band predicate must be pre-joined away (mentions explode to their
    window keys), NOT applied as a filter over a conv_id-only join — the
    latter materializes |mentions| x |calls| per conversation and goes
    quadratic on a mega-thread."""
    m = extract.detect_mentions(tiny_transcripts, alias_dict_df(spark))
    c = extract.call_triples(tiny_transcripts)
    plan = (
        link.mention_tool_overlap(m, c)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    join_lines = [l for l in plan.splitlines() if "Join" in l]
    assert join_lines, plan
    # the composite turn key is part of the join condition itself
    assert any("t_turn" in l for l in join_lines), plan
    # and no post-join band filter remains (>= / <= between the turn cols)
    for line in plan.splitlines():
        if "Filter" in line:
            assert not ("m_turn" in line and "t_turn" in line), line


def test_mention_tool_overlap_mega_thread(spark):
    """One conversation holding ALL turns (the north rule's mega-thread):
    the pre-join explode keeps this linear — 5x row expansion, never
    |mentions| x |calls|."""
    from pyspark.sql import functions as F

    n = 100_000
    base = spark.range(n).select(
        F.lit("mega").alias("conv_id"), F.col("id").cast("int").alias("turn_idx")
    )
    m = base.select("conv_id", "turn_idx", F.lit("FetchData").alias("mention"))
    c = base.select(
        "conv_id", "turn_idx", F.lit("payments.charge").alias("obj")
    )
    out = link.mention_tool_overlap(m, c, window=2)
    # every interior mention matches 5 turns; 3 edge turns on each side
    # lose 1..2 matches: total = 5n - 6
    assert out.count() == 5 * n - 6
