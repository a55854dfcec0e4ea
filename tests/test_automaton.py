"""Two-regime dictionary matcher: equivalence + the large-dict speedup claim."""

from __future__ import annotations

import random
import re
import time

from grepai_spark.automaton import (
    AUTOMATON_CUTOFF,
    AhoCorasick,
    build_matcher,
)


def naive_boundary_matches(aliases: list[str], text: str) -> list[str]:
    """Ground truth: one \\b alias \\b regex per alias."""
    return sorted(
        a
        for a in set(aliases)
        if re.search(r"\b" + re.escape(a) + r"\b", text)
    )


TRICKY_ALIASES = [
    "sql",
    "spark sql",
    "spark",
    "park",
    "sqlx",
    "x",
    "merge join",
    "join",
    "a_b",
    "b",
]

TRICKY_TEXTS = [
    "spark sql beats sqlx at a merge join",
    "sparksql is one word; spark sql is two",
    "park the sql query",
    "a_b but not ab; x marks b",
    "",
    "sql",
    "xsql sqlx x sql",
    "join join join",
    "no dictionary words here at all",
    "spark sql spark sql spark",
]


def test_automaton_matches_naive_on_tricky_overlaps():
    ac = AhoCorasick(sorted(set(TRICKY_ALIASES)))
    for text in TRICKY_TEXTS:
        assert ac.boundary_matches(text) == naive_boundary_matches(
            TRICKY_ALIASES, text
        ), text


def test_automaton_matches_naive_on_random_texts():
    rng = random.Random(7)
    words = [f"w{i}" for i in range(50)] + TRICKY_ALIASES
    for _ in range(200):
        text = " ".join(rng.choices(words, k=rng.randint(0, 30)))
        # random punctuation/embedding noise
        if rng.random() < 0.5:
            text = text.replace(" ", rng.choice([" ", ", ", ".", "_", "-"]))
        got = AhoCorasick(sorted(set(TRICKY_ALIASES))).boundary_matches(text)
        assert got == naive_boundary_matches(TRICKY_ALIASES, text), text


def test_regimes_agree_across_cutoff():
    aliases = TRICKY_ALIASES + [f"tool{i}" for i in range(40)]
    small = build_matcher(aliases, cutoff=10**9)  # force memmem loop
    large = build_matcher(aliases, cutoff=0)  # force automaton
    for text in TRICKY_TEXTS + ["tool7 calls tool13 but not tool777"]:
        assert sorted(small(text)) == sorted(large(text)), text


def test_default_cutoff_regimes():
    few = [f"a{i}" for i in range(10)]
    many = [f"a{i}" for i in range(AUTOMATON_CUTOFF + 1)]
    # the closure kind differs: small regime closes over compiled patterns,
    # large over the lazy automaton cell — probe via cell attribute
    assert build_matcher(few).__closure__ is not None
    assert sorted(build_matcher(many)("a3 a7 xa9")) == ["a3", "a7"]


def test_large_dictionary_speedup():
    """VERDICT r2 #4 acceptance: at a 10k-alias dictionary the automaton
    beats the per-alias loop >= 5x with identical output."""
    n = 10_000
    aliases = [f"alias{i}x" for i in range(n)]
    rng = random.Random(3)
    texts = [
        " ".join(
            rng.choice(aliases) if rng.random() < 0.3 else f"filler{j}"
            for j in range(80)
        )
        for _ in range(50)
    ]
    small = build_matcher(aliases, cutoff=10**9)
    large = build_matcher(aliases, cutoff=0)
    large(texts[0])  # trigger lazy build outside the timed window

    for text in texts[:5]:
        assert sorted(small(text)) == sorted(large(text))

    def best_of(fn, reps=3):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            for text in texts:
                fn(text)
            best = min(best, time.perf_counter() - t0)
        return best

    t_large = best_of(large)
    t_small = best_of(small)
    assert t_small >= 5 * t_large, (
        f"automaton {t_large:.3f}s vs per-alias loop {t_small:.3f}s "
        f"({t_small / t_large:.1f}x)"
    )


def test_detect_mentions_identical_across_regimes(
    spark, tiny_transcripts, monkeypatch
):
    """End-to-end: the mention detector emits identical rows whether the
    matcher runs the memmem loop or the Aho-Corasick automaton."""
    from grepai_spark import automaton, extract
    from grepai_spark.synth import alias_dict_df

    d = alias_dict_df(spark)
    small = extract.detect_mentions(tiny_transcripts, d).collect()

    orig = automaton.build_matcher
    monkeypatch.setattr(
        automaton, "build_matcher", lambda aliases, cutoff=0: orig(aliases, 0)
    )
    large = extract.detect_mentions(tiny_transcripts, d).collect()
    assert sorted(map(tuple, small)) == sorted(map(tuple, large))
    assert len(small) > 0


def test_kg_edges_from_map_with_large_dictionary(spark):
    """End-to-end through the Spark UDF: a 10k-entry alias map pushes the
    edge detector into the automaton regime; emitted triples must match the
    naive per-alias ground truth on texts that hit a known subset."""
    from grepai_spark.pipeline import kg_edges_from_map
    from grepai_spark.schemas import TRANSCRIPTS
    import datetime

    amap = {
        f"bulkalias{i}": ("mentions", f"e_bulk{i % 7}") for i in range(10_000)
    }
    amap["run report"] = ("does", "e_run_report")

    ts = datetime.datetime(2024, 1, 1)
    rows = [
        ("c1", 0, "user", "bulkalias42 and bulkalias9999 please", "", ts),
        ("c1", 1, "assistant", "xbulkalias42y is embedded", "tools.go", ts),
        ("c2", 0, "user", "run report then bulkalias0", "", ts),
        ("c2", 1, "user", "```bulkalias7 fenced```", "", ts),
    ]
    t = spark.createDataFrame(rows, schema=TRANSCRIPTS)
    got = {
        (r["subj"], r["pred"], r["obj"], r["conv_id"], r["turn_idx"])
        for r in kg_edges_from_map(t, amap).collect()
    }
    want = {
        ("user", "mentions", "e_bulk0", "c1", 0),  # bulkalias42 -> 42%7=0
        ("user", "mentions", "e_bulk3", "c1", 0),  # bulkalias9999 -> 9999%7=3
        ("assistant", "calls", "tools.go", "c1", 1),  # embedded alias: no mention
        ("user", "does", "e_run_report", "c2", 0),
        ("user", "mentions", "e_bulk0", "c2", 0),  # bulkalias0
        # c2 turn 1: fenced alias masked -> nothing
    }
    assert got == want


# ---------------------------------------------------------------------------
# round 4: per-worker (module-memo) state + regime semantic identity
# ---------------------------------------------------------------------------

def test_regimes_agree_on_nonword_edge_and_nonascii_neighbors():
    """ADVICE r3: crossing AUTOMATON_CUTOFF must never change detection —
    including aliases with non-word edge chars and non-ASCII neighbors."""
    aliases = ["c++", "-foo", "a.b", "x", "plain"]
    small = build_matcher(aliases, cutoff=10**9)
    large = build_matcher(aliases, cutoff=0)
    texts = [
        "use c++ here", "xc++", "c++x", "c++, then c++",
        "-foo bar", "a-foo", "z-foo!", "say -foo.",
        "a.b.c", "ab", "a.b", "xa.b",
        "héllo x", "xé x é", "plainé plain",
    ]
    for t in texts:
        assert sorted(small(t)) == sorted(large(t)), t


def test_alias_payload_builds_once_per_process():
    """The automaton builds once per process per dictionary version: fresh
    deserialized payload copies (one per task in a real worker) all bind to
    the module-memoized matcher instead of rebuilding."""
    from pyspark import cloudpickle

    from grepai_spark import automaton

    data = {
        f"pay{i}": ("mentions", f"e{i % 5}")
        for i in range(AUTOMATON_CUTOFF + 40)
    }
    p1 = automaton.AliasPayload(data)
    n0 = automaton.BUILD_COUNT
    p1.matcher()
    assert automaton.BUILD_COUNT == n0 + 1
    # two "tasks" each deserialize their own copy of the same payload
    p2 = cloudpickle.loads(cloudpickle.dumps(automaton.AliasPayload(data)))
    p3 = cloudpickle.loads(cloudpickle.dumps(automaton.AliasPayload(data)))
    assert p2._matcher is None  # the matcher itself is never pickled
    assert p2.matcher()("pay3 xpay4y") == ["pay3"]
    assert p3.matcher()("pay3") == ["pay3"]
    assert automaton.BUILD_COUNT == n0 + 1  # no growth with copies
    assert p2.matcher() is p2.matcher()  # instance cache: one attr read


def test_edge_detector_builds_bounded_by_workers_not_tasks(spark):
    """End-to-end through Spark: 256 detection tasks over a large dictionary,
    then probe surviving python workers — a per-task rebuild would show
    BUILD_COUNT growing with tasks-per-worker (>= 8 here); the module memo
    caps it at the number of dictionary versions the worker ever saw."""
    import datetime

    from grepai_spark.pipeline import kg_edges_from_map
    from grepai_spark.schemas import TRANSCRIPTS

    amap = {
        f"wrk{i}": ("mentions", f"e{i % 5}")
        for i in range(AUTOMATON_CUTOFF * 3)
    }
    ts = datetime.datetime(2024, 1, 1)
    rows = [
        (f"c{i}", 0, "user", f"wrk{i % 400} and wrk{(i + 1) % 400}", "", ts)
        for i in range(512)
    ]
    t = spark.createDataFrame(rows, schema=TRANSCRIPTS).repartition(256)
    assert kg_edges_from_map(t, amap).count() > 0

    def probe(_):
        import os

        from grepai_spark import automaton as am

        yield {"pid": os.getpid(), "builds": am.BUILD_COUNT}

    counts = (
        spark.sparkContext.parallelize(range(256), 256)
        .mapPartitions(probe)
        .collect()
    )
    per_pid: dict[int, int] = {}
    for c in counts:
        per_pid[c["pid"]] = max(per_pid.get(c["pid"], 0), c["builds"])
    # other tests in this session may have shipped a few other large
    # dictionaries to the same long-lived workers; the margin vs the >= 8
    # tasks-per-worker a rebuild-per-task would show stays wide
    assert max(per_pid.values()) <= 6, per_pid
