"""Property-based cross-regime equivalence for the dictionary matcher.

Round 4 unified both regimes on one predicate — an alias matches iff some
literal occurrence has non-WORD_CHARS neighbors on both sides — so crossing
AUTOMATON_CUTOFF must never change detection output, for ANY alias set
(including non-word-edged aliases like ``c++`` / ``-foo`` and texts with
non-ASCII neighbors, the exact cases ADVICE r3 flagged). Hypothesis drives
arbitrary alias/text pairs through both regimes and, where Python's \\b
agrees with the ASCII predicate by construction (\\w-edged ASCII aliases on
ASCII text), through an independent regex ground truth as well.
"""

from __future__ import annotations

import re

from hypothesis import given, settings
from hypothesis import strategies as st

from grepai_spark.automaton import AhoCorasick, WORD_CHARS, _small_regime

# word chars, separators, and the punctuation that makes boundaries tricky
ALIAS_ALPHABET = "abcxyzAB019_+-. $"
TEXT_ALPHABET = ALIAS_ALPHABET + "(),;\n\téüπ"

aliases_st = st.lists(
    st.text(alphabet=ALIAS_ALPHABET, min_size=1, max_size=8),
    min_size=1,
    max_size=12,
    unique=True,
)
text_st = st.text(alphabet=TEXT_ALPHABET, min_size=0, max_size=120)


def _both_regimes(aliases: list[str]):
    ordered = sorted(set(aliases))
    return _small_regime(ordered), AhoCorasick(ordered).boundary_matches


@settings(max_examples=400, deadline=None)
@given(aliases=aliases_st, text=text_st)
def test_regimes_agree_on_arbitrary_input(aliases, text):
    small, large = _both_regimes(aliases)
    assert small(text) == large(text)


word_alias_st = st.lists(
    st.text(alphabet="abcxyz019_", min_size=1, max_size=8),
    min_size=1,
    max_size=12,
    unique=True,
)
ascii_text_st = st.text(alphabet=ALIAS_ALPHABET + "(),;\n\t", max_size=120)


@settings(max_examples=400, deadline=None)
@given(aliases=word_alias_st, text=ascii_text_st)
def test_regimes_match_regex_truth_on_word_aliases(aliases, text):
    """For \\w-edged ASCII aliases on ASCII text, the ASCII-neighbor
    predicate coincides with Python's \\b — an INDEPENDENT ground truth
    (different engine, different traversal) for both regimes."""
    truth = sorted(
        a
        for a in set(aliases)
        if re.search(r"\b" + re.escape(a) + r"\b", text)
    )
    small, large = _both_regimes(aliases)
    assert small(text) == truth
    assert large(text) == truth


@settings(max_examples=200, deadline=None)
@given(aliases=aliases_st, text=text_st)
def test_match_implies_boundary_occurrence(aliases, text):
    """Every reported alias really does occur in the text with non-word
    neighbors; every unreported alias has no such occurrence."""
    _, large = _both_regimes(aliases)
    reported = set(large(text))
    for a in set(aliases):
        occurs = False
        p = text.find(a)
        while p != -1:
            end = p + len(a)
            if (p == 0 or text[p - 1] not in WORD_CHARS) and (
                end >= len(text) or text[end] not in WORD_CHARS
            ):
                occurs = True
                break
            p = text.find(a, p + 1)
        assert (a in reported) == occurs
