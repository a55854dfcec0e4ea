"""Multi-pattern dictionary matching — the detectors' large-dictionary regime.

The reference's per-language pattern sets are bounded (a few regexes per
language, /root/reference/trace/patterns.go:33-58), so its scan-per-pattern
loop never meets a big dictionary. A production alias dictionary is 10^4-10^6
entries, and the small-regime detector (one C-memmem ``str.find`` per alias
per turn, extract.py) degrades linearly in |dict|: at 10^4 aliases it is the
pipeline's scale ceiling.

This module provides the scale path: a pure-Python Aho-Corasick automaton
that finds ALL dictionary occurrences in ONE pass over the text — O(len(text)
+ matches) per turn, independent of |dict| — then applies the same
word-boundary test the small regime applies. :func:`build_matcher` is the
two-regime switch (the same shape cc.canonical_map uses for its small/large
regimes): below ``AUTOMATON_CUTOFF`` aliases the memmem loop wins (measured
in tests/test_automaton.py), above it the automaton does.

The matcher builds lazily on first call: the UDF closure pickles only the
alias list (small), and each long-lived Python worker builds the automaton
once — the per-executor in-memory symbol map, exactly how the reference holds
its dictionaries in RAM (rpg/indexer.go:527).
"""

from __future__ import annotations

from collections.abc import Callable

# measured crossover on ~500-char texts (loop vs automaton wall): 128
# aliases 3.7ms vs 4.1ms, 256 aliases 7.3ms vs 3.4ms — the per-alias memmem
# loop wins below ~150 entries, the automaton above
AUTOMATON_CUTOFF = 160

WORD_CHARS = frozenset(
    "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789_"
)


class AhoCorasick:
    """Classic goto/fail automaton over the alias set.

    States are ints; ``goto`` is a list of dicts (char -> state); ``out`` is
    a list of tuples of pattern indices ending at that state (failure-chain
    outputs merged at build time, so matching never walks fail links for
    output collection).
    """

    __slots__ = ("goto", "fail", "out", "patterns")

    def __init__(self, patterns: list[str]):
        self.patterns = patterns
        goto: list[dict[str, int]] = [{}]
        out: list[list[int]] = [[]]
        for idx, p in enumerate(patterns):
            s = 0
            for ch in p:
                nxt = goto[s].get(ch)
                if nxt is None:
                    nxt = len(goto)
                    goto[s][ch] = nxt
                    goto.append({})
                    out.append([])
                s = nxt
            out[s].append(idx)
        fail = [0] * len(goto)
        queue = list(goto[0].values())
        head = 0
        while head < len(queue):
            s = queue[head]
            head += 1
            for ch, t in goto[s].items():
                queue.append(t)
                f = fail[s]
                while f and ch not in goto[f]:
                    f = fail[f]
                fail[t] = goto[f].get(ch, 0) if goto[f].get(ch, 0) != t else 0
                if out[fail[t]]:
                    out[t].extend(out[fail[t]])
        self.goto = goto
        self.fail = fail
        self.out = [tuple(o) for o in out]

    def boundary_matches(self, text: str) -> list[str]:
        """Sorted distinct patterns with >= 1 word-boundary-clean occurrence
        in `text` — the same predicate as the per-alias ``\\b p \\b`` regex."""
        goto = self.goto
        fail = self.fail
        out = self.out
        patterns = self.patterns
        word = WORD_CHARS
        n = len(text)
        found: set[int] = set()
        s = 0
        for i, ch in enumerate(text):
            while s and ch not in goto[s]:
                s = fail[s]
            s = goto[s].get(ch, 0)
            o = out[s]
            if o:
                end_ok = i + 1 >= n or text[i + 1] not in word
                if end_ok:
                    for idx in o:
                        if idx in found:
                            continue
                        start = i + 1 - len(patterns[idx])
                        if start == 0 or text[start - 1] not in word:
                            found.add(idx)
        return sorted(patterns[i] for i in found)


def _small_regime(ordered: list[str]) -> Callable[[str], list[str]]:
    """The measured-fastest small-dictionary path (PERF.md §8): one C-memmem
    ``str.find`` per alias gates a cheap boundary test at the first literal
    occurrence; the regex engine runs only when that occurrence is embedded
    (the alias may still boundary-match later in the text)."""
    import re

    patterns = {a: re.compile(r"\b" + re.escape(a) + r"\b") for a in ordered}
    lens = {a: len(a) for a in ordered}
    word = WORD_CHARS

    def match(text: str) -> list[str]:
        n = len(text)
        found: list[str] = []
        for a in ordered:
            p = text.find(a)
            if p == -1:
                continue
            end = p + lens[a]
            if (
                (p == 0 or text[p - 1] not in word)
                and (end >= n or text[end] not in word)
            ) or patterns[a].search(text):
                found.append(a)
        return found

    return match


def build_matcher(
    aliases: list[str], cutoff: int = AUTOMATON_CUTOFF
) -> Callable[[str], list[str]]:
    """text -> sorted aliases with a word-boundary occurrence in text.

    Two-regime: memmem loop below `cutoff` aliases, Aho-Corasick above.
    The automaton is built lazily on first call so the (pickled) UDF closure
    ships only the alias list and each worker process builds once.
    """
    ordered = sorted(set(aliases))
    if len(ordered) <= cutoff:
        return _small_regime(ordered)

    cell: list[AhoCorasick | None] = [None]

    def match(text: str) -> list[str]:
        ac = cell[0]
        if ac is None:
            ac = AhoCorasick(ordered)
            cell[0] = ac
        return ac.boundary_matches(text)

    return match
