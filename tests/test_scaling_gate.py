"""Pure-function tests for the scaling harness's verdict gate
(tools/scaling_run.py) — no Spark, no subprocesses.

The gate is measurement INFRASTRUCTURE: a bug here silently admits dirty
draws (the round-4 0.509 false-negative) or discards clean ones, so its
selection logic is locked by tests like any operator.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

import scaling_run as sr


def _entry(eff, probes=None, pkg="pkgA", **kw):
    e = {
        "commit": "c0",
        "pkg_hash": pkg,
        "sf_dir": "/sf",
        "replicate": 128,
        "lo": 2,
        "hi": 8,
        "n_turns": 1,
        "wall_lo": 1.0,
        "wall_hi": 1.0,
        "eff": eff,
        "probe_before": 0.9,
        "probe_mid": 0.9,
        "probe_after": 0.9,
    }
    if probes is not None:
        e["probes"] = probes
    e.update(kw)
    return e


KEY = {"pkg_hash": "pkgA", "sf_dir": "/sf", "lo": 2, "hi": 8}


def test_per_rep_probes_catch_mid_rep_throttle():
    """The round-4 false-negative: legacy three-point probes clean, but a
    per-rep probe caught the throttle window -> entry must be dirty."""
    legacy_clean = _entry(0.509)  # only 3 points recorded, all >= gate
    assert sr.is_clean(legacy_clean)  # old entries: best evidence they carry
    per_rep_dirty = _entry(0.509, probes=[0.95, 0.86, 0.51, 0.93, 0.9, 0.9])
    assert not sr.is_clean(per_rep_dirty)
    per_rep_clean = _entry(0.88, probes=[0.95, 0.86, 0.87, 0.93, 0.9, 0.9])
    assert sr.is_clean(per_rep_clean)


def test_verdict_requires_min_clean_median_and_consecutive():
    # two clean: not enough
    h = [_entry(0.9), _entry(0.9)]
    assert not sr.verdict(h, KEY)["pass"]
    # three clean, median ok, last two ok
    h = [_entry(0.85), _entry(0.9), _entry(0.88)]
    assert sr.verdict(h, KEY)["pass"]
    # median ok but last clean dips: consecutive rule fails
    h = [_entry(0.9), _entry(0.9), _entry(0.7)]
    v = sr.verdict(h, KEY)
    assert v["median_eff"] >= 0.8 and not v["pass"]
    # a dirty dip between cleans does not break the consecutive rule
    h = [
        _entry(0.9),
        _entry(0.9),
        _entry(0.3, probes=[0.9, 0.5, 0.9]),  # excluded by gate
        _entry(0.85),
    ]
    assert sr.verdict(h, KEY)["pass"]


def test_verdict_excludes_both_directions_and_other_packages():
    # high draws are excluded by a dirty probe exactly like low ones
    h = [
        _entry(0.85),
        _entry(0.86),
        _entry(1.4, probes=[0.9, 0.2, 0.9]),
        _entry(0.84),
    ]
    v = sr.verdict(h, KEY)
    assert v["n_clean"] == 3 and 1.4 not in [e["eff"] for e in v["clean"]]
    # other-package entries and skip stubs never count
    h = [
        _entry(0.9),
        _entry(0.9, pkg="pkgB"),
        {"skipped": True, "commit": "c0", "ts": 0},
        _entry(0.9),
        _entry(0.9),
    ]
    v = sr.verdict(h, KEY)
    assert v["n_clean"] == 3 and v["pass"]


def test_verdict_note_names_the_failing_condition():
    h = [_entry(0.9), _entry(0.9), _entry(0.7)]
    note = sr._verdict_note(sr.verdict(h, KEY))
    assert note.startswith("FAIL")
    assert "consecutive-pass rule" in note
    h = [_entry(0.85), _entry(0.9), _entry(0.88)]
    assert sr._verdict_note(sr.verdict(h, KEY)).startswith("PASS")
    assert "PENDING" in sr._verdict_note(sr.verdict([], KEY))


def test_real_history_round4_draw_is_the_documented_failure():
    """Lock the disclosed round-4 outcome: on the recorded history, pkg
    19f9eeddd6f9 has median >= 0.8 but fails the consecutive rule."""
    hist = sr.load_history()
    key = {
        "pkg_hash": "19f9eeddd6f9",
        "sf_dir": "/root/testdata/sf0.1",
        "lo": 2,
        "hi": 8,
    }
    v = sr.verdict(hist, key)
    if v["n_clean"] < 3:  # history file trimmed in some checkouts
        return
    assert v["median_eff"] >= 0.8
    assert not v["pass"]


def _steps(walls_probes):
    """Build (steps, probes) from [(cpus, wall)] + probe series."""
    walls, probes = walls_probes
    steps = [
        {"cpus": c, "wall": w, "tps": 12_800_000 / w, "n_turns": 12_800_000}
        for c, w in walls
    ]
    return steps, probes


SEQ = [(8, 28.0), (2, 100.0), (8, 29.0), (2, 101.0), (8, 27.5)]


def test_rep_certify_blocks_round4_false_negative():
    """A sustained-slow rep (the 0.509 shape) has dirty brackets on every
    rep -> never clean, whatever the point probes once said."""
    steps, probes = _steps(
        ([(8, 52.0), (2, 100.0), (8, 52.0), (2, 100.0), (8, 52.0)],
         [0.95, 0.5, 0.5, 0.5, 0.5, 0.5])
    )
    eff, clean, _, _ = sr.rep_certify(
        {"steps": steps, "probes": probes, "lo": 2, "hi": 8}
    )
    assert not clean and eff < 0.6


def test_rep_certify_keeps_certified_reps_despite_trailing_window():
    """A window opening AFTER every rep of interest was bracket-certified
    must not discard the invocation (three >= 0.88 draws died this way)."""
    steps, probes = _steps((SEQ, [0.94, 0.87, 0.86, 0.87, 0.9, 0.3]))
    eff, clean, w_lo, w_hi = sr.rep_certify(
        {"steps": steps, "probes": probes, "lo": 2, "hi": 8}
    )
    # the last hi rep (27.5, bracketed 0.9/0.3) is NOT certified; the best
    # certified hi rep is 28.0 and the best certified lo rep is 100.0
    assert clean and (w_lo, w_hi) == (100.0, 28.0)
    assert eff == round((12_800_000 / 28.0) / (12_800_000 / 100.0) / 4, 3)


def test_rep_certify_requires_both_levels():
    # every lo bracket dirty -> not clean even with pristine hi reps
    steps, probes = _steps((SEQ, [0.9, 0.9, 0.5, 0.9, 0.5, 0.9]))
    _, clean, _, _ = sr.rep_certify(
        {"steps": steps, "probes": probes, "lo": 2, "hi": 8}
    )
    assert not clean


def test_verdict_uses_certified_eff_for_steps_entries():
    steps, probes = _steps((SEQ, [0.9] * 6))
    e = _entry(0.0, probes=probes)  # recorded eff field deliberately wrong
    e["steps"] = steps
    h = [e, _entry(0.9), _entry(0.9)]
    v = sr.verdict(h, KEY)
    assert v["n_clean"] == 3 and v["pass"]
    assert sr.entry_eff(e) > 0.8  # certified recomputation, not the field


def test_foreground_load_excludes_regardless_of_probes():
    """An invocation that overlapped the repo's own foreground compute is
    never clean — even with a fully certified probe series (self-load
    inflates the lo wall, i.e. biases efficiency UPWARD, so probe evidence
    alone cannot admit it). Direction-blind: flag, not value."""
    steps, probes = _steps((SEQ, [0.9] * 6))
    good = _entry(0.93, probes=probes)
    good["steps"] = steps
    assert sr.is_clean(good)
    tainted = dict(good, foreground_load=True)
    assert not sr.is_clean(tainted)
    h = [_entry(0.9), _entry(0.9), tainted]
    v = sr.verdict(h, KEY)
    assert v["n_clean"] == 2 and not v["pass"]


def test_real_history_round5_pass_on_shipped_package():
    """Lock the disclosed round-5 outcome on the recorded history: package
    ba5019462c06 PASSES (>= 3 clean, median >= 0.8, last two >= 0.8), and
    the two foreground_load-annotated draws (0.928 / 0.953 — completed
    while the repo's own tests/bench ran in the sandbox) are excluded from
    the clean set in both directions."""
    hist = sr.load_history()
    key = {
        "pkg_hash": "ba5019462c06",
        "sf_dir": "/root/testdata/sf0.1",
        "lo": 2,
        "hi": 8,
    }
    v = sr.verdict(hist, key)
    if v["n_clean"] == 0:  # history file trimmed in some checkouts
        return
    flagged = [
        h
        for h in hist
        if h.get("pkg_hash") == key["pkg_hash"] and h.get("foreground_load")
    ]
    assert len(flagged) == 2
    assert not any(h in v["clean"] for h in flagged)
    assert v["pass"] and v["median_eff"] >= 0.8 and v["n_clean"] >= 3
