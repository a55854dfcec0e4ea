"""probe_eff estimator behavior (tools/scaling_run.py) — pure, via
monkeypatched walls/sleep.

The estimator must (a) stay dirty through a genuine multi-minute throttle
window (every sample in the span reads slow), (b) recover from sub-probe
scheduler jitter (a later sample reads clean), and (c) decide identically
to max-over-all-samples (early exit only on a clean reading, which the max
cannot un-do).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

import scaling_run as sr


def _patch(monkeypatch, walls):
    """walls: list of (w1, wn) per rep, consumed in order."""
    it = iter(walls)
    cur = {}

    def fake_wall(nproc):
        if nproc == 1:
            cur["pair"] = next(it)
            return cur["pair"][0]
        return cur["pair"][1]

    monkeypatch.setattr(sr, "_probe_wall", fake_wall)
    slept = []
    monkeypatch.setattr(sr.time, "sleep", lambda s: slept.append(s))
    return slept


def test_probe_eff_clean_host_exits_on_first_sample(monkeypatch):
    slept = _patch(monkeypatch, [(1.0, 1.02)])
    assert sr.probe_eff(8) >= sr.PROBE_CLEAN
    assert slept == []  # no retries burned on a clean host


def test_probe_eff_jitter_recovers(monkeypatch):
    # one dirty sample (the observed 0.72-shape dip) then a clean one
    slept = _patch(monkeypatch, [(1.0, 1.4), (1.0, 1.05)])
    assert sr.probe_eff(8) >= sr.PROBE_CLEAN
    assert len(slept) == 1  # exactly one retry spacing


def test_probe_eff_sustained_window_stays_dirty(monkeypatch):
    # a real throttle window: every sample across the span reads slow
    walls = [(1.0, 2.0)] * 4
    _patch(monkeypatch, walls)
    eff = sr.probe_eff(8)
    assert eff < sr.PROBE_CLEAN and eff == 0.5


def test_probe_eff_is_max_over_samples(monkeypatch):
    # decision equals max over all samples: best-so-far never decreases
    _patch(monkeypatch, [(1.0, 1.6), (1.0, 1.3), (1.0, 1.25), (1.0, 1.5)])
    assert sr.probe_eff(8) == round(1 / 1.25, 3)
