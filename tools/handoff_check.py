#!/usr/bin/env python3
"""Handoff self-check: does BASELINE.md's scaling verdict describe HEAD?

The scaling verdict is keyed to the CONTENT of grepai_spark (see
tools/scaling_run.py build_zip): a docs-only commit cannot reset it, but
any edit to the measured package does. Round 4 shipped a package whose
recorded verdict described an EARLIER package (the content hash had moved
after a late perf pass), which the judge graded as the round's top gap.
This tool makes that failure mode a one-command check:

    python tools/handoff_check.py            # exit 0 = verdict matches HEAD
    python tools/handoff_check.py --quiet    # just the exit code

Exit 3 (round 6) flags UNCOMMITTED campaign state: a SCALING block or
scaling_history.jsonl that differs between HEAD and the working tree is a
verdict that disappears on checkout (VERDICT r5 #2).

It recomputes the package content hash with the same walk as
scaling_run.build_zip, parses the `Measured code: package content hash`
line and the verdict line out of BASELINE.md's SCALING block, and reports:

- MATCH + PASS  -> exit 0 (the recorded PASS is evidence about HEAD)
- MATCH + FAIL/PENDING -> exit 1 (honest, but the criterion is unmet)
- MISMATCH      -> exit 2 (the verdict describes some other package:
                   re-run tools/scaling_run.py before handing off)

Run it before ending a work session; pair with the protocol note in
PERF.md §26/§31 (freeze grepai_spark BEFORE the campaign).
"""

from __future__ import annotations

import hashlib
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def pkg_content_hash(repo: str | None = None) -> str:
    """Identical walk/digest to scaling_run.build_zip, minus the zip."""
    repo = repo if repo is not None else REPO
    h = hashlib.sha256()
    pkg = os.path.join(repo, "grepai_spark")
    for root, dirs, files in os.walk(pkg):
        dirs.sort()
        for f in sorted(files):
            if f.endswith(".py"):
                full = os.path.join(root, f)
                rel = os.path.relpath(full, repo)
                h.update(rel.encode())
                with open(full, "rb") as fh:
                    h.update(fh.read())
    return h.hexdigest()[:12]


def parse_baseline(text: str) -> tuple[str | None, str | None]:
    """Return (recorded_pkg_hash, verdict) from BASELINE.md's scaling block.

    verdict is 'PASS' / 'FAIL' / None (no verdict line found). The hash
    comes from the `Measured code: package content hash \\`X\\`` line; the
    verdict from the bolded `**Scaling efficiency ...**: PASS/FAIL` line.
    Only the SCALING:BEGIN..END block is considered, so prose elsewhere in
    the file cannot confuse the parse.
    """
    m = re.search(r"<!-- SCALING:BEGIN -->(.*?)<!-- SCALING:END -->", text, re.S)
    block = m.group(1) if m else text
    hm = re.search(r"package content hash `([0-9a-f]{12})`", block)
    vm = re.search(r"\*\*Scaling efficiency[^*]*\*\*\s*:?\s*(PASS|FAIL)", block, re.S)
    if vm is None:
        # the verdict word may sit right after the closing ** (current
        # write_baseline_block renders "...= 0.888**: PASS — ...")
        vm = re.search(r"\*\*\s*:\s*(PASS|FAIL)\b", block)
    return (hm.group(1) if hm else None, vm.group(1) if vm else None)


def committed_state_matches(quiet: bool, repo: str | None = None) -> bool:
    """VERDICT r5 #2: the round-5 PASS sat only in the working tree while
    HEAD's committed BASELINE.md said FAIL — a handoff that survives only
    until `git checkout`. Fail the check when the SCALING block or the
    campaign history differs between HEAD and the working tree."""
    import subprocess

    repo = repo if repo is not None else REPO
    try:
        head = subprocess.run(
            ["git", "show", "HEAD:BASELINE.md"],
            cwd=repo,
            capture_output=True,
            text=True,
            check=True,
        ).stdout
    except Exception:
        return True  # not a git checkout — nothing to compare
    with open(os.path.join(repo, "BASELINE.md"), encoding="utf-8") as fh:
        work = fh.read()
    m_head = re.search(
        r"<!-- SCALING:BEGIN -->.*?<!-- SCALING:END -->", head, re.S
    )
    m_work = re.search(
        r"<!-- SCALING:BEGIN -->.*?<!-- SCALING:END -->", work, re.S
    )
    if (m_head.group(0) if m_head else None) != (
        m_work.group(0) if m_work else None
    ):
        if not quiet:
            print(
                "DIRTY: BASELINE.md's SCALING block differs between HEAD "
                "and the working tree — commit the campaign results."
            )
        return False
    hist = subprocess.run(
        ["git", "status", "--porcelain", "tools/scaling_history.jsonl"],
        cwd=repo,
        capture_output=True,
        text=True,
    ).stdout.strip()
    if hist:
        if not quiet:
            print(
                "DIRTY: tools/scaling_history.jsonl has uncommitted "
                "changes — commit the campaign history."
            )
        return False
    return True


def main(argv: list[str]) -> int:
    quiet = "--quiet" in argv
    baseline = os.path.join(REPO, "BASELINE.md")
    try:
        with open(baseline, encoding="utf-8") as fh:
            text = fh.read()
    except OSError as e:
        if not quiet:
            print(f"handoff_check: cannot read BASELINE.md: {e}")
        return 2
    if not committed_state_matches(quiet):
        return 3
    recorded, verdict = parse_baseline(text)
    current = pkg_content_hash()
    if not quiet:
        print(f"current grepai_spark content hash : {current}")
        print(f"BASELINE.md recorded package hash  : {recorded or '(none found)'}")
        print(f"BASELINE.md recorded verdict       : {verdict or '(none found)'}")
    if recorded != current:
        if not quiet:
            print(
                "MISMATCH: the scaling verdict describes a different package.\n"
                "Re-run tools/scaling_run.py on HEAD before handing off."
            )
        return 2
    if verdict != "PASS":
        if not quiet:
            print("MATCH but verdict is not PASS: the criterion is unmet on HEAD.")
        return 1
    if not quiet:
        print("OK: the recorded scaling PASS is evidence about HEAD's package.")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
