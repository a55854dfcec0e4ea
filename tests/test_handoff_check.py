"""tools/handoff_check.py: the verdict-describes-HEAD guard.

Round 4's top judged gap was shipping a grepai_spark whose scaling verdict
row described an EARLIER package. handoff_check makes that a one-command
check; these tests lock its two pure pieces (BASELINE.md parsing and the
content hash) without coupling the suite to HEAD's campaign state — a
mid-round package edit legitimately invalidates the verdict, and the suite
must stay usable while the re-campaign is pending.
"""

import importlib.util
import os
import sys

import pytest

TOOLS = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")


def _load():
    spec = importlib.util.spec_from_file_location(
        "handoff_check", os.path.join(TOOLS, "handoff_check.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


hc = _load()

BLOCK = """
<!-- SCALING:BEGIN -->
## Measured scaling

Measured code: package content hash `ba5019462c06` (commit `c30859f`); invocations (local[2]=N vs local[8]=4N):

| n_turns | wall |
|---|---|
| 12800000 | 94.084 |

**Scaling efficiency (median of 3 clean: 0.888, 0.945, 0.865) =
0.888**: PASS — n_clean 3 >= 3: OK; median 0.888 >= 0.8: OK; last two clean 0.945/0.865 >= 0.8: OK.
<!-- SCALING:END -->
"""


def test_parse_pass_block():
    h, v = hc.parse_baseline(BLOCK)
    assert h == "ba5019462c06"
    assert v == "PASS"


def test_parse_fail_block():
    h, v = hc.parse_baseline(
        BLOCK.replace("PASS —", "FAIL —").replace("0.888`: PASS", "0.888`: FAIL")
    )
    assert h == "ba5019462c06"
    assert v == "FAIL"


def test_parse_ignores_prose_outside_block():
    # a PASS mentioned in narrative text outside SCALING:BEGIN/END must not
    # be picked up when the block itself carries no verdict line
    text = (
        "**Scaling efficiency old story**: PASS — stale.\n"
        "<!-- SCALING:BEGIN -->\nMeasured code: package content hash "
        "`0123456789ab` (commit `x`);\n<!-- SCALING:END -->\n"
    )
    h, v = hc.parse_baseline(text)
    assert h == "0123456789ab"
    assert v is None


def test_parse_no_block_falls_back_to_whole_text():
    h, v = hc.parse_baseline("package content hash `abcdefabcdef` ... **Scaling efficiency x**: FAIL")
    assert h == "abcdefabcdef"
    assert v == "FAIL"


def test_pkg_hash_deterministic_and_content_sensitive(tmp_path):
    pkg = tmp_path / "grepai_spark"
    pkg.mkdir()
    (pkg / "a.py").write_text("x = 1\n")
    (pkg / "b.py").write_text("y = 2\n")
    (pkg / "notes.txt").write_text("ignored: not .py\n")
    h1 = hc.pkg_content_hash(str(tmp_path))
    assert h1 == hc.pkg_content_hash(str(tmp_path))
    # non-.py files are outside the measured surface (same rule as build_zip)
    (pkg / "notes.txt").write_text("changed\n")
    assert hc.pkg_content_hash(str(tmp_path)) == h1
    (pkg / "a.py").write_text("x = 3\n")
    assert hc.pkg_content_hash(str(tmp_path)) != h1


def test_pkg_hash_matches_scaling_run_build_zip(tmp_path):
    """The guard is only a guard if it computes the SAME key as the verdict
    writer. Run scaling_run.build_zip against a synthetic package and compare."""
    spec = importlib.util.spec_from_file_location(
        "scaling_run", os.path.join(TOOLS, "scaling_run.py")
    )
    sr = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(sr)
    pkg = tmp_path / "grepai_spark"
    pkg.mkdir()
    (pkg / "m.py").write_text("z = 42\n")
    sub = pkg / "sub"
    sub.mkdir()
    (sub / "n.py").write_text("w = 7\n")
    old_repo = sr.REPO
    try:
        sr.REPO = str(tmp_path)
        zhash = sr.build_zip(str(tmp_path / "pkg.zip"))
    finally:
        sr.REPO = old_repo
    assert zhash == hc.pkg_content_hash(str(tmp_path))


def test_main_exit_codes(tmp_path, monkeypatch, capsys):
    pkg = tmp_path / "grepai_spark"
    pkg.mkdir()
    (pkg / "a.py").write_text("q = 1\n")
    cur = hc.pkg_content_hash(str(tmp_path))
    monkeypatch.setattr(hc, "REPO", str(tmp_path))

    def write_baseline(h, verdict):
        (tmp_path / "BASELINE.md").write_text(
            "<!-- SCALING:BEGIN -->\n"
            f"Measured code: package content hash `{h}` (commit `c`);\n"
            f"**Scaling efficiency (median) = 0.9**: {verdict} — ok.\n"
            "<!-- SCALING:END -->\n"
        )

    write_baseline(cur, "PASS")
    assert hc.main([]) == 0
    write_baseline(cur, "FAIL")
    assert hc.main(["--quiet"]) == 1
    write_baseline("deadbeefdead", "PASS")
    assert hc.main(["--quiet"]) == 2
    capsys.readouterr()


def test_committed_state_guard(tmp_path):
    """Round-6 guard (VERDICT r5 #2): a SCALING block or campaign history
    differing between HEAD and the working tree must fail the check —
    that is a verdict a `git checkout` would destroy."""
    import subprocess

    repo = str(tmp_path / "r")
    os.makedirs(os.path.join(repo, "tools"))
    subprocess.run(["git", "init", "-q", repo], check=True)
    env_base = {"GIT_AUTHOR_NAME": "t", "GIT_AUTHOR_EMAIL": "t@t",
                "GIT_COMMITTER_NAME": "t", "GIT_COMMITTER_EMAIL": "t@t",
                **os.environ}

    def write(rel, text):
        with open(os.path.join(repo, rel), "w") as fh:
            fh.write(text)

    write("BASELINE.md", "intro\n" + BLOCK)
    write("tools/scaling_history.jsonl", '{"eff": 0.9}\n')
    subprocess.run(["git", "-C", repo, "add", "-A"], check=True, env=env_base)
    subprocess.run(
        ["git", "-C", repo, "commit", "-qm", "init"], check=True, env=env_base
    )
    # clean tree: guard passes
    assert hc.committed_state_matches(True, repo)
    # SCALING block edited in the working tree only: guard fails
    write("BASELINE.md", "intro\n" + BLOCK.replace("0.888", "0.999"))
    assert not hc.committed_state_matches(True, repo)
    # restore block, dirty the history instead: guard fails
    write("BASELINE.md", "intro\n" + BLOCK)
    assert hc.committed_state_matches(True, repo)
    write("tools/scaling_history.jsonl", '{"eff": 0.9}\n{"eff": 0.95}\n')
    assert not hc.committed_state_matches(True, repo)
    # prose-only BASELINE edit outside the block: guard still passes
    subprocess.run(["git", "-C", repo, "add", "-A"], check=True, env=env_base)
    subprocess.run(
        ["git", "-C", repo, "commit", "-qm", "x"], check=True, env=env_base
    )
    write("BASELINE.md", "reworded intro\n" + BLOCK)
    assert hc.committed_state_matches(True, repo)
