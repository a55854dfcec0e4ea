"""Two-parallelism scaling harness — the sandbox proxy for the north rule's
N vs 4N executor criterion.

Runs bench.py twice on the SAME input (default sf0.1): local[8] (N) and
local[32] (4N). Throughput scaling efficiency = (tp_32 / tp_8) / 4.
Appends/refreshes the measured table in BASELINE.md and prints a JSON summary.

Usage: python tools/scaling_run.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
MARK_BEGIN = "<!-- SCALING:BEGIN -->"
MARK_END = "<!-- SCALING:END -->"


def run_bench(cpus: int, sf_dir: str) -> dict:
    env = dict(os.environ)
    env["SPARK_GRAFT_CPUS"] = str(cpus)
    env["SPARK_GRAFT_SF_DIR"] = sf_dir
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env,
        capture_output=True,
        text=True,
        check=True,
    ).stdout
    line = [l for l in out.strip().splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    lo, hi = 8, 32
    r_lo = run_bench(lo, sf_dir)
    r_hi = run_bench(hi, sf_dir)
    tp_lo, tp_hi = r_lo["value"], r_hi["value"]
    eff = (tp_hi / tp_lo) / (hi / lo)
    summary = {
        "sf_dir": sf_dir,
        "n_turns": r_hi["n_turns"],
        "cpus_lo": lo,
        "cpus_hi": hi,
        "turns_per_sec_lo": tp_lo,
        "turns_per_sec_hi": tp_hi,
        "pipeline_sec_lo": r_lo["pipeline_sec"],
        "pipeline_sec_hi": r_hi["pipeline_sec"],
        "scaling_efficiency": round(eff, 3),
        "target": 0.8,
        "pass": eff >= 0.8,
    }
    print(json.dumps(summary))

    block = f"""{MARK_BEGIN}
## Measured scaling (latest run)

Same input ({r_hi['n_turns']} turns, {sf_dir}), same job (full KG pipeline:
extract -> link -> canonicalize -> materialize), two parallelism levels —
the sandbox proxy for N vs 4N executors:

| parallelism | pipeline wall (s) | throughput (turns/sec) |
|---|---|---|
| local[{lo}] (N) | {r_lo['pipeline_sec']} | {tp_lo} |
| local[{hi}] (4N) | {r_hi['pipeline_sec']} | {tp_hi} |

**Scaling efficiency = (tp_4N / tp_N) / 4 = {eff:.3f}** (target >= 0.8:
{'PASS' if eff >= 0.8 else 'FAIL'}).

Per-query seconds at local[{hi}]: `{json.dumps(r_hi['queries'])}`
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


if __name__ == "__main__":
    main()
