"""Driver-contract invariants: the registration surface the grading driver
consumes must not drift.

The driver's correctness window covers 50 entries and records a full
rows+schema+hash comparison only for queries with an oracle_sql() entry —
so every registered query must carry an oracle (round 4 closed the last
rows-only gap, frame_sample), and the count must stay exactly at the
window size.
"""

from __future__ import annotations

import __spark_entry__ as entry


def test_every_query_is_oracle_backed_and_window_sized():
    qs = entry.queries()
    oracles = entry.oracle_sql()
    assert set(qs) == set(oracles), (
        "queries() and oracle_sql() must register the same keys; "
        f"only-in-queries={sorted(set(qs) - set(oracles))}, "
        f"only-in-oracles={sorted(set(oracles) - set(qs))}"
    )
    assert len(qs) == 50  # the driver's correctness window
    for name, sql in oracles.items():
        assert isinstance(sql, str) and sql.strip(), name
        assert callable(qs[name]), name
