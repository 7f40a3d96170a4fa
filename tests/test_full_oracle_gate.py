"""Full oracle gate as a pytest test (VERDICT r4 #5).

The per-round driver samples ~50 of the ~146 queries() entries;
before this test, the rest were only verified in judge sessions. This
runs the ENTIRE gate — every queries() entry vs its oracle_sql()
DuckDB reconstruction (rows + sorted schema + order-insensitive value
hash) — at sf0.001 inside the normal test session, so every `pytest
tests/` run covers all queries.

Runtime: ~4 min at sf0.001 on the 4-CPU test session (~3m40s
standalone at 8 CPUs) — roughly doubling the suite, which is the
point: no query can silently rot between rounds. Deselect with
`-m "not full_gate"` for quick iteration.
"""

import sys

import pytest

sys.path.insert(0, ".")
sys.path.insert(0, "tools")


@pytest.mark.full_gate
def test_every_query_matches_its_oracle(ray_session):
    from check_oracles import run_gate

    lines: list = []
    failures = run_gate("/root/testdata/sf0.001", echo=lines.append)
    assert failures == 0, "\n".join(str(l) for l in lines)
    # the gate must actually have covered the whole surface
    import __ray_entry__ as mod

    n_q = len(mod.queries())
    assert len([l for l in lines if isinstance(l, str)
                and (l.startswith("OK") or l.startswith("okR"))]) == n_q
    assert n_q >= 140
