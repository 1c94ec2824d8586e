"""Round-8 consolidation gates.

1. oracle_twins contract (VERDICT r7 item 7): every registered query
   the driver cannot hash-grade (no oracle_sql entry -> rows-only
   "no_oracle" row) must name a registered, hash-graded EXACT twin,
   machine-readably — both via __spark_entry__.oracle_twins() and as an
   `.oracle_twin` attribute on the callable. CORRECTNESS artifacts then
   carry no unexplained red rows.

No Spark session needed.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _entry():
    import __spark_entry__ as e

    return e


def test_every_no_oracle_query_names_a_hash_graded_twin():
    e = _entry()
    qs, osql, twins = e.queries(), e.oracle_sql(), e.oracle_twins()
    missing = [q for q in qs if q not in osql and q not in twins]
    assert not missing, f"no-oracle queries without a declared twin: {missing}"


def test_twins_are_registered_and_themselves_hash_graded():
    e = _entry()
    qs, osql, twins = e.queries(), e.oracle_sql(), e.oracle_twins()
    for q, twin in twins.items():
        assert q in qs, f"twin declared for unregistered query {q}"
        assert twin in qs, f"{q}: twin {twin} is not a registered query"
        assert twin in osql, f"{q}: twin {twin} has no oracle SQL (not hash-graded)"
        assert twin not in twins, f"{q}: twin {twin} is itself approximate"


def test_twin_is_discoverable_on_the_callable():
    e = _entry()
    qs, twins = e.queries(), e.oracle_twins()
    for q, twin in twins.items():
        assert getattr(qs[q], "oracle_twin", None) == twin


def test_oracle_coverage_is_total_modulo_twin_waivers():
    """Driver-contract completeness (pure, no Spark): every queries()
    key has an oracle_sql() entry EXCEPT the approximate-by-design
    families, each of which must carry an oracle_twins() waiver; and
    every oracle_sql / oracle_twins key names a registered query."""
    import __spark_entry__ as e

    qs = set(e.queries())
    oracles = set(e.oracle_sql())
    twins = e.oracle_twins()
    assert oracles <= qs, oracles - qs
    assert set(twins) <= qs, set(twins) - qs
    uncovered = qs - oracles - set(twins)
    assert not uncovered, f"queries with neither oracle nor twin: {uncovered}"
    # waived queries must not ALSO claim an oracle (the waiver would be
    # dead paper)
    assert not (set(twins) & oracles), set(twins) & oracles
