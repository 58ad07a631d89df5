"""Driver-contract guards for __spark_entry__: the failure classes that have
actually bitten (r2: an array<double> output column crashed the driver's
canonicalizer; stale-window rotation) stay impossible.

The schema audit builds every registered query's plan at sf0.001 — analysis
cost only for almost all entries (funnel's 3-row count is the exception) —
and rejects non-scalar output columns: the driver canonicalizer sorts a
pandas frame by every column and dies on unhashable list/dict cells.
"""

from __future__ import annotations

import __spark_entry__ as entry_mod

SF = "/root/testdata/sf0.001"


def test_window_is_exactly_fifty_and_registered():
    names = entry_mod._PRIORITY
    assert len(names) == 50
    assert len(set(names)) == 50
    q = entry_mod.queries()
    assert list(q)[:50] == names


def test_every_query_has_an_oracle():
    q, o = entry_mod.queries(), entry_mod.oracle_sql()
    assert [k for k in q if k not in o] == []


def test_no_query_emits_non_scalar_columns(spark):
    violations = []
    for name, fn in entry_mod.queries().items():
        df = fn(spark, SF)
        for f in df.schema:
            t = f.dataType.simpleString()
            if t.startswith(("array", "map", "struct")):
                violations.append((name, f.name, t))
    assert violations == []
