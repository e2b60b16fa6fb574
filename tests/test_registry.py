"""Registry hygiene: the driver contract itself, frozen as tests."""

from __future__ import annotations

import __spark_entry__ as entry


def test_every_query_is_oracled_or_exempt():
    q, o = entry.queries(), entry.oracle_sql()
    # the single allowed exemption is the declared-approximate sketch
    # query, whose bound is separately gated by b27_sketch_bounds
    missing = [k for k in q if k not in o]
    assert missing == ["b27_sketches"]
    # no orphaned oracles
    assert [k for k in o if k not in q] == []


def test_driver_window_has_no_unoracled_rows():
    q, o = entry.queries(), entry.oracle_sql()
    window = list(q)[:50]
    assert all(k in o for k in window)


def test_query_names_follow_inventory_convention():
    import re

    q = entry.queries()
    pat = re.compile(r"^[ab]\d+_[a-z0-9_]+$")
    bad = [k for k in q if not pat.match(k)]
    assert bad == []


def test_registry_is_callable_and_distinct():
    q = entry.queries()
    assert len(q) == len(set(q))
    assert all(callable(f) for f in q.values())
