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


def test_no_oracled_query_returns_array_or_map_columns(spark, sf_dir):
    """The driver's pandas canonicalizer cannot factorize list dtypes
    (``TypeError: unhashable type: 'list'`` — r5's only two non-green
    rows, b30_inverted_index and b20_mean_pool). Any oracled query is a
    rotation candidate for the 50-slot driver window, so NONE of them
    may expose an ArrayType/MapType column: serialize (concat_ws /
    to_json / %.6f-format) at the registry boundary; the library APIs
    keep returning real arrays."""
    from pyspark.sql import types as T

    q, o = entry.queries(), entry.oracle_sql()
    offenders = []
    for name, fn in q.items():
        if name not in o:
            continue  # rows-only queries never reach the canonicalizer
        schema = fn(spark, sf_dir).schema
        for f in schema.fields:
            if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType)):
                offenders.append(f"{name}.{f.name}:{f.dataType.simpleString()}")
    assert offenders == []


def test_driver_window_is_exactly_50_known_names():
    q = entry.queries()
    window = entry._R18_WINDOW
    assert len(window) == 50
    assert len(set(window)) == 50
    unknown = [k for k in window if k not in q]
    assert unknown == []
    # the rotation must actually control the gate: queries() leads with it
    assert list(q)[:50] == window


def test_registry_literal_has_no_duplicate_keys():
    """r10: three r10 additions once reused round-6 names — the dict
    literal silently deduped and the later same-named function SHADOWED
    the original operator. Parse the literal and fail on any repeated
    key so a collision surfaces as a test failure, not a silent
    operator replacement."""
    import re
    from collections import Counter

    src = open("__spark_entry__.py").read()
    # Slice at the ASSIGNMENT (newline-prefixed), not the first textual
    # mention — the _all_queries docstring names the window constant, and
    # r10's version of this test sliced there, scanning a 187-char
    # docstring prefix with zero keys (the duplicate guard never ran).
    body = src[src.index("def _all_queries"):src.index("\n_R18_WINDOW =")]
    keys = re.findall(r'^\s{8}"([a-z0-9_]+)":', body, re.M)
    # self-check against re-vacuation: the registry holds 316+ keys
    assert len(keys) > 300, f"scanned only {len(keys)} keys — slice broken"
    dups = {k: c for k, c in Counter(keys).items() if c > 1}
    assert not dups, f"duplicate registry keys: {dups}"
    # and no two same-named q_ functions across entryimpl modules
    import glob

    defs = Counter()
    for path in glob.glob("entryimpl/q_*.py"):
        for m in re.finditer(r"^def (q_\w+)\(", open(path).read(), re.M):
            defs[m.group(1)] += 1
    shadowed = {k: c for k, c in defs.items() if c > 1}
    assert not shadowed, f"shadowed query functions: {shadowed}"
