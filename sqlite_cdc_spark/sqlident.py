"""Shared SQL-identifier quoting for the string-first construction paths.

r17 rendered hot expression trees as SQL strings parsed once in the JVM
(construction optimization); r17 ADVICE flagged that interpolating
user-supplied column names into backtick-quoted SQL without escaping
embedded backticks produces a parse error or a misparsed identifier
where the old ``Column.alias()`` path handled any name. Every f-string
identifier interpolation site now routes through :func:`bq`.
"""

from __future__ import annotations


def bq(name: str) -> str:
    """Backtick-quote ``name`` for interpolation into generated SQL,
    doubling embedded backticks (the Spark SQL escape for a literal
    backtick inside a quoted identifier). For backtick-free names the
    output is byte-identical to the previous inline ``f"`{name}`"``
    form, so generated SQL — and therefore plans and results — are
    unchanged on every existing call path."""
    return "`" + str(name).replace("`", "``") + "`"
