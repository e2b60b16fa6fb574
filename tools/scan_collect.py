"""Driver-materialization policy scanner (r10).

Finds every REAL ``.collect()`` / ``.toPandas()`` / ``.toLocalIterator()``
call (AST-based — docstring mentions don't count) in the engine and
registry sources. The policy the r9 verdict audited by hand — "nothing
collects an unbounded relation" — is enforced by
``tests/test_plans.py``: every hit must sit in the per-file allowlist
there, each entry carrying its boundedness rationale.

Usage: python tools/scan_collect.py   # prints file:line per hit
"""

from __future__ import annotations

import ast
import glob
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ATTRS = {"collect", "toPandas", "toLocalIterator"}


def scan() -> list[tuple[str, int]]:
    hits: list[tuple[str, int]] = []
    files = (
        glob.glob(os.path.join(REPO, "sqlite_cdc_spark", "**", "*.py"),
                  recursive=True)
        + glob.glob(os.path.join(REPO, "entryimpl", "*.py"))
        + [os.path.join(REPO, "__spark_entry__.py")]
    )
    for path in sorted(files):
        with open(path) as f:
            tree = ast.parse(f.read())
        rel = os.path.relpath(path, REPO)
        for node in ast.walk(tree):
            if (
                isinstance(node, ast.Call)
                and isinstance(node.func, ast.Attribute)
                and node.func.attr in ATTRS
            ):
                hits.append((rel, node.lineno))
    return hits


if __name__ == "__main__":
    for rel, line in scan():
        print(f"{rel}:{line}")
