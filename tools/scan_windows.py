"""Registry-wide physical-plan audit: unpartitioned WindowExec nodes.

An unpartitioned window (``Window.orderBy(...)`` with no partitionBy)
forces every input row onto ONE task for a global sort — the single
worst scale-killer available in the DataFrame API. It is only
acceptable when the input is provably bounded:

- a limit node (``TakeOrderedAndProject`` / ``GlobalLimit`` /
  ``CollectLimit``) sits beneath it, so the window sees <= k rows; or
- the query is on the audited allowlist in tests/test_plans.py
  (grouped aggregate whose key cardinality is a small dimension —
  |nations|, |flags|, fixed bucket grids, ...).

Usage:  python tools/scan_windows.py [query ...]
Prints one line per unpartitioned WindowExec found:
    <query>  bounded_by_limit=<bool>
Exit 0 always (audit tool; the pytest plan test enforces policy).
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def iter_plan(node):
    """Yield every node of a JVM SparkPlan tree, descending into AQE
    wrappers and reused-exchange references."""
    yield node
    name = node.getClass().getSimpleName()
    if name == "AdaptiveSparkPlanExec":
        yield from iter_plan(node.inputPlan())
        return
    ch = node.children()
    for i in range(ch.size()):
        yield from iter_plan(ch.apply(i))


def subtree_has_limit(node) -> bool:
    for n in iter_plan(node):
        if n is node:
            continue
        name = n.getClass().getSimpleName()
        if (
            "TakeOrderedAndProject" in name
            or "GlobalLimit" in name
            or "CollectLimit" in name
        ):
            return True
    return False


def unpartitioned_windows(df):
    """(window_node, bounded_by_limit) for each partition-less
    WindowExec/WindowGroupLimitExec in df's physical plan."""
    plan = df._jdf.queryExecution().executedPlan()
    out = []
    for n in iter_plan(plan):
        name = n.getClass().getSimpleName()
        if name in ("WindowExec", "WindowGroupLimitExec"):
            if n.partitionSpec().isEmpty():
                out.append((n, subtree_has_limit(n)))
    return out


def main() -> None:
    import __spark_entry__ as se
    from sqlite_cdc_spark.session import get_spark

    spark = get_spark("scan-windows", cpus=4, shuffle_partitions=4)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    reg = se.queries()
    names = sys.argv[1:] or list(reg)
    for name in names:
        try:
            df = reg[name](spark, sf_dir)
            wins = unpartitioned_windows(df)
        except Exception as e:  # noqa: BLE001 - audit tool, report and move on
            print(f"{name}  ERROR {type(e).__name__}: {e}")
            continue
        for _, bounded in wins:
            print(f"{name}  bounded_by_limit={bounded}")


if __name__ == "__main__":
    main()
