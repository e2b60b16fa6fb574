"""Registry query functions — sql family (split from
__spark_entry__.py; pure move)."""

# ruff: noqa: F401,F403,F405
from __future__ import annotations
from collections.abc import Callable
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from sqlite_cdc_spark import bootstrap as bs
from sqlite_cdc_spark import derive, log, meta, model
from sqlite_cdc_spark.pipeline import (
    decontam,
    dedup,
    lm,
    multimodal,
    sampling,
    similarity,
    text as textops,
)
from sqlite_cdc_spark.sources import load_table
import math as _math

from entryimpl.common import *


q_b25_sql_exists = _sql_query(_SQL_EXISTS, "orders", "lineitem")


q_b25_sql_correlated = _sql_query(_SQL_CORRELATED_COUNT, "customer", "orders")


q_b25_sql_cte_top_supplier = _sql_query(_SQL_CTE_TOP_SUPPLIER, "lineitem", "supplier")


def q_b25_sql_recursive(spark, sf_dir):
    """Recursive CTE on the Spark SQL surface (B25 depth — new in
    Spark 4): an org-chart-style hierarchy walk carrying root/depth
    down a digit-shift customer tree, rolled up per level. The SAME
    SQL text runs on both engines; sums in exact-int-free doubles are
    per-depth partial sums of identical values, rounded 2."""
    _t(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(_RECURSIVE_SQL)


q_b25_sql_window = _sql_query(_SQL_WINDOW_FUNCS, "lineitem")



#: SQL-surface depth (B25, r10): correlated LATERAL derived table with
#: ORDER BY + LIMIT — the "top-N per row" idiom in pure SQL. Catalyst
#: decorrelates it into a ranked join (no per-row re-execution); the
#: ORDER BY is total (extendedprice, then every remaining key — the
#: (l_orderkey, l_linenumber) pair alone is NOT unique in the fixture),
#: so both engines pick identical rows. Oracle = the same SQL verbatim.
q_b25_sql_lateral = _sql_query(_SQL_LATERAL, "orders", "lineitem")


#: SQL PIVOT surface (B25 depth, r10): Spark's PIVOT clause turning
#: order-status rows into columns with per-priority counts. The oracle
#: intentionally uses conditional aggregation (FILTER) instead — the
#: contract is identical RESULTS, not identical dialect, and pinning
#: both spellings documents the translation a reference user needs.
_SQL_PIVOT = """
SELECT o_orderpriority, status_o, status_f, status_p
FROM (SELECT o_orderstatus, o_orderpriority FROM orders)
PIVOT (
  CAST(count(*) AS BIGINT)
  FOR o_orderstatus IN ('O' AS status_o, 'F' AS status_f, 'P' AS status_p)
)
"""

q_b25_sql_pivot = _sql_query(_SQL_PIVOT, "orders")
