"""DuckDB oracle SQL — sql family (split from
__spark_entry__.py oracle_sql(); entries verbatim)."""

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

SQL = {
        "b25_sql_exists": _SQL_EXISTS,
        "b25_sql_window": _SQL_WINDOW_FUNCS,
        "b25_sql_correlated": _SQL_CORRELATED_COUNT,
        "b25_sql_cte_top_supplier": _SQL_CTE_TOP_SUPPLIER,
        "b25_sql_recursive": _RECURSIVE_SQL,
    "b25_sql_lateral": _SQL_LATERAL,
    "b25_sql_pivot": """
        SELECT o_orderpriority,
               CAST(count(*) FILTER (WHERE o_orderstatus = 'O') AS BIGINT)
                 AS status_o,
               CAST(count(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT)
                 AS status_f,
               CAST(count(*) FILTER (WHERE o_orderstatus = 'P') AS BIGINT)
                 AS status_p
        FROM orders GROUP BY o_orderpriority
    """,
}
