"""DuckDB oracle SQL — parta family (split from
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
        "a2_snapshot_first_page": """
            SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber,
                   l_returnflag, l_linestatus, l_quantity
            FROM lineitem
            ORDER BY l_orderkey, l_partkey, l_suppkey, l_linenumber,
                     l_returnflag, l_linestatus, l_quantity
            LIMIT 50
        """,
        "a3_keyset_page": """
            SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber,
                   l_returnflag, l_linestatus, l_quantity
            FROM lineitem
            WHERE (l_orderkey, l_partkey, l_suppkey, l_linenumber,
                   l_returnflag, l_linestatus, l_quantity)
                  > (1000, 900, 50, 3, 'A', 'F', 0.0)
            ORDER BY l_orderkey, l_partkey, l_suppkey, l_linenumber,
                     l_returnflag, l_linestatus, l_quantity
            LIMIT 100
        """,
        "a4_row_json": f"""
            SELECT l_orderkey, l_linenumber,
                   CAST({li_img_json} AS VARCHAR) AS img,
                   l_partkey AS rt_partkey
            FROM lineitem
        """,
        "a5_hex": """
            SELECT p_partkey, upper(hex(encode(p_name))) AS name_hex FROM part
        """,
        "a6_bootstrap": f"""
            SELECT 'orders' AS tablename,
                   TIMESTAMP '{BOOTSTRAP_TS}' AS timestamp,
                   'INSERT' AS operation,
                   CAST(NULL AS VARCHAR) AS before,
                   CAST({_ORDERS_IMG_SQL} AS VARCHAR) AS after
            FROM orders
        """,
        "a10_drain_batch": f"""
            WITH changes AS ({_EVENTS_CHANGES_SQL})
            SELECT * FROM changes ORDER BY id ASC LIMIT 256
        """,
        "a10_drain_after": f"""
            WITH changes AS ({_EVENTS_CHANGES_SQL})
            SELECT * FROM changes WHERE id > 500 ORDER BY id ASC LIMIT 256
        """,
        "a11_ts_codec": """
            SELECT event_id,
                   strftime(ts, '%Y-%m-%d %H:%M:%S.%g') AS ts_text,
                   strptime(strftime(ts, '%Y-%m-%d %H:%M:%S.%g'),
                            '%Y-%m-%d %H:%M:%S.%g') AS ts_rt
            FROM events
        """,
        "a12_op_decode": """
            WITH raw AS (
              SELECT CASE event_type WHEN 'signup' THEN 'insert'
                                     WHEN 'purchase' THEN 'Update'
                                     WHEN 'error' THEN 'DELETE'
                                     ELSE event_type END AS r
              FROM events
            )
            SELECT CASE WHEN upper(r) IN ('INSERT','UPDATE','DELETE')
                        THEN upper(r) ELSE 'UNKNOWN' END AS operation,
                   count(*) AS n
            FROM raw GROUP BY 1
        """,
        "a16_bootstrap_union_log": f"""
            WITH boot AS (
              SELECT 'orders' AS tablename, 'INSERT' AS operation FROM orders
            ), live AS (
              SELECT tablename, operation FROM ({_EVENTS_CHANGES_SQL})
            )
            SELECT tablename, operation, count(*) AS n
            FROM (SELECT * FROM boot UNION ALL SELECT * FROM live)
            GROUP BY tablename, operation
        """,
        "a18_stdout_lines": f"""
            WITH changes AS ({_EVENTS_CHANGES_SQL})
            SELECT id,
                   strftime(timestamp, '%Y-%m-%dT%H:%M:%S.%gZ') || ': ' ||
                   tablename || ' ' || operation AS line
            FROM changes
        """,
        "a19_json_lines": f"""
            WITH changes AS ({_EVENTS_CHANGES_SQL})
            SELECT id,
                   CAST(json_object(
                     'tablename', tablename,
                     'timestamp', strftime(timestamp, '%Y-%m-%d %H:%M:%S.%g'),
                     'operation', operation,
                     'before', before,
                     'after', after) AS VARCHAR) AS j
            FROM changes
        """,
}
