"""Driver contract for the spark-graft builder (PySpark target).

Each ``queries()`` entry is one operator from SURVEY.md §2, implemented in
:mod:`sqlite_cdc_spark`, with a DuckDB oracle in ``oracle_sql()``. Column
names are aliased identically on both sides (the driver sorts columns by
name before hashing values).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sqlite_cdc_spark import bootstrap as bs
from sqlite_cdc_spark import derive, log, model
from sqlite_cdc_spark.sources import load_table

BOOTSTRAP_TS = "2024-06-01 00:00:00"


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: bootstrap the lineitem snapshot into the canonical change
    feed (SURVEY §7 step 1 — A2/A4/A6 end to end)."""
    sf_dir = "/root/testdata/sf0.001"
    lineitem = _t(spark, sf_dir, "lineitem")
    return bs.snapshot_as_inserts(
        lineitem, "lineitem", timestamp=F.lit(BOOTSTRAP_TS).cast("timestamp")
    )


# --------------------------------------------------------------------------
# helpers shared by query/oracle pairs
# --------------------------------------------------------------------------

#: lineitem columns with the timestamp pre-formatted to text so JSON images
#: are engine-portable (Spark to_json renders timestamps ISO-8601 with 'T',
#: DuckDB json_object uses its own format — strings sidestep both).
_LI_IMG_COLS = [
    "l_orderkey",
    "l_partkey",
    "l_suppkey",
    "l_linenumber",
    "l_returnflag",
    "l_linestatus",
]

_ORDERS_IMG_SQL = (
    "json_object('o_orderkey', o_orderkey, 'o_custkey', o_custkey, "
    "'o_orderstatus', o_orderstatus, 'o_orderpriority', o_orderpriority)"
)


def _orders_img(prefix_df, cols=("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority")):
    return F.to_json(F.struct(*[F.col(c) for c in cols]))


def _events_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    return log.events_as_changes(_t(spark, sf_dir, "events"))


#: DuckDB rendering of ``log.events_as_changes`` — the same deterministic
#: normalization expressed in SQL for the oracle side.
_EVENTS_CHANGES_SQL = """
SELECT
  event_id AS id,
  'events' AS tablename,
  ts AS timestamp,
  CASE event_type WHEN 'signup' THEN 'INSERT'
                  WHEN 'error' THEN 'DELETE'
                  ELSE 'UPDATE' END AS operation,
  CASE WHEN event_type = 'signup' THEN NULL
       ELSE CAST(json_object('user_id', user_id) AS VARCHAR) END AS before,
  CASE WHEN event_type = 'error' THEN NULL
       ELSE CAST(json_object('user_id', user_id, 'event_type', event_type,
                             'value', value, 'props', props) AS VARCHAR)
       END AS after
FROM events
"""


# --------------------------------------------------------------------------
# queries
# --------------------------------------------------------------------------


#: (l_orderkey, l_linenumber) is NOT unique in the fixture; order/page on the
#: full selected tuple so LIMIT boundaries are deterministic in both engines.
_LI_PAGE_KEYS = [*_LI_IMG_COLS, "l_quantity"]


def q_a2_snapshot_first_page(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem").select(*_LI_PAGE_KEYS)
    return bs.snapshot_first_page(li, _LI_PAGE_KEYS, 50)


def q_a3_keyset_page(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem").select(*_LI_PAGE_KEYS)
    last = [1000, 900, 50, 3, "A", "F", 0.0]
    return bs.snapshot_next_page(li, _LI_PAGE_KEYS, last, 100)


def q_a4_row_json(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem").select(*_LI_IMG_COLS)
    img = model.row_image(li).alias("img")
    out = li.select(F.col("l_orderkey"), F.col("l_linenumber"), img)
    # roundtrip: parse the image back and surface one typed field
    return out.withColumn(
        "rt_partkey", model.image_field("img", "l_partkey").cast("bigint")
    )


def q_a5_hex(spark, sf_dir):
    p = _t(spark, sf_dir, "part")
    return p.select(
        F.col("p_partkey"),
        model.blob_to_hex(F.encode(F.col("p_name"), "UTF-8")).alias("name_hex"),
    )


def q_a6_bootstrap(spark, sf_dir):
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority"
    )
    return bs.snapshot_as_inserts(
        orders, "orders", timestamp=F.lit(BOOTSTRAP_TS).cast("timestamp")
    )


def q_a10_drain_batch(spark, sf_dir):
    return log.drain_batch(_events_changes(spark, sf_dir), 256)


def q_a10_drain_after(spark, sf_dir):
    return log.drain_batch(_events_changes(spark, sf_dir), 256, after_id=500)


def q_a11_ts_codec(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    txt = model.format_log_timestamp("ts")
    return ev.select(
        F.col("event_id"),
        txt.alias("ts_text"),
        model.parse_log_timestamp(txt).alias("ts_rt"),
    )


def q_a12_op_decode(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    raw = (
        F.when(F.col("event_type") == "signup", F.lit("insert"))
        .when(F.col("event_type") == "purchase", F.lit("Update"))
        .when(F.col("event_type") == "error", F.lit("DELETE"))
        .otherwise(F.col("event_type"))
    )
    return (
        ev.select(model.decode_operation(raw).alias("operation"))
        .groupBy("operation")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def q_a16_bootstrap_union_log(spark, sf_dir):
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority"
    )
    boot = bs.snapshot_as_inserts(
        orders, "orders", timestamp=F.lit(BOOTSTRAP_TS).cast("timestamp")
    ).select("tablename", "operation")
    live = _events_changes(spark, sf_dir).select("tablename", "operation")
    return (
        boot.unionByName(live)
        .groupBy("tablename", "operation")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def q_a18_stdout_lines(spark, sf_dir):
    ch = _events_changes(spark, sf_dir)
    return ch.select(
        F.col("id"), model.simple_change_line().alias("line")
    )


def q_b3_change_stats(spark, sf_dir):
    return log.change_stats(_events_changes(spark, sf_dir), "hour").drop("approx_ids")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "a2_snapshot_first_page": q_a2_snapshot_first_page,
        "a3_keyset_page": q_a3_keyset_page,
        "a4_row_json": q_a4_row_json,
        "a5_hex": q_a5_hex,
        "a6_bootstrap": q_a6_bootstrap,
        "a10_drain_batch": q_a10_drain_batch,
        "a10_drain_after": q_a10_drain_after,
        "a11_ts_codec": q_a11_ts_codec,
        "a12_op_decode": q_a12_op_decode,
        "a16_bootstrap_union_log": q_a16_bootstrap_union_log,
        "a18_stdout_lines": q_a18_stdout_lines,
        "b3_change_stats": q_b3_change_stats,
    }


def oracle_sql() -> dict[str, str]:
    li_img_json = (
        "json_object('l_orderkey', l_orderkey, 'l_partkey', l_partkey, "
        "'l_suppkey', l_suppkey, 'l_linenumber', l_linenumber, "
        "'l_returnflag', l_returnflag, 'l_linestatus', l_linestatus)"
    )
    return {
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
        "b3_change_stats": f"""
            WITH changes AS ({_EVENTS_CHANGES_SQL})
            SELECT tablename, operation,
                   date_trunc('hour', timestamp) AS bucket,
                   count(*) AS n_changes
            FROM changes GROUP BY 1, 2, 3
        """,
    }
