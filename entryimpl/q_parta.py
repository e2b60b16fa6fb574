"""Registry query functions — parta family (split from
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


def q_a19_json_lines(spark, sf_dir):
    """Full JSON serialization of each change (A19, debug sink projection)
    — timestamps pre-formatted so the JSON text is engine-portable."""
    ch = _events_changes(spark, sf_dir)
    return ch.select(
        "id",
        F.to_json(
            F.struct(
                F.col("tablename"),
                model.format_log_timestamp("timestamp").alias("timestamp"),
                F.col("operation"),
                F.col("before"),
                F.col("after"),
            ),
            {"ignoreNullFields": "false"},  # keep null images, like json_object
        ).alias("j"),
    )
