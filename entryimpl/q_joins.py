"""Registry query functions — joins family (split from
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


def q_b7_join_enrich(spark, sf_dir):
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    # dims are broadcast: no shuffle of the fact side
    enriched = (
        orders.join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    )
    return enriched.groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(
            F.sum(F.col("o_totalprice").cast("decimal(38,6)")).cast("double"), 2
        ).alias("revenue"),
    )


def q_b7_salted_join(spark, sf_dir):
    """Skew-resistant salted equi-join (B7 depth, derive.salted_join):
    lineitem⋈orders on the hot order key with an 8-way salt, aggregated
    per customer. The oracle is the PLAIN SQL join — salting must be
    invisible in the result, which is exactly the property worth a green
    driver row (salt column dropped, no dup/lost rows)."""
    li = _t(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"), "l_quantity"
    )
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    joined = derive.salted_join(li, orders, "o_orderkey", salt=8)
    return joined.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum(F.col("l_quantity").cast("decimal(38,6)")).cast("double").alias("sum_qty"),
    )


def q_b8_anti_join(spark, sf_dir):
    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    no_orders = customer.join(
        orders, customer.c_custkey == orders.o_custkey, "left_anti"
    )
    return no_orders.select("c_custkey", "c_mktsegment")


def q_b8_semi_join(spark, sf_dir):
    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    with_orders = customer.join(
        orders, customer.c_custkey == orders.o_custkey, "left_semi"
    )
    return with_orders.groupBy("c_mktsegment").agg(F.count(F.lit(1)).alias("n_customers"))


def q_b9_asof(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    latest = derive.asof_latest(
        ev, ["user_id"], "ts", "2024-02-01 00:00:00", order_cols=["event_id"]
    )
    return latest.select("user_id", "event_id", "ts", "event_type", "value")


def q_b9_asof_join(spark, sf_dir):
    """As-of join: each order enriched with the user's latest event at or
    before the order date (key: o_custkey % 100 == events.user_id)."""
    ev = _t(spark, sf_dir, "events").select(
        F.col("user_id").alias("k"), F.col("ts"), F.col("event_id"), F.col("value")
    )
    o = (
        _t(spark, sf_dir, "orders")
        .select(
            "o_orderkey",
            (F.col("o_custkey") % 100).alias("k"),
            F.col("o_orderdate"),
        )
        .filter(F.col("o_orderkey") % 29 == 0)
    )
    # the time bound must live IN the join condition: filtering after a
    # plain left join would drop orders whose events are all later
    joined = o.join(
        ev, (o["k"] == ev["k"]) & (ev["ts"] <= o["o_orderdate"]), "left"
    ).drop(ev["k"])
    from pyspark.sql import Window

    w = Window.partitionBy("o_orderkey").orderBy(
        F.col("ts").desc_nulls_last(), F.col("event_id").desc_nulls_last()
    )
    latest = (
        joined.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    return latest.select("o_orderkey", "k", "event_id", "value")


def q_b7_multi_join_revenue(spark, sf_dir):
    """TPC-H Q5-shaped star join (B7 depth): local-supplier revenue per
    nation for one region-year. Plan shape at scale: lineitem⋈orders
    shuffles on orderkey (the only big-big join); customer/supplier/nation/
    region broadcast; aggregation is partial+final hash agg."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    dec4 = lambda col: F.col(col).cast("decimal(18,4)")  # noqa: E731
    joined = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    )
    return (
        joined.groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.round(
                F.sum(
                    dec4("l_extendedprice")
                    * (F.lit(1).cast("decimal(18,4)") - dec4("l_discount"))
                ).cast("double"),
                2,
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


q_b8_waiting_suppliers = _sql_query(
    _SQL_WAITING_SUPPLIERS, "supplier", "lineitem", "orders"
)


q_b8_idle_customers = _sql_query(_SQL_IDLE_CUSTOMERS, "customer", "orders")


def q_b7_skew_diagnosis(spark, sf_dir):
    """Join-key skew diagnosis (B7 ops depth): per-key row counts on the
    fact side with each key's share of the table and the top-key /
    mean-key ratio — the measurement that decides whether `salted_join`
    (derive.py) or AQE skew-split is needed BEFORE the join runs. One
    partial+final agg; scalars broadcast; top-20 via distributed
    ``orderBy().limit(20)`` (TakeOrderedAndProject — each task keeps a
    20-row heap, the driver merges), THEN ``row_number`` over only the
    20 survivors. Never a global WindowExec over the full key space —
    that would sort every distinct join key on one task, precisely in
    the query whose job is to diagnose skew (VERDICT r7 item 2)."""
    from pyspark.sql import Window

    li = _t(spark, sf_dir, "lineitem")
    per_key = li.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows")
    )
    scalars = per_key.agg(
        F.sum("n_rows").cast("double").alias("__total"),
        F.avg(F.col("n_rows").cast("double")).alias("__mean"),
    )
    w = Window.orderBy(F.col("n_rows").desc(), F.col("l_orderkey").asc())
    return (
        per_key.crossJoin(F.broadcast(scalars))
        .select(
            "l_orderkey",
            "n_rows",
            F.round(F.col("n_rows") / F.col("__total"), 6).alias("share"),
            F.round(F.col("n_rows") / F.col("__mean"), 6).alias(
                "skew_ratio"
            ),
        )
        .orderBy(F.col("n_rows").desc(), F.col("l_orderkey").asc())
        .limit(20)
        .withColumn("rank", F.row_number().over(w).cast("bigint"))
    )


def q_b7_outer_join(spark, sf_dir):
    """Outer-join family (B7 depth): customers LEFT JOIN their orders —
    null-extended rows for order-less customers kept and flagged."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    j = c.join(o, c.c_custkey == o.o_custkey, "left_outer")
    return j.groupBy("c_custkey", "c_mktsegment").agg(
        F.count("o_orderkey").alias("n_orders"),  # count() skips nulls
        (F.count("o_orderkey") == 0).alias("is_inactive"),
    )


def q_b9_band_join(spark, sf_dir):
    """Numeric band join (B9 depth): price rows joined to a small band
    table on a range condition (lo <= price < hi) — the binning-by-join
    shape. The band table is literal/broadcast, so Catalyst plans a
    broadcast nested-loop with the range predicate — no cartesian of two
    big sides, the only sane plan for range joins at scale."""
    bands = [(0, 50000, "low"), (50000, 150000, "mid"), (150000, 10**9, "high")]
    o = _t(spark, sf_dir, "orders")
    b = spark.createDataFrame(bands, "lo long, hi long, band string")
    j = o.join(
        F.broadcast(b),
        (F.col("o_totalprice") >= F.col("lo")) & (F.col("o_totalprice") < F.col("hi")),
    )
    return j.groupBy("band").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(
            F.sum(F.col("o_totalprice").cast("decimal(38,6)")).cast("double"), 2
        ).alias("revenue"),
    )


def q_b7_shipping_priority(spark, sf_dir):
    """TPC-H Q3 shape (B7/B12 depth): revenue per undelivered order for a
    customer segment, top-10 by revenue — selective dimension filter
    broadcast into the fact join, decimal-exact revenue agg, then
    TakeOrderedAndProject-sized top-k (rounded revenue + key tie-breaks
    so ranking is engine-identical)."""
    cust = _t(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < "1996-06-01"
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > "1996-06-01"
    )
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
    )
    agg = joined.groupBy("l_orderkey", "o_orderdate", "o_orderpriority").agg(
        F.round(
            F.sum(
                (
                    F.col("l_extendedprice").cast("decimal(38,6)")
                    * (F.lit(1).cast("decimal(38,6)") - F.col("l_discount").cast("decimal(38,6)"))
                )
            ).cast("double"),
            2,
        ).alias("revenue")
    )
    from pyspark.sql import Window

    # top-10 via distributed orderBy().limit(10) (TakeOrderedAndProject),
    # then rank only the 10 survivors — the per-order revenue relation is
    # |qualifying orders|, far too large for a global WindowExec sort on
    # one task (VERDICT r7 item 2).
    w = Window.orderBy(
        F.col("revenue").desc(), F.col("l_orderkey").asc()
    )
    return (
        agg.orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
        .withColumn("rank", F.row_number().over(w).cast("bigint"))
        .select(
            "l_orderkey",
            F.col("o_orderdate").cast("date").alias("o_orderdate"),
            "o_orderpriority",
            "revenue",
            "rank",
        )
    )


def q_b7_nation_volume(spark, sf_dir):
    """TPC-H Q7 shape (B7 depth, r7): bilateral trade volume between two
    nations by ship year — the two-sided dimension-filter join no other
    b7 row exercises (the OR spans BOTH dim legs, so neither filter can
    prune alone; Catalyst keeps it as a post-join residual over
    broadcast dims). lineitem⋈orders is the only big-big join; customer/
    supplier/nation broadcast; decimal revenue."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    ns = n.select(
        F.col("n_nationkey").alias("__snk"), F.col("n_name").alias("supp_nation")
    )
    nc = n.select(
        F.col("n_nationkey").alias("__cnk"), F.col("n_name").alias("cust_nation")
    )
    dec4 = lambda col: F.col(col).cast("decimal(18,4)")  # noqa: E731
    joined = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(ns), F.col("s_nationkey") == F.col("__snk"))
        .join(F.broadcast(nc), F.col("c_nationkey") == F.col("__cnk"))
        .filter(
            (
                (F.col("supp_nation") == "NATION_1")
                & (F.col("cust_nation") == "NATION_2")
            )
            | (
                (F.col("supp_nation") == "NATION_2")
                & (F.col("cust_nation") == "NATION_1")
            )
        )
    )
    return (
        joined.groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("l_year"),
        )
        .agg(
            F.round(
                F.sum(
                    dec4("l_extendedprice")
                    * (F.lit(1).cast("decimal(18,4)") - dec4("l_discount"))
                ).cast("double"),
                2,
            ).alias("volume"),
            F.count(F.lit(1)).cast("long").alias("n_items"),
        )
    )


def q_b8_supplier_part_types(spark, sf_dir):
    """TPC-H Q16 shape (B8/B10 depth, r7): distinct-supplier counts per
    part attribute bucket, EXCLUDING a supplier blacklist via anti-join
    (the NOT IN subquery shape; here 'suppliers with complaints' =
    negative account balance). lineitem stands in for partsupp as the
    part↔supplier relation (the fixture ships none): distinct
    (partkey, suppkey) first — one keyed dedup — then the anti-join
    and the broadcast part join, then count_distinct per bucket."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_size") <= 30)
    bad = (
        _t(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    ps = li.select("l_partkey", "l_suppkey").distinct()
    kept = ps.join(bad, ps.l_suppkey == bad.s_suppkey, "left_anti")
    return (
        kept.join(F.broadcast(p), kept.l_partkey == p.p_partkey)
        .groupBy("p_brand", F.split(F.col("p_type"), " ")[0].alias("p_family"), "p_size")
        .agg(F.count_distinct("l_suppkey").cast("long").alias("supplier_cnt"))
    )


def q_b9_scd2_pit(spark, sf_dir):
    """SCD2 point-in-time join (B2 × B9, r7): every purchase event joined
    to the dimension VERSION that was valid at the event's own
    timestamp — the "what did we know then" read that makes a type-2
    history table useful (joining the CURRENT version back-dates
    attributes and corrupts any training label built from it). Status
    classifies the temporal edge cases: ``live`` (version open at ts),
    ``closed`` (the key was DELETEd before ts — the change feed closed
    its last version), ``none`` (no version existed yet). Range
    condition in the JOIN (left rows survive), latest-version pick via
    one per-event window with (valid_from, version_id) DESC total
    order — deterministic on both engines."""
    from pyspark.sql import Window

    ch = _events_changes(spark, sf_dir)
    key = F.get_json_object(F.coalesce("after", "before"), "$.user_id").cast(
        "bigint"
    )
    versions = derive.scd2(ch.withColumn("user_id", key), "user_id").select(
        F.col("user_id").alias("__vu"),
        F.col("id").alias("version_id"),
        "valid_from",
        "valid_to",
    )
    ev = (
        _t(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select("event_id", "user_id", "ts")
    )
    j = ev.join(
        versions,
        (ev["user_id"] == versions["__vu"])
        & (versions["valid_from"] <= ev["ts"]),
        "left",
    )
    w = Window.partitionBy("event_id").orderBy(
        F.col("valid_from").desc(), F.col("version_id").desc()
    )
    return (
        j.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(
            "event_id",
            "user_id",
            "ts",
            "version_id",
            F.when(F.col("version_id").isNull(), F.lit("none"))
            .when(
                F.col("valid_to").isNull() | (F.col("ts") < F.col("valid_to")),
                F.lit("live"),
            )
            .otherwise(F.lit("closed"))
            .alias("status"),
        )
    )


def q_b7_bloom_join(spark, sf_dir):
    """Portable Bloom-filter semi-join reduction (B7 join depth) — the
    explicit version of the runtime row-group pruning a 100 TB join
    relies on: a 512-byte bitmap over BUILDING-segment customers
    broadcasts and prunes orders BEFORE any shuffle; the audit compares
    bloom-kept vs exact-semi-join-kept rows per order status, so the
    driver row certifies both the bitmap math AND the false-positive
    count. All bit positions from the universal family over the
    portable md5 hash — engine-exact (derive.py: bloom_build /
    bloom_probe)."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    dim = cust.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    bloom = derive.bloom_build(dim, "c_custkey")
    kept = derive.bloom_probe(orders, bloom, "o_custkey")
    exact = orders.join(
        dim, orders["o_custkey"] == dim["c_custkey"], "left_semi"
    )
    b = kept.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_bloom")
    )
    x = exact.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_exact")
    )
    return (
        b.join(x, "o_orderstatus", "full")
        .select(
            "o_orderstatus",
            F.coalesce("n_bloom", F.lit(0)).alias("n_bloom"),
            F.coalesce("n_exact", F.lit(0)).alias("n_exact"),
            (F.coalesce("n_bloom", F.lit(0)) - F.coalesce("n_exact", F.lit(0))).alias(
                "n_false_pos"
            ),
        )
    )


def q_b7_bloom_incremental(spark, sf_dir):
    """CDC-incremental Bloom maintenance (B7 + B1 depth): the standing
    filter over pre-cutoff order keys absorbs the post-cutoff batch
    with one constant-cost bitmap merge; the oracle REBUILDS the
    filter over the union from scratch, so the driver row IS the
    merge-equals-rebuild invariant — same shape as the
    b1_incremental_agg MV row (derive.py: bloom_merge)."""
    orders = _t(spark, sf_dir, "orders")
    base = orders.filter(F.col("o_orderkey") % 10 != 0).select("o_orderkey")
    batch = orders.filter(F.col("o_orderkey") % 10 == 0).select("o_orderkey")
    merged = derive.bloom_merge(
        derive.bloom_build(base, "o_orderkey"),
        derive.bloom_build(batch, "o_orderkey"),
    )
    return merged


def q_b8_order_distribution(spark, sf_dir):
    """TPC-H Q13 shape (B8 outer-join depth): the customer order-count
    distribution — LEFT OUTER join (customers with zero orders must
    appear as count 0) under an anti-LIKE priority filter (the fixture has no o_comment), then a
    second aggregation over the first. The double-agg + outer-join
    topology is the classic optimizer stress Q13 exists for."""
    c = _t(spark, sf_dir, "customer").select("c_custkey")
    o = _t(spark, sf_dir, "orders").filter(
        ~F.col("o_orderpriority").like("1-%")
    ).select("o_custkey", "o_orderkey")
    per = (
        c.join(o, c["c_custkey"] == o["o_custkey"], "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .select("c_count", "custdist")
    )


def q_b7_returned_revenue(spark, sf_dir):
    """TPC-H Q10 shape (B7 depth, r8): revenue lost to returned items
    per customer — lineitem filtered to returnflag 'R' joins orders
    (date-windowed, predicate pushed to the scan) and the broadcast
    customer/nation dims; decimal-exact revenue; top-20 via
    distributed ``orderBy().limit`` then rank (the r8 top-k rule)."""
    from pyspark.sql import Window

    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1995-01-01")
        & (F.col("o_orderdate") < "1996-01-01")
    )
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    agg = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.round(
                F.sum(
                    F.col("l_extendedprice").cast("decimal(38,6)")
                    * (
                        F.lit(1).cast("decimal(38,6)")
                        - F.col("l_discount").cast("decimal(38,6)")
                    )
                ).cast("double"),
                2,
            ).alias("revenue")
        )
    )
    w = Window.orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
    return (
        agg.orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
        .withColumn("rank", F.row_number().over(w).cast("bigint"))
    )


def q_b9_asof_tolerance(spark, sf_dir):
    """Tolerance-bounded as-of join (B9 depth, r8) — the feature-store
    max-staleness rule: each order takes the user's latest event at or
    before the order date ONLY if it is at most 7 days old; staler
    matches enrich as NULL rather than silently serving ancient
    features (derive.asof_join(tolerance_seconds=604800)). The bound
    lives IN the join condition, which also caps the range-join
    fan-out to the tolerance window at scale."""
    ev = _t(spark, sf_dir, "events").select(
        F.col("user_id").alias("k"), "ts", "event_id", "value"
    )
    o = (
        _t(spark, sf_dir, "orders")
        .select(
            "o_orderkey",
            (F.col("o_custkey") % 100).alias("k"),
            F.col("o_orderdate").cast("timestamp").alias("odate"),
        )
        .filter(F.col("o_orderkey") % 29 == 0)
    )
    out = derive.asof_join(
        o, ev, ["k"], "odate", "ts", tolerance_seconds=7 * 86400
    )
    return out.select(
        F.col("l_o_orderkey").alias("o_orderkey"),
        F.col("l_k").alias("k"),
        F.col("r_event_id").cast("bigint").alias("event_id"),
        F.col("r_value").alias("value"),
    )


def q_b7_cust_order_dist(spark, sf_dir):
    """TPC-H Q13 shape (B7 depth, r9): distribution of per-customer
    order counts INCLUDING zero-order customers — the left outer join
    whose null-side counts are the point of the query. Two keyed aggs;
    the distribution relation is bounded by max orders/customer."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    per = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").cast("long").alias("c_count"))
    )
    return per.groupBy("c_count").agg(
        F.count(F.lit(1)).cast("long").alias("custdist")
    )


def q_b8_min_cost_supplier(spark, sf_dir):
    """TPC-H Q2 shape adapted to the fixture schema (B8 depth, r9 —
    no partsupp table ships, so unit cost derives from lineitem):
    per part, the supplier with the minimum observed unit price
    (extendedprice/quantity). ONE struct-min agg — min(struct(unit,
    suppkey)) is lexicographic, so the tie-break to the smallest
    suppkey is inside the same pass (no rank window, no self-join);
    the supplier dim broadcasts. IEEE division of identical doubles is
    bit-identical cross-engine, but round-6 of the quotient is NOT
    (prices over power-of-two quantities land exactly on the .5
    boundary, where Spark's decimal HALF_UP and DuckDB's binary round
    disagree — observed at sf0.1) — so the unit price is emitted
    floor-quantized to integer micros, the repo's standard recipe.
    The oracle replays the same two-phase min (min unit, then min
    suppkey at that unit)."""
    li = _t(spark, sf_dir, "lineitem")
    sup = _t(spark, sf_dir, "supplier")
    best = (
        li.select(
            "l_partkey",
            "l_suppkey",
            (F.col("l_extendedprice") / F.col("l_quantity")).alias("__unit"),
        )
        .groupBy("l_partkey")
        .agg(F.min(F.struct("__unit", "l_suppkey")).alias("__b"))
        .select(
            "l_partkey",
            F.col("__b.l_suppkey").alias("s_suppkey"),
            F.floor(F.col("__b.__unit") * 1000000)
            .cast("long")
            .alias("unit_micros"),
        )
    )
    return best.join(F.broadcast(sup), "s_suppkey").select(
        "l_partkey", "s_suppkey", "s_name", "unit_micros"
    )


def q_b8_important_parts(spark, sf_dir):
    """TPC-H Q11 shape adapted to the fixture schema (B8 depth, r9):
    parts whose discounted revenue exceeds 1.5× the MEAN per-part share
    — the HAVING-over-global-scalar pattern, with a scale-free
    threshold (a fixed fraction-of-total empties out as |parts| grows).
    Revenue sums in exact decimal, quantizes to integer cents, and the
    threshold compares cross-multiplied integers in DECIMAL(38,0)
    (2·cents·n_parts > 3·total — ulp-proof AND int64-overflow-proof at
    corpus scale); the 1-row total broadcasts."""
    li = _t(spark, sf_dir, "lineitem")
    rev = li.groupBy("l_partkey").agg(
        F.floor(
            F.sum(
                F.col("l_extendedprice").cast("decimal(38,6)")
                * (
                    F.lit(1).cast("decimal(38,6)")
                    - F.col("l_discount").cast("decimal(38,6)")
                )
            )
            * 100
        )
        .cast("long")
        .alias("revenue_cents")
    )
    total = rev.agg(
        F.sum("revenue_cents").cast("long").alias("__total"),
        F.count(F.lit(1)).cast("long").alias("__n_parts"),
    )
    return (
        rev.crossJoin(F.broadcast(total))
        .filter(
            F.col("revenue_cents").cast("decimal(19,0)")
            * F.col("__n_parts").cast("decimal(19,0)")
            * 2
            > F.col("__total").cast("decimal(19,0)") * 3
        )
        .select(
            "l_partkey",
            "revenue_cents",
            F.round(
                F.col("revenue_cents").cast("double")
                / F.col("__total").cast("double"),
                6,
            ).alias("share"),
        )
    )


def q_b7_volume_shipping(spark, sf_dir):
    """TPC-H Q7 shape (B7 depth, r9 wave 5): bilateral trade volume —
    revenue shipped between two specific nations per direction per
    year. The fact-fact join (lineitem x orders on orderkey) is the
    only shuffle; supplier/customer/nation dims broadcast, and the
    two-nation filter applies AFTER the dim joins resolve both
    nationalities (the selective pair predicate can't reach the scan,
    but the date window does). Decimal-exact revenue."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1995-01-01")
        & (F.col("l_shipdate") < "1997-01-01")
    )
    orders = _t(spark, sf_dir, "orders")
    supp = _t(spark, sf_dir, "supplier")
    cust = _t(spark, sf_dir, "customer")
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("__sk"), F.col("n_name").alias("supp_nation")
    )
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("__ck"), F.col("n_name").alias("cust_nation")
    )
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), supp.s_nationkey == F.col("__sk"))
        .join(F.broadcast(n2), cust.c_nationkey == F.col("__ck"))
        .filter(
            (
                (F.col("supp_nation") == "NATION_1")
                & (F.col("cust_nation") == "NATION_2")
            )
            | (
                (F.col("supp_nation") == "NATION_2")
                & (F.col("cust_nation") == "NATION_1")
            )
        )
    )
    return joined.groupBy(
        "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
    ).agg(
        F.round(
            F.sum(
                F.col("l_extendedprice").cast("decimal(38,6)")
                * (
                    F.lit(1).cast("decimal(38,6)")
                    - F.col("l_discount").cast("decimal(38,6)")
                )
            ).cast("double"),
            2,
        ).alias("revenue")
    )


def q_b7_market_share(spark, sf_dir):
    """TPC-H Q8 shape (B7 depth, r9 wave 5): NATION_3's share of PROMO
    part revenue sold to EUROPE customers, per order year. Numerator
    (CASE-summed) and denominator accumulate in the SAME decimal agg
    pass — exact integers until the one double division, whose result
    ships floor-quantized micros (floor of identical doubles is
    bit-identical; round-6 of a quotient is engine-divergent at the .5
    boundary — the b8_min_cost_supplier lesson)."""
    part = _t(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1995-01-01")
        & (F.col("o_orderdate") < "1997-01-01")
    )
    cust = _t(spark, sf_dir, "customer")
    cnat = _t(spark, sf_dir, "nation").filter(F.col("n_regionkey") == 3).select(
        F.col("n_nationkey").alias("__ck")
    )
    snat = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("__sk"), F.col("n_name").alias("supp_nation")
    )
    supp = _t(spark, sf_dir, "supplier")
    rev = (
        F.col("l_extendedprice").cast("decimal(38,6)")
        * (
            F.lit(1).cast("decimal(38,6)")
            - F.col("l_discount").cast("decimal(38,6)")
        )
    )
    joined = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(cnat), cust.c_nationkey == F.col("__ck"))
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(snat), supp.s_nationkey == F.col("__sk"))
    )
    agg = joined.groupBy(F.year("o_orderdate").alias("o_year")).agg(
        F.sum(
            F.when(F.col("supp_nation") == "NATION_3", rev).otherwise(
                F.lit(0).cast("decimal(38,6)")
            )
        ).alias("__nat"),
        F.sum(rev).alias("__tot"),
    )
    return agg.select(
        "o_year",
        F.round(F.col("__nat").cast("double"), 2).alias("nation_revenue"),
        F.round(F.col("__tot").cast("double"), 2).alias("total_revenue"),
        F.floor(
            F.col("__nat").cast("double") / F.col("__tot").cast("double")
            * F.lit(1e6)
        ).cast("long").alias("share_micros"),
    )


def q_b8_top_supplier(spark, sf_dir):
    """TPC-H Q15 shape (B8 depth, r9 wave 5): the supplier(s) with
    maximum revenue over 1996Q1, ties INCLUDED (the view-vs-max
    semantics Q15 is famous for). Revenue stays DECIMAL end-to-end so
    the max-equality join is exact — no float epsilon, no rank window;
    the 1-row max broadcasts back over the keyed agg."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1996-04-01")
    )
    supp = _t(spark, sf_dir, "supplier")
    rev = li.groupBy("l_suppkey").agg(
        F.sum(
            F.col("l_extendedprice").cast("decimal(38,6)")
            * (
                F.lit(1).cast("decimal(38,6)")
                - F.col("l_discount").cast("decimal(38,6)")
            )
        ).alias("__rev")
    )
    mx = rev.agg(F.max("__rev").alias("__mx"))
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("__rev") == F.col("__mx"))
        .join(F.broadcast(supp), F.col("l_suppkey") == supp.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            F.round(F.col("__rev").cast("double"), 2).alias("total_revenue"),
        )
    )


def q_b7_priority_lines(spark, sf_dir):
    """TPC-H Q12 shape (B7 depth, r9 wave 5; l_linestatus stands in for
    the shipmode column this schema lacks): per line status, how many
    1996-shipped lines belong to critical-priority orders vs not — the
    late-shipment priority audit. One fact-fact join (the date filter
    pushes to the lineitem scan), two conditional counts in one keyed
    agg pass, integer exact."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1997-01-01")
    )
    orders = _t(spark, sf_dir, "orders")
    crit = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(crit, 1).otherwise(0)).cast("long").alias(
                "high_line_count"
            ),
            F.sum(F.when(crit, 0).otherwise(1)).cast("long").alias(
                "low_line_count"
            ),
        )
    )


def q_b8_dominant_supplier(spark, sf_dir):
    """TPC-H Q20 shape (B8 depth, r9 wave 5; shipped share stands in for
    the partsupp availability this schema lacks): suppliers who shipped
    MORE THAN 2× THEIR FAIR SHARE of a 'small…' part's total volume —
    the single-source-risk screen, thresholded RELATIVE to the part's
    supplier count so the predicate stays meaningful as supplier fan-out
    grows with scale (an absolute 50% cut fires on no row past tiny
    SFs). Two keyed aggs over the SAME (partkey) shuffle key (the
    per-part total reuses the per-(part,supp) relation's partitioning),
    dominance decided on cross-multiplied integers
    (supp_qty·n_supp > 2·total_qty — no division), supplier dim
    broadcasts at the end."""
    part = _t(spark, sf_dir, "part").filter(F.col("p_name").like("small%"))
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    ps = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("supp_qty"))
    )
    pt = ps.groupBy("l_partkey").agg(
        F.sum("supp_qty").alias("total_qty"),
        F.count(F.lit(1)).cast("long").alias("n_supp"),
    )
    dom = ps.join(pt, "l_partkey").filter(
        F.col("supp_qty") * F.col("n_supp")
        > F.lit(2) * F.col("total_qty")
    )
    return (
        dom.groupBy("l_suppkey")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_dominated_parts"),
            F.sum("supp_qty").cast("long").alias("dominated_qty"),
        )
        .join(F.broadcast(supp), F.col("l_suppkey") == supp.s_suppkey)
        .select("s_suppkey", "s_name", "n_dominated_parts", "dominated_qty")
    )


def q_b9_nearest_event(spark, sf_dir):
    """Bidirectional nearest-event join (B9 depth, r10 —
    derive.nearest_join): each sampled order attaches the user's
    single closest event by |Δt| within ±3 days, looking BOTH ways —
    the sensor-alignment rule the backward-only as-of family can't
    express (b9_asof_tolerance is the backward half). Candidates from
    the (key, tolerance-bucket) equi-join with a 3-bucket probe
    explode — complete for |Δt| ≤ T, fan-out bounded by bucket
    density; exact integer micros end to end."""
    ev = _t(spark, sf_dir, "events").select(
        F.col("user_id").alias("k"), "ts", "event_id", "value"
    )
    # the fixture's order dates (1995-2001) don't overlap the event
    # stream (Jan 2024): derive a deterministic in-window probe time
    # from the keys instead — day = orderkey mod 30, hour = custkey
    # mod 24 (the join semantics are what's under test, not the dates)
    o = (
        _t(spark, sf_dir, "orders")
        .select(
            "o_orderkey",
            (F.col("o_custkey") % 100).alias("k"),
            (
                F.to_timestamp(F.lit("2024-01-01 00:00:00"))
                + F.make_dt_interval(
                    F.col("o_orderkey") % 30, F.col("o_custkey") % 24
                )
            ).alias("odate"),
        )
        .filter(F.col("o_orderkey") % 29 == 0)
    )
    out = derive.nearest_join(
        o, ev, ["k"], "o_orderkey", "odate", "event_id", "ts",
        tolerance_seconds=3 * 86400,
    )
    return out.select(
        "o_orderkey", "k", "r_event_id", "dt_us",
        F.round("r_value", 6).alias("nearest_value"),
    )


def q_b7_promo_share(spark, sf_dir):
    """TPC-H Q14 shape (B7 depth, r10): monthly promo-revenue share —
    the broadcast part-dim join feeding a conditional aggregate. The
    per-row discounted price is a double PRODUCT (identical on both
    engines), summed as exact DECIMAL(38,10) so the monthly totals
    can't drift with shuffle order; the share is one final double
    division, round 6."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_shipdate", "l_extendedprice", "l_discount"
    )
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))).cast(
        "decimal(38,10)"
    )
    j = li.join(
        F.broadcast(p), li["l_partkey"] == p["p_partkey"]
    ).select(
        F.date_trunc("month", "l_shipdate").cast("date").alias("month"),
        (F.col("p_type") == "PROMO").alias("__promo"),
        rev.alias("__rev"),
    )
    return j.groupBy("month").agg(
        F.round(
            F.lit(100.0)
            * F.sum(F.when(F.col("__promo"), F.col("__rev")).otherwise(
                F.lit(0).cast("decimal(38,10)")
            )).cast("double")
            / F.sum("__rev").cast("double"),
            6,
        ).alias("promo_share_pct"),
        F.count(F.lit(1)).cast("long").alias("n_lines"),
    )


def q_b8_supplier_part_counts(spark, sf_dir):
    """TPC-H Q16 shape (B8 depth, r10): distinct-supplier counts per
    (brand, type, size bucket) for everything EXCEPT one brand — the
    assortment-breadth read. Supplier↔part pairs come from lineitem
    (the fixture has no partsupp); the pair relation is distinct-ed
    BEFORE the dimension join so the count-distinct agg sees minimal
    rows, and the part dim broadcasts."""
    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    p = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_brand") != "Brand#4")
        .select(
            "p_partkey", "p_brand", "p_type",
            F.expr("p_size div 10").cast("int").alias("size_bucket"),
        )
    )
    pairs = li.distinct()
    return (
        pairs.join(F.broadcast(p), pairs["l_partkey"] == p["p_partkey"])
        .groupBy("p_brand", "p_type", "size_bucket")
        .agg(F.count_distinct("l_suppkey").cast("long").alias("supplier_cnt"))
    )


def q_b7_join_size_estimate(spark, sf_dir):
    """Join-cardinality estimator audit (B7 depth, r11 — the
    optimizer-statistics read behind b7_skew_diagnosis's remedy): per
    customer-key bucket (custkey div 512), the equi-join output size a
    HISTOGRAM-based optimizer would ESTIMATE under the uniformity
    assumption (Σc_a · Σc_b / d, d = distinct keys in the bucket) vs
    the ACTUAL Σ(c_a·c_b) — the underestimation ratio is exactly the
    skew an AQE re-plan or a salted join exists to absorb, surfaced
    per key range BEFORE the join runs. Pure keyed aggs over the two
    key-count relations; estimate = one division, actual = exact
    integer sum."""
    orders = _t(spark, sf_dir, "orders").select("o_custkey")
    li = (
        _t(spark, sf_dir, "lineitem")
        .join(
            _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .select(F.col("o_custkey").alias("l_custkey"))
    )
    ca = orders.groupBy("o_custkey").agg(
        F.count(F.lit(1)).cast("long").alias("__ca")
    )
    cb = li.groupBy("l_custkey").agg(
        F.count(F.lit(1)).cast("long").alias("__cb")
    )
    j = ca.join(
        cb, F.col("o_custkey") == F.col("l_custkey")
    ).select(
        F.expr("o_custkey div 512").alias("bucket"),
        "__ca",
        "__cb",
    )
    agg = j.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.sum("__ca").cast("long").alias("sum_a"),
        F.sum("__cb").cast("long").alias("sum_b"),
        F.sum(F.col("__ca") * F.col("__cb")).cast("long").alias("actual"),
    )
    est = F.round(
        (F.col("sum_a") * F.col("sum_b")).cast("double") / F.col("n_keys"),
        6,
    )
    return agg.select(
        "bucket",
        "n_keys",
        "actual",
        est.alias("estimate"),
        F.round(
            F.col("actual").cast("double")
            / ((F.col("sum_a") * F.col("sum_b")).cast("double")
               / F.col("n_keys")),
            6,
        ).alias("skew_ratio"),
    )


def q_b7_semijoin_program(spark, sf_dir):
    """Yannakakis full-reducer audit (B7 depth, r12): before shuffling
    a large acyclic multi-join, run the classic two-pass semi-join
    program — forward down the chain region→nation→customer→orders→
    lineitem (predicates at both ends: region = ASIA, lineitem shipped
    in a 1995 window), then backward — and report, per relation, the
    base cardinality vs the fully-reduced cardinality. At 100 TB this
    is the decision table for semi-join/Bloom pre-reduction: a relation
    whose reduced count is a small fraction of base should be pruned
    BEFORE the shuffle join (the b7_bloom_join kernel is the executed
    form; THIS row sizes the opportunity). Shape: a chain of keyed
    left-semi joins (each one equi-shuffle or broadcast — Catalyst
    picks broadcast for the dim ends), five 1-row count aggs unioned;
    no row images ever move, only keys. The four audit branches share
    the chain's subplans (AQE reuses identical exchanges); they are
    deliberately NOT checkpointed — the relations are key-only but
    corpus-sized, so re-deriving a semi-join is cheaper at scale than
    materializing order-key sets. Reductions are exact integers;
    the pct is a round-6 rational.

    Reference parity: the reference has no query planner — this is the
    Spark-first scale surface built on the same snapshot tables
    (readme.md:21-38)."""
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    lf = li.filter(
        (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1995-07-01").cast("timestamp"))
    )
    # forward pass (root predicate flows down the chain)
    n1 = n.join(r, n["n_regionkey"] == r["r_regionkey"], "semi")
    c1 = c.join(n1, c["c_nationkey"] == n1["n_nationkey"], "semi")
    o1 = o.join(c1, o["o_custkey"] == c1["c_custkey"], "semi")
    l1 = lf.join(o1, lf["l_orderkey"] == o1["o_orderkey"], "semi")
    # backward pass (leaf predicate flows back up)
    o2 = o1.join(l1, o1["o_orderkey"] == l1["l_orderkey"], "semi")
    c2 = c1.join(o2, c1["c_custkey"] == o2["o_custkey"], "semi")
    n2 = n1.join(c2, n1["n_nationkey"] == c2["c_nationkey"], "semi")

    def row(name, base, reduced):
        b = base.agg(F.count(F.lit(1)).cast("long").alias("rows_base"))
        x = reduced.agg(
            F.count(F.lit(1)).cast("long").alias("rows_reduced")
        )
        return b.crossJoin(F.broadcast(x)).select(
            F.lit(name).alias("relation"),
            "rows_base",
            "rows_reduced",
            F.round(
                F.lit(1.0)
                - F.col("rows_reduced").cast("double")
                / F.col("rows_base"),
                6,
            ).alias("reduction_pct"),
        )

    out = row("nation", n, n2)
    for nm, base, red in (
        ("customer", c, c2),
        ("orders", o, o2),
        ("lineitem", li, l1),
    ):
        out = out.unionByName(row(nm, base, red))
    return out
