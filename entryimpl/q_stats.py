"""Registry query functions — stats family (split from
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


def q_b11_reconstruct_befores(spark, sf_dir):
    """Before-image reconstruction via lag (B11's CDC use-case): the
    events log only carries key-only befores; rebuild full ones from the
    predecessor's after-image per user."""
    ch = _events_changes(spark, sf_dir)
    key = F.get_json_object(F.coalesce("after", "before"), "$.user_id")
    rebuilt = derive.reconstruct_befores(
        ch.withColumn("__k", key).drop("before").withColumn(
            "before", F.lit(None).cast("string")
        ),
        "__k",
    )
    return rebuilt.select(
        "id",
        F.col("__k").cast("bigint").alias("user_id"),
        "operation",
        "before",
        "after",
    )


def q_b10_agg_pricing(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    dec = lambda c: F.col(c).cast("decimal(38,6)")  # noqa: E731
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(dec("l_quantity")).cast("double").alias("sum_qty"),
            # money sums: exact decimal aggregation, then round AFTER the
            # double cast — at 17 significant digits the decimal→double
            # conversion can differ by 1 ulp between engines
            F.round(F.sum(dec("l_extendedprice")).cast("double"), 2).alias("sum_base_price"),
            # DECIMAL(18,4) products stay exact decimal in BOTH engines
            # ((18,4)×(18,4)→(37,8) fits width 38; (38,6)×(38,6) would
            # overflow DuckDB's decimal and silently fall back to double)
            F.round(
                F.sum(
                    F.col("l_extendedprice").cast("decimal(18,4)")
                    * (F.lit(1).cast("decimal(18,4)") - F.col("l_discount").cast("decimal(18,4)"))
                ).cast("double"),
                2,
            ).alias("sum_disc_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def q_b10_rollup(spark, sf_dir):
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(
                F.sum(F.col("o_totalprice").cast("decimal(38,6)")).cast("double"), 2
            ).alias("total"),
            F.grouping("o_orderstatus").cast("bigint").alias("g_status"),
            F.grouping("o_orderpriority").cast("bigint").alias("g_prio"),
        )
    )


def q_b11_window_funcs(spark, sf_dir):
    from pyspark.sql import Window

    li = _t(spark, sf_dir, "lineitem")
    # full rows are unique; order on every remaining column so the window
    # order is total (the "PK" (l_orderkey, l_linenumber) has duplicates)
    order_cols = [
        F.col(c)
        for c in li.columns
        if c != "l_orderkey"
    ]
    w = Window.partitionBy("l_orderkey").orderBy(*order_cols)
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        "l_partkey",
        "l_suppkey",
        F.row_number().over(w).cast("bigint").alias("rn"),
        F.lag("l_extendedprice").over(w).alias("prev_price"),
        F.lead("l_extendedprice").over(w).alias("next_price"),
        F.sum(F.col("l_quantity").cast("decimal(38,6)")).over(wsum).cast("double").alias("run_qty"),
    )


def q_b12_topk(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    top = derive.topk_per_group(
        li,
        ["l_returnflag"],
        [
            F.col("l_extendedprice").desc(),
            F.col("l_orderkey").asc(),
            F.col("l_partkey").asc(),
            F.col("l_suppkey").asc(),
            F.col("l_linenumber").asc(),
            F.col("l_quantity").asc(),
        ],
        5,
    )
    return top.select(
        "l_returnflag",
        F.col("rnk").cast("bigint").alias("rnk"),
        "l_orderkey",
        "l_linenumber",
        "l_extendedprice",
    )


def q_b10_percentiles(spark, sf_dir):
    """Exact continuous percentiles per group (B10 depth) — bit-identical
    interpolation in Spark `percentile` and DuckDB `quantile_cont`."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.percentile("l_extendedprice", 0.5).alias("p50"),
        F.percentile("l_extendedprice", 0.9).alias("p90"),
        F.min("l_extendedprice").alias("pmin"),
        F.max("l_extendedprice").alias("pmax"),
    )


def q_b10_cube(spark, sf_dir):
    orders = _t(spark, sf_dir, "orders")
    return orders.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.grouping("o_orderstatus").cast("bigint").alias("g_status"),
        F.grouping("o_orderpriority").cast("bigint").alias("g_prio"),
    )


def q_b11_ranks(spark, sf_dir):
    from pyspark.sql import Window

    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    wr = Window.partitionBy("o_orderstatus").orderBy(
        F.floor(F.col("o_totalprice") / 100000).desc()
    )
    return o.select(
        "o_orderkey",
        "o_orderstatus",
        F.row_number().over(w).cast("bigint").alias("rn"),
        F.rank().over(wr).cast("bigint").alias("rnk_bucket"),
        F.dense_rank().over(wr).cast("bigint").alias("drnk_bucket"),
        F.ntile(4).over(w).cast("bigint").alias("quartile"),
    ).filter(F.col("rn") <= 200)


def q_b10_grouping_sets(spark, sf_dir):
    orders = _t(spark, sf_dir, "orders")
    return orders.groupingSets(
        [["o_orderstatus"], ["o_orderpriority"], []],
        "o_orderstatus",
        "o_orderpriority",
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.grouping("o_orderstatus").cast("bigint").alias("g_status"),
        F.grouping("o_orderpriority").cast("bigint").alias("g_prio"),
    )


def q_b10_pivot(spark, sf_dir):
    """Pivot (B10 depth): order counts + revenue per priority × status.
    Pivot values are EXPLICIT — at scale the values-less form runs an extra
    distinct job over the fact table just to learn the column set."""
    o = _t(spark, sf_dir, "orders")
    piv = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(
                F.sum(F.col("o_totalprice").cast("decimal(38,6)")).cast("double"), 2
            ).alias("total"),
        )
    )
    out = piv.select(
        "o_orderpriority",
        *[
            F.coalesce(F.col(f"{s}_n"), F.lit(0)).cast("bigint").alias(f"n_{s.lower()}")
            for s in ("F", "O", "P")
        ],
        *[
            F.coalesce(F.col(f"{s}_total"), F.lit(0.0)).alias(f"total_{s.lower()}")
            for s in ("F", "O", "P")
        ],
    )
    return out


def q_b10_unpivot(spark, sf_dir):
    """Unpivot/melt (B10 depth): wide part measures to long (measure, value)
    rows — `df.unpivot`, the inverse of pivot, a pure narrow map (no
    shuffle; each input row yields one output row per measure)."""
    p = _t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.col("p_size").cast("double").alias("p_size"),
        F.col("p_retailprice").cast("double").alias("p_retailprice"),
    ).unpivot("p_partkey", ["p_size", "p_retailprice"], "measure", "value")


def q_b10_filtered_agg(spark, sf_dir):
    """FILTER-clause conditional aggregation parity (B10 depth): one
    pass computing overall and predicate-scoped aggregates side by side
    (counts, sums, averages of returned vs kept lines) — the idiom that
    replaces N self-joins with conditional expressions inside a single
    partial+final hash agg."""
    li = _t(spark, sf_dir, "lineitem")
    returned = F.col("l_returnflag") == "R"
    return li.groupBy("l_linestatus").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_all"),
        F.sum(F.when(returned, 1).otherwise(0)).cast("bigint").alias("n_returned"),
        F.round(
            F.sum(
                F.when(returned, F.col("l_extendedprice").cast("decimal(38,6)"))
            ).cast("double"),
            2,
        ).alias("returned_revenue"),
        F.round(
            F.avg(F.when(returned, F.col("l_quantity").cast("double"))), 6
        ).alias("avg_returned_qty"),
    )


def q_b10_price_histogram(spark, sf_dir):
    """Equal-width numeric histogram (B10 depth): 20 bins over
    l_extendedprice with exact integer bin assignment — min/max arrive as
    a broadcast 1-row agg, the binning is a narrow map, one keyed count.
    The numeric companion to the doc-length histogram."""
    li = _t(spark, sf_dir, "lineitem")
    bounds = li.agg(
        F.min("l_extendedprice").cast("double").alias("__lo"),
        F.max("l_extendedprice").cast("double").alias("__hi"),
    )
    return (
        li.crossJoin(F.broadcast(bounds))
        .select(
            F.least(
                F.lit(19),
                F.floor(
                    (F.col("l_extendedprice").cast("double") - F.col("__lo"))
                    / ((F.col("__hi") - F.col("__lo")) / F.lit(20.0))
                ),
            )
            .cast("bigint")
            .alias("bin"),
        )
        .groupBy("bin")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )


def q_b10_share_of_total(spark, sf_dir):
    """Ratio-to-report (B10 depth): each nation's share of global revenue
    — a grouped agg plus an unpartitioned window over the tiny aggregate
    relation (|nations| rows), never over the fact table."""
    from pyspark.sql import Window

    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    rev = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.sum(F.col("l_extendedprice").cast("decimal(38,6)")).alias("__rev")
        )
    )
    w = Window.partitionBy()
    # divide as doubles, not decimals: decimal-division result scales
    # differ between engines; the double quotient is IEEE-identical
    return rev.select(
        "n_name",
        F.round(F.col("__rev").cast("double"), 2).alias("revenue"),
        F.round(
            F.col("__rev").cast("double")
            / F.sum("__rev").over(w).cast("double"),
            6,
        ).alias("share"),
    )


def q_b10_max_by(spark, sf_dir):
    """max_by/min_by parity (B10 depth): per return flag, the order key
    holding the highest/lowest extended price — single-pass conditional
    extrema, no self-join, no window (ties broken INSIDE the aggregate by
    taking the max/min orderkey among tied prices via struct ordering)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.max(F.struct(F.col("l_extendedprice"), F.col("l_orderkey")))[
            "l_orderkey"
        ].cast("bigint").alias("top_order"),
        F.min(F.struct(F.col("l_extendedprice"), F.col("l_orderkey")))[
            "l_orderkey"
        ].cast("bigint").alias("bottom_order"),
        F.max("l_extendedprice").alias("top_price"),
        F.min("l_extendedprice").alias("bottom_price"),
    )


def q_b11_range_frame(spark, sf_dir):
    """Time-RANGE window frame (B11 depth): per event, the count and
    value-sum of the same user's events in the PRECEDING 30 minutes —
    a true range frame over event time (rows frames can't express it
    when event spacing varies). Ordered by epoch seconds with
    rangeBetween(-1800, 0); sums in decimal for order-independent
    exactness; one shuffle on user_id."""
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events")
    sec = F.unix_timestamp(F.col("ts").cast("timestamp")).alias("__sec")
    base = ev.select("event_id", "user_id", "ts", "value", sec)
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("__sec").asc())
        .rangeBetween(-1800, 0)
    )
    return base.select(
        "event_id",
        "user_id",
        F.count(F.lit(1)).over(w).cast("bigint").alias("n_30m"),
        F.round(
            F.sum(F.col("value").cast("decimal(38,6)")).over(w).cast("double"),
            6,
        ).alias("sum_30m"),
    )


def q_b11_value_funcs(spark, sf_dir):
    """Window value functions (B11 depth): first/last/nth price per order
    over an explicit frame (last_value needs the full-partition frame or
    it degenerates to the running last)."""
    from pyspark.sql import Window

    li = _t(spark, sf_dir, "lineitem")
    order_cols = [F.col(c) for c in li.columns if c != "l_orderkey"]
    w = Window.partitionBy("l_orderkey").orderBy(*order_cols)
    wfull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        "l_partkey",
        "l_suppkey",
        "l_quantity",
        F.first("l_extendedprice").over(wfull).alias("first_price"),
        F.last("l_extendedprice").over(wfull).alias("last_price"),
        F.nth_value("l_extendedprice", 2).over(wfull).alias("second_price"),
    )


def q_b10_stats_agg(spark, sf_dir):
    """Statistical aggregates (B10 depth) computed from EXACT decimal power
    sums (n, Σx, Σx², Σy, Σy², Σxy) — the map-side-combinable form — then
    derived in double with expressions mirrored verbatim in the oracle.
    Built-in stddev/corr stream doubles in shuffle order (run- and
    engine-varying last ulp); power sums are order-independent, so this is
    bit-exact at any parallelism."""
    li = _t(spark, sf_dir, "lineitem")
    dec4 = lambda c: F.col(c).cast("decimal(18,4)")  # noqa: E731
    sums = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(dec4("l_quantity")).cast("double").alias("sx"),
        F.sum(dec4("l_quantity") * dec4("l_quantity")).cast("double").alias("sxx"),
        F.sum(dec4("l_extendedprice")).cast("double").alias("sy"),
        F.sum(dec4("l_extendedprice") * dec4("l_extendedprice")).cast("double").alias("syy"),
        F.sum(dec4("l_quantity") * dec4("l_extendedprice")).cast("double").alias("sxy"),
    )
    n, sx, sxx = F.col("n"), F.col("sx"), F.col("sxx")
    sy, syy, sxy = F.col("sy"), F.col("syy"), F.col("sxy")
    return sums.select(
        "l_returnflag",
        F.col("n").cast("bigint").alias("n_rows"),
        F.round(F.sqrt((sxx - sx * sx / n) / (n - 1)), 6).alias("sd_qty"),
        F.round(F.sqrt((syy - sy * sy / n) / (n - 1)), 6).alias("sd_price"),
        F.round(
            (n * sxy - sx * sy)
            / (F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy)),
            6,
        ).alias("corr_qty_price"),
    )


def q_b10_bool_agg(spark, sf_dir):
    """Boolean aggregate battery (B10 depth): any/every/count_if per
    group — the data-quality assertion shapes (`every(price > 0)`)."""
    o = _t(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.count_if(F.col("o_totalprice") > 200000).alias("n_big"),
        F.every(F.col("o_totalprice") > 0).alias("all_positive"),
        F.bool_or(F.col("o_orderpriority") == "1-URGENT").alias("any_urgent"),
        F.count(F.lit(1)).alias("n"),
    )


def q_b11_ntile(spark, sf_dir):
    """ntile quartiles per status (B11 depth): equi-depth bucketing over a
    total order — the percentile-bin assignment a feature pipeline uses."""
    from pyspark.sql import Window

    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy(
        F.col("o_totalprice").asc(), F.col("o_orderkey").asc()
    )
    return o.select(
        "o_orderkey",
        "o_orderstatus",
        F.ntile(4).over(w).cast("bigint").alias("price_quartile"),
    )


def q_b10_median_mode(spark, sf_dir):
    """Median + deterministic mode per group (B10 depth). Spark's mode()
    breaks ties arbitrarily, so the mode is DERIVED (max count, then min
    value) — identical tie-breaking on both engines; median over decimal
    cast to double after the exact midpoint average."""
    from pyspark.sql import Window

    li = _t(spark, sf_dir, "lineitem")
    counts = li.groupBy("l_returnflag", "l_quantity").agg(
        F.count(F.lit(1)).alias("n")
    )
    w = Window.partitionBy("l_returnflag").orderBy(
        F.col("n").desc(), F.col("l_quantity").asc()
    )
    mode = (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "l_returnflag", F.col("l_quantity").alias("mode_qty"), F.col("n").alias("mode_n")
        )
    )
    med = li.groupBy("l_returnflag").agg(
        F.median(F.col("l_quantity").cast("double")).alias("median_qty"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    return med.join(mode, "l_returnflag").select(
        "l_returnflag", "median_qty", "mode_qty", "mode_n", "n_rows"
    )


def q_b10_large_orders(spark, sf_dir):
    """TPC-H Q18 shape (B10/B25 depth): orders whose total quantity
    exceeds a threshold — aggregate-HAVING pushed as a pre-join filter on
    the fact side, then an equi-join back for order attributes. Decimal
    sums for order-independent exactness."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    big = (
        li.groupBy("l_orderkey")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(38,6)")).alias("__q")
        )
        .filter(F.col("__q") > 300)
    )
    return (
        orders.join(big, orders.o_orderkey == big.l_orderkey)
        .select(
            "o_orderkey",
            "o_custkey",
            F.col("o_orderdate").cast("date").alias("o_orderdate"),
            F.col("__q").cast("double").alias("total_qty"),
        )
    )


def q_b10_profit_by_nation_year(spark, sf_dir):
    """TPC-H Q9 shape (B10 depth, r7): part-filtered profit rollup by
    supplier nation × order year — the deepest star join in the b10
    family (lineitem⋈orders big-big; part/supplier/nation broadcast;
    the part filter prunes BEFORE the join via the broadcast side).
    Decimal sums; year from o_orderdate."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    p = _t(spark, sf_dir, "part").filter(F.col("p_type").startswith("ECONOMY"))
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    dec4 = lambda col: F.col(col).cast("decimal(18,4)")  # noqa: E731
    joined = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
    )
    return (
        joined.groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg(
            F.round(
                F.sum(
                    dec4("l_extendedprice")
                    * (F.lit(1).cast("decimal(18,4)") - dec4("l_discount"))
                ).cast("double"),
                2,
            ).alias("profit"),
            F.count(F.lit(1)).cast("long").alias("n_items"),
        )
    )


def q_b10_promo_share(spark, sf_dir):
    """TPC-H Q14 shape (B10 depth, r7): promo revenue share — a single-
    row conditional-aggregate ratio over a broadcast part join; the
    numerator is a CASE inside the same sum pass (one scan, map-side
    combinable), never a second join or scan. Decimal sums; the final
    ratio is the only double, rounded 6."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    dec4 = lambda col: F.col(col).cast("decimal(18,4)")  # noqa: E731
    rev = dec4("l_extendedprice") * (
        F.lit(1).cast("decimal(18,4)") - dec4("l_discount")
    )
    joined = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    return joined.agg(
        F.round(
            (
                F.lit(100).cast("decimal(18,4)")
                * F.sum(
                    F.when(
                        F.col("p_type").startswith("PROMO"), rev
                    ).otherwise(F.lit(0).cast("decimal(18,4)"))
                )
            ).cast("double")
            / F.sum(rev).cast("double"),
            6,
        ).alias("promo_share"),
        F.count(F.lit(1)).cast("long").alias("n_items"),
    )


def q_b10_column_profile(spark, sf_dir):
    """One-pass column profiler (A1/B10 depth): per-column rows, nulls,
    exact distinct, typed min/max over orders — the audit run before
    trusting a new data drop. Single global agg (multi-distinct expand =
    #columns amplification, the exactness price; approx HLL mode is the
    100 TB default) pivoted to rows driver-free (meta.py:
    profile_table)."""
    return meta.profile_table(_t(spark, sf_dir, "orders"))


def q_b10_groupwise_ols(spark, sf_dir):
    """Per-group OLS regression (B10 depth): price-vs-quantity slope,
    intercept and r² per returnflag — thousands of independent fits in
    one aggregation pass from quantized-integer power sums (exact,
    order-independent on any engine); only the final closed-form ratio
    is IEEE double, rounded at 6 (derive.py: groupwise_ols)."""
    li = _t(spark, sf_dir, "lineitem")
    return derive.groupwise_ols(
        li, ["l_returnflag"], "l_quantity", "l_extendedprice", quantize=100
    )


def q_b11_lag_features(spark, sf_dir):
    """Windowed feature engineering (B11 depth, r7): the lag/rolling
    block every per-entity training table starts with — previous two
    purchase values and the trailing 3-event mean per user, in one
    window pass (all four features share a single (user, time) sort).
    Values quantized to integer cents BEFORE any arithmetic; the
    rolling mean divides two integers, rounded 6."""
    from pyspark.sql import Window

    ev = (
        _t(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select(
            "event_id",
            "user_id",
            "ts",
            F.floor(F.col("value") * 100).cast("long").alias("__cents"),
        )
    )
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    roll = w.rowsBetween(-2, 0)
    return ev.select(
        "event_id",
        "user_id",
        "__cents",
        F.lag("__cents", 1).over(w).alias("lag1_cents"),
        F.lag("__cents", 2).over(w).alias("lag2_cents"),
        F.round(
            F.sum("__cents").over(roll)
            / (F.count(F.lit(1)).over(roll) * F.lit(100.0)),
            6,
        ).alias("rolling3_mean"),
    ).withColumnRenamed("__cents", "cents")


def q_b10_mad_outliers(spark, sf_dir):
    """Robust per-group outlier detection (B10 depth, r7): median +
    median-absolute-deviation per return flag, then the count of prices
    outside ``median ± 3 · 1.4826 · MAD`` — the screen that survives
    the heavy tails that break z-scores (the mean/stddev version flags
    nothing OR everything on skewed price data). Two keyed exact-median
    aggs (partial+final, never a global sort) with the |groups|-row
    median table broadcast back between them; medians/MAD rounded 6
    (both engines average the two middle doubles identically)."""
    li = _t(spark, sf_dir, "lineitem").select("l_returnflag", "l_extendedprice")
    med = li.groupBy("l_returnflag").agg(
        F.median("l_extendedprice").alias("__med")
    )
    dev = li.join(F.broadcast(med), "l_returnflag").select(
        "l_returnflag",
        "l_extendedprice",
        "__med",
        F.abs(F.col("l_extendedprice") - F.col("__med")).alias("__ad"),
    )
    mad = dev.groupBy("l_returnflag").agg(
        F.median("__ad").alias("__mad"),
    )
    return (
        dev.join(F.broadcast(mad), "l_returnflag")
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.round(F.min("__med"), 6).alias("med_price"),
            F.round(F.min("__mad"), 6).alias("mad"),
            F.sum(
                F.when(
                    F.col("__ad") > F.lit(3 * 1.4826) * F.col("__mad"), 1
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_outliers"),
        )
    )


def q_b11_ewma(spark, sf_dir):
    """Trailing EWMA per user over the event stream (B11 window
    depth): the α=1/2 recurrence in its bounded-memory 8-term form —
    power-of-two weights make the statistic a ratio of two integer
    window sums, one pure-codegen window pass, engine-exact (derive.py:
    trailing_ewma)."""
    ev = _t(spark, sf_dir, "events")
    return derive.trailing_ewma(
        ev, "user_id", ["ts", "event_id"], "value"
    ).select("user_id", "event_id", "ewma")


def q_b12_zorder(spark, sf_dir):
    """Z-order layout audit (B12 sort/layout depth): Morton-interleave
    (o_totalprice, o_orderdate-as-days), bucket by the top 8 z-bits,
    and report each bucket's row count + price/date envelopes — the
    read that demonstrates multidimensional locality (every bucket
    covers a tight rectangle in BOTH columns, which is what makes
    min/max file stats prunable after a ZORDER rewrite). Interleave is
    pure integer codegen; envelopes exact (derive.py: zorder_key)."""
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_totalprice",
        F.datediff(F.col("o_orderdate"), F.lit("1992-01-01").cast("date")).alias(
            "o_days"
        ),
    )
    zed = derive.zorder_key(orders, "o_totalprice", "o_days")
    return (
        zed.groupBy(F.expr("shiftright(zorder, 24)").alias("zbucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min(F.col("o_totalprice").cast("double")), 2).alias("min_price"),
            F.round(F.max(F.col("o_totalprice").cast("double")), 2).alias("max_price"),
            F.min("o_days").alias("min_days"),
            F.max("o_days").alias("max_days"),
        )
    )


def q_b10_woe_iv(spark, sf_dir):
    """Weight-of-Evidence / Information-Value feature screening (B10
    feature-engineering depth): how well o_totalprice separates
    fulfilled orders, by exact rank-edge deciles — Laplace-smoothed
    shares, ln rounded 6, IV total as an order-independent 1e-8
    integer sum (same engine-exactness rules as b3_psi) (derive.py:
    woe_iv)."""
    orders = _t(spark, sf_dir, "orders")
    return derive.woe_iv(
        orders, "o_totalprice", F.col("o_orderstatus") == "F"
    )


def q_b10_bootstrap(spark, sf_dir):
    """One-pass Poisson bootstrap CI for the mean order price (B10
    statistical depth): every order draws a deterministic Poisson(1)
    weight per replicate (portable md5 uniform → integer inverse-CDF
    thresholds), 32 replicate means from integer weighted sums, CI =
    rank-based 2nd-smallest/2nd-largest. The only bootstrap that works
    at 100 TB — one scan, no resampling passes (sampling.py:
    poisson_bootstrap)."""
    orders = _t(spark, sf_dir, "orders")
    return sampling.poisson_bootstrap(orders, "o_orderkey", "o_totalprice")


def q_b10_small_quantity_revenue(spark, sf_dir):
    """TPC-H Q17 shape (B10 correlated-aggregate depth): revenue lost
    to small orders — lineitems under 20% of their part's average
    quantity, for one brand/type slice (fixture part has p_type, not p_container). The per-part avg is a
    keyed agg joined back (Catalyst's decorrelation of the textbook
    correlated subquery); sums in exact decimal, final /7 in double."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") == "Brand#3") & (F.col("p_type") == "MEDIUM")
    ).select("p_partkey")
    avgq = li.groupBy(F.col("l_partkey").alias("__pk")).agg(
        F.avg(F.col("l_quantity").cast("double")).alias("__avgq")
    )
    sel = (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .join(avgq, li["l_partkey"] == F.col("__pk"))
        .filter(
            F.col("l_quantity").cast("double") < F.lit(0.2) * F.col("__avgq")
        )
    )
    return sel.agg(
        F.count(F.lit(1)).alias("n_lineitems"),
        F.round(
            (
                F.sum(F.col("l_extendedprice").cast("decimal(38,6)")).cast(
                    "double"
                )
                / F.lit(7.0)
            ),
            2,
        ).alias("avg_yearly"),
    )


def q_b11_twap(spark, sf_dir):
    """Time-weighted average value per user (B11/B15 depth, r8) — the
    TWAP every ops/finance pipeline needs where plain averages
    overweight bursts: each event's value (exact integer cents) holds
    until the next event, weights are integer second gaps from one
    keyed lead window, and the division to a double happens once at
    the end (round 6). Users whose events all share one second report
    NULL (no holding interval). One shuffle on user_id."""
    from pyspark.sql import Window as _W

    ev = _t(spark, sf_dir, "events").select("event_id", "user_id", "ts", "value")
    sec = F.unix_timestamp(F.col("ts").cast("timestamp"))
    w = _W.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    staged = ev.select(
        "user_id",
        F.floor(F.col("value") * 100).cast("long").alias("__cents"),
        sec.alias("__sec"),
        F.lead(sec).over(w).alias("__next"),
    ).withColumn("__w", F.col("__next") - F.col("__sec"))
    return staged.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum("__w").cast("long").alias("held_seconds"),
        F.round(
            F.when(
                F.sum("__w") > 0,
                F.sum(F.col("__cents") * F.col("__w"))
                / (F.sum("__w") * F.lit(100.0)),
            ),
            6,
        ).alias("twap"),
    )


def q_b11_cumulative_distinct(spark, sf_dir):
    """Running distinct-user curve (B11/B15 depth, r8): distinct users
    ever seen, after each day — the growth curve behind DAU/MAU and
    vocabulary-style saturation questions. NO iteration and NO
    distinct-per-prefix blowup: each user's FIRST-seen day is one
    min-agg, new-user counts per day one more, and the cumulative sum
    runs over the bounded |days| relation (the heaps-curve shape)."""
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events")
    day = F.expr(
        "cast(floor(unix_timestamp(cast(ts as timestamp))) as bigint)"
        " div 86400"
    )
    first = ev.select("user_id", day.alias("__d")).groupBy("user_id").agg(
        F.min("__d").alias("first_day")
    )
    per_day = first.groupBy("first_day").agg(
        F.count(F.lit(1)).cast("long").alias("new_users")
    )
    w = Window.orderBy("first_day").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return per_day.select(
        F.col("first_day").alias("day"),
        "new_users",
        F.sum("new_users").over(w).cast("long").alias("cum_users"),
    )


def q_b10_gini(spark, sf_dir):
    """Gini coefficient of customer revenue concentration (B10 depth,
    r9): Σ(2r−n−1)·x_r / (n·Σx) with r the ascending revenue rank.
    Integer cents end-to-end; ranks come from the two-phase
    ``distributed_row_number`` (no single-task global sort); the
    weighted sum accumulates in DECIMAL(38,0) so the n·Σ term can't
    overflow int64 at corpus scale. One row out."""
    orders = _t(spark, sf_dir, "orders")
    per = orders.groupBy(F.col("o_custkey")).agg(
        F.sum(F.floor(F.col("o_totalprice") * 100).cast("long"))
        .cast("long")
        .alias("cents")
    )
    ranked = derive.distributed_row_number(
        per, [], [F.col("cents").asc(), F.col("o_custkey").asc()], out_col="rn"
    )
    totals = ranked.agg(
        F.count(F.lit(1)).cast("long").alias("n_customers"),
        F.sum("cents").cast("long").alias("total_cents"),
    )
    num = (
        ranked.crossJoin(F.broadcast(totals))
        .select(
            "n_customers",
            "total_cents",
            (
                (2 * F.col("rn") - F.col("n_customers") - 1).cast(
                    "decimal(19,0)"
                )
                * F.col("cents").cast("decimal(19,0)")
            ).alias("__w"),
        )
        .groupBy("n_customers", "total_cents")
        .agg(F.sum("__w").alias("__num"))
    )
    return num.select(
        "n_customers",
        "total_cents",
        F.round(
            F.col("__num").cast("double")
            / (
                F.col("n_customers").cast("double")
                * F.col("total_cents").cast("double")
            ),
            6,
        ).alias("gini"),
    )


def q_b10_chi2(spark, sf_dir):
    """Chi-square independence screen (B10 stats depth, r9): the
    orderpriority × orderstatus contingency table with expected counts
    and per-cell chi² contributions. Row/column/grand totals are
    integer counts joined back by broadcast (the margins are bounded by
    the category cardinalities); expected = r·c/g runs in IEEE doubles
    from exact integers (identical on both engines), contributions
    round 6. Per-cell rows — the global statistic is the reader's
    Σ over the bounded cell relation, so no float-sum-order hazard
    enters the hash."""
    orders = _t(spark, sf_dir, "orders")
    obs = orders.groupBy("o_orderpriority", "o_orderstatus").agg(
        F.count(F.lit(1)).cast("long").alias("obs")
    )
    rows = orders.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("long").alias("__r")
    )
    cols = orders.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).cast("long").alias("__c")
    )
    grand = orders.agg(F.count(F.lit(1)).cast("long").alias("__g"))
    exp = (
        F.col("__r").cast("double")
        * F.col("__c").cast("double")
        / F.col("__g").cast("double")
    )
    return (
        obs.join(F.broadcast(rows), "o_orderpriority")
        .join(F.broadcast(cols), "o_orderstatus")
        .crossJoin(F.broadcast(grand))
        .select(
            "o_orderpriority",
            "o_orderstatus",
            "obs",
            F.round(exp, 6).alias("expected"),
            F.round(
                (F.col("obs").cast("double") - exp)
                * (F.col("obs").cast("double") - exp)
                / exp,
                6,
            ).alias("contrib"),
        )
    )


def q_b10_benford(spark, sf_dir):
    """Benford first-digit screen (B10 quality depth, r9): the leading
    significant digit of order totals vs the Benford expectation
    log10(1 + 1/d) — the classic fabricated-data / corruption smell
    test. The digit comes from the INTEGER cents' decimal rendering
    (never float formatting); shares are exact-integer divisions;
    the ln-family expectation rounds 6 per the ulp rule. 9 rows."""
    orders = _t(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100).cast("long")
    digits = orders.select(
        F.substring(cents.cast("string"), 1, 1).cast("int").alias("digit")
    )
    per = digits.groupBy("digit").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    total = digits.agg(F.count(F.lit(1)).cast("long").alias("__t"))
    share = F.col("n").cast("double") / F.col("__t").cast("double")
    expected = F.log10(F.lit(1.0) + F.lit(1.0) / F.col("digit").cast("double"))
    return (
        per.crossJoin(F.broadcast(total))
        .select(
            "digit",
            "n",
            F.round(share, 6).alias("share"),
            F.round(expected, 6).alias("expected"),
            F.round(F.abs(F.round(share, 6) - F.round(expected, 6)), 6).alias(
                "deviation"
            ),
        )
    )


def q_b11_drawdown(spark, sf_dir):
    """Per-user maximum drawdown (B11 depth, r9): running cumulative
    value, its running peak, and the deepest peak-to-trough gap — the
    classic risk statistic, here over the event stream's value column.
    Integer cents end-to-end; both windows share ONE (user, ts,
    event_id) sort (total order via the event_id tie-break); keyed by
    user so every window is partitioned."""
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events")
    base = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.floor(F.col("value") * 100).cast("long").alias("cents"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    curved = base.withColumn("cum", F.sum("cents").over(w)).withColumn(
        "peak", F.max(F.col("cum")).over(w)
    )
    return curved.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.max(F.col("peak") - F.col("cum")).cast("long").alias(
            "max_drawdown_cents"
        ),
        F.sum("cents").cast("long").alias("final_cents"),
    )


def q_b10_ks_screen(spark, sf_dir):
    """Bucketed two-sample Kolmogorov–Smirnov screen (B10 stats depth,
    r9): sup |CDF₁ − CDF₂| between URGENT and LOW order-price
    distributions on $1000 buckets. The stream contracts to the
    bounded bucket relation before the cumulative windows; the supremum
    compares CROSS-MULTIPLIED integers (|c₁·n₂ − c₂·n₁|), so no float
    enters until the final division. One row out."""
    from pyspark.sql import Window

    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority").isin("1-URGENT", "5-LOW")
    )
    b = orders.select(
        (F.floor(F.col("o_totalprice") * 100).cast("long") / F.lit(100000))
        .cast("long")
        .alias("bucket"),
        F.when(F.col("o_orderpriority") == "1-URGENT", 1)
        .otherwise(0)
        .alias("__g1"),
    )
    per = b.groupBy("bucket").agg(
        F.sum("__g1").cast("long").alias("n1"),
        F.sum(1 - F.col("__g1")).cast("long").alias("n2"),
    )
    w = Window.orderBy(F.col("bucket").asc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = per.select(
        "bucket",
        F.sum("n1").over(w).alias("c1"),
        F.sum("n2").over(w).alias("c2"),
    )
    totals = per.agg(
        F.sum("n1").cast("long").alias("t1"),
        F.sum("n2").cast("long").alias("t2"),
    )
    return (
        cum.crossJoin(F.broadcast(totals))
        .select(
            "t1",
            "t2",
            F.abs(
                F.col("c1") * F.col("t2") - F.col("c2") * F.col("t1")
            ).alias("__d"),
        )
        .groupBy("t1", "t2")
        .agg(F.max("__d").alias("__dm"))
        .select(
            F.col("t1").alias("n_urgent"),
            F.col("t2").alias("n_low"),
            F.round(
                F.col("__dm").cast("double")
                / (F.col("t1").cast("double") * F.col("t2").cast("double")),
                6,
            ).alias("ks_stat"),
        )
    )


def q_b10_welch_t(spark, sf_dir):
    """Welch two-sample t screen (B10 stats depth, r9 wave 2): URGENT
    vs LOW order totals — unequal-variance t statistic and
    Welch–Satterthwaite df. Means/variances derive from EXACT decimal
    power sums (n, Σx, Σx²) — the b10_stats_agg rule: built-in
    stddev streams doubles in shuffle order (engine-varying last ulp);
    power sums are order-independent, so the doubles that reach the
    t formula are identical cross-engine. One row out; complements
    b10_ks_screen (location-scale vs whole-distribution)."""
    dec4 = lambda c: F.col(c).cast("decimal(18,4)")  # noqa: E731
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority").isin("1-URGENT", "5-LOW")
    )
    sums = orders.groupBy(
        (F.col("o_orderpriority") == "1-URGENT").alias("__g1")
    ).agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(dec4("o_totalprice")).cast("double").alias("sx"),
        F.sum(dec4("o_totalprice") * dec4("o_totalprice"))
        .cast("double")
        .alias("sxx"),
    )
    one = sums.groupBy().agg(
        F.max(F.when(F.col("__g1"), F.col("n"))).alias("n1"),
        F.max(F.when(F.col("__g1"), F.col("sx"))).alias("sx1"),
        F.max(F.when(F.col("__g1"), F.col("sxx"))).alias("sxx1"),
        F.max(F.when(~F.col("__g1"), F.col("n"))).alias("n2"),
        F.max(F.when(~F.col("__g1"), F.col("sx"))).alias("sx2"),
        F.max(F.when(~F.col("__g1"), F.col("sxx"))).alias("sxx2"),
    )
    n1, n2 = F.col("n1"), F.col("n2")
    m1 = F.col("sx1") / n1
    m2 = F.col("sx2") / n2
    v1 = (F.col("sxx1") - F.col("sx1") * F.col("sx1") / n1) / (n1 - 1)
    v2 = (F.col("sxx2") - F.col("sx2") * F.col("sx2") / n2) / (n2 - 1)
    se2 = v1 / n1 + v2 / n2
    df_w = (se2 * se2) / (
        (v1 / n1) * (v1 / n1) / (n1 - 1) + (v2 / n2) * (v2 / n2) / (n2 - 1)
    )
    return one.select(
        n1.cast("long").alias("n_urgent"),
        n2.cast("long").alias("n_low"),
        F.round(m1 - m2, 6).alias("mean_diff"),
        F.round((m1 - m2) / F.sqrt(se2), 6).alias("t_stat"),
        F.round(df_w, 6).alias("df"),
    )


def q_b11_streaks(spark, sf_dir):
    """Longest activity streak per user (B11 depth, r9 wave 2): the
    gaps-and-islands pattern — consecutive active DAYS collapse to one
    island via the classic ``day − row_number()`` constant, then one
    keyed agg per island and one per user. The stream contracts to the
    distinct (user, day) relation first, so the windows rank |active
    days| rows, all keyed by user. Integer exact."""
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events")
    days = ev.select(
        "user_id",
        F.expr(
            "cast(floor(unix_timestamp(cast(ts as timestamp))) as bigint)"
            " div 86400"
        ).alias("day"),
    ).distinct()
    w = Window.partitionBy("user_id").orderBy(F.col("day").asc())
    islands = days.select(
        "user_id",
        (F.col("day") - F.row_number().over(w)).alias("__isl"),
    ).groupBy("user_id", "__isl").agg(
        F.count(F.lit(1)).cast("long").alias("__len")
    )
    return islands.groupBy("user_id").agg(
        F.sum("__len").cast("long").alias("n_active_days"),
        F.count(F.lit(1)).cast("long").alias("n_streaks"),
        F.max("__len").cast("long").alias("longest_streak"),
    )


def q_b11_rolling_median(spark, sf_dir):
    """Trailing-7-day rolling MEDIAN of daily event counts (B11 frame
    depth, r9 wave 3): the order-statistic frame the ranking/analytic
    rows don't cover — robust smoothing for the b3 anomaly family.
    The stream contracts to the |days| relation before the frame (the
    b15_acf rule), and the frame is a DAY-VALUE range ([d−6, d], not
    7 physical rows — a missing day must shrink the frame, not stretch
    it), expressed as a bounded self-join + plain median agg because
    Spark's exact median doesn't take a window frame. Even-count
    medians average two int64 middles — exact in doubles on both
    engines."""
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.expr(
            "cast(floor(unix_timestamp(cast(ts as timestamp))) as bigint)"
            " div 86400"
        ).alias("day")
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    a = daily.select(F.col("day").alias("day"), F.col("n").alias("n"))
    b = daily.select(F.col("day").alias("__bd"), F.col("n").alias("__bn"))
    j = a.join(
        F.broadcast(b),
        (F.col("__bd") >= F.col("day") - 6) & (F.col("__bd") <= F.col("day")),
    )
    return j.groupBy("day", "n").agg(
        F.median("__bn").alias("med7"),
        F.count(F.lit(1)).cast("long").alias("n_days_in_frame"),
    )


def q_b10_winsorized(spark, sf_dir):
    """Winsorized & trimmed means (B10 robust-stats depth, r9 wave 8 —
    the outlier-resistant location estimators beside b10_mad_outliers'
    spread): per return flag, the mean after clamping (winsorizing)
    and after dropping (trimming) prices outside the floor-quantized
    [p05, p95]. Prices quantize to integer cents FIRST; the percentile
    thresholds floor to integers, so both estimators are integer sums
    with one integer division — no float accumulation. Two keyed aggs
    over the same group key (the threshold relation is 3 rows and
    broadcasts back)."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.floor(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
    )
    th = li.groupBy("l_returnflag").agg(
        F.floor(F.percentile("cents", 0.05)).cast("long").alias("p05c"),
        F.floor(F.percentile("cents", 0.95)).cast("long").alias("p95c"),
    )
    clamped = li.join(F.broadcast(th), "l_returnflag").select(
        "l_returnflag",
        "cents",
        "p05c",
        "p95c",
        F.greatest(F.least(F.col("cents"), F.col("p95c")), F.col("p05c")).alias(
            "__w"
        ),
        F.col("cents").between(F.col("p05c"), F.col("p95c")).alias("__in"),
    )
    return clamped.groupBy("l_returnflag", "p05c", "p95c").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.expr("(sum(cents) * 10000) div count(1)")
        .cast("long")
        .alias("raw_mean_micros"),
        F.expr("(sum(__w) * 10000) div count(1)")
        .cast("long")
        .alias("winsor_mean_micros"),
        F.expr(
            "(sum(CASE WHEN __in THEN cents ELSE 0 END) * 10000)"
            " div sum(CASE WHEN __in THEN 1 ELSE 0 END)"
        )
        .cast("long")
        .alias("trimmed_mean_micros"),
        F.sum(F.when(F.col("__in"), 0).otherwise(1))
        .cast("long")
        .alias("n_clamped"),
    )


def q_b11_ohlc(spark, sf_dir):
    """OHLC resampling bars (B11 time-series depth, r9 wave 9): per
    hour, open/high/low/close of the event value plus volume — the
    financial candle aggregation. Open/close are first/last by the
    TOTAL (second, event_id) order inside the hour (keyed row_number
    both directions folded into ONE keyed agg via conditional max —
    no self-join), values integer cents."""
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events").select(
        "event_id",
        F.expr(
            "cast(floor(unix_timestamp(cast(ts as timestamp))) as bigint)"
        ).alias("sec"),
        F.floor(F.col("value") * 100).cast("long").alias("cents"),
    ).withColumn("hr", F.expr("sec div 3600"))
    wa = Window.partitionBy("hr").orderBy(
        F.col("sec").asc(), F.col("event_id").asc()
    )
    wd = Window.partitionBy("hr").orderBy(
        F.col("sec").desc(), F.col("event_id").desc()
    )
    ranked = ev.select(
        "hr",
        "cents",
        F.row_number().over(wa).alias("__ra"),
        F.row_number().over(wd).alias("__rd"),
    )
    return ranked.groupBy("hr").agg(
        F.max(F.when(F.col("__ra") == 1, F.col("cents"))).alias("open_cents"),
        F.max("cents").alias("high_cents"),
        F.min("cents").alias("low_cents"),
        F.max(F.when(F.col("__rd") == 1, F.col("cents"))).alias(
            "close_cents"
        ),
        F.count(F.lit(1)).cast("long").alias("volume"),
    )


def q_b11_seasonality(spark, sf_dir):
    """Day-of-week seasonality profile (B11 depth, r11): per event
    type × weekday — event count, share of the type's total, and the
    busiest-day rank. The load-shaping view capacity planning reads
    before picking maintenance windows. Weekday comes from integer
    epoch-day arithmetic ((days + 4) mod 7, 0 = Sunday) instead of each
    engine's dayofweek() — Spark counts 1=Sunday..7, DuckDB 0=Sunday..6,
    so the portable form IS the parity fix. One keyed agg + a per-type
    totals join broadcast back; share = one division of exact counts,
    round 6."""
    ev = _t(spark, sf_dir, "events").select("event_type", "ts")
    dow = F.expr(
        "pmod(unix_micros(cast(ts as timestamp)) div 86400000000 + 4, 7)"
    ).cast("int")
    cells = ev.groupBy("event_type", dow.alias("dow")).agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    tot = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("__t")
    )
    from pyspark.sql import Window

    w = Window.partitionBy("event_type").orderBy(
        F.col("n").desc(), F.col("dow").asc()
    )
    return (
        cells.join(F.broadcast(tot), "event_type")
        .select(
            "event_type",
            "dow",
            "n",
            F.round(F.col("n").cast("double") / F.col("__t"), 6).alias(
                "share"
            ),
            F.row_number().over(w).cast("int").alias("busy_rank"),
        )
    )


def q_b10_two_proportion(spark, sf_dir):
    """Two-proportion z-test (B10 depth, r11 — the A/B-test read for
    RATES, beside b10_welch_t's means): conversion = value > 50 events,
    variants = the alphabetically first and last event types (a
    deterministic pick both engines compute), pooled-variance z
    statistic with the significance flag compared on the ROUNDED z so
    the decision replays cross-engine. Counts are exact integers; the
    z derivation is division/sqrt only (both IEEE-correctly-rounded)
    in identical literal order. Shape: one keyed agg + two 1-row
    broadcasts."""
    ev = _t(spark, sf_dir, "events").select("event_type", "value")
    picks = ev.agg(
        F.min("event_type").alias("__va"), F.max("event_type").alias("__vb")
    )
    per = (
        ev.crossJoin(F.broadcast(picks))
        .filter(
            (F.col("event_type") == F.col("__va"))
            | (F.col("event_type") == F.col("__vb"))
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.when(F.col("value") > 50.0, 1).otherwise(0))
            .cast("long")
            .alias("x"),
        )
    )
    a = per.crossJoin(F.broadcast(picks)).filter(
        F.col("event_type") == F.col("__va")
    ).select(
        F.col("event_type").alias("variant_a"),
        F.col("n").alias("n_a"),
        F.col("x").alias("x_a"),
    )
    b = per.crossJoin(F.broadcast(picks)).filter(
        F.col("event_type") == F.col("__vb")
    ).select(
        F.col("event_type").alias("variant_b"),
        F.col("n").alias("n_b"),
        F.col("x").alias("x_b"),
    )
    r = a.crossJoin(F.broadcast(b))
    p1 = F.col("x_a").cast("double") / F.col("n_a")
    p2 = F.col("x_b").cast("double") / F.col("n_b")
    pp = (F.col("x_a") + F.col("x_b")).cast("double") / (
        F.col("n_a") + F.col("n_b")
    )
    se = F.sqrt(
        pp * (F.lit(1.0) - pp)
        * (F.lit(1.0) / F.col("n_a") + F.lit(1.0) / F.col("n_b"))
    )
    z = F.round((p1 - p2) / se, 6)
    return r.select(
        "variant_a",
        "variant_b",
        "n_a",
        "x_a",
        "n_b",
        "x_b",
        F.round(p1, 6).alias("p_a"),
        F.round(p2, 6).alias("p_b"),
        z.alias("z"),
        (F.abs(z) >= 1.96).alias("significant"),
    )


def q_b11_cusum(spark, sf_dir):
    """CUSUM level-shift monitor (B11 depth, r11 — the SEQUENTIAL
    changepoint statistic beside b3_changepoint's retrospective mean
    split): per event type, the running sum of hourly-count deviations
    from the type mean, reported at its extreme — where |CUSUM| peaks
    is where the level shifted. INTEGER-exact trick: the deviation sum
    scaled by the hour count H (Σ(nᵗ·H − T), T = type total) is pure
    integer arithmetic — cumulative over a window, compared exactly,
    divided by H only for the final display column. One keyed agg +
    one ordered window + one argmax window on the same type key."""
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events").select("event_type", "ts")
    hourly = ev.groupBy(
        "event_type",
        F.expr("unix_micros(cast(ts as timestamp)) div 3600000000")
        .cast("long")
        .alias("hr_idx"),
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    wt = Window.partitionBy("event_type")
    wo = (
        Window.partitionBy("event_type")
        .orderBy(F.col("hr_idx").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    scored = hourly.select(
        "event_type",
        "hr_idx",
        F.col("n"),
        F.count(F.lit(1)).over(wt).cast("long").alias("__h"),
        F.sum("n").over(wt).cast("long").alias("__t"),
    ).select(
        "event_type",
        "hr_idx",
        "__h",
        F.sum(F.col("n") * F.col("__h") - F.col("__t"))
        .over(wo)
        .cast("long")
        .alias("__s"),
    )
    wpk = Window.partitionBy("event_type").orderBy(
        F.abs(F.col("__s")).desc(), F.col("hr_idx").asc()
    )
    return (
        scored.withColumn("__rn", F.row_number().over(wpk))
        .filter(F.col("__rn") == 1)
        .select(
            "event_type",
            F.col("__h").alias("n_hours"),
            F.col("hr_idx").alias("peak_hr_idx"),
            F.col("__s").alias("cusum_scaled"),
            F.round(F.col("__s").cast("double") / F.col("__h"), 6).alias(
                "cusum_peak"
            ),
        )
    )


def q_b14_struct_funcs(spark, sf_dir):
    """Struct/row-value function surface (B14 depth, r11 — the nested
    type family's missing leg beside the array/map/json rows): build
    structs, extract fields, and use SQL ROW-VALUE (tuple) comparison
    — the composite-key idiom the keyset paginator (A3) relies on,
    here exercised as a first-class scalar surface. Per return flag:
    rows where (quantity, price) > (25, 30000.0) lexicographically,
    the max struct by tuple order with its fields re-extracted, and a
    struct-equality count. Narrow maps + one keyed agg."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_quantity", "l_extendedprice", "l_linenumber"
    )
    s = F.struct(
        F.col("l_quantity").alias("q"), F.col("l_extendedprice").alias("p")
    )
    rows = li.select(
        "l_returnflag",
        s.alias("__s"),
        (s > F.struct(F.lit(25.0).alias("q"), F.lit(30000.0).alias("p")))
        .alias("__gt"),
        (
            F.struct(F.col("l_linenumber").alias("a"))
            == F.struct(F.lit(1).alias("a"))
        ).alias("__eq1"),
    )
    agg = rows.groupBy("l_returnflag").agg(
        F.sum(F.col("__gt").cast("long")).cast("long").alias("n_gt"),
        F.sum(F.col("__eq1").cast("long")).cast("long").alias("n_line1"),
        F.max("__s").alias("__mx"),
    )
    return agg.select(
        "l_returnflag",
        "n_gt",
        "n_line1",
        F.col("__mx.q").alias("max_q"),
        F.round(F.col("__mx.p"), 2).alias("max_p"),
    )


def q_b10_permutation_fdr(spark, sf_dir):
    """Permutation test + Benjamini–Hochberg FDR (B10 depth, r12): the
    multiple-testing layer the b10 screen family (two-proportion, chi²,
    Welch, KS) feeds at scale — run one screen per event type and you
    MUST correct for the family or ~α·m screens fire by chance. Per
    event type: observed statistic T₀ = |Σ s·v| with s = ±1 by early/
    late half of the time range and v = floor(value·1000); null
    replicates T_b (b = 1..32) re-sign each event by the parity of
    md5-60(event_id·33 + b) — a deterministic sign-flip permutation
    test, so the empirical p-value p = (1 + #{T_b ≥ T₀})/33 is an EXACT
    integer rational (p_num/33), and the BH step-up at α = 0.10 is pure
    integer arithmetic: reject ranks ≤ max{i : 10·m·p_num(i) ≤ 33·i}.
    No erf, no normal quantile — every column replays bit-for-bit.
    Scale shape: one 33-way explode into a (type, b) keyed agg with
    map-side partial combine (33 running sums per task, never a row
    product), then window ops over the m-row family table."""
    ev = _t(spark, sf_dir, "events").select("event_id", "event_type", "ts", "value")
    anchor = ev.agg(
        F.expr(
            "(min(unix_micros(cast(ts as timestamp)))"
            " + max(unix_micros(cast(ts as timestamp)))) div 2"
        ).alias("__mid")
    )
    base = ev.crossJoin(F.broadcast(anchor)).select(
        "event_type",
        F.floor(F.col("value") * 1000).cast("long").alias("__v"),
        F.when(
            F.expr("unix_micros(cast(ts as timestamp))") < F.col("__mid"), 1
        )
        .otherwise(-1)
        .alias("__s0"),
        "event_id",
    )
    perms = base.select(
        "event_type",
        "__v",
        "__s0",
        "event_id",
        F.explode(F.sequence(F.lit(0), F.lit(32))).alias("b"),
    ).select(
        "event_type",
        "b",
        (
            F.when(F.col("b") == 0, F.col("__s0")).otherwise(
                1
                - 2
                * F.pmod(
                    dedup.portable_hash60(
                        (F.col("event_id") * 33 + F.col("b")).cast("string")
                    ),
                    F.lit(2),
                )
            )
            * F.col("__v")
        ).alias("__sv"),
    )
    # r17 negative result (guide §1.1): the formatted plan shows the
    # 33-way explode + md5 agg subtree TWICE (observed leg + broadcast
    # null leg, plans/r17/b10_permutation_fdr_before.txt), but the two
    # partial-agg exchanges are canonically identical and AQE's runtime
    # stage reuse already computes them once — a localCheckpoint of `t`
    # measured PARITY in the clean interleaved A/B pass (0.98×/1.02×
    # med/min) and was not kept. The pre-execution plan overstates the
    # work; trust the runtime stage cache for verbatim subtrees.
    t = perms.groupBy("event_type", "b").agg(
        F.abs(F.sum("__sv")).cast("long").alias("__t")
    )
    obs = t.filter(F.col("b") == 0).select(
        "event_type", F.col("__t").alias("t_obs")
    )
    p = (
        t.filter(F.col("b") > 0)
        .join(obs, "event_type")
        .groupBy("event_type", "t_obs")
        .agg(
            (
                1
                + F.sum(F.when(F.col("__t") >= F.col("t_obs"), 1).otherwise(0))
            )
            .cast("long")
            .alias("p_num")
        )
    )
    from pyspark.sql import Window

    wr = Window.orderBy(F.col("p_num").asc(), F.col("event_type").asc())
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    ranked = (
        p.withColumn("rank", F.row_number().over(wr).cast("long"))
        .withColumn("__m", F.count(F.lit(1)).over(wall))
        .withColumn(
            "__ok",
            F.when(
                10 * F.col("__m") * F.col("p_num") <= 33 * F.col("rank"),
                F.col("rank"),
            ).otherwise(F.lit(0)),
        )
        .withColumn("__istar", F.max("__ok").over(wall))
    )
    return ranked.select(
        "event_type",
        "t_obs",
        "p_num",
        "rank",
        (F.col("rank") <= F.col("__istar")).alias("rejected"),
    )


def q_b10_mann_kendall(spark, sf_dir):
    """Mann–Kendall trend test + Theil–Sen slope (B10 depth, r12 — the
    RANK-based trend pair beside the parametric b10_groupwise_ols: no
    residual normality assumption, robust to outliers, the standard
    monotone-trend screen for telemetry series): per event type, over
    the bounded daily-count series — S = Σ sign(c_j − c_i) over day
    pairs i<j, the tie-corrected variance kept as the EXACT integer
    18·Var(S) (n(n−1)(2n+5) − Σ t(t−1)(2t+5) over tie groups), the
    continuity-corrected z (sqrt is IEEE-exact; round 6), and the
    Theil–Sen slope = lower-median of floor(1e6·Δc/Δd) over pairs
    (pure integers). Scale shape: the pair 'join' is over the per-type
    DAY GRID (30 days → ≤435 pairs/type), never events; the event scan
    contributes one keyed count. Everything downstream of the daily agg
    is bounded by days², independent of corpus size."""
    ev = _t(spark, sf_dir, "events").select("event_type", "ts")
    daily = ev.groupBy(
        "event_type",
        F.expr("unix_micros(cast(ts as timestamp)) div 86400000000").alias(
            "d"
        ),
    ).agg(F.count(F.lit(1)).cast("long").alias("c"))
    a = daily.select(
        "event_type", F.col("d").alias("d1"), F.col("c").alias("c1")
    )
    b = daily.select(
        "event_type", F.col("d").alias("d2"), F.col("c").alias("c2")
    )
    pairs = a.join(b, "event_type").filter(F.col("d1") < F.col("d2"))
    s_and_slope = pairs.select(
        "event_type",
        F.signum(F.col("c2") - F.col("c1")).cast("long").alias("__sg"),
        F.expr("(c2 - c1) * 1000000 div (d2 - d1)").alias("__sl"),
    )
    from pyspark.sql import Window

    wrk = Window.partitionBy("event_type").orderBy(
        F.col("__sl").asc(), F.col("__sg").asc()
    )
    wnp = Window.partitionBy("event_type").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    ranked = (
        s_and_slope.withColumn("__rn", F.row_number().over(wrk))
        .withColumn("__np", F.count(F.lit(1)).over(wnp))
    )
    agg = ranked.groupBy("event_type").agg(
        F.sum("__sg").cast("long").alias("s_stat"),
        # lower median: the rank-ceil(np/2) slope in ascending order
        F.min(
            F.when(
                F.col("__rn") == F.expr("(__np + 1) div 2"),
                F.col("__sl"),
            )
        ).alias("sen_slope_x1e6"),
    )
    nd = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_days")
    )
    ties = (
        daily.groupBy("event_type", "c")
        .agg(F.count(F.lit(1)).cast("long").alias("t"))
        .groupBy("event_type")
        .agg(
            F.sum(
                F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)
            )
            .cast("long")
            .alias("__tie")
        )
    )
    out = (
        agg.join(nd, "event_type")
        .join(ties, "event_type")
        .select(
            "event_type",
            "n_days",
            "s_stat",
            (
                F.col("n_days")
                * (F.col("n_days") - 1)
                * (2 * F.col("n_days") + 5)
                - F.col("__tie")
            )
            .cast("long")
            .alias("var_s_x18"),
            "sen_slope_x1e6",
        )
    )
    return out.select(
        "event_type",
        "n_days",
        "s_stat",
        "var_s_x18",
        # degenerate series (all daily counts equal) ⇒ Var(S)=0: NULL z
        # on BOTH engines, never NaN (ADVICE r12 — the same
        # zero-denominator class as capture_recapture/theta_intersect)
        F.when(
            F.col("var_s_x18") > 0,
            F.round(
                F.when(F.col("s_stat") > 0, F.col("s_stat") - 1)
                .when(F.col("s_stat") < 0, F.col("s_stat") + 1)
                .otherwise(F.lit(0))
                .cast("double")
                / F.sqrt(F.col("var_s_x18").cast("double") / F.lit(18.0)),
                6,
            ),
        ).alias("z"),
        "sen_slope_x1e6",
    )


def q_b15_changepoint(spark, sf_dir):
    """CUSUM changepoint estimator (B15 depth, r12 — the SEGMENTATION
    read beside b11_cusum's sequential alarm: cusum answers "has the
    level shifted YET", this answers "WHERE did it shift", the
    retrospective split a pipeline runs after the alarm fires): per
    event type over the daily-count series, the split t* maximizing
    the centered-prefix deviation |n·S_t − t·S_n| (the integer-exact
    form of the classic max-CUSUM estimator — no denominators, no
    floats in the argmax), ties to the earliest day. Output: the split
    position, its day, the exact deviation, and the floor-quantized
    before/after means the operator reads for shift size. Scale shape:
    one keyed daily count, then windows over the bounded day grid."""
    ev = _t(spark, sf_dir, "events").select("event_type", "ts")
    daily = ev.groupBy(
        "event_type",
        F.expr("unix_micros(cast(ts as timestamp)) div 86400000000").alias(
            "day"
        ),
    ).agg(F.count(F.lit(1)).cast("long").alias("c"))
    from pyspark.sql import Window

    wo = Window.partitionBy("event_type").orderBy(F.col("day").asc())
    wall = (
        Window.partitionBy("event_type")
        .orderBy(F.col("day").asc())
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    pre = (
        daily.withColumn("t", F.row_number().over(wo).cast("long"))
        .withColumn("s_t", F.sum("c").over(wo).cast("long"))
        .withColumn("n", F.count(F.lit(1)).over(wall).cast("long"))
        .withColumn("s_n", F.sum("c").over(wall).cast("long"))
    )
    scored = pre.filter(F.col("t") < F.col("n")).select(
        "event_type",
        "t",
        "day",
        "n",
        "s_t",
        "s_n",
        F.abs(
            F.col("n") * F.col("s_t") - F.col("t") * F.col("s_n")
        ).alias("__dev"),
    )
    wbest = Window.partitionBy("event_type").orderBy(
        F.col("__dev").desc(), F.col("t").asc()
    )
    return (
        scored.withColumn("__rn", F.row_number().over(wbest))
        .filter(F.col("__rn") == 1)
        .select(
            "event_type",
            F.col("n").alias("n_days"),
            F.col("t").alias("t_star"),
            F.col("day").alias("split_day"),
            F.col("__dev").cast("long").alias("dev_max"),
            F.expr("s_t * 1000000 div t").alias("mean_before_x1e6"),
            F.expr("(s_n - s_t) * 1000000 div (n - t)").alias(
                "mean_after_x1e6"
            ),
        )
    )


def q_b12_diversified_topk(spark, sf_dir):
    """Diversity-constrained global top-k (B12 depth, r13 — the
    "don't let one source dominate the head" ranking read beside
    b12_topk's plain per-group top-k: a retrieval head or a
    training-sample preview caps how many rows any one provider may
    place in the global top): top 20 lineitems by extended price with
    AT MOST 2 per supplier. Two bounded passes: a supplier-keyed rank
    window (parallel across suppliers) filters to each supplier's top
    2, then the global head comes from the TakeOrdered + k-row window
    idiom — never a global sort of the corpus."""
    from pyspark.sql import Window

    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_suppkey", "l_extendedprice"
    )
    ws = Window.partitionBy("l_suppkey").orderBy(
        F.col("l_extendedprice").desc(),
        F.col("l_orderkey").asc(),
        F.col("l_linenumber").asc(),
    )
    capped = li.withColumn(
        "within_supp_rank", F.row_number().over(ws).cast("long")
    ).filter(F.col("within_supp_rank") <= 2)
    wg = Window.orderBy(
        F.col("l_extendedprice").desc(),
        F.col("l_orderkey").asc(),
        F.col("l_linenumber").asc(),
        F.col("within_supp_rank").asc(),
    )
    return (
        capped.orderBy(
            F.col("l_extendedprice").desc(),
            F.col("l_orderkey").asc(),
            F.col("l_linenumber").asc(),
            F.col("within_supp_rank").asc(),
        )
        .limit(20)
        .select(
            F.row_number().over(wg).cast("long").alias("rnk"),
            "l_orderkey",
            "l_linenumber",
            "l_suppkey",
            "l_extendedprice",
            "within_supp_rank",
        )
    )


def q_b10_anova(spark, sf_dir):
    """One-way ANOVA F screen (B10 depth, r13 — the k-group mean
    comparison beside the 2-group b10_welch_t and the rank-based
    b10_mann_kendall): does event `value` differ across event types?
    Values quantize to milli-units (floor(v*1000) int64) so every sum
    of squares is exact integer arithmetic; the floored per-group
    projection term ``S_g² div n_g`` defines the statistic (deviation
    from the rational SS ≤ k absolute — mirrored verbatim in the
    oracle), so SSB/SSW ship as exact BIGINTs and only the final F is
    a double (a fixed 4-node expression over two exact scalars,
    round 6 — the b10_mann_kendall z rule). Zero within-variance
    (ssw ≤ 0) or a flooring-negative SSB ⇒ NULL f on BOTH engines.

    Scale shape: ONE keyed pass over events (map-side combinable sums
    of v, v², 1), then everything downstream lives on the
    |event_types|-row relation — broadcast back over it for the
    per-group output. The squared sums S² are computed in
    decimal(38,0) (S ≈ n·5·10⁵ overflows int64² at ~6·10⁶ rows —
    caught by the sf0.1 gate); Σv² likewise accumulates in
    decimal(38,0)/HUGEINT (r14 — same expression tree), so the only
    int64 boundary anywhere is the exposed-column cast, which fails
    loud (NULL / ANSI error / HUGEINT cast error) instead of
    wrapping to a wrong value."""
    ev = _t(spark, sf_dir, "events").select(
        "event_type", F.floor(F.col("value") * 1000).cast("long").alias("v")
    )
    per_g = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_g"),
        F.sum("v").cast("long").alias("sum_milli"),
        # accumulate Σv² in decimal(38,0) (HUGEINT on the oracle): the
        # products fit int64 easily (v² ≈ 2.5e11) but the SUM crosses
        # 2⁶³ at ~3.7e7 rows/group, where int64 would silently wrap —
        # with decimal accumulation the only int64 boundary left is
        # this exposed-column cast, which fails loud (NULL / ANSI
        # error) instead of producing a wrong value
        F.sum(F.expr("cast(v as decimal(38,0)) * v"))
        .cast("long")
        .alias("ssq_milli"),
    )
    glob = per_g.agg(
        F.count(F.lit(1)).cast("long").alias("k_groups"),
        F.sum("n_g").cast("long").alias("n_total"),
        F.sum("sum_milli").cast("long").alias("s_all"),
        F.sum("ssq_milli").cast("long").alias("q_all"),
        # the squared sums outgrow int64 long before the power sums do
        # (S ≈ n·5·10⁵ ⇒ S² > 2⁶³ at ~6·10⁶ rows): square in
        # decimal(38,0), floor-div back to long
        F.sum(
            F.expr(
                "cast(cast(sum_milli as decimal(38,0)) * sum_milli"
                " div n_g as long)"
            )
        ).cast("long").alias("b_all"),
    )
    return (
        per_g.crossJoin(F.broadcast(glob))
        .select(
            "event_type",
            "n_g",
            "sum_milli",
            "ssq_milli",
            "k_groups",
            "n_total",
            F.expr(
                "b_all - cast(cast(s_all as decimal(38,0)) * s_all"
                " div n_total as long)"
            ).alias("ssb_x"),
            F.expr("q_all - b_all").alias("ssw_x"),
            (F.col("k_groups") - 1).cast("long").alias("df_between"),
            (F.col("n_total") - F.col("k_groups"))
            .cast("long")
            .alias("df_within"),
        )
        .withColumn(
            "f",
            F.when(
                (F.col("ssw_x") > 0)
                & (F.col("ssb_x") >= 0)
                & (F.col("df_between") > 0)
                & (F.col("df_within") > 0),
                F.round(
                    (
                        F.col("ssb_x").cast("double")
                        * F.col("df_within").cast("double")
                    )
                    / (
                        F.col("ssw_x").cast("double")
                        * F.col("df_between").cast("double")
                    ),
                    6,
                ),
            ),
        )
    )


def q_b12_limit_pushdown_audit(spark, sf_dir):
    """Distributed limit-pushdown audit (B12 depth, r14 — VERDICT r13
    item 5's suggested row): the two-phase algebra behind
    TakeOrderedAndProject, surfaced as numbers. A global top-k
    (k=100 lineitems by price cents desc, total-key tie-break) never
    sorts the table: every partition keeps a k-row heap, the driver
    merges Σ min(k, n_b) survivors, and only k win. This row computes
    that reduction over a portable 32-bucket partition model
    (md5-60 of the row key — replayable in SQL, unlike Spark's
    physical hashpartitioning): per bucket, rows scanned, heap
    survivors ≤ k, winners contributed, and the round-6 merge
    fraction heap_out/n_rows. The winners leg is itself an
    orderBy+limit (a real TakeOrderedAndProject — the audit uses the
    operator it audits); the per-bucket joins are 32-row broadcasts.
    Integer-exact except the final fraction."""
    k = 100
    n_buckets = 32
    li = _t(spark, sf_dir, "lineitem")
    keyed = li.select(
        F.floor(F.col("l_extendedprice") * 100).cast("long").alias("price_c"),
        *[F.col(c) for c in _LI_PAGE_KEYS],
    ).withColumn(
        "bucket",
        F.pmod(
            dedup.portable_hash60(
                F.concat_ws(
                    "|", "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber"
                )
            ),
            F.lit(n_buckets),
        ).cast("long"),
    )
    order_cols = [F.col("price_c").desc()] + [
        F.col(c).asc() for c in _LI_PAGE_KEYS
    ]
    winners = keyed.orderBy(*order_cols).limit(k)
    per_bucket = keyed.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows")
    )
    win_bucket = winners.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n_winners")
    )
    return (
        per_bucket.join(F.broadcast(win_bucket), "bucket", "left")
        .select(
            "bucket",
            "n_rows",
            F.least(F.col("n_rows"), F.lit(k)).cast("long").alias("heap_out"),
            F.coalesce("n_winners", F.lit(0)).cast("long").alias("n_winners"),
        )
        .withColumn(
            "merge_frac",
            F.round(
                F.col("heap_out").cast("double") / F.col("n_rows").cast("double"),
                6,
            ),
        )
    )


def q_b12_keyset_parity(spark, sf_dir):
    """Keyset-pagination parity audit (B12 depth, r15 — the pagination
    twin of b12_limit_pushdown_audit: A2/A3's keyset pages PROVEN equal
    to global-order slices, as values): four consecutive 200-row pages
    of lineitem on the total page key, each computed TWO ways —
    (a) keyset: boundary = max(key tuple) of the previous prefix (a
    1-row broadcast, struct compare — the O(1)-state pagination the
    reference's snapshot scan uses, handler.go-style), then
    orderBy+limit after the boundary filter; (b) slice:
    limit(200·(i+1)) exceptAll limit(200·i). Per page: row counts and
    a bit_xor content hash of both legs plus their equality — a broken
    boundary compare or a non-total sort order flips pages_match to
    false. Every leg is TakeOrderedAndProject (per-partition heaps, no
    global sort) on the engine side; the exceptAll operates on ≤800
    already-limited rows. The ORACLE may use a global row_number — the
    Spark side is what must never sort the corpus."""
    k = 200
    li = _t(spark, sf_dir, "lineitem").select(*_LI_PAGE_KEYS)
    order = [F.col(c).asc() for c in _LI_PAGE_KEYS]
    key_struct = F.struct(*[F.col(c) for c in _LI_PAGE_KEYS])
    row_hash = dedup.portable_hash60(
        F.concat_ws(
            "|",
            "l_orderkey",
            "l_partkey",
            "l_suppkey",
            "l_linenumber",
            "l_returnflag",
            "l_linestatus",
            F.floor(F.col("l_quantity") * 100).cast("long"),
        )
    )
    pages = []
    for i in range(4):
        prefix = li.orderBy(*order).limit(k * i)
        bnd = prefix.agg(F.max(key_struct).alias("b"))
        keyset = (
            li.crossJoin(F.broadcast(bnd))
            .filter(F.col("b").isNull() | (key_struct > F.col("b")))
            .select(*_LI_PAGE_KEYS)
            .orderBy(*order)
            .limit(k)
        )
        slice_ = li.orderBy(*order).limit(k * (i + 1)).exceptAll(prefix)
        ka = keyset.agg(
            F.count(F.lit(1)).cast("long").alias("n_keyset"),
            F.bit_xor(row_hash).alias("keyset_xor"),
        )
        sa = slice_.agg(
            F.count(F.lit(1)).cast("long").alias("n_slice"),
            F.bit_xor(row_hash).alias("slice_xor"),
        )
        pages.append(
            ka.crossJoin(sa).select(
                F.lit(i).cast("int").alias("page"),
                "n_keyset",
                "n_slice",
                "keyset_xor",
                "slice_xor",
                (
                    (F.col("n_keyset") == F.col("n_slice"))
                    & (F.col("keyset_xor") == F.col("slice_xor"))
                ).alias("pages_match"),
            )
        )
    out = pages[0]
    for p in pages[1:]:
        out = out.unionByName(p)
    return out


def q_b12_topk_ties(spark, sf_dir):
    """Distributed top-k WITH TIES audit (B12 depth, r17 — VERDICT r16
    item 5's suggested row). Rank-based top-k (every row tying at the
    k-th value included — SQL's FETCH FIRST k WITH TIES) is the
    semantics a keyset-paginated reader actually needs (A3: a page
    boundary mid-tie silently drops tied rows). The oracle computes it
    the textbook way — a per-group rank() window over the CORPUS —
    while the engine takes the scale route: one keyed groupBy to a
    (group, value) histogram (the only corpus shuffle), a cumulative
    window over the ≤|groups|·|distinct values| histogram rows (never
    the corpus) to find the threshold value whose strictly-above count
    is < k, then conditional sums against the broadcast threshold.
    Hash equality proves threshold-route == rank-route per group:
    n_kept ≥ k exposes exactly how many tied rows a naive LIMIT k
    would have dropped. The histogram is localCheckpoint'd once (two
    consumers — threshold derivation and the stats pass — would
    otherwise re-shuffle the corpus per reference)."""
    from pyspark.sql import Window

    K = 5
    li = _t(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        "l_linestatus",
        F.floor("l_quantity").cast("long").alias("v"),
    )
    hist = (
        li.groupBy("l_returnflag", "l_linestatus", "v")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .localCheckpoint()
    )
    w = (
        Window.partitionBy("l_returnflag", "l_linestatus")
        .orderBy(F.col("v").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    th = (
        hist.withColumn(
            "n_above", F.coalesce(F.sum("cnt").over(w), F.lit(0))
        )
        .filter(F.col("n_above") < K)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(F.min("v").cast("long").alias("threshold"))
    )
    return (
        hist.join(
            F.broadcast(th), ["l_returnflag", "l_linestatus"]
        )
        .groupBy("l_returnflag", "l_linestatus", "threshold")
        .agg(
            F.sum(F.when(F.col("v") > F.col("threshold"), F.col("cnt")))
            .cast("long")
            .alias("n_above"),
            F.sum(F.when(F.col("v") == F.col("threshold"), F.col("cnt")))
            .cast("long")
            .alias("n_at_threshold"),
            F.sum(F.when(F.col("v") >= F.col("threshold"), F.col("cnt")))
            .cast("long")
            .alias("n_kept"),
        )
        .select(
            "l_returnflag",
            "l_linestatus",
            F.lit(K).cast("long").alias("k"),
            "threshold",
            F.coalesce("n_above", F.lit(0)).cast("long").alias("n_above"),
            "n_at_threshold",
            "n_kept",
        )
    )
