"""Registry query functions — storage family (split from
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


def q_b13_set_ops(spark, sf_dir):
    customer = _t(spark, sf_dir, "customer").select(F.col("c_custkey").alias("k"))
    orders = _t(spark, sf_dir, "orders").select(F.col("o_custkey").alias("k"))
    inactive = customer.subtract(orders)  # EXCEPT DISTINCT
    active = customer.intersect(orders)
    return inactive.withColumn("status", F.lit("inactive")).unionByName(
        active.withColumn("status", F.lit("active"))
    )


def q_b14_scalar_funcs(spark, sf_dir):
    p = _t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.substring("p_name", 1, 8).alias("name8"),
        F.upper("p_brand").alias("brand_uc"),
        F.lower("p_type").alias("type_lc"),
        F.length("p_name").cast("bigint").alias("name_len"),
        F.round(F.col("p_retailprice") * 1.1, 2).alias("price_up"),
        F.abs(F.col("p_size") - 25).cast("bigint").alias("size_dist"),
        (F.col("p_partkey") % 7).alias("k_mod"),
        F.coalesce(F.nullif(F.col("p_brand"), F.lit("Brand#1")), F.lit("OTHER")).alias("brand_o"),
    )


def q_b15_session_windows(spark, sf_dir):
    """Session windows per user (B15): 30-minute inactivity gap, batch
    form of session_window."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.col("user_id"), F.session_window("ts", "30 minutes").alias("sess")
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("sess.start").alias("sess_start"),
            F.col("sess.end").alias("sess_end"),
            "n_events",
        )
    )


def q_b14_json_funcs(spark, sf_dir):
    """JSON function battery over the events props payload (B14):
    get_json_object, from_json typed extraction, json length/keys."""
    ev = _t(spark, sf_dir, "events")
    from pyspark.sql import types as T

    schema = T.StructType([T.StructField("k", T.LongType())])
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("bigint").alias("k_dyn"),
        F.from_json("props", schema).getField("k").alias("k_typed"),
        F.json_array_length(F.concat(F.lit("["), F.col("props"), F.lit("]"))).cast("bigint").alias("arr_len"),
        F.to_json(F.struct(F.col("event_type"), F.col("user_id"))).alias("packed"),
    )


def q_b15_sliding_windows(spark, sf_dir):
    """Sliding event-time windows, batch form (B15): 2-hour window sliding
    1 hour — each event lands in 2 windows."""
    ch = _events_changes(spark, sf_dir)
    return (
        ch.groupBy(
            F.window("timestamp", "2 hours", "1 hour").alias("win"),
            F.col("operation"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            "operation",
            "n",
        )
    )


def q_b14_array_funcs(spark, sf_dir):
    p = _t(spark, sf_dir, "part")
    words = F.split(F.col("p_type"), " ")
    return p.select(
        "p_partkey",
        F.explode(words).alias("word"),
        F.size(words).cast("bigint").alias("n_words"),
        F.element_at(words, 1).alias("first_word"),
        F.array_join(F.sort_array(words), ",").alias("sorted_words"),
    )


def q_b14_map_funcs(spark, sf_dir):
    """Map-type functions (B14): construct, extract, cardinality — output
    scalars so the comparison is engine-portable."""
    p = _t(spark, sf_dir, "part")
    m = F.create_map(
        F.lit("brand"), F.col("p_brand"), F.lit("type"), F.col("p_type")
    )
    return p.select(
        "p_partkey",
        F.element_at(m, "brand").alias("m_brand"),
        F.element_at(m, "type").alias("m_type"),
        F.size(m).cast("bigint").alias("m_size"),
        F.array_join(F.map_keys(m), ",").alias("m_keys"),
    )


def q_b15_interval_join(spark, sf_dir):
    """Batch form of the stream-stream interval join (B15/B16): purchases
    within 7 days after the same user's signup. Identical expression runs
    on watermarked streams (tested in tests/test_streaming.py)."""
    from sqlite_cdc_spark import streaming as st

    ev = _t(spark, sf_dir, "events")
    signups = ev.filter(F.col("event_type") == "signup").select(
        F.col("user_id").alias("s_user"),
        F.col("event_id").alias("s_event"),
        F.col("ts").alias("s_ts"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("p_event"),
        F.col("ts").alias("p_ts"),
        F.col("value").alias("p_value"),
    )
    joined = st.interval_join_streams(
        signups, purchases, "s_user", "p_user", "s_ts", "p_ts", within="7 days"
    )
    return joined.select("s_user", "s_event", "p_event", "p_value")


def q_b15_funnel_steps(spark, sf_dir):
    """Library-shaped funnel (B15 depth): one row per step with the
    users-reached count under the strictly-after ordering rule — the
    general N-step form of b15_funnel (derive.py: funnel)."""
    ev = _t(spark, sf_dir, "events")
    return derive.funnel(
        ev.select("user_id", "event_type", "ts"),
        "user_id",
        "event_type",
        "ts",
        ["view", "click", "purchase"],
    )


def q_b15_session_stats(spark, sf_dir):
    """Session-level rollups (B15 depth): the downstream consumer of
    row-level session IDs — per (user, session): event count, distinct
    event types, and wall duration in seconds. sessionize's shuffle on
    user_id is REUSED by the session agg (same key prefix), so the
    composition adds no exchange (derive.py: sessionize)."""
    ev = _t(spark, sf_dir, "events")
    tagged = derive.sessionize(
        ev.select("event_id", "user_id", "event_type", "ts"),
        "user_id",
        "ts",
        "event_id",
    )
    sec = F.unix_timestamp(F.col("ts").cast("timestamp"))
    return tagged.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.countDistinct("event_type").cast("bigint").alias("n_types"),
        (F.max(sec) - F.min(sec)).cast("bigint").alias("duration_sec"),
    )


def q_b14_string_agg(spark, sf_dir):
    """Ordered string aggregation (B14 depth): per-region comma-joined
    nation list in name order — listagg/string_agg parity. Deterministic
    via sort_array over collected structs; the aggregate relation is
    |regions| rows."""
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    return (
        nation.join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.concat_ws(
                ",", F.array_sort(F.collect_list("n_name"))
            ).alias("nations"),
            F.count(F.lit(1)).cast("bigint").alias("n_nations"),
        )
    )


def q_b15_sessionize(spark, sf_dir):
    """Session-ID assignment (B15 depth): each event tagged with its
    user's session ordinal — a new session starts when the gap from the
    previous event exceeds 30 minutes. The row-level companion to
    `session_window` aggregation (which only emits per-session rollups):
    lag-diff marks session starts, a running sum numbers them. One
    shuffle on user_id; both window passes share the same sort
    (derive.py: sessionize)."""
    ev = _t(spark, sf_dir, "events")
    return derive.sessionize(
        ev.select("event_id", "user_id", "ts"), "user_id", "ts", "event_id"
    ).select("event_id", "user_id", "session_id")


def q_b14_string_sim(spark, sf_dir):
    """Edit-distance string similarity (B14/B19 depth): levenshtein over
    adjacent part names — the classic fuzzy-matching scalar, useful as a
    dedup verify stage for short fields."""
    p = _t(spark, sf_dir, "part")
    a = p.select(F.col("p_partkey").alias("id_a"), F.col("p_name").alias("name_a"))
    b = p.select(F.col("p_partkey").alias("id_b"), F.col("p_name").alias("name_b"))
    pairs = a.join(b, F.col("id_a") + 1 == F.col("id_b"))
    return pairs.select(
        "id_a",
        "id_b",
        F.levenshtein("name_a", "name_b").cast("bigint").alias("edit_dist"),
        (
            F.lit(1.0)
            - F.levenshtein("name_a", "name_b")
            / F.greatest(F.length("name_a"), F.length("name_b")).cast("double")
        ).alias("sim"),
    )


def q_b14_regex_funcs(spark, sf_dir):
    """Regex battery (B14 depth): extract / replace / match over part
    names. DuckDB regexp_replace is single-match unless the 'g' flag is
    passed — the oracle says so explicitly."""
    p = _t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.regexp_extract("p_name", r"(\w+)$", 1).alias("last_word"),
        F.regexp_replace("p_name", r"[aeiou]", "_").alias("devoweled"),
        F.col("p_name").rlike(r"^[a-m]").cast("boolean").alias("first_half"),
        F.regexp_extract("p_type", r"(\w+)", 1).alias("type_head"),
    )


def q_b14_null_funcs(spark, sf_dir):
    """Null-handling scalar battery (B14 depth): coalesce / nullif /
    nvl2-shape / null-safe equality over a column made sparse on a
    deterministic key."""
    c = _t(spark, sf_dir, "customer")
    sparse = F.when(F.col("c_custkey") % 3 == 0, F.col("c_name"))
    return c.select(
        "c_custkey",
        F.coalesce(sparse, F.lit("<missing>")).alias("comment_or_default"),
        F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")).alias("seg_nb"),
        F.when(sparse.isNotNull(), F.lit("has")).otherwise(F.lit("none")).alias(
            "nvl2_shape"
        ),
        sparse.eqNullSafe(F.col("c_name")).alias("nullsafe_eq"),
        F.isnull(sparse).alias("is_missing"),
    )


def q_b14_bitwise_funcs(spark, sf_dir):
    """Bitwise scalar battery (B14 depth): shifts, masks, xor, popcount —
    the ops flag-packing/bloom-ish code paths need. All integer-exact on
    any engine."""
    o = _t(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    return o.select(
        "o_orderkey",
        F.shiftleft(k, 3).alias("shl3"),
        F.shiftright(k, 2).alias("shr2"),
        k.bitwiseAND(F.lit(0xFF)).alias("low_byte"),
        k.bitwiseOR(F.lit(0x10)).alias("with_flag"),
        k.bitwiseXOR(F.col("o_custkey")).alias("xor_cust"),
        F.bit_count(k).cast("bigint").alias("popcount"),
    )


def q_b14_url_funcs(spark, sf_dir):
    """URL-ish parsing (B14 depth) via engine-equal regexes over synthetic
    URLs built from order columns (no parse_url dependency — DuckDB lacks
    it, and regex keeps both engines on identical semantics)."""
    o = _t(spark, sf_dir, "orders")
    url = F.concat(
        F.lit("https://shard"),
        (F.col("o_orderkey") % 8).cast("string"),
        F.lit(".example.com/orders/"),
        F.col("o_orderkey").cast("string"),
        F.lit("?prio="),
        F.regexp_replace("o_orderpriority", r"\s+", "+"),
    )
    return o.select(
        "o_orderkey",
        url.alias("url"),
        F.regexp_extract(url, r"^https://([^/]+)/", 1).alias("host"),
        F.regexp_extract(url, r"^https://[^/]+(/[^?]*)", 1).alias("path"),
        F.regexp_extract(url, r"prio=([^&]+)", 1).alias("prio_param"),
    )


def q_b14_date_funcs(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("bigint").alias("yr"),
        F.month("o_orderdate").cast("bigint").alias("mo"),
        F.dayofmonth("o_orderdate").cast("bigint").alias("dom"),
        F.date_trunc("month", F.col("o_orderdate")).alias("month_start"),
        F.unix_timestamp("o_orderdate").alias("epoch_s"),
        F.datediff(
            F.lit("1998-12-31").cast("date"), F.col("o_orderdate").cast("date")
        ).cast("bigint").alias("days_to_eoy"),
    )


def q_b15_funnel(spark, sf_dir):
    """Ordered funnel analysis (B15 depth): view → click → purchase per
    user, each step's timestamp the MIN strictly after the previous
    step's — the sequential-pattern read of the event stream. Three
    keyed agg passes (one per step), each a partial+final hash agg on
    user_id; no window over the whole stream, no cartesian."""
    ev = _t(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    s1 = ev.filter(F.col("event_type") == "view").groupBy("user_id").agg(
        F.min("ts").alias("t1")
    )
    s2 = (
        ev.filter(F.col("event_type") == "click")
        .join(s1, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    s3 = (
        ev.filter(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    return (
        s1.agg(F.count(F.lit(1)).cast("bigint").alias("n_view"))
        .crossJoin(s2.agg(F.count(F.lit(1)).cast("bigint").alias("n_click_after_view")))
        .crossJoin(s3.agg(F.count(F.lit(1)).cast("bigint").alias("n_purchase_after_click")))
    )


def q_b15_cohorts(spark, sf_dir):
    """Cohort retention (B15 depth): users bucketed by first-seen week,
    activity counted per (cohort week, week offset) — the standard
    retention triangle. One min-agg for cohort assignment (broadcast
    back), one distinct-count agg; weeks via date_trunc so both engines
    bucket identically (Monday start) (derive.py: cohort_retention)."""
    ev = _t(spark, sf_dir, "events").select("user_id", "ts")
    return derive.cohort_retention(ev, "user_id", "ts").withColumnRenamed(
        "period_offset", "week_offset"
    )


def q_b15_forward_fill(spark, sf_dir):
    """Forward-fill / LOCF imputation (B15 depth, r7): per-cohort daily
    mean purchase value on the dense calendar with missing days carrying
    the LAST OBSERVED value forward (and staying NULL before the first
    observation) — the imputation rule feature pipelines apply after
    densification (b15_gap_fill zeros COUNTS; values need carry-forward,
    not zeros). One window with ``last(ignorenulls=True)`` over the
    dense grid; value quantized to cents before the mean so the carried
    number is engine-exact."""
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events").select(
        F.pmod(F.col("user_id"), F.lit(10)).alias("cohort"),
        F.to_date("ts").alias("day"),
        F.col("value"),
        F.col("event_type"),
    )
    sparse = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("cohort", "day")
        .agg(
            # quantize each value to integer cents BEFORE summing (a
            # float sum's order differs per engine and one ulp would
            # flip a floor on the total)
            (
                F.sum(F.floor(F.col("value") * 100).cast("long"))
                / (F.count(F.lit(1)) * F.lit(100.0))
            ).alias("__raw")
        )
        .select("cohort", "day", F.round("__raw", 6).alias("__obs"))
    )
    bounds = ev.agg(F.min("day").alias("__lo"), F.max("day").alias("__hi"))
    calendar = bounds.select(F.explode(F.sequence("__lo", "__hi")).alias("day"))
    grid = ev.select("cohort").distinct().crossJoin(F.broadcast(calendar))
    dense = grid.join(sparse, ["cohort", "day"], "left")
    w = Window.partitionBy("cohort").orderBy(F.col("day").asc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    return dense.select(
        "cohort",
        "day",
        (F.col("__obs").isNotNull()).alias("observed"),
        F.last("__obs", ignorenulls=True).over(w).alias("value_filled"),
    )


def q_b15_concurrency(spark, sf_dir):
    """Peak concurrent sessions per day (B15 depth, r7) — the classic
    sweep-line / interval-stabbing aggregate (capacity planning, rate
    limiting, connection-pool sizing): sessions become ±1 boundary
    events, concurrency is the running sum over the boundary order, the
    answer is the per-day max. The running sum is the TWO-PHASE scan
    (the prefix_sum pattern with natural day buckets): within-day
    running totals partition by day and parallelize; each day's BASE
    (sessions already open at midnight) is a cumulative sum over the
    |days|-row per-day delta relation — the only single-partition
    window, bounded — broadcast back. All integers; boundary ties order
    (sec, delta DESC, user, session): a session starting the same
    second another ends counts as overlapping on both engines."""
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    s = derive.sessionize(ev, "user_id", "ts", "event_id")
    sec = F.unix_timestamp(F.col("ts").cast("timestamp"))
    sess = (
        s.withColumn("__sec", sec)
        .groupBy("user_id", "session_id")
        .agg(F.min("__sec").alias("__start"), F.max("__sec").alias("__end"))
    )
    starts = sess.select(
        "user_id", "session_id", F.col("__start").alias("sec"), F.lit(1).alias("delta")
    )
    ends = sess.select(
        "user_id",
        "session_id",
        (F.col("__end") + F.lit(1)).alias("sec"),
        F.lit(-1).alias("delta"),
    )
    deltas = starts.unionByName(ends).withColumn(
        "day", F.expr("sec div 86400").cast("long")
    )
    w_in = Window.partitionBy("day").orderBy(
        F.col("sec").asc(),
        F.col("delta").desc(),
        F.col("user_id").asc(),
        F.col("session_id").asc(),
    )
    running = deltas.withColumn(
        "__run",
        F.sum("delta").over(w_in.rowsBetween(Window.unboundedPreceding, 0)),
    )
    day_tot = deltas.groupBy("day").agg(F.sum("delta").alias("__t"))
    base = day_tot.select(
        "day",
        F.coalesce(
            F.sum("__t").over(
                Window.orderBy(F.col("day").asc()).rowsBetween(
                    Window.unboundedPreceding, -1
                )
            ),
            F.lit(0),
        ).alias("__base"),
    )
    return (
        running.join(F.broadcast(base), "day")
        .groupBy("day")
        .agg(
            F.max(F.col("__base") + F.col("__run"))
            .cast("long")
            .alias("max_concurrency"),
            F.sum(F.when(F.col("delta") == 1, 1).otherwise(0))
            .cast("long")
            .alias("n_sessions_started"),
        )
    )


def q_b15_gap_fill(spark, sf_dir):
    """Calendar gap-filling / densification (B15 depth, r7): per-cohort
    daily event counts with MISSING DAYS EXPLICIT as zero rows — the
    densify step every time-series consumer needs before windows,
    EWMA, or change-point scans (a missing day silently skews any
    frame-based statistic; the b11/b3 rows all assume dense input).
    Shape: one keyed agg for the sparse counts; the calendar comes from
    ONE 1-row min/max agg exploded through sequence() (never a
    driver-side date loop); the (cohort × day) grid is |cohorts|·|days|
    — dimension-sized, built by broadcast — and the sparse counts LEFT
    join onto it. Integers end-to-end."""
    ev = _t(spark, sf_dir, "events").select(
        F.pmod(F.col("user_id"), F.lit(20)).alias("cohort"),
        F.to_date("ts").alias("day"),
    )
    sparse = ev.groupBy("cohort", "day").agg(
        F.count(F.lit(1)).cast("long").alias("__n")
    )
    bounds = ev.agg(
        F.min("day").alias("__lo"), F.max("day").alias("__hi")
    )
    calendar = bounds.select(
        F.explode(F.sequence("__lo", "__hi")).alias("day")
    )
    cohorts = ev.select("cohort").distinct()
    grid = cohorts.crossJoin(F.broadcast(calendar))
    return (
        grid.join(sparse, ["cohort", "day"], "left")
        .select(
            "cohort",
            "day",
            F.coalesce("__n", F.lit(0)).cast("long").alias("n_events"),
        )
    )


def q_b15_rfm(spark, sf_dir):
    """RFM user segmentation (B15 behavioral depth): recency /
    frequency / monetary quintiles with id tie-breaks over the
    per-user relation (bounded — never a window over the raw stream);
    monetary in exact integer cents (derive.py: rfm_segments)."""
    ev = _t(spark, sf_dir, "events")
    return derive.rfm_segments(ev)


def q_b15_markov(spark, sf_dir):
    """First-order Markov transition matrix over per-user event
    sequences (B15 sequence depth): what follows what, as counts +
    probabilities — one lead() window keyed by user, integer counts,
    one rounded division; output bounded by |event types|²
    (derive.py: markov_transitions)."""
    ev = _t(spark, sf_dir, "events")
    return derive.markov_transitions(ev)


def q_b13_schema_union(spark, sf_dir):
    """Schema-evolution-tolerant union (B13 depth): two generations of
    a feed with added/dropped columns union BY NAME with missing
    columns null-filled — `unionByName(allowMissingColumns=True)`,
    DuckDB's `UNION ALL BY NAME`. The everyday operation when a
    producer adds a field mid-stream."""
    o = _t(spark, sf_dir, "orders")
    gen1 = o.filter(F.col("o_orderkey") % 2 == 0).select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    gen2 = o.filter(F.col("o_orderkey") % 2 == 1).select(
        "o_orderkey",
        "o_orderstatus",
        F.col("o_orderpriority").alias("priority"),
    )
    both = gen1.unionByName(gen2, allowMissingColumns=True)
    return both.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.count("o_totalprice").alias("n_with_price"),
        F.count("priority").alias("n_with_priority"),
    )


def q_b15_retention(spark, sf_dir):
    """Cohort retention curves (B15 depth, r8) — the product-analytics
    staple b15_cohorts stops short of: users cohorted by first-active
    epoch week (integer ``sec div 604800``), then for every
    (cohort, week-offset) cell the share of the cohort still active —
    the decay curve per acquisition wave. Three keyed aggs (first
    week per user, distinct user-weeks, cell counts) + one broadcast
    join of the |cohorts|-row size table; retention divides once at
    the end (round 6). No window over the stream anywhere."""
    ev = _t(spark, sf_dir, "events").select("user_id", "ts")
    week = F.expr(
        "cast(floor(unix_timestamp(cast(ts as timestamp))) as bigint) div 604800"
    )
    uw = ev.select("user_id", week.alias("__wk")).distinct()
    first = uw.groupBy("user_id").agg(F.min("__wk").alias("__cw"))
    cells = (
        uw.join(first, "user_id")
        .groupBy("__cw", (F.col("__wk") - F.col("__cw")).alias("week_offset"))
        .agg(F.countDistinct("user_id").cast("long").alias("n_active"))
    )
    sizes = first.groupBy("__cw").agg(
        F.count(F.lit(1)).cast("long").alias("cohort_size")
    )
    return (
        cells.join(F.broadcast(sizes), "__cw")
        .select(
            F.col("__cw").cast("long").alias("cohort_week"),
            F.col("week_offset").cast("long").alias("week_offset"),
            "n_active",
            "cohort_size",
            F.round(
                F.col("n_active") / F.col("cohort_size").cast("double"), 6
            ).alias("retention"),
        )
    )


def q_b17_join_view(spark, sf_dir):
    """Incremental JOIN-view maintenance (B17 depth, r8): the standing
    orders⋈customer view folds a CDC batch touching BOTH sides —
    orders %13 re-priced (+1), customers %17 re-balanced (+5) — via
    the delta rule Δ(A⋈B) = ΔA⋈B_old + A_old⋈ΔB + ΔA⋈ΔB with
    multiplying tuple weights (derive.incremental_join_view). Cost ∝
    batch ⋈ snapshots; the base join is NEVER recomputed. The oracle
    recomputes the join over the post-batch tables, so the driver row
    IS the increment-equals-recompute invariant."""
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    cust = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_name", "c_acctbal"
    )
    view = orders.join(cust, "o_custkey")
    a_del = orders.filter(F.col("o_orderkey") % 13 == 0)
    a_ins = a_del.withColumn(
        "o_totalprice", F.round(F.col("o_totalprice") + 1.0, 2)
    )
    b_del = cust.filter(F.col("o_custkey") % 17 == 0)
    b_ins = b_del.withColumn(
        "c_acctbal", F.round(F.col("c_acctbal") + 5.0, 2)
    )
    return derive.incremental_join_view(
        view, orders, cust, "o_custkey",
        a_inserts=a_ins, a_deletes=a_del,
        b_inserts=b_ins, b_deletes=b_del,
    )


def q_b14_trig_funcs(spark, sf_dir):
    """Math/trig function-surface parity (B14 depth, r8): sin/cos/tan,
    atan2, sqrt (IEEE-exact), exp, pow, degrees/radians, sign — all
    rounded 6 so libm last-ulp differences between the JVM and C
    implementations can never surface. Pure narrow map."""
    p = _t(spark, sf_dir, "part")
    x = F.col("p_size").cast("double") / 10.0
    y = (F.col("p_partkey") % 13).cast("double") / 7.0
    return p.select(
        "p_partkey",
        F.round(F.sin(x), 6).alias("sin_x"),
        F.round(F.cos(x), 6).alias("cos_x"),
        F.round(F.tan(y), 6).alias("tan_y"),
        F.round(F.atan2(y, x + F.lit(0.1)), 6).alias("atan2_yx"),
        F.round(F.sqrt(F.col("p_retailprice").cast("double")), 6).alias("sqrt_p"),
        F.round(F.exp(-x), 6).alias("exp_nx"),
        F.round(F.pow(x + F.lit(1.0), 3), 6).alias("pow3"),
        F.round(F.degrees(y), 6).alias("deg_y"),
        F.round(F.radians(F.col("p_size").cast("double")), 6).alias("rad_s"),
        F.signum(F.col("p_size").cast("double") - 25.0).cast("int").alias("sgn"),
    )


def q_b15_acf(spark, sf_dir):
    """Daily-count autocorrelation, lags 1–7 (B15 time-series depth,
    r9): the seasonality detector behind b3_anomaly's lag-7 choice.
    Exact integer algebra: with n days, S = Σx, the centered value is
    c_t = n·x_t − S (integer), and acf_ℓ = Σ c_t·c_{t−ℓ} / Σ c_t² —
    both int64 sums — so the only float is the final division. The
    stream contracts to the |days| relation before any window (the
    psi/changepoint rule); the 7 lags unpivot from ONE agg row."""
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.expr(
            "cast(floor(unix_timestamp(cast(ts as timestamp))) as bigint)"
            " div 86400"
        ).alias("day")
    ).agg(F.count(F.lit(1)).cast("long").alias("x"))
    totals = daily.agg(
        F.count(F.lit(1)).cast("long").alias("__n"),
        F.sum("x").cast("long").alias("__s"),
    )
    c = daily.crossJoin(F.broadcast(totals)).select(
        "day", (F.col("__n") * F.col("x") - F.col("__s")).alias("c")
    )
    w = Window.orderBy(F.col("day").asc())
    lagged = c.select(
        "c",
        *[F.lag("c", l).over(w).alias(f"c{l}") for l in range(1, 8)],
    )
    aggs = [F.sum(F.col("c") * F.col("c")).cast("long").alias("den")]
    for l in range(1, 8):
        aggs.append(
            F.sum(F.col("c") * F.col(f"c{l}")).cast("long").alias(f"num{l}")
        )
        aggs.append(
            F.count(F.col(f"c{l}")).cast("long").alias(f"np{l}")
        )
    one = lagged.agg(*aggs)
    return one.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(l).cast("int").alias("lag"),
                        F.col(f"np{l}").alias("n_pairs"),
                        F.round(
                            F.col(f"num{l}").cast("double")
                            / F.col("den").cast("double"),
                            6,
                        ).alias("acf"),
                    )
                    for l in range(1, 8)
                ]
            )
        ).alias("__s")
    ).select("__s.lag", "__s.n_pairs", "__s.acf")


def q_b13_block_digests(spark, sf_dir):
    """Hierarchical replica reconciliation (B13 depth, r9 wave 3): the
    SCALABLE way to verify a 100 TB replica — exchange |blocks|
    (count, xor-of-row-hashes) digests instead of rows (b1_snapshot_diff
    is the row-level tool; this is what you run FIRST to find which
    key ranges diverged). Blocks are o_orderkey div 512; the row hash
    is the portable md5-60 over a canonical rendering, folded with
    bit_xor (order-independent, overflow-free, map-side combinable).
    The replica here injects a one-cent drift on keys ≡ 0 mod 997;
    output = diverged blocks only. Reference anchor: the change
    stream exists to feed replicas (README.md:26-30) — this is the
    audit that closes that loop."""
    from sqlite_cdc_spark.pipeline.dedup import portable_hash60

    base = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.floor(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        "o_orderstatus",
    )
    replica = base.withColumn(
        "cents",
        F.when(
            F.col("o_orderkey") % 997 == 0, F.col("cents") + 1
        ).otherwise(F.col("cents")),
    )

    def digests(df, n_col, d_col):
        h = portable_hash60(
            F.concat_ws(
                "|",
                F.col("o_orderkey").cast("string"),
                F.col("cents").cast("string"),
                F.col("o_orderstatus"),
            )
        )
        return (
            df.select(
                F.expr("o_orderkey div 512").alias("block"), h.alias("__h")
            )
            .groupBy("block")
            .agg(
                F.count(F.lit(1)).cast("long").alias(n_col),
                F.expr("bit_xor(__h)").alias(d_col),
            )
        )

    b = digests(base, "base_n", "base_digest")
    r = digests(replica, "repl_n", "repl_digest")
    return b.join(r, "block", "full").filter(
        (F.col("base_n") != F.col("repl_n"))
        | (F.col("base_digest") != F.col("repl_digest"))
        | F.col("base_n").isNull()
        | F.col("repl_n").isNull()
    )


def q_b13_zorder_layout(spark, sf_dir):
    """Z-order layout audit (B13 storage depth, r9 wave 4): the
    multi-dimensional clustering math behind 100 TB data-skipping
    layouts. Rows map to a 16-bit Morton code over (partkey, suppkey)
    buckets; 64-cell Z-blocks then report per-block min/max spans of
    BOTH dimensions — the zone-map width a reader would prune against.
    A Z-ordered file layout keeps both spans small simultaneously
    (which neither single-key sort achieves); the block relation is
    <=1024 rows, so every zone map replays in the driver hash. The
    interleave expression is generated once and executed verbatim by
    both engines (`_zorder_expr_sql`)."""
    li = _t(spark, sf_dir, "lineitem")
    blocks = (
        li.select(
            F.expr(f"CAST(({_zorder_expr_sql()}) AS BIGINT) >> 6")
            .alias("zblock"),
            (F.col("l_partkey") % 256).alias("pb"),
            (F.col("l_suppkey") % 256).alias("sb"),
        )
        .groupBy("zblock")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.min("pb").cast("long").alias("pk_lo"),
            F.max("pb").cast("long").alias("pk_hi"),
            F.min("sb").cast("long").alias("sk_lo"),
            F.max("sb").cast("long").alias("sk_hi"),
        )
    )
    return blocks.select(
        "zblock",
        "n_rows",
        "pk_lo",
        "pk_hi",
        "sk_lo",
        "sk_hi",
        (F.col("pk_hi") - F.col("pk_lo") + 1).alias("pk_span"),
        (F.col("sk_hi") - F.col("sk_lo") + 1).alias("sk_span"),
    )


def q_b15_hazard(spark, sf_dir):
    """Discrete survival hazard curve (B15 depth, r9 wave 7 — the
    churn-analysis shape beside retention/cohorts): per lifetime-day t,
    the risk set (users surviving ≥ t), observed churn events, and
    right-censored users (last activity inside the final 24 observed
    hours — their true lifetime is unknown). hazard(t) = d_t/n_t ships
    as integer micros; the Kaplan–Meier survival curve is one product
    away for the reader, and every input to it is exact here. Lifetimes
    are HOURS (the fixture's 30-day span makes day buckets degenerate —
    3 distinct lifetimes; hours give ~46). The stream contracts to one
    row per user, then to the |lifetimes|-hour relation BEFORE the
    descending cumulative (the b15_acf rule)."""
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events").select(
        "user_id",
        F.expr(
            "cast(floor(unix_timestamp(cast(ts as timestamp))) as bigint)"
            " div 3600"
        ).alias("hr"),
    )
    per_user = ev.groupBy("user_id").agg(
        F.min("hr").alias("first_hr"), F.max("hr").alias("last_hr")
    )
    end = ev.agg(F.max("hr").alias("__end"))
    lived = per_user.crossJoin(F.broadcast(end)).select(
        (F.col("last_hr") - F.col("first_hr")).alias("t"),
        F.when(F.col("last_hr") <= F.col("__end") - 24, 1)
        .otherwise(0)
        .alias("churned"),
    )
    per_t = lived.groupBy("t").agg(
        F.sum("churned").cast("long").alias("d_events"),
        F.sum(F.lit(1) - F.col("churned")).cast("long").alias("c_censored"),
    )
    w = Window.orderBy(F.col("t").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        per_t.withColumn(
            "n_risk", F.sum(F.col("d_events") + F.col("c_censored")).over(w)
        )
        .select(
            F.col("t").alias("lifetime_hours"),
            "n_risk",
            "d_events",
            "c_censored",
            F.expr("(d_events * 1000000) div n_risk")
            .cast("long")
            .alias("hazard_micros"),
        )
    )


def q_b14_format_funcs(spark, sf_dir):
    """String formatting/padding function surface (B14 breadth, r9
    wave 8): lpad/rpad, repeat, reverse, translate, ascii/chr,
    left/right, split_part/instr — the remaining shared-dialect string
    tools beside the regex/scalar/url rows. Pure per-row codegen; the
    sample is keyset-paged for a deterministic LIMIT."""
    n = _t(spark, sf_dir, "nation")
    return (
        n.orderBy("n_nationkey")
        .limit(10)
        .select(
            "n_nationkey",
            F.expr("lpad(n_name, 12, '.')").alias("padded_l"),
            F.expr("rpad(n_name, 12, '.')").alias("padded_r"),
            F.expr("repeat(substring(n_name, 1, 2), 3)").alias("repeated"),
            F.reverse("n_name").alias("reversed"),
            F.expr("translate(n_name, 'NAT', 'nat')").alias("translated"),
            F.ascii("n_name").cast("int").alias("first_byte"),
            F.expr("chr(65 + n_nationkey % 26)").alias("letter"),
            F.expr("left(n_name, 6)").alias("left6"),
            F.expr("right(n_name, 2)").alias("right2"),
            F.expr("split_part(n_name, '_', 2)").alias("num_part"),
            F.expr("instr(n_name, '_')").cast("long").alias("underscore_at"),
        )
    )


def q_b13_file_skipping(spark, sf_dir):
    """Data-skipping effectiveness audit (B13 storage depth, r9 wave 9
    — the zone-map CONSUMER beside b13_zorder_layout's producer): model
    files as 2000-order blocks of the orderkey-clustered layout, keep
    per-file min/max ship-date stats (what parquet footers carry), and
    measure how many files a ship-date range predicate can prune. The
    answer quantifies the clustering-correlation problem: orderkey
    clustering barely prunes date predicates — the number that
    motivates date partitioning or Z-order. Integer day arithmetic."""
    li = _t(spark, sf_dir, "lineitem").select(
        F.expr("l_orderkey div 2000").alias("file_id"),
        F.expr(
            "cast(floor(unix_timestamp(l_shipdate)) as bigint) div 86400"
        ).alias("day"),
    )
    stats = li.groupBy("file_id").agg(
        F.min("day").alias("min_day"),
        F.max("day").alias("max_day"),
        F.count(F.lit(1)).cast("long").alias("n_rows"),
    )
    # predicate: 1996 H1 (epoch days, computed identically both engines)
    lo = F.expr(
        "cast(floor(unix_timestamp(cast('1996-01-01' as timestamp)))"
        " as bigint) div 86400"
    )
    hi = F.expr(
        "cast(floor(unix_timestamp(cast('1996-07-01' as timestamp)))"
        " as bigint) div 86400"
    )
    flagged = stats.select(
        "n_rows",
        ((F.col("max_day") < lo) | (F.col("min_day") >= hi)).alias(
            "__skippable"
        ),
    )
    return flagged.agg(
        F.count(F.lit(1)).cast("long").alias("n_files"),
        F.sum(F.when(F.col("__skippable"), 1).otherwise(0))
        .cast("long")
        .alias("n_skipped"),
        F.sum(F.when(F.col("__skippable"), F.col("n_rows")).otherwise(0))
        .cast("long")
        .alias("rows_skipped"),
        F.expr(
            "(sum(CASE WHEN __skippable THEN 1 ELSE 0 END) * 1000000)"
            " div count(1)"
        )
        .cast("long")
        .alias("skip_rate_micros"),
    )


def q_b14_hof_funcs(spark, sf_dir):
    """Array higher-order-function surface (B14 depth, r10 —
    lambda expressions; complements b14_array_funcs' split/sort ops):
    transform/filter/aggregate/exists/forall + array_sort over the
    token arrays — the lambda-expression API a reference user needs
    for in-row array computing. Caveat stated where it matters: HOF
    lambdas evaluate interpreted per element, so the repo's HOT paths
    use codegen rewrites instead (text.fingerprint_rows' posexplode +
    lead replaced a transform() lambda at ~50×, PERF.md); this family
    row is the API-coverage read, over bounded per-doc arrays."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    toks = textops.tokens("text")
    return docs.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tok"),
        F.size(F.filter(toks, lambda t: F.length(t) > 3))
        .cast("long")
        .alias("n_long"),
        F.aggregate(
            F.transform(toks, lambda t: F.length(t).cast("long")),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("total_chars"),
        F.exists(toks, lambda t: t == F.lit("spark")).alias("has_spark"),
        F.forall(toks, lambda t: F.length(t) <= 10).alias("all_short"),
        F.element_at(F.array_sort(toks), 1).alias("first_sorted"),
    )


def q_b15_bursts(spark, sf_dir):
    """Burst detection over the event stream (B15 depth, r11): hourly
    per-type counts, each hour compared against its TRAILING window of
    the previous 6 hour-slots via an integer RANGE frame on the hour
    index (gaps in the series stay gaps — a rows-frame would silently
    reach back across them). An hour is a burst when its count ≥ 3× the
    trailing mean with ≥ 3 observed trailing hours; the comparison is
    cross-multiplied (n · trail_hours ≥ 3 · trail_sum) so the screen is
    INTEGER-exact — no division anywhere. One keyed agg + one ranged
    window; shuffle keys are (event_type), cardinality-bounded."""
    ev = _t(spark, sf_dir, "events").select("event_type", "ts")
    hr = F.expr(
        "unix_micros(cast(ts as timestamp)) div 3600000000"
    ).cast("long")
    hourly = ev.groupBy("event_type", hr.alias("hr_idx")).agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    from pyspark.sql import Window

    w = (
        Window.partitionBy("event_type")
        .orderBy(F.col("hr_idx").asc())
        .rangeBetween(-6, -1)
    )
    trail = hourly.select(
        "event_type",
        "hr_idx",
        "n",
        F.coalesce(F.sum("n").over(w), F.lit(0)).cast("long").alias(
            "trail_sum"
        ),
        F.count(F.lit(1)).over(w).cast("long").alias("trail_hours"),
    )
    return trail.select(
        "event_type",
        "hr_idx",
        "n",
        "trail_sum",
        "trail_hours",
        (
            (F.col("trail_hours") >= 3)
            & (
                F.col("n") * F.col("trail_hours")
                >= F.lit(3) * F.col("trail_sum")
            )
        ).alias("is_burst"),
    )


def q_b15_interarrival(spark, sf_dir):
    """Inter-arrival time distribution per event type (B15 depth, r11):
    exact integer-microsecond gaps between consecutive events (total
    (ts, event_id) order), summarized as exact ORDER-STATISTIC
    percentiles — rank ⌊(n−1)·p⌋+1, the nearest-rank definition — so
    p50/p90/p99 are actual observed gaps, not interpolated floats (the
    cross-engine percentile_cont/quantile interpolation mismatch never
    arises). The capacity/SLO read: p99 inter-arrival bounds the
    burst head-room a consumer needs. Shape: one lag window + one
    rank window on the same (type) key + a keyed agg — all integer."""
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events").select("event_type", "ts", "event_id")
    wt = Window.partitionBy("event_type").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    us = F.expr("unix_micros(cast(ts as timestamp))")
    gaps = (
        ev.select(
            "event_type",
            (us - F.lag(us).over(wt)).cast("long").alias("gap_us"),
        )
        .filter(F.col("gap_us").isNotNull())
    )
    wr = Window.partitionBy("event_type").orderBy(F.col("gap_us").asc())
    wn = Window.partitionBy("event_type")
    ranked = gaps.select(
        "event_type",
        "gap_us",
        F.row_number().over(wr).alias("__rn"),
        F.count(F.lit(1)).over(wn).alias("__n"),
    )

    def pick(p):
        k = F.floor((F.col("__n") - 1) * F.lit(p) / F.lit(100)) + 1
        return F.max(F.when(F.col("__rn") == k, F.col("gap_us")))

    return ranked.groupBy("event_type").agg(
        F.max("__n").cast("long").alias("n_gaps"),
        F.min("gap_us").cast("long").alias("min_us"),
        pick(50).cast("long").alias("p50_us"),
        pick(90).cast("long").alias("p90_us"),
        pick(99).cast("long").alias("p99_us"),
        F.max("gap_us").cast("long").alias("max_us"),
    )


def q_b13_merkle_diff(spark, sf_dir):
    """Two-level Merkle reconciliation (B13 depth, r11 — the LOG-WORK
    upgrade of b13_block_digests' flat block scan): level-0 blocks
    (o_orderkey div 512, xor-of-row-hash digests) roll up into level-1
    supernodes of 16 blocks whose digest is the xor of child digests;
    replicas compare |supernodes| digests FIRST and descend only into
    diverging subtrees — at 100 TB that is exchanging thousands of
    digests instead of millions, the standard anti-entropy shape
    (Dynamo/Cassandra repair). Same injected one-cent drift on keys ≡ 0
    mod 997. Output: one row per DIVERGING supernode — child-block
    counts total/diverged plus the first diverged block id, proving the
    descent localizes damage. xor folds are order-independent and
    map-side combinable at both levels; everything integer."""
    from sqlite_cdc_spark.pipeline.dedup import portable_hash60

    base = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.floor(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        "o_orderstatus",
    )
    replica = base.withColumn(
        "cents",
        F.when(
            F.col("o_orderkey") % 997 == 0, F.col("cents") + 1
        ).otherwise(F.col("cents")),
    )

    def level0(df, tag):
        h = portable_hash60(
            F.concat_ws(
                "|",
                F.col("o_orderkey").cast("string"),
                F.col("cents").cast("string"),
                F.col("o_orderstatus"),
            )
        )
        return (
            df.select(
                F.expr("o_orderkey div 512").alias("block"), h.alias("__h")
            )
            .groupBy("block")
            .agg(F.expr("bit_xor(__h)").alias(f"d_{tag}"))
        )
    l0 = level0(base, "a").join(level0(replica, "b"), "block")
    l0 = l0.select(
        "block",
        F.expr("block div 16").alias("super"),
        (F.col("d_a") != F.col("d_b")).alias("__div"),
        "d_a",
        "d_b",
    )
    l1 = l0.groupBy("super").agg(
        F.expr("bit_xor(d_a)").alias("s_a"),
        F.expr("bit_xor(d_b)").alias("s_b"),
        F.count(F.lit(1)).cast("long").alias("n_blocks"),
        F.sum(F.col("__div").cast("long")).cast("long").alias("n_diverged"),
        F.min(F.when(F.col("__div"), F.col("block"))).cast("long").alias(
            "first_diverged_block"
        ),
    )
    return l1.filter(F.col("s_a") != F.col("s_b")).select(
        F.col("super").cast("long").alias("supernode"),
        "n_blocks",
        "n_diverged",
        "first_diverged_block",
    )


def q_b17_incremental_topk(spark, sf_dir):
    """Incremental top-k view maintenance (B17 depth, r11 — the
    bounded-state leg of the incremental-view family beside the join
    view and counter merges): a standing per-flag top-10 (by price,
    totally ordered) absorbs a CDC batch by re-ranking ONLY the k·
    groups standing rows ∪ the batch — the classic monotone-view
    shortcut (a row outside the standing top-k can never enter it on
    INSERT-only deltas), cost ∝ batch + k·groups, never the corpus.
    The oracle recomputes the top-10 from the FULL table, so the
    driver row proves merge == recompute. Standing/batch split =
    orderkey mod 10."""
    cols = [
        "l_returnflag",
        "l_orderkey",
        "l_linenumber",
        "l_partkey",
        "l_suppkey",
        "l_extendedprice",
    ]
    li = _t(spark, sf_dir, "lineitem").select(*cols)
    order = [
        F.col("l_extendedprice").desc(),
        F.col("l_orderkey").asc(),
        F.col("l_linenumber").asc(),
        F.col("l_partkey").asc(),
        F.col("l_suppkey").asc(),
    ]
    standing = li.filter(F.col("l_orderkey") % 10 != 0)
    batch = li.filter(F.col("l_orderkey") % 10 == 0)
    st_topk = derive.topk_per_group(standing, ["l_returnflag"], order, 10)
    merged = derive.topk_per_group(
        st_topk.select(*cols).unionByName(batch), ["l_returnflag"], order, 10
    )
    return merged.select(
        "l_returnflag",
        F.col("rnk").cast("int").alias("rnk"),
        "l_orderkey",
        "l_linenumber",
        "l_extendedprice",
    )


def q_b13_partition_skew_audit(spark, sf_dir):
    """Partition-skew audit (B13 depth, r12): simulate the 32-way hash
    partitioning a shuffle would apply to lineitem on its join key
    (portable md5-60 of l_orderkey mod 32) and report the distribution
    health the salting/AQE-skew decision reads: per-bucket row count,
    distinct keys, the heaviest single key's rows (splittability — a
    bucket dominated by ONE key cannot be salted finer than that key),
    plus the global max/mean skew ratio and the integer-exact Gini of
    bucket sizes (Lorenz form G = 2·Σ(rank·n)/(B·Σn) − (B+1)/B over
    size-ascending buckets). At 100 TB this row is run BEFORE the big
    join: skew_ratio ≈ 1 → plain hash join; a fat bucket with many
    keys → more partitions; a fat bucket with one key → salting or an
    AQE skew split. Shape: one keyed agg to per-key counts, one agg to
    32 buckets, one 32-row window — nothing beyond the key table ever
    shuffles. All counts integer; ratios round-6 rationals."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey")
    per_key = li.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).cast("long").alias("__kn")
    )
    keyed = per_key.select(
        F.pmod(
            dedup.portable_hash60(F.col("l_orderkey").cast("string")),
            F.lit(32),
        ).alias("bucket"),
        "__kn",
    )
    buckets = keyed.groupBy("bucket").agg(
        F.sum("__kn").cast("long").alias("n_rows"),
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.max("__kn").cast("long").alias("max_key_rows"),
    )
    from pyspark.sql import Window

    w = Window.orderBy(F.col("n_rows").asc(), F.col("bucket").asc())
    ranked = buckets.withColumn("__r", F.row_number().over(w))
    tot = ranked.agg(
        F.sum("n_rows").alias("__tot"),
        F.max("n_rows").alias("__mx"),
        F.count(F.lit(1)).alias("__b"),
        F.sum(F.col("__r") * F.col("n_rows")).alias("__wsum"),
    )
    return ranked.crossJoin(F.broadcast(tot)).select(
        "bucket",
        "n_rows",
        "n_keys",
        "max_key_rows",
        F.round(
            F.col("n_rows").cast("double") / F.col("__tot"), 6
        ).alias("share"),
        F.round(
            F.col("__mx").cast("double") * F.col("__b") / F.col("__tot"), 6
        ).alias("skew_ratio"),
        F.round(
            F.lit(2.0) * F.col("__wsum")
            / (F.col("__b").cast("double") * F.col("__tot"))
            - (F.col("__b") + 1).cast("double") / F.col("__b"),
            6,
        ).alias("gini"),
    )


def q_b17_incremental_frontier(spark, sf_dir):
    """Incremental Pareto-frontier view (B17 depth, r12 — the SKYLINE
    leg of the incremental-view family beside the monotone top-k: the
    2-D frontier is a sublattice, frontier(frontier(A) ∪ B) ==
    frontier(A ∪ B), so a standing view absorbs an INSERT-only batch
    by re-sweeping ONLY its own rows ∪ the batch — cost ∝ batch +
    |frontier|, never the corpus). Standing/batch split = doc_id mod
    10; the oracle recomputes the frontier from the FULL table, so the
    driver row proves merge == recompute (the b17_incremental_topk
    contract, on a harder view shape: a batch row can EVICT standing
    frontier rows)."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    feats = textops.quality_features(docs).select(
        "doc_id", "lang", "quality_score",
        F.col("q_tokens").cast("long").alias("n_tok"),
    )
    standing = feats.filter(F.col("doc_id") % 10 != 0)
    batch = feats.filter(F.col("doc_id") % 10 == 0)
    st_front = sampling.pareto_frontier(
        standing, "lang", "quality_score", "n_tok"
    )
    merged = sampling.pareto_frontier(
        st_front.unionByName(batch), "lang", "quality_score", "n_tok"
    )
    from pyspark.sql import Window

    wr = Window.partitionBy("lang").orderBy(
        F.col("quality_score").desc(), F.col("n_tok").asc(),
        F.col("doc_id").asc(),
    )
    return merged.select(
        "lang",
        "doc_id",
        "quality_score",
        "n_tok",
        F.row_number().over(wr).cast("long").alias("frontier_rank"),
    )


def q_b13_delta_encoding(spark, sf_dir):
    """Delta+varint layout audit (B13 depth, r12 — the ENCODING-cost
    read beside b13_zorder_layout's clustering read and
    b13_file_skipping's pruning read: how many bytes does l_partkey
    cost under each candidate sort order?): within contiguous
    key-range buckets (the row-group proxy — buckets of a sort key ARE
    contiguous runs of that order), each value delta-encodes against
    its predecessor and the delta prices as a zigzag varint (exact
    integer CASE ladder, 1–8 bytes; bucket-first values price raw 8).
    Variant 'by_partkey' sorts by the audited column (deltas tiny);
    'by_orderkey' is the natural load order (deltas ~random). The gap
    is the measured \"sort before write\" win the layout decision
    reads. Shape: two bucket-partitioned lag windows + keyed aggs —
    no global window, no shuffle beyond the bucket sort."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_partkey"
    )
    from pyspark.sql import Window

    def priced(bucket_col, order_cols, variant):
        w = Window.partitionBy("__b").orderBy(*order_cols)
        d = li.withColumn("__b", bucket_col).withColumn(
            "__prev", F.lag("l_partkey").over(w)
        )
        delta = F.col("l_partkey") - F.col("__prev")
        zig = F.when(delta >= 0, 2 * delta).otherwise(-2 * delta - 1)
        vbytes = (
            F.when(F.col("__prev").isNull(), 8)
            .when(zig < (1 << 7), 1)
            .when(zig < (1 << 14), 2)
            .when(zig < (1 << 21), 3)
            .when(zig < (1 << 28), 4)
            .when(zig < (1 << 35), 5)
            .when(zig < (1 << 42), 6)
            .when(zig < (1 << 49), 7)
            .otherwise(8)
        )
        return d.select(vbytes.alias("__bytes")).agg(
            F.lit(variant).alias("variant"),
            F.count(F.lit(1)).cast("long").alias("n_values"),
            F.sum("__bytes").cast("long").alias("total_bytes"),
            F.round(
                F.sum("__bytes").cast("double") / F.count(F.lit(1)), 6
            ).alias("bytes_per_value"),
            F.round(
                F.lit(1.0)
                - F.sum("__bytes").cast("double")
                / (8.0 * F.count(F.lit(1))),
                6,
            ).alias("savings_vs_raw"),
        )

    by_part = priced(
        F.expr("l_partkey div 512"),
        [
            F.col("l_partkey").asc(),
            F.col("l_orderkey").asc(),
            F.col("l_linenumber").asc(),
        ],
        "by_partkey",
    )
    by_order = priced(
        F.expr("l_orderkey div 512"),
        [F.col("l_orderkey").asc(), F.col("l_linenumber").asc(),
         F.col("l_partkey").asc()],
        "by_orderkey",
    )
    return by_part.unionByName(by_order)


def q_b13_rle_encoding(spark, sf_dir):
    """Run-length-encoding layout audit (B13 depth, r13 — the RLE leg
    beside b13_delta_encoding's delta+varint leg: delta prices a
    monotone-ish NUMERIC column, RLE prices a LOW-CARDINALITY one, and
    together they cover the two encodings a columnar writer actually
    chooses between): within l_orderkey-div-512 buckets (the row-group
    proxy), l_returnflag runs are counted under the clustered sort
    (returnflag first) vs the natural load order, and each run prices
    as 1 dictionary byte + a varint run length (1 byte < 128, else 2 —
    runs are bucket-bounded). The gap is the measured "cluster before
    write" win for enum-ish columns.

    The run segmentation CONTRACTS to the distinct sort-grain first
    (group by bucket + ordering columns, carrying a row count): the
    synthetic feed contains full-duplicate rows, so the raw relation
    has no total order and a lag-then-cumsum over it is not
    well-defined (tied rows may permute between the two window
    evaluations — measured as a phantom extra run); on the contracted
    relation the ordering IS total, both engines replay identically,
    and run lengths come back as the sum of carried counts. The
    contraction is also the scale shape: the windowed relation shrinks
    to the distinct grain. Two bucket-partitioned window passes +
    keyed aggs — no global window."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_returnflag"
    )
    from pyspark.sql import Window

    grain = (
        li.withColumn("__b", F.expr("l_orderkey div 512"))
        .groupBy("__b", "l_orderkey", "l_linenumber", "l_returnflag")
        .agg(F.count(F.lit(1)).cast("long").alias("__cnt"))
    )

    def priced(order_cols, variant):
        w = Window.partitionBy("__b").orderBy(*order_cols)
        d = grain.withColumn("__prev", F.lag("l_returnflag").over(w))
        new_run = (
            F.col("__prev").isNull()
            | (F.col("__prev") != F.col("l_returnflag"))
        ).cast("long")
        wsum = (
            Window.partitionBy("__b")
            .orderBy(*order_cols)
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        runs = (
            d.withColumn("__rid", F.sum(new_run).over(wsum))
            .groupBy("__b", "__rid")
            .agg(F.sum("__cnt").cast("long").alias("__len"))
            .select(
                "__len",
                F.when(F.col("__len") < 128, 2).otherwise(3).alias("__rb"),
            )
        )
        return runs.agg(
            F.lit(variant).alias("variant"),
            F.sum("__len").cast("long").alias("n_values"),
            F.count(F.lit(1)).cast("long").alias("n_runs"),
            F.sum("__rb").cast("long").alias("rle_bytes"),
            F.round(
                F.sum("__rb").cast("double") / F.sum("__len"), 6
            ).alias("bytes_per_value"),
            F.round(
                F.lit(1.0) - F.sum("__rb").cast("double") / F.sum("__len"),
                6,
            ).alias("savings_vs_dict"),
        )

    clustered = priced(
        [
            F.col("l_returnflag").asc(),
            F.col("l_orderkey").asc(),
            F.col("l_linenumber").asc(),
        ],
        "by_returnflag",
    )
    natural = priced(
        [
            F.col("l_orderkey").asc(),
            F.col("l_linenumber").asc(),
            F.col("l_returnflag").asc(),
        ],
        "natural",
    )
    return clustered.unionByName(natural)


def q_b15_watermark_audit(spark, sf_dir):
    """Watermark-lateness audit (B15 depth, r13 — the CONFIG read for
    the streaming legs: before picking ``withWatermark`` delays, a
    pipeline measures how much data each candidate delay would drop):
    per event type, events replay in ARRIVAL order (event_id — the
    log's delivery order) against their EVENT time (ts); an event is
    late by ``running_max(ts) − ts``, and for each candidate delay
    (1/5/15 min) the row reports how many events a watermark that
    tight would discard, plus the observed worst lateness. All integer
    micros. Scale shape: ONE event_type-keyed cumulative-max window
    (arrival order) + one keyed agg — partitioned, single pass, no
    global window."""
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events").select(
        "event_type",
        "event_id",
        F.expr("unix_micros(cast(ts as timestamp))").alias("__tus"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy(F.col("event_id").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    late = ev.withColumn(
        "__late_us", F.max("__tus").over(w) - F.col("__tus")
    )
    m = 60_000_000
    return late.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum((F.col("__late_us") > 1 * m).cast("long"))
        .cast("long")
        .alias("n_late_1m"),
        F.sum((F.col("__late_us") > 5 * m).cast("long"))
        .cast("long")
        .alias("n_late_5m"),
        F.sum((F.col("__late_us") > 15 * m).cast("long"))
        .cast("long")
        .alias("n_late_15m"),
        F.max("__late_us").cast("long").alias("max_late_us"),
    )


def q_b13_dict_encoding(spark, sf_dir):
    """Dictionary-encoding layout audit (B13 depth, r13 — completes the
    encoding triptych beside b13_delta_encoding's numeric read and
    b13_rle_encoding's run read: which STRING columns should a parquet
    writer dictionary-encode, and which fall back to plain?). Per
    documents string column: exact NDV, the bit-width a dictionary code
    needs (``length(bin(ndv−1))`` — pure integer, no float log2),
    dictionary cost = Σ distinct (bytes + 4-byte offset entry),
    code-stream cost = ``(n·bits + 7) div 8``, plain cost =
    Σ occurrences bytes + 4·n, and the signed savings ratio in micros.
    The low-cardinality `lang`/`source` win big; the raw `text`
    payload must flag ``dict_beneficial = false`` — the fallback the
    audit exists to catch (no writer should dictionary-encode a
    near-unique document body).

    Scale shape: ONE projection-pruned scan, stack(3) column→row pivot
    (rows ×3, bytes unchanged), then a (column, value) keyed agg — the
    exact-NDV shuffle a writer's stats pass pays anyway — contracting
    to the |distinct|-row relation before the per-column agg. No
    window, no join, map-side combinable throughout."""
    cols = ["lang", "source", "text"]
    docs = _t(spark, sf_dir, "documents").select(*cols)
    stacked = docs.select(
        F.expr(
            "stack({}, {}) as (col_name, val)".format(
                len(cols),
                ", ".join(f"'{c}', {c}" for c in cols),
            )
        )
    )
    per_val = stacked.groupBy("col_name", "val").agg(
        F.count(F.lit(1)).cast("long").alias("n_occ")
    )
    return (
        per_val.groupBy("col_name")
        .agg(
            F.sum("n_occ").cast("long").alias("n_values"),
            F.count(F.lit(1)).cast("long").alias("n_distinct"),
            F.sum(F.octet_length("val") + F.lit(4))
            .cast("long")
            .alias("dict_bytes"),
            F.sum(F.col("n_occ") * F.octet_length("val"))
            .cast("long")
            .alias("plain_payload_bytes"),
        )
        .select(
            "col_name",
            "n_values",
            "n_distinct",
            F.length(F.bin(F.col("n_distinct") - 1))
            .cast("long")
            .alias("code_bits"),
            "dict_bytes",
            (F.col("plain_payload_bytes") + 4 * F.col("n_values"))
            .cast("long")
            .alias("plain_bytes"),
        )
        .select(
            "col_name",
            "n_values",
            "n_distinct",
            "code_bits",
            "dict_bytes",
            F.expr("(n_values * code_bits + 7) div 8").alias("codes_bytes"),
            "plain_bytes",
        )
        .select(
            "*",
            (F.col("dict_bytes") + F.col("codes_bytes") < F.col("plain_bytes"))
            .alias("dict_beneficial"),
            F.expr(
                "(plain_bytes - dict_bytes - codes_bytes) * 1000000"
                " div plain_bytes"
            ).alias("savings_x1e6"),
        )
    )


def q_b17_incremental_distinct(spark, sf_dir):
    """Incremental distinct-count view (B17 depth, r15 — VERDICT r14
    item 7's suggested row; the KMV merge of b27_kmv_sketch recast as
    a MAINTAINED view, joining the join-view/top-k/frontier legs of
    the incremental family): a standing per-event-type KMV(k=32)
    sketch of distinct users — the k smallest portable-md5-60 user
    hashes — absorbs a CDC batch (ids ≡0 mod 10, the family's split
    convention) by re-ranking ONLY its own ≤ k·groups rows ∪ the
    batch's distinct hashes; KMV's merge law — bottomK(bottomK(A) ∪ B)
    = bottomK(A ∪ B) for sets — makes the view exact, and the oracle
    RECOMPUTES the sketch from the full log, so the driver row proves
    merge == recompute bit-exactly (kth-min is an integer equality;
    the estimate is a round-6 rational of it). View state is k·groups
    rows forever — cost ∝ batch + k·groups, never the corpus."""
    from pyspark.sql import Window

    K = 32
    ev = _t(spark, sf_dir, "events").select("event_id", "event_type", "user_id")
    h = dedup.portable_hash60(F.col("user_id").cast("string")).alias("h")
    standing = (
        ev.filter(F.col("event_id") % 10 != 0)
        .select("event_type", h)
        .distinct()
    )
    batch = (
        ev.filter(F.col("event_id") % 10 == 0)
        .select("event_type", h)
        .distinct()
    )
    w = Window.partitionBy("event_type").orderBy(F.col("h").asc())
    st_view = (
        standing.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= K)
        .select("event_type", "h")
    )
    merged = (
        st_view.unionByName(batch)
        .distinct()
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= K)
    )
    per = merged.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("k_used"),
        F.max("h").alias("kth_min"),
    )
    return per.select(
        "event_type",
        "k_used",
        "kth_min",
        F.when(
            F.col("k_used") < K, F.col("k_used").cast("double")
        )
        .otherwise(
            F.round(
                F.lit(float(K - 1))
                * F.lit(float(2**60))
                / F.col("kth_min").cast("double"),
                6,
            )
        )
        .alias("est_distinct"),
    )


def q_b17_incremental_histogram(spark, sf_dir):
    """Incremental histogram view (B17 depth, r16 — VERDICT r15 item
    6's suggested row: the counting-histogram leg of the incremental
    family, joining b17_incremental_distinct's KMV merge). A standing
    fixed-bin histogram of event values (bin = floor(value/50), count
    + integer-quantized sum per bin) absorbs a CDC batch (ids ≡0 mod
    10, the family's split convention) by per-bin ADDITION — the
    counting-sketch merge law — and the oracle RECOMPUTES the
    histogram from the full log, so the driver row proves merge ==
    recompute integer-exactly per bin. View state is #bins rows
    forever; maintenance cost ∝ batch, never the corpus; both sums
    stay integer (floor(value·100)) so no float accumulation order
    can split the equality."""
    ev = _t(spark, sf_dir, "events").select("event_id", "value")
    b = F.floor(F.col("value") / F.lit(50.0)).cast("long").alias("bin")
    q = F.floor(F.col("value") * F.lit(100.0)).cast("long")

    def _hist(df, nc, sc):
        return df.groupBy(b).agg(
            F.count(F.lit(1)).cast("long").alias(nc),
            F.sum(q).cast("long").alias(sc),
        )

    st = _hist(ev.filter(F.col("event_id") % 10 != 0), "n_standing", "s_standing")
    ba = _hist(ev.filter(F.col("event_id") % 10 == 0), "n_batch", "s_batch")
    merged = (
        st.join(ba, "bin", "full_outer")
        .na.fill(0, ["n_standing", "s_standing", "n_batch", "s_batch"])
        .select(
            "bin",
            "n_standing",
            "n_batch",
            (F.col("n_standing") + F.col("n_batch"))
            .cast("long")
            .alias("n_merged"),
            (F.col("s_standing") + F.col("s_batch"))
            .cast("long")
            .alias("s_merged"),
        )
    )
    rec = _hist(ev, "n_recompute", "s_recompute")
    return merged.join(rec, "bin", "full_outer").select(
        "bin",
        "n_standing",
        "n_batch",
        "n_merged",
        "n_recompute",
        "s_merged",
        "s_recompute",
        (
            (F.col("n_merged") == F.col("n_recompute"))
            & (F.col("s_merged") == F.col("s_recompute"))
        ).alias("merge_ok"),
    )


def q_b17_incremental_minmax(spark, sf_dir):
    """Delete-aware incremental MAX view (B17 depth, r17). MAX is the
    canonical NOT-delta-maintainable aggregate: inserts merge by
    max(), but a delete that removes the last row holding the stored
    extreme leaves the maintainer with no correct answer short of a
    rescan. The standing view therefore keeps (max, count-at-max) per
    group — the minimal supporting state — and a CDC batch (inserts =
    ids ≡0 mod 10, the family's split convention; deletes = standing
    rows with id ≡0 mod 7) merges by the case law: a higher insert
    max wins outright (deletes only touch standing rows); an equal
    insert max replenishes the count; otherwise the view survives iff
    count-at-max outlives the deletes that hit it, else it flags
    needs_rescan and abstains. The oracle recomputes ground truth
    from (standing − deletes) ∪ inserts, and merge_ok pins the
    invariant: wherever the maintainer did NOT abstain, its answer is
    recompute-exact — the split between maintainable and
    rescan-needed groups is itself the oracled output. Scale: ZERO
    corpus-wide shuffles — every aggregate is a per-group max/count
    that map-side-combines to ≤64 rows per task (a (group, value)
    histogram would NOT: the quantized double is near-unique at
    scale, making that shuffle corpus-sized); count-at-max and
    deleted-at-max fall out of ONE conditional pass against the
    broadcast 64-row max state; values integer-quantized (floor·100)
    so no float accumulation order splits the equality; state is 2
    longs per group forever."""
    ev = _t(spark, sf_dir, "events").select(
        (F.col("user_id") % 64).cast("long").alias("g"),
        F.floor(F.col("value") * F.lit(100.0)).cast("long").alias("q"),
        "event_id",
    )
    standing = ev.filter(F.col("event_id") % 10 != 0)
    inserts = ev.filter(F.col("event_id") % 10 == 0)
    st_max = standing.groupBy("g").agg(
        F.max("q").cast("long").alias("state_max")
    )
    # count-at-max AND deleted-at-max in one conditional pass against
    # the broadcast 64-row state (deletes only ever hit standing rows)
    at = (
        standing.join(F.broadcast(st_max), "g")
        .filter(F.col("q") == F.col("state_max"))
        .groupBy("g", "state_max")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_at_max"),
            F.sum((F.col("event_id") % 7 == 0).cast("int"))
            .cast("long")
            .alias("del_at_max"),
        )
    )
    ins = inserts.groupBy("g").agg(
        F.max("q").cast("long").alias("ins_max")
    )
    m = at.join(ins, "g", "full_outer").na.fill(0, ["del_at_max"])
    rem = F.col("n_at_max") - F.col("del_at_max")
    merged = (
        F.when(
            F.col("ins_max").isNotNull()
            & (
                F.col("state_max").isNull()
                | (F.col("ins_max") > F.col("state_max"))
            ),
            F.col("ins_max"),
        )
        .when(F.col("ins_max").eqNullSafe(F.col("state_max")), F.col("state_max"))
        .when(rem > 0, F.col("state_max"))
    )
    needs_rescan = merged.isNull()
    rec = (
        ev.filter(
            (F.col("event_id") % 10 == 0) | (F.col("event_id") % 7 != 0)
        )
        .groupBy("g")
        .agg(F.max("q").cast("long").alias("recomputed_max"))
    )
    return (
        m.join(rec, "g", "full_outer")
        .select(
            "g",
            "state_max",
            "n_at_max",
            "del_at_max",
            "ins_max",
            merged.cast("long").alias("merged_max"),
            needs_rescan.alias("needs_rescan"),
            "recomputed_max",
            (
                needs_rescan
                | merged.eqNullSafe(F.col("recomputed_max"))
            ).alias("merge_ok"),
        )
    )
