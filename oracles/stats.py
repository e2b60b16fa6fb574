"""DuckDB oracle SQL — stats family (split from
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
from sqlite_cdc_spark.pipeline.dedup import portable_hash60_sql

SQL = {
        "b10_agg_pricing": """
            SELECT l_returnflag, l_linestatus,
                   CAST(sum(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sum_qty,
                   round(CAST(sum(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE), 2) AS sum_base_price,
                   round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))
                        * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4))))
                        AS DOUBLE), 2) AS sum_disc_price,
                   count(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02'
            GROUP BY 1, 2
        """,
        "b10_rollup": """
            SELECT o_orderstatus, o_orderpriority, count(*) AS n,
                   round(CAST(sum(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE), 2) AS total,
                   CAST(grouping(o_orderstatus) AS BIGINT) AS g_status,
                   CAST(grouping(o_orderpriority) AS BIGINT) AS g_prio
            FROM orders
            GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
        """,
        "b10_pivot": """
            SELECT o_orderpriority,
                   CAST(count(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS n_f,
                   CAST(count(*) FILTER (WHERE o_orderstatus = 'O') AS BIGINT) AS n_o,
                   CAST(count(*) FILTER (WHERE o_orderstatus = 'P') AS BIGINT) AS n_p,
                   coalesce(round(CAST(sum(CAST(o_totalprice AS DECIMAL(38,6)))
                     FILTER (WHERE o_orderstatus = 'F') AS DOUBLE), 2), 0.0) AS total_f,
                   coalesce(round(CAST(sum(CAST(o_totalprice AS DECIMAL(38,6)))
                     FILTER (WHERE o_orderstatus = 'O') AS DOUBLE), 2), 0.0) AS total_o,
                   coalesce(round(CAST(sum(CAST(o_totalprice AS DECIMAL(38,6)))
                     FILTER (WHERE o_orderstatus = 'P') AS DOUBLE), 2), 0.0) AS total_p
            FROM orders
            GROUP BY o_orderpriority
        """,
        "b10_unpivot": """
            SELECT p_partkey, 'p_size' AS measure,
                   CAST(p_size AS DOUBLE) AS value FROM part
            UNION ALL
            SELECT p_partkey, 'p_retailprice' AS measure,
                   p_retailprice AS value FROM part
        """,
        "b10_profit_by_nation_year": """
            SELECT n_name AS nation,
                   CAST(year(o_orderdate) AS INTEGER) AS o_year,
                   round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))
                     * (CAST(1 AS DECIMAL(18,4))
                        - CAST(l_discount AS DECIMAL(18,4))))
                     AS DOUBLE), 2) AS profit,
                   CAST(count(*) AS BIGINT) AS n_items
            FROM lineitem
            JOIN part     ON l_partkey = p_partkey
            JOIN orders   ON l_orderkey = o_orderkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation   ON s_nationkey = n_nationkey
            WHERE p_type LIKE 'ECONOMY%'
            GROUP BY 1, 2
        """,
        "b10_promo_share": """
            SELECT round(CAST(CAST(100 AS DECIMAL(18,4))
                     * sum(CASE WHEN p_type LIKE 'PROMO%'
                           THEN CAST(l_extendedprice AS DECIMAL(18,4))
                                * (CAST(1 AS DECIMAL(18,4))
                                   - CAST(l_discount AS DECIMAL(18,4)))
                           ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
                   / CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))
                     * (CAST(1 AS DECIMAL(18,4))
                        - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE), 6)
                     AS promo_share,
                   CAST(count(*) AS BIGINT) AS n_items
            FROM lineitem JOIN part ON l_partkey = p_partkey
        """,
        "b10_mad_outliers": """
            WITH med AS (
              SELECT l_returnflag, median(l_extendedprice) AS m
              FROM lineitem GROUP BY l_returnflag
            ),
            dev AS (
              SELECT l.l_returnflag, l.l_extendedprice, med.m,
                     abs(l.l_extendedprice - med.m) AS ad
              FROM lineitem l JOIN med USING (l_returnflag)
            ),
            mad AS (
              SELECT l_returnflag, median(ad) AS md
              FROM dev GROUP BY l_returnflag
            )
            SELECT d.l_returnflag,
                   CAST(count(*) AS BIGINT) AS n_rows,
                   round(min(d.m), 6) AS med_price,
                   round(min(mad.md), 6) AS mad,
                   CAST(sum(CASE WHEN d.ad > 3 * 1.4826 * mad.md
                                 THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
            FROM dev d JOIN mad USING (l_returnflag)
            GROUP BY d.l_returnflag
        """,
        "b10_stats_agg": """
            WITH sums AS (
              SELECT l_returnflag,
                     CAST(count(*) AS DOUBLE) AS n,
                     CAST(sum(CAST(l_quantity AS DECIMAL(28,4))) AS DOUBLE) AS sx,
                     CAST(sum(CAST(l_quantity AS DECIMAL(28,4))
                              * CAST(l_quantity AS DECIMAL(28,4))) AS DOUBLE) AS sxx,
                     CAST(sum(CAST(l_extendedprice AS DECIMAL(28,4))) AS DOUBLE) AS sy,
                     CAST(sum(CAST(l_extendedprice AS DECIMAL(28,4))
                              * CAST(l_extendedprice AS DECIMAL(28,4))) AS DOUBLE) AS syy,
                     CAST(sum(CAST(l_quantity AS DECIMAL(28,4))
                              * CAST(l_extendedprice AS DECIMAL(28,4))) AS DOUBLE) AS sxy
              FROM lineitem GROUP BY l_returnflag
            )
            SELECT l_returnflag,
                   CAST(n AS BIGINT) AS n_rows,
                   round(sqrt((sxx - sx * sx / n) / (n - 1)), 6) AS sd_qty,
                   round(sqrt((syy - sy * sy / n) / (n - 1)), 6) AS sd_price,
                   round((n * sxy - sx * sy)
                         / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)),
                         6) AS corr_qty_price
            FROM sums
        """,
        "b11_value_funcs": """
            SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, l_quantity,
                   first_value(l_extendedprice) OVER wf AS first_price,
                   last_value(l_extendedprice) OVER wf AS last_price,
                   nth_value(l_extendedprice, 2) OVER wf AS second_price
            FROM lineitem
            WINDOW wf AS (PARTITION BY l_orderkey
                          ORDER BY l_partkey, l_suppkey, l_linenumber,
                                   l_quantity, l_extendedprice, l_discount,
                                   l_tax, l_returnflag, l_linestatus, l_shipdate
                          ROWS BETWEEN UNBOUNDED PRECEDING
                               AND UNBOUNDED FOLLOWING)
        """,
        "b10_bool_agg": """
            SELECT o_orderstatus,
                   count(*) FILTER (o_totalprice > 200000) AS n_big,
                   bool_and(o_totalprice > 0) AS all_positive,
                   bool_or(o_orderpriority = '1-URGENT') AS any_urgent,
                   count(*) AS n
            FROM orders GROUP BY o_orderstatus
        """,
        "b11_ntile": """
            SELECT o_orderkey, o_orderstatus,
                   CAST(ntile(4) OVER (
                     PARTITION BY o_orderstatus
                     ORDER BY o_totalprice ASC, o_orderkey ASC
                   ) AS BIGINT) AS price_quartile
            FROM orders
        """,
        "b10_median_mode": """
            WITH counts AS (
              SELECT l_returnflag, l_quantity, count(*) AS n
              FROM lineitem GROUP BY l_returnflag, l_quantity
            ),
            mode AS (
              SELECT l_returnflag, l_quantity AS mode_qty, n AS mode_n
              FROM (
                SELECT *, row_number() OVER (
                  PARTITION BY l_returnflag ORDER BY n DESC, l_quantity ASC
                ) AS rn FROM counts
              ) WHERE rn = 1
            ),
            med AS (
              SELECT l_returnflag,
                     median(CAST(l_quantity AS DOUBLE)) AS median_qty,
                     count(*) AS n_rows
              FROM lineitem GROUP BY l_returnflag
            )
            SELECT m.l_returnflag, m.median_qty, mo.mode_qty, mo.mode_n,
                   m.n_rows
            FROM med m JOIN mode mo ON m.l_returnflag = mo.l_returnflag
        """,
        "b11_cumulative_distinct": """
            WITH first AS (
              SELECT user_id,
                     min(CAST(floor(epoch(ts)) AS BIGINT) // 86400)
                       AS first_day
              FROM events GROUP BY user_id
            ),
            per_day AS (
              SELECT first_day, count(*) AS new_users
              FROM first GROUP BY first_day
            )
            SELECT CAST(first_day AS BIGINT) AS day,
                   CAST(new_users AS BIGINT) AS new_users,
                   CAST(sum(new_users) OVER (ORDER BY first_day
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     AS BIGINT) AS cum_users
            FROM per_day
        """,
        "b11_reconstruct_befores": f"""
            WITH changes AS ({_EVENTS_CHANGES_SQL}),
            keyed AS (
              SELECT id,
                     CAST(json_extract_string(coalesce(after, before),
                                              '$.user_id') AS BIGINT) AS user_id,
                     operation, after
              FROM changes
            )
            SELECT id, user_id, operation,
                   lag(after) OVER (PARTITION BY user_id ORDER BY id) AS before,
                   after
            FROM keyed
        """,
        "b11_window_funcs": """
            SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
                   CAST(row_number() OVER w AS BIGINT) AS rn,
                   lag(l_extendedprice) OVER w AS prev_price,
                   lead(l_extendedprice) OVER w AS next_price,
                   CAST(sum(CAST(l_quantity AS DECIMAL(38,6))) OVER (
                     w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     AS DOUBLE) AS run_qty
            FROM lineitem
            WINDOW w AS (PARTITION BY l_orderkey
                         ORDER BY l_partkey, l_suppkey, l_linenumber, l_quantity,
                                  l_extendedprice, l_discount, l_tax,
                                  l_returnflag, l_linestatus, l_shipdate)
        """,
        "b12_topk": """
            SELECT l_returnflag, CAST(rnk AS BIGINT) AS rnk,
                   l_orderkey, l_linenumber, l_extendedprice
            FROM (
              SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice,
                     row_number() OVER (PARTITION BY l_returnflag
                       ORDER BY l_extendedprice DESC, l_orderkey, l_partkey,
                                l_suppkey, l_linenumber, l_quantity) AS rnk
              FROM lineitem
            ) WHERE rnk <= 5
        """,
        "b10_percentiles": """
            SELECT l_returnflag,
                   quantile_cont(l_extendedprice, 0.5) AS p50,
                   quantile_cont(l_extendedprice, 0.9) AS p90,
                   min(l_extendedprice) AS pmin,
                   max(l_extendedprice) AS pmax
            FROM lineitem GROUP BY 1
        """,
        "b10_cube": """
            SELECT o_orderstatus, o_orderpriority, count(*) AS n,
                   CAST(grouping(o_orderstatus) AS BIGINT) AS g_status,
                   CAST(grouping(o_orderpriority) AS BIGINT) AS g_prio
            FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
        """,
        "b11_ranks": """
            SELECT o_orderkey, o_orderstatus,
                   CAST(row_number() OVER w AS BIGINT) AS rn,
                   CAST(rank() OVER wr AS BIGINT) AS rnk_bucket,
                   CAST(dense_rank() OVER wr AS BIGINT) AS drnk_bucket,
                   CAST(ntile(4) OVER w AS BIGINT) AS quartile
            FROM orders
            WINDOW w AS (PARTITION BY o_orderstatus
                         ORDER BY o_totalprice DESC, o_orderkey ASC),
                   wr AS (PARTITION BY o_orderstatus
                          ORDER BY floor(o_totalprice / 100000) DESC)
            QUALIFY rn <= 200
        """,
        "b10_grouping_sets": """
            SELECT o_orderstatus, o_orderpriority, count(*) AS n,
                   CAST(grouping(o_orderstatus) AS BIGINT) AS g_status,
                   CAST(grouping(o_orderpriority) AS BIGINT) AS g_prio
            FROM orders
            GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """,
        "b11_twap": """
            WITH staged AS (
              SELECT user_id,
                     CAST(floor(value * 100) AS BIGINT) AS cents,
                     CAST(floor(epoch(ts)) AS BIGINT) AS sec,
                     lead(CAST(floor(epoch(ts)) AS BIGINT)) OVER (
                       PARTITION BY user_id
                       ORDER BY ts ASC, event_id ASC) AS nxt
              FROM events
            ),
            weighted AS (
              SELECT user_id, cents, nxt - sec AS w FROM staged
            )
            SELECT user_id,
                   CAST(count(*) AS BIGINT) AS n_events,
                   CAST(sum(w) AS BIGINT) AS held_seconds,
                   round(CASE WHEN sum(w) > 0
                              THEN sum(cents * w) / (sum(w) * 100.0)
                              END, 6) AS twap
            FROM weighted GROUP BY user_id
        """,
        "b10_filtered_agg": """
            SELECT l_linestatus,
                   CAST(count(*) AS BIGINT) AS n_all,
                   CAST(count(*) FILTER (WHERE l_returnflag = 'R')
                        AS BIGINT) AS n_returned,
                   round(CAST(sum(CAST(l_extendedprice AS DECIMAL(38,6)))
                         FILTER (WHERE l_returnflag = 'R') AS DOUBLE), 2)
                     AS returned_revenue,
                   round(avg(CAST(l_quantity AS DOUBLE))
                         FILTER (WHERE l_returnflag = 'R'), 6)
                     AS avg_returned_qty
            FROM lineitem GROUP BY l_linestatus
        """,
        "b10_price_histogram": """
            WITH bounds AS (
              SELECT CAST(min(l_extendedprice) AS DOUBLE) AS lo,
                     CAST(max(l_extendedprice) AS DOUBLE) AS hi
              FROM lineitem
            )
            SELECT CAST(least(19, floor(
                     (CAST(l_extendedprice AS DOUBLE) - b.lo)
                     / ((b.hi - b.lo) / 20.0))) AS BIGINT) AS bin,
                   CAST(count(*) AS BIGINT) AS n
            FROM lineitem CROSS JOIN bounds b
            GROUP BY bin
        """,
        "b10_share_of_total": """
            WITH rev AS (
              SELECT n_name,
                     sum(CAST(l_extendedprice AS DECIMAL(38,6))) AS r
              FROM lineitem l
              JOIN orders o ON l.l_orderkey = o.o_orderkey
              JOIN customer c ON o.o_custkey = c.c_custkey
              JOIN nation n ON c.c_nationkey = n.n_nationkey
              GROUP BY n_name
            )
            SELECT n_name,
                   round(CAST(r AS DOUBLE), 2) AS revenue,
                   round(CAST(r AS DOUBLE)
                         / CAST(sum(r) OVER () AS DOUBLE), 6) AS share
            FROM rev
        """,
        "b10_max_by": """
            WITH m AS (
              SELECT l_returnflag, max(l_extendedprice) AS mx,
                     min(l_extendedprice) AS mn
              FROM lineitem GROUP BY l_returnflag
            )
            SELECT m.l_returnflag,
                   (SELECT CAST(max(li.l_orderkey) AS BIGINT) FROM lineitem li
                    WHERE li.l_returnflag = m.l_returnflag
                      AND li.l_extendedprice = m.mx) AS top_order,
                   (SELECT CAST(min(li.l_orderkey) AS BIGINT) FROM lineitem li
                    WHERE li.l_returnflag = m.l_returnflag
                      AND li.l_extendedprice = m.mn) AS bottom_order,
                   m.mx AS top_price, m.mn AS bottom_price
            FROM m
        """,
        "b11_lag_features": """
            WITH ev AS (
              SELECT event_id, user_id, ts,
                     CAST(floor(value * 100) AS BIGINT) AS cents
              FROM events WHERE event_type = 'purchase'
            )
            SELECT event_id, user_id, cents,
                   lag(cents, 1) OVER w AS lag1_cents,
                   lag(cents, 2) OVER w AS lag2_cents,
                   round(CAST(sum(cents) OVER r AS DOUBLE)
                         / (count(*) OVER r * 100.0), 6) AS rolling3_mean
            FROM ev
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id),
                   r AS (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
        """,
        "b11_range_frame": """
            WITH base AS (
              SELECT event_id, user_id, value,
                     CAST(floor(epoch(ts)) AS BIGINT) AS sec
              FROM events
            )
            SELECT event_id, user_id,
                   CAST(count(*) OVER w AS BIGINT) AS n_30m,
                   round(CAST(sum(CAST(value AS DECIMAL(38,6))) OVER w
                         AS DOUBLE), 6) AS sum_30m
            FROM base
            WINDOW w AS (PARTITION BY user_id ORDER BY sec
                         RANGE BETWEEN 1800 PRECEDING AND CURRENT ROW)
        """,
        "b10_large_orders": """
            WITH big AS (
              SELECT l_orderkey,
                     sum(CAST(l_quantity AS DECIMAL(38,6))) AS q
              FROM lineitem GROUP BY l_orderkey
              HAVING sum(CAST(l_quantity AS DECIMAL(38,6))) > 300
            )
            SELECT o.o_orderkey, o.o_custkey,
                   CAST(o.o_orderdate AS DATE) AS o_orderdate,
                   CAST(b.q AS DOUBLE) AS total_qty
            FROM orders o JOIN big b ON o.o_orderkey = b.l_orderkey
        """,
        "b10_column_profile": " UNION ALL ".join(
            f"""
            SELECT '{c}' AS col_name, CAST(count(*) AS BIGINT) AS n_rows,
                   CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_nulls,
                   CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct,
                   {"round(CAST(min(" + c + ") AS DOUBLE), 6)" if num
                    else "CAST(NULL AS DOUBLE)"} AS min_num,
                   {"round(CAST(max(" + c + ") AS DOUBLE), 6)" if num
                    else "CAST(NULL AS DOUBLE)"} AS max_num,
                   {"CAST(NULL AS VARCHAR)" if num
                    else "CAST(min(" + c + ") AS VARCHAR)"} AS min_str,
                   {"CAST(NULL AS VARCHAR)" if num
                    else "CAST(max(" + c + ") AS VARCHAR)"} AS max_str
            FROM orders
            """
            for c, num in [
                ("o_orderkey", True), ("o_custkey", True),
                ("o_orderstatus", False), ("o_totalprice", True),
                ("o_orderdate", False), ("o_orderpriority", False),
            ]
        ),
        "b10_groupwise_ols": """
            WITH q AS (
              SELECT l_returnflag,
                     CAST(floor(l_quantity * 100) AS BIGINT) AS qx,
                     CAST(floor(l_extendedprice * 100) AS BIGINT) AS qy
              FROM lineitem
            ),
            s AS (
              SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
                     CAST(sum(qx) AS DOUBLE) AS sx,
                     CAST(sum(qy) AS DOUBLE) AS sy,
                     CAST(sum(qx * qy) AS DOUBLE) AS sxy,
                     CAST(sum(qx * qx) AS DOUBLE) AS sxx,
                     CAST(sum(qy * qy) AS DOUBLE) AS syy
              FROM q GROUP BY l_returnflag
            ),
            fit AS (
              SELECT l_returnflag, n, sx, sy,
                     (CAST(n AS DOUBLE) * sxy - sx * sy)
                       / nullif(CAST(n AS DOUBLE) * sxx - sx * sx, 0)
                       AS slope_raw,
                     (CAST(n AS DOUBLE) * sxy - sx * sy)
                       * (CAST(n AS DOUBLE) * sxy - sx * sy)
                       / nullif((CAST(n AS DOUBLE) * sxx - sx * sx)
                                * (CAST(n AS DOUBLE) * syy - sy * sy), 0)
                       AS r2_raw
              FROM s
            )
            SELECT l_returnflag, n, round(slope_raw, 6) AS slope,
                   round((sy - slope_raw * sx) / CAST(n AS DOUBLE) / 100, 6)
                     AS intercept,
                   round(r2_raw, 6) AS r2
            FROM fit
        """,
        "b11_ewma": _ewma_oracle_sql(),
        "b12_zorder": _zorder_oracle_sql(),
        "b10_bootstrap": _bootstrap_oracle_sql(),
        "b10_small_quantity_revenue": """
            WITH pq AS (
              SELECT l_partkey AS pk,
                     avg(CAST(l_quantity AS DOUBLE)) AS avgq
              FROM lineitem GROUP BY l_partkey
            ),
            sel AS (
              SELECT l.l_extendedprice FROM lineitem l
              JOIN part p ON p.p_partkey = l.l_partkey
              JOIN pq ON pq.pk = l.l_partkey
              WHERE p.p_brand = 'Brand#3' AND p.p_type = 'MEDIUM'
                AND CAST(l.l_quantity AS DOUBLE) < 0.2 * pq.avgq
            )
            SELECT CAST(count(*) AS BIGINT) AS n_lineitems,
                   round(CAST(sum(CAST(l_extendedprice AS DECIMAL(38,6)))
                              AS DOUBLE) / 7.0, 2) AS avg_yearly
            FROM sel
        """,
        "b10_woe_iv": """
            WITH base AS (
              SELECT o_totalprice AS v,
                     CAST(o_orderstatus = 'F' AS INTEGER) AS y
              FROM orders
            ),
            vh AS (SELECT v, CAST(count(*) AS BIGINT) AS c
                   FROM base GROUP BY v),
            cum AS (SELECT v, CAST(sum(c) OVER (ORDER BY v ROWS BETWEEN
                      UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
                    FROM vh),
            tot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM vh),
            edges AS (SELECT """ + ", ".join(
            f"min(CASE WHEN cum >= floor((n - 1) * {k} / 10) + 1"
            f" THEN v END) AS e{k}"
            for k in range(1, 10)
        ) + """ FROM cum CROSS JOIN tot),
            bucketed AS (
              SELECT """ + " + ".join(
            f"CAST(v > e{k} AS INTEGER)" for k in range(1, 10)
        ) + """ AS bucket, y
              FROM base CROSS JOIN edges
            ),
            per AS (
              SELECT bucket, CAST(sum(y) AS BIGINT) AS n_pos,
                     CAST(sum(1 - y) AS BIGINT) AS n_neg
              FROM bucketed GROUP BY bucket
            ),
            t AS (SELECT CAST(sum(n_pos) AS BIGINT) AS tp,
                         CAST(sum(n_neg) AS BIGINT) AS tn FROM per),
            terms AS (
              SELECT bucket, n_pos, n_neg,
                     (n_pos + 1) / CAST(tp + 10 AS DOUBLE) AS p,
                     (n_neg + 1) / CAST(tn + 10 AS DOUBLE) AS q
              FROM per CROSS JOIN t
            ),
            scored AS (
              SELECT bucket, n_pos, n_neg,
                     round(ln(p / q), 6) AS woe,
                     round((p - q) * ln(p / q), 6) AS iv_term,
                     CAST(floor((p - q) * ln(p / q) * 1e8) AS BIGINT) AS t8
              FROM terms
            )
            SELECT bucket, n_pos, n_neg, woe, iv_term,
                   round(sum(t8) OVER () / 1e8, 6) AS iv_total
            FROM scored
        """,
        "b10_gini": """
            WITH per AS (
              SELECT o_custkey,
                     CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT))
                          AS BIGINT) AS cents
              FROM orders GROUP BY o_custkey
            ),
            ranked AS (
              SELECT cents, CAST(row_number() OVER (
                ORDER BY cents ASC, o_custkey ASC) AS BIGINT) AS rn
              FROM per
            ),
            t AS (
              SELECT CAST(count(*) AS BIGINT) AS n_customers,
                     CAST(sum(cents) AS BIGINT) AS total_cents
              FROM ranked
            ),
            num AS (
              SELECT n_customers, total_cents,
                     sum(CAST(2 * rn - n_customers - 1 AS HUGEINT)
                         * CAST(cents AS HUGEINT)) AS w
              FROM ranked, t GROUP BY n_customers, total_cents
            )
            SELECT n_customers, total_cents,
                   round(CAST(w AS DOUBLE)
                         / (CAST(n_customers AS DOUBLE)
                            * CAST(total_cents AS DOUBLE)), 6) AS gini
            FROM num
        """,
        "b10_chi2": """
            WITH obs AS (
              SELECT o_orderpriority, o_orderstatus,
                     CAST(count(*) AS BIGINT) AS obs
              FROM orders GROUP BY o_orderpriority, o_orderstatus
            ),
            r AS (
              SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS r
              FROM orders GROUP BY o_orderpriority
            ),
            c AS (
              SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS c
              FROM orders GROUP BY o_orderstatus
            ),
            g AS (SELECT CAST(count(*) AS BIGINT) AS g FROM orders)
            SELECT obs.o_orderpriority, obs.o_orderstatus, obs.obs,
                   round(CAST(r.r AS DOUBLE) * CAST(c.c AS DOUBLE)
                         / CAST(g.g AS DOUBLE), 6) AS expected,
                   round((CAST(obs.obs AS DOUBLE)
                          - CAST(r.r AS DOUBLE) * CAST(c.c AS DOUBLE)
                            / CAST(g.g AS DOUBLE))
                         * (CAST(obs.obs AS DOUBLE)
                            - CAST(r.r AS DOUBLE) * CAST(c.c AS DOUBLE)
                              / CAST(g.g AS DOUBLE))
                         / (CAST(r.r AS DOUBLE) * CAST(c.c AS DOUBLE)
                            / CAST(g.g AS DOUBLE)), 6) AS contrib
            FROM obs
            JOIN r USING (o_orderpriority)
            JOIN c USING (o_orderstatus), g
        """,
        "b10_benford": """
            WITH d AS (
              SELECT CAST(substring(CAST(CAST(floor(o_totalprice * 100)
                                          AS BIGINT) AS VARCHAR), 1, 1)
                          AS INTEGER) AS digit
              FROM orders
            ),
            per AS (
              SELECT digit, CAST(count(*) AS BIGINT) AS n
              FROM d GROUP BY digit
            ),
            t AS (SELECT CAST(count(*) AS BIGINT) AS t FROM d)
            SELECT digit, n,
                   round(CAST(n AS DOUBLE) / CAST(t AS DOUBLE), 6) AS share,
                   round(log10(1.0 + 1.0 / CAST(digit AS DOUBLE)), 6)
                     AS expected,
                   round(abs(round(CAST(n AS DOUBLE) / CAST(t AS DOUBLE), 6)
                             - round(log10(1.0 + 1.0
                                           / CAST(digit AS DOUBLE)), 6)), 6)
                     AS deviation
            FROM per, t
        """,
        "b11_drawdown": """
            WITH curved AS (
              SELECT user_id, cents, cum,
                     max(cum) OVER (PARTITION BY user_id
                                    ORDER BY ts ASC, event_id ASC
                                    ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND CURRENT ROW) AS peak
              FROM (
                SELECT user_id, ts, event_id, cents,
                       sum(cents) OVER (PARTITION BY user_id
                                        ORDER BY ts ASC, event_id ASC
                                        ROWS BETWEEN UNBOUNDED PRECEDING
                                        AND CURRENT ROW) AS cum
                FROM (
                  SELECT user_id, ts, event_id,
                         CAST(floor(value * 100) AS BIGINT) AS cents
                  FROM events
                )
              )
            )
            SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
                   CAST(max(peak - cum) AS BIGINT) AS max_drawdown_cents,
                   CAST(sum(cents) AS BIGINT) AS final_cents
            FROM curved GROUP BY user_id
        """,
        "b10_ks_screen": """
            WITH o AS (
              SELECT CAST(floor(o_totalprice * 100) AS BIGINT) // 100000
                       AS bucket,
                     CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END
                       AS g1
              FROM orders
              WHERE o_orderpriority IN ('1-URGENT', '5-LOW')
            ),
            per AS (
              SELECT bucket, CAST(sum(g1) AS BIGINT) AS n1,
                     CAST(sum(1 - g1) AS BIGINT) AS n2
              FROM o GROUP BY bucket
            ),
            cum AS (
              SELECT bucket,
                     sum(n1) OVER w AS c1, sum(n2) OVER w AS c2
              FROM per WINDOW w AS (ORDER BY bucket ASC
                                    ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND CURRENT ROW)
            ),
            t AS (
              SELECT CAST(sum(n1) AS BIGINT) AS t1,
                     CAST(sum(n2) AS BIGINT) AS t2
              FROM per
            )
            SELECT t1 AS n_urgent, t2 AS n_low,
                   round(CAST(max(abs(c1 * t2 - c2 * t1)) AS DOUBLE)
                         / (CAST(t1 AS DOUBLE) * CAST(t2 AS DOUBLE)), 6)
                     AS ks_stat
            FROM cum, t GROUP BY t1, t2
        """,
        "b10_welch_t": """
            WITH sums AS (
              SELECT o_orderpriority = '1-URGENT' AS g1,
                     CAST(count(*) AS DOUBLE) AS n,
                     CAST(sum(CAST(o_totalprice AS DECIMAL(28,4)))
                          AS DOUBLE) AS sx,
                     CAST(sum(CAST(o_totalprice AS DECIMAL(28,4))
                              * CAST(o_totalprice AS DECIMAL(28,4)))
                          AS DOUBLE) AS sxx
              FROM orders
              WHERE o_orderpriority IN ('1-URGENT', '5-LOW')
              GROUP BY 1
            ),
            one AS (
              SELECT max(CASE WHEN g1 THEN n END) AS n1,
                     max(CASE WHEN g1 THEN sx END) AS sx1,
                     max(CASE WHEN g1 THEN sxx END) AS sxx1,
                     max(CASE WHEN NOT g1 THEN n END) AS n2,
                     max(CASE WHEN NOT g1 THEN sx END) AS sx2,
                     max(CASE WHEN NOT g1 THEN sxx END) AS sxx2
              FROM sums
            ),
            two AS (
              SELECT n1, n2, sx1 / n1 AS m1, sx2 / n2 AS m2,
                     (sxx1 - sx1 * sx1 / n1) / (n1 - 1) AS v1,
                     (sxx2 - sx2 * sx2 / n2) / (n2 - 1) AS v2
              FROM one
            ),
            three AS (SELECT *, v1 / n1 + v2 / n2 AS se2 FROM two)
            SELECT CAST(n1 AS BIGINT) AS n_urgent,
                   CAST(n2 AS BIGINT) AS n_low,
                   round(m1 - m2, 6) AS mean_diff,
                   round((m1 - m2) / sqrt(se2), 6) AS t_stat,
                   round((se2 * se2)
                         / ((v1 / n1) * (v1 / n1) / (n1 - 1)
                            + (v2 / n2) * (v2 / n2) / (n2 - 1)), 6) AS df
            FROM three
        """,
        "b11_streaks": """
            WITH days AS (
              SELECT DISTINCT user_id,
                     CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day
              FROM events
            ),
            isl AS (
              SELECT user_id,
                     day - row_number() OVER (
                       PARTITION BY user_id ORDER BY day ASC) AS g
              FROM days
            ),
            islands AS (
              SELECT user_id, g, CAST(count(*) AS BIGINT) AS len
              FROM isl GROUP BY user_id, g
            )
            SELECT user_id,
                   CAST(sum(len) AS BIGINT) AS n_active_days,
                   CAST(count(*) AS BIGINT) AS n_streaks,
                   CAST(max(len) AS BIGINT) AS longest_streak
            FROM islands GROUP BY user_id
        """,
        "b11_rolling_median": """
            WITH daily AS (
              SELECT CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day,
                     CAST(count(*) AS BIGINT) AS n
              FROM events GROUP BY 1
            )
            SELECT day, n,
                   CAST(median(n) OVER w AS DOUBLE) AS med7,
                   CAST(count(*) OVER w AS BIGINT) AS n_days_in_frame
            FROM daily WINDOW w AS (ORDER BY day ASC
                                    RANGE BETWEEN 6 PRECEDING
                                    AND CURRENT ROW)
        """,
        "b10_winsorized": """
            WITH li AS (
              SELECT l_returnflag,
                     CAST(floor(l_extendedprice * 100) AS BIGINT) AS cents
              FROM lineitem
            ),
            th AS (
              SELECT l_returnflag,
                     CAST(floor(quantile_cont(cents, 0.05)) AS BIGINT)
                       AS p05c,
                     CAST(floor(quantile_cont(cents, 0.95)) AS BIGINT)
                       AS p95c
              FROM li GROUP BY l_returnflag
            ),
            clamped AS (
              SELECT li.l_returnflag, th.p05c, th.p95c, cents,
                     greatest(least(cents, th.p95c), th.p05c) AS w,
                     cents BETWEEN th.p05c AND th.p95c AS inr
              FROM li JOIN th USING (l_returnflag)
            )
            SELECT l_returnflag, p05c, p95c,
                   CAST(count(*) AS BIGINT) AS n,
                   CAST((sum(cents) * 10000) // count(*) AS BIGINT)
                     AS raw_mean_micros,
                   CAST((sum(w) * 10000) // count(*) AS BIGINT)
                     AS winsor_mean_micros,
                   CAST((sum(CASE WHEN inr THEN cents ELSE 0 END) * 10000)
                        // sum(CASE WHEN inr THEN 1 ELSE 0 END) AS BIGINT)
                     AS trimmed_mean_micros,
                   CAST(sum(CASE WHEN inr THEN 0 ELSE 1 END) AS BIGINT)
                     AS n_clamped
            FROM clamped GROUP BY l_returnflag, p05c, p95c
        """,
        "b11_ohlc": """
            WITH ev AS (
              SELECT event_id,
                     CAST(floor(epoch(ts)) AS BIGINT) AS sec,
                     CAST(floor(value * 100) AS BIGINT) AS cents
              FROM events
            ),
            hr AS (SELECT *, sec // 3600 AS hr FROM ev),
            ranked AS (
              SELECT hr, cents,
                     row_number() OVER (
                       PARTITION BY hr ORDER BY sec ASC, event_id ASC)
                       AS ra,
                     row_number() OVER (
                       PARTITION BY hr ORDER BY sec DESC, event_id DESC)
                       AS rd
              FROM hr
            )
            SELECT hr,
                   max(CASE WHEN ra = 1 THEN cents END) AS open_cents,
                   max(cents) AS high_cents,
                   min(cents) AS low_cents,
                   max(CASE WHEN rd = 1 THEN cents END) AS close_cents,
                   CAST(count(*) AS BIGINT) AS volume
            FROM ranked GROUP BY hr
        """,

        "b11_seasonality": """
            WITH cells AS (
              SELECT event_type,
                     CAST((CAST(epoch_us(ts) AS BIGINT) // 86400000000 + 4)
                          % 7 AS INT) AS dow,
                     CAST(count(*) AS BIGINT) AS n
              FROM events GROUP BY 1, 2
            ),
            tot AS (
              SELECT event_type, CAST(count(*) AS BIGINT) AS t
              FROM events GROUP BY 1
            )
            SELECT c.event_type, c.dow, c.n,
                   round(CAST(c.n AS DOUBLE) / t.t, 6) AS share,
                   CAST(row_number() OVER (PARTITION BY c.event_type
                        ORDER BY c.n DESC, c.dow ASC) AS INT) AS busy_rank
            FROM cells c JOIN tot t USING (event_type)
        """,

        "b10_two_proportion": """
            WITH picks AS (
              SELECT min(event_type) AS va, max(event_type) AS vb FROM events
            ),
            per AS (
              SELECT event_type, CAST(count(*) AS BIGINT) AS n,
                     CAST(sum(CASE WHEN value > 50.0 THEN 1 ELSE 0 END)
                          AS BIGINT) AS x
              FROM events, picks
              WHERE event_type = picks.va OR event_type = picks.vb
              GROUP BY event_type
            ),
            a AS (
              SELECT event_type AS variant_a, n AS n_a, x AS x_a
              FROM per, picks WHERE event_type = picks.va
            ),
            b AS (
              SELECT event_type AS variant_b, n AS n_b, x AS x_b
              FROM per, picks WHERE event_type = picks.vb
            ),
            r AS (
              SELECT *,
                     CAST(x_a AS DOUBLE) / n_a AS p1,
                     CAST(x_b AS DOUBLE) / n_b AS p2,
                     CAST(x_a + x_b AS DOUBLE) / (n_a + n_b) AS pp
              FROM a CROSS JOIN b
            ),
            rz AS (
              SELECT *, round((p1 - p2) / sqrt(pp * (1.0 - pp)
                     * (1.0 / n_a + 1.0 / n_b)), 6) AS z
              FROM r
            )
            SELECT variant_a, variant_b, n_a, x_a, n_b, x_b,
                   round(p1, 6) AS p_a, round(p2, 6) AS p_b, z,
                   (abs(z) >= 1.96) AS significant
            FROM rz
        """,
        "b11_cusum": """
            WITH hourly AS (
              SELECT event_type,
                     CAST(CAST(epoch_us(ts) AS BIGINT) // 3600000000
                          AS BIGINT) AS hr_idx,
                     CAST(count(*) AS BIGINT) AS n
              FROM events GROUP BY 1, 2
            ),
            tot AS (
              SELECT event_type, hr_idx, n,
                     CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT)
                       AS h,
                     CAST(sum(n) OVER (PARTITION BY event_type) AS BIGINT)
                       AS t
              FROM hourly
            ),
            scored AS (
              SELECT event_type, hr_idx, h,
                     CAST(sum(n * h - t)
                          OVER (PARTITION BY event_type ORDER BY hr_idx
                                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS s
              FROM tot
            ),
            ranked AS (
              SELECT *, row_number() OVER (PARTITION BY event_type
                        ORDER BY abs(s) DESC, hr_idx ASC) AS rn
              FROM scored
            )
            SELECT event_type, h AS n_hours, hr_idx AS peak_hr_idx,
                   s AS cusum_scaled,
                   round(CAST(s AS DOUBLE) / h, 6) AS cusum_peak
            FROM ranked WHERE rn = 1
        """,

        "b14_struct_funcs": """
            WITH rows_s AS (
              SELECT l_returnflag,
                     ((l_quantity, l_extendedprice) > (25.0, 30000.0))
                       AS gt,
                     (l_linenumber = 1) AS eq1,
                     l_quantity AS q, l_extendedprice AS p
              FROM lineitem
            ),
            ranked AS (
              SELECT *, row_number() OVER (PARTITION BY l_returnflag
                        ORDER BY q DESC, p DESC) AS rn
              FROM rows_s
            ),
            agg AS (
              SELECT l_returnflag,
                     CAST(sum(CASE WHEN gt THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_gt,
                     CAST(sum(CASE WHEN eq1 THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_line1
              FROM rows_s GROUP BY l_returnflag
            )
            SELECT a.l_returnflag, a.n_gt, a.n_line1,
                   r.q AS max_q, round(r.p, 2) AS max_p
            FROM agg a JOIN ranked r
              ON r.l_returnflag = a.l_returnflag AND r.rn = 1
        """,

        "b10_permutation_fdr": """
            WITH anchor AS (
              SELECT (min(epoch_us(ts)) + max(epoch_us(ts))) // 2 AS mid
              FROM events
            ),
            base AS (
              SELECT event_type, event_id,
                     CAST(floor(value * 1000) AS BIGINT) AS v,
                     CASE WHEN epoch_us(ts) < mid THEN 1 ELSE -1 END AS s0
              FROM events CROSS JOIN anchor
            ),
            perms AS (
              SELECT event_type, b,
                     CASE WHEN b = 0 THEN s0
                          ELSE 1 - 2 * ((CAST('0x' || substr(md5(CAST(event_id * 33 + b AS VARCHAR)), 1, 15) AS BIGINT)) % 2)
                     END * v AS sv
              FROM base CROSS JOIN (
                SELECT unnest(generate_series(0, 32)) AS b
              )
            ),
            t AS (
              SELECT event_type, b,
                     CAST(abs(sum(sv)) AS BIGINT) AS t
              FROM perms GROUP BY event_type, b
            ),
            obs AS (
              SELECT event_type, t AS t_obs FROM t WHERE b = 0
            ),
            p AS (
              SELECT t.event_type, min(obs.t_obs) AS t_obs,
                     CAST(1 + sum(CASE WHEN t.t >= obs.t_obs
                                       THEN 1 ELSE 0 END) AS BIGINT) AS p_num
              FROM t JOIN obs ON obs.event_type = t.event_type
              WHERE t.b > 0
              GROUP BY t.event_type
            ),
            ranked AS (
              SELECT *,
                     CAST(row_number() OVER (
                       ORDER BY p_num ASC, event_type ASC) AS BIGINT) AS rank,
                     count(*) OVER () AS m
              FROM p
            ),
            istar AS (
              SELECT max(CASE WHEN 10 * m * p_num <= 33 * rank
                              THEN rank ELSE 0 END) AS i FROM ranked
            )
            SELECT event_type, t_obs, p_num, rank,
                   rank <= istar.i AS rejected
            FROM ranked CROSS JOIN istar
        """,

        "b10_mann_kendall": """
            WITH daily AS (
              SELECT event_type,
                     epoch_us(ts) // 86400000000 AS d,
                     CAST(count(*) AS BIGINT) AS c
              FROM events GROUP BY 1, 2
            ),
            pairs AS (
              SELECT a.event_type,
                     CAST(sign(b.c - a.c) AS BIGINT) AS sg,
                     (b.c - a.c) * 1000000 // (b.d - a.d) AS sl
              FROM daily a JOIN daily b
                ON a.event_type = b.event_type AND a.d < b.d
            ),
            ranked AS (
              SELECT *,
                     row_number() OVER (
                       PARTITION BY event_type
                       ORDER BY sl ASC, sg ASC) AS rn,
                     count(*) OVER (PARTITION BY event_type) AS np
              FROM pairs
            ),
            agg AS (
              SELECT event_type,
                     CAST(sum(sg) AS BIGINT) AS s_stat,
                     CAST(min(CASE WHEN rn = (np + 1) // 2 THEN sl END)
                          AS BIGINT) AS sen_slope_x1e6
              FROM ranked GROUP BY event_type
            ),
            nd AS (
              SELECT event_type, CAST(count(*) AS BIGINT) AS n_days
              FROM daily GROUP BY event_type
            ),
            ties AS (
              SELECT event_type,
                     CAST(sum(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tie
              FROM (
                SELECT event_type, c, CAST(count(*) AS BIGINT) AS t
                FROM daily GROUP BY event_type, c
              ) GROUP BY event_type
            )
            SELECT a.event_type, nd.n_days, a.s_stat,
                   CAST(nd.n_days * (nd.n_days - 1) * (2 * nd.n_days + 5)
                        - ties.tie AS BIGINT) AS var_s_x18,
                   CASE WHEN nd.n_days * (nd.n_days - 1)
                             * (2 * nd.n_days + 5) - ties.tie > 0 THEN
                     round(CAST(CASE WHEN a.s_stat > 0 THEN a.s_stat - 1
                                     WHEN a.s_stat < 0 THEN a.s_stat + 1
                                     ELSE 0 END AS DOUBLE)
                           / sqrt(CAST(nd.n_days * (nd.n_days - 1)
                                       * (2 * nd.n_days + 5) - ties.tie
                                       AS DOUBLE) / 18.0), 6)
                   END AS z,
                   a.sen_slope_x1e6
            FROM agg a
            JOIN nd ON nd.event_type = a.event_type
            JOIN ties ON ties.event_type = a.event_type
        """,

        "b15_changepoint": """
            WITH daily AS (
              SELECT event_type,
                     epoch_us(ts) // 86400000000 AS day,
                     CAST(count(*) AS BIGINT) AS c
              FROM events GROUP BY 1, 2
            ),
            pre AS (
              SELECT event_type, day, c,
                     CAST(row_number() OVER w AS BIGINT) AS t,
                     CAST(sum(c) OVER w AS BIGINT) AS s_t,
                     CAST(count(*) OVER (PARTITION BY event_type)
                          AS BIGINT) AS n,
                     CAST(sum(c) OVER (PARTITION BY event_type)
                          AS BIGINT) AS s_n
              FROM daily
              WINDOW w AS (PARTITION BY event_type ORDER BY day ASC
                           ROWS BETWEEN UNBOUNDED PRECEDING
                           AND CURRENT ROW)
            ),
            scored AS (
              SELECT *, abs(n * s_t - t * s_n) AS dev
              FROM pre WHERE t < n
            ),
            best AS (
              SELECT *, row_number() OVER (
                PARTITION BY event_type
                ORDER BY dev DESC, t ASC) AS rn
              FROM scored
            )
            SELECT event_type,
                   n AS n_days,
                   t AS t_star,
                   day AS split_day,
                   CAST(dev AS BIGINT) AS dev_max,
                   s_t * 1000000 // t AS mean_before_x1e6,
                   (s_n - s_t) * 1000000 // (n - t) AS mean_after_x1e6
            FROM best WHERE rn = 1
        """,

        "b12_diversified_topk": """
            WITH capped AS (
              SELECT l_orderkey, l_linenumber, l_suppkey, l_extendedprice,
                     CAST(row_number() OVER (
                       PARTITION BY l_suppkey
                       ORDER BY l_extendedprice DESC, l_orderkey ASC,
                                l_linenumber ASC) AS BIGINT)
                       AS within_supp_rank
              FROM lineitem
            )
            SELECT CAST(row_number() OVER (
                     ORDER BY l_extendedprice DESC, l_orderkey ASC,
                              l_linenumber ASC, within_supp_rank ASC)
                     AS BIGINT) AS rnk,
                   l_orderkey, l_linenumber, l_suppkey, l_extendedprice,
                   within_supp_rank
            FROM capped WHERE within_supp_rank <= 2
            ORDER BY l_extendedprice DESC, l_orderkey ASC,
                     l_linenumber ASC, within_supp_rank ASC
            LIMIT 20
        """,

        "b10_anova": """
            -- one-way ANOVA over milli-quantized event values: exact
            -- integer power sums; the floored projection term
            -- S_g*S_g // n_g defines the statistic on BOTH engines
            WITH q AS (
              SELECT event_type,
                     CAST(floor(value * 1000) AS BIGINT) AS v
              FROM events
            ),
            per_g AS (
              SELECT event_type,
                     CAST(count(*) AS BIGINT) AS n_g,
                     CAST(sum(v) AS BIGINT) AS sum_milli,
                     -- HUGEINT product mirrors the engine's
                     -- decimal(38,0) accumulation of the squares
                     CAST(sum(CAST(v AS HUGEINT) * v) AS BIGINT)
                       AS ssq_milli
              FROM q GROUP BY event_type
            ),
            tot AS (
              SELECT CAST(count(*) AS BIGINT) AS k_groups,
                     CAST(sum(n_g) AS BIGINT) AS n_total,
                     CAST(sum(sum_milli) AS BIGINT) AS s_all,
                     CAST(sum(ssq_milli) AS BIGINT) AS q_all,
                     CAST(sum(CAST(sum_milli AS HUGEINT) * sum_milli
                              // n_g) AS BIGINT)
                       AS b_all
              FROM per_g
            )
            SELECT p.event_type, p.n_g, p.sum_milli, p.ssq_milli,
                   g.k_groups, g.n_total,
                   CAST(g.b_all - (CAST(g.s_all AS HUGEINT) * g.s_all // g.n_total)
                        AS BIGINT) AS ssb_x,
                   CAST(g.q_all - g.b_all AS BIGINT) AS ssw_x,
                   CAST(g.k_groups - 1 AS BIGINT) AS df_between,
                   CAST(g.n_total - g.k_groups AS BIGINT) AS df_within,
                   CASE WHEN g.q_all - g.b_all > 0
                             AND g.b_all - (CAST(g.s_all AS HUGEINT) * g.s_all // g.n_total)
                                 >= 0
                             AND g.k_groups > 1
                             AND g.n_total > g.k_groups THEN
                     round(CAST(g.b_all - (CAST(g.s_all AS HUGEINT) * g.s_all // g.n_total)
                                AS DOUBLE)
                           * CAST(g.n_total - g.k_groups AS DOUBLE)
                           / (CAST(g.q_all - g.b_all AS DOUBLE)
                              * CAST(g.k_groups - 1 AS DOUBLE)), 6)
                   END AS f
            FROM per_g p CROSS JOIN tot g
        """,

        "b12_limit_pushdown_audit": f"""
            -- two-phase top-k algebra: per 32-bucket partition model,
            -- rows scanned vs heap survivors (<= k) vs winners; the
            -- winners leg is the ORDER BY + LIMIT the audit audits
            WITH keyed AS (
              SELECT CAST(floor(l_extendedprice * 100) AS BIGINT)
                       AS price_c,
                     l_orderkey, l_partkey, l_suppkey, l_linenumber,
                     l_returnflag, l_linestatus, l_quantity,
                     {portable_hash60_sql(
                         "concat_ws('|', l_orderkey, l_partkey,"
                         " l_suppkey, l_linenumber)"
                     )} % 32 AS bucket
              FROM lineitem
            ),
            winners AS (
              SELECT bucket FROM keyed
              ORDER BY price_c DESC, l_orderkey, l_partkey, l_suppkey,
                       l_linenumber, l_returnflag, l_linestatus,
                       l_quantity
              LIMIT 100
            ),
            pb AS (
              SELECT bucket, CAST(count(*) AS BIGINT) AS n_rows
              FROM keyed GROUP BY bucket
            ),
            wb AS (
              SELECT bucket, CAST(count(*) AS BIGINT) AS n_winners
              FROM winners GROUP BY bucket
            )
            SELECT p.bucket, p.n_rows,
                   CAST(least(p.n_rows, 100) AS BIGINT) AS heap_out,
                   CAST(coalesce(w.n_winners, 0) AS BIGINT) AS n_winners,
                   round(CAST(least(p.n_rows, 100) AS DOUBLE)
                         / CAST(p.n_rows AS DOUBLE), 6) AS merge_frac
            FROM pb p LEFT JOIN wb w ON p.bucket = w.bucket
        """,

        "b12_keyset_parity": """
            -- ground truth via a global row_number (fine HERE: the
            -- Spark side is what must never sort the corpus); both
            -- legs of a correct paginator equal the rn slices, so the
            -- oracle emits each page's slice stats twice + match=true
            WITH ranked AS (
              SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber,
                     l_returnflag, l_linestatus, l_quantity,
                     row_number() OVER (ORDER BY
                       l_orderkey, l_partkey, l_suppkey, l_linenumber,
                       l_returnflag, l_linestatus, l_quantity) AS rn
              FROM lineitem
            ),
            pages AS (
              SELECT CAST((rn - 1) // 200 AS INT) AS page,
                     CAST('0x' || substr(md5(concat_ws('|',
                          l_orderkey, l_partkey, l_suppkey, l_linenumber,
                          l_returnflag, l_linestatus,
                          CAST(floor(l_quantity * 100) AS BIGINT))), 1, 15)
                       AS BIGINT) AS h
              FROM ranked WHERE rn <= 800
            )
            SELECT page,
                   CAST(count(*) AS BIGINT) AS n_keyset,
                   CAST(count(*) AS BIGINT) AS n_slice,
                   bit_xor(h) AS keyset_xor,
                   bit_xor(h) AS slice_xor,
                   TRUE AS pages_match
            FROM pages GROUP BY page
        """,
        "b12_topk_ties": """
            -- the textbook route the engine must match: a per-group
            -- rank() window over the corpus (the engine is forbidden
            -- that shuffle; it goes histogram -> threshold -> sums)
            WITH li AS (
              SELECT l_returnflag, l_linestatus,
                     CAST(floor(l_quantity) AS BIGINT) AS v
              FROM lineitem
            ),
            r AS (
              SELECT l_returnflag, l_linestatus, v,
                     rank() OVER (PARTITION BY l_returnflag, l_linestatus
                                  ORDER BY v DESC) AS rk
              FROM li
            ),
            th AS (
              SELECT l_returnflag, l_linestatus,
                     CAST(min(CASE WHEN rk <= 5 THEN v END) AS BIGINT)
                       AS threshold
              FROM r GROUP BY l_returnflag, l_linestatus
            )
            SELECT r.l_returnflag, r.l_linestatus,
                   CAST(5 AS BIGINT) AS k,
                   th.threshold,
                   CAST(sum((r.v > th.threshold)::INT) AS BIGINT) AS n_above,
                   CAST(sum((r.v = th.threshold)::INT) AS BIGINT)
                     AS n_at_threshold,
                   CAST(sum((r.v >= th.threshold)::INT) AS BIGINT) AS n_kept
            FROM r JOIN th USING (l_returnflag, l_linestatus)
            GROUP BY r.l_returnflag, r.l_linestatus, th.threshold
        """,
}
