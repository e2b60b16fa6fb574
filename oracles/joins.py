"""DuckDB oracle SQL — joins family (split from
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
        "b7_join_enrich": """
            SELECT r_name AS region, n_name AS nation,
                   count(*) AS n_orders,
                   round(CAST(sum(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE), 2) AS revenue
            FROM orders
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            GROUP BY 1, 2
        """,
        "b8_anti_join": """
            SELECT c_custkey, c_mktsegment FROM customer
            WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        """,
        "b8_semi_join": """
            SELECT c_mktsegment, count(*) AS n_customers FROM customer
            WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
            GROUP BY 1
        """,
        "b9_asof": """
            SELECT user_id, event_id, ts, event_type, value FROM (
              SELECT *, row_number() OVER (
                PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
              FROM events WHERE ts <= TIMESTAMP '2024-02-01 00:00:00'
            ) WHERE rn = 1
        """,
        "b7_multi_join_revenue": """
            SELECT n_name AS nation,
                   round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))
                     * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4))))
                     AS DOUBLE), 2) AS revenue,
                   count(*) AS n_items
            FROM lineitem
            JOIN orders   ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation   ON s_nationkey = n_nationkey
            JOIN region   ON n_regionkey = r_regionkey
            WHERE c_nationkey = s_nationkey
              AND r_name = 'ASIA'
              AND o_orderdate >= TIMESTAMP '1996-01-01'
              AND o_orderdate <  TIMESTAMP '1997-01-01'
            GROUP BY n_name
        """,
        "b7_nation_volume": """
            SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
                   CAST(year(l_shipdate) AS INTEGER) AS l_year,
                   round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))
                     * (CAST(1 AS DECIMAL(18,4))
                        - CAST(l_discount AS DECIMAL(18,4))))
                     AS DOUBLE), 2) AS volume,
                   CAST(count(*) AS BIGINT) AS n_items
            FROM lineitem
            JOIN orders   ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation ns ON s_nationkey = ns.n_nationkey
            JOIN nation nc ON c_nationkey = nc.n_nationkey
            WHERE (ns.n_name = 'NATION_1' AND nc.n_name = 'NATION_2')
               OR (ns.n_name = 'NATION_2' AND nc.n_name = 'NATION_1')
            GROUP BY 1, 2, 3
        """,
        "b8_supplier_part_types": """
            WITH ps AS (
              SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
            ),
            kept AS (
              SELECT * FROM ps
              WHERE l_suppkey NOT IN (
                SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
            )
            SELECT p_brand,
                   split_part(p_type, ' ', 1) AS p_family,
                   p_size,
                   CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
            FROM kept JOIN part ON l_partkey = p_partkey
            WHERE p_size <= 30
            GROUP BY 1, 2, 3
        """,
        "b9_scd2_pit": f"""
            WITH changes AS ({_EVENTS_CHANGES_SQL}),
            keyed AS (
              SELECT id, timestamp, operation,
                     CAST(json_extract_string(coalesce(after, before),
                                              '$.user_id') AS BIGINT) AS user_id
              FROM changes
            ),
            v AS (
              SELECT *,
                     lead(timestamp) OVER (PARTITION BY user_id ORDER BY id)
                       AS valid_to
              FROM keyed
            ),
            versions AS (
              SELECT user_id AS vu, id AS version_id,
                     timestamp AS valid_from, valid_to
              FROM v WHERE operation <> 'DELETE'
            ),
            ev AS (
              SELECT event_id, user_id, ts FROM events
              WHERE event_type = 'purchase'
            ),
            j AS (
              SELECT e.event_id, e.user_id, e.ts,
                     s.version_id, s.valid_from, s.valid_to,
                     row_number() OVER (
                       PARTITION BY e.event_id
                       ORDER BY s.valid_from DESC, s.version_id DESC
                     ) AS rn
              FROM ev e LEFT JOIN versions s
                ON e.user_id = s.vu AND s.valid_from <= e.ts
            )
            SELECT event_id, user_id, ts, version_id,
                   CASE WHEN version_id IS NULL THEN 'none'
                        WHEN valid_to IS NULL OR ts < valid_to THEN 'live'
                        ELSE 'closed'
                   END AS status
            FROM j WHERE rn = 1
        """,
        "b7_outer_join": """
            SELECT c.c_custkey, c.c_mktsegment,
                   count(o.o_orderkey) AS n_orders,
                   count(o.o_orderkey) = 0 AS is_inactive
            FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
            GROUP BY c.c_custkey, c.c_mktsegment
        """,
        "b9_band_join": """
            WITH bands AS (
              SELECT * FROM (VALUES
                (0, 50000, 'low'),
                (50000, 150000, 'mid'),
                (150000, 1000000000, 'high')) t(lo, hi, band)
            )
            SELECT band, count(*) AS n_orders,
                   round(CAST(sum(CAST(o_totalprice AS DECIMAL(38,6)))
                              AS DOUBLE), 2) AS revenue
            FROM orders o JOIN bands b
              ON o.o_totalprice >= b.lo AND o.o_totalprice < b.hi
            GROUP BY band
        """,
        "b8_waiting_suppliers": _SQL_WAITING_SUPPLIERS,
        "b8_idle_customers": _SQL_IDLE_CUSTOMERS,
        "b9_asof_join": """
            WITH o AS (
              SELECT o_orderkey, o_custkey % 100 AS k, o_orderdate
              FROM orders WHERE o_orderkey % 29 = 0
            ),
            j AS (
              SELECT o.o_orderkey, o.k, e.ts, e.event_id, e.value
              FROM o LEFT JOIN events e
                ON o.k = e.user_id AND e.ts <= o.o_orderdate
            ),
            ranked AS (
              SELECT *, row_number() OVER (
                PARTITION BY o_orderkey
                ORDER BY ts DESC NULLS LAST, event_id DESC NULLS LAST) AS rn
              FROM j
            )
            SELECT o_orderkey, k, event_id, value FROM ranked WHERE rn = 1
        """,
        "b7_returned_revenue": """
            WITH agg AS (
              SELECT c.c_custkey, c.c_name, n.n_name,
                     round(CAST(sum(
                       CAST(l.l_extendedprice AS DECIMAL(38,6))
                       * (CAST(1 AS DECIMAL(38,6))
                          - CAST(l.l_discount AS DECIMAL(38,6)))
                     ) AS DOUBLE), 2) AS revenue
              FROM lineitem l
              JOIN orders o ON l.l_orderkey = o.o_orderkey
              JOIN customer c ON o.o_custkey = c.c_custkey
              JOIN nation n ON c.c_nationkey = n.n_nationkey
              WHERE l.l_returnflag = 'R'
                AND o.o_orderdate >= '1995-01-01'
                AND o.o_orderdate < '1996-01-01'
              GROUP BY c.c_custkey, c.c_name, n.n_name
            )
            SELECT *, CAST(row_number() OVER (
              ORDER BY revenue DESC, c_custkey ASC) AS BIGINT) AS rank
            FROM agg
            ORDER BY revenue DESC, c_custkey ASC LIMIT 20
        """,
        "b9_asof_tolerance": """
            WITH o AS (
              SELECT o_orderkey, o_custkey % 100 AS k,
                     CAST(o_orderdate AS TIMESTAMP) AS odate
              FROM orders WHERE o_orderkey % 29 = 0
            ),
            j AS (
              SELECT o.o_orderkey, o.k, e.event_id, e.value, e.ts,
                     row_number() OVER (
                       PARTITION BY o.o_orderkey
                       ORDER BY e.ts DESC NULLS LAST,
                                e.event_id DESC NULLS LAST) AS rn
              FROM o LEFT JOIN events e
                ON e.user_id = o.k AND e.ts <= o.odate
               AND CAST(floor(epoch(e.ts)) AS BIGINT)
                   >= CAST(floor(epoch(o.odate)) AS BIGINT) - 604800
            )
            SELECT o_orderkey, k,
                   CAST(event_id AS BIGINT) AS event_id, value
            FROM j WHERE rn = 1
        """,
        "b7_skew_diagnosis": """
            WITH per_key AS (
              SELECT l_orderkey, CAST(count(*) AS BIGINT) AS n_rows
              FROM lineitem GROUP BY l_orderkey
            ),
            scal AS (
              SELECT CAST(sum(n_rows) AS DOUBLE) AS total,
                     avg(CAST(n_rows AS DOUBLE)) AS mean
              FROM per_key
            )
            SELECT l_orderkey, n_rows,
                   round(n_rows / s.total, 6) AS share,
                   round(n_rows / s.mean, 6) AS skew_ratio,
                   CAST(rank AS BIGINT) AS rank
            FROM (
              SELECT *, row_number() OVER (
                ORDER BY n_rows DESC, l_orderkey ASC) AS rank
              FROM per_key
            ) p CROSS JOIN scal s
            WHERE rank <= 20
        """,
        "b7_shipping_priority": """
            WITH agg AS (
              SELECT l.l_orderkey,
                     CAST(o.o_orderdate AS DATE) AS o_orderdate,
                     o.o_orderpriority,
                     round(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(38,6))
                           * (CAST(1 AS DECIMAL(38,6))
                              - CAST(l.l_discount AS DECIMAL(38,6))))
                           AS DOUBLE), 2) AS revenue
              FROM lineitem l
              JOIN orders o ON l.l_orderkey = o.o_orderkey
              JOIN customer c ON o.o_custkey = c.c_custkey
              WHERE c.c_mktsegment = 'BUILDING'
                AND o.o_orderdate < TIMESTAMP '1996-06-01'
                AND l.l_shipdate > TIMESTAMP '1996-06-01'
              GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
            )
            SELECT l_orderkey, o_orderdate, o_orderpriority, revenue,
                   CAST(rank AS BIGINT) AS rank
            FROM (
              SELECT *, row_number() OVER (
                ORDER BY revenue DESC, l_orderkey ASC) AS rank
              FROM agg
            ) WHERE rank <= 10
        """,
        "b7_salted_join": """
            SELECT o.o_custkey, count(*) AS n_items,
                   CAST(sum(CAST(l.l_quantity AS DECIMAL(38,6))) AS DOUBLE)
                     AS sum_qty
            FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
            GROUP BY o.o_custkey
        """,
        "b7_bloom_join": _bloom_oracle_sql(),
        "b7_bloom_incremental": _bloom_incremental_oracle_sql(),
        "b8_order_distribution": """
            WITH per AS (
              SELECT c.c_custkey,
                     CAST(count(o.o_orderkey) AS BIGINT) AS c_count
              FROM customer c
              LEFT JOIN orders o
                ON o.o_custkey = c.c_custkey
                   AND o.o_orderpriority NOT LIKE '1-%'
              GROUP BY c.c_custkey
            )
            SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
            FROM per GROUP BY c_count
        """,
        "b7_cust_order_dist": """
            WITH per AS (
              SELECT c.c_custkey,
                     CAST(count(o.o_orderkey) AS BIGINT) AS c_count
              FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
              GROUP BY c.c_custkey
            )
            SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
            FROM per GROUP BY c_count
        """,
        "b8_min_cost_supplier": """
            WITH u AS (
              SELECT l_partkey, l_suppkey,
                     l_extendedprice / l_quantity AS unit
              FROM lineitem
            ),
            m AS (SELECT l_partkey, min(unit) AS mu FROM u GROUP BY l_partkey),
            b AS (
              SELECT u.l_partkey,
                     CAST(min(u.l_suppkey) AS BIGINT) AS s_suppkey,
                     min(u.unit) AS unit
              FROM u JOIN m ON u.l_partkey = m.l_partkey AND u.unit = m.mu
              GROUP BY u.l_partkey
            )
            SELECT b.l_partkey, b.s_suppkey, s.s_name,
                   CAST(floor(b.unit * 1000000) AS BIGINT) AS unit_micros
            FROM b JOIN supplier s ON b.s_suppkey = s.s_suppkey
        """,
        "b8_important_parts": """
            WITH rev AS (
              SELECT l_partkey,
                     CAST(floor(sum(CAST(l_extendedprice AS DECIMAL(38,6))
                                    * (CAST(1 AS DECIMAL(38,6))
                                       - CAST(l_discount AS DECIMAL(38,6))))
                                * 100) AS BIGINT) AS revenue_cents
              FROM lineitem GROUP BY l_partkey
            ),
            t AS (
              SELECT CAST(sum(revenue_cents) AS BIGINT) AS total,
                     CAST(count(*) AS BIGINT) AS n_parts
              FROM rev
            )
            SELECT l_partkey, revenue_cents,
                   round(CAST(revenue_cents AS DOUBLE)
                         / CAST(total AS DOUBLE), 6) AS share
            FROM rev, t
            WHERE CAST(revenue_cents AS HUGEINT) * n_parts * 2 > CAST(total AS HUGEINT) * 3
        """,
        "b7_volume_shipping": """
            SELECT n1.n_name AS supp_nation,
                   n2.n_name AS cust_nation,
                   CAST(year(l.l_shipdate) AS INT) AS l_year,
                   round(CAST(sum(
                     CAST(l.l_extendedprice AS DECIMAL(38,6))
                     * (CAST(1 AS DECIMAL(38,6))
                        - CAST(l.l_discount AS DECIMAL(38,6)))
                   ) AS DOUBLE), 2) AS revenue
            FROM lineitem l
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            JOIN supplier s ON l.l_suppkey = s.s_suppkey
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
            JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
            WHERE l.l_shipdate >= '1995-01-01'
              AND l.l_shipdate < '1997-01-01'
              AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
                   OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
            GROUP BY n1.n_name, n2.n_name, year(l.l_shipdate)
        """,
        "b7_market_share": """
            WITH agg AS (
              SELECT year(o.o_orderdate) AS o_year,
                     sum(CASE WHEN sn.n_name = 'NATION_3' THEN
                       CAST(l.l_extendedprice AS DECIMAL(38,6))
                       * (CAST(1 AS DECIMAL(38,6))
                          - CAST(l.l_discount AS DECIMAL(38,6)))
                     ELSE CAST(0 AS DECIMAL(38,6)) END) AS nat,
                     sum(
                       CAST(l.l_extendedprice AS DECIMAL(38,6))
                       * (CAST(1 AS DECIMAL(38,6))
                          - CAST(l.l_discount AS DECIMAL(38,6)))
                     ) AS tot
              FROM lineitem l
              JOIN part p ON l.l_partkey = p.p_partkey
              JOIN orders o ON l.l_orderkey = o.o_orderkey
              JOIN customer c ON o.o_custkey = c.c_custkey
              JOIN nation cn ON c.c_nationkey = cn.n_nationkey
              JOIN supplier s ON l.l_suppkey = s.s_suppkey
              JOIN nation sn ON s.s_nationkey = sn.n_nationkey
              WHERE p.p_type = 'PROMO'
                AND cn.n_regionkey = 3
                AND o.o_orderdate >= '1995-01-01'
                AND o.o_orderdate < '1997-01-01'
              GROUP BY year(o.o_orderdate)
            )
            SELECT CAST(o_year AS INT) AS o_year,
                   round(CAST(nat AS DOUBLE), 2) AS nation_revenue,
                   round(CAST(tot AS DOUBLE), 2) AS total_revenue,
                   CAST(floor(CAST(nat AS DOUBLE) / CAST(tot AS DOUBLE)
                              * 1e6) AS BIGINT) AS share_micros
            FROM agg
        """,
        "b8_top_supplier": """
            WITH rev AS (
              SELECT l_suppkey,
                     sum(
                       CAST(l_extendedprice AS DECIMAL(38,6))
                       * (CAST(1 AS DECIMAL(38,6))
                          - CAST(l_discount AS DECIMAL(38,6)))
                     ) AS r
              FROM lineitem
              WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1996-04-01'
              GROUP BY l_suppkey
            )
            SELECT s.s_suppkey, s.s_name,
                   round(CAST(rev.r AS DOUBLE), 2) AS total_revenue
            FROM rev JOIN supplier s ON rev.l_suppkey = s.s_suppkey
            WHERE rev.r = (SELECT max(r) FROM rev)
        """,
        "b7_priority_lines": """
            SELECT l.l_linestatus,
                   CAST(sum(CASE WHEN o.o_orderpriority IN
                     ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT)
                     AS high_line_count,
                   CAST(sum(CASE WHEN o.o_orderpriority IN
                     ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END) AS BIGINT)
                     AS low_line_count
            FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
            WHERE l.l_shipdate >= '1996-01-01' AND l.l_shipdate < '1997-01-01'
            GROUP BY l.l_linestatus
        """,
        "b8_dominant_supplier": """
            WITH ps AS (
              SELECT l.l_partkey, l.l_suppkey,
                     sum(CAST(l.l_quantity AS BIGINT)) AS supp_qty
              FROM lineitem l
              JOIN part p ON l.l_partkey = p.p_partkey
              WHERE p.p_name LIKE 'small%'
              GROUP BY l.l_partkey, l.l_suppkey
            ),
            pt AS (
              SELECT l_partkey, sum(supp_qty) AS total_qty,
                     CAST(count(*) AS BIGINT) AS n_supp
              FROM ps GROUP BY l_partkey
            ),
            dom AS (
              SELECT ps.l_suppkey,
                     CAST(count(*) AS BIGINT) AS n_dominated_parts,
                     CAST(sum(ps.supp_qty) AS BIGINT) AS dominated_qty
              FROM ps JOIN pt USING (l_partkey)
              WHERE ps.supp_qty * pt.n_supp > 2 * pt.total_qty
              GROUP BY ps.l_suppkey
            )
            SELECT s.s_suppkey, s.s_name, d.n_dominated_parts,
                   d.dominated_qty
            FROM dom d JOIN supplier s ON d.l_suppkey = s.s_suppkey
        """,
    "b9_nearest_event": f"""
        WITH ev AS (
          SELECT user_id AS k, ts, event_id, value,
                 CAST(epoch_us(ts) AS BIGINT) AS rt,
                 CAST(epoch_us(ts) AS BIGINT) // 259200000000 AS rb
          FROM events
        ),
        o AS (
          SELECT o_orderkey, o_custkey % 100 AS k, lt, lt // 259200000000 AS b
          FROM (
            SELECT o_orderkey, o_custkey,
                   CAST(epoch_us(TIMESTAMP '2024-01-01 00:00:00'
                        + to_days(CAST(o_orderkey % 30 AS INTEGER))
                        + to_hours(CAST(o_custkey % 24 AS INTEGER)))
                        AS BIGINT) AS lt
            FROM orders WHERE o_orderkey % 29 = 0
          )
        ),
        cand AS (
          SELECT o.o_orderkey, o.k, ev.event_id, ev.value,
                 ev.rt - o.lt AS dt
          FROM o
          JOIN ev ON ev.k = o.k
                 AND ev.rb BETWEEN o.b - 1 AND o.b + 1
          WHERE abs(ev.rt - o.lt) <= 259200000000
        )
        SELECT o_orderkey, k, event_id AS r_event_id,
               CAST(dt AS BIGINT) AS dt_us,
               round(value, 6) AS nearest_value
        FROM (
          SELECT *, row_number() OVER (PARTITION BY o_orderkey
                 ORDER BY abs(dt), dt, event_id) AS rn
          FROM cand
        ) WHERE rn = 1
    """,
    "b7_promo_share": """
        SELECT date_trunc('month', l_shipdate)::DATE AS month,
               round(100.0
                     * CAST(sum(CASE WHEN p_type = 'PROMO'
                                THEN CAST(l_extendedprice * (1.0 - l_discount)
                                          AS DECIMAL(38,10))
                                ELSE CAST(0 AS DECIMAL(38,10)) END)
                            AS DOUBLE)
                     / CAST(sum(CAST(l_extendedprice * (1.0 - l_discount)
                                     AS DECIMAL(38,10))) AS DOUBLE), 6)
                 AS promo_share_pct,
               CAST(count(*) AS BIGINT) AS n_lines
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY 1
    """,
    "b8_supplier_part_counts": """
        WITH pairs AS (
          SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
        )
        SELECT p_brand, p_type, CAST(p_size // 10 AS INTEGER) AS size_bucket,
               CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
        FROM pairs JOIN part ON l_partkey = p_partkey
        WHERE p_brand <> 'Brand#4'
        GROUP BY 1, 2, 3
    """,

        "b7_join_size_estimate": """
            WITH ca AS (
              SELECT o_custkey, CAST(count(*) AS BIGINT) AS na
              FROM orders GROUP BY o_custkey
            ),
            cb AS (
              SELECT o.o_custkey AS k, CAST(count(*) AS BIGINT) AS nb
              FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
              GROUP BY o.o_custkey
            ),
            j AS (
              SELECT ca.o_custkey // 512 AS bucket, ca.na, cb.nb
              FROM ca JOIN cb ON ca.o_custkey = cb.k
            ),
            agg AS (
              SELECT bucket,
                     CAST(count(*) AS BIGINT) AS n_keys,
                     CAST(sum(na) AS BIGINT) AS sum_a,
                     CAST(sum(nb) AS BIGINT) AS sum_b,
                     CAST(sum(na * nb) AS BIGINT) AS actual
              FROM j GROUP BY bucket
            )
            SELECT bucket, n_keys, actual,
                   round(CAST(sum_a * sum_b AS DOUBLE) / n_keys, 6)
                     AS estimate,
                   round(CAST(actual AS DOUBLE)
                         / (CAST(sum_a * sum_b AS DOUBLE) / n_keys), 6)
                     AS skew_ratio
            FROM agg
        """,

        "b7_semijoin_program": """
            WITH rf AS (
              SELECT r_regionkey FROM region WHERE r_name = 'ASIA'
            ),
            lf AS (
              SELECT l_orderkey FROM lineitem
              WHERE l_shipdate >= TIMESTAMP '1995-01-01'
                AND l_shipdate <  TIMESTAMP '1995-07-01'
            ),
            n1 AS (
              SELECT * FROM nation
              WHERE n_regionkey IN (SELECT r_regionkey FROM rf)
            ),
            c1 AS (
              SELECT * FROM customer
              WHERE c_nationkey IN (SELECT n_nationkey FROM n1)
            ),
            o1 AS (
              SELECT * FROM orders
              WHERE o_custkey IN (SELECT c_custkey FROM c1)
            ),
            l1 AS (
              SELECT * FROM lf
              WHERE l_orderkey IN (SELECT o_orderkey FROM o1)
            ),
            o2 AS (
              SELECT * FROM o1
              WHERE o_orderkey IN (SELECT l_orderkey FROM l1)
            ),
            c2 AS (
              SELECT * FROM c1
              WHERE c_custkey IN (SELECT o_custkey FROM o2)
            ),
            n2 AS (
              SELECT * FROM n1
              WHERE n_nationkey IN (SELECT c_nationkey FROM c2)
            ),
            stats AS (
              SELECT 'nation' AS relation,
                     (SELECT count(*) FROM nation) AS rows_base,
                     (SELECT count(*) FROM n2) AS rows_reduced
              UNION ALL
              SELECT 'customer',
                     (SELECT count(*) FROM customer),
                     (SELECT count(*) FROM c2)
              UNION ALL
              SELECT 'orders',
                     (SELECT count(*) FROM orders),
                     (SELECT count(*) FROM o2)
              UNION ALL
              SELECT 'lineitem',
                     (SELECT count(*) FROM lineitem),
                     (SELECT count(*) FROM l1)
            )
            SELECT relation,
                   CAST(rows_base AS BIGINT) AS rows_base,
                   CAST(rows_reduced AS BIGINT) AS rows_reduced,
                   round(1.0 - CAST(rows_reduced AS DOUBLE) / rows_base, 6)
                     AS reduction_pct
            FROM stats
        """,
}
