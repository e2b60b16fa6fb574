"""DuckDB oracle SQL — storage family (split from
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
        "b15_interval_join": """
            SELECT s.user_id AS s_user, s.event_id AS s_event,
                   p.event_id AS p_event, p.value AS p_value
            FROM (SELECT * FROM events WHERE event_type = 'signup') s
            JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
              ON s.user_id = p.user_id
             AND p.ts >= s.ts
             AND p.ts <= s.ts + INTERVAL 7 DAY
        """,
        "b15_gap_fill": """
            WITH ev AS (
              SELECT user_id % 20 AS cohort, CAST(ts AS DATE) AS day
              FROM events
            ),
            sparse AS (
              SELECT cohort, day, CAST(count(*) AS BIGINT) AS n
              FROM ev GROUP BY cohort, day
            ),
            bounds AS (SELECT min(day) AS lo, max(day) AS hi FROM ev),
            calendar AS (
              SELECT CAST(unnest(generate_series(lo, hi,
                                                 INTERVAL 1 DAY)) AS DATE)
                       AS day
              FROM bounds
            ),
            cohorts AS (SELECT DISTINCT cohort FROM ev)
            SELECT c.cohort, cal.day,
                   CAST(COALESCE(s.n, 0) AS BIGINT) AS n_events
            FROM cohorts c
            CROSS JOIN calendar cal
            LEFT JOIN sparse s ON s.cohort = c.cohort AND s.day = cal.day
        """,
        "b14_regex_funcs": """
            SELECT p_partkey,
                   coalesce(regexp_extract(p_name, '(\\w+)$', 1), '') AS last_word,
                   regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled,
                   regexp_matches(p_name, '^[a-m]') AS first_half,
                   coalesce(regexp_extract(p_type, '(\\w+)', 1), '') AS type_head
            FROM part
        """,
        "b14_string_sim": """
            SELECT a.p_partkey AS id_a, b.p_partkey AS id_b,
                   CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS edit_dist,
                   1.0 - levenshtein(a.p_name, b.p_name)
                       / CAST(greatest(length(a.p_name), length(b.p_name)) AS DOUBLE)
                     AS sim
            FROM part a JOIN part b ON a.p_partkey + 1 = b.p_partkey
        """,
        "b14_null_funcs": """
            WITH s AS (
              SELECT *,
                     CASE WHEN c_custkey % 3 = 0 THEN c_name END AS sp
              FROM customer
            )
            SELECT c_custkey,
                   coalesce(sp, '<missing>') AS comment_or_default,
                   nullif(c_mktsegment, 'BUILDING') AS seg_nb,
                   CASE WHEN sp IS NOT NULL THEN 'has' ELSE 'none' END
                     AS nvl2_shape,
                   sp IS NOT DISTINCT FROM c_name AS nullsafe_eq,
                   sp IS NULL AS is_missing
            FROM s
        """,
        "b14_bitwise_funcs": """
            SELECT o_orderkey,
                   o_orderkey << 3 AS shl3,
                   o_orderkey >> 2 AS shr2,
                   o_orderkey & 255 AS low_byte,
                   o_orderkey | 16 AS with_flag,
                   xor(o_orderkey, o_custkey) AS xor_cust,
                   CAST(bit_count(CAST(o_orderkey AS BIGINT)) AS BIGINT)
                     AS popcount
            FROM orders
        """,
        "b14_url_funcs": """
            WITH u AS (
              SELECT o_orderkey,
                     'https://shard' || CAST(o_orderkey % 8 AS VARCHAR)
                     || '.example.com/orders/' || CAST(o_orderkey AS VARCHAR)
                     || '?prio=' || regexp_replace(o_orderpriority, '\\s+', '+', 'g')
                       AS url
              FROM orders
            )
            SELECT o_orderkey, url,
                   regexp_extract(url, '^https://([^/]+)/', 1) AS host,
                   regexp_extract(url, '^https://[^/]+(/[^?]*)', 1) AS path,
                   regexp_extract(url, 'prio=([^&]+)', 1) AS prio_param
            FROM u
        """,
        "b14_trig_funcs": """
            SELECT p_partkey,
                   round(sin(p_size / 10.0), 6) AS sin_x,
                   round(cos(p_size / 10.0), 6) AS cos_x,
                   round(tan((p_partkey % 13) / 7.0), 6) AS tan_y,
                   round(atan2((p_partkey % 13) / 7.0,
                               p_size / 10.0 + 0.1), 6) AS atan2_yx,
                   round(sqrt(CAST(p_retailprice AS DOUBLE)), 6) AS sqrt_p,
                   round(exp(-(p_size / 10.0)), 6) AS exp_nx,
                   round(pow(p_size / 10.0 + 1.0, 3), 6) AS pow3,
                   round(degrees((p_partkey % 13) / 7.0), 6) AS deg_y,
                   round(radians(CAST(p_size AS DOUBLE)), 6) AS rad_s,
                   CAST(sign(CAST(p_size AS DOUBLE) - 25.0) AS INTEGER)
                     AS sgn
            FROM part
        """,
        "b13_set_ops": """
            SELECT k, 'inactive' AS status FROM (
              SELECT c_custkey AS k FROM customer
              EXCEPT SELECT o_custkey FROM orders)
            UNION ALL
            SELECT k, 'active' AS status FROM (
              SELECT c_custkey AS k FROM customer
              INTERSECT SELECT o_custkey FROM orders)
        """,
        "b14_scalar_funcs": """
            SELECT p_partkey,
                   substr(p_name, 1, 8) AS name8,
                   upper(p_brand) AS brand_uc,
                   lower(p_type) AS type_lc,
                   length(p_name) AS name_len,
                   round(p_retailprice * 1.1, 2) AS price_up,
                   CAST(abs(p_size - 25) AS BIGINT) AS size_dist,
                   p_partkey % 7 AS k_mod,
                   coalesce(nullif(p_brand, 'Brand#1'), 'OTHER') AS brand_o
            FROM part
        """,
        "b14_date_funcs": """
            SELECT o_orderkey,
                   CAST(year(o_orderdate) AS BIGINT) AS yr,
                   CAST(month(o_orderdate) AS BIGINT) AS mo,
                   CAST(day(o_orderdate) AS BIGINT) AS dom,
                   CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
                   CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s,
                   CAST(date_diff('day', CAST(o_orderdate AS DATE),
                                  DATE '1998-12-31') AS BIGINT) AS days_to_eoy
            FROM orders
        """,
        "b15_session_windows": """
            WITH marked AS (
              SELECT user_id, ts,
                     CASE WHEN lag(ts) OVER w IS NULL
                            OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
                          THEN 1 ELSE 0 END AS new_sess
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts)
            ),
            grp AS (
              SELECT *, sum(new_sess) OVER (
                PARTITION BY user_id ORDER BY ts
                ROWS UNBOUNDED PRECEDING) AS sid
              FROM marked
            )
            SELECT user_id, min(ts) AS sess_start,
                   max(ts) + INTERVAL 30 MINUTE AS sess_end,
                   count(*) AS n_events
            FROM grp GROUP BY user_id, sid
        """,
        "b14_array_funcs": """
            SELECT p_partkey,
                   unnest(string_split(p_type, ' ')) AS word,
                   CAST(len(string_split(p_type, ' ')) AS BIGINT) AS n_words,
                   string_split(p_type, ' ')[1] AS first_word,
                   array_to_string(list_sort(string_split(p_type, ' ')), ',')
                     AS sorted_words
            FROM part
        """,
        "b14_map_funcs": """
            SELECT p_partkey,
                   map(['brand','type'], [p_brand, p_type])['brand'][1] AS m_brand,
                   map(['brand','type'], [p_brand, p_type])['type'][1] AS m_type,
                   CAST(cardinality(map(['brand','type'], [p_brand, p_type])) AS BIGINT) AS m_size,
                   array_to_string(map_keys(map(['brand','type'], [p_brand, p_type])), ',') AS m_keys
            FROM part
        """,
        "b14_json_funcs": """
            SELECT event_id,
                   CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_dyn,
                   CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_typed,
                   CAST(json_array_length('[' || props || ']') AS BIGINT) AS arr_len,
                   CAST(json_object('event_type', event_type,
                                    'user_id', user_id) AS VARCHAR) AS packed
            FROM events
        """,
        "b15_sliding_windows": f"""
            WITH changes AS ({_EVENTS_CHANGES_SQL}),
            landed AS (
              SELECT date_trunc('hour', timestamp) AS win_start, operation
              FROM changes
              UNION ALL
              SELECT date_trunc('hour', timestamp) - INTERVAL 1 HOUR, operation
              FROM changes
            )
            SELECT win_start, win_start + INTERVAL 2 HOUR AS win_end,
                   operation, count(*) AS n
            FROM landed GROUP BY 1, 3
        """,
        "b17_join_view": """
            -- from-scratch recompute over the POST-batch tables: the
            -- oracle row is the increment-equals-recompute invariant
            WITH a_new AS (
              SELECT o_orderkey, o_custkey,
                     CASE WHEN o_orderkey % 13 = 0
                          THEN round(o_totalprice + 1.0, 2)
                          ELSE o_totalprice END AS o_totalprice
              FROM orders
            ),
            b_new AS (
              SELECT c_custkey AS o_custkey, c_name,
                     CASE WHEN c_custkey % 17 = 0
                          THEN round(c_acctbal + 5.0, 2)
                          ELSE c_acctbal END AS c_acctbal
              FROM customer
            )
            SELECT a_new.o_custkey, o_orderkey, o_totalprice,
                   c_name, c_acctbal
            FROM a_new JOIN b_new USING (o_custkey)
        """,
        "b15_retention": """
            WITH uw AS (
              SELECT DISTINCT user_id,
                     CAST(floor(epoch(ts)) AS BIGINT) // 604800 AS wk
              FROM events
            ),
            first AS (
              SELECT user_id, min(wk) AS cw FROM uw GROUP BY user_id
            ),
            cells AS (
              SELECT first.cw, uw.wk - first.cw AS week_offset,
                     count(DISTINCT uw.user_id) AS n_active
              FROM uw JOIN first USING (user_id)
              GROUP BY first.cw, uw.wk - first.cw
            ),
            sizes AS (
              SELECT cw, count(*) AS cohort_size FROM first GROUP BY cw
            )
            SELECT CAST(cells.cw AS BIGINT) AS cohort_week,
                   CAST(week_offset AS BIGINT) AS week_offset,
                   CAST(n_active AS BIGINT) AS n_active,
                   CAST(cohort_size AS BIGINT) AS cohort_size,
                   round(n_active / CAST(cohort_size AS DOUBLE), 6)
                     AS retention
            FROM cells JOIN sizes ON sizes.cw = cells.cw
        """,
        "b15_funnel_steps": """
            WITH s1 AS (
              SELECT user_id, min(ts) AS t FROM events
              WHERE event_type = 'view' GROUP BY user_id
            ),
            s2 AS (
              SELECT e.user_id, min(e.ts) AS t
              FROM events e JOIN s1 ON e.user_id = s1.user_id
              WHERE e.event_type = 'click' AND e.ts > s1.t
              GROUP BY e.user_id
            ),
            s3 AS (
              SELECT e.user_id, min(e.ts) AS t
              FROM events e JOIN s2 ON e.user_id = s2.user_id
              WHERE e.event_type = 'purchase' AND e.ts > s2.t
              GROUP BY e.user_id
            )
            SELECT CAST(1 AS BIGINT) AS step, 'view' AS step_name,
                   (SELECT CAST(count(*) AS BIGINT) FROM s1) AS n_users
            UNION ALL
            SELECT CAST(2 AS BIGINT), 'click',
                   (SELECT CAST(count(*) AS BIGINT) FROM s2)
            UNION ALL
            SELECT CAST(3 AS BIGINT), 'purchase',
                   (SELECT CAST(count(*) AS BIGINT) FROM s3)
        """,
        "b15_session_stats": """
            WITH base AS (
              SELECT event_id, user_id, event_type,
                     CAST(floor(epoch(ts)) AS BIGINT) AS sec
              FROM events
            ),
            marked AS (
              SELECT *,
                     CASE WHEN sec - lag(sec, 1) OVER (
                       PARTITION BY user_id
                       ORDER BY sec ASC, event_id ASC) > 1800
                     THEN 1 ELSE 0 END AS newf
              FROM base
            ),
            tagged AS (
              SELECT *, sum(newf) OVER (
                PARTITION BY user_id
                ORDER BY sec ASC, event_id ASC
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) + 1
                AS session_id
              FROM marked
            )
            SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
                   CAST(count(*) AS BIGINT) AS n_events,
                   CAST(count(DISTINCT event_type) AS BIGINT) AS n_types,
                   CAST(max(sec) - min(sec) AS BIGINT) AS duration_sec
            FROM tagged GROUP BY user_id, session_id
        """,
        "b14_string_agg": """
            SELECT r_name,
                   string_agg(n_name, ',' ORDER BY n_name) AS nations,
                   CAST(count(*) AS BIGINT) AS n_nations
            FROM nation JOIN region ON n_regionkey = r_regionkey
            GROUP BY r_name
        """,
        "b15_forward_fill": """
            WITH ev AS (
              SELECT user_id % 10 AS cohort, CAST(ts AS DATE) AS day,
                     value, event_type
              FROM events
            ),
            sparse AS (
              SELECT cohort, day,
                     round(CAST(sum(CAST(floor(value * 100) AS BIGINT))
                                AS DOUBLE)
                           / (count(*) * 100.0), 6) AS obs
              FROM ev WHERE event_type = 'purchase'
              GROUP BY cohort, day
            ),
            bounds AS (SELECT min(day) AS lo, max(day) AS hi FROM ev),
            calendar AS (
              SELECT CAST(unnest(generate_series(lo, hi,
                                                 INTERVAL 1 DAY)) AS DATE)
                       AS day
              FROM bounds
            ),
            grid AS (
              SELECT c.cohort, cal.day
              FROM (SELECT DISTINCT cohort FROM ev) c
              CROSS JOIN calendar cal
            ),
            dense AS (
              SELECT g.cohort, g.day, s.obs
              FROM grid g LEFT JOIN sparse s
                ON s.cohort = g.cohort AND s.day = g.day
            )
            SELECT cohort, day,
                   obs IS NOT NULL AS observed,
                   last_value(obs IGNORE NULLS) OVER (
                     PARTITION BY cohort ORDER BY day ASC
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     AS value_filled
            FROM dense
        """,
        "b15_concurrency": """
            WITH base AS (
              SELECT event_id, user_id,
                     CAST(floor(epoch(ts)) AS BIGINT) AS sec
              FROM events
            ),
            marked AS (
              SELECT event_id, user_id, sec,
                     CASE WHEN sec - lag(sec, 1) OVER (
                       PARTITION BY user_id
                       ORDER BY sec ASC, event_id ASC) > 1800
                     THEN 1 ELSE 0 END AS newf
              FROM base
            ),
            sessioned AS (
              SELECT user_id, sec,
                     sum(newf) OVER (
                       PARTITION BY user_id
                       ORDER BY sec ASC, event_id ASC
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       + 1 AS session_id
              FROM marked
            ),
            sess AS (
              SELECT user_id, session_id,
                     min(sec) AS s, max(sec) AS e
              FROM sessioned GROUP BY user_id, session_id
            ),
            deltas AS (
              SELECT user_id, session_id, s AS sec, 1 AS delta FROM sess
              UNION ALL
              SELECT user_id, session_id, e + 1 AS sec, -1 AS delta FROM sess
            ),
            dayd AS (
              SELECT *, CAST(sec // 86400 AS BIGINT) AS day FROM deltas
            ),
            run AS (
              SELECT *, sum(delta) OVER (
                PARTITION BY day
                ORDER BY sec ASC, delta DESC, user_id ASC, session_id ASC
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS r
              FROM dayd
            ),
            daytot AS (
              SELECT day, sum(delta) AS t FROM dayd GROUP BY day
            ),
            basea AS (
              SELECT day, COALESCE(sum(t) OVER (
                ORDER BY day ASC
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                AS b
              FROM daytot
            )
            SELECT run.day,
                   CAST(max(basea.b + run.r) AS BIGINT) AS max_concurrency,
                   CAST(sum(CASE WHEN delta = 1 THEN 1 ELSE 0 END) AS BIGINT)
                     AS n_sessions_started
            FROM run JOIN basea ON run.day = basea.day
            GROUP BY run.day
        """,
        "b15_sessionize": """
            WITH base AS (
              SELECT event_id, user_id,
                     CAST(floor(epoch(ts)) AS BIGINT) AS sec
              FROM events
            ),
            marked AS (
              SELECT event_id, user_id, sec,
                     CASE WHEN sec - lag(sec, 1) OVER (
                       PARTITION BY user_id
                       ORDER BY sec ASC, event_id ASC) > 1800
                     THEN 1 ELSE 0 END AS newf
              FROM base
            )
            SELECT event_id, user_id,
                   CAST(sum(newf) OVER (
                     PARTITION BY user_id
                     ORDER BY sec ASC, event_id ASC
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     + 1 AS BIGINT) AS session_id
            FROM marked
        """,
        "b15_funnel": """
            WITH s1 AS (
              SELECT user_id, min(ts) AS t1 FROM events
              WHERE event_type = 'view' GROUP BY user_id
            ),
            s2 AS (
              SELECT e.user_id, min(e.ts) AS t2
              FROM events e JOIN s1 ON e.user_id = s1.user_id
              WHERE e.event_type = 'click' AND e.ts > s1.t1
              GROUP BY e.user_id
            ),
            s3 AS (
              SELECT e.user_id, min(e.ts) AS t3
              FROM events e JOIN s2 ON e.user_id = s2.user_id
              WHERE e.event_type = 'purchase' AND e.ts > s2.t2
              GROUP BY e.user_id
            )
            SELECT (SELECT CAST(count(*) AS BIGINT) FROM s1) AS n_view,
                   (SELECT CAST(count(*) AS BIGINT) FROM s2)
                     AS n_click_after_view,
                   (SELECT CAST(count(*) AS BIGINT) FROM s3)
                     AS n_purchase_after_click
        """,
        "b15_cohorts": """
            WITH first AS (
              SELECT user_id,
                     CAST(date_trunc('week', min(ts)) AS DATE) AS cohort_week
              FROM events GROUP BY user_id
            )
            SELECT f.cohort_week,
                   CAST(datediff('day', f.cohort_week,
                        CAST(date_trunc('week', e.ts) AS DATE)) / 7
                        AS BIGINT) AS week_offset,
                   CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_users
            FROM events e JOIN first f ON e.user_id = f.user_id
            GROUP BY f.cohort_week, week_offset
        """,
        "b13_schema_union": """
            WITH gen1 AS (
              SELECT o_orderkey, o_orderstatus, o_totalprice
              FROM orders WHERE o_orderkey % 2 = 0
            ),
            gen2 AS (
              SELECT o_orderkey, o_orderstatus,
                     o_orderpriority AS priority
              FROM orders WHERE o_orderkey % 2 = 1
            ),
            merged AS (
              SELECT * FROM gen1 UNION ALL BY NAME SELECT * FROM gen2
            )
            SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n,
                   CAST(count(o_totalprice) AS BIGINT) AS n_with_price,
                   CAST(count(priority) AS BIGINT) AS n_with_priority
            FROM merged GROUP BY o_orderstatus
        """,
        "b15_markov": """
            WITH seq AS (
              SELECT event_type AS from_state,
                     lead(event_type, 1) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                     ) AS to_state
              FROM events
            ),
            pairs AS (
              SELECT from_state, to_state, CAST(count(*) AS BIGINT) AS n
              FROM seq WHERE to_state IS NOT NULL
              GROUP BY from_state, to_state
            ),
            tot AS (
              SELECT from_state, CAST(sum(n) AS BIGINT) AS t
              FROM pairs GROUP BY from_state
            )
            SELECT p.from_state, p.to_state, p.n,
                   round(p.n / CAST(t AS DOUBLE), 6) AS p
            FROM pairs p JOIN tot USING (from_state)
        """,
        "b15_rfm": """
            WITH ref AS (SELECT max(ts) AS r FROM events),
            per AS (
              SELECT user_id,
                     date_diff('day', CAST(max(ts) AS DATE),
                               CAST((SELECT r FROM ref) AS DATE)) AS rec_days,
                     CAST(count(*) AS BIGINT) AS n_events,
                     CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT)
                       AS m_cents
              FROM events GROUP BY user_id
            )
            SELECT user_id, rec_days, n_events, m_cents, r, f, m,
                   CAST(r AS VARCHAR) || CAST(f AS VARCHAR)
                     || CAST(m AS VARCHAR) AS segment
            FROM (
              SELECT user_id, rec_days, n_events, m_cents,
                     ntile(5) OVER (ORDER BY rec_days, user_id) AS r,
                     ntile(5) OVER (ORDER BY n_events DESC, user_id) AS f,
                     ntile(5) OVER (ORDER BY m_cents DESC, user_id) AS m
              FROM per
            )
        """,
        "b15_acf": _acf_oracle_sql(),
        "b13_block_digests": _block_digests_oracle_sql(),
        "b13_zorder_layout": f"""
            WITH b AS (
              SELECT CAST(({_zorder_expr_sql()}) AS BIGINT) >> 6 AS zblock,
                     l_partkey % 256 AS pb, l_suppkey % 256 AS sb
              FROM lineitem
            ),
            per AS (
              SELECT zblock,
                     CAST(count(*) AS BIGINT) AS n_rows,
                     CAST(min(pb) AS BIGINT) AS pk_lo,
                     CAST(max(pb) AS BIGINT) AS pk_hi,
                     CAST(min(sb) AS BIGINT) AS sk_lo,
                     CAST(max(sb) AS BIGINT) AS sk_hi
              FROM b GROUP BY zblock
            )
            SELECT zblock, n_rows, pk_lo, pk_hi, sk_lo, sk_hi,
                   pk_hi - pk_lo + 1 AS pk_span,
                   sk_hi - sk_lo + 1 AS sk_span
            FROM per
        """,
        # ---- round 9 wave 5 ---------------------------------------------
        "b15_hazard": """
            WITH ev AS (
              SELECT user_id,
                     CAST(floor(epoch(ts)) AS BIGINT) // 3600 AS hr
              FROM events
            ),
            pu AS (
              SELECT user_id, min(hr) AS fd, max(hr) AS ld
              FROM ev GROUP BY user_id
            ),
            e AS (SELECT max(hr) AS endd FROM ev),
            lived AS (
              SELECT ld - fd AS t,
                     CASE WHEN ld <= endd - 24 THEN 1 ELSE 0 END AS churned
              FROM pu CROSS JOIN e
            ),
            pt AS (
              SELECT t, CAST(sum(churned) AS BIGINT) AS d_events,
                     CAST(sum(1 - churned) AS BIGINT) AS c_censored
              FROM lived GROUP BY t
            ),
            n AS (
              SELECT *, CAST(sum(d_events + c_censored) OVER (
                       ORDER BY t DESC ROWS UNBOUNDED PRECEDING) AS BIGINT)
                       AS n_risk
              FROM pt
            )
            SELECT t AS lifetime_hours, n_risk, d_events, c_censored,
                   CAST((d_events * 1000000) // n_risk AS BIGINT)
                     AS hazard_micros
            FROM n
        """,
        "b14_format_funcs": """
            SELECT n_nationkey,
                   lpad(n_name, 12, '.') AS padded_l,
                   rpad(n_name, 12, '.') AS padded_r,
                   repeat(substr(n_name, 1, 2), 3) AS repeated,
                   reverse(n_name) AS reversed,
                   translate(n_name, 'NAT', 'nat') AS translated,
                   CAST(ascii(n_name) AS INT) AS first_byte,
                   chr(65 + n_nationkey % 26) AS letter,
                   left(n_name, 6) AS left6,
                   right(n_name, 2) AS right2,
                   split_part(n_name, '_', 2) AS num_part,
                   CAST(instr(n_name, '_') AS BIGINT) AS underscore_at
            FROM nation ORDER BY n_nationkey LIMIT 10
        """,
        # ---- round 9 wave 9 ---------------------------------------------
        "b13_file_skipping": """
            WITH li AS (
              SELECT l_orderkey // 2000 AS file_id,
                     CAST(floor(epoch(l_shipdate)) AS BIGINT) // 86400
                       AS day
              FROM lineitem
            ),
            stats AS (
              SELECT file_id, min(day) AS min_day, max(day) AS max_day,
                     CAST(count(*) AS BIGINT) AS n_rows
              FROM li GROUP BY file_id
            ),
            bounds AS (
              SELECT CAST(floor(epoch(CAST('1996-01-01' AS TIMESTAMP)))
                          AS BIGINT) // 86400 AS lo,
                     CAST(floor(epoch(CAST('1996-07-01' AS TIMESTAMP)))
                          AS BIGINT) // 86400 AS hi
            ),
            flagged AS (
              SELECT n_rows,
                     (max_day < lo OR min_day >= hi) AS skippable
              FROM stats CROSS JOIN bounds
            )
            SELECT CAST(count(*) AS BIGINT) AS n_files,
                   CAST(sum(CASE WHEN skippable THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_skipped,
                   CAST(sum(CASE WHEN skippable THEN n_rows ELSE 0 END)
                        AS BIGINT) AS rows_skipped,
                   CAST((sum(CASE WHEN skippable THEN 1 ELSE 0 END)
                         * 1000000) // count(*) AS BIGINT)
                     AS skip_rate_micros
            FROM flagged
        """,
        # ---- round 9 wave 10 --------------------------------------------
    "b14_hof_funcs": f"""
        WITH tk AS (
          SELECT doc_id, {_TOKS_SQL} AS toks FROM documents
        )
        SELECT doc_id,
               CAST(len(toks) AS BIGINT) AS n_tok,
               CAST(len(list_filter(toks, t -> length(t) > 3)) AS BIGINT)
                 AS n_long,
               CAST(list_sum(list_transform(toks, t -> length(t)))
                    AS BIGINT) AS total_chars,
               len(list_filter(toks, t -> t = 'spark')) > 0 AS has_spark,
               len(list_filter(toks, t -> length(t) > 10)) = 0 AS all_short,
               list_sort(toks)[1] AS first_sorted
        FROM tk
    """,

        "b15_bursts": """
            WITH hourly AS (
              SELECT event_type,
                     CAST(CAST(epoch_us(ts) AS BIGINT) // 3600000000
                          AS BIGINT) AS hr_idx,
                     CAST(count(*) AS BIGINT) AS n
              FROM events GROUP BY 1, 2
            ),
            trail AS (
              SELECT event_type, hr_idx, n,
                     CAST(coalesce(sum(n) OVER w, 0) AS BIGINT) AS trail_sum,
                     CAST(count(*) OVER w AS BIGINT) AS trail_hours
              FROM hourly
              WINDOW w AS (PARTITION BY event_type ORDER BY hr_idx
                           RANGE BETWEEN 6 PRECEDING AND 1 PRECEDING)
            )
            SELECT event_type, hr_idx, n, trail_sum, trail_hours,
                   (trail_hours >= 3 AND n * trail_hours >= 3 * trail_sum)
                     AS is_burst
            FROM trail
        """,

        "b15_interarrival": """
            WITH gaps AS (
              SELECT event_type,
                     CAST(epoch_us(ts) AS BIGINT)
                       - lag(CAST(epoch_us(ts) AS BIGINT)) OVER
                         (PARTITION BY event_type
                          ORDER BY ts, event_id) AS gap_us
              FROM events
            ),
            g AS (SELECT * FROM gaps WHERE gap_us IS NOT NULL),
            ranked AS (
              SELECT event_type, gap_us,
                     row_number() OVER (PARTITION BY event_type
                                        ORDER BY gap_us) AS rn,
                     count(*) OVER (PARTITION BY event_type) AS n
              FROM g
            )
            SELECT event_type,
                   CAST(max(n) AS BIGINT) AS n_gaps,
                   CAST(min(gap_us) AS BIGINT) AS min_us,
                   CAST(max(CASE WHEN rn = (n - 1) * 50 // 100 + 1
                            THEN gap_us END) AS BIGINT) AS p50_us,
                   CAST(max(CASE WHEN rn = (n - 1) * 90 // 100 + 1
                            THEN gap_us END) AS BIGINT) AS p90_us,
                   CAST(max(CASE WHEN rn = (n - 1) * 99 // 100 + 1
                            THEN gap_us END) AS BIGINT) AS p99_us,
                   CAST(max(gap_us) AS BIGINT) AS max_us
            FROM ranked GROUP BY event_type
        """,

        "b13_merkle_diff": """
            WITH base AS (
              SELECT o_orderkey,
                     CAST(floor(o_totalprice * 100) AS BIGINT) AS cents,
                     o_orderstatus
              FROM orders
            ),
            rep AS (
              SELECT o_orderkey,
                     CASE WHEN o_orderkey % 997 = 0 THEN cents + 1
                          ELSE cents END AS cents,
                     o_orderstatus
              FROM base
            ),
            la AS (
              SELECT o_orderkey // 512 AS block,
                     bit_xor(CAST('0x' || substr(md5(
                       CAST(o_orderkey AS VARCHAR) || '|' ||
                       CAST(cents AS VARCHAR) || '|' || o_orderstatus),
                       1, 15) AS BIGINT)) AS d_a
              FROM base GROUP BY 1
            ),
            lb AS (
              SELECT o_orderkey // 512 AS block,
                     bit_xor(CAST('0x' || substr(md5(
                       CAST(o_orderkey AS VARCHAR) || '|' ||
                       CAST(cents AS VARCHAR) || '|' || o_orderstatus),
                       1, 15) AS BIGINT)) AS d_b
              FROM rep GROUP BY 1
            ),
            l0 AS (
              SELECT la.block, la.block // 16 AS sn, d_a, d_b,
                     (d_a != d_b) AS dv
              FROM la JOIN lb USING (block)
            ),
            l1 AS (
              SELECT sn, bit_xor(d_a) AS s_a, bit_xor(d_b) AS s_b,
                     CAST(count(*) AS BIGINT) AS n_blocks,
                     CAST(sum(CASE WHEN dv THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_diverged,
                     CAST(min(CASE WHEN dv THEN block END) AS BIGINT)
                       AS first_diverged_block
              FROM l0 GROUP BY sn
            )
            SELECT CAST(sn AS BIGINT) AS supernode, n_blocks, n_diverged,
                   first_diverged_block
            FROM l1 WHERE s_a != s_b
        """,

        "b17_incremental_topk": """
            WITH ranked AS (
              SELECT l_returnflag, l_orderkey, l_linenumber,
                     l_extendedprice,
                     row_number() OVER (PARTITION BY l_returnflag
                       ORDER BY l_extendedprice DESC, l_orderkey ASC,
                                l_linenumber ASC, l_partkey ASC,
                                l_suppkey ASC) AS rnk
              FROM lineitem
            )
            SELECT l_returnflag, CAST(rnk AS INTEGER) AS rnk,
                   l_orderkey, l_linenumber, l_extendedprice
            FROM ranked WHERE rnk <= 10
        """,

        "b13_partition_skew_audit": """
            WITH per_key AS (
              SELECT l_orderkey, CAST(count(*) AS BIGINT) AS kn
              FROM lineitem GROUP BY l_orderkey
            ),
            keyed AS (
              SELECT (CAST('0x' || substr(md5(CAST(l_orderkey AS VARCHAR)), 1, 15) AS BIGINT)) % 32 AS bucket, kn FROM per_key
            ),
            buckets AS (
              SELECT bucket,
                     CAST(sum(kn) AS BIGINT) AS n_rows,
                     CAST(count(*) AS BIGINT) AS n_keys,
                     CAST(max(kn) AS BIGINT) AS max_key_rows
              FROM keyed GROUP BY bucket
            ),
            ranked AS (
              SELECT *, row_number() OVER (
                ORDER BY n_rows ASC, bucket ASC) AS r
              FROM buckets
            ),
            tot AS (
              SELECT CAST(sum(n_rows) AS BIGINT) AS tot,
                     CAST(max(n_rows) AS BIGINT) AS mx,
                     CAST(count(*) AS BIGINT) AS b,
                     CAST(sum(r * n_rows) AS BIGINT) AS wsum
              FROM ranked
            )
            SELECT bucket, n_rows, n_keys, max_key_rows,
                   round(CAST(n_rows AS DOUBLE) / tot, 6) AS share,
                   round(CAST(mx AS DOUBLE) * b / tot, 6) AS skew_ratio,
                   round(2.0 * wsum / (CAST(b AS DOUBLE) * tot)
                         - CAST(b + 1 AS DOUBLE) / b, 6) AS gini
            FROM ranked CROSS JOIN tot
        """,

        # merge == recompute: the oracle is the FULL-table frontier,
        # identical output contract to b28_pareto_frontier
        "b17_incremental_frontier": """
            WITH base AS (
              SELECT doc_id, lang,
                     len(list_filter(string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' '), t -> list_contains(['the', 'a', 'of', 'and', 'to', 'in', 'is', 'it', 'that', 'for'], t))) AS s_en,
                     CAST(length(text) AS BIGINT) AS q_chars,
                     CAST(len(string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' ')) AS BIGINT) AS n_tok,
                     CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g'))
                          AS BIGINT) AS alpha
              FROM documents
            ),
            feats AS (
              SELECT doc_id, lang, n_tok,
                     round(least(CAST(n_tok AS DOUBLE) / 50.0, 1.0) * 0.4
                           + round(CAST(alpha AS DOUBLE)
                                   / CAST(greatest(q_chars, 1) AS DOUBLE), 6)
                             * 0.4
                           + least(round(CAST(s_en AS DOUBLE)
                                   / CAST(greatest(n_tok, 1) AS DOUBLE), 6)
                                   * 5.0, 1.0) * 0.2, 6) AS quality_score
              FROM base
            ),
            per_q AS (
              SELECT lang, quality_score,
                     CAST(min(n_tok) AS BIGINT) AS mt
              FROM feats GROUP BY lang, quality_score
            ),
            prefix AS (
              SELECT *, min(mt) OVER (
                PARTITION BY lang ORDER BY quality_score DESC
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmin
              FROM per_q
            ),
            frontier AS (
              SELECT f.lang, f.doc_id, f.quality_score, f.n_tok
              FROM feats f
              JOIN prefix p ON p.lang = f.lang
                           AND p.quality_score = f.quality_score
              WHERE (p.pmin IS NULL OR p.pmin > f.n_tok)
                AND f.n_tok = p.mt
            )
            SELECT lang, doc_id, quality_score, n_tok,
                   CAST(row_number() OVER (
                     PARTITION BY lang
                     ORDER BY quality_score DESC, n_tok ASC, doc_id ASC)
                     AS BIGINT) AS frontier_rank
            FROM frontier
        """,

        "b13_delta_encoding": """
            WITH priced AS (
              SELECT 'by_partkey' AS variant,
                     CASE WHEN prev IS NULL THEN 8
                          WHEN zig < 128 THEN 1
                          WHEN zig < 16384 THEN 2
                          WHEN zig < 2097152 THEN 3
                          WHEN zig < 268435456 THEN 4
                          WHEN zig < 34359738368 THEN 5
                          WHEN zig < 4398046511104 THEN 6
                          WHEN zig < 562949953421312 THEN 7
                          ELSE 8 END AS b
              FROM (
                SELECT prev,
                       CASE WHEN l_partkey - prev >= 0
                            THEN 2 * (l_partkey - prev)
                            ELSE -2 * (l_partkey - prev) - 1 END AS zig
                FROM (
                  SELECT l_partkey,
                         lag(l_partkey) OVER (
                           PARTITION BY l_partkey // 512
                           ORDER BY l_partkey, l_orderkey, l_linenumber)
                           AS prev
                  FROM lineitem
                )
              )
              UNION ALL
              SELECT 'by_orderkey',
                     CASE WHEN prev IS NULL THEN 8
                          WHEN zig < 128 THEN 1
                          WHEN zig < 16384 THEN 2
                          WHEN zig < 2097152 THEN 3
                          WHEN zig < 268435456 THEN 4
                          WHEN zig < 34359738368 THEN 5
                          WHEN zig < 4398046511104 THEN 6
                          WHEN zig < 562949953421312 THEN 7
                          ELSE 8 END
              FROM (
                SELECT prev,
                       CASE WHEN l_partkey - prev >= 0
                            THEN 2 * (l_partkey - prev)
                            ELSE -2 * (l_partkey - prev) - 1 END AS zig
                FROM (
                  SELECT l_partkey,
                         lag(l_partkey) OVER (
                           PARTITION BY l_orderkey // 512
                           ORDER BY l_orderkey, l_linenumber, l_partkey)
                           AS prev
                  FROM lineitem
                )
              )
            )
            SELECT variant,
                   CAST(count(*) AS BIGINT) AS n_values,
                   CAST(sum(b) AS BIGINT) AS total_bytes,
                   round(CAST(sum(b) AS DOUBLE) / count(*), 6)
                     AS bytes_per_value,
                   round(1.0 - CAST(sum(b) AS DOUBLE) / (8.0 * count(*)), 6)
                     AS savings_vs_raw
            FROM priced GROUP BY variant
        """,

        "b13_rle_encoding": """
            WITH grain AS (
              SELECT l_orderkey // 512 AS b,
                     l_orderkey, l_linenumber, l_returnflag,
                     CAST(count(*) AS BIGINT) AS cnt
              FROM lineitem GROUP BY 1, 2, 3, 4
            ),
            priced AS (
              SELECT 'by_returnflag' AS variant, len FROM (
                SELECT b, rid, CAST(sum(cnt) AS BIGINT) AS len FROM (
                  SELECT b, cnt, sum(new_run) OVER (
                           PARTITION BY b
                           ORDER BY l_returnflag, l_orderkey, l_linenumber
                           ROWS BETWEEN UNBOUNDED PRECEDING
                           AND CURRENT ROW) AS rid
                  FROM (
                    SELECT b, l_returnflag, l_orderkey, l_linenumber, cnt,
                           CASE WHEN lag(l_returnflag) OVER w IS NULL
                                  OR lag(l_returnflag) OVER w
                                     <> l_returnflag
                                THEN 1 ELSE 0 END AS new_run
                    FROM grain
                    WINDOW w AS (
                      PARTITION BY b
                      ORDER BY l_returnflag, l_orderkey, l_linenumber)
                  )
                ) GROUP BY b, rid
              )
              UNION ALL
              SELECT 'natural', len FROM (
                SELECT b, rid, CAST(sum(cnt) AS BIGINT) AS len FROM (
                  SELECT b, cnt, sum(new_run) OVER (
                           PARTITION BY b
                           ORDER BY l_orderkey, l_linenumber, l_returnflag
                           ROWS BETWEEN UNBOUNDED PRECEDING
                           AND CURRENT ROW) AS rid
                  FROM (
                    SELECT b, l_returnflag, l_orderkey, l_linenumber, cnt,
                           CASE WHEN lag(l_returnflag) OVER w IS NULL
                                  OR lag(l_returnflag) OVER w
                                     <> l_returnflag
                                THEN 1 ELSE 0 END AS new_run
                    FROM grain
                    WINDOW w AS (
                      PARTITION BY b
                      ORDER BY l_orderkey, l_linenumber, l_returnflag)
                  )
                ) GROUP BY b, rid
              )
            )
            SELECT variant,
                   CAST(sum(len) AS BIGINT) AS n_values,
                   CAST(count(*) AS BIGINT) AS n_runs,
                   CAST(sum(CASE WHEN len < 128 THEN 2 ELSE 3 END)
                        AS BIGINT) AS rle_bytes,
                   round(CAST(sum(CASE WHEN len < 128 THEN 2 ELSE 3 END)
                              AS DOUBLE) / sum(len), 6) AS bytes_per_value,
                   round(1.0 - CAST(sum(CASE WHEN len < 128 THEN 2 ELSE 3
                                        END) AS DOUBLE) / sum(len), 6)
                     AS savings_vs_dict
            FROM priced GROUP BY variant
        """,

        "b15_watermark_audit": """
            WITH late AS (
              SELECT event_type,
                     max(epoch_us(ts)) OVER w - epoch_us(ts) AS late_us
              FROM events
              WINDOW w AS (PARTITION BY event_type ORDER BY event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING
                           AND CURRENT ROW)
            )
            SELECT event_type,
                   CAST(count(*) AS BIGINT) AS n_events,
                   CAST(sum(CASE WHEN late_us > 60000000
                                 THEN 1 ELSE 0 END) AS BIGINT)
                     AS n_late_1m,
                   CAST(sum(CASE WHEN late_us > 300000000
                                 THEN 1 ELSE 0 END) AS BIGINT)
                     AS n_late_5m,
                   CAST(sum(CASE WHEN late_us > 900000000
                                 THEN 1 ELSE 0 END) AS BIGINT)
                     AS n_late_15m,
                   CAST(max(late_us) AS BIGINT) AS max_late_us
            FROM late GROUP BY event_type
        """,

        "b13_dict_encoding": """
            -- dictionary layout audit: exact NDV + integer bit-width
            -- (length(bin(ndv-1))), 4-byte offset entries on both the
            -- dictionary and the plain stream; corpus is pure ASCII so
            -- octet_length(encode(v)) prices the same bytes Spark's
            -- octet_length does
            WITH stacked AS (
              SELECT 'lang' AS col_name, lang AS val FROM documents
              UNION ALL
              SELECT 'source', source FROM documents
              UNION ALL
              SELECT 'text', text FROM documents
            ),
            per_val AS (
              SELECT col_name, val, CAST(count(*) AS BIGINT) AS n_occ
              FROM stacked GROUP BY col_name, val
            ),
            per_col AS (
              SELECT col_name,
                     CAST(sum(n_occ) AS BIGINT) AS n_values,
                     CAST(count(*) AS BIGINT) AS n_distinct,
                     CAST(sum(octet_length(encode(val)) + 4) AS BIGINT)
                       AS dict_bytes,
                     CAST(sum(n_occ * octet_length(encode(val)))
                          + 4 * sum(n_occ) AS BIGINT) AS plain_bytes
              FROM per_val GROUP BY col_name
            ),
            bits AS (
              SELECT *,
                     CAST(length(bin(n_distinct - 1)) AS BIGINT)
                       AS code_bits
              FROM per_col
            ),
            priced AS (
              SELECT col_name, n_values, n_distinct, code_bits,
                     dict_bytes,
                     (n_values * code_bits + 7) // 8 AS codes_bytes,
                     plain_bytes
              FROM bits
            )
            SELECT *,
                   dict_bytes + codes_bytes < plain_bytes
                     AS dict_beneficial,
                   (plain_bytes - dict_bytes - codes_bytes) * 1000000
                     // plain_bytes AS savings_x1e6
            FROM priced
        """,

        "b17_incremental_distinct": """
            -- full RECOMPUTE of the KMV(32) distinct-users sketch per
            -- event type; the Spark side MERGES a standing sketch with
            -- a batch — KMV's merge law makes them bit-equal
            WITH hashes AS (
              SELECT DISTINCT event_type,
                     CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)),
                          1, 15) AS BIGINT) AS h
              FROM events
            ),
            ranked AS (
              SELECT event_type, h, row_number() OVER (
                       PARTITION BY event_type ORDER BY h) AS rn
              FROM hashes
            ),
            kept AS (SELECT * FROM ranked WHERE rn <= 32)
            SELECT event_type,
                   CAST(count(*) AS BIGINT) AS k_used,
                   max(h) AS kth_min,
                   CASE WHEN count(*) < 32
                        THEN CAST(count(*) AS DOUBLE)
                        ELSE round(31.0 * 1152921504606846976.0
                                   / CAST(max(h) AS DOUBLE), 6) END
                     AS est_distinct
            FROM kept GROUP BY event_type
        """,
        "b17_incremental_histogram": """
            -- counting-histogram merge law: standing (ids %10 != 0)
            -- + batch (ids %10 = 0) per-bin addition must equal the
            -- full recompute, integer-exactly (count + floor(v*100))
            WITH ev AS (
              SELECT event_id,
                     CAST(floor(value / 50.0) AS BIGINT) AS bin,
                     CAST(floor(value * 100.0) AS BIGINT) AS q
              FROM events
            ),
            st AS (
              SELECT bin, CAST(count(*) AS BIGINT) AS n_standing,
                     CAST(sum(q) AS BIGINT) AS s_standing
              FROM ev WHERE event_id % 10 != 0 GROUP BY bin
            ),
            ba AS (
              SELECT bin, CAST(count(*) AS BIGINT) AS n_batch,
                     CAST(sum(q) AS BIGINT) AS s_batch
              FROM ev WHERE event_id % 10 = 0 GROUP BY bin
            ),
            m AS (
              SELECT coalesce(st.bin, ba.bin) AS bin,
                     coalesce(st.n_standing, 0) AS n_standing,
                     coalesce(ba.n_batch, 0) AS n_batch,
                     coalesce(st.n_standing, 0) + coalesce(ba.n_batch, 0)
                       AS n_merged,
                     coalesce(st.s_standing, 0) + coalesce(ba.s_batch, 0)
                       AS s_merged
              FROM st FULL JOIN ba ON st.bin = ba.bin
            ),
            rec AS (
              SELECT bin, CAST(count(*) AS BIGINT) AS n_recompute,
                     CAST(sum(q) AS BIGINT) AS s_recompute
              FROM ev GROUP BY bin
            )
            SELECT coalesce(m.bin, rec.bin) AS bin,
                   CAST(m.n_standing AS BIGINT) AS n_standing,
                   CAST(m.n_batch AS BIGINT) AS n_batch,
                   CAST(m.n_merged AS BIGINT) AS n_merged,
                   rec.n_recompute,
                   CAST(m.s_merged AS BIGINT) AS s_merged,
                   rec.s_recompute,
                   (m.n_merged = rec.n_recompute
                    AND m.s_merged = rec.s_recompute) AS merge_ok
            FROM m FULL JOIN rec ON m.bin = rec.bin
        """,
        "b17_incremental_minmax": """
            -- delete-aware MAX maintenance: (max, count-at-max) state,
            -- merge by case law, abstain (needs_rescan) when deletes
            -- exhaust the count at the stored extreme; merge_ok pins
            -- maintained == recomputed wherever the view did not abstain
            WITH ev AS (
              SELECT event_id,
                     CAST(user_id % 64 AS BIGINT) AS g,
                     CAST(floor(value * 100) AS BIGINT) AS q
              FROM events
            ),
            sh AS (
              SELECT g, q, CAST(count(*) AS BIGINT) AS cnt
              FROM ev WHERE event_id % 10 != 0 GROUP BY g, q
            ),
            st AS (
              SELECT g, CAST(max(q) AS BIGINT) AS state_max,
                     CAST(max_by(cnt, q) AS BIGINT) AS n_at_max
              FROM sh GROUP BY g
            ),
            ih AS (
              SELECT g, q, CAST(count(*) AS BIGINT) AS cnt
              FROM ev WHERE event_id % 10 = 0 GROUP BY g, q
            ),
            ins AS (
              SELECT g, CAST(max(q) AS BIGINT) AS ins_max
              FROM ih GROUP BY g
            ),
            dh AS (
              SELECT g, q, CAST(count(*) AS BIGINT) AS cnt
              FROM ev
              WHERE event_id % 10 != 0 AND event_id % 7 = 0
              GROUP BY g, q
            ),
            dl AS (
              SELECT d.g, CAST(sum(d.cnt) AS BIGINT) AS del_at_max
              FROM dh d JOIN st ON d.g = st.g AND d.q = st.state_max
              GROUP BY d.g
            ),
            m AS (
              SELECT coalesce(st.g, ins.g) AS g,
                     st.state_max, st.n_at_max, ins.ins_max,
                     CAST(coalesce(dl.del_at_max, 0) AS BIGINT)
                       AS del_at_max
              FROM st FULL JOIN ins ON st.g = ins.g
              LEFT JOIN dl ON coalesce(st.g, ins.g) = dl.g
            ),
            mm AS (
              SELECT *,
                     CAST(CASE
                       WHEN ins_max IS NOT NULL
                            AND (state_max IS NULL OR ins_max > state_max)
                         THEN ins_max
                       WHEN ins_max IS NOT DISTINCT FROM state_max
                         THEN state_max
                       WHEN n_at_max - del_at_max > 0 THEN state_max
                     END AS BIGINT) AS merged_max
              FROM m
            ),
            rec AS (
              SELECT g, CAST(max(q) AS BIGINT) AS recomputed_max
              FROM ev
              WHERE event_id % 10 = 0
                 OR (event_id % 10 != 0 AND event_id % 7 != 0)
              GROUP BY g
            )
            SELECT coalesce(mm.g, rec.g) AS g,
                   mm.state_max, mm.n_at_max, mm.del_at_max, mm.ins_max,
                   mm.merged_max,
                   (mm.merged_max IS NULL) AS needs_rescan,
                   rec.recomputed_max,
                   ((mm.merged_max IS NULL)
                    OR mm.merged_max IS NOT DISTINCT FROM rec.recomputed_max)
                     AS merge_ok
            FROM mm FULL JOIN rec ON mm.g = rec.g
        """,
}
