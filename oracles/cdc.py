"""DuckDB oracle SQL — cdc family (split from
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
        "b3_change_stats": f"""
            WITH changes AS ({_EVENTS_CHANGES_SQL})
            SELECT tablename, operation,
                   date_trunc('hour', timestamp) AS bucket,
                   count(*) AS n_changes
            FROM changes GROUP BY 1, 2, 3
        """,
        "b1_snapshot_diff": f"""
            WITH {_ORDERS_OLD_NEW_SQL},
            j AS (
              SELECT o.o_orderkey AS ok, o.o_custkey AS ock, o.o_orderstatus AS ost,
                     o.o_totalprice AS otp, o.o_orderpriority AS opr,
                     n.o_orderkey AS nk, n.o_custkey AS nck, n.o_orderstatus AS nst,
                     n.o_totalprice AS ntp, n.o_orderpriority AS npr
              FROM old o FULL OUTER JOIN new n ON o.o_orderkey = n.o_orderkey
            ),
            cl AS (
              SELECT *,
                     CASE WHEN ok IS NULL THEN 'INSERT'
                          WHEN nk IS NULL THEN 'DELETE'
                          WHEN ock IS DISTINCT FROM nck
                            OR ost IS DISTINCT FROM nst
                            OR otp IS DISTINCT FROM ntp
                            OR opr IS DISTINCT FROM npr THEN 'UPDATE'
                     END AS operation
              FROM j
            )
            SELECT coalesce(nk, ok) AS o_orderkey, operation,
                   CASE WHEN operation != 'INSERT' THEN CAST(json_object(
                     'o_orderkey', ok, 'o_custkey', ock, 'o_orderstatus', ost,
                     'o_totalprice', otp, 'o_orderpriority', opr) AS VARCHAR)
                   END AS before,
                   CASE WHEN operation != 'DELETE' THEN CAST(json_object(
                     'o_orderkey', nk, 'o_custkey', nck, 'o_orderstatus', nst,
                     'o_totalprice', ntp, 'o_orderpriority', npr) AS VARCHAR)
                   END AS after
            FROM cl WHERE operation IS NOT NULL
        """,
        "b1_apply_roundtrip": f"""
            WITH {_ORDERS_OLD_NEW_SQL}
            SELECT * FROM new
        """,
        "b2_log_compaction": f"""
            WITH changes AS ({_EVENTS_CHANGES_SQL}),
            keyed AS (
              SELECT *,
                     json_extract_string(coalesce(after, before), '$.user_id') AS uk
              FROM changes
            ),
            ranked AS (
              SELECT *, row_number() OVER (PARTITION BY uk ORDER BY id DESC) AS rn
              FROM keyed
            )
            SELECT CAST(uk AS BIGINT) AS user_id, id AS last_id,
                   operation AS last_op,
                   CAST(json_extract_string(after, '$.value') AS DOUBLE) AS last_value
            FROM ranked WHERE rn = 1 AND operation != 'DELETE'
        """,
        "b5_filter_json": f"""
            WITH changes AS ({_EVENTS_CHANGES_SQL})
            SELECT id, timestamp,
                   CAST(json_extract_string(after, '$.value') AS DOUBLE) AS value
            FROM changes
            WHERE operation = 'UPDATE'
              AND json_extract_string(after, '$.event_type') = 'purchase'
              AND CAST(json_extract_string(after, '$.value') AS DOUBLE) > 150.0
        """,
        "b6_projection": """
            SELECT p_partkey, upper(p_brand) AS brand_uc,
                   p_retailprice * 0.9 AS discounted,
                   p_brand || '/' || p_type AS brand_type,
                   length(p_name) AS name_len
            FROM part
        """,
        "b2_scd2": f"""
            WITH changes AS ({_EVENTS_CHANGES_SQL}),
            keyed AS (
              SELECT id, timestamp, operation, after,
                     CAST(json_extract_string(coalesce(after, before),
                                              '$.user_id') AS BIGINT) AS user_id
              FROM changes
            ),
            v AS (
              SELECT *,
                     lead(timestamp) OVER (PARTITION BY user_id ORDER BY id)
                       AS valid_to
              FROM keyed
            )
            SELECT user_id, id, after,
                   timestamp AS valid_from, valid_to,
                   (valid_to IS NULL) AS is_current
            FROM v
            WHERE operation <> 'DELETE'
        """,
        "b1_column_diff": f"""
            WITH {_ORDERS_OLD_NEW_SQL},
            j AS (
              SELECT o.o_orderkey AS ok,
                     o.o_custkey AS ock, o.o_orderstatus AS ost,
                     o.o_totalprice AS otp, o.o_orderpriority AS opr,
                     n.o_custkey AS nck, n.o_orderstatus AS nst,
                     n.o_totalprice AS ntp, n.o_orderpriority AS npr
              FROM old o JOIN new n ON o.o_orderkey = n.o_orderkey
            )
            SELECT ok AS o_orderkey,
                   array_to_string(list_filter([
                     CASE WHEN ock IS DISTINCT FROM nck THEN 'o_custkey' END,
                     CASE WHEN ost IS DISTINCT FROM nst THEN 'o_orderstatus' END,
                     CASE WHEN otp IS DISTINCT FROM ntp THEN 'o_totalprice' END,
                     CASE WHEN opr IS DISTINCT FROM npr THEN 'o_orderpriority' END
                   ], x -> x IS NOT NULL), ',') AS changed_cols,
                   CAST(len(list_filter([
                     CASE WHEN ock IS DISTINCT FROM nck THEN 'o_custkey' END,
                     CASE WHEN ost IS DISTINCT FROM nst THEN 'o_orderstatus' END,
                     CASE WHEN otp IS DISTINCT FROM ntp THEN 'o_totalprice' END,
                     CASE WHEN opr IS DISTINCT FROM npr THEN 'o_orderpriority' END
                   ], x -> x IS NOT NULL)) AS BIGINT) AS n_changed
            FROM j
            WHERE (ock IS DISTINCT FROM nck) OR (ost IS DISTINCT FROM nst)
               OR (otp IS DISTINCT FROM ntp) OR (opr IS DISTINCT FROM npr)
        """,
        "b5_time_range": f"""
            WITH changes AS ({_EVENTS_CHANGES_SQL})
            SELECT id, operation, timestamp,
                   round(CAST(json_extract_string(after, '$.value') AS DOUBLE),
                         6) AS value
            FROM changes
            WHERE timestamp >= TIMESTAMP '2024-01-08 00:00:00'
              AND timestamp < TIMESTAMP '2024-01-15 00:00:00'
              AND CAST(json_extract_string(after, '$.value') AS DOUBLE) > 50.0
        """,
        "b2_vacuum_stats": f"""
            WITH changes AS ({_EVENTS_CHANGES_SQL}),
            sized AS (
              SELECT CAST(json_extract_string(coalesce(after, before),
                                              '$.user_id') AS BIGINT)
                       AS user_id,
                     id,
                     coalesce(strlen(before), 0)
                       + coalesce(strlen(after), 0) AS b
              FROM changes
            )
            SELECT user_id,
                   CAST(count(*) AS BIGINT) AS n_rows,
                   CAST(count(*) - 1 AS BIGINT) AS reclaimable_rows,
                   CAST(sum(b) - max_by(b, id) AS BIGINT)
                     AS reclaimable_bytes,
                   CAST(sum(b) AS BIGINT) AS total_bytes
            FROM sized GROUP BY user_id
        """,
        "b4_event_source": _EVENTS_CHANGES_SQL,
        "b3_anomaly": """
            WITH daily AS (
              SELECT CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day,
                     count(*) AS n
              FROM events GROUP BY 1
            ),
            wp AS (
              SELECT day, n,
                     lag(n, 7) OVER (ORDER BY day ASC) AS prev,
                     n - lag(n, 7) OVER (ORDER BY day ASC) AS resid
              FROM daily
            ),
            mad AS (
              SELECT median(abs(resid)) AS m FROM wp WHERE resid IS NOT NULL
            )
            SELECT CAST(day AS BIGINT) AS day,
                   CAST(n AS BIGINT) AS n,
                   CAST(prev AS BIGINT) AS expected,
                   CAST(resid AS BIGINT) AS resid,
                   CASE WHEN resid IS NOT NULL
                        THEN abs(resid) > 3 * greatest(mad.m, 1.0)
                        END AS anomalous
            FROM wp, mad
        """,
        "b3_op_drift": """
            WITH per_type AS (
              SELECT event_type,
                     CAST(sum(CASE WHEN ts < TIMESTAMP '2024-01-16'
                              THEN 1 ELSE 0 END) AS DOUBLE) AS e,
                     CAST(sum(CASE WHEN ts >= TIMESTAMP '2024-01-16'
                              THEN 1 ELSE 0 END) AS DOUBLE) AS l
              FROM events GROUP BY event_type
            ),
            tot AS (SELECT sum(e) AS te, sum(l) AS tl FROM per_type)
            SELECT event_type,
                   CAST(e AS BIGINT) AS n_early,
                   CAST(l AS BIGINT) AS n_late,
                   round(e / t.te, 6) AS share_early,
                   round(l / t.tl, 6) AS share_late,
                   round(l / t.tl - e / t.te, 6) AS drift
            FROM per_type CROSS JOIN tot t
        """,
        "b3_freshness": """
            WITH ev AS (
              SELECT event_type,
                     CAST(floor(epoch(ts)) AS BIGINT) AS sec
              FROM events
            ),
            per AS (
              SELECT event_type, max(sec) AS latest,
                     CAST(count(*) AS BIGINT) AS n_events
              FROM ev GROUP BY event_type
            ),
            hw AS (SELECT max(sec) AS h FROM ev)
            SELECT event_type, n_events,
                   CAST(h - latest AS BIGINT) AS lag_seconds
            FROM per CROSS JOIN hw
        """,
        "b3_fk_integrity": """
            WITH r1 AS (
              SELECT 'orders.o_custkey->customer' AS relation,
                     CAST(count(*) AS BIGINT) AS n_child,
                     CAST(sum(CASE WHEN c_custkey IS NULL THEN 1 ELSE 0 END)
                          AS BIGINT) AS n_orphans
              FROM orders LEFT JOIN customer ON o_custkey = c_custkey
            ),
            r2 AS (
              SELECT 'lineitem.l_orderkey->orders',
                     CAST(count(*) AS BIGINT),
                     CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END)
                          AS BIGINT)
              FROM lineitem LEFT JOIN orders ON l_orderkey = o_orderkey
            ),
            r3 AS (
              SELECT 'lineitem.l_partkey->part',
                     CAST(count(*) AS BIGINT),
                     CAST(sum(CASE WHEN p_partkey IS NULL THEN 1 ELSE 0 END)
                          AS BIGINT)
              FROM lineitem LEFT JOIN part ON l_partkey = p_partkey
            ),
            r4 AS (
              SELECT 'lineitem.l_suppkey->supplier',
                     CAST(count(*) AS BIGINT),
                     CAST(sum(CASE WHEN s_suppkey IS NULL THEN 1 ELSE 0 END)
                          AS BIGINT)
              FROM lineitem LEFT JOIN supplier ON l_suppkey = s_suppkey
            ),
            un AS (
              SELECT * FROM r1 UNION ALL SELECT * FROM r2
              UNION ALL SELECT * FROM r3 UNION ALL SELECT * FROM r4
            )
            SELECT relation, n_child, n_orphans,
                   round(n_orphans / CAST(n_child AS DOUBLE), 6)
                     AS orphan_rate
            FROM un
        """,
        "b3_psi": _psi_oracle_sql(),
        "b5_disjunctive_pushdown": """
            SELECT p_brand, CAST(count(*) AS BIGINT) AS n,
                   round(CAST(sum(CAST(l_extendedprice AS DECIMAL(28,4))
                              * (CAST(1 AS DECIMAL(28,4))
                                 - CAST(l_discount AS DECIMAL(28,4))))
                              AS DOUBLE), 2) AS revenue
            FROM lineitem JOIN part ON p_partkey = l_partkey
            WHERE (p_brand = 'Brand#1' AND p_type = 'SMALL'
                   AND CAST(l_quantity AS DOUBLE) <= 15 AND p_size <= 10)
               OR (p_brand = 'Brand#2' AND p_type = 'MEDIUM'
                   AND CAST(l_quantity AS DOUBLE) <= 25 AND p_size <= 20)
               OR (p_brand = 'Brand#3' AND p_type = 'LARGE'
                   AND CAST(l_quantity AS DOUBLE) <= 35 AND p_size <= 30)
            GROUP BY p_brand
        """,
        "b2_collapse_repeats": """
            WITH marked AS (
              SELECT event_type,
                     lag(event_type, 1) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                     ) AS prev
              FROM events
            ),
            kept AS (
              SELECT event_type, CAST(count(*) AS BIGINT) AS n_kept
              FROM marked WHERE prev IS NULL OR prev <> event_type
              GROUP BY event_type
            ),
            raw AS (
              SELECT event_type, CAST(count(*) AS BIGINT) AS n_raw
              FROM events GROUP BY event_type
            )
            SELECT raw.event_type, n_raw, n_kept, n_raw - n_kept AS n_collapsed
            FROM raw JOIN kept ON kept.event_type = raw.event_type
        """,
        "b3_changepoint": """
            WITH daily AS (
              SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS b,
                     CAST(count(*) AS BIGINT) AS c
              FROM events GROUP BY 1
            ),
            tot AS (SELECT CAST(sum(c) AS BIGINT) AS tc,
                           CAST(count(*) AS BIGINT) AS tn FROM daily),
            cum AS (
              SELECT b,
                     CAST(sum(c) OVER (ORDER BY b ROWS BETWEEN UNBOUNDED
                       PRECEDING AND CURRENT ROW) AS BIGINT) AS cs,
                     CAST(count(*) OVER (ORDER BY b ROWS BETWEEN UNBOUNDED
                       PRECEDING AND CURRENT ROW) AS BIGINT) AS cn
              FROM daily
            ),
            sc AS (
              SELECT b AS split_bucket, cn AS n_left, tn - cn AS n_right,
                     cs / CAST(cn AS DOUBLE) AS ml,
                     (tc - cs) / CAST(tn - cn AS DOUBLE) AS mr
              FROM cum CROSS JOIN tot WHERE cn < tn
            )
            SELECT split_bucket, n_left, n_right,
                   round(ml, 6) AS mean_left, round(mr, 6) AS mean_right,
                   round(abs(ml - mr), 6) AS delta,
                   row_number() OVER (ORDER BY abs(ml - mr) DESC,
                                      split_bucket) = 1 AS is_best
            FROM sc
        """,
        "b1_incremental_agg": """
            WITH eff AS (
              SELECT o_orderstatus, o_orderpriority,
                     CASE WHEN o_orderkey % 7 = 0
                          THEN CAST(o_totalprice AS DECIMAL(38,6))
                               + CAST(10 AS DECIMAL(38,6))
                          ELSE CAST(o_totalprice AS DECIMAL(38,6))
                     END AS p
              FROM orders WHERE o_orderkey % 13 <> 0
            )
            SELECT o_orderstatus, o_orderpriority,
                   CAST(count(*) AS BIGINT) AS cnt,
                   round(CAST(sum(p) AS DOUBLE), 2) AS sum_price
            FROM eff GROUP BY o_orderstatus, o_orderpriority
        """,
        # ---- round 9: evaluation / concentration / shape depth ----------
        "b2_write_amplification": f"""
            WITH changes AS ({_EVENTS_CHANGES_SQL}),
            agg AS (
              SELECT operation, CAST(count(*) AS BIGINT) AS n_changes,
                     CAST(sum(coalesce(length(before), 0)) AS BIGINT)
                       AS before_bytes,
                     CAST(sum(coalesce(length(after), 0)) AS BIGINT)
                       AS after_bytes
              FROM changes GROUP BY operation
            )
            SELECT operation, n_changes, before_bytes, after_bytes,
                   round(CAST(before_bytes + after_bytes AS DOUBLE)
                         / CAST(n_changes AS DOUBLE), 6) AS avg_image_bytes
            FROM agg
        """,
        # ---- round 9 wave 3 ---------------------------------------------
        "b2_idempotency": f"""
            WITH ch AS ({_EVENTS_CHANGES_SQL}),
            delivered AS (
              SELECT * FROM ch
              UNION ALL
              SELECT * FROM ch WHERE id % 13 = 5
            ),
            keyed AS (
              SELECT operation,
                     md5(concat_ws('|', tablename, CAST(id AS VARCHAR),
                                   operation, COALESCE(before, ''),
                                   COALESCE(after, ''))) AS k
              FROM delivered
            ),
            per AS (
              SELECT operation, k, CAST(count(*) AS BIGINT) AS n
              FROM keyed GROUP BY operation, k
            )
            SELECT operation,
                   CAST(count(*) AS BIGINT) AS n_logical_changes,
                   CAST(sum(CASE WHEN n >= 2 THEN 1 ELSE 0 END) AS BIGINT)
                     AS n_duplicated,
                   CAST(sum(n - 1) AS BIGINT) AS n_redundant_deliveries,
                   CAST((sum(CASE WHEN n >= 2 THEN 1 ELSE 0 END) * 1000000)
                        // count(*) AS BIGINT) AS dup_rate_micros
            FROM per GROUP BY operation
        """,
        "b3_slo_burn": """
            WITH w AS (
              SELECT CAST(floor(epoch(ts)) AS BIGINT) // 21600 AS win6h,
                     CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS e
              FROM events
            )
            SELECT win6h,
                   CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(e) AS BIGINT) AS n_errors,
                   CAST((sum(e) * 1000000) // count(*) AS BIGINT)
                     AS err_rate_micros,
                   sum(e) * 50 > count(*) AS page_alert
            FROM w GROUP BY win6h
        """,
    "b1_out_of_order": f"""
        WITH changes AS ({_EVENTS_CHANGES_SQL}),
        keyed AS (
          SELECT id, operation,
                 CAST(json_extract_string(coalesce(after, before),
                                          '$.user_id') AS BIGINT) AS user_id,
                 json_extract_string(coalesce(after, before),
                                     '$.event_type') AS event_type,
                 CAST(json_extract_string(coalesce(after, before),
                                          '$.value') AS DOUBLE) AS value
          FROM changes
        ),
        latest AS (
          SELECT * FROM (
            SELECT *, row_number() OVER (
              PARTITION BY user_id ORDER BY id DESC) AS rn
            FROM keyed
          ) WHERE rn = 1
        )
        SELECT user_id, id AS last_id, operation AS last_op, event_type,
               value AS last_value
        FROM latest WHERE operation <> 'DELETE'
    """,
    "b3_staleness_trend": """
        WITH anchor AS (
          SELECT CAST(epoch_us(max(ts)) AS BIGINT) AS now_us, max(ts) AS mx
          FROM events
        ),
        j AS (
          SELECT event_type, ts,
                 (a.now_us - CAST(epoch_us(ts) AS BIGINT)) AS lag_us
          FROM events, anchor a
        )
        SELECT event_type,
               max(ts) AS last_ts,
               CAST(min(lag_us // 60000000) AS BIGINT) AS lag_minutes,
               CAST(sum(CASE WHEN lag_us // 86400000000 = 0
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_last_day,
               CAST(sum(CASE WHEN lag_us // 86400000000 = 1
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_prev_day,
               round(CAST(sum(CASE WHEN lag_us // 86400000000 = 0
                              THEN 1 ELSE 0 END) AS DOUBLE)
                     / greatest(CAST(sum(CASE WHEN lag_us // 86400000000 = 1
                                     THEN 1 ELSE 0 END) AS DOUBLE), 1.0), 6)
                 AS day_over_day
        FROM j GROUP BY event_type
    """,

    "b3_schema_drift": """
        WITH anchor AS (
          SELECT min(CAST(epoch_us(ts) AS BIGINT)) AS t0,
                 max(CAST(epoch_us(ts) AS BIGINT)) AS t1
          FROM events
        ),
        evolved AS (
          SELECT event_type,
                 (CAST(epoch_us(ts) AS BIGINT) - a.t0) // 86400000000 AS day,
                 CASE WHEN CAST(epoch_us(ts) AS BIGINT)
                           >= (a.t0 + a.t1) / 2
                      THEN substr(props, 1, length(props) - 1)
                           || ', "v2": 1}'
                      ELSE props END AS props
          FROM events, anchor a
        ),
        keys AS (
          SELECT event_type, day, unnest(json_keys(props)) AS key
          FROM evolved
        )
        SELECT event_type, key,
               CAST(min(day) AS BIGINT) AS first_day,
               CAST(max(day) AS BIGINT) AS last_day,
               CAST(count(*) AS BIGINT) AS n,
               (min(day) > 0) AS drifted
        FROM keys GROUP BY event_type, key
    """,

    "b2_retention_policies": """
        WITH ev AS (
          SELECT event_id, user_id, CAST(epoch_us(ts) AS BIGINT) AS us
          FROM events
        ),
        anchor AS (SELECT max(us) AS now_us FROM ev),
        tot AS (SELECT CAST(count(*) AS BIGINT) AS t FROM ev),
        tk AS (
          SELECT CAST(count(*) AS BIGINT) AS n_kept FROM ev, anchor
          WHERE us > now_us - 604800000000
        ),
        ln AS (
          SELECT CAST(count(*) AS BIGINT) AS n_kept FROM (
            SELECT row_number() OVER (PARTITION BY user_id
                     ORDER BY us DESC, event_id DESC) AS rn
            FROM ev
          ) WHERE rn <= 3
        ),
        ck AS (
          SELECT CAST(count(*) AS BIGINT) AS n_kept FROM (
            SELECT user_id, max(us) FROM ev GROUP BY user_id
          )
        ),
        u AS (
          SELECT 'time_7d' AS policy, n_kept FROM tk
          UNION ALL
          SELECT 'per_key_last_3', n_kept FROM ln
          UNION ALL
          SELECT 'compact_latest', n_kept FROM ck
        )
        SELECT policy, n_kept,
               round(CAST(n_kept AS DOUBLE) / tot.t, 6) AS kept_share
        FROM u CROSS JOIN tot
    """,

        "b2_compaction_cost": f"""
            -- streaming-compaction cost model: per 1000-change epoch,
            -- liveness carried as keyed +/-1 deltas, running sums over
            -- the epoch grid (mirrors derive.compaction_cost exactly;
            -- CTE body shared with the cadence sweep via
            -- _compaction_cost_sql)
            WITH changes AS ({_EVENTS_CHANGES_SQL}),
            {_compaction_cost_sql(1000)}
            SELECT epoch, n_changes, n_keys_touched, carried_in,
                   live_at_end, rows_read, rows_written,
                   CASE WHEN live_at_end > 0 THEN
                     round(CAST(cum_written AS DOUBLE)
                           / CAST(live_at_end AS DOUBLE), 6)
                   END AS write_amp
            FROM o_1000
        """,

        "b2_compaction_cadence": _compaction_cadence_sql(),

        "b6_typed_projection": f"""
            -- typed view over the after-images: same JSON text both
            -- engines render (a4 parity), so extracted doubles match
            WITH changes AS ({_EVENTS_CHANGES_SQL})
            SELECT id, operation AS op,
                   CAST(json_extract_string(after, '$.user_id') AS BIGINT)
                     AS user_id,
                   json_extract_string(after, '$.event_type')
                     AS event_type,
                   CAST(json_extract_string(after, '$.value') AS DOUBLE)
                     AS value,
                   CAST(floor(CAST(json_extract_string(after, '$.value')
                        AS DOUBLE) / 50.0) AS BIGINT) AS value_band,
                   json_extract_string(after, '$.event_type')
                     = 'purchase' AS is_purchase
            FROM changes WHERE after IS NOT NULL
        """,

        "b6_tolerant_projection": f"""
            -- schema-tolerant typed view over mixed-shape images:
            -- missing JSON fields extract as NULL on both engines;
            -- defaults filled, fill count reported per row.
            -- TRY_CAST, not CAST: Spark's cast-to-double NULLs on
            -- non-numeric text, and this row exists to surface exactly
            -- that malformed-image drift — a strict CAST would crash
            -- the oracle leg instead of comparing (ADVICE r14)
            WITH changes AS ({_EVENTS_CHANGES_SQL})
            SELECT id, operation AS op,
                   TRY_CAST(json_extract_string(coalesce(after, before),
                        '$.user_id') AS BIGINT) AS user_id,
                   coalesce(json_extract_string(coalesce(after, before),
                        '$.event_type'), 'unknown') AS event_type,
                   coalesce(TRY_CAST(json_extract_string(
                        coalesce(after, before), '$.value') AS DOUBLE),
                        -1.0) AS value,
                   CAST((json_extract_string(coalesce(after, before),
                         '$.event_type') IS NULL)::INT
                      + (TRY_CAST(json_extract_string(coalesce(after, before),
                         '$.value') AS DOUBLE) IS NULL)::INT AS BIGINT)
                     AS n_filled
            FROM changes
        """,

        "b4_source_audit": """
            -- degraded-replay integrity audit: drop ids %101=0,
            -- double-deliver ids %103=5, shift ts of ids %97=3 back
            -- an hour; every defect class must be counted exactly
            WITH src AS (
              SELECT event_id,
                     CASE WHEN event_id % 97 = 3
                          THEN ts - INTERVAL 1 HOUR ELSE ts END AS ts,
                     user_id
              FROM events
            ),
            replay AS (
              SELECT * FROM src WHERE event_id % 101 != 0
              UNION ALL
              SELECT * FROM src WHERE event_id % 103 = 5
            ),
            seq AS (
              SELECT ts, lag(ts) OVER (
                       PARTITION BY user_id ORDER BY event_id) AS pts
              FROM replay
            ),
            reg AS (
              SELECT CAST(sum(CASE WHEN ts < pts THEN 1 ELSE 0 END)
                          AS BIGINT) AS n_ts_regressions
              FROM seq
            ),
            users AS (
              SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
              FROM replay
            ),
            base AS (
              SELECT CAST(count(*) AS BIGINT) AS n_rows,
                     CAST(count(DISTINCT event_id) AS BIGINT)
                       AS n_distinct_ids,
                     CAST(max(event_id) - min(event_id) + 1 AS BIGINT)
                       AS id_span
              FROM replay
            )
            SELECT base.n_rows, base.n_distinct_ids, base.id_span,
                   CAST(base.id_span - base.n_distinct_ids AS BIGINT)
                     AS n_missing_ids,
                   CAST(base.n_rows - base.n_distinct_ids AS BIGINT)
                     AS n_dup_rows,
                   reg.n_ts_regressions,
                   users.n_users
            FROM base, reg, users
        """,

        "b5_pushdown_audit": """
            -- selectivity ledger per predicate class (the Spark side
            -- scans once per class with the predicate pushed; values
            -- here are the ground truth those pushed scans must hit)
            WITH t AS (SELECT CAST(count(*) AS BIGINT) AS n_total
                       FROM part),
            legs AS (
              SELECT 'brand_in' AS predicate, 'In' AS pushed,
                     CAST(count(*) AS BIGINT) AS n_match
              FROM part WHERE p_brand IN ('Brand#1', 'Brand#3')
              UNION ALL
              SELECT 'name_prefix', 'StringStartsWith',
                     CAST(count(*) AS BIGINT)
              FROM part WHERE p_name LIKE 's%'
              UNION ALL
              SELECT 'size_range', 'Range', CAST(count(*) AS BIGINT)
              FROM part WHERE p_size >= 5 AND p_size <= 25
              UNION ALL
              SELECT 'type_eq', 'EqualTo', CAST(count(*) AS BIGINT)
              FROM part WHERE p_type = 'SMALL'
              UNION ALL
              -- 3-way: the 4th conjunct empties it at sf0.001
              SELECT 'conjunction', 'And', CAST(count(*) AS BIGINT)
              FROM part
              WHERE p_brand IN ('Brand#1', 'Brand#3')
                AND p_name LIKE 's%'
                AND p_size >= 5 AND p_size <= 25
            )
            SELECT legs.predicate, legs.pushed, legs.n_match, t.n_total,
                   round(CAST(legs.n_match AS DOUBLE)
                         / CAST(t.n_total AS DOUBLE), 6) AS selectivity
            FROM legs, t
        """,

        "b6_image_shape_profile": f"""
            -- per-(op, field) presence profile over the mixed images;
            -- DELETE rows carry before-only key images, so non-key
            -- fields read 0% present there
            WITH changes AS ({_EVENTS_CHANGES_SQL}),
            f AS (
              SELECT operation AS op, coalesce(after, before) AS img
              FROM changes
            ),
            ex AS (
              SELECT op, fld,
                     (json_extract_string(img, '$.' || fld)
                      IS NOT NULL)::INT AS present
              FROM f, unnest(['user_id', 'event_type', 'value', 'props'])
                     AS t(fld)
            )
            SELECT op, fld AS field,
                   CAST(count(*) AS BIGINT) AS n_images,
                   CAST(sum(present) AS BIGINT) AS n_present,
                   CAST(count(*) - sum(present) AS BIGINT) AS n_absent,
                   round(CAST(sum(present) AS DOUBLE) / count(*), 6)
                     AS presence_rate
            FROM ex GROUP BY op, fld
        """,
        "b4_gap_repair_manifest": """
            -- the audit's counts as the consumer-side FIX: per-1024-id
            -- bucket of the degraded replay, expected-vs-got ids and
            -- the keyset re-request bounds; defective buckets only.
            -- The bucket grid is generated from the delivered span and
            -- the per-bucket counts LEFT-joined on (r17 ADVICE), so a
            -- bucket whose deliveries were ALL dropped still surfaces
            -- (n_got=0, n_missing=n_expected)
            WITH replay AS (
              SELECT event_id FROM events WHERE event_id % 101 != 0
              UNION ALL
              SELECT event_id FROM events WHERE event_id % 103 = 5
            ),
            bounds AS (
              SELECT CAST(min(event_id) AS BIGINT) AS lo_id,
                     CAST(max(event_id) AS BIGINT) AS hi_id
              FROM replay
            ),
            pb AS (
              SELECT CAST(event_id // 1024 AS BIGINT) AS bucket,
                     CAST(count(*) AS BIGINT) AS n_rows,
                     CAST(count(DISTINCT event_id) AS BIGINT) AS n_got
              FROM replay GROUP BY 1
            ),
            grid AS (
              SELECT CAST(unnest(generate_series(b.lo_id // 1024,
                                                 b.hi_id // 1024))
                          AS BIGINT) AS bucket,
                     b.lo_id, b.hi_id
              FROM bounds b
            ),
            m AS (
              SELECT g.bucket,
                     greatest(g.bucket * 1024, g.lo_id) AS lo,
                     least(g.bucket * 1024 + 1023, g.hi_id) AS hi,
                     COALESCE(pb.n_rows, 0) AS n_rows,
                     COALESCE(pb.n_got, 0) AS n_got
              FROM grid g LEFT JOIN pb ON g.bucket = pb.bucket
            )
            SELECT bucket,
                   CAST(lo AS BIGINT) AS rerequest_from,
                   CAST(hi AS BIGINT) AS rerequest_to,
                   CAST(hi - lo + 1 AS BIGINT) AS n_expected,
                   n_got,
                   CAST(hi - lo + 1 - n_got AS BIGINT) AS n_missing,
                   CAST(n_rows - n_got AS BIGINT) AS n_dup_deliveries,
                   CASE WHEN hi - lo + 1 - n_got > 0 THEN 'rerequest'
                        ELSE 'dedup_ack' END AS action
            FROM m
            WHERE hi - lo + 1 - n_got > 0 OR n_rows - n_got > 0
        """,

        "b5_partition_pruning": """
            -- directory-partition pruning ledger: partitions surviving
            -- the partition predicate, rows SCANNED (whole surviving
            -- partitions) vs rows MATCHED (full predicate)
            WITH o AS (
              SELECT year(o_orderdate) AS y, o_totalprice FROM orders
            ),
            t AS (
              SELECT CAST(count(DISTINCT y) AS BIGINT) AS n_parts_total,
                     CAST(count(*) AS BIGINT) AS n_rows_total
              FROM o
            ),
            legs AS (
              SELECT 'year_eq' AS predicate,
                     CAST(count(DISTINCT y) AS BIGINT) AS n_parts_read,
                     CAST(count(*) AS BIGINT) AS n_rows_scanned,
                     CAST(sum((y = 1998)::INT) AS BIGINT) AS n_match
              FROM o WHERE y = 1998
              UNION ALL
              SELECT 'year_in', CAST(count(DISTINCT y) AS BIGINT),
                     CAST(count(*) AS BIGINT),
                     CAST(sum((y IN (1995, 2001))::INT) AS BIGINT)
              FROM o WHERE y IN (1995, 2001)
              UNION ALL
              SELECT 'year_range', CAST(count(DISTINCT y) AS BIGINT),
                     CAST(count(*) AS BIGINT),
                     CAST(sum((y BETWEEN 1996 AND 1998)::INT) AS BIGINT)
              FROM o WHERE y BETWEEN 1996 AND 1998
              UNION ALL
              SELECT 'residual', CAST(count(DISTINCT y) AS BIGINT),
                     CAST(count(*) AS BIGINT),
                     CAST(sum((y = 1998 AND o_totalprice >= 1000.0)::INT)
                          AS BIGINT)
              FROM o WHERE y = 1998
              UNION ALL
              SELECT 'none', CAST(count(DISTINCT y) AS BIGINT),
                     CAST(count(*) AS BIGINT),
                     CAST(sum((o_totalprice >= 1000.0)::INT) AS BIGINT)
              FROM o
            )
            SELECT legs.predicate, legs.n_parts_read, t.n_parts_total,
                   legs.n_rows_scanned, legs.n_match,
                   round(CAST(legs.n_rows_scanned AS DOUBLE)
                         / CAST(t.n_rows_total AS DOUBLE), 6) AS scan_frac
            FROM legs, t
        """,
        "b6_cast_failure_ledger": f"""
            -- per-field TRY_CAST ledger over images corrupted in JSON-
            -- string space (ids %13: numeric value token -> "corrupt");
            -- value fails exactly on corrupted rows that carry it
            WITH changes AS ({_EVENTS_CHANGES_SQL}),
            f0 AS (
              SELECT id, coalesce(after, before) AS img0 FROM changes
            ),
            c AS (
              SELECT CASE WHEN id % 13 = 0
                          THEN regexp_replace(img0,
                               '"value":[0-9.eE+-]+', '"value":"corrupt"')
                          ELSE img0 END AS img
              FROM f0
            ),
            ex AS (
              SELECT fld,
                     (json_extract_string(img, '$.' || fld)
                      IS NOT NULL)::INT AS present,
                     (CASE fld
                        WHEN 'user_id' THEN
                          TRY_CAST(json_extract_string(img, '$.user_id')
                                   AS BIGINT) IS NOT NULL
                        WHEN 'value' THEN
                          TRY_CAST(json_extract_string(img, '$.value')
                                   AS DOUBLE) IS NOT NULL
                        ELSE json_extract_string(img, '$.' || fld)
                             IS NOT NULL
                      END)::INT AS ok
              FROM c, unnest(['user_id', 'event_type', 'value', 'props'])
                     AS t(fld)
            )
            SELECT fld AS field,
                   CAST(count(*) AS BIGINT) AS n_images,
                   CAST(sum(present) AS BIGINT) AS n_present,
                   CAST(sum(ok) AS BIGINT) AS n_cast_ok,
                   CAST(sum(present) - sum(ok) AS BIGINT) AS n_cast_fail,
                   round(CAST(sum(present) - sum(ok) AS DOUBLE)
                         / greatest(sum(present), 1), 6) AS fail_rate
            FROM ex GROUP BY fld
        """,
        "b4_watermark_gap": """
            -- gap repair under out-of-order delivery: missing ids at or
            -- below the id high-watermark (max delivered - 1536) are
            -- DECLARED missing (rerequest); missing ids above it are
            -- merely awaiting the watermark. Grid generated from the
            -- delivered span, per-bucket counts LEFT-joined on (the
            -- all-dropped-bucket rule)
            WITH replay AS (
              SELECT event_id FROM events WHERE event_id % 101 != 0
            ),
            bounds AS (
              SELECT CAST(min(event_id) AS BIGINT) AS lo_id,
                     CAST(max(event_id) AS BIGINT) AS hi_id,
                     CAST(greatest(max(event_id) - 1536,
                                   min(event_id) - 1) AS BIGINT) AS hw
              FROM replay
            ),
            pb AS (
              SELECT CAST(r.event_id // 1024 AS BIGINT) AS bucket,
                     CAST(count(DISTINCT CASE WHEN r.event_id <= b.hw
                                              THEN r.event_id END)
                          AS BIGINT) AS n_got_closed,
                     CAST(count(DISTINCT CASE WHEN r.event_id > b.hw
                                              THEN r.event_id END)
                          AS BIGINT) AS n_got_open
              FROM replay r, bounds b GROUP BY 1
            ),
            grid AS (
              SELECT CAST(unnest(generate_series(b.lo_id // 1024,
                                                 b.hi_id // 1024))
                          AS BIGINT) AS bucket,
                     b.lo_id, b.hi_id, b.hw
              FROM bounds b
            ),
            m AS (
              SELECT g.bucket, g.hw,
                     greatest(g.bucket * 1024, g.lo_id) AS lo_b,
                     least(g.bucket * 1024 + 1023, g.hi_id) AS hi_b,
                     COALESCE(pb.n_got_closed, 0) AS n_got_closed,
                     COALESCE(pb.n_got_open, 0) AS n_got_open
              FROM grid g LEFT JOIN pb ON g.bucket = pb.bucket
            ),
            e AS (
              SELECT bucket, hw, n_got_closed, n_got_open,
                     greatest(least(hi_b, hw) - lo_b + 1, 0)
                       AS n_exp_closed,
                     (hi_b - lo_b + 1)
                       - greatest(least(hi_b, hw) - lo_b + 1, 0)
                       AS n_exp_open
              FROM m
            )
            SELECT bucket,
                   CAST(hw AS BIGINT) AS watermark_id,
                   CAST(n_exp_closed AS BIGINT) AS n_expected_closed,
                   n_got_closed,
                   CAST(n_exp_closed - n_got_closed AS BIGINT)
                     AS n_missing_final,
                   CAST(n_exp_open AS BIGINT) AS n_expected_open,
                   n_got_open,
                   CAST(n_exp_open - n_got_open AS BIGINT) AS n_pending,
                   CASE WHEN n_exp_closed - n_got_closed > 0
                        THEN 'rerequest' ELSE 'await_watermark' END
                     AS action
            FROM e
            WHERE n_exp_closed - n_got_closed > 0
               OR n_exp_open - n_got_open > 0
        """,
        "b1_batch_compaction": f"""
            -- the oracle never sees the two batches: it diffs S0
            -- directly against S2, so hash equality proves the
            -- delta-route compaction law image-exactly
            WITH {_ORDERS_OLD_NEW_SQL},
            new2 AS (
              SELECT o_orderkey, o_custkey, o_orderstatus,
                     CASE WHEN o_orderkey % 89 = 4 THEN o_totalprice + 2.0
                          ELSE o_totalprice END AS o_totalprice,
                     o_orderpriority
              FROM new WHERE o_orderkey % 89 != 3
              UNION ALL
              SELECT o_orderkey + 200000000, o_custkey, 'N', o_totalprice,
                     o_orderpriority
              FROM new WHERE o_orderkey % 89 = 5
            ),
            j AS (
              SELECT o.o_orderkey AS ok, o.o_custkey AS ock,
                     o.o_orderstatus AS ost, o.o_totalprice AS otp,
                     o.o_orderpriority AS opr,
                     n.o_orderkey AS nk, n.o_custkey AS nck,
                     n.o_orderstatus AS nst, n.o_totalprice AS ntp,
                     n.o_orderpriority AS npr
              FROM old o FULL OUTER JOIN new2 n
                ON o.o_orderkey = n.o_orderkey
            ),
            cl AS (
              SELECT *,
                     CASE WHEN ok IS NULL THEN 'INSERT'
                          WHEN nk IS NULL THEN 'DELETE'
                          WHEN ock IS DISTINCT FROM nck
                            OR ost IS DISTINCT FROM nst
                            OR otp IS DISTINCT FROM ntp
                            OR opr IS DISTINCT FROM npr THEN 'UPDATE'
                     END AS operation
              FROM j
            )
            SELECT coalesce(nk, ok) AS o_orderkey, operation,
                   CASE WHEN operation != 'INSERT' THEN CAST(json_object(
                     'o_orderkey', ok, 'o_custkey', ock, 'o_orderstatus', ost,
                     'o_totalprice', otp, 'o_orderpriority', opr) AS VARCHAR)
                   END AS before,
                   CASE WHEN operation != 'DELETE' THEN CAST(json_object(
                     'o_orderkey', nk, 'o_custkey', nck, 'o_orderstatus', nst,
                     'o_totalprice', ntp, 'o_orderpriority', npr) AS VARCHAR)
                   END AS after
            FROM cl WHERE operation IS NOT NULL
        """,
}
