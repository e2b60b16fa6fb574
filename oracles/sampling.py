"""DuckDB oracle SQL — sampling family (split from
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
        "b26_hash_sample": f"""
            SELECT l_orderkey, l_linenumber, l_partkey, l_quantity
            FROM lineitem
            WHERE {sampling.bucket_sql('l_orderkey')} < 10
        """,
        "b26_train_split": f"""
            SELECT doc_id, lang,
                   CASE WHEN {sampling.bucket_sql('doc_id')} < 80 THEN 'train'
                        WHEN {sampling.bucket_sql('doc_id')} < 90 THEN 'val'
                        WHEN {sampling.bucket_sql('doc_id')} < 100 THEN 'test'
                   END AS split
            FROM documents
        """,
        "b26_stratified_sample": f"""
            SELECT doc_id, lang, source
            FROM documents
            WHERE {sampling.bucket_sql('doc_id')} <
                  CASE lang WHEN 'de' THEN 100 WHEN 'en' THEN 25
                            WHEN 'fr' THEN 100 ELSE 50 END
        """,
        "b26_exact_quota": f"""
            WITH pri AS (
              SELECT doc_id, lang,
                     {sampling.bucket_sql('doc_id', 1 << 32)} AS p
              FROM documents
            ),
            ranked AS (
              SELECT doc_id, lang, row_number() OVER (
                PARTITION BY lang ORDER BY p ASC, doc_id ASC) AS r
              FROM pri
            ),
            avail AS (
              SELECT lang, count(*) AS n_available FROM pri GROUP BY lang
            )
            SELECT t.lang,
                   CAST(count(*) AS BIGINT) AS n_taken,
                   CAST(min(doc_id) AS BIGINT) AS first_doc,
                   CAST(max(doc_id) AS BIGINT) AS last_doc,
                   CAST(min(avail.n_available) AS BIGINT) AS n_available
            FROM ranked t JOIN avail ON avail.lang = t.lang
            WHERE t.r <= 40
            GROUP BY t.lang
        """,
        "b28_packing": f"""
            WITH t AS (
              SELECT doc_id,
                     CAST(len(string_split({_NORM_SQL}, ' ')) AS BIGINT) AS n_tok
              FROM documents
            )
            SELECT doc_id, n_tok,
                   CAST(floor(
                     CAST(COALESCE(sum(n_tok) OVER (ORDER BY doc_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                          0) AS DOUBLE) / 512) AS BIGINT) AS pack_id
            FROM t
        """,
        "b28_pack_efficiency": f"""
            WITH t AS (
              SELECT doc_id,
                     CAST(len(string_split({_NORM_SQL}, ' ')) AS BIGINT)
                       AS n_tok
              FROM documents
            ),
            packed AS (
              SELECT doc_id, n_tok,
                     CAST(floor(
                       CAST(COALESCE(sum(n_tok) OVER (ORDER BY doc_id
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND 1 PRECEDING), 0) AS DOUBLE) / 512)
                       AS BIGINT) AS pack_id
              FROM t
            )
            SELECT pack_id,
                   CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(n_tok) AS BIGINT) AS sum_tok,
                   round(sum(n_tok) / 512.0, 6) AS fill,
                   sum(n_tok) > 512 AS overflow
            FROM packed GROUP BY pack_id
        """,
        "b26_split_leakage": _split_leakage_oracle_sql(),
        "b28_mixture": f"""
            WITH sized AS (
              SELECT doc_id, lang,
                     CAST(len({_TOKS_SQL}) AS BIGINT) AS n_tok
              FROM documents
            ),
            totals AS (
              SELECT lang, sum(n_tok) AS total FROM sized GROUP BY lang
            ),
            rates AS (
              -- total IS NULL / <= 0 => keep everything (mirrors the ANSI
              -- divide-by-zero guard in sampling.mixture_sample)
              SELECT lang,
                     CASE WHEN total IS NULL OR total <= 0 THEN 100
                          ELSE least(100,
                            ((CASE lang WHEN 'en' THEN 4000
                                        WHEN 'de' THEN 1500
                                        ELSE 2000 END) * 100) // total)
                     END AS keep_b
              FROM totals
            )
            SELECT s.doc_id, s.lang, s.n_tok
            FROM sized s JOIN rates r ON s.lang = r.lang
            WHERE {sampling.bucket_sql('s.doc_id')} < r.keep_b
        """,
        "b28_temperature": f"""
            WITH totals AS (
              SELECT lang, sum(n_chars) AS total FROM documents GROUP BY lang
            ),
            z AS (
              SELECT sum(sqrt(CAST(total AS DOUBLE))) AS z FROM totals
            ),
            rates AS (
              SELECT lang,
                     least(100, CAST(floor(
                       sqrt(CAST(total AS DOUBLE)) / z.z
                       * 100000.0 * 100.0 / CAST(total AS DOUBLE)
                       + 1e-9) AS BIGINT)) AS keep_b
              FROM totals CROSS JOIN z
            )
            SELECT d.doc_id, d.lang, d.n_chars
            FROM documents d JOIN rates r ON d.lang = r.lang
            WHERE {sampling.bucket_sql('d.doc_id')} < r.keep_b
        """,
        "b28_curriculum": f"""
            WITH base AS (
              SELECT doc_id,
                     {_sw_hits_sql('en')} AS s_en,
                     CAST(length(text) AS BIGINT) AS q_chars,
                     CAST(len({_TOKS_SQL}) AS BIGINT) AS q_tokens,
                     CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g'))
                          AS BIGINT) AS alpha
              FROM documents
            ),
            feat AS (
              SELECT doc_id, q_tokens,
                round(CAST(alpha AS DOUBLE)
                      / CAST(greatest(q_chars, 1) AS DOUBLE), 6)
                  AS q_alpha_ratio,
                round(CAST(s_en AS DOUBLE)
                      / CAST(greatest(q_tokens, 1) AS DOUBLE), 6)
                  AS q_stopword_ratio
              FROM base
            ),
            staged AS (
              SELECT doc_id, q_tokens AS n_tok,
                     least(CAST(floor(
                       round(least(CAST(q_tokens AS DOUBLE) / 50.0, 1.0) * 0.4
                             + q_alpha_ratio * 0.4
                             + least(q_stopword_ratio * 5.0, 1.0) * 0.2, 6)
                       * 10) AS BIGINT), 9) AS phase
              FROM feat
            ),
            keyed AS (
              SELECT *, phase * 10000000 + doc_id AS okey FROM staged
            ),
            cum AS (
              SELECT *, COALESCE(sum(n_tok) OVER (
                ORDER BY okey
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS c
              FROM keyed
            )
            SELECT doc_id, phase,
                   CAST(floor(c / 4000.0) AS BIGINT) AS pack_id,
                   CAST(n_tok AS BIGINT) AS n_tok
            FROM cum
        """,
        "b26_cluster_kfold": f"""
            WITH labels AS ({_dup_clusters_oracle_sql()}),
            corpus AS ({_B19_CORPUS_SQL}),
            keyed AS (
              SELECT c.doc_id,
                     COALESCE(l.cluster_id, c.doc_id) AS k
              FROM corpus c LEFT JOIN labels l ON c.doc_id = l.doc_id
            )
            SELECT CAST({sampling.bucket_sql('k', 5)} AS BIGINT) AS fold,
                   CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(count(DISTINCT k) AS BIGINT) AS n_keys
            FROM keyed GROUP BY fold
        """,
        "b26_interleave": f"""
            WITH srcs AS (
              SELECT source,
                     row_number() OVER (ORDER BY source ASC) - 1 AS six
              FROM (SELECT DISTINCT source FROM documents)
            ),
            ns AS (SELECT CAST(count(*) AS BIGINT) AS n FROM srcs),
            ranked AS (
              SELECT doc_id, source,
                     row_number() OVER (
                       PARTITION BY source
                       ORDER BY {sampling.bucket_sql('doc_id', 1 << 32)} ASC,
                                doc_id ASC) AS r
              FROM documents
            )
            SELECT doc_id, ranked.source,
                   CAST((r - 1) * ns.n + srcs.six AS BIGINT) AS pos
            FROM ranked
            JOIN srcs ON srcs.source = ranked.source
            CROSS JOIN ns
        """,
        "b26_kfold": f"""
            SELECT doc_id, lang,
                   CAST({sampling.bucket_sql('doc_id', 5)} AS BIGINT) AS fold
            FROM documents
        """,
        "b28_epochs": f"""
            WITH sized AS (
              SELECT doc_id, lang,
                     CAST(len({_TOKS_SQL}) AS BIGINT) AS n_tok
              FROM documents
            ),
            totals AS (
              SELECT lang, sum(n_tok) AS total FROM sized GROUP BY lang
            ),
            rates AS (
              SELECT lang,
                     CASE WHEN total IS NULL OR total <= 0 THEN NULL
                          ELSE ((CASE lang WHEN 'en' THEN 4000
                                           WHEN 'de' THEN 20000
                                           WHEN 'zh' THEN 15000
                                           ELSE NULL END) * 100) // total
                     END AS r
              FROM totals
            )
            SELECT s.doc_id, s.lang, s.n_tok,
                   CAST(CASE WHEN r.r IS NULL THEN 1
                        ELSE (r.r // 100)
                             + (CASE WHEN {sampling.bucket_sql('s.doc_id')}
                                     < (r.r % 100) THEN 1 ELSE 0 END)
                        END AS BIGINT) AS n_copies
            FROM sized s JOIN rates r ON s.lang = r.lang
        """,
        "b27_sketch_bounds": """
            SELECT l_returnflag,
                   CAST(count(DISTINCT l_orderkey) AS BIGINT) AS exact_orders,
                   round(quantile_cont(l_extendedprice, 0.5), 6) AS p50_exact,
                   abs(approx_count_distinct(l_orderkey)
                       - count(DISTINCT l_orderkey))
                     <= 0.15 * count(DISTINCT l_orderkey) AS cd_within_bound,
                   abs(approx_quantile(l_extendedprice, 0.5)
                       - quantile_cont(l_extendedprice, 0.5))
                     <= 0.05 * quantile_cont(l_extendedprice, 0.5)
                     AS p50_within_bound
            FROM lineitem GROUP BY l_returnflag
        """,
        "b26_fixed_per_group": f"""
            WITH pri AS (
              SELECT doc_id, lang, n_chars,
                     {sampling.bucket_sql('doc_id', 1 << 32)} AS p
              FROM documents
            ),
            ranked AS (
              SELECT doc_id, lang, n_chars, row_number() OVER (
                PARTITION BY lang ORDER BY p ASC, doc_id ASC) AS rn
              FROM pri
            )
            SELECT doc_id, lang, n_chars FROM ranked WHERE rn <= 20
        """,
        "b28_training_manifest": f"""
            WITH {_DOCS_DUPS_SQL},
            feat AS (
              SELECT doc_id, text, lang,
                     CAST(len({_TOKS_SQL}) AS BIGINT) AS q_tokens,
                     round(CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE)
                           / CAST(greatest(length(text), 1) AS DOUBLE), 6) AS q_alpha_ratio,
                     round(CAST({_sw_hits_sql('en')} AS DOUBLE)
                           / CAST(greatest(len({_TOKS_SQL}), 1) AS DOUBLE), 6) AS q_sw_ratio
              FROM docs
            ),
            scored AS (
              SELECT *,
                     round(least(CAST(q_tokens AS DOUBLE) / 50.0, 1.0) * 0.4
                           + q_alpha_ratio * 0.4
                           + least(q_sw_ratio * 5.0, 1.0) * 0.2, 6) AS quality_score
              FROM feat
            ),
            gated AS (
              SELECT * FROM scored WHERE quality_score >= 0.5 AND q_tokens >= 20
            ),
            deduped AS (
              SELECT * FROM (
                SELECT *, row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn
                FROM gated
              ) WHERE rn = 1
            ),
            sampled AS (
              SELECT * FROM deduped
              WHERE {sampling.bucket_sql('doc_id')} <
                    CASE lang WHEN 'en' THEN 50 ELSE 100 END
            ),
            manifest AS (
              SELECT *,
                     CASE WHEN {sampling.bucket_sql('doc_id')} < 80 THEN 'train'
                          WHEN {sampling.bucket_sql('doc_id')} < 90 THEN 'val'
                          WHEN {sampling.bucket_sql('doc_id')} < 100 THEN 'test'
                     END AS split
              FROM sampled
            )
            SELECT split, lang, count(*) AS n_docs,
                   CAST(sum(q_tokens) AS BIGINT) AS total_tokens
            FROM manifest GROUP BY split, lang
        """,
        "b27_linear_counting": _linear_counting_oracle_sql(),
        "b26_rendezvous": _rendezvous_oracle_sql(),
        "b26_temporal_split": """
            WITH test AS (
              SELECT *, 'test' AS split FROM events
              WHERE ts >= TIMESTAMP '2024-01-30 12:00:00'
            ),
            tk AS (SELECT DISTINCT user_id FROM test),
            train AS (
              SELECT e.*, 'train' AS split FROM events e
              WHERE e.ts < TIMESTAMP '2024-01-28 00:00:00'
                AND e.user_id NOT IN (SELECT user_id FROM tk)
            ),
            un AS (SELECT * FROM train UNION ALL SELECT * FROM test)
            SELECT split, event_type, CAST(count(*) AS BIGINT) AS n,
                   CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
            FROM un GROUP BY split, event_type
        """,
        "b26_weighted_sample": """
            WITH wt AS (
              SELECT doc_id,
                     1 + CAST(floor(length(text) / 500.0) AS BIGINT) AS weight
              FROM documents
            ),
            cl AS (
              SELECT doc_id, weight,
                     least(greatest(weight, 1), 32) AS w
              FROM wt
            ),
            tick AS (
              SELECT doc_id, weight, unnest(generate_series(1, w)) AS t
              FROM cl
            ),
            drawn AS (
              SELECT doc_id, weight,
                     CAST('0x' || substr(md5(doc_id || ':' || t), 1, 15)
                          AS BIGINT) AS u
              FROM tick
            ),
            prio AS (
              SELECT doc_id, weight, max(u) AS priority
              FROM drawn GROUP BY doc_id, weight
            )
            SELECT doc_id, weight, priority,
                   CAST(row_number() OVER (ORDER BY priority DESC, doc_id)
                        AS BIGINT) AS rk
            FROM prio ORDER BY priority DESC, doc_id LIMIT 200
        """,
        "b28_length_buckets": f"""
            WITH t AS (
              SELECT doc_id,
                     CAST(len(string_split({_NORM_SQL}, ' ')) AS BIGINT)
                       AS n_tok
              FROM documents
            ),
            tiled AS (
              SELECT doc_id, n_tok,
                     ntile(8) OVER (ORDER BY n_tok ASC, doc_id ASC) AS bucket
              FROM t
            )
            SELECT CAST(bucket AS INTEGER) AS bucket,
                   CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(min(n_tok) AS BIGINT) AS min_tok,
                   CAST(max(n_tok) AS BIGINT) AS max_tok,
                   CAST(sum(n_tok) AS BIGINT) AS sum_tok,
                   CAST(count(*) * max(n_tok) - sum(n_tok) AS BIGINT)
                     AS padding_waste
            FROM tiled GROUP BY 1
        """,
        "b27_lc_union": _lc_union_oracle_sql(),
        "b28_budget_allocation": f"""
            WITH per AS (
              SELECT source,
                     CAST(sum(CAST(len({_TOKS_SQL}) AS BIGINT)) AS BIGINT)
                       AS w
              FROM documents GROUP BY source
            ),
            tot AS (SELECT CAST(sum(w) AS BIGINT) AS wt FROM per),
            q AS (
              SELECT source, w,
                     (w * 1000000) // wt AS base,
                     (w * 1000000) % wt AS rem
              FROM per, tot
            ),
            s AS (SELECT CAST(sum(base) AS BIGINT) AS base_sum FROM q),
            r AS (
              SELECT q.source, q.w, q.base,
                     row_number() OVER (
                       ORDER BY q.rem DESC, q.source ASC) AS rk,
                     1000000 - s.base_sum AS leftover
              FROM q, s
            )
            SELECT source, w,
                   CAST(base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END
                        AS BIGINT) AS alloc,
                   round(CAST(base + CASE WHEN rk <= leftover
                                          THEN 1 ELSE 0 END AS DOUBLE)
                         / 1000000.0, 6) AS alloc_share
            FROM r
        """,
        # ---- round 9 wave 4 ---------------------------------------------
        "b27_hll_registers": _hll_registers_oracle_sql(),
        "b27_cms_heavy_hitters": """
            WITH per_user AS (
              SELECT user_id, CAST(count(*) AS BIGINT) AS n
              FROM events GROUP BY user_id
            ),
            hashed AS (
              SELECT user_id, n,
                     CAST('0x' || substr(md5('0:' || CAST(user_id AS VARCHAR)),
                          1, 15) AS BIGINT) % 64 AS b0,
                     CAST('0x' || substr(md5('1:' || CAST(user_id AS VARCHAR)),
                          1, 15) AS BIGINT) % 64 AS b1,
                     CAST('0x' || substr(md5('2:' || CAST(user_id AS VARCHAR)),
                          1, 15) AS BIGINT) % 64 AS b2,
                     CAST('0x' || substr(md5('3:' || CAST(user_id AS VARCHAR)),
                          1, 15) AS BIGINT) % 64 AS b3
              FROM per_user
            ),
            cells AS (
              SELECT 0 AS r, b0 AS b, n FROM hashed
              UNION ALL SELECT 1, b1, n FROM hashed
              UNION ALL SELECT 2, b2, n FROM hashed
              UNION ALL SELECT 3, b3, n FROM hashed
            ),
            counters AS (
              SELECT r, b, sum(n) AS cnt FROM cells GROUP BY r, b
            ),
            cand AS (
              SELECT * FROM hashed ORDER BY n DESC, user_id ASC LIMIT 10
            ),
            cand_cells AS (
              SELECT user_id, n, 0 AS r, b0 AS b FROM cand
              UNION ALL SELECT user_id, n, 1, b1 FROM cand
              UNION ALL SELECT user_id, n, 2, b2 FROM cand
              UNION ALL SELECT user_id, n, 3, b3 FROM cand
            )
            SELECT cc.user_id, cc.n AS n_exact,
                   CAST(min(ct.cnt) AS BIGINT) AS cms_estimate,
                   CAST(min(ct.cnt) - cc.n AS BIGINT) AS overcount
            FROM cand_cells cc JOIN counters ct ON cc.r = ct.r AND cc.b = ct.b
            GROUP BY cc.user_id, cc.n
        """,
        "b26_ht_estimate": """
            WITH ev AS (
              SELECT event_type, user_id,
                     CAST(floor(value * 1e6) AS BIGINT) AS vm
              FROM events
            ),
            ex AS (
              SELECT event_type, CAST(count(*) AS BIGINT) AS n_exact,
                     CAST(sum(vm) AS BIGINT) AS sum_micros_exact
              FROM ev GROUP BY event_type
            ),
            est AS (
              SELECT event_type, CAST(count(*) * 16 AS BIGINT) AS n_est,
                     CAST(sum(vm) * 16 AS BIGINT) AS sum_micros_est
              FROM ev
              WHERE CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)
                         AS BIGINT) % 16 = 0
              GROUP BY event_type
            )
            SELECT ex.event_type, ex.n_exact, est.n_est,
                   ex.sum_micros_exact, est.sum_micros_est,
                   CAST((abs(est.n_est - ex.n_exact) * 1000000) // ex.n_exact
                        AS BIGINT) AS n_err_micros,
                   CAST((abs(est.sum_micros_est - ex.sum_micros_exact)
                         * 1000000) // ex.sum_micros_exact AS BIGINT)
                     AS sum_err_micros
            FROM ex JOIN est USING (event_type)
        """,
        "b27_quantile_sketch": """
            WITH ev AS (
              SELECT event_type,
                     CAST(floor(value * 1e6) AS BIGINT) AS vm
              FROM events
            ),
            bounds AS (
              SELECT min(vm) AS lo, max(vm) - min(vm) + 1 AS r FROM ev
            ),
            bucketed AS (
              SELECT event_type, vm,
                     CAST(least(((vm - lo) * 128) // r, 127) AS INT) AS bkt
              FROM ev CROSS JOIN bounds
            ),
            scope_sk AS (
              SELECT event_type AS scope, bkt,
                     CAST(count(*) AS BIGINT) AS cnt
              FROM bucketed GROUP BY event_type, bkt
            ),
            sk AS (
              SELECT scope, bkt, cnt FROM scope_sk
              UNION ALL
              SELECT '(all)', bkt, CAST(sum(cnt) AS BIGINT)
              FROM scope_sk GROUP BY bkt
            ),
            ns AS (
              SELECT scope, CAST(sum(cnt) AS BIGINT) AS n
              FROM sk GROUP BY scope
            ),
            cum AS (
              SELECT sk.scope, bkt, cnt, ns.n,
                     CAST(sum(cnt) OVER (
                       PARTITION BY sk.scope ORDER BY bkt
                       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS c
              FROM sk JOIN ns USING (scope)
            ),
            est AS (
              SELECT scope, n,
                     min(CASE WHEN c * 100 >= 50 * n THEN bkt END) AS b50,
                     min(CASE WHEN c * 100 >= 95 * n THEN bkt END) AS b95,
                     min(CASE WHEN c * 100 >= 99 * n THEN bkt END) AS b99
              FROM cum GROUP BY scope, n
            ),
            sv AS (
              SELECT event_type AS scope, vm FROM ev
              UNION ALL
              SELECT '(all)', vm FROM ev
            ),
            dv AS (
              SELECT scope, vm, CAST(count(*) AS BIGINT) AS cc
              FROM sv GROUP BY scope, vm
            ),
            dvc AS (
              SELECT dv.scope, vm, ns.n,
                     CAST(sum(cc) OVER (
                       PARTITION BY dv.scope ORDER BY vm
                       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS c
              FROM dv JOIN ns USING (scope)
            ),
            exact AS (
              SELECT scope,
                     min(CASE WHEN c * 100 >= 50 * n THEN vm END) AS x50,
                     min(CASE WHEN c * 100 >= 95 * n THEN vm END) AS x95,
                     min(CASE WHEN c * 100 >= 99 * n THEN vm END) AS x99
              FROM dvc GROUP BY scope
            )
            SELECT e.scope, e.n,
                   x.x50 AS exact_p50,
                   CAST(lo + ((b50 * r) + 127) // 128 AS BIGINT)
                     AS est_lo_p50,
                   CAST(lo + (((b50 + 1) * r) + 127) // 128 - 1 AS BIGINT)
                     AS est_hi_p50,
                   x.x50 >= lo + ((b50 * r) + 127) // 128
                     AND x.x50 <= lo + (((b50 + 1) * r) + 127) // 128 - 1
                     AS in_bucket_p50,
                   x.x95 AS exact_p95,
                   CAST(lo + ((b95 * r) + 127) // 128 AS BIGINT)
                     AS est_lo_p95,
                   CAST(lo + (((b95 + 1) * r) + 127) // 128 - 1 AS BIGINT)
                     AS est_hi_p95,
                   x.x95 >= lo + ((b95 * r) + 127) // 128
                     AND x.x95 <= lo + (((b95 + 1) * r) + 127) // 128 - 1
                     AS in_bucket_p95,
                   x.x99 AS exact_p99,
                   CAST(lo + ((b99 * r) + 127) // 128 AS BIGINT)
                     AS est_lo_p99,
                   CAST(lo + (((b99 + 1) * r) + 127) // 128 - 1 AS BIGINT)
                     AS est_hi_p99,
                   x.x99 >= lo + ((b99 * r) + 127) // 128
                     AND x.x99 <= lo + (((b99 + 1) * r) + 127) // 128 - 1
                     AS in_bucket_p99
            FROM est e JOIN exact x USING (scope) CROSS JOIN bounds
        """,
        # ---- round 9 wave 7 ---------------------------------------------
    "b28_quality_knapsack": f"""
        WITH toks AS (
          SELECT doc_id, source,
                 CAST(len({_TOKS_SQL}) AS BIGINT) AS nt,
                 CAST(len(list_distinct({_TOKS_SQL})) AS BIGINT) AS nd
          FROM documents
        ),
        ranked AS (
          SELECT *, sum(nt) OVER (PARTITION BY source
                   ORDER BY nd DESC, doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
          FROM toks
        )
        SELECT source,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(CASE WHEN cum <= 20000 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_kept,
               CAST(sum(CASE WHEN cum <= 20000 THEN nt ELSE 0 END) AS BIGINT)
                 AS tokens_used,
               round(CAST(sum(CASE WHEN cum <= 20000 THEN nt ELSE 0 END)
                          AS DOUBLE) / 20000.0, 6) AS utilization,
               CAST(min(CASE WHEN cum <= 20000 THEN nd END) AS BIGINT)
                 AS cutoff_ndist
        FROM ranked GROUP BY source
    """,
    "b27_kmv_sketch": """
        WITH hashes AS (
          SELECT DISTINCT source,
                 CAST('0x' || substr(md5(text), 1, 15) AS BIGINT) AS h
          FROM documents
        ),
        topk AS (
          SELECT * FROM (
            SELECT source, h, row_number() OVER (
              PARTITION BY source ORDER BY h) AS rn
            FROM hashes
          ) WHERE rn <= 16
        ),
        per AS (
          SELECT source, CAST(count(*) AS BIGINT) AS n_exact
          FROM hashes GROUP BY source
        ),
        kth AS (SELECT source, h AS kth_min FROM topk WHERE rn = 16),
        allh AS (SELECT DISTINCT h FROM hashes),
        direct AS (
          SELECT max(h) AS kth_d, CAST(count(*) AS BIGINT) AS nn
          FROM (SELECT h FROM allh ORDER BY h LIMIT 16)
        ),
        merged AS (
          SELECT max(h) AS kth_m
          FROM (SELECT DISTINCT h FROM topk ORDER BY h LIMIT 16)
        ),
        gn AS (SELECT CAST(count(*) AS BIGINT) AS n_exact FROM allh)
        SELECT per.source, per.n_exact, kth.kth_min,
               CASE WHEN kth.kth_min IS NULL
                    THEN CAST(per.n_exact AS DOUBLE)
                    ELSE round(15.0 * 1152921504606846976.0
                               / CAST(kth.kth_min AS DOUBLE), 6) END
                 AS est_distinct,
               CAST(NULL AS BOOLEAN) AS merge_ok
        FROM per LEFT JOIN kth USING (source)
        UNION ALL
        SELECT '__ALL__', gn.n_exact, direct.kth_d,
               round(15.0 * 1152921504606846976.0
                     / CAST(direct.kth_d AS DOUBLE), 6),
               direct.kth_d = merged.kth_m
        FROM gn, direct, merged
    """,
    "b26_leakage_audit": """
        WITH per_user AS (
          SELECT event_type, user_id,
                 sum(CASE WHEN ts < TIMESTAMP '2024-01-16 00:00:00'
                          THEN 1 ELSE 0 END) AS tr,
                 sum(CASE WHEN ts >= TIMESTAMP '2024-01-16 00:00:00'
                          THEN 1 ELSE 0 END) AS te
          FROM events GROUP BY event_type, user_id
        )
        SELECT event_type,
               CAST(sum(tr) AS BIGINT) AS n_train,
               CAST(sum(te) AS BIGINT) AS n_test,
               CAST(sum(CASE WHEN tr > 0 AND te > 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS users_both,
               CAST(sum(CASE WHEN tr > 0 AND te = 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS users_train_only,
               CAST(sum(CASE WHEN tr = 0 AND te > 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS users_test_only,
               round(CAST(sum(CASE WHEN tr > 0 AND te > 0 THEN 1 ELSE 0 END)
                          AS DOUBLE) / count(*), 6) AS leakage_share
        FROM per_user GROUP BY event_type
    """,
    "b28_cluster_balanced": f"""
        WITH km AS ({_kmeans_oracle_sql()}),
        ranked AS (
          SELECT *, row_number() OVER (PARTITION BY cluster_id
                   ORDER BY CAST('0x' || substr(md5('cb:' ||
                     CAST(vec_id AS VARCHAR)), 1, 15) AS BIGINT),
                   vec_id) AS rn
          FROM km
        )
        SELECT cluster_id,
               CAST(count(*) AS BIGINT) AS n_members,
               CAST(sum(CASE WHEN rn <= 50 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_sampled,
               round(CAST(sum(CASE WHEN rn <= 50 THEN 1 ELSE 0 END)
                          AS DOUBLE) / count(*), 6) AS sampled_share,
               CAST(sum(CASE WHEN rn <= 50 THEN vec_id ELSE 0 END)
                    AS BIGINT) AS sum_sampled_ids
        FROM ranked GROUP BY cluster_id
    """,

        "b28_dsir_weights": f"""
            WITH toks AS (
              SELECT doc_id, lang, unnest({_TOKS_SQL}) AS tok FROM documents
            ),
            tk AS (SELECT doc_id, lang, tok FROM toks WHERE tok <> ''),
            dt AS (
              SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS m
              FROM tk GROUP BY doc_id, tok
            ),
            bg AS (SELECT tok, count(*) AS cb FROM tk GROUP BY tok),
            tg AS (
              SELECT tok, count(*) AS ct FROM tk WHERE lang = 'en'
              GROUP BY tok
            ),
            tot AS (
              SELECT count(*) AS nb,
                     sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS nt,
                     count(DISTINCT tok) AS v
              FROM tk
            ),
            terms AS (
              SELECT bg.tok,
                     CAST(floor(ln(
                       ((coalesce(tg.ct, 0) + 1)
                          / CAST(tot.nt + tot.v AS DOUBLE))
                       / ((bg.cb + 1) / CAST(tot.nb + tot.v AS DOUBLE))
                     ) * 1e8) AS BIGINT) AS t8
              FROM bg LEFT JOIN tg ON bg.tok = tg.tok CROSS JOIN tot
            )
            SELECT dt.doc_id,
                   CAST(sum(dt.m) AS BIGINT) AS n_tok,
                   CAST(sum(dt.m * terms.t8) AS BIGINT) AS w8,
                   round(sum(dt.m * terms.t8) / 1e8, 6) AS weight
            FROM dt JOIN terms USING (tok)
            GROUP BY dt.doc_id
            ORDER BY w8 DESC, doc_id ASC LIMIT 20
        """,

        "b26_k_anonymity": """
            WITH qi AS (
              SELECT c_nationkey, c_mktsegment,
                     CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS kb
              FROM customer
            ),
            groups AS (
              SELECT c_nationkey, c_mktsegment, kb,
                     CAST(count(*) AS BIGINT) AS k
              FROM qi GROUP BY 1, 2, 3
            ),
            tot AS (SELECT CAST(count(*) AS BIGINT) AS t FROM qi)
            SELECT CASE WHEN k = 1 THEN 'unique'
                        WHEN k < 5 THEN 'small'
                        ELSE 'anonymous' END AS risk_class,
                   CAST(count(*) AS BIGINT) AS n_groups,
                   CAST(sum(k) AS BIGINT) AS n_rows,
                   round(CAST(sum(k) AS DOUBLE) / min(tot.t), 6) AS row_share
            FROM groups CROSS JOIN tot
            GROUP BY 1
        """,
        "b27_theta_intersect": """
            WITH a AS (
              SELECT DISTINCT CAST('0x' || substr(md5(CAST(o_custkey AS
                     VARCHAR)), 1, 15) AS BIGINT) AS h
              FROM orders WHERE o_orderkey % 2 = 0
            ),
            b AS (
              SELECT DISTINCT CAST('0x' || substr(md5(CAST(o_custkey AS
                     VARCHAR)), 1, 15) AS BIGINT) AS h
              FROM orders WHERE o_orderkey % 2 = 1
            ),
            ka AS (SELECT h FROM a ORDER BY h LIMIT 64),
            kb AS (SELECT h FROM b ORDER BY h LIMIT 64),
            merged AS (
              SELECT DISTINCT h FROM (
                SELECT h FROM ka UNION ALL SELECT h FROM kb
              ) ORDER BY h LIMIT 64
            ),
            th AS (
              SELECT max(h) AS theta, count(*) AS ku FROM merged
            ),
            marked AS (
              SELECT m.h,
                     (m.h IN (SELECT h FROM ka)) AS in_a,
                     (m.h IN (SELECT h FROM kb)) AS in_b
              FROM merged m
            ),
            ex AS (
              SELECT CAST(count(*) AS BIGINT) AS exact_i FROM (
                SELECT DISTINCT o_custkey FROM orders
                WHERE o_orderkey % 2 = 0
                INTERSECT
                SELECT DISTINCT o_custkey FROM orders
                WHERE o_orderkey % 2 = 1
              )
            )
            SELECT CAST(th.ku AS BIGINT) AS k,
                   CAST(th.theta AS BIGINT) AS theta,
                   CAST(sum(CASE WHEN in_a AND in_b THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_both,
                   CASE WHEN th.ku < 64 THEN CAST(th.ku AS DOUBLE)
                        ELSE round((th.ku - 1) * 1152921504606846976.0
                                   / th.theta, 6)
                   END AS est_union,
                   round(CAST(sum(CASE WHEN in_a AND in_b THEN 1 ELSE 0 END)
                              AS DOUBLE) / th.ku
                         * CASE WHEN th.ku < 64 THEN CAST(th.ku AS DOUBLE)
                                ELSE round((th.ku - 1)
                                           * 1152921504606846976.0
                                           / th.theta, 6)
                           END, 6) AS est_intersect,
                   min(ex.exact_i) AS exact_intersect
            FROM marked CROSS JOIN th CROSS JOIN ex
            GROUP BY th.ku, th.theta
        """,

        "b26_capture_recapture": """
            WITH a AS (
              SELECT DISTINCT o_custkey FROM orders WHERE o_orderkey % 2 = 0
            ),
            b AS (
              SELECT DISTINCT o_custkey FROM orders WHERE o_orderkey % 2 = 1
            ),
            na AS (SELECT CAST(count(*) AS BIGINT) AS n_a FROM a),
            nb AS (SELECT CAST(count(*) AS BIGINT) AS n_b FROM b),
            nab AS (
              SELECT CAST(count(*) AS BIGINT) AS n_both FROM a
              WHERE o_custkey IN (SELECT o_custkey FROM b)
            ),
            nu AS (
              SELECT CAST(count(*) AS BIGINT) AS exact_union FROM (
                SELECT o_custkey FROM a UNION SELECT o_custkey FROM b
              )
            )
            SELECT n_a, n_b, n_both, exact_union,
                   CASE WHEN n_both > 0
                        THEN round(CAST(n_a AS DOUBLE) * n_b / n_both, 6)
                   END AS lincoln_petersen,
                   round(CAST(n_a + 1 AS DOUBLE) * (n_b + 1) / (n_both + 1)
                         - 1.0, 6) AS chapman
            FROM na, nb, nab, nu
        """,

        "b27_bloom_fpp": """
            WITH members AS (
              SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
            ),
            nonmembers AS (
              SELECT DISTINCT c_custkey FROM customer
              WHERE c_mktsegment <> 'BUILDING'
            ),
            dpos AS (
              SELECT unnest([((((CAST('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 1, 15) AS BIGINT)) % 2147483647) * 968614405 + 1355113225) % 2147483647) % 4096, ((((CAST('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 1, 15) AS BIGINT)) % 2147483647) * 952418058 + 1478279456) % 2147483647) % 4096, ((((CAST('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 1, 15) AS BIGINT)) % 2147483647) * 1716193455 + 2129089114) % 2147483647) % 4096, ((((CAST('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 1, 15) AS BIGINT)) % 2147483647) * 472834119 + 1178865607) % 2147483647) % 4096]) AS pos FROM members
            ),
            bitmap AS (
              SELECT CAST(floor(pos / 63) AS INTEGER) AS word,
                     bit_or(CAST(1 AS BIGINT) << CAST(pos % 63 AS INTEGER))
                       AS bits
              FROM dpos GROUP BY 1
            ),
            ppos AS (
              SELECT c_custkey, unnest([((((CAST('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 1, 15) AS BIGINT)) % 2147483647) * 968614405 + 1355113225) % 2147483647) % 4096, ((((CAST('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 1, 15) AS BIGINT)) % 2147483647) * 952418058 + 1478279456) % 2147483647) % 4096, ((((CAST('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 1, 15) AS BIGINT)) % 2147483647) * 1716193455 + 2129089114) % 2147483647) % 4096, ((((CAST('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 1, 15) AS BIGINT)) % 2147483647) * 472834119 + 1178865607) % 2147483647) % 4096]) AS pos FROM nonmembers
            ),
            pass AS (
              SELECT c_custkey FROM (
                SELECT c_custkey,
                       CAST(floor(pos / 63) AS INTEGER) AS word,
                       CAST(1 AS BIGINT) << CAST(pos % 63 AS INTEGER) AS bit
                FROM ppos
              ) p JOIN bitmap USING (word)
              WHERE (bits & bit) <> 0
              GROUP BY c_custkey HAVING count(*) = 4
            ),
            nm AS (
              SELECT CAST(count(DISTINCT c_custkey) AS BIGINT) AS n_keys
              FROM members
            ),
            np AS (
              SELECT CAST(count(*) AS BIGINT) AS n_probes FROM nonmembers
            ),
            nf AS (
              SELECT CAST(count(*) AS BIGINT) AS n_false_pos FROM pass
            ),
            bs AS (
              SELECT CAST(sum(bit_count(bits)) AS BIGINT) AS bits_set
              FROM bitmap
            )
            SELECT CAST(4096 AS INTEGER) AS m_bits,
                   CAST(4 AS INTEGER) AS k_hashes,
                   n_keys, n_probes, n_false_pos, bits_set,
                   round(CAST(n_false_pos AS DOUBLE) / n_probes, 6)
                     AS measured_fpp,
                   round(CAST(bits_set AS DOUBLE) / 4096.0, 6) AS load
            FROM nm, np, nf, bs
        """,
        "b26_neyman_allocation": """
            WITH sums AS (
              SELECT c_mktsegment,
                     CAST(count(*) AS DOUBLE) AS n,
                     CAST(sum(CAST(c_acctbal AS DECIMAL(28,4))) AS DOUBLE)
                       AS sx,
                     CAST(sum(CAST(c_acctbal AS DECIMAL(28,4))
                              * CAST(c_acctbal AS DECIMAL(28,4))) AS DOUBLE)
                       AS sxx
              FROM customer GROUP BY 1
            ),
            w AS (
              SELECT c_mktsegment, n,
                     n * sqrt((sxx - sx * sx / n) / n) AS wt
              FROM sums
            ),
            tot AS (SELECT sum(wt) AS tw FROM w)
            SELECT c_mktsegment,
                   CAST(n AS BIGINT) AS n_rows,
                   round(wt / n, 6) AS sigma,
                   round(wt / tw, 6) AS weight_share,
                   CAST(floor(wt / tw * 1000.0) AS BIGINT) AS alloc_1000
            FROM w CROSS JOIN tot
        """,

        "b28_ablation_grid": f"""
            WITH per AS (
              SELECT source,
                     CAST(sum(len({_TOKS_SQL})) AS BIGINT) AS n_tok
              FROM documents GROUP BY source
            ),
            tot AS (SELECT CAST(sum(n_tok) AS BIGINT) AS t FROM per)
            SELECT a.source AS ablated_source,
                   r.source AS remaining_source,
                   r.n_tok,
                   round(CAST(r.n_tok AS DOUBLE) / (tot.t - a.n_tok), 6)
                     AS rebalanced_share
            FROM per a CROSS JOIN per r CROSS JOIN tot
            WHERE a.source <> r.source
        """,

        "b26_raking": """
            WITH cells AS (
              SELECT lang, source, CAST(count(*) AS BIGINT) AS n
              FROM documents GROUP BY lang, source
            ),
            tot AS (
              SELECT CAST(sum(n) AS BIGINT) AS t,
                     CAST(count(DISTINCT lang) AS BIGINT) AS nl,
                     CAST(count(DISTINCT source) AS BIGINT) AS ns
              FROM cells
            ),
            w0 AS (
              SELECT lang, source, n, t, nl, ns,
                     CAST(1000000 AS BIGINT) AS w6
              FROM cells CROSS JOIN tot
            ),
            s1 AS (
              SELECT lang, CAST(sum(n * w6) AS BIGINT) AS s
              FROM w0 GROUP BY lang
            ),
            w1 AS (
              SELECT w.lang, w.source, w.n, w.t, w.nl, w.ns,
                     CAST(floor(w.w6 * (CAST(w.t AS DOUBLE) / w.nl * 1e6
                                        / s1.s)) AS BIGINT) AS w6
              FROM w0 w JOIN s1 USING (lang)
            ),
            s2 AS (
              SELECT source, CAST(sum(n * w6) AS BIGINT) AS s
              FROM w1 GROUP BY source
            ),
            w2 AS (
              SELECT w.lang, w.source, w.n, w.t, w.nl, w.ns,
                     CAST(floor(w.w6 * (CAST(w.t AS DOUBLE) / w.ns * 1e6
                                        / s2.s)) AS BIGINT) AS w6
              FROM w1 w JOIN s2 USING (source)
            ),
            s3 AS (
              SELECT lang, CAST(sum(n * w6) AS BIGINT) AS s
              FROM w2 GROUP BY lang
            ),
            w3 AS (
              SELECT w.lang, w.source, w.n, w.t, w.nl, w.ns,
                     CAST(floor(w.w6 * (CAST(w.t AS DOUBLE) / w.nl * 1e6
                                        / s3.s)) AS BIGINT) AS w6
              FROM w2 w JOIN s3 USING (lang)
            )
            SELECT lang, source, n, w6,
                   round(w6 / 1e6, 6) AS weight
            FROM w3
        """,

        "b26_global_shuffle": """
            WITH pos AS (
              SELECT doc_id, source,
                     row_number() OVER (
                       ORDER BY (CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT)) ASC, doc_id ASC) - 1 AS p
              FROM documents
            ),
            tot AS (SELECT count(*) AS n FROM pos),
            dec AS (
              SELECT source, (p * 10) // n AS decile, n
              FROM pos CROSS JOIN tot
            ),
            per_src AS (
              SELECT source, CAST(count(*) AS BIGINT) AS ns
              FROM dec GROUP BY source
            )
            SELECT d.source,
                   CAST(d.decile AS BIGINT) AS decile,
                   CAST(count(*) AS BIGINT) AS n,
                   CAST(abs(10 * count(*) - min(s.ns)) AS BIGINT) AS dev_x10,
                   round(CAST(count(*) AS DOUBLE) * 10 / min(d.n), 6)
                     AS decile_share_x10
            FROM dec d JOIN per_src s ON s.source = d.source
            GROUP BY d.source, d.decile
        """,

        "b28_pareto_frontier": """
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

        "b26_pps_systematic": """
            WITH cum AS (
              SELECT doc_id,
                     CAST(n_chars AS BIGINT) AS weight,
                     CAST(COALESCE(sum(n_chars) OVER (
                       ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING
                       AND 1 PRECEDING), 0) AS BIGINT) AS cum_before
              FROM documents
            ),
            params AS (
              SELECT CAST(sum(n_chars) AS BIGINT) AS w_total,
                     CAST(sum(n_chars) AS BIGINT) // 500 AS stride,
                     (CAST(sum(n_chars) AS BIGINT) // 500) // 2 AS r
              FROM documents
            )
            SELECT doc_id, weight, cum_before,
                   CAST(greatest(0, least(
                     (cum_before + weight - r + stride - 1) // stride,
                     500)
                     - ((cum_before - r + stride - 1) // stride))
                     AS BIGINT) AS n_hits
            FROM cum CROSS JOIN params
            WHERE greatest(0, least(
                    (cum_before + weight - r + stride - 1) // stride, 500)
                  - ((cum_before - r + stride - 1) // stride)) >= 1
        """,
}
