"""DuckDB oracle SQL — dedup family (split from
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
        "b18_dup_groups": f"""
            WITH {_DOCS_DUPS_SQL}
            SELECT md5(text) AS text_fp, count(*) AS n_copies,
                   min(doc_id) AS keeper_id
            FROM docs GROUP BY text HAVING count(*) > 1
        """,
        "b18_dedup_exact": f"""
            WITH {_DOCS_DUPS_SQL},
            ranked AS (
              SELECT *, row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn
              FROM docs
            )
            SELECT doc_id, lang, source, n_chars FROM ranked WHERE rn = 1
        """,
        "b19_word_jaccard": f"""
            WITH t AS (
              SELECT doc_id, list_distinct({_TOKS_SQL}) AS toks FROM documents
            )
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   round(CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
                         / CAST(len(a.toks) + len(b.toks)
                                - len(list_intersect(a.toks, b.toks)) AS DOUBLE),
                         6) AS jaccard
            FROM t a JOIN t b ON a.doc_id + 1 = b.doc_id
        """,
        "b19_minhash_candidates": _minhash_oracle_sql(),
        "b19_lsh_quality": f"""
            WITH {_minhash_cand_ctes()},
            truth AS (
              SELECT doc_id AS id_a, doc_id + 200000 AS id_b
              FROM documents WHERE doc_id % 7 = 0
            ),
            s AS (
              SELECT (SELECT CAST(count(*) AS BIGINT) FROM corpus) AS n_records,
                     (SELECT CAST(count(*) AS BIGINT) FROM cand) AS n_candidates,
                     (SELECT CAST(count(*) AS BIGINT) FROM truth) AS n_true,
                     (SELECT CAST(count(*) AS BIGINT) FROM truth t
                      WHERE EXISTS (SELECT 1 FROM cand c
                                    WHERE c.id_a = t.id_a AND c.id_b = t.id_b))
                       AS n_true_found
            )
            SELECT n_records, n_candidates, n_true, n_true_found,
                   round(1.0 - n_candidates
                         / (n_records * (n_records - 1) / 2.0), 6)
                     AS reduction_ratio,
                   round(n_true_found / CAST(n_true AS DOUBLE), 6)
                     AS pairs_completeness
            FROM s
        """,
        "b19_simhash": _simhash_oracle_sql(),
        "b19_incremental_index": _incremental_index_oracle_sql(),
        "b19_embedding_clusters": """
            WITH RECURSIVE pairs AS (
              SELECT a.vec_id AS id_a, b.vec_id AS id_b
              FROM embeddings a, embeddings b
              WHERE a.vec_id < b.vec_id
                AND list_dot_product(CAST(a.embedding AS DOUBLE[]),
                                     CAST(b.embedding AS DOUBLE[]))
                    / (sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]),
                                             CAST(a.embedding AS DOUBLE[])))
                       * sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]),
                                               CAST(b.embedding AS DOUBLE[]))))
                    >= 0.4
            ),
            edges AS (
              SELECT id_a AS src, id_b AS dst FROM pairs
              UNION
              SELECT id_b AS src, id_a AS dst FROM pairs
            ),
            reach AS (
              SELECT DISTINCT src AS v, src AS r FROM edges
              UNION
              SELECT e.dst AS v, reach.r AS r
              FROM reach JOIN edges e ON e.src = reach.v
            ),
            lab AS (SELECT v AS vec_id, min(r) AS cluster_id FROM reach GROUP BY v)
            SELECT vec_id, cluster_id,
                   CAST(count(*) OVER (PARTITION BY cluster_id) AS BIGINT)
                     AS cluster_size
            FROM lab
        """,
        "b19_embedding_dups": """
            SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                   round(list_dot_product(CAST(a.embedding AS DOUBLE[]),
                                          CAST(b.embedding AS DOUBLE[]))
                         / (sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]),
                                                  CAST(a.embedding AS DOUBLE[])))
                            * sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]),
                                                    CAST(b.embedding AS DOUBLE[])))),
                         6) AS score
            FROM embeddings a, embeddings b
            WHERE a.vec_id < b.vec_id
              AND list_dot_product(CAST(a.embedding AS DOUBLE[]),
                                   CAST(b.embedding AS DOUBLE[]))
                  / (sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]),
                                           CAST(a.embedding AS DOUBLE[])))
                     * sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]),
                                             CAST(b.embedding AS DOUBLE[]))))
                  >= 0.4
        """,
        "b19_dup_clusters": _dup_clusters_oracle_sql(),
        "b19_cluster_stability": _cluster_stability_oracle_sql(),
        "b19_incremental_clusters": _incremental_clusters_oracle_sql(),
        "b19_cluster_stats": f"""
            SELECT cluster_size,
                   CAST(count(DISTINCT cluster_id) AS BIGINT) AS n_clusters,
                   CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(count(*) - count(DISTINCT cluster_id) AS BIGINT)
                     AS n_removable
            FROM ({_dup_clusters_oracle_sql()}) labels
            GROUP BY cluster_size
        """,
        "b19_source_novelty": f"""
            WITH tk AS (
              SELECT source, string_split({_NORM_SQL}, ' ') AS toks
              FROM documents
            ),
            fps AS (
              SELECT DISTINCT source,
                     md5(array_to_string(
                       list_slice(toks, i*8 + 1, i*8 + 16), ' ')) AS fp
              FROM tk,
                   unnest(generate_series(0,
                     greatest((len(toks) - 16) // 8, 0))) AS t(i)
            ),
            spread AS (
              SELECT fp, count(DISTINCT source) AS n_src FROM fps GROUP BY fp
            )
            SELECT f.source,
                   CAST(count(*) AS BIGINT) AS n_fps,
                   CAST(sum(CASE WHEN s.n_src = 1 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_unique,
                   round(sum(CASE WHEN s.n_src = 1 THEN 1.0 ELSE 0.0 END)
                         / CAST(count(*) AS DOUBLE), 6) AS novelty
            FROM fps f JOIN spread s ON f.fp = s.fp
            GROUP BY f.source
        """,
        "b19_source_overlap": f"""
            WITH tk AS (
              SELECT source, string_split({_NORM_SQL}, ' ') AS toks
              FROM documents
            ),
            fps AS (
              SELECT DISTINCT source,
                     md5(array_to_string(
                       list_slice(toks, i*8 + 1, i*8 + 16), ' ')) AS fp
              FROM tk,
                   unnest(generate_series(0,
                     greatest((len(toks) - 16) // 8, 0))) AS t(i)
            ),
            sizes AS (
              SELECT source, CAST(count(*) AS BIGINT) AS n FROM fps
              GROUP BY source
            ),
            common AS (
              SELECT a.source AS source_a, b.source AS source_b,
                     CAST(count(*) AS BIGINT) AS n_common
              FROM fps a JOIN fps b ON a.fp = b.fp AND a.source < b.source
              GROUP BY a.source, b.source
            )
            SELECT c.source_a, c.source_b, c.n_common,
                   round(CAST(c.n_common AS DOUBLE)
                         / CAST(sa.n + sb.n - c.n_common AS DOUBLE), 6)
                     AS jaccard
            FROM common c
            JOIN sizes sa ON c.source_a = sa.source
            JOIN sizes sb ON c.source_b = sb.source
        """,
        "b19_pair_dataset": f"""
            WITH RECURSIVE pairs AS ({_minhash_oracle_sql()}),
            pos AS (
              SELECT id_a, id_b, CAST(1 AS BIGINT) AS label FROM pairs
            ),
            pri AS (
              SELECT doc_id,
                     {sampling.bucket_sql('doc_id', 64)} AS b,
                     {sampling.bucket_sql('doc_id', 1 << 32)} AS p
              FROM documents
            ),
            ranked AS (
              SELECT *, row_number() OVER (
                PARTITION BY b ORDER BY p ASC, doc_id ASC) AS r
              FROM pri
            ),
            shifted AS (
              SELECT DISTINCT least(l.doc_id, rr.doc_id) AS id_a,
                     greatest(l.doc_id, rr.doc_id) AS id_b
              FROM ranked l JOIN ranked rr
                ON ((l.b + 37) % 64) = rr.b AND l.r = rr.r
              WHERE l.doc_id <> rr.doc_id
            ),
            neg AS (
              SELECT s.id_a, s.id_b, CAST(0 AS BIGINT) AS label
              FROM shifted s
              ANTI JOIN pos p ON s.id_a = p.id_a AND s.id_b = p.id_b
            )
            SELECT * FROM pos UNION ALL SELECT * FROM neg
        """,
        "b19_prefix_filter": _prefix_filter_oracle_sql(),
        "b18_cdc_chunks": _cdc_chunks_oracle_sql(),
        "b19_golden_records": f"""
            WITH labels AS ({_dup_clusters_oracle_sql()}),
            corpus AS ({_B19_CORPUS_SQL}),
            j AS (
              SELECT c.doc_id, c.text, CAST(length(c.text) AS BIGINT) AS n_len,
                     l.cluster_id
              FROM corpus c JOIN labels l USING (doc_id)
            )
            SELECT cluster_id,
                   CAST(count(*) AS BIGINT) AS n_members,
                   max_by(text, CAST(length(text) AS BIGINT) * 4294967296
                                + (4294967295 - doc_id)) AS best_text,
                   min(doc_id) AS min_id,
                   max(n_len) AS max_len,
                   max(CASE WHEN doc_id = cluster_id THEN text END)
                     AS keeper_text
            FROM j GROUP BY cluster_id
        """,
        "b19_sorted_neighborhood": """
            WITH corpus AS (
              SELECT p_partkey, p_name FROM part
              UNION ALL
              SELECT p_partkey + 1000000 AS p_partkey,
                     substr(p_name, 1, 4) || 'x' || substr(p_name, 6) AS p_name
              FROM part WHERE p_partkey % 9 = 0
            ),
            b AS (
              SELECT p_partkey AS id, p_name AS k,
                     substr(p_name, 1, 2) AS blk
              FROM corpus
            ),
            leads AS (
              SELECT id, k,
                     lead(id, 1) OVER w AS nid1, lead(k, 1) OVER w AS nk1,
                     lead(id, 2) OVER w AS nid2, lead(k, 2) OVER w AS nk2,
                     lead(id, 3) OVER w AS nid3, lead(k, 3) OVER w AS nk3,
                     lead(id, 4) OVER w AS nid4, lead(k, 4) OVER w AS nk4
              FROM b WINDOW w AS (PARTITION BY blk ORDER BY k, id)
            ),
            cand AS (
              SELECT least(id, nid) AS id_a, greatest(id, nid) AS id_b,
                     k AS ka, nk AS kb
              FROM (
                SELECT id, k,
                       unnest([nid1, nid2, nid3, nid4]) AS nid,
                       unnest([nk1, nk2, nk3, nk4]) AS nk
                FROM leads
              ) WHERE nid IS NOT NULL
            )
            SELECT id_a, id_b, CAST(levenshtein(ka, kb) AS BIGINT) AS dist
            FROM cand WHERE levenshtein(ka, kb) <= 1
        """,
        "b19_blocking_quality": """
            WITH corpus AS (
              SELECT p_partkey, p_name FROM part
              UNION ALL
              SELECT p_partkey + 1000000 AS p_partkey,
                     substr(p_name, 1, 4) || 'x' || substr(p_name, 6) AS p_name
              FROM part WHERE p_partkey % 9 = 0
            ),
            b AS (
              SELECT p_partkey AS id, p_name AS k,
                     substr(p_name, 1, 2) AS blk
              FROM corpus
            ),
            leads AS (
              SELECT id,
                     lead(id, 1) OVER w AS nid1,
                     lead(id, 2) OVER w AS nid2,
                     lead(id, 3) OVER w AS nid3,
                     lead(id, 4) OVER w AS nid4
              FROM b WINDOW w AS (PARTITION BY blk ORDER BY k, id)
            ),
            cand AS (
              SELECT least(id, nid) AS id_a, greatest(id, nid) AS id_b
              FROM (
                SELECT id, unnest([nid1, nid2, nid3, nid4]) AS nid
                FROM leads
              ) WHERE nid IS NOT NULL
            ),
            truth AS (
              SELECT p_partkey AS id_a, p_partkey + 1000000 AS id_b
              FROM part WHERE p_partkey % 9 = 0
            ),
            s AS (
              SELECT (SELECT CAST(count(*) AS BIGINT) FROM corpus) AS n_records,
                     (SELECT CAST(count(*) AS BIGINT) FROM cand) AS n_candidates,
                     (SELECT CAST(count(*) AS BIGINT) FROM truth) AS n_true,
                     (SELECT CAST(count(*) AS BIGINT) FROM truth t
                      WHERE EXISTS (SELECT 1 FROM cand c
                                    WHERE c.id_a = t.id_a AND c.id_b = t.id_b))
                       AS n_true_found
            )
            SELECT n_records, n_candidates, n_true, n_true_found,
                   round(1.0 - n_candidates
                         / (n_records * (n_records - 1) / 2.0), 6)
                     AS reduction_ratio,
                   round(n_true_found / CAST(n_true AS DOUBLE), 6)
                     AS pairs_completeness
            FROM s
        """,
        "b19_fuzzy_join": """
            WITH corpus AS (
              SELECT p_partkey, p_name FROM part
              UNION ALL
              SELECT p_partkey + 1000000 AS p_partkey,
                     'x' || substr(p_name, 2) AS p_name
              FROM part WHERE p_partkey % 9 = 0
            )
            SELECT a.p_partkey AS id_a, b.p_partkey AS id_b,
                   CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist
            FROM corpus a JOIN corpus b ON a.p_partkey < b.p_partkey
            WHERE levenshtein(a.p_name, b.p_name) <= 1
        """,
        "b19_prefix_dups": """
            WITH corpus AS (
              SELECT doc_id, text FROM documents
              UNION ALL
              SELECT doc_id + 400000,
                     substr(text, 1, (length(text) * 3) // 5)
              FROM documents
              WHERE doc_id % 9 = 3 AND length(text) >= 120
            ),
            keyed AS (
              SELECT doc_id, text, length(text) AS len,
                     substr(text, 1, 24) AS k
              FROM corpus
            )
            SELECT a.doc_id AS short_id, b.doc_id AS long_id,
                   CAST(a.len AS INT) AS short_len,
                   CAST(b.len AS INT) AS long_len
            FROM keyed a JOIN keyed b ON a.k = b.k
            WHERE a.len < b.len
              AND substr(b.text, 1, a.len) = a.text
        """,
        "b18_chunk_dedup": """
            WITH corpus AS (
              SELECT doc_id, source, text FROM documents
              UNION ALL
              SELECT doc_id + 500000, source, text FROM documents
              WHERE doc_id % 11 = 7
            ),
            chunks AS (
              SELECT source,
                     md5(substr(text, i * 64 + 1, 64)) AS h,
                     CAST(length(substr(text, i * 64 + 1, 64)) AS BIGINT)
                       AS blen
              FROM corpus,
                   unnest(generate_series(0, (length(text) - 1) // 64))
                     AS t(i)
            ),
            per_chunk AS (
              SELECT source, h, CAST(count(*) AS BIGINT) AS n,
                     max(blen) AS blen
              FROM chunks GROUP BY source, h
            )
            SELECT source,
                   CAST(sum(n) AS BIGINT) AS n_blocks,
                   CAST(count(*) AS BIGINT) AS n_unique_blocks,
                   CAST(sum(n * blen) AS BIGINT) AS bytes_total,
                   CAST(sum(blen) AS BIGINT) AS bytes_unique,
                   CAST((sum(blen) * 1000000) // sum(n * blen) AS BIGINT)
                     AS unique_share_micros
            FROM per_chunk GROUP BY source
        """,
        # ---- round 9 wave 11 --------------------------------------------
    "b19_span_dups": f"""
        WITH tk AS (
          SELECT doc_id, string_split({_NORM_SQL}, ' ') AS toks
          FROM documents
        ),
        fps AS (
          SELECT doc_id,
                 md5(array_to_string(list_slice(toks, i*8 + 1, i*8 + 16),
                     ' ')) AS fp
          FROM tk,
               unnest(generate_series(0,
                 greatest((len(toks) - 16) // 8, 0))) AS t(i)
        ),
        shared AS (
          SELECT fp, count(DISTINCT doc_id) AS nd FROM fps GROUP BY fp
        ),
        per_doc AS (
          SELECT doc_id,
                 CAST(count(*) AS BIGINT) AS w,
                 CAST(sum(CASE WHEN nd >= 2 THEN 1 ELSE 0 END) AS BIGINT)
                   AS dd
          FROM fps JOIN shared USING (fp) GROUP BY doc_id
        )
        SELECT d.source,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(pd.w) AS BIGINT) AS total_windows,
               CAST(sum(pd.dd) AS BIGINT) AS dup_windows,
               round(CAST(sum(pd.dd) AS DOUBLE)
                     / CAST(sum(pd.w) AS DOUBLE), 6) AS dup_share,
               CAST(sum(CASE WHEN pd.dd * 2 >= pd.w THEN 1 ELSE 0 END)
                    AS BIGINT) AS heavy_dup_docs
        FROM per_doc pd JOIN documents d USING (doc_id)
        GROUP BY d.source
    """,
    "b19_threshold_curve": f"""
        WITH RECURSIVE pf AS ({_prefix_filter_oracle_sql(0.5)}),
        grid AS (SELECT unnest([0.5, 0.6, 0.7, 0.8, 0.9]) AS threshold),
        qual AS (
          SELECT g.threshold, pf.id_a, pf.id_b
          FROM pf, grid g WHERE pf.jaccard >= g.threshold
        ),
        dh AS (
          SELECT threshold, CAST(count(DISTINCT d) AS BIGINT) AS n_docs
          FROM (
            SELECT threshold, id_a AS d FROM qual
            UNION ALL
            SELECT threshold, id_b FROM qual
          ) GROUP BY threshold
        )
        SELECT q.threshold, CAST(count(*) AS BIGINT) AS n_pairs, dh.n_docs
        FROM qual q JOIN dh ON dh.threshold = q.threshold
        GROUP BY q.threshold, dh.n_docs
    """,
    "b19_winnow_pairs": f"""
        WITH corpus AS ({_B19_CORPUS_SQL}),
        tk AS (SELECT doc_id, {_TOKS_SQL} AS toks FROM corpus),
        gr AS (
          SELECT doc_id, i AS pos,
                 CAST('0x' || substr(md5(array_to_string(
                   list_slice(toks, i + 1, i + 3), ' ')), 1, 15) AS BIGINT)
                   AS h
          FROM tk,
               unnest(generate_series(0, greatest(len(toks) - 3, 0))) AS t(i)
          WHERE i <= len(toks) - 3 OR i = 0
        ),
        st AS (
          SELECT * FROM (
            SELECT doc_id, pos AS s,
                   min(h) OVER (PARTITION BY doc_id ORDER BY pos
                     ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS wm,
                   row_number() OVER (PARTITION BY doc_id ORDER BY pos)
                     AS rn,
                   count(*) OVER (PARTITION BY doc_id) AS ng
            FROM gr
          ) WHERE rn <= ng - 3 OR rn = 1
        ),
        fps AS (
          SELECT DISTINCT doc_id, fp FROM (
            SELECT st.doc_id, st.s, min(st.wm) AS fp
            FROM st
            JOIN gr g ON g.doc_id = st.doc_id
                     AND g.pos BETWEEN st.s AND st.s + 3
                     AND g.h = st.wm
            GROUP BY st.doc_id, st.s
          )
        ),
        -- hot-fingerprint cap (max_df=64), replaying the Spark side's
        -- winnow_pair_screen boilerplate suppression
        capped AS (
          SELECT doc_id, fp FROM (
            SELECT doc_id, fp, count(*) OVER (PARTITION BY fp) AS df
            FROM fps
          ) WHERE df <= 64
        )
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               CAST(count(*) AS BIGINT) AS shared_fps
        FROM capped a JOIN capped b ON a.fp = b.fp AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
        HAVING count(*) >= 2
    """,

    "b19_lsh_operating_point": f"""
        WITH RECURSIVE pf AS ({_prefix_filter_oracle_sql(0.5)}),
        mh AS (
          SELECT id_a, id_b FROM (
            WITH {_minhash_cand_ctes()}
            SELECT id_a, id_b FROM cand
          )
        ),
        flagged AS (
          SELECT CAST(least(floor(pf.jaccard * 10), 9) AS INT) AS bucket,
                 (mh.id_a IS NOT NULL) AS caught
          FROM pf LEFT JOIN mh USING (id_a, id_b)
        ),
        agg AS (
          SELECT bucket, CAST(count(*) AS BIGINT) AS n_pairs,
                 CAST(sum(CASE WHEN caught THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_caught
          FROM flagged GROUP BY bucket
        ),
        curve AS (
          SELECT bucket, n_pairs, n_caught,
                 (CAST(bucket AS DOUBLE) + 0.5) / 10.0 AS m
          FROM agg
        ),
        c2 AS (SELECT *, m * m AS m2 FROM curve),
        c4 AS (SELECT *, m2 * m2 AS m4 FROM c2),
        cx AS (SELECT *, 1.0 - m4 AS x FROM c4),
        cx2 AS (SELECT *, x * x AS x2 FROM cx),
        cx4 AS (SELECT *, x2 * x2 AS x4 FROM cx2),
        cx8 AS (SELECT *, x4 * x4 AS x8 FROM cx4)
        SELECT bucket, round(bucket / 10.0, 1) AS j_lo, n_pairs, n_caught,
               round(CAST(n_caught AS DOUBLE) / n_pairs, 6) AS caught_rate,
               round(1.0 - x8, 6) AS analytic_rate
        FROM cx8
    """,

    "b18_shingle_fingerprint_dups": f"""
        -- exact shingle-SET identity: md5 of the numerically-sorted
        -- distinct word-5-gram hashes; groups with >= 2 docs are the
        -- deterministic duplicate population
        WITH {_DOCS_DUPS_SQL},
        tk AS (
          SELECT doc_id, string_split({_NORM_SQL}, ' ') AS toks
          FROM docs
        ),
        sh AS (
          SELECT DISTINCT doc_id,
                 toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
                         || ' ' || toks[i+3] || ' ' || toks[i+4] AS sh
          FROM tk, unnest(generate_series(1, len(toks) - 4)) AS t(i)
        ),
        hs AS (
          SELECT DISTINCT doc_id,
                 CAST('0x' || substr(md5(sh), 1, 15) AS BIGINT) AS h
          FROM sh
        ),
        fp AS (
          SELECT doc_id,
                 md5(string_agg(CAST(h AS VARCHAR), ',' ORDER BY h))
                   AS fp,
                 CAST(count(*) AS BIGINT) AS n_shingles
          FROM hs GROUP BY doc_id
        )
        SELECT fp, CAST(count(*) AS BIGINT) AS n_docs,
               CAST(min(doc_id) AS BIGINT) AS canonical_doc_id,
               CAST(max(n_shingles) AS BIGINT) AS n_shingles
        FROM fp GROUP BY fp HAVING count(*) >= 2
    """,
}
