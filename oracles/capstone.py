"""DuckDB oracle SQL — capstone family (split from
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
        "b24_corpus_v5": f"""
            WITH keyed AS (
              SELECT doc_id, lang,
                     CAST(len({_TOKS_SQL}) AS BIGINT) AS n_tok,
                     {_NORM_SQL} AS k
              FROM documents
            ),
            keeper AS (
              SELECT k, min(doc_id) AS doc_id FROM keyed GROUP BY k
            ),
            kept AS (
              SELECT keyed.doc_id, lang, n_tok,
                     {sampling.bucket_sql('keyed.doc_id', 1 << 32)} AS p
              FROM keyed JOIN keeper
                ON keeper.k = keyed.k AND keeper.doc_id = keyed.doc_id
            ),
            quota AS (
              SELECT doc_id, lang, n_tok FROM (
                SELECT *, row_number() OVER (
                  PARTITION BY lang ORDER BY p ASC, doc_id ASC) AS r
                FROM kept
              ) WHERE r <= 60
            ),
            packed AS (
              SELECT lang, n_tok,
                     CAST(floor(
                       CAST(COALESCE(sum(n_tok) OVER (ORDER BY doc_id
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND 1 PRECEDING), 0) AS DOUBLE) / 1024)
                       AS BIGINT) AS pack_id
              FROM quota
            )
            SELECT lang,
                   CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(n_tok) AS BIGINT) AS sum_tok,
                   CAST(count(DISTINCT pack_id) AS BIGINT) AS n_packs
            FROM packed GROUP BY lang
        """,
        "b24_effective_tokens": f"""
            WITH keyed AS (
              SELECT doc_id, source,
                     CAST(len({_TOKS_SQL}) AS BIGINT) AS nt,
                     {_NORM_SQL} AS k
              FROM documents
            ),
            sizes AS (SELECT k, count(*) AS g FROM keyed GROUP BY k),
            per AS (
              SELECT source, nt, (nt * 1000000) // g AS eff6
              FROM keyed JOIN sizes USING (k)
            )
            SELECT source,
                   CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(nt) AS BIGINT) AS raw_tokens,
                   round(sum(eff6) / 1e6, 6) AS effective_tokens,
                   round(sum(nt) / (sum(eff6) / 1e6), 6) AS inflation
            FROM per GROUP BY source
        """,
        "b24_corpus_v2": _corpus_v2_oracle_sql(),
        "b24_incremental_card": f"""
            WITH eff AS (
              SELECT source, lang, text FROM documents
              WHERE doc_id % 7 <> 0 AND doc_id % 11 <> 0
              UNION ALL
              SELECT source, lang, text || ' zzz' AS text FROM documents
              WHERE doc_id % 7 = 0
            )
            SELECT source, lang,
                   CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(len({_TOKS_SQL})) AS BIGINT) AS sum_tok
            FROM eff GROUP BY source, lang
        """,
        "b24_corpus_v3": f"""
            WITH base AS (
              SELECT doc_id, lang,
                     {_sw_hits_sql('en')} AS s_en,
                     CAST(length(text) AS BIGINT) AS q_chars,
                     CAST(len({_TOKS_SQL}) AS BIGINT) AS q_tokens,
                     CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g'))
                          AS BIGINT) AS alpha
              FROM documents
            ),
            feat AS (
              SELECT doc_id, lang, q_tokens,
                round(CAST(alpha AS DOUBLE)
                      / CAST(greatest(q_chars, 1) AS DOUBLE), 6)
                  AS q_alpha_ratio,
                round(CAST(s_en AS DOUBLE)
                      / CAST(greatest(q_tokens, 1) AS DOUBLE), 6)
                  AS q_stopword_ratio
              FROM base
            ),
            scored AS (
              SELECT doc_id, lang, q_tokens,
                     round(least(CAST(q_tokens AS DOUBLE) / 50.0, 1.0) * 0.4
                           + q_alpha_ratio * 0.4
                           + least(q_stopword_ratio * 5.0, 1.0) * 0.2, 6)
                       AS quality_score
              FROM feat
            ),
            toksx AS (
              SELECT doc_id, unnest(string_split({_NORM_SQL}, ' ')) AS tok
              FROM documents
            ),
            nzx AS (SELECT doc_id, tok FROM toksx WHERE tok <> ''),
            modelx AS (SELECT tok, count(*) AS cnt FROM nzx GROUP BY tok),
            scalx AS (
              SELECT CAST(sum(cnt) AS DOUBLE) AS t_total,
                     CAST(count(*) AS DOUBLE) AS v_size
              FROM modelx
            ),
            pdtx AS (
              SELECT doc_id, tok, CAST(count(*) AS DOUBLE) AS c FROM nzx
              GROUP BY doc_id, tok
            ),
            xent AS (
              SELECT a.doc_id,
                     round(ln(s.t_total + 1.0 * s.v_size)
                           - a.num / CAST(a.n_tok AS DOUBLE), 6) AS xent
              FROM (
                SELECT pdtx.doc_id,
                       CAST(sum(pdtx.c) AS BIGINT) AS n_tok,
                       sum(pdtx.c * ln(m.cnt + 1.0)) AS num
                FROM pdtx JOIN modelx m USING (tok) GROUP BY pdtx.doc_id
              ) a CROSS JOIN scalx s
            ),
            j AS (
              SELECT sc.doc_id, sc.lang, sc.q_tokens, sc.quality_score,
                     x.xent
              FROM scored sc JOIN xent x ON sc.doc_id = x.doc_id
            ),
            g1 AS (
              SELECT * FROM (
                SELECT *,
                       round(percent_rank() OVER w, 6) AS pctile,
                       row_number() OVER w AS rn,
                       count(*) OVER (PARTITION BY lang) AS n
                FROM j
                WINDOW w AS (PARTITION BY lang
                             ORDER BY quality_score ASC, doc_id ASC)
              ) WHERE rn > floor(n * 0.25)
            ),
            g2 AS (
              SELECT * FROM (
                SELECT *, round(percent_rank() OVER (
                  PARTITION BY lang ORDER BY xent ASC, doc_id ASC), 6)
                  AS xpr
                FROM g1
              ) WHERE xpr <= 0.9
            ),
            totals AS (
              SELECT lang, sum(q_tokens) AS total FROM g2 GROUP BY lang
            ),
            z AS (
              SELECT sum(sqrt(CAST(total AS DOUBLE))) AS z FROM totals
            ),
            rates AS (
              SELECT lang,
                     least(100, CAST(floor(
                       sqrt(CAST(total AS DOUBLE)) / z.z
                       * 20000.0 * 100.0 / CAST(total AS DOUBLE)
                       + 1e-9) AS BIGINT)) AS keep_b
              FROM totals CROSS JOIN z
            ),
            mixed AS (
              SELECT g.doc_id, g.q_tokens AS n_tok, g.quality_score
              FROM g2 g JOIN rates r ON g.lang = r.lang
              WHERE {sampling.bucket_sql('g.doc_id')} < r.keep_b
            ),
            staged AS (
              SELECT doc_id, n_tok,
                     least(CAST(floor(quality_score * 10) AS BIGINT), 9)
                       AS phase
              FROM mixed
            ),
            keyed AS (
              SELECT *, phase * 10000000 + doc_id AS okey FROM staged
            ),
            cum AS (
              SELECT *, COALESCE(sum(n_tok) OVER (
                ORDER BY okey
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS c
              FROM keyed
            ),
            packed AS (
              SELECT *, CAST(floor(c / 2000.0) AS BIGINT) AS pack_id
              FROM cum
            )
            SELECT phase, CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(n_tok) AS BIGINT) AS sum_tok,
                   CAST(count(DISTINCT pack_id) AS BIGINT) AS n_packs
            FROM packed GROUP BY phase
        """,
        "b24_corpus_build": f"""
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
            )
            SELECT lang, count(*) AS n_docs,
                   CAST(sum(q_tokens) AS BIGINT) AS total_tokens,
                   round(CAST(sum(CAST(quality_score AS DECIMAL(18,6))) AS DOUBLE)
                         / CAST(count(*) AS DOUBLE), 6) AS avg_quality
            FROM deduped GROUP BY lang
        """,
        "b24_corpus_v4": f"""
            WITH RECURSIVE pf AS ({_prefix_filter_oracle_sql()}),
            edges AS (
              SELECT id_a AS src, id_b AS dst FROM pf
              UNION
              SELECT id_b AS src, id_a AS dst FROM pf
            ),
            reach AS (
              SELECT DISTINCT src AS v, src AS r FROM edges
              UNION
              SELECT e.dst AS v, reach.r AS r
              FROM reach JOIN edges e ON e.src = reach.v
            ),
            lab AS (SELECT v AS doc_id, min(r) AS cluster_id
                    FROM reach GROUP BY v),
            corpus AS ({_B19_CORPUS_SQL}),
            golden AS (
              SELECT lab.cluster_id AS doc_id,
                     max_by(c.text, CAST(length(c.text) AS BIGINT)
                            * 4294967296 + (4294967295 - c.doc_id)) AS text
              FROM corpus c JOIN lab ON lab.doc_id = c.doc_id
              GROUP BY lab.cluster_id
            ),
            singles AS (
              SELECT doc_id, text FROM corpus
              WHERE doc_id NOT IN (SELECT doc_id FROM lab)
            ),
            kept AS (SELECT * FROM golden UNION ALL SELECT * FROM singles),
            gated AS (
              SELECT doc_id,
                     len(string_split({_NORM_SQL}, ' ')) AS nt
              FROM kept
            )
            SELECT
              (SELECT CAST(count(*) AS BIGINT) FROM corpus) AS n_input,
              (SELECT CAST(count(*) AS BIGINT) FROM pf) AS n_pairs,
              (SELECT CAST(count(DISTINCT cluster_id) AS BIGINT) FROM lab)
                AS n_clusters,
              (SELECT CAST(count(*) AS BIGINT) FROM kept) AS n_kept,
              (SELECT CAST(count(*) AS BIGINT) FROM gated WHERE nt >= 10)
                AS n_final,
              (SELECT CAST(sum(nt) AS BIGINT) FROM gated WHERE nt >= 10)
                AS total_tokens
        """,
        "b24_dedup_manifest": f"""
            WITH RECURSIVE pf AS ({_prefix_filter_oracle_sql()}),
            edges AS (
              SELECT id_a AS src, id_b AS dst FROM pf
              UNION
              SELECT id_b AS src, id_a AS dst FROM pf
            ),
            reach AS (
              SELECT DISTINCT src AS v, src AS r FROM edges
              UNION
              SELECT e.dst AS v, reach.r AS r
              FROM reach JOIN edges e ON e.src = reach.v
            ),
            lab AS (SELECT v AS doc_id, min(r) AS cluster_id
                    FROM reach GROUP BY v),
            corpus AS ({_B19_CORPUS_SQL}),
            golden AS (
              SELECT lab.cluster_id AS cid,
                     max_by(c.text, CAST(length(c.text) AS BIGINT)
                            * 4294967296 + (4294967295 - c.doc_id)) AS text
              FROM corpus c JOIN lab ON lab.doc_id = c.doc_id
              GROUP BY lab.cluster_id
            ),
            gtok AS (
              SELECT cid, len(string_split({_NORM_SQL}, ' ')) AS nt
              FROM golden
            ),
            members AS (
              SELECT l.doc_id,
                     CASE WHEN l.doc_id <> l.cluster_id THEN 'drop'
                          WHEN g.nt >= 10 THEN 'keep' ELSE 'drop'
                     END AS decision,
                     CASE WHEN l.doc_id <> l.cluster_id THEN 'dup'
                          WHEN g.nt >= 10 THEN 'cluster_keeper' ELSE 'short'
                     END AS reason
              FROM lab l JOIN gtok g ON g.cid = l.cluster_id
            ),
            singles AS (
              SELECT doc_id,
                     len(string_split({_NORM_SQL}, ' ')) AS nt
              FROM corpus
              WHERE doc_id NOT IN (SELECT doc_id FROM lab)
            )
            SELECT doc_id, decision, reason FROM members
            UNION ALL
            SELECT doc_id,
                   CASE WHEN nt >= 10 THEN 'keep' ELSE 'drop' END AS decision,
                   CASE WHEN nt >= 10 THEN 'unique' ELSE 'short' END AS reason
            FROM singles
        """,
        "b24_source_scorecard": f"""
            WITH per_doc AS (
              SELECT source,
                     CAST(len({_TOKS_SQL}) AS BIGINT) AS n_tok,
                     md5({_NORM_SQL}) AS fp,
                     CAST(len(list_filter({_TOKS_SQL}, t -> t <> ''))
                          AS BIGINT) AS n_nz,
                     CAST(len(list_distinct(
                            list_filter({_TOKS_SQL}, t -> t <> '')))
                          AS BIGINT) AS n_dist
              FROM documents
            ),
            doc_agg AS (
              SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
                     CAST(sum(n_tok) AS BIGINT) AS sum_tok,
                     CAST(count(DISTINCT fp) AS BIGINT) AS n_uniq,
                     CAST(sum(CASE WHEN (n_dist * 1000)
                                        // greatest(n_nz, 1) >= 300
                                   THEN 1 ELSE 0 END) AS BIGINT) AS n_diverse
              FROM per_doc GROUP BY source
            ),
            toks AS (
              SELECT source, unnest(string_split({_NORM_SQL}, ' ')) AS tok
              FROM documents
            ),
            nz AS (SELECT source, tok FROM toks WHERE tok <> ''),
            vocab AS (
              SELECT tok FROM (
                SELECT tok, count(*) AS c FROM nz GROUP BY tok
                ORDER BY c DESC, tok ASC LIMIT 200
              )
            ),
            oov AS (
              SELECT source, CAST(count(*) AS BIGINT) AS n_tokens,
                     CAST(sum(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END)
                          AS BIGINT) AS n_oov
              FROM nz LEFT JOIN vocab v ON nz.tok = v.tok
              GROUP BY source
            )
            SELECT d.source, n_docs, sum_tok, n_uniq,
                   round(1.0 - CAST(n_uniq AS DOUBLE)
                               / CAST(n_docs AS DOUBLE), 6) AS dup_rate,
                   round(CAST(n_oov AS DOUBLE)
                         / CAST(n_tokens AS DOUBLE), 6) AS oov_rate,
                   round(CAST(n_diverse AS DOUBLE)
                         / CAST(n_docs AS DOUBLE), 6) AS diverse_share
            FROM doc_agg d JOIN oov USING (source)
        """,
        "b24_corpus_v6": f"""
            WITH corpus AS (
              SELECT doc_id, source, text FROM documents
              UNION ALL
              SELECT doc_id + 400000, source,
                     substr(text, 1, (length(text) * 3) // 5)
              FROM documents
              WHERE doc_id % 9 = 3 AND length(text) >= 120
            ),
            keyed AS (
              SELECT doc_id, source, text, length(text) AS len,
                     substr(text, 1, 24) AS k
              FROM corpus
            ),
            short_ids AS (
              SELECT DISTINCT a.doc_id
              FROM keyed a JOIN keyed b ON a.k = b.k
              WHERE a.len < b.len AND substr(b.text, 1, a.len) = a.text
            ),
            dup_drops AS (
              SELECT source, CAST(count(*) AS BIGINT) AS n_dropped_dup
              FROM corpus WHERE doc_id IN (SELECT doc_id FROM short_ids)
              GROUP BY source
            ),
            deduped AS (
              SELECT * FROM corpus
              WHERE doc_id NOT IN (SELECT doc_id FROM short_ids)
            ),
            feats AS (
              SELECT doc_id, source,
                     CAST(len({_TOKS_SQL}) AS BIGINT) AS q_tokens,
                     round(least(CAST(len({_TOKS_SQL}) AS DOUBLE) / 50.0,
                                 1.0) * 0.4
                           + round(CAST(length(regexp_replace(text,
                               '[^A-Za-z]', '', 'g')) AS DOUBLE)
                               / CAST(greatest(length(text), 1) AS DOUBLE),
                               6) * 0.4
                           + least(round(CAST({_sw_hits_sql('en')} AS DOUBLE)
                               / CAST(greatest(len({_TOKS_SQL}), 1)
                                      AS DOUBLE), 6) * 5.0, 1.0) * 0.2,
                           6) AS quality_score
              FROM deduped
            ),
            kept AS (SELECT * FROM feats WHERE quality_score >= 0.5),
            q_drops AS (
              SELECT source, CAST(count(*) AS BIGINT) AS n_dropped_quality
              FROM feats WHERE quality_score < 0.5 GROUP BY source
            ),
            base AS (
              SELECT source, CAST(count(*) AS BIGINT) AS n_kept,
                     CAST(sum(q_tokens) AS BIGINT) AS tokens_kept
              FROM kept GROUP BY source
            ),
            sk AS (
              SELECT source AS scope,
                     CAST(least(greatest((q_tokens * 128) // 256, 0), 127)
                          AS INT) AS bkt,
                     CAST(count(*) AS BIGINT) AS cnt
              FROM kept GROUP BY source, bkt
            ),
            ns AS (
              SELECT scope, CAST(sum(cnt) AS BIGINT) AS n
              FROM sk GROUP BY scope
            ),
            cum AS (
              SELECT sk.scope, bkt, ns.n,
                     CAST(sum(cnt) OVER (
                       PARTITION BY sk.scope ORDER BY bkt
                       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS c
              FROM sk JOIN ns USING (scope)
            ),
            p50 AS (
              SELECT scope AS source,
                     CAST(0 + ((min(CASE WHEN c * 100 >= 50 * n THEN bkt END)
                                * 256) + 127) // 128 AS BIGINT)
                       AS p50_tok_lo,
                     CAST(0 + (((min(CASE WHEN c * 100 >= 50 * n THEN bkt END)
                                 + 1) * 256) + 127) // 128 - 1 AS BIGINT)
                       AS p50_tok_hi
              FROM cum GROUP BY scope
            )
            SELECT base.source, base.n_kept,
                   CAST(COALESCE(dup_drops.n_dropped_dup, 0) AS BIGINT)
                     AS n_dropped_dup,
                   CAST(COALESCE(q_drops.n_dropped_quality, 0) AS BIGINT)
                     AS n_dropped_quality,
                   base.tokens_kept, p50.p50_tok_lo, p50.p50_tok_hi
            FROM base
            JOIN p50 USING (source)
            LEFT JOIN dup_drops USING (source)
            LEFT JOIN q_drops USING (source)
        """,
        # ---- round 9 wave 8 ---------------------------------------------
    "b24_corpus_v7": f"""
        WITH flagged AS (
          SELECT DISTINCT doc_id FROM (
            SELECT doc_id, unnest({_TOKS_SQL}) AS tok FROM documents
          ) WHERE tok = 'dup'
        ),
        clean AS (
          SELECT doc_id, source, text FROM documents
          WHERE doc_id NOT IN (SELECT doc_id FROM flagged)
        ),
        tkc AS (SELECT doc_id, {_TOKS_SQL} AS toks FROM clean),
        fps AS (
          SELECT doc_id,
                 md5(array_to_string(list_slice(toks, i*8 + 1, i*8 + 16),
                     ' ')) AS fp
          FROM tkc,
               unnest(generate_series(0,
                 greatest((len(toks) - 16) // 8, 0))) AS t(i)
        ),
        shared AS (
          SELECT fp, count(DISTINCT doc_id) AS nd FROM fps GROUP BY fp
        ),
        pd AS (
          SELECT doc_id, CAST(count(*) AS BIGINT) AS w,
                 CAST(sum(CASE WHEN nd >= 2 THEN 1 ELSE 0 END) AS BIGINT)
                   AS dd
          FROM fps JOIN shared USING (fp) GROUP BY doc_id
        ),
        gated AS (
          SELECT c.* FROM clean c JOIN pd USING (doc_id)
          WHERE pd.dd * 2 < pd.w
        ),
        sized AS (
          SELECT doc_id, source, text,
                 CAST(len(toks) AS BIGINT) AS nt,
                 CAST(len(list_distinct(toks)) AS BIGINT) AS lex
          FROM (SELECT *, {_TOKS_SQL} AS toks FROM gated)
        ),
        ranked AS (
          SELECT *, sum(nt) OVER (PARTITION BY source
                   ORDER BY lex DESC, doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
          FROM sized
        ),
        kept AS (SELECT * FROM ranked WHERE cum <= 15000),
        hashes AS (
          SELECT DISTINCT source,
                 CAST('0x' || substr(md5(text), 1, 15) AS BIGINT) AS h
          FROM kept
        ),
        kth AS (
          SELECT source, h AS kthv FROM (
            SELECT source, h, row_number() OVER (
              PARTITION BY source ORDER BY h) AS rn
            FROM hashes
          ) WHERE rn = 8
        ),
        nx AS (
          SELECT source, CAST(count(*) AS BIGINT) AS nxv
          FROM hashes GROUP BY source
        ),
        kmv AS (
          SELECT nx.source,
                 CASE WHEN kth.kthv IS NULL THEN CAST(nx.nxv AS DOUBLE)
                      ELSE round(7.0 * 1152921504606846976.0
                                 / CAST(kth.kthv AS DOUBLE), 6) END
                   AS kmv_est
          FROM nx LEFT JOIN kth USING (source)
        ),
        tkk AS (SELECT doc_id, {_TOKS_SQL} AS toks FROM kept),
        gr AS (
          SELECT doc_id, i AS pos,
                 CAST('0x' || substr(md5(array_to_string(
                   list_slice(toks, i + 1, i + 3), ' ')), 1, 15) AS BIGINT)
                   AS h
          FROM tkk,
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
        selw AS (
          SELECT DISTINCT doc_id, pos, fp FROM (
            SELECT st.doc_id, st.s, max(g.pos) AS pos, min(st.wm) AS fp
            FROM st
            JOIN gr g ON g.doc_id = st.doc_id
                     AND g.pos BETWEEN st.s AND st.s + 3
                     AND g.h = st.wm
            GROUP BY st.doc_id, st.s
          )
        ),
        nsel AS (
          SELECT doc_id, CAST(count(*) AS BIGINT) AS ns
          FROM selw GROUP BY doc_id
        ),
        dens AS (
          SELECT k.source,
                 round(CAST(sum(nsel.ns) AS DOUBLE)
                       / CAST(sum(greatest(k.nt - 2, 1)) AS DOUBLE), 6)
                   AS winnow_density
          FROM kept k JOIN nsel USING (doc_id) GROUP BY k.source
        ),
        cnt_in AS (
          SELECT source, CAST(count(*) AS BIGINT) AS n_input
          FROM documents GROUP BY source
        ),
        cnt_cl AS (
          SELECT source, CAST(count(*) AS BIGINT) AS n_clean
          FROM clean GROUP BY source
        ),
        cnt_g AS (
          SELECT source, CAST(count(*) AS BIGINT) AS n_gated
          FROM gated GROUP BY source
        ),
        cnt_k AS (
          SELECT source, CAST(count(*) AS BIGINT) AS n_kept,
                 CAST(sum(nt) AS BIGINT) AS tokens_used
          FROM kept GROUP BY source
        )
        SELECT i.source, i.n_input, cnt_cl.n_clean, cnt_g.n_gated,
               cnt_k.n_kept, cnt_k.tokens_used, kmv.kmv_est,
               dens.winnow_density
        FROM cnt_in i
        JOIN cnt_cl USING (source)
        JOIN cnt_g USING (source)
        JOIN cnt_k USING (source)
        JOIN kmv USING (source)
        JOIN dens USING (source)
    """,

        "b24_gate_dedup_matrix": f"""
            WITH docs AS (
              SELECT doc_id, text, n_chars FROM documents
              UNION ALL
              SELECT doc_id + 100000 AS doc_id, text, n_chars
              FROM documents WHERE doc_id % 10 = 0
            ),
            flagged AS (
              SELECT doc_id,
                     (row_number() OVER (PARTITION BY {_NORM_SQL}
                        ORDER BY doc_id) = 1) AS keep,
                     (CAST(len({_TOKS_SQL}) AS BIGINT) >= 25
                        AND n_chars >= 150) AS pass_gate
              FROM docs
            ),
            cells AS (
              SELECT keep, pass_gate, CAST(count(*) AS BIGINT) AS n
              FROM flagged GROUP BY 1, 2
            ),
            mk AS (SELECT keep, count(*) AS mk FROM flagged GROUP BY 1),
            mp AS (
              SELECT pass_gate, count(*) AS mp FROM flagged GROUP BY 1
            ),
            tot AS (SELECT count(*) AS t FROM flagged)
            SELECT c.keep, c.pass_gate, c.n,
                   round(CAST(c.n AS DOUBLE) / tot.t, 6) AS share,
                   round(CAST(c.n AS DOUBLE) * tot.t
                         / CAST(mk.mk * mp.mp AS DOUBLE), 6) AS lift
            FROM cells c
            JOIN mk USING (keep) JOIN mp USING (pass_gate) CROSS JOIN tot
        """,

        "b24_corpus_v8": f"""
            WITH corpus AS (
              SELECT doc_id, lang, source, text FROM documents
              UNION ALL
              SELECT doc_id + 100000 AS doc_id, lang, source, text
              FROM documents WHERE doc_id % 10 = 0
            ),
            toks AS (
              SELECT doc_id, lang, unnest({_TOKS_SQL}) AS tok FROM corpus
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
            ),
            perdoc AS (
              SELECT dt.doc_id,
                     CAST(sum(dt.m) AS BIGINT) AS ws,
                     CAST(sum(dt.m * terms.t8) AS BIGINT) AS w8
              FROM dt JOIN terms USING (tok) GROUP BY dt.doc_id
            ),
            flagged AS (
              SELECT c.doc_id, c.source,
                     (row_number() OVER (PARTITION BY {_NORM_SQL}
                        ORDER BY doc_id) = 1) AS keep,
                     CAST(len(regexp_extract_all(text,
                       '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]+')) AS BIGINT)
                       AS bpe
              FROM corpus c
            ),
            j AS (
              SELECT f.source, f.keep, f.bpe, p.ws, p.w8,
                     (f.keep AND p.w8 > 0 AND p.ws >= 25) AS admit
              FROM flagged f JOIN perdoc p USING (doc_id)
            )
            SELECT source,
                   CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(CASE WHEN admit THEN 1 ELSE 0 END) AS BIGINT)
                     AS n_admitted,
                   CAST(sum(CASE WHEN admit THEN bpe ELSE 0 END) AS BIGINT)
                     AS admitted_bpe_tokens,
                   CAST(sum(CASE WHEN admit THEN w8 ELSE 0 END) AS BIGINT)
                     AS admitted_w8,
                   round(CAST(sum(CASE WHEN admit THEN 1 ELSE 0 END)
                              AS DOUBLE) / count(*), 6) AS admit_share
            FROM j GROUP BY source
        """,

        "b24_corpus_v9": _corpus_v9_oracle_sql(),
}
