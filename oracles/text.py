"""DuckDB oracle SQL — text family (split from
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
        "b21_pii_scrub": _pii_oracle_sql(),
        "b21_repetition": _repetition_oracle_sql(),
        "b21_lang_quality": f"""
            WITH base AS (
              SELECT doc_id, text,
                     {_sw_hits_sql('de')} AS s_de,
                     {_sw_hits_sql('en')} AS s_en,
                     {_sw_hits_sql('es')} AS s_es,
                     {_sw_hits_sql('fr')} AS s_fr,
                     CAST(length(text) AS BIGINT) AS q_chars,
                     CAST(len({_TOKS_SQL}) AS BIGINT) AS q_tokens,
                     CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS BIGINT) AS alpha,
                     CAST(length(regexp_replace(text, '[^ ]', '', 'g')) AS BIGINT) AS spaces
              FROM documents
            ),
            feat AS (
              SELECT *,
                round(CAST(q_chars - spaces AS DOUBLE) / CAST(greatest(q_tokens, 1) AS DOUBLE), 6) AS q_mean_tok_len,
                round(CAST(alpha AS DOUBLE) / CAST(greatest(q_chars, 1) AS DOUBLE), 6) AS q_alpha_ratio,
                round(CAST(s_en AS DOUBLE) / CAST(greatest(q_tokens, 1) AS DOUBLE), 6) AS q_stopword_ratio
              FROM base
            )
            SELECT doc_id,
                   CASE WHEN greatest(s_de, s_en, s_es, s_fr) = 0 THEN 'und'
                        WHEN s_de = greatest(s_de, s_en, s_es, s_fr) THEN 'de'
                        WHEN s_en = greatest(s_de, s_en, s_es, s_fr) THEN 'en'
                        WHEN s_es = greatest(s_de, s_en, s_es, s_fr) THEN 'es'
                        ELSE 'fr' END AS lang_guess,
                   q_chars, q_tokens, q_mean_tok_len, q_alpha_ratio,
                   q_stopword_ratio,
                   round(least(CAST(q_tokens AS DOUBLE) / 50.0, 1.0) * 0.4
                         + q_alpha_ratio * 0.4
                         + least(q_stopword_ratio * 5.0, 1.0) * 0.2, 6) AS quality_score
            FROM feat
        """,
        "b21_token_stats": f"""
            WITH per_doc AS (
              SELECT lang,
                     CAST(len({_TOKS_SQL}) AS BIGINT) AS n_tok,
                     CAST(len(regexp_extract_all(text,
                       '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]+')) AS BIGINT) AS n_bpe,
                     md5({_NORM_SQL}) AS fp
              FROM documents
            )
            SELECT lang, count(*) AS n_docs,
                   CAST(sum(n_tok) AS BIGINT) AS sum_tok,
                   CAST(sum(n_bpe) AS BIGINT) AS sum_bpe,
                   count(DISTINCT fp) AS n_distinct_fp
            FROM per_doc GROUP BY lang
        """,
        "b21_source_kl": f"""
            WITH toks AS (
              SELECT source, unnest({_TOKS_SQL}) AS tok FROM documents
            ),
            tk AS (SELECT source, tok FROM toks WHERE tok <> ''),
            st AS (
              SELECT source, tok, count(*) AS nst FROM tk GROUP BY source, tok
            ),
            ct AS (SELECT tok, count(*) AS nt FROM tk GROUP BY tok),
            stot AS (SELECT source, count(*) AS ns FROM tk GROUP BY source),
            gtot AS (
              SELECT count(*) AS n, count(DISTINCT tok) AS v FROM tk
            ),
            cells AS (
              SELECT stot.source, stot.ns, gtot.v,
                     (coalesce(st.nst, 0) + 1)
                       / CAST(stot.ns + gtot.v AS DOUBLE) AS p,
                     (ct.nt + 1) / CAST(gtot.n + gtot.v AS DOUBLE) AS q
              FROM ct CROSS JOIN stot CROSS JOIN gtot
              LEFT JOIN st ON st.source = stot.source AND st.tok = ct.tok
            )
            SELECT source,
                   CAST(min(ns) AS BIGINT) AS n_tokens,
                   CAST(min(v) AS BIGINT) AS vocab_size,
                   round(sum(CAST(floor(p * ln(p / q) * 1e8) AS BIGINT)) / 1e8, 6)
                     AS kl_vs_corpus
            FROM cells GROUP BY source
        """,
        "b21_top_tokens": f"""
            WITH toks AS (
              SELECT lang, unnest(string_split({_NORM_SQL}, ' ')) AS tok
              FROM documents
            ),
            counts AS (
              SELECT lang, tok, count(*) AS n FROM toks
              WHERE tok <> '' GROUP BY lang, tok
            )
            SELECT lang, tok, n,
                   CAST(rank AS BIGINT) AS rank
            FROM (
              SELECT *, row_number() OVER (
                PARTITION BY lang ORDER BY n DESC, tok ASC) AS rank
              FROM counts
            ) WHERE rank <= 10
        """,
        "b21_fingerprints": f"""
            WITH tk AS (
              SELECT doc_id, string_split({_NORM_SQL}, ' ') AS toks
              FROM documents
            )
            SELECT doc_id, CAST(i AS BIGINT) AS win_idx,
                   md5(array_to_string(list_slice(toks, i*8 + 1, i*8 + 16),
                       ' ')) AS fp
            FROM tk,
                 unnest(generate_series(0,
                   greatest((len(toks) - 16) // 8, 0))) AS t(i)
        """,
        "b21_chunking": f"""
            WITH tk AS (
              SELECT doc_id, string_split({_NORM_SQL}, ' ') AS toks
              FROM documents
            )
            SELECT doc_id,
                   CAST(i AS BIGINT) AS chunk_idx,
                   array_to_string(list_slice(toks, i*12 + 1, i*12 + 16), ' ')
                     AS chunk_text,
                   CAST(least(16, len(toks) - i*12) AS BIGINT) AS n_tok
            FROM tk,
                 unnest(generate_series(0, greatest((len(toks) - 1) // 12, 0)))
                   AS t(i)
            WHERE i = 0 OR i*12 + 4 < len(toks)
        """,
        "b21_token_per_doc": f"""
            SELECT doc_id,
                   CAST(len({_TOKS_SQL}) AS BIGINT) AS n_tok,
                   CAST(len(regexp_extract_all(text,
                     '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]+')) AS BIGINT) AS n_bpe,
                   md5({_NORM_SQL}) AS fp
            FROM documents
        """,
        "b21_tfidf": f"""
            WITH toks AS (
              SELECT doc_id, unnest(string_split({_NORM_SQL}, ' ')) AS tok
              FROM documents
            ),
            tf AS (
              SELECT doc_id, tok, count(*) AS tf FROM toks
              WHERE tok <> '' GROUP BY doc_id, tok
            ),
            dfx AS (SELECT tok, count(*) AS df_t FROM tf GROUP BY tok),
            n AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM documents),
            scored AS (
              SELECT tf.doc_id, tf.tok,
                     CAST(tf.tf AS BIGINT) AS tf,
                     CAST(dfx.df_t AS BIGINT) AS df_t,
                     round(tf.tf * (ln((n.n_docs + 1.0)
                                       / (dfx.df_t + 1.0)) + 1.0), 6)
                       AS tfidf
              FROM tf JOIN dfx USING (tok) CROSS JOIN n
            )
            SELECT doc_id, tok, tf, df_t, tfidf, CAST(rank AS BIGINT) AS rank
            FROM (
              SELECT *, row_number() OVER (
                PARTITION BY doc_id ORDER BY tfidf DESC, tok ASC) AS rank
              FROM scored
            ) WHERE rank <= 3
        """,
        "b21_bm25": f"""
            WITH toks AS (
              SELECT doc_id, unnest(string_split({_NORM_SQL}, ' ')) AS tok
              FROM documents
            ),
            dl AS (
              SELECT doc_id, CAST(count(*) AS DOUBLE) AS dl FROM toks
              WHERE tok <> '' GROUP BY doc_id
            ),
            scalars AS (
              -- N = |documents| (all rows, matching tf_idf), avgdl over
              -- non-empty docs only — mirrors lm.bm25_search
              SELECT (SELECT avg(dl) FROM dl) AS avgdl,
                     CAST(count(*) AS DOUBLE) AS n_docs
              FROM documents
            ),
            tf AS (
              SELECT doc_id, tok, CAST(count(*) AS DOUBLE) AS tf FROM toks
              WHERE tok IN ('merge', 'join', 'batch') GROUP BY doc_id, tok
            ),
            dfx AS (
              SELECT tok, CAST(count(*) AS DOUBLE) AS dfv FROM tf GROUP BY tok
            ),
            scored AS (
              SELECT tf.doc_id,
                     round(sum(
                       ln(1.0 + (s.n_docs - dfx.dfv + 0.5) / (dfx.dfv + 0.5))
                       * tf.tf * 2.2
                       / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / s.avgdl))
                     ), 6) AS score,
                     CAST(count(*) AS BIGINT) AS n_terms_hit
              FROM tf JOIN dfx USING (tok) JOIN dl USING (doc_id)
                   CROSS JOIN scalars s
              GROUP BY tf.doc_id
            )
            SELECT doc_id, score, n_terms_hit, CAST(rank AS BIGINT) AS rank
            FROM (
              SELECT *, row_number() OVER (
                ORDER BY score DESC, doc_id ASC) AS rank
              FROM scored
            ) WHERE rank <= 15
        """,
        "b21_perplexity": f"""
            WITH toks AS (
              SELECT doc_id, unnest(string_split({_NORM_SQL}, ' ')) AS tok
              FROM documents
            ),
            nz AS (SELECT doc_id, tok FROM toks WHERE tok <> ''),
            model AS (SELECT tok, count(*) AS cnt FROM nz GROUP BY tok),
            scalars AS (
              SELECT CAST(sum(cnt) AS DOUBLE) AS t_total,
                     CAST(count(*) AS DOUBLE) AS v_size
              FROM model
            ),
            pdt AS (
              SELECT doc_id, tok, CAST(count(*) AS DOUBLE) AS c FROM nz
              GROUP BY doc_id, tok
            ),
            agg AS (
              SELECT pdt.doc_id,
                     CAST(sum(pdt.c) AS BIGINT) AS n_tok,
                     sum(pdt.c * ln(m.cnt + 1.0)) AS num
              FROM pdt JOIN model m USING (tok) GROUP BY pdt.doc_id
            )
            SELECT doc_id, n_tok,
                   round(ln(s.t_total + 1.0 * s.v_size)
                         - num / CAST(n_tok AS DOUBLE), 6) AS xent
            FROM agg CROSS JOIN scalars s
        """,
        "b21_bpe_pairs": f"""
            WITH toks AS (
              SELECT unnest(string_split({_NORM_SQL}, ' ')) AS tok
              FROM documents
            ),
            vocab AS (
              SELECT tok, count(*) AS wcnt FROM toks
              WHERE len(tok) >= 2 GROUP BY tok
            ),
            pairs AS (
              SELECT substring(tok, i, 2) AS pair,
                     CAST(sum(wcnt) AS BIGINT) AS pair_count
              FROM vocab,
                   unnest(generate_series(1, len(tok) - 1)) AS t(i)
              GROUP BY pair
            )
            SELECT pair, pair_count, CAST(rank AS BIGINT) AS rank
            FROM (
              SELECT *, row_number() OVER (
                ORDER BY pair_count DESC, pair ASC) AS rank
              FROM pairs
            ) WHERE rank <= 50
        """,
        "b21_quality_gate": f"""
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
              SELECT doc_id, lang,
                     round(least(CAST(q_tokens AS DOUBLE) / 50.0, 1.0) * 0.4
                           + q_alpha_ratio * 0.4
                           + least(q_stopword_ratio * 5.0, 1.0) * 0.2, 6)
                       AS quality_score
              FROM feat
            ),
            ranked AS (
              SELECT *,
                     round(percent_rank() OVER w, 6) AS pctile,
                     row_number() OVER w AS rn,
                     count(*) OVER (PARTITION BY lang) AS n
              FROM scored
              WINDOW w AS (PARTITION BY lang
                           ORDER BY quality_score ASC, doc_id ASC)
            )
            SELECT doc_id, lang, quality_score, pctile
            FROM ranked WHERE rn > floor(n * 0.25)
        """,
        "b21_heaps_curve": f"""
            WITH n AS (
              SELECT CAST(count(*) AS DOUBLE) AS nd FROM documents
            ),
            toks AS (
              SELECT CAST(least(9, floor(
                       CAST(doc_id AS DOUBLE) * 10.0 / n.nd))
                     AS BIGINT) AS decile,
                     unnest(list_distinct(list_transform(
                       generate_series(1,
                         greatest(length({_NORM_SQL}) - 3, 1)),
                       i -> substring({_NORM_SQL}, i, 4)))) AS tok
              FROM documents CROSS JOIN n
            ),
            first_seen AS (
              SELECT tok, min(decile) AS first_decile FROM toks
              WHERE tok <> '' GROUP BY tok
            ),
            per_decile AS (
              SELECT first_decile, CAST(count(*) AS BIGINT) AS new_tokens
              FROM first_seen GROUP BY first_decile
            )
            SELECT first_decile AS decile, new_tokens,
                   CAST(sum(new_tokens) OVER (
                     ORDER BY first_decile
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     AS BIGINT) AS vocab_size
            FROM per_decile
        """,
        "b21_readability": f"""
            SELECT doc_id,
                   CAST(len({_TOKS_SQL}) AS BIGINT) AS n_words,
                   CAST(len(regexp_extract_all(lower(text), '[aeiouy]+'))
                        AS BIGINT) AS n_syllables,
                   round(206.835
                         - 1.015 * CAST(len({_TOKS_SQL}) AS DOUBLE)
                         - 84.6 * (CAST(len(regexp_extract_all(lower(text),
                               '[aeiouy]+')) AS DOUBLE)
                             / CAST(greatest(len({_TOKS_SQL}), 1)
                                    AS DOUBLE)), 6) AS flesch
            FROM documents
        """,
        "b21_zipf_fit": f"""
            WITH counts AS (
              SELECT tok, CAST(count(*) AS DOUBLE) AS n FROM (
                SELECT unnest(string_split({_NORM_SQL}, ' ')) AS tok
                FROM documents
              ) WHERE tok <> '' GROUP BY tok
            ),
            top AS (
              SELECT CAST(r AS DOUBLE) AS r, n FROM (
                SELECT n, row_number() OVER (
                  ORDER BY n DESC, tok ASC) AS r
                FROM counts
              ) WHERE r <= 100
            ),
            xy AS (SELECT ln(r) AS x, ln(n) AS y FROM top),
            agg AS (
              SELECT CAST(count(*) AS DOUBLE) AS k, sum(x) AS sx,
                     sum(y) AS sy, sum(x * y) AS sxy, sum(x * x) AS sxx
              FROM xy
            )
            SELECT CAST(k AS BIGINT) AS n_points,
                   round((k * sxy - sx * sy) / (k * sxx - sx * sx), 6)
                     AS zipf_slope
            FROM agg
        """,
        "b21_quantile_norm": f"""
            WITH ranked AS (
              SELECT doc_id, source, n_chars,
                     row_number() OVER (
                       PARTITION BY source
                       ORDER BY n_chars ASC, doc_id ASC) AS r,
                     count(*) OVER (PARTITION BY source) AS n
              FROM documents
            ),
            idx AS (
              SELECT doc_id, source, n_chars,
                     CASE WHEN n > 1
                          THEN CAST(((r - 1) * 100) // (n - 1) AS INTEGER)
                          ELSE 0 END AS pct_idx
              FROM ranked
            ),
            edges AS (
              SELECT quantile_cont(n_chars,
                [{', '.join(repr(i / 100.0) for i in range(101))}]) AS e
              FROM documents
            )
            SELECT doc_id, source, n_chars, pct_idx,
                   round(e[pct_idx + 1], 6) AS normalized
            FROM idx CROSS JOIN edges
        """,
        "b21_corpus_card": f"""
            WITH per_doc AS (
              SELECT doc_id, source, lang,
                     CAST(len({_TOKS_SQL}) AS BIGINT) AS q_tokens,
                     round(least(CAST(len({_TOKS_SQL}) AS DOUBLE) / 50.0,
                                 1.0) * 0.4
                           + round(CAST(length(regexp_replace(text,
                               '[^A-Za-z]', '', 'g')) AS DOUBLE)
                               / CAST(greatest(length(text), 1) AS DOUBLE), 6)
                             * 0.4
                           + least(round(CAST({_sw_hits_sql('en')} AS DOUBLE)
                               / CAST(greatest(len({_TOKS_SQL}), 1)
                                      AS DOUBLE), 6) * 5.0, 1.0) * 0.2, 6)
                       AS quality_score
              FROM documents
            ),
            per_source AS (
              SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
                     CAST(sum(q_tokens) AS BIGINT) AS sum_tok,
                     round(avg(quality_score), 6) AS mean_quality
              FROM per_doc GROUP BY source
            ),
            lc AS (
              SELECT source, lang, CAST(count(*) AS DOUBLE) AS c
              FROM documents GROUP BY source, lang
            ),
            ent AS (
              SELECT source,
                     round(-sum((c / n) * ln(c / n)), 6) AS lang_entropy
              FROM (
                SELECT source, lang, c,
                       sum(c) OVER (PARTITION BY source) AS n
                FROM lc
              ) GROUP BY source
            )
            SELECT p.source, p.n_docs, p.sum_tok, p.mean_quality,
                   e.lang_entropy
            FROM per_source p JOIN ent e ON p.source = e.source
        """,
        "b21_lang_confusion": f"""
            WITH base AS (
              SELECT lang,
                     {_sw_hits_sql('de')} AS s_de,
                     {_sw_hits_sql('en')} AS s_en,
                     {_sw_hits_sql('es')} AS s_es,
                     {_sw_hits_sql('fr')} AS s_fr
              FROM documents
            )
            SELECT lang,
                   CASE WHEN greatest(s_de, s_en, s_es, s_fr) = 0 THEN 'und'
                        WHEN s_de = greatest(s_de, s_en, s_es, s_fr) THEN 'de'
                        WHEN s_en = greatest(s_de, s_en, s_es, s_fr) THEN 'en'
                        WHEN s_es = greatest(s_de, s_en, s_es, s_fr) THEN 'es'
                        ELSE 'fr' END AS lang_guess,
                   CAST(count(*) AS BIGINT) AS n
            FROM base GROUP BY lang, lang_guess
        """,
        "b21_nchars_histogram": """
            WITH per_lang AS (
              SELECT lang, count(*) AS lang_total FROM documents GROUP BY lang
            ),
            hist AS (
              SELECT lang, CAST(floor(n_chars / 50) * 50 AS BIGINT) AS bucket,
                     count(*) AS n_docs
              FROM documents GROUP BY 1, 2
            )
            SELECT h.lang, h.bucket, h.n_docs,
                   round(CAST(h.n_docs AS DOUBLE) / CAST(p.lang_total AS DOUBLE), 6)
                     AS share
            FROM hist h JOIN per_lang p ON h.lang = p.lang
        """,
        "b21_dup_ngram_coverage": f"""
            WITH tk AS (
              SELECT doc_id, string_split({_NORM_SQL}, ' ') AS toks
              FROM documents
            ),
            sh AS (
              SELECT DISTINCT doc_id,
                     toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
                             || ' ' || toks[i+3] || ' ' || toks[i+4] AS sh
              FROM tk, unnest(generate_series(1, len(toks) - 4)) AS t(i)
            ),
            gf AS (SELECT sh, count(*) AS dfv FROM sh GROUP BY sh)
            SELECT s.doc_id,
                   CAST(count(*) AS BIGINT) AS n_grams,
                   CAST(sum(CASE WHEN g.dfv >= 2 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_dup_grams,
                   round(CAST(sum(CASE WHEN g.dfv >= 2 THEN 1 ELSE 0 END)
                              AS DOUBLE)
                         / CAST(count(*) AS DOUBLE), 6) AS dup_ratio
            FROM sh s JOIN gf g USING (sh)
            GROUP BY s.doc_id
        """,
        "b21_lexical_diversity": f"""
            WITH toks AS (
              SELECT doc_id AS doc,
                     unnest(list_filter({_TOKS_SQL}, t -> t <> '')) AS tok
              FROM documents
            ),
            pt AS (
              SELECT doc, tok, CAST(count(*) AS BIGINT) AS c
              FROM toks GROUP BY doc, tok
            ),
            prof AS (
              SELECT doc, CAST(sum(c) AS BIGINT) AS n_tokens,
                     CAST(count(*) AS BIGINT) AS n_types,
                     round(ln(CAST(sum(c) AS DOUBLE))
                           - sum(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE)))
                             / CAST(sum(c) AS DOUBLE), 6) AS token_entropy,
                     round(CAST(count(*) AS DOUBLE)
                           / CAST(sum(c) AS DOUBLE), 6) AS ttr
              FROM pt GROUP BY doc
            )
            SELECT d.doc_id, COALESCE(n_tokens, 0) AS n_tokens,
                   COALESCE(n_types, 0) AS n_types, ttr, token_entropy
            FROM documents d LEFT JOIN prof ON prof.doc = d.doc_id
        """,
        "b21_oov_rate": f"""
            WITH toks AS (
              SELECT source, unnest(string_split({_NORM_SQL}, ' ')) AS tok
              FROM documents
            ),
            nz AS (SELECT source, tok FROM toks WHERE tok <> ''),
            vocab AS (
              SELECT tok FROM (
                SELECT tok, count(*) AS c FROM nz GROUP BY tok
                ORDER BY c DESC, tok ASC LIMIT 200
              )
            )
            SELECT source, CAST(count(*) AS BIGINT) AS n_tokens,
                   CAST(sum(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_oov,
                   round(CAST(sum(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END)
                              AS DOUBLE) / CAST(count(*) AS DOUBLE), 6)
                     AS oov_rate
            FROM nz LEFT JOIN vocab v ON nz.tok = v.tok
            GROUP BY source
        """,
        "b21_calibration": f"""
            WITH base AS (
              SELECT lang,
                     CAST(len({_TOKS_SQL}) AS BIGINT) AS q_tokens,
                     CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g'))
                          AS BIGINT) AS alpha,
                     CAST(length(text) AS BIGINT) AS q_chars,
                     {_sw_hits_sql('en')} AS s_en
              FROM documents
            ),
            scored AS (
              SELECT lang,
                round(least(CAST(q_tokens AS DOUBLE) / 50.0, 1.0) * 0.4
                      + round(CAST(alpha AS DOUBLE)
                              / CAST(greatest(q_chars, 1) AS DOUBLE), 6) * 0.4
                      + least(round(CAST(s_en AS DOUBLE)
                              / CAST(greatest(q_tokens, 1) AS DOUBLE), 6)
                              * 5.0, 1.0) * 0.2, 6) AS score
              FROM base
            ),
            binned AS (
              SELECT CAST(least(floor(score * 10), 9) AS INT) AS bin,
                     CAST(floor(score * 1e6) AS BIGINT) AS sm,
                     CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos
              FROM scored
            ),
            per AS (
              SELECT bin, CAST(count(*) AS BIGINT) AS n,
                     CAST(sum(pos) AS BIGINT) AS n_pos,
                     CAST(sum(sm) AS BIGINT) AS ssm
              FROM binned GROUP BY bin
            )
            SELECT bin, n, n_pos,
                   CAST(ssm // n AS BIGINT) AS mean_score_micros,
                   CAST((n_pos * 1000000) // n AS BIGINT) AS pos_rate_micros,
                   CAST(abs(ssm // n - (n_pos * 1000000) // n) AS BIGINT)
                     AS gap_micros
            FROM per
        """,
        "b21_rake_keywords": f"""
            WITH tk AS (
              SELECT doc_id, {_TOKS_SQL} AS toks FROM documents
            ),
            marked AS (
              SELECT doc_id, i - 1 AS pos, toks[i] AS tok,
                     CASE WHEN toks[i] IN ({", ".join(
                         f"'{w}'" for w in textops.STOPWORDS['en']
                     )}) THEN 1 ELSE 0 END AS is_sw
              FROM tk, unnest(generate_series(1, len(toks))) AS t(i)
            ),
            phrased AS (
              SELECT doc_id, tok, phrase_id FROM (
                SELECT doc_id, tok, is_sw,
                       CAST(sum(is_sw) OVER (
                         PARTITION BY doc_id ORDER BY pos
                         ROWS UNBOUNDED PRECEDING) AS BIGINT) AS phrase_id
                FROM marked
              ) WHERE is_sw = 0
            ),
            plen AS (
              SELECT doc_id, phrase_id,
                     CAST(count(*) AS BIGINT) AS plen
              FROM phrased GROUP BY doc_id, phrase_id
            ),
            scored AS (
              SELECT tok, CAST(count(*) AS BIGINT) AS freq,
                     CAST(sum(plen) AS BIGINT) AS degree
              FROM phrased JOIN plen USING (doc_id, phrase_id)
              GROUP BY tok
            )
            SELECT tok, freq, degree,
                   CAST((degree * 1000000) // freq AS BIGINT)
                     AS rake_micros,
                   CAST(row_number() OVER (
                     ORDER BY (degree * 1000000) // freq DESC, freq DESC,
                              tok ASC) AS BIGINT) AS rank
            FROM scored
            ORDER BY rake_micros DESC, freq DESC, tok ASC LIMIT 20
        """,
    "b21_winnowing": f"""
        WITH tk AS (
          SELECT doc_id, string_split({_NORM_SQL}, ' ') AS toks
          FROM documents
        ),
        grams AS (
          SELECT doc_id, i AS pos,
                 CAST('0x' || substr(md5(array_to_string(
                   list_slice(toks, i + 1, i + 3), ' ')), 1, 15) AS BIGINT)
                   AS h
          FROM tk,
               unnest(generate_series(0, greatest(len(toks) - 3, 0))) AS t(i)
          WHERE i <= len(toks) - 3 OR i = 0
        ),
        starts AS (
          SELECT * FROM (
            SELECT doc_id, pos AS s,
                   min(h) OVER (PARTITION BY doc_id ORDER BY pos
                     ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS wm,
                   row_number() OVER (PARTITION BY doc_id ORDER BY pos)
                     AS rn,
                   count(*) OVER (PARTITION BY doc_id) AS ng
            FROM grams
          ) WHERE rn <= ng - 3 OR rn = 1
        ),
        sel AS (
          SELECT DISTINCT doc_id, pos, fp FROM (
            SELECT st.doc_id, st.s, max(g.pos) AS pos, min(st.wm) AS fp
            FROM starts st
            JOIN grams g ON g.doc_id = st.doc_id
                        AND g.pos BETWEEN st.s AND st.s + 3
                        AND g.h = st.wm
            GROUP BY st.doc_id, st.s
          )
        ),
        per AS (
          SELECT doc_id, CAST(count(*) AS BIGINT) AS n_selected,
                 min(fp) AS min_fp
          FROM sel GROUP BY doc_id
        ),
        ng AS (
          SELECT doc_id,
                 CAST(greatest(len(toks) - 2, 1) AS BIGINT) AS n_grams
          FROM tk
        )
        SELECT per.doc_id, ng.n_grams, per.n_selected,
               round(CAST(per.n_selected AS DOUBLE) / ng.n_grams, 6)
                 AS density,
               per.min_fp
        FROM per JOIN ng USING (doc_id)
    """,
    "b21_blocklist": f"""
        WITH tok AS (
          SELECT doc_id, source, unnest({_TOKS_SQL}) AS tok
          FROM documents
        ),
        hits AS (
          SELECT doc_id, source, tok FROM tok
          WHERE tok IN ('slow', 'sort', 'merge', 'batch')
        ),
        per_doc AS (
          SELECT doc_id, source,
                 CAST(count(*) AS BIGINT) AS h,
                 CAST(count(DISTINCT tok) AS BIGINT) AS t
          FROM hits GROUP BY doc_id, source
        ),
        totals AS (
          SELECT source, CAST(count(*) AS BIGINT) AS n_docs
          FROM documents GROUP BY source
        ),
        flagged AS (
          SELECT source,
                 CAST(count(*) AS BIGINT) AS n_flagged,
                 CAST(sum(h) AS BIGINT) AS total_hits,
                 CAST(max(t) AS BIGINT) AS max_terms_in_doc
          FROM per_doc GROUP BY source
        )
        SELECT t.source, t.n_docs,
               CAST(coalesce(f.n_flagged, 0) AS BIGINT) AS n_flagged,
               round(CAST(coalesce(f.n_flagged, 0) AS DOUBLE) / t.n_docs, 6)
                 AS flag_share,
               CAST(coalesce(f.total_hits, 0) AS BIGINT) AS total_hits,
               CAST(coalesce(f.max_terms_in_doc, 0) AS BIGINT)
                 AS max_terms_in_doc
        FROM totals t LEFT JOIN flagged f USING (source)
    """,
    "b21_filter_matrix": f"""
        WITH t AS (
          SELECT doc_id, {_TOKS_SQL} AS toks FROM documents
        ),
        topc AS (
          SELECT doc_id, max(c) AS topc FROM (
            SELECT doc_id, tok, count(*) AS c
            FROM (SELECT doc_id, unnest(toks) AS tok FROM t)
            GROUP BY doc_id, tok
          ) GROUP BY doc_id
        ),
        per AS (
          SELECT t.doc_id,
                 CAST(len(toks) AS BIGINT) AS nt,
                 CAST(len(list_distinct(toks)) AS BIGINT) AS nd,
                 topc.topc
          FROM t JOIN topc USING (doc_id)
        ),
        flags AS (
          SELECT nt < 25 AS r_short,
                 nd * 2 < nt AS r_lowdiv,
                 topc * 100 > nt * 12 AS r_rep,
                 nt > 90 AS r_long
          FROM per
        ),
        agg AS (
          SELECT CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(CASE WHEN r_short THEN 1 ELSE 0 END) AS BIGINT)
                   AS s_short,
                 CAST(sum(CASE WHEN r_lowdiv THEN 1 ELSE 0 END) AS BIGINT)
                   AS s_lowdiv,
                 CAST(sum(CASE WHEN r_rep THEN 1 ELSE 0 END) AS BIGINT)
                   AS s_rep,
                 CAST(sum(CASE WHEN r_long THEN 1 ELSE 0 END) AS BIGINT)
                   AS s_long,
                 CAST(sum(CASE WHEN r_short OR r_lowdiv OR r_rep OR r_long
                               THEN 1 ELSE 0 END) AS BIGINT) AS s_any,
                 CAST(sum(CASE WHEN (CASE WHEN r_short THEN 1 ELSE 0 END
                                   + CASE WHEN r_lowdiv THEN 1 ELSE 0 END
                                   + CASE WHEN r_rep THEN 1 ELSE 0 END
                                   + CASE WHEN r_long THEN 1 ELSE 0 END) >= 2
                               THEN 1 ELSE 0 END) AS BIGINT) AS s_multi
          FROM flags
        )
        SELECT rule, n_failed,
               round(CAST(n_failed AS DOUBLE) / n, 6) AS fail_share
        FROM (
          SELECT n, unnest(['short', 'low_diversity', 'repetition', 'long',
                            'any', 'multi']) AS rule,
                 unnest([s_short, s_lowdiv, s_rep, s_long, s_any, s_multi])
                   AS n_failed
          FROM agg
        )
    """,

        "b21_fertility": f"""
            WITH per AS (
              SELECT source,
                     CAST(len({_TOKS_SQL}) AS BIGINT) AS ws,
                     CAST(len(regexp_extract_all(text,
                       '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]+')) AS BIGINT) AS bpe,
                     CAST(strlen(text) AS BIGINT) AS b
              FROM documents
            )
            SELECT source,
                   CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(ws) AS BIGINT) AS ws_tokens,
                   CAST(sum(bpe) AS BIGINT) AS bpe_tokens,
                   CAST(sum(b) AS BIGINT) AS n_bytes,
                   round(CAST(sum(bpe) AS DOUBLE) / sum(ws), 6) AS fertility,
                   round(CAST(sum(b) AS DOUBLE) / sum(bpe), 6)
                     AS bytes_per_token
            FROM per GROUP BY source
        """,

        "b21_burstiness": f"""
            WITH nd AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
            dt AS (
              SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS x
              FROM (
                SELECT doc_id, unnest({_TOKS_SQL}) AS tok FROM documents
              ) WHERE tok <> ''
              GROUP BY doc_id, tok
            ),
            per AS (
              SELECT tok, CAST(count(*) AS BIGINT) AS df,
                     CAST(sum(x) AS BIGINT) AS c,
                     CAST(sum(x * x) AS BIGINT) AS xx
              FROM dt GROUP BY tok
            )
            SELECT tok, df, c AS n_occ,
                   round(CAST(nd.n * xx - c * c AS DOUBLE)
                         / CAST(nd.n * c AS DOUBLE), 6) AS vmr
            FROM per, nd
            WHERE df >= 20
            ORDER BY vmr DESC, tok ASC LIMIT 20
        """,

        "b21_langid_margin": f"""
            WITH scored AS (
              SELECT lang,
                     CAST(len(list_filter({_TOKS_SQL}, t -> list_contains(['der', 'die', 'das', 'und', 'ist', 'nicht', 'ein', 'mit', 'auf', 'zu'], t))) AS BIGINT) AS s_de,
                     CAST(len(list_filter({_TOKS_SQL}, t -> list_contains(['the', 'a', 'of', 'and', 'to', 'in', 'is', 'it', 'that', 'for'], t))) AS BIGINT) AS s_en,
                     CAST(len(list_filter({_TOKS_SQL}, t -> list_contains(['el', 'la', 'los', 'y', 'es', 'un', 'una', 'en', 'para', 'que'], t))) AS BIGINT) AS s_es,
                     CAST(len(list_filter({_TOKS_SQL}, t -> list_contains(['le', 'la', 'les', 'et', 'est', 'un', 'une', 'dans', 'pour', 'que'], t))) AS BIGINT) AS s_fr
              FROM documents
            ),
            m AS (
              SELECT lang,
                     least(list_reverse_sort([s_de, s_en, s_es, s_fr])[1]
                           - list_reverse_sort([s_de, s_en, s_es, s_fr])[2],
                           CAST(5 AS BIGINT)) AS margin,
                     CASE WHEN (CASE WHEN s_fr > CASE WHEN s_es > (CASE WHEN s_en > (CASE WHEN s_de > (CAST(0 AS BIGINT)) THEN s_de ELSE (CAST(0 AS BIGINT)) END) THEN s_en ELSE (CASE WHEN s_de > (CAST(0 AS BIGINT)) THEN s_de ELSE (CAST(0 AS BIGINT)) END) END) THEN s_es ELSE (CASE WHEN s_en > (CASE WHEN s_de > (CAST(0 AS BIGINT)) THEN s_de ELSE (CAST(0 AS BIGINT)) END) THEN s_en ELSE (CASE WHEN s_de > (CAST(0 AS BIGINT)) THEN s_de ELSE (CAST(0 AS BIGINT)) END) END) END THEN 'fr' ELSE CASE WHEN s_es > CASE WHEN s_en > (CASE WHEN s_de > (CAST(0 AS BIGINT)) THEN s_de ELSE (CAST(0 AS BIGINT)) END) THEN s_en ELSE (CASE WHEN s_de > (CAST(0 AS BIGINT)) THEN s_de ELSE (CAST(0 AS BIGINT)) END) END THEN 'es' ELSE CASE WHEN s_en > CASE WHEN s_de > (CAST(0 AS BIGINT)) THEN s_de ELSE (CAST(0 AS BIGINT)) END THEN 'en' ELSE CASE WHEN s_de > CAST(0 AS BIGINT) THEN 'de' ELSE 'und' END END END END) = lang THEN 1 ELSE 0 END AS ok
              FROM scored
            )
            SELECT lang, margin,
                   CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(ok) AS BIGINT) AS n_correct
            FROM m GROUP BY lang, margin
        """,
}
