"""DuckDB oracle SQL — retrieval family (split from
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
        "b30_phrase_search": f"""
            WITH tk AS (
              SELECT doc_id, {_TOKS_SQL} AS toks FROM documents
            ),
            pos AS (
              SELECT doc_id, i - 1 AS pos, toks[i] AS tok
              FROM tk, unnest(generate_series(1, len(toks))) AS t(i)
            )
            SELECT a.doc_id,
                   CAST(count(*) AS BIGINT) AS n_occurrences
            FROM pos a JOIN pos b
              ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
            WHERE a.tok = 'merge' AND b.tok = 'join'
            GROUP BY a.doc_id
        """,
        "b30_rrf_fusion": f"""
            WITH toks AS (
              SELECT doc_id, unnest(string_split({_NORM_SQL}, ' ')) AS tok
              FROM documents
            ),
            nz AS (SELECT doc_id, tok FROM toks WHERE tok <> ''),
            dl AS (
              SELECT doc_id, CAST(count(*) AS DOUBLE) AS dl
              FROM nz GROUP BY doc_id
            ),
            scalars AS (
              SELECT (SELECT avg(dl) FROM dl) AS avgdl,
                     CAST(count(*) AS DOUBLE) AS n_docs
              FROM documents
            ),
            tf AS (
              SELECT doc_id, tok, CAST(count(*) AS DOUBLE) AS tf FROM nz
              WHERE tok IN ('merge', 'join', 'batch') GROUP BY doc_id, tok
            ),
            dfx AS (
              SELECT tok, CAST(count(*) AS DOUBLE) AS dfv FROM tf GROUP BY tok
            ),
            bm25 AS (
              SELECT doc_id, round(sum(
                       ln(1.0 + (s.n_docs - dfx.dfv + 0.5) / (dfx.dfv + 0.5))
                       * tf.tf * 2.2
                       / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / s.avgdl))
                     ), 6) AS score
              FROM tf JOIN dfx USING (tok) JOIN dl USING (doc_id)
                   CROSS JOIN scalars s
              GROUP BY doc_id
            ),
            bm25_ranked AS (
              SELECT doc_id, rank_a FROM (
                SELECT doc_id, row_number() OVER (
                  ORDER BY score DESC, doc_id ASC) AS rank_a
                FROM bm25
              ) WHERE rank_a <= 15
            ),
            bigt AS (SELECT CAST(count(*) AS DOUBLE) AS t FROM nz),
            cf AS (
              SELECT tok, CAST(count(*) AS DOUBLE) AS cf FROM nz
              WHERE tok IN ('merge', 'join', 'batch') GROUP BY tok
            ),
            qlm AS (
              SELECT tf.doc_id,
                     sum(ln(1.0 + tf.tf * bigt.t / (2000.0 * cf.cf))) AS m
              FROM tf JOIN cf USING (tok) CROSS JOIN bigt
              GROUP BY tf.doc_id
            ),
            ql AS (
              SELECT qlm.doc_id,
                     round(m + 3.0 * ln(2000.0 / (dl.dl + 2000.0)), 6)
                       AS score
              FROM qlm JOIN dl USING (doc_id)
            ),
            ql_ranked AS (
              SELECT doc_id, rank_b FROM (
                SELECT doc_id, row_number() OVER (
                  ORDER BY score DESC, doc_id ASC) AS rank_b
                FROM ql
              ) WHERE rank_b <= 15
            ),
            fused AS (
              SELECT coalesce(a.doc_id, b.doc_id) AS doc_id,
                     a.rank_a, b.rank_b,
                     round(coalesce(1.0 / (60 + a.rank_a), 0.0)
                           + coalesce(1.0 / (60 + b.rank_b), 0.0), 6)
                       AS rrf_score
              FROM bm25_ranked a FULL OUTER JOIN ql_ranked b
                ON a.doc_id = b.doc_id
            )
            SELECT doc_id, CAST(rank_a AS BIGINT) AS rank_a,
                   CAST(rank_b AS BIGINT) AS rank_b, rrf_score,
                   CAST(rank AS BIGINT) AS rank
            FROM (
              SELECT *, row_number() OVER (
                ORDER BY rrf_score DESC, doc_id ASC) AS rank
              FROM fused
            ) WHERE rank <= 10
        """,
        "b30_ql_search": f"""
            WITH toks AS (
              SELECT doc_id, unnest(string_split({_NORM_SQL}, ' ')) AS tok
              FROM documents
            ),
            nz AS (SELECT doc_id, tok FROM toks WHERE tok <> ''),
            dl AS (
              SELECT doc_id, CAST(count(*) AS DOUBLE) AS dl
              FROM nz GROUP BY doc_id
            ),
            bigt AS (SELECT CAST(count(*) AS DOUBLE) AS t FROM nz),
            cf AS (
              SELECT tok, CAST(count(*) AS DOUBLE) AS cf FROM nz
              WHERE tok IN ('merge', 'join', 'batch') GROUP BY tok
            ),
            tf AS (
              SELECT doc_id, tok, CAST(count(*) AS DOUBLE) AS tf FROM nz
              WHERE tok IN ('merge', 'join', 'batch') GROUP BY doc_id, tok
            ),
            matched AS (
              SELECT tf.doc_id,
                     sum(ln(1.0 + tf.tf * bigt.t / (2000.0 * cf.cf)))
                       AS m,
                     CAST(count(*) AS BIGINT) AS n_terms_hit
              FROM tf JOIN cf USING (tok) CROSS JOIN bigt
              GROUP BY tf.doc_id
            ),
            scored AS (
              SELECT matched.doc_id,
                     round(m + 3.0 * ln(2000.0 / (dl.dl + 2000.0)), 6)
                       AS score,
                     n_terms_hit
              FROM matched JOIN dl USING (doc_id)
            )
            SELECT doc_id, score, n_terms_hit, CAST(rank AS BIGINT) AS rank
            FROM (
              SELECT *, row_number() OVER (
                ORDER BY score DESC, doc_id ASC) AS rank
              FROM scored
            ) WHERE rank <= 15
        """,
        "b30_query_expansion": f"""
            WITH tk AS (
              SELECT doc_id,
                     list_filter(string_split({_NORM_SQL}, ' '),
                                 t -> t <> '') AS toks
              FROM documents
            ),
            pos AS (
              SELECT doc_id, toks,
                     unnest(generate_series(1, len(toks))) AS i
              FROM tk
            ),
            raw AS (
              SELECT least(toks[i], toks[i + d]) AS tok_a,
                     greatest(toks[i], toks[i + d]) AS tok_b
              FROM pos, unnest(generate_series(1, 2)) AS dd(d)
              WHERE i + d <= len(toks)
            ),
            cnts AS (
              SELECT tok_a, tok_b, count(*) AS n_pair FROM raw
              GROUP BY tok_a, tok_b
            ),
            uni AS (
              SELECT tok, count(*) AS cnt FROM (
                SELECT unnest(string_split({_NORM_SQL}, ' ')) AS tok
                FROM documents
              ) WHERE tok <> '' GROUP BY tok
            ),
            scal AS (
              SELECT (SELECT CAST(sum(n_pair) AS DOUBLE) FROM cnts) AS p_tot,
                     (SELECT CAST(sum(cnt) AS DOUBLE) FROM uni) AS t_tot
            ),
            pmi AS (
              SELECT c.tok_a, c.tok_b, CAST(c.n_pair AS BIGINT) AS n_pair,
                     round(ln((c.n_pair / s.p_tot)
                              / ((ua.cnt / s.t_tot) * (ub.cnt / s.t_tot))),
                           6) AS pmi
              FROM cnts c
              JOIN uni ua ON c.tok_a = ua.tok
              JOIN uni ub ON c.tok_b = ub.tok
              CROSS JOIN scal s
              WHERE c.n_pair >= 8
            ),
            partners AS (
              SELECT tok_a AS seed, tok_b AS partner, n_pair, pmi FROM pmi
              WHERE tok_a IN ('merge', 'join', 'batch')
              UNION ALL
              SELECT tok_b AS seed, tok_a AS partner, n_pair, pmi FROM pmi
              WHERE tok_b IN ('merge', 'join', 'batch')
            )
            SELECT seed, partner, n_pair, pmi, CAST(rank AS BIGINT) AS rank
            FROM (
              SELECT *, row_number() OVER (
                PARTITION BY seed ORDER BY pmi DESC, partner ASC) AS rank
              FROM partners
            ) WHERE rank <= 5
        """,
        "b30_assoc_rules": """
            WITH base AS (
              SELECT event_id, user_id, event_type,
                     CAST(floor(epoch(ts)) AS BIGINT) AS sec
              FROM events
            ),
            marked AS (
              SELECT *, CASE WHEN sec - lag(sec, 1) OVER (
                       PARTITION BY user_id
                       ORDER BY sec ASC, event_id ASC) > 1800
                     THEN 1 ELSE 0 END AS newf
              FROM base
            ),
            sessioned AS (
              SELECT user_id, event_type,
                     sum(newf) OVER (
                       PARTITION BY user_id
                       ORDER BY sec ASC, event_id ASC
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       + 1 AS session_id
              FROM marked
            ),
            items AS (
              SELECT DISTINCT user_id, session_id, event_type AS item
              FROM sessioned
            ),
            nb AS (
              SELECT CAST(count(*) AS BIGINT) AS n FROM (
                SELECT DISTINCT user_id, session_id FROM items)
            ),
            supp AS (
              SELECT item, CAST(count(*) AS BIGINT) AS s
              FROM items GROUP BY item
            ),
            pairs AS (
              SELECT a.item AS item_a, b.item AS item_b,
                     CAST(count(*) AS BIGINT) AS n_ab
              FROM items a JOIN items b
                ON a.user_id = b.user_id AND a.session_id = b.session_id
              WHERE a.item < b.item
              GROUP BY a.item, b.item
            )
            SELECT item_a, item_b, n_ab,
                   sa.s AS n_a, sb.s AS n_b,
                   round(n_ab / CAST(sa.s AS DOUBLE), 6) AS conf_a_to_b,
                   round(n_ab / CAST(sb.s AS DOUBLE), 6) AS conf_b_to_a,
                   round(nb.n * n_ab / CAST(sa.s * sb.s AS DOUBLE), 6)
                     AS lift
            FROM pairs
            JOIN supp sa ON sa.item = pairs.item_a
            JOIN supp sb ON sb.item = pairs.item_b
            CROSS JOIN nb
        """,
        "b30_bool_search": f"""
            WITH toks AS (
              SELECT doc_id, unnest(string_split({_NORM_SQL}, ' ')) AS tok
              FROM documents
            )
            SELECT doc_id, CAST(count(*) AS BIGINT) AS n_hits
            FROM toks
            WHERE tok IN ('batch', 'join', 'merge')
            GROUP BY doc_id
            HAVING count(DISTINCT tok) = 3
        """,
        "b30_kneser_ney": f"""
            WITH tk AS (
              SELECT doc_id,
                     list_filter(string_split({_NORM_SQL}, ' '),
                                 t -> t <> '') AS toks
              FROM documents
            ),
            occ AS (
              SELECT toks[i] AS a, toks[i + 1] AS b
              FROM tk, unnest(generate_series(1, len(toks) - 1)) AS t(i)
            ),
            bg AS (
              SELECT a, b, CAST(count(*) AS BIGINT) AS cnt
              FROM occ GROUP BY a, b
            ),
            ctx AS (
              SELECT a, CAST(sum(cnt) AS BIGINT) AS ca,
                     CAST(count(*) AS BIGINT) AS n1f
              FROM bg GROUP BY a
            ),
            bwd AS (
              SELECT b, CAST(count(*) AS BIGINT) AS n1b FROM bg GROUP BY b
            ),
            nbt AS (SELECT CAST(count(*) AS BIGINT) AS nbt FROM bg)
            SELECT bg.a, bg.b, cnt,
                   round(greatest(cnt - 0.75, 0.0) / CAST(ca AS DOUBLE)
                         + ((0.75 * n1f) / CAST(ca AS DOUBLE))
                           * (n1b / CAST(nbt AS DOUBLE)), 6) AS p_kn,
                   round((0.75 * n1f) / CAST(ca AS DOUBLE), 6) AS lam,
                   round(n1b / CAST(nbt AS DOUBLE), 6) AS p_cont
            FROM bg JOIN ctx ON ctx.a = bg.a
                    JOIN bwd ON bwd.b = bg.b
                    CROSS JOIN nbt
        """,
        "b30_bigram_xent": f"""
            WITH tk AS (
              SELECT doc_id,
                     list_filter(string_split({_NORM_SQL}, ' '),
                                 t -> t <> '') AS toks
              FROM documents
            ),
            occ AS (
              SELECT doc_id, toks[i] AS a, toks[i + 1] AS b
              FROM tk, unnest(generate_series(1, len(toks) - 1)) AS t(i)
            ),
            per_doc AS (
              SELECT doc_id, a, b, CAST(count(*) AS DOUBLE) AS c
              FROM occ GROUP BY doc_id, a, b
            ),
            gb AS (
              SELECT a, b, CAST(count(*) AS DOUBLE) AS cab
              FROM occ GROUP BY a, b
            ),
            ctx AS (
              SELECT a, CAST(count(*) AS DOUBLE) AS ca FROM occ GROUP BY a
            ),
            uni AS (
              SELECT tok, count(*) AS cnt FROM (
                SELECT unnest(string_split({_NORM_SQL}, ' ')) AS tok
                FROM documents
              ) WHERE tok <> '' GROUP BY tok
            ),
            scal AS (
              SELECT CAST(sum(cnt) AS DOUBLE) AS t_tot,
                     CAST(count(*) AS DOUBLE) AS v_size
              FROM uni
            ),
            agg AS (
              SELECT d.doc_id,
                     CAST(sum(d.c) AS BIGINT) AS n_pairs,
                     -- (1.0 - 0.7), not 0.3: the Spark side computes the
                     -- interpolation weight as 1-λ in IEEE doubles, and
                     -- the literal 0.3 parses to a DIFFERENT double one
                     -- ulp away; the subtraction folds identically
                     sum(d.c * ln(0.7 * (g.cab / x.ca)
                                  + (1.0 - 0.7) * ((u.cnt + 1.0)
                                           / (s.t_tot + 1.0 * s.v_size))))
                       AS num
              FROM per_doc d
              JOIN gb g ON d.a = g.a AND d.b = g.b
              JOIN ctx x ON d.a = x.a
              JOIN uni u ON d.b = u.tok
              CROSS JOIN scal s
              GROUP BY d.doc_id
            )
            SELECT doc_id, n_pairs,
                   round(-num / CAST(n_pairs AS DOUBLE), 6) AS xent
            FROM agg
        """,
        "b30_inverted_index": f"""
            WITH dt AS (
              SELECT DISTINCT doc_id, tok FROM (
                SELECT doc_id, unnest(string_split({_NORM_SQL}, ' ')) AS tok
                FROM documents
              ) WHERE tok <> ''
            ),
            agg AS (
              SELECT tok, CAST(count(*) AS BIGINT) AS df_t,
                     array_to_string(list_sort(list(doc_id)), ',')
                       AS postings_csv
              FROM dt GROUP BY tok
            )
            SELECT tok, df_t, postings_csv FROM agg
            WHERE df_t >= 2 AND df_t <= 100000
        """,
        "b30_pmi": f"""
            WITH tk AS (
              SELECT doc_id,
                     list_filter(string_split({_NORM_SQL}, ' '),
                                 t -> t <> '') AS toks
              FROM documents
            ),
            pos AS (
              SELECT doc_id, toks,
                     unnest(generate_series(1, len(toks))) AS i
              FROM tk
            ),
            raw AS (
              SELECT least(toks[i], toks[i + d]) AS tok_a,
                     greatest(toks[i], toks[i + d]) AS tok_b
              FROM pos, unnest(generate_series(1, 2)) AS dd(d)
              WHERE i + d <= len(toks)
            ),
            cnts AS (
              SELECT tok_a, tok_b, count(*) AS n_pair FROM raw
              GROUP BY tok_a, tok_b
            ),
            uni AS (
              SELECT tok, count(*) AS cnt FROM (
                SELECT unnest(string_split({_NORM_SQL}, ' ')) AS tok
                FROM documents
              ) WHERE tok <> '' GROUP BY tok
            ),
            scal AS (
              SELECT (SELECT CAST(sum(n_pair) AS DOUBLE) FROM cnts) AS p_tot,
                     (SELECT CAST(sum(cnt) AS DOUBLE) FROM uni) AS t_tot
            )
            SELECT c.tok_a, c.tok_b, CAST(c.n_pair AS BIGINT) AS n_pair,
                   round(ln((c.n_pair / s.p_tot)
                            / ((ua.cnt / s.t_tot) * (ub.cnt / s.t_tot))), 6)
                     AS pmi
            FROM cnts c
            JOIN uni ua ON c.tok_a = ua.tok
            JOIN uni ub ON c.tok_b = ub.tok
            CROSS JOIN scal s
            WHERE c.n_pair >= 8
        """,
        "b30_incremental_lm": f"""
            WITH eff AS (
              SELECT text FROM documents
              WHERE doc_id % 7 <> 0 AND doc_id % 11 <> 0
              UNION ALL
              SELECT text || ' zzz' AS text FROM documents
              WHERE doc_id % 7 = 0
            ),
            toks AS (
              SELECT unnest(string_split({_NORM_SQL}, ' ')) AS tok FROM eff
            )
            SELECT tok, CAST(count(*) AS BIGINT) AS cnt FROM toks
            WHERE tok <> '' GROUP BY tok
        """,
        "b30_pagerank": _pagerank_oracle_sql(),
        "b30_bpe_encode": _bpe_oracle_sql(),
        "b30_index_compression": f"""
            WITH dt AS (
              SELECT DISTINCT doc_id,
                     unnest(list_filter({_TOKS_SQL}, t -> t <> '')) AS tok
              FROM documents
            ),
            gaps AS (
              SELECT tok,
                     doc_id - COALESCE(lag(doc_id) OVER (
                       PARTITION BY tok ORDER BY doc_id), 0) AS gap
              FROM dt
            ),
            per AS (
              SELECT tok, CAST(count(*) AS BIGINT) AS df,
                     CAST(sum(CASE WHEN gap < 128 THEN 1
                                   WHEN gap < 16384 THEN 2
                                   WHEN gap < 2097152 THEN 3
                                   ELSE 4 END) AS BIGINT) AS vb
              FROM gaps GROUP BY tok
            )
            SELECT CAST(CASE WHEN df < 10 THEN 0 WHEN df < 100 THEN 1
                             WHEN df < 1000 THEN 2 WHEN df < 10000 THEN 3
                             ELSE 4 END AS INTEGER) AS df_decade,
                   CAST(count(*) AS BIGINT) AS n_terms,
                   CAST(sum(df) AS BIGINT) AS n_postings,
                   CAST(sum(df) * 8 AS BIGINT) AS raw_bytes,
                   CAST(sum(vb) AS BIGINT) AS varint_bytes,
                   round(CAST(sum(df) * 8 AS BIGINT)
                         / CAST(sum(vb) AS DOUBLE), 6) AS compression_x
            FROM per GROUP BY 1
        """,
        "b30_triangles": """
            WITH ev AS (
              SELECT DISTINCT user_id, event_type,
                     date_trunc('hour', ts) AS h
              FROM events
            ),
            e AS (
              SELECT a.user_id AS src, b.user_id AS dst
              FROM ev a JOIN ev b
                ON a.event_type = b.event_type AND a.h = b.h
                   AND a.user_id < b.user_id
              GROUP BY 1, 2 HAVING count(*) >= 5
            ),
            deg AS (
              SELECT node_id, CAST(count(*) AS BIGINT) AS degree FROM (
                SELECT src AS node_id FROM e
                UNION ALL SELECT dst FROM e
              ) GROUP BY node_id
            ),
            tri AS (
              SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
              FROM e e1
              JOIN e e2 ON e2.src = e1.dst
              JOIN e e3 ON e3.src = e1.src AND e3.dst = e2.dst
            ),
            corner AS (
              SELECT node_id, CAST(count(*) AS BIGINT) AS triangles FROM (
                SELECT unnest([a, b, c]) AS node_id FROM tri
              ) GROUP BY node_id
            )
            SELECT deg.node_id, degree,
                   COALESCE(triangles, 0) AS triangles,
                   CASE WHEN degree >= 2 THEN
                     round(2.0 * COALESCE(triangles, 0)
                           / (CAST(degree AS DOUBLE)
                              * (CAST(degree AS DOUBLE) - 1.0)), 6)
                   ELSE 0.0 END AS cc
            FROM deg LEFT JOIN corner ON corner.node_id = deg.node_id
        """,
        "b30_ndcg": f"""
            WITH toks AS (
              SELECT doc_id, unnest(string_split({_NORM_SQL}, ' ')) AS tok
              FROM documents
            ),
            dl AS (
              SELECT doc_id, CAST(count(*) AS DOUBLE) AS dl FROM toks
              WHERE tok <> '' GROUP BY doc_id
            ),
            scalars AS (
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
                     ), 6) AS score
              FROM tf JOIN dfx USING (tok) JOIN dl USING (doc_id)
                   CROSS JOIN scalars s
              GROUP BY tf.doc_id
            ),
            retrieved AS (
              SELECT doc_id, rank FROM (
                SELECT doc_id, row_number() OVER (
                  ORDER BY score DESC, doc_id ASC) AS rank
                FROM scored
              ) WHERE rank <= 10
            ),
            rel AS (
              SELECT doc_id,
                     least(CAST(len(list_filter({_TOKS_SQL},
                                                t -> t = 'merge'))
                                AS BIGINT), 3) AS rel
              FROM documents
            ),
            wt AS (SELECT [{", ".join(str(w) for w in _NDCG_W)}] AS w),
            dcg AS (
              SELECT CAST(sum(COALESCE(rel.rel, 0) * w[rank]) AS BIGINT)
                       AS dcg_scaled
              FROM retrieved LEFT JOIN rel USING (doc_id), wt
            ),
            ideal AS (
              SELECT rel, row_number() OVER (
                ORDER BY rel DESC, doc_id ASC) AS rank
              FROM rel
            ),
            idcg AS (
              SELECT CAST(sum(rel * w[rank]) AS BIGINT) AS idcg_scaled
              FROM ideal, wt WHERE rank <= 10
            )
            SELECT dcg_scaled, idcg_scaled,
                   round(CAST(dcg_scaled AS DOUBLE)
                         / CAST(idcg_scaled AS DOUBLE), 6) AS ndcg
            FROM dcg, idcg
        """,
        # ---- round 9 wave 2 ---------------------------------------------
        "b30_kwic": f"""
            WITH tk AS (
              SELECT doc_id, {_TOKS_SQL} AS toks FROM documents
            ),
            pos AS (
              SELECT doc_id, i - 1 AS pos, toks[i] AS tok
              FROM tk, unnest(generate_series(1, len(toks))) AS t(i)
            ),
            m AS (
              SELECT DISTINCT a.doc_id, a.pos
              FROM pos a JOIN pos b
                ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
              WHERE a.tok = 'merge' AND b.tok = 'join'
            )
            SELECT m.doc_id, CAST(m.pos AS INTEGER) AS pos,
                   array_to_string(
                     list_slice(tk.toks, greatest(m.pos - 3, 0) + 1,
                                least(m.pos + 5, len(tk.toks))), ' ')
                     AS snippet
            FROM m JOIN tk ON m.doc_id = tk.doc_id
        """,
        "b30_bfs_hops": """
            WITH e AS (
              SELECT DISTINCT l_partkey AS p, l_suppkey AS s FROM lineitem
            ),
            seed AS (SELECT min(s) AS sk FROM e),
            d1 AS (
              SELECT DISTINCT p FROM e CROSS JOIN seed WHERE e.s = seed.sk
            ),
            d2 AS (
              SELECT DISTINCT e.s FROM e JOIN d1 USING (p)
              CROSS JOIN seed WHERE e.s <> seed.sk
            ),
            d3 AS (
              SELECT DISTINCT e.p FROM e JOIN d2 ON e.s = d2.s
              WHERE e.p NOT IN (SELECT p FROM d1)
            )
            SELECT 0 AS dist, 'supplier' AS node_type,
                   CAST(1 AS BIGINT) AS n_nodes
            UNION ALL
            SELECT 1, 'part', CAST(count(*) AS BIGINT) FROM d1
            UNION ALL
            SELECT 2, 'supplier', CAST(count(*) AS BIGINT) FROM d2
            UNION ALL
            SELECT 3, 'part', CAST(count(*) AS BIGINT) FROM d3
        """,
        "b30_hits": """
            WITH e AS (
              SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
            ),
            a1 AS (
              SELECT l_partkey, CAST(count(*) AS BIGINT) AS auth1
              FROM e GROUP BY l_partkey
            ),
            h1 AS (
              SELECT e.l_suppkey, CAST(sum(a1.auth1) AS BIGINT) AS hub1
              FROM e JOIN a1 USING (l_partkey) GROUP BY e.l_suppkey
            ),
            a2 AS (
              SELECT e.l_partkey, CAST(sum(h1.hub1) AS BIGINT) AS auth2
              FROM e JOIN h1 USING (l_suppkey) GROUP BY e.l_partkey
            )
            SELECT a2.l_partkey AS partkey, a1.auth1, a2.auth2,
                   CAST(row_number() OVER (
                     ORDER BY a2.auth2 DESC, a2.l_partkey ASC) AS BIGINT)
                     AS rank
            FROM a2 JOIN a1 USING (l_partkey)
            ORDER BY a2.auth2 DESC, a2.l_partkey ASC LIMIT 10
        """,
        "b30_rank_eval": f"""
            WITH toks AS (
              SELECT doc_id, unnest(string_split({_NORM_SQL}, ' ')) AS tok
              FROM documents
            ),
            dl AS (
              SELECT doc_id, CAST(count(*) AS DOUBLE) AS dl FROM toks
              WHERE tok <> '' GROUP BY doc_id
            ),
            scalars AS (
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
                     ), 6) AS score
              FROM tf JOIN dfx USING (tok) JOIN dl USING (doc_id)
                   CROSS JOIN scalars s
              GROUP BY tf.doc_id
            ),
            retrieved AS (
              SELECT doc_id, rank FROM (
                SELECT doc_id, row_number() OVER (
                  ORDER BY score DESC, doc_id ASC) AS rank
                FROM scored
              ) WHERE rank <= 10
            ),
            rel AS (
              SELECT doc_id,
                     CASE WHEN len(list_filter({_TOKS_SQL},
                                               t -> t = 'merge')) >= 2
                          THEN 1 ELSE 0 END AS rel
              FROM documents
            ),
            r10 AS (
              SELECT rank, COALESCE(rel.rel, 0) AS rel
              FROM retrieved LEFT JOIN rel USING (doc_id)
            ),
            cum AS (
              SELECT rank, rel,
                     CAST(sum(rel) OVER (
                       ORDER BY rank ROWS UNBOUNDED PRECEDING) AS BIGINT)
                       AS relcum
              FROM r10
            ),
            nrel AS (SELECT CAST(sum(rel) AS BIGINT) AS r FROM rel),
            m AS (
              SELECT CAST(sum(rel) AS BIGINT) AS hits10,
                     min(CASE WHEN rel = 1 THEN rank END) AS fr,
                     CAST(sum(CASE WHEN rel = 1
                                   THEN (relcum * 1000000) // rank
                                   ELSE 0 END) AS BIGINT) AS apnum
              FROM cum
            )
            SELECT r AS n_rel_corpus, hits10,
                   CAST(COALESCE(fr, 0) AS INT) AS first_rel_rank,
                   CAST(COALESCE(1000000 // fr, 0) AS BIGINT) AS rr_micros,
                   CAST(apnum // greatest(least(r, 10), 1) AS BIGINT)
                     AS ap10_micros,
                   CAST((hits10 * 1000000) // 10 AS BIGINT) AS p10_micros,
                   CAST((hits10 * 1000000) // greatest(r, 1) AS BIGINT)
                     AS recall10_micros
            FROM m, nrel
        """,
        "b30_link_prediction": """
            WITH e AS (
              SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
            ),
            pd AS (
              SELECT l_partkey FROM e GROUP BY l_partkey
              HAVING count(*) <= 64
            ),
            c AS (
              SELECT e.l_partkey, e.l_suppkey FROM e JOIN pd USING (l_partkey)
            ),
            sd AS (
              SELECT l_suppkey, CAST(count(*) AS BIGINT) AS deg
              FROM e GROUP BY l_suppkey
            ),
            sh AS (
              SELECT a.l_suppkey AS s1, b.l_suppkey AS s2,
                     CAST(count(*) AS BIGINT) AS n_shared
              FROM c a JOIN c b
                ON a.l_partkey = b.l_partkey AND a.l_suppkey < b.l_suppkey
              GROUP BY a.l_suppkey, b.l_suppkey
            ),
            sc AS (
              SELECT s1, s2, n_shared,
                     CAST((n_shared * 1000000)
                          // (d1.deg + d2.deg - n_shared) AS BIGINT)
                       AS jaccard_micros
              FROM sh JOIN sd d1 ON sh.s1 = d1.l_suppkey
                      JOIN sd d2 ON sh.s2 = d2.l_suppkey
            )
            SELECT s1, s2, n_shared, jaccard_micros,
                   CAST(row_number() OVER (
                     ORDER BY jaccard_micros DESC, s1 ASC, s2 ASC) AS BIGINT)
                     AS rank
            FROM sc ORDER BY jaccard_micros DESC, s1 ASC, s2 ASC LIMIT 20
        """,
    "b30_ppr": _ppr_oracle_sql(),
    "b30_modularity": f"""
        WITH RECURSIVE pf AS ({_prefix_filter_oracle_sql(0.5)}),
        labels AS ({_dup_clusters_oracle_sql()}),
        e AS (SELECT id_a, id_b FROM pf),
        le AS (
          SELECT e.id_a, e.id_b,
                 coalesce(la.cluster_id, e.id_a) AS ca,
                 coalesce(lb.cluster_id, e.id_b) AS cb
          FROM e
          LEFT JOIN labels la ON la.doc_id = e.id_a
          LEFT JOIN labels lb ON lb.doc_id = e.id_b
        ),
        m AS (SELECT CAST(count(*) AS BIGINT) AS m FROM le),
        intra AS (
          SELECT ca AS c, CAST(count(*) AS BIGINT) AS ec
          FROM le WHERE ca = cb GROUP BY ca
        ),
        deg AS (
          SELECT node, c, CAST(count(*) AS BIGINT) AS d FROM (
            SELECT id_a AS node, ca AS c FROM le
            UNION ALL
            SELECT id_b AS node, cb AS c FROM le
          ) GROUP BY node, c
        ),
        dc AS (SELECT c, CAST(sum(d) AS BIGINT) AS dsum FROM deg GROUP BY c),
        agg AS (
          SELECT CAST(sum(coalesce(intra.ec, 0)) AS BIGINT) AS sum_ec,
                 CAST(sum(dc.dsum * dc.dsum) AS BIGINT) AS sum_d2,
                 CAST(count(*) AS BIGINT) AS n_communities
          FROM dc LEFT JOIN intra ON intra.c = dc.c
        )
        SELECT m.m AS n_edges, agg.sum_ec AS n_intra,
               CAST(m.m - agg.sum_ec AS BIGINT) AS n_inter,
               agg.n_communities,
               round(CAST(4 * m.m * agg.sum_ec - agg.sum_d2 AS DOUBLE)
                     / CAST(4 * m.m * m.m AS DOUBLE), 6) AS q_modularity
        FROM m, agg
    """,

        "b30_hash_walks": """
            WITH li AS (
              SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
            ),
            edges AS (
              SELECT l_partkey AS src, l_suppkey + 1000000 AS dst FROM li
              UNION ALL
              SELECT l_suppkey + 1000000 AS src, l_partkey AS dst FROM li
            ),
            ranked AS (
              SELECT src, dst,
                     row_number() OVER (PARTITION BY src ORDER BY dst) - 1
                       AS r
              FROM edges
            ),
            deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src),
            seeds AS (
              SELECT DISTINCT l_partkey AS seed FROM li
              ORDER BY seed LIMIT 8
            ),
            s0 AS (
              SELECT seed * 4 + w AS walker_id, seed, seed AS node,
                     CAST(seed AS VARCHAR) AS path
              FROM seeds, (SELECT unnest(generate_series(0, 3)) AS w)
            ),
            s1 AS (
              SELECT w.walker_id, w.seed, r.dst AS node,
                     w.path || '>' || CAST(r.dst AS VARCHAR) AS path
              FROM s0 w
              JOIN deg ON deg.src = w.node
              JOIN ranked r ON r.src = w.node
               AND r.r = CAST('0x' || substr(md5(
                     CAST(w.walker_id AS VARCHAR) || '|1|' ||
                     CAST(w.node AS VARCHAR)), 1, 15) AS BIGINT) % deg.deg
            ),
            s2 AS (
              SELECT w.walker_id, w.seed, r.dst AS node,
                     w.path || '>' || CAST(r.dst AS VARCHAR) AS path
              FROM s1 w
              JOIN deg ON deg.src = w.node
              JOIN ranked r ON r.src = w.node
               AND r.r = CAST('0x' || substr(md5(
                     CAST(w.walker_id AS VARCHAR) || '|2|' ||
                     CAST(w.node AS VARCHAR)), 1, 15) AS BIGINT) % deg.deg
            ),
            s3 AS (
              SELECT w.walker_id, w.seed, r.dst AS node,
                     w.path || '>' || CAST(r.dst AS VARCHAR) AS path
              FROM s2 w
              JOIN deg ON deg.src = w.node
              JOIN ranked r ON r.src = w.node
               AND r.r = CAST('0x' || substr(md5(
                     CAST(w.walker_id AS VARCHAR) || '|3|' ||
                     CAST(w.node AS VARCHAR)), 1, 15) AS BIGINT) % deg.deg
            )
            SELECT walker_id, seed, node AS end_node, path FROM s3
        """,

        "b30_label_propagation": _label_propagation_oracle_sql(),

        "b30_neighborhood_jaccard": """
            WITH edges AS (
              SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
            ),
            capped AS (
              SELECT l_partkey FROM edges
              GROUP BY l_partkey HAVING count(*) <= 16
            ),
            sub AS (
              SELECT e.l_partkey, e.l_suppkey
              FROM edges e JOIN capped c ON c.l_partkey = e.l_partkey
            ),
            deg AS (
              SELECT l_suppkey, CAST(count(*) AS BIGINT) AS d
              FROM sub GROUP BY l_suppkey
            ),
            pairs AS (
              SELECT a.l_suppkey AS s1, b.l_suppkey AS s2,
                     CAST(count(*) AS BIGINT) AS n_shared
              FROM sub a JOIN sub b
                ON a.l_partkey = b.l_partkey
               AND a.l_suppkey < b.l_suppkey
              GROUP BY 1, 2
            ),
            scored AS (
              SELECT p.s1, p.s2, p.n_shared,
                     d1.d AS deg1, d2.d AS deg2,
                     p.n_shared * 1000000
                       // (d1.d + d2.d - p.n_shared) AS jaccard_x1e6
              FROM pairs p
              JOIN deg d1 ON d1.l_suppkey = p.s1
              JOIN deg d2 ON d2.l_suppkey = p.s2
            )
            SELECT s1, s2, n_shared, deg1, deg2, jaccard_x1e6,
                   CAST(row_number() OVER (
                     ORDER BY jaccard_x1e6 DESC, s1 ASC, s2 ASC)
                     AS BIGINT) AS rnk
            FROM scored
            ORDER BY jaccard_x1e6 DESC, s1 ASC, s2 ASC
            LIMIT 20
        """,

        "b30_kcore": """
            WITH ed AS (
              SELECT DISTINCT o_custkey AS c, l_suppkey + 1000000 AS s
              FROM orders JOIN lineitem ON o_orderkey = l_orderkey
            ),
            e0 AS (
              SELECT c AS src, s AS dst FROM ed
              UNION ALL
              SELECT s AS src, c AS dst FROM ed
            ),
            k1 AS (
              SELECT src FROM e0 GROUP BY src HAVING count(*) >= 3
            ),
            e1 AS (
              SELECT e.src, e.dst FROM e0 e
              WHERE e.src IN (SELECT src FROM k1)
                AND e.dst IN (SELECT src FROM k1)
            ),
            k2 AS (
              SELECT src FROM e1 GROUP BY src HAVING count(*) >= 3
            ),
            e2 AS (
              SELECT e.src, e.dst FROM e1 e
              WHERE e.src IN (SELECT src FROM k2)
                AND e.dst IN (SELECT src FROM k2)
            ),
            k3 AS (
              SELECT src FROM e2 GROUP BY src HAVING count(*) >= 3
            ),
            e3 AS (
              SELECT e.src, e.dst FROM e2 e
              WHERE e.src IN (SELECT src FROM k3)
                AND e.dst IN (SELECT src FROM k3)
            ),
            stats AS (
              SELECT CAST(0 AS BIGINT) AS round,
                     CAST(count(*) AS BIGINT) AS n_nodes,
                     CAST(coalesce(sum(d), 0) AS BIGINT) AS n_edges,
                     CAST(min(d) AS BIGINT) AS min_deg,
                     CAST(max(d) AS BIGINT) AS max_deg
              FROM (SELECT src, count(*) AS d FROM e0 GROUP BY src)
              UNION ALL
              SELECT CAST(1 AS BIGINT) AS round,
                     CAST(count(*) AS BIGINT) AS n_nodes,
                     CAST(coalesce(sum(d), 0) AS BIGINT) AS n_edges,
                     CAST(min(d) AS BIGINT) AS min_deg,
                     CAST(max(d) AS BIGINT) AS max_deg
              FROM (SELECT src, count(*) AS d FROM e1 GROUP BY src)
              UNION ALL
              SELECT CAST(2 AS BIGINT) AS round,
                     CAST(count(*) AS BIGINT) AS n_nodes,
                     CAST(coalesce(sum(d), 0) AS BIGINT) AS n_edges,
                     CAST(min(d) AS BIGINT) AS min_deg,
                     CAST(max(d) AS BIGINT) AS max_deg
              FROM (SELECT src, count(*) AS d FROM e2 GROUP BY src)
              UNION ALL
              SELECT CAST(3 AS BIGINT) AS round,
                     CAST(count(*) AS BIGINT) AS n_nodes,
                     CAST(coalesce(sum(d), 0) AS BIGINT) AS n_edges,
                     CAST(min(d) AS BIGINT) AS min_deg,
                     CAST(max(d) AS BIGINT) AS max_deg
              FROM (SELECT src, count(*) AS d FROM e3 GROUP BY src)
            )
            SELECT * FROM stats
        """,

        "b30_symspell": """
            -- SymSpell delete-neighborhood correction: both sides expand
            -- to {self} ∪ 1-deletions and meet on an exact variant key;
            -- verify with true levenshtein <= 1; rank dist asc, freq
            -- desc, term asc
            WITH toks AS (
              SELECT unnest(string_split(
                trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')),
                ' ')) AS term
              FROM documents
            ),
            vocab AS (
              SELECT term, CAST(count(*) AS BIGINT) AS freq
              FROM toks WHERE length(term) >= 4
              GROUP BY term HAVING count(*) >= 2
            ),
            dict_vars AS (
              SELECT DISTINCT term, freq, term AS variant FROM vocab
              UNION
              -- unnest(range(..)) bounds the deletion positions by EACH
              -- term's own length (the engine expands sequence(1,
              -- length(term)) uncapped, so no fixed series ceiling)
              SELECT DISTINCT term, freq,
                     substr(term, 1, i - 1) || substr(term, i + 1)
                       AS variant
              FROM (SELECT term, freq,
                           unnest(range(1, length(term) + 1)) AS i
                    FROM vocab)
            ),
            queries AS (
              SELECT term AS src_term,
                     substr(term, 1, (length(term) + 1) // 2 - 1)
                       || substr(term, (length(term) + 1) // 2 + 1)
                       AS query_text
              FROM vocab WHERE freq >= 5 AND length(term) >= 5
            ),
            q_vars AS (
              SELECT DISTINCT src_term, query_text,
                     query_text AS variant FROM queries
              UNION
              SELECT DISTINCT src_term, query_text,
                     substr(query_text, 1, i - 1) || substr(query_text, i + 1)
              FROM (SELECT src_term, query_text,
                           unnest(range(1, length(query_text) + 1)) AS i
                    FROM queries)
            ),
            cand AS (
              SELECT DISTINCT q.src_term, q.query_text, d.term, d.freq
              FROM q_vars q JOIN dict_vars d USING (variant)
            ),
            verified AS (
              SELECT *,
                     CAST(levenshtein(query_text, term) AS BIGINT)
                       AS distance
              FROM cand
              WHERE levenshtein(query_text, term) <= 1
            ),
            ranked AS (
              SELECT *,
                     row_number() OVER (
                       PARTITION BY src_term
                       ORDER BY distance ASC, freq DESC, term ASC) AS rnk,
                     CAST(count(*) OVER (PARTITION BY src_term) AS BIGINT)
                       AS n_candidates
              FROM verified
            )
            SELECT src_term, query_text, term AS suggestion, distance,
                   freq AS suggestion_freq, n_candidates,
                   term = src_term AS recovered
            FROM ranked WHERE rnk = 1
        """,

        "b30_bellman_ford": """
            -- 4-round Bellman-Ford from nation 0 over min order-to-ship
            -- lag edges; round CTEs MATERIALIZED (each is referenced by
            -- both the union leg and the join leg of the next round -- the
            -- kcenter AS MATERIALIZED lesson, else 2^rounds re-evals)
            WITH edges AS MATERIALIZED (
              SELECT s.s_nationkey AS src, c.c_nationkey AS dst,
                     CAST(min(datediff('day', o.o_orderdate, l.l_shipdate))
                          AS BIGINT) AS w
              FROM lineitem l
              JOIN orders o ON o.o_orderkey = l.l_orderkey
              JOIN supplier s ON s.s_suppkey = l.l_suppkey
              JOIN customer c ON c.c_custkey = o.o_custkey
              WHERE s.s_nationkey <> c.c_nationkey
              GROUP BY 1, 2
            ),
            d0 AS (SELECT 0 AS node, CAST(0 AS BIGINT) AS dist),
            d1 AS MATERIALIZED (
              SELECT node, CAST(min(dist) AS BIGINT) AS dist FROM (
                SELECT node, dist FROM d0
                UNION ALL
                SELECT e.dst AS node, d.dist + e.w AS dist
                FROM d0 d JOIN edges e ON e.src = d.node
              ) GROUP BY node
            ),
            d2 AS MATERIALIZED (
              SELECT node, CAST(min(dist) AS BIGINT) AS dist FROM (
                SELECT node, dist FROM d1
                UNION ALL
                SELECT e.dst AS node, d.dist + e.w AS dist
                FROM d1 d JOIN edges e ON e.src = d.node
              ) GROUP BY node
            ),
            d3 AS MATERIALIZED (
              SELECT node, CAST(min(dist) AS BIGINT) AS dist FROM (
                SELECT node, dist FROM d2
                UNION ALL
                SELECT e.dst AS node, d.dist + e.w AS dist
                FROM d2 d JOIN edges e ON e.src = d.node
              ) GROUP BY node
            ),
            d4 AS MATERIALIZED (
              SELECT node, CAST(min(dist) AS BIGINT) AS dist FROM (
                SELECT node, dist FROM d3
                UNION ALL
                SELECT e.dst AS node, d.dist + e.w AS dist
                FROM d3 d JOIN edges e ON e.src = d.node
              ) GROUP BY node
            )
            SELECT CAST(n.n_nationkey AS BIGINT) AS nation,
                   d.dist AS dist_4hop
            FROM nation n LEFT JOIN d4 d ON d.node = n.n_nationkey
        """,
}
