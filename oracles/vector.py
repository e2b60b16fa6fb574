"""DuckDB oracle SQL — vector family (split from
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
        "b20_triplet_mining_ann": f"""
            WITH planes AS (
              SELECT p // 4 AS t, p % 4 AS pb, d,
                     CASE WHEN ((p * {similarity.PLANE_MIX} + d)
                                * {similarity.PLANE_KNUTH}) % 4294967296
                               < 2147483648 THEN 1 ELSE -1 END AS s
              FROM (SELECT unnest(generate_series(0, 47)) AS p),
                   (SELECT unnest(generate_series(0, 63)) AS d)
            ),
            comp AS (
              SELECT vec_id AS id, ds.d - 1 AS d,
                     CAST(floor(CAST(embedding[ds.d] AS DOUBLE) * 1000)
                          AS BIGINT) AS q
              FROM embeddings, (SELECT unnest(generate_series(1, 64)) AS d) ds
            ),
            dots AS (
              SELECT id, t, pb, sum(s * q) AS dp
              FROM comp JOIN planes USING (d) GROUP BY id, t, pb
            ),
            buckets AS (
              SELECT id, t,
                     CAST(sum(CASE WHEN dp >= 0
                                   THEN (CAST(1 AS BIGINT) << pb)
                                   ELSE 0 END) AS BIGINT) AS bucket
              FROM dots GROUP BY id, t
            ),
            ab AS (
              SELECT id AS aid, t,
                     unnest([bucket,
                             {", ".join(f"xor(bucket, {1 << i})" for i in range(4))}
                            ]) AS bucket
              FROM buckets WHERE id % 25 = 0
            ),
            cand AS (
              SELECT DISTINCT ab.aid, c.id AS cid
              FROM buckets c JOIN ab ON c.t = ab.t AND c.bucket = ab.bucket
              WHERE c.id <> ab.aid
            ),
            vecs AS (
              SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e, label
              FROM embeddings
            ),
            scored AS (
              SELECT cand.aid, av.label AS anchor_label, cand.cid,
                     (cv.label = av.label) AS same,
                     CASE WHEN sqrt(list_dot_product(av.e, av.e))
                               * sqrt(list_dot_product(cv.e, cv.e)) > 0
                          THEN list_dot_product(av.e, cv.e)
                               / (sqrt(list_dot_product(av.e, av.e))
                                  * sqrt(list_dot_product(cv.e, cv.e)))
                          ELSE 0.0 END AS s
              FROM cand
              JOIN vecs av ON av.vec_id = cand.aid
              JOIN vecs cv ON cv.vec_id = cand.cid
            ),
            pos AS (
              SELECT * FROM (
                SELECT aid, anchor_label, cid AS positive_id, s AS ps,
                       row_number() OVER (
                         PARTITION BY aid ORDER BY s DESC, cid) AS rn
                FROM scored WHERE same
              ) WHERE rn = 1
            ),
            neg AS (
              SELECT * FROM (
                SELECT aid, cid AS negative_id, s AS ns,
                       row_number() OVER (
                         PARTITION BY aid ORDER BY s DESC, cid) AS rn
                FROM scored WHERE NOT same
              ) WHERE rn = 1
            )
            SELECT pos.aid AS anchor_id, pos.anchor_label, pos.positive_id,
                   round(pos.ps, 6) AS pos_score, neg.negative_id,
                   round(neg.ns, 6) AS neg_score,
                   round(pos.ps - neg.ns, 6) AS margin,
                   neg.ns > pos.ps AS violation
            FROM pos JOIN neg ON pos.aid = neg.aid
            ORDER BY anchor_id
        """,
        "b20_ann_recall": _ann_recall_oracle_sql(),
        "b20_ann_lsh": _ann_lsh_topk_oracle_sql(),
        "b20_radius_search": _ann_lsh_radius_oracle_sql(),
        "b20_ann_ivf": _ann_ivf_topk_oracle_sql(),
        "b20_cosine_topk": """
            WITH q AS (
              SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
              FROM embeddings WHERE vec_id < 4
            ),
            c AS (
              SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS cv
              FROM embeddings
            ),
            scored AS (
              SELECT query_id, neighbor_id,
                     list_dot_product(qv, cv)
                     / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv)))
                     AS score
              FROM q, c WHERE neighbor_id != query_id
            ),
            ranked AS (
              SELECT *, row_number() OVER (
                PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rnk
              FROM scored
            )
            SELECT query_id, neighbor_id, round(score, 6) AS score,
                   CAST(rnk AS BIGINT) AS rnk
            FROM ranked WHERE rnk <= 5
        """,
        "b20_dim_truncation": """
            WITH per AS (
              SELECT vec_id, d.dim,
                     CAST(floor(sqrt(
                       list_dot_product(
                         list_slice(CAST(embedding AS DOUBLE[]), 1, d.dim),
                         list_slice(CAST(embedding AS DOUBLE[]), 1, d.dim))
                       / list_dot_product(CAST(embedding AS DOUBLE[]),
                                          CAST(embedding AS DOUBLE[]))
                     ) * 1e6) AS BIGINT) AS r6
              FROM embeddings,
                   (SELECT unnest([16, 32, 48]) AS dim) d
            )
            SELECT CAST(dim AS INTEGER) AS dim,
                   CAST(count(*) AS BIGINT) AS n_vecs,
                   round(sum(r6) / (count(*) * 1e6), 6) AS avg_retained,
                   round(min(r6) / 1e6, 6) AS min_retained
            FROM per GROUP BY dim
        """,
        "b20_vector_audit": """
            WITH dv AS (
              SELECT label,
                     list_transform(embedding,
                                    x -> CAST(x AS DOUBLE)) AS v
              FROM embeddings
            ),
            n AS (
              SELECT label, sqrt(list_dot_product(v, v)) AS nrm,
                     CASE WHEN len(list_filter(v, x -> isnan(x))) > 0
                          THEN 1 ELSE 0 END AS has_nan
              FROM dv
            )
            SELECT label, CAST(count(*) AS BIGINT) AS n_vecs,
                   round(avg(nrm), 6) AS mean_norm,
                   CAST(sum(CASE WHEN nrm = 0 THEN 1 ELSE 0 END) AS BIGINT)
                     AS n_zero,
                   CAST(sum(has_nan) AS BIGINT) AS n_nan
            FROM n GROUP BY label
        """,
        "b20_mean_pool": """
            WITH ex AS (
              SELECT label,
                     generate_subscripts(embedding, 1) AS dim,
                     CAST(unnest(embedding) AS DOUBLE) AS v
              FROM embeddings
            ),
            per_dim AS (
              SELECT label, dim, round(avg(v), 6) AS val
              FROM ex GROUP BY label, dim
            ),
            counts AS (
              SELECT label, CAST(count(*) AS BIGINT) AS n_vecs
              FROM embeddings GROUP BY label
            )
            SELECT c.label, c.n_vecs,
                   (SELECT string_agg(printf('%.6f', val), ',' ORDER BY dim)
                    FROM per_dim p
                    WHERE p.label = c.label) AS centroid_csv
            FROM counts c
        """,
        "b20_centroid_drift": """
            WITH ex AS (
              SELECT label,
                     generate_subscripts(embedding, 1) AS dim,
                     CAST(unnest(embedding) AS DOUBLE) AS v
              FROM embeddings
            ),
            per AS (
              SELECT label, dim, round(avg(v), 6) AS lv
              FROM ex GROUP BY label, dim
            ),
            gm AS (
              SELECT dim, round(avg(v), 6) AS gv
              FROM ex GROUP BY dim
            ),
            counts AS (
              SELECT label, CAST(count(*) AS BIGINT) AS n_vecs
              FROM embeddings GROUP BY label
            ),
            drift AS (
              SELECT label,
                     round(sqrt(sum((lv - gv) * (lv - gv))), 6) AS drift
              FROM per JOIN gm USING (dim) GROUP BY label
            )
            SELECT CAST(c.label AS INTEGER) AS label, c.n_vecs, d.drift
            FROM counts c JOIN drift d ON c.label = d.label
        """,
        "b20_covariance": """
            WITH ex AS (
              SELECT vec_id AS rid,
                     generate_subscripts(embedding, 1) - 1 AS dim,
                     CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000.0)
                          AS BIGINT) AS q
              FROM embeddings
            ),
            pairs AS (
              SELECT a.rid, a.dim AS i, b.dim AS j, a.q AS qi, b.q AS qj
              FROM ex a JOIN ex b ON a.rid = b.rid AND a.dim <= b.dim
            ),
            sums AS (
              SELECT i, j, CAST(count(*) AS DOUBLE) AS n,
                     CAST(sum(qi) AS DOUBLE) AS sx,
                     CAST(sum(qj) AS DOUBLE) AS sy,
                     CAST(sum(qi * qj) AS DOUBLE) AS sxy
              FROM pairs GROUP BY i, j
            )
            SELECT CAST(i AS INTEGER) AS i, CAST(j AS INTEGER) AS j,
                   round((sxy - sx * sy / n) / (n - 0.0)
                         / 1000000000000.0, 8) AS cov
            FROM sums
        """,
        "b20_kmeans": _kmeans_oracle_sql(),
        "b20_pq": """
            WITH comps AS (
              SELECT vec_id AS id,
                     CAST(floor((d - 1) / 8) AS INTEGER) AS s,
                     (d - 1) % 8 AS dd,
                     CAST(floor(CAST(e AS DOUBLE) * 1000.0) AS BIGINT) AS q
              FROM (
                SELECT vec_id, generate_subscripts(embedding, 1) AS d,
                       unnest(embedding) AS e
                FROM embeddings
              )
            ),
            seeds AS (
              SELECT s, dd, q AS cq,
                     dense_rank() OVER (PARTITION BY s ORDER BY id) - 1 AS code
              FROM comps WHERE id IN (3, 47, 91, 135, 179, 223, 267, 311)
            ),
            edist AS (
              SELECT c.id, c.s, sd.code,
                     sum((c.q - sd.cq) * (c.q - sd.cq)) AS dist
              FROM comps c JOIN seeds sd ON sd.s = c.s AND sd.dd = c.dd
              GROUP BY c.id, c.s, sd.code
            ),
            enc AS (
              SELECT id, s, code FROM (
                SELECT id, s, code,
                       row_number() OVER (PARTITION BY id, s
                                          ORDER BY dist, code) AS rn
                FROM edist
              ) WHERE rn = 1
            ),
            qtable AS (
              SELECT id AS query_id, s, code, dist AS td
              FROM edist WHERE id < 4
            ),
            scored AS (
              SELECT qt.query_id, e.id AS neighbor_id,
                     CAST(sum(qt.td) AS BIGINT) AS approx_dist
              FROM enc e JOIN qtable qt ON qt.s = e.s AND qt.code = e.code
              WHERE qt.query_id <> e.id
              GROUP BY qt.query_id, e.id
            )
            SELECT query_id, neighbor_id, approx_dist, rnk FROM (
              SELECT query_id, neighbor_id, approx_dist,
                     row_number() OVER (PARTITION BY query_id
                                        ORDER BY approx_dist, neighbor_id)
                       AS rnk
              FROM scored
            ) WHERE rnk <= 10
        """,
        "b20_hubness": """
            WITH q AS (
              SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
              FROM embeddings WHERE vec_id < 64
            ),
            c AS (
              SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS cv
              FROM embeddings
            ),
            scored AS (
              SELECT query_id, neighbor_id,
                     list_dot_product(qv, cv)
                     / (sqrt(list_dot_product(qv, qv))
                        * sqrt(list_dot_product(cv, cv))) AS score
              FROM q, c WHERE neighbor_id != query_id
            ),
            ranked AS (
              SELECT query_id, neighbor_id, row_number() OVER (
                PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rnk
              FROM scored
            ),
            occ AS (
              SELECT neighbor_id, CAST(count(*) AS BIGINT) AS occ
              FROM ranked WHERE rnk <= 10 GROUP BY neighbor_id
            )
            SELECT COALESCE(o.occ, 0) AS occ,
                   CAST(count(*) AS BIGINT) AS n_vecs
            FROM (SELECT vec_id AS neighbor_id FROM embeddings) v
            LEFT JOIN occ o ON v.neighbor_id = o.neighbor_id
            GROUP BY 1
        """,
        "b20_cos_histogram": """
            WITH q AS (
              SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
              FROM embeddings WHERE vec_id < 32
            ),
            c AS (
              SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS cv
              FROM embeddings
            ),
            scored AS (
              SELECT list_dot_product(qv, cv)
                     / (sqrt(list_dot_product(qv, qv))
                        * sqrt(list_dot_product(cv, cv))) AS score
              FROM q, c WHERE neighbor_id != query_id
            ),
            per AS (
              SELECT CAST(floor(score * 10) AS INTEGER) AS bucket,
                     CAST(count(*) AS BIGINT) AS n_pairs
              FROM scored GROUP BY 1
            ),
            t AS (SELECT CAST(sum(n_pairs) AS BIGINT) AS t FROM per)
            SELECT bucket, n_pairs,
                   round(CAST(n_pairs AS DOUBLE) / CAST(t AS DOUBLE), 6)
                     AS share
            FROM per, t
        """,
        "b20_recall_curve": _recall_curve_oracle_sql(),
        "b20_jl_projection": _jl_projection_oracle_sql(),
        # ---- round 9 wave 6 ---------------------------------------------
        "b20_triplet_mining": """
            WITH a AS (
              SELECT vec_id AS anchor_id, label AS anchor_label,
                     CAST(embedding AS DOUBLE[]) AS av
              FROM embeddings WHERE vec_id < 8
            ),
            c AS (
              SELECT vec_id AS neighbor_id, label AS neighbor_label,
                     CAST(embedding AS DOUBLE[]) AS cv
              FROM embeddings
            ),
            scored AS (
              SELECT anchor_id, anchor_label, neighbor_id,
                     anchor_label = neighbor_label AS same,
                     list_dot_product(av, cv)
                     / (sqrt(list_dot_product(av, av))
                        * sqrt(list_dot_product(cv, cv))) AS s
              FROM a, c WHERE neighbor_id != anchor_id
            ),
            pos AS (
              SELECT anchor_id, anchor_label,
                     neighbor_id AS positive_id, s AS ps
              FROM (
                SELECT *, row_number() OVER (
                  PARTITION BY anchor_id
                  ORDER BY s DESC, neighbor_id ASC) AS rn
                FROM scored WHERE same
              ) WHERE rn = 1
            ),
            neg AS (
              SELECT anchor_id, neighbor_id AS negative_id, s AS ns
              FROM (
                SELECT *, row_number() OVER (
                  PARTITION BY anchor_id
                  ORDER BY s DESC, neighbor_id ASC) AS rn
                FROM scored WHERE NOT same
              ) WHERE rn = 1
            )
            SELECT pos.anchor_id, pos.anchor_label, pos.positive_id,
                   round(ps, 6) AS pos_score,
                   neg.negative_id,
                   round(ns, 6) AS neg_score,
                   round(ps - ns, 6) AS margin,
                   ns > ps AS violation
            FROM pos JOIN neg USING (anchor_id)
        """,
    "b20_hubness_ann": f"""
        WITH planes AS (
          SELECT p // 4 AS t, p % 4 AS pb, d,
                 CASE WHEN ((p * {similarity.PLANE_MIX} + d)
                            * {similarity.PLANE_KNUTH}) % 4294967296
                           < 2147483648 THEN 1 ELSE -1 END AS s
          FROM (SELECT unnest(generate_series(0, 47)) AS p),
               (SELECT unnest(generate_series(0, 63)) AS d)
        ),
        comp AS (
          SELECT vec_id AS id, ds.d - 1 AS d,
                 CAST(floor(CAST(embedding[ds.d] AS DOUBLE) * 1000)
                      AS BIGINT) AS q
          FROM embeddings, (SELECT unnest(generate_series(1, 64)) AS d) ds
        ),
        dots AS (
          SELECT id, t, pb, sum(s * q) AS dp
          FROM comp JOIN planes USING (d) GROUP BY id, t, pb
        ),
        buckets AS (
          SELECT id, t,
                 CAST(sum(CASE WHEN dp >= 0
                               THEN (CAST(1 AS BIGINT) << pb)
                               ELSE 0 END) AS BIGINT) AS bucket
          FROM dots GROUP BY id, t
        ),
        pb AS (
          SELECT id AS pid, t,
                 unnest([bucket,
                         {", ".join(f"xor(bucket, {1 << i})" for i in range(4))}
                        ]) AS bucket
          FROM buckets WHERE id % 8 = 0
        ),
        cand AS (
          SELECT DISTINCT pb.pid, c.id AS cid
          FROM buckets c JOIN pb ON c.t = pb.t AND c.bucket = pb.bucket
          WHERE c.id <> pb.pid
        ),
        vecs AS (
          SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
        ),
        scored AS (
          SELECT cand.pid, cand.cid,
                 CASE WHEN sqrt(list_dot_product(pv.e, pv.e))
                           * sqrt(list_dot_product(cv.e, cv.e)) > 0
                      THEN list_dot_product(pv.e, cv.e)
                           / (sqrt(list_dot_product(pv.e, pv.e))
                              * sqrt(list_dot_product(cv.e, cv.e)))
                      ELSE 0.0 END AS s
          FROM cand
          JOIN vecs pv ON pv.vec_id = cand.pid
          JOIN vecs cv ON cv.vec_id = cand.cid
        ),
        topk AS (
          SELECT cid FROM (
            SELECT pid, cid, row_number() OVER (
              PARTITION BY pid ORDER BY s DESC, cid) AS rn
            FROM scored
          ) WHERE rn <= 10
        ),
        occ AS (
          SELECT cid, CAST(count(*) AS BIGINT) AS occ
          FROM topk GROUP BY cid
        ),
        per AS (
          SELECT coalesce(occ.occ, 0) AS occ
          FROM embeddings e LEFT JOIN occ ON occ.cid = e.vec_id
        )
        SELECT occ, CAST(count(*) AS BIGINT) AS n_vecs
        FROM per GROUP BY occ ORDER BY occ
    """,

        "b20_int8_quant": """
            WITH ex AS (
              SELECT vec_id,
                     generate_subscripts(embedding, 1) - 1 AS dim,
                     CAST(unnest(embedding) AS DOUBLE) AS v
              FROM embeddings
            ),
            scales AS (
              SELECT dim, max(abs(v)) AS s FROM ex GROUP BY dim
            ),
            rows_q AS (
              SELECT ex.dim, ex.v, scales.s,
                     CASE WHEN scales.s = 0.0 THEN 0.0
                          ELSE greatest(floor(ex.v * 127.0 / scales.s),
                                        -127.0) END AS q
              FROM ex JOIN scales USING (dim)
            ),
            rows_e AS (
              SELECT dim, v, s, q,
                     CASE WHEN s = 0.0 THEN 0.0
                          ELSE v - q * s / 127.0 END AS e
              FROM rows_q
            )
            SELECT CAST(dim AS INTEGER) AS dim,
                   round(max(abs(v)), 6) AS scale,
                   CAST(sum(floor(e * e * 1e12)) AS BIGINT) AS sse12,
                   CAST(sum(CASE WHEN abs(q) = 127.0 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_sat
            FROM rows_e GROUP BY dim
        """,

        "b20_matryoshka_recall": """
            WITH probes AS (
              SELECT vec_id, CAST(embedding AS DOUBLE[]) AS pv
              FROM embeddings WHERE vec_id % 50 = 0
            ),
            c AS (
              SELECT vec_id, CAST(embedding AS DOUBLE[]) AS cv
              FROM embeddings
            ),
            full_r AS (
              SELECT p.vec_id AS qid, c.vec_id AS nid,
                     row_number() OVER (PARTITION BY p.vec_id ORDER BY
                       list_dot_product(pv, cv)
                       / (sqrt(list_dot_product(pv, pv))
                          * sqrt(list_dot_product(cv, cv))) DESC,
                       c.vec_id ASC) AS rnk
              FROM probes p, c WHERE c.vec_id != p.vec_id
            ),
            full10 AS (SELECT qid, nid FROM full_r WHERE rnk <= 10),
            tr AS (
              SELECT d.dim, p.vec_id AS qid, c.vec_id AS nid,
                     row_number() OVER (PARTITION BY d.dim, p.vec_id
                       ORDER BY
                       list_dot_product(list_slice(pv, 1, d.dim),
                                        list_slice(cv, 1, d.dim))
                       / (sqrt(list_dot_product(list_slice(pv, 1, d.dim),
                                                list_slice(pv, 1, d.dim)))
                          * sqrt(list_dot_product(list_slice(cv, 1, d.dim),
                                                  list_slice(cv, 1, d.dim))))
                       DESC, c.vec_id ASC) AS rnk
              FROM probes p, c, (SELECT unnest([16, 32, 48]) AS dim) d
              WHERE c.vec_id != p.vec_id
            ),
            tr10 AS (SELECT dim, qid, nid FROM tr WHERE rnk <= 10),
            np AS (SELECT CAST(count(*) AS BIGINT) AS n_probes FROM probes),
            ov AS (
              SELECT dim, CAST(count(*) AS BIGINT) AS n_overlap
              FROM tr10 JOIN full10 USING (qid, nid) GROUP BY dim
            )
            SELECT CAST(ov.dim AS INTEGER) AS dim, np.n_probes, ov.n_overlap,
                   round(CAST(ov.n_overlap AS DOUBLE) / (10.0 * np.n_probes),
                         6) AS recall_at_10
            FROM ov CROSS JOIN np
        """,

        "b20_silhouette": f"""
            WITH labels AS (
              SELECT vec_id, cluster_id FROM ({_kmeans_oracle_sql()})
            ),
            q AS (
              SELECT vec_id,
                     generate_subscripts(embedding, 1) - 1 AS dim,
                     CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1e6)
                          AS BIGINT) AS qv
              FROM embeddings
            ),
            cent AS (
              SELECT l.cluster_id AS cid, q.dim,
                     CAST((sum(q.qv) - ((sum(q.qv) % count(*)) + count(*))
                           % count(*)) // count(*) AS BIGINT) AS cv
              FROM q JOIN labels l USING (vec_id)
              GROUP BY l.cluster_id, q.dim
            ),
            dists AS (
              SELECT q.vec_id, c.cid,
                     CAST(sum((q.qv - c.cv) * (q.qv - c.cv)) AS BIGINT) AS d2
              FROM q JOIN cent c USING (dim)
              GROUP BY q.vec_id, c.cid
            ),
            dl AS (
              SELECT d.vec_id, d.cid, d.d2, l.cluster_id
              FROM dists d JOIN labels l USING (vec_id)
            ),
            per AS (
              SELECT vec_id, min(cluster_id) AS cluster_id,
                     max(CASE WHEN cid = cluster_id THEN d2 END) AS a,
                     min(CASE WHEN cid <> cluster_id THEN d2 END) AS b
              FROM dl GROUP BY vec_id
            ),
            s AS (
              SELECT cluster_id,
                     CAST(floor(CAST(b - a AS DOUBLE)
                          / CAST(greatest(a, b, 1) AS DOUBLE) * 1e6)
                          AS BIGINT) AS s6
              FROM per
            )
            SELECT cluster_id,
                   CAST(count(*) AS BIGINT) AS n_points,
                   round(sum(s6) / (count(*) * 1e6), 6) AS mean_silhouette
            FROM s GROUP BY cluster_id
        """,

        "b28_kcenter_diversity": _kcenter_oracle_sql(),
        "b20_mmr_rerank": _mmr_oracle_sql(),

        # production composition (VERDICT r13 item 3): rel-top50
        # prefilter, then the same chained picks over 50 candidates
        "b20_mmr_topn": _mmr_oracle_sql(topn=50),

        "b20_ivf_probe_sweep": _ivf_probe_sweep_oracle_sql(),
}
