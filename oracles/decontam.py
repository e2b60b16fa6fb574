"""DuckDB oracle SQL — decontam family (split from
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
        "b29_semantic_decontam": """
            WITH b AS (
              SELECT vec_id AS bench_id, CAST(embedding AS DOUBLE[]) AS bv
              FROM embeddings WHERE vec_id % 50 = 0
            ),
            c AS (
              SELECT vec_id, CAST(embedding AS DOUBLE[]) AS cv
              FROM embeddings WHERE vec_id % 50 <> 0
            ),
            scored AS (
              SELECT c.vec_id, b.bench_id,
                     list_dot_product(cv, bv)
                     / (sqrt(list_dot_product(cv, cv))
                        * sqrt(list_dot_product(bv, bv))) AS s
              FROM c, b
            ),
            ranked AS (
              SELECT *, row_number() OVER (
                PARTITION BY vec_id ORDER BY s DESC, bench_id) AS rn
              FROM scored
            )
            SELECT vec_id, bench_id AS nearest_bench,
                   round(s, 6) AS max_cos,
                   round(s, 6) >= 0.35 AS contaminated
            FROM ranked WHERE rn = 1
        """,
        "b29_semantic_decontam_ann": f"""
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
            bb AS (
              SELECT id AS bench_id, t,
                     unnest([bucket,
                             {", ".join(f"xor(bucket, {1 << i})" for i in range(4))}
                            ]) AS bucket
              FROM buckets WHERE id % 50 = 0
            ),
            cand AS (
              SELECT DISTINCT c.id AS vec_id, bb.bench_id
              FROM buckets c JOIN bb ON c.t = bb.t AND c.bucket = bb.bucket
              WHERE c.id % 50 <> 0
            ),
            scored AS (
              SELECT cand.vec_id, cand.bench_id,
                     CASE WHEN sqrt(list_dot_product(cv.e, cv.e))
                               * sqrt(list_dot_product(bv.e, bv.e)) > 0
                          THEN list_dot_product(cv.e, bv.e)
                               / (sqrt(list_dot_product(cv.e, cv.e))
                                  * sqrt(list_dot_product(bv.e, bv.e)))
                          ELSE 0.0 END AS s
              FROM cand
              JOIN (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
                    FROM embeddings) cv ON cv.vec_id = cand.vec_id
              JOIN (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
                    FROM embeddings) bv ON bv.vec_id = cand.bench_id
            ),
            best AS (
              SELECT * FROM (
                SELECT vec_id, bench_id, s, row_number() OVER (
                  PARTITION BY vec_id ORDER BY s DESC, bench_id) AS rn
                FROM scored
              ) WHERE rn = 1
            )
            SELECT e.vec_id, best.bench_id AS nearest_bench,
                   round(coalesce(best.s, 0.0), 6) AS max_cos,
                   round(coalesce(best.s, 0.0), 6) >= 0.35 AS contaminated
            FROM (SELECT vec_id FROM embeddings WHERE vec_id % 50 <> 0) e
            LEFT JOIN best USING (vec_id)
        """,
        "b29_decontamination": _decontam_oracle_sql(),
        "b29_incremental_decontam": _incr_decontam_oracle_sql(),
        "b29_containment": _containment_oracle_sql(),

        "b29_decontam_venn": f"""
            WITH bench AS (
              SELECT doc_id, text FROM documents WHERE doc_id % 50 = 0
            ),
            corpus AS (
              SELECT doc_id, text FROM documents WHERE doc_id % 50 <> 0
            ),
            btk AS (
              SELECT string_split({_NORM_SQL}, ' ') AS toks FROM bench
            ),
            bg AS (
              SELECT DISTINCT sh FROM (
                SELECT unnest(list_transform(
                  generate_series(1, len(toks) - 4), i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3] || ' ' || toks[i+4])) AS sh
                FROM btk)
            ),
            ctk AS (
              SELECT doc_id, string_split({_NORM_SQL}, ' ') AS toks
              FROM corpus
            ),
            cg AS (
              SELECT DISTINCT doc_id, sh FROM (
                SELECT doc_id, unnest(list_transform(
                  generate_series(1, len(toks) - 4), i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3] || ' ' || toks[i+4])) AS sh
                FROM ctk)
            ),
            hits AS (
              SELECT doc_id, count(*) AS n FROM cg JOIN bg USING (sh)
              GROUP BY doc_id
            ),
            ngf AS (
              SELECT c.doc_id, COALESCE(hits.n, 0) > 0 AS ng
              FROM corpus c LEFT JOIN hits ON c.doc_id = hits.doc_id
            ),
            be AS (
              SELECT vec_id AS bench_id, CAST(embedding AS DOUBLE[]) AS bv
              FROM embeddings WHERE vec_id % 50 = 0
            ),
            ce AS (
              SELECT vec_id, CAST(embedding AS DOUBLE[]) AS cv
              FROM embeddings WHERE vec_id % 50 <> 0
            ),
            scored AS (
              SELECT ce.vec_id, be.bench_id,
                     list_dot_product(cv, bv)
                     / (sqrt(list_dot_product(cv, cv))
                        * sqrt(list_dot_product(bv, bv))) AS s
              FROM ce, be
            ),
            ranked AS (
              SELECT *, row_number() OVER (
                PARTITION BY vec_id ORDER BY s DESC, bench_id) AS rn
              FROM scored
            ),
            semf AS (
              SELECT vec_id AS doc_id, round(s, 6) >= 0.35 AS sem
              FROM ranked WHERE rn = 1
            ),
            j AS (
              SELECT ngf.doc_id, ngf.ng, semf.sem
              FROM ngf JOIN semf USING (doc_id)
            ),
            tot AS (SELECT CAST(count(*) AS BIGINT) AS t FROM j)
            SELECT CASE WHEN ng AND sem THEN 'both'
                        WHEN ng THEN 'ngram_only'
                        WHEN sem THEN 'semantic_only'
                        ELSE 'clean' END AS caught_by,
                   CAST(count(*) AS BIGINT) AS n_docs,
                   round(CAST(count(*) AS DOUBLE) / min(tot.t), 6) AS share
            FROM j CROSS JOIN tot
            GROUP BY 1
        """,
}
