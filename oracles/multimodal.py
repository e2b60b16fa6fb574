"""DuckDB oracle SQL — multimodal family (split from
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
        "b23_udf_features": _udf_features_oracle_sql(),
        "b22_phash_dups": """
            -- closed-form replay of synth_ppm + ahash64: source raster
            -- byte (y*w+x)*3+c of image img_id is (img_id*31+i)%256 with
            -- w=4+img_id%5, h=4+(img_id//5)%5; 8x8 NN sample at
            -- (ny,nx)=((y*h)//8,(x*w)//8); grayscale (r+g+b)//3; bit
            -- j=y*8+x set iff 64*g >= sum(g); halves pack bits 0..31 /
            -- 32..63 (all values nonneg -> // is floor)
            WITH staged AS (
              SELECT doc_id, doc_id AS img_id FROM documents
              UNION ALL
              SELECT doc_id + 300000 AS doc_id, doc_id AS img_id
              FROM documents WHERE doc_id % 9 = 0
            ),
            geom AS (
              SELECT doc_id, img_id,
                     4 + img_id % 5 AS w, 4 + (img_id // 5) % 5 AS h
              FROM staged
            ),
            g AS (
              SELECT doc_id, y * 8 + x AS j,
                     ((img_id * 31 + (((y * h) // 8) * w + ((x * w) // 8)) * 3 + 0) % 256
                      + (img_id * 31 + (((y * h) // 8) * w + ((x * w) // 8)) * 3 + 1) % 256
                      + (img_id * 31 + (((y * h) // 8) * w + ((x * w) // 8)) * 3 + 2) % 256
                     ) // 3 AS gray
              FROM geom,
                   generate_series(0, 7) gy(y),
                   generate_series(0, 7) gx(x)
            ),
            tot AS (SELECT doc_id, sum(gray) AS s FROM g GROUP BY doc_id),
            bits AS (
              SELECT g.doc_id, g.j,
                     CASE WHEN 64 * g.gray >= tot.s THEN 1 ELSE 0 END AS b
              FROM g JOIN tot ON tot.doc_id = g.doc_id
            ),
            hashes AS (
              SELECT doc_id,
                     CAST(sum(CASE WHEN j >= 32
                                   THEN b * (CAST(1 AS BIGINT) << (j - 32))
                                   ELSE 0 END) AS BIGINT) AS hash_hi,
                     CAST(sum(CASE WHEN j < 32
                                   THEN b * (CAST(1 AS BIGINT) << j)
                                   ELSE 0 END) AS BIGINT) AS hash_lo
              FROM bits GROUP BY doc_id
            )
            SELECT hash_hi, hash_lo,
                   CAST(count(*) AS BIGINT) AS n_copies,
                   CAST(min(doc_id) AS BIGINT) AS keeper_id
            FROM hashes GROUP BY hash_hi, hash_lo
            HAVING count(*) > 1
        """,
        "b23_grouped_agg_udf": """
            -- np.average = sum(p*q)/sum(q) over float64; identical
            -- products, sum-order noise absorbed by round(6)
            SELECT l_returnflag,
                   round(sum(CAST(l_extendedprice AS DOUBLE)
                             * CAST(l_quantity AS DOUBLE))
                         / sum(CAST(l_quantity AS DOUBLE)), 6)
                     AS wmean_price
            FROM lineitem GROUP BY l_returnflag
        """,
        "b22_frame_extract": """
            -- closed-form replay of synth_ppm_stream + extract_frames:
            -- doc id has 2 + id%3 frames; frame f is (3+f) x 2 with
            -- raster byte i = (id*31 + f*97 + i) % 256
            WITH fr AS (
              SELECT doc_id, f,
                     CAST(3 + f AS INTEGER) AS width,
                     CAST(2 AS INTEGER) AS height
              FROM documents, generate_series(0, 4) g(f)
              WHERE f < 2 + doc_id % 3
            ),
            px AS (
              SELECT doc_id, f, width, height,
                     (doc_id * 31 + f * 97 + i) % 256 AS val
              FROM fr, generate_series(0, 41) gi(i)
              WHERE i < width * height * 3
            )
            SELECT doc_id, CAST(f AS INTEGER) AS frame_idx,
                   width, height,
                   CAST(sum(val) AS BIGINT) AS frame_sum
            FROM px GROUP BY doc_id, f, width, height
        """,
        "b22_audio_stats": """
            -- closed-form replay of synth_pcm + audio_stats: sample i is
            -- (id*7 + i*13) % 4096 - 2048 over n = 800 + (id%5)*160
            -- samples; a zero crossing is a sign-bit flip (x<0 vs x>=0)
            WITH px AS (
              SELECT doc_id,
                     800 + (doc_id % 5) * 160 AS n
              FROM documents
            ),
            v AS (
              SELECT doc_id, n, i,
                     (doc_id * 7 + i * 13) % 4096 - 2048 AS val,
                     CASE WHEN i >= 1
                          THEN (doc_id * 7 + (i - 1) * 13) % 4096 - 2048
                     END AS prev
              FROM px, generate_series(0, 1439) g(i)
              WHERE i < n
            )
            SELECT doc_id,
                   CAST(min(n) AS BIGINT) AS n_samples,
                   CAST(sum(abs(val)) AS BIGINT) AS sum_abs,
                   CAST(max(abs(val)) AS BIGINT) AS max_abs,
                   CAST(sum(CASE WHEN prev IS NOT NULL
                                 AND ((val < 0) <> (prev < 0))
                            THEN 1 ELSE 0 END) AS BIGINT)
                     AS zero_crossings,
                   CAST(sum(val * val) AS BIGINT) AS energy
            FROM v GROUP BY doc_id
        """,
        "b22_multimodal_meta": """
            SELECT doc_id,
                   'text/plain' AS media_type,
                   CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
                   md5(text) AS checksum,
                   CAST(octet_length(encode(text)) AS BIGINT) AS rt_hex_bytes,
                   CAST(octet_length(encode(text)) AS BIGINT) AS rt_b64_bytes
            FROM documents
        """,
        "b22_byte_histogram": """
            -- DuckDB can neither slice nor substring a BLOB, so the
            -- leading BYTE comes from ascii() (corpus verified pure
            -- ASCII: octet_length(encode(text)) == length(text) for
            -- every row) and md5(VARCHAR) hashes the same UTF-8 bytes
            -- Spark's md5(encode(text)) does. lpad matches Spark hex()'s
            -- zero-padded 2-digit output for lead bytes < 0x10, and empty
            -- text (ascii='' -> 0 -> '00') is mapped to NULL on both
            -- engines (Spark: substring of empty payload -> '' -> hex '').
            SELECT CASE WHEN text = '' THEN NULL
                        ELSE lpad(upper(to_hex(ascii(text))), 2, '0')
                   END AS lead_byte,
                   CAST(count(*) AS BIGINT) AS n_blobs,
                   CAST(sum(octet_length(encode(text))) AS BIGINT)
                     AS total_bytes,
                   CAST(count(DISTINCT substr(md5(text), 1, 8)) AS BIGINT)
                     AS n_distinct_digests
            FROM documents GROUP BY lead_byte
        """,
        "b22_image_resize": """
            -- closed-form replay of synth_ppm + nearest-neighbor resize:
            -- source geometry w=4+id%5, h=4+(id//5)%5; raster byte i is
            -- (id*31+i)%256; NN source pixel for output (x,y) of 8x8 is
            -- (x*w//8, y*h//8) — all nonneg integers, so DuckDB's
            -- truncating // equals floor division
            WITH px AS (
              SELECT doc_id,
                     CAST(4 + doc_id % 5 AS INTEGER) AS src_w,
                     CAST(4 + (doc_id // 5) % 5 AS INTEGER) AS src_h
              FROM documents
            ),
            o AS (
              SELECT doc_id, src_w, src_h, c,
                     (doc_id * 31
                      + (((y * src_h) // 8) * src_w + ((x * src_w) // 8)) * 3
                      + c) % 256 AS v
              FROM px,
                   generate_series(0, 7) gy(y),
                   generate_series(0, 7) gx(x),
                   generate_series(0, 2) gc(c)
            )
            SELECT doc_id, src_w, src_h,
                   CAST(sum(CASE WHEN c = 0 THEN v END) AS BIGINT) AS sum_r,
                   CAST(sum(CASE WHEN c = 1 THEN v END) AS BIGINT) AS sum_g,
                   CAST(sum(CASE WHEN c = 2 THEN v END) AS BIGINT) AS sum_b
            FROM o GROUP BY doc_id, src_w, src_h
        """,
        "b22_image_stats": """
            -- closed-form replay of synth_ppm + image_stats: raster byte
            -- (y*w + x)*3 + c has value (id*31 + i) % 256; luma is the
            -- integer Rec.601 fold; the crop window is rows h//4 ..
            -- h//4+h//2, cols w//4 .. w//4+w//2 (all nonneg -> DuckDB //
            -- equals floor)
            WITH px AS (
              SELECT doc_id,
                     CAST(4 + doc_id % 5 AS INTEGER) AS src_w,
                     CAST(4 + (doc_id // 5) % 5 AS INTEGER) AS src_h
              FROM documents
            ),
            v AS (
              -- DuckDB generate_series takes no correlated bounds; use
              -- the fixed 0..7 grid (max dims are 8x8) and filter
              SELECT doc_id, src_w, src_h, y, x, c,
                     (doc_id * 31 + (y * src_w + x) * 3 + c) % 256 AS val
              FROM px,
                   generate_series(0, 7) gy(y),
                   generate_series(0, 7) gx(x),
                   generate_series(0, 2) gc(c)
              WHERE y < src_h AND x < src_w
            )
            SELECT doc_id, src_w, src_h,
                   CAST(sum(CASE WHEN c = 0 THEN val END) AS BIGINT) AS sum_r,
                   CAST(sum(CASE WHEN c = 1 THEN val END) AS BIGINT) AS sum_g,
                   CAST(sum(CASE WHEN c = 2 THEN val END) AS BIGINT) AS sum_b,
                   CAST(299 * sum(CASE WHEN c = 0 THEN val END)
                        + 587 * sum(CASE WHEN c = 1 THEN val END)
                        + 114 * sum(CASE WHEN c = 2 THEN val END) AS BIGINT)
                     AS luma_sum,
                   CAST(sum(CASE WHEN y >= src_h // 4
                                 AND y < src_h // 4 + src_h // 2
                                 AND x >= src_w // 4
                                 AND x < src_w // 4 + src_w // 2
                            THEN val END) AS BIGINT) AS crop_sum
            FROM v GROUP BY doc_id, src_w, src_h
        """,
        "b22_scene_cuts": """
            -- closed-form replay of synth_ppm_stream + extract_frames
            -- (same grid as b22_frame_extract), then the lead-delta
            WITH fr AS (
              SELECT doc_id, f,
                     CAST(3 + f AS INTEGER) AS width,
                     CAST(2 AS INTEGER) AS height
              FROM documents, generate_series(0, 4) g(f)
              WHERE f < 2 + doc_id % 3
            ),
            px AS (
              SELECT doc_id, f, width, height,
                     (doc_id * 31 + f * 97 + i) % 256 AS val
              FROM fr, generate_series(0, 41) gi(i)
              WHERE i < width * height * 3
            ),
            fs AS (
              SELECT doc_id, CAST(f AS INTEGER) AS frame_idx,
                     CAST(sum(val) AS BIGINT) AS frame_sum,
                     CAST(width * height * 3 AS BIGINT) AS area
              FROM px GROUP BY doc_id, f, width, height
            ),
            l AS (
              SELECT doc_id, frame_idx, frame_sum, area,
                     lead(frame_sum) OVER w AS ns, lead(area) OVER w AS na
              FROM fs WINDOW w AS (PARTITION BY doc_id ORDER BY frame_idx ASC)
            )
            SELECT doc_id, frame_idx,
                   round(CAST(abs(frame_sum * na - ns * area) AS DOUBLE)
                         / CAST(area * na AS DOUBLE), 6) AS mean_delta,
                   abs(frame_sum * na - ns * area) > 8 * area * na AS is_cut
            FROM l WHERE ns IS NOT NULL
        """,
    "b22_image_patches": """
        -- closed-form replay of synth_ppm + 2x2 patchify: geometry
        -- w=4+id%5, h=4+(id//5)%5; raster byte (y*w+x)*3+c has value
        -- (id*31 + (y*w+x)*3 + c) % 256; full patches only (y < 2*(h//2),
        -- x < 2*(w//2)); luma = 299R+587G+114B per patch; argmax via the
        -- same packed integer key (luma*10000 - py*100 - px)
        WITH px AS (
          SELECT doc_id,
                 CAST(4 + doc_id % 5 AS INTEGER) AS w,
                 CAST(4 + (doc_id // 5) % 5 AS INTEGER) AS h
          FROM documents
        ),
        v AS (
          SELECT doc_id, w, h, y, x, c,
                 CAST(y // 2 AS INTEGER) AS py,
                 CAST(x // 2 AS INTEGER) AS px_,
                 (doc_id * 31 + (y * w + x) * 3 + c) % 256 AS val
          FROM px,
               generate_series(0, 7) gy(y),
               generate_series(0, 7) gx(x),
               generate_series(0, 2) gc(c)
          WHERE y < 2 * (h // 2) AND x < 2 * (w // 2)
        ),
        patch AS (
          SELECT doc_id, py, px_,
                 CAST(sum(CASE WHEN c = 0 THEN val END) AS BIGINT) AS sr,
                 CAST(sum(CASE WHEN c = 1 THEN val END) AS BIGINT) AS sg,
                 CAST(sum(CASE WHEN c = 2 THEN val END) AS BIGINT) AS sb
          FROM v GROUP BY doc_id, py, px_
        ),
        lum AS (
          SELECT doc_id, py, px_,
                 299 * sr + 587 * sg + 114 * sb AS luma,
                 (299 * sr + 587 * sg + 114 * sb) * 10000
                   - py * 100 - px_ AS k
          FROM patch
        )
        SELECT doc_id,
               CAST(max(py) + 1 AS INTEGER) AS grid_h,
               CAST(max(px_) + 1 AS INTEGER) AS grid_w,
               CAST(count(*) AS BIGINT) AS n_patches,
               CAST(sum(luma) AS BIGINT) AS total_luma,
               CAST(max(luma) AS BIGINT) AS max_patch_luma,
               CAST(max_by(py, k) AS INTEGER) AS max_py,
               CAST(max_by(px_, k) AS INTEGER) AS max_px
        FROM lum GROUP BY doc_id
    """,
    "b22_audio_decimate": """
        -- closed-form replay of synth_pcm + pair-average decimation:
        -- sample i = ((id*7 + i*13) % 4096) - 2048, n = 800+(id%5)*160;
        -- out j = (biased(2j) + biased(2j+1)) // 2 - 2048 on the +2048
        -- NON-NEGATIVE bias so DuckDB's truncating // equals floor
        WITH d AS (
          SELECT doc_id, 800 + (doc_id % 5) * 160 AS n FROM documents
        ),
        o AS (
          SELECT doc_id, n, j,
                 (((doc_id * 7 + (2*j) * 13) % 4096)
                  + ((doc_id * 7 + (2*j + 1) * 13) % 4096)) // 2
                 - 2048 AS v
          FROM d, generate_series(0, 719) g(j)
          WHERE j < n // 2
        )
        SELECT doc_id,
               CAST(min(n) AS BIGINT) AS n_in,
               CAST(count(*) AS BIGINT) AS n_out,
               CAST(sum(v) AS BIGINT) AS sum_out,
               CAST(sum(abs(v)) AS BIGINT) AS sum_abs_out,
               CAST(max(v) AS BIGINT) AS max_out
        FROM o GROUP BY doc_id
    """,
    "b22_media_scorecard": """
        -- closed-form replay of synth_ppm+image_stats and
        -- synth_pcm+audio_stats composed per source (same formulas as
        -- the b22_image_stats / b22_audio_stats oracles)
        WITH ipx AS (
          SELECT doc_id,
                 CAST(4 + doc_id % 5 AS INTEGER) AS w,
                 CAST(4 + (doc_id // 5) % 5 AS INTEGER) AS h
          FROM documents
        ),
        iv AS (
          SELECT doc_id, w, h, c,
                 (doc_id * 31 + (y * w + x) * 3 + c) % 256 AS val
          FROM ipx,
               generate_series(0, 7) gy(y),
               generate_series(0, 7) gx(x),
               generate_series(0, 2) gc(c)
          WHERE y < h AND x < w
        ),
        img AS (
          SELECT doc_id, min(w) AS w, min(h) AS h,
                 299 * sum(CASE WHEN c = 0 THEN val END)
                 + 587 * sum(CASE WHEN c = 1 THEN val END)
                 + 114 * sum(CASE WHEN c = 2 THEN val END) AS luma_sum
          FROM iv GROUP BY doc_id
        ),
        apx AS (
          SELECT doc_id, 800 + (doc_id % 5) * 160 AS n FROM documents
        ),
        av AS (
          SELECT doc_id, n, i,
                 (doc_id * 7 + i * 13) % 4096 - 2048 AS val,
                 CASE WHEN i >= 1
                      THEN (doc_id * 7 + (i - 1) * 13) % 4096 - 2048
                 END AS prev
          FROM apx, generate_series(0, 1439) g(i)
          WHERE i < n
        ),
        aud AS (
          SELECT doc_id,
                 CAST(min(n) AS BIGINT) AS n_samples,
                 CAST(sum(abs(val)) AS BIGINT) AS sum_abs,
                 CAST(max(abs(val)) AS BIGINT) AS max_abs,
                 CAST(sum(CASE WHEN prev IS NOT NULL
                               AND ((val < 0) <> (prev < 0))
                          THEN 1 ELSE 0 END) AS BIGINT) AS zc
          FROM av GROUP BY doc_id
        ),
        per AS (
          SELECT d.source,
                 img.luma_sum,
                 img.luma_sum < img.w * img.h * 127500 AS dark,
                 aud.max_abs >= 2040 AS clipped,
                 aud.sum_abs * 10 < aud.n_samples * 2048 AS silent,
                 aud.zc, aud.n_samples
          FROM documents d
          JOIN img USING (doc_id)
          JOIN aud USING (doc_id)
        )
        SELECT source,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(CASE WHEN dark THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_dark_images,
               round(CAST(sum(CASE WHEN dark THEN 1 ELSE 0 END) AS DOUBLE)
                     / count(*), 6) AS dark_share,
               CAST(sum(CASE WHEN clipped THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_clipped_audio,
               CAST(sum(CASE WHEN silent THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_silent_audio,
               round(CAST(sum(zc) AS DOUBLE) / CAST(sum(n_samples) AS DOUBLE),
                     6) AS pooled_zcr,
               CAST(sum(luma_sum) AS BIGINT) AS total_luma
        FROM per GROUP BY source
    """,

        "b22_equalize": """
            -- closed-form replay of synth_ppm + equalize_stats: per
            -- pixel luma bucket v = (299R+587G+114B) // 1000 where
            -- channel byte = (id*31 + (y*w+x)*3 + c) % 256; histogram
            -- -> running CDF -> integer remap floor((cdf-cdf_min)*255
            -- / (n_px-cdf_min)); constant images (denom 0) map to 0
            WITH px AS (
              SELECT doc_id,
                     CAST(4 + doc_id % 5 AS INTEGER) AS w,
                     CAST(4 + (doc_id // 5) % 5 AS INTEGER) AS h
              FROM documents
            ),
            lum AS (
              SELECT doc_id, w, h, y, x,
                     (  299 * ((doc_id * 31 + (y * w + x) * 3 + 0) % 256)
                      + 587 * ((doc_id * 31 + (y * w + x) * 3 + 1) % 256)
                      + 114 * ((doc_id * 31 + (y * w + x) * 3 + 2) % 256)
                     ) // 1000 AS v
              FROM px,
                   generate_series(0, 7) gy(y),
                   generate_series(0, 7) gx(x)
              WHERE y < h AND x < w
            ),
            hist AS (
              SELECT doc_id, w, h, v, CAST(count(*) AS BIGINT) AS c
              FROM lum GROUP BY doc_id, w, h, v
            ),
            cdf AS (
              SELECT doc_id, w, h, v, c,
                     sum(c) OVER (PARTITION BY doc_id ORDER BY v
                                  ROWS UNBOUNDED PRECEDING) AS cdf
              FROM hist
            ),
            base AS (
              SELECT doc_id, min(cdf) AS cdf_min,
                     CAST(min(w) * min(h) AS BIGINT) AS n_px
              FROM cdf GROUP BY doc_id
            ),
            remap AS (
              SELECT cdf.doc_id, cdf.v, cdf.c, b.n_px,
                     CASE WHEN b.n_px - b.cdf_min > 0
                          THEN ((cdf.cdf - b.cdf_min) * 255)
                               // (b.n_px - b.cdf_min)
                          ELSE 0 END AS r
              FROM cdf JOIN base b USING (doc_id)
            )
            SELECT doc_id,
                   CAST(min(n_px) AS BIGINT) AS n_px,
                   CAST(min(v) AS INTEGER) AS pre_min,
                   CAST(max(v) AS INTEGER) AS pre_max,
                   CAST(count(*) AS BIGINT) AS pre_levels,
                   CAST(min(r) AS INTEGER) AS post_min,
                   CAST(max(r) AS INTEGER) AS post_max,
                   CAST(count(DISTINCT r) AS BIGINT) AS post_levels,
                   CAST(sum(r * c) AS BIGINT) AS post_sum
            FROM remap GROUP BY doc_id
        """,

        "b22_audio_vad": """
            WITH docs AS (
              SELECT doc_id, 800 + (doc_id % 5) * 160 AS n FROM documents
            ),
            idx AS (
              SELECT doc_id, n, unnest(generate_series(0, 1439)) AS i
              FROM docs
            ),
            samples AS (
              SELECT doc_id, i // 160 AS f,
                     CASE WHEN (doc_id + (i // 160) * 31) % 4 = 0
                          THEN ((doc_id * 7 + i * 13) % 4096) % 256 - 128
                          ELSE (doc_id * 7 + i * 13) % 4096 - 2048
                     END AS x
              FROM idx WHERE i < n
            ),
            frames AS (
              SELECT doc_id, f, sum(x * x) AS energy
              FROM samples GROUP BY doc_id, f
            ),
            speech AS (
              SELECT doc_id, f,
                     f - row_number() OVER (
                       PARTITION BY doc_id ORDER BY f) AS grp
              FROM frames WHERE energy > 10000000
            ),
            runs AS (
              SELECT doc_id, CAST(count(*) AS BIGINT) AS run_len
              FROM speech GROUP BY doc_id, grp
            ),
            seg AS (
              SELECT doc_id,
                     CAST(count(*) AS BIGINT) AS n_segments,
                     CAST(max(run_len) AS BIGINT) AS max_run,
                     CAST(sum(run_len) AS BIGINT) AS n_speech
              FROM runs GROUP BY doc_id
            ),
            base AS (
              SELECT d.doc_id,
                     CAST(d.n // 160 AS BIGINT) AS n_frames,
                     COALESCE(seg.n_speech, 0) AS n_speech_frames,
                     COALESCE(seg.n_segments, 0) AS n_segments,
                     COALESCE(seg.max_run, 0) AS max_run
              FROM docs d LEFT JOIN seg ON seg.doc_id = d.doc_id
            )
            SELECT doc_id, n_frames, n_speech_frames, n_segments, max_run,
                   round(CAST(n_speech_frames AS DOUBLE) / n_frames, 6)
                     AS speech_ratio
            FROM base
        """,

        "b23_grouped_map_udf": """
            WITH sums AS (
              SELECT doc_id, lang, n_chars,
                     CAST(count(*) OVER w AS BIGINT) AS n,
                     CAST(sum(n_chars) OVER w AS BIGINT) AS s,
                     CAST(sum(n_chars * n_chars) OVER w AS BIGINT) AS ss
              FROM documents
              WINDOW w AS (PARTITION BY lang)
            )
            SELECT doc_id, lang, n_chars,
                   CASE WHEN n * ss - s * s > 0
                        THEN round((n * n_chars - s)
                                   / sqrt(CAST(n * ss - s * s AS DOUBLE)), 6)
                   END AS z
            FROM sums
        """,

        "b23_stateful_udf": """
            WITH ordered AS (
              SELECT user_id,
                     row_number() OVER w AS rn,
                     (event_type IN ('click', 'view')) AS browse,
                     (event_type = 'purchase') AS purch,
                     (lag(event_type) OVER w IN ('click', 'view'))
                       AS prev_browse
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            ),
            islands AS (
              -- gaps-and-islands over browse rows: rn minus the
              -- browse-only rank is constant within a run
              SELECT user_id, rn,
                     rn - row_number() OVER (
                       PARTITION BY user_id ORDER BY rn) AS grp
              FROM ordered WHERE browse
            ),
            runs AS (
              SELECT user_id, grp,
                     count(*) AS run_len,
                     max(rn) AS run_end
              FROM islands GROUP BY user_id, grp
            ),
            runs2 AS (
              SELECT *, max(grp) OVER (PARTITION BY user_id) AS last_grp
              FROM runs
            ),
            streaks AS (
              SELECT user_id,
                     CAST(max(run_len) AS BIGINT) AS max_streak,
                     CAST(max(CASE WHEN grp = last_grp THEN run_len
                              ELSE 0 END) AS BIGINT) AS last_run,
                     CAST(max(run_end) AS BIGINT) AS last_browse_rn
              FROM runs2 GROUP BY user_id
            ),
            counters AS (
              SELECT user_id,
                     CAST(count(*) AS BIGINT) AS n_events,
                     CAST(sum(CASE WHEN purch THEN 1 ELSE 0 END)
                          AS BIGINT) AS n_purchases,
                     CAST(sum(CASE WHEN purch AND prev_browse
                              THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_conversions,
                     CAST(max(rn) AS BIGINT) AS last_rn
              FROM ordered GROUP BY user_id
            )
            SELECT c.user_id, c.n_events, c.n_purchases, c.n_conversions,
                   COALESCE(s.max_streak, 0) AS max_browse_streak,
                   CASE WHEN s.last_browse_rn = c.last_rn
                        THEN s.last_run ELSE 0 END AS open_streak
            FROM counters c LEFT JOIN streaks s ON s.user_id = c.user_id
        """,

        "b23_map_in_arrow": """
            -- plain-SQL replay of the Arrow-kernel telemetry (corpus is
            -- pure ASCII, so octet_length(encode(text)) == the utf8
            -- byte length Spark's Arrow batch carries)
            SELECT doc_id,
                   CAST(length(text) AS BIGINT) AS n_chars_a,
                   CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes_a,
                   CAST(length(text) - length(replace(text, ' ', ''))
                        AS BIGINT) AS n_spaces,
                   CAST(CASE WHEN length(text) > 0
                             THEN length(text)
                                  - length(replace(text, ' ', '')) + 1
                             ELSE 0 END AS BIGINT) AS n_tokens_ws
            FROM documents
        """,

        "b22_audio_fingerprint": """
            -- closed-form replay of pcm_from_text + scale_pcm(3) +
            -- audio_fingerprints(frame=8) + the df-capped pair screen:
            -- sample i = b(2i) + 256*(b(2i+1) %% 16) - 2048 (ASCII corpus,
            -- so ascii(substr(..)) IS the byte); rescale scales every
            -- energy by 9 exactly, so bits replay scale-free
            WITH sides AS (
              SELECT doc_id, text, 1 AS scale FROM documents
              UNION ALL
              SELECT doc_id + 300000, text, 3 FROM documents
            ),
            samp AS (
              -- unnest(range(..)) derives the sample count from EACH
              -- document's own length (the engine's pcm_from_text is
              -- uncapped, so a fixed series bound would silently
              -- diverge the day a document exceeds it)
              SELECT doc_id, i,
                     scale * (ascii(substr(text, 2*i + 1, 1))
                       + 256 * (ascii(substr(text, 2*i + 2, 1)) % 16)
                       - 2048) AS v
              FROM (SELECT doc_id, text, scale,
                           unnest(range(0, length(text) // 2)) AS i
                    FROM sides)
            ),
            en AS (
              SELECT doc_id, i // 8 AS f,
                     CAST(sum(v * v) AS BIGINT) AS e,
                     count(*) AS cnt
              FROM samp GROUP BY doc_id, i // 8
            ),
            fe AS (SELECT doc_id, f, e FROM en WHERE cnt = 8),
            bits AS (
              SELECT doc_id, f,
                     CASE WHEN lead(e) OVER w > e THEN 1 ELSE 0 END AS b,
                     count(*) OVER (PARTITION BY doc_id) AS nf
              FROM fe WINDOW w AS (PARTITION BY doc_id ORDER BY f)
            ),
            sh AS (
              SELECT doc_id, CAST(f AS INTEGER) AS pos,
                     CAST(b * 128 + lead(b, 1) OVER w * 64 + lead(b, 2) OVER w * 32 + lead(b, 3) OVER w * 16 + lead(b, 4) OVER w * 8 + lead(b, 5) OVER w * 4 + lead(b, 6) OVER w * 2 + lead(b, 7) OVER w * 1
                          AS INTEGER) AS shingle
              FROM bits WINDOW w AS (PARTITION BY doc_id ORDER BY f)
              QUALIFY f <= nf - 9
            ),
            bc AS (
              SELECT pos, shingle, count(*) AS df
              FROM sh GROUP BY pos, shingle
            ),
            lm AS (
              SELECT s.doc_id, s.pos, s.shingle
              FROM sh s JOIN bc USING (pos, shingle)
              WHERE bc.df <= 64
            ),
            pairs AS (
              SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                     CAST(count(*) AS BIGINT) AS n_shared
              FROM lm a JOIN lm b
                ON a.pos = b.pos AND a.shingle = b.shingle
               AND a.doc_id < b.doc_id
              GROUP BY 1, 2
            )
            SELECT doc_a, doc_b, n_shared,
                   doc_b = doc_a + 300000 AS is_rescale_pair
            FROM pairs WHERE n_shared >= 8
        """,
        "b23_arrow_parity": """
            -- the kernel computed once (the built-in definition); the
            -- three engine modes must all agree with it bit-exactly,
            -- so the oracle emits the same aggregate under each mode
            -- label with a zero mismatch count
            WITH d AS (
              SELECT doc_id, coalesce(text, '') AS t FROM documents
            ),
            h AS (
              SELECT doc_id,
                     CAST(1000003 * (CASE WHEN length(t) > 0
                            THEN length(t) - length(replace(t, ' ', '')) + 1
                            ELSE 0 END)
                          + 31 * length(t)
                          + (length(t)
                             - length(regexp_replace(t, '[0-9]', '', 'g')))
                       AS BIGINT) AS h
              FROM d
            ),
            agg AS (
              SELECT CAST(count(*) AS BIGINT) AS n_rows,
                     CAST(sum(h) AS BIGINT) AS sum_h,
                     CAST(bit_xor(h) AS BIGINT) AS xor_h
              FROM h
            )
            SELECT m.mode, agg.n_rows, agg.sum_h, agg.xor_h,
                   CAST(0 AS BIGINT) AS n_mismatch
            FROM agg, (VALUES ('builtin'), ('pandas'), ('arrow')) m(mode)
        """,
}
