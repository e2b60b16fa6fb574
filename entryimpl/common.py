"""Shared helpers, fixtures-as-SQL fragments, and oracle-side
building blocks for the registry modules (split from
__spark_entry__.py — VERDICT r9 item 8; pure move, no semantic
change).
"""

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



BOOTSTRAP_TS = "2024-06-01 00:00:00"


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


#: lineitem columns with the timestamp pre-formatted to text so JSON images
#: are engine-portable (Spark to_json renders timestamps ISO-8601 with 'T',
#: DuckDB json_object uses its own format — strings sidestep both).
_LI_IMG_COLS = [
    "l_orderkey",
    "l_partkey",
    "l_suppkey",
    "l_linenumber",
    "l_returnflag",
    "l_linestatus",
]


_ORDERS_IMG_SQL = (
    "json_object('o_orderkey', o_orderkey, 'o_custkey', o_custkey, "
    "'o_orderstatus', o_orderstatus, 'o_orderpriority', o_orderpriority)"
)


def _orders_img(prefix_df, cols=("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority")):
    return F.to_json(F.struct(*[F.col(c) for c in cols]))


def _events_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    return log.events_as_changes(_t(spark, sf_dir, "events"))


#: DuckDB rendering of ``log.events_as_changes`` — the same deterministic
#: normalization expressed in SQL for the oracle side.
_EVENTS_CHANGES_SQL = """
SELECT
  event_id AS id,
  'events' AS tablename,
  ts AS timestamp,
  CASE event_type WHEN 'signup' THEN 'INSERT'
                  WHEN 'error' THEN 'DELETE'
                  ELSE 'UPDATE' END AS operation,
  CASE WHEN event_type = 'signup' THEN NULL
       ELSE CAST(json_object('user_id', user_id) AS VARCHAR) END AS before,
  CASE WHEN event_type = 'error' THEN NULL
       ELSE CAST(json_object('user_id', user_id, 'event_type', event_type,
                             'value', value, 'props', props) AS VARCHAR)
       END AS after
FROM events
"""


#: (l_orderkey, l_linenumber) is NOT unique in the fixture; order/page on the
#: full selected tuple so LIMIT boundaries are deterministic in both engines.
_LI_PAGE_KEYS = [*_LI_IMG_COLS, "l_quantity"]


_ORD_COLS = ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderpriority"]


def _orders_old_new(spark, sf_dir):
    """Deterministic snapshot mutation (FIXTURES.md §2): keys ≡0 mod 97
    deleted, ≡1 mod 97 price-bumped, ≡2 mod 97 re-keyed as fresh inserts."""
    old = _t(spark, sf_dir, "orders").select(*_ORD_COLS)
    k = F.col("o_orderkey")
    surviving = old.filter(k % 97 != 0).withColumn(
        "o_totalprice",
        F.when(k % 97 == 1, F.col("o_totalprice") + F.lit(1.0)).otherwise(
            F.col("o_totalprice")
        ),
    )
    inserts = old.filter(k % 97 == 2).select(
        (k + F.lit(100000000)).alias("o_orderkey"),
        F.col("o_custkey"),
        F.lit("N").alias("o_orderstatus"),
        F.col("o_totalprice"),
        F.col("o_orderpriority"),
    )
    return old, surviving.unionByName(inserts)


_ORDERS_OLD_NEW_SQL = """
old AS (
  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderpriority
  FROM orders
),
new AS (
  SELECT o_orderkey, o_custkey, o_orderstatus,
         CASE WHEN o_orderkey % 97 = 1 THEN o_totalprice + 1.0
              ELSE o_totalprice END AS o_totalprice,
         o_orderpriority
  FROM old WHERE o_orderkey % 97 != 0
  UNION ALL
  SELECT o_orderkey + 100000000, o_custkey, 'N', o_totalprice, o_orderpriority
  FROM old WHERE o_orderkey % 97 = 2
)
"""


def _docs_with_dups(spark, sf_dir):
    """documents ∪ re-keyed copies of every 10th doc — the fixture has no
    exact duplicates, so synthesize a deterministic dup population."""
    docs = _t(spark, sf_dir, "documents")
    copies = docs.filter(F.col("doc_id") % 10 == 0).withColumn(
        "doc_id", F.col("doc_id") + F.lit(100000)
    )
    return docs.unionByName(copies)


_DOCS_DUPS_SQL = """
docs AS (
  SELECT * FROM documents
  UNION ALL
  SELECT doc_id + 100000 AS doc_id, text, lang, source, n_chars
  FROM documents WHERE doc_id % 10 = 0
)
"""


#: SQL-surface family (B25): the same engine driven through ``spark.sql``
#: over temp views — subqueries/CTEs come free from Catalyst (SURVEY §2
#: "explicit non-goals" … because Spark SQL gives them; these queries prove
#: it). Oracle strings are the IDENTICAL SQL run on DuckDB.
_SQL_EXISTS = """
    SELECT o_orderkey, o_orderpriority
    FROM orders
    WHERE EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_quantity > 45)
"""


_SQL_CORRELATED_COUNT = """
    SELECT c_custkey, c_mktsegment
    FROM customer c
    WHERE (SELECT count(*) FROM orders o
           WHERE o.o_custkey = c.c_custkey) >= 15
"""


#: TPC-H Q15 shape: CTE + scalar subquery over an exact-decimal revenue so
#: the max-equality filter is engine-portable (doubles would tie-break on
#: summation order).
_SQL_CTE_TOP_SUPPLIER = """
    WITH rev AS (
      SELECT l_suppkey AS supplier_no,
             sum(CAST(l_extendedprice AS DECIMAL(18,4))
                 * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4))))
               AS total
      FROM lineitem
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name,
           round(CAST(total AS DOUBLE), 2) AS total_rev
    FROM supplier JOIN rev ON s_suppkey = supplier_no
    WHERE total = (SELECT max(total) FROM rev)
"""


#: TPC-H Q21 shape (suppliers who kept orders waiting): the hardest join
#: topology in the TPC-H suite — a fact self-referenced THREE times, one
#: positive correlated EXISTS and one negative NOT EXISTS, both correlated
#: on two outer tables at once. Catalyst plans the EXISTS as a semi join
#: and the NOT EXISTS as an anti join on l_orderkey — no per-row
#: re-execution. Lateness adapts to this fixture's columns (no
#: commitdate): shipped > 60 days after the order date.
_SQL_WAITING_SUPPLIERS = """
    SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
    FROM supplier, lineitem l1, orders
    WHERE s_suppkey = l1.l_suppkey
      AND o_orderkey = l1.l_orderkey
      AND o_orderstatus = 'F'
      AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 20
"""


#: TPC-H Q22 shape (global-market-analysis): a scalar aggregate threshold
#: + NOT EXISTS anti join (here: high-balance customers with no urgent
#: orders — this fixture's every customer has ~10 orders, so bare
#: "no orders" selects nothing). The avg threshold is multiplied through
#: (bal·N > Σbal) so the comparison is exact decimal on both engines —
#: DuckDB's avg() over decimal returns DOUBLE, which would tie-break
#: boundary rows differently.
_SQL_IDLE_CUSTOMERS = """
    SELECT c_nationkey, CAST(count(*) AS BIGINT) AS numcust,
           round(CAST(sum(CAST(c_acctbal AS DECIMAL(28,4))) AS DOUBLE), 2)
             AS totacctbal
    FROM customer c
    WHERE CAST(c_acctbal AS DECIMAL(28,4))
            * (SELECT count(*) FROM customer WHERE c_acctbal > 0.0)
          > (SELECT sum(CAST(c_acctbal AS DECIMAL(28,4)))
             FROM customer WHERE c_acctbal > 0.0)
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderpriority = '1-URGENT')
    GROUP BY c_nationkey
"""


def _sql_query(sql: str, *tables: str):
    def run(spark, sf_dir):
        for t in tables:
            _t(spark, sf_dir, t).createOrReplaceTempView(t)
        return spark.sql(sql)

    return run


def _bpe_oracle_sql() -> str:
    """DuckDB replay of q_b30_bpe_encode: identical wrapped-symbol
    replace chain per merge, in order."""
    s = "regexp_replace(w, '(.)', ' \\1 ', 'g')"
    for x, y in lm.BPE_DEMO_MERGES:
        s = f"replace({s}, ' {x}  {y} ', ' {x}{y} ')"
    return f"""
        WITH words AS (
          SELECT doc_id, unnest(list_filter({_TOKS_SQL}, t -> t <> '')) AS w
          FROM documents
        ),
        enc AS (
          SELECT doc_id, length(w) AS n_chars,
                 len(string_split(trim({s}), '  ')) AS n_toks
          FROM words
        )
        SELECT doc_id,
               CAST(count(*) AS BIGINT) AS n_words,
               CAST(sum(n_chars) AS BIGINT) AS n_chars,
               CAST(sum(n_toks) AS BIGINT) AS n_tokens,
               round(sum(n_chars) / CAST(sum(n_toks) AS DOUBLE), 6)
                 AS compression
        FROM enc GROUP BY doc_id
    """


def _zorder_oracle_sql(bits: int = 16) -> str:
    """DuckDB replay of q_b12_zorder: identical min-max scaling and
    bit-interleave tree."""
    top = float(2**bits - 1)
    inter = " | ".join(
        f"(((qx >> {i}) & 1) << {2 * i}) | (((qy >> {i}) & 1) << {2 * i + 1})"
        for i in range(bits)
    )
    return f"""
        WITH o AS (
          SELECT o_orderkey, CAST(o_totalprice AS DOUBLE) AS px,
                 date_diff('day', DATE '1992-01-01', o_orderdate) AS dyi
          FROM orders
        ),
        mm AS (
          SELECT min(px) AS nx, max(px) AS xx,
                 min(CAST(dyi AS DOUBLE)) AS ny,
                 max(CAST(dyi AS DOUBLE)) AS xy
          FROM o
        ),
        sc AS (
          SELECT o_orderkey, px, dyi,
                 CASE WHEN xx > nx THEN
                   CAST(floor((px - nx) / (xx - nx) * {top}) AS BIGINT)
                 ELSE 0 END AS qx,
                 CASE WHEN xy > ny THEN
                   CAST(floor((CAST(dyi AS DOUBLE) - ny) / (xy - ny) * {top})
                        AS BIGINT)
                 ELSE 0 END AS qy
          FROM o CROSS JOIN mm
        ),
        z AS (SELECT o_orderkey, px, dyi, ({inter}) AS zorder FROM sc)
        SELECT zorder >> 24 AS zbucket, CAST(count(*) AS BIGINT) AS n,
               round(min(px), 2) AS min_price, round(max(px), 2) AS max_price,
               min(dyi) AS min_days, max(dyi) AS max_days
        FROM z GROUP BY 1
    """


def _linear_counting_oracle_sql(m_bits: int = 4096) -> str:
    """DuckDB replay of q_b27_linear_counting: same k=1 bitmap build,
    popcount, and −m·ln(z/m) estimator expression tree."""
    from sqlite_cdc_spark.pipeline.dedup import (
        MINHASH_P,
        _hash_family,
        portable_hash60_sql,
    )

    a, b = _hash_family(1, seed=0xB100)[0]
    base = f"({portable_hash60_sql('CAST(c_custkey AS VARCHAR)')}) % {MINHASH_P}"
    est = (
        f"round(-{float(m_bits)} * ln(CAST({m_bits} - s AS DOUBLE)"
        f" / {float(m_bits)}), 6)"
    )
    return f"""
        WITH pos AS (
          SELECT ((({base}) * {a} + {b}) % {MINHASH_P}) % {m_bits} AS pos
          FROM customer
        ),
        bitmap AS (
          SELECT CAST(floor(pos / 63) AS INTEGER) AS word,
                 bit_or(CAST(1 AS BIGINT) << CAST(pos % 63 AS INTEGER)) AS bits
          FROM pos GROUP BY 1
        ),
        used AS (SELECT CAST(sum(bit_count(bits)) AS BIGINT) AS s FROM bitmap),
        ex AS (SELECT CAST(count(DISTINCT c_custkey) AS BIGINT) AS n_exact
               FROM customer)
        SELECT n_exact, s AS bits_set, {est} AS estimate,
               round(abs({est} - n_exact) / n_exact, 6) AS rel_err
        FROM ex CROSS JOIN used
    """


def _bloom_oracle_sql(m_bits: int = 4096, k_hashes: int = 4) -> str:
    """DuckDB replay of q_b7_bloom_join: identical universal-family bit
    positions over the portable md5 hash, bit_or bitmap, all-k probe."""
    from sqlite_cdc_spark.pipeline.dedup import (
        MINHASH_P,
        _hash_family,
        portable_hash60_sql,
    )

    fam = _hash_family(k_hashes, seed=0xB100)

    def pos_list(key_expr: str) -> str:
        base = f"({portable_hash60_sql(f'CAST({key_expr} AS VARCHAR)')}) % {MINHASH_P}"
        return ", ".join(
            f"((({base}) * {a} + {b}) % {MINHASH_P}) % {m_bits}" for a, b in fam
        )

    return f"""
        WITH dpos AS (
          SELECT unnest([{pos_list('c_custkey')}]) AS pos
          FROM customer WHERE c_mktsegment = 'BUILDING'
        ),
        bitmap AS (
          SELECT CAST(floor(pos / 63) AS INTEGER) AS word,
                 bit_or(CAST(1 AS BIGINT) << CAST(pos % 63 AS INTEGER)) AS bits
          FROM dpos GROUP BY 1
        ),
        opos AS (
          SELECT o_orderkey, unnest([{pos_list('o_custkey')}]) AS pos
          FROM orders
        ),
        pass AS (
          SELECT o_orderkey FROM (
            SELECT o_orderkey,
                   CAST(floor(pos / 63) AS INTEGER) AS word,
                   CAST(1 AS BIGINT) << CAST(pos % 63 AS INTEGER) AS bit
            FROM opos
          ) p JOIN bitmap USING (word)
          WHERE (bits & bit) <> 0
          GROUP BY o_orderkey HAVING count(*) = {k_hashes}
        ),
        b AS (
          SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n_bloom
          FROM orders JOIN pass USING (o_orderkey) GROUP BY 1
        ),
        x AS (
          SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n_exact
          FROM orders WHERE o_custkey IN
            (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
          GROUP BY 1
        )
        SELECT COALESCE(b.o_orderstatus, x.o_orderstatus) AS o_orderstatus,
               COALESCE(n_bloom, 0) AS n_bloom,
               COALESCE(n_exact, 0) AS n_exact,
               COALESCE(n_bloom, 0) - COALESCE(n_exact, 0) AS n_false_pos
        FROM b FULL OUTER JOIN x ON b.o_orderstatus = x.o_orderstatus
    """


def _prefix_filter_oracle_sql(t: float = 0.8) -> str:
    """DuckDB replay of q_b19_prefix_filter: identical rarity order,
    prefix bound, candidate join and exact verify."""
    return f"""
        WITH corpus AS ({_B19_CORPUS_SQL}),
        tk AS (SELECT doc_id, string_split({_NORM_SQL}, ' ') AS toks
               FROM corpus),
        dg AS (
          SELECT DISTINCT doc_id,
                 unnest(list_transform(generate_series(1, len(toks) - 2),
                        i -> {_GRAM3_SQL})) AS g
          FROM tk
        ),
        sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n
                  FROM dg GROUP BY doc_id),
        gdf AS (SELECT g, CAST(count(*) AS BIGINT) AS df FROM dg GROUP BY g),
        ranked AS (
          SELECT dg.doc_id, dg.g,
                 row_number() OVER (PARTITION BY dg.doc_id
                                    ORDER BY gdf.df, dg.g) AS rn
          FROM dg JOIN gdf USING (g)
        ),
        pref AS (
          SELECT r.doc_id, r.g
          FROM ranked r JOIN sizes s USING (doc_id)
          WHERE r.rn <= s.n - CAST(ceil({t} * s.n) AS BIGINT) + 1
        ),
        cand AS (
          SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
          FROM pref a JOIN pref b
            ON a.g = b.g AND a.doc_id < b.doc_id
        ),
        inter AS (
          SELECT c.id_a, c.id_b, CAST(count(*) AS BIGINT) AS i
          FROM cand c
          JOIN dg x ON x.doc_id = c.id_a
          JOIN dg y ON y.doc_id = c.id_b AND y.g = x.g
          GROUP BY c.id_a, c.id_b
        )
        SELECT id_a, id_b,
               round(CAST(i AS DOUBLE) / (sa.n + sb.n - i), 6) AS jaccard
        FROM inter
        JOIN sizes sa ON sa.doc_id = id_a
        JOIN sizes sb ON sb.doc_id = id_b
        WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= {t}
    """


def _bloom_incremental_oracle_sql(m_bits: int = 4096, k_hashes: int = 4) -> str:
    """Rebuild-from-scratch oracle for q_b7_bloom_incremental."""
    from sqlite_cdc_spark.pipeline.dedup import (
        MINHASH_P,
        _hash_family,
        portable_hash60_sql,
    )

    fam = _hash_family(k_hashes, seed=0xB100)
    base = (
        f"({portable_hash60_sql('CAST(o_orderkey AS VARCHAR)')}) % {MINHASH_P}"
    )
    pos = ", ".join(
        f"((({base}) * {a} + {b}) % {MINHASH_P}) % {m_bits}" for a, b in fam
    )
    return f"""
        WITH pos AS (
          SELECT unnest([{pos}]) AS pos FROM orders
        )
        SELECT CAST(floor(pos / 63) AS INTEGER) AS word,
               bit_or(CAST(1 AS BIGINT) << CAST(pos % 63 AS INTEGER)) AS bits
        FROM pos GROUP BY 1
    """


def _bootstrap_oracle_sql(n_replicates: int = 32, quant: int = 100) -> str:
    """DuckDB replay of q_b10_bootstrap."""
    from sqlite_cdc_spark.pipeline.dedup import MINHASH_P, portable_hash60_sql
    from sqlite_cdc_spark.pipeline.sampling import _poisson1_cutoffs

    from sqlite_cdc_spark.pipeline.dedup import _hash_family

    cuts = _poisson1_cutoffs(MINHASH_P)
    fam = _hash_family(n_replicates, seed=0xB005)
    h = f"({portable_hash60_sql('CAST(o_orderkey AS VARCHAR)')}) % {MINHASH_P}"
    u = "u"
    w = str(len(cuts))
    for k in range(len(cuts) - 1, -1, -1):
        w = f"CASE WHEN u < {cuts[k]} THEN {k} ELSE {w} END"
    a_cases = " ".join(f"WHEN {r} THEN {fam[r][0]}" for r in range(n_replicates))
    b_cases = " ".join(f"WHEN {r} THEN {fam[r][1]}" for r in range(n_replicates))
    return f"""
        WITH reps AS (SELECT unnest(generate_series(0, {n_replicates - 1})) AS r),
        pairs AS (
          SELECT r, CAST(floor(o_totalprice * {quant}) AS BIGINT) AS q,
                 CAST({w} AS BIGINT) AS w
          FROM (
            SELECT o_totalprice, r,
                   (h * (CASE r {a_cases} END)
                    + (CASE r {b_cases} END)) % {MINHASH_P} AS u
            FROM (SELECT o_orderkey, o_totalprice, {h} AS h FROM orders)
            CROSS JOIN reps
          )
        ),
        per AS (
          SELECT CAST(r AS INTEGER) AS replicate,
                 CAST(sum(w) AS BIGINT) AS n_eff,
                 round(CAST(sum(w * q) AS DOUBLE)
                       / (CAST(sum(w) AS DOUBLE) * {float(quant)}), 6)
                   AS mean_r
          FROM pairs GROUP BY r
        ),
        ranked AS (
          SELECT *, row_number() OVER (ORDER BY mean_r, replicate) AS rk
          FROM per
        )
        SELECT replicate, n_eff, mean_r,
               (SELECT mean_r FROM ranked WHERE rk = 2) AS ci_lo,
               (SELECT mean_r FROM ranked WHERE rk = {n_replicates - 1})
                 AS ci_hi
        FROM per
    """


#: hierarchical rollup via WITH RECURSIVE — the same SQL text runs on
#: Spark 4 (UNION ALL recursion, new in 4.0) and DuckDB: customers form
#: a digit-shift tree (parent = custkey div 10, keys 1-9 are roots),
#: the recursion carries root/depth/balance down the tree, then rolls
#: up per depth. Acyclic by construction, so UNION ALL terminates —
#: Spark does not yet support dedup-UNION recursion (cyclic closure
#: stays with dup_clusters/pagerank).
_RECURSIVE_SQL = """
    WITH RECURSIVE chain AS (
      SELECT c_custkey AS node, c_custkey AS root, 1 AS depth,
             c_acctbal AS bal
      FROM customer WHERE c_custkey <= 9
      UNION ALL
      SELECT c.c_custkey AS node, chain.root, chain.depth + 1 AS depth,
             c.c_acctbal AS bal
      FROM customer c
      JOIN chain ON CAST(floor(c.c_custkey / 10) AS BIGINT) = chain.node
      WHERE c.c_custkey >= 10
    )
    SELECT CAST(depth AS INTEGER) AS depth,
           CAST(count(*) AS BIGINT) AS n,
           CAST(count(DISTINCT root) AS BIGINT) AS n_roots,
           round(CAST(sum(bal) AS DOUBLE), 2) AS total_bal
    FROM chain GROUP BY depth
"""


def _rendezvous_oracle_sql() -> str:
    """DuckDB replay of q_b26_rendezvous: same weights, same
    negated-weight argmin (ties to the lowest shard id)."""
    from sqlite_cdc_spark.pipeline.dedup import (
        MINHASH_P,
        _hash_family,
        portable_hash60_sql,
    )

    fam = _hash_family(6, seed=0x44C)
    base = f"({portable_hash60_sql('CAST(o_orderkey AS VARCHAR)')}) % {MINHASH_P}"

    def assign(n: int) -> str:
        lst = ", ".join(
            f"{{'w': -((h * {fam[s][0]} + {fam[s][1]}) % {MINHASH_P}),"
            f" 's': {s}}}"
            for s in range(n)
        )
        return f"list_min([{lst}])['s']"

    return f"""
        WITH routed AS (
          SELECT {assign(5)} AS shard5, {assign(6)} AS shard6
          FROM (SELECT {base} AS h FROM orders)
        ),
        per AS (
          SELECT shard6 AS shard, CAST(count(*) AS BIGINT) AS n_keys
          FROM routed GROUP BY shard6
        ),
        mv AS (
          SELECT CAST(sum(CASE WHEN shard5 <> shard6 THEN 1 ELSE 0 END)
                      AS BIGINT) AS n_moved,
                 CAST(count(*) AS BIGINT) AS n_total
          FROM routed
        )
        SELECT shard, n_keys, n_moved, n_total,
               round(n_moved / CAST(n_total AS DOUBLE), 6) AS moved_frac
        FROM per CROSS JOIN mv
    """


def _cdc_chunks_oracle_sql(window: int = 8, mask: int = 63) -> str:
    """DuckDB replay of q_b18_cdc_chunks: identical rolling-hash
    boundary rule, sentinel union, lag segmentation and md5 chunk ids."""
    from sqlite_cdc_spark.pipeline.dedup import MINHASH_P, portable_hash60_sql

    h = portable_hash60_sql(f"substr(t, CAST(p AS INTEGER), {window})")
    return f"""
        WITH corpus AS ({_B19_CORPUS_SQL}),
        base AS (SELECT doc_id AS d, text AS t FROM corpus),
        pos AS (
          SELECT d, t, unnest(generate_series(1,
                 greatest(length(t) - {window - 1}, 0))) AS p
          FROM base
        ),
        bounds AS (
          SELECT d, p + {window - 1} AS e FROM pos
          WHERE (({h}) % {mask + 1} + {mask + 1}) % {mask + 1} = 0
        ),
        ends AS (
          SELECT DISTINCT d, e FROM (
            SELECT d, e FROM bounds
            UNION ALL
            SELECT d, length(t) AS e FROM base
          )
        ),
        segs AS (
          SELECT ends.d,
                 substr(base.t,
                        CAST(COALESCE(lag(e) OVER (PARTITION BY ends.d
                             ORDER BY e), 0) + 1 AS INTEGER),
                        CAST(e - COALESCE(lag(e) OVER (PARTITION BY ends.d
                             ORDER BY e), 0) AS INTEGER)) AS chunk,
                 e - COALESCE(lag(e) OVER (PARTITION BY ends.d
                     ORDER BY e), 0) AS ln
          FROM ends JOIN base ON base.d = ends.d
          QUALIFY ln >= 1
        ),
        per AS (SELECT md5(chunk) AS h, CAST(ln AS BIGINT) AS ln FROM segs),
        tot AS (SELECT CAST(count(*) AS BIGINT) AS n_chunks,
                       CAST(sum(ln) AS BIGINT) AS total_chars FROM per),
        dis AS (
          SELECT CAST(count(*) AS BIGINT) AS n_distinct,
                 CAST(sum(l) AS BIGINT) AS distinct_chars
          FROM (SELECT h, min(ln) AS l FROM per GROUP BY h)
        )
        SELECT n_chunks, n_distinct, total_chars, distinct_chars,
               round(1.0 - distinct_chars / CAST(total_chars AS DOUBLE), 6)
                 AS dedup_ratio,
               round(total_chars / CAST(n_chunks AS DOUBLE), 6)
                 AS avg_chunk_len
        FROM tot CROSS JOIN dis
    """


def _ewma_oracle_sql(n_terms: int = 8, quant: int = 100) -> str:
    """DuckDB replay of q_b11_ewma: identical integer lag-sum ratio."""
    num = " + ".join(
        f"COALESCE(lag(qv, {j}) OVER w * {2 ** (n_terms - 1 - j)}, 0)"
        for j in range(n_terms)
    )
    den = " + ".join(
        f"CASE WHEN lag(qv, {j}) OVER w IS NOT NULL"
        f" THEN {2 ** (n_terms - 1 - j)} ELSE 0 END"
        for j in range(n_terms)
    )
    return f"""
        WITH q AS (
          SELECT user_id, event_id, ts,
                 CAST(floor(value * {quant}) AS BIGINT) AS qv
          FROM events
        )
        SELECT user_id, event_id,
               round(({num}) / (({den}) * {float(quant)}), 6) AS ewma
        FROM q
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """


def _pagerank_oracle_sql(iters: int = 3) -> str:
    """DuckDB replay of q_b30_pagerank: identical integer floor-division
    rank updates, iteration by iteration."""
    share = (
        "CAST(((rr.r * 17) - (((rr.r * 17) % (20 * od.od) + (20 * od.od))"
        " % (20 * od.od))) / (20 * od.od) AS BIGINT)"
    )
    parts = [
        """ed AS (
          SELECT DISTINCT o_custkey AS c, l_suppkey + 1000000 AS s
          FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        ),
        e AS (
          SELECT c AS src, s AS dst FROM ed
          UNION ALL
          SELECT s AS src, c AS dst FROM ed
        ),
        nodes AS (
          SELECT src AS node_id FROM e UNION SELECT dst FROM e
        ),
        od AS (SELECT src, CAST(count(*) AS BIGINT) AS od FROM e GROUP BY src),
        r0 AS (SELECT node_id, CAST(1000000 AS BIGINT) AS r FROM nodes)"""
    ]
    for t in range(1, iters + 1):
        parts.append(f"""s{t} AS (
          SELECT e.dst AS node_id, {share} AS share
          FROM r{t - 1} rr
          JOIN od ON od.src = rr.node_id
          JOIN e ON e.src = rr.node_id
        ),
        r{t} AS (
          SELECT n.node_id,
                 CAST(150000 + COALESCE(sum(share), 0) AS BIGINT) AS r
          FROM nodes n LEFT JOIN s{t} ON s{t}.node_id = n.node_id
          GROUP BY n.node_id
        )""")
    return (
        "WITH " + ",\n        ".join(parts) + f"""
        SELECT node_id, rank_units, rnk FROM (
          SELECT node_id, r AS rank_units,
                 row_number() OVER (ORDER BY r DESC, node_id) AS rnk
          FROM r{iters}
        ) WHERE rnk <= 30
    """
    )


def _psi_oracle_sql(n_buckets: int = 10) -> str:
    """DuckDB replay of q_b3_psi: identical rank-edge, smoothing and
    1e-8 floor-quantization rules."""
    B = n_buckets
    edge_cols = ", ".join(
        f"min(CASE WHEN cum >= floor((n - 1) * {k} / {B}) + 1 THEN v END)"
        f" AS e{k}"
        for k in range(1, B)
    )
    bucket_expr = " + ".join(
        f"CAST(v > e{k} AS INTEGER)" for k in range(1, B)
    )
    return f"""
        WITH b AS (SELECT value AS v FROM events
                   WHERE ts < TIMESTAMP '2024-01-16 00:00:00'),
        c AS (SELECT value AS v FROM events
              WHERE ts >= TIMESTAMP '2024-01-16 00:00:00'),
        vh AS (SELECT v, CAST(count(*) AS BIGINT) AS cnt FROM b GROUP BY v),
        cum AS (SELECT v, CAST(sum(cnt) OVER (ORDER BY v
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS cum FROM vh),
        tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM vh),
        edges AS (SELECT {edge_cols} FROM cum CROSS JOIN tot),
        nb AS (SELECT {bucket_expr} AS bucket, CAST(count(*) AS BIGINT) AS n_base
               FROM b CROSS JOIN edges GROUP BY 1),
        nc AS (SELECT {bucket_expr} AS bucket, CAST(count(*) AS BIGINT) AS n_cur
               FROM c CROSS JOIN edges GROUP BY 1),
        grid AS (SELECT unnest(generate_series(0, {B - 1})) AS bucket),
        j AS (
          SELECT CAST(grid.bucket AS INTEGER) AS bucket,
                 COALESCE(n_base, 0) AS n_base, COALESCE(n_cur, 0) AS n_cur
          FROM grid LEFT JOIN nb ON nb.bucket = grid.bucket
                    LEFT JOIN nc ON nc.bucket = grid.bucket
        ),
        t AS (SELECT CAST(sum(n_base) AS BIGINT) AS tb,
                     CAST(sum(n_cur) AS BIGINT) AS tc FROM j),
        terms AS (
          SELECT bucket, n_base, n_cur,
                 (n_base + 1) / CAST(tb + {B} AS DOUBLE) AS p,
                 (n_cur + 1) / CAST(tc + {B} AS DOUBLE) AS q
          FROM j CROSS JOIN t
        ),
        scored AS (
          SELECT bucket, n_base, n_cur,
                 round(p, 6) AS share_base, round(q, 6) AS share_cur,
                 round((p - q) * ln(p / q), 6) AS psi_term,
                 CAST(floor((p - q) * ln(p / q) * 1e8) AS BIGINT) AS t8
          FROM terms
        )
        SELECT bucket, n_base, n_cur, share_base, share_cur, psi_term,
               round(sum(t8) OVER () / 1e8, 6) AS psi_total
        FROM scored
    """


def _kmeans_oracle_sql(k: int = 4, iters: int = 3, d: int = 64, quant: int = 10**6) -> str:
    """DuckDB replay of q_b20_kmeans: the same quantize → (assign →
    update → coalesce-empty)×iters → final-assign chain, all integer
    (explicit floor-division form — DuckDB's // truncates toward 0)."""
    dist = (
        f"list_sum(list_transform(generate_series(1, {d}),"
        " i -> (qe[i]-ce[i])*(qe[i]-ce[i])))"
    )
    parts = [
        f"""q AS (
          SELECT vec_id, list_transform(embedding,
                 x -> CAST(floor(CAST(x AS DOUBLE) * {float(quant)}) AS BIGINT)) AS qe
          FROM embeddings
        ),
        dims AS (SELECT unnest(generate_series(1, {d})) AS dim),
        c0 AS (
          SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS cid,
                 qe AS ce
          FROM (SELECT vec_id, qe FROM q ORDER BY vec_id LIMIT {k})
        )"""
    ]
    for t in range(1, iters + 1):
        parts.append(f"""a{t} AS (
          SELECT vec_id, cid FROM (
            SELECT vec_id, cid,
                   row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
            FROM (
              SELECT q.vec_id, c.cid, {dist} AS dist
              FROM q CROSS JOIN c{t - 1} c
            )
          ) WHERE rn = 1
        ),
        u{t} AS (
          SELECT a{t}.cid, dims.dim, CAST(sum(q.qe[dims.dim]) AS BIGINT) AS s,
                 CAST(count(*) AS BIGINT) AS n
          FROM a{t} JOIN q USING (vec_id) CROSS JOIN dims
          GROUP BY a{t}.cid, dims.dim
        ),
        n{t} AS (
          SELECT cid,
                 list(CAST((s - ((s % n + n) % n)) / n AS BIGINT)
                      ORDER BY dim) AS ce
          FROM u{t} GROUP BY cid
        ),
        c{t} AS (
          SELECT c{t - 1}.cid, coalesce(n{t}.ce, c{t - 1}.ce) AS ce
          FROM c{t - 1} LEFT JOIN n{t} USING (cid)
        )""")
    parts.append(f"""fin AS (
          SELECT vec_id, cid FROM (
            SELECT vec_id, cid,
                   row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
            FROM (
              SELECT q.vec_id, c.cid, {dist} AS dist
              FROM q CROSS JOIN c{iters} c
            )
          ) WHERE rn = 1
        )""")
    return (
        "WITH " + ",\n        ".join(parts) + """
        SELECT vec_id, cid AS cluster_id,
               CAST(count(*) OVER (PARTITION BY cid) AS BIGINT) AS cluster_size
        FROM fin
    """
    )


#: B25 SQL-surface window functions — ONE literal SQL string run
#: verbatim on both engines (the same-text parity discipline as the
#: other b25 rows): ranking, dense ranking, a running decimal frame
#: sum, and lag, all inside inline OVER clauses.
_SQL_WINDOW_FUNCS = """
    WITH base AS (
      SELECT l_orderkey, l_linenumber, l_returnflag, l_quantity,
             l_extendedprice
      FROM lineitem WHERE l_orderkey % 37 = 0
    )
    SELECT l_orderkey, l_linenumber,
           CAST(row_number() OVER (
             PARTITION BY l_returnflag
             ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber,
                      l_quantity
           ) AS BIGINT) AS rn,
           CAST(dense_rank() OVER (
             PARTITION BY l_returnflag ORDER BY l_quantity
           ) AS BIGINT) AS dr,
           round(CAST(sum(CAST(l_extendedprice AS DECIMAL(38,6))) OVER (
             PARTITION BY l_returnflag
             ORDER BY l_orderkey, l_linenumber, l_quantity,
                      l_extendedprice
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS DOUBLE), 2) AS run_sum,
           CAST(lag(l_linenumber) OVER (
             PARTITION BY l_orderkey
             ORDER BY l_linenumber, l_quantity, l_extendedprice
           ) AS BIGINT) AS prev_ln
    FROM base
"""


_NDCG_W = [round(1_000_000 / _math.log2(i + 1)) for i in range(1, 11)]


#: HLL numerator alpha_m * m^2 * 2^53 for m=256 registers, computed ONCE
#: in Python and embedded as the identical double literal in BOTH engines
#: (multiplication/division of identical doubles is IEEE-exact, unlike
#: re-deriving alpha from decimal literals DuckDB would parse as DECIMAL).
_HLL_ALPHA_NUM = 0.7213 / (1.0 + 1.079 / 256.0) * 65536.0 * 9007199254740992.0


def _zorder_expr_sql() -> str:
    """16-bit Morton (Z-order) interleave of two 8-bit key buckets,
    rendered ONCE and executed verbatim by BOTH engines (Spark SQL and
    DuckDB share `&`, `<<`, `>>` semantics on integers): bit i of
    (l_partkey % 256) lands at position 2i, bit i of (l_suppkey % 256)
    at 2i+1. Pure integer algebra — no UDF, no float."""
    terms = []
    for i in range(8):
        terms.append(f"((((l_partkey % 256) >> {i}) & 1) << {2 * i})")
        terms.append(f"((((l_suppkey % 256) >> {i}) & 1) << {2 * i + 1})")
    return " + ".join(terms)


def _jl_signs() -> list[tuple[int, int, int]]:
    """The shared ±1 Johnson–Lindenstrauss sign matrix (64 in-dims × 16
    out-dims), derived from md5 parity so BOTH engines materialize the
    IDENTICAL table (Spark gets createDataFrame, DuckDB a VALUES list —
    the b30_ndcg shared-literal rule)."""
    import hashlib

    out = []
    for j in range(64):
        for k in range(16):
            h = int(hashlib.md5(f"jl{j}:{k}".encode()).hexdigest()[:15], 16)
            out.append((j, k, 1 if h % 2 == 0 else -1))
    return out


def _jl_projection_oracle_sql() -> str:
    """DuckDB rendering of :func:`q_b20_jl_projection` — the sign matrix
    is embedded as a VALUES list generated from the SAME ``_jl_signs()``
    call the Spark side materializes."""
    values = ", ".join(f"({j},{k},{s})" for j, k, s in _jl_signs())
    return f"""
        WITH signs(j, k, s) AS (VALUES {values}),
        quant AS (
          SELECT vec_id, i - 1 AS j,
                 CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000) AS BIGINT)
                   AS q
          FROM embeddings,
               unnest(generate_series(1, len(embedding))) AS t(i)
        ),
        proj AS (
          SELECT vec_id, k, CAST(sum(s * q) AS BIGINT) AS p
          FROM quant JOIN signs USING (j)
          GROUP BY vec_id, k
        ),
        probes AS (
          SELECT vec_id AS query_id, k, p AS qp FROM proj WHERE vec_id < 4
        ),
        scored AS (
          SELECT pr.query_id, c.vec_id AS neighbor_id,
                 CAST(sum(pr.qp * c.p) AS BIGINT) AS pdot
          FROM proj c JOIN probes pr USING (k)
          WHERE c.vec_id <> pr.query_id
          GROUP BY pr.query_id, c.vec_id
        ),
        proj_top AS (
          SELECT query_id, neighbor_id FROM (
            SELECT *, row_number() OVER (
              PARTITION BY query_id
              ORDER BY pdot DESC, neighbor_id ASC) AS rnk
            FROM scored
          ) WHERE rnk <= 10
        ),
        q AS (
          SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
          FROM embeddings WHERE vec_id < 4
        ),
        c AS (
          SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS cv
          FROM embeddings
        ),
        exact_top AS (
          SELECT query_id, neighbor_id FROM (
            SELECT query_id, neighbor_id, row_number() OVER (
              PARTITION BY query_id
              ORDER BY list_dot_product(qv, cv)
                       / (sqrt(list_dot_product(qv, qv))
                          * sqrt(list_dot_product(cv, cv))) DESC,
                       neighbor_id ASC) AS rnk
            FROM q, c WHERE neighbor_id != query_id
          ) WHERE rnk <= 10
        )
        SELECT e.query_id,
               CAST(count(p.neighbor_id) AS BIGINT) AS n_hits,
               count(p.neighbor_id) / 10.0 AS recall
        FROM exact_top e
        LEFT JOIN proj_top p
          ON e.query_id = p.query_id AND e.neighbor_id = p.neighbor_id
        GROUP BY e.query_id
    """


#: DuckDB rendering of pipeline.text normalization/tokens (keep in lockstep
#: with dedup.normalize_text / text.tokens)
_NORM_SQL = "trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))"


_TOKS_SQL = f"string_split({_NORM_SQL}, ' ')"


def _sw_hits_sql(lang: str) -> str:
    words = ", ".join(f"'{w}'" for w in textops.STOPWORDS[lang])
    return f"len(list_filter({_TOKS_SQL}, t -> list_contains([{words}], t)))"


#: the planted-near-dup corpus both b19 oracle queries run on (mirror of the
#: Spark-side mutation in q_b19_minhash_candidates / q_b19_simhash)
_B19_CORPUS_SQL = """
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 200000 AS doc_id, text || ' zzz' AS text
  FROM documents WHERE doc_id % 7 = 0
"""


#: word 3-gram expression over a `toks` list column (DuckDB 1-based)
_GRAM3_SQL = "toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]"


def _minhash_cand_ctes() -> str:
    """The shared CTE chain of the md5-mode MinHash-LSH replay, up to
    the DISTINCT candidate pairs (``cand``). Composed by
    :func:`_minhash_oracle_sql` (adds the exact-Jaccard verify tail)
    and the b19_lsh_quality oracle (counts candidates vs planted
    truth)."""
    P = dedup.MINHASH_P
    fam = dedup._hash_family(32)
    mins = ",\n                 ".join(
        f"min((h * {a} + {b}) % {P}) AS h{i}" for i, (a, b) in enumerate(fam)
    )

    def fold(b: int) -> str:
        expr = f"h{b * 4}"
        for j in range(1, 4):
            expr = f"(({expr}) * {dedup.BAND_B} + h{b * 4 + j}) % {P}"
        return expr

    buckets = ", ".join(fold(b) for b in range(8))
    bands = ", ".join(str(b) for b in range(8))
    return f"""corpus AS ({_B19_CORPUS_SQL}),
        tk AS (SELECT doc_id, string_split({_NORM_SQL}, ' ') AS toks FROM corpus),
        sh AS (
          SELECT doc_id,
                 unnest(list_transform(generate_series(1, len(toks) - 2),
                        i -> {_GRAM3_SQL})) AS sh
          FROM tk
        ),
        hashed AS (
          SELECT doc_id, ({dedup.portable_hash60_sql('sh')}) % {P} AS h FROM sh
        ),
        sig AS (SELECT doc_id, {mins} FROM hashed GROUP BY doc_id),
        banded AS (
          SELECT doc_id, unnest([{bands}]) AS band, unnest([{buckets}]) AS bucket
          FROM sig
        ),
        cand AS (
          SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
          FROM banded a JOIN banded b
            ON a.band = b.band AND a.bucket = b.bucket
          WHERE a.doc_id < b.doc_id
        )"""


def _minhash_oracle_sql() -> str:
    """Full DuckDB replay of near_dup_pairs(base_hash='md5', 32 hashes,
    8 bands): portable md5 base hash → universal-hash mins → polynomial
    band buckets → candidate equi-join → exact-Jaccard ≥ 0.8."""
    return f"""
        WITH {_minhash_cand_ctes()},
        tsets AS (
          SELECT doc_id,
                 list_distinct(list_transform(generate_series(1, len(toks) - 2),
                               i -> {_GRAM3_SQL})) AS shs
          FROM tk
        ),
        scored AS (
          SELECT id_a, id_b,
                 CAST(len(list_intersect(sa.shs, sb.shs)) AS DOUBLE)
                 / CAST(len(sa.shs) + len(sb.shs)
                        - len(list_intersect(sa.shs, sb.shs)) AS DOUBLE) AS j
          FROM cand
          JOIN tsets sa ON sa.doc_id = cand.id_a
          JOIN tsets sb ON sb.doc_id = cand.id_b
        )
        SELECT id_a, id_b, round(j, 6) AS jaccard FROM scored WHERE j >= 0.8
    """


def _dup_clusters_oracle_sql() -> str:
    """DuckDB replay of q_b19_dup_clusters: the portable-md5 pair set
    (same SQL as the b19_minhash_candidates oracle, nested as a CTE)
    transitively closed by a recursive CTE — label = min reachable id,
    the same canonical labeling dedup.dup_clusters converges to."""
    return f"""
        WITH RECURSIVE pairs AS ({_minhash_oracle_sql()}),
        edges AS (
          SELECT id_a AS src, id_b AS dst FROM pairs
          UNION
          SELECT id_b AS src, id_a AS dst FROM pairs
        ),
        reach AS (
          SELECT DISTINCT src AS v, src AS r FROM edges
          UNION
          SELECT e.dst AS v, reach.r AS r FROM reach JOIN edges e ON e.src = reach.v
        ),
        lab AS (SELECT v AS doc_id, min(r) AS cluster_id FROM reach GROUP BY v)
        SELECT doc_id, cluster_id,
               CAST(count(*) OVER (PARTITION BY cluster_id) AS BIGINT)
                 AS cluster_size
        FROM lab
    """


def _incremental_index_oracle_sql() -> str:
    """DuckDB replay of q_b19_incremental_index: portable-hash LSH index
    over the standing corpus, probed by the mutated batch."""
    P = dedup.MINHASH_P
    fam = dedup._hash_family(32)
    mins = ",\n                 ".join(
        f"min((h * {a} + {b}) % {P}) AS h{i}" for i, (a, b) in enumerate(fam)
    )

    def fold(b: int) -> str:
        expr = f"h{b * 4}"
        for j in range(1, 4):
            expr = f"(({expr}) * {dedup.BAND_B} + h{b * 4 + j}) % {P}"
        return expr

    buckets = ", ".join(fold(b) for b in range(8))
    bands = ", ".join(str(b) for b in range(8))

    def banded(src: str, alias: str) -> str:
        return f"""
        {alias}_tk AS (
          SELECT doc_id, string_split({_NORM_SQL}, ' ') AS toks FROM {src}
        ),
        {alias}_sh AS (
          SELECT doc_id,
                 unnest(list_transform(generate_series(1, len(toks) - 2),
                        i -> {_GRAM3_SQL})) AS sh
          FROM {alias}_tk
        ),
        {alias}_hashed AS (
          SELECT doc_id, ({dedup.portable_hash60_sql('sh')}) % {P} AS h
          FROM {alias}_sh
        ),
        {alias}_sig AS (
          SELECT doc_id, {mins} FROM {alias}_hashed GROUP BY doc_id
        ),
        {alias}_banded AS (
          SELECT doc_id, unnest([{bands}]) AS band,
                 unnest([{buckets}]) AS bucket
          FROM {alias}_sig
        )"""

    return f"""
        WITH corpus AS (
          SELECT doc_id, text FROM documents WHERE doc_id >= 20
        ),
        batch AS (
          SELECT doc_id + 400000 AS doc_id, text || ' qqq' AS text
          FROM documents WHERE doc_id >= 20 AND doc_id < 40
        ),{banded('corpus', 'c')},{banded('batch', 'q')}
        SELECT DISTINCT q.doc_id AS new_id, c.doc_id AS corpus_id
        FROM q_banded q JOIN c_banded c
          ON q.band = c.band AND q.bucket = c.bucket
        WHERE q.doc_id != c.doc_id
    """


def _incremental_clusters_oracle_sql() -> str:
    """DuckDB replay of q_b19_incremental_clusters: from-scratch closure
    over (standing minhash-verified pairs ∪ batch index-probe pairs) —
    the oracle for the incremental update path being exact."""
    P = dedup.MINHASH_P
    fam = dedup._hash_family(32)
    mins = ",\n                 ".join(
        f"min((h * {a} + {b}) % {P}) AS h{i}" for i, (a, b) in enumerate(fam)
    )

    def fold(b: int) -> str:
        expr = f"h{b * 4}"
        for j in range(1, 4):
            expr = f"(({expr}) * {dedup.BAND_B} + h{b * 4 + j}) % {P}"
        return expr

    buckets = ", ".join(fold(b) for b in range(8))
    bands = ", ".join(str(b) for b in range(8))

    def banded(src: str, alias: str) -> str:
        return f"""
        {alias}_tk AS (
          SELECT doc_id, string_split({_NORM_SQL}, ' ') AS toks FROM {src}
        ),
        {alias}_sh AS (
          SELECT doc_id,
                 unnest(list_transform(generate_series(1, len(toks) - 2),
                        i -> {_GRAM3_SQL})) AS sh
          FROM {alias}_tk
        ),
        {alias}_hashed AS (
          SELECT doc_id, ({dedup.portable_hash60_sql('sh')}) % {P} AS h
          FROM {alias}_sh
        ),
        {alias}_sig AS (
          SELECT doc_id, {mins} FROM {alias}_hashed GROUP BY doc_id
        ),
        {alias}_banded AS (
          SELECT doc_id, unnest([{bands}]) AS band,
                 unnest([{buckets}]) AS bucket
          FROM {alias}_sig
        )"""

    return f"""
        WITH RECURSIVE corpus AS (
          SELECT doc_id, text FROM documents WHERE doc_id >= 20
          UNION ALL
          SELECT doc_id + 200000 AS doc_id, text || ' zzz' AS text
          FROM documents WHERE doc_id % 7 = 0 AND doc_id >= 20
        ),
        batch AS (
          SELECT doc_id + 400000 AS doc_id, text || ' qqq' AS text
          FROM documents WHERE doc_id >= 20 AND doc_id < 40
        ),{banded('corpus', 'c')},{banded('batch', 'q')},
        cand AS (
          SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
          FROM c_banded a JOIN c_banded b
            ON a.band = b.band AND a.bucket = b.bucket
          WHERE a.doc_id < b.doc_id
        ),
        tsets AS (
          SELECT doc_id,
                 list_distinct(list_transform(generate_series(1, len(toks) - 2),
                               i -> {_GRAM3_SQL})) AS shs
          FROM c_tk
        ),
        p1 AS (
          SELECT id_a, id_b FROM (
            SELECT id_a, id_b,
                   CAST(len(list_intersect(sa.shs, sb.shs)) AS DOUBLE)
                   / CAST(len(sa.shs) + len(sb.shs)
                          - len(list_intersect(sa.shs, sb.shs)) AS DOUBLE) AS j
            FROM cand
            JOIN tsets sa ON sa.doc_id = cand.id_a
            JOIN tsets sb ON sb.doc_id = cand.id_b
          ) WHERE j >= 0.8
        ),
        p2 AS (
          SELECT DISTINCT q.doc_id AS id_a, c.doc_id AS id_b
          FROM q_banded q JOIN c_banded c
            ON q.band = c.band AND q.bucket = c.bucket
          WHERE q.doc_id != c.doc_id
        ),
        edges AS (
          SELECT id_a AS src, id_b AS dst FROM p1
          UNION SELECT id_b, id_a FROM p1
          UNION SELECT id_a, id_b FROM p2
          UNION SELECT id_b, id_a FROM p2
        ),
        reach AS (
          SELECT DISTINCT src AS v, src AS r FROM edges
          UNION
          SELECT e.dst AS v, reach.r AS r FROM reach JOIN edges e ON e.src = reach.v
        ),
        lab AS (SELECT v AS doc_id, min(r) AS cluster_id FROM reach GROUP BY v)
        SELECT doc_id, cluster_id,
               CAST(count(*) OVER (PARTITION BY cluster_id) AS BIGINT)
                 AS cluster_size
        FROM lab
    """


def _corpus_v2_oracle_sql() -> str:
    """DuckDB replay of q_b24_corpus_v2: minhash pairs → recursive-CTE
    cluster closure → drop non-minima → token gate → integer-exact
    mixture rates → chunk windows → per-lang stats."""
    return f"""
        WITH RECURSIVE pairs AS ({_minhash_oracle_sql()}),
        edges AS (
          SELECT id_a AS src, id_b AS dst FROM pairs
          UNION
          SELECT id_b AS src, id_a AS dst FROM pairs
        ),
        reach AS (
          SELECT DISTINCT src AS v, src AS r FROM edges
          UNION
          SELECT e.dst AS v, reach.r AS r FROM reach JOIN edges e ON e.src = reach.v
        ),
        lab AS (SELECT v AS doc_id, min(r) AS cluster_id FROM reach GROUP BY v),
        corpus_l AS (
          SELECT doc_id, lang, text FROM documents
          UNION ALL
          SELECT doc_id + 200000 AS doc_id, lang, text || ' zzz' AS text
          FROM documents WHERE doc_id % 7 = 0
        ),
        surv AS (
          SELECT * FROM corpus_l
          WHERE doc_id NOT IN (
            SELECT doc_id FROM lab WHERE doc_id != cluster_id
          )
        ),
        gated AS (
          SELECT doc_id, lang, text,
                 CAST(len({_TOKS_SQL}) AS BIGINT) AS n_tok
          FROM surv
          WHERE CAST(len({_TOKS_SQL}) AS BIGINT) >= 20
        ),
        totals AS (
          SELECT lang, sum(n_tok) AS total FROM gated GROUP BY lang
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
        ),
        mixed AS (
          SELECT g.* FROM gated g JOIN rates r ON g.lang = r.lang
          WHERE {sampling.bucket_sql('g.doc_id')} < r.keep_b
        ),
        tk2 AS (
          SELECT doc_id, lang, string_split({_NORM_SQL}, ' ') AS toks
          FROM mixed
        ),
        chunks AS (
          SELECT doc_id, lang,
                 CAST(least(16, len(toks) - i*12) AS BIGINT) AS ct
          FROM tk2,
               unnest(generate_series(0, greatest((len(toks) - 1) // 12, 0)))
                 AS t(i)
          WHERE i = 0 OR i*12 + 4 < len(toks)
        )
        SELECT lang,
               count(DISTINCT doc_id) AS n_docs,
               count(*) AS n_chunks,
               CAST(sum(ct) AS BIGINT) AS sum_chunk_tokens
        FROM chunks GROUP BY lang
    """


def _split_leakage_oracle_sql() -> str:
    """DuckDB replay of q_b26_split_leakage: minhash pairs → recursive-CTE
    closure → split both ways (doc bucket vs cluster bucket) → leak
    counts."""

    def split(key: str) -> str:
        return (
            f"CASE WHEN {sampling.bucket_sql(key)} < 80 THEN 'train' "
            f"WHEN {sampling.bucket_sql(key)} < 90 THEN 'val' "
            f"ELSE 'test' END"
        )

    return f"""
        WITH RECURSIVE pairs AS ({_minhash_oracle_sql()}),
        edges AS (
          SELECT id_a AS src, id_b AS dst FROM pairs
          UNION
          SELECT id_b AS src, id_a AS dst FROM pairs
        ),
        reach AS (
          SELECT DISTINCT src AS v, src AS r FROM edges
          UNION
          SELECT e.dst AS v, reach.r AS r FROM reach JOIN edges e ON e.src = reach.v
        ),
        lab AS (SELECT v AS doc_id, min(r) AS cluster_id FROM reach GROUP BY v),
        keyed AS (
          SELECT doc_id,
                 {split('doc_id')} AS dsp,
                 {split('cluster_id')} AS csp
          FROM lab
        )
        SELECT
          CAST(sum(CASE WHEN a.dsp != b.dsp THEN 1 ELSE 0 END) AS BIGINT)
            AS doc_keyed_leaks,
          CAST(sum(CASE WHEN a.csp != b.csp THEN 1 ELSE 0 END) AS BIGINT)
            AS cluster_keyed_leaks,
          count(*) AS n_pairs
        FROM pairs p
        JOIN keyed a ON a.doc_id = p.id_a
        JOIN keyed b ON b.doc_id = p.id_b
    """


def _simhash_oracle_sql() -> str:
    """Full DuckDB replay of simhash_candidates(base_hash='md5'): 60-bit
    portable fingerprints (per-bit ±1 token votes), 4×15-bit pigeonhole
    bands, exact Hamming ≤ 3 verify."""
    shifts = ", ".join(f"(fp >> {b * 15}) & 32767" for b in range(4))
    return f"""
        WITH corpus AS ({_B19_CORPUS_SQL}),
        tok AS (
          SELECT doc_id, unnest(string_split({_NORM_SQL}, ' ')) AS t FROM corpus
        ),
        th AS (SELECT doc_id, {dedup.portable_hash60_sql('t')} AS h FROM tok),
        votes AS (
          SELECT doc_id, bit,
                 sum(CASE WHEN (h >> bit) & 1 = 1 THEN 1 ELSE -1 END) AS vote
          FROM th
          CROSS JOIN (SELECT unnest(generate_series(0, 59)) AS bit) bits
          GROUP BY doc_id, bit
        ),
        fp AS (
          SELECT doc_id,
                 CAST(sum(CASE WHEN vote > 0
                               THEN (CAST(1 AS BIGINT) << bit)
                               ELSE 0 END) AS BIGINT) AS fp
          FROM votes GROUP BY doc_id
        ),
        ch AS (
          SELECT doc_id, fp, unnest([0, 1, 2, 3]) AS chunk,
                 unnest([{shifts}]) AS val
          FROM fp
        ),
        cand AS (
          SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
                 CAST(bit_count(xor(a.fp, b.fp)) AS BIGINT) AS hamming
          FROM ch a JOIN ch b ON a.chunk = b.chunk AND a.val = b.val
          WHERE a.doc_id < b.doc_id
        )
        SELECT id_a, id_b, hamming FROM cand WHERE hamming <= 3
    """


def _decontam_oracle_sql() -> str:
    """DuckDB replay of q_b29_decontamination: raw-string 5-gram overlap
    between the planted corpus and the doc_id<20 benchmark."""
    gram5 = (
        "toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' ' || "
        "toks[i+3] || ' ' || toks[i+4]"
    )
    return f"""
        WITH bench AS (SELECT doc_id, text FROM documents WHERE doc_id < 20),
        b0 AS (SELECT text AS bt FROM documents WHERE doc_id = 0),
        corpus AS (
          SELECT doc_id, text FROM documents WHERE doc_id >= 20
          UNION ALL
          SELECT doc_id + 300000 AS doc_id, text || ' ' || bt AS text
          FROM documents, b0 WHERE doc_id % 10 = 5
        ),
        btk AS (SELECT string_split({_NORM_SQL}, ' ') AS toks FROM bench),
        bg AS (
          SELECT DISTINCT sh FROM (
            SELECT unnest(list_transform(generate_series(1, len(toks) - 4),
                          i -> {gram5})) AS sh
            FROM btk)
        ),
        ctk AS (SELECT doc_id, string_split({_NORM_SQL}, ' ') AS toks FROM corpus),
        cg AS (
          SELECT DISTINCT doc_id, sh FROM (
            SELECT doc_id,
                   unnest(list_transform(generate_series(1, len(toks) - 4),
                          i -> {gram5})) AS sh
            FROM ctk)
        ),
        hits AS (
          SELECT doc_id, count(*) AS n FROM cg JOIN bg USING (sh)
          GROUP BY doc_id
        )
        SELECT c.doc_id,
               CAST(COALESCE(n, 0) AS BIGINT) AS n_shared_ngrams,
               COALESCE(n, 0) > 0 AS contaminated
        FROM corpus c LEFT JOIN hits ON c.doc_id = hits.doc_id
    """


def _incr_decontam_oracle_sql() -> str:
    """DuckDB replay of q_b29_incremental_decontam: the standing bench
    5-gram set vs a CDC batch (planted-contaminated + clean suffix
    mutations). Same gram SQL as the full-corpus oracle; only the
    corpus relation differs (the batch)."""
    gram5 = (
        "toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' ' || "
        "toks[i+3] || ' ' || toks[i+4]"
    )
    return f"""
        WITH bench AS (SELECT doc_id, text FROM documents WHERE doc_id < 20),
        b0 AS (SELECT text AS bt FROM documents WHERE doc_id = 0),
        corpus AS (
          SELECT doc_id + 500000 AS doc_id, text || ' ' || bt AS text
          FROM documents, b0 WHERE doc_id % 10 = 5
          UNION ALL
          SELECT doc_id + 600000 AS doc_id, text || ' qq' AS text
          FROM documents WHERE doc_id % 10 = 6
        ),
        btk AS (SELECT string_split({_NORM_SQL}, ' ') AS toks FROM bench),
        bg AS (
          SELECT DISTINCT sh FROM (
            SELECT unnest(list_transform(generate_series(1, len(toks) - 4),
                          i -> {gram5})) AS sh
            FROM btk)
        ),
        ctk AS (SELECT doc_id, string_split({_NORM_SQL}, ' ') AS toks FROM corpus),
        cg AS (
          SELECT DISTINCT doc_id, sh FROM (
            SELECT doc_id,
                   unnest(list_transform(generate_series(1, len(toks) - 4),
                          i -> {gram5})) AS sh
            FROM ctk)
        ),
        hits AS (
          SELECT doc_id, count(*) AS n FROM cg JOIN bg USING (sh)
          GROUP BY doc_id
        )
        SELECT c.doc_id,
               CAST(COALESCE(n, 0) AS BIGINT) AS n_shared_ngrams,
               COALESCE(n, 0) > 0 AS contaminated
        FROM corpus c LEFT JOIN hits ON c.doc_id = hits.doc_id
    """


def _containment_oracle_sql() -> str:
    """DuckDB replay of q_b29_containment: dense benchmark window
    fingerprints vs stride-8 corpus window fingerprints over the same
    planted fixture as the exact-n-gram oracle."""
    return f"""
        WITH bench AS (SELECT doc_id, text FROM documents WHERE doc_id < 20),
        b0 AS (SELECT text AS bt FROM documents WHERE doc_id = 0),
        corpus AS (
          SELECT doc_id, text FROM documents WHERE doc_id >= 20
          UNION ALL
          SELECT doc_id + 300000 AS doc_id, text || ' ' || bt AS text
          FROM documents, b0 WHERE doc_id % 10 = 5
        ),
        btk AS (SELECT string_split({_NORM_SQL}, ' ') AS toks FROM bench),
        bfp AS (
          SELECT DISTINCT
                 md5(array_to_string(list_slice(toks, i + 1, i + 16), ' ')) AS fp
          FROM btk,
               unnest(generate_series(0, greatest(len(toks) - 16, 0))) AS t(i)
        ),
        ctk AS (
          SELECT doc_id, string_split({_NORM_SQL}, ' ') AS toks FROM corpus
        ),
        cfp AS (
          SELECT DISTINCT doc_id,
                 md5(array_to_string(list_slice(toks, i*8 + 1, i*8 + 16),
                     ' ')) AS fp
          FROM ctk,
               unnest(generate_series(0,
                 greatest((len(toks) - 16) // 8, 0))) AS t(i)
        ),
        hits AS (
          SELECT doc_id, count(*) AS n FROM cfp JOIN bfp USING (fp)
          GROUP BY doc_id
        )
        SELECT c.doc_id,
               CAST(COALESCE(n, 0) AS BIGINT) AS n_shared_windows,
               COALESCE(n, 0) > 0 AS contained
        FROM corpus c LEFT JOIN hits ON c.doc_id = hits.doc_id
    """


def _pii_oracle_sql() -> str:
    """DuckDB replay of q_b21_pii_scrub (same regexes, 'g' flag for the
    global replace)."""
    e, i4, ph = (
        textops.PII_PATTERNS["email"],
        textops.PII_PATTERNS["ipv4"],
        textops.PII_PATTERNS["phone"],
    )
    return f"""
        WITH injected AS (
          SELECT doc_id,
                 text ||
                 CASE WHEN doc_id % 13 = 0
                      THEN ' reach me at first.last+spam@example.co.uk ok'
                      ELSE '' END ||
                 CASE WHEN doc_id % 17 = 0
                      THEN ' call +1 (555) 123-4567 now' ELSE '' END ||
                 CASE WHEN doc_id % 19 = 0
                      THEN ' server at 10.0.42.7 down' ELSE '' END AS text
          FROM documents
        )
        SELECT doc_id,
               CAST(len(regexp_extract_all(text, '{e}')) AS BIGINT) AS n_email,
               CAST(len(regexp_extract_all(text, '{ph}')) AS BIGINT) AS n_phone,
               CAST(len(regexp_extract_all(text, '{i4}')) AS BIGINT) AS n_ip,
               regexp_replace(regexp_replace(regexp_replace(
                   text, '{e}', '[EMAIL]', 'g'),
                   '{i4}', '[IP]', 'g'),
                   '{ph}', '[PHONE]', 'g') AS redacted
        FROM injected
    """


def _repetition_oracle_sql() -> str:
    """DuckDB replay of text.repetition_features."""
    return f"""
        WITH tk AS (
          SELECT doc_id, string_split({_NORM_SQL}, ' ') AS toks FROM documents
        ),
        tok AS (SELECT doc_id, unnest(toks) AS tok FROM tk),
        pt AS (SELECT doc_id, tok, count(*) AS cnt FROM tok GROUP BY doc_id, tok),
        ts AS (
          SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_tokens,
                 count(*) AS n_distinct, max(cnt) AS top_cnt
          FROM pt GROUP BY doc_id
        ),
        gr AS (
          SELECT doc_id,
                 unnest(list_transform(generate_series(1, len(toks) - 1),
                        i -> toks[i] || ' ' || toks[i+1])) AS g
          FROM tk
        ),
        pg AS (SELECT doc_id, g, count(*) AS cnt FROM gr GROUP BY doc_id, g),
        gs AS (
          SELECT doc_id, sum(cnt) AS n_2grams,
                 sum(CASE WHEN cnt > 1 THEN cnt ELSE 0 END) AS dup_2grams
          FROM pg GROUP BY doc_id
        )
        SELECT ts.doc_id, n_tokens,
               round(CAST(n_distinct AS DOUBLE) / CAST(n_tokens AS DOUBLE), 6)
                 AS distinct_ratio,
               round(CAST(top_cnt AS DOUBLE) / CAST(n_tokens AS DOUBLE), 6)
                 AS top_token_ratio,
               round(CAST(COALESCE(dup_2grams, 0) AS DOUBLE)
                     / CAST(greatest(COALESCE(n_2grams, 1), 1) AS DOUBLE), 6)
                 AS dup_2gram_ratio
        FROM ts LEFT JOIN gs ON ts.doc_id = gs.doc_id
    """


def _udf_features_oracle_sql() -> str:
    """DuckDB replay of q_b23_udf_features: the mapInPandas fake-decode is
    pure arithmetic — f0 = (Σ bytes at positions ≡0 mod 8, mod 997)/997 —
    so the Arrow plumbing itself gets a bit-exact oracle row (bytes read
    back via hex(encode(text)))."""
    return """
        WITH p AS (
          SELECT doc_id, hex(encode(text)) AS h,
                 octet_length(encode(text)) AS n
          FROM documents
        ),
        s AS (
          SELECT doc_id, n,
                 COALESCE(list_sum(list_transform(
                     generate_series(0, CAST(floor((n - 1) / 8.0) AS INT)),
                     j -> CAST('0x' || substr(h, j * 16 + 1, 2) AS BIGINT))), 0)
                   AS tot
          FROM p
        )
        SELECT doc_id, CAST(n AS BIGINT) AS n_bytes,
               round((tot % 997) / 997.0, 6) AS f0
        FROM s
    """


def _ann_recall_oracle_sql() -> str:
    """DuckDB replay of q_b20_ann_recall: portable integer LSH buckets
    (Rademacher signs from the plane_sign LCG, floor-quantized components)
    + exact cosine top-5 + per-query recall."""
    mix, knuth = similarity.PLANE_MIX, similarity.PLANE_KNUTH
    probes = ", ".join(
        ["bucket"] + [f"xor(bucket, {1 << i})" for i in range(8)]
    )
    return f"""
        WITH planes AS (
          SELECT p, d,
                 CASE WHEN ((p * {mix} + d) * {knuth}) % 4294967296
                           < 2147483648 THEN 1 ELSE -1 END AS s
          FROM (SELECT unnest(generate_series(0, 7)) AS p),
               (SELECT unnest(generate_series(0, 63)) AS d)
        ),
        comp AS (
          SELECT vec_id AS id, ds.d - 1 AS d,
                 CAST(floor(CAST(embedding[ds.d] AS DOUBLE) * 1000) AS BIGINT) AS q
          FROM embeddings, (SELECT unnest(generate_series(1, 64)) AS d) ds
        ),
        dots AS (
          SELECT id, p, sum(s * q) AS dp
          FROM comp JOIN planes USING (d) GROUP BY id, p
        ),
        buckets AS (
          SELECT id,
                 CAST(sum(CASE WHEN dp >= 0 THEN (CAST(1 AS BIGINT) << p)
                               ELSE 0 END) AS BIGINT) AS bucket
          FROM dots GROUP BY id
        ),
        qb AS (
          SELECT id AS query_id, unnest([{probes}]) AS bucket
          FROM buckets WHERE id < 4
        ),
        cand AS (
          SELECT DISTINCT query_id, c.id AS neighbor_id
          FROM qb JOIN buckets c ON qb.bucket = c.bucket
          WHERE c.id != query_id
        ),
        topk AS (
          SELECT query_id, neighbor_id FROM (
            SELECT q.query_id, c.neighbor_id,
                   row_number() OVER (
                     PARTITION BY q.query_id
                     ORDER BY list_dot_product(qv, cv)
                              / (sqrt(list_dot_product(qv, qv))
                                 * sqrt(list_dot_product(cv, cv))) DESC,
                              c.neighbor_id ASC) AS rnk
            FROM (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
                  FROM embeddings WHERE vec_id < 4) q
            JOIN (SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS cv
                  FROM embeddings) c
              ON q.query_id != c.neighbor_id
          ) WHERE rnk <= 5
        )
        SELECT t.query_id, count(c.neighbor_id) AS n_hits,
               count(c.neighbor_id) / 5.0 AS recall
        FROM topk t LEFT JOIN cand c
          ON t.query_id = c.query_id AND t.neighbor_id = c.neighbor_id
        GROUP BY t.query_id
    """


_ANN_RESCORE_SQL = """
        vecs AS (
          SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        ),
        scored AS (
          SELECT cand.query_id, cand.neighbor_id,
                 list_dot_product(q.v, c.v)
                 / (sqrt(list_dot_product(q.v, q.v))
                    * sqrt(list_dot_product(c.v, c.v))) AS score
          FROM cand JOIN vecs q ON q.vec_id = cand.query_id
                    JOIN vecs c ON c.vec_id = cand.neighbor_id
        ),
        ranked AS (
          SELECT *, row_number() OVER (
            PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rnk
          FROM scored
        )
        SELECT query_id, neighbor_id, round(score, 6) AS score,
               CAST(rnk AS BIGINT) AS rnk
        FROM ranked WHERE rnk <= 5
"""


def _ann_lsh_topk_oracle_sql(n_planes: int = 8, n_tables: int = 4) -> str:
    """DuckDB replay of q_b20_ann_lsh: multi-table portable integer LSH
    buckets (table t = plane rows t·n_planes…, same plane_sign LCG as
    _ann_recall_oracle_sql) + exact-cosine re-rank of the candidate
    union."""
    mix, knuth = similarity.PLANE_MIX, similarity.PLANE_KNUTH
    probes = ", ".join(
        ["bucket"] + [f"xor(bucket, {1 << i})" for i in range(n_planes)]
    )
    return f"""
        WITH planes AS (
          SELECT p // {n_planes} AS t, p % {n_planes} AS pb, d,
                 CASE WHEN ((p * {mix} + d) * {knuth}) % 4294967296
                           < 2147483648 THEN 1 ELSE -1 END AS s
          FROM (SELECT unnest(generate_series(0, {n_tables * n_planes - 1})) AS p),
               (SELECT unnest(generate_series(0, 63)) AS d)
        ),
        comp AS (
          SELECT vec_id AS id, ds.d - 1 AS d,
                 CAST(floor(CAST(embedding[ds.d] AS DOUBLE) * 1000) AS BIGINT) AS q
          FROM embeddings, (SELECT unnest(generate_series(1, 64)) AS d) ds
        ),
        dots AS (
          SELECT id, t, pb, sum(s * q) AS dp
          FROM comp JOIN planes USING (d) GROUP BY id, t, pb
        ),
        buckets AS (
          SELECT id, t,
                 CAST(sum(CASE WHEN dp >= 0 THEN (CAST(1 AS BIGINT) << pb)
                               ELSE 0 END) AS BIGINT) AS bucket
          FROM dots GROUP BY id, t
        ),
        qb AS (
          SELECT id AS query_id, t, unnest([{probes}]) AS bucket
          FROM buckets WHERE id < 4
        ),
        cand AS (
          SELECT DISTINCT query_id, c.id AS neighbor_id
          FROM qb JOIN buckets c ON qb.t = c.t AND qb.bucket = c.bucket
          WHERE c.id != query_id
        ),
        {_ANN_RESCORE_SQL}
    """


def _ann_lsh_radius_oracle_sql(
    n_planes: int = 8,
    n_tables: int = 4,
    theta_num: int = 3,
    theta_den: int = 20,
) -> str:
    """DuckDB replay of q_b20_radius_search: the same multi-table
    portable LSH candidate chain as _ann_lsh_topk_oracle_sql, with the
    pure-integer radius-membership tail (den^2*dot^2 >= num^2*nq2*nc2)
    instead of the top-k rescore."""
    mix, knuth = similarity.PLANE_MIX, similarity.PLANE_KNUTH
    probes = ", ".join(
        ["bucket"] + [f"xor(bucket, {1 << i})" for i in range(n_planes)]
    )
    return f"""
        WITH planes AS (
          SELECT p // {n_planes} AS t, p % {n_planes} AS pb, d,
                 CASE WHEN ((p * {mix} + d) * {knuth}) % 4294967296
                           < 2147483648 THEN 1 ELSE -1 END AS s
          FROM (SELECT unnest(generate_series(0, {n_tables * n_planes - 1})) AS p),
               (SELECT unnest(generate_series(0, 63)) AS d)
        ),
        comp AS (
          SELECT vec_id AS id, ds.d - 1 AS d,
                 CAST(floor(CAST(embedding[ds.d] AS DOUBLE) * 1000) AS BIGINT) AS q
          FROM embeddings, (SELECT unnest(generate_series(1, 64)) AS d) ds
        ),
        dots AS (
          SELECT id, t, pb, sum(s * q) AS dp
          FROM comp JOIN planes USING (d) GROUP BY id, t, pb
        ),
        buckets AS (
          SELECT id, t,
                 CAST(sum(CASE WHEN dp >= 0 THEN (CAST(1 AS BIGINT) << pb)
                               ELSE 0 END) AS BIGINT) AS bucket
          FROM dots GROUP BY id, t
        ),
        qb AS (
          SELECT id AS query_id, t, unnest([{probes}]) AS bucket
          FROM buckets WHERE id < 8
        ),
        cand AS (
          SELECT DISTINCT query_id, c.id AS neighbor_id
          FROM qb JOIN buckets c ON qb.t = c.t AND qb.bucket = c.bucket
          WHERE c.id != query_id
        ),
        norms AS (
          SELECT id, CAST(sum(q * q) AS BIGINT) AS n2 FROM comp GROUP BY id
        ),
        pair_dots AS (
          SELECT cand.query_id, cand.neighbor_id,
                 CAST(sum(cq.q * cc.q) AS BIGINT) AS dot_q
          FROM cand
          JOIN comp cq ON cq.id = cand.query_id
          JOIN comp cc ON cc.id = cand.neighbor_id AND cc.d = cq.d
          GROUP BY 1, 2
        )
        SELECT p.query_id, p.neighbor_id, p.dot_q,
               round(CAST(p.dot_q AS DOUBLE)
                     / (sqrt(CAST(nq.n2 AS DOUBLE))
                        * sqrt(CAST(nc.n2 AS DOUBLE))), 6) AS cos
        FROM pair_dots p
        JOIN norms nq ON nq.id = p.query_id
        JOIN norms nc ON nc.id = p.neighbor_id
        WHERE p.dot_q > 0
          AND {theta_den * theta_den} * p.dot_q * p.dot_q
              >= {theta_num * theta_num} * nq.n2 * nc.n2
    """


def _ann_ivf_topk_oracle_sql() -> str:
    """DuckDB replay of q_b20_ann_ivf: seed-centroid IVF — integer-exact
    cell assignment (argmax quantized dot, ties to lowest centroid id),
    n_probe=3 query probing, exact-cosine re-rank."""
    cids = ", ".join(str(c) for c in similarity.IVF_SEED_CENTROIDS)
    return f"""
        WITH comp AS (
          SELECT vec_id AS id, ds.d - 1 AS d,
                 CAST(floor(CAST(embedding[ds.d] AS DOUBLE) * 1000) AS BIGINT) AS q
          FROM embeddings, (SELECT unnest(generate_series(1, 64)) AS d) ds
        ),
        cents AS (
          SELECT id AS cid, d, q AS cq FROM comp WHERE id IN ({cids})
        ),
        dots AS (
          SELECT comp.id, cid, sum(comp.q * cq) AS dp
          FROM comp JOIN cents USING (d) GROUP BY comp.id, cid
        ),
        ranked_cells AS (
          SELECT id, cid,
                 row_number() OVER (PARTITION BY id ORDER BY dp DESC, cid ASC) AS r
          FROM dots
        ),
        ccell AS (SELECT id AS neighbor_id, cid AS cell FROM ranked_cells WHERE r = 1),
        qcell AS (
          SELECT id AS query_id, cid AS cell
          FROM ranked_cells WHERE r <= 3 AND id < 4
        ),
        cand AS (
          SELECT DISTINCT query_id, neighbor_id
          FROM qcell JOIN ccell USING (cell)
          WHERE neighbor_id != query_id
        ),
        {_ANN_RESCORE_SQL}
    """


def _cluster_stability_oracle_sql() -> str:
    """DuckDB replay of q_b19_cluster_stability: the near-dup closure
    (same recursive CTE as _dup_clusters_oracle_sql), the exact-dup
    min-id grouping, then integer pair-count contingency and the
    Rand/ARI ratios."""
    return f"""
        WITH RECURSIVE pairs AS ({_minhash_oracle_sql()}),
        corpus AS (
          SELECT doc_id, text FROM documents
          UNION ALL
          SELECT doc_id + 200000 AS doc_id, text || ' zzz' AS text
          FROM documents WHERE doc_id % 7 = 0
        ),
        edges AS (
          SELECT id_a AS src, id_b AS dst FROM pairs
          UNION
          SELECT id_b AS src, id_a AS dst FROM pairs
        ),
        reach AS (
          SELECT DISTINCT src AS v, src AS r FROM edges
          UNION
          SELECT e.dst AS v, reach.r AS r FROM reach JOIN edges e ON e.src = reach.v
        ),
        lab AS (SELECT v AS doc_id, min(r) AS a FROM reach GROUP BY v),
        ex AS (
          SELECT doc_id,
                 min(doc_id) OVER (
                   PARTITION BY {_NORM_SQL}
                 ) AS b
          FROM corpus
        ),
        assign AS (
          SELECT c.doc_id, coalesce(lab.a, c.doc_id) AS a, ex.b
          FROM corpus c LEFT JOIN lab ON lab.doc_id = c.doc_id
          JOIN ex ON ex.doc_id = c.doc_id
        ),
        cont AS (
          SELECT a, b, count(*) AS n FROM assign GROUP BY a, b
        ),
        sums AS (
          SELECT CAST(sum(n * (n - 1) // 2) AS BIGINT) AS pairs_both,
                 CAST(sum(n) AS BIGINT) AS n_docs
          FROM cont
        ),
        sa AS (
          SELECT CAST(sum(na * (na - 1) // 2) AS BIGINT) AS pairs_a
          FROM (SELECT a, sum(n) AS na FROM cont GROUP BY a)
        ),
        sb AS (
          SELECT CAST(sum(nb * (nb - 1) // 2) AS BIGINT) AS pairs_b
          FROM (SELECT b, sum(n) AS nb FROM cont GROUP BY b)
        )
        SELECT n_docs, pairs_both, pairs_a, pairs_b,
               CAST(n_docs * (n_docs - 1) // 2 AS BIGINT) AS pairs_total,
               round((CAST(n_docs * (n_docs - 1) // 2 AS DOUBLE)
                      + 2 * pairs_both - pairs_a - pairs_b)
                     / CAST(n_docs * (n_docs - 1) // 2 AS DOUBLE), 6)
                 AS rand_index,
               round(CASE WHEN (pairs_a + pairs_b) / 2.0
                               - pairs_a * pairs_b
                                 / CAST(n_docs * (n_docs - 1) // 2 AS DOUBLE)
                               <> 0
                          THEN (pairs_both
                                - pairs_a * pairs_b
                                  / CAST(n_docs * (n_docs - 1) // 2 AS DOUBLE))
                               / ((pairs_a + pairs_b) / 2.0
                                  - pairs_a * pairs_b
                                    / CAST(n_docs * (n_docs - 1) // 2 AS DOUBLE))
                          ELSE 1.0 END, 6) AS ari
        FROM sums, sa, sb
    """


def _acf_oracle_sql() -> str:
    """DuckDB replay of q_b15_acf: 7 lag columns, one agg row, unpivoted
    to the 7-lag relation via UNION ALL (all-integer until the final
    division, mirroring the Spark plan)."""
    lags = range(1, 8)
    lag_cols = ",\n                     ".join(
        f"lag(c, {l}) OVER w AS c{l}" for l in lags
    )
    agg_cols = ",\n                     ".join(
        f"CAST(sum(c * c{l}) AS BIGINT) AS num{l},"
        f" CAST(count(c{l}) AS BIGINT) AS np{l}"
        for l in lags
    )
    union = "\n            UNION ALL ".join(
        f"SELECT {l} AS lag, np{l} AS n_pairs,"
        f" round(CAST(num{l} AS DOUBLE) / CAST(den AS DOUBLE), 6) AS acf"
        f" FROM a"
        for l in lags
    )
    return f"""
        WITH daily AS (
          SELECT CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day,
                 CAST(count(*) AS BIGINT) AS x
          FROM events GROUP BY 1
        ),
        t AS (
          SELECT CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(x) AS BIGINT) AS s
          FROM daily
        ),
        cvals AS (SELECT day, n * x - s AS c FROM daily, t),
        l AS (SELECT c, {lag_cols}
              FROM cvals WINDOW w AS (ORDER BY day ASC)),
        a AS (SELECT CAST(sum(c * c) AS BIGINT) AS den,
                     {agg_cols}
              FROM l)
        {union}
    """


def _block_digests_oracle_sql() -> str:
    """DuckDB replay of q_b13_block_digests: same canonical rendering,
    portable md5-60 row hash, bit_xor fold per 512-key block, full
    outer compare, diverged blocks only."""
    from sqlite_cdc_spark.pipeline.dedup import portable_hash60_sql

    h = portable_hash60_sql(
        "CAST(o_orderkey AS VARCHAR) || '|' || CAST(cents AS VARCHAR)"
        " || '|' || o_orderstatus"
    )
    return f"""
        WITH base AS (
          SELECT o_orderkey,
                 CAST(floor(o_totalprice * 100) AS BIGINT) AS cents,
                 o_orderstatus
          FROM orders
        ),
        repl AS (
          SELECT o_orderkey,
                 CASE WHEN o_orderkey % 997 = 0 THEN cents + 1
                      ELSE cents END AS cents,
                 o_orderstatus
          FROM base
        ),
        bd AS (
          SELECT o_orderkey // 512 AS block,
                 CAST(count(*) AS BIGINT) AS base_n,
                 bit_xor({h}) AS base_digest
          FROM base GROUP BY 1
        ),
        rd AS (
          SELECT o_orderkey // 512 AS block,
                 CAST(count(*) AS BIGINT) AS repl_n,
                 bit_xor({h}) AS repl_digest
          FROM repl GROUP BY 1
        )
        SELECT COALESCE(bd.block, rd.block) AS block,
               base_n, base_digest, repl_n, repl_digest
        FROM bd FULL OUTER JOIN rd ON bd.block = rd.block
        WHERE base_n IS DISTINCT FROM repl_n
           OR base_digest IS DISTINCT FROM repl_digest
    """


def _lc_union_oracle_sql(m_bits: int = 4096) -> str:
    """DuckDB replay of q_b27_lc_union: per-event-type k=1 bitmaps,
    bit_or merge into the '(all)' scope, shared estimator tree."""
    from sqlite_cdc_spark.pipeline.dedup import (
        MINHASH_P,
        _hash_family,
        portable_hash60_sql,
    )

    a, b = _hash_family(1, seed=0xB100)[0]
    base = (
        f"({portable_hash60_sql('CAST(user_id AS VARCHAR)')}) % {MINHASH_P}"
    )
    est = (
        f"round(-{float(m_bits)} * ln(CAST({m_bits} - bits_set AS DOUBLE)"
        f" / {float(m_bits)}), 6)"
    )
    return f"""
        WITH pos AS (
          SELECT event_type,
                 ((({base}) * {a} + {b}) % {MINHASH_P}) % {m_bits} AS pos
          FROM events
        ),
        words AS (
          SELECT event_type, CAST(floor(pos / 63) AS INTEGER) AS word,
                 bit_or(CAST(1 AS BIGINT) << CAST(pos % 63 AS INTEGER))
                   AS bits
          FROM pos GROUP BY 1, 2
        ),
        scoped AS (
          SELECT event_type AS scope, word, bits FROM words
          UNION ALL
          SELECT '(all)' AS scope, word, bit_or(bits) AS bits
          FROM words GROUP BY word
        ),
        used AS (
          SELECT scope, CAST(sum(bit_count(bits)) AS BIGINT) AS bits_set
          FROM scoped GROUP BY scope
        ),
        ex AS (
          SELECT scope, CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact
          FROM (
            SELECT event_type AS scope, user_id FROM events
            UNION ALL
            SELECT '(all)' AS scope, user_id FROM events
          ) GROUP BY scope
        )
        SELECT used.scope, bits_set, n_exact, {est} AS estimate,
               round(abs({est} - n_exact) / n_exact, 6) AS rel_err
        FROM used JOIN ex ON used.scope = ex.scope
    """


def _hll_registers_oracle_sql() -> str:
    """DuckDB replay of q_b27_hll_registers: identical register build
    (8-bit index / 52-bit suffix of the portable md5-60 hash, rho via
    length(bin(w))), identical max-merge, identical exact-integer
    harmonic sum, and the SAME embedded alpha*m^2*2^53 double literal —
    the only float ops are IEEE-exact mul/div/floor plus the round-6 ln
    in the small-range branch."""
    from sqlite_cdc_spark.pipeline.dedup import portable_hash60_sql

    h = portable_hash60_sql("CAST(user_id AS VARCHAR)")
    return f"""
        WITH rw AS (
          SELECT event_type, h % 256 AS reg, h // 256 AS w
          FROM (SELECT event_type, ({h}) AS h FROM events)
        ),
        rh AS (
          SELECT event_type, reg,
                 max(CASE WHEN w = 0 THEN 53
                          ELSE 53 - length(bin(w)) END) AS r
          FROM rw GROUP BY 1, 2
        ),
        scoped AS (
          SELECT event_type AS scope, reg, r FROM rh
          UNION ALL
          SELECT '(all)' AS scope, reg, max(r) AS r FROM rh GROUP BY reg
        ),
        per AS (
          SELECT scope,
                 CAST(count(*) AS BIGINT) AS regs_used,
                 CAST(sum(CAST(1 AS BIGINT) << CAST(53 - r AS INTEGER))
                      AS BIGINT) AS s_present
          FROM scoped GROUP BY scope
        ),
        ex AS (
          SELECT scope, CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact
          FROM (
            SELECT event_type AS scope, user_id FROM events
            UNION ALL
            SELECT '(all)' AS scope, user_id FROM events
          ) GROUP BY scope
        ),
        est AS (
          SELECT per.scope, regs_used, n_exact,
                 {_HLL_ALPHA_NUM!r} / CAST(
                   s_present + (256 - regs_used)
                   * CAST(9007199254740992 AS BIGINT) AS DOUBLE) AS est_raw,
                 256 - regs_used AS v
          FROM per JOIN ex ON per.scope = ex.scope
        )
        SELECT scope, n_exact, regs_used,
               CAST(floor(est_raw * 1e6) AS BIGINT) AS est_micros,
               CAST(floor(abs(
                 CASE WHEN est_raw <= 640.0 AND v > 0
                      THEN round(CAST(256 AS DOUBLE)
                                 * ln(CAST(256 AS DOUBLE)
                                      / CAST(v AS DOUBLE)), 6)
                      ELSE CAST(CAST(floor(est_raw * 1e6) AS BIGINT)
                                AS DOUBLE) / 1000000.0 END
                 - n_exact) / n_exact * 1e6) AS BIGINT) AS rel_err_micros
        FROM est
    """


def _recall_curve_oracle_sql() -> str:
    """DuckDB replay of q_b20_recall_curve: the b20_ann_recall LSH
    candidate replay, exact top-10 ranks, k-grid unpivot."""
    mix, knuth = similarity.PLANE_MIX, similarity.PLANE_KNUTH
    probes = ", ".join(
        ["bucket"] + [f"xor(bucket, {1 << i})" for i in range(8)]
    )
    return f"""
        WITH planes AS (
          SELECT p, d,
                 CASE WHEN ((p * {mix} + d) * {knuth}) % 4294967296
                           < 2147483648 THEN 1 ELSE -1 END AS s
          FROM (SELECT unnest(generate_series(0, 7)) AS p),
               (SELECT unnest(generate_series(0, 63)) AS d)
        ),
        comp AS (
          SELECT vec_id AS id, ds.d - 1 AS d,
                 CAST(floor(CAST(embedding[ds.d] AS DOUBLE) * 1000)
                      AS BIGINT) AS q
          FROM embeddings, (SELECT unnest(generate_series(1, 64)) AS d) ds
        ),
        dots AS (
          SELECT id, p, sum(s * q) AS dp
          FROM comp JOIN planes USING (d) GROUP BY id, p
        ),
        buckets AS (
          SELECT id,
                 CAST(sum(CASE WHEN dp >= 0 THEN (CAST(1 AS BIGINT) << p)
                               ELSE 0 END) AS BIGINT) AS bucket
          FROM dots GROUP BY id
        ),
        qb AS (
          SELECT id AS query_id, unnest([{probes}]) AS bucket
          FROM buckets WHERE id < 4
        ),
        cand AS (
          SELECT DISTINCT query_id, c.id AS neighbor_id
          FROM qb JOIN buckets c ON qb.bucket = c.bucket
          WHERE c.id != query_id
        ),
        topk AS (
          SELECT query_id, neighbor_id, rnk FROM (
            SELECT q.query_id, c.neighbor_id,
                   row_number() OVER (
                     PARTITION BY q.query_id
                     ORDER BY list_dot_product(qv, cv)
                              / (sqrt(list_dot_product(qv, qv))
                                 * sqrt(list_dot_product(cv, cv))) DESC,
                              c.neighbor_id ASC) AS rnk
            FROM (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
                  FROM embeddings WHERE vec_id < 4) q
            JOIN (SELECT vec_id AS neighbor_id,
                         CAST(embedding AS DOUBLE[]) AS cv
                  FROM embeddings) c
              ON q.query_id != c.neighbor_id
          ) WHERE rnk <= 10
        ),
        grid AS (
          SELECT t.query_id, t.rnk, c.neighbor_id AS hit, k
          FROM topk t
          LEFT JOIN cand c ON t.query_id = c.query_id
                          AND t.neighbor_id = c.neighbor_id,
               unnest([1, 5, 10]) AS ks(k)
          WHERE t.rnk <= k
        )
        SELECT query_id, k, CAST(count(hit) AS BIGINT) AS n_hits,
               round(CAST(count(hit) AS DOUBLE) / CAST(k AS DOUBLE), 6)
                 AS recall
        FROM grid GROUP BY query_id, k
    """


li_img_json = (
    "json_object('l_orderkey', l_orderkey, 'l_partkey', l_partkey, "
    "'l_suppkey', l_suppkey, 'l_linenumber', l_linenumber, "
    "'l_returnflag', l_returnflag, 'l_linestatus', l_linestatus)"
)

_SQL_LATERAL = """
SELECT o.o_orderkey, o.o_totalprice, t.l_partkey, t.l_suppkey,
       t.l_linenumber, t.l_extendedprice
FROM orders o,
LATERAL (
  SELECT l_partkey, l_suppkey, l_linenumber, l_extendedprice
  FROM lineitem
  WHERE l_orderkey = o.o_orderkey
  ORDER BY l_extendedprice DESC, l_linenumber, l_partkey, l_suppkey
  LIMIT 2
) t
WHERE o.o_orderkey % 997 = 0
"""


def _ppr_oracle_sql(iters: int = 3) -> str:
    """DuckDB replay of q_b30_ppr: pagerank's integer floor-division
    updates with seed-only init and seed-only teleport base."""
    share = (
        "CAST(((rr.r * 17) - (((rr.r * 17) % (20 * od.od) + (20 * od.od))"
        " % (20 * od.od))) / (20 * od.od) AS BIGINT)"
    )
    parts = [
        """ed AS (
          SELECT DISTINCT o_custkey AS c, l_suppkey + 1000000 AS s
          FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        ),
        e AS (
          SELECT c AS src, s AS dst FROM ed
          UNION ALL
          SELECT s AS src, c AS dst FROM ed
        ),
        nodes AS (
          SELECT node_id,
                 CASE WHEN node_id IN (SELECT c_custkey FROM customer
                                       WHERE c_custkey % 500 = 0)
                      THEN 1 ELSE 0 END AS seed
          FROM (SELECT src AS node_id FROM e UNION SELECT dst FROM e)
        ),
        od AS (SELECT src, CAST(count(*) AS BIGINT) AS od FROM e GROUP BY src),
        r0 AS (
          SELECT node_id,
                 CAST(CASE WHEN seed = 1 THEN 1000000 ELSE 0 END AS BIGINT)
                   AS r
          FROM nodes
        )"""
    ]
    for t in range(1, iters + 1):
        parts.append(f"""s{t} AS (
          SELECT e.dst AS node_id, {share} AS share
          FROM r{t - 1} rr
          JOIN od ON od.src = rr.node_id
          JOIN e ON e.src = rr.node_id
        ),
        r{t} AS (
          SELECT n.node_id,
                 CAST(CASE WHEN n.seed = 1 THEN 150000 ELSE 0 END
                      + COALESCE(sum(share), 0) AS BIGINT) AS r
          FROM nodes n LEFT JOIN s{t} ON s{t}.node_id = n.node_id
          GROUP BY n.node_id, n.seed
        )""")
    return (
        "WITH " + ",\n        ".join(parts) + f"""
        SELECT node_id, rank_units, rnk FROM (
          SELECT node_id, r AS rank_units,
                 row_number() OVER (ORDER BY r DESC, node_id) AS rnk
          FROM r{iters}
          WHERE node_id NOT IN (SELECT c_custkey FROM customer
                                WHERE c_custkey % 500 = 0)
        ) WHERE rnk <= 30
    """
    )



__all__ = [
    "_ppr_oracle_sql",
    "_mmr_oracle_sql",
    "_compaction_cost_sql",
    "_compaction_cadence_sql",
    "_ivf_probe_sweep_oracle_sql",
    "_kcenter_parts",
    "_corpus_v9_oracle_sql",
    "_kcenter_oracle_sql",
    "_label_propagation_oracle_sql",
    "_SQL_LATERAL",
    "BOOTSTRAP_TS",
    "_t",
    "_LI_IMG_COLS",
    "_ORDERS_IMG_SQL",
    "_orders_img",
    "_events_changes",
    "_EVENTS_CHANGES_SQL",
    "_LI_PAGE_KEYS",
    "_ORD_COLS",
    "_orders_old_new",
    "_ORDERS_OLD_NEW_SQL",
    "_docs_with_dups",
    "_DOCS_DUPS_SQL",
    "_SQL_EXISTS",
    "_SQL_CORRELATED_COUNT",
    "_SQL_CTE_TOP_SUPPLIER",
    "_SQL_WAITING_SUPPLIERS",
    "_SQL_IDLE_CUSTOMERS",
    "_sql_query",
    "_bpe_oracle_sql",
    "_zorder_oracle_sql",
    "_linear_counting_oracle_sql",
    "_bloom_oracle_sql",
    "_prefix_filter_oracle_sql",
    "_bloom_incremental_oracle_sql",
    "_bootstrap_oracle_sql",
    "_RECURSIVE_SQL",
    "_rendezvous_oracle_sql",
    "_cdc_chunks_oracle_sql",
    "_ewma_oracle_sql",
    "_pagerank_oracle_sql",
    "_psi_oracle_sql",
    "_kmeans_oracle_sql",
    "_SQL_WINDOW_FUNCS",
    "_NDCG_W",
    "_HLL_ALPHA_NUM",
    "_zorder_expr_sql",
    "_jl_signs",
    "_jl_projection_oracle_sql",
    "_NORM_SQL",
    "_TOKS_SQL",
    "_sw_hits_sql",
    "_B19_CORPUS_SQL",
    "_GRAM3_SQL",
    "_minhash_cand_ctes",
    "_minhash_oracle_sql",
    "_dup_clusters_oracle_sql",
    "_incremental_index_oracle_sql",
    "_incremental_clusters_oracle_sql",
    "_corpus_v2_oracle_sql",
    "_split_leakage_oracle_sql",
    "_simhash_oracle_sql",
    "_decontam_oracle_sql",
    "_incr_decontam_oracle_sql",
    "_containment_oracle_sql",
    "_pii_oracle_sql",
    "_repetition_oracle_sql",
    "_udf_features_oracle_sql",
    "_ann_recall_oracle_sql",
    "_ANN_RESCORE_SQL",
    "_ann_lsh_topk_oracle_sql",
    "_ann_lsh_radius_oracle_sql",
    "_ann_ivf_topk_oracle_sql",
    "_cluster_stability_oracle_sql",
    "_acf_oracle_sql",
    "_block_digests_oracle_sql",
    "_lc_union_oracle_sql",
    "_hll_registers_oracle_sql",
    "_recall_curve_oracle_sql",
    "li_img_json",
]


def _label_propagation_oracle_sql(iters: int = 3) -> str:
    """DuckDB replay of q_b30_label_propagation: identical synchronous
    plurality-label rounds (count desc, label asc ties), round by
    round, over the same customer↔supplier edge relation."""
    parts = [
        """ed AS (
          SELECT DISTINCT o_custkey AS c, l_suppkey + 1000000 AS s
          FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        ),
        e AS (
          SELECT c AS src, s AS dst FROM ed
          UNION
          SELECT s AS src, c AS dst FROM ed
        ),
        nodes AS (
          SELECT src AS node_id FROM e UNION SELECT dst FROM e
        ),
        l0 AS (SELECT node_id, CAST(node_id AS BIGINT) AS label FROM nodes)"""
    ]
    for t in range(1, iters + 1):
        parts.append(f"""p{t} AS (
          SELECT e.dst AS node_id, l.label, count(*) AS n
          FROM e JOIN l{t - 1} l ON l.node_id = e.src
          GROUP BY e.dst, l.label
        ),
        b{t} AS (
          SELECT node_id, label FROM (
            SELECT *, row_number() OVER (
              PARTITION BY node_id ORDER BY n DESC, label ASC) AS rn
            FROM p{t}
          ) WHERE rn = 1
        ),
        l{t} AS (
          SELECT n.node_id,
                 CAST(COALESCE(b.label, l.label) AS BIGINT) AS label
          FROM nodes n
          LEFT JOIN b{t} b ON b.node_id = n.node_id
          JOIN l{t - 1} l ON l.node_id = n.node_id
        )""")
    body = ",\n        ".join(parts)
    return f"""
        WITH {body}
        SELECT label,
               CAST(count(*) AS BIGINT) AS n_nodes,
               CAST(min(node_id) AS BIGINT) AS min_node,
               CAST(max(node_id) AS BIGINT) AS max_node,
               CAST(sum(CASE WHEN node_id >= 1000000 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_suppliers
        FROM l{iters}
        GROUP BY label
    """


def _kcenter_parts(k: int = 8, d: int = 64, quant: int = 10**6) -> str:
    """Shared CTE chain for the k-center oracles: quantize -> seed ->
    (farthest pick -> running-min fold) x (k-1) -> per-point assignment.
    Returns a single SQL string of comma-joined CTE bodies (to splice
    after WITH) ending in the ``assigned`` CTE."""
    parts = [
        f"""q AS (
          SELECT vec_id, list_transform(embedding,
                 x -> CAST(floor(CAST(x AS DOUBLE) * {float(quant)}) AS BIGINT)) AS qe
          FROM embeddings
        ),
        c0 AS (
          SELECT 0 AS r, vec_id AS cid, qe AS ce
          FROM q ORDER BY vec_id LIMIT 1
        ),
        m0 AS MATERIALIZED (
          SELECT q.vec_id, q.qe,
                 list_sum(list_transform(generate_series(1, {d}),
                   i -> (q.qe[i]-c.ce[i])*(q.qe[i]-c.ce[i]))) AS md
          FROM q CROSS JOIN c0 c
        )"""
    ]
    for t in range(1, k):
        parts.append(f"""p{t} AS MATERIALIZED (
          SELECT {t} AS r, vec_id AS cid, qe AS ce
          FROM m{t - 1} ORDER BY md DESC, vec_id ASC LIMIT 1
        ),
        c{t} AS (
          SELECT * FROM c{t - 1} UNION ALL SELECT * FROM p{t}
        ),
        m{t} AS MATERIALIZED (
          SELECT m.vec_id, m.qe,
                 least(m.md,
                   list_sum(list_transform(generate_series(1, {d}),
                     i -> (m.qe[i]-p.ce[i])*(m.qe[i]-p.ce[i])))) AS md
          FROM m{t - 1} m CROSS JOIN p{t} p
        )""")
    parts.append(f"""assigned AS (
          SELECT vec_id, r, cid, dist FROM (
            SELECT q.vec_id, c.r, c.cid,
                   list_sum(list_transform(generate_series(1, {d}),
                     i -> (q.qe[i]-c.ce[i])*(q.qe[i]-c.ce[i]))) AS dist,
                   row_number() OVER (PARTITION BY q.vec_id
                     ORDER BY list_sum(list_transform(
                       generate_series(1, {d}),
                       i -> (q.qe[i]-c.ce[i])*(q.qe[i]-c.ce[i]))) ASC,
                       c.r ASC) AS rn
            FROM q CROSS JOIN c{k - 1} c
          ) WHERE rn = 1
        )""")
    return ",\n        ".join(parts)


def _kcenter_oracle_sql(k: int = 8, d: int = 64, quant: int = 10**6) -> str:
    """DuckDB replay of q_b28_kcenter_diversity: smallest-id seed, then
    k-1 chained (min-distance desc, id asc) farthest-point picks, all
    integer squared-L2 over the same floor-quantized components."""
    body = _kcenter_parts(k, d, quant)
    return f"""
        WITH {body}
        SELECT CAST(r AS INTEGER) AS center_rank,
               cid AS center_id,
               CAST(count(*) AS BIGINT) AS n_assigned,
               CAST(max(dist) AS BIGINT) AS radius_sq
        FROM assigned
        GROUP BY r, cid
    """


def _corpus_v9_oracle_sql(k: int = 8, d: int = 64, quant: int = 10**6) -> str:
    """DuckDB replay of q_b24_corpus_v9: Pareto-frontier gate +
    k-center assignment + hash-rank training order, all re-derived
    from base tables and composed (not a replay of Spark output)."""
    from sqlite_cdc_spark.pipeline.dedup import portable_hash60_sql

    kc = _kcenter_parts(k, d, quant)
    h = portable_hash60_sql("CAST(f.doc_id AS VARCHAR)")
    return f"""
        WITH {kc},
        base AS (
          SELECT doc_id, lang,
                 {_sw_hits_sql('en')} AS s_en,
                 CAST(length(text) AS BIGINT) AS q_chars,
                 CAST(len({_TOKS_SQL}) AS BIGINT) AS n_tok,
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
          SELECT lang, quality_score, CAST(min(n_tok) AS BIGINT) AS mt
          FROM feats GROUP BY lang, quality_score
        ),
        prefix AS (
          SELECT *, min(mt) OVER (
            PARTITION BY lang ORDER BY quality_score DESC
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmin
          FROM per_q
        ),
        frontier AS (
          SELECT f.doc_id, f.lang, f.n_tok
          FROM feats f
          JOIN prefix p ON p.lang = f.lang
                       AND p.quality_score = f.quality_score
          WHERE (p.pmin IS NULL OR p.pmin > f.n_tok)
            AND f.n_tok = p.mt
        ),
        kept AS (
          SELECT f.doc_id, f.lang, f.n_tok,
                 a.r AS center_rank, a.dist,
                 CAST(row_number() OVER (
                   ORDER BY ({h}) ASC, f.doc_id ASC) AS BIGINT) AS pos
          FROM frontier f JOIN assigned a ON a.vec_id = f.doc_id
        )
        SELECT lang, CAST(center_rank AS INTEGER) AS center_rank,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n_tok) AS BIGINT) AS sum_tok,
               CAST(min(pos) AS BIGINT) AS first_pos,
               CAST(sum(dist) // count(*) AS BIGINT) AS mean_dist_sq
        FROM kept
        GROUP BY lang, center_rank
    """


def _ivf_probe_sweep_oracle_sql() -> str:
    """DuckDB replay of q_b20_ivf_probe_sweep: the b20_ann_ivf cell
    assignment computed once, the probe grid filtering the ranked
    query-cell relation, recall@5 vs full exact-cosine top-5."""
    cids = ", ".join(str(c) for c in similarity.IVF_SEED_CENTROIDS)
    return f"""
        WITH comp AS (
          SELECT vec_id AS id, ds.d - 1 AS d,
                 CAST(floor(CAST(embedding[ds.d] AS DOUBLE) * 1000) AS BIGINT) AS q
          FROM embeddings, (SELECT unnest(generate_series(1, 64)) AS d) ds
        ),
        cents AS (
          SELECT id AS cid, d, q AS cq FROM comp WHERE id IN ({cids})
        ),
        dots AS (
          SELECT comp.id, cid, sum(comp.q * cq) AS dp
          FROM comp JOIN cents USING (d) GROUP BY comp.id, cid
        ),
        ranked_cells AS (
          SELECT id, cid,
                 row_number() OVER (PARTITION BY id ORDER BY dp DESC, cid ASC) AS r
          FROM dots
        ),
        ccell AS (
          SELECT id AS neighbor_id, cid AS cell FROM ranked_cells WHERE r = 1
        ),
        qcell AS (
          SELECT id AS query_id, cid AS cell, r
          FROM ranked_cells WHERE r <= 4 AND id < 4
        ),
        cand AS (
          SELECT query_id, neighbor_id, min(r) AS first_probe
          FROM qcell JOIN ccell USING (cell)
          WHERE neighbor_id != query_id
          GROUP BY query_id, neighbor_id
        ),
        vecs AS (
          SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        ),
        exact AS (
          SELECT query_id, neighbor_id FROM (
            SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                   row_number() OVER (
                     PARTITION BY q.vec_id
                     ORDER BY list_dot_product(q.v, c.v)
                       / (sqrt(list_dot_product(q.v, q.v))
                          * sqrt(list_dot_product(c.v, c.v))) DESC,
                       c.vec_id ASC) AS rnk
            FROM vecs q JOIN vecs c ON c.vec_id != q.vec_id
            WHERE q.vec_id < 4
          ) WHERE rnk <= 5
        ),
        grid AS (
          SELECT cand.query_id, cand.neighbor_id, p.nprobe,
                 CASE WHEN exact.neighbor_id IS NOT NULL THEN 1 ELSE 0 END
                   AS hit
          FROM cand
          CROSS JOIN (SELECT unnest([1, 2, 3, 4]) AS nprobe) p
          LEFT JOIN exact ON exact.query_id = cand.query_id
                         AND exact.neighbor_id = cand.neighbor_id
          WHERE cand.first_probe <= p.nprobe
        )
        SELECT CAST(nprobe AS INTEGER) AS nprobe, query_id,
               CAST(count(*) AS BIGINT) AS n_cand,
               CAST(sum(hit) AS BIGINT) AS n_hits,
               round(CAST(sum(hit) AS DOUBLE) / 5.0, 6) AS recall_at_5
        FROM grid
        GROUP BY nprobe, query_id
    """



def _compaction_cost_sql(epoch_size: int) -> str:
    """Per-epoch compaction cost model over a ``changes`` CTE already in
    scope — the DuckDB mirror of :func:`sqlite_cdc_spark.derive.
    compaction_cost` (keyed liveness ±1 deltas, running sums over the
    epoch grid). Parameterized by cadence so the b2_compaction_cadence
    sweep replays the same algebra at each operating point."""
    w = int(epoch_size)
    return f"""
            ke_{w} AS (
              SELECT CAST(json_extract_string(coalesce(after, before),
                          '$.user_id') AS BIGINT) AS k,
                     id // {w} AS epoch,
                     CAST(count(*) AS BIGINT) AS n,
                     arg_max(operation, id) AS op_last
              FROM changes GROUP BY 1, 2
            ),
            kd_{w} AS (
              SELECT k, epoch, n,
                     CASE WHEN op_last <> 'DELETE' THEN 1 ELSE 0 END
                       - coalesce(lag(CASE WHEN op_last <> 'DELETE'
                                           THEN 1 ELSE 0 END)
                         OVER (PARTITION BY k ORDER BY epoch), 0) AS delta
              FROM ke_{w}
            ),
            ep_{w} AS (
              SELECT epoch, CAST(sum(n) AS BIGINT) AS n_changes,
                     CAST(count(*) AS BIGINT) AS n_keys_touched,
                     CAST(sum(delta) AS BIGINT) AS ds
              FROM kd_{w} GROUP BY epoch
            ),
            run_{w} AS (
              SELECT epoch, n_changes, n_keys_touched,
                     CAST(coalesce(sum(ds) OVER (ORDER BY epoch
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND 1 PRECEDING), 0) AS BIGINT) AS carried_in,
                     CAST(sum(ds) OVER (ORDER BY epoch) AS BIGINT)
                       AS live_at_end
              FROM ep_{w}
            ),
            o_{w} AS (
              SELECT epoch, n_changes, n_keys_touched, carried_in,
                     live_at_end,
                     carried_in + n_changes AS rows_read,
                     live_at_end AS rows_written,
                     CAST(sum(live_at_end) OVER (ORDER BY epoch)
                          AS BIGINT) AS cum_written
              FROM run_{w}
            )"""


def _compaction_cadence_sql(cadences=(500, 1000, 2000, 4000)) -> str:
    """Full DuckDB query for the b2_compaction_cadence sweep: one
    :func:`_compaction_cost_sql` CTE chain per operating point, each
    summarized to a single row and unioned."""
    chains = ",\n            ".join(
        _compaction_cost_sql(w) for w in cadences
    )
    legs = []
    for w in cadences:
        legs.append(
            f"""SELECT CAST({w} AS BIGINT) AS epoch_size,
                     CAST(count(*) AS BIGINT) AS n_runs,
                     CAST(sum(n_changes) AS BIGINT) AS n_changes,
                     CAST(sum(rows_read) AS BIGINT) AS total_rows_read,
                     CAST(sum(rows_written) AS BIGINT)
                       AS total_rows_written,
                     CAST(arg_max(live_at_end, epoch) AS BIGINT)
                       AS final_live,
                     round(CAST(sum(rows_read) AS DOUBLE)
                           / CAST(sum(n_changes) AS DOUBLE), 6)
                       AS read_amp,
                     round(CAST(sum(rows_written) AS DOUBLE)
                           / CAST(arg_max(live_at_end, epoch)
                                  AS DOUBLE), 6) AS write_amp
              FROM o_{w}"""
        )
    union = "\n              UNION ALL ".join(legs)
    return f"""
            WITH changes AS ({_EVENTS_CHANGES_SQL}),
            {chains}
            SELECT * FROM ({union})
    """

def _mmr_oracle_sql(
    k: int = 10,
    d: int = 64,
    quant: int = 10**6,
    topn: int | None = None,
) -> str:
    """DuckDB replay of q_b20_mmr_rerank / q_b20_mmr_topn: query =
    vec 0's quantized embedding; k chained (2·rel − maxsim desc, id
    asc) argmax picks with a running max-sim fold. Every pick CTE is
    MATERIALIZED (each cand{t} is referenced by both the pick and the
    fold — the kcenter AS MATERIALIZED lesson, else re-evaluation is
    exponential in k). With ``topn``, cand0 keeps only the rel-topN
    (rel desc, id asc) — the engine's bounded-candidate prefilter."""
    dot = (
        f"list_sum(list_transform(generate_series(1, {d}),"
        " i -> c.qe[i] * p.ce[i]))"
    )
    bound = (
        f"\n          ORDER BY rel DESC, c.vec_id ASC LIMIT {topn}"
        if topn is not None
        else ""
    )
    parts = [
        f"""q AS (
          SELECT vec_id, list_transform(embedding,
                 x -> CAST(floor(CAST(x AS DOUBLE) * {float(quant)})
                      AS BIGINT)) AS qe
          FROM embeddings
        ),
        qv AS (SELECT qe AS ce FROM q WHERE vec_id = 0),
        cand0 AS MATERIALIZED (
          SELECT c.vec_id, c.qe,
                 {dot} AS rel,
                 CAST(0 AS BIGINT) AS ms
          FROM q c CROSS JOIN qv p
          WHERE c.vec_id <> 0{bound}
        )"""
    ]
    for t in range(k):
        parts.append(f"""p{t} AS MATERIALIZED (
          SELECT {t} AS r, vec_id, qe AS ce, rel, ms,
                 2 * rel - ms AS score
          FROM cand{t} ORDER BY 2 * rel - ms DESC, vec_id ASC LIMIT 1
        )""")
        if t < k - 1:
            parts.append(f"""cand{t + 1} AS MATERIALIZED (
          SELECT c.vec_id, c.qe, c.rel,
                 greatest(c.ms, {dot}) AS ms
          FROM cand{t} c CROSS JOIN p{t} p
          WHERE c.vec_id <> p.vec_id
        )""")
    body = ",\n        ".join(parts)
    union = "\n              UNION ALL ".join(
        f"SELECT r, vec_id, rel, ms, score FROM p{t}" for t in range(k)
    )
    return f"""
        WITH {body}
        SELECT CAST(r AS INTEGER) AS mmr_rank,
               CAST(vec_id AS BIGINT) AS vec_id,
               CAST(rel AS BIGINT) AS rel,
               CAST(ms AS BIGINT) AS maxsim,
               CAST(score AS BIGINT) AS score
        FROM ({union})
    """
