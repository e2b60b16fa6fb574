"""Synthesize a ~sf1 fixture set (10x sf0.1) for bench scale-up runs.

/root/testdata ships sf0.1 as its largest scale; the headline bench has
only ever been timed there (VERDICT r9 item 3). This tool builds a 10x
set by replicating each sf0.1 table with consistent key shifts so every
join still lands:

- region/nation: fixed dimensions, copied once (TPC-H semantics).
- customer/supplier/part/orders/lineitem/events: 10 replicas, all keys
  (PKs AND the FKs that reference them) shifted by replica*10^9.
- documents: every alnum token gets a per-replica suffix, so replica
  vocabularies are DISJOINT — intra-replica dup/similarity structure is
  preserved exactly while cross-replica LSH/shingle collisions are zero.
  (Verbatim replication would plant a 10-dup cluster for every doc —
  quadratic candidate growth the real generator would never produce.)
- embeddings: per-replica array rotation (norm/distribution preserved,
  buckets decorrelated) for the same reason.

Timing fixture ONLY — never oracle-checked; sf0.01 remains the
correctness scale. Writes parquet dirs under $SPARK_GRAFT_SF1_DIR
(default /tmp/sf1); load_table reads dirs and single files alike.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sqlite_cdc_spark.session import get_spark
from sqlite_cdc_spark.sources import load_table

SRC = os.environ.get("SPARK_GRAFT_SRC_SF_DIR", "/root/testdata/sf0.1")
DST = os.environ.get("SPARK_GRAFT_SF1_DIR", "/tmp/sf1")
#: layout-matched 32-way rewrite of sf0.1 — the A side of the SF1 A/B
#: (VERDICT r12 item 6: both sides share the same file layout so 10x
#: ratios measure data volume, not scan-parallelism asymmetry)
SRC32 = os.environ.get("SPARK_GRAFT_SF01_32_DIR", "/tmp/sf0.1_32")
REPLICAS = int(os.environ.get("SPARK_GRAFT_SF1_REPLICAS", "10"))
SHIFT = 10**9

KEY_SHIFTS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


def replica(df: DataFrame, table: str, k: int) -> DataFrame:
    out = df
    for c in KEY_SHIFTS[table]:
        out = out.withColumn(c, F.col(c) + F.lit(k * SHIFT))
    if k and table == "documents":
        out = out.withColumn(
            "text", F.regexp_replace("text", "([A-Za-z0-9]+)", f"$1x{k}")
        ).withColumn("n_chars", F.length("text").cast("long"))
    if k and table == "embeddings":
        out = out.withColumn(
            "embedding",
            F.concat(
                F.slice("embedding", k + 1, 64 - k), F.slice("embedding", 1, k)
            ),
        )
    return out


def main() -> None:
    spark = get_spark()
    os.makedirs(DST, exist_ok=True)
    for t in ("region", "nation"):
        load_table(spark, SRC, t).write.mode("overwrite").parquet(
            f"{DST}/{t}.parquet"
        )
        print(t, "copied")
    for t in KEY_SHIFTS:
        df = load_table(spark, SRC, t)
        out = replica(df, t, 0)
        for k in range(1, REPLICAS):
            out = out.unionByName(replica(df, t, k))
        (
            out.repartition(32)
            .write.mode("overwrite")
            .parquet(f"{DST}/{t}.parquet")
        )
        n = spark.read.parquet(f"{DST}/{t}.parquet").count()
        print(t, n)
    # Layout-matched A side (VERDICT r12 item 6): the shipped sf0.1 is
    # single-file parquet while sf1 above is 32-way — that asymmetry
    # gave small queries extra scan parallelism at 10x and flattered
    # their ratios. Re-write sf0.1 through the SAME 32-way writer so
    # the A/B isolates data volume, not file layout.
    os.makedirs(SRC32, exist_ok=True)
    for t in ("region", "nation"):
        load_table(spark, SRC, t).write.mode("overwrite").parquet(
            f"{SRC32}/{t}.parquet"
        )
    for t in KEY_SHIFTS:
        (
            load_table(spark, SRC, t)
            .repartition(32)
            .write.mode("overwrite")
            .parquet(f"{SRC32}/{t}.parquet")
        )
        print(t, "32-way sf0.1 written")
    spark.stop()


if __name__ == "__main__":
    main()
