"""Reference-parity benchmark grids.

Replicates the reference's benchmark dimensions (no results are published
upstream, so these curves are the comparison surface):

- ``BenchmarkTableSizes`` (trigger_test.go:298-346): bootstrap throughput
  vs column width.
- ``BenchmarkBootstrapSizes`` (trigger_test.go:348-403): rows × batch size
  through the live SQLite trigger → poll → Spark path.
- ``BenchmarkBlobSizes`` (trigger_test.go:405-437): BLOB payload size
  through hex encoding.

Writes PARITY_BENCH.json (one JSON object, grids keyed by dimension).
"""

from __future__ import annotations

import json
import os
import sqlite3
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from sqlite_cdc_spark import sqlite_bridge
from sqlite_cdc_spark.bootstrap import snapshot_as_inserts
from sqlite_cdc_spark.session import get_spark


def bench_width(spark, widths=(1, 10, 63, 100, 400, 1000), rows=20_000):
    """Spark bootstrap (row→JSON image) throughput vs column count —
    the reference's chunking pain point dissolves in Spark."""
    out = {}
    for w in widths:
        df = spark.range(rows).select(
            *[(F.col("id") + i).alias(f"col{i}") for i in range(w)]
        )
        df.write.format("noop").mode("overwrite").save()  # materialize input cost
        t0 = time.time()
        snapshot_as_inserts(df, "wide").write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        out[str(w)] = {"sec": round(dt, 3), "rows_per_s": round(rows / dt)}
    return out


def bench_sqlite_path(spark, grid=((1_000, 50), (10_000, 50), (10_000, 1000))):
    """Live-SQLite capture → poll → parquet throughput (rows × batch)."""
    out = {}
    for rows, batch in grid:
        with tempfile.TemporaryDirectory() as tmp:
            conn = sqlite3.connect(f"{tmp}/b.db")
            conn.execute("PRAGMA journal_mode=WAL")
            conn.execute(
                "CREATE TABLE t (a INTEGER PRIMARY KEY, b TEXT, c REAL, d INT)"
            )
            sqlite_bridge.setup(conn, ["t"])
            t0 = time.time()
            conn.executemany(
                "INSERT INTO t VALUES (?,?,?,?)",
                [(i, "foo", 3.14, i) for i in range(rows)],
            )
            conn.commit()
            capture = time.time() - t0
            t0 = time.time()
            drained = sqlite_bridge.poll_log(conn, f"{tmp}/log", batch_size=batch)
            drain = time.time() - t0
            assert drained == rows
            out[f"rows={rows},batch={batch}"] = {
                "capture_sec": round(capture, 3),
                "drain_sec": round(drain, 3),
                "drain_rows_per_s": round(rows / drain),
            }
            conn.close()
    return out


def bench_blob(spark, sizes=(16, 4096, 65536, 1048576), rows=200):
    """BLOB→hex image throughput vs payload size (reference: bigger blobs
    → slower hex; same shape here, but vectorized)."""
    out = {}
    for size in sizes:
        df = spark.range(rows).select(
            F.col("id"),
            F.expr(f"repeat(cast('ab' as binary), {size // 2})").alias("payload"),
        )
        df.write.format("noop").mode("overwrite").save()
        t0 = time.time()
        df.select(
            "id", F.to_json(F.struct(F.col("id"), F.hex("payload").alias("payload")))
        ).write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        out[str(size)] = {
            "sec": round(dt, 3),
            "mb_per_s": round(rows * size / dt / 1e6, 1),
        }
    return out


def main():
    # default to the driver's CPU budget ($SPARK_GRAFT_CPUS, 32) so the
    # recorded grids are comparable round over round; override with
    # SPARK_GRAFT_CPUS=8 for a quick local snapshot
    spark = get_spark("parity-bench")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    result = {
        "width": bench_width(spark),
        "sqlite_path": bench_sqlite_path(spark),
        "blob": bench_blob(spark),
    }
    with open("PARITY_BENCH.json", "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result, indent=1))


if __name__ == "__main__":
    main()
