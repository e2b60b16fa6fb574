"""End-to-end SQLite → triggers → log poll → Spark streaming parity tests.

Replicates the reference's integration suite shape (trigger_test.go:56-244):
a real SQLite database in WAL mode, the 27-column all-affinities fixture
(FIXTURES.md §1.1), live inserts/updates/deletes, batch math assertions.
"""

from __future__ import annotations

import math
import sqlite3

import pytest
from pyspark.sql import functions as F

from sqlite_cdc_spark import sinks, sqlite_bridge, streaming
from sqlite_cdc_spark.model import LOG_SCHEMA, validate_change_invariants

#: the reference's canonical fixture: every SQLite type-affinity family,
#: composite PK (a,b,c) — trigger_test.go:483-517
AFFINITY_DDL = """
CREATE TABLE affinity_test (
  a INT, b INTEGER, c TINYINT, d SMALLINT, e MEDIUMINT, f BIGINT,
  g UNSIGNED BIG INT, h INT2, i INT8,
  j CHARACTER(20), k VARCHAR(255), l VARYING CHARACTER(255), m NCHAR(55),
  n NATIVE CHARACTER(70), o NVARCHAR(100), p TEXT, q CLOB,
  r BLOB,
  s REAL, t DOUBLE, u DOUBLE PRECISION, v FLOAT,
  w NUMERIC, x DECIMAL(10,5), y BOOLEAN, z DATE, aa DATETIME,
  PRIMARY KEY (a, b, c)
)
"""


def _insert_rows(conn: sqlite3.Connection, n: int, offset: int = 0) -> None:
    # deterministic value pattern mirroring generateRecords
    # (trigger_test.go:439-468): ints=seq, text='foo', blob=0xDEADBEAF,
    # real=3.14, numeric=1
    rows = [
        (
            i + offset, i + offset, i + offset, i, i, i, i, i, i,
            "foo", "foo", "foo", "foo", "foo", "foo", "foo", "foo",
            b"\xde\xad\xbe\xaf",
            3.14, 3.14, 3.14, 3.14,
            1, 1, 1, "2024-01-02", "2024-01-02 03:04:05",
        )
        for i in range(n)
    ]
    conn.executemany(
        f"INSERT INTO affinity_test VALUES ({','.join('?' * 27)})", rows
    )
    conn.commit()


@pytest.fixture()
def db(tmp_path):
    path = str(tmp_path / "test.db")
    conn = sqlite3.connect(path)
    conn.execute("PRAGMA journal_mode=WAL")  # reference prerequisite
    conn.execute(AFFINITY_DDL)
    conn.commit()
    yield conn
    conn.close()


def test_setup_is_idempotent_and_captures_ops(db):
    sqlite_bridge.setup(db, ["affinity_test"])
    sqlite_bridge.setup(db, ["affinity_test"])  # IF NOT EXISTS parity
    _insert_rows(db, 10)
    db.execute("UPDATE affinity_test SET p = 'bar' WHERE a = 3")
    db.execute("DELETE FROM affinity_test WHERE a = 5")
    db.commit()
    rows = db.execute(
        "SELECT operation, before, after FROM __cdc_log ORDER BY id"
    ).fetchall()
    assert len(rows) == 12
    ops = [r[0] for r in rows]
    assert ops == ["INSERT"] * 10 + ["UPDATE", "DELETE"]
    import json

    ins = json.loads(rows[0][2])
    assert ins["p"] == "foo" and ins["a"] == 0
    assert "r" not in ins  # BLOB skipped without blob_support
    upd_before, upd_after = json.loads(rows[10][1]), json.loads(rows[10][2])
    assert upd_before["p"] == "foo" and upd_after["p"] == "bar"
    assert rows[11][2] is None  # DELETE has no after


def test_blob_support_hex(db):
    sqlite_bridge.teardown(db, ["affinity_test"])
    sqlite_bridge.setup(db, ["affinity_test"], blob_support=True)
    _insert_rows(db, 1)
    import json

    after = json.loads(db.execute("SELECT after FROM __cdc_log").fetchone()[0])
    assert after["r"] == "DEADBEAF"  # upper-case hex, triggers.go:464-469


def test_setup_missing_table_raises_cleanly(db):
    with pytest.raises(ValueError, match="does not exist"):
        sqlite_bridge.setup(db, ["no_such_table"])
    # failed setup must roll back: no triggers half-installed
    n = db.execute(
        "SELECT count(*) FROM sqlite_master WHERE type = 'trigger'"
    ).fetchone()[0]
    assert n == 0


def test_setup_all_blob_table_without_blob_support_raises(db):
    db.execute("CREATE TABLE blobs_only (x BLOB, y BLOB)")
    db.commit()
    with pytest.raises(ValueError, match="no JSON-encodable columns"):
        sqlite_bridge.setup(db, ["blobs_only"])
    sqlite_bridge.setup(db, ["blobs_only"], blob_support=True)  # ok with blobs


def test_wide_table_json_patch_chunking(db):
    # parity with TestWideTables (trigger_test.go:246-296): 200 columns
    # (>63 → chunked json_object + json_patch) survive intact
    n = 200
    cols = ", ".join(f"col{i} INT" for i in range(n))
    db.execute(f"CREATE TABLE wide ({cols})")
    sqlite_bridge.setup(db, ["wide"], log_table="__wide_log")
    db.execute(
        f"INSERT INTO wide VALUES ({', '.join(str(i) for i in range(n))})"
    )
    db.commit()
    import json

    after = json.loads(
        db.execute("SELECT after FROM __wide_log").fetchone()[0]
    )
    assert len(after) == n
    assert after["col199"] == 199


def test_poll_to_spark_batch_math(db, tmp_path, spark):
    # reference batch math (trigger_test.go:22-54): 1024 rows, batch 50 →
    # ceil(1024/50)=21 parquet files, 1024 changes total
    sqlite_bridge.setup(db, ["affinity_test"])
    _insert_rows(db, 1024)
    out = str(tmp_path / "log")
    drained = sqlite_bridge.poll_log(db, out, batch_size=50)
    assert drained == 1024
    import glob

    files = glob.glob(out + "/*.parquet")
    assert len(files) == math.ceil(1024 / 50)
    # ack-by-delete emptied the log
    assert db.execute("SELECT count(*) FROM __cdc_log").fetchone()[0] == 0

    df = spark.read.schema(LOG_SCHEMA).parquet(out)
    assert df.count() == 1024
    assert validate_change_invariants(df).isEmpty()
    assert df.filter(F.col("timestamp").isNull()).isEmpty()
    # typed access through the dynamic-JSON path
    a_vals = df.select(
        F.get_json_object("after", "$.a").cast("long").alias("a")
    )
    assert a_vals.agg(F.max("a")).first()[0] == 1023


def test_end_to_end_sqlite_to_streaming_engine(db, tmp_path, spark):
    # the full pipe: live SQLite writes → triggers → poll → parquet log →
    # StreamEngine ordered delivery (the Spark rendition of CDC mode,
    # trigger_test.go:56-93)
    sqlite_bridge.setup(db, ["affinity_test"])
    _insert_rows(db, 300)
    log_dir = str(tmp_path / "log")
    sqlite_bridge.poll_log(db, log_dir, batch_size=100)
    # second wave of writes between polls (the fsnotify-wakeup analog)
    _insert_rows(db, 44, offset=1000)
    db.execute("DELETE FROM affinity_test WHERE a = 1001")
    db.commit()
    sqlite_bridge.poll_log(db, log_dir, batch_size=100)

    eng = streaming.StreamEngine(spark, log_dir, str(tmp_path / "ckpt"))
    store: list = []
    eng.deliver(
        eng.read_log_stream(max_files_per_trigger=1),
        sinks.collecting_handler(store),
    ).awaitTermination(120)
    total = sum(len(rows) for _, rows in store)
    assert total == 300 + 44 + 1
    flat = [r for _, rows in store for r in rows]
    assert [r.operation for r in flat].count("DELETE") == 1
    # ordered delivery across the whole feed (ids strictly increase)
    ids = [r.id for r in flat]
    assert ids == sorted(ids)
