"""JDBC source tests against embedded Derby (the only JDBC driver shipped
with this Spark build; the code path is driver-agnostic)."""

from __future__ import annotations

import pytest

from sqlite_cdc_spark import sources

DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


@pytest.fixture()
def derby(spark, tmp_path):
    url = f"jdbc:derby:{tmp_path}/jdb;create=true"
    jvm = spark._jvm
    jvm.java.lang.Class.forName(DRIVER)
    conn = jvm.java.sql.DriverManager.getConnection(url)
    st = conn.createStatement()
    st.execute("CREATE TABLE changes (id BIGINT PRIMARY KEY, op VARCHAR(10), body VARCHAR(100))")
    ps = conn.prepareStatement("INSERT INTO changes VALUES (?, ?, ?)")
    for i in range(500):
        ps.setLong(1, i)
        ps.setString(2, "INSERT" if i % 5 else "DELETE")
        ps.setString(3, f"row-{i}")
        ps.addBatch()
    ps.executeBatch()
    conn.commit()
    yield url
    conn.close()


def test_read_jdbc_partitioned_bounds_discovery(spark, derby):
    df = sources.read_jdbc_partitioned(
        spark, derby, "changes", "id", num_partitions=4, driver=DRIVER
    )
    assert df.rdd.getNumPartitions() == 4
    assert df.count() == 500
    assert df.agg({"id": "max"}).first()[0] == 499


def test_jdbc_poll_increment_is_keyset(spark, derby):
    inc = sources.jdbc_poll_increment(spark, derby, "changes", "id", 449, driver=DRIVER)
    rows = inc.collect()
    assert len(rows) == 50
    assert min(r.ID for r in rows) == 450
    # second poll from the new watermark is empty
    assert sources.jdbc_poll_increment(
        spark, derby, "changes", "id", 499, driver=DRIVER
    ).isEmpty()
