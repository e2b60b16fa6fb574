"""Deterministic sampling/split operators (pipeline.sampling)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sqlite_cdc_spark.pipeline import sampling
from sqlite_cdc_spark.sources import load_table


def test_sample_is_deterministic_and_group_coherent(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    s1 = sampling.sample_by_key(li, "l_orderkey", 10)
    s2 = sampling.sample_by_key(li.repartition(7), "l_orderkey", 10)
    # identical keys regardless of partitioning / run
    k1 = {r[0] for r in s1.select("l_orderkey").distinct().collect()}
    k2 = {r[0] for r in s2.select("l_orderkey").distinct().collect()}
    assert k1 == k2
    # group coherence: sampled orders keep ALL their lineitems
    full_counts = {
        r[0]: r[1]
        for r in li.groupBy("l_orderkey").count().collect()
    }
    samp_counts = {r[0]: r[1] for r in s1.groupBy("l_orderkey").count().collect()}
    assert all(full_counts[k] == v for k, v in samp_counts.items())
    # rate is in the right ballpark (hash is uniform-ish)
    assert 0.03 < len(k1) / len(full_counts) < 0.25


def test_split_assign_disjoint_exhaustive(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    out = docs.select("doc_id", sampling.split_assign("doc_id").alias("split"))
    counts = {r[0]: r[1] for r in out.groupBy("split").count().collect()}
    assert None not in counts  # exhaustive: every row got a split
    assert sum(counts.values()) == docs.count()
    assert counts.get("train", 0) > counts.get("val", 0)
    assert counts.get("train", 0) > counts.get("test", 0)


def test_split_assign_rejects_bad_weights():
    with pytest.raises(ValueError, match="sum to 70"):
        sampling.split_assign("k", [("a", 50), ("b", 20)])


def test_stratified_rates_respected(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    out = sampling.stratified_sample(
        docs, "doc_id", "lang", {"de": 100, "en": 25}, default_rate=0
    )
    full = {r[0]: r[1] for r in docs.groupBy("lang").count().collect()}
    kept = {r[0]: r[1] for r in out.groupBy("lang").count().collect()}
    assert kept.get("de") == full["de"]  # rate 100 keeps everything
    assert 0 < kept.get("en", 0) < full["en"]  # downsampled, nonempty
    assert set(kept) == {"de", "en"}  # default 0 drops other strata


def test_bucket_values_in_range(spark):
    df = spark.range(10_000).select(
        sampling.hash_bucket(F.col("id"), 100).alias("b")
    )
    mn, mx, n = df.agg(F.min("b"), F.max("b"), F.count_distinct("b")).first()
    assert mn >= 0 and mx <= 99
    assert n > 90  # buckets are actually spread


def test_hash_bucket_negative_and_large_keys(spark):
    # regression (ADVICE r1): negative keys must bucket in [0, 100) (a
    # plain % emitted negative buckets → every negative key was 'kept' by
    # sample filters); int64-extreme keys must not silently wrap
    import duckdb

    from pyspark.sql import functions as F
    from sqlite_cdc_spark.pipeline import sampling

    keys = [-5, -1, 0, 1, 2**31 - 1, -(2**31), 2**62, -(2**62), 2**63 - 1]
    df = spark.createDataFrame([(k,) for k in keys], "k long")
    got = {
        r["k"]: r["b"]
        for r in df.select(
            "k", sampling.hash_bucket(F.col("k"), 100).alias("b")
        ).collect()
    }
    assert all(0 <= b < 100 for b in got.values())
    # engine portability over the full range, incl. negatives
    for k in keys:
        duck = duckdb.execute(
            f"SELECT {sampling.bucket_sql(str(k))}"
        ).fetchone()[0]
        assert got[k] == duck, k


def test_prefix_sum_matches_global_window(spark):
    # two-phase distributed cumsum == the naive single-partition window
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F
    from sqlite_cdc_spark.pipeline import sampling

    df = spark.range(1000).select(
        F.col("id").alias("k"), (F.pmod(F.xxhash64("id"), 50) + 1).alias("v")
    )
    got = {
        r["k"]: r["cumsum"]
        for r in sampling.prefix_sum(df, "k", "v", bucket_size=64).collect()
    }
    ref = {
        r["k"]: r["ref"]
        for r in df.withColumn(
            "ref",
            F.coalesce(
                F.sum("v").over(
                    W.orderBy("k").rowsBetween(W.unboundedPreceding, -1)
                ),
                F.lit(0),
            ).cast("bigint"),
        ).collect()
    }
    assert got == ref


def test_pack_sequences_budget_contract(spark):
    from pyspark.sql import functions as F
    from sqlite_cdc_spark.pipeline import sampling

    df = spark.range(200).select(
        F.col("id").alias("k"), (F.pmod(F.xxhash64("id"), 30) + 1).alias("n")
    )
    rows = sorted(
        sampling.pack_sequences(df, "k", "n", budget=100, bucket_size=16)
        .collect(),
        key=lambda r: r["k"],
    )
    # pack ids are non-decreasing in order, start at 0, and each pack's
    # exclusive start offset lies inside [pack*budget, (pack+1)*budget)
    assert rows[0]["pack_id"] == 0
    cum = 0
    for r in rows:
        assert r["pack_id"] == cum // 100
        cum += r["n"]


def test_prefix_sum_exact_above_2_53(spark):
    # bucket ids must come from exact integer division: double division is
    # only exact below 2^53 while order_col is spec'd int64 (round-2 advice)
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F
    from sqlite_cdc_spark.pipeline import sampling

    base = 1 << 61
    df = spark.range(500).select(
        (F.col("id") * 3 + F.lit(base)).alias("k"),
        (F.pmod(F.xxhash64("id"), 9) + 1).alias("v"),
    )
    got = {
        r["k"]: r["cumsum"]
        for r in sampling.prefix_sum(df, "k", "v", bucket_size=64).collect()
    }
    ref = {
        r["k"]: r["ref"]
        for r in df.withColumn(
            "ref",
            F.coalesce(
                F.sum("v").over(
                    W.orderBy("k").rowsBetween(W.unboundedPreceding, -1)
                ),
                F.lit(0),
            ).cast("bigint"),
        ).collect()
    }
    assert got == ref


def test_weighted_sample_determinism_and_bias(spark):
    from pyspark.sql import functions as F

    from sqlite_cdc_spark.pipeline import sampling

    df = spark.range(400).select(
        F.col("id").alias("k"),
        # half the items get 16x the weight of the other half
        F.when(F.col("id") % 2 == 0, 16).otherwise(1).alias("wt"),
    )
    a = sampling.weighted_sample(df, "k", "wt", k=100)
    b = sampling.weighted_sample(df, "k", "wt", k=100)
    rows = a.collect()
    assert len(rows) == 100
    assert sorted(r.rk for r in rows) == list(range(1, 101))
    # bit-for-bit deterministic across runs
    assert {(r.k, r.rk) for r in rows} == {(r.k, r.rk) for r in b.collect()}
    # heavy items should dominate the sample (16:1 weights -> expect ~94
    # heavy; require a clear majority to stay noise-proof)
    heavy = sum(1 for r in rows if r.k % 2 == 0)
    assert heavy > 75
    # clamping: weight > max_weight behaves like max_weight
    c = sampling.weighted_sample(
        df.withColumn("wt", F.col("wt") * 1000), "k", "wt", k=50, max_weight=8
    )
    assert c.count() == 50


def test_poisson_bootstrap_ci_brackets_true_mean(spark):
    from sqlite_cdc_spark.pipeline import sampling

    rows = [(i, 100.0 + (i % 21) - 10) for i in range(2000)]  # mean 100
    df = spark.createDataFrame(rows, ["k", "v"])
    got = sampling.poisson_bootstrap(df, "k", "v").collect()
    assert len(got) == 32
    lo, hi = got[0].ci_lo, got[0].ci_hi
    assert all(r.ci_lo == lo and r.ci_hi == hi for r in got)
    assert lo < 100.0 < hi
    assert hi - lo < 2.0  # n=2000 → tight interval
    # weights average ~1 → n_eff near n
    import statistics

    assert 1800 < statistics.mean(r.n_eff for r in got) < 2200


def test_poisson_bootstrap_deterministic_across_partitioning(spark):
    from sqlite_cdc_spark.pipeline import sampling

    rows = [(i, float(i % 37)) for i in range(500)]
    a = sorted(
        tuple(r) for r in sampling.poisson_bootstrap(
            spark.createDataFrame(rows, ["k", "v"]).repartition(1), "k", "v",
            n_replicates=8,
        ).collect()
    )
    b = sorted(
        tuple(r) for r in sampling.poisson_bootstrap(
            spark.createDataFrame(rows, ["k", "v"]).repartition(7), "k", "v",
            n_replicates=8,
        ).collect()
    )
    assert a == b


def test_temporal_split_embargo_and_purge(spark):
    import datetime as dt

    from sqlite_cdc_spark.pipeline import sampling

    rows = [
        # user 1 active only early; user 2 spans the boundary; user 3 only late
        (1, dt.datetime(2024, 1, 1), 1),
        (2, dt.datetime(2024, 1, 2), 2),
        (3, dt.datetime(2024, 1, 12), 2),   # embargo zone
        (4, dt.datetime(2024, 1, 20), 2),
        (5, dt.datetime(2024, 1, 21), 3),
    ]
    df = spark.createDataFrame(rows, ["event_id", "ts", "user_id"])
    got = {
        r.event_id: r.split
        for r in sampling.temporal_split(
            df, "ts", "user_id", "2024-01-10 00:00:00", "2024-01-15 00:00:00"
        ).collect()
    }
    assert got[1] == "train"          # early-only user stays
    assert 2 not in got               # user 2 purged from train (active in test)
    assert 3 not in got               # embargo row dropped
    assert got[4] == "test" and got[5] == "test"


def test_rendezvous_movement_is_minimal(spark):
    # the registered query's property on fixture data: growing 5 -> 6
    # shards moves ~1/6 of keys (mod-N hashing would move ~5/6)
    import __spark_entry__ as entry

    rows = entry.queries()["b26_rendezvous"](spark, "/root/testdata/sf0.001").collect()
    frac = rows[0].moved_frac
    assert 0.10 < frac < 0.25, frac
    # and shards stay balanced within 3x of each other
    counts = [r.n_keys for r in rows]
    assert max(counts) < 3 * min(counts)
