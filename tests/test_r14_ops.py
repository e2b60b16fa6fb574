"""Round-14 operator semantics — unit tests for the properties the
oracle rows can't see (kernel invariants, guard behavior)."""

from __future__ import annotations


def test_mmr_topn_prefilter_bounds_candidates_and_keeps_semantics(spark):
    from pyspark.sql import Row
    from sqlite_cdc_spark.pipeline import similarity

    rows = [
        Row(vec_id=0, embedding=[1.0, 0.0]),  # query
        # rel to q decreases with vec_id; 1 and 2 are exact duplicates
        # so the diversity penalty is observable inside the kept set
        Row(vec_id=1, embedding=[1.0, 1.0]),
        Row(vec_id=2, embedding=[1.0, 1.0]),
        Row(vec_id=3, embedding=[0.9, 0.0]),
        Row(vec_id=4, embedding=[0.5, 0.0]),
        Row(vec_id=5, embedding=[0.1, 0.0]),
    ]
    df = spark.createDataFrame(rows)

    # topn >= |candidates| is a no-op: identical picks to the unbounded run
    full = similarity.mmr_rerank(df, query_id=0, k=3).collect()
    wide = similarity.mmr_rerank(df, query_id=0, k=3, topn=100).collect()
    assert [tuple(r) for r in wide] == [tuple(r) for r in full]

    # topn=3 keeps exactly the rel-top3 {1, 2, 3}; vec 4 and 5 can never
    # be picked even though unbounded MMR would prefer 4's diversity
    bounded = similarity.mmr_rerank(df, query_id=0, k=3, topn=3).collect()
    assert {r.vec_id for r in bounded} <= {1, 2, 3}
    assert len(bounded) == 3
    # pick order inside the kept set still follows the MMR objective:
    # best match first, the diverse lower-rel vector before the dup
    assert [r.vec_id for r in bounded] == [1, 3, 2]
    assert all(r.score == 2 * r.rel - r.maxsim for r in bounded)

    # topn < k: early stop at the candidate bound, no duplicate picks
    short = similarity.mmr_rerank(df, query_id=0, k=5, topn=2).collect()
    assert len(short) == 2
    assert len({r.vec_id for r in short}) == 2


def test_mmr_topn_prefilter_tie_break_is_deterministic(spark):
    from pyspark.sql import Row
    from sqlite_cdc_spark.pipeline import similarity

    # four candidates with IDENTICAL relevance: the topn=2 boundary cut
    # must break ties by vec_id asc on both engines, so picks are stable
    rows = [Row(vec_id=0, embedding=[1.0, 0.0])] + [
        Row(vec_id=i, embedding=[0.5, float(i)]) for i in (1, 2, 3, 4)
    ]
    df = spark.createDataFrame(rows)
    out = similarity.mmr_rerank(df, query_id=0, k=2, topn=2)
    assert {r.vec_id for r in out.collect()} == {1, 2}


def test_compaction_cost_known_answer(spark):
    from pyspark.sql import Row
    from sqlite_cdc_spark import derive
    from pyspark.sql import functions as F

    # epoch size 10: epoch 0 = ids 0..9, epoch 1 = ids 10..19, ...
    rows = [
        # epoch 0: keys a,b inserted; b updated
        Row(id=1, operation="INSERT", k="a"),
        Row(id=2, operation="INSERT", k="b"),
        Row(id=3, operation="UPDATE", k="b"),
        # epoch 1: a deleted, c inserted
        Row(id=11, operation="DELETE", k="a"),
        Row(id=12, operation="INSERT", k="c"),
        # epoch 2: a re-inserted (resurrection), c updated twice
        Row(id=21, operation="INSERT", k="a"),
        Row(id=22, operation="UPDATE", k="c"),
        Row(id=23, operation="UPDATE", k="c"),
    ]
    df = spark.createDataFrame(rows)
    out = {
        r.epoch: r
        for r in derive.compaction_cost(
            df, F.col("k"), epoch_size=10
        ).collect()
    }
    assert set(out) == {0, 1, 2}
    # epoch 0: no carry, 3 changes over 2 keys, both live
    assert (out[0].carried_in, out[0].n_changes, out[0].n_keys_touched) == (0, 3, 2)
    assert (out[0].live_at_end, out[0].rows_read, out[0].rows_written) == (2, 3, 2)
    # epoch 1: carries {a,b}; a dies, c born -> live {b,c}
    assert (out[1].carried_in, out[1].n_changes, out[1].n_keys_touched) == (2, 2, 2)
    assert (out[1].live_at_end, out[1].rows_read, out[1].rows_written) == (2, 4, 2)
    # epoch 2: carries {b,c}; a resurrects -> live {a,b,c}
    assert (out[2].carried_in, out[2].n_changes, out[2].n_keys_touched) == (2, 3, 2)
    assert (out[2].live_at_end, out[2].rows_read, out[2].rows_written) == (3, 5, 3)
    # write_amp at the last epoch: (2+2+3) writes / 3 live
    assert abs(out[2].write_amp - round(7 / 3, 6)) < 1e-9


import pytest


@pytest.mark.parametrize("seed", (7, 14, 21))
def test_compaction_cost_terminal_liveness_matches_direct_compaction(
    spark, seed
):
    """The model's live_at_end at the final epoch must equal what a
    single full compaction (last image per key, drop DELETE) keeps —
    the b2_vacuum_stats/b2_log_compaction consistency triangle."""
    import random

    from pyspark.sql import Row
    from pyspark.sql import functions as F
    from sqlite_cdc_spark import derive

    rng = random.Random(seed)
    rows = [
        Row(
            id=i,
            operation=rng.choice(["INSERT", "UPDATE", "UPDATE", "DELETE"]),
            k=f"k{rng.randrange(40)}",
        )
        for i in range(1, 401)
    ]
    df = spark.createDataFrame(rows)
    ep = derive.compaction_cost(df, F.col("k"), epoch_size=50).collect()
    final_live = max(ep, key=lambda r: r.epoch).live_at_end
    direct = (
        df.groupBy("k")
        .agg(F.max_by("operation", "id").alias("last_op"))
        .filter(F.col("last_op") != "DELETE")
        .count()
    )
    assert final_live == direct
    # conservation: epoch deltas telescope — carried_in(e) == live_at_end(e-1)
    by_epoch = sorted(ep, key=lambda r: r.epoch)
    for prev, cur in zip(by_epoch, by_epoch[1:]):
        assert cur.carried_in == prev.live_at_end


def test_compaction_cadence_nested_doublings_are_monotone(spark, sf_dir):
    """For nested cadences (each boundary set a subset of the finer
    one), total rows read can only shrink as runs coarsen — each
    carried_in term at a surviving boundary is unchanged and the
    dropped boundaries' terms vanish. final_live is cadence-invariant
    (it is the log's terminal state, not a schedule property)."""
    import __spark_entry__ as se

    rows = {
        r.epoch_size: r
        for r in se.queries()["b2_compaction_cadence"](spark, sf_dir).collect()
    }
    assert set(rows) == {500, 1000, 2000, 4000}
    lives = {r.final_live for r in rows.values()}
    assert len(lives) == 1
    reads = [rows[w].total_rows_read for w in (500, 1000, 2000, 4000)]
    assert reads == sorted(reads, reverse=True) or len(set(reads)) == 1
    # n_changes conservation: every cadence folds the same log
    assert len({r.n_changes for r in rows.values()}) == 1


def test_compaction_cost_empty_log_is_empty_frame(spark):
    from pyspark.sql import functions as F
    from sqlite_cdc_spark import derive

    empty = spark.createDataFrame(
        [], "id long, operation string, k string"
    )
    out = derive.compaction_cost(empty, F.col("k"), epoch_size=10)
    assert out.count() == 0
    assert "write_amp" in out.columns


def test_compaction_cost_rejects_nonpositive_epoch_size(spark):
    """epoch_size=0 would `id div 0` → NULL epochs under non-ANSI
    mode, silently collapsing the grid to one NULL row (ADVICE r14) —
    so the function must fail fast instead."""
    import pytest
    from pyspark.sql import functions as F
    from sqlite_cdc_spark import derive

    df = spark.createDataFrame(
        [(1, "INSERT", "a")], "id long, operation string, k string"
    )
    for bad in (0, -5):
        with pytest.raises(ValueError, match="epoch_size"):
            derive.compaction_cost(df, F.col("k"), epoch_size=bad)


def test_limit_pushdown_audit_conservation(spark, sf_dir):
    """The two-phase top-k algebra's conservation laws: winners across
    buckets total exactly k (the table has >= k rows), every bucket's
    heap emits at most k rows and never more than it scanned, and the
    driver-merge volume the audit prices is genuinely smaller than a
    naive all-rows merge."""
    import __spark_entry__ as se

    rows = se.queries()["b12_limit_pushdown_audit"](spark, sf_dir).collect()
    assert sum(r.n_winners for r in rows) == 100
    assert all(r.heap_out <= 100 for r in rows)
    assert all(r.heap_out <= r.n_rows for r in rows)
    assert all(r.n_winners <= r.heap_out for r in rows)
    merge_rows = sum(r.heap_out for r in rows)
    scanned = sum(r.n_rows for r in rows)
    assert merge_rows < scanned
