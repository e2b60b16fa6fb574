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
