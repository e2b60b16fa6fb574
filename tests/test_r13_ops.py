"""Round-13 operator semantics — unit tests for the properties the
oracle rows can't see (kernel invariants, guard behavior)."""

from __future__ import annotations

import pytest

from sqlite_cdc_spark.pipeline import stateful


def _fold_all(etypes, cuts=()):
    s = stateful.init_state()
    prev = 0
    for c in list(cuts) + [len(etypes)]:
        s = stateful.fold_chunk(s, etypes[prev:c])
        prev = c
    return s


@pytest.mark.parametrize("seed", range(6))
def test_fold_chunk_is_chunking_invariant(seed):
    # the core applyInPandasWithState property: any micro-batch slicing
    # of the ordered feed folds to the same state as one pass
    import random

    rng = random.Random(seed)
    types = ["click", "view", "purchase", "error", "signup"]
    seq = [rng.choice(types) for _ in range(200)]
    whole = _fold_all(seq)
    for _ in range(10):
        k = rng.randint(1, 8)
        cuts = sorted(rng.sample(range(1, 200), k))
        assert _fold_all(seq, cuts) == whole


def test_fold_chunk_known_answer():
    # click view click | purchase click -> conversion across the cut,
    # streak 3, open streak 1 at the end
    s = _fold_all(
        ["click", "view", "click", "purchase", "click"], cuts=[3]
    )
    n_ev, n_pu, n_cv, mx, open_, last_browse = s
    assert (n_ev, n_pu, n_cv, mx, open_, last_browse) == (
        5, 1, 1, 3, 1, True
    )


def test_fold_chunk_empty_and_all_browse():
    s = stateful.fold_chunk(stateful.init_state(), [])
    assert s == stateful.init_state()
    s = _fold_all(["view"] * 7, cuts=[2, 5])
    assert s[3] == 7 and s[4] == 7  # max streak and open streak
    assert s[1] == 0 and s[2] == 0


def test_distributed_prefix_sum_matches_single_task_window(spark):
    # bit-identity vs the one-task global window it replaces
    import random

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from sqlite_cdc_spark import derive

    rng = random.Random(31)
    rows = [(i, rng.randint(0, 50)) for i in range(500)]
    df = spark.createDataFrame(rows, "id long, w long").repartition(8)
    got = {
        r.id: r.cum_before
        for r in derive.distributed_prefix_sum(
            df, [F.col("id").asc()], "w"
        ).collect()
    }
    w = (
        Window.orderBy(F.col("id").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    want = {
        r.id: r.cb
        for r in df.withColumn(
            "cb", F.coalesce(F.sum("w").over(w), F.lit(0))
        ).collect()
    }
    assert got == want


def test_pps_systematic_hits_exactly_n_points(spark):
    import random

    from pyspark.sql import functions as F

    from sqlite_cdc_spark.pipeline import sampling

    rng = random.Random(5)
    rows = [(i, rng.randint(1, 400)) for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, n_chars long")
    n = 40
    out = sampling.pps_systematic(
        df, "n_chars", n, [F.col("doc_id").asc()]
    ).collect()
    # every point lands in exactly one interval: total hits == n
    assert sum(r.n_hits for r in out) == n
    wt = dict(rows)
    total = sum(wt.values())
    stride = total // n
    for r in out:
        # a unit can repeat only if heavier than the stride
        if r.n_hits > 1:
            assert wt[r.doc_id] > stride * (r.n_hits - 1)


def test_kcore_peels_planted_fringe(spark):
    from pyspark.sql import functions as F

    from sqlite_cdc_spark import derive

    # 4-clique core (1-4) + a pendant chain 5-6 hanging off node 1
    und = [(a, b) for a in range(1, 5) for b in range(1, 5) if a != b]
    und += [(1, 5), (5, 1), (5, 6), (6, 5)]
    edges = spark.createDataFrame(und, "src long, dst long")
    got = {
        r.round: (r.n_nodes, r.n_edges, r.min_deg, r.max_deg)
        for r in derive.kcore_peel(edges, k=3, rounds=3).collect()
    }
    assert got[0] == (6, 16, 1, 4)
    # round 1 removes node 6 (deg 1) and node 5 (deg 2): the 4-clique
    # (every degree 3) survives all remaining rounds unchanged
    assert got[1] == (4, 12, 3, 3)
    assert got[2] == (4, 12, 3, 3)
    assert got[3] == (4, 12, 3, 3)


def test_kcore_empty_subgraph_reports_zero_rows_stats(spark):
    from sqlite_cdc_spark import derive

    # a path graph has no 3-core: rounds collapse to the empty graph
    und = [(1, 2), (2, 1), (2, 3), (3, 2)]
    edges = spark.createDataFrame(und, "src long, dst long")
    got = {
        r.round: (r.n_nodes, r.n_edges, r.min_deg, r.max_deg)
        for r in derive.kcore_peel(edges, k=3, rounds=2).collect()
    }
    assert got[1] == (0, 0, None, None)
    assert got[2] == (0, 0, None, None)


def test_anova_planted_separation_and_degenerate_null(spark):
    import __spark_entry__ as entry

    rows = entry.queries()["b10_anova"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert len(rows) == 5  # one row per event type
    r0 = rows[0]
    # global fields repeat identically on every per-group row
    assert all(
        (r.ssb_x, r.ssw_x, r.f) == (r0.ssb_x, r0.ssw_x, r0.f) for r in rows
    )
    assert r0.n_total == sum(r.n_g for r in rows)
    assert r0.ssw_x > 0 and r0.f is not None and r0.f >= 0.0
    # exact identity: ssb + ssw == total SS (both floored the same way)
    q_all = sum(r.ssq_milli for r in rows)
    s_all = sum(r.sum_milli for r in rows)
    assert r0.ssb_x + r0.ssw_x == q_all - (s_all * s_all) // r0.n_total


def test_anova_zero_within_variance_yields_null_f(spark):
    # every value identical within AND across groups -> ssw == 0 -> NULL
    # (the capture_recapture/mann_kendall degenerate-division rule)
    import os
    import tempfile

    import __spark_entry__ as entry

    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            [(i, "t%d" % (i % 2), 2.5) for i in range(20)],
            "event_id long, event_type string, value double",
        ).write.parquet(os.path.join(d, "events.parquet"))
        rows = entry.queries()["b10_anova"](spark, d).collect()
    assert rows and all(r.ssw_x == 0 and r.f is None for r in rows)


def test_dict_encoding_flags_low_card_in_high_card_out(spark):
    import __spark_entry__ as entry

    rows = {
        r.col_name: r
        for r in entry.queries()["b13_dict_encoding"](
            spark, "/root/testdata/sf0.001"
        ).collect()
    }
    assert set(rows) == {"lang", "source", "text"}
    # low-cardinality lang dictionary-encodes at a big saving;
    # the near-unique text payload must fall back to plain
    assert rows["lang"].dict_beneficial
    assert rows["lang"].savings_x1e6 > 300000
    assert not rows["text"].dict_beneficial
    # bit-width is the integer ceil(log2(ndv)): re-derive in python
    for r in rows.values():
        assert r.code_bits == max(1, (r.n_distinct - 1).bit_length())
        assert r.codes_bytes == (r.n_values * r.code_bits + 7) // 8


def test_bellman_ford_bounded_hops_and_min_path(spark):
    from sqlite_cdc_spark import derive

    # 0 -> 1 -> 2 -> 3 -> 4 -> 5 chain (w=1 each) plus a heavy shortcut
    # 0 -> 3 (w=10): node 3 takes the 3-hop relay (cost 3), never the
    # 1-hop shortcut; node 5's true shortest path (cost 5) needs 5
    # edges, so 4 rounds report the best <=4-edge route via the
    # shortcut (10+1+1 = 12) — the documented bounded-hop guarantee
    edges = spark.createDataFrame(
        [(i, i + 1, 1) for i in range(5)] + [(0, 3, 10)],
        "src long, dst long, w long",
    )
    got = {
        r.node: r.dist
        for r in derive.bellman_ford(edges, source=0, rounds=4).collect()
    }
    assert got == {0: 0, 1: 1, 2: 2, 3: 3, 4: 4, 5: 12}
    # one more round settles node 5 to the true shortest path
    got5 = {
        r.node: r.dist
        for r in derive.bellman_ford(edges, source=0, rounds=5).collect()
    }
    assert got5[5] == 5


def test_mmr_rerank_diversifies_and_guards(spark):
    import pytest as _pytest

    from pyspark.sql import Row
    from sqlite_cdc_spark.pipeline import similarity

    # query q = [1, 0]; an exact duplicate of the best match and one
    # diverse vector: pure top-3-by-relevance would rank the dup
    # second (rel 2 > rel 3), but its self-similarity penalty
    # (maxsim = |v1|^2 = 2e12 > rel) drives its MMR score to 0, so
    # MMR (2*rel - maxsim) must pick the diverse vector second
    rows = [
        Row(vec_id=0, embedding=[1.0, 0.0]),   # query
        Row(vec_id=1, embedding=[1.0, 1.0]),   # best match
        Row(vec_id=2, embedding=[1.0, 1.0]),   # exact dup of 1
        Row(vec_id=3, embedding=[0.9, 0.0]),   # diverse, lower rel
    ]
    df = spark.createDataFrame(rows)
    out = similarity.mmr_rerank(df, query_id=0, k=3).collect()
    assert [r.vec_id for r in out] == [1, 3, 2]
    assert [r.mmr_rank for r in out] == [0, 1, 2]
    # first pick is pure relevance (maxsim 0), later picks carry the
    # running max against the picked set
    assert out[0].maxsim == 0 and out[1].maxsim > 0
    assert all(r.score == 2 * r.rel - r.maxsim for r in out)
    # fewer candidates than k: early stop, no duplicate picks
    short = similarity.mmr_rerank(df, query_id=0, k=10).collect()
    assert len(short) == 3
    # missing query id is a clear error, not an IndexError
    with _pytest.raises(ValueError, match="not found"):
        similarity.mmr_rerank(df, query_id=99, k=2)


def test_audio_fingerprints_rescale_invariant_and_guards(spark):
    from pyspark.sql import Row

    from sqlite_cdc_spark.pipeline import multimodal as mm

    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="the quick brown fox jumps over the lazy "
                               "dog while seventeen noisy parrots debate "
                               "the merits of lossless audio encodings "
                               "and a tuba hums quietly in the corner of "
                               "the archive room all afternoon long ok"),
            Row(doc_id=2, text="tiny"),  # < 9 frames: no landmarks
        ]
    )
    orig = mm.pcm_from_text(docs)
    fp_o = sorted(
        (r.doc_id, r.pos, r.shingle)
        for r in mm.audio_fingerprints(orig, frame=8).collect()
    )
    # every landmark is doc 1's; doc 2 is too short for one shingle
    assert fp_o and all(d == 1 for d, _, _ in fp_o)
    # the amplitude-invariance contract: x3 rescale scales every frame
    # energy by 9, so rise/fall bits and shingles replay identically
    fp_s = sorted(
        (r.doc_id, r.pos, r.shingle)
        for r in mm.audio_fingerprints(
            mm.scale_pcm(orig, 3), frame=8
        ).collect()
    )
    assert fp_s == fp_o


def test_scale_pcm_saturates_and_passes_corrupt_through(spark):
    import numpy as np

    from pyspark.sql import Row

    from sqlite_cdc_spark.pipeline import multimodal as mm

    loud = np.array([30000, -30000, 5, -5], dtype="<i2").tobytes()
    rows = [
        Row(doc_id=1, payload=loud),
        Row(doc_id=2, payload=b"\x01"),  # odd length: corrupt s16le
    ]
    got = {
        r.doc_id: r.payload
        for r in mm.scale_pcm(
            spark.createDataFrame(rows), 3
        ).collect()
    }
    out = np.frombuffer(got[1], dtype="<i2")
    # 3x of 30000 saturates at the int16 rails instead of wrapping
    assert list(out) == [32767, -32768, 15, -15]
    # corrupt payloads pass through unchanged
    assert bytes(got[2]) == b"\x01"


def test_audio_fingerprints_partition_invariant(spark):
    # mapInPandas batch boundaries must not change the landmark set —
    # the kernel's repeat/cumsum index algebra is per-batch, so a
    # repartitioned corpus has different batch compositions
    from sqlite_cdc_spark.pipeline import multimodal as mm
    from sqlite_cdc_spark.sources import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "text"
    )
    pcm = mm.pcm_from_text(docs).localCheckpoint()
    one = sorted(
        (r.doc_id, r.pos, r.shingle)
        for r in mm.audio_fingerprints(
            pcm.coalesce(1), frame=8
        ).collect()
    )
    many = sorted(
        (r.doc_id, r.pos, r.shingle)
        for r in mm.audio_fingerprints(
            pcm.repartition(16), frame=8
        ).collect()
    )
    assert one == many and len(one) > 0
