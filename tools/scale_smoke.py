"""Scale-up smoke: do the headline plans hold at 10× the bench scale?

Generates a deterministic ~6M-row lineitem-shaped table (≈ sf1) plus a
1M-row event log in /tmp, runs the operator families that matter at scale
(bootstrap images, snapshot diff, hash agg, windows, compaction, top-k),
and reports rows/s at sf0.1 vs sf1-ish so sub-linear scaling regressions
are visible. Prints one JSON line (SCALE_SMOKE.json).
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from sqlite_cdc_spark import derive
from sqlite_cdc_spark.bootstrap import snapshot_as_inserts
from sqlite_cdc_spark.pipeline import decontam, dedup, lm, sampling
from sqlite_cdc_spark.pipeline import text as textops
from sqlite_cdc_spark.session import get_spark


#: reps per family; the recorded time is the MIN — this box's sf1x wall
#: times swing 2-4x run-to-run for memory-heavy families (kernel page-
#: zeroing contention under 32 concurrent workers), so a single reading
#: measures transient box state, not the operator. Min-of-k isolates the
#: plan cost; the JSON records the policy.
SMOKE_REPS = int(os.environ.get("SPARK_GRAFT_SMOKE_REPS", "3"))


def _best_of(fn, reps: int | None = None) -> float:
    best = None
    for _ in range(reps or SMOKE_REPS):
        t0 = time.time()
        fn()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    return round(best, 2)


def gen_lineitem(spark, rows: int, path: str):
    df = (
        spark.range(rows)
        .select(
            (F.col("id") / 4).cast("long").alias("l_orderkey"),
            F.pmod(F.xxhash64("id"), 20000).alias("l_partkey"),
            F.pmod(F.xxhash64("id", F.lit(1)), 1000).alias("l_suppkey"),
            F.pmod(F.col("id"), 7).cast("int").alias("l_linenumber"),
            (F.pmod(F.xxhash64("id", F.lit(2)), 50) + 1).cast("double").alias("l_quantity"),
            (F.pmod(F.xxhash64("id", F.lit(3)), 100000) / 100.0 + 1.0).alias("l_extendedprice"),
            (F.pmod(F.xxhash64("id", F.lit(4)), 10) / 100.0).alias("l_discount"),
            F.lit(0.04).alias("l_tax"),
            F.when(F.pmod(F.col("id"), 3) == 0, "A").when(F.pmod(F.col("id"), 3) == 1, "N").otherwise("R").alias("l_returnflag"),
            F.when(F.pmod(F.col("id"), 2) == 0, "O").otherwise("F").alias("l_linestatus"),
            F.timestamp_seconds(F.lit(1700000000) + F.pmod(F.xxhash64("id", F.lit(5)), 31536000)).alias("l_shipdate"),
        )
    )
    df.write.mode("overwrite").parquet(path)


def ops(spark, path: str) -> dict[str, float]:
    li = spark.read.parquet(path)
    n = li.count()
    out: dict[str, float] = {"rows": n}

    def run(name, fn):
        out[name] = _best_of(fn)

    run("bootstrap_images", lambda: snapshot_as_inserts(li, "lineitem")
        .write.format("noop").mode("overwrite").save())
    run("hash_agg", lambda: li.groupBy("l_returnflag", "l_linestatus")
        .agg(F.sum(F.col("l_quantity").cast("decimal(38,6)")).alias("s"),
             F.count(F.lit(1)).alias("n"))
        .write.format("noop").mode("overwrite").save())
    w = Window.partitionBy("l_orderkey").orderBy("l_linenumber", "l_partkey")
    run("window_funcs", lambda: li.select(
        "l_orderkey", F.row_number().over(w).alias("rn"),
        F.lag("l_extendedprice").over(w).alias("p"))
        .write.format("noop").mode("overwrite").save())
    run("topk_per_group", lambda: derive.topk_per_group(
        li, ["l_returnflag"],
        [F.col("l_extendedprice").desc(), F.col("l_orderkey").asc(),
         F.col("l_partkey").asc(), F.col("l_linenumber").asc()], 10)
        .write.format("noop").mode("overwrite").save())
    old = li.select("l_orderkey", "l_linenumber", "l_partkey", "l_quantity").filter(
        F.col("l_linenumber") == 0
    )
    new = old.withColumn(
        "l_quantity",
        F.when(F.col("l_orderkey") % 13 == 0, F.col("l_quantity") + 1).otherwise(F.col("l_quantity")),
    ).filter(F.col("l_orderkey") % 17 != 0)
    run("snapshot_diff", lambda: derive.snapshot_diff(
        old, new, ["l_orderkey", "l_partkey"]).write.format("noop").mode("overwrite").save())
    run("keyed_sample", lambda: sampling.sample_by_key(li, "l_orderkey", 10)
        .write.format("noop").mode("overwrite").save())
    # big-big equi-join + agg: the star-join core (orders derived from the
    # fact so both sides scale together)
    orders = li.select("l_orderkey").distinct().select(
        "l_orderkey", F.pmod(F.xxhash64("l_orderkey"), 5).alias("o_status")
    )
    run("fact_fact_join_agg", lambda: li.join(orders, "l_orderkey")
        .groupBy("o_status")
        .agg(F.count(F.lit(1)).alias("n"),
             F.sum(F.col("l_extendedprice").cast("decimal(38,6)")).alias("rev"))
        .write.format("noop").mode("overwrite").save())
    return out


def gen_documents(spark, rows: int, path: str):
    """Deterministic 30-token documents from a 500-word vocabulary."""
    vocab = F.array(*[F.lit(f"w{i:03d}") for i in range(500)])
    df = spark.range(rows).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            F.transform(
                F.sequence(F.lit(0), F.lit(29)),
                lambda i: F.element_at(
                    vocab, (F.pmod(F.xxhash64("id", i), 500) + 1).cast("int")
                ),
            ),
        ).alias("text"),
    )
    df.write.mode("overwrite").parquet(path)


def text_ops(spark, path: str) -> dict[str, float]:
    """The text-pipeline families at scale: near-dedup candidates
    (production xxhash64 mode), benchmark decontamination, repetition
    rules. All shuffle volume ∝ token rows — the families that dominate a
    real corpus build."""
    docs = spark.read.parquet(path)
    bench = docs.filter(F.col("doc_id") < 50).select("doc_id", "text")
    out: dict[str, float] = {"doc_rows": docs.count()}

    def run(name, fn):
        out[name] = _best_of(fn)

    run("minhash_candidates", lambda: dedup.minhash_candidates(
        docs, "doc_id", "text", num_hashes=32, bands=8)
        .write.format("noop").mode("overwrite").save())
    run("decontamination", lambda: decontam.ngram_contamination(docs, bench)
        .write.format("noop").mode("overwrite").save())
    run("containment", lambda: decontam.fingerprint_containment(docs, bench)
        .write.format("noop").mode("overwrite").save())
    run("repetition_rules", lambda: textops.repetition_features(docs)
        .write.format("noop").mode("overwrite").save())
    run("mixture_sample", lambda: sampling.mixture_sample(
        docs.select(
            "doc_id",
            F.pmod(F.col("doc_id"), 5).cast("string").alias("lang"),
            F.lit(30).alias("n_tok"),
        ),
        "lang", "doc_id", "n_tok", budgets={"0": 100_000, "1": 50_000},
        default_budget=200_000)
        .write.format("noop").mode("overwrite").save())
    # dup-cluster formation over synthetic pair components (size 2-3, the
    # realistic near-dup shape): measures the iterative CC rounds, not the
    # pair generation
    n = out["doc_rows"]
    pairs = docs.select(
        F.col("doc_id").alias("id_a"), (F.col("doc_id") + n).alias("id_b")
    ).unionByName(
        docs.filter(F.col("doc_id") % 3 == 0).select(
            (F.col("doc_id") + n).alias("id_a"),
            (F.col("doc_id") + 2 * n).alias("id_b"),
        )
    )
    # algorithm pinned: the auto-selector's <=100k-edge local union-find
    # fires at sf0.1x (80k edges) but not sf1x (800k), so "auto" would
    # make this ratio measure the backend CUTOVER, not scaling — the
    # smoke's job is the distributed path both scales run at 100 TB
    run("dup_clusters", lambda: dedup.dup_clusters(
        pairs, algorithm="propagate")
        .write.format("noop").mode("overwrite").save())
    # r5 LM/retrieval families: all word-count-shaped — shuffle volume is
    # token rows (tfidf/perplexity), pair rows (pmi), or |vocab| (bpe)
    run("tfidf_top_terms", lambda: lm.top_terms(docs, "doc_id", k=3)
        .write.format("noop").mode("overwrite").save())
    run("perplexity", lambda: lm.doc_cross_entropy(docs, "doc_id")
        .write.format("noop").mode("overwrite").save())
    run("bpe_pairs", lambda: lm.bpe_pair_counts(docs)
        .write.format("noop").mode("overwrite").save())
    run("pmi_pairs", lambda: lm.pmi_pairs(docs, "doc_id", min_count=50)
        .write.format("noop").mode("overwrite").save())
    run("temperature_sample", lambda: sampling.temperature_sample(
        docs.select(
            "doc_id",
            F.pmod(F.col("doc_id"), 5).cast("string").alias("lang"),
            F.lit(30).alias("n_tok"),
        ),
        "lang", "doc_id", "n_tok", total_budget=1_000_000)
        .write.format("noop").mode("overwrite").save())
    return out


def r6_ops(spark, docs_path: str, rows: int) -> dict[str, float]:
    """Round-6 families at scale: exact k-means + PQ ANN over synthetic
    embeddings, prefix-filter similarity join + codegen BPE over the
    synthetic docs, integer PageRank + triangles over a bounded-degree
    synthetic graph, Bloom build/probe, Poisson bootstrap, trailing
    EWMA. Inputs derive from `range()` so both scales share the same
    generators."""
    from sqlite_cdc_spark.pipeline import similarity

    docs = spark.read.parquet(docs_path)
    out: dict[str, float] = {}

    def run(name, fn):
        out[name] = _best_of(fn)

    n_emb = rows // 10
    emb = spark.range(n_emb).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(15)),
            lambda i: (F.pmod(F.xxhash64("id", i), 2000) / 1000.0 - 1.0),
        ).alias("embedding"),
    )
    run("kmeans_exact", lambda: similarity.kmeans_exact(emb, k=4, iters=3)
        .write.format("noop").mode("overwrite").save())
    run("pq_ann", lambda: similarity.ann_topk_pq(
        emb, emb.filter(F.col("vec_id") < 4), k=10, m=4, dim=16,
        seed_ids=(3, 47, 91, 135))
        .write.format("noop").mode("overwrite").save())
    run("prefix_filter_join", lambda: dedup.set_similarity_join(
        docs, "doc_id", "text", threshold=0.8)
        .write.format("noop").mode("overwrite").save())
    run("bpe_encode", lambda: lm.bpe_encode_stats(docs, "doc_id")
        .write.format("noop").mode("overwrite").save())
    # bounded-degree graph: each node links to 3 hash-derived neighbors
    n_nodes = rows // 10
    edges = spark.range(rows // 3).select(
        F.pmod(F.xxhash64("id"), n_nodes).alias("src"),
        F.pmod(F.xxhash64("id", F.lit(1)), n_nodes).alias("dst"),
    ).filter(F.col("src") != F.col("dst"))
    run("pagerank", lambda: derive.pagerank(
        edges.unionByName(edges.select(F.col("dst").alias("src"),
                                       F.col("src").alias("dst"))), iters=3)
        .write.format("noop").mode("overwrite").save())
    canon = edges.select(
        F.least("src", "dst").alias("src"), F.greatest("src", "dst").alias("dst")
    ).distinct()
    run("triangles", lambda: derive.triangle_stats(canon)
        .write.format("noop").mode("overwrite").save())
    dim_keys = spark.range(10_000).select(F.col("id").alias("k"))
    fact = spark.range(rows).select(
        F.pmod(F.xxhash64("id"), 1_000_000).alias("k"),
        (F.pmod(F.xxhash64("id", F.lit(2)), 10000) / 100.0).alias("v"),
    )
    run("bloom_semi_join", lambda: derive.bloom_probe(
        fact, derive.bloom_build(dim_keys, "k"), "k")
        .write.format("noop").mode("overwrite").save())
    run("poisson_bootstrap", lambda: sampling.poisson_bootstrap(
        fact.select(F.col("k").alias("key"), "v"), "key", "v",
        n_replicates=16)
        .write.format("noop").mode("overwrite").save())
    seq = spark.range(rows).select(
        F.pmod(F.col("id"), n_nodes).alias("user_id"),
        F.col("id").alias("seq"),
        (F.pmod(F.xxhash64("id", F.lit(3)), 10000) / 100.0).alias("value"),
    )
    run("trailing_ewma", lambda: derive.trailing_ewma(
        seq, "user_id", ["seq"], "value")
        .write.format("noop").mode("overwrite").save())
    return out


def r7_ops(spark, li_path: str, docs_path: str, rows: int) -> dict[str, float]:
    """Round-6/7 families not yet in the smoke (VERDICT r6 item 7):
    content-defined chunking, the Q13/Q17/Q19 query shapes, binary
    byte-histogram, posting-list delta+varint audit, linear counting,
    and the r7 genuine image decode+resize. Inputs derive from range()/
    the shared generators so both scales are comparable."""
    from sqlite_cdc_spark.pipeline import multimodal

    li = spark.read.parquet(li_path)
    docs = spark.read.parquet(docs_path)
    out: dict[str, float] = {}

    def run(name, fn):
        out[name] = _best_of(fn)

    run("cdc_chunk_stats", lambda: dedup.cdc_chunk_stats(
        docs, "doc_id", "text")
        .write.format("noop").mode("overwrite").save())
    # Q13 shape: customer left-join orders with an order-level predicate,
    # count per customer, histogram of counts
    n_cust = max(rows // 40, 1000)
    cust = spark.range(n_cust).select(F.col("id").alias("c_custkey"))
    orders = spark.range(rows // 4).select(
        F.col("id").alias("o_orderkey"),
        F.pmod(F.xxhash64("id"), n_cust).alias("o_custkey"),
        F.pmod(F.xxhash64("id", F.lit(1)), 5).alias("o_prio"),
    )

    def q13():
        per = (
            cust.join(
                orders.filter(F.col("o_prio") != 0),
                cust["c_custkey"] == orders["o_custkey"],
                "left",
            )
            .groupBy("c_custkey")
            .agg(F.count("o_orderkey").alias("c_count"))
        )
        per.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist")) \
            .write.format("noop").mode("overwrite").save()

    run("q13_order_distribution", q13)
    # Q17 shape: per-part avg-quantity threshold (windowed broadcast of
    # the per-key aggregate) gating a revenue sum
    def q17():
        avgq = li.groupBy("l_partkey").agg(
            (F.avg("l_quantity") * 0.2).alias("__thr"))
        (li.join(avgq, "l_partkey")
           .filter(F.col("l_quantity") < F.col("__thr"))
           .agg(F.sum("l_extendedprice").alias("rev"))
           .write.format("noop").mode("overwrite").save())

    run("q17_small_quantity", q17)
    # Q19 shape: disjunctive multi-clause predicate pushed to the scan
    def q19():
        (li.filter(
            ((F.col("l_quantity") >= 1) & (F.col("l_quantity") <= 11)
             & (F.col("l_partkey") % 3 == 0))
            | ((F.col("l_quantity") >= 10) & (F.col("l_quantity") <= 20)
               & (F.col("l_partkey") % 3 == 1))
            | ((F.col("l_quantity") >= 20) & (F.col("l_quantity") <= 30)
               & (F.col("l_partkey") % 3 == 2)))
            .agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
                 .alias("revenue"))
            .write.format("noop").mode("overwrite").save())

    run("q19_disjunctive", q19)
    run("byte_histogram", lambda: (
        docs.select(F.encode("text", "UTF-8").alias("p"))
        .select(
            F.upper(F.hex(F.substring(F.col("p"), 1, 1))).alias("lead"),
            F.length("p").alias("n"),
        )
        .groupBy("lead").agg(F.count(F.lit(1)).alias("c"), F.sum("n").alias("b"))
        .write.format("noop").mode("overwrite").save()))
    run("index_compression", lambda: _index_compression(spark, docs))
    run("linear_counting", lambda: _linear_counting(spark, li))
    run("image_resize", lambda: multimodal.image_resize(
        multimodal.synth_ppm(spark.range(rows // 20)
                             .select(F.col("id").alias("doc_id"))), 8, 8)
        .write.format("noop").mode("overwrite").save())
    return out


def _index_compression(spark, docs):
    """Posting-list gap+varint audit shape (b30_index_compression)."""
    dt = (
        docs.select("doc_id", F.explode(textops.tokens("text")).alias("tok"))
        .filter(F.col("tok") != "")
        .distinct()
    )
    w = Window.partitionBy("tok").orderBy(F.col("doc_id").asc())
    gaps = dt.select(
        "tok",
        (F.col("doc_id") - F.coalesce(F.lag("doc_id").over(w), F.lit(0))).alias("gap"),
    )
    per = gaps.groupBy("tok").agg(
        F.count(F.lit(1)).alias("df"),
        F.sum(
            F.when(F.col("gap") < 128, 1)
            .when(F.col("gap") < 16384, 2)
            .when(F.col("gap") < 2097152, 3)
            .otherwise(4)
        ).alias("vb"),
    )
    per.groupBy((F.col("df") >= 100).alias("big")).agg(
        F.sum("df").alias("n_post"), F.sum("vb").alias("bytes")
    ).write.format("noop").mode("overwrite").save()


def _linear_counting(spark, li):
    """Linear-counting distinct estimate shape (b27_linear_counting):
    one bit_or-folded bitmap over hashed keys."""
    m = 1 << 14
    h = F.pmod(F.xxhash64("l_partkey"), m)
    (li.select((h / 63).cast("int").alias("w"),
               F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pmod(xxhash64(l_partkey), 16384) % 63 AS INT))").alias("b"))
       .groupBy("w").agg(F.expr("bit_or(b)").alias("bits"))
       .write.format("noop").mode("overwrite").save())


def r8_ops(spark, docs_path: str, rows: int) -> dict[str, float]:
    """Round-7-wave families (VERDICT r7 item 4): genuine image/audio/
    frame decode, SCD2 point-in-time join, semantic decontamination
    (broadcast AND ANN-bucketed), incremental n-gram decontam,
    session-basket association rules, and the dedup decision manifest —
    the composite most likely to go superlinear (its prefix-filter
    input is the board's heaviest join). All inputs derive from
    range()/the shared generators so both scales are comparable."""
    from sqlite_cdc_spark.pipeline import multimodal, similarity

    docs = spark.read.parquet(docs_path)
    out: dict[str, float] = {}

    def run(name, fn):
        out[name] = _best_of(fn)

    ids = spark.range(rows // 20).select(F.col("id").alias("doc_id"))
    run("image_stats", lambda: multimodal.image_stats(
        multimodal.synth_ppm(ids))
        .write.format("noop").mode("overwrite").save())
    run("audio_stats", lambda: multimodal.audio_stats(
        multimodal.synth_pcm(ids))
        .write.format("noop").mode("overwrite").save())
    run("frame_extract", lambda: multimodal.extract_frames(
        multimodal.synth_ppm_stream(
            spark.range(rows // 40).select(F.col("id").alias("doc_id"))))
        .write.format("noop").mode("overwrite").save())

    # SCD2 point-in-time: synthetic version intervals (4 per user) probed
    # by an event stream — the keyed range join of q_b9_scd2_pit
    n_users = max(rows // 100, 100)
    versions = spark.range(n_users * 4).select(
        F.pmod(F.col("id"), n_users).alias("__vu"),
        F.col("id").alias("version_id"),
        F.timestamp_seconds(
            F.lit(1700000000) + (F.col("id") / n_users).cast("long") * 86400
        ).alias("valid_from"),
        F.when(
            (F.col("id") / n_users).cast("long") < 3,
            F.timestamp_seconds(
                F.lit(1700000000)
                + ((F.col("id") / n_users).cast("long") + 1) * 86400
            ),
        ).alias("valid_to"),
    )
    ev = spark.range(rows // 4).select(
        F.col("id").alias("event_id"),
        F.pmod(F.xxhash64("id"), n_users).alias("user_id"),
        F.timestamp_seconds(
            F.lit(1700000000) + F.pmod(F.xxhash64("id", F.lit(1)), 5 * 86400)
        ).alias("ts"),
    )

    def scd2_pit():
        j = ev.join(
            versions,
            (ev["user_id"] == versions["__vu"])
            & (versions["valid_from"] <= ev["ts"]),
            "left",
        )
        w = Window.partitionBy("event_id").orderBy(
            F.col("valid_from").desc(), F.col("version_id").desc()
        )
        (j.withColumn("__rn", F.row_number().over(w))
         .filter(F.col("__rn") == 1)
         .select("event_id", "version_id")
         .write.format("noop").mode("overwrite").save())

    run("scd2_pit", scd2_pit)

    # semantic decontam: synthetic 64-dim embeddings, 200-vector bench
    emb = spark.range(rows // 40).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(63)),
            lambda d: (F.pmod(F.xxhash64("id", d), 2000) - 1000) / 1000.0,
        ).alias("embedding"),
    )
    bench_e = emb.filter(F.col("vec_id") % (rows // 40 // 200 + 1) == 0)
    corpus_e = emb.filter(F.col("vec_id") % (rows // 40 // 200 + 1) != 0)
    run("semantic_decontam", lambda: similarity.semantic_contamination(
        corpus_e, bench_e, threshold=0.35)
        .write.format("noop").mode("overwrite").save())
    run("semantic_decontam_ann", lambda: (
        similarity.semantic_contamination_bucketed(
            corpus_e, bench_e, threshold=0.35, n_planes=4, n_tables=12)
        .write.format("noop").mode("overwrite").save()))

    # incremental decontam: standing gram index from a fixed bench slice,
    # batch = a sliced shifted id range (cost must track the BATCH)
    bench_d = docs.filter(F.col("doc_id") < 50)
    standing = (
        dedup.shingle_rows(bench_d, "doc_id", "text", k=5, unit="word")
        .select("sh").distinct().localCheckpoint(eager=False)
    )
    batch = docs.filter(F.col("doc_id") % 10 == 5).select(
        (F.col("doc_id") + 500000).alias("doc_id"), "text"
    )
    run("incremental_decontam", lambda: decontam.ngram_contamination(
        batch, None, grams=standing)
        .write.format("noop").mode("overwrite").save())

    # association rules over synthetic (basket, item) rows
    n_baskets = max(rows // 50, 100)
    items = spark.range(rows // 5).select(
        F.pmod(F.xxhash64("id"), n_baskets).alias("basket"),
        F.concat(F.lit("i"), F.pmod(F.xxhash64("id", F.lit(1)), 12)).alias("item"),
    ).distinct()

    def assoc():
        supp = items.groupBy("item").agg(F.count(F.lit(1)).alias("__s"))
        a = items.select("basket", F.col("item").alias("item_a"))
        b = items.select("basket", F.col("item").alias("item_b"))
        pairs = (
            a.join(b, "basket")
            .filter(F.col("item_a") < F.col("item_b"))
            .groupBy("item_a", "item_b")
            .agg(F.count(F.lit(1)).alias("n_ab"))
        )
        (pairs
         .join(F.broadcast(supp.withColumnRenamed("item", "item_a")), "item_a")
         .write.format("noop").mode("overwrite").save())

    run("assoc_rules", assoc)

    # dedup decision manifest: exact-Jaccard prefix-filter join -> CC ->
    # golden records -> per-doc keep/drop (the full b24 composite)
    mutated = docs.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 10_000_000).alias("doc_id"),
        F.concat("text", F.lit(" zzz")).alias("text"),
    )
    corpus_d = docs.unionByName(mutated)

    def manifest():
        pairs = dedup.set_similarity_join(
            corpus_d, "doc_id", "text", threshold=0.8
        )
        labels = dedup.dup_clusters(pairs).localCheckpoint(eager=False)
        golden = dedup.golden_records(
            corpus_d, labels, "doc_id", {"text": ("longest", "text")}
        )
        n_tok = F.size(F.split(dedup.normalize_text("text"), " "))
        gtok = golden.select(
            F.col("cluster_id").alias("__cid"), n_tok.alias("__nt")
        )
        (labels.select("doc_id", "cluster_id")
         .join(F.broadcast(gtok), F.col("cluster_id") == F.col("__cid"))
         .select(
             "doc_id",
             F.when(F.col("doc_id") != F.col("cluster_id"), F.lit("drop"))
             .when(F.col("__nt") >= 10, F.lit("keep"))
             .otherwise(F.lit("drop"))
             .alias("decision"),
         )
         .write.format("noop").mode("overwrite").save())

    run("dedup_manifest", manifest)

    # RFM quintiles via the r8 two-phase distributed ntile (3 range
    # shuffles of the per-user relation — the step that was a
    # single-partition window before)
    ev2 = spark.range(rows).select(
        F.col("id").alias("event_id"),
        F.pmod(F.xxhash64("id"), max(rows // 100, 100)).alias("user_id"),
        F.timestamp_seconds(
            F.lit(1700000000) + F.pmod(F.xxhash64("id", F.lit(1)), 30 * 86400)
        ).alias("ts"),
        (F.pmod(F.xxhash64("id", F.lit(2)), 10000) / 100.0).alias("value"),
    )
    run("rfm_ntile", lambda: derive.rfm_segments(ev2)
        .write.format("noop").mode("overwrite").save())

    # per-source KL over the full vocab x sources grid
    docs_src = docs.withColumn(
        "source", F.concat(F.lit("s"), F.pmod(F.xxhash64("doc_id"), 20))
    )

    def source_kl():
        toks = docs_src.select(
            "source", F.explode(textops.tokens("text")).alias("tok")
        ).filter(F.col("tok") != "")
        st = toks.groupBy("source", "tok").agg(F.count(F.lit(1)).alias("nst"))
        ct = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("nt"))
        stot = toks.groupBy("source").agg(F.count(F.lit(1)).alias("ns"))
        gtot = toks.agg(
            F.count(F.lit(1)).alias("n"), F.countDistinct("tok").alias("v")
        )
        grid = ct.crossJoin(F.broadcast(stot))
        cells = grid.join(st, ["source", "tok"], "left").crossJoin(
            F.broadcast(gtot)
        )
        p = (F.coalesce(F.col("nst"), F.lit(0)) + 1) / (
            F.col("ns") + F.col("v")
        )
        q = (F.col("nt") + 1) / (F.col("n") + F.col("v"))
        (cells.select(
            "source", F.floor(p * F.log(p / q) * 1e8).cast("long").alias("t8"))
         .groupBy("source").agg(F.sum("t8").alias("kl8"))
         .write.format("noop").mode("overwrite").save())

    run("source_kl", source_kl)

    # positional phrase retrieval: adjacency join over filtered postings
    def phrase():
        pos = docs.select(
            "doc_id", F.posexplode(textops.tokens("text")).alias("pos", "tok")
        ).filter(F.col("tok").isin("w001", "w002"))
        a = pos.filter(F.col("tok") == "w001").select("doc_id", F.col("pos").alias("p"))
        b = pos.filter(F.col("tok") == "w002").select(
            "doc_id", (F.col("pos") - 1).alias("p")
        )
        (a.join(b, ["doc_id", "p"]).groupBy("doc_id")
         .agg(F.count(F.lit(1)).alias("n"))
         .write.format("noop").mode("overwrite").save())

    run("phrase_search", phrase)

    # delta-rule join-view maintenance: |batch| deltas vs full snapshots
    a_tab = spark.range(rows // 4).select(
        F.col("id").alias("apk"),
        F.pmod(F.xxhash64("id"), rows // 40).alias("jk"),
        (F.pmod(F.xxhash64("id", F.lit(1)), 1000) / 10.0).alias("av"),
    )
    b_tab = spark.range(rows // 40).select(
        F.col("id").alias("jk"),
        F.pmod(F.xxhash64("id", F.lit(2)), 7).alias("bv"),
    )

    def join_view():
        view = a_tab.join(b_tab, "jk")
        a_del = a_tab.filter(F.col("apk") % 50 == 0)
        a_ins = a_del.withColumn("av", F.col("av") + 1.0)
        (derive.incremental_join_view(
            view, a_tab, b_tab, "jk", a_inserts=a_ins, a_deletes=a_del)
         .write.format("noop").mode("overwrite").save())

    run("join_view", join_view)
    return out


def r9_ops(spark, docs_path: str, rows: int) -> dict[str, float]:
    """Round-9-wave families with genuinely NEW scale shapes: the
    prefix-dup block-key equi-join, the CMS build (stream contracts to
    |users| before the 4-row explode), the degree-capped wedge join
    behind link prediction (wedges = parts × C(min(deg,64),2) — linear
    in parts once the cap binds), the JL 64→16 projection + probe
    scoring, and the histogram-sketch build+merge. Hashes here are the
    production xxhash64 forms (same plan shapes as the oracled md5
    queries)."""
    docs = spark.read.parquet(docs_path)
    out: dict[str, float] = {}

    def run(name, fn):
        out[name] = _best_of(fn)

    # prefix-dup screen: planted truncations, 24-char block-key equi-join
    planted = docs.filter(
        (F.col("doc_id") % 9 == 3) & (F.length("text") >= 120)
    ).select(
        (F.col("doc_id") + F.lit(40_000_000)).alias("doc_id"),
        F.expr(
            "substring(text, 1, CAST(length(text) * 3 AS INT) div 5)"
        ).alias("text"),
    )
    corpus = docs.select("doc_id", "text").unionByName(planted)
    keyed = corpus.select(
        "doc_id",
        "text",
        F.length("text").alias("len"),
        F.substring("text", 1, 24).alias("k"),
    )

    def prefix_dups():
        a = keyed.select(
            F.col("doc_id").alias("sid"),
            F.col("text").alias("st"),
            F.col("len").alias("sl"),
            "k",
        )
        b = keyed.select(
            F.col("doc_id").alias("lid"),
            F.col("text").alias("lt"),
            F.col("len").alias("ll"),
            "k",
        )
        a.join(b, "k").filter(
            (F.col("sl") < F.col("ll"))
            & (F.expr("substring(lt, 1, CAST(sl AS INT))") == F.col("st"))
        ).select("sid", "lid").write.format("noop").mode("overwrite").save()

    run("prefix_dup_join", prefix_dups)

    # CMS: per-user contraction FIRST, then 4x64 counters + top-10 readback
    n_users = max(rows // 50, 100)
    ev = spark.range(rows).select(
        F.pmod(F.xxhash64("id"), n_users).alias("user_id")
    )

    def cms_build():
        per_user = ev.groupBy("user_id").agg(
            F.count(F.lit(1)).cast("long").alias("n")
        )
        hashed = per_user.select(
            "user_id",
            "n",
            *[
                F.pmod(F.xxhash64("user_id", F.lit(i)), 64).alias(f"b{i}")
                for i in range(4)
            ],
        )
        counters = (
            hashed.selectExpr(
                "n", "stack(4, 0, b0, 1, b1, 2, b2, 3, b3) AS (r, b)"
            )
            .groupBy("r", "b")
            .agg(F.sum("n").alias("cnt"))
        )
        cand = hashed.orderBy(F.col("n").desc(), F.col("user_id")).limit(10)
        cand.selectExpr(
            "user_id", "n", "stack(4, 0, b0, 1, b1, 2, b2, 3, b3) AS (r, b)"
        ).join(F.broadcast(counters), ["r", "b"]).groupBy("user_id", "n").agg(
            F.min("cnt").alias("est")
        ).write.format("noop").mode("overwrite").save()

    run("cms_build", cms_build)

    # degree-capped wedge join (link prediction): ~50 suppliers/part,
    # cap 64 — wedge count tracks parts, i.e. stays linear in rows
    n_parts = max(rows // 200, 100)
    edges = (
        spark.range(rows // 4)
        .select(
            F.pmod(F.xxhash64("id"), n_parts).alias("p"),
            F.pmod(F.xxhash64("id", F.lit(7)), 400).alias("s"),
        )
        .distinct()
    )

    def wedge_lp():
        pdeg = edges.groupBy("p").agg(F.count(F.lit(1)).alias("pd"))
        capped = edges.join(
            pdeg.filter(F.col("pd") <= 64).select("p"), "p"
        )
        a = capped.select("p", F.col("s").alias("s1"))
        b = capped.select("p", F.col("s").alias("s2"))
        a.join(b, "p").filter(F.col("s1") < F.col("s2")).groupBy(
            "s1", "s2"
        ).agg(F.count(F.lit(1)).alias("n_shared")).write.format(
            "noop"
        ).mode("overwrite").save()

    run("wedge_link_prediction", wedge_lp)

    # JL 64->16 sign projection + 4-probe scoring, integer plan shape
    n_vecs = max(rows // 20, 1000)
    quant = spark.range(n_vecs * 64).select(
        (F.col("id") / 64).cast("long").alias("vid"),
        F.pmod(F.col("id"), 64).cast("int").alias("j"),
        F.pmod(F.xxhash64("id"), 2000).alias("q"),
    )
    signs = spark.range(64 * 16).select(
        (F.col("id") / 16).cast("int").alias("j"),
        F.pmod(F.col("id"), 16).cast("int").alias("kk"),
        (F.pmod(F.xxhash64("id"), 2) * 2 - 1).alias("s"),
    )

    def jl_project():
        proj = (
            quant.join(F.broadcast(signs), "j")
            .groupBy("vid", "kk")
            .agg(F.sum(F.col("s") * F.col("q")).alias("p"))
        )
        probes = proj.filter(F.col("vid") < 4).select(
            F.col("vid").alias("qid"), "kk", F.col("p").alias("qp")
        )
        proj.join(F.broadcast(probes), "kk").filter(
            F.col("vid") != F.col("qid")
        ).groupBy("qid", "vid").agg(
            F.sum(F.col("qp") * F.col("p")).alias("dot")
        ).write.format("noop").mode("overwrite").save()

    run("jl_projection", jl_project)

    # histogram sketch build + standing-sketch merge (the incremental leg)
    vals = spark.range(rows).select(
        F.pmod(F.col("id"), 5).cast("string").alias("scope"),
        F.pmod(F.xxhash64("id"), 1_000_000).alias("vm"),
    )

    def sketch_merge():
        sk = derive.histogram_sketch(vals, "scope", "vm", 0, 1_000_000)
        derive.merge_histogram_sketches(sk, sk).write.format("noop").mode(
            "overwrite"
        ).save()

    run("histogram_sketch", sketch_merge)
    return out


def r10_ops(spark, docs_path: str, rows: int) -> dict[str, float]:
    """Round-10-wave families with genuinely NEW scale shapes: the
    span-duplication screen (fingerprint rows → fp-keyed distinct-doc
    agg joined back — linear, no pairwise join), MOSS winnowing
    (two doc-keyed window passes + the sequence-explode argmin
    equi-join), ViT patchify (mapInPandas reshape-sum, rows-out ∝
    pixels/patch_area), and audio pair-average decimation. The other
    r10 queries reuse already-smoked shapes (partitioned top-k windows,
    pagerank's join+agg loop, TakeOrdered)."""
    from sqlite_cdc_spark.pipeline import multimodal
    from sqlite_cdc_spark.pipeline import text as textops2

    docs = spark.read.parquet(docs_path)
    out: dict[str, float] = {}

    def run(name, fn):
        out[name] = _best_of(fn)

    def span_dups():
        fps = textops2.fingerprint_rows(docs, "doc_id", "text", 16, 8)
        shared = fps.groupBy("fp").agg(
            F.count_distinct("doc_id").alias("nd")
        )
        fps.join(shared.hint("shuffle_hash"), "fp").groupBy("doc_id").agg(
            F.count(F.lit(1)).alias("w"),
            F.sum(F.when(F.col("nd") >= 2, 1).otherwise(0)).alias("d"),
        ).write.format("noop").mode("overwrite").save()

    run("span_dups", span_dups)
    run("winnowing", lambda: textops2.winnowed_fingerprints(
        docs, "doc_id", k=3, window=4)
        .write.format("noop").mode("overwrite").save())
    ids = docs.select("doc_id")
    run("image_patchify", lambda: multimodal.image_patches(
        multimodal.synth_ppm(ids), patch_h=2, patch_w=2)
        .write.format("noop").mode("overwrite").save())
    run("audio_decimate", lambda: multimodal.audio_decimate(
        multimodal.synth_pcm(ids))
        .write.format("noop").mode("overwrite").save())
    return out


def r11_ops(spark, docs_path: str, rows: int) -> dict[str, float]:
    """Round-11 families (VERDICT r10 items 4+7): the winnowing PAIR
    SCREEN — previously only the selection kernel was smoked — with its
    hot-fingerprint cap (df<=64) over a corpus with planted near-dups
    (the same %7 mutation the oracled query uses), and the winnowing
    DENSITY property asserted at scale: expected selection density is
    2/(w+1) (Schleimer et al. §4); drift here would silently inflate
    the pair screen's input, so the smoke FAILS outside the band
    instead of just timing it."""
    from sqlite_cdc_spark.pipeline import text as textops2

    docs = spark.read.parquet(docs_path)
    out: dict[str, float] = {}

    def run(name, fn):
        out[name] = _best_of(fn)

    mutated = docs.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + F.lit(50_000_000)).alias("doc_id"),
        F.concat("text", F.lit(" zzz")).alias("text"),
    )
    corpus = docs.select("doc_id", "text").unionByName(mutated)

    def winnow_pairs():
        sel = textops2.winnowed_fingerprints(corpus, "doc_id", k=3, window=4)
        textops2.winnow_pair_screen(
            sel, "doc_id", min_shared=2, max_df=64
        ).write.format("noop").mode("overwrite").save()

    run("winnow_pair_screen", winnow_pairs)

    # density property: selections / grams must sit in the 2/(w+1) band.
    # Docs are 30 tokens -> 28 3-grams, 25 full windows; w=4 => expected
    # 0.4. A generous +-25% band catches a selection-rule regression
    # (e.g. tie-break flip to leftmost, off-by-one window width) without
    # flaking on vocabulary-collision noise.
    n_docs = docs.count()
    sel = textops2.winnowed_fingerprints(docs, "doc_id", k=3, window=4)
    density = sel.count() / float(n_docs * 28)
    out["winnow_density"] = round(density, 4)
    assert 0.30 <= density <= 0.50, (
        f"winnowing selection density {density:.4f} outside the "
        f"2/(w+1)=0.4 band — selection rule drifted"
    )
    return out


def r12_ops(spark, docs_path: str, rows: int) -> dict[str, float]:
    """Round-12 families with genuinely NEW scale shapes: the Yannakakis
    two-pass semi-join reducer (key-only traffic), the deterministic
    global-shuffle permutation (the board's one deliberate range-
    partition sort), the 33-way permutation-test explode agg, 3-round
    label propagation (iterative keyed join + bounded argmax), greedy
    k-center (k narrow scans + limit-1 readbacks), and the gated-PCM
    VAD decode. partition_skew / mann_kendall / changepoint /
    pareto_frontier are keyed-agg + bounded-window shapes the base ops
    already smoke; corpus_v9 composes kernels smoked individually
    (the dedup_manifest precedent)."""
    from sqlite_cdc_spark.pipeline import multimodal, similarity
    from sqlite_cdc_spark.pipeline.dedup import portable_hash60

    out: dict[str, float] = {}

    def run(name, fn):
        out[name] = _best_of(fn)

    docs = spark.read.parquet(docs_path)

    # Yannakakis reducer: fact + two derived "dims", forward then
    # backward semi passes, count only (key-only traffic end to end)
    fact = spark.range(rows).select(
        (F.col("id") / 4).cast("long").alias("okey"),
        F.pmod(F.xxhash64("id"), 1000).alias("skey"),
    )
    orders = fact.select("okey").distinct().filter(F.col("okey") % 3 == 0)
    supp = spark.range(1000).select(F.col("id").alias("skey")).filter(
        F.col("skey") % 2 == 0
    )

    def semijoin_program():
        f1 = fact.join(orders, "okey", "semi")
        f2 = f1.join(supp, "skey", "semi")
        o2 = orders.join(f2, "okey", "semi")
        s2 = supp.join(f2, "skey", "semi")
        o2.unionByName(s2.select(F.col("skey").alias("okey"))).write.format(
            "noop"
        ).mode("overwrite").save()

    run("semijoin_program", semijoin_program)

    def global_shuffle():
        # two-phase distributed rank — mirrors b26_global_shuffle (the
        # naive global row_number serializes the corpus in ONE task)
        pos = derive.distributed_row_number(
            docs.withColumn(
                "__h", portable_hash60(F.col("doc_id").cast("string"))
            ),
            [],
            [F.col("__h").asc(), F.col("doc_id").asc()],
            out_col="p",
        )
        pos.groupBy(F.expr("(p - 1) * 10 div " + str(rows))).agg(
            F.count(F.lit(1))
        ).write.format("noop").mode("overwrite").save()

    run("global_shuffle", global_shuffle)

    ev = spark.range(rows // 4).select(
        F.col("id").alias("event_id"),
        F.concat(F.lit("t"), F.pmod(F.col("id"), 5)).alias("etype"),
        F.pmod(F.xxhash64("id"), 100000).alias("v"),
        F.pmod(F.col("id"), 2).alias("s0"),
    )

    def permutation_fdr():
        perms = ev.select(
            "etype",
            F.explode(F.sequence(F.lit(0), F.lit(32))).alias("b"),
            "event_id",
            "v",
            "s0",
        ).select(
            "etype",
            "b",
            (
                F.when(F.col("b") == 0, 1 - 2 * F.col("s0")).otherwise(
                    1
                    - 2
                    * F.pmod(
                        F.xxhash64(
                            (F.col("event_id") * 33 + F.col("b")).cast(
                                "string"
                            )
                        ),
                        F.lit(2),
                    )
                )
                * F.col("v")
            ).alias("sv"),
        )
        perms.groupBy("etype", "b").agg(
            F.abs(F.sum("sv")).alias("t")
        ).write.format("noop").mode("overwrite").save()

    run("permutation_fdr", permutation_fdr)

    ed = fact.select(
        F.col("okey").alias("src"), (F.col("skey") + 10_000_000).alias("dst")
    ).distinct()
    edges = ed.unionByName(
        ed.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )

    def lpa():
        derive.label_propagation(edges, iters=3).groupBy("label").agg(
            F.count(F.lit(1))
        ).write.format("noop").mode("overwrite").save()

    run("label_propagation", lpa)

    emb = spark.range(rows // 40).select(
        F.col("id").alias("vec_id"),
        F.array(
            *[
                (F.pmod(F.xxhash64("id", F.lit(i)), 2000) / 1000.0 - 1.0)
                for i in range(16)
            ]
        ).alias("embedding"),
    )

    def kcenter():
        similarity.kcenter_greedy(emb, k=8).write.format("noop").mode(
            "overwrite"
        ).save()

    run("kcenter_greedy", kcenter)

    ids = docs.select("doc_id")

    def audio_vad():
        multimodal.audio_vad(
            multimodal.synth_pcm_gated(ids)
        ).write.format("noop").mode("overwrite").save()

    run("audio_vad", audio_vad)
    return out


def r13_ops(spark, docs_path: str, rows: int) -> dict[str, float]:
    """Round-13 families with genuinely NEW scale shapes: fixed-round
    k-core peeling and Bellman-Ford (iterative keyed joins with
    per-round checkpoints), the SymSpell delete-expansion equi-join,
    the audio-fingerprint decode + df-capped landmark pair screen, MMR
    re-ranking (k narrow scans + limit-1 readbacks, the kcenter
    shape), the browse-funnel applyInPandas state machine, the
    mapInArrow telemetry pass, and PPS systematic selection (two-phase
    prefix sum). anova / dict_encoding / watermark_audit are keyed-agg
    shapes the base ops smoke; radius search rides the smoked LSH
    banding; neighborhood-jaccard / diversified-topk / rle ride the
    smoked df-capped pair and bucket-window shapes."""
    from sqlite_cdc_spark.pipeline import multimodal, sampling, similarity
    from sqlite_cdc_spark.pipeline import stateful
    from sqlite_cdc_spark.pipeline.text import normalize_text

    out: dict[str, float] = {}

    def run(name, fn):
        out[name] = _best_of(fn)

    docs = spark.read.parquet(docs_path)
    n_nodes = max(rows // 20, 100)
    edges = spark.range(rows // 2).select(
        F.pmod(F.col("id"), n_nodes).alias("src"),
        F.pmod(F.xxhash64("id"), n_nodes).alias("dst"),
    )

    def kcore():
        derive.kcore_peel(edges, k=3, rounds=2).write.format("noop").mode(
            "overwrite"
        ).save()

    run("kcore", kcore)

    def bellman_ford():
        # the heavy part is the edge contraction; the relax loop runs on
        # the bounded 50-node relation (mirrors the nation graph build)
        e50 = (
            spark.range(rows)
            .select(
                F.pmod(F.col("id"), 50).alias("src"),
                F.pmod(F.xxhash64("id"), 50).alias("dst"),
                F.pmod(F.xxhash64("id", F.lit(1)), 100).alias("w"),
            )
            .filter(F.col("src") != F.col("dst"))
            .groupBy("src", "dst")
            .agg(F.min("w").cast("long").alias("w"))
        )
        derive.bellman_ford(e50, source=0, rounds=4).write.format(
            "noop"
        ).mode("overwrite").save()

    run("bellman_ford", bellman_ford)

    def symspell():
        toks = docs.select(
            F.explode(F.split(normalize_text("text"), " ")).alias("term")
        ).filter(F.length("term") >= 4)
        vocab = (
            toks.groupBy("term")
            .agg(F.count(F.lit(1)).cast("long").alias("freq"))
            .filter(F.col("freq") >= 2)
            .localCheckpoint()
        )
        deletes = F.array_distinct(
            F.concat(
                F.array(F.col("term")),
                F.expr(
                    "transform(sequence(1, length(term)),"
                    " i -> concat(substring(term, 1, i - 1),"
                    " substring(term, i + 1, length(term))))"
                ),
            )
        )
        dv = vocab.select("term", "freq", F.explode(deletes).alias("v"))
        qv = (
            vocab.filter((F.col("freq") >= 5) & (F.length("term") >= 5))
            .select(
                F.col("term").alias("qt"),
                F.explode(deletes).alias("v"),
            )
        )
        (
            qv.join(dv, "v")
            .filter(F.levenshtein(F.col("qt"), F.col("term")) <= 1)
            .groupBy("qt")
            .agg(F.count(F.lit(1)))
            .write.format("noop")
            .mode("overwrite")
            .save()
        )

    run("symspell", symspell)

    def audio_fingerprint():
        orig = multimodal.pcm_from_text(docs).localCheckpoint()
        mut = multimodal.scale_pcm(orig, 3).select(
            (F.col("doc_id") + 10_000_000).alias("doc_id"), "payload"
        )
        lm13 = multimodal.audio_fingerprints(
            orig.unionByName(mut), frame=8
        ).localCheckpoint()
        bc = lm13.groupBy("pos", "shingle").agg(
            F.count(F.lit(1)).alias("__df")
        )
        capped = lm13.join(
            bc.filter(F.col("__df") <= 64).select("pos", "shingle"),
            ["pos", "shingle"],
        )
        a = capped.select("pos", "shingle", F.col("doc_id").alias("a"))
        b = capped.select("pos", "shingle", F.col("doc_id").alias("b"))
        (
            a.join(b, ["pos", "shingle"])
            .filter(F.col("a") < F.col("b"))
            .groupBy("a", "b")
            .agg(F.count(F.lit(1)).alias("n"))
            .filter(F.col("n") >= 8)
            .write.format("noop")
            .mode("overwrite")
            .save()
        )

    run("audio_fingerprint", audio_fingerprint)

    vecs = spark.range(rows // 100).select(
        F.col("id").alias("vec_id"),
        F.expr(
            "transform(sequence(1, 16),"
            " i -> cast(pmod(xxhash64(id, i), 1000) as double) / 1000.0)"
        ).alias("embedding"),
    )

    def mmr():
        similarity.mmr_rerank(vecs, query_id=0, k=8).write.format(
            "noop"
        ).mode("overwrite").save()

    run("mmr_rerank", mmr)

    ev13 = spark.range(rows // 4).select(
        F.col("id").alias("event_id"),
        F.pmod(F.col("id"), max(rows // 400, 10)).alias("user_id"),
        F.col("id").cast("timestamp").alias("ts"),
        F.element_at(
            F.array(
                F.lit("click"), F.lit("view"), F.lit("purchase"),
                F.lit("error"), F.lit("signup"),
            ),
            (F.pmod(F.xxhash64("id"), 5) + 1).cast("int"),
        ).alias("event_type"),
    )

    def stateful_udf():
        stateful.browse_funnel_batch(ev13).write.format("noop").mode(
            "overwrite"
        ).save()

    run("stateful_udf", stateful_udf)

    def map_in_arrow():
        import pyarrow as pa
        import pyarrow.compute as pc

        def kernel(batches):
            for b in batches:
                t = b.column("text")
                yield pa.RecordBatch.from_arrays(
                    [
                        b.column("doc_id"),
                        pc.cast(pc.utf8_length(t), pa.int64()),
                        pc.cast(pc.count_substring(t, " "), pa.int64()),
                    ],
                    names=["doc_id", "n_chars", "n_spaces"],
                )

        docs.select("doc_id", "text").mapInArrow(
            kernel, "doc_id long, n_chars long, n_spaces long"
        ).write.format("noop").mode("overwrite").save()

    run("map_in_arrow", map_in_arrow)

    def pps():
        sampling.pps_systematic(
            docs.select("doc_id", F.length("text").alias("w")),
            "w",
            1000,
            [F.col("doc_id").asc()],
        ).write.format("noop").mode("overwrite").save()

    run("pps_systematic", pps)

    return out



def r14_ops(spark, path: str, rows: int) -> dict[str, float]:
    """Round-14 scale shapes: the streaming-compaction cost model
    (keyed liveness deltas + two distributed prefix sums over the
    epoch grid), its 4-point cadence sweep, the limit-pushdown audit
    (double pruned scan + TakeOrderedAndProject + 32-row joins), and
    MMR with the rel-topN prefilter (the bounded-candidate production
    shape — pick cost is O(k*N), so wall time should be ~flat in
    corpus size, unlike the corpus-wide mmr_rerank smoke)."""
    from sqlite_cdc_spark.pipeline import similarity

    out: dict[str, float] = {}

    def run(name, fn):
        out[name] = _best_of(fn)

    n_keys = max(rows // 40, 100)
    changes = spark.range(rows // 2).select(
        F.col("id"),
        F.element_at(
            F.array(
                F.lit("INSERT"), F.lit("UPDATE"),
                F.lit("UPDATE"), F.lit("DELETE"),
            ),
            (F.pmod(F.xxhash64("id"), 4) + 1).cast("int"),
        ).alias("operation"),
        F.pmod(F.xxhash64("id", F.lit(7)), n_keys).alias("k"),
    )
    epoch = max(rows // 200, 10)

    def compaction_cost():
        derive.compaction_cost(
            changes, F.col("k"), epoch_size=epoch
        ).write.format("noop").mode("overwrite").save()

    run("compaction_cost", compaction_cost)

    def compaction_cadence():
        ch = changes.localCheckpoint()
        legs = []
        for w in (epoch, epoch * 2, epoch * 4):
            ep = derive.compaction_cost(ch, F.col("k"), epoch_size=w)
            legs.append(
                ep.agg(
                    F.lit(w).cast("long").alias("epoch_size"),
                    F.sum("rows_read").cast("long").alias("total_rows_read"),
                    F.max_by("live_at_end", "epoch").cast("long").alias("final_live"),
                )
            )
        outd = legs[0]
        for leg in legs[1:]:
            outd = outd.unionByName(leg)
        outd.write.format("noop").mode("overwrite").save()

    run("compaction_cadence", compaction_cadence)

    li = spark.read.parquet(path)
    from sqlite_cdc_spark.pipeline.dedup import portable_hash60

    def limit_pushdown_audit():
        keyed = li.select(
            F.col("l_extendedprice").alias("p"),
            "l_orderkey",
            "l_linenumber",
        ).withColumn(
            "bucket",
            F.pmod(
                portable_hash60(F.concat_ws("|", "l_orderkey", "l_linenumber")),
                F.lit(32),
            ),
        )
        winners = keyed.orderBy(
            F.col("p").desc(), F.col("l_orderkey"), F.col("l_linenumber")
        ).limit(100)
        pb = keyed.groupBy("bucket").agg(F.count(F.lit(1)).alias("n_rows"))
        wb = winners.groupBy("bucket").agg(F.count(F.lit(1)).alias("n_winners"))
        pb.join(F.broadcast(wb), "bucket", "left").write.format("noop").mode(
            "overwrite"
        ).save()

    run("limit_pushdown_audit", limit_pushdown_audit)

    vecs14 = spark.range(rows // 100).select(
        F.col("id").alias("vec_id"),
        F.expr(
            "transform(sequence(1, 16),"
            " i -> cast(pmod(xxhash64(id, i), 1000) as double) / 1000.0)"
        ).alias("embedding"),
    )

    def mmr_topn():
        similarity.mmr_rerank(
            vecs14, query_id=0, k=8, topn=50
        ).write.format("noop").mode("overwrite").save()

    run("mmr_topn", mmr_topn)

    return out


def r15_ops(spark, path: str, dpath: str, rows: int) -> dict[str, float]:
    """Round-15 scale shapes: the degraded-replay source audit (keyed
    lag window + pure aggregation — gap math never sorts globally),
    the pushdown-audit scan fan (5 pruned pushed scans + counts), the
    KMV incremental-distinct view (distinct + keyed bottom-k window —
    view state k*groups), and the shingle-set fingerprint screen (the
    heavy one: shingle pass + per-doc sorted-set md5, agg state
    bounded by DOC length so it must scale with corpus size, not
    blow up per-doc)."""
    from sqlite_cdc_spark.pipeline.dedup import portable_hash60

    out: dict[str, float] = {}

    def run(name, fn):
        out[name] = _best_of(fn)

    ev = spark.range(rows // 3).select(
        F.col("id").alias("event_id"),
        (
            F.lit("2024-01-01").cast("timestamp")
            + F.make_interval(secs=F.col("id").cast("double"))
        ).alias("ts"),
        F.pmod(F.xxhash64("id", F.lit(3)), max(rows // 600, 50)).alias(
            "user_id"
        ),
    )

    def source_audit():
        src = ev.select(
            "event_id",
            F.when(
                F.col("event_id") % 97 == 3,
                F.col("ts") - F.expr("INTERVAL 1 HOUR"),
            ).otherwise(F.col("ts")).alias("ts"),
            "user_id",
        )
        replay = src.filter(F.col("event_id") % 101 != 0).unionByName(
            src.filter(F.col("event_id") % 103 == 5)
        )
        w = Window.partitionBy("user_id").orderBy("event_id")
        seq = replay.withColumn("__pts", F.lag("ts", 1).over(w))
        reg = seq.agg(
            F.sum(F.when(F.col("ts") < F.col("__pts"), 1).otherwise(0)).alias(
                "n_reg"
            )
        )
        base = replay.agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.countDistinct("event_id").alias("n_ids"),
        )
        base.crossJoin(reg).write.format("noop").mode("overwrite").save()

    run("source_audit", source_audit)

    li = spark.read.parquet(path)

    def pushdown_audit():
        legs = []
        for label, pred in (
            ("flag_in", F.col("l_returnflag").isin("A", "R")),
            ("qty_range", (F.col("l_quantity") >= 5) & (F.col("l_quantity") <= 25)),
            ("line_eq", F.col("l_linenumber") == 1),
            ("conj", F.col("l_returnflag").isin("A", "R")
                     & (F.col("l_quantity") >= 5)),
        ):
            legs.append(
                li.filter(pred)
                .agg(F.count(F.lit(1)).alias("n_match"))
                .select(F.lit(label).alias("p"), "n_match")
            )
        outd = legs[0]
        for leg in legs[1:]:
            outd = outd.unionByName(leg)
        total = li.agg(F.count(F.lit(1)).alias("n_total"))
        outd.crossJoin(F.broadcast(total)).write.format("noop").mode(
            "overwrite"
        ).save()

    run("pushdown_audit", pushdown_audit)

    def incremental_distinct():
        h = portable_hash60(F.col("user_id").cast("string")).alias("h")
        grp = F.pmod(F.col("event_id"), 6).alias("g")
        standing = (
            ev.filter(F.col("event_id") % 10 != 0).select(grp, h).distinct()
        )
        batch = ev.filter(F.col("event_id") % 10 == 0).select(grp, h).distinct()
        w = Window.partitionBy("g").orderBy(F.col("h").asc())
        st = (
            standing.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= 32)
            .select("g", "h")
        )
        merged = (
            st.unionByName(batch)
            .distinct()
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= 32)
        )
        merged.groupBy("g").agg(
            F.count(F.lit(1)).alias("k_used"), F.max("h").alias("kth")
        ).write.format("noop").mode("overwrite").save()

    run("incremental_distinct", incremental_distinct)

    docs = spark.read.parquet(dpath)

    def shingle_fingerprint():
        rows_sh = dedup.shingle_rows(docs, "doc_id", "text", k=5, unit="word")
        per_doc = (
            rows_sh.select("doc", portable_hash60(F.col("sh")).alias("h"))
            .groupBy("doc")
            .agg(
                F.md5(
                    F.concat_ws(
                        ",",
                        F.transform(
                            F.array_sort(F.collect_set("h")),
                            lambda x: x.cast("string"),
                        ),
                    )
                ).alias("fp")
            )
        )
        per_doc.groupBy("fp").agg(
            F.count(F.lit(1)).alias("n_docs"), F.min("doc").alias("canonical")
        ).filter(F.col("n_docs") >= 2).write.format("noop").mode(
            "overwrite"
        ).save()

    run("shingle_fingerprint", shingle_fingerprint)

    return out


def r16_ops(spark, path: str, rows: int) -> dict[str, float]:
    """Round-16 scale shapes: the gap-repair manifest (per-bucket keyed
    agg over the degraded replay + 1-row broadcast span — output ∝
    defective buckets), the partition-pruning scan fan (5 pruned scans
    + counts), the incremental histogram (three keyed aggs + bounded
    full-outer joins on ≤ #bins rows), and the cast-failure ledger
    (JSON render + regexp corrupt + 4-literal explode + keyed agg)."""
    out: dict[str, float] = {}

    def run(name, fn):
        out[name] = _best_of(fn)

    ev = spark.range(rows // 3).select(
        F.col("id").alias("event_id"),
        F.pmod(F.xxhash64("id", F.lit(3)), max(rows // 600, 50)).alias(
            "user_id"
        ),
        (F.pmod(F.xxhash64("id", F.lit(4)), 49000) / 100.0 + 0.01).alias(
            "value"
        ),
    )

    def gap_repair():
        replay = ev.select("event_id").filter(
            F.col("event_id") % 101 != 0
        ).unionByName(
            ev.select("event_id").filter(F.col("event_id") % 103 == 5)
        )
        bounds = replay.agg(
            F.min("event_id").alias("lo_id"), F.max("event_id").alias("hi_id")
        )
        pb = replay.groupBy(
            F.expr("event_id div 1024").alias("bucket")
        ).agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.countDistinct("event_id").alias("n_got"),
        )
        lo = F.greatest(F.col("bucket") * 1024, F.col("lo_id"))
        hi = F.least(F.col("bucket") * 1024 + 1023, F.col("hi_id"))
        pb.crossJoin(F.broadcast(bounds)).select(
            "bucket",
            (hi - lo + 1 - F.col("n_got")).alias("n_missing"),
            (F.col("n_rows") - F.col("n_got")).alias("n_dup"),
        ).filter(
            (F.col("n_missing") > 0) | (F.col("n_dup") > 0)
        ).write.format("noop").mode("overwrite").save()

    run("gap_repair_manifest", gap_repair)

    li = spark.read.parquet(path)

    def partition_pruning():
        o = li.select(
            F.year("l_shipdate").alias("y"), "l_extendedprice"
        )
        legs = []
        for label, pred in (
            ("year_eq", F.col("y") == 2023),
            ("year_in", F.col("y").isin(2023, 2024)),
            ("none", None),
        ):
            scanned = o.filter(pred) if pred is not None else o
            legs.append(
                scanned.agg(
                    F.countDistinct("y").alias("n_parts"),
                    F.count(F.lit(1)).alias("n_rows"),
                ).select(F.lit(label).alias("p"), "*")
            )
        outd = legs[0]
        for leg in legs[1:]:
            outd = outd.unionByName(leg)
        total = o.agg(F.count(F.lit(1)).alias("n_total"))
        outd.crossJoin(F.broadcast(total)).write.format("noop").mode(
            "overwrite"
        ).save()

    run("partition_pruning", partition_pruning)

    def incremental_histogram():
        b = F.floor(F.col("value") / F.lit(50.0)).alias("bin")
        q = F.floor(F.col("value") * F.lit(100.0)).cast("long")

        def hist(df, nc, sc):
            return df.groupBy(b).agg(
                F.count(F.lit(1)).alias(nc), F.sum(q).alias(sc)
            )

        st = hist(ev.filter(F.col("event_id") % 10 != 0), "ns", "ss")
        ba = hist(ev.filter(F.col("event_id") % 10 == 0), "nb", "sb")
        merged = st.join(ba, "bin", "full_outer").na.fill(0).select(
            "bin",
            (F.col("ns") + F.col("nb")).alias("nm"),
            (F.col("ss") + F.col("sb")).alias("sm"),
        )
        rec = hist(ev, "nr", "sr")
        merged.join(rec, "bin", "full_outer").select(
            "bin", (F.col("nm") == F.col("nr")).alias("ok")
        ).write.format("noop").mode("overwrite").save()

    run("incremental_histogram", incremental_histogram)

    def cast_ledger():
        img0 = F.to_json(
            F.struct(
                F.col("user_id"),
                F.lit("click").alias("event_type"),
                F.col("value"),
            )
        )
        img = F.when(
            F.col("event_id") % 13 == 0,
            F.regexp_replace(
                img0, '"value":[0-9.eE+-]+', '"value":"corrupt"'
            ),
        ).otherwise(img0)
        pairs = F.array(
            *[
                F.struct(
                    F.lit(f).alias("field"),
                    F.get_json_object(img, f"$.{f}").isNotNull().alias("p"),
                    c(F.get_json_object(img, f"$.{f}")).isNotNull().alias("ok"),
                )
                for f, c in (
                    ("user_id", lambda x: x.try_cast("bigint")),
                    ("event_type", lambda x: x),
                    ("value", lambda x: x.try_cast("double")),
                )
            ]
        )
        ev.select(F.explode(pairs).alias("x")).groupBy("x.field").agg(
            F.sum(F.col("x.p").cast("int")).alias("n_present"),
            F.sum(F.col("x.ok").cast("int")).alias("n_ok"),
        ).write.format("noop").mode("overwrite").save()

    run("cast_ledger", cast_ledger)

    return out


def r17_ops(spark, path: str, dpath: str, rows: int) -> dict[str, float]:
    """Round-17 scale shapes: the watermark-gap manifest (1-row
    broadcast span+hw onto the replay + keyed conditional distinct
    counts), two-batch compaction (two key-shuffled diffs + ONE keyed
    six-aggregate fold), top-k WITH TIES (corpus histogram groupBy +
    tiny-window threshold + broadcast-join sums), delete-aware MAX
    maintenance (three keyed histogram aggs + bounded joins), and the
    cross-mode UDF parity pass (built-in + pandas_udf + mapInArrow in
    one corpus pass)."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    out: dict[str, float] = {}

    def run(name, fn):
        out[name] = _best_of(fn)

    ev = spark.range(rows // 3).select(
        F.col("id").alias("event_id"),
        F.pmod(F.xxhash64("id", F.lit(3)), 64).alias("g"),
        (F.pmod(F.xxhash64("id", F.lit(4)), 4900000)).alias("q"),
    )

    def watermark_gap():
        replay = ev.select("event_id").filter(F.col("event_id") % 101 != 0)
        bounds = replay.agg(
            F.min("event_id").alias("lo_id"),
            F.max("event_id").alias("hi_id"),
        ).select(
            "lo_id",
            "hi_id",
            F.greatest(F.col("hi_id") - 1536, F.col("lo_id") - 1).alias("hw"),
        )
        pb = replay.crossJoin(F.broadcast(bounds)).groupBy(
            F.expr("event_id div 1024").alias("bucket")
        ).agg(
            F.countDistinct(
                F.when(F.col("event_id") <= F.col("hw"), F.col("event_id"))
            ).alias("gc"),
            F.countDistinct(
                F.when(F.col("event_id") > F.col("hw"), F.col("event_id"))
            ).alias("go"),
        )
        lo = F.greatest(F.col("bucket") * 1024, F.col("lo_id"))
        hi = F.least(F.col("bucket") * 1024 + 1023, F.col("hi_id"))
        ch = F.least(hi, F.col("hw"))
        ec = F.greatest(ch - lo + 1, F.lit(0))
        pb.crossJoin(F.broadcast(bounds)).select(
            "bucket",
            (ec - F.col("gc")).alias("n_missing_final"),
            ((hi - lo + 1) - ec - F.col("go")).alias("n_pending"),
        ).filter(
            (F.col("n_missing_final") > 0) | (F.col("n_pending") > 0)
        ).write.format("noop").mode("overwrite").save()

    run("watermark_gap", watermark_gap)

    def batch_compaction():
        k = F.col("k")
        s0 = spark.range(rows // 3).select(
            F.col("id").alias("k"), F.xxhash64("id").cast("string").alias("v")
        )
        s1 = s0.filter(k % 97 != 0).withColumn(
            "v", F.when(k % 97 == 1, F.concat("v", F.lit("x"))).otherwise(F.col("v"))
        )
        s2 = s1.filter(k % 89 != 3).withColumn(
            "v", F.when(k % 89 == 4, F.concat("v", F.lit("y"))).otherwise(F.col("v"))
        )
        d01 = derive.snapshot_diff(s0, s1, ["k"]).withColumn("batch", F.lit(0))
        d12 = derive.snapshot_diff(s1, s2, ["k"]).withColumn("batch", F.lit(1))
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
        g.select("k", net_op.alias("operation")).filter(
            F.col("operation").isNotNull()
        ).write.format("noop").mode("overwrite").save()

    run("batch_compaction", batch_compaction)

    li = spark.read.parquet(path)

    def topk_ties():
        hist = (
            li.groupBy(
                "l_returnflag", F.floor("l_quantity").cast("long").alias("v")
            )
            .agg(F.count(F.lit(1)).alias("cnt"))
            .localCheckpoint()
        )
        w = (
            Window.partitionBy("l_returnflag")
            .orderBy(F.col("v").desc())
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        th = (
            hist.withColumn(
                "n_above", F.coalesce(F.sum("cnt").over(w), F.lit(0))
            )
            .filter(F.col("n_above") < 5)
            .groupBy("l_returnflag")
            .agg(F.min("v").alias("threshold"))
        )
        hist.join(F.broadcast(th), "l_returnflag").groupBy(
            "l_returnflag", "threshold"
        ).agg(
            F.sum(F.when(F.col("v") >= F.col("threshold"), F.col("cnt"))).alias(
                "n_kept"
            )
        ).write.format("noop").mode("overwrite").save()

    run("topk_ties", topk_ties)

    def incremental_minmax():
        standing = ev.filter(F.col("event_id") % 10 != 0)
        st_max = standing.groupBy("g").agg(F.max("q").alias("state_max"))
        at = (
            standing.join(F.broadcast(st_max), "g")
            .filter(F.col("q") == F.col("state_max"))
            .groupBy("g", "state_max")
            .agg(
                F.count(F.lit(1)).alias("n_at"),
                F.sum((F.col("event_id") % 7 == 0).cast("int")).alias(
                    "del_at"
                ),
            )
        )
        ins = ev.filter(F.col("event_id") % 10 == 0).groupBy("g").agg(
            F.max("q").alias("ins_max")
        )
        at.join(ins, "g", "full_outer").na.fill(0, ["del_at"]).select(
            "g",
            F.coalesce(
                F.when(F.col("ins_max") > F.col("state_max"), F.col("ins_max")),
                F.when(F.col("n_at") - F.col("del_at") > 0, F.col("state_max")),
            ).alias("merged"),
        ).write.format("noop").mode("overwrite").save()

    run("incremental_minmax", incremental_minmax)

    docs = spark.read.parquet(dpath)

    def arrow_parity():
        d = docs.select("doc_id", F.coalesce("text", F.lit("")).alias("t"))
        nc = F.length("t")
        nt = F.when(
            nc > 0, nc - F.length(F.translate("t", " ", "")) + 1
        ).otherwise(F.lit(0))
        nd = nc - F.length(F.translate("t", "0123456789", ""))
        hb = (F.lit(1000003) * nt + F.lit(31) * nc + nd).cast("long")

        def _h_pd(s):
            s = s.fillna("")
            c = s.str.len()
            t = (s.str.count(" ") + 1).where(c > 0, 0)
            return (1000003 * t + 31 * c + s.str.count("[0-9]")).astype(
                "int64"
            )

        _h_pd.__annotations__ = {"s": pd.Series, "return": pd.Series}
        hp = F.pandas_udf(_h_pd, "long")

        def kernel(batches):
            for b in batches:
                t = b.column("t")
                c = pc.cast(pc.utf8_length(t), pa.int64())
                sp = pc.cast(pc.count_substring(t, " "), pa.int64())
                tk = pc.if_else(
                    pc.greater(c, 0), pc.add(sp, 1), pa.scalar(0, pa.int64())
                )
                dg = pc.cast(
                    pc.count_substring_regex(t, "[0-9]"), pa.int64()
                )
                h = pc.add(
                    pc.add(pc.multiply(tk, 1000003), pc.multiply(c, 31)), dg
                )
                yield pa.RecordBatch.from_arrays(
                    [b.column("h_b"), b.column("h_p"), h],
                    names=["h_b", "h_p", "h_a"],
                )

        three = d.select(
            "doc_id", "t", hb.alias("h_b"), hp("t").alias("h_p")
        ).mapInArrow(kernel, "h_b long, h_p long, h_a long")
        three.agg(
            F.sum((F.col("h_p") != F.col("h_b")).cast("int")).alias("mp"),
            F.sum((F.col("h_a") != F.col("h_b")).cast("int")).alias("ma"),
        ).write.format("noop").mode("overwrite").save()

    run("arrow_parity", arrow_parity)

    return out


def skew_ops(spark, rows: int) -> dict[str, float]:
    """Adversarial skew: 60% of the fact rows share ONE join key. Times
    the plain equi-join (AQE skew-split on) against `derive.salted_join`
    (salt=32) on the same data — the measured basis for the 'skew has an
    explicit tool' claim. Both plans produce identical aggregates
    (asserted cheap via count)."""
    fact = spark.range(rows).select(
        F.when(F.col("id") % 10 < 6, F.lit(0))
        .otherwise(F.pmod(F.xxhash64("id"), 10000))
        .alias("k"),
        (F.pmod(F.xxhash64("id", F.lit(1)), 1000) / 10.0).alias("v"),
    )
    dim = spark.range(10000).select(
        F.col("id").alias("k"), F.pmod(F.xxhash64("id"), 7).alias("grp")
    )
    out: dict[str, float] = {}

    plain = fact.join(dim, "k").groupBy("grp").agg(
        F.count(F.lit(1)).alias("n"))
    counts = []
    out["skew_plain_join"] = _best_of(
        lambda: counts.append(sum(r.n for r in plain.collect()))
    )
    salted = derive.salted_join(fact, dim, "k", salt=32).groupBy("grp").agg(
        F.count(F.lit(1)).alias("n"))
    out["skew_salted_join"] = _best_of(
        lambda: counts.append(sum(r.n for r in salted.collect()))
    )
    assert len(set(counts)) == 1, f"salted join changed results: {counts}"
    return out


def main():
    spark = get_spark("scale-smoke")
    spark.sparkContext.setLogLevel("ERROR")
    results = {}
    with tempfile.TemporaryDirectory() as tmp:
        for label, rows in (("sf0.1x", 600_000), ("sf1x", 6_000_000)):
            path = f"{tmp}/li_{label}"
            gen_lineitem(spark, rows, path)
            results[label] = ops(spark, path)
            dpath = f"{tmp}/docs_{label}"
            gen_documents(spark, rows // 10, dpath)
            results[label].update(text_ops(spark, dpath))
            results[label].update(r6_ops(spark, dpath, rows))
            results[label].update(r7_ops(spark, path, dpath, rows))
            results[label].update(r8_ops(spark, dpath, rows))
            results[label].update(r9_ops(spark, dpath, rows))
            results[label].update(r10_ops(spark, dpath, rows))
            results[label].update(r11_ops(spark, dpath, rows))
            results[label].update(r12_ops(spark, dpath, rows))
            results[label].update(r13_ops(spark, dpath, rows))
            results[label].update(r14_ops(spark, path, rows))
            results[label].update(r15_ops(spark, path, dpath, rows))
            results[label].update(r16_ops(spark, path, rows))
            results[label].update(r17_ops(spark, path, dpath, rows))
            results[label].update(skew_ops(spark, rows))
    # scaling factor per op: time ratio / data ratio (1.0 = perfectly linear)
    ratios = {}
    for op in results["sf1x"]:
        if op in ("rows", "doc_rows", "winnow_density"):
            continue  # not wall-times (winnow_density is an asserted property)
        ratios[op] = round(
            (results["sf1x"][op] / max(results["sf0.1x"][op], 1e-6)) / 10.0, 2
        )
    out = {
        "reps_per_family": SMOKE_REPS,
        "stat": "min",
        "runs": results,
        "time_ratio_over_data_ratio": ratios,
    }
    with open("SCALE_SMOKE.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
