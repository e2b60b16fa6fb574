"""Registry query functions — sampling family (split from
__spark_entry__.py; pure move)."""

# ruff: noqa: F401,F403,F405
from __future__ import annotations
from collections.abc import Callable
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from sqlite_cdc_spark import bootstrap as bs
from sqlite_cdc_spark import derive, log, meta, model
from sqlite_cdc_spark.pipeline import (
    decontam,
    dedup,
    lm,
    multimodal,
    sampling,
    similarity,
    text as textops,
)
from sqlite_cdc_spark.sources import load_table
import math as _math

from entryimpl.common import *


def q_b26_split_leakage(spark, sf_dir):
    """Dedup-aware splitting (B26 × B19): a near-dup pair straddling
    train/test is leakage — eval measures memorization. Doc-keyed split
    assignment leaks (pair endpoints hash independently); keying the
    split by CLUSTER id puts every member of a dup cluster in the same
    split, so cross-split pairs are impossible by construction. One-row
    report: leak counts under both keyings + total pairs — the
    cluster_keyed_leaks == 0 column is the design property, oracle-checked."""
    docs = _t(spark, sf_dir, "documents")
    mutated = docs.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + F.lit(200000)).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" zzz")).alias("text"),
    )
    corpus = docs.select("doc_id", "text").unionByName(mutated)
    pairs = dedup.near_dup_pairs(
        corpus, "doc_id", "text", threshold=0.8, num_hashes=32, bands=8,
        base_hash="md5",
    ).select("id_a", "id_b")
    clusters = dedup.dup_clusters(pairs).select("doc_id", "cluster_id")
    keyed = clusters.select(
        "doc_id",
        sampling.split_assign("doc_id").alias("dsp"),
        sampling.split_assign("cluster_id").alias("csp"),
    )
    a = keyed.select(
        F.col("doc_id").alias("id_a"),
        F.col("dsp").alias("da"), F.col("csp").alias("ca"),
    )
    b = keyed.select(
        F.col("doc_id").alias("id_b"),
        F.col("dsp").alias("db"), F.col("csp").alias("cb"),
    )
    return pairs.join(a, "id_a").join(b, "id_b").select(
        F.sum((F.col("da") != F.col("db")).cast("bigint")).alias("doc_keyed_leaks"),
        F.sum((F.col("ca") != F.col("cb")).cast("bigint")).alias(
            "cluster_keyed_leaks"
        ),
        F.count(F.lit(1)).alias("n_pairs"),
    )


def q_b27_sketches(spark, sf_dir):
    """Approximate sketches (rows-only: approx values are engine-specific
    by design; error bounds vs exact are asserted in unit tests). At 100 TB
    these are THE distinct/quantile operators — HLL++ and KLL-style
    sketches merge associatively so the agg stays one partial+final pass
    with tiny shuffle payloads, where exact distinct counts would shuffle
    every key."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_orderkey").alias("approx_orders"),
        F.count_distinct("l_orderkey").alias("exact_orders"),
        F.percentile_approx("l_extendedprice", 0.5, 1000).alias("p50_approx"),
        F.percentile("l_extendedprice", 0.5).alias("p50_exact"),
    )


def q_b26_cluster_kfold(spark, sf_dir):
    """Dedup-aware k-fold (B26 × B19): folds keyed by CLUSTER id (docs
    outside any cluster key on their own id), so near-duplicate documents
    can never straddle folds — the k-fold form of the split-leakage
    lesson (`b26_split_leakage`). Output: per-fold doc and cluster
    counts. Narrow fold arithmetic over the component labeling."""
    docs = _t(spark, sf_dir, "documents")
    mutated = docs.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + F.lit(200000)).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" zzz")).alias("text"),
    )
    corpus = docs.select("doc_id", "text").unionByName(mutated)
    pairs = dedup.near_dup_pairs(
        corpus, "doc_id", "text", threshold=0.8, num_hashes=32, bands=8,
        base_hash="md5",
    ).select("id_a", "id_b")
    labels = dedup.dup_clusters(pairs)
    keyed = (
        corpus.select("doc_id")
        .join(labels.select("doc_id", "cluster_id"), "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("cluster_id"), F.col("doc_id")).alias("__key"),
        )
    )
    return (
        keyed.select(
            "doc_id", sampling.hash_bucket("__key", 5).alias("fold"), "__key"
        )
        .groupBy("fold")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.countDistinct("__key").cast("bigint").alias("n_keys"),
        )
    )


def q_b26_kfold(spark, sf_dir):
    """K-fold split assignment (B26 depth): fold = deterministic hash
    bucket in [0,5) — cross-validation splits that survive repartitioning
    and replay identically on any engine; the narrow-map companion to
    train/val/test assignment (sampling.py: hash_bucket)."""
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        "lang",
        sampling.hash_bucket("doc_id", 5).alias("fold"),
    )


def q_b28_epochs(spark, sf_dir):
    """Epoch-aware mixture manifest (B28 depth): per-doc repeat counts
    hitting per-lang token budgets that may EXCEED the group size — the
    up-sampling half of data mixing (low-resource languages get >1
    epoch, the dominant language is downsampled). Integer-exact repeat
    arithmetic; totals broadcast; corpus never shuffled
    (sampling.py: epoch_mixture)."""
    docs = _t(spark, sf_dir, "documents")
    sized = docs.select(
        "doc_id", "lang", textops.token_count("text").alias("n_tok")
    )
    return sampling.epoch_mixture(
        sized,
        "lang",
        "doc_id",
        "n_tok",
        budgets={"en": 4000, "de": 20000, "zh": 15000},
    )


def q_b27_sketch_bounds(spark, sf_dir):
    """Oracle-able read of the sketch family (B27): the approx values
    themselves are engine-specific (each engine runs its own HLL/quantile
    sketch), but BOTH engines' sketches must sit within the declared
    error bounds of the exact answers — so the deterministic output is
    (exact values, within-bound booleans), and the driver row proves the
    bound holds on both engines simultaneously. Bounds are generous
    (15% distinct / 5% quantile vs ~1-3% typical error) so the booleans
    are far from the flip threshold."""
    li = _t(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_orderkey").alias("__acd"),
        F.count_distinct("l_orderkey").cast("bigint").alias("exact_orders"),
        F.percentile_approx("l_extendedprice", 0.5, 1000).alias("__ap50"),
        F.percentile("l_extendedprice", 0.5).alias("__p50"),
    )
    return agg.select(
        "l_returnflag",
        "exact_orders",
        F.round(F.col("__p50"), 6).alias("p50_exact"),
        (
            F.abs(F.col("__acd") - F.col("exact_orders"))
            <= 0.15 * F.col("exact_orders")
        ).alias("cd_within_bound"),
        (
            F.abs(F.col("__ap50") - F.col("__p50")) <= 0.05 * F.col("__p50")
        ).alias("p50_within_bound"),
    )


def q_b26_hash_sample(spark, sf_dir):
    """Deterministic keyed sampling (B26): ~10% of lineitem by order key —
    group-coherent (whole orders in or out), shuffle-free, replayable."""
    li = _t(spark, sf_dir, "lineitem")
    return sampling.sample_by_key(li, "l_orderkey", 10).select(
        "l_orderkey", "l_linenumber", "l_partkey", "l_quantity"
    )


def q_b26_train_split(spark, sf_dir):
    """Deterministic 80/10/10 train/val/test assignment per document —
    disjoint + exhaustive by construction, stable across runs/partitions."""
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", "lang", sampling.split_assign("doc_id").alias("split")
    )


def q_b26_stratified_sample(spark, sf_dir):
    """Per-language stratified sampling: downsample dominant English to
    25%, keep low-resource languages whole — corpus rebalancing as one
    narrow filter."""
    docs = _t(spark, sf_dir, "documents")
    return sampling.stratified_sample(
        docs, "doc_id", "lang", {"en": 25, "de": 100, "fr": 100}, default_rate=50
    ).select("doc_id", "lang", "source")


def q_b28_mixture(spark, sf_dir):
    """Budget-aware mixture sampling (B28 depth): downsample each language
    to a token budget with integer-exact deterministic keep rates
    (sampling.mixture_sample) — the data-mixing step of a corpus build."""
    docs = _t(spark, sf_dir, "documents")
    sized = docs.select(
        "doc_id", "lang", textops.token_count("text").alias("n_tok")
    )
    mixed = sampling.mixture_sample(
        sized, "lang", "doc_id", "n_tok",
        budgets={"en": 4000, "de": 1500}, default_budget=2000,
    )
    return mixed.select("doc_id", "lang", "n_tok")


def q_b28_training_manifest(spark, sf_dir):
    """Full training-data pipeline composed end to end (B18+B21+B26):
    quality gate → exact dedup → per-language stratified downsampling →
    deterministic train/val/test split → the manifest a trainer consumes
    (doc/token counts per split × language). Every stage is a narrow map
    or keyed shuffle; the whole plan is one job."""
    docs = _docs_with_dups(spark, sf_dir)
    feats = textops.quality_features(docs)
    gated = feats.filter(
        (F.col("quality_score") >= 0.5) & (F.col("q_tokens") >= 20)
    )
    deduped = dedup.exact_dedup(gated, ["text"], "doc_id")
    sampled = sampling.stratified_sample(
        deduped, "doc_id", "lang", {"en": 50}, default_rate=100
    )
    manifest = sampled.select(
        "*", sampling.split_assign("doc_id").alias("split")
    )
    return manifest.groupBy("split", "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("q_tokens").alias("total_tokens"),
    )


def q_b28_packing(spark, sf_dir):
    """Sequence packing for training (the op after the manifest): docs in
    doc_id order packed into 512-token budgets via a DISTRIBUTED exclusive
    prefix sum (two-phase bucket cumsum + broadcast offsets — no
    single-partition global window). Oracle: plain window cumsum."""
    docs = _t(spark, sf_dir, "documents")
    sized = docs.select(
        "doc_id", textops.token_count("text").alias("n_tok")
    )
    packed = sampling.pack_sequences(
        sized, "doc_id", "n_tok", budget=512, bucket_size=64
    )
    return packed.select("doc_id", "n_tok", "pack_id")


def q_b28_temperature(spark, sf_dir):
    """Temperature-reweighted mixture (B28 depth): α=0.5 sampling (the
    mBERT/XLM-R α-sampling rule — share ∝ total^α, flattening toward
    low-resource groups) against a 100k-char budget. sqrt is IEEE-exact
    on both engines; keep rates are integer buckets with an epsilon'd
    floor; the corpus is filtered narrowly, never shuffled
    (sampling.py: temperature_sample)."""
    docs = _t(spark, sf_dir, "documents")
    return sampling.temperature_sample(
        docs.select("doc_id", "lang", "n_chars"),
        "lang",
        "doc_id",
        "n_chars",
        total_budget=100_000,
        alpha=0.5,
    ).select("doc_id", "lang", "n_chars")


def q_b28_curriculum(spark, sf_dir):
    """Curriculum packing (B28 depth): documents quantized into quality
    deciles (phase 0 = worst … 9 = best), then token-budget packs
    assigned in phase-major order via the two-phase distributed prefix
    sum — a curriculum-ordered training manifest with NO global sort by
    the continuous score (the decile quantization is exactly the price
    of scalability; doc_id breaks ties inside a phase). Composition:
    quality_features → phase arithmetic → pack_sequences
    (sampling.py:92)."""
    docs = _t(spark, sf_dir, "documents")
    feats = textops.quality_features(docs.select("doc_id", "text"))
    staged = feats.select(
        "doc_id",
        F.col("q_tokens").alias("n_tok"),
        F.least(
            F.floor(F.col("quality_score") * 10).cast("long"), F.lit(9)
        ).alias("phase"),
    ).withColumn("okey", F.col("phase") * F.lit(10_000_000) + F.col("doc_id"))
    packed = sampling.pack_sequences(staged, "okey", "n_tok", budget=4000)
    return packed.select(
        "doc_id", "phase", F.col("pack_id").cast("bigint").alias("pack_id"), "n_tok"
    )


def q_b26_fixed_per_group(spark, sf_dir):
    """Fixed-count-per-group sampling (B26 depth): exactly 20 docs per
    language by deterministic hash priority (full 32-bit Knuth hash, not
    a coarse bucket) — the "n docs per domain" eval-carving request.
    Integer arithmetic end to end; one shuffle on the group key
    (sampling.py: sample_fixed_per_group)."""
    docs = _t(spark, sf_dir, "documents")
    return sampling.sample_fixed_per_group(
        docs.select("doc_id", "lang", "n_chars"), "lang", "doc_id", k=20
    )


def q_b26_weighted_sample(spark, sf_dir):
    """Weighted sampling WITHOUT replacement (B26 depth), exact and
    rand()-free: inclusion ∝ doc length via integer A-ES — classic
    Efraimidis–Spirakis orders by u^(1/w) (unreplayable float pow); this
    uses the identity u^(1/w) ~ max of w iid uniforms with md5-derived
    integer uniforms, so the 200-doc sample replays bit-for-bit on any
    engine. Ticket explode bounded by max_weight=32, per-item max agg,
    distributed take-ordered — no global sort (sampling.py:
    weighted_sample)."""
    docs = _t(spark, sf_dir, "documents")
    wdf = docs.select(
        "doc_id",
        (F.lit(1) + F.floor(F.length("text") / 500)).cast("bigint").alias("weight"),
    )
    return sampling.weighted_sample(wdf, "doc_id", "weight", k=200, max_weight=32).select(
        "doc_id",
        "weight",
        F.col("__priority").alias("priority"),
        F.col("rk").cast("bigint").alias("rk"),
    )


def q_b26_interleave(spark, sf_dir):
    """Deterministic round-robin source interleaving (B26/B28 depth,
    r7): assign every doc a GLOBAL training position such that sources
    alternate — the data-ordering control that stops a shard-sequential
    reader from seeing one source for an hour (ordering bias is a real
    training pathology). Zero global sort: each doc's position is pure
    arithmetic ``(rank_within_source − 1) · |S| + source_index`` from
    its per-source hash-priority rank (one keyed window) and a
    |sources|-row broadcast index. Writing the corpus
    ``repartitionByRange(pos)`` then realizes the order physically
    (storage.py). Integer-exact."""
    from pyspark.sql import Window

    from sqlite_cdc_spark.pipeline.sampling import hash_bucket

    docs = _t(spark, sf_dir, "documents").select("doc_id", "source")
    srcs = (
        docs.select("source")
        .distinct()
        .select(
            "source",
            (
                F.row_number().over(
                    Window.orderBy(F.col("source").asc())
                )
                - 1
            ).alias("__six"),
        )
    )
    n_src = srcs.agg(F.count(F.lit(1)).alias("__ns"))
    # per-source hash-priority rank via the two-phase distributed
    # row_number (r8): a keyed window would put a dominant source's
    # whole order on ONE task — the straggler this operator exists to
    # prevent in the first place
    staged = docs.withColumn("__pri", hash_bucket("doc_id", 1 << 32))
    return (
        derive.distributed_row_number(
            staged,
            ["source"],
            [F.col("__pri").asc(), F.col("doc_id").asc()],
            out_col="__r",
        )
        .join(F.broadcast(srcs), "source")
        .crossJoin(F.broadcast(n_src))
        .select(
            "doc_id",
            "source",
            ((F.col("__r") - 1) * F.col("__ns") + F.col("__six"))
            .cast("long")
            .alias("pos"),
        )
    )


def q_b26_temporal_split(spark, sf_dir):
    """Leakage-aware temporal split (B26 depth): train < Jan 28,
    embargo to Jan 30 noon, test = the last half-day, and every user
    active in test is PURGED from train (per-entity leakage, the failure random splits
    can't see). Output: per (split, event_type) counts + distinct
    users — auditing both the calendar boundary and the purge
    (sampling.py: temporal_split)."""
    ev = _t(spark, sf_dir, "events")
    split = sampling.temporal_split(
        ev, "ts", "user_id", "2024-01-28 00:00:00", "2024-01-30 12:00:00"
    )
    return split.groupBy("split", "event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.count_distinct("user_id").cast("bigint").alias("n_users"),
    )


def q_b27_linear_counting(spark, sf_dir):
    """Linear-counting distinct estimate (B27 sketch depth — the one
    sketch whose every bit replays cross-engine, giving the sketch
    family an ORACLED row beside the rows-only HLL/CMS): customer keys
    hash into an m-bit bitmap (same portable build as b7_bloom_join
    with k=1), estimate = −m·ln(z/m) with z the zero-bit count from
    integer popcounts. The row carries exact vs estimate vs relative
    error, so the driver check certifies the estimator's math AND its
    accuracy claim (derive.py: bloom_build)."""
    m_bits = 4096
    cust = _t(spark, sf_dir, "customer")
    bitmap = derive.bloom_build(
        cust.select("c_custkey"), "c_custkey", m_bits=m_bits, k_hashes=1
    )
    used = bitmap.agg(F.sum(F.bit_count("bits")).cast("long").alias("__set"))
    exact = cust.agg(
        F.count_distinct("c_custkey").cast("bigint").alias("n_exact")
    )
    z = F.lit(m_bits) - F.col("__set")
    est = F.round(
        -F.lit(float(m_bits))
        * F.log(z.cast("double") / F.lit(float(m_bits))),
        6,
    )
    return (
        exact.crossJoin(F.broadcast(used))
        .select(
            "n_exact",
            F.col("__set").alias("bits_set"),
            est.alias("estimate"),
            F.round(
                F.abs(est - F.col("n_exact")) / F.col("n_exact"), 6
            ).alias("rel_err"),
        )
    )


def q_b26_rendezvous(spark, sf_dir):
    """Rendezvous (highest-random-weight) hashing (B26 placement
    depth): every order key routes to the shard maximizing
    h(key, shard) — the consistent-placement rule behind shard
    routing, cache assignment and co-partitioned layouts. The query
    assigns keys under 5 shards AND under 6, then reports per-shard
    counts plus how many keys MOVED — certifying HRW's minimal-
    disruption property (≈ n/(N+1) keys move when a shard joins,
    vs ~all under mod-N). Portable md5 base hash + universal family,
    ties to the lowest shard id; pure narrow maps, one keyed agg."""
    from sqlite_cdc_spark.pipeline.dedup import (
        MINHASH_P,
        _hash_family,
        portable_hash60,
    )

    fam = _hash_family(6, seed=0x44C)
    orders = _t(spark, sf_dir, "orders").select("o_orderkey")
    h = F.pmod(
        portable_hash60(F.col("o_orderkey").cast("string")), F.lit(MINHASH_P)
    )

    def assign(n_shards: int):
        scored = [
            F.struct(
                (-F.pmod(h * fam[s][0] + fam[s][1], F.lit(MINHASH_P))).alias("w"),
                F.lit(s).alias("s"),
            )
            for s in range(n_shards)
        ]
        return F.array_min(F.array(*scored)).getField("s")

    routed = orders.select(
        "o_orderkey",
        assign(5).alias("shard5"),
        assign(6).alias("shard6"),
    )
    per = routed.groupBy(F.col("shard6").alias("shard")).agg(
        F.count(F.lit(1)).alias("n_keys")
    )
    moved = routed.agg(
        F.sum((F.col("shard5") != F.col("shard6")).cast("long")).alias("n_moved"),
        F.count(F.lit(1)).alias("n_total"),
    )
    return per.crossJoin(F.broadcast(moved)).select(
        "shard",
        "n_keys",
        "n_moved",
        "n_total",
        F.round(F.col("n_moved") / F.col("n_total").cast("double"), 6).alias(
            "moved_frac"
        ),
    )


def q_b28_pack_efficiency(spark, sf_dir):
    """Sequence-packing efficiency report (B28 depth, r8): per 512-token
    pack of b28_packing's manifest — doc count, token sum, fill ratio
    and the overflow flag (exclusive-cumsum packing lets a boundary doc
    spill past the budget; the report quantifies how much budget is
    actually used vs wasted, the number that prices a packing policy).
    One keyed agg over the distributed prefix-sum output."""
    docs = _t(spark, sf_dir, "documents")
    sized = docs.select(
        "doc_id", textops.token_count("text").alias("n_tok")
    )
    packed = sampling.pack_sequences(
        sized, "doc_id", "n_tok", budget=512, bucket_size=64
    )
    return packed.groupBy(F.col("pack_id").cast("bigint").alias("pack_id")).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_tok").cast("long").alias("sum_tok"),
        F.round(F.sum("n_tok") / F.lit(512.0), 6).alias("fill"),
        (F.sum("n_tok") > 512).alias("overflow"),
    )


def q_b26_exact_quota(spark, sf_dir):
    """Exact per-stratum quota sampling (B26 depth, r8): exactly
    ``min(|stratum|, quota)`` docs per language by deterministic hash
    rank — the exact-count companion to the rate-based stratified
    sampler (rates give expected counts; audits and eval sets need
    exact ones). The per-stratum rank uses the two-phase
    ``distributed_row_number``, so a dominant stratum never serializes
    through one task; output is the per-stratum audit (taken vs
    available)."""
    docs = _t(spark, sf_dir, "documents")
    staged = docs.select(
        "doc_id", "lang", sampling.hash_bucket("doc_id", 1 << 32).alias("__pri")
    )
    ranked = derive.distributed_row_number(
        staged, ["lang"], [F.col("__pri").asc(), F.col("doc_id").asc()],
        out_col="__r",
    )
    taken = ranked.filter(F.col("__r") <= 40)
    avail = staged.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_available")
    )
    return (
        taken.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_taken"),
            F.min("doc_id").cast("long").alias("first_doc"),
            F.max("doc_id").cast("long").alias("last_doc"),
        )
        .join(F.broadcast(avail), "lang")
    )


def q_b28_length_buckets(spark, sf_dir):
    """Length-bucketed batching report (B28 depth, r9): docs split into
    8 equal-count token-length tiles via the two-phase
    ``distributed_ntile`` (no single-task global window), then per
    bucket the padding waste a max-length batcher would pay
    (n·max − Σ). The report that justifies length bucketing in a
    training data loader. Integer exact."""
    docs = _t(spark, sf_dir, "documents")
    sized = docs.select(
        "doc_id", textops.token_count("text").alias("n_tok")
    )
    tiled = derive.distributed_ntile(
        sized, [F.col("n_tok").asc(), F.col("doc_id").asc()], 8,
        out_col="bucket",
    )
    return tiled.groupBy(F.col("bucket").cast("int").alias("bucket")).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.min("n_tok").cast("long").alias("min_tok"),
        F.max("n_tok").cast("long").alias("max_tok"),
        F.sum("n_tok").cast("long").alias("sum_tok"),
        (F.count(F.lit(1)) * F.max("n_tok") - F.sum("n_tok"))
        .cast("long")
        .alias("padding_waste"),
    )


def q_b27_lc_union(spark, sf_dir):
    """Mergeable-sketch union invariant (B27 depth, r9 wave 3): per
    event-type linear-counting bitmaps over user ids, then the MERGED
    (bit_or across types) bitmap — the property that makes sketches a
    100 TB tool (per-partition/per-day sketches combine without
    rescanning). Every scope row carries exact vs estimate; the
    '(all)' row's bitmap is provably the OR of the per-type bitmaps
    because OR is associative — the driver hash certifies the whole
    merge algebra since every bit replays cross-engine (the
    b27_linear_counting build, k=1, m=4096)."""
    from sqlite_cdc_spark.pipeline.dedup import (
        MINHASH_P,
        _hash_family,
        portable_hash60,
    )

    m_bits = 4096
    a, b = _hash_family(1, seed=0xB100)[0]
    ev = _t(spark, sf_dir, "events")
    pos = ev.select(
        "event_type",
        (
            F.pmod(
                F.pmod(
                    portable_hash60(F.col("user_id").cast("string")),
                    F.lit(MINHASH_P),
                )
                * a
                + b,
                F.lit(MINHASH_P),
            )
            % m_bits
        ).alias("pos"),
    )
    words = pos.select(
        "event_type",
        (F.col("pos") / 63).cast("int").alias("word"),
        F.expr(
            "shiftleft(CAST(1 AS BIGINT), CAST(pos % 63 AS INT))"
        ).alias("__bit"),
    ).groupBy("event_type", "word").agg(F.expr("bit_or(__bit)").alias("bits"))
    merged = words.groupBy("word").agg(
        F.expr("bit_or(bits)").alias("bits")
    ).select(F.lit("(all)").alias("scope"), "word", "bits")
    scoped = words.select(
        F.col("event_type").alias("scope"), "word", "bits"
    ).unionByName(merged)
    used = scoped.groupBy("scope").agg(
        F.sum(F.bit_count("bits")).cast("long").alias("bits_set")
    )
    ex = (
        ev.select(F.col("event_type").alias("scope"), "user_id")
        .unionByName(ev.select(F.lit("(all)").alias("scope"), "user_id"))
        .groupBy("scope")
        .agg(F.count_distinct("user_id").cast("long").alias("n_exact"))
    )
    est = F.round(
        -F.lit(float(m_bits))
        * F.log(
            (F.lit(m_bits) - F.col("bits_set")).cast("double")
            / F.lit(float(m_bits))
        ),
        6,
    )
    return used.join(ex, "scope").select(
        "scope",
        "bits_set",
        "n_exact",
        est.alias("estimate"),
        F.round(F.abs(est - F.col("n_exact")) / F.col("n_exact"), 6).alias(
            "rel_err"
        ),
    )


def q_b28_budget_allocation(spark, sf_dir):
    """Token-budget apportionment (B28 mixture depth, r9 wave 3):
    allocate a 1M-token budget across sources proportionally to their
    token mass with LARGEST-REMAINDER rounding — the integer-exact
    apportionment (Hamilton method) whose allocations sum EXACTLY to
    the budget, unlike naive floor/round shares. base = (B·w) div W,
    remainder rank breaks ties by source; the only windows run over
    the |sources|-row aggregate."""
    from pyspark.sql import Window

    budget = 1_000_000
    docs = _t(spark, sf_dir, "documents")
    per = docs.groupBy("source").agg(
        F.sum(textops.token_count("text")).cast("long").alias("w")
    )
    tot = per.agg(F.sum("w").cast("long").alias("__W"))
    q = per.crossJoin(F.broadcast(tot)).select(
        "source",
        "w",
        F.expr(f"(w * {budget}) div __W").alias("base"),
        F.expr(f"(w * {budget}) % __W").alias("rem"),
        "__W",
    )
    sums = q.agg(
        F.sum("base").cast("long").alias("__base_sum")
    )
    wrank = Window.orderBy(F.col("rem").desc(), F.col("source").asc())
    ranked = q.crossJoin(F.broadcast(sums)).select(
        "source",
        "w",
        "base",
        "rem",
        F.row_number().over(wrank).alias("__rk"),
        (F.lit(budget) - F.col("__base_sum")).alias("__leftover"),
    )
    alloc = F.col("base") + F.when(
        F.col("__rk") <= F.col("__leftover"), 1
    ).otherwise(0)
    return ranked.select(
        "source",
        "w",
        alloc.cast("long").alias("alloc"),
        F.round(alloc.cast("double") / F.lit(float(budget)), 6).alias(
            "alloc_share"
        ),
    )


def q_b27_hll_registers(spark, sf_dir):
    """True HyperLogLog distinct sketch (B27 depth, r9 wave 4 — the
    register-based estimator beside the bitmap-based b27_linear_counting):
    the portable 60-bit hash splits into an 8-bit register index and a
    52-bit suffix whose leading-zero rank (rho, via length(bin(w)) —
    pure integer/string ops, no float log2 at the bit boundary) feeds
    register-wise MAX. The '(all)' scope is the register-wise max-merge
    of the per-event-type sketches — max is associative, so this row IS
    the HLL mergeability invariant (per-partition sketches combine
    without rescans, the property that makes HLL the 100 TB distinct
    counter). The harmonic estimate keeps the sum EXACT: Sum 2^-r is
    computed as integer numerators 2^(53-r) (max 256*2^53 < 2^62), and
    the only float ops are one division + one multiply of identical
    doubles, floor-quantized to micros; the small-range linear-counting
    correction branch (est <= 2.5m, the Flajolet et al. rule) uses the
    established round-6 ln rule. Every register replays cross-engine,
    so the driver hash certifies the sketch construction, the merge
    algebra AND the accuracy claim."""
    from sqlite_cdc_spark.pipeline.dedup import portable_hash60

    ev = _t(spark, sf_dir, "events")
    hashed = ev.select(
        "event_type",
        portable_hash60(F.col("user_id").cast("string")).alias("__h"),
    ).select(
        "event_type",
        F.expr("__h % 256").alias("reg"),
        F.expr("__h div 256").alias("w"),
    )
    rho = F.when(F.col("w") == 0, F.lit(53)).otherwise(
        F.lit(53) - F.length(F.bin("w"))
    )
    regs = (
        hashed.select("event_type", "reg", rho.alias("rho"))
        .groupBy("event_type", "reg")
        .agg(F.max("rho").alias("r"))
    )
    merged = (
        regs.groupBy("reg")
        .agg(F.max("r").alias("r"))
        .select(F.lit("(all)").alias("scope"), "reg", "r")
    )
    scoped = regs.select(
        F.col("event_type").alias("scope"), "reg", "r"
    ).unionByName(merged)
    per = scoped.groupBy("scope").agg(
        F.count(F.lit(1)).cast("long").alias("regs_used"),
        F.sum(
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(53 - r AS INT))")
        ).cast("long").alias("__s_present"),
    )
    ex = (
        ev.select(F.col("event_type").alias("scope"), "user_id")
        .unionByName(ev.select(F.lit("(all)").alias("scope"), "user_id"))
        .groupBy("scope")
        .agg(F.count_distinct("user_id").cast("long").alias("n_exact"))
    )
    s_total = (
        F.col("__s_present")
        + (F.lit(256) - F.col("regs_used")) * F.lit(9007199254740992)
    )
    est_raw = F.lit(_HLL_ALPHA_NUM) / s_total.cast("double")
    v = F.lit(256) - F.col("regs_used")
    est_micros = F.floor(est_raw * F.lit(1e6)).cast("long")
    est_sel = F.when(
        (est_raw <= F.lit(640.0)) & (v > 0),
        F.round(
            F.lit(256.0) * F.log(F.lit(256.0) / v.cast("double")), 6
        ),
    ).otherwise(est_micros.cast("double") / F.lit(1000000.0))
    return per.join(ex, "scope").select(
        "scope",
        "n_exact",
        "regs_used",
        est_micros.alias("est_micros"),
        F.floor(
            F.abs(est_sel - F.col("n_exact"))
            / F.col("n_exact")
            * F.lit(1e6)
        ).cast("long").alias("rel_err_micros"),
    )


def q_b27_cms_heavy_hitters(spark, sf_dir):
    """Count-Min sketch heavy hitters (B27 sketch depth, r9 wave 5 —
    the frequency estimator beside HLL's distinct counter and linear
    counting's bitmap): a 4x64 CMS over per-user event counts, then the
    exact top-10 users read back THROUGH the sketch. Counters are plain
    sums → map-side combinable and mergeable across partitions without
    rescans (the 100 TB sketch property); the stream contracts to the
    |users| relation BEFORE the 4-row explode. The d hash rows come
    from the portable md5-60 family, so every counter replays
    cross-engine, and the row set certifies construction, the exact
    counts, AND the CMS one-sided-error invariant (est >= exact,
    overcount = est - exact >= 0)."""
    from sqlite_cdc_spark.pipeline.dedup import portable_hash60

    ev = _t(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    bcols = [
        (
            portable_hash60(
                F.concat(F.lit(f"{i}:"), F.col("user_id").cast("string"))
            )
            % 64
        ).alias(f"b{i}")
        for i in range(4)
    ]
    hashed = per_user.select("user_id", "n", *bcols)
    counters = (
        hashed.selectExpr(
            "n", "stack(4, 0, b0, 1, b1, 2, b2, 3, b3) AS (r, b)"
        )
        .groupBy("r", "b")
        .agg(F.sum("n").alias("cnt"))
    )
    cand = hashed.orderBy(F.col("n").desc(), F.col("user_id").asc()).limit(10)
    est = (
        cand.selectExpr(
            "user_id", "n", "stack(4, 0, b0, 1, b1, 2, b2, 3, b3) AS (r, b)"
        )
        .join(F.broadcast(counters), ["r", "b"])
        .groupBy("user_id", "n")
        .agg(F.min("cnt").cast("long").alias("cms_estimate"))
    )
    return est.select(
        "user_id",
        F.col("n").alias("n_exact"),
        "cms_estimate",
        (F.col("cms_estimate") - F.col("n")).cast("long").alias("overcount"),
    )


def q_b26_ht_estimate(spark, sf_dir):
    """Horvitz–Thompson sample estimation audit (B26 depth, r9 wave 6):
    per event type, corpus totals estimated from the deterministic
    1/16 user-hash sample with inverse-propensity weight 16, beside the
    exact totals and the integer relative error. This is the audit that
    prices cheap-sample corpus statistics at 100 TB (profile the 1/16
    slice, multiply, know the error you paid); the user-keyed sample
    reuses the b26_hash_sample predicate so sampled USERS keep all
    their events (cluster sampling, the realistic shape). Values stay
    integer micros throughout."""
    from sqlite_cdc_spark.pipeline.dedup import portable_hash60

    ev = _t(spark, sf_dir, "events").select(
        "event_type",
        "user_id",
        F.floor(F.col("value") * 1e6).cast("long").alias("__vm"),
    )
    ex = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_exact"),
        F.sum("__vm").cast("long").alias("sum_micros_exact"),
    )
    samp = ev.filter(
        portable_hash60(F.col("user_id").cast("string")) % 16 == 0
    )
    est = samp.groupBy("event_type").agg(
        (F.count(F.lit(1)) * 16).cast("long").alias("n_est"),
        (F.sum("__vm") * 16).cast("long").alias("sum_micros_est"),
    )
    return ex.join(est, "event_type").select(
        "event_type",
        "n_exact",
        "n_est",
        "sum_micros_exact",
        "sum_micros_est",
        F.expr("(abs(n_est - n_exact) * 1000000) div n_exact")
        .cast("long")
        .alias("n_err_micros"),
        F.expr(
            "(abs(sum_micros_est - sum_micros_exact) * 1000000)"
            " div sum_micros_exact"
        )
        .cast("long")
        .alias("sum_err_micros"),
    )


def q_b27_quantile_sketch(spark, sf_dir):
    """Mergeable quantile-histogram sketch (B27 sketch depth, r9 wave 6
    — the quantile member beside HLL's distinct, CMS's frequency and
    linear counting's bitmap): a 128-bucket equi-width histogram over
    integer-micro values, per event type, with the '(all)' scope
    MERGED from the per-scope sketches by bucket-count addition (sums
    merge — the property that lets per-partition histograms combine
    without rescans). For p50/p95/p99 the row carries the sketch
    bucket's exact integer value range AND the true k-th smallest
    value (k = ceil(q·n), via cross-multiplied 100·cum ≥ q·n — no
    division), so `in_bucket` certifies construction, merge algebra
    and the accuracy bound in one driver hash. Everything is integer
    arithmetic — bucketing uses `div`, never float multiply. The
    exact leg (distinct-value cumulative per scope) is the audit
    baseline; the sketch is the 100 TB path."""
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events").select(
        "event_type", F.floor(F.col("value") * 1e6).cast("long").alias("vm")
    )
    bounds = ev.agg(
        F.min("vm").alias("lo"), (F.max("vm") - F.min("vm") + 1).alias("r")
    )
    bucketed = ev.crossJoin(F.broadcast(bounds)).select(
        "event_type",
        "vm",
        F.least(F.expr("((vm - lo) * 128) div r"), F.lit(127))
        .cast("int")
        .alias("bkt"),
    )
    scope_sk = bucketed.groupBy(
        F.col("event_type").alias("scope"), "bkt"
    ).agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    all_sk = (
        scope_sk.groupBy("bkt")
        .agg(F.sum("cnt").cast("long").alias("cnt"))
        .select(F.lit("(all)").alias("scope"), "bkt", "cnt")
    )
    sk = scope_sk.unionByName(all_sk)
    ns = sk.groupBy("scope").agg(F.sum("cnt").cast("long").alias("n"))
    wcum = (
        Window.partitionBy("scope")
        .orderBy("bkt")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = sk.withColumn("cum", F.sum("cnt").over(wcum)).join(ns, "scope")
    est = cum.groupBy("scope", "n").agg(
        *[
            F.min(
                F.when(F.col("cum") * 100 >= F.lit(q) * F.col("n"), F.col("bkt"))
            ).alias(f"b{q}")
            for q in (50, 95, 99)
        ]
    )
    # exact k-th smallest per scope over the distinct-value cumulative
    scoped_vals = ev.select(
        F.col("event_type").alias("scope"), "vm"
    ).unionByName(ev.select(F.lit("(all)").alias("scope"), "vm"))
    dv = scoped_vals.groupBy("scope", "vm").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    wv = (
        Window.partitionBy("scope")
        .orderBy("vm")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    dvc = dv.withColumn("cum", F.sum("c").over(wv)).join(ns, "scope")
    exact = dvc.groupBy("scope").agg(
        *[
            F.min(
                F.when(F.col("cum") * 100 >= F.lit(q) * F.col("n"), F.col("vm"))
            ).alias(f"x{q}")
            for q in (50, 95, 99)
        ]
    )
    out = est.join(exact, "scope").crossJoin(F.broadcast(bounds))
    cols = [F.col("scope"), F.col("n")]
    for q in (50, 95, 99):
        blo = F.expr(f"lo + ((b{q} * r) + 127) div 128")
        bhi = F.expr(f"lo + (((b{q} + 1) * r) + 127) div 128 - 1")
        cols += [
            F.col(f"x{q}").alias(f"exact_p{q}"),
            blo.cast("long").alias(f"est_lo_p{q}"),
            bhi.cast("long").alias(f"est_hi_p{q}"),
            ((F.col(f"x{q}") >= blo) & (F.col(f"x{q}") <= bhi)).alias(
                f"in_bucket_p{q}"
            ),
        ]
    return out.select(*cols)


def q_b28_quality_knapsack(spark, sf_dir):
    """Greedy quality-knapsack selection (B28 depth, r10): per source,
    admit docs in descending lexical-diversity order (distinct-token
    count, doc_id tie-break — a total order) until a 20k-token budget
    is hit — the "take the best until the budget runs out" selection
    every curated-corpus build runs, distinct from rate-based mixture
    sampling (b28_mixture scales sources DOWN proportionally; the
    knapsack CUTS a ranked tail). One tokenize pass, one partitioned
    cumulative-sum window per source, one |sources|-row rollup —
    integer arithmetic until the final utilization ratio."""
    from pyspark.sql import Window

    BUDGET = 20000
    docs = _t(spark, sf_dir, "documents").select("doc_id", "source", "text")
    toks = docs.select(
        "doc_id",
        "source",
        F.size(textops.tokens("text")).cast("long").alias("__nt"),
        F.size(F.array_distinct(textops.tokens("text")))
        .cast("long")
        .alias("__nd"),
    )
    w = (
        Window.partitionBy("source")
        .orderBy(F.col("__nd").desc(), F.col("doc_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ranked = toks.withColumn("__cum", F.sum("__nt").over(w))
    kept = F.col("__cum") <= F.lit(BUDGET)
    return ranked.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.when(kept, 1).otherwise(0)).cast("long").alias("n_kept"),
        F.sum(F.when(kept, F.col("__nt")).otherwise(0))
        .cast("long")
        .alias("tokens_used"),
        F.round(
            F.sum(F.when(kept, F.col("__nt")).otherwise(0)).cast("double")
            / F.lit(float(BUDGET)),
            6,
        ).alias("utilization"),
        F.min(F.when(kept, F.col("__nd"))).cast("long").alias("cutoff_ndist"),
    )


def q_b27_kmv_sketch(spark, sf_dir):
    """KMV (k-minimum-values) distinct sketch with the merge invariant
    in-row (B27 depth, r10 — the third mergeable cardinality sketch
    beside linear counting and HLL, and the one with an UNBIASED
    estimator): per source keep the k=16 smallest distinct 60-bit text
    hashes; estimate = (k−1) / (h_k / 2^60), exact-count fallback when
    a source has fewer than k distinct values (the standard KMV rule —
    half the fixture's sources exercise it). The '__ALL__' row carries
    the mergeability proof the sketch family demands: the global kth-min
    computed by MERGING the per-source sketches (union → 16 smallest)
    must equal the kth-min computed directly over all hashes —
    an integer equality, oracled. Scale shape: one hash pass, one
    partitioned top-k window, bounded limit+agg for the global row;
    the union-of-sketches merge is exactly how 1000 executors combine."""
    K = 16
    docs = _t(spark, sf_dir, "documents").select("source", "text")
    hashes = docs.select(
        "source", dedup.portable_hash60(F.col("text")).alias("__h")
    ).distinct()
    from pyspark.sql import Window

    w = Window.partitionBy("source").orderBy(F.col("__h").asc())
    topk = hashes.withColumn("__rn", F.row_number().over(w)).filter(
        F.col("__rn") <= K
    )
    per = hashes.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_exact")
    )
    kth = topk.filter(F.col("__rn") == K).select(
        "source", F.col("__h").alias("kth_min")
    )
    est = F.when(
        F.col("kth_min").isNull(), F.col("n_exact").cast("double")
    ).otherwise(
        F.round(
            F.lit(float(K - 1))
            * F.lit(float(2**60))
            / F.col("kth_min").cast("double"),
            6,
        )
    )
    per_source = per.join(kth, "source", "left").select(
        "source",
        "n_exact",
        "kth_min",
        est.alias("est_distinct"),
        F.lit(None).cast("boolean").alias("merge_ok"),
    )
    # global row: direct 16 smallest over ALL distinct hashes vs the
    # MERGE of the per-source sketches — bounded limit+agg, no window
    allh = hashes.select("__h").distinct()
    direct = allh.orderBy(F.col("__h").asc()).limit(K).agg(
        F.max("__h").alias("kth_d"), F.count(F.lit(1)).alias("__n")
    )
    merged = (
        topk.select("__h")
        .distinct()
        .orderBy(F.col("__h").asc())
        .limit(K)
        .agg(F.max("__h").alias("kth_m"))
    )
    g = (
        allh.agg(F.count(F.lit(1)).cast("long").alias("n_exact"))
        .crossJoin(direct)
        .crossJoin(merged)
        .select(
            F.lit("__ALL__").alias("source"),
            "n_exact",
            F.col("kth_d").alias("kth_min"),
            F.round(
                F.lit(float(K - 1))
                * F.lit(float(2**60))
                / F.col("kth_d").cast("double"),
                6,
            ).alias("est_distinct"),
            (F.col("kth_d") == F.col("kth_m")).alias("merge_ok"),
        )
    )
    return per_source.unionByName(g)


def q_b26_leakage_audit(spark, sf_dir):
    """Leakage audit of a NAIVE temporal cut (B26 depth, r10 — the
    diagnosis b26_temporal_split's embargo+purge then FIXES): train
    strictly before the cut, test at-or-after, with the per-entity
    overlap read random splits can't give — per event type: row counts
    on each side, users active on BOTH sides (the entity-overlap that
    leaks future behavior into training features), and each side's
    exclusive user counts. Two filtered keyed aggs + one full-outer
    user-level merge; the cut is a literal, so pruning reaches the
    scan."""
    CUT = "2024-01-16 00:00:00"
    ev = _t(spark, sf_dir, "events").select("event_type", "ts", "user_id")
    cut = F.lit(CUT).cast("timestamp")
    per_user = ev.groupBy("event_type", "user_id").agg(
        F.sum(F.when(F.col("ts") < cut, 1).otherwise(0)).alias("__tr"),
        F.sum(F.when(F.col("ts") >= cut, 1).otherwise(0)).alias("__te"),
    )
    return per_user.groupBy("event_type").agg(
        F.sum("__tr").cast("long").alias("n_train"),
        F.sum("__te").cast("long").alias("n_test"),
        F.sum(
            F.when((F.col("__tr") > 0) & (F.col("__te") > 0), 1).otherwise(0)
        )
        .cast("long")
        .alias("users_both"),
        F.sum(
            F.when((F.col("__tr") > 0) & (F.col("__te") == 0), 1).otherwise(0)
        )
        .cast("long")
        .alias("users_train_only"),
        F.sum(
            F.when((F.col("__tr") == 0) & (F.col("__te") > 0), 1).otherwise(0)
        )
        .cast("long")
        .alias("users_test_only"),
        F.round(
            F.sum(
                F.when(
                    (F.col("__tr") > 0) & (F.col("__te") > 0), 1
                ).otherwise(0)
            ).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("leakage_share"),
    )


def q_b28_cluster_balanced(spark, sf_dir):
    """Cluster-balanced sampling (B28 × B20, r10): embedding-space
    diversity quotas — assign every vector with the bit-exact k-means
    (k=4, 3 rounds, the b20_kmeans kernel), then take at most 50 per
    cluster by hash-rank (the deterministic coin) so no embedding
    region dominates the training mix; the report carries per-cluster
    member/sample counts, the sampled share, and the sampled-id sum as
    the selection checksum. This is the topic-diversity companion to
    source-level quotas (b26_exact_quota): quota keys come from the
    LEARNED space, not metadata."""
    from pyspark.sql import Window

    QUOTA = 50
    emb = _t(spark, sf_dir, "embeddings")
    assign = similarity.kmeans_exact(emb, k=4, iters=3)
    u = dedup.portable_hash60(
        F.concat(F.lit("cb:"), F.col("vec_id"))
    )
    w = Window.partitionBy("cluster_id").orderBy(
        F.col("__u").asc(), F.col("vec_id").asc()
    )
    ranked = assign.withColumn("__u", u).withColumn(
        "__rn", F.row_number().over(w)
    )
    sampled = F.col("__rn") <= QUOTA
    return ranked.groupBy("cluster_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_members"),
        F.sum(F.when(sampled, 1).otherwise(0)).cast("long").alias("n_sampled"),
        F.round(
            F.sum(F.when(sampled, 1).otherwise(0)).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("sampled_share"),
        F.sum(F.when(sampled, F.col("vec_id")).otherwise(0))
        .cast("long")
        .alias("sum_sampled_ids"),
    )


def q_b28_dsir_weights(spark, sf_dir):
    """DSIR-style importance weights for data selection (B28 depth,
    r11): score every document by its log-likelihood ratio under a
    TARGET unigram LM (here: the English slice as the stand-in target
    domain) vs the BACKGROUND corpus LM, both Laplace-smoothed over the
    shared vocabulary — the Data Selection with Importance Resampling
    recipe (Xie et al. 2023): sample training data ∝ exp(weight) to
    tilt a generic corpus toward a target domain. Output: the top 20
    most target-like documents. Exactness: per-TOKEN log ratio is
    floor-quantized to the 1e-8 grid once, multiplied by the exact
    per-doc occurrence count and summed as integers (the source_kl
    recipe), so the per-doc weight is order-independent. Shape: token
    counts are keyed aggs; the per-token term table joins the (doc,tok)
    relation on tok — vocab-sized equi-join, never broadcast (vocab is
    corpus-sized at 100 TB); top-20 via TakeOrdered."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    toks = docs.select(
        "doc_id", "lang", F.explode(textops.tokens("text")).alias("tok")
    ).filter(F.col("tok") != "")
    dt = toks.groupBy("doc_id", "tok").agg(
        F.count(F.lit(1)).cast("long").alias("__m")
    )
    bg = toks.groupBy("tok").agg(F.count(F.lit(1)).cast("long").alias("__cb"))
    tg = (
        toks.filter(F.col("lang") == "en")
        .groupBy("tok")
        .agg(F.count(F.lit(1)).cast("long").alias("__ct"))
    )
    tot = toks.agg(
        F.count(F.lit(1)).cast("long").alias("__nb"),
        F.sum(F.when(F.col("lang") == "en", 1).otherwise(0))
        .cast("long")
        .alias("__nt"),
        F.countDistinct("tok").cast("long").alias("__v"),
    )
    terms = (
        bg.join(tg, "tok", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "tok",
            F.floor(
                F.log(
                    (
                        (F.coalesce(F.col("__ct"), F.lit(0)) + 1)
                        / (F.col("__nt") + F.col("__v")).cast("double")
                    )
                    / (
                        (F.col("__cb") + 1)
                        / (F.col("__nb") + F.col("__v")).cast("double")
                    )
                )
                * 1e8
            )
            .cast("long")
            .alias("__t8"),
        )
    )
    perdoc = (
        dt.join(terms, "tok")
        .groupBy("doc_id")
        .agg(
            F.sum("__m").cast("long").alias("n_tok"),
            F.sum(F.col("__m") * F.col("__t8")).cast("long").alias("w8"),
        )
    )
    return (
        perdoc.orderBy(F.col("w8").desc(), F.col("doc_id").asc())
        .limit(20)
        .select(
            "doc_id",
            "n_tok",
            "w8",
            F.round(F.col("w8") / 1e8, 6).alias("weight"),
        )
    )


def q_b26_k_anonymity(spark, sf_dir):
    """k-anonymity risk screen over quasi-identifiers (B26 depth, r11):
    group the customer table by the QI tuple (nation, market segment,
    account-balance kilobucket) and classify each equivalence class —
    unique (k=1, re-identifiable outright), small (k<5, linkable), or
    anonymous (k≥5). The privacy audit run before releasing training
    data derived from user records; the class shares are the headline
    numbers of a DPIA. Shape: one keyed agg to class sizes (group
    count is bounded by the QI domain), one tiny agg over classes;
    share = division of exact counts, round 6."""
    cust = _t(spark, sf_dir, "customer").select(
        "c_nationkey", "c_mktsegment", "c_acctbal"
    )
    qi = cust.select(
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / F.lit(1000.0)).cast("long").alias(
            "__kb"
        ),
    )
    groups = qi.groupBy("c_nationkey", "c_mktsegment", "__kb").agg(
        F.count(F.lit(1)).cast("long").alias("__k")
    )
    cls = F.when(F.col("__k") == 1, "unique").when(
        F.col("__k") < 5, "small"
    ).otherwise("anonymous")
    tot = qi.agg(F.count(F.lit(1)).cast("long").alias("__tot"))
    return (
        groups.select(cls.alias("risk_class"), "__k")
        .groupBy("risk_class")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_groups"),
            F.sum("__k").cast("long").alias("n_rows"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "risk_class",
            "n_groups",
            "n_rows",
            F.round(F.col("n_rows").cast("double") / F.col("__tot"), 6).alias(
                "row_share"
            ),
        )
    )


def q_b27_theta_intersect(spark, sf_dir):
    """Theta-sketch set intersection (B27 depth, r11 — the sketch
    family's SET-OPERATION leg: KMV/HLL/LC estimate one set's size;
    theta sketches estimate sizes of set EXPRESSIONS from mergeable
    samples): estimate |A∩B| where A = customers with even orders and
    B = customers with odd orders, from two k=64 KMV sketches — merge
    to the union sketch, θ = its kth smallest hash, then count union
    samples below θ present in BOTH sets; est∩ = (both/k)·estU. The
    exact intersection is computed alongside, so the row audits the
    estimator's error the way b27_sketch_bounds audits KMV. Fully
    deterministic given the portable md5-60 hash — bit-replayable.
    Shape: two hash-distinct aggs, two TakeOrdered k-limits, one
    bounded membership join over ≤2k sample rows."""
    K = 64
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    h = dedup.portable_hash60(F.col("o_custkey").cast("string"))
    a = (
        orders.filter(F.col("o_orderkey") % 2 == 0)
        .select(h.alias("__h"))
        .distinct()
    )
    b = (
        orders.filter(F.col("o_orderkey") % 2 == 1)
        .select(h.alias("__h"))
        .distinct()
    )
    ka = a.orderBy("__h").limit(K).select("__h", F.lit(1).alias("__a"))
    kb = b.orderBy("__h").limit(K).select("__h", F.lit(1).alias("__b"))
    merged = (
        ka.select("__h")
        .unionByName(kb.select("__h"))
        .distinct()
        .orderBy("__h")
        .limit(K)
    )
    theta = merged.agg(
        F.max("__h").alias("__theta"), F.count(F.lit(1)).alias("__ku")
    )
    samples = (
        merged.join(ka, "__h", "left")
        .join(kb, "__h", "left")
        .crossJoin(F.broadcast(theta))
    )
    # exact-count fallback below k (ADVICE r11): when the distinct union
    # is smaller than K the merged sketch holds EVERY union element, so
    # the estimator's (ku-1)·2^60/θ read would bias low — return the
    # exact count ku instead, matching b27_kmv_sketch's contract.
    est_u = F.when(
        F.col("__ku") < K, F.col("__ku").cast("double")
    ).otherwise(
        F.round(
            (F.col("__ku") - 1) * F.lit(float(2**60)) / F.col("__theta"), 6
        )
    )
    # exact intersection for the audit column (semi-join, keyed)
    ac = orders.filter(F.col("o_orderkey") % 2 == 0).select("o_custkey")
    bc = orders.filter(F.col("o_orderkey") % 2 == 1).select("o_custkey")
    exact = (
        ac.distinct()
        .join(bc.distinct(), "o_custkey", "semi")
        .agg(F.count(F.lit(1)).cast("long").alias("__exact"))
    )
    return (
        samples.agg(
            F.min("__ku").cast("long").alias("k"),
            F.min("__theta").cast("long").alias("theta"),
            F.sum(
                F.when(
                    F.col("__a").isNotNull() & F.col("__b").isNotNull(), 1
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_both"),
            F.min(est_u).alias("est_union"),
        )
        .crossJoin(F.broadcast(exact))
        .select(
            "k",
            "theta",
            "n_both",
            "est_union",
            F.round(
                F.col("n_both").cast("double")
                / F.col("k")
                * F.col("est_union"),
                6,
            ).alias("est_intersect"),
            F.col("__exact").alias("exact_intersect"),
        )
    )


def q_b26_capture_recapture(spark, sf_dir):
    """Capture–recapture population estimate (B26 depth, r11): treat
    the even-orderkey and odd-orderkey order slices as two independent
    "captures" of the customer population and estimate the total
    active-customer count from overlap — Lincoln–Petersen n_a·n_b/n_ab
    and the bias-corrected Chapman (n_a+1)(n_b+1)/(n_ab+1)−1. The
    survey-sampling read for "how many distinct entities exist that we
    have only partial feeds of" (dedup-cluster undercount, crawl
    frontier size); the exact union sits alongside as the in-row error
    audit. Shape: two distinct aggs + one semi-join count + one
    distinct-union count, all keyed; estimates = two divisions of
    exact counts, round 6."""
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    a = orders.filter(F.col("o_orderkey") % 2 == 0).select("o_custkey").distinct()
    b = orders.filter(F.col("o_orderkey") % 2 == 1).select("o_custkey").distinct()
    na = a.agg(F.count(F.lit(1)).cast("long").alias("n_a"))
    nb = b.agg(F.count(F.lit(1)).cast("long").alias("n_b"))
    nab = a.join(b, "o_custkey", "semi").agg(
        F.count(F.lit(1)).cast("long").alias("n_both")
    )
    nu = a.unionByName(b).distinct().agg(
        F.count(F.lit(1)).cast("long").alias("exact_union")
    )
    return (
        na.crossJoin(F.broadcast(nb))
        .crossJoin(F.broadcast(nab))
        .crossJoin(F.broadcast(nu))
        .select(
            "n_a",
            "n_b",
            "n_both",
            "exact_union",
            # NULL (not Infinity) when the captures are disjoint
            # (ADVICE r11): Spark's double x/0 yields Infinity while
            # DuckDB errors/NULLs, so the degenerate case must be
            # decided on the engine-portable side of the division.
            F.when(
                F.col("n_both") > 0,
                F.round(
                    F.col("n_a").cast("double")
                    * F.col("n_b")
                    / F.col("n_both"),
                    6,
                ),
            ).alias("lincoln_petersen"),
            F.round(
                (F.col("n_a") + 1).cast("double")
                * (F.col("n_b") + 1)
                / (F.col("n_both") + 1)
                - 1.0,
                6,
            ).alias("chapman"),
        )
    )


def q_b27_bloom_fpp(spark, sf_dir):
    """Bloom-filter false-positive audit (B27 depth, r11): probe the
    b7 family's engine-portable Bloom filter (4096 bits × 4 universal
    hashes over BUILDING-segment customers) with every key KNOWN to be
    outside the set and measure the actual false-positive rate, next
    to the bitmap load (set-bit share) — the capacity check run before
    trusting a Bloom semi-join's pruning factor at scale (a filter
    past ~50% load stops pruning). Fully deterministic: bit positions
    replay bit-for-bit (md5-60 + universal family), so measured FPP is
    a hashable integer ratio, not a statistical estimate. Shape:
    bitmap build (one bit_or agg), narrow probe filter, four 1-row
    aggs broadcast together."""
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    members = cust.filter(F.col("c_mktsegment") == "BUILDING").select(
        "c_custkey"
    )
    nonmembers = cust.filter(F.col("c_mktsegment") != "BUILDING").select(
        "c_custkey"
    ).distinct()
    bloom = derive.bloom_build(members, "c_custkey")
    passed = derive.bloom_probe(nonmembers, bloom, "c_custkey")
    nm = members.distinct().agg(
        F.count(F.lit(1)).cast("long").alias("n_keys")
    )
    np_ = nonmembers.agg(F.count(F.lit(1)).cast("long").alias("n_probes"))
    nf = passed.agg(F.count(F.lit(1)).cast("long").alias("n_false_pos"))
    bs = bloom.agg(
        F.sum(F.bit_count("bits")).cast("long").alias("bits_set")
    )
    return (
        nm.crossJoin(F.broadcast(np_))
        .crossJoin(F.broadcast(nf))
        .crossJoin(F.broadcast(bs))
        .select(
            F.lit(4096).cast("int").alias("m_bits"),
            F.lit(4).cast("int").alias("k_hashes"),
            "n_keys",
            "n_probes",
            "n_false_pos",
            "bits_set",
            F.round(
                F.col("n_false_pos").cast("double") / F.col("n_probes"), 6
            ).alias("measured_fpp"),
            F.round(
                F.col("bits_set").cast("double") / F.lit(4096.0), 6
            ).alias("load"),
        )
    )


def q_b26_neyman_allocation(spark, sf_dir):
    """Neyman optimal allocation (B26 depth, r11 — the survey-design
    read beside proportional stratification b26_stratified_sample and
    the HT estimator b26_ht_estimate): allocate a 1000-unit sample
    across market-segment strata ∝ N_h·σ_h — bigger AND more variable
    strata get more budget, the variance-minimizing rule. σ_h from
    EXACT decimal power sums (n, Σx, Σx² — order-independent,
    map-side combinable; the b10_stats_agg recipe), allocation floored
    to integers so the output hashes exactly. One keyed agg + a 1-row
    denominator broadcast."""
    cust = _t(spark, sf_dir, "customer").select("c_mktsegment", "c_acctbal")
    dec4 = lambda c: F.col(c).cast("decimal(18,4)")  # noqa: E731
    sums = cust.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(dec4("c_acctbal")).cast("double").alias("sx"),
        F.sum(dec4("c_acctbal") * dec4("c_acctbal")).cast("double").alias(
            "sxx"
        ),
    )
    sigma = F.sqrt(
        (F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n")) / F.col("n")
    )
    w = sums.select(
        "c_mktsegment", "n", (F.col("n") * sigma).alias("__w")
    )
    tot = w.agg(F.sum("__w").alias("__tw"))
    return (
        w.crossJoin(F.broadcast(tot))
        .select(
            "c_mktsegment",
            F.col("n").cast("long").alias("n_rows"),
            F.round(F.col("__w") / F.col("n"), 6).alias("sigma"),
            F.round(F.col("__w") / F.col("__tw"), 6).alias("weight_share"),
            F.floor(F.col("__w") / F.col("__tw") * F.lit(1000.0))
            .cast("long")
            .alias("alloc_1000"),
        )
    )


def q_b28_ablation_grid(spark, sf_dir):
    """Source-ablation planning grid (B28 depth, r11): for every
    leave-one-source-out ablation run, the remaining sources'
    REBALANCED token shares — the manifest an ablation study ships to
    the trainer alongside the full-mix manifest (b28_training
    families): row (ablated, remaining) = remaining source's share of
    the corpus with `ablated` removed. |S|² rows, all from ONE
    |S|-row token agg self-joined — the corpus is tokenized once and
    never shuffled again. Shares = divisions of exact integer sums,
    round 6."""
    docs = _t(spark, sf_dir, "documents").select("source", "text")
    per = docs.groupBy("source").agg(
        F.sum(textops.token_count("text")).cast("long").alias("n_tok")
    )
    tot = per.agg(F.sum("n_tok").cast("long").alias("__t"))
    a = per.select(
        F.col("source").alias("ablated_source"),
        F.col("n_tok").alias("__abl_tok"),
    )
    r = per.select(
        F.col("source").alias("remaining_source"),
        F.col("n_tok").alias("n_tok"),
    )
    return (
        a.crossJoin(r)
        .filter(F.col("ablated_source") != F.col("remaining_source"))
        .crossJoin(F.broadcast(tot))
        .select(
            "ablated_source",
            "remaining_source",
            "n_tok",
            F.round(
                F.col("n_tok").cast("double")
                / (F.col("__t") - F.col("__abl_tok")),
                6,
            ).alias("rebalanced_share"),
        )
    )


def q_b26_raking(spark, sf_dir):
    """Iterative proportional fitting / raking (B26 depth, r11 — the
    survey-weighting algorithm the stratified family leads to: adjust
    per-cell weights so BOTH the language and source marginals hit
    their targets simultaneously, when per-cell targets don't exist):
    3 unrolled IPF rounds (lang → source → lang) over the (lang,
    source) doc-count grid, targets = equal shares per group.
    Exactness: weights live as integer micro-units (w6), each round's
    marginal sums are exact integer Σ n·w6, the scale ratio is one
    double division, and the updated weight re-floors to integer —
    so round order is the ONLY order and both engines replay every
    intermediate weight bit-for-bit. Cell grid is |langs|×|sources|;
    each round is one keyed agg + one broadcast join back."""
    docs = _t(spark, sf_dir, "documents").select("lang", "source")
    cells = docs.groupBy("lang", "source").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    tot = cells.agg(
        F.sum("n").cast("long").alias("__t"),
        F.countDistinct("lang").cast("long").alias("__nl"),
        F.countDistinct("source").cast("long").alias("__ns"),
    )
    cur = cells.crossJoin(F.broadcast(tot)).select(
        "lang", "source", "n", "__t", "__nl", "__ns",
        F.lit(1_000_000).cast("long").alias("w6"),
    )
    for dim, ng in (("lang", "__nl"), ("source", "__ns"), ("lang", "__nl")):
        s = cur.groupBy(dim).agg(
            F.sum(F.col("n") * F.col("w6")).cast("long").alias("__s")
        )
        cur = (
            cur.join(F.broadcast(s), dim)
            .withColumn(
                "w6",
                F.floor(
                    F.col("w6")
                    * (
                        F.col("__t").cast("double")
                        / F.col(ng)
                        * F.lit(1e6)
                        / F.col("__s")
                    )
                ).cast("long"),
            )
            .drop("__s")
        )
    return cur.select(
        "lang",
        "source",
        "n",
        "w6",
        F.round(F.col("w6") / F.lit(1e6), 6).alias("weight"),
    )


def q_b26_global_shuffle(spark, sf_dir):
    """Deterministic global training-order shuffle + uniformity audit
    (B26 depth, r12): training wants every epoch's example order to be
    a reproducible pseudo-random permutation — position = rank of
    portable md5-60(doc_id) (doc_id tie-break), the seedable shuffle
    that replays identically on any engine/cluster and needs no stored
    permutation table. The audit read: per (position-decile, source)
    example counts with the integer deviation |10·n − n_source| from a
    perfectly uniform spread — a source that clumps into one decile
    means correlated batches (the thing shuffling exists to prevent).
    Scale shape: the permutation is a SORT on a hash column — Spark
    range-partitions it (sample → balanced ranges), the one shuffle
    this op is ABOUT; the audit itself is one keyed agg. All integers
    except the round-6 share."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "source")
    h = dedup.portable_hash60(F.col("doc_id").cast("string"))
    # two-phase distributed rank (derive.distributed_row_number): the
    # permutation must NOT serialize the corpus through one window
    # task — ranks are local per range partition, offsets come from the
    # bounded |partitions|-row count relation (bit-identical to the
    # naive global row_number; parity-tested)
    pos = derive.distributed_row_number(
        docs.withColumn("__h", h),
        [],
        [F.col("__h").asc(), F.col("doc_id").asc()],
        out_col="__rn",
    ).select("doc_id", "source", (F.col("__rn") - 1).alias("__pos"))
    tot = pos.agg(F.count(F.lit(1)).alias("__n"))
    dec = pos.crossJoin(F.broadcast(tot)).select(
        "source",
        F.expr("__pos * 10 div __n").alias("decile"),
        "__n",
    )
    per_src = dec.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("__ns")
    )
    return (
        dec.groupBy("source", "decile", "__n")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .join(per_src, "source")
        .select(
            "source",
            F.col("decile").cast("long").alias("decile"),
            "n",
            F.abs(F.lit(10) * F.col("n") - F.col("__ns"))
            .cast("long")
            .alias("dev_x10"),
            F.round(F.col("n").cast("double") * 10 / F.col("__n"), 6).alias(
                "decile_share_x10"
            ),
        )
    )


def q_b28_pareto_frontier(spark, sf_dir):
    """Quality–cost Pareto frontier (B28 depth, r12 — the SKYLINE read
    beside the knapsack's single-λ answer: the knapsack picks docs for
    ONE price of quality in tokens; the frontier is every doc that is
    optimal at SOME price, i.e. no other doc is at least as good AND
    at least as cheap with one strict): per language, skyline of
    (quality_score ↑, token cost ↓). 2-D skylines need no pair join —
    group to the per-(lang, score) cheapest doc, then one prefix-min
    sweep down the score order: a doc survives iff it matches its
    score group's min tokens and beats the running min of all strictly
    higher scores. Equal (score, tokens) twins both survive (neither
    strictly dominates). quality_score is the round-6 engine-identical
    composite the b21 gate family hashes. Scale: one keyed agg + one
    window over the bounded distinct-score table + one equi-join —
    linear, no self-join."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    feats = textops.quality_features(docs).select(
        "doc_id", "lang", "quality_score",
        F.col("q_tokens").cast("long").alias("n_tok"),
    )
    frontier = sampling.pareto_frontier(
        feats, "lang", "quality_score", "n_tok"
    )
    from pyspark.sql import Window

    wr = Window.partitionBy("lang").orderBy(
        F.col("quality_score").desc(), F.col("n_tok").asc(),
        F.col("doc_id").asc(),
    )
    return frontier.select(
        "lang",
        "doc_id",
        "quality_score",
        "n_tok",
        F.row_number().over(wr).cast("long").alias("frontier_rank"),
    )


def q_b26_pps_systematic(spark, sf_dir):
    """Systematic PPS sample (B26 depth, r13 — the SELECTION leg of
    the survey-sampling family: ht_estimate estimates from a given
    sample, neyman_allocation sizes strata, THIS row draws the sample
    itself): 500 equally-spaced points on the cumulative n_chars line
    over documents in doc_id order, each unit selected once per point
    inside its interval (pipeline/sampling.py: pps_systematic —
    deterministic half-stride start, integer floor arithmetic, units
    heavier than the stride legitimately repeat). The cumulative line
    is the range-partitioned two-phase prefix sum
    (derive.distributed_prefix_sum) — never a one-task global window;
    the offsets relation is |partitions| rows (the b10_gini rule)."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "n_chars")
    return sampling.pps_systematic(
        docs, "n_chars", 500, [F.col("doc_id").asc()]
    ).select("doc_id", "weight", "cum_before", "n_hits")
