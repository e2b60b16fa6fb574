"""Registry query functions — dedup family (split from
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


def q_b18_dup_groups(spark, sf_dir):
    d = _docs_with_dups(spark, sf_dir)
    g = dedup.duplicate_groups(d, ["text"], "doc_id")
    return g.select(
        F.md5("text").alias("text_fp"), "n_copies", "keeper_id"
    )


def q_b18_dedup_exact(spark, sf_dir):
    d = _docs_with_dups(spark, sf_dir)
    kept = dedup.exact_dedup(d, ["text"], "doc_id")
    return kept.select("doc_id", "lang", "source", "n_chars")


def q_b19_word_jaccard(spark, sf_dir):
    """Exact word-set Jaccard for adjacent-doc pairs (the SQL-expressible
    core of near-dedup; the MinHash candidate generator is rows-only)."""
    docs = _t(spark, sf_dir, "documents")
    toks = F.array_distinct(F.split(dedup.normalize_text("text"), " "))
    a = docs.select(F.col("doc_id").alias("id_a"), toks.alias("ta"))
    b = docs.select(F.col("doc_id").alias("id_b"), toks.alias("tb"))
    pairs = a.join(b, F.col("id_a") + 1 == F.col("id_b"))
    inter = F.array_size(F.array_intersect("ta", "tb")).cast("double")
    union = F.array_size(F.array_union("ta", "tb")).cast("double")
    return pairs.select(
        "id_a", "id_b", F.round(inter / union, 6).alias("jaccard")
    )


def q_b19_minhash_candidates(spark, sf_dir):
    """MinHash-LSH near-dup discovery in the engine-portable hash mode
    (``base_hash='md5'``): the WHOLE pipeline — shingles → universal-hash
    signatures → band buckets → candidate join → exact-Jaccard verify —
    is replayed bit-for-bit by the DuckDB oracle. Planted near-dups:
    every 7th doc gets a copy with a one-token suffix edit; candidates
    must surface them."""
    docs = _t(spark, sf_dir, "documents")
    mutated = docs.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + F.lit(200000)).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" zzz")).alias("text"),
    )
    corpus = docs.select("doc_id", "text").unionByName(mutated)
    # 32 hashes / 8 bands keeps rows-per-band=4 (same per-band match
    # curve; P(candidate) at jaccard 0.8 is still 0.985) at half the
    # signature cost — the bench-scale configuration
    pairs = dedup.near_dup_pairs(
        corpus, "doc_id", "text", threshold=0.8, num_hashes=32, bands=8,
        base_hash="md5",
    )
    return pairs.select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))


def q_b19_dup_clusters(spark, sf_dir):
    """Dup-cluster formation (B19 depth): near-dup PAIRS are not
    actionable for a corpus build until transitively closed into
    components — keep each cluster's min id, drop the rest. Spark side:
    iterative min-label propagation (dedup.dup_clusters); oracle side:
    the same closure as a DuckDB recursive CTE over the identical
    portable-md5 pair set."""
    docs = _t(spark, sf_dir, "documents")
    mutated = docs.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + F.lit(200000)).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" zzz")).alias("text"),
    )
    corpus = docs.select("doc_id", "text").unionByName(mutated)
    pairs = dedup.near_dup_pairs(
        corpus, "doc_id", "text", threshold=0.8, num_hashes=32, bands=8,
        base_hash="md5",
    )
    return dedup.dup_clusters(pairs)


def q_b19_simhash(spark, sf_dir):
    """SimHash near-dup candidates in portable-hash mode (60-bit md5-based
    fingerprints — DuckDB replays votes, fingerprint, banding and the
    Hamming verify exactly)."""
    docs = _t(spark, sf_dir, "documents")
    mutated = docs.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + F.lit(200000)).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" zzz")).alias("text"),
    )
    corpus = docs.select("doc_id", "text").unionByName(mutated)
    pairs = dedup.simhash_candidates(
        corpus, "doc_id", "text", max_hamming=3, bands=4, base_hash="md5"
    )
    return pairs.select("id_a", "id_b", F.col("hamming").cast("bigint").alias("hamming"))


def q_b19_incremental_index(spark, sf_dir):
    """The CDC × dedup composition (the reference's change feed meeting the
    corpus index): an LSH index built ONCE over the standing corpus
    (doc_id >= 20), probed by a small 'new documents' batch (mutated
    copies of docs 0-19 — the shape of a CDC insert batch). Only the batch
    is hashed; the join is an equi-join on (band, bucket). Portable hash
    mode, so DuckDB replays index, probe and join bit-for-bit."""
    docs = _t(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") >= 20).select("doc_id", "text")
    # the batch = near-copies of docs that ARE in the corpus (one-token
    # suffix edit) — the incremental probe must find their originals
    batch = docs.filter((F.col("doc_id") >= 20) & (F.col("doc_id") < 40)).select(
        (F.col("doc_id") + F.lit(400000)).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" qqq")).alias("text"),
    )
    index = dedup.build_lsh_index(
        corpus, "doc_id", "text", num_hashes=32, bands=8, base_hash="md5"
    )
    hits = dedup.query_lsh_index(
        index, batch, "doc_id", "text", num_hashes=32, bands=8, base_hash="md5"
    )
    return hits.select("new_id", "corpus_id")


def q_b19_incremental_clusters(spark, sf_dir):
    """The full CDC × dedup loop (B19 capstone): a standing corpus with
    planted near-dups is clustered ONCE (minhash pairs → dup_clusters);
    then a CDC batch of new documents probes the standing LSH index
    (cost ∝ batch) and its candidate pairs merge into the assignment via
    update_clusters (cost ∝ batch + affected clusters). Batch docs derived
    from docs that already have a planted twin exercise real cluster
    MERGES, not just appends. Oracle: from-scratch recursive-CTE closure
    over (standing pairs ∪ batch pairs) — the incremental path must equal
    the full recompute.

    The corpus is SHINGLED ONCE (r7, VERDICT r6 item 3): one
    checkpointed distinct (doc, sh) relation feeds the index build, the
    exact-Jaccard verify (both pair sides and set sizes), and — via the
    index checkpoint — the standing pair set and the batch probe. The
    naive composition tokenized the corpus three times; at 100 TB the
    shingle relation is THE shared intermediate a dedup loop persists
    (parquet, bucketed by doc)."""
    docs = _t(spark, sf_dir, "documents")
    base = docs.filter(F.col("doc_id") >= 20).select("doc_id", "text")
    planted = base.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + F.lit(200000)).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" zzz")).alias("text"),
    )
    corpus = base.unionByName(planted)
    srows = dedup.shingle_rows(
        corpus, "doc_id", "text", k=3, unit="word", distinct=True
    ).localCheckpoint(eager=False)
    index = dedup.build_lsh_index(
        corpus, "doc_id", "text", num_hashes=32, bands=8, base_hash="md5",
        rows=srows,
    ).localCheckpoint(eager=False)
    cand = dedup.lsh_candidates_from_index(index)
    pairs1 = (
        dedup.jaccard_pairs(corpus, cand, "doc_id", "text", rows=srows)
        .filter(F.col("jaccard") >= 0.8)
        .select("id_a", "id_b")
    )
    labels = dedup.dup_clusters(pairs1)
    batch = base.filter(F.col("doc_id") < 40).select(
        (F.col("doc_id") + F.lit(400000)).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" qqq")).alias("text"),
    )
    hits = dedup.query_lsh_index(
        index, batch, "doc_id", "text", num_hashes=32, bands=8, base_hash="md5"
    )
    return dedup.update_clusters(labels, hits, "new_id", "corpus_id")


def q_b19_embedding_dups(spark, sf_dir):
    """Embedding-cosine near-dup pairs (exact mode; the LSH mode is the
    scale path, exercised in unit tests)."""
    emb = _t(spark, sf_dir, "embeddings")
    pairs = dedup.embedding_near_dups(emb, threshold=0.4, exact=True)
    return pairs.select("id_a", "id_b", F.round("score", 6).alias("score"))


def q_b19_embedding_clusters(spark, sf_dir):
    """Cross-modality composition (B19 depth): dup-cluster formation over
    EMBEDDING-space near-dup pairs — the same dup_clusters operator that
    closes MinHash pairs closes cosine pairs (threshold 0.4, exact mode;
    pair membership is the already-oracled b19_embedding_dups decision)."""
    emb = _t(spark, sf_dir, "embeddings")
    pairs = dedup.embedding_near_dups(emb, threshold=0.4, exact=True)
    return dedup.dup_clusters(pairs).select(
        F.col("doc_id").alias("vec_id"), "cluster_id", "cluster_size"
    )


def q_b19_cluster_stats(spark, sf_dir):
    """Dedup-cluster QA (B19 depth): the cluster-size histogram over the
    standing near-dup clustering — how many singletons/pairs/triples the
    corpus carries and the total removable-duplicate count. One agg over
    the (already component-labeled) cluster assignment."""
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
    return (
        labels.groupBy("cluster_size")
        .agg(
            F.countDistinct("cluster_id").cast("bigint").alias("n_clusters"),
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            (F.count(F.lit(1)) - F.countDistinct("cluster_id"))
            .cast("bigint")
            .alias("n_removable"),
        )
    )


def q_b19_source_novelty(spark, sf_dir):
    """Per-source novelty (B19 audit depth): the fraction of each
    source's windowed fingerprints shared with NO other source — the
    uniqueness score that complements the pairwise overlap matrix when
    deciding what a new crawl actually adds. One distinct agg, one
    per-fp source count, one keyed ratio."""
    docs = _t(spark, sf_dir, "documents")
    fps = (
        textops.fingerprint_rows(
            docs.select("doc_id", "text"), "doc_id",
            window_tokens=16, stride=8,
        )
        .join(docs.select("doc_id", "source"), "doc_id")
        .select("source", "fp")
        .distinct()
    )
    spread = fps.groupBy("fp").agg(
        F.countDistinct("source").alias("__n_src")
    )
    return (
        fps.join(spread, "fp")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_fps"),
            F.sum(F.when(F.col("__n_src") == 1, 1).otherwise(0))
            .cast("bigint")
            .alias("n_unique"),
            F.round(
                F.sum(
                    F.when(F.col("__n_src") == 1, 1.0).otherwise(0.0)
                )
                / F.count(F.lit(1)).cast("double"),
                6,
            ).alias("novelty"),
        )
    )


def q_b19_source_overlap(spark, sf_dir):
    """Cross-source overlap matrix (B19 audit depth): for each source
    pair, how many 16-token windowed fingerprints (stride 8, the fuzzy-
    containment primitive) they share and the Jaccard of their
    fingerprint sets — the dataset-overlap audit run before mixing two
    crawls (whole-doc fingerprints under-report: partial shared passages
    are what leaks). Distinct (source, fp) rows → self equi-join on fp
    (source_a < source_b) → counts; per-source set sizes join back. No
    text re-comparison, no cartesian: everything keyed by the md5
    fingerprint."""
    docs = _t(spark, sf_dir, "documents")
    fps = (
        textops.fingerprint_rows(
            docs.select("doc_id", "text"), "doc_id",
            window_tokens=16, stride=8,
        )
        .join(docs.select("doc_id", "source"), "doc_id")
        .select("source", "fp")
        .distinct()
    )
    sizes = fps.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("__n")
    )
    a = fps.select(F.col("source").alias("source_a"), "fp")
    b = fps.select(F.col("source").alias("source_b"), "fp")
    common = (
        a.join(b, "fp")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_common"))
    )
    return (
        common.join(
            sizes.select(F.col("source").alias("source_a"), F.col("__n").alias("__na")),
            "source_a",
        )
        .join(
            sizes.select(F.col("source").alias("source_b"), F.col("__n").alias("__nb")),
            "source_b",
        )
        .select(
            "source_a",
            "source_b",
            "n_common",
            F.round(
                F.col("n_common").cast("double")
                / (F.col("__na") + F.col("__nb") - F.col("n_common")).cast(
                    "double"
                ),
                6,
            ).alias("jaccard"),
        )
    )


def q_b19_pair_dataset(spark, sf_dir):
    """Dedup-classifier dataset builder (B19 depth): labeled document
    pairs — positives are the oracle-verified near-dup pairs, negatives
    are deterministic hash-derangement pairs (doc i paired with the doc
    whose hash bucket rank is offset by a fixed stride — reproducible
    pseudo-random, no rand()). Output (id_a, id_b, label) balanced-ish;
    the training set for a learned dedup filter. Pairs come from the
    portable-md5 MinHash path so both engines derive identical
    positives."""
    from pyspark.sql import Window

    docs = _t(spark, sf_dir, "documents")
    mutated = docs.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + F.lit(200000)).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" zzz")).alias("text"),
    )
    corpus = docs.select("doc_id", "text").unionByName(mutated)
    pos = dedup.near_dup_pairs(
        corpus, "doc_id", "text", threshold=0.8, num_hashes=32, bands=8,
        base_hash="md5",
    ).select("id_a", "id_b", F.lit(1).cast("bigint").alias("label"))
    # negatives: a deterministic bucket-derangement — docs ranked by hash
    # priority WITHIN each of 64 hash buckets (partitioned window, no
    # global sort), then (bucket k, rank r) pairs with (bucket (k+37) mod
    # 64, rank r); unmatched ranks drop in the inner join, collisions
    # with true near-dup pairs are removed by anti-join. Reproducible
    # pseudo-random with no rand(), scales as one shuffle on the bucket.
    B = 64
    pri = docs.select(
        "doc_id",
        sampling.hash_bucket("doc_id", B).alias("__b"),
        sampling.hash_bucket("doc_id", 1 << 32).alias("__p"),
    )
    w = Window.partitionBy("__b").orderBy(
        F.col("__p").asc(), F.col("doc_id").asc()
    )
    ranked = pri.withColumn("__r", F.row_number().over(w))
    shifted = (
        ranked.select(
            F.col("doc_id").alias("id_a"),
            ((F.col("__b") + 37) % B).alias("__b2"),
            "__r",
        )
        .join(
            ranked.select(
                F.col("doc_id").alias("id_b"),
                F.col("__b").alias("__b2"),
                "__r",
            ),
            ["__b2", "__r"],
        )
        .filter(F.col("id_a") != F.col("id_b"))
        .select(
            F.least("id_a", "id_b").alias("id_a"),
            F.greatest("id_a", "id_b").alias("id_b"),
        )
        .distinct()
    )
    neg = shifted.join(
        pos.select("id_a", "id_b"), ["id_a", "id_b"], "left_anti"
    ).select("id_a", "id_b", F.lit(0).cast("bigint").alias("label"))
    return pos.unionByName(neg)


def q_b19_fuzzy_join(spark, sf_dir):
    """Edit-distance similarity self-join (B19 depth): all part-name
    pairs within levenshtein 1, over a corpus with planted one-char
    typos — q-gram count-filter blocking (provably complete on
    distinct-gram sets: |G∩| ≥ |G|−q·d) + exact levenshtein verify,
    never the O(n²) cross join. The oracle IS the brute-force
    definition, so the driver row proves blocking completeness on real
    data (dedup.py: fuzzy_self_join)."""
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_name")
    typos = part.filter(F.col("p_partkey") % 9 == 0).select(
        (F.col("p_partkey") + 1000000).alias("p_partkey"),
        F.concat(F.lit("x"), F.substr(F.col("p_name"), F.lit(2), F.length("p_name"))).alias("p_name"),
    )
    corpus = part.unionByName(typos)
    return dedup.fuzzy_self_join(corpus, "p_partkey", "p_name", max_dist=1, q=3)


def q_b19_sorted_neighborhood(spark, sf_dir):
    """Sorted-neighborhood dedup blocking (B19 depth) — the classic SNM
    complement to LSH/q-gram blocking: per-prefix-block sorted windows
    (w=5) emit O(n·w) candidates, exact-levenshtein-verified at ≤ 1,
    over the same planted-typo part-name corpus as b19_fuzzy_join. The
    sort is per-block (hash-partitioned, never a global window), so it
    scales out; cross-prefix misses are the documented SNM recall
    trade-off (dedup.py: sorted_neighborhood_pairs)."""
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_name")
    typos = part.filter(F.col("p_partkey") % 9 == 0).select(
        (F.col("p_partkey") + 1000000).alias("p_partkey"),
        F.concat(
            F.substr(F.col("p_name"), F.lit(1), F.lit(4)),
            F.lit("x"),
            F.substr(F.col("p_name"), F.lit(6), F.length("p_name")),
        ).alias("p_name"),
    )
    corpus = part.unionByName(typos)
    return dedup.sorted_neighborhood_pairs(
        corpus, "p_partkey", "p_name", window=5, block_chars=2, max_dist=1
    )


def q_b19_blocking_quality(spark, sf_dir):
    """Blocking-quality audit (B19 depth, r7) — the record-linkage
    literature's two standard metrics for ANY blocking scheme, measured
    on the sorted-neighborhood candidates over the planted-typo corpus:

    - reduction ratio = 1 − |candidates| / C(n,2) — how much of the
      O(n²) comparison space the blocking avoids;
    - pairs completeness = |truth ∩ candidates| / |truth| — how much
      recall the avoidance cost, with truth = the planted (original,
      typo) pairs.

    This is the row that makes the SNM recall trade-off (documented in
    sorted_neighborhood_pairs) a MEASURED number instead of prose, the
    audit a 100 TB dedup run uses to choose window/blocking-key before
    committing to a full pass. All counts integer; two ratios rounded.
    """
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_name")
    typos = part.filter(F.col("p_partkey") % 9 == 0).select(
        (F.col("p_partkey") + 1000000).alias("p_partkey"),
        F.concat(
            F.substr(F.col("p_name"), F.lit(1), F.lit(4)),
            F.lit("x"),
            F.substr(F.col("p_name"), F.lit(6), F.length("p_name")),
        ).alias("p_name"),
    )
    corpus = part.unionByName(typos)
    cand = dedup.sorted_neighborhood_pairs(
        corpus, "p_partkey", "p_name", window=5, block_chars=2
    ).select("id_a", "id_b")
    truth = typos.select(
        (F.col("p_partkey") - 1000000).alias("id_a"),
        F.col("p_partkey").alias("id_b"),
    )
    n_rec = corpus.agg(F.count(F.lit(1)).cast("long").alias("n_records"))
    n_cand = cand.agg(F.count(F.lit(1)).cast("long").alias("n_candidates"))
    n_truth = truth.agg(F.count(F.lit(1)).cast("long").alias("n_true"))
    found = truth.join(cand, ["id_a", "id_b"], "left_semi").agg(
        F.count(F.lit(1)).cast("long").alias("n_true_found")
    )
    return (
        n_rec.crossJoin(F.broadcast(n_cand))
        .crossJoin(F.broadcast(n_truth))
        .crossJoin(F.broadcast(found))
        .select(
            "n_records",
            "n_candidates",
            "n_true",
            "n_true_found",
            F.round(
                F.lit(1.0)
                - F.col("n_candidates")
                / (F.col("n_records") * (F.col("n_records") - 1) / F.lit(2.0)),
                6,
            ).alias("reduction_ratio"),
            F.round(
                F.col("n_true_found") / F.col("n_true").cast("double"), 6
            ).alias("pairs_completeness"),
        )
    )


def q_b19_lsh_quality(spark, sf_dir):
    """Blocking-quality audit for the MinHash-LSH family (r7, the twin
    of q_b19_blocking_quality's SNM audit): reduction ratio and pairs
    completeness of the 32-hash/8-band md5-mode candidate set against
    the planted near-dup truth (every 7th doc's one-token-suffix twin).
    Together the two audits make the blocking-strategy choice (SNM vs
    LSH, window vs bands) a measured trade-off on the same corpus —
    what a 100 TB dedup run decides BEFORE committing to a full pass."""
    docs = _t(spark, sf_dir, "documents")
    mutated = docs.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + F.lit(200000)).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" zzz")).alias("text"),
    )
    corpus = docs.select("doc_id", "text").unionByName(mutated)
    index = dedup.build_lsh_index(
        corpus, "doc_id", "text", num_hashes=32, bands=8, base_hash="md5"
    )
    cand = dedup.lsh_candidates_from_index(index)
    truth = docs.filter(F.col("doc_id") % 7 == 0).select(
        F.col("doc_id").alias("id_a"),
        (F.col("doc_id") + F.lit(200000)).alias("id_b"),
    )
    n_rec = corpus.agg(F.count(F.lit(1)).cast("long").alias("n_records"))
    n_cand = cand.agg(F.count(F.lit(1)).cast("long").alias("n_candidates"))
    n_truth = truth.agg(F.count(F.lit(1)).cast("long").alias("n_true"))
    found = truth.join(cand, ["id_a", "id_b"], "left_semi").agg(
        F.count(F.lit(1)).cast("long").alias("n_true_found")
    )
    return (
        n_rec.crossJoin(F.broadcast(n_cand))
        .crossJoin(F.broadcast(n_truth))
        .crossJoin(F.broadcast(found))
        .select(
            "n_records",
            "n_candidates",
            "n_true",
            "n_true_found",
            F.round(
                F.lit(1.0)
                - F.col("n_candidates")
                / (F.col("n_records") * (F.col("n_records") - 1) / F.lit(2.0)),
                6,
            ).alias("reduction_ratio"),
            F.round(
                F.col("n_true_found") / F.col("n_true").cast("double"), 6
            ).alias("pairs_completeness"),
        )
    )


def q_b19_prefix_filter(spark, sf_dir):
    """EXACT set-similarity self-join via prefix filtering (B19 depth —
    the COMPLETE Jaccard method beside probabilistic MinHash-LSH):
    rarity-ordered shingle prefixes make candidates an equi-join on
    each doc's rarest grams, then the exact-Jaccard verify keeps pairs
    ≥ 0.8 over the same planted-dup corpus the b19 LSH queries use.
    Completeness vs the brute-force definition is pytest-proven; the
    oracle replays this pipeline (dedup.py: set_similarity_join)."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    mutated = docs.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 200000).alias("doc_id"),
        F.concat("text", F.lit(" zzz")).alias("text"),
    )
    corpus = docs.unionByName(mutated)
    return dedup.set_similarity_join(corpus, "doc_id", "text", threshold=0.8)


def q_b19_golden_records(spark, sf_dir):
    """Survivorship / golden records (B19 depth — the step AFTER
    clustering that entity resolution exists for): each dup cluster
    collapses to one merged record under deterministic per-column
    rules — longest text (id tie-break), min doc_id as canonical id,
    max length, keeper's text. Oracle: the recursive-CTE closure
    labels + the same rules in SQL (dedup.py: golden_records)."""
    docs = _t(spark, sf_dir, "documents")
    mutated = docs.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + F.lit(200000)).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" zzz")).alias("text"),
    )
    corpus = docs.select("doc_id", "text").unionByName(mutated)
    pairs = dedup.near_dup_pairs(
        corpus, "doc_id", "text", threshold=0.8, num_hashes=32, bands=8,
        base_hash="md5",
    )
    labels = dedup.dup_clusters(pairs)
    return dedup.golden_records(
        corpus.withColumn("n_len", F.length("text").cast("bigint")),
        labels,
        "doc_id",
        {
            "best_text": ("longest", "text"),
            "min_id": ("min", "doc_id"),
            "max_len": ("max", "n_len"),
            "keeper_text": ("keeper", "text"),
        },
    )


def q_b18_cdc_chunks(spark, sf_dir):
    """Content-defined chunking dedup audit (B18 storage depth): the
    Rabin/Gear-style boundary rule over the planted-dup corpus — the
    chunk store's view of redundancy, position-independent where fixed
    blocks are not (the ' zzz' suffix shifts no earlier boundary, so
    original and mutant share every chunk before the tail). One row:
    total vs distinct chunks/chars + dedup ratio (dedup.py:
    cdc_chunk_stats)."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    mutated = docs.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 200000).alias("doc_id"),
        F.concat("text", F.lit(" zzz")).alias("text"),
    )
    corpus = docs.unionByName(mutated)
    return dedup.cdc_chunk_stats(corpus, "doc_id", "text")


def q_b19_cluster_stability(spark, sf_dir):
    """Cluster-stability audit (B19 depth, r8): adjusted Rand index
    between the EXACT-duplicate clustering (groups keyed by normalized
    text, label = min member id) and the NEAR-dup clustering (MinHash
    pairs transitively closed) over the same planted-dup corpus — the
    measured answer to "how much extra does near-dedup merge beyond
    exact, and how coherently". All pair counts are integer
    (n·(n−1)/2 over contingency cells — two keyed aggs + one
    |clusters|-sized contingency agg, no pair materialization); only
    the final indices divide as doubles, rounded 6. Scale: cost ∝
    clusters, never ∝ pairs."""
    docs = _t(spark, sf_dir, "documents")
    mutated = docs.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + F.lit(200000)).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" zzz")).alias("text"),
    )
    corpus = docs.select("doc_id", "text").unionByName(mutated)
    pairs = dedup.near_dup_pairs(
        corpus, "doc_id", "text", threshold=0.8, num_hashes=32, bands=8,
        base_hash="md5",
    )
    near = dedup.dup_clusters(pairs).select(
        "doc_id", F.col("cluster_id").alias("__a")
    )
    from pyspark.sql import Window as _W

    exact = corpus.select(
        "doc_id",
        F.min("doc_id")
        .over(_W.partitionBy(dedup.normalize_text("text")))
        .alias("__b"),
    )
    both = (
        corpus.select("doc_id")
        .join(near, "doc_id", "left")
        .join(exact, "doc_id")
        .select(
            "doc_id",
            F.coalesce("__a", F.col("doc_id")).alias("__a"),
            "__b",
        )
    )
    cont = both.groupBy("__a", "__b").agg(F.count(F.lit(1)).alias("__n"))
    c2 = lambda c: (F.col(c) * (F.col(c) - 1) / 2).cast("long")  # noqa: E731
    s_both = cont.agg(
        F.sum(c2("__n")).alias("pairs_both"),
        F.sum("__n").cast("long").alias("n_docs"),
    )
    s_a = (
        cont.groupBy("__a")
        .agg(F.sum("__n").alias("__na"))
        .agg(F.sum(c2("__na")).alias("pairs_a"))
    )
    s_b = (
        cont.groupBy("__b")
        .agg(F.sum("__n").alias("__nb"))
        .agg(F.sum(c2("__nb")).alias("pairs_b"))
    )
    out = s_both.crossJoin(F.broadcast(s_a)).crossJoin(F.broadcast(s_b))
    total = (F.col("n_docs") * (F.col("n_docs") - 1) / 2).cast("long")
    e = F.col("pairs_a") * F.col("pairs_b") / total.cast("double")
    m = (F.col("pairs_a") + F.col("pairs_b")) / F.lit(2.0)
    return out.select(
        "n_docs",
        "pairs_both",
        "pairs_a",
        "pairs_b",
        total.alias("pairs_total"),
        F.round(
            (
                total.cast("double")
                + 2 * F.col("pairs_both")
                - F.col("pairs_a")
                - F.col("pairs_b")
            )
            / total.cast("double"),
            6,
        ).alias("rand_index"),
        F.round(
            F.when(m - e != 0, (F.col("pairs_both") - e) / (m - e))
            .otherwise(F.lit(1.0)),
            6,
        ).alias("ari"),
    )


def q_b19_prefix_dups(spark, sf_dir):
    """Truncation-duplicate screen (B19 dedup depth, r9 wave 5): find
    documents that are exact PREFIXES of longer documents — the
    re-crawl/truncation dup class MinHash under-weights (a 60% prefix
    shares only ~60% of shingles but is 100% redundant). Planted
    fixture: every doc_id%9==3 doc of >=120 chars contributes a 60%
    truncation. Candidates come from an equi-join on the first-24-char
    block key (never a cross product — bucket sizes track genuine
    prefix collisions), then the exact substring check confirms.
    Output is the (short, long) pair manifest a keep-longest pass would
    consume."""
    docs = _t(spark, sf_dir, "documents")
    planted = docs.filter(
        (F.col("doc_id") % 9 == 3) & (F.length("text") >= 120)
    ).select(
        (F.col("doc_id") + F.lit(400000)).alias("doc_id"),
        F.expr("substring(text, 1, CAST(length(text) * 3 AS INT) div 5)").alias(
            "text"
        ),
    )
    corpus = docs.select("doc_id", "text").unionByName(planted)
    keyed = corpus.select(
        "doc_id",
        "text",
        F.length("text").alias("len"),
        F.substring("text", 1, 24).alias("__k"),
    )
    a = keyed.select(
        F.col("doc_id").alias("short_id"),
        F.col("text").alias("__st"),
        F.col("len").alias("short_len"),
        "__k",
    )
    b = keyed.select(
        F.col("doc_id").alias("long_id"),
        F.col("text").alias("__lt"),
        F.col("len").alias("long_len"),
        "__k",
    )
    return (
        a.join(b, "__k")
        .filter(
            (F.col("short_len") < F.col("long_len"))
            & (
                F.expr("substring(__lt, 1, CAST(short_len AS INT))")
                == F.col("__st")
            )
        )
        .select("short_id", "long_id", "short_len", "long_len")
    )


def q_b18_chunk_dedup(spark, sf_dir):
    """Fixed-block storage dedup audit (B18 depth, r9 wave 10 — the
    ZFS/backup-style BLOCK dedup beside the document-level families):
    texts split into 64-char blocks on a generate_series offset grid
    (never a per-row Python loop), blocks keyed by md5, per-source
    dedup ratio = unique/total block bytes. Planted verbatim re-crawls
    (doc_id%11==7 duplicated) provide the redundancy a chunk store
    would reclaim; cross-doc block sharing is what DOCUMENT-level
    dedup can't see. One explode + two keyed aggs."""
    docs = _t(spark, sf_dir, "documents")
    dup = docs.filter(F.col("doc_id") % 11 == 7).select(
        (F.col("doc_id") + F.lit(500000)).alias("doc_id"), "source", "text"
    )
    corpus = docs.select("doc_id", "source", "text").unionByName(dup)
    chunks = corpus.select(
        "source",
        F.posexplode(
            F.expr(
                "transform(sequence(0, (length(text) - 1) div 64),"
                " i -> substring(text, i * 64 + 1, 64))"
            )
        ).alias("__i", "chunk"),
    ).select(
        "source",
        F.md5("chunk").alias("h"),
        F.length("chunk").cast("long").alias("blen"),
    )
    per_chunk = chunks.groupBy("source", "h").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.max("blen").alias("blen"),
    )
    return per_chunk.groupBy("source").agg(
        F.sum("n").cast("long").alias("n_blocks"),
        F.count(F.lit(1)).cast("long").alias("n_unique_blocks"),
        F.sum(F.col("n") * F.col("blen")).cast("long").alias("bytes_total"),
        F.sum("blen").cast("long").alias("bytes_unique"),
        F.expr("(sum(blen) * 1000000) div sum(n * blen)")
        .cast("long")
        .alias("unique_share_micros"),
    )


def q_b19_span_dups(spark, sf_dir):
    """Intra-corpus span-duplication screen (B19 depth, r10 — the
    train-train twin of the b29 train-test containment family, the
    C4/RefinedWeb verbatim-span filter signal): every 16-token window
    fingerprint (stride 8 — text.fingerprint_rows, the codegen rolling
    form), a window is DUPLICATED if its fingerprint appears in ≥ 2
    distinct docs, and the per-source report carries doc count, window
    counts, the duplicated-window share, and how many docs are
    majority-duplicated (2·dup ≥ total, integer-exact). Scale shape:
    fingerprint rows (codegen) → one fp-keyed distinct-doc agg
    (window-vocabulary-sized — shuffle-joined back, never broadcast) →
    one doc-keyed agg → one |sources|-row rollup; no pairwise join at
    all — the screen is linear where pair-based dedup is quadratic."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "source", "text")
    fps = textops.fingerprint_rows(docs, "doc_id", "text", 16, 8)
    shared = fps.groupBy("fp").agg(
        F.count_distinct("doc_id").alias("__nd")
    )
    per_doc = (
        fps.join(shared.hint("shuffle_hash"), "fp")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("__w"),
            F.sum(
                F.when(F.col("__nd") >= 2, F.lit(1)).otherwise(F.lit(0))
            ).alias("__d"),
        )
    )
    return (
        per_doc.join(docs.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("__w").cast("long").alias("total_windows"),
            F.sum("__d").cast("long").alias("dup_windows"),
            F.round(
                F.sum("__d").cast("double") / F.sum("__w").cast("double"), 6
            ).alias("dup_share"),
            F.sum(
                F.when(
                    F.col("__d") * 2 >= F.col("__w"), F.lit(1)
                ).otherwise(F.lit(0))
            )
            .cast("long")
            .alias("heavy_dup_docs"),
        )
    )


def q_b19_threshold_curve(spark, sf_dir):
    """Dedup threshold-sensitivity curve (B19 depth, r10): pair and
    affected-doc counts at Jaccard thresholds 0.5–0.9 from ONE exact
    set-similarity pass at the loosest threshold — the tuning read
    that decides a dedup threshold BEFORE committing a corpus build
    (each threshold is a filter over the same scored pair relation,
    never a re-run). Thresholds compare the round-6 jaccard both
    engines already agree on."""
    docs = _t(spark, sf_dir, "documents")
    mutated = docs.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + F.lit(200000)).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" zzz")).alias("text"),
    )
    corpus = docs.select("doc_id", "text").unionByName(mutated)
    pairs = dedup.set_similarity_join(
        corpus, "doc_id", "text", threshold=0.5
    ).localCheckpoint()
    grid = spark.createDataFrame(
        [(t / 10.0,) for t in range(5, 10)], "threshold double"
    )
    qual = pairs.crossJoin(F.broadcast(grid)).filter(
        F.col("jaccard") >= F.col("threshold")
    )
    docs_hit = (
        qual.select("threshold", F.col("id_a").alias("d"))
        .unionAll(qual.select("threshold", F.col("id_b").alias("d")))
        .groupBy("threshold")
        .agg(F.count_distinct("d").cast("long").alias("n_docs"))
    )
    return (
        qual.groupBy("threshold")
        .agg(F.count(F.lit(1)).cast("long").alias("n_pairs"))
        .join(docs_hit, "threshold")
        .select("threshold", "n_pairs", "n_docs")
    )


def q_b19_winnow_pairs(spark, sf_dir):
    """Winnowing pair screen (B19 × B21, r10 — the plagiarism-detector
    read on top of text.winnowed_fingerprints): doc pairs sharing ≥ 2
    selected fingerprints, with the shared count — unlike the stride
    screen (b19_span_dups), selection here carries the MOSS guarantee
    (any shared ≥ w+k−1 = 6-token run shares a selection), so a pair
    with enough shared verbatim runs CANNOT hide between strides. The
    pair join is fp-keyed and HOT-FINGERPRINT CAPPED
    (:func:`textops.winnow_pair_screen`, max_df=64): winnowing's
    per-window minima favor globally-small hashes, so a common gram's
    posting list is O(corpus); fingerprints in more than 64 docs are
    dropped before the self-join (MOSS's boilerplate suppression),
    bounding per-key fan-out at 64². Recall consequence: a run shared
    by >64 docs is reported only via rarer co-occurring fingerprints —
    the oracle replays the same cap."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    mutated = docs.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + F.lit(200000)).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" zzz")).alias("text"),
    )
    corpus = docs.unionByName(mutated)
    sel = textops.winnowed_fingerprints(corpus, "doc_id", k=3, window=4)
    # distinct fp per doc: shared-count = |fp-set intersection|
    return textops.winnow_pair_screen(
        sel, "doc_id", min_shared=2, max_df=64
    )


def q_b19_lsh_operating_point(spark, sf_dir):
    """MinHash-LSH operating-point audit (B19 depth, r11): measured vs
    analytic candidate-capture rate per exact-Jaccard bucket for the
    family's shipped config (32 hashes, 8 bands × r=4). Ground truth =
    the COMPLETE prefix-filter join at J ≥ 0.5; each true pair is
    flagged caught iff the banded LSH emitted it as a candidate; the
    analytic S-curve 1−(1−m⁴)⁸ at each bucket midpoint sits alongside —
    the before-you-commit read that says whether the (b, r) choice
    matches its textbook recall at each similarity level (a measured
    rate far under the curve means signature correlation from short
    docs). Exactness: the curve uses MULTIPLICATION CHAINS only (pow is
    not correctly rounded cross-engine; m·m·m·m is); bucket = floor of
    the round-6 jaccard both engines share. Shape: two proven kernels +
    one left-semi flag join + a ≤5-row agg."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    mutated = docs.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + F.lit(200000)).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" zzz")).alias("text"),
    )
    corpus = docs.unionByName(mutated)
    exact = dedup.set_similarity_join(
        corpus, "doc_id", "text", threshold=0.5
    ).localCheckpoint()
    cand = dedup.minhash_candidates(
        corpus, "doc_id", "text", num_hashes=32, bands=8, base_hash="md5"
    ).select("id_a", "id_b", F.lit(True).alias("__c"))
    flagged = exact.join(cand, ["id_a", "id_b"], "left").select(
        F.least(F.floor(F.col("jaccard") * 10), F.lit(9))
        .cast("int")
        .alias("bucket"),
        F.coalesce(F.col("__c"), F.lit(False)).alias("caught"),
    )
    m = (F.col("bucket").cast("double") + 0.5) / 10.0
    m2 = m * m
    m4 = m2 * m2
    x = F.lit(1.0) - m4
    x2 = x * x
    x4 = x2 * x2
    x8 = x4 * x4
    return (
        flagged.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.sum(F.col("caught").cast("long")).cast("long").alias(
                "n_caught"
            ),
        )
        .select(
            "bucket",
            F.round(F.col("bucket") / 10.0, 1).alias("j_lo"),
            "n_pairs",
            "n_caught",
            F.round(
                F.col("n_caught").cast("double") / F.col("n_pairs"), 6
            ).alias("caught_rate"),
            F.round(F.lit(1.0) - x8, 6).alias("analytic_rate"),
        )
    )


def q_b18_shingle_fingerprint_dups(spark, sf_dir):
    """Shingle-level EXACT-duplicate screen (B18 depth, r15 — VERDICT
    r14 item 7's suggested row; deterministic, not probabilistic —
    the gap between b18_dedup_exact's byte-identical texts and the
    b19 MinHash families): two documents are duplicates iff their
    DISTINCT word-5-gram shingle SETS are identical, so formatting /
    whitespace / punctuation drift (which normalize_text canonicalizes)
    and shingle ORDER cannot split a group, while a single changed
    word always does. Per doc: canonical fingerprint = md5 of the
    numerically-sorted distinct shingle hashes joined by ',' — a pure
    set identity, replayed bit-exactly by DuckDB's
    string_agg(... ORDER BY h). Output: one row per duplicate group.
    Scale: one shingle pass (codegen lead-window), per-doc sorted-set
    aggregation (state bounded by DOC length, never the corpus), one
    fingerprint agg — no pairs, no cartesian; at 100 TB the group-by
    ships one ~32-char fingerprint per document."""
    docs = _docs_with_dups(spark, sf_dir)
    rows = dedup.shingle_rows(docs, "doc_id", "text", k=5, unit="word")
    hashed = rows.select(
        "doc", dedup.portable_hash60(F.col("sh")).alias("h")
    )
    # one set-build per doc; n_shingles counts distinct HASHES (not
    # distinct shingle strings) so both legs and both engines use the
    # identical set semantics — a within-doc md5-60 collision can no
    # longer make the count diverge from the oracle's DISTINCT(doc, h)
    # granularity (ADVICE r15 item 2).
    per_doc = (
        hashed.groupBy("doc")
        .agg(F.array_sort(F.collect_set("h")).alias("hs"))
        .select(
            "doc",
            F.md5(
                F.concat_ws(
                    ",",
                    F.transform(F.col("hs"), lambda x: x.cast("string")),
                )
            ).alias("fp"),
            F.size("hs").cast("long").alias("n_shingles"),
        )
    )
    return (
        per_doc.groupBy("fp")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.min("doc").cast("long").alias("canonical_doc_id"),
            F.max("n_shingles").cast("long").alias("n_shingles"),
        )
        .filter(F.col("n_docs") >= 2)
    )
