"""Registry query functions — decontam family (split from
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


def q_b29_decontamination(spark, sf_dir):
    """Benchmark decontamination (GPT-3-style exact 5-gram overlap): docs
    0-19 act as the eval set; the corpus is every other doc plus planted
    contaminated copies (each doc_id%10==5 doc gets bench doc 0's text
    appended). Complete keep/drop manifest, fully DuckDB-replayable (the
    join key is the raw n-gram string — no hashing)."""
    docs = _t(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") < 20).select("doc_id", "text")
    bench0 = docs.filter(F.col("doc_id") == 0).select(F.col("text").alias("bt"))
    planted = (
        docs.filter(F.col("doc_id") % 10 == 5)
        .crossJoin(F.broadcast(bench0))
        .select(
            (F.col("doc_id") + F.lit(300000)).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" "), F.col("bt")).alias("text"),
        )
    )
    corpus = (
        docs.filter(F.col("doc_id") >= 20)
        .select("doc_id", "text")
        .unionByName(planted)
    )
    return decontam.ngram_contamination(corpus, bench, "doc_id", "text", n=5)


def q_b29_containment(spark, sf_dir):
    """Fuzzy containment decontamination (B29 depth): windowed-fingerprint
    match — dense benchmark windows (stride 1) vs stride-8 corpus samples,
    guaranteeing detection of any shared run ≥ 23 tokens at 1/8 the
    corpus row volume of exact n-grams. Same planted fixture as
    b29_decontamination; the planted docs append a full benchmark text,
    so they must be flagged here too."""
    docs = _t(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") < 20).select("doc_id", "text")
    bench0 = docs.filter(F.col("doc_id") == 0).select(F.col("text").alias("bt"))
    planted = (
        docs.filter(F.col("doc_id") % 10 == 5)
        .crossJoin(F.broadcast(bench0))
        .select(
            (F.col("doc_id") + F.lit(300000)).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" "), F.col("bt")).alias("text"),
        )
    )
    corpus = (
        docs.filter(F.col("doc_id") >= 20)
        .select("doc_id", "text")
        .unionByName(planted)
    )
    return decontam.fingerprint_containment(corpus, bench, "doc_id", "text")


def q_b29_incremental_decontam(spark, sf_dir):
    """Incremental benchmark decontamination (r7, the CDC × B29
    composition): the benchmark 5-gram set is built ONCE as a standing
    index (checkpoint here; parquet at real scale), and a CDC batch of
    NEW documents — half planted-contaminated with bench doc 0's text,
    half clean suffix-mutations — is screened against it at cost ∝
    batch: the batch shingles (narrow), the standing gram set
    broadcasts, one keyed agg. The full-corpus b29_decontamination row
    proves the definition; THIS row proves the incremental path a
    streaming ingest pipeline actually runs (decontam.py:
    ngram_contamination(grams=...))."""
    docs = _t(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") < 20).select("doc_id", "text")
    standing = (
        dedup.shingle_rows(bench, "doc_id", "text", k=5, unit="word")
        .select("sh")
        .distinct()
        .localCheckpoint(eager=False)
    )
    bench0 = docs.filter(F.col("doc_id") == 0).select(F.col("text").alias("bt"))
    dirty = (
        docs.filter(F.col("doc_id") % 10 == 5)
        .crossJoin(F.broadcast(bench0))
        .select(
            (F.col("doc_id") + F.lit(500000)).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" "), F.col("bt")).alias("text"),
        )
    )
    clean = docs.filter(F.col("doc_id") % 10 == 6).select(
        (F.col("doc_id") + F.lit(600000)).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" qq")).alias("text"),
    )
    batch = dirty.unionByName(clean)
    return decontam.ngram_contamination(batch, None, grams=standing)


def q_b29_semantic_decontam(spark, sf_dir):
    """Semantic decontamination (B29 × B20, r7): every 50th vector acts
    as the benchmark/eval set; each remaining corpus vector reports its
    nearest benchmark item, max cosine, and the contamination flag —
    the paraphrase-level screen n-gram overlap can't express
    (similarity.py: semantic_contamination; exact fold arithmetic, the
    flag compares the ROUNDED score so it replays cross-engine)."""
    emb = _t(spark, sf_dir, "embeddings")
    bench = emb.filter(F.col("vec_id") % 50 == 0)
    corpus = emb.filter(F.col("vec_id") % 50 != 0)
    return similarity.semantic_contamination(corpus, bench, threshold=0.35)


def q_b29_semantic_decontam_ann(spark, sf_dir):
    """Semantic decontamination at corpus scale (B29 × B20, r8 —
    VERDICT r7 item 6): same benchmark/corpus split as
    b29_semantic_decontam, but candidates come from the portable
    integer-LSH bucket equi-join (12 tables × 4 planes — the measured
    recall-1.0 config on the fixture — with benchmark-side multiprobe) and the exact cosine scorer runs on candidate pairs
    only — never a corpus×benchmark product (similarity.py:
    semantic_contamination_bucketed). Every step is integer-exact or
    rounded-fold arithmetic, so the oracle replays candidates AND
    scores bit-for-bit; no-collision vectors surface as clean
    (max_cos 0.0) in the complete manifest."""
    emb = _t(spark, sf_dir, "embeddings")
    bench = emb.filter(F.col("vec_id") % 50 == 0)
    corpus = emb.filter(F.col("vec_id") % 50 != 0)
    return similarity.semantic_contamination_bucketed(
        corpus, bench, threshold=0.35, dim=64, n_planes=4, n_tables=12
    )


def q_b29_decontam_venn(spark, sf_dir):
    """Defense-in-depth decontamination audit (B29 capstone, r11): the
    Venn of the two screens the family ships — exact 5-gram overlap
    (the GPT-3 recipe) vs embedding-space similarity (the paraphrase
    catcher) — over the SAME benchmark split (every 50th id). Corpus
    docs bucket into ngram_only / semantic_only / both / clean with
    shares: the overlap report papers publish to justify running both
    screens (a large semantic_only mass means n-gram alone leaks
    paraphrases; a large both mass means the cheap screen suffices).
    Composes two individually-oracled kernels; final rollup is one
    4-row agg + broadcast total."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    ng = decontam.ngram_contamination(
        docs.filter(F.col("doc_id") % 50 != 0),
        docs.filter(F.col("doc_id") % 50 == 0),
    ).select("doc_id", F.col("contaminated").alias("__ng"))
    emb = _t(spark, sf_dir, "embeddings")
    sem = similarity.semantic_contamination(
        emb.filter(F.col("vec_id") % 50 != 0),
        emb.filter(F.col("vec_id") % 50 == 0),
        threshold=0.35,
    ).select(
        F.col("vec_id").alias("doc_id"),
        F.col("contaminated").alias("__sem"),
    )
    j = ng.join(sem, "doc_id")
    cat = (
        F.when(F.col("__ng") & F.col("__sem"), "both")
        .when(F.col("__ng"), "ngram_only")
        .when(F.col("__sem"), "semantic_only")
        .otherwise("clean")
    )
    tot = j.agg(F.count(F.lit(1)).cast("long").alias("__t"))
    return (
        j.select(cat.alias("caught_by"))
        .groupBy("caught_by")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
        .crossJoin(F.broadcast(tot))
        .select(
            "caught_by",
            "n_docs",
            F.round(F.col("n_docs").cast("double") / F.col("__t"), 6).alias(
                "share"
            ),
        )
    )
