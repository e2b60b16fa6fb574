"""Registry query functions — text family (split from
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


def q_b21_heaps_curve(spark, sf_dir):
    """Heaps'-law vocabulary growth (B21 QA depth): distinct-token count
    after each decile of the corpus (doc_id order) — natural corpora
    grow ~n^β (β≈0.5); a flattening curve means template text, a linear
    one means noise. NO iteration: each token's FIRST-SEEN decile is one
    min-agg, the cumulative count is a running sum over the 10-row
    decile relation. The vocabulary unit is the character 4-gram of the
    normalized text (the fixture's word vocab saturates in decile 0;
    4-grams keep growing, which is the curve shape the operator
    exists to measure)."""
    from pyspark.sql import Window

    docs = _t(spark, sf_dir, "documents")
    n_docs = docs.agg(F.count(F.lit(1)).cast("double").alias("__n"))
    toks = (
        docs.crossJoin(F.broadcast(n_docs))
        .select(
            F.least(
                F.lit(9),
                F.floor(
                    F.col("doc_id").cast("double") * 10.0 / F.col("__n")
                ),
            )
            .cast("bigint")
            .alias("decile"),
            F.explode(dedup.char_shingles("text", k=4)).alias("tok"),
        )
        .filter(F.col("tok") != "")
    )
    first_seen = toks.groupBy("tok").agg(F.min("decile").alias("first_decile"))
    per_decile = first_seen.groupBy("first_decile").agg(
        F.count(F.lit(1)).cast("bigint").alias("new_tokens")
    )
    w = Window.orderBy("first_decile").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return per_decile.select(
        F.col("first_decile").alias("decile"),
        "new_tokens",
        F.sum("new_tokens").over(w).cast("bigint").alias("vocab_size"),
    )


def q_b21_readability(spark, sf_dir):
    """Readability scoring (B21 depth): Flesch-style reading ease with a
    vowel-run syllable proxy — sentences ≈ docs here (fixture text has no
    punctuation after normalization), so the formula reduces to the
    words-per-doc and syllables-per-word terms. Pure regexp/length
    arithmetic: narrow map + rounding, no shuffle beyond the final
    projection."""
    docs = _t(spark, sf_dir, "documents")
    n_words = textops.token_count("text")
    syllables = F.size(
        F.regexp_extract_all(
            F.lower(F.col("text")), F.lit("[aeiouy]+"), 0
        )
    ).cast("double")
    score = F.round(
        F.lit(206.835)
        - F.lit(1.015) * n_words.cast("double")
        - F.lit(84.6) * (syllables / F.greatest(n_words, F.lit(1)).cast("double")),
        6,
    )
    return docs.select(
        "doc_id",
        n_words.alias("n_words"),
        syllables.cast("bigint").alias("n_syllables"),
        score.alias("flesch"),
    )


def q_b21_zipf_fit(spark, sf_dir):
    """Zipf-law fit (B21 QA depth): the log-log slope of the top-100
    token rank-frequency curve — natural text sits near slope −1;
    corpora dominated by templates/boilerplate flatten or steepen. The
    regression runs over the 100-row aggregate (closed-form OLS on
    (ln rank, ln freq)); the corpus-side work is one word count."""
    from pyspark.sql import Window

    docs = _t(spark, sf_dir, "documents")
    counts = (
        docs.select(F.explode(textops.tokens("text")).alias("tok"))
        .filter(F.col("tok") != "")
        .groupBy("tok")
        .agg(F.count(F.lit(1)).cast("double").alias("n"))
    )
    w = Window.orderBy(F.col("n").desc(), F.col("tok").asc())
    top = counts.withColumn("r", F.row_number().over(w).cast("double")).filter(
        F.col("r") <= 100
    )
    xy = top.select(
        F.log("r").alias("x"), F.log("n").alias("y")
    )
    agg = xy.agg(
        F.count(F.lit(1)).cast("double").alias("k"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    return agg.select(
        F.col("k").cast("bigint").alias("n_points"),
        F.round(
            (F.col("k") * F.col("sxy") - F.col("sx") * F.col("sy"))
            / (F.col("k") * F.col("sxx") - F.col("sx") * F.col("sx")),
            6,
        ).alias("zipf_slope"),
    )


def q_b21_corpus_card(spark, sf_dir):
    """Per-source corpus card (B21 QA depth): docs, tokens, mean quality,
    and language entropy per source — the summary table a data card /
    datasheet publishes. Language entropy −Σ p·ln p is computed from
    exact per-(source,lang) counts (one keyed agg) so the only float work
    is |sources|×|langs| rows; everything else is partial+final aggs."""
    docs = _t(spark, sf_dir, "documents")
    feats = textops.quality_features(
        docs.select("doc_id", "source", "lang", "text")
    )
    per_source = feats.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("q_tokens").cast("bigint").alias("sum_tok"),
        F.round(F.avg("quality_score"), 6).alias("mean_quality"),
    )
    from pyspark.sql import Window

    lang_counts = docs.groupBy("source", "lang").agg(
        F.count(F.lit(1)).cast("double").alias("__c")
    )
    ent = (
        lang_counts.withColumn(
            "__n", F.sum("__c").over(Window.partitionBy("source"))
        )
        .groupBy("source")
        .agg(
            F.round(
                -F.sum(
                    (F.col("__c") / F.col("__n"))
                    * F.log(F.col("__c") / F.col("__n"))
                ),
                6,
            ).alias("lang_entropy")
        )
    )
    return per_source.join(ent, "source")


def q_b21_lang_quality(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    feats = textops.quality_features(docs)
    return feats.select(
        "doc_id",
        textops.lang_id("text").alias("lang_guess"),
        "q_chars",
        "q_tokens",
        "q_mean_tok_len",
        "q_alpha_ratio",
        "q_stopword_ratio",
        "quality_score",
    )


def q_b21_token_stats(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return (
        docs.select(
            "lang",
            "source",
            textops.token_count("text").alias("n_tok"),
            textops.bpe_ish_token_count("text").alias("n_bpe"),
            textops.fingerprint("text").alias("fp"),
        )
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").alias("sum_tok"),
            F.sum("n_bpe").alias("sum_bpe"),
            F.count_distinct(F.col("fp")).alias("n_distinct_fp"),
        )
    )


def q_b21_token_per_doc(spark, sf_dir):
    """Per-document token canary (B21 depth): doc-level token counts +
    fingerprint, un-aggregated — localizes any future tokenization
    divergence to the exact doc_id in one driver run instead of a
    lang-level hash mismatch."""
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        textops.token_count("text").alias("n_tok"),
        textops.bpe_ish_token_count("text").alias("n_bpe"),
        textops.fingerprint("text").alias("fp"),
    )


def q_b21_top_tokens(spark, sf_dir):
    """Corpus vocabulary stats (B21 depth): top-10 tokens per language by
    raw count with a total tie-break (count desc, token asc) — the vocab
    coverage / tokenizer-fit check of corpus QA. One explode pass into a
    partial+final agg, then a per-group window top-k: no global sort, no
    driver collection."""
    from pyspark.sql import Window

    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(
        "lang", F.explode(textops.tokens("text")).alias("tok")
    ).filter(F.col("tok") != "")
    counts = toks.groupBy("lang", "tok").agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("lang").orderBy(F.col("n").desc(), F.col("tok").asc())
    return (
        counts.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= 10)
    )


def q_b21_fingerprints(spark, sf_dir):
    """Rolling windowed fingerprints (B21 depth): stride-8 md5 over
    16-token windows, exploded to (doc_id, win_idx, fp) — the building
    block for fuzzy containment / plagiarism-style matching. Uses the
    codegen row form (textops.fingerprint_rows: posexplode + window
    leads), output-identical to exploding the array-form
    rolling_fingerprints but free of interpreted HOF lambdas."""
    docs = _t(spark, sf_dir, "documents")
    return textops.fingerprint_rows(docs, "doc_id", "text")


def q_b21_chunking(spark, sf_dir):
    """Document chunking (B21/B24 depth): 16-token chunks every 12 tokens
    (4-token overlap) — the training/RAG prep step, emitted as rows with
    per-chunk token counts (textops.chunk_rows, codegen path)."""
    docs = _t(spark, sf_dir, "documents")
    return textops.chunk_rows(docs, "doc_id", "text", chunk_tokens=16, overlap=4)


def q_b21_nchars_histogram(spark, sf_dir):
    """n-chars distribution over documents (B21): 50-char buckets with
    count + share, per language."""
    docs = _t(spark, sf_dir, "documents")
    bucket = (F.floor(F.col("n_chars") / 50) * 50).cast("bigint")
    per_lang = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("lang_total"))
    hist = (
        docs.groupBy("lang", bucket.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .join(per_lang, "lang")
        .select(
            "lang",
            "bucket",
            "n_docs",
            F.round(
                F.col("n_docs").cast("double") / F.col("lang_total").cast("double"), 6
            ).alias("share"),
        )
    )
    return hist


def q_b21_pii_scrub(spark, sf_dir):
    """PII audit + redaction over planted emails/phones/IPs (engine-equal
    character-class regexes: no lookarounds, no backrefs)."""
    docs = _t(spark, sf_dir, "documents")
    injected = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 13 == 0,
                F.lit(" reach me at first.last+spam@example.co.uk ok"),
            ).otherwise(F.lit("")),
            F.when(
                F.col("doc_id") % 17 == 0, F.lit(" call +1 (555) 123-4567 now")
            ).otherwise(F.lit("")),
            F.when(
                F.col("doc_id") % 19 == 0, F.lit(" server at 10.0.42.7 down")
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    counts = textops.pii_counts("text")
    return injected.select(
        "doc_id",
        counts["email"].alias("n_email"),
        counts["phone"].alias("n_phone"),
        counts["ipv4"].alias("n_ip"),
        textops.redact_pii("text").alias("redacted"),
    )


def q_b21_repetition(spark, sf_dir):
    """Gopher-style repetition filters: distinct-token ratio, top-token
    ratio, duplicate-2-gram ratio per document."""
    docs = _t(spark, sf_dir, "documents")
    return textops.repetition_features(docs, "doc_id", "text")


def q_b21_tfidf(spark, sf_dir):
    """TF-IDF keyword extraction (B21/B30 depth): top-3 terms per document
    by smoothed TF-IDF (sklearn idf: ln((N+1)/(df+1))+1), rounded-score
    ranking with a token tie-break so both engines rank identically. Two
    word-count aggs + a vocab equi-join; N broadcasts as a 1-row agg
    (lm.py: tf_idf / top_terms)."""
    docs = _t(spark, sf_dir, "documents")
    return lm.top_terms(docs, "doc_id", k=3)


def q_b21_bm25(spark, sf_dir):
    """BM25 keyword search (B21/B30 depth): top-15 documents for a fixed
    3-term query (k1=1.2, b=0.75, Robertson idf). The term filter pushes
    into the token relation before any agg, so the scored side is
    |matching docs × 3|, never the corpus (lm.py: bm25_search)."""
    docs = _t(spark, sf_dir, "documents")
    return lm.bm25_search(
        docs, "doc_id", ["merge", "join", "batch"], top_k=15
    )


def q_b21_perplexity(spark, sf_dir):
    """Unigram-LM cross-entropy per document (B21/B30 depth) — the
    perplexity filter of corpus curation (CCNet-style): self-scored
    add-1-smoothed unigram LM, H = ln(T+V) − (Σ c_t·ln(cnt_t+1))/n.
    Integer counts aggregate first; ln runs over distinct (doc,token)
    pairs only; model totals broadcast (lm.py: doc_cross_entropy)."""
    docs = _t(spark, sf_dir, "documents")
    return lm.doc_cross_entropy(docs, "doc_id")


def q_b21_bpe_pairs(spark, sf_dir):
    """BPE-trainer pair statistics (B21/B30 depth): top-50 adjacent
    character pairs by frequency, counted over the word-frequency dict —
    the corpus-side cost is ONE word count; char-level work is bounded by
    |vocab|, not corpus bytes (lm.py: bpe_pair_counts)."""
    docs = _t(spark, sf_dir, "documents")
    return lm.bpe_pair_counts(docs, top_n=50)


def q_b21_quality_gate(spark, sf_dir):
    """Per-language percentile quality gate (B21 depth): drop each
    language's bottom quartile by composite quality score — percentile
    thresholds transfer across languages where absolute ones don't.
    percent_rank is exact integer arithmetic over a total (score, id)
    order, so the kept set replays identically on any engine
    (text.py: quality_gate over quality_features)."""
    docs = _t(spark, sf_dir, "documents")
    feats = textops.quality_features(docs.select("doc_id", "lang", "text"))
    return textops.quality_gate(feats).select(
        "doc_id", "lang", "quality_score", "pctile"
    )


def q_b21_lang_confusion(spark, sf_dir):
    """Language-ID confusion matrix (B21 QA depth): labeled lang vs the
    stopword-heuristic guess, with counts — the accuracy read of the
    lang-ID operator over the corpus (text.py: lang_id)."""
    docs = _t(spark, sf_dir, "documents")
    return (
        docs.select("lang", textops.lang_id("text").alias("lang_guess"))
        .groupBy("lang", "lang_guess")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )


def q_b21_dup_ngram_coverage(spark, sf_dir):
    """Per-document duplicated-5-gram ratio (B19/B21 depth): fraction of
    each doc's DISTINCT word 5-grams that occur in ≥2 documents — the
    memorization-risk gate from the dedup literature (a doc of mostly
    corpus-repeated boilerplate trains memorization). Integer counts +
    one rounded ratio; shingle pass + gram-df agg + one join, no pairs
    (dedup.py: dup_ngram_coverage)."""
    docs = _t(spark, sf_dir, "documents")
    return dedup.dup_ngram_coverage(docs, "doc_id", k=5)


def q_b21_lexical_diversity(spark, sf_dir):
    """Per-document lexical diversity (B21 depth): type-token ratio +
    Shannon entropy of each doc's token distribution — the
    distributional boilerplate/SEO-spam signal complementing the
    surface repetition rules. Integer counts to the final ln, rounded
    at 6 (cross-engine ln ulp rule); empty docs kept with NULL scores
    (text.py: lexical_diversity)."""
    docs = _t(spark, sf_dir, "documents")
    return textops.lexical_diversity(docs, "doc_id")


def q_b21_quantile_norm(spark, sf_dir):
    """Cross-source quantile normalization (B21/B28 depth, r7): map each
    document's length onto the GLOBAL length distribution via its
    within-source percentile — the calibration step that makes
    heterogeneous sources comparable before any shared threshold (a
    "long" doc from a short-form source and a "long" doc from a
    long-form source land on the same normalized scale). Bucket index
    is PURE INTEGER arithmetic ``((rank−1)·100) div (n−1)`` — a float
    percent_rank times 100 can floor-flip at exact hundredths — and
    the 101 global quantile edges come from one exact-percentile
    aggregate, broadcast. Per-source window is the only corpus
    shuffle."""
    from pyspark.sql import Window

    docs = _t(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    w = Window.partitionBy("source").orderBy(
        F.col("n_chars").asc(), F.col("doc_id").asc()
    )
    wn = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    ranked = docs.select(
        "doc_id",
        "source",
        "n_chars",
        F.row_number().over(w).alias("__r"),
        F.count(F.lit(1)).over(wn).alias("__n"),
    ).select(
        "doc_id",
        "source",
        "n_chars",
        F.when(
            F.col("__n") > 1,
            F.expr("CAST(((__r - 1) * 100) DIV (__n - 1) AS INT)"),
        )
        .otherwise(F.lit(0))
        .alias("pct_idx"),
    )
    ps = ", ".join(f"{i / 100.0!r}D" for i in range(101))
    edges = docs.agg(
        F.expr(f"percentile(n_chars, array({ps}))").alias("__edges")
    )
    return (
        ranked.crossJoin(F.broadcast(edges))
        .select(
            "doc_id",
            "source",
            "n_chars",
            "pct_idx",
            F.round(
                F.element_at(F.col("__edges"), F.col("pct_idx") + 1), 6
            ).alias("normalized"),
        )
    )


def q_b21_source_kl(spark, sf_dir):
    """Per-source distribution divergence (B21/B28 depth, r8): KL of
    each source's Laplace-smoothed unigram distribution against the
    corpus-wide distribution, summed over the FULL shared vocabulary
    (absent tokens contribute their smoothed mass — the exact
    definition, not an observed-support shortcut). The data-mixing
    diagnostic that ranks sources by how far they sit from the blend:
    a near-zero source is redundant, an extreme one is templated or
    off-domain. Shape: token counts are keyed aggs; the |V|·|S| grid
    is vocab ⋈ broadcast(sources) ⋈ per-source counts (left) — keyed,
    never a pair blowup; each term floor-quantized to 1e-8 so the
    per-source total is an order-independent integer sum (the b3_psi
    engine-exactness recipe)."""
    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(
        "source", F.explode(textops.tokens("text")).alias("tok")
    ).filter(F.col("tok") != "")
    st = toks.groupBy("source", "tok").agg(
        F.count(F.lit(1)).cast("long").alias("__nst")
    )
    ct = toks.groupBy("tok").agg(F.count(F.lit(1)).cast("long").alias("__nt"))
    stot = toks.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("__ns")
    )
    gtot = toks.agg(
        F.count(F.lit(1)).cast("long").alias("__n"),
        F.countDistinct("tok").cast("long").alias("__v"),
    )
    grid = ct.crossJoin(F.broadcast(stot.select("source", "__ns")))
    cells = (
        grid.join(st, ["source", "tok"], "left")
        .crossJoin(F.broadcast(gtot))
        .select(
            "source",
            "__ns",
            "__v",
            (
                (F.coalesce(F.col("__nst"), F.lit(0)) + 1)
                / (F.col("__ns") + F.col("__v")).cast("double")
            ).alias("__p"),
            (
                (F.col("__nt") + 1)
                / (F.col("__n") + F.col("__v")).cast("double")
            ).alias("__q"),
        )
    )
    term = F.col("__p") * F.log(F.col("__p") / F.col("__q"))
    return (
        cells.select(
            "source", "__ns", "__v", F.floor(term * 1e8).cast("long").alias("__t8")
        )
        .groupBy("source")
        .agg(
            F.min("__ns").alias("n_tokens"),
            F.min("__v").alias("vocab_size"),
            F.round(F.sum("__t8") / 1e8, 6).alias("kl_vs_corpus"),
        )
    )


def q_b21_oov_rate(spark, sf_dir):
    """Per-source out-of-vocabulary rate (B21 depth, r9): token share
    not covered by the corpus top-200 vocabulary — the tokenizer-fit /
    domain-shift metric a mixture owner reads per source. The vocab is
    a distributed ``orderBy().limit`` top-k (count desc, token asc —
    deterministic), broadcast to a left join over the token relation;
    two keyed aggs. Shuffle ∝ token rows."""
    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(
        "source", F.explode(textops.tokens(F.col("text"))).alias("tok")
    ).filter(F.col("tok") != "")
    vocab = (
        toks.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("__cnt"))
        .orderBy(F.col("__cnt").desc(), F.col("tok").asc())
        .limit(200)
        .select("tok", F.lit(1).alias("__inv"))
    )
    joined = toks.join(F.broadcast(vocab), "tok", "left")
    return joined.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        F.sum(F.when(F.col("__inv").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_oov"),
        F.round(
            F.sum(F.when(F.col("__inv").isNull(), 1).otherwise(0)).cast(
                "double"
            )
            / F.count(F.lit(1)).cast("double"),
            6,
        ).alias("oov_rate"),
    )


def q_b21_calibration(spark, sf_dir):
    """Quality-classifier calibration audit (B21 depth, r9 wave 6): the
    reliability-diagram table for the composite quality score against a
    deterministic reference label (lang == 'en', the score's stopword
    leg is English — so the row also documents the score's language
    bias). Ten score deciles; per bin the mean predicted score and the
    observed positive rate, both as INTEGER micros (sum of per-row
    floor-micros, integer division — no float accumulation touches the
    hash), and the |calibration gap| a weighted ECE would integrate.
    One keyed agg over the per-doc feature pass."""
    docs = _t(spark, sf_dir, "documents")
    feats = textops.quality_features(docs.select("doc_id", "lang", "text"))
    binned = feats.select(
        F.least(F.floor(F.col("quality_score") * 10), F.lit(9))
        .cast("int")
        .alias("bin"),
        F.floor(F.col("quality_score") * 1e6).cast("long").alias("__sm"),
        F.when(F.col("lang") == "en", 1).otherwise(0).cast("long").alias(
            "__pos"
        ),
    )
    per = binned.groupBy("bin").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("__pos").cast("long").alias("n_pos"),
        F.sum("__sm").alias("__ssm"),
    )
    return per.select(
        "bin",
        "n",
        "n_pos",
        F.expr("__ssm div n").cast("long").alias("mean_score_micros"),
        F.expr("(n_pos * 1000000) div n").cast("long").alias(
            "pos_rate_micros"
        ),
        F.abs(
            F.expr("__ssm div n") - F.expr("(n_pos * 1000000) div n")
        ).cast("long").alias("gap_micros"),
    )


def q_b21_rake_keywords(spark, sf_dir):
    """RAKE-style keyword extraction (B21 depth, r9 wave 10): candidate
    phrases are maximal stopword-free token runs (phrase id = running
    stopword count per doc — one keyed window over the token relation,
    bounded by doc length); each word scores degree (Σ lengths of the
    phrases containing it, self included — the RAKE co-occurrence
    proxy) over frequency, as integer micros. Top-20 keywords by that
    ratio — the unsupervised keyword surface beside TF-IDF's
    corpus-weighted one."""
    from pyspark.sql import Window

    docs = _t(spark, sf_dir, "documents")
    sw = [w for w in textops.STOPWORDS["en"]]
    toks = docs.select(
        "doc_id", F.posexplode(textops.tokens(F.col("text"))).alias("pos", "tok")
    ).withColumn("is_sw", F.col("tok").isin(sw).cast("int"))
    wp = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    phrased = toks.withColumn("phrase_id", F.sum("is_sw").over(wp)).filter(
        F.col("is_sw") == 0
    )
    plen = phrased.groupBy("doc_id", "phrase_id").agg(
        F.count(F.lit(1)).cast("long").alias("plen")
    )
    scored = (
        phrased.join(plen, ["doc_id", "phrase_id"])
        .groupBy("tok")
        .agg(
            F.count(F.lit(1)).cast("long").alias("freq"),
            F.sum("plen").cast("long").alias("degree"),
        )
        .select(
            "tok",
            "freq",
            "degree",
            F.expr("(degree * 1000000) div freq").cast("long").alias(
                "rake_micros"
            ),
        )
    )
    w = Window.orderBy(
        F.col("rake_micros").desc(), F.col("freq").desc(), F.col("tok").asc()
    )
    return (
        scored.orderBy(
            F.col("rake_micros").desc(), F.col("freq").desc(), F.col("tok").asc()
        )
        .limit(20)
        .withColumn("rank", F.row_number().over(w).cast("bigint"))
    )


def q_b21_winnowing(spark, sf_dir):
    """Winnowing fingerprint selection (B21/B19 depth, r10 — the MOSS
    algorithm, text.winnowed_fingerprints): per doc the selected
    fingerprint count, selection density, and min selected hash, from
    k=3-gram hashes winnowed with window w=4 (rightmost-minimum rule).
    Unlike stride fingerprints, any shared run of w+k−1 = 6 tokens is
    GUARANTEED to share a selection (pytest-proven against a literal
    pure-Python reference); density ≈ 2/(w+1). Integer/md5 arithmetic
    end to end — the oracle replays every selection decision."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    sel = textops.winnowed_fingerprints(docs, "doc_id", k=3, window=4)
    per = sel.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_selected"),
        F.min("fp").alias("min_fp"),
    )
    n_tok = F.size(textops.tokens("text"))
    grams = docs.select(
        "doc_id",
        F.greatest(n_tok - F.lit(2), F.lit(1)).cast("long").alias("n_grams"),
    )
    return per.join(grams, "doc_id").select(
        "doc_id",
        "n_grams",
        "n_selected",
        F.round(
            F.col("n_selected").cast("double") / F.col("n_grams"), 6
        ).alias("density"),
        "min_fp",
    )


def q_b21_blocklist(spark, sf_dir):
    """Token-join blocklist screen (B21 depth, r10): per source, how
    many docs contain any blocked term, the flagged share, total hits,
    and distinct blocked terms seen. The scale point vs a regex
    alternation: the blocklist is a RELATION broadcast into a token
    equi-join, so a 100k-term list costs one hash probe per token
    where the compiled-regex scan degrades with pattern count — this
    is how wordlist filters (NSFW/spam) actually run at corpus scale.
    Zero-hit docs are counted via the per-source totals, not a join."""
    TERMS = ["slow", "sort", "merge", "batch"]
    docs = _t(spark, sf_dir, "documents").select("doc_id", "source", "text")
    bl = spark.createDataFrame([(t,) for t in TERMS], "tok string")
    tok = docs.select(
        "doc_id", "source", F.explode(textops.tokens("text")).alias("tok")
    )
    hits = tok.join(F.broadcast(bl), "tok")
    per_doc = hits.groupBy("doc_id", "source").agg(
        F.count(F.lit(1)).alias("__h"),
        F.count_distinct("tok").alias("__t"),
    )
    totals = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )
    flagged = per_doc.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_flagged"),
        F.sum("__h").cast("long").alias("total_hits"),
        F.max("__t").cast("long").alias("max_terms_in_doc"),
    )
    return totals.join(flagged, "source", "left").select(
        "source",
        "n_docs",
        F.coalesce("n_flagged", F.lit(0)).cast("long").alias("n_flagged"),
        F.round(
            F.coalesce("n_flagged", F.lit(0)).cast("double") / F.col("n_docs"),
            6,
        ).alias("flag_share"),
        F.coalesce("total_hits", F.lit(0)).cast("long").alias("total_hits"),
        F.coalesce("max_terms_in_doc", F.lit(0))
        .cast("long")
        .alias("max_terms_in_doc"),
    )


def q_b21_filter_matrix(spark, sf_dir):
    """Quality-filter rule matrix (B21 depth, r10 — the Gopher-style
    rule breakdown a corpus build reads before committing thresholds):
    four integer-compare rules — too short (n_tok < 25), low lexical
    diversity (2·distinct < total), repetition (top-token share > 12%,
    as 100·topc > 12·n), too long (n_tok > 90) — with per-rule kill
    counts AND the overlap reads that decide whether rules are
    redundant: docs failing ANY rule, and docs failing ≥ 2. One
    tokenize pass + one per-doc top-token window + one agg; every rule
    decision is an integer compare, so no float threshold can drift
    across engines. Output: (rule, n_failed, fail_share)."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    toks = textops.tokens("text")
    base = docs.select(
        "doc_id",
        F.explode(toks).alias("tok"),
    )
    topc = (
        base.groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("__c"))
        .groupBy("doc_id")
        .agg(F.max("__c").alias("__topc"))
    )
    per = docs.select(
        "doc_id",
        F.size(toks).cast("long").alias("__nt"),
        F.size(F.array_distinct(toks)).cast("long").alias("__nd"),
    ).join(topc, "doc_id")
    flags = per.select(
        (F.col("__nt") < 25).alias("r_short"),
        (F.col("__nd") * 2 < F.col("__nt")).alias("r_lowdiv"),
        (F.col("__topc") * 100 > F.col("__nt") * 12).alias("r_rep"),
        (F.col("__nt") > 90).alias("r_long"),
    ).select(
        "*",
        (
            F.col("r_short") | F.col("r_lowdiv") | F.col("r_rep")
            | F.col("r_long")
        ).alias("r_any"),
        (
            F.col("r_short").cast("int")
            + F.col("r_lowdiv").cast("int")
            + F.col("r_rep").cast("int")
            + F.col("r_long").cast("int")
            >= 2
        ).alias("r_multi"),
    )
    agg = flags.agg(
        F.count(F.lit(1)).alias("__n"),
        *[
            F.sum(F.col(c).cast("long")).alias(c)
            for c in ("r_short", "r_lowdiv", "r_rep", "r_long", "r_any",
                      "r_multi")
        ],
    )
    stacked = agg.selectExpr(
        "__n",
        "stack(6, 'short', r_short, 'low_diversity', r_lowdiv, "
        "'repetition', r_rep, 'long', r_long, 'any', r_any, "
        "'multi', r_multi) AS (rule, n_failed)",
    )
    return stacked.select(
        "rule",
        F.col("n_failed").cast("long").alias("n_failed"),
        F.round(F.col("n_failed").cast("double") / F.col("__n"), 6).alias(
            "fail_share"
        ),
    )


def q_b21_fertility(spark, sf_dir):
    """Tokenizer fertility audit per source (B21 depth, r11): the
    corpus-report metric tokenizer papers lead with — sub-word tokens
    per whitespace word ("fertility") and bytes per sub-word token —
    computed with the shipped BPE-ish pre-tokenizer proxy
    (:func:`textops.bpe_ish_token_count`). High-fertility sources waste
    sequence length at training time; the knapsack/mixture samplers
    read this to price sources in tokens rather than documents. Shape:
    pure narrow per-doc counts (regex + split, codegen) → one keyed
    agg; ratios are divisions of exact integer sums, round 6."""
    docs = _t(spark, sf_dir, "documents").select("source", "text")
    per = docs.select(
        "source",
        textops.token_count("text").alias("__ws"),
        textops.bpe_ish_token_count("text").alias("__bpe"),
        F.octet_length("text").cast("bigint").alias("__bytes"),
    )
    agg = per.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("__ws").cast("long").alias("ws_tokens"),
        F.sum("__bpe").cast("long").alias("bpe_tokens"),
        F.sum("__bytes").cast("long").alias("n_bytes"),
    )
    return agg.select(
        "source",
        "n_docs",
        "ws_tokens",
        "bpe_tokens",
        "n_bytes",
        F.round(
            F.col("bpe_tokens").cast("double") / F.col("ws_tokens"), 6
        ).alias("fertility"),
        F.round(
            F.col("n_bytes").cast("double") / F.col("bpe_tokens"), 6
        ).alias("bytes_per_token"),
    )


def q_b21_burstiness(spark, sf_dir):
    """Word burstiness screen (B21 depth, r11): the top-20 most BURSTY
    tokens among those in ≥20 docs — variance-to-mean ratio (index of
    dispersion) of per-document counts over ALL documents, zeros
    included. VMR ≈ 1 is Poisson background vocabulary; VMR ≫ 1 is a
    token that clumps (topical or boilerplate) — the Katz/Church
    signal behind "burstiness-aware" TF weighting, and a cheap
    template detector (a navigation token repeated 30× in a few docs
    outranks a uniformly common word). Exactness: with n docs, total
    count c, per-doc squares Σx² — VMR = (n·Σx² − c²)/(n·c), a SINGLE
    division of exact integers, round 6; rank on the rounded value
    with token tie-break. One (doc,tok) agg + one tok agg +
    TakeOrdered 20."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    ndocs = docs.agg(F.count(F.lit(1)).cast("long").alias("__n"))
    dt = (
        docs.select(
            "doc_id", F.explode(textops.tokens("text")).alias("tok")
        )
        .filter(F.col("tok") != "")
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).cast("long").alias("__x"))
    )
    per = dt.groupBy("tok").agg(
        F.count(F.lit(1)).cast("long").alias("df"),
        F.sum("__x").cast("long").alias("__c"),
        F.sum(F.col("__x") * F.col("__x")).cast("long").alias("__xx"),
    )
    vmr = F.round(
        (F.col("__n") * F.col("__xx") - F.col("__c") * F.col("__c")).cast(
            "double"
        )
        / (F.col("__n") * F.col("__c")).cast("double"),
        6,
    )
    return (
        per.filter(F.col("df") >= 20)
        .crossJoin(F.broadcast(ndocs))
        .select("tok", "df", F.col("__c").alias("n_occ"), vmr.alias("vmr"))
        .orderBy(F.col("vmr").desc(), F.col("tok").asc())
        .limit(20)
    )


def q_b21_langid_margin(spark, sf_dir):
    """Language-ID confidence margin (B21 QA depth, r11 — the
    CALIBRATION read next to b21_lang_confusion's accuracy matrix):
    per labeled language × decision margin (top stopword-hit score
    minus runner-up, capped at 5+), how many docs and how many the
    argmax guess got right — low-margin cells are where lang-ID
    mistakes concentrate, so a router gating on margin knows exactly
    what it trades. Integer hit counts end to end; margin via a
    descending sort of the 5-score array (ties → margin 0). One
    narrow scoring map + one keyed agg."""
    docs = _t(spark, sf_dir, "documents").select("lang", "text")
    scores = textops.lang_scores("text")
    arr = F.sort_array(
        F.array(*[scores[lang] for lang in sorted(textops.STOPWORDS)]),
        asc=False,
    )
    margin = F.least(
        F.element_at(arr, 1) - F.element_at(arr, 2), F.lit(5).cast("bigint")
    )
    correct = (textops.lang_id("text") == F.col("lang")).cast("long")
    return (
        docs.select(
            "lang", margin.alias("margin"), correct.alias("__ok")
        )
        .groupBy("lang", "margin")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("__ok").cast("long").alias("n_correct"),
        )
    )
