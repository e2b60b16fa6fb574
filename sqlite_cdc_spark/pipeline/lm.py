"""Corpus language-model & retrieval statistics (SURVEY.md §2 B21/B30).

The scoring half of a training-data pipeline: TF-IDF term weighting, BM25
keyword retrieval, unigram language-model training + per-document
cross-entropy (the "perplexity filter" of web-corpus curation — CCNet,
Gopher, and most LLM data pipelines gate documents on LM score), and
BPE-style adjacent-pair counting (the inner statistic of tokenizer
training).

Scale shapes (all built-in expressions — whole-stage codegen, no Python
UDFs):

- Everything reduces to word-count-shaped aggregations: explode tokens →
  partial+final agg keyed by (doc, token) or (token). Spark's map-side
  combine keeps the shuffle proportional to DISTINCT keys per partition,
  not corpus tokens.
- Corpus-level scalars (doc count, total tokens, vocab size, avg doc len)
  are 1-row aggregates crossJoin-broadcast back — no driver round-trip,
  no collect.
- BPE pair counting explodes CHARACTER pairs only over the DISTINCT
  vocabulary weighted by word frequency (the classic word-frequency-dict
  optimization every real BPE trainer uses): corpus-side cost is one word
  count; the char-level work is bounded by |vocab|, not corpus size.

Float policy (oracle-exactness): ``ln`` differs from DuckDB by ≤1 ulp
(measured ~2e-15); every ln-derived output is rounded to 6 decimals and
any RANKING happens on the rounded value with a deterministic id
tie-break, so both engines rank identically.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .text import tokens


def token_rows(df: DataFrame, id_col: str, text_col: str = "text") -> DataFrame:
    """(id, tok) rows of the normalized whitespace tokens, empties
    dropped — the base relation every statistic here aggregates."""
    return df.select(
        F.col(id_col), F.explode(tokens(text_col)).alias("tok")
    ).filter(F.col("tok") != "")


def tf_idf(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    round_to: int = 6,
) -> DataFrame:
    """Per-(document, term) TF-IDF: ``tf * (ln((N+1)/(df+1)) + 1)``
    (smoothed idf, sklearn's formulation — never negative, never /0).

    Output: ``(id_col, tok, tf, df_t, tfidf)``. Two word-count aggs (one
    keyed by (doc,tok), one by tok) plus an equi-join on tok; N arrives
    as a broadcast 1-row aggregate. No collect, no global sort.

    ``df_t`` is broadcast EXPLICITLY: it is |vocab|-sized (Heaps-law
    sublinear — tens of MB at corpus scale), while the unhinted plan
    sort-merge-joins the full (doc, term) relation on the few-thousand-
    key ``tok`` column — a giant skewed sort whose fresh spill pages
    made this the board's one super-linear 10x-smoke family (min-of-3
    49 s -> 6 s at sf1x when hinted; AQE did NOT rescue the unhinted
    plan because the build side derives from the probe's own child).
    """
    toks = token_rows(df, id_col, text_col)
    tf = toks.groupBy(id_col, "tok").agg(F.count(F.lit(1)).alias("tf"))
    df_t = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df_t"))
    n_docs = df.select(
        F.count(F.lit(1)).cast("double").alias("__n_docs")
    )
    return (
        tf.join(F.broadcast(df_t), "tok")
        .crossJoin(F.broadcast(n_docs))
        .select(
            F.col(id_col),
            "tok",
            F.col("tf").cast("bigint").alias("tf"),
            F.col("df_t").cast("bigint").alias("df_t"),
            F.round(
                F.col("tf")
                * (
                    F.log(
                        (F.col("__n_docs") + F.lit(1.0))
                        / (F.col("df_t").cast("double") + F.lit(1.0))
                    )
                    + F.lit(1.0)
                ),
                round_to,
            ).alias("tfidf"),
        )
    )


def top_terms(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    k: int = 3,
) -> DataFrame:
    """Top-``k`` TF-IDF terms per document (rounded-score desc, token asc
    tie-break) — the keyword-extraction read of TF-IDF. Per-group window
    top-k over the aggregated (doc, term) relation: no global sort."""
    scored = tf_idf(df, id_col, text_col)
    w = Window.partitionBy(id_col).orderBy(
        F.col("tfidf").desc(), F.col("tok").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
    )


def bm25_search(
    df: DataFrame,
    id_col: str,
    query_terms: list[str],
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    top_k: int = 10,
) -> DataFrame:
    """BM25 keyword search: score every document against ``query_terms``
    and return the top-``top_k`` by rounded score (id asc tie-break).

    score(D) = Σ_t idf(t) · tf(t,D)·(k1+1) / (tf(t,D) + k1·(1−b+b·|D|/avgdl))
    idf(t)   = ln(1 + (N − df_t + 0.5)/(df_t + 0.5))   (Robertson/Sparck-Jones)

    Plan: doc lengths + avgdl + N are word-count-shaped aggregates (the
    scalar ones broadcast); the per-term side filters the token relation
    to the query's terms FIRST (a literal ``isin`` that pushes into the
    scan), so the scored relation is |matching docs × query terms|, not
    the corpus. Final top-k is a per-query ``row_number`` over the scored
    docs — `TakeOrderedAndProject`-sized, never a global sort of the corpus.
    """
    toks = token_rows(df, id_col, text_col)
    dl = toks.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("double").alias("__dl")
    )
    # N counts ALL input rows (consistent with tf_idf), not just docs
    # with >=1 token — an empty/punctuation-only doc is still a document
    # for idf purposes; avgdl stays the mean length of non-empty docs.
    scalars = dl.agg(F.avg("__dl").alias("__avgdl")).crossJoin(
        df.agg(F.count(F.lit(1)).cast("double").alias("__n_docs"))
    )
    qtoks = toks.filter(F.col("tok").isin([t.lower() for t in query_terms]))
    tf = qtoks.groupBy(id_col, "tok").agg(
        F.count(F.lit(1)).cast("double").alias("__tf")
    )
    df_t = tf.groupBy("tok").agg(F.count(F.lit(1)).cast("double").alias("__df"))
    scored = (
        tf.join(F.broadcast(df_t), "tok")
        .join(dl, id_col)
        .crossJoin(F.broadcast(scalars))
        .withColumn(
            "__idf",
            F.log(
                F.lit(1.0)
                + (F.col("__n_docs") - F.col("__df") + F.lit(0.5))
                / (F.col("__df") + F.lit(0.5))
            ),
        )
        .withColumn(
            "__term_score",
            F.col("__idf")
            * F.col("__tf")
            * F.lit(k1 + 1.0)
            / (
                F.col("__tf")
                + F.lit(k1)
                * (
                    F.lit(1.0 - b)
                    + F.lit(b) * F.col("__dl") / F.col("__avgdl")
                )
            ),
        )
        .groupBy(id_col)
        .agg(
            F.round(F.sum("__term_score"), 6).alias("score"),
            F.count(F.lit(1)).cast("bigint").alias("n_terms_hit"),
        )
    )
    w = Window.orderBy(F.col("score").desc(), F.col(id_col).asc())
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= top_k)
    )


def ql_search(
    df: DataFrame,
    id_col: str,
    query_terms: list[str],
    text_col: str = "text",
    mu: float = 2000.0,
    top_k: int = 10,
) -> DataFrame:
    """Query-likelihood retrieval with Dirichlet smoothing (Zhai &
    Lafferty) — the language-modeling IR baseline beside
    :func:`bm25_search` (BM25 weights term rarity, QL asks "how likely
    would this document generate the query"; they disagree usefully on
    short vs long documents, which is why rankers ensemble both).

    score(q, D) = Σ_{t∈q} ln( (tf_{t,D} + μ·cf_t/T) / (|D| + μ) )

    Computed in the rank-equivalent sparse form so only MATCHING
    (doc, term) rows are scored: ``Σ_matched ln(1 + tf·T/(μ·cf)) +
    |q|·ln(μ/(|D|+μ))`` — the first sum runs over |matching docs ×
    query terms| rows (the term filter pushes into the token relation
    before any agg, same plan discipline as BM25), the second is a
    per-doc constant from the doc-length table. Docs matching no term
    rank below every match by construction and are omitted (same
    contract as bm25_search). Collection stats (cf_t, T) broadcast; ln
    rounded to 6 with id tie-break.
    """
    toks = token_rows(df, id_col, text_col)
    dl = toks.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("double").alias("__dl")
    )
    terms = [t.lower() for t in query_terms]
    cf = (
        toks.filter(F.col("tok").isin(terms))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).cast("double").alias("__cf"))
    )
    big_t = toks.agg(F.count(F.lit(1)).cast("double").alias("__T"))
    tf = (
        toks.filter(F.col("tok").isin(terms))
        .groupBy(id_col, "tok")
        .agg(F.count(F.lit(1)).cast("double").alias("__tf"))
    )
    scored = (
        tf.join(F.broadcast(cf), "tok")
        .crossJoin(F.broadcast(big_t))
        .withColumn(
            "__term",
            F.log(
                F.lit(1.0)
                + F.col("__tf") * F.col("__T") / (F.lit(mu) * F.col("__cf"))
            ),
        )
        .groupBy(id_col)
        .agg(
            F.sum("__term").alias("__match"),
            F.count(F.lit(1)).cast("bigint").alias("n_terms_hit"),
        )
        .join(dl, id_col)
        .select(
            id_col,
            F.round(
                F.col("__match")
                + F.lit(float(len(terms)))
                * F.log(F.lit(mu) / (F.col("__dl") + F.lit(mu))),
                6,
            ).alias("score"),
            "n_terms_hit",
        )
    )
    w = Window.orderBy(F.col("score").desc(), F.col(id_col).asc())
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= top_k)
    )


def unigram_counts(
    df: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Corpus unigram counts ``(tok, cnt)`` — the trained "model" of the
    add-k unigram LM. One word-count aggregation."""
    return (
        df.select(F.explode(tokens(text_col)).alias("tok"))
        .filter(F.col("tok") != "")
        .groupBy("tok")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )


def doc_cross_entropy(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    add_k: float = 1.0,
    lm: DataFrame | None = None,
    round_to: int = 6,
) -> DataFrame:
    """Per-document cross-entropy under an add-k-smoothed unigram LM —
    the perplexity filter of corpus curation (documents the corpus LM
    finds "surprising" are boilerplate, gibberish, or off-distribution;
    gate on ``xent`` percentiles per language).

    H(D) = −(1/|D|) Σ_{t∈D} ln p(t),  p(t) = (cnt_t + k) / (T + k·V)

    ``lm`` defaults to the corpus itself (self-scoring); pass a held-out
    :func:`unigram_counts` frame to score against an external model.
    Unseen tokens under an external LM get the smoothing floor k/(T+kV).

    Algebraic shape for float stability AND scale: aggregate per-(doc,tok)
    INTEGER counts first, so the ln sum runs over distinct tokens per doc
    (``Σ c_t·ln(cnt_t+k)``), then ``H = ln(T+kV) − that/|D|``. The model
    join is an equi-join on tok; T and V broadcast as a 1-row aggregate.
    Output: ``(id_col, n_tok, xent)``, xent rounded to ``round_to``.
    """
    if lm is not None and add_k <= 0:
        # self-scoring guarantees cnt >= 1 for every token, but an
        # external model can miss tokens: with add_k=0 those hit ln(0)
        # and the xent silently goes NULL/-inf — make it an error.
        raise ValueError(
            "add_k must be > 0 when scoring against an external lm "
            "(unseen tokens need a smoothing floor)"
        )
    # The model relation feeds BOTH the (T, V) scalar agg and the token
    # join below, but do NOT localCheckpoint it (measured NEGATIVE, r7:
    # 3.1 s → 1.9 s on the corpus-v3 capstone after removing it): the
    # two references share the identical agg subplan, which AQE already
    # deduplicates via ReusedExchange, so a checkpoint only adds a
    # materialization job AND severs the reuse. The multi-reference
    # rule applies to references AQE can't line up (different
    # projections / post-processing), not to verbatim-shared subplans.
    model = lm if lm is not None else unigram_counts(df, text_col)
    scalars = model.agg(
        F.sum("cnt").cast("double").alias("__T"),
        F.count(F.lit(1)).cast("double").alias("__V"),
    )
    toks = token_rows(df, id_col, text_col)
    per_doc_tok = toks.groupBy(id_col, "tok").agg(
        F.count(F.lit(1)).cast("double").alias("__c")
    )
    joined = per_doc_tok.join(model, "tok", "left").withColumn(
        "__cnt", F.coalesce(F.col("cnt"), F.lit(0)).cast("double")
    )
    return (
        joined.groupBy(id_col)
        .agg(
            F.sum("__c").cast("bigint").alias("n_tok"),
            F.sum(
                F.col("__c") * F.log(F.col("__cnt") + F.lit(float(add_k)))
            ).alias("__num"),
        )
        .crossJoin(F.broadcast(scalars))
        .select(
            F.col(id_col),
            "n_tok",
            F.round(
                F.log(F.col("__T") + F.lit(float(add_k)) * F.col("__V"))
                - F.col("__num") / F.col("n_tok").cast("double"),
                round_to,
            ).alias("xent"),
        )
    )


def bigram_counts(
    df: DataFrame, id_col: str, text_col: str = "text"
) -> DataFrame:
    """Corpus bigram counts ``(a, b, cnt)`` over within-document adjacent
    token pairs (no BOS/EOS markers) — the trained bigram table. Same
    posexplode + window-lead codegen shape as :func:`fingerprint_rows`;
    one keyed agg."""
    ex = df.select(
        F.col(id_col).alias("__doc"),
        F.posexplode(tokens(text_col)).alias("pos", "tok"),
    ).filter(F.col("tok") != "")
    w = Window.partitionBy("__doc").orderBy("pos")
    return (
        ex.select(
            F.col("tok").alias("a"), F.lead("tok", 1).over(w).alias("b")
        )
        .filter(F.col("b").isNotNull())
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )


def doc_cross_entropy_bigram(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    lam: float = 0.7,
    add_k: float = 1.0,
    round_to: int = 6,
) -> DataFrame:
    """Per-document cross-entropy under an interpolated bigram LM — the
    KenLM-lite upgrade of :func:`doc_cross_entropy` (bigram context catches
    scrambled/boilerplate text a unigram model scores as normal):

        p(b|a) = λ · c(a,b)/c(a·)  +  (1−λ) · (c(b)+k)/(T+kV)
        H(D)   = −(1/|pairs(D)|) Σ ln p(b|a)

    with c(a·) the bigram-context total (so the MLE term sums to 1) and
    the unigram term add-k smoothed. Self-scored: every doc bigram exists
    in the model, so the MLE term is never 0/0. Docs with < 2 tokens have
    no bigrams and are absent from the output.

    Scale shape: per-(doc,a,b) INTEGER counts aggregate first (the ln
    runs over distinct doc-bigrams); model/context/unigram sides join by
    key; T and V broadcast. Output ``(id_col, n_pairs, xent)``.
    """
    ex = df.select(
        F.col(id_col), F.posexplode(tokens(text_col)).alias("pos", "tok")
    ).filter(F.col("tok") != "")
    w = Window.partitionBy(id_col).orderBy("pos")
    occ = ex.select(
        F.col(id_col),
        F.col("tok").alias("a"),
        F.lead("tok", 1).over(w).alias("b"),
    ).filter(F.col("b").isNotNull())
    per_doc = occ.groupBy(id_col, "a", "b").agg(
        F.count(F.lit(1)).cast("double").alias("__c")
    )
    gb = occ.groupBy("a", "b").agg(
        F.count(F.lit(1)).cast("double").alias("__cab")
    )
    ctx = occ.groupBy("a").agg(
        F.count(F.lit(1)).cast("double").alias("__ca")
    )
    uni = unigram_counts(df, text_col)
    scalars = uni.agg(
        F.sum("cnt").cast("double").alias("__T"),
        F.count(F.lit(1)).cast("double").alias("__V"),
    )
    k = float(add_k)
    p = F.lit(float(lam)) * (F.col("__cab") / F.col("__ca")) + F.lit(
        1.0 - float(lam)
    ) * ((F.col("cnt") + F.lit(k)) / (F.col("__T") + F.lit(k) * F.col("__V")))
    return (
        per_doc.join(gb, ["a", "b"])
        .join(ctx, "a")
        .join(uni.select(F.col("tok").alias("b"), "cnt"), "b")
        .crossJoin(F.broadcast(scalars))
        .groupBy(id_col)
        .agg(
            F.sum("__c").cast("bigint").alias("n_pairs"),
            F.sum(F.col("__c") * F.log(p)).alias("__num"),
        )
        .select(
            F.col(id_col),
            "n_pairs",
            F.round(
                -F.col("__num") / F.col("n_pairs").cast("double"), round_to
            ).alias("xent"),
        )
    )


def bpe_pair_counts(
    df: DataFrame,
    text_col: str = "text",
    top_n: int | None = None,
) -> DataFrame:
    """Adjacent character-pair frequencies — the statistic a BPE tokenizer
    trainer maximizes at each merge step (count pairs over the word-
    frequency dict, not the raw corpus).

    Corpus-side cost: ONE word count. The char-pair explode runs only
    over the distinct vocabulary (|vocab| rows, each ≤ word length
    pairs), weighted by word frequency — at 100 TB the vocab is a few
    hundred million rows regardless of corpus size, so the expensive part
    never scales with data volume. Output ``(pair, pair_count)`` (+
    ``rank`` when ``top_n``); ranking is over the aggregated pair table
    (alphabet², tiny).
    """
    vocab = (
        df.select(F.explode(tokens(text_col)).alias("tok"))
        .filter(F.length("tok") >= 2)
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("wcnt"))
    )
    pairs = (
        vocab.select(
            "wcnt",
            F.explode(
                F.sequence(F.lit(1), F.length("tok") - F.lit(1))
            ).alias("i"),
            F.col("tok"),
        )
        .select(
            F.substring(F.col("tok"), F.col("i"), F.lit(2)).alias("pair"),
            "wcnt",
        )
        .groupBy("pair")
        .agg(F.sum("wcnt").cast("bigint").alias("pair_count"))
    )
    if top_n is None:
        return pairs
    w = Window.orderBy(F.col("pair_count").desc(), F.col("pair").asc())
    return (
        pairs.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= top_n)
    )


def inverted_index(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    min_df: int = 1,
    max_df: int | None = None,
) -> DataFrame:
    """Posting lists per term: ``(tok, df_t, postings)`` with ``postings``
    the SORTED array of distinct doc ids containing the term — the
    retrieval-index build step.

    ``min_df``/``max_df`` bound the posting lists the way every real
    indexer does (drop hapaxes below, stopword-level terms above): a
    stopword's posting list is "every document" and collecting it as one
    array row is the scale hazard — gate it with ``max_df``. Plan: one
    distinct (doc,tok) agg, a count per tok, then ``sort_array
    (collect_list())`` per surviving term; everything keyed by tok, no
    global sort, no driver collection.
    """
    dt = (
        token_rows(df, id_col, text_col)
        .select(F.col(id_col).cast("bigint").alias("doc"), "tok")
        .distinct()
    )
    agg = dt.groupBy("tok").agg(
        F.count(F.lit(1)).cast("bigint").alias("df_t"),
        F.sort_array(F.collect_list("doc")).alias("postings"),
    )
    cond = F.col("df_t") >= min_df
    if max_df is not None:
        cond = cond & (F.col("df_t") <= max_df)
    return agg.filter(cond)


def boolean_search(
    df: DataFrame,
    id_col: str,
    query_terms: list[str],
    text_col: str = "text",
) -> DataFrame:
    """Conjunctive (AND) keyword retrieval: documents containing EVERY
    query term, with per-doc total term frequency as a crude relevance
    signal. The join-shaped boolean-retrieval plan — distinct (doc,term)
    rows filtered to the query terms, grouped by doc, kept when the
    distinct-term count equals |query| — never materializes posting
    arrays, so it scales where an `array_intersect` of collected posting
    lists would not. Output ``(id_col, n_hits)`` sorted by nothing
    (order-insensitive consumers)."""
    terms = sorted({t.lower() for t in query_terms})
    toks = token_rows(df, id_col, text_col).filter(F.col("tok").isin(terms))
    return (
        toks.groupBy(id_col)
        .agg(
            F.countDistinct("tok").alias("__nt"),
            F.count(F.lit(1)).cast("bigint").alias("n_hits"),
        )
        .filter(F.col("__nt") == len(terms))
        .drop("__nt")
    )


def pmi_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    window: int = 2,
    min_count: int = 5,
    round_to: int = 6,
) -> DataFrame:
    """Pointwise mutual information of co-occurring token pairs — the
    word2vec/GloVe-style association statistic (embedding prep, collocation
    mining, phrase detection).

    A co-occurrence is an UNORDERED pair within ``window`` forward
    positions in the same document (alphabetical pair orientation, so each
    skip-gram is counted once). With pair total P and unigram total T:

        pmi(a,b) = ln( (c_ab / P) / ((c_a / T) · (c_b / T)) )

    Plan: posexplode + ``lead`` columns (the fingerprint_rows codegen
    shape) emit pair rows; one keyed agg counts pairs; two equi-joins pull
    unigram counts; P and T broadcast as a 1-row aggregate. ``min_count``
    keeps the tail bounded. Output ``(tok_a, tok_b, n_pair, pmi)``.
    """
    ex = df.select(
        F.col(id_col).alias("__doc"),
        F.posexplode(tokens(text_col)).alias("pos", "tok"),
    ).filter(F.col("tok") != "")
    w = Window.partitionBy("__doc").orderBy("pos")
    # window expressions can't sit inside a generator — materialize the
    # lead columns in one projection, explode them in the next
    with_leads = ex.select(
        "tok",
        *[F.lead("tok", d).over(w).alias(f"__y{d}") for d in range(1, window + 1)],
    )
    pair_structs = F.array(
        *[
            F.struct(
                F.col("tok").alias("x"), F.col(f"__y{d}").alias("y")
            )
            for d in range(1, window + 1)
        ]
    )
    pairs = (
        with_leads.select(F.explode(pair_structs).alias("p"))
        .filter(F.col("p.y").isNotNull() & (F.col("p.y") != ""))
        .select(
            F.least("p.x", "p.y").alias("tok_a"),
            F.greatest("p.x", "p.y").alias("tok_b"),
        )
        .groupBy("tok_a", "tok_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_pair"))
    )
    uni = unigram_counts(df, text_col)
    scalars = pairs.agg(
        F.sum("n_pair").cast("double").alias("__P")
    ).crossJoin(uni.agg(F.sum("cnt").cast("double").alias("__T")))
    return (
        pairs.filter(F.col("n_pair") >= min_count)
        .join(uni.select(F.col("tok").alias("tok_a"), F.col("cnt").alias("__ca")), "tok_a")
        .join(uni.select(F.col("tok").alias("tok_b"), F.col("cnt").alias("__cb")), "tok_b")
        .crossJoin(F.broadcast(scalars))
        .select(
            "tok_a",
            "tok_b",
            "n_pair",
            F.round(
                F.log(
                    (F.col("n_pair").cast("double") / F.col("__P"))
                    / (
                        (F.col("__ca").cast("double") / F.col("__T"))
                        * (F.col("__cb").cast("double") / F.col("__T"))
                    )
                ),
                round_to,
            ).alias("pmi"),
        )
    )


def update_unigram_counts(
    model: DataFrame,
    inserts: DataFrame | None = None,
    deletes: DataFrame | None = None,
    text_col: str = "text",
) -> DataFrame:
    """Incrementally maintain :func:`unigram_counts` under a CDC batch —
    the LM-family member of the probe→merge→append loop (an UPDATE is its
    before-image in ``deletes`` plus its after-image in ``inserts``).

    Cost ∝ the BATCH's vocabulary, never the corpus: deltas are one
    word-count over the batch texts; the merge is a full-outer equi-join
    of the standing (tok, cnt) model against |batch vocab| delta rows.
    Tokens whose count falls to ≤0 drop out, so
    ``update_unigram_counts(unigram_counts(D), ins, del) ==
    unigram_counts(D ∪ ins − del)`` exactly (tested invariant).
    """
    deltas = []
    if inserts is not None:
        deltas.append(
            unigram_counts(inserts, text_col).select(
                "tok", F.col("cnt").alias("__d")
            )
        )
    if deletes is not None:
        deltas.append(
            unigram_counts(deletes, text_col).select(
                "tok", (-F.col("cnt")).alias("__d")
            )
        )
    if not deltas:
        return model
    delta = deltas[0]
    for d in deltas[1:]:
        delta = delta.unionByName(d)
    delta = delta.groupBy("tok").agg(F.sum("__d").alias("__d"))
    return (
        model.join(delta, "tok", "full_outer")
        .select(
            "tok",
            (
                F.coalesce(F.col("cnt"), F.lit(0))
                + F.coalesce(F.col("__d"), F.lit(0))
            )
            .cast("bigint")
            .alias("cnt"),
        )
        .filter(F.col("cnt") > 0)
    )


def kneser_ney_bigrams(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    discount: float = 0.75,
) -> DataFrame:
    """Kneser–Ney smoothed bigram probabilities — the standard n-gram
    smoothing (continuation counts instead of raw frequency for the
    backoff, absolute discounting for the MLE mass) behind every
    KenLM-style corpus LM:

        p_kn(b|a) = max(c(a,b) − D, 0)/c(a·)
                    + [D·N1+(a·)/c(a·)] · [N1+(·b)/N1+(··)]

    with D the absolute discount (default 0.75 — exactly representable
    in binary, so the arithmetic replays cross-engine), c(a·) the
    context total, N1+(a·)/N1+(·b) the distinct forward/backward
    continuation type counts, N1+(··) total bigram types. Everything up
    to the final ratios is integer; the ratio tree is written the same
    way in the SQL oracle, so values are bit-identical without any ln.

    Scale: one bigram-count agg (map-side combinable) + two keyed type
    counts + a 1-row type-total broadcast; the bigram table is
    multi-referenced so it is localCheckpoint'd once.

    Output: ``(a, b, cnt, p_kn, lam, p_cont)`` for every bigram type.
    """
    D = discount
    bg = bigram_counts(df, id_col, text_col).localCheckpoint()
    ctx = bg.groupBy("a").agg(
        F.sum("cnt").alias("__ca"), F.count(F.lit(1)).alias("__n1f")
    )
    bwd = bg.groupBy("b").agg(F.count(F.lit(1)).alias("__n1b"))
    nbt = bg.agg(F.count(F.lit(1)).alias("__nbt"))
    ca = F.col("__ca").cast("double")
    mle = F.greatest(F.col("cnt") - F.lit(D), F.lit(0.0)) / ca
    lam = (F.lit(D) * F.col("__n1f")) / ca
    p_cont = F.col("__n1b") / F.col("__nbt").cast("double")
    return (
        bg.join(ctx, "a")
        .join(bwd, "b")
        .crossJoin(F.broadcast(nbt))
        .select(
            "a",
            "b",
            "cnt",
            F.round(mle + lam * p_cont, 6).alias("p_kn"),
            F.round(lam, 6).alias("lam"),
            F.round(p_cont, 6).alias("p_cont"),
        )
    )


#: fixed demonstration merge list for the registered BPE query — the
#: deterministic stand-in for a trained merge table (same policy as the
#: PQ/IVF seed codebooks); includes multi-level merges (ta+b, tab+le)
#: so the ordered application path is genuinely exercised
BPE_DEMO_MERGES = (
    ("t", "a"), ("b", "l"), ("l", "e"), ("ta", "b"), ("tab", "le"),
    ("v", "a"), ("va", "l"), ("r", "o"), ("ro", "w"), ("f", "a"),
    ("fa", "s"), ("fas", "t"),
)


def bpe_train_merges(texts, n_merges: int = 32):
    """Train a BPE merge list from an in-memory text sample (pure
    Python, driver-side — the bounded-sample policy used for IVF
    centroid training; at scale feed it ``df.limit(n).collect()``).
    Deterministic: ties in pair frequency break lexicographically.
    Returns the ordered merge list consumed by :func:`bpe_encode_stats`.
    """
    import collections
    import re

    words = collections.Counter()
    for t in texts:
        for w in re.sub(r"[^a-z0-9]+", " ", t.lower()).split():
            words[w] += 1
    vocab = {w: list(w) for w in words}
    merges = []
    for _ in range(n_merges):
        pairs = collections.Counter()
        for w, syms in vocab.items():
            c = words[w]
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += c
        if not pairs:
            break
        best = max(pairs.items(), key=lambda kv: (kv[1], kv[0]))[0]
        merges.append(best)
        x, y = best
        for w, syms in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == x and syms[i + 1] == y:
                    out.append(x + y)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = out
    return merges


def bpe_encode_stats(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    merges=BPE_DEMO_MERGES,
) -> DataFrame:
    """Apply a BPE merge list to every document and report per-doc
    tokenization stats — the tokenizer-application half of the BPE
    story (:func:`bpe_pair_counts` is the training-statistics half).

    Entirely JVM-side codegen, no Python in the hot path: each word
    becomes a wrapped symbol string (``regexp_replace(w, '(.)',
    ' $1 ')`` → every symbol wrapped in its own spaces, adjacent
    symbols separated by exactly two spaces), and each merge (x, y) is
    ONE literal ``replace(s, ' x  y ', ' xy ')`` — left-to-right,
    non-overlapping, continuing after the replacement, which is
    exactly greedy BPE pass semantics (the wrapped form makes the
    shared-boundary case merge correctly: ' a  a  a  a ' → two 'aa'
    symbols, not one). Merges apply in training order as in any BPE
    encoder. The symbol count is then ``size(split(trim(s), '  '))``.

    Scale shape: one word explode + a narrow map of |merges| chained
    literal replaces + one keyed agg back to docs. A trained merge
    table from :func:`bpe_train_merges` drops straight in.

    Output: ``(id_col, n_words, n_chars, n_tokens, compression)`` —
    compression = chars per emitted token, rounded 6.
    """
    words = df.select(
        F.col(id_col).alias("__doc"),
        F.explode(tokens(text_col)).alias("__w"),
    ).filter(F.col("__w") != "")
    s = F.regexp_replace(F.col("__w"), "(.)", " $1 ")
    for x, y in merges:
        s = F.replace(s, F.lit(f" {x}  {y} "), F.lit(f" {x}{y} "))
    toks = F.size(F.split(F.trim(s), "  "))
    per_word = words.select(
        "__doc", F.length("__w").alias("__chars"), toks.alias("__toks")
    )
    return per_word.groupBy(F.col("__doc").alias(id_col)).agg(
        F.count(F.lit(1)).alias("n_words"),
        F.sum("__chars").cast("bigint").alias("n_chars"),
        F.sum("__toks").cast("bigint").alias("n_tokens"),
        F.round(
            F.sum("__chars") / F.sum("__toks").cast("double"), 6
        ).alias("compression"),
    )


def phrase_search(
    df: DataFrame,
    id_col: str,
    phrase: list[str],
    text_col: str = "text",
) -> DataFrame:
    """Positional phrase retrieval: documents where the phrase tokens
    occur ADJACENTLY in order — the operator boolean AND cannot express
    ("merge join" ≠ a doc with "merge" and "join" a paragraph apart).

    Plan: positional rows ``(id, pos, tok)`` filtered to the phrase
    vocabulary BEFORE any join (the posting-list discipline of
    :func:`boolean_search`), then the k-token phrase is k−1 equi-joins
    on ``(id, pos + offset)`` — each join's build side is |postings of
    one term|, never the corpus. Output ``(id_col, n_occurrences)``
    with one row per matching document."""
    if len(phrase) < 2:
        raise ValueError("phrase needs at least 2 tokens")
    terms = [t.lower() for t in phrase]
    pos = (
        df.select(
            F.col(id_col), F.posexplode(tokens(text_col)).alias("pos", "tok")
        )
        .filter(F.col("tok").isin(sorted(set(terms))))
    )
    cur = pos.filter(F.col("tok") == terms[0]).select(
        id_col, F.col("pos").alias("__p0")
    )
    for i, t in enumerate(terms[1:], start=1):
        nxt = pos.filter(F.col("tok") == t).select(
            id_col, (F.col("pos") - i).alias("__p0")
        )
        cur = cur.join(nxt, [id_col, "__p0"])
    return cur.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_occurrences")
    )


def rrf_fuse(
    ranked_a: DataFrame,
    ranked_b: DataFrame,
    id_col: str,
    k: int = 60,
    top_k: int = 10,
) -> DataFrame:
    """Reciprocal-rank fusion of two ranked retrieval lists (Cormack et
    al.'s public RRF: ``score = Σ 1/(k + rank)``) — the standard way to
    ensemble scorers whose raw scores aren't comparable (BM25's
    rarity-weighted sums vs QL's log-likelihoods). Inputs are top-k
    lists carrying a ``rank`` column, so the fusion is a full-outer
    join of two BOUNDED relations: absent ranks contribute 0, the
    fused top-``top_k`` re-ranks ≤ |a|+|b| rows (distributed
    limit-then-rank). Output ``(id, rrf_score, rank_a, rank_b,
    rank)``."""
    ra = ranked_a.select(id_col, F.col("rank").alias("rank_a"))
    rb = ranked_b.select(id_col, F.col("rank").alias("rank_b"))
    fused = ra.join(rb, id_col, "full_outer").select(
        id_col,
        "rank_a",
        "rank_b",
        F.round(
            F.coalesce(1.0 / (F.lit(k) + F.col("rank_a")), F.lit(0.0))
            + F.coalesce(1.0 / (F.lit(k) + F.col("rank_b")), F.lit(0.0)),
            6,
        ).alias("rrf_score"),
    )
    w = Window.orderBy(F.col("rrf_score").desc(), F.col(id_col).asc())
    return (
        fused.orderBy(F.col("rrf_score").desc(), F.col(id_col).asc())
        .limit(top_k)
        .withColumn("rank", F.row_number().over(w).cast("bigint"))
    )
