"""Registry query functions — retrieval family (split from
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


def q_b30_query_expansion(spark, sf_dir):
    """PMI query expansion (B30 retrieval depth): the top-5 co-occurrence
    partners per seed term by PMI (count ≥ 8) — the statistical
    related-terms read used to widen keyword queries. One filter over
    the PMI pair relation per seed orientation; per-seed window top-k
    (lm.py: pmi_pairs)."""
    from pyspark.sql import Window

    docs = _t(spark, sf_dir, "documents")
    seeds = ["merge", "join", "batch"]
    pairs = lm.pmi_pairs(docs, "doc_id", window=2, min_count=8)
    partners = pairs.filter(F.col("tok_a").isin(seeds)).select(
        F.col("tok_a").alias("seed"),
        F.col("tok_b").alias("partner"),
        "n_pair",
        "pmi",
    ).unionByName(
        pairs.filter(F.col("tok_b").isin(seeds)).select(
            F.col("tok_b").alias("seed"),
            F.col("tok_a").alias("partner"),
            "n_pair",
            "pmi",
        )
    )
    w = Window.partitionBy("seed").orderBy(
        F.col("pmi").desc(), F.col("partner").asc()
    )
    return (
        partners.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= 5)
    )


def q_b30_inverted_index(spark, sf_dir):
    """Inverted-index build (B30 depth): posting lists per term with df
    bounds (min_df drops hapaxes; max_df is the stopword guard whose
    posting list would be 'every doc' — the scale hazard; the fixture's
    31-token vocab all sits near df≈0.8N, so the bounds here are wide).
    Distinct (doc,tok) agg → per-term count + sort_array(collect_list)
    (lm.py: inverted_index). The library API returns the posting list as
    array<bigint>; the DRIVER row serializes it to a csv string — the
    r5 driver canonicalizer cannot factorize list dtypes (VERDICT r5
    item 1), and integer→string formatting is engine-identical."""
    docs = _t(spark, sf_dir, "documents")
    idx = lm.inverted_index(docs, "doc_id", min_df=2, max_df=100_000)
    return idx.select(
        "tok",
        "df_t",
        F.concat_ws(",", F.col("postings").cast("array<string>")).alias(
            "postings_csv"
        ),
    )


def q_b30_pmi(spark, sf_dir):
    """PMI co-occurrence pairs (B30 depth): unordered token pairs within
    2 forward positions, min_count=8, pmi = ln((c_ab/P)/((c_a/T)(c_b/T)))
    — the word2vec/GloVe association statistic. posexplode + lead pair
    emission (codegen), one keyed agg, two unigram equi-joins, P and T
    broadcast (lm.py: pmi_pairs)."""
    docs = _t(spark, sf_dir, "documents")
    return lm.pmi_pairs(docs, "doc_id", window=2, min_count=8)


def q_b30_incremental_lm(spark, sf_dir):
    """Incremental unigram-LM maintenance under CDC (B30 depth): docs with
    doc_id%7==0 are UPDATEd (text + ' zzz'), doc_id%11==0 (and not %7)
    DELETEd; the standing (tok,cnt) model is merged with batch deltas at
    cost ∝ batch vocab — never re-counting the corpus. Oracle recomputes
    from scratch over the effective corpus, so the driver row IS the
    streaming-equals-batch invariant (lm.py: update_unigram_counts)."""
    docs = _t(spark, sf_dir, "documents")
    upd = docs.filter(F.col("doc_id") % 7 == 0)
    dels = upd.select("text").unionByName(
        docs.filter((F.col("doc_id") % 11 == 0) & (F.col("doc_id") % 7 != 0))
        .select("text")
    )
    ins = upd.select(F.concat(F.col("text"), F.lit(" zzz")).alias("text"))
    model = lm.unigram_counts(docs)
    return lm.update_unigram_counts(model, inserts=ins, deletes=dels)


def q_b30_bool_search(spark, sf_dir):
    """Conjunctive keyword retrieval (B30 depth): docs containing ALL of
    three terms, join-shaped (distinct doc-term rows → having count =
    |query|) — no posting arrays materialized (lm.py: boolean_search)."""
    docs = _t(spark, sf_dir, "documents")
    return lm.boolean_search(docs, "doc_id", ["merge", "join", "batch"])


def q_b30_bigram_xent(spark, sf_dir):
    """Interpolated bigram-LM cross-entropy per document (B30 depth) —
    the KenLM-lite upgrade of the unigram perplexity filter: p(b|a) =
    0.7·MLE-bigram + 0.3·add-1-unigram; bigram context catches scrambled
    text a unigram model scores as normal. Integer doc-bigram counts
    aggregate before the ln; model/context/unigram equi-joins; T,V
    broadcast (lm.py: doc_cross_entropy_bigram)."""
    docs = _t(spark, sf_dir, "documents")
    return lm.doc_cross_entropy_bigram(docs, "doc_id")


def q_b30_assoc_rules(spark, sf_dir):
    """Session-basket association rules (B30 depth, r7): support,
    confidence (both directions) and lift for every unordered pair of
    event types co-occurring in a session — the market-basket statistic
    behind recommendation and next-action heuristics (PMI's b30 row is
    token-window co-occurrence; THIS is basket-level with the
    confidence/lift decision numbers attached). Baskets = sessionized
    (user, session) with DISTINCT items; pairs via one equi-join on the
    basket key (items/basket is small and bounded, never a cartesian of
    sessions); all counts integer, ratios rounded 6."""
    ev = _t(spark, sf_dir, "events").select("event_id", "user_id", "ts", "event_type")
    s = derive.sessionize(ev, "user_id", "ts", "event_id")
    items = s.select(
        F.col("user_id"), F.col("session_id"), F.col("event_type").alias("item")
    ).distinct()
    n_baskets = items.select("user_id", "session_id").distinct().agg(
        F.count(F.lit(1)).cast("long").alias("__N")
    )
    supp = items.groupBy("item").agg(F.count(F.lit(1)).cast("long").alias("__s"))
    a = items.select("user_id", "session_id", F.col("item").alias("item_a"))
    b = items.select("user_id", "session_id", F.col("item").alias("item_b"))
    pairs = (
        a.join(b, ["user_id", "session_id"])
        .filter(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_ab"))
    )
    sa = supp.select(F.col("item").alias("item_a"), F.col("__s").alias("n_a"))
    sb = supp.select(F.col("item").alias("item_b"), F.col("__s").alias("n_b"))
    return (
        pairs.join(F.broadcast(sa), "item_a")
        .join(F.broadcast(sb), "item_b")
        .crossJoin(F.broadcast(n_baskets))
        .select(
            "item_a",
            "item_b",
            "n_ab",
            "n_a",
            "n_b",
            F.round(F.col("n_ab") / F.col("n_a").cast("double"), 6).alias(
                "conf_a_to_b"
            ),
            F.round(F.col("n_ab") / F.col("n_b").cast("double"), 6).alias(
                "conf_b_to_a"
            ),
            F.round(
                F.col("__N") * F.col("n_ab")
                / (F.col("n_a") * F.col("n_b")).cast("double"),
                6,
            ).alias("lift"),
        )
    )


def q_b30_ql_search(spark, sf_dir):
    """Dirichlet query-likelihood retrieval (B30 depth, r7): the
    language-modeling ranking baseline beside BM25, same fixed 3-term
    query — rankers ensemble both because they disagree on short vs
    long documents. Sparse rank-equivalent form: only matching
    (doc, term) rows are scored; collection stats broadcast (lm.py:
    ql_search)."""
    docs = _t(spark, sf_dir, "documents")
    return lm.ql_search(
        docs, "doc_id", ["merge", "join", "batch"], mu=2000.0, top_k=15
    )


def q_b30_pagerank(spark, sf_dir):
    """PageRank over the customer↔supplier purchase graph (B30 graph
    depth, joining dup_clusters as the second iterative graph
    algorithm): 3 exact integer iterations — rational damping 17/20,
    floor-division shares, integer teleport base — so every
    intermediate rank vector replays bit-for-bit in the oracle's
    chained CTEs. Per iteration: one src-keyed equi-join + one
    dst-keyed sum with map-side combine; edges/outdegs checkpointed
    once (derive.py: pagerank). Top 30 nodes by rank (supplier ids
    offset by 1e6)."""
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    ed = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .select(
            F.col("o_custkey").alias("c"),
            (F.col("l_suppkey") + 1000000).alias("s"),
        )
        .distinct()
    )
    # distinct by construction: ed is distinct and the two union halves
    # are disjoint (c < 1e6 <= s), so the kernel's defensive distinct
    # (one exchange + agg) is skipped via assume_distinct
    edges = ed.select(F.col("c").alias("src"), F.col("s").alias("dst")).union(
        ed.select(F.col("s").alias("src"), F.col("c").alias("dst"))
    )
    from pyspark.sql import Window

    pr = derive.pagerank(edges, iters=3, assume_distinct=True)
    w = Window.orderBy(F.col("rank_units").desc(), F.col("node_id").asc())
    return (
        pr.orderBy(F.col("rank_units").desc(), F.col("node_id").asc())
        .limit(30)
        .withColumn("rnk", F.row_number().over(w))
    )


def q_b30_triangles(spark, sf_dir):
    """Triangle counting + local clustering coefficient (B30 graph
    depth) over the user co-activity graph: users who share ≥ 5
    distinct (event_type, hour) activity buckets are linked; the
    ordered-wedge join counts each triangle a<b<c exactly once
    (forward-degree bound = the classic hub-skew guard), then each
    corner is credited via one explode + keyed sum. cc from exact
    integers, rounded at 6 (derive.py: triangle_stats). Edge build is
    an equi-join on the bucket — hot buckets are the C(n,2) cost, AQE
    splits them."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id", "event_type", F.date_trunc("hour", "ts").alias("h")
    ).distinct()
    co = (
        ev.alias("a")
        .join(
            ev.alias("b"),
            (F.col("a.event_type") == F.col("b.event_type"))
            & (F.col("a.h") == F.col("b.h"))
            & (F.col("a.user_id") < F.col("b.user_id")),
        )
        .groupBy(
            F.col("a.user_id").alias("src"), F.col("b.user_id").alias("dst")
        )
        .agg(F.count(F.lit(1)).alias("__n"))
        .filter(F.col("__n") >= 5)
        .select("src", "dst")
    )
    return derive.triangle_stats(co)


def q_b30_kneser_ney(spark, sf_dir):
    """Kneser–Ney smoothed bigram LM (B30 LM depth) — absolute
    discounting + continuation-count backoff, the smoothing the
    interpolated add-k bigram scorer (b30_bigram_xent) approximates.
    D = 0.75 is exactly representable, every count is integer, and the
    ratio tree is mirrored verbatim in the oracle, so all probability
    columns replay bit-for-bit (lm.py: kneser_ney_bigrams)."""
    docs = _t(spark, sf_dir, "documents")
    return lm.kneser_ney_bigrams(docs, "doc_id")


def q_b30_bpe_encode(spark, sf_dir):
    """BPE tokenizer APPLICATION (B30 depth — b21_bpe_pairs is the
    training-statistics half): per-doc symbol counts after applying an
    ordered merge list, entirely in JVM codegen — wrapped-symbol
    strings + one literal replace per merge reproduce greedy BPE pass
    semantics exactly, so the oracle unrolls the same replace chain.
    Fixed demo merges (trained-table stand-in, same policy as the PQ
    seed codebooks); bpe_train_merges supplies real ones (lm.py:
    bpe_encode_stats)."""
    docs = _t(spark, sf_dir, "documents")
    return lm.bpe_encode_stats(docs, "doc_id")


def q_b30_index_compression(spark, sf_dir):
    """Posting-list compression audit (B30 index depth): the
    delta+varint arithmetic every search index lives on — per term,
    doc-id gaps via lag() (postings are sorted by construction),
    varint size = 7-bit-group count by integer thresholds, reported as
    raw-vs-encoded bytes per df-decile bucket. Pure integer logic, one
    window + two keyed aggs; certifies the size model an index
    capacity plan would use."""
    from pyspark.sql import Window

    docs = _t(spark, sf_dir, "documents")
    dt = (
        docs.select(
            F.col("doc_id"),
            F.explode(textops.tokens("text")).alias("tok"),
        )
        .filter(F.col("tok") != "")
        .distinct()
    )
    w = Window.partitionBy("tok").orderBy(F.col("doc_id").asc())
    gaps = dt.select(
        "tok",
        (
            F.col("doc_id")
            - F.coalesce(F.lag("doc_id", 1).over(w), F.lit(0))
        ).alias("__gap"),
    )
    vbytes = (
        F.when(F.col("__gap") < 128, 1)
        .when(F.col("__gap") < 16384, 2)
        .when(F.col("__gap") < 2097152, 3)
        .otherwise(4)
    )
    per_term = gaps.groupBy("tok").agg(
        F.count(F.lit(1)).alias("__df"),
        F.sum(vbytes).cast("long").alias("__vb"),
    )
    # integer thresholds, not floor(log10(df)): log10 of an exact power
    # of ten is not guaranteed exactly representable, and a 1-ulp
    # undershoot would flip the floor cross-engine
    bucket = (
        F.when(F.col("__df") < 10, 0)
        .when(F.col("__df") < 100, 1)
        .when(F.col("__df") < 1000, 2)
        .when(F.col("__df") < 10000, 3)
        .otherwise(4)
    )
    return (
        per_term.groupBy(bucket.alias("df_decade"))
        .agg(
            F.count(F.lit(1)).alias("n_terms"),
            F.sum("__df").cast("long").alias("n_postings"),
            (F.sum("__df") * 8).cast("long").alias("raw_bytes"),
            F.sum("__vb").cast("long").alias("varint_bytes"),
        )
        .select(
            "df_decade",
            "n_terms",
            "n_postings",
            "raw_bytes",
            "varint_bytes",
            F.round(
                F.col("raw_bytes") / F.col("varint_bytes").cast("double"), 6
            ).alias("compression_x"),
        )
    )


def q_b30_phrase_search(spark, sf_dir):
    """Positional phrase retrieval (B30 depth, r8): docs where "merge
    join" occurs as an ADJACENT ordered pair — the query shape boolean
    AND cannot express. Postings filtered to the phrase vocabulary
    before the (id, pos+offset) equi-join chain (lm.py:
    phrase_search); output is per-doc occurrence counts."""
    docs = _t(spark, sf_dir, "documents")
    return lm.phrase_search(docs, "doc_id", ["merge", "join"])


def q_b30_rrf_fusion(spark, sf_dir):
    """Hybrid-retrieval rank fusion (B30 depth, r8): the BM25 and
    Dirichlet-QL top-15 lists for the same query fuse by reciprocal
    rank (Σ 1/(60+rank) — the standard ensemble for scorers whose raw
    scales don't compare); full-outer join of two BOUNDED lists, fused
    top-10 via distributed limit-then-rank (lm.rrf_fuse)."""
    docs = _t(spark, sf_dir, "documents")
    terms = ["merge", "join", "batch"]
    return lm.rrf_fuse(
        lm.bm25_search(docs, "doc_id", terms, top_k=15),
        lm.ql_search(docs, "doc_id", terms, mu=2000.0, top_k=15),
        "doc_id",
        k=60,
        top_k=10,
    )


def q_b30_ndcg(spark, sf_dir):
    """Ranking-quality evaluation (B30 depth, r9): nDCG@10 of the BM25
    ranking against a deterministic graded relevance (occurrences of
    'merge', capped at 3). The log2 discount is pre-scaled to the
    shared integer weight table ``_NDCG_W`` — embedded as the SAME
    literals on both engines — so DCG and ideal-DCG are pure integer
    dot products; the only float is the final ratio. One row out."""
    docs = _t(spark, sf_dir, "documents")
    rel = docs.select(
        "doc_id",
        F.least(
            F.size(
                F.filter(
                    textops.tokens(F.col("text")), lambda t: t == "merge"
                )
            ).cast("long"),
            F.lit(3),
        ).alias("rel"),
    )
    wmap = F.array(*[F.lit(w) for w in _NDCG_W])
    retrieved = lm.bm25_search(
        docs, "doc_id", ["merge", "join", "batch"], top_k=10
    ).select("doc_id", F.col("rank").cast("int").alias("rank"))
    dcg = (
        retrieved.join(rel, "doc_id", "left")
        .select(
            (
                F.coalesce(F.col("rel"), F.lit(0))
                * F.element_at(wmap, F.col("rank"))
            ).alias("__w")
        )
        .agg(F.sum("__w").cast("long").alias("dcg_scaled"))
    )
    from pyspark.sql import Window

    ideal_top = rel.orderBy(F.col("rel").desc(), F.col("doc_id").asc()).limit(
        10
    )
    wi = Window.orderBy(F.col("rel").desc(), F.col("doc_id").asc())
    idcg = (
        ideal_top.withColumn("rank", F.row_number().over(wi))
        .select(
            (F.col("rel") * F.element_at(wmap, F.col("rank"))).alias("__w")
        )
        .agg(F.sum("__w").cast("long").alias("idcg_scaled"))
    )
    return (
        dcg.crossJoin(F.broadcast(idcg))
        .select(
            "dcg_scaled",
            "idcg_scaled",
            F.round(
                F.col("dcg_scaled").cast("double")
                / F.col("idcg_scaled").cast("double"),
                6,
            ).alias("ndcg"),
        )
    )


def q_b30_kwic(spark, sf_dir):
    """Keyword-in-context snippets (B30 retrieval depth, r9 wave 2):
    for every 'merge join' phrase hit (the b30_phrase_search adjacency
    join), the ±3-token context window sliced out of the token array —
    the retrieval-UX op behind search-result highlighting. Match
    positions are bounded by phrase frequency and broadcast back into
    the token relation; the slice bounds are computed as identical
    integer expressions on both engines."""
    docs = _t(spark, sf_dir, "documents")
    tk = docs.select("doc_id", textops.tokens(F.col("text")).alias("toks"))
    pos = tk.select(
        "doc_id", F.posexplode("toks").alias("pos", "tok")
    )
    a = pos.filter(F.col("tok") == "merge").select("doc_id", "pos")
    b = pos.filter(F.col("tok") == "join").select(
        "doc_id", (F.col("pos") - 1).alias("pos")
    )
    matches = a.join(b, ["doc_id", "pos"]).distinct()
    j = tk.join(F.broadcast(matches), "doc_id")
    begin = F.greatest(F.col("pos") - 3, F.lit(0)) + 1
    end = F.least(F.col("pos") + 5, F.size("toks"))
    return j.select(
        "doc_id",
        F.col("pos").cast("int").alias("pos"),
        F.array_join(
            F.slice(F.col("toks"), begin, end - begin + 1), " "
        ).alias("snippet"),
    )


def q_b30_bfs_hops(spark, sf_dir):
    """Multi-round BFS frontier expansion (B30 graph depth, r9 wave 4 —
    the frontier-join iterative shape beside pagerank's fixpoint and
    triangles' enumeration): 3 hops from the minimum supplier key over
    the part<->supplier bipartite graph induced by lineitem. Each round
    is one equi-join of the (checkpointed) frontier against the
    (checkpointed) edge relation plus an anti-join against the visited
    set — the 100 TB reachability pattern where per-round cost tracks
    the FRONTIER, never the closure. Integer node counts per hop; the
    seed comes from a 1-row broadcast aggregate, not a collect."""
    li = _t(spark, sf_dir, "lineitem")
    edges = (
        li.select("l_partkey", "l_suppkey")
        .distinct()
        .localCheckpoint(eager=False)
    )
    seed = edges.agg(F.min("l_suppkey").alias("__seed")).localCheckpoint(
        eager=False
    )
    d1 = (
        edges.crossJoin(F.broadcast(seed))
        .filter(F.col("l_suppkey") == F.col("__seed"))
        .select("l_partkey")
        .distinct()
        .localCheckpoint(eager=False)
    )
    d2 = (
        edges.join(d1, "l_partkey")
        .select("l_suppkey")
        .distinct()
        .crossJoin(F.broadcast(seed))
        .filter(F.col("l_suppkey") != F.col("__seed"))
        .select("l_suppkey")
        .localCheckpoint(eager=False)
    )
    d3 = (
        edges.join(d2, "l_suppkey")
        .select("l_partkey")
        .distinct()
        .join(d1, "l_partkey", "left_anti")
    )
    r0 = seed.select(
        F.lit(0).alias("dist"),
        F.lit("supplier").alias("node_type"),
        F.lit(1).cast("long").alias("n_nodes"),
    )
    r1 = d1.agg(F.count(F.lit(1)).cast("long").alias("n_nodes")).select(
        F.lit(1).alias("dist"), F.lit("part").alias("node_type"), "n_nodes"
    )
    r2 = d2.agg(F.count(F.lit(1)).cast("long").alias("n_nodes")).select(
        F.lit(2).alias("dist"),
        F.lit("supplier").alias("node_type"),
        "n_nodes",
    )
    r3 = d3.agg(F.count(F.lit(1)).cast("long").alias("n_nodes")).select(
        F.lit(3).alias("dist"), F.lit("part").alias("node_type"), "n_nodes"
    )
    return r0.unionByName(r1).unionByName(r2).unionByName(r3)


def q_b30_hits(spark, sf_dir):
    """HITS hubs-and-authorities (B30 graph depth, r9 wave 5 — the
    mutual-reinforcement ranking beside pagerank's fixpoint, BFS's
    reachability and triangles' enumeration): two exact power rounds
    over the part<->supplier bipartite graph. Integer-exact throughout
    (auth1 = part degree; hub1 = sum of adjacent auth1; auth2 = sum of
    adjacent hub1 — no normalization until the reader divides), so the
    iterative algebra replays bit-for-bit. Edges are checkpointed once
    and reused by all three rounds (the iterative-consumer rule); each
    round is one equi-join + keyed agg, cost ∝ |edges|. Top-10 by
    final authority via distributed orderBy().limit then rank."""
    from pyspark.sql import Window

    li = _t(spark, sf_dir, "lineitem")
    edges = (
        li.select("l_partkey", "l_suppkey")
        .distinct()
        .localCheckpoint(eager=False)
    )
    auth1 = edges.groupBy("l_partkey").agg(
        F.count(F.lit(1)).cast("long").alias("auth1")
    )
    hub1 = (
        edges.join(auth1, "l_partkey")
        .groupBy("l_suppkey")
        .agg(F.sum("auth1").cast("long").alias("hub1"))
    )
    auth2 = (
        edges.join(hub1, "l_suppkey")
        .groupBy("l_partkey")
        .agg(F.sum("hub1").cast("long").alias("auth2"))
    )
    w = Window.orderBy(F.col("auth2").desc(), F.col("l_partkey").asc())
    return (
        auth2.join(auth1, "l_partkey")
        .orderBy(F.col("auth2").desc(), F.col("l_partkey").asc())
        .limit(10)
        .withColumn("rank", F.row_number().over(w).cast("bigint"))
        .select(
            F.col("l_partkey").alias("partkey"), "auth1", "auth2", "rank"
        )
    )


def q_b30_rank_eval(spark, sf_dir):
    """Binary-relevance ranking evaluation (B30 depth, r9 wave 7 — the
    MRR/MAP/P@k panel beside b30_ndcg's graded metric): the BM25
    top-10 for ('merge','join','batch') scored against binary
    relevance (≥2 'merge' occurrences). Every metric ships as INTEGER
    micros built from integer divisions over the 10-row retrieved
    relation (reciprocal rank = 1e6 div first_rel_rank; AP@10 =
    Σ (relcum·1e6 div rank) div min(R,10)) — no float touches the
    hash. The cumulative window runs over the rank≤10 relation
    (bounded by the retrieval's top-k, allowlisted)."""
    from pyspark.sql import Window

    docs = _t(spark, sf_dir, "documents")
    retrieved = lm.bm25_search(
        docs, "doc_id", ["merge", "join", "batch"], top_k=10
    ).select("doc_id", F.col("rank").cast("int").alias("rank"))
    rel = docs.select(
        "doc_id",
        (
            F.size(
                F.filter(textops.tokens(F.col("text")), lambda t: t == "merge")
            )
            >= 2
        )
        .cast("long")
        .alias("rel"),
    )
    r10 = retrieved.join(rel, "doc_id", "left").select(
        "rank", F.coalesce("rel", F.lit(0)).alias("rel")
    )
    w = Window.orderBy("rank").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = r10.withColumn("relcum", F.sum("rel").over(w))
    nrel = rel.agg(F.sum("rel").cast("long").alias("R"))
    metrics = cum.agg(
        F.sum("rel").cast("long").alias("hits10"),
        F.min(F.when(F.col("rel") == 1, F.col("rank"))).alias("__fr"),
        F.sum(
            F.when(
                F.col("rel") == 1, F.expr("(relcum * 1000000) div rank")
            ).otherwise(F.lit(0))
        )
        .cast("long")
        .alias("__apnum"),
    )
    return metrics.crossJoin(F.broadcast(nrel)).select(
        F.col("R").alias("n_rel_corpus"),
        "hits10",
        F.coalesce(F.col("__fr"), F.lit(0)).cast("int").alias(
            "first_rel_rank"
        ),
        F.coalesce(F.expr("1000000 div __fr"), F.lit(0))
        .cast("long")
        .alias("rr_micros"),
        F.expr("__apnum div greatest(least(R, 10), 1)")
        .cast("long")
        .alias("ap10_micros"),
        F.expr("(hits10 * 1000000) div 10").cast("long").alias("p10_micros"),
        F.expr("(hits10 * 1000000) div greatest(R, 1)")
        .cast("long")
        .alias("recall10_micros"),
    )


def q_b30_link_prediction(spark, sf_dir):
    """Common-neighbor link prediction (B30 graph depth, r9 wave 7 —
    candidate SCORING beside triangles' enumeration and HITS'
    ranking): supplier pairs scored by shared parts and Jaccard over
    part neighborhoods, top-20. The wedge join (edges ⋈ edges on the
    shared part, s1 < s2) is the quadratic risk at 100 TB, so parts
    with more than 64 suppliers are EXCLUDED first — the standard
    frequent-item degree cap that bounds wedge count at Σ min(deg,64)²
    (the cap relation is one keyed agg; excluded hubs are exactly the
    pairs common-neighbor evidence is weakest for). Jaccard ships as
    integer micros; top-20 via distributed orderBy().limit then rank."""
    from pyspark.sql import Window

    li = _t(spark, sf_dir, "lineitem")
    edges = (
        li.select("l_partkey", "l_suppkey")
        .distinct()
        .localCheckpoint(eager=False)
    )
    pdeg = edges.groupBy("l_partkey").agg(
        F.count(F.lit(1)).cast("long").alias("__pd")
    )
    capped = edges.join(
        pdeg.filter(F.col("__pd") <= 64).select("l_partkey"), "l_partkey"
    )
    sdeg = edges.groupBy("l_suppkey").agg(
        F.count(F.lit(1)).cast("long").alias("deg")
    )
    a = capped.select("l_partkey", F.col("l_suppkey").alias("s1"))
    b = capped.select("l_partkey", F.col("l_suppkey").alias("s2"))
    shared = (
        a.join(b, "l_partkey")
        .filter(F.col("s1") < F.col("s2"))
        .groupBy("s1", "s2")
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
    )
    scored = (
        shared.join(
            F.broadcast(sdeg.select(F.col("l_suppkey").alias("s1"),
                                    F.col("deg").alias("d1"))), "s1"
        )
        .join(
            F.broadcast(sdeg.select(F.col("l_suppkey").alias("s2"),
                                    F.col("deg").alias("d2"))), "s2"
        )
        .select(
            "s1",
            "s2",
            "n_shared",
            F.expr("(n_shared * 1000000) div (d1 + d2 - n_shared)")
            .cast("long")
            .alias("jaccard_micros"),
        )
    )
    w = Window.orderBy(
        F.col("jaccard_micros").desc(), F.col("s1").asc(), F.col("s2").asc()
    )
    return (
        scored.orderBy(
            F.col("jaccard_micros").desc(), F.col("s1").asc(), F.col("s2").asc()
        )
        .limit(20)
        .withColumn("rank", F.row_number().over(w).cast("bigint"))
    )


def q_b30_ppr(spark, sf_dir):
    """Personalized PageRank / random walk with restart (B30 graph
    depth, r10 — derive.personalized_pagerank): proximity to a seed
    set over the same customer↔supplier purchase graph as
    b30_pagerank, 3 exact integer iterations with the teleport mass
    returning ONLY to the 30 seed customers (c_custkey % 500 = 0) —
    the "related suppliers for THESE customers" local-relevance read,
    vs global authority. Every intermediate rank vector replays
    bit-for-bit in the oracle's chained CTEs; top 30 non-seed nodes by
    rank via the bounded TakeOrdered + k-row window idiom."""
    from pyspark.sql import Window

    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    ed = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .select(
            F.col("o_custkey").alias("c"),
            (F.col("l_suppkey") + 1000000).alias("s"),
        )
        .distinct()
    )
    # distinct by construction: ed is distinct and the two union halves
    # are disjoint (c < 1e6 <= s), so the kernel's defensive distinct
    # (one exchange + agg) is skipped via assume_distinct
    edges = ed.select(F.col("c").alias("src"), F.col("s").alias("dst")).union(
        ed.select(F.col("s").alias("src"), F.col("c").alias("dst"))
    )
    seeds = (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") % 500 == 0)
        .select("c_custkey")
    )
    pr = derive.personalized_pagerank(
        edges, seeds, iters=3, assume_distinct=True
    )
    nonseed = pr.join(
        seeds.select(F.col("c_custkey").alias("node_id")), "node_id",
        "left_anti",
    )
    w = Window.orderBy(F.col("rank_units").desc(), F.col("node_id").asc())
    return (
        nonseed.orderBy(F.col("rank_units").desc(), F.col("node_id").asc())
        .limit(30)
        .withColumn("rnk", F.row_number().over(w))
    )


def q_b30_modularity(spark, sf_dir):
    """Graph-modularity audit of the dup clusters (B30 × B19, r10):
    Newman's Q for the 0.8-closure cluster partition, measured against
    the WIDER 0.5-Jaccard similarity graph — the blocking-quality read
    at the structure level (a clean clustering keeps the loose
    similarity edges inside clusters; Q near 0 means the partition
    ignores real structure). Unlabeled docs are their own singleton
    community (a cluster_id is the min member id, so doc-id labels
    can't collide with cluster labels). Q = (4m·Σe_c − Σd_c²)/(4m²) —
    INTEGER numerator and denominator, one division, round 6 — so the
    oracle replays it exactly on top of the two proven kernels
    (prefix-filter join at t=0.5, recursive-CTE closure at 0.8)."""
    docs = _t(spark, sf_dir, "documents")
    mutated = docs.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + F.lit(200000)).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" zzz")).alias("text"),
    )
    corpus = docs.select("doc_id", "text").unionByName(mutated)
    edges = dedup.set_similarity_join(
        corpus, "doc_id", "text", threshold=0.5
    ).select("id_a", "id_b").localCheckpoint()
    labels = dedup.dup_clusters(
        dedup.near_dup_pairs(
            corpus, "doc_id", "text", threshold=0.8, num_hashes=32, bands=8,
            base_hash="md5",
        )
    ).select("doc_id", "cluster_id").localCheckpoint()
    la = labels.select(
        F.col("doc_id").alias("id_a"), F.col("cluster_id").alias("__ca")
    )
    lb = labels.select(
        F.col("doc_id").alias("id_b"), F.col("cluster_id").alias("__cb")
    )
    le = (
        edges.join(la, "id_a", "left")
        .join(lb, "id_b", "left")
        .select(
            "id_a",
            "id_b",
            F.coalesce("__ca", F.col("id_a")).alias("__la"),
            F.coalesce("__cb", F.col("id_b")).alias("__lb"),
        )
        .localCheckpoint()
    )
    m = le.agg(F.count(F.lit(1)).cast("long").alias("m"))
    intra = (
        le.filter(F.col("__la") == F.col("__lb"))
        .groupBy(F.col("__la").alias("__c"))
        .agg(F.count(F.lit(1)).cast("long").alias("__ec"))
    )
    deg = (
        le.select(F.col("id_a").alias("node"), F.col("__la").alias("__c"))
        .unionAll(
            le.select(F.col("id_b").alias("node"), F.col("__lb").alias("__c"))
        )
        .groupBy("node", "__c")
        .agg(F.count(F.lit(1)).cast("long").alias("__d"))
    )
    dc = deg.groupBy("__c").agg(F.sum("__d").cast("long").alias("__dsum"))
    agg = (
        dc.join(intra, "__c", "left")
        .agg(
            F.sum(F.coalesce("__ec", F.lit(0))).cast("long").alias("sum_ec"),
            F.sum(F.col("__dsum") * F.col("__dsum"))
            .cast("long")
            .alias("sum_d2"),
            F.count(F.lit(1)).cast("long").alias("n_communities"),
        )
    )
    return m.crossJoin(agg).select(
        F.col("m").alias("n_edges"),
        F.col("sum_ec").alias("n_intra"),
        (F.col("m") - F.col("sum_ec")).cast("long").alias("n_inter"),
        "n_communities",
        F.round(
            (
                F.lit(4) * F.col("m") * F.col("sum_ec") - F.col("sum_d2")
            ).cast("double")
            / (F.lit(4) * F.col("m") * F.col("m")).cast("double"),
            6,
        ).alias("q_modularity"),
    )


def q_b30_hash_walks(spark, sf_dir):
    """Deterministic random-walk sampling (B30 depth, r11 — the WALK
    GENERATION kernel next to the family's stationary-distribution
    reads: pagerank/PPR integrate over all paths; node2vec-style
    samplers need actual walk instances): 4 walkers from each of the 8
    smallest part nodes take 3 steps over the undirected part↔supplier
    bipartite graph, the next hop drawn by PORTABLE HASH — edge rank =
    md5-60(walker|step|node) mod degree over the dst-sorted adjacency —
    so the "random" walks replay bit-identically on any engine and any
    partitioning (the property that makes distributed walk tables
    joinable across reruns). Shape: per-step one (node)-keyed join to
    the degree relation + one (node, rank) equi-join to the ranked
    adjacency — 3 unrolled steps, no driver loop; walk count scales to
    any fleet because each step is a keyed join, never a gather."""
    from pyspark.sql import Window

    li = (
        _t(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    OFF = 1_000_000
    edges = li.select(
        F.col("l_partkey").alias("src"),
        (F.col("l_suppkey") + OFF).alias("dst"),
    ).unionByName(
        li.select(
            (F.col("l_suppkey") + OFF).alias("src"),
            F.col("l_partkey").alias("dst"),
        )
    )
    wr = Window.partitionBy("src").orderBy(F.col("dst").asc())
    ranked = edges.select(
        "src", "dst", (F.row_number().over(wr) - 1).alias("__r")
    )
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("__deg"))
    seeds = (
        li.select(F.col("l_partkey").alias("seed"))
        .distinct()
        .orderBy("seed")
        .limit(8)
    )
    walkers = seeds.crossJoin(
        spark.range(4).select(F.col("id").alias("__w"))
    ).select(
        (F.col("seed") * 4 + F.col("__w")).alias("walker_id"),
        "seed",
        F.col("seed").alias("node"),
        F.col("seed").cast("string").alias("path"),
    )
    cur = walkers
    for step in (1, 2, 3):
        pick = F.pmod(
            dedup.portable_hash60(
                F.concat_ws(
                    "|",
                    F.col("walker_id").cast("string"),
                    F.lit(str(step)),
                    F.col("node").cast("string"),
                )
            ),
            F.col("__deg"),
        )
        cur = (
            cur.join(deg, cur["node"] == deg["src"])
            .withColumn("__pick", pick)
            .drop("src", "__deg")
            .join(
                ranked,
                (F.col("node") == ranked["src"])
                & (F.col("__pick") == ranked["__r"]),
            )
            .select(
                "walker_id",
                "seed",
                F.col("dst").alias("node"),
                F.concat_ws(
                    ">", F.col("path"), F.col("dst").cast("string")
                ).alias("path"),
            )
        )
    return cur.select(
        "walker_id", "seed", F.col("node").alias("end_node"), "path"
    )


def q_b30_label_propagation(spark, sf_dir):
    """Label-propagation communities (B30 graph depth, r12 — the cheap
    linear-time community pass beside modularity's quality read and
    PageRank/HITS' authority reads): 3 synchronous rounds over the
    customer↔supplier purchase graph, every node adopting its
    neighbors' plurality label with ties to the smallest label — all
    integer counts and total orders, so each round replays bit-for-bit
    in the oracle's chained CTEs (derive.py: label_propagation).
    Output: per final community — size, smallest/largest member, and
    the customer/supplier composition split (supplier ids offset 1e6).
    Scale: per round one src-keyed equi-join + one (dst,label) count
    with map-side combine + one per-node argmax over the bounded
    neighbor-label set; edges checkpointed once."""
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    ed = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .select(
            F.col("o_custkey").alias("c"),
            (F.col("l_suppkey") + 1000000).alias("s"),
        )
        .distinct()
    )
    # distinct by construction: ed is distinct and the two union halves
    # are disjoint (c < 1e6 <= s), so the kernel's defensive distinct
    # (one exchange + agg) is skipped via assume_distinct
    edges = ed.select(F.col("c").alias("src"), F.col("s").alias("dst")).union(
        ed.select(F.col("s").alias("src"), F.col("c").alias("dst"))
    )
    labels = derive.label_propagation(edges, iters=3, assume_distinct=True)
    return labels.groupBy("label").agg(
        F.count(F.lit(1)).cast("long").alias("n_nodes"),
        F.min("node_id").cast("long").alias("min_node"),
        F.max("node_id").cast("long").alias("max_node"),
        F.sum(F.when(F.col("node_id") >= 1000000, 1).otherwise(0))
        .cast("long")
        .alias("n_suppliers"),
    )


def q_b30_neighborhood_jaccard(spark, sf_dir):
    """Neighborhood-Jaccard node similarity (B30 graph depth, r13 —
    the LINK-PREDICTION / related-entity read beside PPR's walk
    proximity: two suppliers are similar when they serve the same
    parts, scored by Jaccard of part neighborhoods): over the
    part↔supplier bipartite graph induced by lineitem, restricted to
    parts with supplier-degree ≤ 16 — the df-cap rule every dedup
    candidate screen in this repo uses, here defining the operator
    itself (frequency-capped graph similarity: hub parts assert
    nothing about supplier affinity AND would blow the pair join
    quadratically, so they are excluded from candidates, intersections
    and degrees alike — one consistent subgraph). Pairs come from one
    part-keyed equi-join bounded by cap²/2 per part; jaccard ships as
    integer micros (inter·1e6 div union). Top 20 via the bounded
    TakeOrdered + k-row window idiom."""
    from pyspark.sql import Window

    li = _t(spark, sf_dir, "lineitem")
    edges = li.select("l_partkey", "l_suppkey").distinct()
    capped = (
        edges.groupBy("l_partkey")
        .agg(F.count(F.lit(1)).alias("__pd"))
        .filter(F.col("__pd") <= 16)
        .select("l_partkey")
    )
    sub = edges.join(capped, "l_partkey")
    deg = sub.groupBy("l_suppkey").agg(
        F.count(F.lit(1)).cast("long").alias("__d")
    )
    a = sub.select("l_partkey", F.col("l_suppkey").alias("s1"))
    b = sub.select("l_partkey", F.col("l_suppkey").alias("s2"))
    inter = (
        a.join(b, "l_partkey")
        .filter(F.col("s1") < F.col("s2"))
        .groupBy("s1", "s2")
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
    )
    scored = (
        inter.join(deg.select(F.col("l_suppkey").alias("s1"),
                              F.col("__d").alias("deg1")), "s1")
        .join(deg.select(F.col("l_suppkey").alias("s2"),
                         F.col("__d").alias("deg2")), "s2")
        .withColumn(
            "jaccard_x1e6",
            F.expr("n_shared * 1000000 div (deg1 + deg2 - n_shared)"),
        )
    )
    wr = Window.orderBy(
        F.col("jaccard_x1e6").desc(), F.col("s1").asc(), F.col("s2").asc()
    )
    return (
        scored.orderBy(
            F.col("jaccard_x1e6").desc(), F.col("s1").asc(),
            F.col("s2").asc(),
        )
        .limit(20)
        .select(
            "s1", "s2", "n_shared", "deg1", "deg2", "jaccard_x1e6",
            F.row_number().over(wr).cast("long").alias("rnk"),
        )
    )


def q_b30_kcore(spark, sf_dir):
    """Fixed-round k-core peeling (B30 graph depth, r13 —
    derive.kcore_peel): 3 peel rounds at k=3 over the same
    customer↔supplier purchase graph as pagerank/LPA, reporting the
    surviving subgraph's (nodes, edges, degree range) per round — the
    density screen a graph pipeline runs before an expensive community
    or embedding pass. Per-round edges are checkpointed (the LPA
    double-reference rule: the stats branch and the next round both
    consume them); each round is one keyed degree agg + two keyed
    semi-joins. Integer-exact; the oracle replays the peel in chained
    CTEs."""
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    ed = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .select(
            F.col("o_custkey").alias("c"),
            (F.col("l_suppkey") + 1000000).alias("s"),
        )
        .distinct()
    )
    # distinct by construction: ed is distinct and the two union halves
    # are disjoint (c < 1e6 <= s), so the kernel's defensive distinct
    # (one exchange + agg) is skipped via assume_distinct
    edges = ed.select(F.col("c").alias("src"), F.col("s").alias("dst")).union(
        ed.select(F.col("s").alias("src"), F.col("c").alias("dst"))
    )
    return derive.kcore_peel(edges, k=3, rounds=3, assume_distinct=True)


def q_b30_symspell(spark, sf_dir):
    """SymSpell spell-correction join (B30 depth, r13 — the
    delete-neighborhood trick that makes fuzzy lookup an EQUI-join:
    instead of comparing a query against every vocabulary term, both
    sides expand to their 1-deletion variants and meet on an exact
    string key — the candidate set shrinks from |V| to the handful
    sharing a delete). Vocabulary = corpus tokens (normalized split,
    len ≥ 4, freq ≥ 2) with occurrence counts; queries are the
    freq ≥ 5, len ≥ 5 terms with their MIDDLE character deleted (the
    deterministic typo — mirrored verbatim in SQL). Candidates verify
    with true Levenshtein ≤ 1 and rank (distance asc, freq desc, term
    asc); `recovered` audits whether top-1 restored the source term
    (a mid-deletion can legitimately resolve to a different, more
    frequent dictionary word — that IS the corrector's behavior).

    Scale shape: the delete expansion is a per-row transform (arrays
    stay inside the row, ×(len+1) rows only at the explode), the
    candidate meet is ONE string equi-join on the variant key, and the
    verify runs levenshtein only on the joined handful — never |Q|·|V|.
    Vocabulary grows sub-linearly in corpus bytes (Heaps), so the
    dictionary side broadcasts at any realistic scale."""
    from sqlite_cdc_spark.pipeline.text import normalize_text

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    toks = docs.select(
        F.explode(F.split(normalize_text("text"), " ")).alias("term")
    ).filter(F.length("term") >= 4)
    # vocab feeds two STRUCTURALLY different consumers (the dict-side
    # full expansion and the query-side filter+mutate+expansion), so a
    # lazy plan tokenizes the corpus twice — checkpoint once (the
    # iterative-consumer rule; AQE only reuses verbatim-shared subplans)
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
    dict_vars = vocab.select(
        "term", "freq", F.explode(deletes).alias("variant")
    )
    queries = vocab.filter(
        (F.col("freq") >= 5) & (F.length("term") >= 5)
    ).select(
        F.col("term").alias("src_term"),
        F.expr(
            "concat(substring(term, 1, (length(term) + 1) div 2 - 1),"
            " substring(term, (length(term) + 1) div 2 + 1,"
            " length(term)))"
        ).alias("query_text"),
    )
    q_vars = queries.select(
        "src_term",
        "query_text",
        F.explode(
            F.array_distinct(
                F.concat(
                    F.array(F.col("query_text")),
                    F.expr(
                        "transform(sequence(1, length(query_text)),"
                        " i -> concat(substring(query_text, 1, i - 1),"
                        " substring(query_text, i + 1,"
                        " length(query_text))))"
                    ),
                )
            )
        ).alias("variant"),
    )
    cand = (
        q_vars.join(dict_vars, "variant")
        .select("src_term", "query_text", "term", "freq")
        .distinct()
        .withColumn(
            "distance",
            F.levenshtein(F.col("query_text"), F.col("term")).cast("long"),
        )
        .filter(F.col("distance") <= 1)
    )
    from pyspark.sql import Window

    wq = Window.partitionBy("src_term").orderBy(
        F.col("distance").asc(), F.col("freq").desc(), F.col("term").asc()
    )
    wn = Window.partitionBy("src_term")
    return (
        cand.withColumn("rnk", F.row_number().over(wq))
        .withColumn("n_candidates", F.count(F.lit(1)).over(wn).cast("long"))
        .filter(F.col("rnk") == 1)
        .select(
            "src_term",
            "query_text",
            F.col("term").alias("suggestion"),
            "distance",
            F.col("freq").alias("suggestion_freq"),
            "n_candidates",
            (F.col("term") == F.col("src_term")).alias("recovered"),
        )
    )


def q_b30_bellman_ford(spark, sf_dir):
    """Bounded-hop weighted shortest paths over the nation logistics
    graph (B30 depth, r13): edge (supplier nation → customer nation)
    weighs the MINIMUM observed order-to-ship lag in days across all
    lineitems shipped between that pair; Bellman–Ford from nation 0
    then answers "what is the cheapest relay route" — the weighted
    twin of b30_bfs_hops (derive.bellman_ford: per round ONE keyed
    equi-join + ONE keyed min-agg, distances checkpointed per round).
    The graph build is the scale-heavy part and it is pure join
    reduction: lineitem⋈orders⋈supplier⋈customer contracts to a
    ≤25×25 edge relation BEFORE any iteration; the relaxation loop
    runs on broadcast-sized frames. Unreached-within-4-rounds nations
    surface as NULL dist."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey",
                                              "l_shipdate")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey",
                                           "o_orderdate")
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = _t(spark, sf_dir, "nation").select("n_nationkey")
    edges = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .filter(F.col("s_nationkey") != F.col("c_nationkey"))
        .groupBy(
            F.col("s_nationkey").alias("src"),
            F.col("c_nationkey").alias("dst"),
        )
        .agg(
            F.min(F.datediff(F.col("l_shipdate"), F.col("o_orderdate")))
            .cast("long")
            .alias("w")
        )
    )
    dist = derive.bellman_ford(edges, source=0, rounds=4)
    # r17 (guide §3.1): dist is a checkpointed RDD, so the planner has
    # no size estimate and picked a SortMergeJoin with two exchanges
    # for this ≤25-row ⋈ ≤25-row join (plans/r17/
    # b30_bellman_ford_before.txt). dist is bounded by the node
    # universe at ANY scale — broadcast it explicitly.
    return n.join(
        F.broadcast(dist), n["n_nationkey"] == dist["node"], "left"
    ).select(
        F.col("n_nationkey").cast("long").alias("nation"),
        F.col("dist").alias("dist_4hop"),
    )
