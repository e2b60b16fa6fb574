"""Tests for LM/retrieval statistics (lm.py) and temperature sampling."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from sqlite_cdc_spark.pipeline import lm, sampling, text as textops
from sqlite_cdc_spark.sources import load_table


def _docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents")


def test_tfidf_matches_hand_computation(spark):
    df = spark.createDataFrame(
        [(1, "apple banana apple"), (2, "banana cherry"), (3, "cherry date")],
        ["doc_id", "text"],
    )
    rows = {
        (r.doc_id, r.tok): r
        for r in lm.tf_idf(df, "doc_id").collect()
    }
    r = rows[(1, "apple")]
    assert r.tf == 2 and r.df_t == 1
    # sklearn smoothing: ln((3+1)/(1+1)) + 1, times tf=2
    assert r.tfidf == round(2 * (math.log(4 / 2) + 1), 6)
    r = rows[(2, "banana")]
    assert r.tf == 1 and r.df_t == 2
    assert r.tfidf == round(math.log(4 / 3) + 1, 6)


def test_top_terms_rank_deterministic(spark):
    df = spark.createDataFrame(
        [(1, "x x y y z"), (2, "x y")], ["doc_id", "text"]
    )
    out = lm.top_terms(df, "doc_id", k=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append((r.rank, r.tok))
    # doc 1: x and y tie on tf=2/df=2 -> token asc breaks the tie
    assert sorted(by_doc[1]) == [(1, "x"), (2, "y")]


def test_bm25_prefers_rarer_term_and_bounds(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    out = lm.bm25_search(docs, "doc_id", ["merge", "join"], top_k=10)
    rows = out.collect()
    assert 0 < len(rows) <= 10
    ranks = sorted(r.rank for r in rows)
    assert ranks == list(range(1, len(rows) + 1))
    # scores are rounded, non-negative, and non-increasing in rank order
    ordered = sorted(rows, key=lambda r: r.rank)
    scores = [r.score for r in ordered]
    assert all(s >= 0 for s in scores)
    assert scores == sorted(scores, reverse=True)


def test_cross_entropy_uniform_corpus_is_flat(spark):
    # every doc identical -> identical xent; value = ln(T+V) - ln(cnt+1)
    df = spark.createDataFrame(
        [(i, "a b") for i in range(4)], ["doc_id", "text"]
    )
    rows = lm.doc_cross_entropy(df, "doc_id").collect()
    assert len(rows) == 4
    vals = {r.xent for r in rows}
    assert len(vals) == 1
    # T=8 tokens, V=2, each cnt=4: H = ln(8+2) - ln(5)
    assert vals.pop() == round(math.log(10) - math.log(5), 6)
    assert all(r.n_tok == 2 for r in rows)


def test_cross_entropy_flags_rare_docs(spark):
    common = [(i, "the quick brown fox jumps over the lazy dog") for i in range(20)]
    rare = [(99, "zxqv wkjy qqpl mmnb")]
    df = spark.createDataFrame(common + rare, ["doc_id", "text"])
    rows = {r.doc_id: r.xent for r in lm.doc_cross_entropy(df, "doc_id").collect()}
    # the gibberish doc must be the most surprising one
    assert rows[99] == max(rows.values())
    assert rows[99] > rows[0]


def test_cross_entropy_external_lm_unseen_floor(spark):
    corpus = spark.createDataFrame([(1, "aa bb cc dd")], ["doc_id", "text"])
    model = lm.unigram_counts(
        spark.createDataFrame([(1, "aa aa bb bb")], ["doc_id", "text"])
    )
    rows = lm.doc_cross_entropy(
        corpus, "doc_id", lm=model, add_k=1.0
    ).collect()
    # model: T=4, V=2 -> denom ln(6); seen cnt=2 -> ln(3); unseen -> ln(1)=0
    expect = round(math.log(6) - (2 * math.log(3) + 2 * math.log(1)) / 4, 6)
    assert rows[0].xent == expect


def test_bpe_pairs_hand_check(spark):
    df = spark.createDataFrame([(1, "abab cd cd cd")], ["doc_id", "text"])
    # vocab: abab x1 -> pairs ab, ba, ab ; cd x3 -> pair cd
    out = {r.pair: r.pair_count for r in lm.bpe_pair_counts(df).collect()}
    assert out == {"ab": 2, "ba": 1, "cd": 3}


def test_bpe_pairs_top_n_tie_break(spark):
    df = spark.createDataFrame([(1, "ab ba ab ba")], ["doc_id", "text"])
    out = lm.bpe_pair_counts(df, top_n=1).collect()
    # ab and ba both count 2 -> pair asc tie-break picks "ab"
    assert len(out) == 1 and out[0].pair == "ab" and out[0].rank == 1


def test_temperature_flattens_toward_small_groups(spark, sf_dir):
    docs = _docs(spark, sf_dir).select("doc_id", "lang", "n_chars")
    rates = {
        r.lang: r
        for r in sampling.temperature_rates(
            docs, "lang", "n_chars", total_budget=50_000, alpha=0.5
        ).collect()
    }
    biggest = max(rates.values(), key=lambda r: r.group_total)
    smallest = min(rates.values(), key=lambda r: r.group_total)
    # alpha<1 up-weights low-resource groups: their keep rate must be
    # at least the dominant group's
    assert smallest.keep_b >= biggest.keep_b
    # alpha=1 reproduces natural proportions: keep_b ~= budget/total
    # and therefore equal across groups (one shared scale factor)
    nat = sampling.temperature_rates(
        docs, "lang", "n_chars", total_budget=50_000, alpha=1.0
    ).collect()
    assert len({r.keep_b for r in nat}) == 1


def test_temperature_sample_deterministic_and_filtered(spark, sf_dir):
    docs = _docs(spark, sf_dir).select("doc_id", "lang", "n_chars")
    kept1 = sampling.temperature_sample(
        docs, "lang", "doc_id", "n_chars", total_budget=50_000
    )
    kept2 = sampling.temperature_sample(
        docs, "lang", "doc_id", "n_chars", total_budget=50_000
    )
    ids1 = sorted(r.doc_id for r in kept1.collect())
    ids2 = sorted(r.doc_id for r in kept2.collect())
    assert ids1 == ids2 and 0 < len(ids1) < docs.count()


def test_inverted_index_postings_and_bounds(spark):
    df = spark.createDataFrame(
        [(3, "a b"), (1, "a c"), (2, "a")], ["doc_id", "text"]
    )
    out = {r.tok: r for r in lm.inverted_index(df, "doc_id").collect()}
    assert out["a"].postings == [1, 2, 3] and out["a"].df_t == 3
    assert out["b"].postings == [3]
    # min_df drops hapaxes; max_df drops stopword-level terms
    bounded = {r.tok for r in lm.inverted_index(df, "doc_id", min_df=2, max_df=2).collect()}
    assert bounded == set()  # a has df 3 (> max), b/c have df 1 (< min)


def test_pmi_hand_check(spark):
    # "x y" repeated: pair (x,y) every doc; x never co-occurs with itself
    df = spark.createDataFrame([(i, "x y") for i in range(6)], ["doc_id", "text"])
    rows = lm.pmi_pairs(df, "doc_id", window=2, min_count=1).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.tok_a, r.tok_b, r.n_pair) == ("x", "y", 6)
    # P=6 pairs, T=12 tokens, c_x=c_y=6: pmi = ln((6/6)/((6/12)^2)) = ln 4
    import math

    assert r.pmi == round(math.log(4), 6)


def test_pmi_window_reaches_distance_two(spark):
    df = spark.createDataFrame([(1, "a b c")], ["doc_id", "text"])
    pairs = {
        (r.tok_a, r.tok_b): r.n_pair
        for r in lm.pmi_pairs(df, "doc_id", window=2, min_count=1).collect()
    }
    # distance-1 pairs (a,b) (b,c) and the distance-2 pair (a,c)
    assert set(pairs) == {("a", "b"), ("b", "c"), ("a", "c")}


def test_update_unigram_counts_equals_recount(spark, sf_dir):
    docs = _docs(spark, sf_dir).select("doc_id", "text")
    model = lm.unigram_counts(docs)
    upd = docs.filter(F.col("doc_id") % 5 == 0)
    ins = upd.select(F.concat(F.col("text"), F.lit(" qqnewtok")).alias("text"))
    dels = upd.select("text").unionByName(
        docs.filter((F.col("doc_id") % 9 == 0) & (F.col("doc_id") % 5 != 0))
        .select("text")
    )
    merged = {
        r.tok: r.cnt
        for r in lm.update_unigram_counts(model, ins, dels).collect()
    }
    effective = docs.filter(
        (F.col("doc_id") % 5 != 0) & (F.col("doc_id") % 9 != 0)
    ).select("text").unionByName(ins)
    scratch = {r.tok: r.cnt for r in lm.unigram_counts(effective).collect()}
    assert merged == scratch
    assert "qqnewtok" in merged  # batch-new token entered the model


def test_update_unigram_counts_drops_zeroed_tokens(spark):
    corpus = spark.createDataFrame([(1, "aa bb")], ["doc_id", "text"])
    model = lm.unigram_counts(corpus)
    out = lm.update_unigram_counts(
        model, deletes=spark.createDataFrame([(1, "aa")], ["doc_id", "text"])
    )
    assert {r.tok: r.cnt for r in out.collect()} == {"bb": 1}


def test_token_rows_drops_empties(spark):
    df = spark.createDataFrame([(1, "  a  b  "), (2, "!!!")], ["doc_id", "text"])
    rows = lm.token_rows(df, "doc_id").collect()
    assert sorted((r.doc_id, r.tok) for r in rows) == [(1, "a"), (1, "b")]
    # tokens() of pure punctuation normalizes to "" -> no rows
    assert textops.token_count(F.lit("!!!")) is not None  # expression builds


def test_quality_gate_drops_bottom_quartile_per_group(spark, sf_dir):
    docs = _docs(spark, sf_dir).select("doc_id", "lang", "text")
    feats = textops.quality_features(docs)
    kept = textops.quality_gate(feats)
    per_lang_in = {r.lang: r.cnt for r in feats.groupBy("lang").agg(
        F.count(F.lit(1)).alias("cnt")).collect()}
    per_lang_out = {r.lang: r.cnt for r in kept.groupBy("lang").agg(
        F.count(F.lit(1)).alias("cnt")).collect()}
    for lang, n in per_lang_in.items():
        # percent_rank >= 0.25 keeps ceil(0.75*(n-1))+... ~ 75%; bound it
        assert n * 0.70 <= per_lang_out[lang] <= n * 0.80 + 1
    # determinism: same gate twice -> same kept set
    ids1 = sorted(r.doc_id for r in kept.collect())
    ids2 = sorted(r.doc_id for r in textops.quality_gate(feats).collect())
    assert ids1 == ids2


def test_curriculum_packs_are_phase_monotone(spark, sf_dir):
    import __spark_entry__ as entry

    rows = entry.queries()["b28_curriculum"](spark, sf_dir).collect()
    # pack boundaries follow curriculum order: sort rows by (phase, doc_id)
    # and pack_id must be non-decreasing; each pack holds <= budget tokens
    # plus at most one straddling doc (the concat-then-chunk contract)
    rows.sort(key=lambda r: (r.phase, r.doc_id))
    packs = {}
    last_pack = 0
    for r in rows:
        assert r.pack_id >= last_pack
        last_pack = max(last_pack, r.pack_id)
        packs.setdefault(r.pack_id, 0)
        packs[r.pack_id] += r.n_tok
    for pid, total in packs.items():
        if pid != max(packs):
            assert total >= 1  # non-empty


def test_update_unigram_counts_multi_batch_stream_equals_batch(spark, sf_dir):
    # the foreachBatch shape: a standing model folded over three CDC
    # micro-batches must equal one from-scratch count of the whole corpus
    docs = _docs(spark, sf_dir).select("doc_id", "text")
    batches = [docs.filter(F.col("doc_id") % 3 == i) for i in range(3)]
    model = lm.unigram_counts(batches[0])
    for b in batches[1:]:
        model = lm.update_unigram_counts(model, inserts=b)
    got = {r.tok: r.cnt for r in model.collect()}
    want = {r.tok: r.cnt for r in lm.unigram_counts(docs).collect()}
    assert got == want


def test_bigram_xent_scrambled_doc_scores_worse(spark):
    # bigram context: scrambled word order must look more surprising than
    # the natural order even though unigram stats are identical
    natural = [(i, "the quick brown fox jumps over the lazy dog") for i in range(20)]
    scrambled = [(99, "dog the over quick lazy jumps fox brown the")]
    df = spark.createDataFrame(natural + scrambled, ["doc_id", "text"])
    rows = {
        r.doc_id: r.xent
        for r in lm.doc_cross_entropy_bigram(df, "doc_id").collect()
    }
    assert rows[99] > rows[0]
    # unigram model cannot tell them apart (same bag of words)
    uni = {
        r.doc_id: r.xent for r in lm.doc_cross_entropy(df, "doc_id").collect()
    }
    assert uni[99] == uni[0]


def test_bigram_xent_short_docs_absent(spark):
    df = spark.createDataFrame(
        [(1, "hello"), (2, "a b")], ["doc_id", "text"]
    )
    rows = lm.doc_cross_entropy_bigram(df, "doc_id").collect()
    assert [r.doc_id for r in rows] == [2]
    assert rows[0].n_pairs == 1


def test_sample_fixed_per_group_exact_counts_and_stability(spark, sf_dir):
    docs = _docs(spark, sf_dir).select("doc_id", "lang")
    out = sampling.sample_fixed_per_group(docs, "lang", "doc_id", k=7)
    per = {r.lang: r.cnt for r in out.groupBy("lang").agg(
        F.count(F.lit(1)).alias("cnt")).collect()}
    sizes = {r.lang: r.cnt for r in docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("cnt")).collect()}
    for lang, n in sizes.items():
        assert per[lang] == min(7, n)
    # stability under re-partitioning: same kept set at any parallelism
    ids1 = sorted(r.doc_id for r in out.collect())
    ids2 = sorted(
        r.doc_id
        for r in sampling.sample_fixed_per_group(
            docs.repartition(13), "lang", "doc_id", k=7
        ).collect()
    )
    assert ids1 == ids2


def test_group_centroids_hand_check(spark):
    from sqlite_cdc_spark.pipeline import similarity

    df = spark.createDataFrame(
        [(0, [1.0, 2.0]), (0, [3.0, 4.0]), (1, [10.0, 20.0])],
        ["label", "embedding"],
    )
    rows = {r.label: r for r in similarity.group_centroids(df, "label").collect()}
    assert rows[0].centroid == [2.0, 3.0] and rows[0].n_vecs == 2
    assert rows[1].centroid == [10.0, 20.0] and rows[1].n_vecs == 1


def test_boolean_search_requires_all_terms(spark):
    df = spark.createDataFrame(
        [(1, "x y z"), (2, "x y"), (3, "x x y z z")], ["doc_id", "text"]
    )
    rows = {r.doc_id: r.n_hits for r in lm.boolean_search(
        df, "doc_id", ["x", "z"]).collect()}
    # doc 2 lacks z -> excluded; n_hits counts total occurrences
    assert rows == {1: 2, 3: 4}


def test_temperature_rates_zero_and_null_totals_keep_everything(spark):
    df = spark.createDataFrame(
        [("a", 1, 100), ("b", 2, 0), ("c", 3, None)],
        "lang string, doc_id long, n long",
    )
    rates = {
        r.lang: r.keep_b
        for r in sampling.temperature_rates(
            df, "lang", "n", total_budget=50
        ).collect()
    }
    # zero/NULL-total groups keep everything; the real group still gets a
    # finite rate (no NaN poisoning through the shared normalizer)
    assert rates["b"] == 100 and rates["c"] == 100
    assert 0 <= rates["a"] <= 100


def test_epoch_mixture_hits_budgets_within_resolution(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    sized = docs.select(
        "doc_id", "lang", textops.token_count("text").alias("n_tok")
    )
    budgets = {"en": 4000, "de": 20000}
    out = sampling.epoch_mixture(sized, "lang", "doc_id", "n_tok", budgets)
    realized = {
        r.lang: r.tot
        for r in out.groupBy("lang").agg(
            F.sum(F.col("n_tok") * F.col("n_copies")).alias("tot")
        ).collect()
    }
    totals = {
        r.lang: r.tot
        for r in sized.groupBy("lang").agg(F.sum("n_tok").alias("tot")).collect()
    }
    # de budget exceeds the group's size -> up-sampling (copies > 1 exist)
    assert totals["de"] < 20000
    assert realized["de"] > totals["de"]
    # realized totals approximate the budget within bucket resolution
    for lang, budget in budgets.items():
        assert abs(realized[lang] - budget) <= totals[lang] / 100 + max(
            r.n_tok for r in sized.filter(F.col("lang") == lang).collect()
        )
    # unbudgeted groups keep exactly one copy of everything
    assert out.filter(
        (~F.col("lang").isin(*budgets)) & (F.col("n_copies") != 1)
    ).count() == 0


def test_quality_gate_never_drops_singleton_or_pair_groups(spark):
    """ADVICE r5: a percent_rank>=q gate drops EVERY 1-row group
    (percent_rank 0) and half of every 2-row group. The count-based gate
    drops exactly floor(n*q) rows per group, so tiny (low-resource-
    language) groups survive intact."""
    rows = (
        [(i, "en", float(i)) for i in range(1, 9)]       # n=8 -> drop 2
        + [(100, "rare", 0.99)]                           # n=1 -> keep
        + [(200, "pair", 0.1), (201, "pair", 0.9)]        # n=2 -> keep both
    )
    df = spark.createDataFrame(rows, ["doc_id", "lang", "quality_score"])
    kept = textops.quality_gate(df).collect()
    by_lang = {}
    for r in kept:
        by_lang.setdefault(r.lang, []).append(r.doc_id)
    assert sorted(by_lang["rare"]) == [100]
    assert sorted(by_lang["pair"]) == [200, 201]
    # n=8: exactly floor(8*0.25)=2 lowest-scored dropped
    assert sorted(by_lang["en"]) == [3, 4, 5, 6, 7, 8]
    # pctile column still reports exact percent_rank
    assert all(hasattr(r, "pctile") for r in kept)


def test_bm25_n_docs_counts_empty_docs_like_tfidf(spark):
    """ADVICE r5: N must mean the same thing in bm25_search and tf_idf —
    all input rows, including empty/punctuation-only docs."""
    df = spark.createDataFrame(
        [(1, "merge batch merge"), (2, "merge other"), (3, "!!!")],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r for r in lm.bm25_search(df, "doc_id", ["merge"]).collect()}
    # N=3 (doc 3 counted though empty after normalization), df_merge=2:
    # idf = ln(1 + (3-2+0.5)/(2+0.5))
    idf = math.log(1 + 1.5 / 2.5)
    dl1, dl2, avgdl = 3.0, 2.0, 2.5
    exp1 = idf * 2 * 2.2 / (2 + 1.2 * (0.25 + 0.75 * dl1 / avgdl))
    exp2 = idf * 1 * 2.2 / (1 + 1.2 * (0.25 + 0.75 * dl2 / avgdl))
    assert out[1].score == round(exp1, 6)
    assert out[2].score == round(exp2, 6)


def test_doc_cross_entropy_rejects_unsmoothed_external_lm(spark):
    """ADVICE r5: external lm + add_k=0 would silently produce ln(0) for
    unseen tokens; it must raise instead."""
    import pytest

    df = spark.createDataFrame([(1, "a b")], ["doc_id", "text"])
    model = lm.unigram_counts(spark.createDataFrame([(1, "a")], ["doc_id", "text"]))
    with pytest.raises(ValueError, match="add_k"):
        lm.doc_cross_entropy(df, "doc_id", add_k=0, lm=model)
    # self-scoring with add_k=0 stays legal (cnt >= 1 for every token)
    assert lm.doc_cross_entropy(df, "doc_id", add_k=0).count() == 1


def test_kneser_ney_probabilities_sum_to_one_per_context(spark):
    from sqlite_cdc_spark.pipeline import lm

    df = spark.createDataFrame(
        [(1, "a b a b a c"), (2, "b a b c a b")], ["doc_id", "text"]
    )
    rows = lm.kneser_ney_bigrams(df, "doc_id").collect()
    # KN is a proper distribution: for every context a, sum over OBSERVED
    # b of the discounted MLE mass + lambda spread over ALL continuations
    # means observed-b p_kn sums to <= 1 and > the pure MLE-discount sum
    import collections

    by_ctx = collections.defaultdict(list)
    for r in rows:
        by_ctx[r.a].append(r)
    for a, rs in by_ctx.items():
        s = sum(r.p_kn for r in rs)
        assert s <= 1.0 + 1e-6, f"context {a} oversums: {s}"
        assert all(r.p_kn > 0 for r in rs)
    # continuation prob must be shared per b across contexts
    by_b = collections.defaultdict(set)
    for r in rows:
        by_b[r.b].add(r.p_cont)
    assert all(len(v) == 1 for v in by_b.values())


def test_kneser_ney_continuation_beats_frequency_for_bursty_token(spark):
    from sqlite_cdc_spark.pipeline import lm

    # "francisco" is frequent but only ever follows "san" (1 continuation
    # context); "common" follows many contexts — classic KN motivation:
    # p_cont(common) > p_cont(francisco) despite lower raw frequency
    text1 = "san francisco " * 6
    text2 = "a common b common c common d common"
    df = spark.createDataFrame([(1, text1), (2, text2)], ["doc_id", "text"])
    rows = lm.kneser_ney_bigrams(df, "doc_id").collect()
    pc = {r.b: r.p_cont for r in rows}
    assert pc["common"] > pc["francisco"]


def test_bpe_train_merges_learns_frequent_pair_first(spark):
    from sqlite_cdc_spark.pipeline import lm

    merges = lm.bpe_train_merges(["aaab aaab aaab cd"], n_merges=3)
    # (a,a) dominates; after merge1 words are [aa,a,b]: pairs
    # (aa,a)=3 and (a,b)=3 tie → deterministic break to the
    # lexicographically largest pair → ('aa','a')
    assert merges[0] == ("a", "a")
    assert merges[1] == ("aa", "a")
    assert merges[2] == ("aaa", "b")


def test_bpe_encode_stats_matches_reference_scan(spark):
    from sqlite_cdc_spark.pipeline import lm

    def ref_encode(word, merges):
        syms = list(word)
        for x, y in merges:
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == x and syms[i + 1] == y:
                    out.append(x + y)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        return syms

    texts = [
        (1, "table value row fast stable tablet"),
        (2, "aaaa tataa blele fastfast"),
        (3, "x tab le ta b"),
    ]
    df = spark.createDataFrame(texts, ["doc_id", "text"])
    got = {r.doc_id: r for r in lm.bpe_encode_stats(df, "doc_id").collect()}
    for doc_id, text in texts:
        want_tokens = sum(len(ref_encode(w, lm.BPE_DEMO_MERGES)) for w in text.split())
        assert got[doc_id].n_tokens == want_tokens, (doc_id, got[doc_id].n_tokens, want_tokens)
        assert got[doc_id].n_chars == sum(len(w) for w in text.split())


def test_bpe_trained_merges_compress_better_than_none(spark):
    from sqlite_cdc_spark.pipeline import lm

    texts = ["table table stable tablet value fast row"] * 3
    merges = lm.bpe_train_merges(texts, n_merges=8)
    df = spark.createDataFrame([(1, texts[0])], ["doc_id", "text"])
    with_m = lm.bpe_encode_stats(df, "doc_id", merges=merges).first()
    without = lm.bpe_encode_stats(df, "doc_id", merges=()).first()
    assert without.n_tokens == without.n_chars  # no merges = chars
    assert with_m.n_tokens < without.n_tokens
    assert with_m.compression > 1.0
