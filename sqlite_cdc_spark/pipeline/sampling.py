"""Deterministic sampling / split assignment (training-pipeline surface).

A 100 TB corpus is sampled by KEY, never by `rand()`: the same row must
land in the same split on every run, on every executor, after every
repartition — otherwise training/validation leak into each other between
pipeline runs. The primitive is a hash bucket in [0, buckets): filters and
split assignment are pure narrow maps over it (no shuffle, no state, no
driver participation), so sampling composes with any downstream operator
and survives arbitrary re-partitioning.

Bucketing uses the Knuth multiplicative hash ((key * 2654435761) mod 2^32)
— chosen over Spark's ``xxhash64`` only because it is *engine-portable*
(exact same arithmetic in DuckDB SQL, so the oracle can replay it
bit-for-bit). At production scale swap :func:`hash_bucket` for
``F.xxhash64 % buckets`` for better avalanche on adversarial keys; every
other function here is hash-agnostic.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..sqlident import bq

#: Knuth's multiplicative constant (2^32 / phi)
KNUTH = 2654435761
_M31 = 1 << 31
_M32 = 1 << 32


def hash_bucket(key: Column | str, buckets: int = 100) -> Column:
    """Deterministic bucket in [0, buckets) from an integer key column.

    Exact-integer arithmetic end to end, valid for the FULL int64 key
    range including negatives: the key is first reduced to [0, 2^31) with
    a positive mod (``pmod``), so the Knuth multiply peaks below
    2^31 · 2654435761 < 2^63 — no silent int64 wrap on either engine —
    and the result is always non-negative (a plain ``%`` would emit
    negative buckets for negative keys, silently routing them all into
    the first split). DuckDB replays it bit-for-bit::

        ((((key % 2^31 + 2^31) % 2^31) * 2654435761) % 2^32) % buckets

    Keys that differ only above bit 31 share a bucket sequence (the
    pre-reduction drops high bits); for 64-bit hash keys fold the high
    word in first (``xor(key, shiftright(key, 32))``).
    """
    k = F.col(key) if isinstance(key, str) else key
    k31 = F.pmod(k.cast("long"), F.lit(_M31))
    return F.pmod(k31 * F.lit(KNUTH), F.lit(_M32)).__mod__(F.lit(buckets)).cast(
        "bigint"
    )


def bucket_sql(key: str, buckets: int = 100) -> str:
    """The DuckDB-portable SQL rendering of :func:`hash_bucket`."""
    return f"((((({key} % {_M31}) + {_M31}) % {_M31}) * {KNUTH}) % {_M32}) % {buckets}"


def sample_by_key(df: DataFrame, key: str, percent: int, buckets: int = 100) -> DataFrame:
    """Keep rows whose bucket < percent — a deterministic ~percent% sample.

    Sampling on a *group* key (e.g. l_orderkey) keeps groups intact:
    either every row of an order is sampled or none, which is what a
    training pipeline wants when documents span multiple rows.
    """
    return df.filter(hash_bucket(key, buckets) < percent)


def split_assign(
    key: Column | str,
    splits: Sequence[tuple[str, int]] = (("train", 80), ("val", 10), ("test", 10)),
    buckets: int = 100,
) -> Column:
    """Assign each row to a named split by bucket range; ranges are
    cumulative so the splits are disjoint and exhaustive (weights must sum
    to ``buckets``)."""
    total = sum(w for _, w in splits)
    if total != buckets:
        raise ValueError(f"split weights sum to {total}, expected {buckets}")
    b = hash_bucket(key, buckets)
    expr = None
    acc = 0
    for name, weight in splits:
        acc += weight
        cond = b < acc
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    return expr


def prefix_sum(
    df: DataFrame,
    order_col: str,
    value_col: str,
    out_col: str = "cumsum",
    bucket_size: int = 4096,
) -> DataFrame:
    """Distributed EXCLUSIVE prefix sum of ``value_col`` in ``order_col``
    order — without the single-partition window a naive global cumsum
    plans (``Window.orderBy`` with no partition key serializes the whole
    table through one task).

    Two-phase scan algorithm: (1) windowed cumsum WITHIN each
    ``order_col div bucket_size`` bucket (shuffle on the bucket key, all
    buckets in parallel); (2) per-bucket totals — one row per bucket, tiny
    — are prefix-summed and broadcast back as each bucket's base offset.
    Deterministic for any fixed ``order_col``; requires ``order_col`` to
    be unique and non-negative.

    The input relation feeds BOTH phases, but deliberately WITHOUT a
    localCheckpoint (measured NEGATIVE, r7: b28_packing 0.71 s → 0.47 s
    at sf0.1 after removing one): both phases shuffle on the identical
    ``hashpartitioning(__b)`` key, so AQE deduplicates the shared
    subplan via ReusedExchange — a checkpoint only adds a
    materialization job and severs that reuse. Callers whose upstream
    re-executes through branching AQE can't line up (e.g. a
    double-scanned temperature mixture) should checkpoint THEIR
    bounded relation before calling (see q_b24_corpus_v3).
    """
    from pyspark.sql import Window as W

    # exact long division (`div`), not float division-then-cast: double
    # rounding is only monotone below 2^53 while order_col is spec'd int64
    # r17 construction pass 2 (guide §4, driver side): the window/agg
    # projections render as SQL strings parsed once in the JVM —
    # identical trees ("rows between unbounded preceding and 1
    # preceding" == rowsBetween(unboundedPreceding, -1)), re-gated
    b = F.expr(f"cast({bq(order_col)} as bigint) div {int(bucket_size)}").alias("__b")
    with_bucket = df.select("*", b)
    local = with_bucket.selectExpr(
        "*",
        f"coalesce(sum({bq(value_col)}) over (partition by __b"
        f" order by {bq(order_col)} asc"
        " rows between unbounded preceding and 1 preceding), 0)"
        " as __local",
    )
    totals = (
        with_bucket.groupBy("__b")
        .agg(F.expr(f"sum({bq(value_col)}) as __t"))
        .selectExpr(
            "__b",
            "coalesce(sum(__t) over (order by __b asc"
            " rows between unbounded preceding and 1 preceding), 0)"
            " as __base",
        )
    )
    # totals has ONE row per bucket — the only single-partition window in
    # the plan runs over that tiny relation, then broadcasts back
    return (
        local.join(F.broadcast(totals), "__b")
        .withColumn(out_col, F.expr("cast(__base + __local as bigint)"))
        .drop("__b", "__local", "__base")
    )


def pack_sequences(
    df: DataFrame,
    order_col: str,
    size_col: str,
    budget: int,
    pack_col: str = "pack_id",
    bucket_size: int = 4096,
) -> DataFrame:
    """Assign each document to a training pack: sequential fill in
    ``order_col`` order, pack *p* = ``floor(exclusive-cumsum / budget)``
    (documents may straddle a boundary — the trainer's concat-then-chunk
    contract, exactly how GPT-style pretraining packs token streams).

    Built on :func:`prefix_sum`, so it scales: no single-partition global
    window, deterministic replay on any engine with a window cumsum.
    """
    out = prefix_sum(df, order_col, size_col, "__cum", bucket_size)
    # explicit floor: a bare double→long cast truncates on Spark but
    # ROUNDS on DuckDB — floor is the engine-agnostic spelling
    return out.withColumn(
        pack_col, F.floor(F.col("__cum") / F.lit(budget)).cast("long")
    ).drop("__cum")


def stratified_sample(
    df: DataFrame,
    key: str,
    strat_col: str,
    rates: Mapping[str, int],
    default_rate: int = 0,
    buckets: int = 100,
) -> DataFrame:
    """Per-stratum deterministic sampling: keep a row iff its bucket is
    below the stratum's rate (percent). The workhorse for rebalancing a
    corpus (e.g. keep 10% of English, 100% of low-resource languages)
    without a shuffle — one narrow filter, rates broadcast as a literal
    CASE expression."""
    rate = None
    for value, pct in sorted(rates.items()):
        cond = F.col(strat_col) == value
        rate = F.when(cond, pct) if rate is None else rate.when(cond, pct)
    rate = rate.otherwise(default_rate) if rate is not None else F.lit(default_rate)
    return df.filter(hash_bucket(key, buckets) < rate)


def mixture_sample(
    df: DataFrame,
    group_col: str,
    key_col: str,
    size_col: str,
    budgets: Mapping[str, int],
    default_budget: int | None = None,
    buckets: int = 100,
) -> DataFrame:
    """Budget-aware mixture sampling — the data-mixing step of a corpus
    build: deterministically downsample each group (domain / language /
    source) to ≈ its ``size_col`` budget (e.g. a token budget per lang).

    Three cheap steps: (1) per-group totals — one partial+final agg whose
    result is |groups| rows; (2) keep rate as an INTEGER bucket count,
    ``keep_b = min(buckets, (budget * buckets) div total)`` — exact
    integer arithmetic, so the decision replays identically on any engine
    (a float rate can flip a floor() on representation noise); (3) the
    tiny rate table broadcast back and ``bucket(key) < keep_b`` applied
    as a narrow map — the corpus itself is never shuffled. Quota
    resolution is 1/buckets (±1% at the default 100); raise ``buckets``
    for finer quotas. Groups absent from ``budgets`` keep everything
    unless ``default_budget`` is given. Deterministic: same key → same
    keep decision on every run at any parallelism.
    """
    totals = df.groupBy(group_col).agg(F.sum(F.col(size_col)).alias("__total"))
    case = None
    for g, amount in budgets.items():
        cond = F.col(group_col) == F.lit(g)
        lit = F.lit(int(amount))
        case = F.when(cond, lit) if case is None else case.when(cond, lit)
    if case is None:
        budget = F.lit(default_budget).cast("long")
    elif default_budget is not None:
        budget = case.otherwise(F.lit(int(default_budget)))
    else:
        budget = case  # unbudgeted groups -> NULL -> keep everything
    # A NULL budget (unbudgeted group), NULL total (all-NULL sizes) or
    # non-positive total (empty/zero-size group) all mean "keep everything":
    # the `div` must stay inside the otherwise() branch so ANSI mode never
    # sees a division by zero (CaseWhen evaluates branches lazily).
    rates = totals.withColumn("__budget", budget).select(
        group_col,
        F.when(
            F.col("__budget").isNull()
            | F.col("__total").isNull()
            | (F.col("__total") <= 0),
            F.lit(buckets),
        )
        .otherwise(
            F.least(
                F.lit(buckets), F.expr(f"(__budget * {int(buckets)}) div __total")
            )
        )
        .cast("long")
        .alias("__keep_b"),
    )
    return (
        df.join(F.broadcast(rates), group_col)
        .filter(hash_bucket(key_col, buckets) < F.col("__keep_b"))
        .drop("__keep_b")
    )


def sample_fixed_per_group(
    df: DataFrame,
    group_col: str,
    key_col: str,
    k: int,
    buckets: int = _M32,
) -> DataFrame:
    """Keep exactly ``min(k, |group|)`` rows per group, chosen by
    deterministic hash PRIORITY — the fixed-count companion to the
    rate-based samplers (eval-set carving, per-domain audit samples,
    "give me 1000 docs per language" requests).

    Priority = the full 32-bit Knuth hash of the key (not a coarse
    bucket), totally ordered by (priority, key), so the kept set is
    stable under any re-partitioning and replays identically on any
    engine — integer arithmetic end to end. One shuffle on the group key
    for the per-group ``row_number``; no global sort.
    """
    from pyspark.sql import Window as W

    pr = hash_bucket(key_col, buckets)
    w = W.partitionBy(group_col).orderBy(
        pr.asc(), F.col(key_col).asc()
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def epoch_mixture(
    df: DataFrame,
    group_col: str,
    key_col: str,
    size_col: str,
    budgets: Mapping[str, int],
    buckets: int = 100,
) -> DataFrame:
    """Epoch-aware mixture manifest: per-row REPEAT counts that hit each
    group's budget even when it exceeds the group's size — the
    up-sampling half of data mixing (``mixture_sample`` only drops; real
    recipes repeat low-resource sources, e.g. "3.5 epochs of wiki").

    Integer-exact: with ``r = (budget·buckets) div total``, every row
    gets ``r div buckets`` full epochs, and rows whose hash bucket falls
    below ``r mod buckets`` get one more — so Σ size·copies ≈ budget with
    resolution total/buckets, deterministic per key on any engine.
    Groups without a budget keep exactly 1 copy; ``n_copies`` may be 0
    (pure downsampling). Output: input columns + ``n_copies`` (bigint);
    feed ``explode(sequence(1, n_copies))`` (after filtering 0s) to
    materialize the recycled corpus. Plan: |groups|-row totals agg
    broadcast back; the corpus is never shuffled.
    """
    totals = df.groupBy(group_col).agg(F.sum(F.col(size_col)).alias("__total"))
    case = None
    for g, amount in budgets.items():
        cond = F.col(group_col) == F.lit(g)
        lit = F.lit(int(amount))
        case = F.when(cond, lit) if case is None else case.when(cond, lit)
    budget = case if case is not None else F.lit(None).cast("long")
    rates = totals.withColumn("__budget", budget).select(
        group_col,
        F.when(
            F.col("__budget").isNull()
            | F.col("__total").isNull()
            | (F.col("__total") <= 0),
            F.lit(None).cast("long"),
        )
        .otherwise(
            F.expr(f"(__budget * {int(buckets)}) div __total")
        )
        .alias("__r"),
    )
    b = hash_bucket(key_col, buckets)
    return (
        df.join(F.broadcast(rates), group_col)
        .withColumn(
            "n_copies",
            F.when(F.col("__r").isNull(), F.lit(1))
            .otherwise(
                F.expr(f"__r div {int(buckets)}")
                + F.when(b < F.col("__r") % buckets, F.lit(1)).otherwise(
                    F.lit(0)
                )
            )
            .cast("bigint"),
        )
        .drop("__r")
    )


def temperature_rates(
    df: DataFrame,
    group_col: str,
    size_col: str,
    total_budget: int,
    alpha: float = 0.5,
    buckets: int = 100,
) -> DataFrame:
    """Per-group keep rates for temperature-reweighted mixing — the
    multilingual-training α-sampling rule (mBERT/XLM-R style): target
    share q_g ∝ t_g^α, so α=1 keeps natural proportions and α→0
    flattens toward uniform, up-weighting low-resource groups.

    Math: t_g = Σ size per group; q_g = t_g^α / Σ_h t_h^α; the group's
    token target is q_g·budget and its keep rate (in integer buckets)
    ``keep_b = min(buckets, floor(q_g·budget·buckets / t_g + 1e-9))``.

    Engine-portability: α=0.5 uses ``sqrt`` — IEEE-correctly-rounded, so
    bit-identical on Spark and DuckDB (measured; ``pow`` is not) — and
    the 1e-9 epsilon absorbs the ≤few-ulp drift of the cross-group
    Σ t_h^α (whose accumulation order differs per engine) so the floor
    never flips. Plan: one |groups|-row aggregate, the normalizer as a
    broadcast 1-row crossJoin — the corpus is untouched.
    """
    # NULL/zero/negative totals (all-NULL sizes, empty groups) contribute
    # no weight and keep everything — same contract as mixture_sample's
    # guard: the division must never see a non-positive denominator
    # (0/0 → NaN would silently poison every group's rate via Σw).
    w_col = F.when(
        F.col("__total").isNull() | (F.col("__total") <= 0), F.lit(0.0)
    ).otherwise(
        F.sqrt(F.col("__total").cast("double"))
        if alpha == 0.5
        else F.pow(F.col("__total").cast("double"), F.lit(float(alpha)))
    )
    totals = (
        df.groupBy(group_col)
        .agg(F.sum(F.col(size_col)).alias("__total"))
        .withColumn("__w", w_col)
    )
    z = totals.agg(F.sum("__w").alias("__z"))
    return (
        totals.crossJoin(F.broadcast(z))
        .select(
            group_col,
            F.coalesce(F.col("__total"), F.lit(0))
            .cast("bigint")
            .alias("group_total"),
            F.when(
                F.col("__total").isNull()
                | (F.col("__total") <= 0)
                | F.col("__z").isNull()
                | (F.col("__z") <= 0),
                F.lit(buckets),
            )
            .otherwise(
                F.least(
                    F.lit(buckets).cast("long"),
                    F.floor(
                        (F.col("__w") / F.col("__z"))
                        * F.lit(float(total_budget))
                        * F.lit(float(buckets))
                        / F.col("__total").cast("double")
                        + F.lit(1e-9)
                    ),
                )
            )
            .cast("bigint")
            .alias("keep_b"),
        )
    )


def temperature_sample(
    df: DataFrame,
    group_col: str,
    key_col: str,
    size_col: str,
    total_budget: int,
    alpha: float = 0.5,
    buckets: int = 100,
) -> DataFrame:
    """Apply :func:`temperature_rates`: broadcast the tiny rate table back
    and keep rows whose key bucket falls under their group's rate — a
    narrow filter, the corpus is never shuffled (same contract as
    :func:`mixture_sample`, with budgets derived from the temperature
    instead of given per group)."""
    rates = temperature_rates(
        df, group_col, size_col, total_budget, alpha, buckets
    ).select(group_col, "keep_b")
    return (
        df.join(F.broadcast(rates), group_col)
        .filter(hash_bucket(key_col, buckets) < F.col("keep_b"))
        .drop("keep_b")
    )


def weighted_sample(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    k: int,
    max_weight: int = 64,
) -> DataFrame:
    """Weighted sampling WITHOUT replacement, exactly and deterministically
    (Efraimidis–Spirakis A-ES): inclusion probability proportional to an
    integer weight, no ``rand()`` anywhere. Classic A-ES orders items by
    ``u^(1/w)`` — float pow that never replays identically across
    engines. This uses the equivalent identity ``u^(1/w) ~ max of w iid
    uniforms``: each item spawns ``w`` tickets (``sequence`` + explode),
    each ticket draws a 60-bit integer "uniform" from the portable md5
    hash of ``key:ticket``, and the item's priority is the ticket MAX —
    the same distribution, in exact integer arithmetic any engine
    replays bit-for-bit.

    Returns the top-``k`` rows by (priority desc, key) with their
    ``__priority`` and 1-based ``rk``. Weights clamp to
    [1, ``max_weight``] — ticket amplification is bounded by
    ``max_weight``, so cost is ≤ ``max_weight``× one narrow pass + a
    per-item max agg + a distributed take-ordered (never a full global
    sort). Production swap: xxhash64(key, ticket) for the md5 — same
    plan, cheaper hash; md5 is the oracle-portable mode.
    """
    from pyspark.sql import Window as W

    from .dedup import portable_hash60

    w = F.least(
        F.greatest(F.col(weight_col).cast("long"), F.lit(1)),
        F.lit(max_weight),
    )
    tickets = df.withColumn("__w", w).withColumn(
        "__t", F.explode(F.sequence(F.lit(1), F.col("__w")))
    )
    drawn = tickets.withColumn(
        "__u",
        portable_hash60(
            F.concat(F.col(key_col).cast("string"), F.lit(":"), F.col("__t"))
        ),
    )
    group_cols = [c for c in df.columns] + ["__w"]
    prio = drawn.groupBy(*group_cols).agg(F.max("__u").alias("__priority"))
    # TakeOrderedAndProject first (per-partition partial top-k, driver
    # merges k rows) — THEN rank the k survivors; a bare global
    # row_number window would serialize the whole relation through one
    # partition (see prefix_sum's note above).
    top = prio.orderBy(F.col("__priority").desc(), F.col(key_col).asc()).limit(k)
    ww = W.orderBy(F.col("__priority").desc(), F.col(key_col).asc())
    return top.withColumn("rk", F.row_number().over(ww)).drop("__w")


#: Poisson(1) CDF cutoffs scaled to integer thresholds on [0, P) — the
#: inverse-CDF lookup used by poisson_bootstrap; computed once from
#: closed-form doubles, embedded as exact integer literals on both
#: engines (draws beyond the last cutoff — probability < 1e-8 — get
#: weight 8 = len(cuts): the weight expression starts at 8 and each
#: matched cutoff decrements it; both engines share the same tail)
def _poisson1_cutoffs(p_mod: int) -> list[int]:
    import math

    e = math.exp(-1.0)
    cdf, term, out = 0.0, e, []
    for k in range(8):
        cdf += term
        out.append(int(cdf * p_mod))
        term = term / (k + 1)
    return out


def poisson_bootstrap(
    df: DataFrame,
    key_col: str,
    value_col: str,
    n_replicates: int = 32,
    quant: int = 100,
) -> DataFrame:
    """Distributed bootstrap confidence interval for a mean in ONE pass
    — the Poisson-bootstrap trick: instead of resampling the corpus B
    times (B full passes), every row draws an independent Poisson(1)
    weight PER replicate, and replicate b's mean is the w-weighted
    mean. At 100 TB this is the only bootstrap that works: one scan,
    B·2 map-side-combinable partial sums, no resampling shuffle.

    Deterministic / engine-exact: ONE portable md5 hash per row, then
    the per-replicate uniform comes from the universal family
    ``(a_r·h + b_r) mod P`` (32 integer ops instead of 32 digests —
    the same base-hash trick as the MinHash signatures, measured 8×
    on this query); the Poisson inverse-CDF is an integer threshold
    table (identical literals both engines), values floor-quantize to
    ``1/quant`` units so every weighted sum is an integer; only the
    final mean division is a double, rounded 6.

    Output: one row per replicate ``(replicate, n_eff, mean_r)`` plus
    ``ci_lo``/``ci_hi`` (the 2nd-smallest / 2nd-largest replicate
    means — the rank-based ~94% interval for B=32) repeated per row.
    """
    from .dedup import MINHASH_P, _hash_family, portable_hash60

    cuts = _poisson1_cutoffs(MINHASH_P)
    fam = _hash_family(n_replicates, seed=0xB005)
    qv = F.floor(F.col(value_col) * quant).cast("long")
    h = F.pmod(portable_hash60(F.col(key_col).cast("string")), F.lit(MINHASH_P))

    def weight_sql(r: int) -> str:
        # weight = |{k : cuts[k] <= u}| — a FLAT sum of 8 boolean
        # comparisons instead of an 8-deep nested CASE chain (identical
        # values; the nested form made the 2B-expression agg plan cost
        # ~2.3 s in analysis+codegen alone at B=32). r17 (guide §1.1 —
        # profile before optimizing): the Column-object form of this
        # tree cost ~4 s PER CALL in driver-side construction alone
        # (64 deep aggregate trees built node-by-node over py4j;
        # execution of the whole query is ~0.3 s) — the expressions are
        # now rendered as SQL strings and parsed once each in the JVM,
        # which produces the identical Catalyst tree (integer literals
        # ≤ 2^31 parse as INT exactly like ``F.lit``; codegen CSE
        # dedups the repeated pmod subtree either way). Measured (same
        # session, steady state, with the string unpivot below): line
        # total 3.3–3.5 s → 1.5–1.6 s; the surviving ~1.3 s "build" is
        # the eager checkpoint's own job, i.e. the actual computation.
        # Bit-identical output (oracle PASS).
        a, b = fam[r]
        u = f"pmod(__h * {a} + {b}, {MINHASH_P})"
        comps = " + ".join(f"cast(({u} >= {c}) as int)" for c in cuts)
        return f"cast((0 + {comps}) as bigint)"

    # ONE aggregation pass over the N input rows: all 2B partial sums
    # (Σw_r, Σw_r·q for each replicate r) as conditional expressions in a
    # single agg — no B× exploded intermediate (the r8 plan materialized
    # 32×N (replicate, weight) structs into the groupBy; at 100 TB that
    # explode IS the job). The 1-row result then unpivots into the
    # B-replicate relation driver-side — a bounded posexplode.
    base = df.select(qv.alias("__q"), h.alias("__h"))
    aggs = []
    for r in range(n_replicates):
        w = weight_sql(r)
        aggs.append(F.expr(f"cast(sum({w}) as bigint) as __n{r}"))
        aggs.append(F.expr(f"cast(sum({w} * __q) as bigint) as __s{r}"))
    one = base.agg(*aggs)
    # string-first unpivot (same r17 rationale as weight_sql: the
    # Column-object struct array cost ~1 s of py4j round-trips per
    # build; one parsed expression is the identical tree)
    structs = ", ".join(
        f"struct({r} as replicate, __n{r} as n_eff, __s{r} as __s)"
        for r in range(n_replicates)
    )
    per = one.selectExpr(f"explode(array({structs})) as __rw").selectExpr(
        "__rw.replicate as replicate",
        "__rw.n_eff as n_eff",
        f"round(__rw.__s / (__rw.n_eff * {float(quant)}D), 6) as mean_r",
    )
    # `per` (B rows, bounded) is referenced twice through different
    # shapes (plain + ci agg) — without a checkpoint each branch
    # re-executes the full-scan 2B-sum agg (the r8 physical plan showed
    # the parquet scan THREE times under the old window/filter tail)
    per = per.localCheckpoint(eager=True)
    # 2nd-smallest / 2nd-largest of B bounded values: one sort_array agg
    # + a single 1-row broadcast beats the old rank-window + two filter
    # branches + two BroadcastNestedLoopJoins (fewer jobs, same values)
    ci = per.agg(F.sort_array(F.collect_list("mean_r")).alias("__ms")).select(
        F.element_at("__ms", 2).alias("ci_lo"),
        F.element_at("__ms", n_replicates - 1).alias("ci_hi"),
    )
    return per.crossJoin(F.broadcast(ci)).select(
        "replicate", "n_eff", "mean_r", "ci_lo", "ci_hi"
    )


def temporal_split(
    events: DataFrame,
    ts_col: str,
    key_col: str,
    train_end: str,
    test_start: str,
) -> DataFrame:
    """Leakage-aware temporal split — the time-series answer to random
    train/test splits (which leak future information backwards): train
    is strictly before ``train_end``, test strictly from
    ``test_start``, the gap between them is the embargo (rows there
    are dropped), AND any key (user/entity) active in the test window
    is PURGED from train — otherwise per-key state (habits, templates)
    leaks across the boundary.

    Pure filters + one broadcast-able semi/anti join pair on the
    test-key relation (bounded by |active keys in test|, far smaller
    than the stream). Deterministic; no hashing, no sampling.

    Output: the input rows + ``split`` ('train' | 'test') — embargoed
    and purged rows are absent; use counts vs the input to audit the
    cost of the embargo.
    """
    t1 = F.lit(train_end).cast("timestamp")
    t2 = F.lit(test_start).cast("timestamp")
    ts = F.col(ts_col)
    test = events.filter(ts >= t2).withColumn("split", F.lit("test"))
    test_keys = test.select(key_col).distinct()
    train = (
        events.filter(ts < t1)
        .join(F.broadcast(test_keys), key_col, "left_anti")
        .withColumn("split", F.lit("train"))
    )
    return train.unionByName(test)


def pareto_frontier(
    df: DataFrame,
    group_col: str,
    score_col: str,
    cost_col: str,
) -> DataFrame:
    """2-D Pareto skyline per group (score ↑ better, cost ↓ better):
    keep every row no other row in its group strictly dominates (≥
    score AND ≤ cost with one strict). Equal (score, cost) twins both
    survive — neither strictly dominates.

    A 2-D skyline needs NO pair join: group to the per-(group, score)
    cheapest cost, sweep a prefix-min down the descending score order
    (one window over the bounded distinct-score relation), and a row
    survives iff it matches its score group's min cost and beats the
    running min of all strictly-higher scores. Linear: one keyed agg +
    one window + one equi-join back. The frontier is a sublattice —
    ``frontier(frontier(A) ∪ B) == frontier(A ∪ B)`` — so incremental
    maintenance folds batches against standing frontier rows only
    (b17_incremental_frontier proves merge == recompute).

    Output: the input rows that survive (all columns preserved).
    """
    per_q = df.groupBy(group_col, score_col).agg(
        F.min(cost_col).alias("__mt")
    )
    wq = (
        Window.partitionBy(group_col)
        .orderBy(F.col(score_col).desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prefix = per_q.withColumn("__pmin", F.min("__mt").over(wq))
    j = df.join(prefix, [group_col, score_col])
    return j.filter(
        (F.col("__pmin").isNull() | (F.col("__pmin") > F.col(cost_col)))
        & (F.col(cost_col) == F.col("__mt"))
    ).drop("__mt", "__pmin")


def pps_systematic(
    df: DataFrame,
    weight_col: str,
    n: int,
    order_cols: Sequence[Column],
) -> DataFrame:
    """Systematic probability-proportional-to-size sampling (r13 — the
    SELECTION leg beside the estimation legs ``ht_estimate`` /
    ``neyman_allocation``): lay the units end-to-end on the cumulative
    weight line, drop ``n`` equally-spaced points (stride = W div n,
    deterministic half-stride start), and a unit is selected once per
    point inside its weight interval — the classic exactly-
    proportional, zero-variance-in-total design a pretraining mixture
    uses to hit a token budget without per-doc RNG. A unit heavier
    than the stride is selected MULTIPLE times (``n_hits`` ≥ 2, its
    repetition count in the sample) — the documented PPS property, not
    a bug.

    All integer arithmetic (floor divisions with non-negative
    numerators, so Spark's ``div`` and DuckDB's ``//`` agree), so the
    oracle replays selection bit-for-bit. Scale shape: the global
    cumulative line comes from :func:`derive.distributed_prefix_sum`
    (range-partitioned two-phase scan, never a one-task window); the
    (W, stride, start) scalars are a 1-row broadcast; selection is a
    narrow filter.

    Output: the selected units with ``(weight, cum_before, n_hits)``.
    """
    from sqlite_cdc_spark import derive

    base = df.withColumn("__w", F.col(weight_col).cast("long"))
    cum = derive.distributed_prefix_sum(
        base, order_cols, "__w", out_col="__cb"
    )
    # NB: Spark resolves names case-insensitively, so the total must
    # not be spelled "__W" beside "__w"
    tot = base.agg(F.sum("__w").cast("long").alias("__wtot"))
    params = tot.select(
        "__wtot",
        F.expr(f"__wtot div {n}").alias("__stride"),
        F.expr(f"(__wtot div {n}) div 2").alias("__r"),
    )
    scored = cum.crossJoin(F.broadcast(params))
    k_min = F.expr("(__cb - __r + __stride - 1) div __stride")
    k_hi = F.expr("(__cb + __w - __r + __stride - 1) div __stride")
    return (
        scored.withColumn(
            "n_hits",
            F.greatest(
                F.lit(0),
                F.least(k_hi, F.lit(n).cast("long")) - k_min,
            ).cast("long"),
        )
        .filter(F.col("n_hits") >= 1)
        .withColumn("weight", F.col("__w"))
        .withColumn("cum_before", F.col("__cb"))
        .drop("__w", "__cb", "__wtot", "__stride", "__r")
    )
