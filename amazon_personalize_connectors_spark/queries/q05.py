"""Query builders split out of __spark_entry__.py (r9): verbatim
moves, same names, same behavior — the entry file star-imports
this package to keep the driver contract stable."""

from __future__ import annotations

from amazon_personalize_connectors_spark.queries._shared import *  # noqa: F401,F403
from amazon_personalize_connectors_spark.queries.q01 import *  # noqa: F401,F403
from amazon_personalize_connectors_spark.queries.q02 import *  # noqa: F401,F403
from amazon_personalize_connectors_spark.queries.q03 import *  # noqa: F401,F403
from amazon_personalize_connectors_spark.queries.q04 import *  # noqa: F401,F403



def q_revenue_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Gini concentration of customer revenue per market segment
    (operators/analytics.py:concentration_gini): the whale-concentration
    report — rank-sum identity in pure bigint on the per-customer cents
    grid (closed-form tie runs, raw rows never windowed), ONE final
    division."""
    from amazon_personalize_connectors_spark.operators.analytics import (
        concentration_gini,
    )

    orders = synthetic.load_table(spark, sf_dir, "orders")
    customer = synthetic.load_table(spark, sf_dir, "customer")
    per_cust = orders.groupBy("o_custkey").agg(
        F.sum(
            (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("bigint")
        ).alias("cust_cents")
    )
    joined = per_cust.join(
        customer.select("c_custkey", "c_mktsegment"),
        per_cust.o_custkey == customer.c_custkey,
    ).select("c_mktsegment", "cust_cents")
    return concentration_gini(joined, ["c_mktsegment"], "cust_cents")


def q_user_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User-to-user Jaccard neighborhoods from the interaction bridge
    (operators/recsys.py:user_jaccard_topk) — top-5 neighbors per user,
    min 2 shared items; hot-item cap inert at driver SFs so the capless
    self-join oracle matches (cap semantics pytest-pinned)."""
    from amazon_personalize_connectors_spark.operators.recsys import (
        user_jaccard_topk,
    )

    mapping = synthetic.user_item_mapping(spark, sf_dir).select(
        F.col("USER_ID").cast("bigint").alias("user_id"),
        F.col("ITEM_ID").cast("bigint").alias("item_id"),
    )
    return user_jaccard_topk(
        mapping, k=5, max_users_per_item=1000, min_common=2
    ).withColumn("rank", F.col("rank").cast("int"))


def q_stream_auc_monitor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming score-quality monitor, ORACLE-CHECKED end to end
    (streaming/score_monitor.py): events staged as four parquet files
    drain ONE FILE PER MICRO-BATCH, each batch folding its (segment,
    score) pos/neg counts into the versioned grid store; the per-group
    AUC read from the final store must equal the batch rank-sum over
    all rows — the mergeable-grid law, regardless of batch splits."""
    import tempfile

    from amazon_personalize_connectors_spark.streaming.score_monitor import (
        auc_from_store,
        monitor_scores_from_stream,
    )

    ev = synthetic.load_events(spark, sf_dir).where(F.col("value").isNotNull())
    scored = ev.select(
        (F.col("user_id") % 4).cast("long").alias("segment"),
        (F.col("value").cast("decimal(18,2)") * 100)
        .cast("long")
        .alias("score"),
        (F.col("event_type") == "purchase").cast("int").alias("label"),
    )
    landing = tempfile.mkdtemp(prefix="apc-auc-landing-")
    store = tempfile.mkdtemp(prefix="apc-auc-store-")
    ckpt = tempfile.mkdtemp(prefix="apc-auc-ckpt-")
    scored.repartition(4).write.mode("append").parquet(landing)
    stream = (
        spark.readStream.schema("segment long, score long, label int")
        .option("maxFilesPerTrigger", 1)
        .parquet(landing)
    )
    monitor_scores_from_stream(stream, store, ckpt, "segment", "score", "label")
    return auc_from_store(spark, store).withColumnRenamed("g", "segment")


def q_price_qty_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Pearson correlation of quantity vs price cents per return
    flag (operators/features.py:grouped_pearson): decimal-exact moment
    sums (layout-independent), one correctly-rounded IEEE tail; the
    oracle computes the same exact integers in int128 and performs the
    same final conversions."""
    from amazon_personalize_connectors_spark.operators.features import (
        grouped_pearson,
    )

    li = synthetic.load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.col("l_quantity").cast("bigint").alias("qty"),
        (F.col("l_extendedprice").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("cents"),
    )
    return grouped_pearson(li, ["l_returnflag"], "qty", "cents")


def q_qty_price_spearman(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Spearman rank correlation of quantity vs price cents per
    return flag (operators/features.py:grouped_spearman): doubled-rank
    integers off the value grid (closed-form tie runs, no raw-row
    window), then the decimal-exact Pearson core."""
    from amazon_personalize_connectors_spark.operators.features import (
        grouped_spearman,
    )

    li = synthetic.load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.col("l_quantity").cast("bigint").alias("qty"),
        (F.col("l_extendedprice").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("cents"),
    )
    return grouped_spearman(li, ["l_returnflag"], "qty", "cents")


def q_price_qty_ols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact OLS fit of price cents on quantity per return flag
    (operators/features.py:grouped_ols): decimal-exact moment sums,
    closed-form slope/intercept/R² on a FIXED IEEE expression tail —
    bit-stable across partitionings; the oracle mirrors the identical
    expression tree on int128 moments."""
    from amazon_personalize_connectors_spark.operators.features import (
        grouped_ols,
    )

    li = synthetic.load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.col("l_quantity").cast("bigint").alias("qty"),
        (F.col("l_extendedprice").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("cents"),
    )
    return grouped_ols(li, ["l_returnflag"], "qty", "cents")


def q_chi2_flag_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square independence of return flag vs line status
    (operators/features.py:chi2_independence): exact bigint
    marginals, per-cell deviations cross-multiplied in decimal (no
    expected-value division), one IEEE tail per cell QUANTIZED to
    nano-units so the cross-cell sum is an exact bigint — the
    ipw_weighted_ratio pattern; Cramér's V rides on the same quanta."""
    from amazon_personalize_connectors_spark.operators.features import (
        chi2_independence,
    )

    li = synthetic.load_table(spark, sf_dir, "lineitem")
    return chi2_independence(li, "l_returnflag", "l_linestatus")


def q_mi_priority_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information + normalized MI between order priority and
    order status (operators/features.py:mutual_information): one
    map-side-combinable groupBy to the 15-cell grid, window marginals
    OVER THE GRID, every log argument a ratio of exact decimal
    cross-products cast to double once, per-cell terms quantized to
    nano-units so the cross-cell sum is an exact bigint (the
    chi2_flag_status pattern); mi/nmi clamp at 0 to absorb the
    floor() quantization bias on near-independent pairs."""
    from amazon_personalize_connectors_spark.operators.features import (
        mutual_information,
    )

    orders = synthetic.load_table(spark, sf_dir, "orders")
    return mutual_information(orders, "o_orderpriority", "o_orderstatus")


def q_ivm_join_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sided incremental view maintenance of a join rollup
    (operators/cdc.py:incremental_join_rollup): orders and lineitem
    are each split at 1999-01-01 into base + delta, the base
    join-rollup is 'stored', and the three delta terms (ΔA⋈B, A⋈ΔB,
    ΔA⋈ΔB) merge into it by exact bigint addition. The oracle is the
    FULL recompute over the unsplit tables — equality IS the delta
    rule. Revenue per order priority, exact cents."""
    from amazon_personalize_connectors_spark.operators.cdc import (
        incremental_join_rollup,
    )

    orders = synthetic.load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_orderdate"
    )
    li = synthetic.load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_shipdate",
        (F.col("l_extendedprice").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("cents"),
    )
    cut = F.lit("1999-01-01").cast("timestamp_ntz")
    base_a = orders.where(F.col("o_orderdate") < cut).drop("o_orderdate")
    delta_a = orders.where(F.col("o_orderdate") >= cut).drop("o_orderdate")
    base_b = li.where(F.col("l_shipdate") < cut).drop("l_shipdate")
    delta_b = li.where(F.col("l_shipdate") >= cut).drop("l_shipdate")
    base_rollup = (
        base_a.join(
            base_b, F.col("o_orderkey") == F.col("l_orderkey")
        )
        .groupBy("o_orderpriority")
        .agg(
            F.sum("cents").alias("sum_v"),
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        )
    )
    out = incremental_join_rollup(
        base_rollup,
        base_a,
        delta_a,
        base_b,
        delta_b,
        a_key="o_orderkey",
        b_key="l_orderkey",
        group_col="o_orderpriority",
        value_col="cents",
    )
    return out.select(
        "o_orderpriority",
        F.col("sum_v").cast("bigint").alias("sum_v"),
        F.col("n_rows").cast("bigint").alias("n_rows"),
    )


def q_stream_ivm_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming two-sided join-IVM, ORACLE-CHECKED end to end
    (streaming/ivm.py): orders (dimension side) and lineitem (fact
    side) interleave as a tagged union staged into four files that
    drain ONE PER MICRO-BATCH — so every batch carries a mix of ΔA
    and ΔB — and each epoch folds the three delta-rule terms into an
    epoch-versioned rollup store. The final store must equal the
    full batch join rollup over the unsplit tables, whatever the
    batch interleaving: the delta-rule law, end to end."""
    import tempfile

    from amazon_personalize_connectors_spark.streaming.ivm import (
        maintain_from_stream,
        rollup_from_store,
    )

    orders = synthetic.load_table(spark, sf_dir, "orders")
    li = synthetic.load_table(spark, sf_dir, "lineitem")
    tagged = orders.select(
        F.lit("A").alias("side"),
        F.col("o_orderkey").cast("long").alias("key"),
        F.col("o_orderpriority").alias("grp"),
        F.lit(None).cast("long").alias("val"),
    ).unionByName(
        li.select(
            F.lit("B").alias("side"),
            F.col("l_orderkey").cast("long").alias("key"),
            F.lit(None).cast("string").alias("grp"),
            (F.col("l_extendedprice").cast("decimal(18,2)") * 100)
            .cast("long")
            .alias("val"),
        )
    )
    landing = tempfile.mkdtemp(prefix="apc-ivm-landing-")
    store = tempfile.mkdtemp(prefix="apc-ivm-store-")
    ckpt = tempfile.mkdtemp(prefix="apc-ivm-ckpt-")
    tagged.repartition(4).write.mode("append").parquet(landing)
    stream = (
        spark.readStream.schema("side string, key long, grp string, val long")
        .option("maxFilesPerTrigger", 1)
        .parquet(landing)
    )
    maintain_from_stream(stream, store, ckpt)
    return rollup_from_store(spark, store).select(
        F.col("grp").alias("o_orderpriority"),
        F.col("sum_v").cast("bigint").alias("sum_v"),
        F.col("n_rows").cast("bigint").alias("n_rows"),
    )


def q_linear_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear multi-touch attribution (operators/analytics.py
    linear_attribution): each purchase's value splits evenly in
    integer micro-units across its 24 h window touches, division
    remainder to the latest touch (largest-remainder completion), so
    credit conserves exactly; per-channel bigint rollup, one double
    division at output."""
    from amazon_personalize_connectors_spark.operators.analytics import (
        linear_attribution,
    )

    ev = synthetic.load_events(spark, sf_dir)
    return linear_attribution(ev)


def q_sorted_neighborhood(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sorted-neighborhood near-dup candidates
    (functions/dedup.py:sorted_neighborhood_pairs): corpus ranked by
    text-prefix blocking key via the scale-safe contiguous-id
    machinery (no single-task global window), neighborhood w=5 via
    the band-join bucket trick (≤2 bucket rows per record, pairs
    linear in corpus size), exact distinct-token Jaccard per
    candidate. Oracle mirrors rank, neighborhood and Jaccard with
    row_number + a range self-join."""
    from amazon_personalize_connectors_spark.functions.dedup import (
        sorted_neighborhood_pairs,
    )

    docs = synthetic.load_table(spark, sf_dir, "documents")
    out = sorted_neighborhood_pairs(docs, window=5)
    return out.select(
        F.col("id_a").cast("bigint").alias("id_a"),
        F.col("id_b").cast("bigint").alias("id_b"),
        "rank_dist",
        "common",
        "union_size",
        "jaccard",
    )


def q_benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-digit audit of order totals in cents
    (operators/expectations.py:benford_profile): digits from the
    bigint's STRING form (exact in every engine — never a log10
    floor), exact counts, pinned literal reference probabilities so
    abs_dev subtracts identical bits in both engines."""
    from amazon_personalize_connectors_spark.operators.expectations import (
        benford_profile,
    )

    orders = synthetic.load_table(spark, sf_dir, "orders").select(
        (F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("cents")
    )
    return benford_profile(orders, "cents")


def q_revenue_acf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-k autocorrelation of daily revenue (lags 1, 7, 28): the
    seasonality detector behind the forecast_mase floor. Daily cents
    totals (exact bigints) pair with themselves via day-index
    equi-joins — the calendar-lag pattern, no window over raw rows —
    then each lag's correlation is operators/features.py's
    grouped_pearson on the exact pairs (decimal moment sums, one
    IEEE tail). Days missing either end of a lag pair drop out, as
    in the classic ACF-on-observed-days definition."""
    from amazon_personalize_connectors_spark.operators.features import (
        grouped_pearson,
    )

    orders = synthetic.load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.datediff(
            F.col("o_orderdate").cast("date"), F.lit("1970-01-01").cast("date")
        ).alias("di")
    ).agg(
        F.sum(
            (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("bigint")
        )
        .cast("bigint")
        .alias("v")
    )
    pairs = None
    for lag in (1, 7, 28):
        a = daily.select("di", F.col("v").alias("x"))
        b = daily.select(
            (F.col("di") - lag).alias("di"), F.col("v").alias("y")
        )
        p = a.join(b, "di").select(
            F.lit(lag).cast("int").alias("lag"), "x", "y"
        )
        pairs = p if pairs is None else pairs.unionByName(p)
    return grouped_pearson(pairs, ["lag"], "x", "y")


def q_fk_discovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inclusion-dependency (FK-discovery) profile over candidate
    relations (operators/expectations.py:key_containment): the three
    true TPC-H foreign keys plus a deliberate negative control —
    distinct-key containment, never raw x raw; one division per
    relation."""
    from amazon_personalize_connectors_spark.operators.expectations import (
        key_containment,
    )

    li = synthetic.load_table(spark, sf_dir, "lineitem")
    orders = synthetic.load_table(spark, sf_dir, "orders")
    part = synthetic.load_table(spark, sf_dir, "part")
    customer = synthetic.load_table(spark, sf_dir, "customer")
    rels = [
        key_containment(li, "l_orderkey", orders, "o_orderkey",
                        "lineitem.l_orderkey->orders.o_orderkey"),
        key_containment(li, "l_partkey", part, "p_partkey",
                        "lineitem.l_partkey->part.p_partkey"),
        key_containment(orders, "o_custkey", customer, "c_custkey",
                        "orders.o_custkey->customer.c_custkey"),
        # negative control: part keys are NOT customer keys in general
        key_containment(part, "p_partkey", customer, "c_custkey",
                        "part.p_partkey->customer.c_custkey"),
    ]
    out = rels[0]
    for r in rels[1:]:
        out = out.unionByName(r)
    return out


def q_fd_discovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Functional-dependency discovery
    (operators/expectations.py:functional_dependency): three
    candidates — the composite line-item PK (holds), orderkey ->
    linestatus (violated: multi-line orders mix statuses), and
    custkey -> orderpriority (violated: customers reorder at
    different priorities). Exact distincts, one rollup row each."""
    from amazon_personalize_connectors_spark.operators.expectations import (
        functional_dependency,
    )

    li = synthetic.load_table(spark, sf_dir, "lineitem")
    orders = synthetic.load_table(spark, sf_dir, "orders")
    cands = [
        functional_dependency(
            li, ["l_orderkey", "l_linenumber"], "l_partkey",
            "lineitem(l_orderkey,l_linenumber)->l_partkey",
        ),
        functional_dependency(
            li, ["l_orderkey"], "l_linestatus",
            "lineitem.l_orderkey->l_linestatus",
        ),
        functional_dependency(
            orders, ["o_custkey"], "o_orderpriority",
            "orders.o_custkey->o_orderpriority",
        ),
    ]
    out = cands[0]
    for c in cands[1:]:
        out = out.unionByName(c)
    return out


def q_tv_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Total-variation drift check (operators/features.py:tv_distance)
    between returned and non-returned price distributions — the
    total-mass-moved complement to the KS sup over the same
    populations: per-value cross-multiplied absolute differences
    summed in bigint, ONE division, no cumulative pass."""
    from amazon_personalize_connectors_spark.operators.features import (
        tv_distance,
    )

    li = synthetic.load_table(spark, sf_dir, "lineitem").select(
        (F.col("l_extendedprice").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("cents"),
        "l_returnflag",
    )
    return tv_distance(
        li,
        "cents",
        F.col("l_returnflag") == "R",
        F.col("l_returnflag") != "R",
    )


def q_stream_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second statistic off the SAME streaming score-grid state
    (streaming/score_monitor.py:calibration_from_store): drain the
    staged stream into the pointer-flip grid store, then serve the
    calibration/gains table — must equal the batch score_calibration
    over all rows (one maintained grid answers AUC and calibration)."""
    import tempfile

    from amazon_personalize_connectors_spark.streaming.score_monitor import (
        calibration_from_store,
        monitor_scores_from_stream,
    )

    ev = synthetic.load_events(spark, sf_dir).where(F.col("value").isNotNull())
    scored = ev.select(
        (F.col("user_id") % 4).cast("long").alias("segment"),
        (F.col("value").cast("decimal(18,2)") * 100)
        .cast("long")
        .alias("score"),
        (F.col("event_type") == "purchase").cast("int").alias("label"),
    )
    landing = tempfile.mkdtemp(prefix="apc-cal-landing-")
    store = tempfile.mkdtemp(prefix="apc-cal-store-")
    ckpt = tempfile.mkdtemp(prefix="apc-cal-ckpt-")
    scored.repartition(4).write.mode("append").parquet(landing)
    stream = (
        spark.readStream.schema("segment long, score long, label int")
        .option("maxFilesPerTrigger", 1)
        .parquet(landing)
    )
    monitor_scores_from_stream(stream, store, ckpt, "segment", "score", "label")
    return calibration_from_store(spark, store, bin_width=500)


def q_stream_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact discrete quantiles served from the SAME streaming drift
    grid that answers KS (streaming/drift_monitor.py:
    quantiles_from_store): stage, drain one file per micro-batch, then
    read p25/50/75/90/99 of everything drained off the maintained
    (value, count) state — must equal the batch inverse-CDF quantiles
    over all rows."""
    import tempfile

    from amazon_personalize_connectors_spark.streaming.drift_monitor import (
        monitor_from_stream,
        quantiles_from_store,
    )

    li = synthetic.load_table(spark, sf_dir, "lineitem").select(
        (F.col("l_extendedprice").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("cents"),
        "l_returnflag",
    )
    landing = tempfile.mkdtemp(prefix="apc-q-landing-")
    store = tempfile.mkdtemp(prefix="apc-q-store-")
    ckpt = tempfile.mkdtemp(prefix="apc-q-ckpt-")
    li.repartition(4).write.mode("append").parquet(landing)
    stream = (
        spark.readStream.schema("cents long, l_returnflag string")
        .option("maxFilesPerTrigger", 1)
        .parquet(landing)
    )
    monitor_from_stream(
        stream, store, ckpt, "cents",
        F.col("l_returnflag") == "R",
        F.col("l_returnflag") != "R",
    )
    return quantiles_from_store(spark, store, [25, 50, 75, 90, 99])


def q_ab_test_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pooled two-proportion z-test between the two user-parity arms
    (operators/evaluation.py:two_proportion_ztest): one aggregate for
    the four exact counts, then a fixed correctly-rounded IEEE tree
    (+,-,*,/,sqrt) the oracle spells identically — bit-for-bit z."""
    from amazon_personalize_connectors_spark.operators.evaluation import (
        two_proportion_ztest,
    )

    ev = synthetic.load_events(spark, sf_dir)
    rows = ev.select(
        (F.col("user_id") % 2).alias("arm"),
        (F.col("event_type") == "purchase").cast("int").alias("label"),
    )
    return two_proportion_ztest(
        rows, F.col("arm") == 0, F.col("arm") == 1, "label"
    )


def q_markov_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backtest of the first-order next-event model
    (operators/evaluation.py:top1_transition_accuracy): argmax
    transitions fitted on pre-cutoff pairs (grid window over the
    states-x-states table), top-1 accuracy scored on post-cutoff pairs
    via a broadcast model join — per-state bigint hits over one
    division."""
    from pyspark.sql.window import Window

    from amazon_personalize_connectors_spark.operators.evaluation import (
        top1_transition_accuracy,
    )

    events = synthetic.load_events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    pairs = (
        events.select(
            "user_id", "ts_us", "event_id",
            F.col("event_type").alias("from_type"),
        )
        .withColumn("to_type", F.lead("from_type").over(w))
        .where(F.col("to_type").isNotNull())
    )
    # 2024-01-22T00:00:00 in the fixture's epoch-microsecond clock
    # (ts_us == DuckDB epoch_us(ts); the events_sessionize parity)
    cutoff_us = 1_705_881_600_000_000
    return top1_transition_accuracy(
        pairs, "from_type", "to_type", F.col("ts_us") < F.lit(cutoff_us)
    )


def q_ipw_hitrate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Popularity-debiased hit rate of the related-items payload
    (operators/evaluation.py:ipw_weighted_ratio over the rec_hitrate
    fold): each query item's (hits, recs) weighted by the integer
    quantized inverse of its user-popularity — exact bigint fold, two
    final divisions; the debiased rate exposes how much of the raw
    hit rate rides on popular items."""
    from amazon_personalize_connectors_spark.operators.evaluation import (
        ipw_weighted_ratio,
    )
    from amazon_personalize_connectors_spark.operators.recsys import (
        rec_hitrate_by_cooccurrence,
    )

    recs = synthetic.related_items_batch_inference(spark, sf_dir)
    exploded = recs.where(F.col("error").isNull()).select(
        F.col("input.itemId").alias("query_item_id"),
        F.explode("output.recommendedItems").alias("rec_item"),
    )
    mapping = synthetic.user_item_mapping(spark, sf_dir).select(
        F.col("USER_ID").alias("user_id"), F.col("ITEM_ID").alias("item_id")
    )
    hits = rec_hitrate_by_cooccurrence(
        exploded, mapping, max_items_per_user=1000
    )
    pop = mapping.groupBy("item_id").agg(
        F.countDistinct("user_id").cast("bigint").alias("pop")
    )
    joined = hits.join(
        pop, hits.query_item_id == pop.item_id, "left"
    ).select(
        F.coalesce("pop", F.lit(1)).alias("pop"), "n_hits", "n_recs"
    )
    return ipw_weighted_ratio(joined, "pop", "n_hits", "n_recs")


def q_pareto_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D Pareto frontier (operators/analytics.py skyline_2d):
    largest part size at the lowest retail price — points where size
    cannot be raised without paying more. Raw parts collapse to the
    (size, cents) cell grid in one map-side-combinable pass; only the
    |size-domain| grid (50 values) rides the ordered running-min
    window. The oracle is an INDEPENDENT formulation (NOT EXISTS
    dominance over the per-size minima) — two different algorithms
    must agree on the exact frontier."""
    from amazon_personalize_connectors_spark.operators.analytics import (
        skyline_2d,
    )

    part = synthetic.load_table(spark, sf_dir, "part")
    pts = part.select(
        F.col("p_size").cast("bigint").alias("size"),
        (F.col("p_retailprice").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("cents"),
    )
    return skyline_2d(pts, "size", "cents").select(
        F.col("x").alias("size"),
        F.col("y").alias("min_cents"),
        "n_at_point",
        "n_at_x",
    )


def q_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index drift check (operators/features.py
    psi_drift): returned vs non-returned line-item prices in
    $1000-wide bins — the industry drift score beside the KS sup
    (ks_drift) and total-variation (tv_drift) over the SAME
    populations. Shared-support bins carry the quantized-bigint PSI
    sum (chi2 pattern — layout-independent); one-sided bins come
    back as exact integer mass numerators, not a smoothing fudge."""
    from amazon_personalize_connectors_spark.operators.features import (
        psi_drift,
    )

    li = synthetic.load_table(spark, sf_dir, "lineitem").select(
        F.expr(
            "CAST(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
            " DIV 100000 AS BIGINT)"
        ).alias("bin"),
        "l_returnflag",
    )
    return psi_drift(
        li,
        "bin",
        F.col("l_returnflag") == "R",
        F.col("l_returnflag") != "R",
    )


def q_bitemporal_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitemporal as-of report (operators/history.py
    bitemporal_asof_join): orders double as a two-axis changelog —
    valid time = the order date, transaction time = valid +
    (orderkey % 7) days (assertions arrive up to a week late). Each
    finished order asks "as KNOWN ten days after the order date, what
    was the latest priority EFFECTIVE at the order date" — a late
    correction (higher tx, same valid) wins; anything learned after
    T=+10d cannot leak in. The (valid, tx) argmax is ONE exact
    decimal(38,0) max (valid*10^19 + tx packs the lexicographic
    order); DuckDB mirrors it in HUGEINT, so both engines pick the
    identical record. Report: per picked priority, fact count and the
    exact integer sum of assertion lag in days."""
    from amazon_personalize_connectors_spark.operators.history import (
        bitemporal_asof_join,
    )

    orders = synthetic.load_table(spark, sf_dir, "orders")
    # epoch DAYS, not micros: o_orderdate is TIMESTAMP_NTZ, and a
    # timestamp cast would drag session-timezone semantics into the
    # oracle comparison — datediff from the epoch is timezone-free
    day = F.datediff(
        F.to_date("o_orderdate"), F.lit("1970-01-01").cast("date")
    ).cast("bigint")
    log = orders.select(
        F.col("o_custkey").alias("cust"),
        day.alias("lv"),
        (day + (F.col("o_orderkey") % 7).cast("bigint")).alias("ltx"),
        F.col("o_orderpriority").alias("prio"),
    )
    facts = orders.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("cust"),
        F.col("o_orderkey").alias("fid"),
        day.alias("fv"),
        (day + F.lit(10).cast("bigint")).alias("ft"),
    )
    picked = bitemporal_asof_join(
        facts,
        log,
        ["cust"],
        fact_id_col="fid",
        fact_tx_col="ft",
        fact_valid_col="fv",
        log_tx_col="ltx",
        log_valid_col="lv",
        attr_cols=["prio"],
    )
    return picked.groupBy("prio").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_facts"),
        F.sum(F.col("picked_tx") - F.col("picked_valid"))
        .cast("bigint")
        .alias("sum_lag_days"),
    )




def q_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO as one batch operator (operators/cdc.py:
    merge_upsert): upsert 1998 order revenue onto the customer
    dimension — matched customers get their balance replaced by the
    year's revenue cents, a shifted-key copy of the source exercises
    the insert clause, and untouched customers ride through. ONE
    full-outer shuffle join + row-local CASE; the oracle is the same
    merge as a FULL OUTER JOIN with COALESCE clauses."""
    from amazon_personalize_connectors_spark.operators.cdc import (
        merge_upsert,
    )

    target = synthetic.load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").cast("bigint").alias("k"),
        F.col("c_nationkey").cast("bigint").alias("nk"),
        (F.col("c_acctbal").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("bal_cents"),
    )
    rev = (
        synthetic.load_table(spark, sf_dir, "orders")
        .where(F.year("o_orderdate") == 1998)
        .groupBy(F.col("o_custkey").cast("bigint").alias("k"))
        .agg(
            F.sum(
                (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast(
                    "bigint"
                )
            )
            .cast("bigint")
            .alias("bal_cents")
        )
        .select("k", (F.col("k") % 25).cast("bigint").alias("nk"), "bal_cents")
    )
    source = rev.unionByName(
        rev.select(
            (F.col("k") + 10_000_000).alias("k"), "nk", "bal_cents"
        )
    )
    return merge_upsert(target, source, ["k"]).select(
        "k", "nk", "bal_cents"
    )




def q_variant_drift_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1-drift (sources/readers.py:parse_batch_inference_drift):
    schema-drift-tolerant batch-inference scan via Spark 4 VARIANT,
    closing the Glue DynamicFrame choice-type gap (ri:99-107). The
    fixture JSONL is built IN-PLAN from part with four per-record
    shapes — clean strings, numeric drift (unquoted id + numeric rec
    list, the classic choice type), an error row, and an unparseable
    line — and the oracle reconstructs the expected typed rows
    relationally, so equality pins absorb-and-flag semantics:
    drifted records land CAST into the declared schema with
    _drift=true instead of in _corrupt_record."""
    from amazon_personalize_connectors_spark.sources.readers import (
        parse_batch_inference_drift,
    )

    part = synthetic.load_table(spark, sf_dir, "part")
    n = part.agg((F.max("p_partkey") + 1).alias("n"))
    k = F.col("p_partkey").cast("bigint")
    base = part.select(k.alias("k")).crossJoin(F.broadcast(n))
    r1 = ((F.col("k") + 1) % F.col("n")).cast("string")
    r2 = ((F.col("k") + 2) % F.col("n")).cast("string")
    ks = F.col("k").cast("string")
    line = (
        F.when(
            F.col("k") % 10 == 0,
            F.concat(
                F.lit('{"input":{"itemId":"'), ks,
                F.lit('"},"error":"ITEM_NOT_IN_DATASET"}'),
            ),
        )
        .when(
            F.col("k") % 3 == 0,
            F.concat(
                F.lit('{"input":{"itemId":'), ks,
                F.lit('},"output":{"recommendedItems":['), r1,
                F.lit(','), r2, F.lit(']}}'),
            ),
        )
        .when(F.col("k") % 17 == 0, F.concat(F.lit('{"broken '), ks))
        .otherwise(
            F.concat(
                F.lit('{"input":{"itemId":"'), ks,
                F.lit('"},"output":{"recommendedItems":["'), r1,
                F.lit('","'), r2, F.lit('"]}}'),
            )
        )
    )
    parsed = parse_batch_inference_drift(base.select(line.alias("value")))
    return parsed.select(
        F.col("input.itemId").alias("item_id"),
        F.size("output.recommendedItems").cast("bigint").alias("n_recs"),
        F.element_at("output.recommendedItems", 1).alias("first_rec"),
        F.col("error").alias("error"),
        F.col("_drift").alias("drift"),
        F.col("_corrupt_record").isNotNull().alias("is_corrupt"),
    )




def q_stream_running_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful streaming operator (streaming/stateful.py:
    running_user_stats_pandas — applyInPandasWithState, Arrow-batched,
    Update mode): drain the events table as a file stream with
    Trigger.AvailableNow; each micro-batch emits updated per-user
    (count, first, last) running stats; the LAST emit per user must
    equal the plain batch aggregate — which is exactly the DuckDB
    oracle (COUNT/MIN/MAX GROUP BY user_id)."""
    import tempfile

    from amazon_personalize_connectors_spark.streaming.stateful import (
        running_user_stats_pandas,
    )
    from amazon_personalize_connectors_spark.streaming.windows import (
        adaptive_stream_partitions,
        run_stream_to_memory,
    )

    landing = tempfile.mkdtemp(prefix="apc-stream-stats-")
    batch = synthetic.load_events(spark, sf_dir).select("user_id", "ts_us")
    batch.write.mode("overwrite").parquet(landing)
    stream = spark.readStream.schema(batch.schema).option(
        "maxFilesPerTrigger", 8
    ).parquet(landing)
    emits = run_stream_to_memory(
        running_user_stats_pandas(stream),
        output_mode="update",
        state_partitions=adaptive_stream_partitions(spark, landing),
    )
    # last emit per user == running total (n monotone, first/last
    # monotone in their directions)
    return emits.groupBy("user_id").agg(
        F.max("n_events").cast("bigint").alias("n_events"),
        F.min("first_ts_us").cast("bigint").alias("first_ts_us"),
        F.max("last_ts_us").cast("bigint").alias("last_ts_us"),
    )




def q_linkage_fs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fellegi-Sunter record linkage (operators/linkage.py): customer
    candidate pairs BLOCKED on (nation, market segment) — the bounded
    pair generator — scored with integer micro log-likelihood weights
    over three agreement fields (balance within 100.00, key residue
    mod 97, name length), classified by a threshold pair, and rolled
    up per decision. The oracle repeats the identical self-join +
    CASE arithmetic in SQL — exact bigint end to end."""
    from amazon_personalize_connectors_spark.operators.linkage import (
        linkage_scores,
    )

    cust = synthetic.load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").cast("bigint").alias("k"),
        F.col("c_nationkey").cast("bigint").alias("nk"),
        F.col("c_mktsegment").alias("seg"),
        (F.col("c_acctbal").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("bal"),
        F.length("c_name").cast("bigint").alias("nlen"),
    )
    a = cust.alias("a")
    b = cust.alias("b")
    # blocking must BOUND block size at any data scale: nation x
    # segment alone grows with the customer table (quadratic pairs at
    # 100 TB), so a key-range co-key (custkey DIV 5000, the
    # sorted-neighborhood flavor) caps every block at 5000 members by
    # construction — recall within a block is the demo's scope; the
    # LSH/SNM generators in functions/dedup.py are the recall paths
    pairs = a.join(
        b,
        (F.col("a.nk") == F.col("b.nk"))
        & (F.col("a.seg") == F.col("b.seg"))
        & (F.expr("a.k div 5000") == F.expr("b.k div 5000"))
        & (F.col("a.k") < F.col("b.k")),
    ).select(
        F.col("a.k").alias("k1"),
        F.col("b.k").alias("k2"),
        (F.abs(F.col("a.bal") - F.col("b.bal")) <= 10_000).alias("_balband"),
        (F.col("a.k") % 97 == F.col("b.k") % 97).alias("_keymod"),
        (F.col("a.nlen") == F.col("b.nlen")).alias("_namelen"),
    )
    scored = linkage_scores(
        pairs,
        {
            "balband": (F.col("_balband"), 0.9, 0.05),
            "keymod": (F.col("_keymod"), 0.85, 0.1),
            "namelen": (F.col("_namelen"), 0.7, 0.3),
        },
        upper_micro=4_000_000,
        lower_micro=0,
    )
    return scored.groupBy("decision").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.sum("score_micro").cast("bigint").alias("score_sum"),
    )


def q_kfold_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe stratified k-fold audit (operators/features.py:
    stratified_kfold / kfold_report): orders grouped-split on
    o_custkey into 5 folds via the portable Lehmer-step hash (plain
    bigint arithmetic, so the oracle runs the SAME expression), with
    per-(priority, fold) row and key counts. Row-local fold
    assignment + one aggregate; zero extra shuffles."""
    from amazon_personalize_connectors_spark.operators.features import (
        kfold_report,
    )

    orders = synthetic.load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").cast("bigint").alias("o_custkey"),
        F.col("o_orderpriority").alias("priority"),
    )
    rep = kfold_report(orders, ["priority"], "o_custkey", 5)
    return rep.select(
        "priority",
        F.col("fold").cast("int").alias("fold"),
        "n_rows",
        "n_keys",
    )




def q_annotator_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa (operators/evaluation.py:cohens_kappa) between
    two deterministic "annotators" of order urgency — the priority
    field vs a clerk-parity rule — the labeling-QA gate as exact
    bigint confusion/marginal arithmetic with ONE final division.
    The oracle repeats the identical grid algebra in SQL."""
    from amazon_personalize_connectors_spark.operators.evaluation import (
        cohens_kappa,
    )

    orders = synthetic.load_table(spark, sf_dir, "orders")
    labeled = orders.select(
        F.when(
            F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), F.lit("hot")
        )
        .otherwise(F.lit("cold"))
        .alias("rater_a"),
        F.when(F.col("o_custkey") % 3 == 0, F.lit("hot"))
        .otherwise(F.lit("cold"))
        .alias("rater_b"),
    )
    return cohens_kappa(labeled, "rater_a", "rater_b")




def q_score_ece(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expected Calibration Error (operators/evaluation.py:
    expected_calibration_error) of the cents score against purchase
    labels over 500-cent bins on a 0-100.00 (10000-cent) confidence
    scale — exact bigint cross-multiplied bin gaps, ONE division.
    Oracle: the identical integer algebra in SQL."""
    from amazon_personalize_connectors_spark.operators.evaluation import (
        expected_calibration_error,
    )

    ev = synthetic.load_events(spark, sf_dir).where(F.col("value").isNotNull())
    scored = ev.select(
        (F.col("value").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("score"),
        (F.col("event_type") == "purchase").cast("int").alias("label"),
    )
    return expected_calibration_error(
        scored, "score", "label", bin_width=500, score_scale=10_000
    )




def q_revenue_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-changepoint detection on daily revenue (operators/
    analytics.py:changepoint_single): the argmin-SSE split of the
    calendar-bounded daily cents series, exact prefix sums (bigint /
    decimal(38,0)) under a fixed per-candidate IEEE cost tree that
    the oracle spells identically — so the chosen split day, the
    integer segment sums, AND the double cost/gain match
    bit-for-bit."""
    from amazon_personalize_connectors_spark.operators.analytics import (
        changepoint_single,
    )

    orders = synthetic.load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.col("o_orderdate").cast("date").alias("day")
    ).agg(
        F.sum(
            (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("bigint")
        )
        .cast("bigint")
        .alias("cents")
    )
    out = changepoint_single(daily, "day", "cents")
    return out.select(
        F.col("split_day").cast("string").alias("split_day"),
        "n_left", "n_right", "sum_left", "sum_right", "cost", "gain",
    )




def q_stream_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming incremental MinHash-LSH near-dup maintenance
    (streaming/neardup_monitor.py): the documents subset arrives as a
    multi-file stream (AvailableNow), each micro-batch bands only its
    own docs and joins them against the accumulated band state —
    history is never re-banded — and the union of per-epoch candidate
    pairs must equal the batch minhash_lsh_candidates over everything
    drained. Same params as q:minhash_lsh, so the SAME DuckDB oracle
    applies (sqls["stream_minhash_lsh"] = sqls["minhash_lsh"])."""
    import tempfile

    from amazon_personalize_connectors_spark.streaming.neardup_monitor import (
        candidates_from_store,
        maintain_from_stream,
    )

    docs = synthetic.load_table(spark, sf_dir, "documents").where(
        F.col("doc_id") % 5 == 0
    ).select("doc_id", "text")
    landing = tempfile.mkdtemp(prefix="apc-neardup-landing-")
    # several files so AvailableNow produces several micro-batches
    docs.repartition(4).write.mode("overwrite").parquet(landing)
    stream = spark.readStream.schema(docs.schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(landing)
    store = tempfile.mkdtemp(prefix="apc-neardup-store-")
    ckpt = tempfile.mkdtemp(prefix="apc-neardup-ckpt-")
    maintain_from_stream(stream, store, ckpt, n=2)
    return candidates_from_store(spark, store).select(
        F.col("id_a").cast("bigint").alias("id_a"),
        F.col("id_b").cast("bigint").alias("id_b"),
        "n_shared_bands",
    )


def q_mannwhitney_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Mann-Whitney U rank-sum test on event value cents,
    purchase vs view (operators/features.py:mannwhitney_u): exact
    bigint/decimal(38,0) rank and tie sums over the distinct-cents
    grid, then the tie-corrected z and rank-biserial effect as fixed
    IEEE trees the oracle spells identically."""
    from amazon_personalize_connectors_spark.operators.features import (
        mannwhitney_u,
    )

    ev = synthetic.load_events(spark, sf_dir)
    rows = ev.where(F.col("event_type").isin("purchase", "view")).select(
        "event_type",
        (F.col("value").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("cents"),
    )
    return mannwhitney_u(rows, "event_type", "purchase", "view", "cents")


def q_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Additive seasonal decomposition of daily order revenue
    (operators/analytics.py:seasonal_decompose_exact): centered 7-day
    trend, epoch-anchored day-of-week seasonal means, and residuals —
    every component an exact integer numerator over a known
    denominator, so the oracle matches bit-for-bit with no float
    summation anywhere."""
    from amazon_personalize_connectors_spark.operators.analytics import (
        seasonal_decompose_exact,
    )

    orders = synthetic.load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.col("o_orderdate").cast("date").alias("day")
    ).agg(
        F.sum(
            (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("bigint")
        )
        .cast("bigint")
        .alias("cents")
    )
    out = seasonal_decompose_exact(daily, "day", "cents", period=7)
    return out.select(
        F.col("day").cast("string").alias("day"),
        "v", "trend_num", "dow", "seasonal_num", "slot_cnt", "residual_num",
    )


def q_theilsen_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust slope of daily order revenue (operators/
    analytics.py:theilsen_slope): the lower median of all pairwise
    slopes, quantized to exact bigints with pure integer remainder
    algebra — no float median, bit-identical to the oracle."""
    from amazon_personalize_connectors_spark.operators.analytics import (
        theilsen_slope,
    )

    orders = synthetic.load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.col("o_orderdate").cast("date").alias("day")
    ).agg(
        F.sum(
            (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("bigint")
        )
        .cast("bigint")
        .alias("cents")
    )
    return theilsen_slope(daily, "day", "cents", scale=1_000_000)


def q_quota_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Largest-remainder apportionment of a 10,000-document sampling
    budget across (lang, source) corpus strata proportional to
    character mass (operators/analytics.py:
    largest_remainder_allocation): exact integer quotient/remainder
    algebra, slots sum to the budget by construction."""
    from amazon_personalize_connectors_spark.operators.analytics import (
        largest_remainder_allocation,
    )

    docs = synthetic.load_table(spark, sf_dir, "documents")
    return largest_remainder_allocation(
        docs, ["lang", "source"], "n_chars", total_slots=10_000
    )


def q_basket_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent 3-itemsets via the Apriori pruning step
    (operators/analytics.py:frequent_triples): candidates come from
    closing triangles over the support-filtered PAIR list (domain-
    sized), then one verify aggregate against the baskets — never a
    3-way fact self-join. The ORACLE is the independent brute-force
    3-way join, so the pruning must be lossless."""
    from amazon_personalize_connectors_spark.operators.analytics import (
        frequent_triples,
    )

    li = synthetic.load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").cast("bigint").alias("basket"),
        F.col("l_partkey").cast("bigint").alias("item"),
    )
    return frequent_triples(li, "basket", "item", min_support=2)


def q_revenue_share_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Region→nation revenue drill-down shares
    (operators/analytics.py:ratio_to_parent): each nation's exact
    integer share of its region and each region's share of total —
    one groupBy, one parent window, one 1-row broadcast; quotients
    via the pmod-subtract-divide idiom."""
    from amazon_personalize_connectors_spark.operators.analytics import (
        ratio_to_parent,
    )

    orders = synthetic.load_table(spark, sf_dir, "orders")
    cust = synthetic.load_table(spark, sf_dir, "customer")
    nation = synthetic.load_table(spark, sf_dir, "nation")
    region = synthetic.load_table(spark, sf_dir, "region")
    facts = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(nation, cust.c_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .select(
            F.col("r_name").alias("region"),
            F.col("n_name").alias("nation"),
            (F.col("o_totalprice").cast("decimal(18,2)") * 100)
            .cast("bigint")
            .alias("cents"),
        )
    )
    return ratio_to_parent(facts, ["region"], ["nation"], "cents")


def q_weighted_median_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted median price per return flag
    (operators/features.py:weighted_quantile, q=1/2): the price below
    which half the UNITS sell — weights collapse to one row per
    distinct value (tie-proof by construction), cumulative decimal
    sum, cross-multiplied rational crossing test. No floats."""
    from amazon_personalize_connectors_spark.operators.features import (
        weighted_quantile,
    )

    li = synthetic.load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        (F.col("l_extendedprice").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("cents"),
        F.col("l_quantity").cast("bigint").alias("qty"),
    )
    return weighted_quantile(li, ["l_returnflag"], "cents", "qty", 1, 2)


def q_lineitem_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson matrix over four lineitem measures in ONE
    aggregate scan (operators/features.py:corr_matrix): exact decimal
    moments for all 14 sums at once, literal-bounded pair inline —
    never a self-join; same fixed IEEE tail as grouped_pearson."""
    from amazon_personalize_connectors_spark.operators.features import (
        corr_matrix,
    )

    li = synthetic.load_table(spark, sf_dir, "lineitem").select(
        F.col("l_quantity").cast("bigint").alias("qty"),
        (F.col("l_extendedprice").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("price_c"),
        (F.col("l_discount").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("disc_c"),
        (F.col("l_tax").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("tax_c"),
    )
    return corr_matrix(li, ["qty", "price_c", "disc_c", "tax_c"])


def q_trimmed_mean_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10%-trimmed mean of order value cents per priority
    (operators/features.py:trimmed_mean): rank-count trimming (the
    kept multiset is tie-stable), decimal-exact kept sum, exact
    integer mean quotient — one window pass per group, no joins."""
    from amazon_personalize_connectors_spark.operators.features import (
        trimmed_mean,
    )

    orders = synthetic.load_table(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("priority"),
        (F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("cents"),
    )
    return trimmed_mean(orders, ["priority"], "cents", trim_pct=10)


def q_stream_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming EXACT distinct maintenance, ORACLE-CHECKED end to end
    (streaming/distinct_monitor.py): orders staged as four parquet
    files drain ONE FILE PER MICRO-BATCH, each batch OR-folding its
    per-(priority, id-bucket) bitmaps into the versioned epoch-keyed
    store; exact distinct customers served from the final store must
    equal batch COUNT(DISTINCT) — bitmaps merge by OR, so any batch
    split yields the same state. Bounded state: one ≤4 KiB bitmap per
    touched 32768-id bucket, never per row."""
    import tempfile

    from amazon_personalize_connectors_spark.streaming.distinct_monitor import (
        distinct_from_store,
        maintain_from_stream,
    )

    orders = synthetic.load_table(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("prio"),
        F.col("o_custkey").cast("bigint").alias("cust"),
    )
    landing = tempfile.mkdtemp(prefix="apc-dst-landing-")
    store = tempfile.mkdtemp(prefix="apc-dst-store-")
    ckpt = tempfile.mkdtemp(prefix="apc-dst-ckpt-")
    orders.repartition(4).write.mode("append").parquet(landing)
    stream = (
        spark.readStream.schema("prio string, cust long")
        .option("maxFilesPerTrigger", 1)
        .parquet(landing)
    )
    maintain_from_stream(stream, store, ckpt, ["prio"], "cust")
    return distinct_from_store(spark, store, ["prio"])


def q_kcore_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-core of the co-purchase graph (functions/dedup.py
    kcore_peel, 6 fixed peeling rounds): distinct co-ordered part
    pairs form the edges; vertices of residual degree < 3 peel away
    round by round, leaving the tightly co-purchased nucleus with its
    residual degree. Fixed-round semantics keep the iterative
    operator engine-reproducible; the oracle unrolls the same six
    rounds as chained CTEs."""
    from amazon_personalize_connectors_spark.functions.dedup import kcore_peel

    li = synthetic.load_table(spark, sf_dir, "lineitem").where(
        F.col("l_orderkey") % 4 == 0
    )
    # r13 (guide §2.4): row-local per-order pair generation (bounded
    # by items/order) instead of the corpus self-join — identical
    # pair set, one exchange fewer (see q_graph_walks).
    ps = li.groupBy(F.col("l_orderkey").alias("o")).agg(
        F.collect_set(F.col("l_partkey").cast("bigint")).alias("ps")
    )
    edges = (
        ps.select(F.explode("ps").alias("id_a"), "ps")
        .select("id_a", F.explode("ps").alias("id_b"))
        .where(F.col("id_a") < F.col("id_b"))
        .distinct()
    )
    return kcore_peel(edges, k=3, n_rounds=6).select(
        F.col("node").cast("bigint").alias("node"), "deg"
    )


def q_image_ahash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual image hashing, ORACLE-CHECKED through a REAL codec
    (functions/multimodal.py attach_synth_png + image_ahash):
    deterministic grayscale PNGs are genuinely zlib-encoded and
    re-decoded Spark-side (Arrow-batched mapInPandas), NN-resized to
    8×8 with the exact integer index map, and average-hashed — while
    the oracle reproduces the pixel arithmetic
    ((id·7 + 3x + 11y) mod 256) with generate_series, no codec. The
    hash match pins the full PNG encode→decode→resize→hash path."""
    from amazon_personalize_connectors_spark.functions.multimodal import (
        attach_synth_png,
        image_ahash,
    )

    part = synthetic.load_table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("media_id")
    )
    media = attach_synth_png(
        part.where(F.col("media_id") % 20 == 0), "media_id"
    )
    return image_ahash(media)


def q_image_resize_pixels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image RESIZE path, ORACLE-CHECKED through a REAL codec
    (functions/multimodal.py attach_synth_png + resize_images): the
    deterministic PNGs are decoded and nearest-neighbor-resized to
    4×3 Spark-side (the exact integer index map
    src = (dst·src_dim) // dst_dim), then the resized RAW PIXEL
    BUFFER is aggregated JVM-side (hex → conv per byte — no Python
    touches the pixels after the sanctioned decode boundary) into an
    exact pixel sum and a position-weighted sum that pins byte ORDER,
    not just content — while the oracle reproduces the same pixels as
    ((id·7 + 3·((x·w)//4) + 11·((y·h)//3)) mod 256) with
    generate_series, no codec. Closes the last pytest-only multimodal
    path (VERDICT r6 item 6): encode→decode→resize→buffer is now
    hash-checked end to end."""
    from amazon_personalize_connectors_spark.functions.multimodal import (
        attach_synth_png,
        resize_images,
    )

    part = synthetic.load_table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("media_id")
    )
    media = attach_synth_png(
        part.where(F.col("media_id") % 20 == 0), "media_id"
    )
    rs = resize_images(media, out_w=4, out_h=3)
    vals = F.expr(
        "transform(sequence(0, 11), i -> "
        "cast(conv(substring(hex(pixels), i*2+1, 2), 16, 10) as bigint))"
    )
    return rs.select(
        "media_id",
        F.col("width").cast("bigint").alias("width"),
        F.col("height").cast("bigint").alias("height"),
        F.col("nch").cast("bigint").alias("nch"),
        vals.alias("_v"),
    ).select(
        "media_id",
        "width",
        "height",
        "nch",
        F.expr("aggregate(_v, 0L, (a, v) -> a + v)").alias("px_sum"),
        F.expr(
            "aggregate(zip_with(_v, sequence(0, 11), (v, i) -> v * i),"
            " 0L, (a, v) -> a + v)"
        ).alias("px_possum"),
    )


def q_image_palette_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PALETTE PNG decode path, ORACLE-CHECKED through the REAL codec
    (functions/multimodal.py attach_synth_png_palette + resize_images
    — VERDICT r7 item 5, the PNG subtype real web corpora hit first):
    genuine PLTE/tRNS containers are decoded (indices -> RGB through
    the palette, alpha through the short tRNS table with the §11.3.2
    opaque default), NN-resized to 4x3 RGBA, and the raw 48-byte
    buffer aggregated JVM-side into exact sum + position-weighted sum
    — while the oracle reproduces every channel byte arithmetically
    with generate_series, no codec. Pins PLTE mapping, tRNS
    expansion, AND the RGBA byte interleave order."""
    from amazon_personalize_connectors_spark.functions.multimodal import (
        attach_synth_png_palette,
        resize_images,
    )

    part = synthetic.load_table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("media_id")
    )
    media = attach_synth_png_palette(
        part.where(F.col("media_id") % 20 == 3), "media_id"
    )
    rs = resize_images(media, out_w=4, out_h=3)
    vals = F.expr(
        "transform(sequence(0, 47), i -> "
        "cast(conv(substring(hex(pixels), i*2+1, 2), 16, 10) as bigint))"
    )
    return rs.select(
        "media_id",
        F.col("width").cast("bigint").alias("width"),
        F.col("height").cast("bigint").alias("height"),
        F.col("nch").cast("bigint").alias("nch"),
        vals.alias("_v"),
    ).select(
        "media_id",
        "width",
        "height",
        "nch",
        F.expr("aggregate(_v, 0L, (a, v) -> a + v)").alias("px_sum"),
        F.expr(
            "aggregate(zip_with(_v, sequence(0, 47), (v, i) -> v * i),"
            " 0L, (a, v) -> a + v)"
        ).alias("px_possum"),
    )

__all__ = [
    "q_revenue_gini",
    "q_user_similarity",
    "q_stream_auc_monitor",
    "q_price_qty_corr",
    "q_qty_price_spearman",
    "q_price_qty_ols",
    "q_chi2_flag_status",
    "q_mi_priority_status",
    "q_ivm_join_rollup",
    "q_stream_ivm_rollup",
    "q_linear_attribution",
    "q_sorted_neighborhood",
    "q_benford_audit",
    "q_revenue_acf",
    "q_fk_discovery",
    "q_fd_discovery",
    "q_tv_drift",
    "q_stream_calibration",
    "q_stream_quantiles",
    "q_ab_test_purchase",
    "q_markov_backtest",
    "q_ipw_hitrate",
    "q_pareto_skyline",
    "q_psi_drift",
    "q_bitemporal_report",
    "q_merge_upsert",
    "q_variant_drift_scan",
    "q_stream_running_stats",
    "q_linkage_fs",
    "q_kfold_report",
    "q_annotator_kappa",
    "q_score_ece",
    "q_revenue_changepoint",
    "q_stream_minhash_lsh",
    "q_mannwhitney_value",
    "q_seasonal_decompose",
    "q_theilsen_revenue",
    "q_quota_allocation",
    "q_basket_triples",
    "q_revenue_share_hierarchy",
    "q_weighted_median_price",
    "q_lineitem_corr_matrix",
    "q_trimmed_mean_price",
    "q_stream_distinct_users",
    "q_kcore_parts",
    "q_image_ahash",
    "q_image_resize_pixels",
    "q_image_palette_resize",
]
