"""Query builders split out of __spark_entry__.py (r9): verbatim
moves, same names, same behavior — the entry file star-imports
this package to keep the driver contract stable."""

from __future__ import annotations

from amazon_personalize_connectors_spark.queries._shared import *  # noqa: F401,F403
from amazon_personalize_connectors_spark.queries.q01 import *  # noqa: F401,F403
from amazon_personalize_connectors_spark.queries.q02 import *  # noqa: F401,F403
from amazon_personalize_connectors_spark.queries.q03 import *  # noqa: F401,F403



def q_tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape (large-volume orders): the HAVING subquery is
    one map-side-combinable aggregate over lineitem whose survivors
    (big orders) SEMI-join back — the probe side never widens — then
    customer decorates the survivors. Quantity sums as exact
    decimals; top 100 with full deterministic tie-break."""
    customer = synthetic.load_table(spark, sf_dir, "customer")
    orders = synthetic.load_table(spark, sf_dir, "orders")
    lineitem = synthetic.load_table(spark, sf_dir, "lineitem")
    qty = F.col("l_quantity").cast("decimal(18,2)")
    big = (
        lineitem.groupBy("l_orderkey")
        .agg(F.sum(qty).alias("sum_qty"))
        .where(F.col("sum_qty") > 150)
    )
    return (
        orders.join(big, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(customer, F.col("c_custkey") == F.col("o_custkey"))
        .orderBy(
            F.col("o_totalprice").desc(),
            F.col("o_orderdate"),
            F.col("o_orderkey"),
        )
        .limit(100)
        .select(
            F.col("c_custkey").cast("bigint").alias("c_custkey"),
            "c_name",
            F.col("o_orderkey").cast("bigint").alias("o_orderkey"),
            F.to_date("o_orderdate").cast("string").alias("o_orderdate"),
            F.col("o_totalprice").cast("double").alias("o_totalprice"),
            F.col("sum_qty").cast("double").alias("sum_qty"),
        )
    )


def q_tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (order-priority checking) adapted to the
    fixture schema (no l_commitdate/l_receiptdate — "late" means a
    lineitem shipped > 60 days after the order date): count orders
    per priority that have AT LEAST ONE late lineitem in a quarter
    window. The EXISTS subquery is a LEFT SEMI join — the probe side
    never widens, duplicate late lines cost nothing, and the date
    filter pushes to the orders scan."""
    orders = synthetic.load_table(spark, sf_dir, "orders")
    lineitem = synthetic.load_table(spark, sf_dir, "lineitem")
    lo = F.lit("1996-07-01").cast("timestamp_ntz")
    hi = F.lit("1996-10-01").cast("timestamp_ntz")
    win = orders.where(
        (F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi)
    )
    late = win.join(
        lineitem,
        (F.col("o_orderkey") == F.col("l_orderkey"))
        & (
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
        ),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).cast("bigint").alias("order_count"))
        .orderBy("o_orderpriority")
    )


def q_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 (forecasting revenue change): single scan, every
    predicate pushed into the parquet reader (date band, discount
    band, quantity cap), decimal-exact revenue sum — the canonical
    filter-pushdown probe; the plan must show PushedFilters on all
    three columns and no shuffle beyond the 1-row final aggregate."""
    lineitem = synthetic.load_table(spark, sf_dir, "lineitem")
    lo = F.lit("1996-01-01").cast("timestamp_ntz")
    hi = F.lit("1997-01-01").cast("timestamp_ntz")
    rev = F.col("l_extendedprice").cast("decimal(18,2)") * F.col(
        "l_discount"
    ).cast("decimal(18,6)")
    return (
        lineitem.where(
            (F.col("l_shipdate") >= lo)
            & (F.col("l_shipdate") < hi)
            & (F.col("l_discount").cast("decimal(18,6)") >= F.lit("0.05").cast("decimal(18,6)"))
            & (F.col("l_discount").cast("decimal(18,6)") <= F.lit("0.07").cast("decimal(18,6)"))
            & (F.col("l_quantity") < 24)
        )
        .agg(F.sum(rev).alias("_rev"), F.count(F.lit(1)).alias("n_items"))
        .select(
            F.col("_rev").cast("double").alias("revenue"),
            F.col("n_items").cast("bigint").alias("n_items"),
        )
    )


def q_tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 (promotion effect): one month of lineitem joined to
    part, conditional decimal-exact sums, promo share as ONE double
    division of two exact sums. part joins broadcast (small dim);
    the date band pushes to the lineitem scan."""
    lineitem = synthetic.load_table(spark, sf_dir, "lineitem")
    part = synthetic.load_table(spark, sf_dir, "part")
    lo = F.lit("1996-09-01").cast("timestamp_ntz")
    hi = F.lit("1996-10-01").cast("timestamp_ntz")
    rev = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1).cast("decimal(18,6)") - F.col("l_discount").cast("decimal(18,6)")
    )
    zero = F.lit(0).cast("decimal(30,8)")
    agg = (
        lineitem.where(
            (F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi)
        )
        .join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .agg(
            F.sum(
                F.when(F.col("p_type") == "PROMO", rev.cast("decimal(30,8)")).otherwise(zero)
            ).alias("_promo"),
            F.sum(rev.cast("decimal(30,8)")).alias("_total"),
        )
    )
    return agg.select(
        F.col("_promo").cast("double").alias("promo_revenue"),
        F.col("_total").cast("double").alias("total_revenue"),
        (
            F.col("_promo").cast("double")
            * F.lit(100.0)
            / F.col("_total").cast("double")
        ).alias("promo_pct"),
    )


def q_tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape (small-quantity-order revenue) for one brand:
    lineitems below 20% of their part's average quantity. The
    correlated scalar subquery is a per-part aggregate joined back;
    the threshold compare is INTEGER-EXACT — ``qty * 5 * n < sum``
    avoids the division entirely (qty < sum/(5n) ⟺ qty·5n < sum),
    so both engines agree bit-for-bit. The per-part aggregate is
    brand-filtered FIRST via the broadcast part dim, so only the
    brand's lineitems shuffle."""
    lineitem = synthetic.load_table(spark, sf_dir, "lineitem")
    part = synthetic.load_table(spark, sf_dir, "part")
    brand_parts = part.where(F.col("p_brand") == "Brand#12").select(
        "p_partkey"
    )
    li = lineitem.join(
        F.broadcast(brand_parts),
        F.col("l_partkey") == F.col("p_partkey"),
    )
    qty = F.col("l_quantity").cast("decimal(18,2)")
    stats = li.groupBy("l_partkey").agg(
        F.sum(qty).alias("_sum_qty"),
        F.count(F.lit(1)).alias("_n"),
    ).select(
        F.col("l_partkey").alias("_pk"), "_sum_qty", "_n"
    )
    small = li.join(
        F.broadcast(stats), F.col("l_partkey") == F.col("_pk")
    ).where(qty * 5 * F.col("_n") < F.col("_sum_qty"))
    return small.agg(
        (
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast(
                "double"
            )
            / F.lit(7.0)
        ).alias("avg_yearly"),
        F.count(F.lit(1)).cast("bigint").alias("n_small"),
    )


def q_last_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-aware last-touch attribution (operators/analytics.py
    last_touch_attribution): each purchase credited to the user's
    latest view/click STRICTLY before it (RANGE frame to 1 PRECEDING
    — simultaneous events excluded on value) within 24 h. Arg-max via
    the integer-encoded ts*8+code bigint — one window shuffle, exact
    div/mod decode, engine-portable."""
    from amazon_personalize_connectors_spark.operators.analytics import (
        last_touch_attribution,
    )

    ev = synthetic.load_events(spark, sf_dir)
    out = last_touch_attribution(ev)
    return out.select(
        F.col("user").cast("bigint").alias("user_id"),
        "conv_ts_us",
        "touch_ts_us",
        "touch_type_code",
        F.col("attributed").cast("int").alias("attributed"),
    )


def q_audience_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience Venn regions (operators/analytics.py segment_overlap):
    distinct users per view/click/purchase segment-combination
    bitmask — two map-side-combinable aggregates (per-user bit_or,
    then a <=2^n-row mask count), no self-joins or grouping-set
    explosion of the fact table."""
    from amazon_personalize_connectors_spark.operators.analytics import (
        segment_overlap,
    )

    ev = synthetic.load_events(spark, sf_dir)
    return segment_overlap(ev, ["view", "click", "purchase"])


def q_revenue_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust daily-revenue anomaly screen (operators/analytics.py
    residual_anomaly_days): integer residual 7*v - trailing-7-day-sum
    against k*MAD of the residual grid — division-free, discrete
    medians, calendar-bounded windows (the daily rollup is small at
    ANY data scale; the fact scan is the only big input)."""
    from amazon_personalize_connectors_spark.operators.analytics import (
        residual_anomaly_days,
    )

    orders = synthetic.load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.col("o_orderdate").cast("date").alias("day")
    ).agg(
        F.sum(
            (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("bigint")
        ).alias("cents")
    )
    out = residual_anomaly_days(daily, "day", "cents", trail_days=7, k=5)
    return out.select(
        F.col("day").cast("string").alias("day"),
        F.col("v").alias("cents"),
        "residual",
        "mad",
        F.col("is_anomaly").cast("int").alias("is_anomaly"),
    )


def q_rec_ndcg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NDCG@5 of the co-visitation model under the temporal-holdout
    protocol (operators/recsys.py rec_ndcg_at_k): train on pre-1997,
    truth = held-out co-interaction partners. DCG/IDCG are exact
    decimal sums of FIXED 9-dp gain literals (float log2 and float
    sums are engine/order-sensitive); one double division at the end.
    Truth streams past the broadcast rec table (the mrr lesson) —
    only the per-item relevant-count shuffles truth-sized."""
    from amazon_personalize_connectors_spark.operators.recsys import (
        cap_items_per_user,
        covisitation_topk,
        rec_ndcg_at_k,
    )

    orders = synthetic.load_table(spark, sf_dir, "orders")
    lineitem = synthetic.load_table(spark, sf_dir, "lineitem")
    cut = F.lit("1997-01-01").cast("timestamp_ntz")
    inter = (
        orders.join(lineitem, orders.o_orderkey == lineitem.l_orderkey)
        .select(
            F.col("o_custkey").alias("user_id"),
            F.col("l_partkey").alias("item_id"),
            (F.col("o_orderdate") < cut).alias("is_train"),
        )
        .groupBy("user_id", "item_id")
        .agg(
            F.max(F.col("is_train").cast("int")).alias("in_train"),
            F.max((~F.col("is_train")).cast("int")).alias("in_test"),
        )
    )
    train = inter.where(F.col("in_train") == 1).select("user_id", "item_id")
    test = inter.where(F.col("in_test") == 1).select("user_id", "item_id")
    recs = covisitation_topk(
        train, k=5, max_items_per_user=1000, min_common=2,
        assume_distinct=True,
    )
    capped = cap_items_per_user(
        test.select(F.col("user_id").alias("u"), F.col("item_id").alias("i")),
        1000,
    )
    truth = (
        capped.select("u", F.col("i").alias("item"))
        .join(capped.select("u", F.col("i").alias("partner")), "u")
        .where(F.col("item") != F.col("partner"))
        .select("item", "partner")
    )
    out = rec_ndcg_at_k(recs, truth, k=5)
    return out.select(
        F.col("item").cast("bigint").alias("item"),
        "n_rel",
        "n_hits",
        "dcg",
        "idcg",
        "ndcg",
    )


def _customer_privacy_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared privacy fixture: customer quasi-identifiers (nation,
    market segment, $1000 account-balance band in cents) with exact
    balance cents as the sensitive attribute."""
    from amazon_personalize_connectors_spark.operators.privacy import (
        k_anonymity_classes,
        numeric_band,
    )

    cust = synthetic.load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").cast("bigint").alias("nation"),
        F.col("c_mktsegment").alias("segment"),
        (F.col("c_acctbal").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("cents"),
    )
    banded = cust.select(
        "nation", "segment", numeric_band(F.col("cents"), 100_000).alias("band"),
        "cents",
    )
    return k_anonymity_classes(
        banded, ["nation", "segment", "band"], "cents", k=5, l_threshold=2
    )


def q_embedding_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding-centroid drift between two corpus halves
    (operators/drift.py embedding_centroid_drift): L1 distance between
    label centroids in pure associative integer arithmetic —
    |S_a*n_b - S_b*n_a| per dim is exact bigint, sums exactly across
    dims, ONE double division at the end (the vector version of the
    ks_drift exactness rule)."""
    from amazon_personalize_connectors_spark.operators.drift import (
        embedding_centroid_drift,
    )

    emb = synthetic.load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding", F.col("label").cast("bigint").alias("label")
    )
    snap_a = emb.where(F.col("vec_id") % 2 == 0)
    snap_b = emb.where(F.col("vec_id") % 2 == 1)
    return embedding_centroid_drift(snap_a, snap_b, "label", "embedding")


def q_stream_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming drift monitor, ORACLE-CHECKED end to end
    (streaming/drift_monitor.py): line items staged as four parquet
    files drain ONE FILE PER MICRO-BATCH, each batch folding its
    per-value counts into the versioned grid store; the KS statistic
    read from the final store must equal the batch ks_drift over all
    rows — the mergeable-grid law, regardless of batch splits."""
    import tempfile

    from amazon_personalize_connectors_spark.streaming.drift_monitor import (
        ks_from_store,
        monitor_from_stream,
    )

    li = synthetic.load_table(spark, sf_dir, "lineitem").select(
        (F.col("l_extendedprice").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("cents"),
        "l_returnflag",
    )
    landing = tempfile.mkdtemp(prefix="apc-drift-landing-")
    store = tempfile.mkdtemp(prefix="apc-drift-store-")
    ckpt = tempfile.mkdtemp(prefix="apc-drift-ckpt-")
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
    return ks_from_store(spark, store)


def q_survival_repurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-second-order survival table (operators/analytics.py
    survival_table): per customer, days from first to second distinct
    order date (censored at the global max date when no second order
    exists); one row per distinct duration with exact at-risk/event/
    censor counts — the KM probability fold is left to the consumer
    because a running float product is order-sensitive."""
    from amazon_personalize_connectors_spark.operators.analytics import (
        survival_table,
    )

    from pyspark.sql import Window

    orders = synthetic.load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("cust"),
        F.col("o_orderdate").cast("date").alias("d"),
    )
    dd = orders.distinct()
    w = Window.partitionBy("cust").orderBy("d")
    ranked = dd.withColumn("_rn", F.row_number().over(w)).where(
        F.col("_rn") <= 2
    )
    t1 = ranked.where(F.col("_rn") == 1).select("cust", F.col("d").alias("t1"))
    t2 = ranked.where(F.col("_rn") == 2).select("cust", F.col("d").alias("t2"))
    mx = orders.agg(F.max("d").alias("_mx"))
    obs = (
        t1.join(t2, "cust", "left")
        .crossJoin(F.broadcast(mx))
        .select(
            F.when(
                F.col("t2").isNotNull(), F.datediff("t2", "t1")
            )
            .otherwise(F.datediff("_mx", "t1"))
            .cast("long")
            .alias("dur"),
            F.col("t2").isNotNull().cast("int").alias("event"),
        )
    )
    return survival_table(obs, "dur", "event")


def q_rec_diversity_ils(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recommendation-list diversity (operators/recsys.py
    rec_intra_list_similarity): mean pairwise cosine of each top-5
    list's item embeddings (vec bridge: rec_item % n_vectors, the
    user_profile_vectors fixture convention). Dot products and norms
    are exact micro-unit bigints; per-pair cosine is one IEEE divide
    + sqrt; the per-list mean sums 6-dp DECIMALS — no float
    accumulation anywhere."""
    from amazon_personalize_connectors_spark.operators.recsys import (
        covisitation_topk,
        rec_intra_list_similarity,
    )

    mapping = synthetic.user_item_mapping(spark, sf_dir).select(
        F.col("USER_ID").cast("bigint").alias("user_id"),
        F.col("ITEM_ID").cast("bigint").alias("item_id"),
    )
    recs = covisitation_topk(mapping, k=5, max_items_per_user=1000, min_common=2)
    emb = synthetic.load_table(spark, sf_dir, "embeddings")
    nv = emb.agg(F.count(F.lit(1)).alias("_n"))
    bridged = recs.crossJoin(F.broadcast(nv)).select(
        "item",
        F.pmod(F.col("rec_item"), F.col("_n")).alias("rec_vec"),
        "rank",
    )
    out = rec_intra_list_similarity(
        bridged, emb, k=5, rec_col="rec_vec"
    )
    return out.select(
        F.col("item").cast("bigint").alias("item"), "n_pairs", "ils"
    )


def q_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full TPC-H Q1 (pricing summary report): the canonical
    scan-heavy aggregate — one pass, map-side combinable, every sum
    an exact decimal and every average ONE double division of an
    exact sum by its count. The charge chain steps through bounded
    decimal precisions (disc_price rounded to (18,6) before the tax
    multiply) so neither engine hits the 38-digit clamp, where
    rounding semantics diverge."""
    li = synthetic.load_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") <= F.lit("2001-06-01").cast("timestamp_ntz")
    )
    qty = F.col("l_quantity").cast("decimal(18,2)")
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = F.col("l_discount").cast("decimal(8,6)")
    tax = F.col("l_tax").cast("decimal(8,6)")
    disc_price = (price * (F.lit(1).cast("decimal(8,6)") - disc)).cast(
        "decimal(18,6)"
    )
    charge = disc_price * (F.lit(1).cast("decimal(8,6)") + tax)
    n = F.count(F.lit(1))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(qty).alias("_sq"),
            F.sum(price).alias("_sp"),
            F.sum(disc_price).alias("_sdp"),
            F.sum(charge).alias("_sc"),
            F.sum(disc).alias("_sd"),
            n.cast("bigint").alias("count_order"),
        )
        .select(
            "l_returnflag",
            "l_linestatus",
            F.col("_sq").cast("double").alias("sum_qty"),
            F.col("_sp").cast("double").alias("sum_base_price"),
            F.col("_sdp").cast("double").alias("sum_disc_price"),
            F.col("_sc").cast("double").alias("sum_charge"),
            (F.col("_sq").cast("double") / F.col("count_order")).alias(
                "avg_qty"
            ),
            (F.col("_sp").cast("double") / F.col("count_order")).alias(
                "avg_price"
            ),
            (F.col("_sd").cast("double") / F.col("count_order")).alias(
                "avg_disc"
            ),
            "count_order",
        )
    )


def q_tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape (discounted revenue, special handling): an OR
    of three (brand, size-band, quantity-band) conjunctions applied
    AFTER the part equi-join — the classic disjunctive-predicate
    probe (a naive plan turns the OR into a cross-ish join; keeping
    the equi key primary means part still broadcasts and the OR is a
    cheap post-join filter). Adapted to the fixture schema (no
    p_container — p_size bands instead)."""
    li = synthetic.load_table(spark, sf_dir, "lineitem")
    part = synthetic.load_table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1).cast("decimal(18,6)") - F.col("l_discount").cast("decimal(18,6)")
    )
    cond = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 5)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return (
        li.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .where(cond)
        .agg(
            F.sum(rev).cast("double").alias("revenue"),
            F.count(F.lit(1)).cast("bigint").alias("n_items"),
        )
    )


def q_scd2_pit_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time SCD2 decoration (operators/history.py pit_join):
    line-item revenue attributed to the customer's priority AS OF THE
    SHIP DATE — each fact joins the dimension version containing its
    own event time (key equality + interval containment; exactly one
    match per fact because intervals are disjoint). Joining the
    current version instead would backfill future knowledge — the
    leakage this operator exists to prevent."""
    from amazon_personalize_connectors_spark.operators.history import (
        pit_join,
        scd2_from_changelog,
    )

    orders = synthetic.load_table(spark, sf_dir, "orders")
    lineitem = synthetic.load_table(spark, sf_dir, "lineitem")
    log = orders.select(
        F.col("o_custkey").alias("cust"),
        F.to_date("o_orderdate").alias("d"),
        F.col("o_orderpriority").alias("prio"),
    )
    scd = scd2_from_changelog(log, ["cust"], "d", ["prio"]).select(
        "cust", "prio", "valid_from", "valid_to"
    )
    facts = orders.join(
        lineitem, F.col("o_orderkey") == F.col("l_orderkey")
    ).select(
        F.col("o_custkey").alias("cust"),
        F.to_date("l_shipdate").alias("ship_d"),
        (F.col("l_extendedprice").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("cents"),
    )
    joined = pit_join(facts, scd, ["cust"], "ship_d")
    return joined.groupBy("prio").agg(
        F.sum("cents").cast("bigint").alias("sum_cents"),
        F.count(F.lit(1)).cast("bigint").alias("n_items"),
    )


def q_source_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source corpus curation report (functions/text.py
    source_quality_report): exact integer doc/token/char totals,
    cross-corpus duplicate rate (16-byte digest counts joined back),
    English share — every rate ONE division of exact totals. The
    keep/drop/downsample table built before mixing sources."""
    from amazon_personalize_connectors_spark.functions.text import (
        source_quality_report,
    )

    docs = synthetic.load_table(spark, sf_dir, "documents")
    return source_quality_report(docs)


def q_grouping_sets_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS — the general form behind ROLLUP/CUBE (both
    already covered): per-nation totals, per-segment totals, and the
    grand total in ONE pass (Catalyst plans an Expand over the three
    sets feeding one aggregate — the fact table is scanned once, not
    three times). grouping() flags disambiguate NULL-as-all from a
    NULL group value; integer cents keep totals exact."""
    customer = synthetic.load_table(spark, sf_dir, "customer")
    orders = synthetic.load_table(spark, sf_dir, "orders")
    joined = orders.join(
        customer, F.col("o_custkey") == F.col("c_custkey")
    ).select(
        F.col("c_nationkey").cast("bigint").alias("nation"),
        F.col("c_mktsegment").alias("segment"),
        (F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("cents"),
    )
    joined.createOrReplaceTempView("_gs_rev")
    return spark.sql(
        """
        SELECT CAST(grouping(nation) AS INT) AS g_nation,
               CAST(grouping(segment) AS INT) AS g_segment,
               nation, segment,
               CAST(sum(cents) AS BIGINT) AS sum_cents,
               CAST(count(*) AS BIGINT) AS n_orders
        FROM _gs_rev
        GROUP BY GROUPING SETS ((nation), (segment), ())
        """
    )


def q_except_all_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL multiset difference (the bag-semantics sibling of
    the delta_except set form): part keys of returned line items
    minus, occurrence-for-occurrence, part keys of accepted ones —
    a part returned 5x and accepted 3x survives twice. Collapsed to
    (part, n) afterwards for a stable compare. exceptAll plans as
    count-annotated aggregate + generate, never a join fan-out."""
    li = synthetic.load_table(spark, sf_dir, "lineitem")
    r = li.where(F.col("l_returnflag") == "R").select(
        F.col("l_partkey").cast("bigint").alias("part")
    )
    a = li.where(F.col("l_returnflag") == "A").select(
        F.col("l_partkey").cast("bigint").alias("part")
    )
    return (
        r.exceptAll(a)
        .groupBy("part")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_surplus"))
    )


def q_unpivot_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long unpivot (DataFrame ``unpivot``/melt — the inverse of
    the pivot_events coverage): per-returnflag wide metrics (quantity
    cents, price cents, row count — all exact bigints so the melted
    value column has one type) into (flag, metric, value) rows.
    Catalyst plans Expand: one pass, rows x metrics out."""
    li = synthetic.load_table(spark, sf_dir, "lineitem")
    wide = li.groupBy(F.col("l_returnflag").alias("flag")).agg(
        F.sum((F.col("l_quantity").cast("decimal(18,2)") * 100).cast("bigint"))
        .cast("bigint")
        .alias("qty_cents"),
        F.sum(
            (F.col("l_extendedprice").cast("decimal(18,2)") * 100).cast("bigint")
        )
        .cast("bigint")
        .alias("price_cents"),
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
    )
    return wide.unpivot(
        ["flag"],
        ["qty_cents", "price_cents", "n_rows"],
        "metric",
        "value",
    )


def q_tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape (customer order-count distribution): LEFT join
    so zero-order customers survive with count 0, join-side filter
    (non-urgent orders — the fixture's stand-in for the comment
    anti-pattern) applied BEFORE the join so it prunes the probe
    side, then a second tiny aggregate over the per-customer counts.
    Two shuffles total; the distribution table is at most
    max-orders-per-customer rows."""
    customer = synthetic.load_table(spark, sf_dir, "customer")
    orders = synthetic.load_table(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        customer.join(
            orders, F.col("c_custkey") == F.col("o_custkey"), "left"
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").cast("bigint").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).cast("bigint").alias("custdist"))
    )


def q_tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape (top supplier): quarterly revenue per supplier,
    suppliers whose revenue EQUALS the maximum. The max rides in as a
    broadcast 1-row aggregate and the equality compares DECIMALS
    (exact) — comparing doubles would be a tie-break lottery. Revenue
    cast to double only at output."""
    li = synthetic.load_table(spark, sf_dir, "lineitem")
    supplier = synthetic.load_table(spark, sf_dir, "supplier")
    lo = F.lit("1996-01-01").cast("timestamp_ntz")
    hi = F.lit("1996-04-01").cast("timestamp_ntz")
    rev = (
        F.col("l_extendedprice").cast("decimal(18,2)")
        * (
            F.lit(1).cast("decimal(18,6)")
            - F.col("l_discount").cast("decimal(18,6)")
        )
    ).cast("decimal(30,8)")
    per_supp = (
        li.where((F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi))
        .groupBy(F.col("l_suppkey").alias("sk"))
        .agg(F.sum(rev).alias("total"))
    )
    mx = per_supp.agg(F.max("total").alias("mx"))
    return (
        per_supp.crossJoin(F.broadcast(mx))
        .where(F.col("total") == F.col("mx"))
        .join(F.broadcast(supplier), F.col("sk") == F.col("s_suppkey"))
        .select(
            F.col("s_suppkey").cast("bigint").alias("s_suppkey"),
            "s_name",
            F.col("total").cast("double").alias("total_revenue"),
        )
    )


def q_tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (global sales opportunity) on the fixture
    schema (nation replaces the phone country code): customers with
    above-average positive balances and NO RECENT orders (none since
    2000-09-01 — the fixture's lapsed-customer window; nearly every
    customer has SOME order, so the all-time form is vacuous),
    counted/summed per nation. The average is a broadcast 1-row aggregate computed as
    ONE decimal division of exact sums; "no orders" is a LEFT ANTI
    join — the big fact side never widens."""
    customer = synthetic.load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        F.col("c_nationkey").cast("bigint").alias("nation"),
        (F.col("c_acctbal").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("cents"),
    )
    orders = synthetic.load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") >= F.lit("2000-09-01").cast("timestamp_ntz")
    )
    pos = customer.where(F.col("cents") > 0)
    avg1 = pos.agg(
        F.sum("cents").alias("_s"), F.count(F.lit(1)).alias("_n")
    )
    rich = customer.crossJoin(F.broadcast(avg1)).where(
        F.col("cents") * F.col("_n") > F.col("_s")
    )
    no_orders = rich.join(
        orders, F.col("c_custkey") == F.col("o_custkey"), "left_anti"
    )
    return no_orders.groupBy("nation").agg(
        F.count(F.lit(1)).cast("bigint").alias("numcust"),
        F.sum("cents").cast("bigint").alias("totacctbal_cents"),
    )


def q_tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape (volume shipping between two nations): lineitem
    bridges a supplier nation and a customer nation; keep both
    directions of the (NATION_1, NATION_2) pair, bucket by ship year,
    decimal-exact revenue. Nation and supplier dims broadcast; the
    two-sided pair filter prunes BEFORE the revenue aggregate."""
    li = synthetic.load_table(spark, sf_dir, "lineitem")
    orders = synthetic.load_table(spark, sf_dir, "orders")
    customer = synthetic.load_table(spark, sf_dir, "customer")
    supplier = synthetic.load_table(spark, sf_dir, "supplier")
    nation = synthetic.load_table(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("_sn"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("_cn"), F.col("n_name").alias("cust_nation")
    )
    lo = F.lit("1996-01-01").cast("timestamp_ntz")
    hi = F.lit("1998-01-01").cast("timestamp_ntz")
    rev = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1).cast("decimal(18,6)") - F.col("l_discount").cast("decimal(18,6)")
    )
    pair_ok = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | (
        (F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1")
    )
    return (
        li.where((F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("_sn"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("_cn"))
        .where(pair_ok)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("l_year"),
        )
        .agg(F.sum(rev).cast("double").alias("revenue"))
    )


def q_tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape (national market share): for STANDARD-type
    parts sold into ASIA customers over two order years, NATION_2
    suppliers' revenue share per year — conditional decimal sums,
    ONE double division per year. Part/supplier/nation/region dims
    broadcast; the order-date band prunes the orders scan."""
    li = synthetic.load_table(spark, sf_dir, "lineitem")
    orders = synthetic.load_table(spark, sf_dir, "orders")
    customer = synthetic.load_table(spark, sf_dir, "customer")
    supplier = synthetic.load_table(spark, sf_dir, "supplier")
    nation = synthetic.load_table(spark, sf_dir, "nation")
    region = synthetic.load_table(spark, sf_dir, "region")
    part = synthetic.load_table(spark, sf_dir, "part")
    lo = F.lit("1995-01-01").cast("timestamp_ntz")
    hi = F.lit("1997-01-01").cast("timestamp_ntz")
    rev = (
        F.col("l_extendedprice").cast("decimal(18,2)")
        * (
            F.lit(1).cast("decimal(18,6)")
            - F.col("l_discount").cast("decimal(18,6)")
        )
    ).cast("decimal(30,8)")
    cust_nation = nation.select(
        F.col("n_nationkey").alias("_cn"), F.col("n_regionkey").alias("_cr")
    )
    supp_nation = nation.select(
        F.col("n_nationkey").alias("_sn"), F.col("n_name").alias("supp_nation")
    )
    asia = region.where(F.col("r_name") == "ASIA").select(
        F.col("r_regionkey").alias("_r")
    )
    zero = F.lit(0).cast("decimal(30,8)")
    yearly = (
        orders.where((F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi))
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(
            F.broadcast(part.where(F.col("p_type") == "STANDARD")),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .join(customer, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(cust_nation), F.col("c_nationkey") == F.col("_cn"))
        .join(F.broadcast(asia), F.col("_cr") == F.col("_r"))
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(supp_nation), F.col("s_nationkey") == F.col("_sn"))
        .groupBy(F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(
            F.sum(
                F.when(F.col("supp_nation") == "NATION_2", rev).otherwise(zero)
            ).alias("_nat"),
            F.sum(rev).alias("_tot"),
        )
    )
    return yearly.select(
        "o_year",
        F.col("_nat").cast("double").alias("nation_revenue"),
        F.col("_tot").cast("double").alias("total_revenue"),
        (F.col("_nat").cast("double") / F.col("_tot").cast("double")).alias(
            "mkt_share"
        ),
    )


def q_tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (minimum-cost supplier) on the fixture schema
    (no partsupp — the part-supplier relation and its cost derive
    from lineitem: cost = cheapest shipment in integer cents, exact
    and MIN-monotonic, where the official ps_supplycost would be):
    for size-15 parts and EUROPE suppliers, the supplier(s) achieving
    each part's minimum cost. The correlated MIN subquery is a
    per-part aggregate joined back on (partkey, exact-cents cost) —
    comparing doubles here would be a tie lottery. The part filter
    and the region-pruned supplier dim broadcast; the big lineitem
    scan collapses FIRST to the bounded (part, supplier) pair grid,
    so everything after the first aggregate is dimension-sized."""
    lineitem = synthetic.load_table(spark, sf_dir, "lineitem")
    part = synthetic.load_table(spark, sf_dir, "part")
    supplier = synthetic.load_table(spark, sf_dir, "supplier")
    nation = synthetic.load_table(spark, sf_dir, "nation")
    region = synthetic.load_table(spark, sf_dir, "region")
    cents = (F.col("l_extendedprice").cast("decimal(18,2)") * 100).cast(
        "bigint"
    )
    ps = lineitem.groupBy("l_partkey", "l_suppkey").agg(
        F.min(cents).alias("cost_cents")
    )
    eu = (
        supplier.join(
            F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
        )
        .join(
            F.broadcast(region.where(F.col("r_name") == "EUROPE")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    cand = ps.join(
        F.broadcast(part.where(F.col("p_size") == 15).select("p_partkey")),
        F.col("p_partkey") == F.col("l_partkey"),
    ).join(F.broadcast(eu), F.col("l_suppkey") == F.col("s_suppkey"))
    mn = cand.groupBy(F.col("p_partkey").alias("_pk")).agg(
        F.min("cost_cents").alias("_mn")
    )
    return (
        cand.join(
            mn,
            (F.col("p_partkey") == F.col("_pk"))
            & (F.col("cost_cents") == F.col("_mn")),
        )
        .orderBy(
            F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey"
        )
        .limit(100)
        .select(
            F.col("s_acctbal").cast("double").alias("s_acctbal"),
            "s_name",
            "n_name",
            F.col("p_partkey").cast("bigint").alias("p_partkey"),
            F.col("cost_cents").cast("bigint").alias("cost_cents"),
        )
    )


def q_tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (product-type profit by nation and year) on the
    fixture schema (no partsupp — unit cost stands in as
    p_retailprice, the official ps_supplycost's obvious proxy):
    profit = extprice*(1-disc) - retail*qty for parts named
    ``red ...``, summed per supplier nation per order year. Both
    terms stay decimal(30,8) (exact) until the single output cast;
    part/supplier/nation dims broadcast so lineitem shuffles once,
    for the final (nation, year) aggregate."""
    lineitem = synthetic.load_table(spark, sf_dir, "lineitem")
    orders = synthetic.load_table(spark, sf_dir, "orders")
    part = synthetic.load_table(spark, sf_dir, "part")
    supplier = synthetic.load_table(spark, sf_dir, "supplier")
    nation = synthetic.load_table(spark, sf_dir, "nation")
    rev = (
        F.col("l_extendedprice").cast("decimal(18,2)")
        * (
            F.lit(1).cast("decimal(18,6)")
            - F.col("l_discount").cast("decimal(18,6)")
        )
    ).cast("decimal(30,8)")
    cost = (
        F.col("p_retailprice").cast("decimal(18,2)")
        * F.col("l_quantity").cast("decimal(18,2)")
    ).cast("decimal(30,8)")
    return (
        lineitem.join(
            F.broadcast(
                part.where(F.col("p_name").like("red%")).select(
                    "p_partkey", "p_retailprice"
                )
            ),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg(F.sum(rev - cost).cast("double").alias("sum_profit"))
    )


def q_tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (important stock identification) on the
    fixture schema (no partsupp — a part's "stock value" for
    NATION_3's suppliers is its shipped extended-price total from
    lineitem, in exact integer cents): parts whose value exceeds
    TWICE the average per-part value. The official query scales its
    fraction by 1/SF because a fixed share of the total empties as
    the part catalog grows; thresholding against the average
    (value·n_parts > 2·total) is the same idea made scale-free, and
    the compare stays division-free bigint-exact. The HAVING
    threshold's scalar subquery rides in as a broadcast 1-row
    aggregate. The big scan is pruned FIRST by the broadcast
    nation-filtered supplier dim, then collapses to the per-part
    grid — one shuffle."""
    lineitem = synthetic.load_table(spark, sf_dir, "lineitem")
    supplier = synthetic.load_table(spark, sf_dir, "supplier")
    nation = synthetic.load_table(spark, sf_dir, "nation")
    cents = (F.col("l_extendedprice").cast("decimal(18,2)") * 100).cast(
        "bigint"
    )
    n3_supp = supplier.join(
        F.broadcast(nation.where(F.col("n_name") == "NATION_3")),
        F.col("s_nationkey") == F.col("n_nationkey"),
    ).select("s_suppkey")
    val = (
        lineitem.join(
            F.broadcast(n3_supp), F.col("l_suppkey") == F.col("s_suppkey")
        )
        .groupBy("l_partkey")
        .agg(F.sum(cents).alias("value_cents"))
    )
    tot = val.agg(
        F.sum("value_cents").alias("_t"),
        F.count(F.lit(1)).alias("_np"),
    )
    return (
        val.crossJoin(F.broadcast(tot))
        .where(F.col("value_cents") * F.col("_np") > 2 * F.col("_t"))
        .select(
            F.col("l_partkey").cast("bigint").alias("p_partkey"),
            F.col("value_cents").cast("bigint").alias("value_cents"),
        )
    )


def q_tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (shipping-mode priority split) on the fixture
    schema (no l_shipmode/l_receiptdate — the class is l_linestatus
    and "late" means shipped > 90 days after the order date): for
    lines shipped in 1996, per linestatus, how many came from
    high-priority (URGENT/HIGH) vs lower-priority orders.
    Conditional bigint counts in one map-side-combinable aggregate;
    the ship-date band pushes to the lineitem scan."""
    lineitem = synthetic.load_table(spark, sf_dir, "lineitem")
    orders = synthetic.load_table(spark, sf_dir, "orders")
    lo = F.lit("1996-01-01").cast("timestamp_ntz")
    hi = F.lit("1997-01-01").cast("timestamp_ntz")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        lineitem.where((F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .where(
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
        )
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0))
            .cast("bigint")
            .alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1))
            .cast("bigint")
            .alias("low_line_count"),
        )
    )


def q_tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (parts/supplier relationship) on the fixture
    schema (no partsupp — the pair relation is the DISTINCT
    (partkey, suppkey) grid observed in lineitem; the "customer
    complaints" exclusion stands in as negative-balance suppliers):
    distinct supplier count per (brand, type, size) over 8 sizes,
    excluding Brand#5 and PROMO parts. The NOT IN subquery is a
    LEFT ANTI against the broadcast bad-supplier dim — the pair grid
    never widens; the grid itself is bounded (dedup BEFORE any join,
    so the big scan collapses immediately)."""
    lineitem = synthetic.load_table(spark, sf_dir, "lineitem")
    part = synthetic.load_table(spark, sf_dir, "part")
    supplier = synthetic.load_table(spark, sf_dir, "supplier")
    pairs = lineitem.select("l_partkey", "l_suppkey").distinct()
    bad = supplier.where(F.col("s_acctbal") < 0).select("s_suppkey")
    keep_part = part.where(
        (F.col("p_brand") != "Brand#5")
        & (F.col("p_type") != "PROMO")
        & (F.col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45))
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    return (
        pairs.join(
            F.broadcast(bad),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .join(F.broadcast(keep_part), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("p_brand", "p_type", F.col("p_size").cast("int").alias("p_size"))
        .agg(
            F.countDistinct("l_suppkey").cast("bigint").alias("supplier_cnt")
        )
    )


def q_tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (potential part promotion) on the fixture
    schema (no ps_availqty — "excess" means a (part, supplier) pair
    shipped MORE THAN HALF its lifetime quantity of a ``red ...``
    part during 1996): suppliers holding at least one such
    concentration. The nested aggregate runs on the bounded pair
    grid (part-filtered FIRST via the broadcast red-part dim), the
    half compare is division-free integer centiqty (q96*2 > qtot),
    and the supplier decoration is a LEFT SEMI — each supplier
    appears once regardless of how many parts qualify."""
    lineitem = synthetic.load_table(spark, sf_dir, "lineitem")
    part = synthetic.load_table(spark, sf_dir, "part")
    supplier = synthetic.load_table(spark, sf_dir, "supplier")
    qty_c = (F.col("l_quantity").cast("decimal(18,2)") * 100).cast("bigint")
    in96 = (
        F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz")
    ) & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
    per = (
        lineitem.join(
            F.broadcast(
                part.where(F.col("p_name").like("red%")).select("p_partkey")
            ),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(
            F.sum(F.when(in96, qty_c).otherwise(F.lit(0).cast("bigint")))
            .alias("q96"),
            F.sum(qty_c).alias("qtot"),
        )
    )
    excess = per.where(F.col("q96") * 2 > F.col("qtot")).select("l_suppkey")
    return (
        supplier.join(
            excess, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi"
        )
        .select(
            F.col("s_suppkey").cast("bigint").alias("s_suppkey"),
            "s_name",
            F.col("s_acctbal").cast("double").alias("s_acctbal"),
        )
    )


def q_tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (suppliers who kept orders waiting) on the
    fixture schema ("late" means shipped > 60 days after the order
    date, per the Q4 adaptation): for finished ('F') orders with
    lines from MORE THAN ONE supplier where EXACTLY ONE supplier was
    late, charge the wait to that supplier and count. The official
    EXISTS / NOT EXISTS pair collapses into one per-order aggregate
    (distinct suppliers, distinct LATE suppliers, and — since there
    is exactly one — MAX of the late keys IS the culprit), so the
    fact table shuffles once on orderkey and never self-joins.
    Supplier names decorate via broadcast; top 100 with
    deterministic (count desc, name) order."""
    lineitem = synthetic.load_table(spark, sf_dir, "lineitem")
    orders = synthetic.load_table(spark, sf_dir, "orders")
    supplier = synthetic.load_table(spark, sf_dir, "supplier")
    late = (
        F.col("l_shipdate")
        > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    )
    per_order = (
        lineitem.join(
            orders.where(F.col("o_orderstatus") == "F"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .groupBy("l_orderkey")
        .agg(
            F.countDistinct("l_suppkey").alias("_n_supp"),
            F.countDistinct(F.when(late, F.col("l_suppkey"))).alias("_n_late"),
            F.max(F.when(late, F.col("l_suppkey"))).alias("_late_supp"),
        )
        .where((F.col("_n_supp") > 1) & (F.col("_n_late") == 1))
    )
    return (
        per_order.groupBy("_late_supp")
        .agg(F.count(F.lit(1)).cast("bigint").alias("numwait"))
        .join(
            F.broadcast(supplier), F.col("s_suppkey") == F.col("_late_supp")
        )
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(100)
        .select("s_name", "numwait")
    )


def q_forecast_mase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive MASE floor over daily order revenue
    (operators/analytics.py seasonal_naive_mase): |v_t - v_{t-7}|
    vs |v_t - v_{t-1}| over CALENDAR lags, integer error sums, one
    double division of two exact integer products."""
    from amazon_personalize_connectors_spark.operators.analytics import (
        seasonal_naive_mase,
    )

    orders = synthetic.load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.col("o_orderdate").cast("date").alias("day")
    ).agg(
        F.sum(
            (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("bigint")
        ).alias("cents")
    )
    return seasonal_naive_mase(daily, "day", "cents", season_days=7)


def q_retractable_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retraction-aware rollup maintenance (operators/cdc.py
    retractable_rollup_merge): rolling the one-year order-window
    rollup forward by signed per-key deltas (updates contribute
    new-old, deletes retract, empty groups drop out) must equal a
    full recompute over the new window — the oracle IS that
    recompute. All-bigint cents arithmetic so retraction is
    lossless."""
    from amazon_personalize_connectors_spark.operators.cdc import (
        retractable_rollup_merge,
    )

    def facts(lo, hi):
        orders = synthetic.load_table(spark, sf_dir, "orders")
        return orders.where(
            (F.col("o_orderdate") >= F.lit(lo).cast("timestamp_ntz"))
            & (F.col("o_orderdate") < F.lit(hi).cast("timestamp_ntz"))
        ).select(
            "o_orderkey",
            F.pmod(F.col("o_custkey"), F.lit(100)).cast("bigint").alias("grp"),
            (F.col("o_totalprice").cast("decimal(18,2)") * 100)
            .cast("bigint")
            .alias("cents"),
        )

    old = facts("1995-01-01", "1996-01-01")
    new = facts("1995-07-01", "1996-07-01")
    base = old.groupBy("grp").agg(
        F.sum("cents").alias("sum_cents"),
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
    )
    return retractable_rollup_merge(
        base, old, new, ["o_orderkey"], "grp", "cents",
        sum_name="sum_cents", count_name="n_rows",
    ).select(
        "grp",
        F.col("sum_cents").cast("bigint").alias("sum_cents"),
        "n_rows",
    )


def q_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity / l-diversity class report (operators/privacy.py):
    one row per quasi-identifier equivalence class over customer
    (nation, segment, $1000 balance band) with exact size, distinct
    sensitive-value count, and violation flags — ONE grouped
    aggregate over the export, classes not records downstream."""
    return _customer_privacy_classes(spark, sf_dir).select(
        "nation",
        "segment",
        "band",
        "class_size",
        "n_sensitive",
        "k_violation",
        "l_violation",
    )


def q_privacy_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row release gate (operators/privacy.py
    k_anonymity_summary): class/record totals, risky classes AND
    risky records (what actually leaks), effective k, low-diversity
    class count."""
    from amazon_personalize_connectors_spark.operators.privacy import (
        k_anonymity_summary,
    )

    return k_anonymity_summary(_customer_privacy_classes(spark, sf_dir))


def q_t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness audit (operators/privacy.py t_closeness_classes):
    per (segment, $2000 balance band) class, the exact-integer EMD
    between the class's nation distribution and the global one over
    the 25-nation ordered domain — the skewed-class leak that
    k-anonymity and l-diversity both miss. t_q is the exact integer
    quotient (EMD·1e9) div 1; the category grid is the nation
    dimension (bounded, guard-enforced) broadcast onto the class
    table, cumsums windowed per class."""
    from amazon_personalize_connectors_spark.operators.privacy import (
        numeric_band,
        t_closeness_classes,
    )

    cust = synthetic.load_table(spark, sf_dir, "customer").select(
        F.col("c_mktsegment").alias("segment"),
        numeric_band(
            (F.col("c_acctbal").cast("decimal(18,2)") * 100).cast("bigint"),
            200_000,
        ).alias("band"),
        F.col("c_nationkey").cast("bigint").alias("nation"),
    )
    return t_closeness_classes(
        cust, ["segment", "band"], "nation", t_threshold_q=375_000_000
    )


def q_stream_model_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming co-visitation model refresh, ORACLE-CHECKED end to
    end (streaming/model_refresh.py): interactions staged as four
    parquet files drain through foreachBatch ONE FILE PER
    MICRO-BATCH (maxFilesPerTrigger=1), each batch folding its
    increments into the versioned pairs+items store; serve_topk over
    the final store must equal a FULL recompute over all
    interactions — regardless of how the files split into batches.
    Same quarter-of-users subset as covisitation_incremental."""
    import tempfile

    from amazon_personalize_connectors_spark.streaming.model_refresh import (
        refresh_from_stream,
        serve_topk,
    )

    orders = synthetic.load_table(spark, sf_dir, "orders")
    lineitem = synthetic.load_table(spark, sf_dir, "lineitem")
    inter = (
        orders.where(F.col("o_custkey") % 4 == 0)
        .join(lineitem, orders.o_orderkey == lineitem.l_orderkey)
        .select(
            F.col("o_custkey").cast("long").alias("u"),
            F.col("l_partkey").cast("long").alias("i"),
        )
    )
    landing = tempfile.mkdtemp(prefix="apc-model-landing-")
    store = tempfile.mkdtemp(prefix="apc-model-store-")
    ckpt = tempfile.mkdtemp(prefix="apc-model-ckpt-")
    inter.repartition(4).write.mode("append").parquet(landing)
    stream = (
        spark.readStream.schema("u long, i long")
        .option("maxFilesPerTrigger", 1)
        .parquet(landing)
    )
    refresh_from_stream(stream, store, ckpt)
    return serve_topk(spark, store, k=5, min_common=2).select(
        "item", "rec_item", "n_common", F.col("rank").cast("int").alias("rank")
    )


def q_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median/MAD robust outlier screen (operators/features.py
    robust_outlier_stats) over integer cents per return flag — the
    robust sibling of the mean/std price_outliers band. Discrete
    (rank-based) medians keep every statistic integer-exact."""
    from amazon_personalize_connectors_spark.operators.features import (
        robust_outlier_stats,
    )

    li = synthetic.load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        (F.col("l_extendedprice").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("cents"),
    )
    return robust_outlier_stats(li, ["l_returnflag"], "cents", k=3)


def q_rec_auc_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact ROC-AUC per user segment (operators/evaluation.py:roc_auc)
    grading event value as a purchase predictor: Mann–Whitney rank-sum
    with tie correction on the integer-cents score grid — bigint until
    the single final division, so the statistic is engine- and
    partition-layout-independent (the user_profile_vectors lesson)."""
    from amazon_personalize_connectors_spark.operators.evaluation import (
        roc_auc,
    )

    ev = synthetic.load_events(spark, sf_dir).where(F.col("value").isNotNull())
    scored = ev.select(
        (F.col("user_id") % 4).cast("bigint").alias("segment"),
        (F.col("value").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("score"),
        (F.col("event_type") == "purchase").cast("int").alias("label"),
    )
    return roc_auc(scored, ["segment"], "score", "label")


def q_score_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calibration + cumulative-gains table over fixed-width 500-cent
    score bins (operators/evaluation.py:score_bin_report): per-bin
    conversion rate plus top-down positive capture — every fraction one
    bigint/bigint division, bins by integer DIV (no single-task
    ntile)."""
    from amazon_personalize_connectors_spark.operators.evaluation import (
        score_bin_report,
    )

    ev = synthetic.load_events(spark, sf_dir).where(F.col("value").isNotNull())
    scored = ev.select(
        (F.col("value").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("score"),
        (F.col("event_type") == "purchase").cast("int").alias("label"),
    )
    return score_bin_report(scored, "score", "label", bin_width=500)


def q_wilson_ctr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sigma Wilson click-through bounds per hour of day
    (operators/evaluation.py:wilson_bounds): clicks / (views+clicks)
    with the interval a dashboard should trust instead of the raw
    rate. The bound is a fixed tree of correctly-rounded IEEE ops
    (+,-,*,/,sqrt; z²=4 exactly) on exact counts — the oracle spells
    the identical tree, so the doubles match bit-for-bit."""
    from amazon_personalize_connectors_spark.operators.evaluation import (
        wilson_bounds,
    )

    ev = synthetic.load_events(spark, sf_dir).where(
        F.col("event_type").isin("view", "click")
    )
    rows = ev.select(
        F.hour("ts").cast("bigint").alias("hour"),
        (F.col("event_type") == "click").cast("int").alias("label"),
    )
    return wilson_bounds(rows, ["hour"], "label")

__all__ = [
    "q_tpch_q18",
    "q_tpch_q4",
    "q_tpch_q6",
    "q_tpch_q14",
    "q_tpch_q17",
    "q_last_touch_attribution",
    "q_audience_overlap",
    "q_revenue_anomalies",
    "q_rec_ndcg",
    "_customer_privacy_classes",
    "q_embedding_drift",
    "q_stream_ks_drift",
    "q_survival_repurchase",
    "q_rec_diversity_ils",
    "q_tpch_q1",
    "q_tpch_q19",
    "q_scd2_pit_revenue",
    "q_source_quality",
    "q_grouping_sets_revenue",
    "q_except_all_returns",
    "q_unpivot_metrics",
    "q_tpch_q13",
    "q_tpch_q15",
    "q_tpch_q22",
    "q_tpch_q7",
    "q_tpch_q8",
    "q_tpch_q2",
    "q_tpch_q9",
    "q_tpch_q11",
    "q_tpch_q12",
    "q_tpch_q16",
    "q_tpch_q20",
    "q_tpch_q21",
    "q_forecast_mase",
    "q_retractable_rollup",
    "q_k_anonymity",
    "q_privacy_gate",
    "q_t_closeness",
    "q_stream_model_refresh",
    "q_mad_outliers",
    "q_rec_auc_segments",
    "q_score_calibration",
    "q_wilson_ctr",
]
