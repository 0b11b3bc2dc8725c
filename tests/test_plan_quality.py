"""Plan-quality regression guards — the scale properties the engine
promises, asserted from physical plans so refactors can't silently
regress them (README "Design decisions that matter at 100 TB")."""

import __spark_entry__ as entry


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_flagship_has_no_python_udf(spark, sf_dir):
    plan = _plan(entry.q_flagship_related_flat(spark, sf_dir))
    # zero Python in the relational core: no row-at-a-time Python eval,
    # no Arrow eval either (multimodal is the only sanctioned user)
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_flagship_runs_whole_stage_codegen(spark, sf_dir):
    df = entry.q_flagship_related_flat(spark, sf_dir)
    df.count()  # AQE only materializes the final (codegen'd) plan on execution
    plan = _plan(df)
    assert "WholeStageCodegen" in plan or "*(" in plan


def test_core_queries_have_no_python_udf(spark, sf_dir):
    qs = entry.queries()
    for name in [
        "attribution_join",
        "decorate_flat",
        "renest_ordered",
        "delta_except",
        "payload_pivot",
        "window_analytics",
        "band_join_features",
        "asof_join",
        "tfidf_top_terms",
    ]:
        plan = _plan(qs[name](spark, sf_dir))
        assert "BatchEvalPython" not in plan, f"python UDF in {name}"


def test_scans_are_column_pruned(spark, sf_dir):
    # lineitem has 11 columns; the pricing query needs 5 — the scan
    # must not read the rest
    plan = _plan(entry.q_lineitem_pricing(spark, sf_dir))
    scan = next(l for l in plan.splitlines() if "FileScan" in l)
    read_cols = scan.split("FileScan parquet [", 1)[1].split("]", 1)[0]
    assert len(read_cols.split(",")) <= 5, read_cols


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    from pyspark.sql import functions as F

    from amazon_personalize_connectors_spark.sources import synthetic

    df = synthetic.load_table(spark, sf_dir, "orders").where(
        F.col("o_orderstatus") == "O"
    )
    plan = _plan(df)
    scan = next(l for l in plan.splitlines() if "FileScan" in l)
    assert "PushedFilters: [" in scan
    pushed = scan.split("PushedFilters:")[1]
    assert "o_orderstatus" in pushed[:200]
