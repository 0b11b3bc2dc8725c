"""Bucketed-table co-located joins: the write-once-shuffle-never
strategy for repeated big joins (sources/bucketing.py)."""

import pytest
from pyspark.sql import functions as F

from amazon_personalize_connectors_spark.sources.bucketing import (
    assert_no_shuffle_join,
    bucketed_join,
    write_bucketed,
)


@pytest.fixture()
def bucketed_pair(spark):
    facts = spark.range(0, 10_000).select(
        (F.col("id") % 500).alias("item_id"), F.col("id").alias("fact_id")
    )
    dims = spark.range(0, 500).select(
        F.col("id").alias("item_id"), F.concat(F.lit("n"), F.col("id")).alias("name")
    )
    write_bucketed(facts, "t_facts_b", ["item_id"], 8)
    write_bucketed(dims, "t_dims_b", ["item_id"], 8)
    yield "t_facts_b", "t_dims_b"
    spark.sql("DROP TABLE IF EXISTS t_facts_b")
    spark.sql("DROP TABLE IF EXISTS t_dims_b")


def test_bucketed_join_no_shuffle_and_correct(spark, bucketed_pair):
    left, right = bucketed_pair
    # disable auto-broadcast so the test proves bucketing (not AQE
    # broadcast) removed the exchanges
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, left, right, ["item_id"])
        assert_no_shuffle_join(joined)
        assert joined.count() == 10_000
        one = joined.where(F.col("fact_id") == 501).collect()[0]
        assert one.item_id == 1 and one.name == "n1"
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_attribution_join_no_shuffle(spark, tmp_path):
    """The flagship J1 shape over pre-bucketed tables: per-item recs
    joined to the user-item mapping with ZERO exchange — the
    write-once-shuffle-never strategy for the join that otherwise
    re-shuffles the fact side every run."""
    recs = spark.range(0, 2000).select(
        F.col("id").alias("item_id"),
        F.array(F.concat(F.lit("r"), F.col("id"))).alias("recommendations"),
    )
    mapping = spark.range(0, 60_000).select(
        (F.col("id") % 2000).alias("item_id"),
        F.concat(F.lit("u"), (F.col("id") % 7000)).alias("user_id"),
    )
    write_bucketed(recs, "t_recs_attr", ["item_id"], 8)
    write_bucketed(mapping, "t_map_attr", ["item_id"], 8)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, "t_recs_attr", "t_map_attr", ["item_id"])
        assert_no_shuffle_join(joined)
        assert joined.count() == 60_000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS t_recs_attr")
        spark.sql("DROP TABLE IF EXISTS t_map_attr")


def test_assert_no_shuffle_join_detects_shuffle(spark):
    a = spark.range(100).select((F.col("id") % 7).alias("k"))
    b = spark.range(100).select((F.col("id") % 7).alias("k"))
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        with pytest.raises(AssertionError):
            assert_no_shuffle_join(a.join(b, "k"))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
