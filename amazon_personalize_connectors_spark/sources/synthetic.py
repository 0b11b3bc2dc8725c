"""Deterministic synthetic fixtures derived from the shared TPC-H-ish
testdata (TESTDATA.md), shaped like the reference's five input datasets
(FIXTURES.md). Part keys are 0-based contiguous (0..max).

Each builder has a matching DuckDB CTE string (the ``*_SQL`` constants)
used by ``__spark_entry__.oracle_sql`` — both derive from the same
parquet tables, so the correctness gate checks the *operators*, not the
fixture generator.

Derivations (FIXTURES.md §1-4, adapted to the actual part schema):

* related-items batch inference (README.md:169-173): one row per part;
  ``input.itemId = p_partkey``; ``output.recommendedItems`` = the next 5
  part keys cyclically; every 10th key is an error row (null output);
  every 13th (non-error) key has an empty rec list — exercises
  posexplode_outer + null-guard (ri:205-211).
* user-personalization batch inference (up:167): one row per customer;
  5 recs seeded from ``c_custkey``; every 11th key is an error row.
* user-item mapping (README.md:181-187): DISTINCT (o_custkey, l_partkey)
  over orders ⋈ lineitem — naturally many-to-many.
* item metadata (README.md:192-194): from part, dropping every 7th key
  to create metadata misses (left-join J2 keeps them).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

N_RECS = 5

# ---------------------------------------------------------------------------
# DuckDB CTE fragments (ANSI-ish SQL) — single source of truth for oracles.
# Tables region/nation/customer/.../embeddings are pre-registered views.
# ---------------------------------------------------------------------------

RECS_CTE = f"""
npart AS (SELECT MAX(p_partkey) + 1 AS n FROM part),
recs AS (
  SELECT
    CAST(p_partkey AS VARCHAR) AS query_item_id,
    CASE
      WHEN p_partkey % 10 = 0 THEN NULL
      WHEN p_partkey % 13 = 0 THEN CAST([] AS VARCHAR[])
      ELSE list_transform(range(1, {N_RECS} + 1),
                          i -> CAST((p_partkey + i) % n AS VARCHAR))
    END AS rec_items,
    CASE WHEN p_partkey % 10 = 0 THEN 'ITEM_NOT_IN_DATASET' END AS error
  FROM part, npart
)"""

USER_RECS_CTE = f"""
npart AS (SELECT MAX(p_partkey) + 1 AS n FROM part),
user_recs AS (
  SELECT
    CAST(c_custkey AS VARCHAR) AS query_user_id,
    CASE
      WHEN c_custkey % 11 = 0 THEN NULL
      ELSE list_transform(range(1, {N_RECS} + 1),
                          i -> CAST((c_custkey * 7 + i * 3) % n AS VARCHAR))
    END AS rec_items,
    CASE WHEN c_custkey % 11 = 0 THEN 'USER_NOT_IN_DATASET' END AS error
  FROM customer, npart
)"""

MAPPING_CTE = """
mapping AS (
  SELECT DISTINCT
    CAST(o_custkey AS VARCHAR) AS user_id,
    CAST(l_partkey AS VARCHAR) AS item_id
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
)"""

META_CTE = """
meta AS (
  SELECT
    CAST(p_partkey AS VARCHAR) AS id,
    p_name AS name,
    p_type AS category,
    p_brand AS brand,
    CAST(p_retailprice AS DOUBLE) AS price,
    CAST(p_size AS BIGINT) AS current_stock
  FROM part WHERE p_partkey % 7 <> 0
)"""

META_FIELDS = ("name", "category", "brand", "price", "current_stock")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def clustered_embeddings(
    emb: DataFrame,
    group_div: int = 32,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANISOTROPIC (clustered) embedding fixture, derived
    deterministically from the driver's isotropic embeddings table
    (VERDICT r8 item 2): the isotropic fixture is the WORST case for
    LSH blocking — structureless data gives buckets nothing to
    separate — so near-dup pruning claims need a separable fixture
    where vectors form tight families.

    Family ``vec_id DIV group_div`` (with the maxsim family's 8-token
    docs, group_div=32 makes families of 4 documents — small TRUE
    near-dup groups whose COUNT grows with the corpus, the realistic
    dedup shape); each output vector is pulled 3/4 toward its
    family centroid:

        cent(fam, d) = (((fam+1)·(d+7)·1103515245) mod 2001 - 1000)/1000
        v' = cent·0.75 + v·0.25

    Engine-portable: the centroid is exact int64 arithmetic and the
    mix is two IEEE double mul-adds on values both engines hold
    bit-identically, so ``floor(v'·10⁶)`` replays in SQL (same
    discipline as the rp_lsh weight formula). Schema is unchanged:
    (id_col, vec_col as array<double>)."""
    fam = F.expr(f"CAST({id_col} DIV {group_div} AS BIGINT)")
    return emb.select(
        F.col(id_col),
        F.transform(
            F.col(vec_col).cast("array<double>"),
            lambda v, d: (
                (
                    ((fam + 1) * (d.cast("bigint") + 7) * 1103515245)
                    % 2001
                    - 1000
                ).cast("double")
                / F.lit(1000.0)
            )
            * F.lit(0.75)
            + v * F.lit(0.25),
        ).alias(vec_col),
    )


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events table loader, robust to driver-data timestamp drift.

    Output contract (stable across testdata generations):
      * ``ts_us``  bigint — exact epoch microseconds as stored,
      * ``ts``     timestamp — microsecond timestamp for date functions.

    The driver's events.parquet has shipped two physical encodings:
    TIMESTAMP(NANOS) (round 1 — Spark 4 only reads it as raw longs via
    the nanosAsLong legacy conf) and plain ``timestamp[us]`` (round 2+
    — arrives as TIMESTAMP_NTZ). Branch on the decoded dtype rather
    than assuming either; ``unix_micros`` requires TIMESTAMP, so the
    NTZ column is cast first — the session tz is UTC in this
    environment, so the wall time round-trips exactly and matches
    DuckDB's naive ``epoch_us(ts)``. The legacy conf is only touched
    when actually needed, and restored afterwards."""
    try:
        df = spark.read.parquet(f"{sf_dir}/events.parquet")
        ts_type = dict(df.dtypes)["ts"]
    except Exception:
        ts_type = None  # unreadable without the legacy nanos conf
    if ts_type == "bigint" or ts_type is None:
        # Only mutate the session conf when the data actually demands it
        # (it cannot be restored before execution: the lazy parquet scan
        # re-reads the conf when the job runs).
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/events.parquet")
        # integer DIV, no double round-trip: ns epochs exceed 2^53.
        return df.withColumn("ts_us", F.expr("ts DIV 1000")).withColumn(
            "ts", F.timestamp_micros(F.col("ts_us"))
        )
    if ts_type.startswith("timestamp"):
        ts = F.col("ts")
        if ts_type == "timestamp_ntz":
            ts = ts.cast("timestamp")
        return df.withColumn("ts", ts).withColumn("ts_us", F.unix_micros(F.col("ts")))
    raise TypeError(f"events.ts: unsupported dtype {ts_type!r}")


def _spread(df: DataFrame) -> DataFrame:
    """Repartition a fixture fact to default parallelism. The synthetic
    sources are single small parquet files (1-2 scan partitions), while
    the pipelines fan rows out ~100x downstream of the scan — without
    this, the whole fan-out runs in one task. A real batch-inference
    prefix is many part files, which gets this spread for free."""
    return df.repartition(df.sparkSession.sparkContext.defaultParallelism)


def _npart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-row frame with the cyclic modulus; broadcast into derivations."""
    part = load_table(spark, sf_dir, "part")
    return part.agg((F.max("p_partkey") + F.lit(1)).alias("n"))


def _cyclic_recs(key: Column, n: Column) -> Column:
    """array<string> of N_RECS keys cyclically following ``key``."""
    return F.transform(
        F.sequence(F.lit(1), F.lit(N_RECS)),
        lambda i: ((key + i) % n).cast("string"),
    )


def _seeded_recs(key: Column, n: Column) -> Column:
    """array<string> of N_RECS keys seeded from a user key (mirrors
    USER_RECS_CTE: (key*7 + i*3) % n)."""
    return F.transform(
        F.sequence(F.lit(1), F.lit(N_RECS)),
        lambda i: ((key * 7 + i * 3) % n).cast("string"),
    )


def related_items_batch_inference(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch-inference fact in the reference's nested shape
    (input.itemId / output.recommendedItems / error)."""
    part = load_table(spark, sf_dir, "part")
    df = part.crossJoin(F.broadcast(_npart(spark, sf_dir)))
    key = F.col("p_partkey")
    rec_items = (
        F.when(key % 10 == 0, F.lit(None).cast("array<string>"))
        .when(key % 13 == 0, F.array().cast("array<string>"))
        .otherwise(_cyclic_recs(key, F.col("n")))
    )
    error = F.when(key % 10 == 0, F.lit("ITEM_NOT_IN_DATASET"))
    return _spread(df).select(
        F.struct(key.cast("string").alias("itemId")).alias("input"),
        F.when(
            error.isNull(), F.struct(rec_items.alias("recommendedItems"))
        ).alias("output"),
        error.alias("error"),
    )


def user_personalization_batch_inference(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User-personalization fact keyed on input.userId (up:167)."""
    customer = load_table(spark, sf_dir, "customer")
    df = customer.crossJoin(F.broadcast(_npart(spark, sf_dir)))
    key = F.col("c_custkey")
    rec_items = F.when(~(key % 11 == 0), _seeded_recs(key, F.col("n")))
    error = F.when(key % 11 == 0, F.lit("USER_NOT_IN_DATASET"))
    return _spread(df).select(
        F.struct(key.cast("string").alias("userId")).alias("input"),
        F.when(
            error.isNull(), F.struct(rec_items.alias("recommendedItems"))
        ).alias("output"),
        error.alias("error"),
    )


def user_item_mapping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """USER_ID/ITEM_ID bridge (CSV-shaped: all strings, header casing)."""
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    return (
        orders.join(lineitem, orders.o_orderkey == lineitem.l_orderkey)
        .select(
            F.col("o_custkey").cast("string").alias("USER_ID"),
            F.col("l_partkey").cast("string").alias("ITEM_ID"),
        )
        .distinct()
    )


def item_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Open-schema item-metadata dimension; every 7th key missing."""
    part = load_table(spark, sf_dir, "part")
    return part.where(F.col("p_partkey") % 7 != 0).select(
        F.col("p_partkey").cast("string").alias("id"),
        F.col("p_name").alias("name"),
        F.col("p_type").alias("category"),
        F.col("p_brand").alias("brand"),
        F.col("p_retailprice").cast("double").alias("price"),
        F.col("p_size").cast("bigint").alias("current_stock"),
    )
