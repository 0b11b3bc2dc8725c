"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k is the correctness baseline; blocked/IVF
variants are the scale path: restrict candidate generation with a
cheap partitioner (a label/cluster block or nearest-centroid
assignment) so the pairwise stage is an equi-join on the block key
instead of a cross join. At 100 TB the block key is what turns an
O(n^2) shuffle into a per-bucket local problem.

Dot products run as Catalyst higher-order folds over double arrays
(zip_with + aggregate — JVM codegen, no Python). Scores exposed for
cross-engine comparison are rounded to 6 decimals: floating-point sums
agree to ~1e-15 across engines when folded in index order, so the
rounded value is deterministic while raw last-bit noise is not.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product of two double arrays."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def _as_double(df: DataFrame, vec_col: str) -> DataFrame:
    return df.withColumn(vec_col, F.col(vec_col).cast("array<double>"))


def brute_force_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
) -> DataFrame:
    """Exact cosine top-k: broadcast the (small) query set against the
    full corpus, rank per query by (rounded score desc, id asc).

    The corpus side streams through one broadcast-hash join — no
    shuffle of the big side; the only shuffle is the per-query top-k
    window over k*|queries| candidate rows. For huge corpora swap the
    final window for a two-stage partial top-k aggregate.
    """
    emb = _as_double(embeddings, vec_col).select(
        F.col(id_col).alias("n_id"), F.col(vec_col).alias("n_vec")
    )
    qry = _as_double(queries, vec_col).select(
        F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec")
    )
    scored = (
        emb.join(F.broadcast(qry), F.col("n_id") != F.col("q_id"))
        .select(
            "q_id",
            "n_id",
            F.round(cosine(F.col("q_vec"), F.col("n_vec")), round_digits).alias(
                "score"
            ),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("score"), F.asc("n_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("q_id", "n_id", F.col("rank").cast("bigint").alias("rank"), "score")
    )


def blocked_near_duplicates(
    embeddings: DataFrame,
    block_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    min_cosine: float = 0.3,
    round_digits: int = 6,
) -> DataFrame:
    """Embedding near-dup pairs within blocks: equi-join on the block
    key (cluster/LSH bucket/label), then pairwise cosine inside each
    block only. The join is shuffle-partitioned by block — quadratic
    cost is bounded per block, never global."""
    emb = _as_double(embeddings, vec_col)
    a = emb.select(
        F.col(block_col).alias("block"),
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("vec_a"),
    )
    b = emb.select(
        F.col(block_col).alias("block"),
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("vec_b"),
    )
    pairs = a.join(b, "block").where(F.col("id_a") < F.col("id_b"))
    scored = pairs.select(
        "block",
        "id_a",
        "id_b",
        F.round(cosine(F.col("vec_a"), F.col("vec_b")), round_digits).alias("score"),
    )
    return scored.where(F.col("score") >= min_cosine)


def ivf_centroids(
    embeddings: DataFrame,
    block_col: str = "label",
    vec_col: str = "embedding",
    decimal_type: str = "decimal(27,12)",
) -> DataFrame:
    """Per-block centroid sums: explode to (block, dim, value), sum as
    fixed-point decimal (associative — deterministic under any
    parallel aggregation order, unlike double sums), one shuffle on
    (block, dim). Returns (block, dim, sum_val, sum_e6, n).

    ``sum_e6`` is a fully engine-portable integer variant
    (sum of floor(val * 1e6)): the double product is bit-identical
    everywhere and floor has no tie-breaking mode, unlike
    double→decimal casts which differ (HALF_UP vs HALF_EVEN) exactly
    at scale-boundary ties."""
    exploded = embeddings.select(
        F.col(block_col).alias("block"),
        F.posexplode(F.col(vec_col).cast("array<double>")).alias("dim", "val"),
    )
    return exploded.groupBy("block", "dim").agg(
        F.sum(F.col("val").cast(decimal_type)).cast("double").alias("sum_val"),
        F.sum(F.floor(F.col("val") * F.lit(1000000.0)).cast("bigint")).alias(
            "sum_e6"
        ),
        F.count(F.lit(1)).alias("n"),
    )


def ivf_assign(
    embeddings: DataFrame,
    block_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
) -> DataFrame:
    """IVF coarse quantizer: assign each vector to its nearest centroid
    by cosine (centroids derived per block, broadcast back). Returns
    (id, assigned_block, score). At scale the centroid table is tiny
    (nlist rows) — the assignment is a broadcast nested-loop over
    nlist candidates per vector, then a max-by; queries then probe
    only their assigned list."""
    sums = ivf_centroids(embeddings, block_col, vec_col)
    centroids = (
        sums.withColumn("mean", F.col("sum_val") / F.col("n"))
        .groupBy("block")
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("dim"), F.col("mean")))
                ),
                lambda s: s["mean"],
            ).alias("centroid")
        )
    )
    emb = _as_double(embeddings, vec_col).select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("vec")
    )
    scored = emb.join(F.broadcast(centroids)).select(
        "id",
        F.col("block"),
        F.round(cosine(F.col("vec"), F.col("centroid")), round_digits).alias("score"),
    )
    w = Window.partitionBy("id").orderBy(F.desc("score"), F.asc("block"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("id", F.col("block").alias("assigned_block"), "score")
    )
