"""Skew-aware join strategies for the 100 TB path.

The attribution join (J1) keys on item id; real catalogs have hot
items (one item mapped to millions of users). AQE's skew-join split
(`spark.sql.adaptive.skewJoin`, on by default in this engine's
sessions) handles moderate skew at shuffle time; ``salted_join`` below
is the explicit form for extreme skew or for engines/stages where AQE
can't re-plan (e.g. inside a streaming foreachBatch).

Mechanics: replicate the small/dimension side ``salt_factor`` times
(one copy per salt value), scatter the skewed fact side uniformly
across salts, join on (key, salt). Hot keys spread over
``salt_factor`` reducers instead of one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: str,
    salt_factor: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Join ``skewed`` to ``other`` on column ``on`` with salting.

    ``other`` is replicated ``salt_factor``x — keep it the smaller
    side. The salt is derived from a uniform hash of the full skewed
    row (monotonically_increasing_id-free: deterministic under
    retries).

    Only fact-preserving join types are allowed: with a replicated
    dimension side, right/full outer joins would emit every unmatched
    dim row ``salt_factor`` times."""
    if salt_factor < 1:
        raise ValueError("salt_factor must be >= 1")
    allowed = {
        "inner", "left", "left_outer", "leftouter",
        "left_semi", "leftsemi", "left_anti", "leftanti", "semi", "anti",
    }
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join supports only fact-preserving join types {sorted(allowed)}; "
            f"got {how!r} (a replicated dim side duplicates unmatched rows "
            f"under right/full outer joins)"
        )
    salt = (
        F.pmod(F.xxhash64(*[F.col(c) for c in skewed.columns]), F.lit(salt_factor))
    ).cast("int")
    salted_fact = skewed.withColumn("__salt", salt)
    exploded_dim = other.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt_factor - 1)))
    )
    return salted_fact.join(exploded_dim, [on, "__salt"], how).drop("__salt")
