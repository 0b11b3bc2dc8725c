"""A2 replacement — pipeline metrics without extra jobs.

The reference fires eight eager ``count()`` actions per run
(related_items_etl.py:108,112,117-118,156,187,260,267), each
re-triggering lineage. ``observe`` attaches named aggregates to the
frame itself: metrics are computed *during* the one real action (the
sink write) and read back afterwards — zero additional passes, exact
at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def observe_counts(
    df: DataFrame, name: str = "apc_metrics", **named_conditions: F.Column
) -> tuple[DataFrame, Observation]:
    """Attach row-count metrics to ``df``.

    ``named_conditions`` maps metric name → boolean Column counted when
    true; a total row count rides along as ``n_rows``. Read
    ``observation.get`` AFTER an action has run the frame::

        df, obs = observe_counts(split.ok, n_empty=F.size("recs") == 0)
        df.write.json(path)          # the one real action
        obs.get["n_rows"], obs.get["n_empty"]
    """
    observation = Observation(name)
    aggs = [F.count(F.lit(1)).alias("n_rows")] + [
        F.count_if(cond).alias(metric) for metric, cond in named_conditions.items()
    ]
    return df.observe(observation, *aggs), observation
