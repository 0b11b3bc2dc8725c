"""Privacy-risk audits (operators/privacy.py): k-anonymity /
l-diversity class reports and the one-row release gate."""

from pyspark.sql import functions as F

from amazon_personalize_connectors_spark.operators.privacy import (
    k_anonymity_classes,
    k_anonymity_summary,
    numeric_band,
)


def test_numeric_band_floors_negatives(spark):
    df = spark.createDataFrame([(-150,), (-100,), (-1,), (0,), (99,), (100,)], "v long")
    got = [r["b"] for r in df.select(numeric_band(F.col("v"), 100).alias("b")).orderBy("v").collect()]
    assert got == [-200, -100, -100, 0, 0, 100]


def test_k_anonymity_classes_and_summary(spark):
    rows = [
        # class (1, 'A'): 3 rows, 1 distinct sensitive -> l-violation
        (1, "A", 10), (1, "A", 10), (1, "A", 10),
        # class (1, 'B'): 5 rows, 3 distinct -> clean at k=5
        (1, "B", 1), (1, "B", 2), (1, "B", 3), (1, "B", 1), (1, "B", 2),
        # class (2, 'A'): singleton -> k-violation AND l-violation
        (2, "A", 7),
    ]
    df = spark.createDataFrame(rows, "g long, seg string, s long")
    cls = k_anonymity_classes(df, ["g", "seg"], "s", k=5, l_threshold=2)
    got = {(r["g"], r["seg"]): (r["class_size"], r["n_sensitive"],
                                 r["k_violation"], r["l_violation"])
           for r in cls.collect()}
    assert got == {
        (1, "A"): (3, 1, 1, 1),
        (1, "B"): (5, 3, 0, 0),
        (2, "A"): (1, 1, 1, 1),
    }
    s = k_anonymity_summary(cls).collect()[0]
    assert (s["n_classes"], s["n_records"]) == (3, 9)
    assert (s["n_risky_classes"], s["n_risky_records"]) == (2, 4)
    assert s["min_class_size"] == 1 and s["n_low_diversity_classes"] == 2


def test_k_anonymity_without_sensitive_col(spark):
    df = spark.createDataFrame([(1,), (1,), (2,)], "g long")
    cls = k_anonymity_classes(df, ["g"], None, k=2)
    got = {r["g"]: (r["class_size"], r["n_sensitive"], r["k_violation"], r["l_violation"])
           for r in cls.collect()}
    assert got == {1: (2, None, 0, None), 2: (1, None, 1, None)}
    s = k_anonymity_summary(cls).collect()[0]
    assert s["n_low_diversity_classes"] == 0
