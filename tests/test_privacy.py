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


def test_t_closeness_hand_example(spark):
    from amazon_personalize_connectors_spark.operators.privacy import (
        t_closeness_classes,
    )

    # global g=(2,2,2), N=6; class a c=(2,1,0): terms 6,6,0 ->
    # t = 12/((3-1)*3*6) = 1/3 exactly
    rows = [("a", 1), ("a", 1), ("a", 2), ("b", 2), ("b", 3), ("b", 3)]
    df = spark.createDataFrame(rows, "q string, s int")
    got = {r["q"]: (r["class_size"], r["t_q"], r["t_violation"])
           for r in t_closeness_classes(df, ["q"], "s").collect()}
    assert got == {"a": (3, 333_333_333, 0), "b": (3, 333_333_333, 0)}


def test_t_closeness_identical_distribution_is_zero(spark):
    from amazon_personalize_connectors_spark.operators.privacy import (
        t_closeness_classes,
    )

    rows = [(q, s) for q in ("a", "b") for s in (1, 2, 3)]
    df = spark.createDataFrame(rows, "q string, s int")
    out = t_closeness_classes(df, ["q"], "s").collect()
    assert all(r["t_q"] == 0 and r["t_violation"] == 0 for r in out)


def test_t_closeness_degenerate_class_hits_max(spark):
    from amazon_personalize_connectors_spark.operators.privacy import (
        t_closeness_classes,
    )

    # class 'z' holds only the extreme category: EMD = (m-1)/(m-1)
    # ... not 1.0 in general, but with all mass at the far end of a
    # 2-category domain t = |N*cumc - n*cumg|/( (2-1)*n*N ) at i=1:
    # class z: c=(0,2) n=2, global g=(2,2) N=4 -> |4*0-2*2| = 4 ->
    # t = 4/(1*2*4) = 1/2
    rows = [("y", 1), ("y", 1), ("z", 2), ("z", 2)]
    df = spark.createDataFrame(rows, "q string, s int")
    got = {r["q"]: r["t_q"] for r in
           t_closeness_classes(df, ["q"], "s").collect()}
    assert got == {"y": 500_000_000, "z": 500_000_000}


def test_t_closeness_single_category_is_zero(spark):
    from amazon_personalize_connectors_spark.operators.privacy import (
        t_closeness_classes,
    )

    df = spark.createDataFrame([("a", 7), ("b", 7)], "q string, s int")
    out = t_closeness_classes(df, ["q"], "s").collect()
    assert all(r["t_q"] == 0 for r in out)
