"""Salting operators: result-equivalence to naive plans + actual spread."""

from __future__ import annotations

from pyspark.sql import functions as F

from ethical_data_ingestion_spark.operators import skew as K


def test_salted_join_equals_plain_join(spark):
    big = spark.createDataFrame(
        [(k, i, float(i)) for i in range(200) for k in ("hot", f"k{i % 5}")],
        "key string, rid int, v double",
    )
    small = spark.createDataFrame(
        [("hot", 1), ("k0", 2), ("k3", 3)], "key string, dim int"
    )
    plain = big.join(small, "key").select("key", "rid", "v", "dim")
    salted = K.salted_join(big, small, ["key"], "rid", n_salts=8).select(
        "key", "rid", "v", "dim"
    )
    assert salted.exceptAll(plain).count() == 0
    assert plain.exceptAll(salted).count() == 0


def test_hot_key_spreads_across_salts(spark):
    df = spark.createDataFrame(
        [("hot", i) for i in range(500)], "key string, rid int"
    )
    n = (
        K.with_salt(df, "rid", 16)
        .select("_salt")
        .distinct()
        .count()
    )
    assert n == 16  # one hot key fans out over every salt partition


def test_salted_agg_equals_plain_agg(spark):
    df = spark.createDataFrame(
        [("a", i, float(i % 7)) for i in range(300)]
        + [("b", 1000 + i, 1.5) for i in range(30)],
        "key string, rid int, v double",
    )
    plain = (
        df.groupBy("key")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("v").cast("decimal(18,2)")).cast("double").alias("s"),
        )
        .orderBy("key")
        .collect()
    )
    salted = (
        K.salted_two_phase_agg(
            df,
            keys=["key"],
            unique_col="rid",
            partials={"n_p": F.count(F.lit(1)),
                      "s_p": F.sum(F.col("v").cast("decimal(18,2)"))},
            finals={"n": F.sum("n_p").cast("long"),
                    "s": F.sum("s_p").cast("double")},
            n_salts=8,
        )
        .orderBy("key")
        .collect()
    )
    assert [(r.key, r.n, r.s) for r in plain] == [(r.key, r.n, r.s) for r in salted]


def test_hotkey_split_join_equals_plain_join(spark):
    # one pathological key ("hot": 2000 rows) among uniform cold keys
    big = spark.createDataFrame(
        [("hot", i, float(i % 5)) for i in range(2000)]
        + [(f"k{i % 50}", 10_000 + i, 1.0) for i in range(500)],
        "key string, rid int, v double",
    )
    small = spark.createDataFrame(
        [("hot", "H")] + [(f"k{i}", f"D{i}") for i in range(50)] + [("absent", "X")],
        "key string, label string",
    )
    plain = sorted(
        (r.key, r.rid, r.label) for r in big.join(small, ["key"]).collect()
    )
    split = K.salted_join_hotkeys(
        big, small, on=["key"], big_unique_col="rid",
        n_salts=4, sample_fraction=0.5, hot_threshold=100,
    )
    assert sorted((r.key, r.rid, r.label) for r in split.collect()) == plain


def test_hotkey_split_join_left_and_no_hot(spark):
    big = spark.createDataFrame(
        [(f"k{i % 10}", i, 1.0) for i in range(100)],
        "key string, rid int, v double",
    )
    small = spark.createDataFrame(
        [(f"k{i}", f"D{i}") for i in range(5)], "key string, label string"
    )
    plain = sorted(
        (r.key, r.rid, r.label) for r in big.join(small, ["key"], "left").collect()
    )
    # no key reaches the hot threshold -> pure cold path, still identical
    split = K.salted_join_hotkeys(
        big, small, on=["key"], big_unique_col="rid", how="left",
        sample_fraction=0.5, hot_threshold=1_000_000,
    )
    assert sorted((r.key, r.rid, r.label) for r in split.collect()) == plain
