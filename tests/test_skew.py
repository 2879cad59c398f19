"""Salted-join correctness + distribution: results identical to a plain
join; a hot key's rows spread over n_salts reducer groups."""

from __future__ import annotations

import pyspark.sql.functions as F

from ovalspark.operators.skew import salted_join


def _skewed(spark):
    # key 'hot' appears 5000×, 50 cold keys once each
    hot = spark.range(5000).select(F.lit("hot").alias("k"), F.col("id").alias("v"))
    cold = spark.range(50).select(F.concat(F.lit("c"), F.col("id")).alias("k"), (F.col("id") + 10_000).alias("v"))
    big = hot.unionByName(cold)
    small = spark.createDataFrame(
        [("hot", "HOT"), ("c1", "C1"), ("c7", "C7"), ("missing", "M")], "k string, label string"
    )
    return big, small


def test_salted_join_matches_plain_join(spark):
    big, small = _skewed(spark)
    plain = big.join(small, "k").select("k", "v", "label")
    salted = salted_join(big, small, "k", n_salts=8).select("k", "v", "label")
    assert plain.exceptAll(salted).count() == 0
    assert salted.exceptAll(plain).count() == 0


def test_salted_left_join_matches(spark):
    big, small = _skewed(spark)
    plain = big.join(small, "k", "left").select("k", "v", "label")
    salted = salted_join(big, small, "k", n_salts=8, how="left").select("k", "v", "label")
    assert plain.exceptAll(salted).count() == 0
    assert salted.exceptAll(plain).count() == 0


def test_salt_spreads_hot_key(spark):
    big, _ = _skewed(spark)
    b = big.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col("k"), F.monotonically_increasing_id(), F.lit(11)), F.lit(8)).cast("int")
    )
    per_salt = b.filter(F.col("k") == "hot").groupBy("_salt").count().collect()
    assert len(per_salt) == 8  # all 8 salt buckets used
    counts = [r["count"] for r in per_salt]
    assert max(counts) < 5000 * 0.5  # no bucket holds the majority
