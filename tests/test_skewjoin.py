"""salted_join: result-identity with the plain join (inner + left,
hot keys, null keys, duplicates), salt dispersion on the hot key, and
guard rails."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from htm_streamer_spark.operators.skewjoin import salted_join


def _large(spark):
    # hot key 7 owns 500 rows; keys 0..9 otherwise uniform; key 99
    # has no match on the small side
    rows = [(7, i, f"p{i}") for i in range(500)]
    rows += [(k, 1000 + k, f"q{k}") for k in range(10)]
    rows += [(99, 2000, "orphan")]
    return spark.createDataFrame(rows, "k long, event_id long, payload string")


def _small(spark):
    return spark.createDataFrame(
        [(k, f"dim{k}") for k in range(10)], "k long, label string"
    )


def _multiset(df):
    # repr key: tuples may contain None (left-join misses, null keys)
    return sorted(map(tuple, df.collect()), key=repr)


@pytest.mark.parametrize("how", ["inner", "left"])
@pytest.mark.parametrize("spread_col", [None, "event_id"])
def test_salted_join_equals_plain_join(spark, how, spread_col):
    large, small = _large(spark), _small(spark)
    plain = large.join(small, ["k"], how)
    salted = salted_join(
        large, small, ["k"], n_salts=8, how=how, spread_col=spread_col
    )
    assert sorted(plain.columns) == sorted(salted.columns)
    assert _multiset(salted.select(*plain.columns)) == _multiset(plain)


def test_hot_key_rows_spread_across_salts(spark):
    # the property that makes the trick work: the hot key's rows carry
    # MANY distinct salts, so no single reducer owns the key
    from htm_streamer_spark.operators.skewjoin import _SALT  # noqa: F401

    large = _large(spark)
    salt = F.pmod(
        F.xxhash64(F.col("event_id"), F.lit("salted-join-v1")), F.lit(8)
    ).cast("int")
    n_distinct = (
        large.where(F.col("k") == 7)
        .select(salt.alias("s"))
        .distinct()
        .count()
    )
    assert n_distinct == 8


def test_null_keys_match_plain_semantics(spark):
    large = spark.createDataFrame(
        [(None, 1), (1, 2), (None, 3)], "k long, event_id long"
    )
    small = spark.createDataFrame([(1, "a")], "k long, label string")
    for how in ("inner", "left"):
        plain = large.join(small, ["k"], how)
        salted = salted_join(large, small, ["k"], how=how, spread_col="event_id")
        assert _multiset(salted.select(*plain.columns)) == _multiset(plain)


def test_duplicate_small_rows_multiply_identically(spark):
    large = spark.createDataFrame([(1, 10), (1, 11)], "k long, event_id long")
    small = spark.createDataFrame(
        [(1, "x"), (1, "y")], "k long, label string"
    )
    plain = large.join(small, ["k"], "inner")
    salted = salted_join(large, small, ["k"], spread_col="event_id")
    assert _multiset(salted.select(*plain.columns)) == _multiset(plain)


def test_rejects_right_and_full(spark):
    with pytest.raises(ValueError, match="inner/left"):
        salted_join(_large(spark), _small(spark), ["k"], how="full")


def test_rejects_ambiguous_columns(spark):
    large = spark.createDataFrame([(1, "v")], "k long, label string")
    small = spark.createDataFrame([(1, "w")], "k long, label string")
    with pytest.raises(ValueError, match="ambiguous"):
        salted_join(large, small, ["k"])
