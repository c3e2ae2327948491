"""Salted-join correctness: results must equal the plain join regardless of
salt fan-out, including duplicate fact rows, unmatched keys, and left-join
NULL padding."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vacancy_analyser_spark.operators.skew import salted_join, top_keys


@pytest.fixture()
def skewed(spark):
    # one hot key (90% of rows), a cold key, and an orphan with no dim match
    fact = spark.createDataFrame(
        [("hot", i) for i in range(90)] + [("cold", 1), ("cold", 2), ("orphan", 0)],
        "k string, v int",
    )
    dim = spark.createDataFrame([("hot", "H"), ("cold", "C"), ("unused", "U")], "k string, label string")
    return fact, dim


def _sorted(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize("n_salts", [1, 4, 16])
@pytest.mark.parametrize("how", ["inner", "left"])
def test_salted_join_equals_plain_join(spark, skewed, n_salts, how):
    fact, dim = skewed
    plain = fact.join(dim, "k", how).select("k", "v", "label")
    salted = salted_join(fact, dim, "k", n_salts=n_salts, how=how).select("k", "v", "label")
    assert _sorted(salted) == _sorted(plain)


def test_salted_join_spreads_hot_key(spark, skewed):
    fact, dim = skewed
    out = salted_join(fact, dim, "k", n_salts=8)
    # multiplicity preserved exactly: 90 hot + 2 cold
    assert out.count() == 92


def test_salted_join_rejects_unsupported_how(spark, skewed):
    fact, dim = skewed
    with pytest.raises(ValueError):
        salted_join(fact, dim, "k", how="full")


def test_top_keys_diagnosis(spark, skewed):
    fact, _ = skewed
    rows = top_keys(fact, "k", n=2).collect()
    assert rows[0]["key"] == "hot"
    assert rows[0]["count"] == 90
    assert rows[0]["share"] == pytest.approx(90 / 93)


def test_salting_actually_balances_hot_key(spark, skewed):
    """The point of salting: the hot key's rows must spread across salt
    values so no single (key, salt) shuffle group carries the whole key."""
    from pyspark.sql import functions as F
    from vacancy_analyser_spark.operators.skew import _SALT

    fact, _ = skewed
    n_salts = 8
    salted = fact.withColumn(
        _SALT,
        F.pmod(F.xxhash64(F.monotonically_increasing_id(), F.lit(42)), F.lit(n_salts)).cast("int"),
    )
    per_group = (
        salted.filter(F.col("k") == "hot").groupBy(_SALT).count().collect()
    )
    counts = [r["count"] for r in per_group]
    assert sum(counts) == 90
    assert len(counts) >= n_salts // 2          # most salt values in use
    assert max(counts) <= 90 // 2               # no group holds the key alone
