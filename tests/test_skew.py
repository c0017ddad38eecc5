"""Skew utilities: salted aggregation equals plain aggregation; salted
repartition spreads hot keys; hot-key detection finds the Zipf head."""

import numpy as np
import pandas as pd

from pyspark.sql import functions as F

from feast_spark.operators.skew import (
    detect_hot_keys,
    salted_agg,
    salted_repartition,
    with_salt,
)


def _skewed_df(spark, n=20000):
    pdf = pd.DataFrame(
        {
            "doc_id": ["hot"] * (n // 2) + [f"d{i}" for i in range(n // 2)],
            "v": np.arange(n, dtype=np.float64),
        }
    )
    return spark.createDataFrame(pdf)


def test_salted_agg_matches_plain(spark):
    df = _skewed_df(spark)
    got = (
        salted_agg(df, ["doc_id"], [("sum", "v"), ("count", "v"), ("max", "v"), ("avg", "v")])
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    exp = (
        df.groupBy("doc_id")
        .agg(
            F.sum("v").alias("sum_v"),
            F.count("v").alias("count_v"),
            F.max("v").alias("max_v"),
            F.avg("v").alias("avg_v"),
        )
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    for c in ("sum_v", "count_v", "max_v", "avg_v"):
        assert np.allclose(got[c].values, exp[c].values), c


def test_salted_repartition_spreads_hot_key(spark):
    df = _skewed_df(spark)
    salted = with_salt(df.filter("doc_id = 'hot'"), shards=8)
    n_shards = salted.select("__salt").distinct().count()
    assert n_shards == 8
    # round-trip keeps the rows intact
    rp = salted_repartition(df, ["doc_id"], shards=8)
    assert rp.count() == df.count()
    assert "__salt" not in rp.columns


def test_detect_hot_keys(spark):
    df = _skewed_df(spark)
    hot = detect_hot_keys(df, ["doc_id"], threshold_rows=2000, sample_fraction=0.2).toPandas()
    assert "hot" in set(hot["doc_id"])
    assert len(hot) <= 3  # the tail must not be flagged
