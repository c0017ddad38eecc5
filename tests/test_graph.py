"""Iterative algorithms: connected components (pairs -> dedup groups)
and distributed k-means (cluster purity vs embedding labels)."""

import numpy as np
import pandas as pd

from pyspark.sql import functions as F

from feast_spark.pipeline.graph import (
    connected_components,
    dedup_groups_from_pairs,
    kmeans,
)

SF = "/root/testdata/sf0.001"


def test_connected_components_chains(spark):
    # components: {1,2,3,4} (chain), {10,11}, {20,21,22} (triangle)
    edges = spark.createDataFrame(
        pd.DataFrame(
            {"id_a": [1, 2, 3, 10, 20, 20, 21], "id_b": [2, 3, 4, 11, 21, 22, 22]}
        )
    )
    got = connected_components(edges).toPandas().set_index("id")["component"]
    assert got[1] == got[2] == got[3] == got[4] == 1
    assert got[10] == got[11] == 10
    assert got[20] == got[21] == got[22] == 20


def test_dedup_groups_from_pairs(spark):
    docs = spark.range(0, 8).select(F.col("id").alias("doc_id"))
    pairs = spark.createDataFrame(pd.DataFrame({"id_a": [0, 1, 5], "id_b": [1, 2, 6]}))
    got = (
        dedup_groups_from_pairs(docs, pairs)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert got["group_id"].tolist() == [0, 0, 0, 3, 4, 5, 5, 7]
    assert got["keep"].tolist() == [True, False, False, True, True, True, False, True]


def test_kmeans_recovers_clusters(spark):
    # the provided embeddings table is label-unstructured (measured:
    # same-label pairs are no more similar than random), so test
    # cluster RECOVERY on properly separated synthetic gaussians
    rng = np.random.default_rng(5)
    centers = rng.normal(0, 10, size=(5, 16))
    rows = []
    for i in range(500):
        c = i % 5
        rows.append((i, (centers[c] + rng.normal(0, 0.5, 16)).tolist(), c))
    pdf = pd.DataFrame(rows, columns=["vec_id", "embedding", "true_c"])
    emb = spark.createDataFrame(pdf)
    assign, cents = kmeans(emb, k=5, iters=10)
    got = assign.join(emb.select("vec_id", "true_c"), on="vec_id").toPandas()
    purity = (
        got.groupby("cluster")["true_c"]
        .agg(lambda s: s.value_counts().iloc[0] / len(s))
        .mean()
    )
    assert purity > 0.95, purity
    # determinism
    _, cents2 = kmeans(emb, k=5, iters=10)
    assert np.allclose(np.array(cents), np.array(cents2))
