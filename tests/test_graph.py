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


def test_connected_components_long_path_pointer_doubling(spark):
    """A 60-node path has diameter 59 — plain 1-hop propagation needs ~59
    rounds; pointer doubling must converge within 10."""
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(59)], "id_a long, id_b long"
    )
    comps = connected_components(edges, max_iters=10).toPandas()
    assert (comps["component"] == 0).all()
    assert len(comps) == 60


def test_connected_components_raises_on_nonconvergence(spark):
    import pytest as _pytest

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(59)], "id_a long, id_b long"
    )
    with _pytest.raises(RuntimeError, match="did not converge"):
        connected_components(edges, max_iters=1)


def test_connected_components_warn_mode(spark):
    import warnings

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(59)], "id_a long, id_b long"
    )
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        out = connected_components(edges, max_iters=1, raise_on_nonconverged=False)
        assert out.count() == 60
        assert any("did not converge" in str(x.message) for x in w)


def test_assign_clusters_matches_brute_force(spark):
    import numpy as np

    from feast_spark.pipeline.graph import assign_clusters

    rng = np.random.RandomState(0)
    vecs = rng.randn(50, 8)
    cents = rng.randn(4, 8)
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(50)],
        "vec_id long, embedding array<double>",
    )
    got = assign_clusters(df, [list(map(float, c)) for c in cents]).toPandas()
    got = got.sort_values("vec_id").reset_index(drop=True)
    d = np.round(((vecs[:, None, :] - cents[None, :, :]) ** 2).sum(2), 6)
    assert got["cluster"].tolist() == d.argmin(1).astype(int).tolist()
