"""Iterative distributed algorithms for the curation pipeline.

* ``connected_components`` — min-label propagation WITH pointer
  doubling (label := label(label) each round, the shortcutting step of
  the classic hybrid CC algorithms) over an edge list. The dedup
  families emit near-duplicate PAIRS; deduplication needs GROUPS — the
  transitive closure. Each iteration is three hash joins + a
  min-aggregate; the doubling step halves remaining chain lengths, so
  convergence is O(log(diameter)) — 20 iterations cover diameters up to
  ~2^20, and near-dup graphs are overwhelmingly tiny cliques (3-5
  rounds in practice). If the loop ever exhausts ``max_iters`` with
  labels still changing it RAISES (never silently returns unconverged
  labels — a split component would let leakage_safe_split put
  near-duplicates on both sides of a train/test split).
* ``kmeans`` — Lloyd iterations over an embedding column: broadcast the
  centroid matrix, assign each row via one BLAS matmul per Arrow batch
  (mapInPandas), recompute means with a map-side-combinable aggregate.
  Deterministic seeded init (hash-ordered sample).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iters: int = 20,
    raise_on_nonconverged: bool = True,
) -> DataFrame:
    """Label every vertex with the minimum vertex id of its component.

    Returns (id, component). Plan per round: (1) propagate each vertex's
    current label across edges — ONE join + one min-aggregate over the
    self-loop-augmented edge list (the (u,u) row carries the vertex's
    own label through the same aggregate, so the old formulation's
    separate labels-side left join is gone: ``min`` over
    {own ∪ neighbors} IS ``least(own, neighbor_min)`` and the self-loop
    row doubles as the ``__old`` carrier for the convergence metric),
    (2) pointer-double: ``component := component(component)`` (one
    self-join) — the shortcutting step that makes long chains collapse
    in O(log diameter) rounds instead of O(diameter). Stops when no
    label changed; raises RuntimeError if ``max_iters`` is exhausted
    while labels are still changing (pass ``raise_on_nonconverged=False``
    to get the partial labels plus a warning instead — never silent).

    The per-round convergence check is FREE: the old label rides along
    and an ``observe()`` metric counts changes during the SAME action
    that materializes the round's localCheckpoint — one Spark job per
    round total, no separate join + count action (halves the job count
    vs the naive re-join formulation).
    """
    from pyspark.sql import Observation

    if max_iters < 1:
        # a skipped loop would return identity labels (fully split
        # components) without tripping the non-convergence guard
        raise ValueError(f"max_iters must be >= 1, got {max_iters}")
    sym = edges.select(F.col(src).alias("u"), F.col(dst).alias("v")).unionByName(
        edges.select(F.col(dst).alias("u"), F.col(src).alias("v"))
    ).distinct()
    verts = sym.select(F.col("u").alias("id")).distinct()
    # self-loop-augmented edge list: one (u,u) row per vertex. The loop
    # row folds the vertex's OWN label into the neighbor min (so no
    # separate labels join is needed) and, tagged by v == u, carries the
    # pre-round label out of the aggregate for the convergence metric.
    sym_loops = sym.unionByName(
        verts.select(F.col("id").alias("u"), F.col("id").alias("v"))
    ).persist()
    labels = verts.withColumn("component", F.col("id")).persist()
    changed = 0
    for it in range(max_iters):
        propagated = (
            sym_loops.join(labels.withColumnRenamed("id", "v"), on="v")
            .groupBy("u")
            .agg(
                F.min("component").alias("component"),
                F.min(
                    F.when(F.col("v") == F.col("u"), F.col("component"))
                ).alias("__old"),
            )
            .withColumnRenamed("u", "id")
        )
        # pointer doubling: follow the label one more hop. Labels are
        # vertex ids, so looking the label up in the label table jumps
        # component -> component(component), halving chain lengths.
        hop = propagated.select(
            F.col("id").alias("component"), F.col("component").alias("__c2")
        )
        # localCheckpoint (not persist): `propagated` references `labels`
        # twice, so without truncation the logical plan DOUBLES per round
        # — by round ~10 plan-tree handling alone OOMs the driver. The
        # checkpoint materializes the (small: one row per vertex) label
        # table and resets the lineage to constant size per round.
        obs = Observation(f"cc_round_{it}")
        checkpointed = (
            propagated.join(hop, on="component", how="left")
            .select(
                "id",
                F.coalesce("__c2", "component").alias("component"),
                "__old",
            )
            .observe(
                obs,
                F.count(
                    F.when(F.col("component") != F.col("__old"), F.lit(1))
                ).alias("changed"),
            )
            .localCheckpoint(eager=True)
        )
        changed = int(obs.get["changed"])
        labels.unpersist()
        labels = checkpointed.select("id", "component")
        if changed == 0:
            break
    sym_loops.unpersist()
    if changed != 0:
        msg = (
            f"connected_components did not converge in {max_iters} iterations "
            f"({changed} labels still changing) — components may be split; "
            "raise max_iters"
        )
        if raise_on_nonconverged:
            raise RuntimeError(msg)
        import warnings

        warnings.warn(msg, RuntimeWarning, stacklevel=2)
    return labels


def dedup_groups_from_pairs(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    src: str = "id_a",
    dst: str = "id_b",
) -> DataFrame:
    """Assign every document a dedup group id (component representative;
    singletons map to themselves) and a keep flag (True for the group
    representative = min id)."""
    comps = connected_components(pairs, src, dst)
    out = docs.select(F.col(id_col)).join(
        comps.withColumnRenamed("id", id_col), on=id_col, how="left"
    )
    out = out.withColumn("group_id", F.coalesce("component", F.col(id_col))).drop(
        "component"
    )
    return out.withColumn("keep", F.col(id_col) == F.col("group_id"))


def assign_clusters(
    df: DataFrame,
    centroids: Sequence[Sequence[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
) -> DataFrame:
    """Nearest-centroid assignment given FIXED centroids (the k-means
    E-step as a standalone, cross-engine-deterministic operator).

    Squared distances are rounded to ``round_digits`` before the argmin
    and ties break on the smaller cluster id, so any engine computing
    the same rounded distances (e.g. a DuckDB SQL oracle) produces
    identical assignments regardless of float summation order. One
    broadcast + one corpus scan with a per-Arrow-batch BLAS matmul — no
    shuffle.
    """
    from pyspark.sql import types as T

    c = np.asarray(centroids, dtype=np.float64)
    bc = df.sparkSession.sparkContext.broadcast(c)
    rd = round_digits
    out_schema = T.StructType(
        [
            T.StructField(id_col, df.schema[id_col].dataType),
            T.StructField("cluster", T.IntegerType()),
        ]
    )

    def assign(batches):
        cm = bc.value
        for pdf in batches:
            if pdf.empty:
                continue
            m = np.stack(pdf["v"].to_numpy()).astype(np.float64)
            # exact squared distance per pair (no expansion identity —
            # (m.m - 2m.c + c.c) loses ~1e-12 and can flip the rounding)
            d = ((m[:, None, :] - cm[None, :, :]) ** 2).sum(axis=2)
            d = np.round(d, rd)
            # argmin with smaller-cluster-id tie-break (np.argmin takes
            # the first minimum, which IS the smallest index)
            yield pd.DataFrame(
                {id_col: pdf[id_col], "cluster": d.argmin(axis=1).astype(np.int32)}
            )

    return df.select(id_col, F.col(vec_col).alias("v")).mapInPandas(assign, out_schema)


def kmeans(
    df: DataFrame,
    k: int = 8,
    iters: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> tuple[DataFrame, list[list[float]]]:
    """Distributed Lloyd k-means. Returns (assignments df (id, cluster),
    final centroid list). Each iteration: one broadcast + one scan with
    per-batch BLAS assignment + one aggregate (sum/count per cluster,
    map-side combinable). Deterministic hash-seeded init."""
    from pyspark.sql import types as T

    spark = df.sparkSession
    # deterministic farthest-point init over a hash-ordered sample
    # (k-means++-style spread without RNG; plain hash-min init splits
    # true clusters when two seeds land in one — measured 0.90 vs 1.0
    # purity on separated gaussians)
    sample = (
        df.select(F.col(vec_col).alias("v"))
        .withColumn("__h", F.abs(F.hash(F.col("v").cast("string"), F.lit(seed))))
        .orderBy("__h")
        .limit(max(32 * k, 256))
        .collect()
    )
    pool = np.stack([np.asarray(r["v"], dtype=np.float64) for r in sample])
    chosen = [0]
    d2 = ((pool - pool[0]) ** 2).sum(1)
    while len(chosen) < min(k, len(pool)):
        nxt = int(d2.argmax())
        chosen.append(nxt)
        d2 = np.minimum(d2, ((pool - pool[nxt]) ** 2).sum(1))
    centroids = pool[chosen]

    out_schema = T.StructType(
        [
            T.StructField(id_col, df.schema[id_col].dataType),
            T.StructField("cluster", T.IntegerType()),
        ]
    )
    base = df.select(id_col, F.col(vec_col).alias("v"))

    assign_df = None
    for _ in range(iters):
        bc = spark.sparkContext.broadcast(centroids)

        def assign(batches):
            c = bc.value
            for pdf in batches:
                if pdf.empty:
                    continue
                m = np.stack(pdf["v"].to_numpy()).astype(np.float64)
                d = ((m * m).sum(1)[:, None] - 2 * (m @ c.T) + (c * c).sum(1)[None, :])
                yield pd.DataFrame(
                    {id_col: pdf[id_col], "cluster": d.argmin(1).astype(np.int32)}
                )

        assign_df = base.mapInPandas(assign, out_schema)
        joined = base.join(assign_df, on=id_col)
        stats = (
            joined.select(
                "cluster", F.posexplode(F.col("v")).alias("pos", "x")
            )
            .groupBy("cluster", "pos")
            .agg(F.sum("x").alias("s"), F.count("x").alias("n"))
            .collect()
        )
        new_c = centroids.copy()
        sums: dict[int, np.ndarray] = {}
        counts: dict[int, int] = {}
        dim = centroids.shape[1]
        for r in stats:
            sums.setdefault(r["cluster"], np.zeros(dim))[r["pos"]] = r["s"]
            counts[r["cluster"]] = r["n"]
        for c_id, vec in sums.items():
            if counts.get(c_id):
                new_c[c_id] = vec / counts[c_id]
        if np.allclose(new_c, centroids, atol=1e-9):
            centroids = new_c
            break
        centroids = new_c
    # final E-step so the returned assignments are consistent with the
    # RETURNED centroids (when the loop exhausts `iters` without
    # converging, the in-loop assign_df was computed against the
    # previous centroid set)
    bc_final = spark.sparkContext.broadcast(centroids)

    def assign_final(batches):
        c = bc_final.value
        for pdf in batches:
            if pdf.empty:
                continue
            m = np.stack(pdf["v"].to_numpy()).astype(np.float64)
            d = ((m * m).sum(1)[:, None] - 2 * (m @ c.T) + (c * c).sum(1)[None, :])
            yield pd.DataFrame(
                {id_col: pdf[id_col], "cluster": d.argmin(1).astype(np.int32)}
            )

    assign_df = base.mapInPandas(assign_final, out_schema)
    return assign_df, [list(map(float, c)) for c in centroids]
