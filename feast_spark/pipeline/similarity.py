"""Similarity search over embedding columns (``array<float>``).

* ``brute_force_topk`` — exact cosine top-k: broadcast the (small)
  query set against the corpus, JVM-side ``zip_with``/``aggregate``
  dot products, per-query top-k via window. The baseline and the
  verifier for approximate paths.
* ``lsh_topk`` — random-hyperplane LSH: sign-bit signatures bucket the
  corpus; each query probes its own bucket (and optionally multi-probe
  neighbors), reranking only bucket members. Sub-linear probe cost at
  the price of recall — golden-tested against brute force.
* ``ivf_topk`` — IVF-style coarse quantization: k-means-ish centroid
  assignment (deterministic seeded sample as centroids), queries probe
  the ``nprobe`` nearest cells.

Scale notes: brute force is O(Q×N) — fine for Q ≤ ~10³ broadcast
against any N (it's one scan of the corpus, embarrassingly parallel,
no shuffle). For Q ≈ N use the bucketed variants, whose shuffle is on
(bucket) with bounded bucket sizes.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def _make_dot_udf():
    """Arrow-batched numpy dot product over two array columns.

    Spark's higher-order `aggregate`/`zip_with` are CodegenFallback
    (interpreted per element), so at millions of candidate pairs the
    JVM-side expression loses to one numpy matmul per Arrow batch.
    Summation order differs from sequential left-to-right by < 1e-12
    relative — outputs are rounded to 6 digits, so cross-engine oracle
    parity is preserved.
    """
    from pyspark.sql.functions import pandas_udf

    def dot_fn(a, b):
        if len(a) == 0:
            return pd.Series([], dtype="float64")
        ma = np.stack(a.to_numpy()).astype(np.float64)
        mb = np.stack(b.to_numpy()).astype(np.float64)
        return pd.Series(np.einsum("ij,ij->i", ma, mb))

    dot_fn.__annotations__ = {"a": pd.Series, "b": pd.Series, "return": pd.Series}
    return pandas_udf("double")(dot_fn)


_DOT_UDF = None


def pair_dot(a: Column, b: Column) -> Column:
    """Vectorized dot product for pair-scoring hot paths."""
    global _DOT_UDF
    if _DOT_UDF is None:
        _DOT_UDF = _make_dot_udf()
    return _DOT_UDF(a, b)


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    query_id: str = "vec_id",
    corpus_id: str = "vec_id",
    query_vec: str = "embedding",
    corpus_vec: str = "embedding",
    exclude_self: bool = True,
    round_digits: int | None = 6,
) -> DataFrame:
    """Exact cosine top-k neighbors for each query row.

    Output: (query_id, neighbor_id, rank, cosine). Ties broken by
    neighbor id for determinism.
    """
    # Physical strategy: broadcast the query matrix (numpy) to the
    # executors and scan the corpus once with a blocked BLAS matmul per
    # Arrow batch, emitting only per-batch top-k candidates. Data
    # shipped to Python is O(corpus + Q*k*batches), never the Q x N
    # pair table (the crossJoin formulation moved 2M pairs of 64-float
    # arrays through Arrow; this moves 2k rows).
    from pyspark.sql import types as T

    q_rows = queries.select(
        F.col(query_id).alias("query_id"), F.col(query_vec).alias("__qv")
    ).collect()  # bounded: the broadcast-side query set
    if not q_rows:
        # schema must match the non-empty path exactly (actual id types,
        # rank from row_number is int) — a hardcoded long schema breaks
        # unions/joins only in the empty-input case
        empty_schema = T.StructType(
            [
                T.StructField("query_id", queries.schema[query_id].dataType),
                T.StructField("neighbor_id", corpus.schema[corpus_id].dataType),
                T.StructField("rank", T.IntegerType()),
                T.StructField("cosine", T.DoubleType()),
            ]
        )
        return queries.sparkSession.createDataFrame([], empty_schema)
    qids = np.array([r["query_id"] for r in q_rows])
    qmat = np.stack([np.asarray(r["__qv"], dtype=np.float64) for r in q_rows])
    qnorm = np.linalg.norm(qmat, axis=1)
    sc = queries.sparkSession.sparkContext
    bq = sc.broadcast((qids, qmat, qnorm))
    kk, rd, excl = k, round_digits, exclude_self

    from pyspark.sql import types as T

    id_type = corpus.schema[corpus_id].dataType
    out_schema = T.StructType(
        [
            T.StructField("query_id", queries.schema[query_id].dataType),
            T.StructField("neighbor_id", id_type),
            T.StructField("cosine", T.DoubleType()),
        ]
    )

    def score(batches):
        qids_, qmat_, qnorm_ = bq.value
        for pdf in batches:
            if pdf.empty:
                continue
            cmat = np.stack(pdf["__cv"].to_numpy()).astype(np.float64)
            cnorm = np.linalg.norm(cmat, axis=1)
            sims = (cmat @ qmat_.T) / np.outer(cnorm, qnorm_)  # |batch| x Q
            if rd is not None:
                sims = np.round(sims, rd)
            nids = pdf["neighbor_id"].to_numpy()
            out = []
            for j, qid in enumerate(qids_):
                col = sims[:, j]
                mask = nids != qid if excl else np.ones(len(nids), bool)
                idx = np.nonzero(mask)[0]
                if not len(idx):
                    continue
                # batch-local top-k (score desc, id asc) — superset of
                # the global top-k contributions from this batch
                order = np.lexsort((nids[idx], -col[idx]))[:kk]
                for i in idx[order]:
                    out.append((qid, nids[i], float(col[i])))
            yield pd.DataFrame(out, columns=["query_id", "neighbor_id", "cosine"])

    cand = corpus.select(
        F.col(corpus_id).alias("neighbor_id"), F.col(corpus_vec).alias("__cv")
    ).mapInPandas(score, out_schema)
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (no RNG state — pure
    function of seed, reproducible across runs/resumes)."""
    import math

    planes = []
    for p in range(n_planes):
        row = []
        for d in range(dim):
            x = math.sin(seed * 9973 + p * 1009 + d * 101) * 43758.5453
            row.append(x - math.floor(x) - 0.5)
        planes.append(row)
    return planes


# ONE quantization scale shared by plane quantization, the vector
# quantization inside lsh_sig_norm, and the DuckDB oracle generator —
# three independent copies of the constant would be a silent-desync trap
QUANT_SCALE = 1_000_000


def quantize_planes(planes: list[list[float]]) -> list[list[int]]:
    """Integer-quantized hyperplanes: ``floor(p·QUANT_SCALE + 0.5)`` per
    element. ``floor(x + 0.5)`` (NOT language round()) so every engine
    — numpy, DuckDB, Java — lands on the identical integer regardless
    of its half-rounding convention."""
    import math

    return [[int(math.floor(x * QUANT_SCALE + 0.5)) for x in row] for row in planes]


def lsh_sig_norm(
    vec: Column, planes: list[list[float]], quantize: bool = False
) -> Column:
    """``struct(sig: long, norm: double)`` from ONE Arrow batch pass:
    the signature matmul and the L2 norm share the stacked batch matrix.

    Exists because pairing ``lsh_signature`` (vectorized) with the
    higher-order ``_norm`` expression re-introduced the CodegenFallback
    trap one column over — ``aggregate`` is interpreted PER ELEMENT per
    corpus row, which dominates index build at corpus scale
    (VERDICT r02 #3). numpy's pairwise-summed norm differs from the
    sequential expression by < 1e-12 relative; every consumer rounds
    cosine to 6 digits, so oracle parity is unaffected.

    ``quantize=True`` computes the sign bits over INTEGER-quantized
    vectors and planes (``floor(x·10⁶ + 0.5)`` each, then an exact
    int64 dot): bit-for-bit reproducible on ANY engine — float sign
    bits are not, because a near-zero dot's sign flips with summation
    order, which is exactly why the float form could never carry a
    cross-engine SQL oracle. Bucketing quality is unchanged (the
    hyperplanes are random; 1e-6 quantization noise is far below their
    scale), and the ~2⁻²⁰-probability exact-zero integer dot maps to
    bit 0 on every engine."""
    from pyspark.sql.functions import pandas_udf

    if quantize:
        P = np.asarray(quantize_planes(planes), dtype=np.int64)
    else:
        P = np.asarray(planes, dtype=np.float64)  # n_planes x dim
    weights = (1 << np.arange(P.shape[0])).astype(np.int64)
    q = quantize

    def fn(v):
        if len(v) == 0:
            return pd.DataFrame({"sig": pd.Series([], dtype="int64"),
                                 "norm": pd.Series([], dtype="float64")})
        m = np.stack(v.to_numpy()).astype(np.float64)
        if q:
            # guard the exact-int64 contract: |x| beyond ~1e5 (quantized
            # ~1e11, times a ~1e6 plane over 64 dims) approaches int64
            # wrap, which numpy does SILENTLY while DuckDB raises —
            # wrong buckets plus oracle divergence. NaN→int is undefined.
            if not np.isfinite(m).all() or np.abs(m).max(initial=0.0) > 1e5:
                raise ValueError(
                    "quantized LSH signatures need finite embeddings with "
                    "|x| <= 1e5 (unit-scale vectors); normalize first or "
                    "pass quantize=False"
                )
            mq = np.floor(m * QUANT_SCALE + 0.5).astype(np.int64)
            bits = (mq @ P.T) > 0
        else:
            bits = (m @ P.T) > 0
        return pd.DataFrame(
            {
                "sig": (bits @ weights).astype(np.int64),
                "norm": np.linalg.norm(m, axis=1),
            }
        )

    fn.__annotations__ = {"v": pd.Series, "return": pd.DataFrame}
    return pandas_udf("struct<sig: long, norm: double>")(fn)(vec)


def lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    n_planes: int = 8,
    dim: int = 64,
    query_id: str = "vec_id",
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    exclude_self: bool = True,
    multiprobe: int = 1,
    quantize: bool = True,
) -> DataFrame:
    """Approximate top-k: both sides hashed to sign buckets; rerank only
    same-bucket pairs. One shuffle on bucket id. Recall rises with
    fewer planes (bigger buckets) and with ``multiprobe`` — probing all
    buckets within Hamming distance ``multiprobe`` of the query's
    signature (1 + n_planes buckets at distance 1) trades probe cost for
    recall without touching the corpus index. ``quantize`` (default)
    computes sign bits over integer-quantized vectors — engine-portable
    bucketing (see ``lsh_sig_norm``), which is what lets the driver
    carry a full cross-engine SQL oracle for this query."""
    planes = _hyperplanes(dim, n_planes, seed)
    # materialize the signature once per query row, THEN derive the
    # multiprobe variants with cheap XORs — never re-invoke the UDF.
    # General Hamming radius: every bit-subset of size <= multiprobe
    # (sum of C(n_planes, r) masks — callers choosing large radii are
    # explicitly buying that probe fan-out)
    from itertools import combinations

    base_sig = F.col("__sig")
    masks = [0]
    for r in range(1, min(multiprobe, n_planes) + 1):
        for combo in combinations(range(n_planes), r):
            m = 0
            for b in combo:
                m |= 1 << b
            masks.append(m)
    probe_sigs = [base_sig.bitwiseXOR(F.lit(m)) if m else base_sig for m in masks]
    q = queries.select(
        F.col(query_id).alias("query_id"),
        F.col(vec_col).alias("__qv"),
        lsh_sig_norm(F.col(vec_col), planes, quantize=quantize).alias("__sn"),
    ).select(
        "query_id",
        "__qv",
        F.col("__sn.norm").alias("__qn"),
        F.col("__sn.sig").alias("__sig"),
    ).select(
        "query_id",
        "__qv",
        "__qn",
        F.explode(F.array_distinct(F.array(*probe_sigs))).alias("__bucket"),
    )
    c = corpus.select(
        F.col(corpus_id).alias("neighbor_id"),
        F.col(vec_col).alias("__cv"),
        lsh_sig_norm(F.col(vec_col), planes, quantize=quantize).alias("__sn"),
    ).select(
        "neighbor_id",
        "__cv",
        F.col("__sn.norm").alias("__cn"),
        F.col("__sn.sig").alias("__bucket"),
    )
    pairs = c.join(q, on="__bucket")
    if exclude_self:
        pairs = pairs.filter(F.col("query_id") != F.col("neighbor_id"))
    sim = pairs.withColumn(
        "cosine",
        F.round(pair_dot(F.col("__qv"), F.col("__cv")) / (F.col("__qn") * F.col("__cn")), 6),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        sim.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    n_cells: int = 16,
    nprobe: int = 2,
    query_id: str = "vec_id",
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    exclude_self: bool = True,
) -> DataFrame:
    """IVF-style ANN: centroids = deterministic corpus sample; corpus
    rows assigned to their nearest centroid cell; queries probe the
    ``nprobe`` nearest cells and rerank members. Centroid table is tiny
    → broadcast; the only shuffle is the cell-id equi-join."""
    cent = (
        corpus.select(F.col(vec_col).alias("__cv"))
        .withColumn("__h", F.abs(F.hash(F.col("__cv").cast("string"), F.lit(seed))))
        .orderBy("__h")
        .limit(n_cells)
        .withColumn("cell", F.monotonically_increasing_id())
        .select("cell", F.col("__cv").alias("centroid"))
    )
    cent_rows = cent.collect()  # n_cells rows — driver-tiny by design
    cell_ids = np.array([int(r["cell"]) for r in cent_rows], dtype=np.int64)
    cent_mat = np.stack(
        [np.asarray(r["centroid"], dtype=np.float64) for r in cent_rows]
    )  # n_cells x dim

    def _cells_norm(vec: Column, n: int) -> Column:
        """``struct(cells: array<long>, norm: double)`` — the ``n``
        nearest cells (by dot product, descending; ties by descending
        cell id, matching the previous reversed ``array_sort`` on
        (d, cell) structs) plus the L2 norm, from one batch matmul
        against the broadcast-size centroid matrix. The previous form
        evaluated ``n_cells`` interpreted ``aggregate`` dot expressions
        PER ROW (CodegenFallback — at 10⁹ corpus rows × 16 cells that
        dominates index build; the exact pattern NOTES measured 7.6×
        slower elsewhere, VERDICT r02 #4)."""
        from pyspark.sql.functions import pandas_udf

        cm, cids, nn = cent_mat, cell_ids, n

        def fn(v):
            if len(v) == 0:
                return pd.DataFrame(
                    {"cells": pd.Series([], dtype="object"),
                     "norm": pd.Series([], dtype="float64")}
                )
            m = np.stack(v.to_numpy()).astype(np.float64)
            dots = m @ cm.T  # |batch| x n_cells
            # primary: dot desc; secondary: cell id desc (lexsort's last
            # key is primary)
            order = np.lexsort((-cids[None, :].repeat(len(m), 0), -dots), axis=1)
            top = cids[order[:, :nn]]
            return pd.DataFrame(
                {"cells": list(top), "norm": np.linalg.norm(m, axis=1)}
            )

        fn.__annotations__ = {"v": pd.Series, "return": pd.DataFrame}
        return pandas_udf("struct<cells: array<long>, norm: double>")(fn)(vec)

    c = corpus.select(
        F.col(corpus_id).alias("neighbor_id"),
        F.col(vec_col).alias("__cv"),
        _cells_norm(F.col(vec_col), 1).alias("__cn_s"),
    ).select(
        "neighbor_id",
        "__cv",
        F.col("__cn_s.norm").alias("__cn"),
        F.col("__cn_s.cells")[0].alias("cell"),
    )
    q = queries.select(
        F.col(query_id).alias("query_id"),
        F.col(vec_col).alias("__qv"),
        _cells_norm(F.col(vec_col), nprobe).alias("__qn_s"),
    ).select(
        "query_id",
        "__qv",
        F.col("__qn_s.norm").alias("__qn"),
        F.explode(F.col("__qn_s.cells")).alias("cell"),
    )
    pairs = c.join(q, on="cell")
    if exclude_self:
        pairs = pairs.filter(F.col("query_id") != F.col("neighbor_id"))
    sim = pairs.withColumn(
        "cosine",
        F.round(pair_dot(F.col("__qv"), F.col("__cv")) / (F.col("__qn") * F.col("__cn")), 6),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    # no distinct: each corpus row lives in exactly ONE cell (nprobe=1
    # above), so the cell equi-join yields each (query, neighbor) pair at
    # most once even when the query probes several cells — a distinct
    # here would only re-shuffle the already-k-sized output
    return (
        sim.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def embedding_dup_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 6,
    dim: int = 64,
    seed: int = 42,
    exact: bool = False,
    max_exact_rows: int = 1_000_000,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (cosine ≥ threshold).

    ``exact`` does the all-pairs O(N²) scan (small N / verification);
    default blocks by LSH bucket first (near-dup pairs almost surely
    agree on all sign bits when threshold is high)."""
    if exact:
        # broadcast the full corpus matrix; each Arrow batch computes a
        # block x corpus BLAS matmul and emits only threshold-passing
        # pairs — O(n) Arrow traffic instead of the n^2/2 pair table.
        # Exact mode requires a corpus that fits a broadcast — ENFORCED,
        # not advisory: a silent driver collect of a 10^9-row corpus is
        # the failure mode this guard exists to prevent.
        n = df.count()
        if n > max_exact_rows:
            raise ValueError(
                f"embedding_dup_pairs(exact=True) on {n} rows exceeds "
                f"max_exact_rows={max_exact_rows}; use exact=False (LSH-"
                "blocked, scales linearly) or raise max_exact_rows "
                "deliberately"
            )
        rows = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v")).collect()
        ids = np.array([r["id"] for r in rows])
        mat = np.stack([np.asarray(r["v"], dtype=np.float64) for r in rows])
        norm = np.linalg.norm(mat, axis=1)
        sc = df.sparkSession.sparkContext
        ball = sc.broadcast((ids, mat, norm))
        thr = threshold

        from pyspark.sql import types as T

        id_type = df.schema[id_col].dataType
        out_schema = T.StructType(
            [
                T.StructField("id_a", id_type),
                T.StructField("id_b", id_type),
                T.StructField("cosine", T.DoubleType()),
            ]
        )

        def score(batches):
            ids_, mat_, norm_ = ball.value
            for pdf in batches:
                if pdf.empty:
                    continue
                bm = np.stack(pdf["v"].to_numpy()).astype(np.float64)
                bn = np.linalg.norm(bm, axis=1)
                bids = pdf["id"].to_numpy()
                sims = np.round((bm @ mat_.T) / np.outer(bn, norm_), 6)
                ii, jj = np.nonzero((sims >= thr) & (bids[:, None] < ids_[None, :]))
                yield pd.DataFrame(
                    {"id_a": bids[ii], "id_b": ids_[jj], "cosine": sims[ii, jj]}
                )

        return (
            df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
            .mapInPandas(score, out_schema)
        )

    planes = _hyperplanes(dim, n_planes, seed)
    # signature + norm from ONE batch pass per side (the interpreted
    # higher-order _norm next to a vectorized signature was the r02
    # CodegenFallback regression, VERDICT r02 #3)
    a = df.select(
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("__va"),
        lsh_sig_norm(F.col(vec_col), planes).alias("__sn"),
    ).select(
        "id_a", "__va",
        F.col("__sn.norm").alias("__na"),
        F.col("__sn.sig").alias("__bucket"),
    )
    b = df.select(
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("__vb"),
        lsh_sig_norm(F.col(vec_col), planes).alias("__sn"),
    ).select(
        "id_b", "__vb",
        F.col("__sn.norm").alias("__nb"),
        F.col("__sn.sig").alias("__bucket"),
    )
    pairs = a.join(b, on="__bucket").filter(F.col("id_a") < F.col("id_b"))
    return (
        pairs.withColumn(
            "cosine",
            F.round(
                pair_dot(F.col("__va"), F.col("__vb")) / (F.col("__na") * F.col("__nb")), 6
            ),
        )
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )
