"""Deterministic sampling, mixture weighting, sequence packing."""

import numpy as np
import pandas as pd

from pyspark.sql import functions as F

from feast_spark import datagen
from feast_spark.pipeline.sampling import (
    deterministic_sample,
    mixture_weights,
    pack_sequences,
    stratified_sample,
)


def test_deterministic_sample_stable_and_sized(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    a = deterministic_sample(docs, 0.3).toPandas()
    b = deterministic_sample(docs, 0.3).toPandas()
    assert sorted(a["doc_id"]) == sorted(b["doc_id"])  # rerun-stable
    assert 0.2 < len(a) / docs.count() < 0.4
    # different salt -> different (roughly independent) sample
    c = deterministic_sample(docs, 0.3, salt="v2").toPandas()
    assert sorted(c["doc_id"]) != sorted(a["doc_id"])
    # nested: sample(0.3) ⊇ sample(0.1) (threshold monotonicity)
    d = deterministic_sample(docs, 0.1).toPandas()
    assert set(d["doc_id"]) <= set(a["doc_id"])


def test_stratified_sample_and_mixture(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    counts = {r["source"]: r["count"] for r in docs.groupBy("source").count().collect()}
    s0, s1 = sorted(counts)[:2]
    fracs = mixture_weights(counts, {s0: 0.5, s1: 0.5}, total=40)
    got = stratified_sample(docs, "source", fracs).toPandas()
    assert set(got["source"]) <= {s0, s1}
    assert 20 <= len(got) <= 50  # ~40 targeted (25 docs/stratum, 0.8 frac)
    # oversampling impossible without replication: capped at stratum size
    fr2 = mixture_weights(counts, {s0: 1.0}, total=10_000)
    assert fr2[s0] == 1.0


def test_pack_sequences_invariants(spark):
    pdf = datagen.token_sequences(n_docs=40, versions_per_doc=3, seed=12)
    df = datagen.to_spark(spark, pdf)
    blocks = pack_sequences(df, block_tokens=512).toPandas()
    # token conservation
    assert blocks["n_tokens"].sum() == pdf["n_tok"].sum()
    assert blocks["n_docs"].sum() == len(pdf)
    # budget: every multi-doc block fits; only single oversized docs may exceed
    over = blocks[blocks["n_tokens"] > 512]
    assert (over["n_docs"] == 1).all()
    # tokens actually concatenated
    assert (blocks["tokens"].map(len) == blocks["n_tokens"]).all()
    # per-stream deterministic order: block_ids contiguous from 0
    for src, grp in blocks.groupby("source"):
        assert sorted(grp["block_id"]) == list(range(len(grp)))
    # determinism across runs
    blocks2 = pack_sequences(df, block_tokens=512).toPandas()
    a = blocks.sort_values(["source", "block_id"]).reset_index(drop=True)
    b = blocks2.sort_values(["source", "block_id"]).reset_index(drop=True)
    assert a["n_tokens"].tolist() == b["n_tokens"].tolist()
    assert all(list(x) == list(y) for x, y in zip(a["tokens"], b["tokens"]))


def test_leakage_safe_split(spark):
    docs = spark.range(0, 200).selectExpr("id as doc_id")
    # near-dup pairs: 50 chains of 2 docs (i, i+100)
    pairs = spark.range(0, 50).selectExpr("id as id_a", "id + 100 as id_b")
    got = (
        __import__("feast_spark.pipeline.sampling", fromlist=["leakage_safe_split"])
        .leakage_safe_split(docs, pairs, test_frac=0.3)
        .toPandas()
    )
    assert len(got) == 200
    # no near-dup pair straddles the split
    m = got.set_index("doc_id")["split"]
    for i in range(50):
        assert m[i] == m[i + 100], i
    # both sides populated, roughly 30% test
    frac = (got["split"] == "test").mean()
    assert 0.15 < frac < 0.45
    # deterministic
    got2 = (
        __import__("feast_spark.pipeline.sampling", fromlist=["leakage_safe_split"])
        .leakage_safe_split(docs, pairs, test_frac=0.3)
        .toPandas()
    )
    assert got.sort_values("doc_id")["split"].tolist() == got2.sort_values("doc_id")["split"].tolist()


def test_replicated_sample_multiplicity(spark):
    from feast_spark.pipeline.sampling import replicated_sample

    docs_df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    n = docs_df.count()
    # integer factor: exact multiplicity, copy_idx 0..k-1
    out2 = replicated_sample(docs_df, 2.0)
    assert out2.count() == 2 * n
    assert out2.groupBy("doc_id").count().filter("count != 2").count() == 0
    # fractional factor: between floor and ceil, deterministic across runs
    out = replicated_sample(docs_df, 1.4)
    c1 = out.count()
    assert n <= c1 <= 2 * n
    assert replicated_sample(docs_df, 1.4).count() == c1
    # factor < 1 drops rows deterministically (0 copies)
    half = replicated_sample(docs_df, 0.5).count()
    assert 0 < half < n
    # zero factor -> empty
    assert replicated_sample(docs_df, 0.0).count() == 0


def test_chunk_sequences_coverage_and_overlap(spark):
    import pandas as pd
    import pytest

    from feast_spark.pipeline.sampling import chunk_sequences

    pdf = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "tokens": [
                list(range(100)),  # multi-chunk
                list(range(10)),   # single short chunk
                list(range(32)),   # exactly max_len -> one chunk
                [],                # empty -> no rows
            ],
        }
    )
    df = spark.createDataFrame(pdf, "doc_id long, tokens array<int>")
    out = chunk_sequences(df, max_len=32, overlap=8, n_tok_col=None).toPandas()
    assert set(out[out["id"] == 4]["chunk_idx"]) == set()
    assert list(out[out["id"] == 2]["chunk_len"]) == [10]
    assert list(out[out["id"] == 3]["chunk_len"]) == [32]
    g = out[out["id"] == 1].sort_values("chunk_idx")
    # stride 24: starts 0,24,48,72 -> 4 chunks; tail covered
    assert list(g["chunk_idx"]) == [0, 1, 2, 3]
    toks = [list(c) for c in g["chunk_tokens"]]
    assert toks[0][:5] == [0, 1, 2, 3, 4]
    assert toks[1][0] == 24  # overlap of 8 with chunk 0 (24..31 shared)
    assert toks[0][-8:] == toks[1][:8]  # boundary tokens appear twice
    covered = sorted({t for c in toks for t in c})
    assert covered == list(range(100))  # every token in >= 1 chunk
    assert toks[-1][-1] == 99  # tail reached

    with pytest.raises(ValueError, match="overlap"):
        chunk_sequences(df, max_len=8, overlap=8)
