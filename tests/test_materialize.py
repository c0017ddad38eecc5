"""Materialization: pull_latest semantics, manifest lineage metrics,
idempotent crash-resume."""

import pandas as pd
import pytest

from feast_spark import datagen
from feast_spark.materialize.jobs import (
    MaterializationManifest,
    materialize_view,
    pull_latest,
    read_materialized,
)


@pytest.fixture(scope="module")
def feats(spark):
    pdf = datagen.token_sequences(n_docs=40, versions_per_doc=4, seed=5)
    return datagen.to_spark(spark, pdf), pdf


def test_pull_latest(spark, feats):
    df, pdf = feats
    start, end = pd.Timestamp("2024-01-02"), pd.Timestamp("2024-01-09")
    got = pull_latest(df, ["doc_id"], "event_timestamp", "created", start, end).toPandas()
    p = pdf.copy()
    p["event_timestamp"] = p["event_timestamp"].dt.tz_localize(None)
    p["created"] = p["created"].dt.tz_localize(None)
    win = p[(p.event_timestamp >= start) & (p.event_timestamp <= end)]
    exp = (
        win.sort_values(["event_timestamp", "created"], kind="mergesort")
        .groupby("doc_id")
        .tail(1)
    )
    assert len(got) == len(exp)
    m = got.set_index("doc_id")["n_tok"].to_dict()
    for _, r in exp.iterrows():
        assert m[r.doc_id] == r.n_tok


def test_materialize_resume(spark, feats, tmp_path):
    df, _ = feats
    out = str(tmp_path / "mat")
    # first run crashes partway
    with pytest.raises(RuntimeError, match="injected failure"):
        materialize_view(
            spark,
            df,
            out,
            ["doc_id"],
            created_col="created",
            chunk_days=1,
            fail_after_partition="2024-01-03",
        )
    manifest = MaterializationManifest(out)
    done_after_crash = manifest.completed()
    assert done_after_crash, "some partitions committed before the crash"

    # resume: completed partitions are skipped, remainder written
    res = materialize_view(spark, df, out, ["doc_id"], created_col="created")
    assert set(res.skipped) == done_after_crash
    assert res.written and not (set(res.written) & done_after_crash)

    # third run is a full no-op
    res2 = materialize_view(spark, df, out, ["doc_id"], created_col="created")
    assert not res2.written and set(res2.skipped) == manifest.completed()

    # lineage metrics: manifest row counts match what is on disk
    metrics = manifest.metrics()
    stored = read_materialized(spark, out)
    assert metrics["rows"] == stored.count()
    assert metrics["bytes"] > 0
    # per-day latest snapshot: at most one row per (doc_id, day)
    dup = (
        stored.groupBy("doc_id", "day").count().filter("count > 1").count()
    )
    assert dup == 0
