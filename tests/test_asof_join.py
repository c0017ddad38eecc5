"""PIT/as-of join correctness vs the brute-force oracle, both physical
strategies, on the BASELINE.json-shaped token-sequence data.

Checks (per BASELINE.md correctness baseline): zero temporal leakage,
TTL expiry, latest-before + created tie-break (backfill), left-join NULL
preservation, exact token-array equality per row.
"""

import numpy as np
import pandas as pd
import pytest

from feast_spark import datagen
from feast_spark.operators.asof_join import point_in_time_join
from tests.oracle import expected_pit_df

TTL = 3 * 24 * 3600  # 3 days


@pytest.fixture(scope="module")
def data(spark):
    feats = datagen.token_sequences(n_docs=60, versions_per_doc=5, seed=7)
    spine = datagen.entity_spine(feats, n_rows=150, seed=11)
    return (
        datagen.to_spark(spark, spine),
        datagen.to_spark(spark, feats),
        spine,
        feats,
    )


def _normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    out = pdf.copy()
    out["tokens"] = out["tokens"].map(
        lambda a: None if a is None or (isinstance(a, float) and np.isnan(a)) else tuple(int(x) for x in a)
    )
    out["n_tok"] = out["n_tok"].astype("float64")
    for c in ("event_timestamp",):
        out[c] = pd.to_datetime(out[c]).dt.tz_localize(None) if out[c].dt.tz is not None else out[c]
    return out.sort_values(["doc_id", "event_timestamp", "n_tok"], kind="mergesort").reset_index(
        drop=True
    )


def _expected(spine_pd, feats_pd, ttl):
    exp = expected_pit_df(
        spine_pd,
        feats_pd,
        ["doc_id"],
        created_col="created",
        ttl_seconds=ttl,
        feature_cols=["tokens", "n_tok", "source"],
    )
    exp["event_timestamp"] = pd.to_datetime(exp["event_timestamp"], utc=True).dt.tz_localize(None)
    return _normalize(exp)


@pytest.mark.parametrize("strategy", ["join_dedup", "merge_asof", "broadcast"])
@pytest.mark.parametrize("ttl", [TTL, None])
def test_pit_join_matches_oracle(spark, data, strategy, ttl):
    spine_df, feats_df, spine_pd, feats_pd = data
    got = point_in_time_join(
        spine_df,
        feats_df,
        ["doc_id"],
        ["tokens", "n_tok", "source"],
        created_col="created",
        ttl_seconds=ttl,
        strategy=strategy,
    ).toPandas()
    assert len(got) == len(spine_pd), "spine multiplicity must be preserved"
    exp = _expected(spine_pd, feats_pd, ttl)
    gotn = _normalize(got)
    pd.testing.assert_frame_equal(
        gotn[["doc_id", "event_timestamp", "tokens", "n_tok", "source"]],
        exp[["doc_id", "event_timestamp", "tokens", "n_tok", "source"]],
        check_dtype=False,
    )


def test_no_temporal_leakage(spark, data):
    spine_df, feats_df, *_ = data
    got = point_in_time_join(
        spine_df,
        feats_df,
        ["doc_id"],
        ["n_tok"],
        created_col="created",
        ttl_seconds=None,
        include_feature_ts=True,
    ).toPandas()
    joined = got.dropna(subset=["__feature_ts"])
    assert (joined["__feature_ts"] <= joined["event_timestamp"]).all()


def test_ttl_expiry(spark, data):
    spine_df, feats_df, *_ = data
    got = point_in_time_join(
        spine_df,
        feats_df,
        ["doc_id"],
        ["n_tok"],
        created_col="created",
        ttl_seconds=3600,
        include_feature_ts=True,
    ).toPandas()
    joined = got.dropna(subset=["__feature_ts"])
    gap = (joined["event_timestamp"] - joined["__feature_ts"]).dt.total_seconds()
    assert (gap <= 3600).all() and (gap >= 0).all()


def test_unknown_keys_yield_nulls(spark, data):
    spine_df, feats_df, spine_pd, _ = data
    got = point_in_time_join(
        spine_df, feats_df, ["doc_id"], ["n_tok"], created_col="created"
    ).toPandas()
    ghosts = got[got["doc_id"].str.startswith("ghost_")]
    assert len(ghosts) == (spine_pd["doc_id"].str.startswith("ghost_")).sum()
    assert ghosts["n_tok"].isna().all()


def test_backfill_created_tiebreak(spark):
    """Reference backfill test semantics
    (test_universal_historical_retrieval.py:546-641): same event_ts twice
    → row with later created wins; later event_ts with earlier created
    still wins on event_ts."""
    ts = pd.Timestamp("2024-01-05")
    feats = pd.DataFrame(
        {
            "doc_id": ["a", "a", "a", "a"],
            "event_timestamp": [ts, ts, ts + pd.Timedelta(hours=1), ts + pd.Timedelta(hours=1)],
            "created": [
                ts + pd.Timedelta(hours=5),
                ts + pd.Timedelta(hours=9),  # later created wins at same ets
                ts + pd.Timedelta(hours=2),
                ts + pd.Timedelta(hours=1),
            ],
            "val": [1, 2, 3, 4],
        }
    )
    spine = pd.DataFrame(
        {
            "doc_id": ["a", "a"],
            "event_timestamp": [ts + pd.Timedelta(minutes=30), ts + pd.Timedelta(hours=2)],
        }
    )
    sdf, fdf = datagen.to_spark(spark, spine), datagen.to_spark(spark, feats)
    for strategy in ("join_dedup", "merge_asof"):
        got = (
            point_in_time_join(
                sdf, fdf, ["doc_id"], ["val"], created_col="created", strategy=strategy
            )
            .toPandas()
            .sort_values("event_timestamp")
        )
        assert got["val"].tolist() == [2, 3], strategy


def test_entityless_view(spark):
    ts = pd.Timestamp("2024-01-05")
    feats = pd.DataFrame(
        {
            "event_timestamp": [ts, ts + pd.Timedelta(days=1)],
            "created": [ts, ts + pd.Timedelta(days=1)],
            "total": [10, 20],
        }
    )
    spine = pd.DataFrame(
        {
            "doc_id": ["x", "y"],
            "event_timestamp": [ts + pd.Timedelta(hours=1), ts + pd.Timedelta(days=2)],
        }
    )
    sdf, fdf = datagen.to_spark(spark, spine), datagen.to_spark(spark, feats)
    for strategy in ("join_dedup", "merge_asof"):
        got = (
            point_in_time_join(
                sdf, fdf, [], ["total"], created_col="created", strategy=strategy
            )
            .toPandas()
            .sort_values("doc_id")
        )
        assert got["total"].tolist() == [10, 20], strategy


def test_composite_key_pit(spark):
    """PIT join on two join keys (entity composite), both strategies."""
    ts = pd.Timestamp("2024-01-05")
    feats = pd.DataFrame(
        {
            "tenant": ["t1", "t1", "t2", "t2"],
            "doc_id": ["a", "a", "a", "b"],
            "event_timestamp": [ts, ts + pd.Timedelta(hours=1)] * 2,
            "created": [ts] * 4,
            "val": [1, 2, 3, 4],
        }
    )
    spine = pd.DataFrame(
        {
            "tenant": ["t1", "t2", "t2", "t3"],
            "doc_id": ["a", "a", "b", "a"],
            "event_timestamp": [ts + pd.Timedelta(hours=2)] * 4,
        }
    )
    sdf, fdf = datagen.to_spark(spark, spine), datagen.to_spark(spark, feats)
    for strategy in ("join_dedup", "merge_asof", "broadcast"):
        got = (
            point_in_time_join(
                sdf, fdf, ["tenant", "doc_id"], ["val"],
                created_col="created", strategy=strategy,
            )
            .toPandas()
            .sort_values(["tenant", "doc_id"])
        )
        assert got["val"].fillna(-1).tolist() == [2, 3, 4, -1], strategy
