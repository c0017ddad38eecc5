"""The reference's ``test_universal_historical_retrieval`` correctness
suite, scenario-for-scenario (sdk/python/tests/integration/offline_store/
test_universal_historical_retrieval.py) — the north-star contract:
zero temporal leakage, latest-before semantics, TTL expiry, created
tie-breaks, with allclose feature equality and EXACT token-array
equality per row against the brute-force pandas oracle
(tests/oracle.py, a port of feature_records.py:23-47).

Each test names and cites its reference counterpart. Scenarios whose
mechanics are exercised in more depth elsewhere (ODFV request errors,
persisting) still get a row here so the suite maps 1:1.
"""

from datetime import timedelta

import numpy as np
import pandas as pd
import pytest

from pyspark.sql import functions as F

from feast_spark import datagen
from feast_spark.core.feature_view import Entity, FeatureView, Field, OnDemandFeatureView
from feast_spark.core.source import DataFrameSource
from feast_spark.core.store import FeatureStore
from tests.oracle import expected_pit_df


def _naive(s):
    return pd.to_datetime(s, utc=True).dt.tz_localize(None)


def _assert_frame_matches_oracle(got, exp, float_cols=(), array_cols=(), key=None):
    """allclose on float features, EXACT equality on token arrays."""
    key = key or ["doc_id", "event_timestamp"]
    g = got.sort_values(key, kind="mergesort").reset_index(drop=True)
    e = exp.sort_values(key, kind="mergesort").reset_index(drop=True)
    assert len(g) == len(e)
    for c in float_cols:
        a = g[c].astype(float).to_numpy()
        b = e[c].astype(float).to_numpy()
        assert np.allclose(a, b, equal_nan=True), c
    for c in array_cols:
        for x, y in zip(g[c], e[c]):
            if y is None or (isinstance(y, float) and pd.isna(y)):
                assert x is None or (isinstance(x, float) and pd.isna(x)), c
            else:
                assert list(x) == list(y), c  # EXACT token-array equality


@pytest.fixture(scope="module")
def seqs():
    return datagen.token_sequences(n_docs=40, versions_per_doc=4, seed=21)


@pytest.fixture(scope="module")
def spine(seqs):
    return datagen.entity_spine(seqs, n_rows=100, seed=22)


def _store_with(spark, seqs, *, ttl=timedelta(days=3), name="sequences", field_mapping=None):
    store = FeatureStore(spark)
    src = DataFrameSource(
        df=datagen.to_spark(spark, seqs), created_timestamp_column="created"
    )
    if field_mapping:
        src.field_mapping = field_mapping
    store.apply(
        [
            FeatureView(
                name=name,
                source=src,
                entities=[Entity("doc_id")],
                ttl=ttl,
            )
        ]
    )
    return store


def test_historical_features_main(spark, seqs, spine):
    """Reference :53 ``test_historical_features_main``: full-row PIT
    retrieval vs the brute-force oracle — allclose floats, exact token
    arrays, NULL rows preserved for spine entries with no candidate."""
    store = _store_with(spark, seqs)
    got = store.get_historical_features(
        spine, ["sequences:tokens", "sequences:n_tok"]
    ).to_df()
    exp = expected_pit_df(
        spine, seqs, ["doc_id"], created_col="created",
        ttl_seconds=3 * 86400, feature_cols=["tokens", "n_tok"],
    )
    got["event_timestamp"] = _naive(got["event_timestamp"])
    _assert_frame_matches_oracle(
        got, exp, float_cols=["n_tok"], array_cols=["tokens"]
    )
    # zero temporal leakage: re-join with include_feature_ts and check
    # every matched feature ts <= its spine ts
    from feast_spark.operators.asof_join import point_in_time_join

    chk = point_in_time_join(
        datagen.to_spark(spark, spine),
        datagen.to_spark(spark, seqs),
        ["doc_id"],
        ["n_tok"],
        created_col="created",
        ttl_seconds=3 * 86400,
        include_feature_ts=True,
    )
    leaked = chk.filter(F.col("__feature_ts") > F.col("event_timestamp")).count()
    assert leaked == 0


def test_historical_features_with_shared_batch_source(spark, seqs, spine):
    """Reference :204: two views over the SAME batch source retrieve
    independently and agree with the oracle."""
    store = FeatureStore(spark)
    src_df = datagen.to_spark(spark, seqs)
    for name, fields in (
        ("view_a", [Field("n_tok", "int")]),
        ("view_b", [Field("source", "string")]),
    ):
        store.apply(
            [
                FeatureView(
                    name=name,
                    source=DataFrameSource(df=src_df, created_timestamp_column="created"),
                    entities=[Entity("doc_id")],
                    ttl=timedelta(days=3),
                    schema=fields,
                )
            ]
        )
    got = store.get_historical_features(
        spine, ["view_a:n_tok", "view_b:source"]
    ).to_df()
    exp = expected_pit_df(
        spine, seqs, ["doc_id"], created_col="created",
        ttl_seconds=3 * 86400, feature_cols=["n_tok", "source"],
    )
    got["event_timestamp"] = _naive(got["event_timestamp"])
    _assert_frame_matches_oracle(got, exp, float_cols=["n_tok"])
    g = got.sort_values(["doc_id", "event_timestamp"]).reset_index(drop=True)
    e = exp.sort_values(["doc_id", "event_timestamp"]).reset_index(drop=True)
    assert (g["source"].fillna("∅") == e["source"].fillna("∅")).all()


def test_historical_features_with_missing_request_data(spark, seqs, spine):
    """Reference :244: an ODFV whose request column is absent from the
    entity df fails fast with a named error."""
    store = _store_with(spark, seqs)

    def adj(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"adj": pdf["n_tok"] * pdf["mult"]})

    store.apply(
        OnDemandFeatureView(
            name="odfv",
            udf=adj,
            schema=[Field("adj", "double")],
            request_schema=[Field("mult", "double")],
        )
    )
    with pytest.raises(ValueError, match="mult"):
        store.get_historical_features(spine, ["sequences:n_tok", "odfv:adj"]).to_df()


def test_historical_features_with_entities_from_query(spark, seqs, spine):
    """Reference :275: the entity df supplied as a SQL string."""
    store = _store_with(spark, seqs)
    datagen.to_spark(spark, spine).createOrReplaceTempView("spine_tbl")
    got = store.get_historical_features(
        "SELECT doc_id, event_timestamp FROM spine_tbl", ["sequences:n_tok"]
    ).to_df()
    exp = expected_pit_df(
        spine, seqs, ["doc_id"], created_col="created",
        ttl_seconds=3 * 86400, feature_cols=["n_tok"],
    )
    got["event_timestamp"] = _naive(got["event_timestamp"])
    _assert_frame_matches_oracle(got, exp, float_cols=["n_tok"])


def test_historical_features_persisting(spark, seqs, spine, tmp_path):
    """Reference :384: persisted retrieval (saved dataset) re-reads
    byte-identically."""
    from feast_spark.core.saved_dataset import load_saved_dataset, save_dataset

    store = _store_with(spark, seqs)
    job = store.get_historical_features(spine, ["sequences:n_tok", "sequences:tokens"])
    path = str(tmp_path / "sd")
    save_dataset(job.to_spark_df(), "hist_v1", path)
    back = load_saved_dataset(path).to_spark_df(spark).toPandas()
    direct = job.to_df()
    key = ["doc_id", "event_timestamp"]
    b = back.sort_values(key).reset_index(drop=True)
    d = direct.sort_values(key).reset_index(drop=True)
    assert np.allclose(
        b["n_tok"].astype(float), d["n_tok"].astype(float), equal_nan=True
    )
    for x, y in zip(b["tokens"], d["tokens"]):
        if y is None or (isinstance(y, float) and pd.isna(y)):
            assert x is None or (isinstance(x, float) and pd.isna(x))
        else:
            assert list(x) == list(y)


def test_historical_features_with_no_ttl(spark, seqs, spine):
    """Reference :473: ttl=None keeps arbitrarily old candidates (no
    lower bound)."""
    store = _store_with(spark, seqs, ttl=None)
    got = store.get_historical_features(spine, ["sequences:n_tok"]).to_df()
    exp = expected_pit_df(
        spine, seqs, ["doc_id"], created_col="created",
        ttl_seconds=None, feature_cols=["n_tok"],
    )
    got["event_timestamp"] = _naive(got["event_timestamp"])
    _assert_frame_matches_oracle(got, exp, float_cols=["n_tok"])
    # with-TTL run must have at least as many NULLs as without
    with_ttl = _store_with(spark, seqs).get_historical_features(
        spine, ["sequences:n_tok"]
    ).to_df()
    assert with_ttl["n_tok"].isna().sum() >= got["n_tok"].isna().sum()


def test_historical_features_containing_backfills(spark):
    """Reference :546: two rows share an event timestamp; the one with
    the LATER created timestamp (the backfill) wins."""
    ts = pd.Timestamp("2024-01-05 12:00:00")
    feats = pd.DataFrame(
        {
            "doc_id": ["d", "d"],
            "event_timestamp": [ts, ts],
            "created": [ts, ts + pd.Timedelta(hours=6)],  # backfill later
            "n_tok": [1, 2],
        }
    )
    spine = pd.DataFrame(
        {"doc_id": ["d"], "event_timestamp": [ts + pd.Timedelta(hours=1)]}
    )
    store = _store_with(spark, feats)
    got = store.get_historical_features(spine, ["sequences:n_tok"]).to_df()
    assert got["n_tok"].tolist() == [2]  # the backfilled row


def test_historical_features_field_mapping(spark, seqs, spine):
    """Reference :647: source columns renamed via field_mapping serve
    under their mapped names with identical values."""
    renamed = seqs.rename(columns={"n_tok": "raw_ntok"})
    store = _store_with(
        spark, renamed, field_mapping={"raw_ntok": "n_tok"}
    )
    got = store.get_historical_features(spine, ["sequences:n_tok"]).to_df()
    exp = expected_pit_df(
        spine, seqs, ["doc_id"], created_col="created",
        ttl_seconds=3 * 86400, feature_cols=["n_tok"],
    )
    got["event_timestamp"] = _naive(got["event_timestamp"])
    _assert_frame_matches_oracle(got, exp, float_cols=["n_tok"])
