"""FeatureStore API: multi-view PIT retrieval vs oracle, full feature
names, ODFV transforms, aggregation specs, entity mapping, derived
views, error paths."""

from datetime import timedelta

import numpy as np
import pandas as pd
import pytest

from pyspark.sql import functions as F

from feast_spark import datagen
from feast_spark.core.feature_view import (
    Aggregation,
    Entity,
    FeatureService,
    FeatureView,
    Field,
    OnDemandFeatureView,
)
from feast_spark.core.source import DataFrameSource
from feast_spark.core.store import FeatureStore
from tests.oracle import expected_pit_df


@pytest.fixture(scope="module")
def fixtures(spark):
    seqs = datagen.token_sequences(n_docs=50, versions_per_doc=4, seed=7)
    stats = datagen.doc_stats(n_docs=50, hours=48, seed=13)
    glob = datagen.global_stats(days=14, seed=17)
    spine = datagen.entity_spine(seqs, n_rows=120, seed=11)
    store = FeatureStore(spark)
    store.apply(
        [
            FeatureView(
                name="sequences",
                source=DataFrameSource(
                    df=datagen.to_spark(spark, seqs),
                    created_timestamp_column="created",
                ),
                entities=[Entity("doc_id")],
                ttl=timedelta(days=3),
            ),
            FeatureView(
                name="stats",
                source=DataFrameSource(
                    df=datagen.to_spark(spark, stats),
                    created_timestamp_column="created",
                ),
                entities=[Entity("doc_id")],
                ttl=None,
            ),
            FeatureView(
                name="globals",
                source=DataFrameSource(
                    df=datagen.to_spark(spark, glob),
                    created_timestamp_column="created",
                ),
                entities=[],
                ttl=None,
            ),
        ]
    )
    return store, spine, seqs, stats, glob


def _naive(s):
    return pd.to_datetime(s, utc=True).dt.tz_localize(None)


def test_multi_view_retrieval_matches_oracle(spark, fixtures):
    store, spine, seqs, stats, glob = fixtures
    job = store.get_historical_features(
        datagen.to_spark(spark, spine),
        ["sequences:n_tok", "stats:quality_score", "globals:total_docs"],
    )
    got = job.to_df()
    assert len(got) == len(spine)

    sp = spine.copy()
    sp["event_timestamp"] = _naive(sp["event_timestamp"])
    sq = seqs.copy()
    sq["event_timestamp"] = _naive(sq["event_timestamp"])
    sq["created"] = _naive(sq["created"])
    exp1 = expected_pit_df(
        sp, sq, ["doc_id"], created_col="created",
        ttl_seconds=3 * 86400, feature_cols=["n_tok"],
    )
    st = stats.copy()
    st["event_timestamp"] = _naive(st["event_timestamp"])
    st["created"] = _naive(st["created"])
    exp2 = expected_pit_df(
        sp, st, ["doc_id"], created_col="created", feature_cols=["quality_score"]
    )

    key = ["doc_id", "event_timestamp"]
    g = got.sort_values(key, kind="mergesort").reset_index(drop=True)
    e1 = exp1.sort_values(key, kind="mergesort").reset_index(drop=True)
    e2 = exp2.sort_values(key, kind="mergesort").reset_index(drop=True)
    assert np.allclose(
        g["n_tok"].astype(float).fillna(-1), e1["n_tok"].astype(float).fillna(-1)
    )
    assert np.allclose(
        g["quality_score"].astype(float).fillna(-1),
        e2["quality_score"].astype(float).fillna(-1),
        rtol=1e-6,
    )
    # entityless view: every spine row at/after the first global row gets a value
    gl_min = _naive(glob["event_timestamp"]).min()
    has = g[g["event_timestamp"] >= gl_min]
    assert has["total_docs"].notna().all()


def test_full_feature_names(spark, fixtures):
    store, spine, *_ = fixtures
    got = store.get_historical_features(
        datagen.to_spark(spark, spine.head(20)),
        ["sequences:n_tok", "stats:quality_score"],
        full_feature_names=True,
    ).to_df()
    assert "sequences__n_tok" in got.columns
    assert "stats__quality_score" in got.columns


def test_odfv(spark, fixtures):
    store, spine, *_ = fixtures

    def plus100(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"quality_plus_100": pdf["quality_score"] + 100.0})

    store.apply(
        OnDemandFeatureView(
            name="adjusted",
            udf=plus100,
            schema=[Field("quality_plus_100", "double")],
        )
    )
    got = store.get_historical_features(
        datagen.to_spark(spark, spine.head(30)),
        ["stats:quality_score", "adjusted:quality_plus_100"],
    ).to_df()
    m = got["quality_plus_100"].notna()
    assert np.allclose(
        got.loc[m, "quality_plus_100"], got.loc[m, "quality_score"].astype(float) + 100.0
    )


def test_odfv_missing_request_col_raises(spark, fixtures):
    store, spine, *_ = fixtures
    store.apply(
        OnDemandFeatureView(
            name="needs_req",
            udf=lambda pdf: pd.DataFrame({"x": pdf["not_there"]}),
            schema=[Field("x", "double")],
            request_schema=[Field("not_there", "double")],
        )
    )
    with pytest.raises(ValueError, match="request column"):
        store.get_historical_features(
            datagen.to_spark(spark, spine.head(5)), ["needs_req:x"]
        )


def test_aggregation_spec(spark, fixtures):
    store, spine, seqs, *_ = fixtures
    view = FeatureView(
        name="seq_agg",
        source=DataFrameSource(
            df=datagen.to_spark(spark, seqs), created_timestamp_column="created"
        ),
        entities=[Entity("doc_id")],
        aggregations=[
            Aggregation("n_tok", "sum", timedelta(hours=24)),
            Aggregation("n_tok", "count", timedelta(hours=24)),
        ],
    )
    store.apply(view)
    got = store.get_historical_features(
        datagen.to_spark(spark, spine), ["seq_agg"]
    ).to_df()
    assert "sum_n_tok_86400s" in got.columns and "count_n_tok_86400s" in got.columns
    # oracle: latest closed 24h window before each spine ts
    sq = seqs.copy()
    sq["event_timestamp"] = _naive(sq["event_timestamp"])
    sq["bucket_end"] = sq["event_timestamp"].map(
        lambda t: pd.Timestamp((int(t.timestamp()) // 86400 + 1) * 86400, unit="s")
    )
    wins = (
        sq.groupby(["doc_id", "bucket_end"])["n_tok"].agg(["sum", "count"]).reset_index()
    )
    sp = spine.copy()
    sp["event_timestamp"] = _naive(sp["event_timestamp"])
    g = got.sort_values(["doc_id", "event_timestamp"], kind="mergesort").reset_index(drop=True)
    checked = 0
    for _, r in g.iterrows():
        cand = wins[
            (wins.doc_id == r.doc_id) & (wins.bucket_end <= r.event_timestamp)
        ]
        if len(cand):
            best = cand.sort_values("bucket_end").iloc[-1]
            assert r["sum_n_tok_86400s"] == best["sum"], (r.doc_id, r.event_timestamp)
            checked += 1
        else:
            assert pd.isna(r["sum_n_tok_86400s"])
    assert checked > 10


def test_entity_mapping(spark, fixtures):
    store, spine, *_ = fixtures
    base = store.get_feature_view("stats")
    renamed = store.with_join_key_map(base, {"doc_id": "origin_id"}, name="origin_stats")
    store.apply(renamed)
    sp = spine.head(20).rename(columns={"doc_id": "origin_id"})
    got = store.get_historical_features(
        datagen.to_spark(spark, sp), ["origin_stats:view_count"]
    ).to_df()
    assert "view_count" in got.columns and len(got) == len(sp)


def test_feature_service(spark, fixtures):
    store, spine, *_ = fixtures
    store.apply(FeatureService(name="svc", features=["sequences:n_tok"]))
    got = store.get_historical_features(
        datagen.to_spark(spark, spine.head(10)), store._services["svc"]
    ).to_df()
    assert "n_tok" in got.columns


def test_derived_view(spark, fixtures):
    store, spine, seqs, *_ = fixtures
    parent = store.get_feature_view("sequences")

    def double_tok(df):
        return df.withColumn("n_tok2", F.col("n_tok") * 2).select(
            "doc_id", "event_timestamp", "created", "n_tok2"
        )

    child = FeatureView(
        name="seq_derived",
        source=DataFrameSource(df=None, created_timestamp_column="created"),
        entities=[Entity("doc_id")],
        source_views=[parent],
        udf=double_tok,
        ttl=timedelta(days=3),
    )
    store.apply(child)
    got = store.get_historical_features(
        datagen.to_spark(spark, spine),
        ["sequences:n_tok", "seq_derived:n_tok2"],
    ).to_df()
    m = got["n_tok2"].notna()
    assert m.any()
    assert np.array_equal(
        got.loc[m, "n_tok2"].astype(int), got.loc[m, "n_tok"].astype(int) * 2
    )


def test_store_materialize_and_persist(spark, fixtures, tmp_path):
    store, spine, seqs, *_ = fixtures
    out = str(tmp_path / "mat_store")
    res = store.materialize("sequences", out)
    assert res.rows > 0 and res.written
    # idempotent rerun
    res2 = store.materialize("sequences", out)
    assert not res2.written

    job = store.get_historical_features(
        datagen.to_spark(spark, spine.head(10)), ["sequences:n_tok"]
    )
    job.persist("saved_training_set")
    assert spark.sql("select count(*) from saved_training_set").first()[0] == 10
    staged = str(tmp_path / "staged")
    job.to_remote_storage(staged)
    assert spark.read.parquet(staged).count() == 10


def test_sorted_view_materialization(spark, fixtures, tmp_path):
    from feast_spark.core.feature_view import SortedFeatureView

    store, _, seqs, *_ = fixtures
    view = SortedFeatureView(
        name="seq_sorted",
        source=DataFrameSource(
            df=datagen.to_spark(spark, seqs), created_timestamp_column="created"
        ),
        entities=[Entity("doc_id")],
        sort_keys=[("doc_id", "ASC"), ("event_timestamp", "DESC")],
    )
    store.apply(view)
    out = str(tmp_path / "sorted_view")
    store.materialize("seq_sorted", out)
    back = spark.read.parquet(out)
    # no dedup: every source row written
    assert back.count() == len(seqs)
    chk = back.select("doc_id", "event_timestamp", F.spark_partition_id().alias("p")).toPandas()
    for (_, _), grp in chk.groupby(["p", "doc_id"]):
        ts = grp["event_timestamp"].values
        assert (ts[:-1] >= ts[1:]).all()


def test_sql_string_entity_df(spark, fixtures):
    """Reference parity: the spine can be a SQL string."""
    store, spine, *_ = fixtures
    datagen.to_spark(spark, spine.head(15)).createOrReplaceTempView("spine_view")
    got = store.get_historical_features(
        "SELECT doc_id, event_timestamp FROM spine_view",
        ["sequences:n_tok"],
    ).to_df()
    assert len(got) == 15 and "n_tok" in got.columns


def test_odfv_with_request_data(spark, fixtures):
    """ODFV combining a retrieved feature with a request-time column
    (reference RequestSource, data_source.py:588)."""
    store, spine, *_ = fixtures

    def combine(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"boosted": pdf["quality_score"].astype(float) * pdf["boost"]}
        )

    store.apply(
        OnDemandFeatureView(
            name="boosted_view",
            udf=combine,
            schema=[Field("boosted", "double")],
            request_schema=[Field("boost", "double")],
        )
    )
    req = spine.head(20).copy()
    req["boost"] = 2.0
    got = store.get_historical_features(
        datagen.to_spark(spark, req),
        ["stats:quality_score", "boosted_view:boosted"],
    ).to_df()
    m = got["boosted"].notna()
    assert np.allclose(
        got.loc[m, "boosted"], got.loc[m, "quality_score"].astype(float) * 2.0
    )
