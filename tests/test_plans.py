"""Plan-shape regression tests: the optimizations we rely on at scale
must actually appear in the physical plan — filter pushdown to the
parquet scan, broadcast joins for small sides, bounded shuffle counts
for the merge_asof path."""

from datetime import timedelta

import pytest

from pyspark.sql import functions as F

from feast_spark.core.feature_view import Entity, FeatureView
from feast_spark.core.source import ParquetSource
from feast_spark.core.store import FeatureStore
from feast_spark.operators.asof_join import point_in_time_join

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


@pytest.fixture(scope="module")
def ev(spark):
    return spark.read.parquet(f"{SF}/events.parquet")


def test_spine_bounds_push_into_scan(spark, ev):
    """FeatureStore pre-filters each feature scan to the spine window —
    the filter must reach the parquet reader (PushedFilters)."""
    store = FeatureStore(spark)
    store.apply(
        FeatureView(
            name="clicks",
            source=ParquetSource(f"{SF}/events.parquet", timestamp_field="ts"),
            entities=[Entity("user_id")],
            ttl=timedelta(days=7),
            udf=lambda df: df.filter(F.col("event_type") == "click"),
        )
    )
    spine = ev.filter("event_type = 'purchase'").select(
        "user_id", F.col("ts").alias("event_timestamp")
    )
    job = store.get_historical_features(spine, ["clicks:value"])
    # default maxMetadataStringLength truncates the PushedFilters list
    spark.conf.set("spark.sql.maxMetadataStringLength", "1000")
    try:
        plan = _plan(job.to_spark_df())
    finally:
        spark.conf.set("spark.sql.maxMetadataStringLength", "100")
    assert "PushedFilters" in plan
    # the ts window bounds derived from the spine must be pushed down
    assert "LessThanOrEqual(ts" in plan, plan[:2000]
    assert "GreaterThanOrEqual(ts" in plan


def test_broadcast_strategy_broadcasts(spark, ev):
    spine = ev.filter("event_type = 'purchase'").select(
        "user_id", F.col("ts").alias("event_timestamp")
    )
    feats = ev.filter("event_type = 'click'").select(
        "user_id", F.col("ts").alias("event_timestamp"), "value"
    )
    out = point_in_time_join(
        spine, feats, ["user_id"], ["value"], ttl_seconds=86400, strategy="broadcast"
    )
    assert "BroadcastHashJoin" in _plan(out)


def test_merge_asof_shuffle_count(spark, ev):
    """The scale path must shuffle each side exactly once (hash on the
    key bucket) + one for the row-id–free output — no hidden extra
    exchanges."""
    spine = ev.filter("event_type = 'purchase'").select(
        "user_id", F.col("ts").alias("event_timestamp")
    )
    feats = ev.filter("event_type = 'click'").select(
        "user_id", F.col("ts").alias("event_timestamp"), "value"
    )
    out = point_in_time_join(
        spine, feats, ["user_id"], ["value"], ttl_seconds=86400, strategy="merge_asof"
    )
    plan = _plan(out)
    n_exchanges = plan.count("Exchange hashpartitioning(__b")
    assert n_exchanges == 2, f"expected 2 bucket shuffles, got {n_exchanges}:\n{plan[:3000]}"
    assert "FlatMapCoGroupsInPandas" in plan


def test_column_pruning_reaches_scan(spark):
    """Selecting 2 columns must not read the full documents schema."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    df = docs.select("doc_id", "lang")
    plan = _plan(df)
    assert "ReadSchema: struct<doc_id:bigint,lang:string>" in plan


def test_window_group_limit_for_latest_dedup(spark, ev):
    """latest_row_dedup must compile to WindowGroupLimit (top-1 per key
    without full sort materialization) on Spark 4."""
    from feast_spark.operators.dedup import latest_row_dedup

    out = latest_row_dedup(
        ev.select("user_id", "ts", "value"), ["user_id"], "ts"
    )
    assert "WindowGroupLimit" in _plan(out)


def test_iceberg_conf_wiring(spark):
    """Iceberg helper produces the reference's catalog conf shape
    (repo_config.py:261-268); actual catalog use is gated on the runtime
    jar, absent in this sandbox."""
    from feast_spark.core.iceberg import (
        create_sequences_table_ddl,
        iceberg_available,
        iceberg_session_conf,
    )

    conf = iceberg_session_conf("feast", warehouse="/tmp/wh")
    assert conf["spark.sql.catalog.feast"] == "org.apache.iceberg.spark.SparkCatalog"
    assert conf["spark.sql.catalog.feast.handle-timestamp-without-timezone"] == "true"
    assert conf["spark.sql.catalog.feast.warehouse"] == "/tmp/wh"
    ddl = create_sequences_table_ddl("feast.db.seqs")
    assert "PARTITIONED BY (days(event_timestamp), bucket(64, doc_id))" in ddl
    assert iceberg_available(spark) in (True, False)  # gated, no jar here


def test_auto_strategy_broadcasts_small_side(spark, ev):
    """strategy='auto' picks broadcast under the 100 MB estimate
    (Ray heuristic, ray.py:437-448)."""
    spine = ev.filter("event_type = 'purchase'").select(
        "user_id", F.col("ts").alias("event_timestamp")
    )
    feats = ev.filter("event_type = 'click'").select(
        "user_id", F.col("ts").alias("event_timestamp"), "value"
    )
    out = point_in_time_join(
        spine, feats, ["user_id"], ["value"], ttl_seconds=86400, strategy="auto"
    )
    assert "BroadcastHashJoin" in _plan(out)


def test_bucketed_feature_table_skips_feature_shuffle(spark, ev, tmp_path):
    """A bucketBy(keys)+sortBy table joins without a feature-side
    Exchange — at 10^12 rows that shuffle is the dominant PIT cost.
    (Broadcast/AQE disabled to force SMJ so exchanges are visible.)"""
    from feast_spark.materialize.bucketed import (
        read_feature_table,
        write_bucketed_feature_table,
    )

    feats = ev.filter("event_type = 'click'").select(
        "user_id", F.col("ts").alias("event_timestamp"), "value"
    )
    spine = ev.filter("event_type = 'purchase'").select(
        "user_id", F.col("ts").alias("event_timestamp")
    )
    spark.sql("DROP TABLE IF EXISTS clicks_bucketed_test")
    write_bucketed_feature_table(feats, "clicks_bucketed_test", ["user_id"], n_buckets=4)
    old_thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    old_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        bt = read_feature_table(spark, "clicks_bucketed_test")
        bucketed = point_in_time_join(
            spine, bt, ["user_id"], ["value"], ttl_seconds=86400
        )
        plain = point_in_time_join(
            spine, feats, ["user_id"], ["value"], ttl_seconds=86400
        )
        nb = _plan(bucketed).count("Exchange hashpartitioning(user_id")
        np_ = _plan(plain).count("Exchange hashpartitioning(user_id")
        assert nb == np_ - 1, (nb, np_)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thr)
        spark.conf.set("spark.sql.adaptive.enabled", old_aqe)
        spark.sql("DROP TABLE IF EXISTS clicks_bucketed_test")


def test_per_row_curation_ops_have_no_exchange(spark):
    """gopher_quality_rules, pii_scrub, and chunk_sequences are
    per-row/flatMap only — a shuffle appearing in their plans would be
    a scale regression (these run over every document of the corpus)."""
    from feast_spark.pipeline.sampling import chunk_sequences
    from feast_spark.pipeline.text import gopher_quality_rules, pii_scrub

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    for df in (
        gopher_quality_rules(docs),
        pii_scrub(docs),
    ):
        plan = _plan(df)
        assert "Exchange" not in plan, plan[:1500]
    seqs = docs.selectExpr(
        "doc_id", "array(1,2,3,4,5,6,7,8) as tokens"
    )
    plan = _plan(chunk_sequences(seqs, max_len=4, overlap=1, n_tok_col=None))
    assert "Exchange" not in plan, plan[:1500]


def test_decontaminate_broadcasts_benchmark_side(spark):
    """The benchmark shingle set must reach the corpus join as a
    broadcast — a sort-merge join here would shuffle the whole corpus
    on shingle, exactly what the operator exists to avoid."""
    from feast_spark.pipeline.text import decontaminate

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    bench = docs.limit(5)
    plan = _plan(decontaminate(docs, bench))
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan, plan[:2000]
    # the corpus posting side must NOT be hash-shuffled on the shingle
    # column for the join (only the per-doc count aggregate shuffles on id)
    assert "hashpartitioning(__s" not in plan, plan[:2000]


def test_unigram_logprob_totals_are_broadcast_lazy(spark):
    """unigram_logprob_score keeps the corpus totals INSIDE the lazy
    plan (broadcast nested-loop of a 1-row frame) — no eager driver
    action at build time."""
    from feast_spark.pipeline.text import unigram_logprob_score

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    tracker = spark.sparkContext.statusTracker()
    before = len(tracker.getJobIdsForGroup(None) or [])
    df = unigram_logprob_score(docs)  # plan build must launch no job
    after = len(tracker.getJobIdsForGroup(None) or [])
    assert after == before
    plan = _plan(df)
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
