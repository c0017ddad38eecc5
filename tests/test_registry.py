"""Persistent registry + incremental materialization (VERDICT r01 #4;
reference registry/registry.py, feature_store.py:1555 + :1666-1672).

The workflow under test: apply a path-backed view → materialize a first
window → construct a FRESH FeatureStore on the same registry file →
materialize_incremental only covers the window since the recorded end.
"""

from datetime import datetime, timedelta

import pandas as pd
import pytest

from pyspark.sql import functions as F

from feast_spark.core.feature_view import Entity, FeatureService, FeatureView, Field
from feast_spark.core.registry import FileRegistry
from feast_spark.core.source import DataFrameSource, ParquetSource
from feast_spark.core.store import FeatureStore


@pytest.fixture()
def source_path(spark, tmp_path):
    ts0 = pd.Timestamp("2024-01-01")
    pdf = pd.DataFrame(
        {
            "doc_id": [f"d{i % 5}" for i in range(40)],
            "event_timestamp": [ts0 + pd.Timedelta(days=i // 2) for i in range(40)],
            "val": [float(i) for i in range(40)],
        }
    )
    path = str(tmp_path / "src")
    spark.createDataFrame(pdf).write.parquet(path)
    return path


def _view(source_path):
    return FeatureView(
        name="vals",
        source=ParquetSource(source_path),
        entities=[Entity("doc_id")],
        schema=[Field("val", "double")],
        ttl=timedelta(days=30),
    )


def test_view_roundtrip(tmp_path, source_path):
    reg = FileRegistry(str(tmp_path / "reg.json"))
    reg.apply_view(_view(source_path))
    reg2 = FileRegistry(str(tmp_path / "reg.json"))  # fresh handle
    v = reg2.load_view("vals")
    assert v.name == "vals"
    assert v.join_keys == ["doc_id"]
    assert v.ttl_seconds == 30 * 86400
    assert v.source.path == source_path
    assert [f.name for f in v.schema] == ["val"]


def test_nonrestorable_view_raises(spark, tmp_path):
    reg = FileRegistry(str(tmp_path / "reg.json"))
    df = spark.range(1).withColumn("event_timestamp", F.current_timestamp())
    reg.apply_view(
        FeatureView(name="mem", source=DataFrameSource(df=df), entities=[Entity("id")])
    )
    with pytest.raises(ValueError, match="not restorable"):
        FileRegistry(str(tmp_path / "reg.json")).load_view("mem")


def test_service_roundtrip(tmp_path, source_path):
    reg = FileRegistry(str(tmp_path / "reg.json"))
    reg.apply_service(FeatureService(name="svc", features=["vals:val"]))
    assert FileRegistry(str(tmp_path / "reg.json")).load_service("svc").features == [
        "vals:val"
    ]


def test_incremental_materialization_across_sessions(spark, tmp_path, source_path):
    reg_path = str(tmp_path / "reg.json")
    out = str(tmp_path / "mat")

    store1 = FeatureStore(spark, registry_path=reg_path)
    store1.apply([_view(source_path)])
    r1 = store1.materialize(
        "vals", out, start=datetime(2024, 1, 1), end=datetime(2024, 1, 10)
    )
    assert len(r1.written) == 10

    # FRESH store on the same registry: the view is restored from disk
    # and the incremental window starts at the recorded end
    store2 = FeatureStore(spark, registry_path=reg_path)
    r2 = store2.materialize_incremental("vals", out, end=datetime(2024, 1, 15))
    new_days = set(r2.written)
    assert new_days and min(new_days) >= "2024-01-10"
    assert max(new_days) == "2024-01-15"
    # days before the first window's end were NOT rewritten (skipped or
    # never enumerated)
    assert not {d for d in r2.written if d < "2024-01-10"}

    # registry now records both intervals
    assert FileRegistry(reg_path).latest_materialization_end("vals") == datetime(
        2024, 1, 15
    )


def test_incremental_uses_manifest_when_registry_lost(spark, tmp_path, source_path):
    out = str(tmp_path / "mat2")
    reg1 = str(tmp_path / "reg1.json")
    store1 = FeatureStore(spark, registry_path=reg1)
    store1.apply([_view(source_path)])
    store1.materialize("vals", out, start=datetime(2024, 1, 1), end=datetime(2024, 1, 8))

    # registry lost — a new one knows the view (re-applied) but no
    # intervals; the output manifest's high watermark takes over
    reg2 = str(tmp_path / "reg2.json")
    store2 = FeatureStore(spark, registry_path=reg2)
    store2.apply([_view(source_path)])
    r = store2.materialize_incremental("vals", out, end=datetime(2024, 1, 12))
    assert r.written and min(r.written) >= "2024-01-08"


def test_cli_materialize_incremental(spark, tmp_path, source_path):
    from feast_spark.cli import main

    reg_path = str(tmp_path / "reg.json")
    out = str(tmp_path / "mat3")
    store = FeatureStore(spark, registry_path=reg_path)
    store.apply([_view(source_path)])
    store.materialize("vals", out, start=datetime(2024, 1, 1), end=datetime(2024, 1, 5))
    rc = main(
        [
            "materialize-incremental",
            "--registry", reg_path,
            "--view", "vals",
            "--out", out,
            "--end", "2024-01-09T00:00:00",
        ]
    )
    assert rc == 0
    assert FileRegistry(reg_path).latest_materialization_end("vals") == datetime(
        2024, 1, 9
    )
