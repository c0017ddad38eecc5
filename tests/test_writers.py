"""Write paths: schema-aligned append, executor-side online push,
sorted materialization order."""

import numpy as np
import pandas as pd
import pytest

from pyspark.sql import functions as F
from pyspark.sql import types as T

from feast_spark import datagen
from feast_spark.materialize.writers import (
    align_schema,
    materialize_sorted,
    offline_write_batch,
    write_online_batch,
)

TARGET = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("n_tok", T.IntegerType()),
        T.StructField("event_timestamp", T.TimestampType()),
    ]
)


def test_align_schema_casts_and_orders(spark):
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "n_tok": [1.0, 2.0],  # double → int cast
                "event_timestamp": pd.to_datetime(["2024-01-01", "2024-01-02"]),
                "doc_id": ["a", "b"],
            }
        )
    )
    out = align_schema(df, TARGET)
    assert [f.name for f in out.schema.fields] == ["doc_id", "n_tok", "event_timestamp"]
    assert out.schema["n_tok"].dataType.typeName() == "integer"

    with pytest.raises(ValueError, match="missing column"):
        align_schema(df.drop("n_tok"), TARGET)
    with pytest.raises(ValueError, match="unexpected columns"):
        align_schema(df.withColumn("extra", F.lit(1)), TARGET)


def test_offline_write_batch_appends(spark, tmp_path):
    path = str(tmp_path / "sink")
    pdf = datagen.token_sequences(n_docs=10, versions_per_doc=2, seed=3)[
        ["doc_id", "n_tok", "event_timestamp"]
    ]
    df = datagen.to_spark(spark, pdf)
    offline_write_batch(df, path, expected_schema=TARGET)
    offline_write_batch(df, path, expected_schema=TARGET)
    assert spark.read.parquet(path).count() == 2 * len(pdf)


def test_write_online_batch_runs_in_executors(spark, tmp_path):
    import os

    marker_dir = str(tmp_path / "pushed")
    os.makedirs(marker_dir, exist_ok=True)

    def push(batch: pd.DataFrame) -> int:
        # stand-in for a KV client: one file per batch, proving the fn
        # ran per-batch with real rows (local mode: same FS as driver)
        batch.to_parquet(f"{marker_dir}/{os.getpid()}_{id(batch)}.parquet")
        return len(batch)

    pdf = datagen.token_sequences(n_docs=30, versions_per_doc=2, seed=5)[
        ["doc_id", "n_tok", "event_timestamp"]
    ]
    df = datagen.to_spark(spark, pdf).repartition(4)
    status = write_online_batch(df, push)
    assert status["rows"] == len(pdf)
    assert status["partitions"] == 4
    pushed = pd.concat(
        [pd.read_parquet(f"{marker_dir}/{f}") for f in os.listdir(marker_dir)]
    )
    assert len(pushed) == len(pdf)


def test_materialize_sorted_preserves_order(spark, tmp_path):
    path = str(tmp_path / "sorted")
    pdf = datagen.token_sequences(n_docs=20, versions_per_doc=4, seed=9)
    df = datagen.to_spark(spark, pdf)
    materialize_sorted(
        df, path, ["doc_id"], [("doc_id", "ASC"), ("event_timestamp", "DESC")]
    )
    back = spark.read.parquet(path)
    assert back.count() == len(pdf)
    # within each file/partition, rows for a doc are ts-descending
    chk = back.select(
        "doc_id",
        "event_timestamp",
        F.spark_partition_id().alias("pid"),
    ).toPandas()
    for (_, _), grp in chk.groupby(["pid", "doc_id"]):
        ts = grp["event_timestamp"].values
        assert (ts[:-1] >= ts[1:]).all()
