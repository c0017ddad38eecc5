"""SparkSource format round-trips (csv/json/parquet/orc), field_mapping,
query/table sources, RetrievalJob.to_arrow."""

import pandas as pd
import pytest

from feast_spark import datagen
from feast_spark.core.source import ParquetSource, QuerySource, SparkSource, TableSource


@pytest.fixture(scope="module")
def sample(spark):
    pdf = datagen.token_sequences(n_docs=10, versions_per_doc=2, seed=4)[
        ["doc_id", "n_tok", "event_timestamp"]
    ]
    return datagen.to_spark(spark, pdf), pdf


@pytest.mark.parametrize("fmt", ["csv", "json", "parquet", "orc"])
def test_format_round_trip(spark, sample, tmp_path, fmt):
    df, pdf = sample
    path = str(tmp_path / fmt)
    writer = df.write.mode("overwrite").format(fmt)
    if fmt == "csv":
        writer = writer.option("header", "true")
    writer.save(path)
    opts = {"header": "true", "inferSchema": "true"} if fmt == "csv" else {}
    src = SparkSource(path=path, file_format=fmt, read_options=opts)
    back = src.load(spark)
    assert back.count() == len(pdf)
    assert set(back.columns) == set(pdf.columns)


def test_field_mapping_and_query_sources(spark, sample):
    df, pdf = sample
    df.createOrReplaceTempView("seq_src")
    q = QuerySource("SELECT doc_id AS d, n_tok FROM seq_src",
                    field_mapping={"d": "doc_id"})
    got = q.load(spark)
    assert "doc_id" in got.columns and got.count() == len(pdf)
    t = TableSource("seq_src")
    assert t.load(spark).count() == len(pdf)
    with pytest.raises(ValueError, match="exactly one"):
        SparkSource(path="/x", table="y")
    with pytest.raises(ValueError, match="unsupported format"):
        SparkSource(path="/x", file_format="xml")


def test_retrieval_job_to_arrow(spark, sample):
    from feast_spark.core.store import RetrievalJob

    df, pdf = sample
    tbl = RetrievalJob(df).to_arrow()
    assert tbl.num_rows == len(pdf)
    assert "n_tok" in tbl.column_names
