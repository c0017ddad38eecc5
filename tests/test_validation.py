"""Validation profile: single-pass expectations on retrieval output."""

import pytest

from feast_spark import datagen
from feast_spark.validation import Expect, ValidationError, ValidationProfile, validate_or_raise


def test_validation_profile(spark):
    pdf = datagen.token_sequences(n_docs=20, versions_per_doc=3, seed=8)
    df = datagen.to_spark(spark, pdf)
    profile = ValidationProfile(
        [
            Expect("row_count_min", value=10),
            Expect("null_ratio_max", column="tokens", value=0.0),
            Expect("min_at_least", column="n_tok", value=1),
            Expect("max_at_most", column="n_tok", value=128),
            Expect("distinct_at_least", column="doc_id", value=20),
        ]
    )
    report = validate_or_raise(df, profile)
    assert report["passed"] and report["rows"] == len(pdf)

    bad = ValidationProfile(
        [Expect("unique_key", columns=["doc_id"])]  # versions violate uniqueness
    )
    with pytest.raises(ValidationError, match="unique_key"):
        validate_or_raise(df, bad)
    rep = bad.validate(df)
    assert not rep["passed"]


def test_dataset_profiler_clean_frame_passes(spark):
    """GE-profiler contract (reference ge_profiler.py + dqm test):
    expectations derived from a reference frame must pass on that same
    frame and on a mildly-resampled one."""
    from feast_spark.validation import DatasetProfiler

    pdf = datagen.token_sequences(n_docs=50, versions_per_doc=3, seed=4)
    df = datagen.to_spark(spark, pdf)
    profile = DatasetProfiler().analyze(df)
    kinds = {e.kind for e in profile.expectations}
    assert {"columns_ordered", "row_count_between", "min_at_least",
            "max_at_most", "mean_between", "values_in_set"} <= kinds
    report = profile.run(df)
    assert report.is_success, report.errors
    # 80% sample still passes (row_count slack is ±50%)
    report2 = profile.run(df.sample(0.8, seed=1))
    assert report2.is_success, report2.errors


def test_dataset_profiler_detects_drift(spark):
    """Drifted frame fails with the NAMED checks (mirrors the reference
    dqm test asserting check_name of the failed expectations)."""
    from pyspark.sql import functions as F

    from feast_spark.validation import DatasetProfiler, ValidationError

    pdf = datagen.token_sequences(n_docs=50, versions_per_doc=3, seed=4)
    df = datagen.to_spark(spark, pdf)
    profile = DatasetProfiler().analyze(df)

    drifted = df.withColumn("n_tok", F.col("n_tok") + F.lit(100000)).withColumn(
        "source", F.lit("martian")
    )
    report = profile.run(drifted)
    assert not report.is_success
    failed = {(e.check_name, e.column_name) for e in report.errors}
    assert ("max_at_most", "n_tok") in failed
    assert ("mean_between", "n_tok") in failed
    assert ("values_in_set", "source") in failed
    # the retrieval gate raises with the diff
    from feast_spark.core.store import RetrievalJob

    with pytest.raises(ValidationError, match="max_at_most"):
        RetrievalJob(drifted).to_spark_df(validation_reference=profile)
    # clean frame passes through the gate unchanged
    out = RetrievalJob(df).to_spark_df(validation_reference=profile)
    assert out.count() == len(pdf)


def test_profile_json_roundtrip_and_saved_dataset_reference(spark, tmp_path):
    from feast_spark.core.saved_dataset import save_dataset
    from feast_spark.validation import (
        DatasetProfiler,
        ValidationProfile,
        ValidationReference,
    )

    pdf = datagen.token_sequences(n_docs=30, versions_per_doc=2, seed=7)
    df = datagen.to_spark(spark, pdf)
    saved = save_dataset(df, "train_v1", str(tmp_path / "sd"))
    ref = ValidationReference.from_saved_dataset(spark, saved)
    assert ref.name == "train_v1_profile"
    assert ref.profile.run(df).is_success

    # serialization round-trip preserves behavior (reference to_proto/
    # from_proto parity)
    restored = ValidationProfile.from_json(ref.profile.to_json())
    assert restored.run(df).is_success
    assert [e.kind for e in restored.expectations] == [
        e.kind for e in ref.profile.expectations
    ]


def test_profiler_handles_all_null_and_restricted_columns(spark):
    import pandas as pd

    from feast_spark.validation import DatasetProfiler

    pdf = pd.DataFrame(
        {
            "a": [1.0, 2.0, 3.0],
            "b": [None, None, None],
            "c": ["x", "y", "x"],
        }
    )
    df = spark.createDataFrame(pdf, "a double, b double, c string")
    profile = DatasetProfiler().analyze(df)
    assert profile.run(df).is_success
    b_kinds = {e.kind for e in profile.expectations if e.column == "b"}
    assert b_kinds == {"null_ratio_max"}  # bounds unobservable on all-NULL

    only_a = DatasetProfiler(columns=["a"]).analyze(df)
    cols = {e.column for e in only_a.expectations if e.column}
    assert cols == {"a"}
