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
