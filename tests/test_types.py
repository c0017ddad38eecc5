"""Type-system mapping parity (reference type_map.py:889-924)."""

import pytest
from pyspark.sql import types as T

from feast_spark.core.types import (
    ValueType,
    infer_view_schema,
    spark_to_value_type,
    value_type_to_spark,
)


def test_roundtrip_primitives():
    for vt in (ValueType.STRING, ValueType.INT32, ValueType.INT64,
               ValueType.FLOAT, ValueType.DOUBLE, ValueType.BOOL,
               ValueType.BYTES, ValueType.UNIX_TIMESTAMP):
        assert spark_to_value_type(value_type_to_spark(vt)) == vt


def test_arrays_and_narrowing():
    assert value_type_to_spark(ValueType.INT32_LIST) == T.ArrayType(T.IntegerType())
    assert spark_to_value_type(T.ArrayType(T.IntegerType())) == ValueType.INT32_LIST
    assert spark_to_value_type(T.DecimalType(10, 2)) == ValueType.DOUBLE  # narrowed
    assert spark_to_value_type(T.ShortType()) == ValueType.INT32
    with pytest.raises(ValueError, match="no value-type mapping"):
        spark_to_value_type(T.MapType(T.StringType(), T.StringType()))


def test_infer_view_schema(spark):
    df = spark.createDataFrame(
        [], "doc_id string, event_timestamp timestamp, tokens array<int>, n_tok int"
    )
    inferred = infer_view_schema(df, ["doc_id"], ["event_timestamp"])
    assert inferred == [("tokens", ValueType.INT32_LIST), ("n_tok", ValueType.INT32)]
