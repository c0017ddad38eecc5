"""Type system: the reference's value-type model mapped to Spark types.

Re-expresses the authoritative Spark↔Feast type table
(sdk/python/feast/type_map.py:889-924) and the primitive/array model
(types.py:69-199, value_type.py:28-52): primitives Bytes, String,
Int32, Int64, Float32, Float64, Bool, UnixTimestamp plus arrays of
each; no map/struct/interval; decimal narrows to double. Timestamps are
UTC, microsecond precision (types.py:201-210).
"""

from __future__ import annotations

from enum import Enum

from pyspark.sql import types as T


class ValueType(Enum):
    BYTES = "bytes"
    STRING = "string"
    INT32 = "int32"
    INT64 = "int64"
    FLOAT = "float"
    DOUBLE = "double"
    BOOL = "bool"
    UNIX_TIMESTAMP = "unix_timestamp"
    BYTES_LIST = "bytes_list"
    STRING_LIST = "string_list"
    INT32_LIST = "int32_list"
    INT64_LIST = "int64_list"
    FLOAT_LIST = "float_list"
    DOUBLE_LIST = "double_list"
    BOOL_LIST = "bool_list"
    UNIX_TIMESTAMP_LIST = "unix_timestamp_list"


_PRIMITIVE_TO_SPARK: dict[ValueType, T.DataType] = {
    ValueType.BYTES: T.BinaryType(),
    ValueType.STRING: T.StringType(),
    ValueType.INT32: T.IntegerType(),
    ValueType.INT64: T.LongType(),
    ValueType.FLOAT: T.FloatType(),
    ValueType.DOUBLE: T.DoubleType(),
    ValueType.BOOL: T.BooleanType(),
    ValueType.UNIX_TIMESTAMP: T.TimestampType(),
}

_LIST_TO_ELEM = {
    ValueType.BYTES_LIST: ValueType.BYTES,
    ValueType.STRING_LIST: ValueType.STRING,
    ValueType.INT32_LIST: ValueType.INT32,
    ValueType.INT64_LIST: ValueType.INT64,
    ValueType.FLOAT_LIST: ValueType.FLOAT,
    ValueType.DOUBLE_LIST: ValueType.DOUBLE,
    ValueType.BOOL_LIST: ValueType.BOOL,
    ValueType.UNIX_TIMESTAMP_LIST: ValueType.UNIX_TIMESTAMP,
}


def value_type_to_spark(vt: ValueType) -> T.DataType:
    if vt in _PRIMITIVE_TO_SPARK:
        return _PRIMITIVE_TO_SPARK[vt]
    return T.ArrayType(_PRIMITIVE_TO_SPARK[_LIST_TO_ELEM[vt]])


# Spark type name → ValueType, per the reference's
# spark_to_feast_value_type table (type_map.py:889-924): short/int →
# INT32, bigint/long → INT64, decimal → DOUBLE (narrowing, warned),
# timestamp/date → UNIX_TIMESTAMP.
_SPARK_NAME_TO_VALUE_TYPE = {
    "string": ValueType.STRING,
    "binary": ValueType.BYTES,
    "short": ValueType.INT32,
    "int": ValueType.INT32,
    "integer": ValueType.INT32,
    "bigint": ValueType.INT64,
    "long": ValueType.INT64,
    "float": ValueType.FLOAT,
    "double": ValueType.DOUBLE,
    "decimal": ValueType.DOUBLE,
    "boolean": ValueType.BOOL,
    "timestamp": ValueType.UNIX_TIMESTAMP,
    "timestamp_ntz": ValueType.UNIX_TIMESTAMP,
    "date": ValueType.UNIX_TIMESTAMP,
}


def spark_to_value_type(dt: T.DataType) -> ValueType:
    """Map a Spark type to the engine's value model; arrays map to list
    types; map/struct/interval are unsupported (as in the reference)."""
    if isinstance(dt, T.ArrayType):
        elem = spark_to_value_type(dt.elementType)
        try:
            return ValueType[f"{elem.name}_LIST"]
        except KeyError:
            # nested arrays (array<array<T>>) have no value type — keep
            # the function's ValueError contract instead of a bare
            # KeyError from the enum lookup
            raise ValueError(
                f"Spark type {dt.simpleString()!r} has no value-type "
                "mapping (nested arrays unsupported, as in reference)"
            ) from None
    if isinstance(dt, T.DecimalType):
        return ValueType.DOUBLE
    name = dt.typeName()
    if name in _SPARK_NAME_TO_VALUE_TYPE:
        return _SPARK_NAME_TO_VALUE_TYPE[name]
    raise ValueError(f"Spark type {name!r} has no value-type mapping (as in reference)")


def infer_view_schema(df, join_keys: list[str], ts_cols: list[str]) -> list[tuple[str, ValueType]]:
    """Schema inference from the source when the view omits it
    (reference feature_view.py:207-260): every non-key, non-timestamp
    column becomes a feature with its mapped value type."""
    skip = set(join_keys) | set(ts_cols)
    return [
        (f.name, spark_to_value_type(f.dataType))
        for f in df.schema.fields
        if f.name not in skip
    ]
