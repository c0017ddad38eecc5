"""Write paths: offline batch append (schema-checked), online-store
push via mapInArrow, sorted-view ordered materialization.

Reference parity:
* ``offline_write_batch`` — schema check + type-cast alignment before
  append (spark_offline_store/spark.py:258-308, cast helper :656-671);
* ``SparkWriteNode`` online push — per-partition vectorized write via
  ``mapInArrow``/``mapInPandas`` returning a status column, forced with
  ``.count()`` (compute_engines/spark/nodes.py:304-352,
  spark/utils.py:30-174);
* SortedFeatureView materialization skips dedup and preserves sort-key
  order (sorted_feature_view.py:29-67, feature_builder.py:69-83).
"""

from __future__ import annotations

from typing import Callable, Iterator, Sequence

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def align_schema(df: DataFrame, target: T.StructType, strict: bool = True) -> DataFrame:
    """Cast ``df`` columns to the target schema's types and order
    (reference cast helper spark.py:656-671). ``strict`` errors on
    missing columns; otherwise fills NULLs."""
    cols = []
    for field in target.fields:
        if field.name in df.columns:
            cols.append(F.col(field.name).cast(field.dataType).alias(field.name))
        elif strict:
            raise ValueError(f"missing column {field.name!r} for append")
        else:
            cols.append(F.lit(None).cast(field.dataType).alias(field.name))
    extra = [c for c in df.columns if c not in {f.name for f in target.fields}]
    if extra and strict:
        raise ValueError(f"unexpected columns {extra!r} for append")
    return df.select(*cols)


def offline_write_batch(
    df: DataFrame,
    path: str,
    file_format: str = "parquet",
    partition_by: Sequence[str] = (),
    expected_schema: T.StructType | None = None,
) -> None:
    """Append a batch to the view's offline source, schema-checked and
    type-aligned. With ``partition_by`` this is also the logged-feature
    sink shape (reference dask.py:466-501)."""
    if expected_schema is not None:
        df = align_schema(df, expected_schema)
    writer = df.write.format(file_format).mode("append")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.save(path)


def write_online_batch(
    df: DataFrame,
    write_fn: Callable[[pd.DataFrame], int],
    batch_size_hint: int = 10_000,
) -> dict:
    """Push rows to an online/KV store from inside the executors.

    ``write_fn(batch_pdf) -> rows_written`` runs per Arrow batch in the
    Python workers (no data ever crosses the driver). Returns aggregate
    status {partitions, rows} — the reference's per-partition "status
    int" pattern (spark/utils.py:30-174) with row accounting added.
    """
    out_schema = T.StructType(
        [T.StructField("rows", T.LongType()), T.StructField("batches", T.LongType())]
    )

    def push(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rows = 0
        n = 0
        for pdf in batches:
            rows += int(write_fn(pdf))
            n += 1
        yield pd.DataFrame({"rows": [rows], "batches": [n]})

    status = df.mapInPandas(push, out_schema).agg(
        F.sum("rows").alias("rows"), F.count(F.lit(1)).alias("partitions")
    ).first()
    return {"rows": int(status["rows"] or 0), "partitions": int(status["partitions"])}


def materialize_sorted(
    df: DataFrame,
    path: str,
    partition_keys: Sequence[str],
    sort_keys: Sequence[tuple[str, str]],
    file_format: str = "parquet",
) -> None:
    """SortedFeatureView materialization: no dedup/agg; rows land
    RANGE-partitioned by the entity keys (``repartitionByRange``, not a
    hash partition — files then cover disjoint key ranges so an ordered
    range scan prunes to the overlapping files and streams in key order)
    and sorted within partitions by the sort keys (Iceberg-style ordered
    data files)."""
    cols = [
        F.col(c).desc() if (d or "ASC").upper() == "DESC" else F.col(c).asc()
        for c, d in sort_keys
    ]
    out = df.repartitionByRange(*partition_keys).sortWithinPartitions(*cols)
    out.write.format(file_format).mode("overwrite").save(path)
