"""Bucketed feature tables: shuffle-free as-of joins at scale.

The north-star deployment stores features "range-partitioned,
timestamp-sorted". On Spark that is a bucketed + sorted table:
``bucketBy(N, keys).sortBy(keys, ts)`` persists the hash distribution
in the metastore, so a subsequent join on the entity keys reads the
feature side WITHOUT an Exchange — at 10^12 rows the feature-side
shuffle is the single largest cost of PIT retrieval, and this removes
it entirely (only the much smaller spine still shuffles). The same
layout is what Iceberg's ``bucket(N, doc_id)`` + sorted data files give
(core/iceberg.py DDL); this module provides the session-catalog
equivalent that works in any Spark deployment.

Verified in tests/test_plans.py: the physical plan for a PIT join
against the bucketed table contains exactly one Exchange (spine side).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed_feature_table(
    df: DataFrame,
    table: str,
    join_keys: Sequence[str],
    ts_col: str = "event_timestamp",
    n_buckets: int = 32,
    mode: str = "overwrite",
) -> None:
    """Persist features bucketed by entity keys and sorted by
    (keys, ts) within each bucket — the co-located layout for
    shuffle-free PIT joins and linear in-bucket merges.

    The input is repartitioned to the bucket keys FIRST: without it,
    every input partition emits its own file per bucket (M×N files,
    each only internally sorted), and Spark drops the bucket-sort
    metadata when a bucket spans multiple files — silently re-inserting
    the Sort this layout exists to avoid."""
    (
        df.repartition(n_buckets, *join_keys)
        .write.mode(mode)
        .bucketBy(n_buckets, *join_keys)
        .sortBy(*join_keys, ts_col)
        .format("parquet")
        .saveAsTable(table)
    )


def read_feature_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
